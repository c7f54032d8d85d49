"""Event-time windowing / sessionization batch twins (extension surface X7).

The streaming forms (window/session_window + watermark) live in
kinesiscat_spark.streaming; these batch twins share semantics and have exact
SQL oracles. Timestamps are compared as epoch microseconds (exact integer
math on both engines; session tz is UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.io_tables import load_table, utc_wall
from kinesiscat_spark.registry import query

_RETENTION_OFFSETS = (1, 7, 14)
_RETENTION_TYPE = "purchase"

# The window rows ALONE — composed by the streaming lanes' oracles
# (stream_queries nests this under STRPTIME/watermark predicates, which
# must never see the retention rows).
_TUMBLING_BASE = """
SELECT
  STRFTIME(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""

_TUMBLING_ORACLE = f"""
WITH pe AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
  WHERE event_type = '{_RETENTION_TYPE}'
),
rc AS (SELECT user_id, MIN(day) AS cohort_day FROM pe GROUP BY user_id),
rsz AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM rc GROUP BY cohort_day),
ract AS (SELECT DISTINCT user_id, day FROM pe),
rhit AS (
  SELECT cohort_day, day - cohort_day AS day_offset, COUNT(*) AS n_active
  FROM ract JOIN rc USING (user_id)
  WHERE day - cohort_day IN {_RETENTION_OFFSETS}
  GROUP BY 1, 2
)
SELECT 'window' AS kind, window_start, event_type, n_events, total_value,
  CAST(NULL AS BIGINT) AS day_offset, CAST(NULL AS DOUBLE) AS retention
FROM ({_TUMBLING_BASE})
UNION ALL
-- retention twin (round-7 continuation, operators/funnel.py
-- retention_report over '{_RETENTION_TYPE}' events): cohort by first
-- purchase day, share active again exactly k days later
SELECT 'retention' AS kind,
  CAST(cohort_day AS VARCHAR) AS window_start,
  CAST(NULL AS VARCHAR) AS event_type,
  CAST(n_active AS BIGINT) AS n_events,
  CAST(cohort_size AS DOUBLE) AS total_value,
  CAST(day_offset AS BIGINT) AS day_offset,
  ROUND(n_active / cohort_size::DOUBLE, 6) AS retention
FROM rhit JOIN rsz USING (cohort_day)
"""


@query("events_tumbling_window", oracle=_TUMBLING_ORACLE)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: 1-hour tumbling event-time window aggregation.

    F.window is epoch-aligned, matching DuckDB time_bucket. In streaming
    form this is readStream + withWatermark("ts", ...) + the same groupBy.
    """
    ev = load_table(spark, sf_dir, "events")
    null_l = F.lit(None).cast("long")
    win = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.lit("window").alias("kind"),
            # utc_wall: render UTC digits regardless of session timezone
            F.date_format(utc_wall(F.col("w.start")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
            null_l.alias("day_offset"),
            F.lit(None).cast("double").alias("retention"),
        )
    )
    # kind='retention' (round-7 continuation, operators/funnel.py):
    # purchase-cohort retention at day offsets 1/7/14; cohort_size rides
    # total_value, n_active rides n_events.
    from kinesiscat_spark.operators.funnel import retention_report

    ret = retention_report(
        ev, _RETENTION_OFFSETS, activity_type=_RETENTION_TYPE
    ).select(
        F.lit("retention").alias("kind"),
        F.col("cohort_day").cast("string").alias("window_start"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("n_active").cast("long").alias("n_events"),
        F.col("cohort_size").cast("double").alias("total_value"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "retention",
    )
    return win.unionByName(ret)


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes

_SESSION_BODY = f"""
WITH ordered AS (
  SELECT
    user_id,
    epoch_us(ts) AS ts_us,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
         OR LAG(epoch_us(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT
    user_id,
    ts_us,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT
  user_id,
  CAST(session_id AS BIGINT) AS session_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  MIN(ts_us) AS session_start_us,
  MAX(ts_us) AS session_end_us
FROM sessions
GROUP BY user_id, session_id
"""

# Round-6 widening: the STREAMING sessionizer's closed-session output
# rides the lane under `kind` — the oracle derives it from the same
# session SQL (every session except each user's last, which no later
# event ever closes).
_SESSION_ORACLE = f"""
SELECT 'batch' AS kind, * FROM ({_SESSION_BODY})
UNION ALL
SELECT 'stream_closed' AS kind, user_id, session_id, n_events,
       session_start_us, session_end_us
FROM (
  SELECT s.*, MAX(session_id) OVER (PARTITION BY user_id) AS _mx
  FROM ({_SESSION_BODY}) s
) WHERE session_id < _mx
UNION ALL
SELECT 'stream_multi' AS kind, user_id, session_id, n_events,
       session_start_us, session_end_us
FROM (
  SELECT s.*, MAX(session_id) OVER (PARTITION BY user_id) AS _mx
  FROM ({_SESSION_BODY}) s
) WHERE session_id < _mx
{{gap_selects}}
"""

# kind='gap_pctl' (round-7 continuation): exact type-1 percentiles of
# the per-user inter-event gap distribution — the diagnostic the 30-min
# gap parameter is read off. The value is the ceil(p·n)-th smallest gap
# (a REAL gap, no interpolation), off the SAME (user, ts, event_id)
# window order the session body uses. p·100 rides session_id, n rides
# n_events, the gap rides session_start_us.
_GAP_PCTLS = (0.5, 0.9, 0.99)
_GAP_CTE = """WITH gpg AS (
  SELECT gap FROM (
    SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap
    FROM events
  ) WHERE gap IS NOT NULL
),
gprk AS (SELECT gap, ROW_NUMBER() OVER (ORDER BY gap) AS rk FROM gpg),
gpn AS (SELECT COUNT(*)::BIGINT AS n FROM gpg)
"""


def _gap_selects() -> str:
    rows = []
    for p in _GAP_PCTLS:
        rows.append(f"""
UNION ALL
SELECT 'gap_pctl' AS kind, CAST(NULL AS BIGINT) AS user_id,
       CAST({int(p * 100)} AS BIGINT) AS session_id,
       (SELECT n FROM gpn) AS n_events,
       (SELECT gap FROM gprk
        WHERE rk = CAST(ceil({float(p)!r} * (SELECT n FROM gpn)) AS BIGINT))
         AS session_start_us,
       CAST(NULL AS BIGINT) AS session_end_us
WHERE (SELECT n FROM gpn) > 0""")
    return "".join(rows)


# the gap CTEs prepend as the oracle's only top-level WITH (each nested
# session body keeps its own parenthesized WITH)
_SESSION_ORACLE = _GAP_CTE + _SESSION_ORACLE.format(
    gap_selects=_gap_selects()
)


@query("events_sessionization", oracle=_SESSION_ORACLE)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: gap-based sessionization (30-min inactivity gap) per user.

    ``kind='batch'``: batch twin of session_window — one shuffle on
    user_id serves both window functions and the final aggregation (same
    partitioning reused across stages — no second exchange at scale).

    ``kind='stream_closed'`` (round-6 widening): the STREAMING
    sessionizer (``streaming/stateful.py streaming_sessionize``,
    applyInPandasWithState) drained over the same events — emitted
    closed sessions must equal the batch sessions minus each user's
    still-open last one. The lane drains in a single availableNow
    trigger so the result is independent of file arrival order (the fold
    sorts within the batch).

    ``kind='stream_multi'`` (round-7 widening, VERDICT r6 task 8): the
    SAME sessionizer driven across ≥3 micro-batches — the events split
    into time-contiguous single-file slices with ascending mtimes
    (tempfile dir; the file source's (mtime, path) order replays them in
    event-time order) and drained at maxFilesPerTrigger=1, so sessions
    that span micro-batch boundaries exercise the cross-batch state
    carry/extend/close transitions under the driver's hash gate, not
    just in tests/test_streaming_sessionize.py. Slice boundaries are
    exact ts percentiles (one aggregate; ties share a slice) —
    deterministic, time-contiguous, no global rank.
    """
    from kinesiscat_spark.streaming.source import (
        StreamConfig,
        read_events_stream,
        run_to_memory,
    )
    from kinesiscat_spark.streaming.stateful import streaming_sessionize

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    is_new = F.when(
        F.lag("ts_us").over(w).isNull()
        | ((F.col("ts_us") - F.lag("ts_us").over(w)) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(cum)
    )
    batch = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )

    # One aggregate yields the fixture content digest AND the row count
    # the drain contracts pin (VERDICT r7 task 1a applied to both drains:
    # a partial drain raises IncompleteDrainError instead of silently
    # emitting a different closed-session set). Round 10: both drains run
    # on EVERY invocation — the round-8/9 content-keyed drain memo let
    # bench passes 2-3 skip the streaming query entirely, so the reported
    # lane time was not the query's cost (VERDICT r9 item 3). The digest
    # still keys the slice FIXTURE below (input staging, process-scoped).
    [dig] = ev.agg(
        F.expr("bit_xor(xxhash64(user_id, ts_us, event_id))").alias("digest"),
        F.count("*").alias("n_rows"),
    ).collect()
    content_key = f"v3|{dig.digest}|{dig.n_rows}|gap={_SESSION_GAP_US}"

    stream_ev = read_events_stream(
        spark, sf_dir, StreamConfig(iterator_type="TRIM_HORIZON", batch_size=100000)
    ).select("user_id", F.unix_micros("ts").alias("ts_us"), "event_id")

    def _drain_closed():
        return run_to_memory(
            streaming_sessionize(stream_ev, _SESSION_GAP_US),
            output_mode="append",
            expect_input_rows=int(dig.n_rows),
        )

    # kind='stream_multi': ≥3 time-sliced micro-batches (see docstring).
    # Slice boundaries come from ONE exact-percentile aggregate over the
    # ts column (deterministic; ties share a slice, preserving time
    # contiguity) — a global ntile rank would sort every full row on one
    # reducer just to pick two cut points.
    import json
    import os

    from kinesiscat_spark.io_tables import cached_fixture_dir

    n_slices = 3

    # the slice fixture is a pure function of the input table: cache it
    # under a CONTENT digest (not path+rowcount — the staleness class
    # behind r7's red sampling_mix row, ADVICE r7 #2) so repeat calls —
    # bench passes, parity reruns — pay the collect+write ONCE and the
    # lane's timing measures the streaming drain, not fixture prep. The
    # build also records how many slices are NON-EMPTY (all-equal
    # timestamps put every row in slice 1; empty events fill none) so
    # the drain contract below never spuriously fires on
    # degenerate-but-valid inputs.
    def _build(stage: str) -> None:
        [row] = ev.agg(
            F.expr("percentile(ts_us, array(0.3333, 0.6667))").alias("bs")
        ).collect()
        # empty events: percentile is NULL — degenerate boundaries put
        # every (zero) row in slice 1 and the drain yields the empty result
        b1, b2 = row.bs if row.bs is not None else (0, 0)
        sliced = ev.withColumn(
            "_slice",
            (
                1
                + (F.col("ts_us") > F.lit(b1)).cast("int")
                + (F.col("ts_us") > F.lit(b2)).cast("int")
            ),
        )
        slice_rows = {
            r._slice: r.n
            for r in sliced.groupBy("_slice").agg(F.count("*").alias("n")).collect()
        }
        for i in range(1, n_slices + 1):
            sub = os.path.join(stage, f"slice_{i:03d}")
            sliced.filter(F.col("_slice") == i).drop("_slice").coalesce(
                1
            ).write.parquet(sub)
            for root, _, files in os.walk(sub):
                for f in files:
                    os.utime(
                        os.path.join(root, f),
                        (1_700_000_000 + i, 1_700_000_000 + i),
                    )
        with open(os.path.join(stage, "meta.json"), "w") as fh:
            json.dump(
                {"n_nonempty": sum(1 for n in slice_rows.values() if n > 0)},
                fh,
            )

    def _drain_multi():
        src = cached_fixture_dir(content_key, "kc_sess_multi_", _build)
        with open(os.path.join(src, "meta.json")) as fh:
            n_nonempty = int(json.load(fh)["n_nonempty"])
        # maxFilesPerTrigger is a SOURCE option — one file per micro-batch
        # (availableNow honors it), so the drain is genuinely one batch
        # per non-empty slice; the drain runs on every invocation (r10)
        return run_to_memory(
            streaming_sessionize(
                spark.readStream.schema(
                    "user_id long, ts_us long, event_id long"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/slice_*"),
                _SESSION_GAP_US,
            ),
            output_mode="append",
            expect_input_rows=int(dig.n_rows),
            expect_min_batches=n_nonempty,
        )

    # the two drains are independent streaming queries over independent
    # sources — overlap their fixed query-lifecycle latencies from a
    # 2-thread pool (guide §2.6: concurrent jobs back-fill each other's
    # idle phases; each drain is mostly commit-log and trigger latency,
    # not CPU)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _closed_fut = _pool.submit(_drain_closed)
        _multi_fut = _pool.submit(_drain_multi)
        closed, multi = _closed_fut.result(), _multi_fut.result()
    # kind='gap_pctl' (round-7 continuation): the inter-event gap
    # percentiles the 30-min gap parameter is read off
    # (operators/funnel.py inter_event_gap_percentiles) — p·100 rides
    # session_id, n_gaps rides n_events, the exact gap rides
    # session_start_us.
    from kinesiscat_spark.operators.funnel import inter_event_gap_percentiles

    gaps = inter_event_gap_percentiles(ev, _GAP_PCTLS).select(
        F.lit("gap_pctl").alias("kind"),
        F.lit(None).cast("long").alias("user_id"),
        (F.col("p") * 100).cast("long").alias("session_id"),
        F.col("n_gaps").alias("n_events"),
        F.col("gap_us").alias("session_start_us"),
        F.lit(None).cast("long").alias("session_end_us"),
    )
    return (
        batch.select(F.lit("batch").alias("kind"), "*")
        .unionByName(closed.select(F.lit("stream_closed").alias("kind"), "*"))
        .unionByName(multi.select(F.lit("stream_multi").alias("kind"), "*"))
        .unionByName(gaps)
    )


_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_HORIZON_US = 200_000 * 1_000_000  # ~2.3 days at the corpus cadence

_TOPK_ORACLE = f"""
WITH totals AS (
  SELECT event_type, user_id, ROUND(SUM(value), 2) AS total_value
  FROM events
  GROUP BY event_type, user_id
),
ranked AS (
  SELECT
    event_type, user_id, total_value,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY total_value DESC, user_id) AS rank
  FROM totals
),
-- funnel twin (round-7 continuation, operators/funnel.py): greedy
-- earliest-completion — step i+1 is the EARLIEST event of its type
-- STRICTLY after the matched step-i event; exact integer-microsecond
-- math on both engines
f0 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
),
f1 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1 FROM events e
  JOIN f0 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND epoch_us(e.ts) > f0.t0
  GROUP BY e.user_id
),
f2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
  JOIN f1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND epoch_us(e.ts) > f1.t1
  GROUP BY e.user_id
),
funnel AS (
  SELECT f0.user_id,
         (1 + (t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT) AS reached,
         t0, t2,
         coalesce(t2 - t0 <= {_FUNNEL_HORIZON_US}, false) AS completed
  FROM f0 LEFT JOIN f1 USING (user_id) LEFT JOIN f2 USING (user_id)
)
SELECT 'topk' AS kind, event_type, user_id, total_value,
       CAST(rank AS BIGINT) AS rank,
       CAST(NULL AS BIGINT) AS t0_us, CAST(NULL AS BIGINT) AS t_end_us,
       CAST(NULL AS BOOLEAN) AS completed
FROM ranked
WHERE rank <= 5
UNION ALL
SELECT 'funnel' AS kind, CAST(NULL AS VARCHAR) AS event_type, user_id,
       CAST(NULL AS DOUBLE) AS total_value, CAST(reached AS BIGINT) AS rank,
       t0 AS t0_us, t2 AS t_end_us, completed
FROM funnel
UNION ALL
SELECT 'funnel_stream' AS kind, CAST(NULL AS VARCHAR) AS event_type,
       user_id, CAST(NULL AS DOUBLE) AS total_value,
       CAST({len(_FUNNEL_STEPS)} AS BIGINT) AS rank,
       t0 AS t0_us, t2 AS t_end_us, completed
FROM funnel WHERE reached = {len(_FUNNEL_STEPS)}
"""


@query("events_topk_users_per_type", oracle=_TOPK_ORACLE)
def events_topk_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4-style top-k per group: top-5 users by total value per event type.

    rank <= k filters on a window — Spark pushes the limit into the sort
    within each partition (WindowGroupLimit in Spark 3.5+/4.x), so no full
    sort of the grouped data happens at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    null_l = F.lit(None).cast("long")
    topk = (
        totals.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            F.lit("topk").alias("kind"),
            "event_type",
            "user_id",
            "total_value",
            "rank",
            null_l.alias("t0_us"),
            null_l.alias("t_end_us"),
            F.lit(None).cast("boolean").alias("completed"),
        )
    )
    # kind='funnel' (round-7 continuation, operators/funnel.py): per-user
    # ordered-step progression view -> click -> purchase with a
    # completion horizon; reached rides the rank column.
    from kinesiscat_spark.operators.funnel import funnel_report

    fun = funnel_report(ev, _FUNNEL_STEPS, _FUNNEL_HORIZON_US).select(
        F.lit("funnel").alias("kind"),
        F.lit(None).cast("string").alias("event_type"),
        "user_id",
        F.lit(None).cast("double").alias("total_value"),
        F.col("reached").cast("long").alias("rank"),
        "t0_us",
        "t_end_us",
        "completed",
    )
    # kind='funnel_stream' (round-7 continuation): the STATEFUL streaming
    # funnel (streaming/stateful.py streaming_funnel,
    # applyInPandasWithState) drained over the same events — emitted
    # completions must equal the batch rows with reached == n_steps (the
    # open-funnel tail lives in state). Single availableNow drain here;
    # the cross-micro-batch state path is pinned in
    # tests/test_streaming_funnel.py.
    from kinesiscat_spark.streaming.source import (
        StreamConfig,
        read_events_stream,
        run_to_memory,
    )
    from kinesiscat_spark.streaming.stateful import streaming_funnel

    stream_ev = read_events_stream(
        spark, sf_dir,
        StreamConfig(iterator_type="TRIM_HORIZON", batch_size=100000),
    ).select(
        "event_id", F.unix_micros("ts").alias("ts_us"),
        "user_id", "event_type",
    )
    # Round 10: the drain runs on EVERY invocation — the round-9
    # content-keyed drain memo let bench passes 2-3 skip the streaming
    # query, which inflated this lane's reported speedup (VERDICT r9
    # item 3). One narrow aggregate pins the drain contract's expected
    # row count (a truncated drain raises instead of silently dropping
    # completions).
    [dig] = ev.agg(F.count("*").alias("n_rows")).collect()
    drained = run_to_memory(
        streaming_funnel(stream_ev, _FUNNEL_STEPS, _FUNNEL_HORIZON_US),
        output_mode="append",
        expect_input_rows=int(dig.n_rows),
    )
    fun_stream = drained.select(
        F.lit("funnel_stream").alias("kind"),
        F.lit(None).cast("string").alias("event_type"),
        "user_id",
        F.lit(None).cast("double").alias("total_value"),
        F.lit(len(_FUNNEL_STEPS)).cast("long").alias("rank"),
        "t0_us",
        "t_end_us",
        "completed",
    )
    out = topk.unionByName(fun).unionByName(fun_stream)
    # per-kind (count, xor) digests ride the driver's own collect job and
    # land in DEBUG_events_topk_users_per_type.jsonl — any future
    # driver-side hash red names its divergent kind (VERDICT r8 task 7)
    from kinesiscat_spark.debug_digests import observe_kind_digests

    return observe_kind_digests(
        out, "events_topk_users_per_type", ["topk", "funnel", "funnel_stream"]
    )
