"""Funnel analysis over event streams (extension surface X7 family).

The classic product-analytics sequence query: how far does each user get
through an ORDERED list of steps (view -> click -> purchase), and do they
complete it within a horizon? Semantics are greedy earliest-completion —
step i+1 matches the EARLIEST event of its type strictly after the matched
step-i event — which is deterministic (min over integer microseconds) and
replayable in ANSI SQL, unlike "any subsequence" variants whose witness is
ambiguous.

Scale shape: one per-user min-aggregate per step (map-side combined) plus
one user-keyed join per step — k small (user, t) frames, never the event
rows themselves; everything shuffles on user_id only. No windows over the
full event table, no arrays of per-user event history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    horizon_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, reached, t0_us, t_end_us, completed) per user who performed
    the first step.

    ``reached`` counts CONSECUTIVE matched steps (1..len(steps));
    ``t_end_us`` is the completion time of the last step (NULL unless all
    steps matched); ``completed`` is true iff all steps matched within
    ``horizon_us`` of the first step's timestamp. Ties on identical
    timestamps do not cascade (the next step must be STRICTLY later) —
    simultaneous multi-step events are not a funnel progression.
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps (got {list(steps)})")
    if horizon_us <= 0:
        raise ValueError(f"horizon_us must be > 0 (got {horizon_us})")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(type_col).alias("_type"),
    )
    cur = (
        ev.filter(F.col("_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
    )
    prev = "t0"
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col("_type") == step)
            .join(cur.select("user_id", prev), "user_id")
            .filter(F.col("ts_us") > F.col(prev))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "user_id", "left")
        prev = f"t{i}"
    last = f"t{len(steps) - 1}"
    reached = F.lit(1)
    for i in range(1, len(steps)):
        reached = reached + F.col(f"t{i}").isNotNull().cast("int")
    return cur.select(
        "user_id",
        reached.cast("int").alias("reached"),
        F.col("t0").alias("t0_us"),
        F.col(last).alias("t_end_us"),
        F.coalesce(
            (F.col(last) - F.col("t0")) <= F.lit(horizon_us), F.lit(False)
        ).alias("completed"),
    )


def retention_report(
    events: DataFrame,
    offsets: Sequence[int],
    activity_type: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention: users are cohorted by the epoch DAY of their
    first qualifying event; for each offset k, the share of a cohort
    active again exactly k days later — the other classic
    product-analytics sequence query next to the funnel.

    ``activity_type`` restricts both cohorting and activity to one event
    type (None = any event). Returns one row per (cohort_day, offset):
    (cohort_day, day_offset, cohort_size, n_active, retention), rate
    rounded to 6 dp. Exact integer day math; deterministic.

    Scale shape: one per-user min-aggregate (cohorts), one distinct over
    (user, day) — both map-side combined, shuffling (user/day)-sized
    keys — then a user-keyed join and a (cohort, offset)-keyed count;
    nothing is ever per-event wide.
    """
    if not offsets or any(k <= 0 for k in offsets):
        raise ValueError(f"offsets must be positive (got {list(offsets)})")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        (F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day"),
        F.col(type_col).alias("_type"),
    )
    if activity_type is not None:
        ev = ev.filter(F.col("_type") == activity_type)
    cohorts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    acts = ev.select("user_id", "day").distinct()
    hits = (
        acts.join(cohorts, "user_id")
        .select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .filter(F.col("day_offset").isin(*[int(k) for k in offsets]))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        hits.join(sizes, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "cohort_size",
            "n_active",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )


def inter_event_gap_percentiles(
    events: DataFrame,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    method: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Percentiles of per-user inter-event gaps — the distribution a
    sessionization gap threshold is read off (the 30-minute industry
    default is exactly 'a gap far beyond the p99 within-session
    inter-arrival'; this report justifies the parameter from the corpus's
    own cadence instead of folklore). Returns one row per requested
    percentile: (p, n_gaps, gap_us).

    Two methods (the ``perplexity_buckets`` dual-method pattern —
    VERDICT r7 task 2):

    - ``method='approx'`` (the 100 TB production path): ONE
      ``percentile_approx`` aggregate — Greenwald-Khanna sketches merge
      map-side, so there is a single constant-size exchange and NO global
      sort anywhere. ``accuracy`` bounds the rank error at
      n/accuracy (default 10⁴ → ±0.01% of rank).
    - ``method='exact'`` (the deterministic / oracle twin): type-1
      percentiles — gap_us is the ceil(p·n)-th smallest gap, a REAL gap
      from the data, bit-replayable in any engine. The selection runs on
      DISTINCT gap values: groupBy(gap).count() combines map-side, then
      one cumulative-count window over the distinct values picks the gap
      whose cumulative count first reaches ceil(p·n). The single-task
      window sees |distinct gaps| rows — bounded by the gap VALUE range
      (microsecond resolution of the cadence), not by corpus row count —
      unlike the previous global row_number over every gap row.

    Scale shape: the per-user lag rides the SAME user-keyed exchange as
    sessionization; gaps reduce to scalars before either selection.
    """
    for p in percentiles:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"percentiles must be in (0, 1] (got {p})")
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be 'exact' or 'approx' (got {method!r})")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gaps = (
        events.select(
            (F.col(ts_col) - F.lag(ts_col).over(w)).alias("gap")
        )
        .filter(F.col("gap").isNotNull())
    )
    ps = [float(p) for p in percentiles]

    if method == "approx":
        agg = gaps.agg(
            F.percentile_approx("gap", ps, accuracy).alias("vs"),
            F.count("*").alias("_n"),
        )
        return agg.select(
            F.posexplode("vs").alias("_i", "gap_us"), "_n"
        ).select(
            F.element_at(
                F.array(*[F.lit(p) for p in ps]), F.col("_i") + 1
            ).alias("p"),
            F.col("_n").cast("long").alias("n_gaps"),
            F.col("gap_us").cast("long").alias("gap_us"),
        )

    counts = gaps.groupBy("gap").agg(F.count("*").alias("c"))
    cum = counts.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("gap").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    n1 = gaps.agg(F.count("*").alias("_n"))
    # one output row per p: the first distinct gap whose cumulative count
    # reaches the target rank ceil(p·n) — cum >= t on this value and
    # cum - c < t means rank t lands inside this value's run
    return (
        cum.crossJoin(F.broadcast(n1))
        .select(
            "*", F.explode(F.array(*[F.lit(p) for p in ps])).alias("p")
        )
        .withColumn("_t", F.ceil(F.col("p") * F.col("_n")).cast("long"))
        .filter(
            (F.col("cum") >= F.col("_t"))
            & (F.col("cum") - F.col("c") < F.col("_t"))
        )
        .select(
            "p",
            F.col("_n").cast("long").alias("n_gaps"),
            F.col("gap").cast("long").alias("gap_us"),
        )
    )
