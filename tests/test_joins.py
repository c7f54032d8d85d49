"""Unit tests for asof_join / interval_join semantics (small literal data);
the sf0.01 hash-check vs DuckDB's native ASOF JOIN lives in the oracle gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.operators.joins import asof_join, interval_join


def _ts(s):
    return F.to_timestamp(F.lit(s))


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00", 100.0),
         ("A", "2024-01-01 10:00:05", 101.0),
         ("B", "2024-01-01 10:00:03", 50.0)],
        "sym string, qt string, px double",
    ).withColumn("qt", F.to_timestamp("qt"))
    trades = spark.createDataFrame(
        [("A", "2024-01-01 09:59:59"),   # before any quote
         ("A", "2024-01-01 10:00:05"),   # exactly at a quote -> inclusive
         ("A", "2024-01-01 10:00:07"),
         ("B", "2024-01-01 10:00:04"),
         ("C", "2024-01-01 10:00:00")],  # key with no quotes
        "sym string, tt string",
    ).withColumn("tt", F.to_timestamp("tt"))
    return quotes, trades


def test_asof_backward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, "sym", "sym", "tt", "qt")
    got = {(r.sym, str(r.tt)): r.px for r in out.collect()}
    assert got[("A", "2024-01-01 09:59:59")] is None
    assert got[("A", "2024-01-01 10:00:05")] == 101.0  # inclusive bound
    assert got[("A", "2024-01-01 10:00:07")] == 101.0
    assert got[("B", "2024-01-01 10:00:04")] == 50.0
    assert got[("C", "2024-01-01 10:00:00")] is None
    assert out.count() == trades.count()  # left join: no row loss


def test_asof_forward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, "sym", "sym", "tt", "qt", direction="forward")
    got = {(r.sym, str(r.tt)): r.px for r in out.collect()}
    assert got[("A", "2024-01-01 09:59:59")] == 100.0  # next quote
    assert got[("A", "2024-01-01 10:00:05")] == 101.0  # inclusive bound
    assert got[("A", "2024-01-01 10:00:07")] is None   # nothing after
    assert got[("C", "2024-01-01 10:00:00")] is None


def test_asof_clash_and_direction_guards(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError, match="clash"):
        asof_join(trades, quotes.withColumnRenamed("px", "tt"), "sym", "sym", "tt", "qt")
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, "sym", "sym", "tt", "qt", direction="nearest")


def test_interval_join_bucket_boundaries(spark):
    """Intervals longer than the bucket width and rows on exact bucket
    edges: the bucketed equi-join must still find every true match."""
    events = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:30:00"),
         (1, "2024-01-01 12:59:59"), (1, "2024-01-01 13:00:00"),
         (2, "2024-01-01 10:30:00")],
        "uid bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ivals = spark.createDataFrame(
        [(1, 7, "2024-01-01 10:00:00", "2024-01-01 13:00:00")],
        "r_uid bigint, ival_id bigint, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    out = interval_join(events, ivals, "uid", "r_uid", "ts", "s", "e", bucket="1 hour")
    got = sorted(str(r.ts) for r in out.collect())
    # [10:00, 13:00): start inclusive, end exclusive, wrong-key excluded
    assert got == ["2024-01-01 10:00:00", "2024-01-01 11:30:00", "2024-01-01 12:59:59"]


def test_interval_join_non_utc_session(spark):
    """The bucket width must not absorb the session-timezone offset:
    unix_timestamp('1970-01-01' + INTERVAL) alone is offset-by-zone; the
    width is computed as a difference so any zone gives the same result."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Karachi")  # UTC+5
    try:
        events = spark.createDataFrame(
            [(100, 1, "2024-01-01 10:30:00"), (200, 1, "2024-01-01 14:00:00")],
            "eid bigint, uid bigint, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        ivals = spark.createDataFrame(
            [(1, 7, "2024-01-01 10:00:00", "2024-01-01 13:00:00")],
            "r_uid bigint, ival_id bigint, s string, e string",
        ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
        out = interval_join(
            events, ivals, "uid", "r_uid", "ts", "s", "e", bucket="1 hour"
        )
        # event 100 (10:30, inside [10:00,13:00)) matches; 200 (14:00) not.
        # Compare ids, not rendered timestamps — collect() renders in the
        # session zone, which is exactly what this test perturbs.
        assert [r.eid for r in out.collect()] == [100]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_funnel_greedy_earliest_completion(spark):
    """Funnel semantics pinned on a hand-built event log: greedy earliest
    match, strictly-later cascade, horizon boundary, partial progress,
    and no-first-step users absent."""
    import datetime as dt

    import pytest

    from kinesiscat_spark.operators.funnel import funnel_report

    def t(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    rows = [
        # u1 completes within horizon: A@0 -> B@2 -> C@4
        (1, t(0), "A"), (1, t(2), "B"), (1, t(4), "C"),
        # u2 reaches B only (C before B doesn't count)
        (2, t(0), "A"), (2, t(1), "C"), (2, t(3), "B"),
        # u3: B at the SAME ts as A does not cascade; later B does,
        # C exactly AT the horizon boundary counts (<=)
        (3, t(10), "A"), (3, t(10), "B"), (3, t(12), "B"), (3, t(20), "C"),
        # u4 never does A -> absent
        (4, t(0), "B"), (4, t(1), "C"),
        # u5 completes but OUTSIDE the horizon
        (5, t(0), "A"), (5, t(1), "B"), (5, t(60), "C"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        r.user_id: r
        for r in funnel_report(
            ev, ("A", "B", "C"), horizon_us=10_000_000
        ).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert (out[1].reached, out[1].completed) == (3, True)
    assert (out[2].reached, out[2].completed) == (2, False)
    assert out[2].t_end_us is None
    assert (out[3].reached, out[3].completed) == (3, True)  # 20-10 <= 10
    assert (out[5].reached, out[5].completed) == (3, False)
    with pytest.raises(ValueError):
        funnel_report(ev, ("A",), horizon_us=1)
    with pytest.raises(ValueError):
        funnel_report(ev, ("A", "B"), horizon_us=0)


def test_retention_cohort_math(spark):
    """Cohort retention pinned by hand: two cohorts, exact offsets,
    distinct-day semantics (two events one day count once), and the
    activity-type filter."""
    import datetime as dt

    import pytest

    from kinesiscat_spark.operators.funnel import retention_report

    def d(day, h=0):
        return dt.datetime(2024, 1, 1 + day, 1 + h)

    rows = [
        # cohort day0: users 1,2.  u1 active d1 twice + d7; u2 only d0
        (1, d(0), "p"), (1, d(1), "p"), (1, d(1, 2), "p"), (1, d(7), "p"),
        (2, d(0), "p"),
        # cohort day2: user 3, active d3 (offset 1)
        (3, d(2), "p"), (3, d(3), "p"),
        # user 4 has only non-matching events -> no cohort
        (4, d(0), "x"), (4, d(1), "x"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    base = dt.date(2024, 1, 1).toordinal() - dt.date(1970, 1, 1).toordinal()
    got = {
        (r.cohort_day, r.day_offset): (r.cohort_size, r.n_active, r.retention)
        for r in retention_report(ev, (1, 7), activity_type="p").collect()
    }
    assert got == {
        (base, 1): (2, 1, 0.5),
        (base, 7): (2, 1, 0.5),
        (base + 2, 1): (1, 1, 1.0),
    }
    with pytest.raises(ValueError):
        retention_report(ev, ())
    with pytest.raises(ValueError):
        retention_report(ev, (0,))


def test_inter_event_gap_percentiles_hand_computed(spark):
    """Type-1 percentile selection: gap values come from the data (no
    interpolation), k = ceil(p*n), per-user ordering matches the
    sessionizer's; validation rejects out-of-range percentiles."""
    import pytest

    from kinesiscat_spark.operators.funnel import inter_event_gap_percentiles

    # user 1 gaps: 10, 20, 30, 40; user 2 gaps: 5 -> n=5
    rows = [(1, t, i) for i, t in enumerate([100, 110, 130, 160, 200])]
    rows += [(2, 1000, 10), (2, 1005, 11)]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long, event_id long")
    got = {
        r.p: (r.n_gaps, r.gap_us)
        for r in inter_event_gap_percentiles(
            ev, (0.2, 0.5, 0.9, 1.0)
        ).collect()
    }
    # sorted gaps: 5, 10, 20, 30, 40
    assert got[0.2] == (5, 5)     # ceil(1.0) = 1st
    assert got[0.5] == (5, 20)    # ceil(2.5) = 3rd
    assert got[0.9] == (5, 40)    # ceil(4.5) = 5th
    assert got[1.0] == (5, 40)
    with pytest.raises(ValueError):
        inter_event_gap_percentiles(ev, (0.0,))
    with pytest.raises(ValueError):
        inter_event_gap_percentiles(ev, (1.2,))


def test_inter_event_gap_percentiles_approx_bounds_exact(spark):
    """method='approx' (the 100 TB path: one percentile_approx aggregate,
    no global sort) must land within the documented rank error
    n/accuracy of the exact type-1 selection, and reject bad methods."""
    import math

    import pytest

    from kinesiscat_spark.operators.funnel import inter_event_gap_percentiles

    # 12 users x 40 events with a deterministic spread of gaps
    rows = []
    eid = 0
    for u in range(12):
        t = 0
        for i in range(40):
            t += ((u * 7 + i * 13) % 97) + 1
            rows.append((u, t, eid))
            eid += 1
    ev = spark.createDataFrame(rows, "user_id long, ts_us long, event_id long")
    ps = (0.5, 0.9, 0.99)
    exact = {
        r.p: r.gap_us
        for r in inter_event_gap_percentiles(ev, ps, method="exact").collect()
    }
    approx_rows = inter_event_gap_percentiles(
        ev, ps, method="approx", accuracy=10_000
    ).collect()
    approx = {r.p: r.gap_us for r in approx_rows}
    n = approx_rows[0].n_gaps
    assert n == 12 * 39
    # rank-error bound: the approx value's exact rank must be within
    # n/accuracy of ceil(p*n)
    all_gaps = sorted(
        g
        for u in range(12)
        for g in [((u * 7 + i * 13) % 97) + 1 for i in range(1, 40)]
    )
    tol = max(1, n // 10_000)
    for p in ps:
        target = math.ceil(p * n)
        got_rank_lo = all_gaps.index(approx[p]) + 1
        got_rank_hi = len(all_gaps) - all_gaps[::-1].index(approx[p])
        assert got_rank_lo - tol <= target <= got_rank_hi + tol, (
            p, approx[p], exact[p], target, got_rank_lo, got_rank_hi
        )
    with pytest.raises(ValueError):
        inter_event_gap_percentiles(ev, ps, method="bogus")
