"""Temporal join operators: as-of join and interval (range) join.

The reference has no cross-record joins of any kind (SURVEY §2.4 — the
JMESPath surface is strictly per-document), but aligning an event stream
to the most recent dimension snapshot (as-of) and windowing events into
intervals (range) are the two temporal joins every training-data
pipeline needs. Spark has no built-in as-of join and its inequality
joins default to BroadcastNestedLoopJoin, so both are implemented here
as compositions of equi-join / window primitives that scale.

Scale design (100 TB):

- ``asof_join`` is the union-and-window form: tag both sides, union,
  ONE hash shuffle on the join key, sort within key, propagate the last
  right row forward with an ``ignorenulls`` window. Cost is
  O((|L|+|R|) log) with no candidate blow-up — vs the naive
  ``L JOIN R ON key AND rt <= lt`` nested-loop which is O(|L|·|R|)
  per key. Skewed keys are ordinary groupBy skew (AQE handles it).
- ``interval_join`` turns the inequality predicate into an equi-join by
  quantizing time into fixed-width buckets: each right interval explodes
  to the buckets it overlaps, each left row maps to exactly one bucket,
  and the join shuffles on (key, bucket) — candidate pairs are only
  rows within one bucket width of each other, then an exact filter
  keeps true matches. Pick ``bucket`` ≈ typical interval length so the
  explode factor stays ~2×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, plus the right row with the
    greatest ``right_ts`` <= ``left_ts`` (backward, inclusive) for the
    same key — or the least ``right_ts`` >= ``left_ts`` (forward).
    Unmatched left rows keep null right columns.

    All right columns except ``right_on`` come through (so ``right_ts``
    shows which snapshot matched). The right side must be unique per
    (key, ts) — pre-dedup with a row_number window otherwise; with
    duplicates the propagated match would depend on shuffle order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rpay = [c for c in right.columns if c != right_on]
    clash = set(rpay) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns clash with left: {sorted(clash)}")
    rstruct = F.struct(*[F.col(c) for c in rpay])
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType

    lpart = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rtype).alias("_rrow"),
    )
    rpart = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lpart.schema["_lrow"].dataType).alias("_lrow"),
        rstruct.alias("_rrow"),
    )
    # Right rows (_side=0) sort before left rows at equal _t, so a right
    # row at exactly left_ts is visible to the left row — inclusive bound
    # in both directions.
    order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lpart.unionByName(rpart)
        .withColumn("_m", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select("_lrow.*", *[F.col("_m")[c].alias(c) for c in rpay])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    start: str,
    end: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Equi-key interval join: left rows with ``start <= left_ts < end``
    of a right interval for the same key. Returns left columns + right
    columns (names must not clash — project/alias first).

    The inequality is pre-filtered by a bucketed equi-join on
    (key, floor(epoch/width)): intervals explode to every bucket they
    overlap (``sequence``), left rows map to one bucket, and Catalyst
    plans a plain SortMergeJoin/BroadcastHashJoin on the composite key
    instead of a nested loop. The exact range filter runs post-join.
    """
    # Width in seconds via a timestamp round-trip — works for any
    # "N unit" interval string without casting INTERVAL to long. Computed
    # as a DIFFERENCE of two unix_timestamps so the session-timezone offset
    # of the base timestamp cancels; unix_timestamp(base + INTERVAL) alone
    # equals the width only in a UTC session (wrong/negative elsewhere).
    base = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    width_s = F.unix_timestamp(base + F.expr(f"INTERVAL {bucket}")) - F.unix_timestamp(
        base
    )
    lb = left.withColumn("_b", F.floor(F.unix_timestamp(F.col(left_ts)) / width_s))
    rb = right.withColumn(
        "_bs",
        F.sequence(
            F.floor(F.unix_timestamp(F.col(start)) / width_s),
            F.floor(F.unix_timestamp(F.col(end)) / width_s),
        ),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")
    joined = lb.join(
        rb,
        (F.col(left_on) == F.col(right_on)) & (lb["_b"] == rb["_b"]),
    ).filter((F.col(left_ts) >= F.col(start)) & (F.col(left_ts) < F.col(end)))
    return joined.drop("_b")
