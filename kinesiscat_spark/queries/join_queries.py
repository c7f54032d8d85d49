"""Temporal-join queries: as-of join and interval join over events/orders.

The reference has no joins (SURVEY §2.4); these exercise the
operators in ``kinesiscat_spark.operators.joins``. The as-of oracle
uses DuckDB's native ASOF JOIN — a fully independent implementation of
the same semantics — so a hash match is strong evidence of correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.joins import asof_join, interval_join
from kinesiscat_spark.registry import query

# Only orders above this price qualify as a "big order" — some users then
# have no qualifying order at all, exercising the null (unmatched) path.
BIG_ORDER = 400_000.0

_TEMPORAL_ORACLE = f"""
WITH big AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
         MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders
  WHERE o_totalprice > {BIG_ORDER}
  GROUP BY o_custkey, o_orderdate
),
anchors AS (
  SELECT event_id AS anchor_id, user_id AS a_user, ts AS a_start,
         ts + INTERVAL 1 HOUR AS a_end
  FROM events WHERE event_type = 'purchase'
)
SELECT 'asof' AS kind, e.event_id, e.user_id,
       big.o_orderkey AS o_key,
       ROUND(big.o_totalprice, 2) AS v,
       STRFTIME(big.o_orderdate, '%Y-%m-%d %H:%M:%S') AS ds,
       CAST(NULL AS BIGINT) AS n
FROM events e
ASOF LEFT JOIN big ON e.user_id = big.o_custkey AND e.ts >= big.o_orderdate
UNION ALL
SELECT 'interval' AS kind, a.anchor_id AS event_id, a.a_user AS user_id,
       CAST(NULL AS BIGINT) AS o_key,
       ROUND(SUM(e.value), 2) AS v,
       CAST(NULL AS VARCHAR) AS ds,
       CAST(COUNT(*) AS BIGINT) AS n
FROM anchors a
JOIN events e ON e.user_id = a.a_user AND e.ts >= a.a_start AND e.ts < a.a_end
GROUP BY a.anchor_id, a.a_user
"""


@query("events_temporal_joins", oracle=_TEMPORAL_ORACLE)
def events_temporal_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join + interval join in one multi-kind lane (round-6 fold:
    the former events_asof_latest_order and events_interval_purchase_window
    lanes share one slot, each keeping its hash check in the UNION ALL).

    ``kind='asof'``: each event annotated with the user's most recent big
    order at event time (null if none). Spark side is the scalable
    union-and-window asof_join (one shuffle on user key); the oracle is
    DuckDB's native ASOF LEFT JOIN — an independent implementation of the
    same semantics, so a hash match is strong evidence of correctness.

    ``kind='interval'``: per purchase event, activity of the same user in
    the following hour (inclusive of the purchase itself). Spark side is
    the bucketed equi-join (shuffle on (user, hour-bucket), no nested
    loop); the oracle is the plain inequality join DuckDB can afford at
    sf0.01.
    """
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > BIG_ORDER
    )
    # asof_join requires the right side unique per (key, ts): keep the
    # max-orderkey order per (custkey, orderdate).
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    big = (
        orders.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    asof = asof_join(
        ev.select("event_id", "ts", "user_id"), big,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
    ).select(
        F.lit("asof").alias("kind"),
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("o_key"),
        F.round("o_totalprice", 2).alias("v"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ds"),
        F.lit(None).cast("long").alias("n"),
    )

    anchors = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("a_end"),
    )
    probe = ev.select("user_id", F.col("ts").alias("e_ts"), "value")
    interval = interval_join(
        probe, anchors,
        left_on="user_id", right_on="a_user",
        left_ts="e_ts", start="a_start", end="a_end",
        bucket="1 hour",
    ).groupBy("anchor_id", "a_user").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("v"),
    ).select(
        F.lit("interval").alias("kind"),
        F.col("anchor_id").alias("event_id"),
        F.col("a_user").alias("user_id"),
        F.lit(None).cast("long").alias("o_key"),
        "v",
        F.lit(None).cast("string").alias("ds"),
        "n",
    )
    return asof.unionByName(interval)
