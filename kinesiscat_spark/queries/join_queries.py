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

_ASOF_ORACLE = f"""
WITH big AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
         MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders
  WHERE o_totalprice > {BIG_ORDER}
  GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       big.o_orderkey AS last_big_orderkey,
       ROUND(big.o_totalprice, 2) AS last_big_price,
       STRFTIME(big.o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_big_date
FROM events e
ASOF LEFT JOIN big ON e.user_id = big.o_custkey AND e.ts >= big.o_orderdate
"""


@query("events_asof_latest_order", oracle=_ASOF_ORACLE)
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event annotated with the user's most recent big
    order at event time (null if none). Spark side is the scalable
    union-and-window asof_join (one shuffle on user key); the oracle is
    DuckDB's native ASOF LEFT JOIN — an independent implementation.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
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
    out = asof_join(
        ev, big,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_big_orderkey"),
        F.round("o_totalprice", 2).alias("last_big_price"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("last_big_date"),
    )


_INTERVAL_ORACLE = """
WITH anchors AS (
  SELECT event_id AS anchor_id, user_id AS a_user, ts AS a_start,
         ts + INTERVAL 1 HOUR AS a_end
  FROM events WHERE event_type = 'purchase'
)
SELECT a.anchor_id, a.a_user,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 2) AS sum_value
FROM anchors a
JOIN events e ON e.user_id = a.a_user AND e.ts >= a.a_start AND e.ts < a.a_end
GROUP BY a.anchor_id, a.a_user
"""


@query("events_interval_purchase_window", oracle=_INTERVAL_ORACLE)
def events_interval_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: per purchase event, activity of the same user in the
    following hour (inclusive of the purchase itself). Spark side is the
    bucketed equi-join (shuffle on (user, hour-bucket), no nested loop);
    the oracle is the plain inequality join DuckDB can afford at sf0.01.
    """
    ev = load_table(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("a_end"),
    )
    probe = ev.select("user_id", F.col("ts").alias("e_ts"), "value")
    out = interval_join(
        probe, anchors,
        left_on="user_id", right_on="a_user",
        left_ts="e_ts", start="a_start", end="a_end",
        bucket="1 hour",
    )
    return out.groupBy("anchor_id", "a_user").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
