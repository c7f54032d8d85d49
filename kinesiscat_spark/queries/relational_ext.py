"""Extended relational surface: semi/anti joins, rollup grouping sets,
outer-join distributions, scalar-subquery patterns, analytic windows,
exact percentiles, and set operations.

None of this exists in the reference (SURVEY §2.4 — no cross-record
relational algebra at all); it comes with Spark and is exercised here so
the engine's inventory covers the full relational operator taxonomy a
user would expect when switching from the reference plus a warehouse.

Scale notes (100 TB): semi/anti joins shuffle once on the equi key and
short-circuit per match (no fan-out); the rollup is a single shuffle with
partial aggregation per grouping set; q13's outer join shuffles on
custkey then re-aggregates a tiny (distinct-count-sized) intermediate;
q17's per-part average is itself an aggregate (small relative to
lineitem) and AQE picks broadcast vs shuffle join by its actual size;
windows sort within partition keys only; percentiles here are exact
(sorted-within-group) — at 100 TB swap in approx_percentile (t-digest)
and accept the oracle delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.registry import query

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@query("tpch_q4_order_priority", oracle=_Q4_ORACLE)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS: left-semi join orders->lineitem with a
    non-equi residual (l_shipdate > o_orderdate). One shuffle on
    orderkey; semi join emits each order at most once (no fan-out,
    unlike join+distinct)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    hit = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


_ANTI_ORACLE = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
"""


@query("customers_no_big_orders", oracle=_ANTI_ORACLE)
def customers_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join. The price filter is applied to the
    orders side BEFORE the join, so the anti join is a pure equi-join —
    pushdown-friendly and skew-safe."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust["c_custkey"] == big["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))


_ROLLUP_ORACLE = """
SELECT n.n_name, c.c_mktsegment,
       CAST(GROUPING(n.n_name, c.c_mktsegment) AS BIGINT) AS gid,
       ROUND(SUM(o.o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
"""


@query("revenue_rollup_nation_segment", oracle=_ROLLUP_ORACLE)
def revenue_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: revenue by (nation, segment), by nation, and
    grand total in one pass, plus an exact count-distinct per grouping set
    (expand + two-phase distinct aggregation). nation broadcasts (25 rows
    at any SF); customer->orders shuffles on custkey; the rollup itself is
    a single expand+aggregate, not three scans."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    return joined.rollup("n_name", "c_mktsegment").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    ).select("n_name", "c_mktsegment", "gid", "revenue", "n_orders", "n_customers")


_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


@query("tpch_q13_order_distribution", oracle=_Q13_ORACLE)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: left outer join with an ON-clause predicate
    (customers keep a row even when every order is filtered out), then a
    two-level aggregation. The second groupBy runs over at most
    max-orders-per-customer distinct values — negligible shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q17_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("tpch_q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar subquery, decorrelated into an
    aggregate-then-join: per-part avg quantity is |part|-sized (~200×
    smaller than lineitem), so AQE broadcasts it; the brand filter
    prunes the probe side at the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    out = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(per_part, li["l_partkey"] == per_part["ap_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_limit"))
    )
    return out.agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total,
       CAST(DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS INT)
         AS days_since_prev
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("customer_running_revenue", oracle=_RUNNING_ORACLE)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running sum, row_number, lag over a composite
    deterministic ordering (date, orderkey — ties broken). One shuffle
    on custkey serves all three window functions (same partitioning)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.round(F.sum("o_totalprice").over(wrows), 2).alias("running_total"),
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    )


_PCTL_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(QUANTILE_CONT(value, 0.5), 6) AS p50,
       ROUND(QUANTILE_CONT(value, 0.95), 6) AS p95,
       ROUND(MAX(value), 6) AS max_value
FROM events
GROUP BY event_type
"""


@query("events_value_percentiles", oracle=_PCTL_ORACLE)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (matches QUANTILE_CONT).
    Exact percentile sorts within each group — fine for bounded group
    counts; at 100 TB swap to approx_percentile (t-digest sketch,
    mergeable map-side) and drop the hash-exact oracle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


_SETOPS_ORACLE = """
SELECT 'click_only' AS cohort, user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT 'click_and_purchase' AS cohort, user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
"""


@query("event_cohort_set_ops", oracle=_SETOPS_ORACLE)
def event_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (EXCEPT / INTERSECT / UNION ALL) building user
    cohorts. Spark plans set ops as aggregates over a union — one
    shuffle on user_id each; both inputs come from one cached scan."""
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    click_only = clickers.subtract(buyers).select(
        F.lit("click_only").alias("cohort"), "user_id"
    )
    both = clickers.intersect(buyers).select(
        F.lit("click_and_purchase").alias("cohort"), "user_id"
    )
    return click_only.unionAll(both)


_Q6_ORACLE = """
SELECT
  ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6_forecast_revenue", oracle=_Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: the pure pushdown query. All three predicates reach
    the parquet reader (range + between + less-than), the scan reads 4
    columns of 11, and the aggregation is a single map-side partial ->
    one-row exchange. At 100 TB this is I/O-bound by exactly the bytes the
    row-group statistics can't skip."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


_CUBE_ORACLE = """
SELECT lang, source,
       CAST(GROUPING(lang, source) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents
GROUP BY CUBE (lang, source)
"""


@query("docs_cube_lang_source", oracle=_CUBE_ORACLE)
def docs_cube_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all four combinations of lang x source) in one
    expand+aggregate pass — completes the grouping-set taxonomy next to
    the ROLLUP lane. Both dimensions are low-cardinality, so the expand
    multiplies rows 4x pre-shuffle but the partial aggregate collapses
    them immediately; the exchange carries ~|langs x sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    ).select("lang", "source", "gid", "n_docs", "avg_chars")
