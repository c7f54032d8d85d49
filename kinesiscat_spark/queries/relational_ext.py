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

# Round-6 fold (VERDICT r5 task 1): tpch_q4 + tpch_q13 share one lane slot
# under a `kind` column — both are orders-side aggregations whose individual
# hash checks survive intact in the UNION ALL oracle; the freed slot lets a
# round-5 flagship lane into the driver's verdicted 50.
_ORDERS_KINDS_ORACLE = """
SELECT 'q4_priority' AS kind, o_orderpriority AS k, CAST(COUNT(*) AS BIGINT) AS cnt
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
UNION ALL
SELECT 'q13_custdist' AS kind, CAST(c_count AS VARCHAR) AS k,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


@query("orders_priority_custdist", oracle=_ORDERS_KINDS_ORACLE)
def orders_priority_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 + Q13 in one multi-kind lane (round-6 fold).

    ``kind='q4_priority'``: EXISTS as a left-semi join orders->lineitem
    with a non-equi residual (l_shipdate > o_orderdate). One shuffle on
    orderkey; semi join emits each order at most once (no fan-out,
    unlike join+distinct).

    ``kind='q13_custdist'``: left outer join with an ON-clause predicate
    (customers keep a row even when every order is filtered out), then a
    two-level aggregation — the second groupBy runs over at most
    max-orders-per-customer distinct values, a negligible shuffle.
    """
    orders_q4 = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    hit = orders_q4.join(
        li,
        (orders_q4["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders_q4["o_orderdate"]),
        "left_semi",
    )
    q4 = hit.groupBy("o_orderpriority").agg(F.count("*").alias("cnt")).select(
        F.lit("q4_priority").alias("kind"),
        F.col("o_orderpriority").alias("k"),
        "cnt",
    )

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
    q13 = per_cust.groupBy("c_count").agg(F.count("*").alias("cnt")).select(
        F.lit("q13_custdist").alias("kind"),
        F.col("c_count").cast("string").alias("k"),
        "cnt",
    )
    return q4.unionByName(q13)


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


# Round-6 fold: ROLLUP (orders revenue) + CUBE (documents counts) share one
# lane slot under `kind` — the complete grouping-set taxonomy in one lane,
# each side keeping its full hash check via the UNION ALL oracle.
_GROUPING_SETS_ORACLE = """
SELECT 'rollup_revenue' AS kind, n.n_name AS g1, c.c_mktsegment AS g2,
       CAST(GROUPING(n.n_name, c.c_mktsegment) AS BIGINT) AS gid,
       ROUND(SUM(o.o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(NULL AS DOUBLE) AS avg_chars
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
UNION ALL
SELECT 'cube_docs' AS kind, lang AS g1, source AS g2,
       CAST(GROUPING(lang, source) AS BIGINT) AS gid,
       CAST(NULL AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(NULL AS BIGINT) AS n_customers,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents
GROUP BY CUBE (lang, source)
"""


@query("revenue_rollup_nation_segment", oracle=_GROUPING_SETS_ORACLE)
def revenue_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets, both taxonomies in one multi-kind lane (round-6 fold
    of the former docs_cube_lang_source lane).

    ``kind='rollup_revenue'``: revenue by (nation, segment), by nation, and
    grand total in one pass, plus an exact count-distinct per grouping set
    (expand + two-phase distinct aggregation). nation broadcasts (25 rows
    at any SF); customer->orders shuffles on custkey; the rollup itself is
    a single expand+aggregate, not three scans.

    ``kind='cube_docs'``: all four lang x source combinations in one
    expand+aggregate pass. Both dimensions are low-cardinality, so the
    expand multiplies rows 4x pre-shuffle but the partial aggregate
    collapses them immediately; the exchange carries ~|langs x sources|
    rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    rollup = joined.rollup("n_name", "c_mktsegment").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
    ).select(
        F.lit("rollup_revenue").alias("kind"),
        F.col("n_name").alias("g1"),
        F.col("c_mktsegment").alias("g2"),
        "gid",
        "revenue",
        "n_rows",
        "n_customers",
        F.lit(None).cast("double").alias("avg_chars"),
    )
    docs = load_table(spark, sf_dir, "documents")
    cube = docs.cube("lang", "source").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_rows"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    ).select(
        F.lit("cube_docs").alias("kind"),
        F.col("lang").alias("g1"),
        F.col("source").alias("g2"),
        "gid",
        F.lit(None).cast("double").alias("revenue"),
        "n_rows",
        F.lit(None).cast("long").alias("n_customers"),
        "avg_chars",
    )
    return rollup.unionByName(cube)


# Round-6 fold: Q17 + Q6 — the two single-row lineitem aggregates — share
# one lane slot under `kind`, each keeping its hash check in the UNION ALL.
_LINEITEM_SCALAR_ORACLE = """
SELECT 'q17_avg_yearly' AS kind,
       ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS value,
       CAST(NULL AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
UNION ALL
SELECT 'q6_revenue' AS kind,
       ROUND(SUM(l_extendedprice * l_discount), 2) AS value,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("lineitem_scalar_aggregates", oracle=_LINEITEM_SCALAR_ORACLE)
def lineitem_scalar_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 + Q6 in one multi-kind lane (round-6 fold).

    ``kind='q17_avg_yearly'``: correlated scalar subquery, decorrelated
    into an aggregate-then-join — per-part avg quantity is |part|-sized
    (~200× smaller than lineitem), so AQE broadcasts it; the brand filter
    prunes the probe side at the scan.

    ``kind='q6_revenue'``: the pure pushdown query. All three predicates
    reach the parquet reader (range + between + less-than), the scan reads
    4 columns of 11, and the aggregation is a single map-side partial ->
    one-row exchange. At 100 TB this is I/O-bound by exactly the bytes the
    row-group statistics can't skip."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    q17 = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(per_part, li["l_partkey"] == per_part["ap_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("value"))
        .select(
            F.lit("q17_avg_yearly").alias("kind"),
            "value",
            F.lit(None).cast("long").alias("n_items"),
        )
    )
    q6 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "value"
            ),
            F.count("*").alias("n_items"),
        )
        .select(F.lit("q6_revenue").alias("kind"), "value", "n_items")
    )
    return q17.unionByName(q6)


# Round-6 fold: analytic windows + exact percentiles + set operations in
# one multi-kind lane.  The three sub-lanes touch disjoint columns, so the
# union schema carries NULLs where a kind has no value; every sub-lane's
# hash check survives in the UNION ALL oracle.  Column mapping:
#   kind='running':  key_i=o_custkey, key_i2=o_orderkey, n=order_seq,
#                    v1=running_total, v2=days_since_prev (double-cast)
#   kind='pctl':     key_s=event_type, n=count, v1=p50, v2=p95, v3=max
#   kind='setops':   key_s=cohort, key_i=user_id
_ANALYTICS_ORACLE = """
SELECT 'running' AS kind, CAST(NULL AS VARCHAR) AS key_s,
       o_custkey AS key_i, o_orderkey AS key_i2,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS n,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS v1,
       CAST(DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS DOUBLE)
         AS v2,
       CAST(NULL AS DOUBLE) AS v3
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
UNION ALL
SELECT 'pctl' AS kind, event_type AS key_s,
       CAST(NULL AS BIGINT) AS key_i, CAST(NULL AS BIGINT) AS key_i2,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(QUANTILE_CONT(value, 0.5), 6) AS v1,
       ROUND(QUANTILE_CONT(value, 0.95), 6) AS v2,
       ROUND(MAX(value), 6) AS v3
FROM events
GROUP BY event_type
UNION ALL
SELECT 'setops' AS kind, cohort AS key_s, user_id AS key_i,
       CAST(NULL AS BIGINT) AS key_i2, CAST(NULL AS BIGINT) AS n,
       CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2,
       CAST(NULL AS DOUBLE) AS v3
FROM (
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
)
"""


@query("analytics_windows_setops", oracle=_ANALYTICS_ORACLE)
def analytics_windows_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows + exact percentiles + set operations in one
    multi-kind lane (round-6 fold of three single-operator lanes).

    ``kind='running'``: running sum, row_number, lag over a composite
    deterministic ordering (date, orderkey — ties broken). One shuffle
    on custkey serves all three window functions (same partitioning).

    ``kind='pctl'``: exact interpolated percentiles per group (matches
    QUANTILE_CONT). Exact percentile sorts within each group — fine for
    bounded group counts; at 100 TB swap to approx_percentile (t-digest
    sketch, mergeable map-side) and drop the hash-exact oracle.

    ``kind='setops'``: EXCEPT / INTERSECT / UNION ALL building user
    cohorts. Spark plans set ops as aggregates over a union — one
    shuffle on user_id each."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = orders.select(
        F.lit("running").alias("kind"),
        F.lit(None).cast("string").alias("key_s"),
        F.col("o_custkey").alias("key_i"),
        F.col("o_orderkey").alias("key_i2"),
        F.row_number().over(w).cast("long").alias("n"),
        F.round(F.sum("o_totalprice").over(wrows), 2).alias("v1"),
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
        .cast("double")
        .alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )

    ev = load_table(spark, sf_dir, "events")
    pctl = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("v1"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("v2"),
        F.round(F.max("value"), 6).alias("v3"),
    ).select(
        F.lit("pctl").alias("kind"),
        F.col("event_type").alias("key_s"),
        F.lit(None).cast("long").alias("key_i"),
        F.lit(None).cast("long").alias("key_i2"),
        "n",
        "v1",
        "v2",
        "v3",
    )

    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    cohorts = clickers.subtract(buyers).select(
        F.lit("click_only").alias("cohort"), "user_id"
    ).unionAll(
        clickers.intersect(buyers).select(
            F.lit("click_and_purchase").alias("cohort"), "user_id"
        )
    )
    setops = cohorts.select(
        F.lit("setops").alias("kind"),
        F.col("cohort").alias("key_s"),
        F.col("user_id").alias("key_i"),
        F.lit(None).cast("long").alias("key_i2"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )
    return running.unionByName(pctl).unionByName(setops)
