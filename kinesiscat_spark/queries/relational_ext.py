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
from kinesiscat_spark.queries.relational import PARTSUPP_SQL, derived_partsupp
from kinesiscat_spark.registry import query

# Round-6 fold (VERDICT r5 task 1): tpch_q4 + tpch_q13 share one lane slot
# under a `kind` column — both are orders-side aggregations whose individual
# hash checks survive intact in the UNION ALL oracle; the freed slot lets a
# round-5 flagship lane into the driver's verdicted 50.
# Round-6 widening: Q12 (late-shipment priority classification, adapted to
# the trimmed schema — no l_shipmode/l_receiptdate, so "late" is
# l_shipdate > o_orderdate + 90 days bucketed by ship year) and Q22
# (positive-balance scalar subquery + anti join + per-nation aggregate,
# adapted — no c_phone, so the country-code grouping becomes the nation and
# "no orders" becomes "no URGENT orders" to stay non-degenerate on a corpus
# where nearly every customer has orders) join the lane.
_ORDERS_KINDS_ORACLE = f"""
SELECT 'q4_priority' AS kind, o_orderpriority AS k,
       CAST(COUNT(*) AS BIGINT) AS cnt, CAST(NULL AS BIGINT) AS cnt2,
       CAST(NULL AS DOUBLE) AS bal
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
       CAST(COUNT(*) AS BIGINT) AS cnt, CAST(NULL AS BIGINT) AS cnt2,
       CAST(NULL AS DOUBLE) AS bal
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
UNION ALL
SELECT 'q12_late_lines' AS kind, CAST(YEAR(l_shipdate) AS VARCHAR) AS k,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS cnt2,
       CAST(NULL AS DOUBLE) AS bal
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY YEAR(l_shipdate)
UNION ALL
SELECT 'q22_idle_balance' AS kind, n_name AS k,
       CAST(COUNT(*) AS BIGINT) AS cnt, CAST(NULL AS BIGINT) AS cnt2,
       ROUND(SUM(c_acctbal), 2) AS bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY n_name
UNION ALL
SELECT 'q11_important_stock' AS kind, CAST(ps_partkey AS VARCHAR) AS k,
       CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS BIGINT) AS cnt2,
       ROUND(SUM(ps_supplycost * ps_availqty), 2) AS bal
FROM ({PARTSUPP_SQL}) partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_5'
GROUP BY ps_partkey
HAVING SUM(ps_supplycost * ps_availqty) > (
  SELECT SUM(ps_supplycost * ps_availqty) * 0.002
  FROM ({PARTSUPP_SQL}) ps2, supplier s2, nation n2
  WHERE ps2.ps_suppkey = s2.s_suppkey AND s2.s_nationkey = n2.n_nationkey
    AND n2.n_name = 'NATION_5'
)
UNION ALL
SELECT 'q16_supplier_cnt' AS kind,
       p_brand || '|' || p_type || '|' || CAST(p_size AS VARCHAR) AS k,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS cnt,
       CAST(NULL AS BIGINT) AS cnt2, CAST(NULL AS DOUBLE) AS bal
FROM ({PARTSUPP_SQL}) partsupp, part
WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
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

    ``kind='q12_late_lines'`` (round-6 widening): non-equi lateness
    predicate (l_shipdate > o_orderdate + 90 days) evaluated inside the
    equi join's codegen — the join itself shuffles only on orderkey; both
    priority CASE branches fold into one partial aggregate keyed by ship
    year (a handful of groups at any SF).

    ``kind='q22_idle_balance'`` (round-6 widening): scalar subquery (the
    positive-balance mean broadcasts as a 1-row literal join), anti join
    against URGENT orders (pushed filter makes the build side small), and
    a per-nation aggregate. customer is dim-sized; nothing here scales
    with lineitem.

    ``kind='q11_important_stock'`` / ``kind='q16_supplier_cnt'`` (round-6
    widening, derived partsupp — relational.PARTSUPP_SQL): Q11's grouped
    HAVING against a scalar total (both aggregates share one semi-joined
    partsupp subtree; the threshold broadcasts as a 1-row join) and Q16's
    NOT IN as a left-anti join + exact count-distinct per (brand, type,
    size).
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
    _pad = [
        F.lit(None).cast("long").alias("cnt2"),
        F.lit(None).cast("double").alias("bal"),
    ]
    q4 = hit.groupBy("o_orderpriority").agg(F.count("*").alias("cnt")).select(
        F.lit("q4_priority").alias("kind"),
        F.col("o_orderpriority").alias("k"),
        "cnt",
        *_pad,
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
        *_pad,
    )

    li_all = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    q12 = (
        li_all.join(orders, li_all["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("cnt"),
            F.sum(F.when(high, 0).otherwise(1)).alias("cnt2"),
        )
        .select(
            F.lit("q12_late_lines").alias("kind"),
            F.col("ship_year").cast("string").alias("k"),
            "cnt",
            "cnt2",
            F.lit(None).cast("double").alias("bal"),
        )
    )

    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    q22 = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, F.col("c_custkey") == urgent["o_custkey"], "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
        .select(
            F.lit("q22_idle_balance").alias("kind"),
            F.col("n_name").alias("k"),
            "cnt",
            F.lit(None).cast("long").alias("cnt2"),
            "bal",
        )
    )

    # Q11 + Q16 (round-6 widening, derived partsupp — relational.PARTSUPP_SQL)
    supp = load_table(spark, sf_dir, "supplier")
    ps = derived_partsupp(spark, sf_dir)
    n5_supp = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_5")),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey")
    ps_n5 = ps.join(
        F.broadcast(n5_supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    stock_value = F.sum(F.col("ps_supplycost") * F.col("ps_availqty"))
    per_part = ps_n5.groupBy("ps_partkey").agg(stock_value.alias("_val"))
    total = ps_n5.agg((stock_value * 0.002).alias("_thresh"))
    q11 = (
        per_part.join(F.broadcast(total))
        .filter(F.col("_val") > F.col("_thresh"))
        .select(
            F.lit("q11_important_stock").alias("kind"),
            F.col("ps_partkey").cast("string").alias("k"),
            F.lit(None).cast("long").alias("cnt"),
            F.lit(None).cast("long").alias("cnt2"),
            F.round("_val", 2).alias("bal"),
        )
    )

    part16 = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    q16 = (
        ps.join(F.broadcast(part16), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("cnt"))
        .select(
            F.lit("q16_supplier_cnt").alias("kind"),
            F.concat_ws(
                "|",
                "p_brand",
                "p_type",
                F.col("p_size").cast("string"),
            ).alias("k"),
            "cnt",
            F.lit(None).cast("long").alias("cnt2"),
            F.lit(None).cast("double").alias("bal"),
        )
    )
    return (
        q4.unionByName(q13)
        .unionByName(q12)
        .unionByName(q22)
        .unionByName(q11)
        .unionByName(q16)
    )


# Round-6 widening: Q15 (top supplier by quarter revenue — aggregate view
# + scalar-subquery max) and Q21 (suppliers who kept multi-supplier orders
# waiting — EXISTS + NOT EXISTS double correlation, adapted to the trimmed
# schema: no l_receiptdate/l_commitdate, so "late" is
# l_shipdate > o_orderdate + 60 days) join the anti-join lane — the
# existential-pattern family in one multi-kind slot.
_ANTI_ORACLE = f"""
SELECT 'no_big_orders' AS kind, c_custkey AS key, c_name AS name,
       ROUND(c_acctbal, 2) AS value, CAST(NULL AS BIGINT) AS cnt
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
UNION ALL
SELECT 'q15_top_supplier' AS kind, s_suppkey AS key, s_name AS name,
       ROUND(total_revenue, 2) AS value, CAST(NULL AS BIGINT) AS cnt
FROM supplier JOIN (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
) rev ON s_suppkey = l_suppkey
WHERE total_revenue = (
  SELECT MAX(total_revenue) FROM (
    SELECT SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
  )
)
UNION ALL
SELECT 'q21_waiting' AS kind, s_suppkey AS key, s_name AS name,
       CAST(NULL AS DOUBLE) AS value, CAST(COUNT(*) AS BIGINT) AS cnt
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_suppkey, s_name
UNION ALL
SELECT 'q20_excess_stock' AS kind, s_suppkey AS key, s_name AS name,
       ROUND(s_acctbal, 2) AS value, CAST(NULL AS BIGINT) AS cnt
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT ps_suppkey FROM ({PARTSUPP_SQL}) partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')
      AND ps_availqty > (
        SELECT 0.5 * SUM(l_quantity) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
      )
  )
  AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
"""


@query("customers_no_big_orders", oracle=_ANTI_ORACLE)
def customers_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existential relational patterns in one multi-kind lane (round-6
    widening of the anti-join lane with TPC-H Q15 + Q21).

    ``kind='no_big_orders'``: NOT EXISTS as a left-anti join. The price
    filter is applied to the orders side BEFORE the join, so the anti join
    is a pure equi-join — pushdown-friendly and skew-safe.

    ``kind='q15_top_supplier'``: the revenue view aggregates lineitem down
    to |supplier| rows ONCE and is reused for both the per-supplier rows
    and the scalar max (Spark caches nothing here — the view is tiny, the
    max is a 1-row broadcast cross join, and the quarter filter reaches
    the scan).

    ``kind='q21_waiting'``: double-correlated existence — the late-lines
    set is computed once; EXISTS becomes a left-semi join against raw
    lineitem on orderkey with a suppkey<> residual, NOT EXISTS a left-anti
    join against the late set itself. Both shuffle on orderkey (the same
    key as the build), no fan-out, count per supplier at the end.

    ``kind='q20_excess_stock'`` (round-6 widening, derived partsupp —
    relational.PARTSUPP_SQL): nested IN chains as semi joins; the
    correlated half-quantity subquery decorrelates into an aggregate on
    the SAME (partkey, suppkey) composite key as the partsupp probe.
    """
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    anti = cust.join(
        big, cust["c_custkey"] == big["o_custkey"], "left_anti"
    ).select(
        F.lit("no_big_orders").alias("kind"),
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("value"),
        F.lit(None).cast("long").alias("cnt"),
    )

    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("_max_rev"))
    q15 = (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.lit("q15_top_supplier").alias("kind"),
            F.col("s_suppkey").alias("key"),
            F.col("s_name").alias("name"),
            F.round("total_revenue", 2).alias("value"),
            F.lit(None).cast("long").alias("cnt"),
        )
    )

    orders = load_table(spark, sf_dir, "orders")
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        )
        .select(
            F.col("l_orderkey").alias("_lok"), F.col("l_suppkey").alias("_lsk")
        )
    )
    others = li.select(
        F.col("l_orderkey").alias("_ook"), F.col("l_suppkey").alias("_osk")
    )
    late_other = late.select(
        F.col("_lok").alias("_xok"), F.col("_lsk").alias("_xsk")
    )
    q21 = (
        late.join(
            others,
            (F.col("_lok") == F.col("_ook")) & (F.col("_lsk") != F.col("_osk")),
            "left_semi",
        )
        .join(
            late_other,
            (F.col("_lok") == F.col("_xok")) & (F.col("_lsk") != F.col("_xsk")),
            "left_anti",
        )
        .groupBy("_lsk")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(supp), F.col("_lsk") == F.col("s_suppkey"))
        .select(
            F.lit("q21_waiting").alias("kind"),
            F.col("s_suppkey").alias("key"),
            F.col("s_name").alias("name"),
            F.lit(None).cast("double").alias("value"),
            "cnt",
        )
    )

    # Q20 (round-6 widening, derived partsupp): suppliers holding excess
    # stock of STANDARD parts relative to what they shipped in 1997.
    # The correlated half-quantity subquery decorrelates into an aggregate
    # keyed on (partkey, suppkey) — the SAME composite key as the partsupp
    # probe, one narrow join; an empty correlation group never matches
    # (inner join == the SQL NULL-comparison exclusion).
    ps = derived_partsupp(spark, sf_dir)
    std_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("_qpk"), F.col("l_suppkey").alias("_qsk")
        )
        .agg((F.sum("l_quantity") * 0.5).alias("_half_qty"))
    )
    excess_supp = (
        ps.join(F.broadcast(std_parts), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("_qpk"))
            & (F.col("ps_suppkey") == F.col("_qsk")),
        )
        .filter(F.col("ps_availqty") > F.col("_half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_1%")
    )
    q20 = (
        supp.join(
            F.broadcast(excess_supp),
            supp["s_suppkey"] == F.col("ps_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.lit("q20_excess_stock").alias("kind"),
            F.col("s_suppkey").alias("key"),
            F.col("s_name").alias("name"),
            F.round("s_acctbal", 2).alias("value"),
            F.lit(None).cast("long").alias("cnt"),
        )
    )
    return anti.unionByName(q15).unionByName(q21).unionByName(q20)


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
# Round-6 widening: Q14 (promo revenue share — conditional aggregation over
# a part join) and Q19 (disjunctive multi-range predicates spanning the
# join: OR-of-ANDs over brand/quantity/size) join the lane, completing the
# single-row lineitem-aggregate family. Q19 is adapted to the trimmed
# schema (no p_container/l_shipmode in the corpus); Q14's p_type domain is
# categorical here, so the PROMO% prefix match is an equality.
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
UNION ALL
SELECT 'q14_promo_share' AS kind,
       ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS value,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
UNION ALL
SELECT 'q19_disjunctive' AS kind,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS value,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
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
    row-group statistics can't skip.

    ``kind='q14_promo_share'`` (round-6 widening): conditional aggregation
    over a broadcast part join — the shipdate month filter reaches the
    lineitem scan, part broadcasts at any SF, and both SUM branches fold
    into one partial aggregate (a single pass, not two).

    ``kind='q19_disjunctive'`` (round-6 widening): OR-of-ANDs predicates
    spanning the join. The per-table halves of each conjunct
    (brand+size on part, quantity on lineitem) are NOT separable without
    changing semantics, so the disjunction evaluates post-join inside
    codegen; Catalyst still pushes the derivable per-side domain bounds
    (brand IN (...), quantity <= 30) to the scans."""
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
    part_all = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    q14 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part_all), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("value"),
            F.count("*").alias("n_items"),
        )
        .select(F.lit("q14_promo_share").alias("kind"), "value", "n_items")
    )
    q19 = (
        li.join(F.broadcast(part_all), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (
                (F.col("p_brand") == "Brand#12")
                & F.col("l_quantity").between(1, 11)
                & F.col("p_size").between(1, 5)
            )
            | (
                (F.col("p_brand") == "Brand#23")
                & F.col("l_quantity").between(10, 20)
                & F.col("p_size").between(1, 10)
            )
            | (
                (F.col("p_brand") == "Brand#34")
                & F.col("l_quantity").between(20, 30)
                & F.col("p_size").between(1, 15)
            )
        )
        .agg(
            F.round(F.sum(rev), 2).alias("value"),
            F.count("*").alias("n_items"),
        )
        .select(F.lit("q19_disjunctive").alias("kind"), "value", "n_items")
    )
    return q17.unionByName(q6).unionByName(q14).unionByName(q19)


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
