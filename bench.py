"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count) after a
shared warmup that loads the session and touches each table once, so JVM
startup is not attributed to any query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "events_agg_by_type",
    "events_tumbling_window",
    "events_sessionization",
    "events_topk_users_per_type",
    "jp_filter_compare",
    "dedup_exact_hash",
    "text_quality_score",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from kinesiscat_spark.io_tables import TABLES, load_table
    from kinesiscat_spark.session import get_spark

    spark = get_spark("kinesiscat-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + parquet footers, not attributed to any query.
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
