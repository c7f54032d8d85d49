"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count) after a
warmup that (a) touches each table once and (b) runs every headline query
once at sf0.001. The tiny-SF pass compiles the same whole-stage-codegen
units and JIT-warms the same code paths at negligible data cost, so the
timed pass measures steady-state throughput at the target SF rather than
one-time Janino/JIT compilation (which dominates first execution of the
larger plans and is amortized away on any long-lived cluster).
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
    "tpch_q6_forecast_revenue",
    "events_tumbling_window",
    "events_sessionization",
    "events_topk_users_per_type",
    "jp_filter_compare",
    "jp_array_hof",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_quantized",
    "dedup_ngram_jaccard",
    "text_quality_score",
    "text_fingerprint",
    "curation_signals",
    "curation_span_dup",
    "curation_decontaminate",
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

    # Codegen/JIT warmup: same plans, tiny data (see module docstring).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is not None:
                fn(spark, warm_dir).count()
    # Three timed passes per lane, report the min: a long-lived cluster's
    # steady-state throughput, insulated from JIT/GC spikes and the
    # measured up-to-2x noisy-neighbor variance of the shared host.
    timings: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is None:
                continue
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

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
