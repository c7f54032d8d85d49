"""Dump .explain("formatted") for named lanes to plans/<round>/.

    python tools/dump_plans.py after lane [lane ...]   # suffix, then lanes

Diagnostic only — the committed plan files are the judge's evidence for
plan-shape claims (Exchange counts, join strategies, PushedFilters).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUND_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("KC_PLANS_ROUND", "r10"),
)


def main() -> None:
    suffix = sys.argv[1]
    lanes = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kinesiscat_spark.registry import all_queries
    from kinesiscat_spark.session import get_spark

    spark = get_spark("kc-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    os.makedirs(ROUND_DIR, exist_ok=True)
    for lane in lanes:
        df = qs[lane](spark, sf_dir)
        s = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(ROUND_DIR, f"{lane}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(s)
        print(f"wrote {path} ({len(s)} bytes)")


if __name__ == "__main__":
    main()
