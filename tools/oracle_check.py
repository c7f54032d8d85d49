"""Local mirror of the driver's t2 correctness gate.

For each registered query: run the Spark DataFrame and the DuckDB oracle SQL
on the same sf dir, then compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized). Used by tests/test_oracle_parity.py and runnable standalone:

    python tools/oracle_check.py [sf_dir] [query ...]
    python tools/oracle_check.py --bare [sf_dir] [query ...]

``--bare`` builds a default SparkSession (no engine confs at all) to mirror
the driver's harness-owned session — the session-independence gate.
"""

from __future__ import annotations

import math
import sys
from datetime import datetime

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    """Canonicalize one cell so Spark and DuckDB results compare equal."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (datetime, pd.Timestamp)):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    spark_pdf = spark_df.toPandas()
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return False, f"columns: spark={sc} oracle={oc}"
    srows, orows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if srows != orows:
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                return False, f"first diff at sorted row {i}:\n  spark={a}\n  oracle={b}"
        return False, "rows differ (tail)"
    return True, "ok"


def main() -> None:
    argv = sys.argv[1:]
    bare = "--bare" in argv
    if bare:
        argv = [a for a in argv if a != "--bare"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    if bare:
        # Driver-equivalent session: defaults only, no engine tuning.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[*]").appName(
            "oracle-check-bare"
        ).getOrCreate()
    else:
        from kinesiscat_spark.session import get_spark

        spark = get_spark("oracle-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_con(sf_dir)
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"{name:40s} ROWS-ONLY ({n} rows)")
            continue
        try:
            ok, msg = compare(fn(spark, sf_dir), con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "OK" if ok else "FAIL"
        print(f"{name:40s} {status}" + ("" if ok else f"  {msg}"))
        if not ok:
            failed.append(name)
    if failed:
        print(f"\nFAILED ({len(failed)}): {failed}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
