"""Parquet table loaders for the driver's synthetic corpus.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Session-independence contract: events.parquet stores ts as parquet
        # TIMESTAMP(NANOS), which Spark refuses to read unless this legacy
        # conf is on. We set it at runtime here (it is a plain SQL conf, no
        # session rebuild needed) so the loader works in ANY SparkSession —
        # including externally-built harness sessions — not just our own
        # session.py builder.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS), surfaced as nanos-since-epoch long
        # (spark.sql.legacy.parquet.nanosAsLong) — truncate to micros, same
        # as DuckDB's ns→us cast, so both engines see identical timestamps.
        # integer div — float division would lose precision above 2^53 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition a map-heavy input to full parallelism — but only when it
    is under-partitioned.

    Single small parquet files (the local test corpus) scan as ONE input
    partition, which serializes every expensive per-row computation
    (signatures, hashes, per-pair folds) onto one core. At production scale
    the scan already yields thousands of partitions and this is a no-op —
    so the extra shuffle is paid exactly when it is cheap (input small
    enough to fit in few partitions) and skipped when it would be expensive.
    """
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= target:
        return df
    cols = [F.col(c) for c in key_cols]
    return df.repartition(target, *cols) if cols else df.repartition(target)
