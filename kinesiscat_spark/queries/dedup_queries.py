"""Deduplication queries over `documents` (extension surface X1/X2).

Scale design: exact dedup is a hash-partitioned aggregation on the dedup key
— at 100 TB the key should be a fixed-width digest (sha2) rather than the
full text so the shuffle moves 32 bytes/row instead of documents. Near-dup
variants (MinHash LSH, SimHash, n-gram Jaccard) live in
kinesiscat_spark.operators.dedup and register their own queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.registry import query


@query(
    "dedup_exact",
    oracle="""
SELECT
  CAST(MIN(doc_id) AS BIGINT) AS doc_id,
  text,
  CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup: keep the lowest doc_id per identical text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_copies"),
    ).select("doc_id", "text", "n_copies")


@query(
    "dedup_exact_hash",
    oracle="""
SELECT
  sha256(text) AS text_hash,
  CAST(MIN(doc_id) AS BIGINT) AS doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY sha256(text)
""",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 at scale: dedup on a sha-256 digest — fixed-width shuffle key.

    At 100 TB the digest is computed in the scan stage (codegen) and only
    (digest, doc_id) shuffles; the text column never moves.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2("text", 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
    )
