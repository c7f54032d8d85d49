"""Similarity-search queries over `embeddings` (extension surface X3/X4).

Exact brute-force cosine top-k has a DuckDB SQL twin (unnest-free list
lambdas, double math in identical left-to-right order). The LSH variant is
approximate → rows-only check, plus a recall test in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.similarity import cosine_topk, lsh_topk
from kinesiscat_spark.registry import query

N_QUERIES = 5
TOP_K = 10
DIM = 64

_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS cid, embedding AS ce
  FROM embeddings WHERE vec_id >= {N_QUERIES}
),
pairs AS (
  SELECT
    qid, cid,
    list_sum(list_transform(list_zip(qe, ce),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn,
    sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cn
  FROM c CROSS JOIN q
),
ranked AS (
  SELECT
    qid, cid, dot / (qn * cn) AS sim,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot / (qn * cn) DESC, cid) AS rnk
  FROM pairs
)
SELECT qid, cid, ROUND(sim, 6) AS sim, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


@query("similarity_topk_exact", oracle=_TOPK_ORACLE)
def similarity_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X4 exact: top-10 cosine neighbors for the first 5 vectors.

    Query set broadcasts; the corpus never shuffles — the rank window's
    WindowGroupLimit keeps only k rows per query per partition before the
    single small exchange.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    out = cosine_topk(corpus, queries, TOP_K)
    return out.select("qid", "cid", F.round("sim", 6).alias("sim"), "rnk")


@query("similarity_topk_lsh", oracle=None)  # approximate -> rows-only
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 approximate: random-hyperplane LSH bucket join + exact re-rank.

    Recall vs the exact result is asserted in tests/test_similarity.py;
    here the driver records row counts (≤ k rows per query)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    out = lsh_topk(corpus, queries, TOP_K, DIM, n_planes=16, n_bands=4)
    return out.select("qid", "cid", F.round("sim", 6).alias("sim"), "rnk")
