"""Hybrid-retrieval lane: BM25 lexical + exact-cosine vector top-k fused
with reciprocal-rank fusion (Cormack et al., SIGIR'09) — the last
previously pytest-only query operator, now with a full DuckDB hash twin.

RRF is rank-arithmetic only, which is what makes the cross-engine hash
exact: each contribution is ``1/(60 + rank)`` (identical IEEE division
in both engines) and each fused document sums at most one lexical and
one vector contribution — a two-term float sum is order-independent
(addition is commutative; non-associativity needs ≥3 terms), so no
rounding dance is required anywhere.

The lexical CTEs reuse the exact formulas of the hash-green
`text_bm25_topk` lane, rendered from the SAME imported constants so the
two can never drift; the vector CTEs are the `similarity_topk_exact`
shape restricted to the single query vec_id = 0.

Registered past the driver's 50-lane cap (like text_bpe_train /
text_quality_classifier); `tests/test_oracle_parity.py` runs the
identical sf0.01 hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.queries.text_queries import _BM25_B, _BM25_K1, _BM25_TERMS
from kinesiscat_spark.registry import query

_HY_LEX_K = 20
_HY_VEC_K = 20
_HY_RRF_K = 60
_HY_TOP = 15


def _hybrid_oracle() -> str:
    toks = (
        "list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), "
        "t -> len(t) > 0)"
    )
    tf_cols = ", ".join(
        f"CAST(len(list_filter(toks, t -> t = '{w}')) AS DOUBLE) AS tf{i}"
        for i, w in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1.0 ELSE 0.0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    score = " + ".join(
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) * "
        f"(tf{i} * ({_BM25_K1} + 1.0) / "
        f"(tf{i} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl)))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, {tf_cols}
  FROM (SELECT doc_id, {toks} AS toks FROM documents)
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl, {df_cols} FROM base
),
lexscored AS (
  SELECT doc_id, {score} AS score FROM base CROSS JOIN stats
),
lex AS (
  SELECT doc_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
  FROM (SELECT doc_id, score FROM lexscored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT {_HY_LEX_K})
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id > 0),
vpairs AS (
  SELECT cid,
    list_sum(list_transform(list_zip(qe, ce),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn,
    sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cn
  FROM c CROSS JOIN q
),
vec AS (
  SELECT cid, CAST(rnk AS BIGINT) AS rnk FROM (
    SELECT cid,
           ROW_NUMBER() OVER (ORDER BY dot / (qn * cn) DESC, cid) AS rnk
    FROM vpairs
  ) WHERE rnk <= {_HY_VEC_K}
),
contrib AS (
  SELECT cid, 1.0::DOUBLE / ({_HY_RRF_K} + rnk) AS c FROM lex
  UNION ALL
  SELECT cid, 1.0::DOUBLE / ({_HY_RRF_K} + rnk) AS c FROM vec
),
fused AS (SELECT cid, SUM(c) AS rrf_score FROM contrib GROUP BY cid)
SELECT cid, rrf_score,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, cid) AS BIGINT) AS rnk
FROM fused
ORDER BY rnk LIMIT {_HY_TOP}
"""


@query("similarity_hybrid_rrf", oracle=_hybrid_oracle())
def similarity_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/similarity.py rrf_fuse): BM25 lexical
    top-20 over `documents` fused with the exact cosine top-20 for query
    vector 0 over `embeddings` (the pytest composition, lane-ified),
    final top-15 by reciprocal-rank score.

    Scale shape: both inputs are top-k-sized, so fusion is a union of
    2k rows + one keyed aggregation + a bounded rank window — the
    corpus-scale work lives in the (already lane-checked) retrievers."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.similarity import cosine_topk, rrf_fuse
    from kinesiscat_spark.operators.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    lex = bm25_topk(docs, _BM25_TERMS, k=_HY_LEX_K).select(
        F.col("doc_id").alias("cid"), "rnk"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    vec = cosine_topk(emb.filter(F.col("vec_id") > 0), queries, _HY_VEC_K).select(
        "cid", "rnk"
    )
    return rrf_fuse([lex, vec], k=_HY_RRF_K, top_k=_HY_TOP).select(
        "cid", "rrf_score", "rnk"
    )
