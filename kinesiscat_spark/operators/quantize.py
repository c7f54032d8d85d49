"""Scalar (int8) embedding quantization for the similarity surface (X3).

At 100 TB the dominant ANN cost is moving float vectors: a 1024-dim
float32 embedding is 4 KB/row, and every shuffle/broadcast/scan pays it.
Symmetric per-vector int8 quantization cuts that 4× (public technique —
the scalar-quantizer of FAISS/SQ8 and the ubiquitous int8 ANN deployments)
with a recall loss small enough that an EXACT float re-rank of the top
candidates restores it.

Spark shape:
- ``quantize_embeddings``: per-vector max-abs scale, codes as
  ``array<tinyint>`` — pure built-in Columns (transform/round/cast), no
  UDF, fully scan-stage. The (codes, scale) pair is the stored index;
  the float column can be dropped from the hot path entirely.
- ``quantized_topk``: approximate top-k over the int8 codes (integer dot
  products, rescaled) with ``rerank_k ≥ k`` survivors re-ranked by exact
  float cosine (same kernel as the exact lane). Broadcast query side,
  corpus codes never shuffle — identical scale contract to
  ``cosine_topk`` at a quarter of the scan+broadcast bytes.

Recall is asserted against the exact lane in tests/test_quantize.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.let import let_


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes: array<tinyint>, scale: double) — symmetric per-vector
    max-abs int8 quantization: ``code = round(x * 127 / max|x|)``.

    All-zero vectors get scale 0 and all-zero codes (dequantizes to the
    zero vector, matching the float path's behavior in cosine ranking
    where such vectors sort last deterministically).

    ``amax`` (an O(dim) array fold) is let-bound before the code transform
    references it: inlined, Catalyst would re-fold the whole vector once
    per element — O(dim²) per vector (kinesiscat_spark/let.py).
    """
    v = F.col(vec_col)

    def codes_of(amax: Column) -> Column:
        return F.when(
            amax > 0,
            F.transform(
                v, lambda x: F.round(x.cast("double") * 127.0 / amax).cast("tinyint")
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))

    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
    return emb.select(
        F.col(id_col),
        let_(amax, codes_of).alias("codes"),
        scale.alias("scale"),
    )


def int8_dot(a: Column, b: Column) -> Column:
    """Integer dot product of two array<tinyint> columns (long math —
    no overflow below ~5.7e14 dimensions at |code| ≤ 127)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    rerank_k: int | None = None,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors via int8 scan + exact float re-rank.

    Phase 1 ranks by the rescaled integer dot over UNIT-scaled cosine
    (``dot8 * scale_a * scale_b / (|a| |b|)``) and keeps ``rerank_k``
    (default ``4k``) candidates per query — the corpus is scanned as
    codes+scale only. Phase 2 joins the float vectors back for the
    survivors and re-ranks with the exact pair-cosine kernel, so the
    returned ``sim`` values are exact; only membership beyond the re-rank
    frontier is approximate.
    """
    from kinesiscat_spark.operators.similarity import pair_cosine_udf

    rerank_k = rerank_k or 4 * k
    # carry code norms so phase-1 scores approximate cosine (the per-vector
    # scale cancels between dot and norm; zero vectors score null → last)
    c_norm = quantize_embeddings(corpus, corpus_id, vec).select(
        F.col(corpus_id).alias("cid"),
        F.col("codes").alias("_cc"),
        F.col("scale").alias("_cs"),
    ).withColumn("_cn", F.sqrt(int8_dot(F.col("_cc"), F.col("_cc")).cast("double")))
    q_norm = quantize_embeddings(queries, query_id, vec).select(
        F.col(query_id),
        F.col("codes").alias("_qc"),
        F.col("scale").alias("_qs"),
    ).withColumn("_qn", F.sqrt(int8_dot(F.col("_qc"), F.col("_qc")).cast("double")))
    pairs = c_norm.join(F.broadcast(q_norm))
    approx = pairs.select(
        query_id,
        "cid",
        # try_divide: a zero-norm (all-zero) vector scores NULL and sorts
        # last (desc_nulls_last) instead of raising under ANSI mode
        F.try_divide(
            int8_dot(F.col("_qc"), F.col("_cc")).cast("double"),
            F.col("_qn") * F.col("_cn"),
        ).alias("_asim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc_nulls_last("_asim"), F.asc("cid"))
    cand = (
        approx.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= rerank_k)
        .select(query_id, "cid")
    )
    # candidate side broadcasts (k-proportional) so the corpus float
    # column is scanned in place, never exchanged — see ivf_sq_topk
    qv = queries.select(F.col(query_id), F.col(vec).alias("_qvec"))
    cv = corpus.select(F.col(corpus_id).alias("cid"), F.col(vec).alias("_cvec"))
    cand_q = cand.join(F.broadcast(qv), query_id)
    sims = cv.join(F.broadcast(cand_q), "cid").select(
        query_id,
        "cid",
        pair_cosine_udf()(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rnk") <= k)
    )
