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

Round 9 (guide §1.2 "per-task work", here per-INVOCATION work): every
pure Column tree in this module — trees that depend only on literal
parameters and input column NAMES — is built once per process via
``expr_memo`` and reused verbatim. cProfile showed the quantized lane
spending ~1.7 s per invocation in py4j round trips (4,414 gateway
commands) just REBUILDING these identical trees; the memoized Columns
are plan fragments, so every action still recomputes from parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.expr_memo import expr_memo
from kinesiscat_spark.let import let_


def _quantize_select(id_col: str, vec_col: str) -> list:
    """The (id, codes, scale) projection of ``quantize_embeddings`` —
    pure in (id_col, vec_col), memoized per process."""

    def build() -> list:
        v = F.col(vec_col)

        def codes_of(amax: Column) -> Column:
            return F.when(
                amax > 0,
                F.transform(
                    v,
                    lambda x: F.round(x.cast("double") * 127.0 / amax).cast(
                        "tinyint"
                    ),
                ),
            ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))

        amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
        scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
        return [
            F.col(id_col),
            let_(amax, codes_of).alias("codes"),
            scale.alias("scale"),
        ]

    return expr_memo(("q8.quantize", id_col, vec_col), build)


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
    return emb.select(*_quantize_select(id_col, vec_col))


def int8_dot(a: Column, b: Column) -> Column:
    """Integer dot product of two array<tinyint> columns (long math —
    no overflow below ~5.7e14 dimensions at |code| ≤ 127)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    n_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = 12,
) -> DataFrame:
    """Product-quantization codebooks: ``(sub, cell, cvec)`` — one
    ``ks``-entry codebook per ``m`` contiguous subspaces of the
    unit-normalized vector (public technique — Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"; the FAISS "PQmxks"
    index family).

    ``dim`` must be divisible by ``m`` (the standard PQ requirement —
    with a remainder the trailing ``dim mod m`` dimensions would be
    silently excluded from every subspace); enforced at execution with a
    row-level check that fails fast instead of silently costing recall.

    Deterministic seeds: the ``ks`` lowest-id corpus vectors, normalized
    and cut into subvectors — with ``n_iters=0`` the whole
    train/encode/search pipeline is reproducible in ANSI SQL (the oracle
    path). ``n_iters>0`` runs per-subspace Lloyd refinement distributed
    (assign via broadcast codebook join, new means via posexplode +
    per-dimension avg), mirroring ``similarity.ivf_centroids``; only
    ``m×ks`` codebook rows ever aggregate down, so training scales to any
    corpus size. ``round_decimals`` quantizes refined centroids (1e-12)
    so a refined codebook is also reproducible across engines and
    parallelism (empty cells drop, ties keep the lower cell —
    deterministic either way).
    """
    from kinesiscat_spark.operators.similarity import sq_l2

    def build_seed_exprs() -> dict:
        from kinesiscat_spark.operators.similarity import normalize

        dsub = _dsub_checked(F.col("_nv"), m)
        return {
            "seed_sel": [
                (F.row_number().over(Window.orderBy(id_col)) - 1)
                .cast("long")
                .alias("cell"),
                normalize(F.col(vec_col)).alias("_nv"),
            ],
            "cent_sel": [
                F.col("cell"),
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda s: F.slice("_nv", s * dsub + 1, dsub),
                    )
                ).alias("sub", "cvec"),
            ],
            "out_sel": [
                F.col("sub").cast("long").alias("sub"),
                F.col("cell"),
                F.col("cvec"),
            ],
        }

    ex = expr_memo(("q8.pqtrain", id_col, vec_col, m), build_seed_exprs)
    seeds = corpus.orderBy(id_col).limit(ks).select(*ex["seed_sel"])
    cents = seeds.select(*ex["cent_sel"]).select(*ex["out_sel"])

    for _ in range(n_iters):
        sub_rows = _pq_subvectors(corpus, m, id_col, vec_col)
        assigned = (
            sub_rows.join(F.broadcast(cents), "sub")
            .withColumn("_d", sq_l2(F.col("sv"), F.col("cvec")))
            .groupBy(id_col, "sub")
            .agg(F.min(F.struct("_d", "cell")).alias("_b"))
            .select(id_col, "sub", F.col("_b.cell").alias("cell"))
        )
        new = (
            assigned.join(sub_rows, [id_col, "sub"])
            .select("sub", "cell", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub", "cell", "pos")
            .agg(F.avg("x").alias("mm"))
            .groupBy("sub", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mm"))).alias("pm"))
            .select(
                "sub",
                "cell",
                F.transform(F.col("pm"), lambda s: s["mm"]).alias("cvec"),
            )
        )
        cvec = F.col("cvec")
        if round_decimals is not None:
            cvec = F.transform(cvec, lambda x: F.round(x, round_decimals))
        cents = new.select("sub", "cell", cvec.alias("cvec"))
    return cents


def _dsub_checked(nv: Column, m: int) -> Column:
    """Subspace width dim/m, raising at execution when dim % m != 0 —
    the slice arithmetic would otherwise silently drop the trailing
    dim mod m dimensions from every codebook and code."""
    sz = F.size(nv)
    return F.when(sz % m == 0, (sz / m).cast("int")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"PQ requires dim divisible by m={m}; got dim="),
                sz.cast("string"),
            )
        ).cast("int")
    )


def _pq_subvectors(
    df: DataFrame, m: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, sv): the unit-normalized vector cut into ``m`` contiguous
    subvectors — the norm is materialized once per row (let_ inside
    ``normalize``), then one posexplode fans out the m slices."""

    def build() -> dict:
        from kinesiscat_spark.operators.similarity import normalize

        dsub = _dsub_checked(F.col("_nv"), m)
        return {
            "nv_sel": [F.col(id_col), normalize(F.col(vec_col)).alias("_nv")],
            "out_sel": [
                F.col(id_col),
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda s: F.slice("_nv", s * dsub + 1, dsub),
                    )
                ).alias("sub", "sv"),
            ],
            "sub_long": F.col("sub").cast("long"),
        }

    ex = expr_memo(("q8.pqsub", id_col, vec_col, m), build)
    return (
        df.select(*ex["nv_sel"])
        .select(*ex["out_sel"])
        .withColumn("sub", ex["sub_long"])
    )


def pq_encode(
    df: DataFrame,
    cents: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes: array<long>) — per subspace, the L2-nearest codebook
    cell of the normalized subvector (ties → lower cell). ``codes[s]`` is
    the cell id chosen for subspace ``s``.

    The stored PQ index is ``m`` longs per vector (m bytes as int8 in a
    real store) — a 32× cut versus 64 float32 dims; at 1024 dims the cut
    is 512×. Scale shape: the codebook join broadcasts (m×ks rows), the
    argmin is a map-side-combinable struct-min per (id, sub), and the
    code assembly is one (id)-keyed aggregation of (sub, cell) pairs —
    vectors never shuffle."""

    def build() -> dict:
        from kinesiscat_spark.operators.similarity import sq_l2

        return {
            "d": sq_l2(F.col("sv"), F.col("cvec")),
            "best_agg": F.min(F.struct("_d", "cell")).alias("_b"),
            "best_sel": [
                F.col(id_col),
                F.col("sub"),
                F.col("_b.cell").alias("cell"),
            ],
            "sc_agg": F.array_sort(
                F.collect_list(F.struct("sub", "cell"))
            ).alias("_sc"),
            "codes_sel": [
                F.col(id_col),
                F.transform(F.col("_sc"), lambda s: s["cell"]).alias("codes"),
            ],
        }

    ex = expr_memo(("q8.pqenc", id_col), build)
    best = (
        _pq_subvectors(df, m, id_col, vec_col)
        .join(F.broadcast(cents), "sub")
        .withColumn("_d", ex["d"])
        .groupBy(id_col, "sub")
        .agg(ex["best_agg"])
        .select(*ex["best_sel"])
    )
    return (
        best.groupBy(id_col).agg(ex["sc_agg"]).select(*ex["codes_sel"])
    )


def exact_float_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
) -> DataFrame:
    """Phase 2 shared by every quantized search path (SQ8 / PQ, in-plan /
    persisted-index): exact pair-cosine re-rank of the phase-1 candidate
    pairs ``(query_id, cid)`` via a candidate-side broadcast — the corpus
    float column is read in place and NEVER shuffles; returned ``sim``
    values are exact, ties break on cid."""

    def build() -> dict:
        from kinesiscat_spark.operators.similarity import pair_cosine_udf

        w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("cid"))
        return {
            "qv_sel": [F.col(query_id), F.col(vec).alias("_qvec")],
            "cv_sel": [F.col(corpus_id).alias("cid"), F.col(vec).alias("_cvec")],
            "sim": pair_cosine_udf()(F.col("_qvec"), F.col("_cvec")).alias(
                "sim"
            ),
            "rnk": F.row_number().over(w).cast("long"),
            "keep": F.col("rnk") <= k,
        }

    ex = expr_memo(("q8.rerank", corpus_id, query_id, vec, k), build)
    qv = queries.select(*ex["qv_sel"])
    cv = corpus.select(*ex["cv_sel"])
    sims = cv.join(
        F.broadcast(cand.join(F.broadcast(qv), query_id)), "cid"
    ).select(query_id, "cid", ex["sim"])
    return sims.withColumn("rnk", ex["rnk"]).filter(ex["keep"])


def pq_query_lut(
    queries: DataFrame,
    cents: DataFrame,
    m: int,
    query_id: str = "qid",
    vec: str = "embedding",
) -> DataFrame:
    """(qid, _lut): the per-query ADC lookup table — an array over
    subspaces (0..m-1, positional) of ``map<cell → partial dot>``. Maps,
    not positional arrays, so a Lloyd-refined codebook with a dropped
    (empty) cell still looks up correctly by cell id."""

    def build() -> dict:
        from kinesiscat_spark.operators.similarity import dot

        return {
            "cp": F.struct(
                "cell", dot(F.col("sv"), F.col("cvec")).alias("pd")
            ).alias("_cp"),
            "row_agg": F.map_from_entries(
                F.array_sort(F.collect_list("_cp"))
            ).alias("_row"),
            # structs holding a map aren't orderable → assemble positionally
            # through a sub-keyed map instead of array_sort
            "m_agg": F.map_from_entries(
                F.collect_list(F.struct("sub", "_row"))
            ).alias("_m"),
            "lut_sel": [
                F.col(query_id),
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.element_at(F.col("_m"), s.cast("long")),
                ).alias("_lut"),
            ],
        }

    ex = expr_memo(("q8.pqlut", query_id, m), build)
    q_sub = _pq_subvectors(queries, m, query_id, vec)
    return (
        q_sub.join(F.broadcast(cents), "sub")
        .select(F.col(query_id), "sub", ex["cp"])
        .groupBy(query_id, "sub")
        .agg(ex["row_agg"])
        .groupBy(query_id)
        .agg(ex["m_agg"])
        .select(*ex["lut_sel"])
    )


def pq_adc_score(codes: Column, lut: Column, m: int) -> Column:
    """ADC approximate similarity: sum of the m LUT partial dots selected
    by the code vector — a left fold in subspace order (bit-reproducible
    across engines that fold left-to-right)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(F.element_at(lut, s + 1), F.element_at(codes, s + 1)),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    m: int = 8,
    ks: int = 16,
    n_iters: int = 0,
    rerank_k: int | None = None,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors via PQ asymmetric distance (ADC) + exact
    float re-rank — the FAISS "PQ" search path (Jégou et al. 2011 §III).

    Phase 1: each query precomputes an m×ks lookup table of partial dot
    products against the codebooks (query subvector · cell centroid);
    a corpus vector's approximate similarity is then just ``m`` table
    lookups summed — the corpus is scanned as codes only (m longs per
    row; m bytes in an int8 store), never as floats. The LUT rides a
    per-query map<cell → partial-dot> per subspace, so lookups stay
    JVM-side (``element_at`` by key — robust to non-contiguous cells
    after Lloyd drops an empty one). Phase 2 re-ranks the ``rerank_k``
    (default 4k) survivors with the exact float cosine kernel via the
    same candidate-side broadcast as ``quantized_topk`` — the float
    column is read in place, never shuffled.

    Deterministic end-to-end with ``n_iters=0`` (seeded codebooks,
    left-to-right double folds, cid tie-breaks) — hash-checkable against
    an ANSI-SQL twin.
    """
    rerank_k = rerank_k or 4 * k

    def build() -> dict:
        w = Window.partitionBy(query_id).orderBy(
            F.desc_nulls_last("_asim"), F.asc("cid")
        )
        return {
            "codes_sel": [F.col(corpus_id).alias("cid"), F.col("codes")],
            "asim": pq_adc_score(F.col("codes"), F.col("_lut"), m).alias(
                "_asim"
            ),
            "r": F.row_number().over(w),
            "keep": F.col("_r") <= rerank_k,
            "cand_sel": [F.col(query_id), F.col("cid")],
        }

    ex = expr_memo(
        ("q8.pqadc", corpus_id, query_id, m, rerank_k), build
    )
    cents = pq_train(corpus, m, ks, n_iters, corpus_id, vec)
    codes = pq_encode(corpus, cents, m, corpus_id, vec).select(
        *ex["codes_sel"]
    )
    lut = pq_query_lut(queries, cents, m, query_id, vec)
    approx = codes.join(F.broadcast(lut)).select(query_id, "cid", ex["asim"])
    cand = (
        approx.withColumn("_r", ex["r"])
        .filter(ex["keep"])
        .select(*ex["cand_sel"])
    )
    return exact_float_rerank(corpus, queries, cand, k, corpus_id, query_id, vec)


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
    rerank_k = rerank_k or 4 * k

    def build() -> dict:
        w = Window.partitionBy(query_id).orderBy(
            F.desc_nulls_last("_asim"), F.asc("cid")
        )
        return {
            "c_sel": [
                F.col(corpus_id).alias("cid"),
                F.col("codes").alias("_cc"),
                F.col("scale").alias("_cs"),
            ],
            "cn": F.sqrt(int8_dot(F.col("_cc"), F.col("_cc")).cast("double")),
            "q_sel": [
                F.col(query_id),
                F.col("codes").alias("_qc"),
                F.col("scale").alias("_qs"),
            ],
            "qn": F.sqrt(int8_dot(F.col("_qc"), F.col("_qc")).cast("double")),
            # try_divide: a zero-norm (all-zero) vector scores NULL and
            # sorts last (desc_nulls_last) instead of raising under ANSI
            "asim": F.try_divide(
                int8_dot(F.col("_qc"), F.col("_cc")).cast("double"),
                F.col("_qn") * F.col("_cn"),
            ).alias("_asim"),
            "r": F.row_number().over(w),
            "keep": F.col("_r") <= rerank_k,
            "cand_sel": [F.col(query_id), F.col("cid")],
        }

    ex = expr_memo(
        ("q8.sq8topk", corpus_id, query_id, rerank_k), build
    )
    # carry code norms so phase-1 scores approximate cosine (the per-vector
    # scale cancels between dot and norm; zero vectors score null → last)
    c_norm = (
        quantize_embeddings(corpus, corpus_id, vec)
        .select(*ex["c_sel"])
        .withColumn("_cn", ex["cn"])
    )
    q_norm = (
        quantize_embeddings(queries, query_id, vec)
        .select(*ex["q_sel"])
        .withColumn("_qn", ex["qn"])
    )
    pairs = c_norm.join(F.broadcast(q_norm))
    approx = pairs.select(query_id, "cid", ex["asim"])
    cand = (
        approx.withColumn("_r", ex["r"])
        .filter(ex["keep"])
        .select(*ex["cand_sel"])
    )
    return exact_float_rerank(corpus, queries, cand, k, corpus_id, query_id, vec)
