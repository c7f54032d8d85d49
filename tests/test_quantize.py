"""int8 scalar quantization for the ANN surface (operators/quantize.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.quantize import quantize_embeddings, quantized_topk
from kinesiscat_spark.operators.similarity import cosine_topk
from tests.conftest import SF_SMOKE

K = 10
N_QUERIES = 5


def test_quantize_roundtrip_error_bound(spark):
    """Dequantized values are within half a quantization step of the
    original (|x - code*scale| <= scale/2), and codes stay in int8 range."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = quantize_embeddings(emb)
    joined = emb.join(q, "vec_id").select(
        F.array_max(
            F.zip_with(
                "embedding",
                "codes",
                lambda x, c: F.abs(x.cast("double") - c.cast("double") * F.col("scale")),
            )
        ).alias("max_err"),
        F.col("scale"),
        F.array_max(F.transform("codes", lambda c: F.abs(c.cast("int")))).alias(
            "max_code"
        ),
    )
    bad = joined.filter(
        (F.col("max_err") > F.col("scale") / 2 + 1e-12) | (F.col("max_code") > 127)
    )
    assert bad.count() == 0


def test_quantized_topk_recall_vs_exact(spark):
    """With a 4k re-rank frontier, int8 phase-1 ranking must recover at
    least 90% of the exact top-k (same split as the similarity lanes)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    exact = cosine_topk(corpus, queries, K)
    quant = quantized_topk(corpus, queries, K)
    e = {(r.qid, r.cid) for r in exact.select("qid", "cid").collect()}
    g = {(r.qid, r.cid) for r in quant.select("qid", "cid").collect()}
    recall = len(e & g) / len(e)
    assert recall >= 0.9, recall
    # returned sims are EXACT (float re-rank), so overlapping pairs agree
    es = {(r.qid, r.cid): r.sim for r in exact.collect()}
    qs = {(r.qid, r.cid): r.sim for r in quant.collect()}
    for pair in e & g:
        assert qs[pair] == pytest.approx(es[pair], abs=0, rel=0)


def test_quantize_zero_vectors_are_safe(spark):
    """All-zero embeddings quantize to scale 0 / zero codes and never rank
    above real candidates (null approx score sorts last)."""
    rows = [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = quantize_embeddings(emb)
    z = q.filter(F.col("vec_id") == 0).collect()[0]
    assert z.scale == 0.0 and all(c == 0 for c in z.codes)
    queries = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") != 1)
    out = quantized_topk(corpus, queries, k=1, rerank_k=1).collect()
    assert [r.cid for r in out] == [2]  # the zero vector never wins


def test_ivf_sq_topk_recall_vs_ivf_flat(spark):
    """SQ8 cell scans must not cost recall beyond what IVF pruning already
    costs: (a) with pruning OFF (probe every cell) the int8 phase-1 +
    float re-rank recovers >= 90% of exact top-k — the pure quantization
    effect; (b) with the same cells/probes, recall matches the float IVF
    lane within one k-th; (c) survivors carry exact sims."""
    from kinesiscat_spark.operators.similarity import ivf_sq_topk, ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    exact = cosine_topk(corpus, queries, K)
    e = {(r.qid, r.cid) for r in exact.select("qid", "cid").collect()}

    # (a) pruning off: SQ8 is the only approximation
    full = ivf_sq_topk(corpus, queries, K, n_cells=8, n_probe=8)
    s_full = {(r.qid, r.cid) for r in full.select("qid", "cid").collect()}
    recall_sq_only = len(e & s_full) / len(e)
    assert recall_sq_only >= 0.9, recall_sq_only

    # (b) same pruning: SQ8 within one k-th of the float cell scan
    flat = ivf_topk(corpus, queries, K, n_cells=8, n_probe=4)
    sq = ivf_sq_topk(corpus, queries, K, n_cells=8, n_probe=4)
    f = {(r.qid, r.cid) for r in flat.select("qid", "cid").collect()}
    s = {(r.qid, r.cid) for r in sq.select("qid", "cid").collect()}
    recall_sq = len(e & s) / len(e)
    recall_flat = len(e & f) / len(e)
    assert recall_sq >= recall_flat - 1 / K, (recall_sq, recall_flat)

    # (c) survivors carry exact sims
    es = {(r.qid, r.cid): r.sim for r in exact.collect()}
    ss = {(r.qid, r.cid): r.sim for r in sq.collect()}
    for pair in e & s:
        assert ss[pair] == pytest.approx(es[pair], abs=0, rel=0)


def test_ivf_sq_cell_scan_carries_no_float_vectors(spark):
    """SQ8-IVF exchange contract: (a) the phase-1 ranking exchange ships
    (qid, cid, approx-sim) — no codes, no vectors; (b) the corpus float
    column NEVER moves through any exchange (candidates broadcast into
    it, the 4x/8x scan-byte cut plus a zero-shuffle re-rank)."""
    from kinesiscat_spark.operators.similarity import ivf_sq_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    df = ivf_sq_topk(corpus, queries, K, n_cells=8, n_probe=4)
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    blocks = s.split("\n\n")
    rank_exchanges = [
        b for b in blocks
        if "Exchange" in b and "hashpartitioning(qid" in b and "_asim" in b
    ]
    assert rank_exchanges
    for b in rank_exchanges:
        assert "_cc" not in b and "_qc" not in b
        assert "embedding" not in b and "_cvec" not in b and "_qvec" not in b
    # the corpus float column is joined via broadcast of the candidate
    # side; it must not appear in any exchange input
    for b in blocks:
        if "Exchange" in b.split("\n")[0] and "BroadcastExchange" not in b:
            assert "_cvec" not in b, b


def test_pq_encode_codes_shape_and_self_cells(spark):
    """Codebook has m×ks rows; every code vector has m entries in
    [0, ks); and each SEED vector encodes to its own cell in every
    subspace (its subvectors are exactly that cell's centroids)."""
    from kinesiscat_spark.operators.quantize import pq_encode, pq_train

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    cents = pq_train(corpus, m=8, ks=16, n_iters=0)
    assert cents.count() == 8 * 16
    codes = pq_encode(corpus, cents, m=8)
    stats = codes.select(
        F.size("codes").alias("m"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    )
    bad = stats.filter((F.col("m") != 8) | (F.col("lo") < 0) | (F.col("hi") >= 16))
    assert bad.count() == 0
    seed_ids = [r.vec_id for r in corpus.orderBy("vec_id").limit(16).collect()]
    seed_codes = {
        r.vec_id: list(r.codes)
        for r in codes.filter(F.col("vec_id").isin(seed_ids)).collect()
    }
    for rank, vid in enumerate(sorted(seed_ids)):
        assert seed_codes[vid] == [rank] * 8, (vid, seed_codes[vid])


def test_pq_adc_topk_recall_scales_with_rerank(spark):
    """PQ trades 32x compression for a deeper re-rank frontier: recall
    vs exact must be >= 0.7 at rerank_k=10k and >= 0.9 at 20k, and
    monotone between them; overlapping pairs return EXACT sims."""
    from kinesiscat_spark.operators.quantize import pq_adc_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    exact = {(r.qid, r.cid): r.sim for r in cosine_topk(corpus, queries, K).collect()}
    recalls = {}
    for rk in (10 * K, 20 * K):
        got = {
            (r.qid, r.cid): r.sim
            for r in pq_adc_topk(corpus, queries, K, rerank_k=rk).collect()
        }
        overlap = set(exact) & set(got)
        recalls[rk] = len(overlap) / len(exact)
        for pair in overlap:
            assert got[pair] == pytest.approx(exact[pair], abs=0, rel=0)
    assert recalls[10 * K] >= 0.7, recalls
    assert recalls[20 * K] >= 0.9, recalls
    assert recalls[20 * K] >= recalls[10 * K], recalls


def test_pq_refined_codebook_runs_and_keeps_contract(spark):
    """The Lloyd-refined codebook (n_iters=1) shares every operator:
    codes stay in range against the refined (possibly sparser) codebook
    and the search still returns k exact-sim rows per query."""
    from kinesiscat_spark.operators.quantize import pq_adc_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    out = pq_adc_topk(corpus, queries, K, n_iters=1, rerank_k=10 * K)
    counts = out.groupBy("qid").count().collect()
    assert len(counts) == N_QUERIES and all(r["count"] == K for r in counts)


def test_pq_partition_invariant(spark):
    """Same result set under a different input partitioning — seeds,
    argmin ties, and ranking all break ties on ids, never on layout."""
    from kinesiscat_spark.operators.quantize import pq_adc_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    a = {(r.qid, r.cid, r.rnk) for r in pq_adc_topk(corpus, queries, K).collect()}
    b = {
        (r.qid, r.cid, r.rnk)
        for r in pq_adc_topk(corpus.repartition(13, "label"), queries, K).collect()
    }
    assert a == b


def test_pq_adc_scan_carries_no_float_vectors(spark):
    """ADC exchange contract: the phase-1 ranking exchange ships
    (qid, cid, _asim) — no codes, no LUTs, no vectors — and the corpus
    float column never moves through any non-broadcast exchange."""
    from kinesiscat_spark.operators.quantize import pq_adc_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    df = pq_adc_topk(corpus, queries, K)
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    blocks = s.split("\n\n")
    rank_exchanges = [
        b for b in blocks
        if "Exchange" in b and "hashpartitioning(qid" in b and "_asim" in b
    ]
    assert rank_exchanges
    for b in rank_exchanges:
        assert "codes" not in b and "_lut" not in b
        assert "embedding" not in b and "_cvec" not in b and "_qvec" not in b
    for b in blocks:
        if "Exchange" in b.split("\n")[0] and "BroadcastExchange" not in b:
            assert "_cvec" not in b, b


def test_pq_rejects_dim_not_divisible_by_m(spark):
    """dim % m != 0 fails fast at execution instead of silently dropping
    the trailing dimensions from every codebook and code."""
    from kinesiscat_spark.operators.quantize import pq_encode, pq_train

    ten_dim = spark.createDataFrame(
        [(i, [float(i + d) for d in range(10)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="divisible"):
        pq_train(ten_dim, m=8, ks=4).collect()
