"""Recall of the approximate lanes (LSH, IVF) vs exact brute force."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_pair_cosine_kernel_matches_column_form(spark):
    """The Arrow pair-cosine kernel must be BIT-identical to the Column
    fold (dot / (l2_norm * l2_norm)) — the oracle hash-compares on it."""
    import random

    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.similarity import cosine, pair_cosine_udf

    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(17)], [rng.gauss(0, 1) for _ in range(17)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    got = df.select(
        "id",
        cosine(F.col("a"), F.col("b")).alias("spec"),
        pair_cosine_udf()(F.col("a"), F.col("b")).alias("kernel"),
    ).collect()
    for r in got:
        assert r.spec == r.kernel, f"row {r.id}: {r.spec!r} != {r.kernel!r}"


def test_lsh_recall_vs_exact(spark):
    from kinesiscat_spark.queries.similarity_queries import (
        similarity_topk_exact,
        similarity_topk_lsh,
    )

    exact = {
        (r.qid, r.cid) for r in similarity_topk_exact(spark, SF_ORACLE).collect()
    }
    approx = {
        (r.qid, r.cid) for r in similarity_topk_lsh(spark, SF_ORACLE).collect()
    }
    assert exact, "exact result empty"
    recall = len(exact & approx) / len(exact)
    # 16 planes / 4 bands on 64-dim gaussian vectors: banded OR-of-ANDs is
    # permissive (4 matching bits ~ cos similarity), so recall stays high.
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_ivf_recall_vs_exact(spark):
    from kinesiscat_spark.queries.similarity_queries import (
        similarity_topk_exact,
        similarity_topk_ivf,
    )

    exact = {
        (r.qid, r.cid) for r in similarity_topk_exact(spark, SF_ORACLE).collect()
    }
    fam = similarity_topk_ivf(spark, SF_ORACLE)
    approx = {
        (r.qid, r.cid)
        for r in fam.filter("method = 'ivf'").collect()
    }
    recall = len(exact & approx) / len(exact)
    # probing 4/16 cells of a 495-vector corpus; unrefined seed centroids
    assert recall >= 0.3, f"IVF recall {recall:.2f} too low"


def test_ivf_refined_recall_not_worse(spark):
    """The Lloyd-refined method (similarity_topk_ivf lane, round-6 fold)
    must recall at least as well as seed centroids minus noise tolerance —
    refinement moves centroids toward the data, it must not collapse the
    index."""
    from kinesiscat_spark.queries.similarity_queries import (
        similarity_topk_exact,
        similarity_topk_ivf,
    )

    exact = {
        (r.qid, r.cid) for r in similarity_topk_exact(spark, SF_ORACLE).collect()
    }
    fam = similarity_topk_ivf(spark, SF_ORACLE).collect()
    seed = {(r.qid, r.cid) for r in fam if r.method == "ivf"}
    refined = {(r.qid, r.cid) for r in fam if r.method == "ivf_refined"}
    r_seed = len(exact & seed) / len(exact)
    r_ref = len(exact & refined) / len(exact)
    assert r_ref >= max(0.3, r_seed - 0.2), (
        f"refined recall {r_ref:.2f} collapsed vs seed {r_seed:.2f}"
    )


def test_ivf_lloyd_refinement_runs(spark):
    """n_iters>0 exercises the distributed Lloyd loop (collects only
    centroids); sanity: still returns k rows per query."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    out = ivf_topk(corpus, queries, 5, n_cells=8, n_probe=2, n_iters=2)
    counts = {r.qid: r.n for r in out.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    assert all(v == 5 for v in counts.values()) and len(counts) == 3


def test_rrf_fusion_properties(spark):
    """RRF: agreement across lists dominates a single high rank; ties
    break on id; per-query mode ranks within qid."""
    from kinesiscat_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], ["cid", "rnk"]
    )
    vec = spark.createDataFrame(
        [(11, 1), (10, 2), (13, 3)], ["cid", "rnk"]
    )
    out = {r.cid: (r.rrf_score, r.rnk) for r in rrf_fuse([lex, vec], k=60).collect()}
    # 10 and 11 each have ranks {1,2} -> identical scores, tie to lower id
    assert abs(out[10][0] - out[11][0]) < 1e-12
    assert out[10][1] == 1 and out[11][1] == 2
    # single-list entries rank below double-list entries
    assert out[12][1] in (3, 4) and out[13][1] in (3, 4)
    assert out[12][1] < out[13][1]  # same 1/(k+3), tie to lower id

    # per-query fusion partitions ranks by qid
    a = spark.createDataFrame([(1, 10, 1), (2, 20, 1)], ["qid", "cid", "rnk"])
    b = spark.createDataFrame([(1, 11, 1), (2, 20, 2)], ["qid", "cid", "rnk"])
    per_q = rrf_fuse([a, b], key_cols=("qid", "cid")).collect()
    ranks = {(r.qid, r.cid): r.rnk for r in per_q}
    assert ranks[(2, 20)] == 1  # appears in both lists for qid 2
    assert ranks[(1, 10)] == 1 and ranks[(1, 11)] == 2  # tie -> lower cid


def test_rrf_hybrid_bm25_plus_vector(spark):
    """End-to-end hybrid retrieval: fuse the BM25 lexical ranking with a
    vector top-k over the same id space; every fused id comes from one of
    the inputs and the head of both lists is represented."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.similarity import cosine_topk, rrf_fuse
    from kinesiscat_spark.operators.text import bm25_topk
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    lex = bm25_topk(docs, ("vector", "merge", "window"), k=20).select(
        F.col("doc_id").alias("cid"), "rnk"
    )
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    vec = cosine_topk(emb.filter(F.col("vec_id") > 0), queries, 20).select(
        "cid", "rnk"
    )
    fused = rrf_fuse([lex, vec], top_k=10).collect()
    assert len(fused) == 10
    lex_ids = {r.cid for r in lex.collect()}
    vec_ids = {r.cid for r in vec.collect()}
    assert all(r.cid in (lex_ids | vec_ids) for r in fused)


def test_ivf_assign_arrow_null_and_ragged_vectors(spark):
    """NULL / wrong-dim embeddings must get a NULL cell, not crash the
    Arrow batch (ADVICE r6: np.stack PythonException on the raw corpus
    path used by ivf_topk / ivf_sq_topk / build_ivf_index)."""
    from kinesiscat_spark.operators.similarity import (
        ivf_assign_arrow,
        ivf_centroids,
    )

    good = [(i, [float(i), float(i + 1)]) for i in range(8)]
    df = spark.createDataFrame(
        good + [(100, None), (101, [1.0]), (102, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_centroids(
        spark.createDataFrame(good, "vec_id long, embedding array<double>"),
        n_cells=2,
    )
    out = {r.vec_id: r.cell for r in ivf_assign_arrow(df, cents).collect()}
    assert len(out) == 11
    assert out[100] is None and out[101] is None and out[102] is None
    assert all(out[i] is not None for i, _ in good)


def test_mmr_rerank_diversifies_and_validates(spark):
    """MMR: pick 1 is the cosine argmax; with lam favoring diversity, a
    redundant near-copy of pick 1 is passed over for a distinct
    direction; validation rejects bad params."""
    import pytest

    from kinesiscat_spark.operators.similarity import mmr_rerank

    # query along e1; candidates: 10=near-dup of 11 (both ~e1),
    # 12=orthogonal-ish mix, 13=far
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (10, [0.99, 0.1, 0.0, 0.0]),
        (11, [0.98, 0.12, 0.0, 0.0]),
        (12, [0.6, 0.8, 0.0, 0.0]),
        (13, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id = 0").selectExpr(
        "vec_id as qid", "embedding"
    )
    corpus = emb.filter("vec_id >= 10")
    out = mmr_rerank(
        corpus, queries, k=3, n_candidates=4, lam=0.5
    ).collect()
    picks = [r.cid for r in sorted(out, key=lambda r: r.rnk)]
    assert picks[0] == 10                 # highest cosine wins pick 1
    assert picks[1] != 11                 # near-dup of pick 1 deferred
    assert 11 == picks[2] or 11 not in picks
    scores = [r.score for r in sorted(out, key=lambda r: r.rnk)]
    assert scores[0] > scores[1]          # marginal relevance decays
    with pytest.raises(ValueError):
        mmr_rerank(corpus, queries, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(corpus, queries, k=5, n_candidates=3)
    with pytest.raises(ValueError):
        mmr_rerank(corpus, queries, k=2, n_candidates=3, lam=1.5)


def test_semi_hard_triplets_selection_rule(spark):
    """Triplets: positive = rank-1 neighbor; the semi-hard negative
    skips candidates inside the margin band and picks the highest-ranked
    one below it; queries with nothing below the margin emit no
    negative."""
    import pytest

    from kinesiscat_spark.operators.similarity import semi_hard_triplets

    rows = [
        (0, [1.0, 0.0, 0.0]),
        # candidates: 10 ~anchor, 11 inside margin band, 12 below band
        (10, [0.99, 0.14, 0.0]),
        (11, [0.97, 0.24, 0.0]),
        (12, [0.2, 0.98, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id = 0").selectExpr("vec_id as qid", "embedding")
    corpus = emb.filter("vec_id >= 10")
    got = {
        r.role: r
        for r in semi_hard_triplets(
            corpus, queries, n_candidates=3, margin=0.05
        ).collect()
    }
    assert got["pos"].cid == 10 and got["pos"].rnk == 1
    assert got["neg"].cid == 12 and got["neg"].rnk == 2   # 11 is in-band
    assert got["neg"].sim < got["pos"].sim - 0.05
    # a tight corpus (everything within margin) yields no negative
    none = semi_hard_triplets(
        corpus.filter("vec_id < 12"), queries, n_candidates=2, margin=0.05
    ).collect()
    assert {r.role for r in none} == {"pos"}
    with pytest.raises(ValueError):
        semi_hard_triplets(corpus, queries, margin=-0.1)


def test_lloyd_driver_matches_distributed(spark):
    """Round 10: the guarded driver-side Lloyd loop must produce the
    exact (cell, cvec) rows of the distributed loop — same seeds, same
    fold-order assignment dots, same HALF_UP 1e-12 quantization."""
    import kinesiscat_spark.operators.similarity as sim

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 17) - 8.0 for j in range(16)])
         for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    fast = sim._collect_cents(sim.ivf_centroids(emb, 8, 2))
    old = sim._LLOYD_DRIVER_LIMIT
    try:
        sim._LLOYD_DRIVER_LIMIT = 0  # force the distributed loop
        slow = sim._collect_cents(sim.ivf_centroids(emb, 8, 2))
    finally:
        sim._LLOYD_DRIVER_LIMIT = old
    assert fast == slow


def test_lloyd_driver_degenerate_falls_back(spark):
    """NULL / ragged / zero-norm vectors must route to the distributed
    loop (the driver twin only claims the clean case)."""
    import kinesiscat_spark.operators.similarity as sim

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [0.0, 0.0]), (3, [3.0])],
        "vec_id long, embedding array<double>",
    )
    rows = emb.selectExpr("vec_id AS _i", "embedding AS _v").collect()
    assert sim._lloyd_driver(rows, 2, 1, 12) is None
