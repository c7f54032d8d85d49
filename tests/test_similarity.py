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
    approx = {
        (r.qid, r.cid) for r in similarity_topk_ivf(spark, SF_ORACLE).collect()
    }
    recall = len(exact & approx) / len(exact)
    # probing 4/16 cells of a 495-vector corpus; unrefined seed centroids
    assert recall >= 0.3, f"IVF recall {recall:.2f} too low"


def test_ivf_refined_recall_not_worse(spark):
    """The Lloyd-refined lane (similarity_topk_ivf_refined, rows-only in
    the driver) must recall at least as well as seed centroids minus noise
    tolerance — refinement moves centroids toward the data, it must not
    collapse the index."""
    from kinesiscat_spark.queries.similarity_queries import (
        similarity_topk_exact,
        similarity_topk_ivf,
        similarity_topk_ivf_refined,
    )

    exact = {
        (r.qid, r.cid) for r in similarity_topk_exact(spark, SF_ORACLE).collect()
    }
    seed = {
        (r.qid, r.cid) for r in similarity_topk_ivf(spark, SF_ORACLE).collect()
    }
    refined = {
        (r.qid, r.cid)
        for r in similarity_topk_ivf_refined(spark, SF_ORACLE).collect()
    }
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
