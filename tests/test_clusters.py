"""Connected-components cluster resolution over near-dup pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesiscat_spark.operators.clusters import connected_components, keep_canonical


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r.id: r.cluster_id for r in connected_components(pairs).collect()
    }


def test_transitive_chain_one_cluster(spark):
    # 1-2, 2-3, 3-4: one component even though 1~4 never paired directly
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components(spark):
    got = _cc(spark, [(1, 2), (5, 6), (6, 7), (10, 11)])
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # path graph 0-1-...-9: diameter 9 forces multiple label rounds
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_keep_canonical_end_to_end(spark):
    """minhash pairs → clusters → one survivor per cluster + singletons."""
    from kinesiscat_spark.operators.dedup import minhash_lsh_pairs

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content about spark engines and shuffles"),
        (4, "totally unrelated text on parquet files and column pruning"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, threshold=0.4)
    kept = sorted(r.doc_id for r in keep_canonical(docs, pairs).collect())
    # 0/1/2 collapse into cluster 0; 3 and 4 are untouched singletons
    assert kept == [0, 3, 4]


def test_pairs_only_ids_get_labels(spark):
    """connected_components labels exactly the ids present in pairs."""
    pairs = spark.createDataFrame([(7, 3)], "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {3: 3, 7: 3}


def test_connected_components_warns_on_nonconvergence(spark):
    """A chain graph with diameter > max_iters must not silently return
    split clusters (ADVICE r2): the convergence failure is warned."""
    import warnings

    from kinesiscat_spark.operators.clusters import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(chain, max_iters=2).collect()
    assert any("did not converge" in str(w.message) for w in caught)
    # enough iterations: no warning, one cluster
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cc = connected_components(chain, max_iters=20)
        labels = {r.cluster_id for r in cc.collect()}
    assert labels == {0}
    assert not any("did not converge" in str(w.message) for w in caught)


def test_keep_canonical_jaccard_matches_duckdb_closure(spark, duck):
    """The Jaccard-pairs variant of keep_canonical (formerly the
    dedup_keep_canonical driver lane; its slot was upgraded to the
    end-to-end curation_pipeline lane in round 5) keeps its full oracle
    parity here: same recursive-CTE transitive closure, same surviving
    doc_id set, at the driver's sf0.01."""
    from tools.oracle_check import compare
    from kinesiscat_spark.queries.curation_queries import (
        _KEEP_CANONICAL_ORACLE,
        dedup_keep_canonical,
    )

    got = dedup_keep_canonical(spark, "/root/testdata/sf0.01")
    want = duck.execute(_KEEP_CANONICAL_ORACLE).fetchdf()
    ok, msg = compare(got, want)
    assert ok, msg


def test_keep_best_highest_score_wins(spark):
    """keep_best keeps the highest-score member per cluster (ties ->
    lowest id), keeps unpaired docs, and differs from keep_canonical
    exactly when the best member is not the min-id member."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.clusters import keep_best, keep_canonical

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (4, 7), (5, 7), (9, 1)],
        "doc_id long, n_chars long",
    )
    # clusters: {1,2,3} (transitive via 2), {4,5}; 9 unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    best = {r.doc_id for r in keep_best(docs, pairs, "n_chars").collect()}
    # cluster 1: doc 2 has max n_chars; cluster 2: tie 7/7 -> lowest id 4
    assert best == {2, 4, 9}
    canon = {r.doc_id for r in keep_canonical(docs, pairs).collect()}
    assert canon == {1, 4, 9}


def test_near_dedup_keep_policy_validation(spark):
    import pytest

    from kinesiscat_spark.pipelines import CurationConfig, near_dedup

    docs = spark.createDataFrame(
        [("a", "x y z", 5)], "doc_id string, text string, n_chars long"
    )
    with pytest.raises(ValueError):
        near_dedup(docs, CurationConfig(near_dup_keep="bogus"))
