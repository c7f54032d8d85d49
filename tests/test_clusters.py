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
    # small_graph_edges=0 pins the distributed loop: the round-9 driver
    # union-find fast path always converges, so the warning is a
    # loop-only property
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(chain, max_iters=2, small_graph_edges=0).collect()
    assert any("did not converge" in str(w.message) for w in caught)
    # enough iterations: no warning, one cluster
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cc = connected_components(chain, max_iters=20, small_graph_edges=0)
        labels = {r.cluster_id for r in cc.collect()}
    assert labels == {0}
    assert not any("did not converge" in str(w.message) for w in caught)


def test_connected_components_fast_path_matches_loop(spark):
    """The round-9 driver union-find fast path returns EXACTLY the
    distributed loop's labels (min reachable id), including chains,
    separate components, self-loops, and ids only ever seen on one
    side."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 8), (5, 5), (11, 3), (20, 21)],
        "id_a long, id_b long",
    )
    fast = {
        (r.id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    loop = {
        (r.id, r.cluster_id)
        for r in connected_components(pairs, small_graph_edges=0).collect()
    }
    assert fast == loop
    assert fast == {
        (1, 1), (2, 1), (3, 1), (11, 1),
        (8, 8), (9, 8), (5, 5), (20, 20), (21, 20),
    }


def test_connected_components_threshold_falls_back(spark):
    """A graph larger than small_graph_edges takes the distributed loop
    (same labels)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    got = {
        (r.id, r.cluster_id)
        for r in connected_components(pairs, small_graph_edges=3).collect()
    }
    assert got == {(i, 0) for i in range(11)}


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


def test_pagerank_path_graph_hand_computed(spark):
    """PageRank on the path a-b-c replays the textbook recurrence with
    the operator's exact fold order; ranks sum to ~1 and the center node
    dominates."""
    import pytest

    from kinesiscat_spark.operators.clusters import pagerank

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    got = {r.v: r.rank for r in pagerank(pairs, n_iters=2).collect()}

    n, d = 3, 0.85
    r = {1: 1.0 / n, 2: 1.0 / n, 3: 1.0 / n}
    deg = {1: 1, 2: 2, 3: 1}
    for _ in range(2):
        contrib = {
            1: [r[2] / deg[2]],
            2: sorted([r[1] / deg[1], r[3] / deg[3]]),
            3: [r[2] / deg[2]],
        }
        nxt = {}
        for v, cs in contrib.items():
            s = 0.0
            for c in cs:
                s = s + c
            nxt[v] = (1.0 - d) / n + d * s
        r = nxt
    assert got == {v: round(x, 6) for v, x in r.items()}
    assert abs(sum(got.values()) - 1.0) < 1e-4
    assert got[2] > got[1] == got[3]
    with pytest.raises(ValueError):
        pagerank(pairs, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(pairs, n_iters=0)


def test_pagerank_weighted_triangle_hand_computed(spark):
    """Similarity-weighted PageRank on a triangle with unequal weights:
    the heavier-connected node wins, replaying the weighted recurrence
    in the operator's exact value-sorted fold order (a clique is regular,
    so the UNWEIGHTED walk would stay uniform — the weighted one must
    not)."""
    from kinesiscat_spark.operators.clusters import pagerank

    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, 2.0), (2, 3, 3.0)],
        "id_a long, id_b long, w double",
    )
    got = {
        r.v: r.rank
        for r in pagerank(pairs, n_iters=3, weight_col="w").collect()
    }
    n, d = 3, 0.85
    w = {(1, 2): 1.0, (1, 3): 2.0, (2, 3): 3.0}
    wf = {**w, **{(b, a): x for (a, b), x in w.items()}}
    s = {u: sum(sorted(x for (a, _), x in wf.items() if a == u))
         for u in (1, 2, 3)}
    r = {u: 1.0 / n for u in (1, 2, 3)}
    for _ in range(3):
        nxt = {}
        for v in (1, 2, 3):
            cs = sorted(
                r[u] * wf[(u, v)] / s[u] for u in (1, 2, 3) if u != v
            )
            acc = 0.0
            for c in cs:
                acc = acc + c
            nxt[v] = (1.0 - d) / n + d * acc
        r = nxt
    assert got == {v: round(x, 6) for v, x in r.items()}
    # node 3 carries the heaviest edges; node 1 the lightest
    assert got[3] > got[2] > got[1]
    # unweighted on the same (regular) triangle: uniform forever
    flat = {x.rank for x in pagerank(pairs, n_iters=3).collect()}
    assert flat == {round(1.0 / 3, 6)}


def test_pagerank_drops_nonpositive_weight_edges(spark):
    """Zero/NULL-weight edges are dropped instead of poisoning strengths;
    a node with only dropped edges leaves the graph entirely."""
    from kinesiscat_spark.operators.clusters import pagerank

    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 0.0), (4, 5, None)],
        "id_a long, id_b long, w double",
    )
    got = {r.v: r.rank for r in
           pagerank(pairs, n_iters=2, weight_col="w").collect()}
    assert set(got) == {1, 2}                 # 3, 4, 5 fully dropped
    assert all(r == r for r in got.values())  # no NaN


def test_pagerank_fast_path_matches_loop(spark):
    """The round-9 driver fast path returns EXACTLY the distributed
    loop's ranks (same value-ordered folds, same expression order, the
    final round(·, 6) applied by Spark either way) — weighted and
    unweighted, with self-loops, duplicate pairs, zero-weight drops and
    multiple components."""
    from kinesiscat_spark.operators.clusters import pagerank

    pairs = spark.createDataFrame(
        [(1, 2, 0.7), (2, 3, 0.4), (3, 1, 0.9), (3, 1, 0.9),
         (4, 4, 1.0), (5, 6, 0.05), (6, 7, 0.0)],
        "id_a long, id_b long, w double",
    )
    for kw in ({"weight_col": "w"}, {}):
        fast = {(r.v, r.rank)
                for r in pagerank(pairs, n_iters=3, **kw).collect()}
        loop = {(r.v, r.rank)
                for r in pagerank(
                    pairs, n_iters=3, small_graph_edges=0, **kw
                ).collect()}
        assert fast == loop


def test_pagerank_threshold_falls_back(spark):
    """A graph larger than small_graph_edges takes the distributed loop
    (same ranks)."""
    from kinesiscat_spark.operators.clusters import pagerank

    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(8)], "id_a long, id_b long, w double"
    )
    fast = {(r.v, r.rank)
            for r in pagerank(pairs, n_iters=2, weight_col="w").collect()}
    loop = {(r.v, r.rank)
            for r in pagerank(
                pairs, n_iters=2, weight_col="w", small_graph_edges=3
            ).collect()}
    assert fast == loop


class TestClusterSafeSplit:
    """cluster_safe_split (round 9): the leakage guarantee and the
    routing determinism at the operator level."""

    def _docs(self, spark, n=40):
        return spark.createDataFrame(
            [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
        )

    def _pairs(self, spark, pairs):
        return spark.createDataFrame(pairs, "id_a long, id_b long")

    def test_near_dups_never_straddle(self, spark):
        from kinesiscat_spark.operators.clusters import cluster_safe_split

        # a chain 0-1-2, a pair (5,6), and singletons
        pairs = self._pairs(spark, [(0, 1), (1, 2), (5, 6)])
        w = {"train": 0.5, "val": 0.25, "test": 0.25}
        got = {
            r.doc_id: (r.cluster_id, r.split)
            for r in cluster_safe_split(
                self._docs(spark), pairs, w, salt=3
            ).collect()
        }
        assert got[0][0] == got[1][0] == got[2][0] == 0
        assert got[0][1] == got[1][1] == got[2][1]
        assert got[5][0] == got[6][0] == 5
        assert got[5][1] == got[6][1]
        # singletons label themselves
        assert got[9] == (9, got[9][1])
        # every split populated at n=40 under 50/25/25
        assert {s for _, s in got.values()} == {"train", "val", "test"}

    def test_routing_is_md5_of_cluster_id(self, spark):
        import hashlib

        from kinesiscat_spark.operators.clusters import cluster_safe_split
        from kinesiscat_spark.operators.sampling import md5_threshold

        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        t80, t90 = md5_threshold(0.8), md5_threshold(0.9)
        got = {
            r.doc_id: (r.cluster_id, r.split)
            for r in cluster_safe_split(
                self._docs(spark), self._pairs(spark, [(7, 8)]), w, salt=17
            ).collect()
        }
        for doc_id, (cid, split) in got.items():
            h = hashlib.md5(f"{cid}\x1f17".encode()).hexdigest()[:12]
            want = "train" if h < t80 else ("val" if h < t90 else "test")
            assert split == want, (doc_id, cid, h)

    def test_reserved_column_collision_raises(self, spark):
        from pyspark.sql import functions as F

        from kinesiscat_spark.operators.clusters import cluster_safe_split

        import pytest

        docs = self._docs(spark).withColumn("cluster_id", F.lit(1))
        with pytest.raises(ValueError, match="cluster_id"):
            cluster_safe_split(
                docs, self._pairs(spark, []), {"train": 1.0}
            )

    def test_empty_pairs_degenerates_to_hash_split(self, spark):
        from kinesiscat_spark.operators.clusters import cluster_safe_split
        from kinesiscat_spark.operators.sampling import hash_split

        docs = self._docs(spark)
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        empty = self._pairs(spark, [])
        a = {
            (r.doc_id, r.split)
            for r in cluster_safe_split(docs, empty, w, salt=5).collect()
        }
        b = {
            (r.doc_id, r.split)
            for r in hash_split(docs, w, ["doc_id"], salt=5)
            .select("doc_id", "split")
            .collect()
        }
        assert a == b
