"""Duplicate-cluster resolution: near-dup PAIRS → connected components →
one canonical document per cluster.

The dedup operators (ngram_jaccard_pairs / minhash_lsh_pairs /
simhash_pairs / embedding_near_dup_pairs) emit pairwise matches; an ingest
pipeline must then drop all-but-one of each transitive cluster (A~B, B~C ⇒
{A,B,C} is one duplicate group even if A≁C directly). That is connected
components over the pair graph.

Algorithm: hash-to-min label propagation — every node's label is the
smallest node id it has ever heard of; one iteration is

    l(u) ← min(l(u), min over neighbors v of l(v))

which converges in O(graph diameter) rounds (near-dup clusters are
near-cliques from banded LSH, so diameter is tiny — 2-4 rounds in
practice). Each round is two hash joins + one groupBy-min, all
key-partitioned; nothing collects to the driver, and ``localCheckpoint``
truncates the growing lineage so round N's plan does not replay rounds
1..N-1. This is the standard scalable CC formulation (cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — the
hash-to-min variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    check_every: int = 3,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """(id, cluster_id) for every id appearing in ``pairs``; cluster_id is
    the smallest id reachable through the pair graph.

    Deterministic (min-id labels), oracle-checkable for small graphs, and
    scale-shaped: per round the exchanges carry (id, label) pairs only.

    Adaptive small-graph path (round 9, guide §1.2): near-dup pair graphs
    are PAIR-bounded (edges ≪ documents — the detector's thresholds keep
    them sparse), so when at most ``small_graph_edges`` numeric-id edges
    exist they are collected once and labeled with a driver-side
    union-find — one bounded action instead of a convergence loop whose
    every batch is a driver-blocking multi-join job. The labels are
    IDENTICAL (min reachable id is a property of the graph, not the
    algorithm). Graphs over the threshold (or with non-numeric ids,
    where JVM/Python orderings could differ) take the distributed loop
    unchanged; ``small_graph_edges=0`` disables the fast path.
    """
    from pyspark.sql import types as T

    id_type = pairs.schema[id_a].dataType
    if small_graph_edges and isinstance(id_type, T.NumericType):
        rows = (
            pairs.select(id_a, id_b).limit(small_graph_edges + 1).collect()
        )
        if len(rows) <= small_graph_edges:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for a, b in rows:
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by min id: the smaller root stays root, so
                    # every component's final root IS its min id
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            out = [(x, find(x)) for x in parent]
            schema = T.StructType(
                [
                    T.StructField("id", id_type),
                    T.StructField("cluster_id", id_type),
                ]
            )
            return pairs.sparkSession.createDataFrame(out, schema)
    # The edge list is reused every round: materialize it ONCE (already
    # hash-partitioned on the join side v), instead of re-running the
    # union+distinct scan per iteration as lazy lineage would. LAZY
    # checkpoint (round 9): the first convergence action materializes it
    # inline — same one-time materialization, one fewer driver-blocking
    # job up front.
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .repartition("v")
        .localCheckpoint(eager=False)
    )
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    labels = edges.groupBy("u").agg(F.least(F.min("v"), F.min("u")).alias("l"))

    changed = -1
    it = 0
    while it < max_iters:
        # One round = one join (u hears l(v) from every neighbor v) + one
        # union-aggregate that fuses the merge AND the convergence test:
        # the self rows carry the old label, so min-over-group is the new
        # label and (new < old) is the changed flag — no separate
        # labels ⋈ heard join. Every u has a self row, so _old is never
        # NULL. Rounds chain LAZILY in batches of ``check_every`` and one
        # localCheckpoint + one convergence action closes each batch —
        # min-label propagation is monotone, so overshooting a round
        # inside a batch changes nothing, and batching rounds (3 per
        # action: near-clique dup graphs converge by round 2-3, so one
        # batch usually both converges AND proves it) cuts the
        # driver-side action count that dominates on small graphs.
        batch = min(check_every, max_iters - it)
        for _ in range(batch):
            heard = (
                edges.join(labels.withColumnRenamed("u", "v"), "v")
                .select("u", "l", F.lit(False).alias("_self"))
            )
            stepped = (
                heard.unionByName(
                    labels.select("u", "l", F.lit(True).alias("_self"))
                )
                .groupBy("u")
                .agg(
                    F.min("l").alias("nl"),
                    F.min(F.when(F.col("_self"), F.col("l"))).alias("_old"),
                )
                .select(
                    "u",
                    F.col("nl").alias("l"),
                    (F.col("nl") < F.col("_old")).cast("int").alias("chg"),
                )
            )
            labels = stepped.select("u", "l")
            it += 1
        stepped = stepped.localCheckpoint(eager=False)
        # chg covers only the LAST round of the batch — exactly the
        # convergence question (did the final propagation still move?)
        changed = (stepped.agg(F.sum("chg")).first()[0] or 0)
        labels = stepped.select("u", "l")
        if changed == 0:
            break
    if changed != 0:
        # Unconverged labels would make keep_canonical split clusters and
        # silently retain duplicates — make that observable (a pair graph
        # with diameter > max_iters, e.g. a chain of near-dups).
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iters} "
            "iterations; labels may split clusters — raise max_iters",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("u").alias("id"), F.col("l").alias("cluster_id"))


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every non-canonical member of each duplicate cluster: keep the
    lowest-id document per connected component, and every document that
    appears in no pair at all. The end-to-end dedup a training pipeline
    runs after any near-dup detector.
    """
    cc = connected_components(pairs, id_a, id_b)
    losers = cc.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-aware cluster resolution: keep the HIGHEST-``score_col``
    member of each duplicate cluster (ties → lowest id) instead of
    ``keep_canonical``'s lowest-id rule — the "keep the best
    representative" policy real pipelines apply once a quality signal
    exists (longest text, highest LM score, freshest snapshot), so a
    near-dup cluster surrenders its truncated/boilerplate variants
    rather than whichever happened to carry the smallest id.

    Same scale shape as keep_canonical: connected components exchange
    (id, label) pairs, then ONE rank window partitioned by cluster over
    the CLUSTER MEMBERS only (pair-dense rows, not the corpus), and a
    left-anti join drops the losers. Deterministic: (score DESC, id ASC)
    total order within each cluster.
    """
    from pyspark.sql.window import Window

    cc = connected_components(pairs, id_a, id_b)
    members = cc.join(
        docs.select(
            F.col(id_col).alias("id"), F.col(score_col).alias("_score")
        ),
        "id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_score"), F.asc("id")
    )
    losers = (
        members.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") > 1)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    n_iters: int = 4,
    id_a: str = "id_a",
    id_b: str = "id_b",
    weight_col: str | None = None,
    checkpoint_every: int = 5,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """Weighted PageRank over the undirected near-dup pair graph (Page et
    al. 1999; edge-weighted generalization à la Xing & Ghorbani 2004):
    (id, rank) for every node appearing in ``pairs``, with

        r_{k+1}(v) = (1−d)/N + d · Σ_{u∈nbr(v)} r_k(u) · w(u,v) / S(u)

    where S(u) = Σ_x w(u,x) is u's out-strength; ``weight_col=None``
    means w ≡ 1 (S = degree — classic PageRank). On a duplicate graph
    with similarity weights the rank is a centrality score for cluster
    representatives — the highest-rank member sits closest to the
    cluster's similarity center of mass (a degree-smoothed alternative
    to ``keep_best``'s single quality column). Weights must be positive.
    Every node has S > 0 (it appears in a pair), so there is no dangling
    mass and each iteration redistributes rank exactly. Note near-dup
    clusters are near-CLIQUES: under w ≡ 1 every regular component holds
    the uniform 1/N forever, so the weighted form is the informative one
    on dedup graphs.

    Deterministic and ANSI-SQL-replayable: per-node strength and
    neighbor sums fold in VALUE order (sort_array + aggregate ↔ DuckDB
    ``list_sum(list(c ORDER BY c))`` — the DSIR-proven pairing), every
    other step is one written arithmetic order over identical IEEE
    doubles, and ``n_iters`` unrolls into CTE layers on the oracle side
    (the Lloyd-IVF recipe).

    Scale shape: the doubled edge list and strength table materialize
    once (localCheckpoint), so every iteration joins CACHED frames; the
    rank frame itself is consumed exactly once per iteration, so the
    lazy chain stays a LINEAR plan (one job, n_iters stacked
    join+agg stages) — it re-materializes only every
    ``checkpoint_every`` iterations to bound plan depth on long runs
    instead of paying a job per iteration. Each iteration's exchange
    carries (node, contrib) rows bounded by the EDGE count, never
    documents. N rides a 1-row crossJoin. Rank rounds to 6 dp at the
    edge.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1) (got {damping})")
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1 (got {n_iters})")
    if checkpoint_every < 1:
        # 0 would ZeroDivisionError at the cadence check; negatives would
        # silently disable the plan-depth-bounding checkpoint (ADVICE r7)
        raise ValueError(
            f"checkpoint_every must be >= 1 (got {checkpoint_every})"
        )
    # Adaptive small-graph path (round 9, the connected_components
    # precedent): near-dup pair graphs are PAIR-bounded, so when at most
    # ``small_graph_edges`` pairs exist they are collected once and the
    # whole iteration runs on the driver — one bounded action instead of
    # n_iters join+aggregate stage waves. The arithmetic REPLAYS the
    # distributed plan bit-for-bit: the strength and contribution folds
    # sum in ascending VALUE order from 0.0 (sort_array + aggregate ≡
    # sorted() + left fold over IEEE doubles), each rank update is the
    # same written expression order, and the final round(·, 6) is left
    # to SPARK on the returned frame so rounding semantics cannot drift.
    # Graphs over the threshold — or containing non-finite weights,
    # where Spark's NaN ordering differs from Python's — take the
    # distributed loop unchanged; ``small_graph_edges=0`` disables the
    # fast path (tests pin fast ≡ loop).
    if small_graph_edges:
        import math

        from pyspark.sql import types as T

        wsel = (
            F.col(weight_col) if weight_col else F.lit(1.0)
        ).alias("_w")
        rows = (
            pairs.select(F.col(id_a), F.col(id_b), wsel)
            .limit(small_graph_edges + 1)
            .collect()
        )
        finite = all(
            r[2] is not None and math.isfinite(r[2]) for r in rows
        )
        if len(rows) <= small_graph_edges and finite:
            edges: list = []
            for a, b, wv in rows:
                # both directions, non-positive weights dropped — the
                # exact explode+filter of the distributed plan (self
                # loops double like the explode does)
                if wv > 0.0:
                    edges.append((a, b, wv))
                    edges.append((b, a, wv))
            out_w: dict = {}
            for src, _, wv in edges:
                out_w.setdefault(src, []).append(wv)
            strength = {}
            for src, ws in out_w.items():
                s = 0.0
                for x in sorted(ws):
                    s = s + x
                strength[src] = s
            n = len(strength)
            id_type = pairs.schema[id_a].dataType
            schema = T.StructType(
                [
                    T.StructField("v", id_type),
                    T.StructField("r", T.DoubleType()),
                ]
            )
            spark = pairs.sparkSession
            if n == 0:
                return spark.createDataFrame([], schema).select(
                    "v", F.round("r", 6).alias("rank")
                )
            ranks = {v: 1.0 / n for v in strength}
            for _ in range(n_iters):
                contribs: dict = {}
                for src, dst, wv in edges:
                    contribs.setdefault(dst, []).append(
                        ranks[src] * wv / strength[src]
                    )
                new_ranks = {}
                for v, cs in contribs.items():
                    s = 0.0
                    for x in sorted(cs):
                        s = s + x
                    new_ranks[v] = (1.0 - damping) / n + damping * s
                ranks = new_ranks
            return spark.createDataFrame(
                [(v, r) for v, r in ranks.items()], schema
            ).select("v", F.round("r", 6).alias("rank"))
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    # both directions from ONE pass over `pairs` (a union of two selects
    # would evaluate the — typically expensive — pair subtree twice
    # before the checkpoint materializes it); non-positive/NULL weights
    # would zero (or NULL) a node's out-strength and poison the division,
    # so those edges are dropped (a node whose every edge is dropped
    # leaves the graph)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"),
                        F.col(id_b).alias("dst"),
                        w.alias("w"),
                    ),
                    F.struct(
                        F.col(id_b).alias("src"),
                        F.col(id_a).alias("dst"),
                        w.alias("w"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst", "e.w")
        .filter(F.col("w") > 0.0)
        .localCheckpoint(eager=False)
    )
    strength = (
        edges.groupBy("src")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list("w")),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("s_out")
        )
        .localCheckpoint(eager=False)
    )
    # strength is joined into the cached edge frame ONCE, so each
    # iteration pays a single join with the rank frame instead of two;
    # w and s_out stay separate columns — the contribution is still
    # r·w/s_out in the same written order, bit-identical to the oracle
    edges_s = edges.join(strength, "src").localCheckpoint(eager=False)
    n1 = strength.agg(F.count("*").alias("_n"))
    ranks = strength.select(F.col("src").alias("v")).crossJoin(n1).select(
        "v", (F.lit(1.0) / F.col("_n")).alias("r")
    )
    for it in range(1, n_iters + 1):
        contribs = edges_s.join(
            ranks.withColumnRenamed("v", "src"), "src"
        ).select(
            F.col("dst").alias("v"),
            (F.col("r") * F.col("w") / F.col("s_out")).alias("c"),
        )
        summed = contribs.groupBy("v").agg(
            F.aggregate(
                F.sort_array(F.collect_list("c")),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("_s")
        )
        ranks = summed.crossJoin(n1).select(
            "v",
            (
                (F.lit(1.0) - F.lit(damping)) / F.col("_n")
                + F.lit(damping) * F.col("_s")
            ).alias("r"),
        )
        if it % checkpoint_every == 0 and it < n_iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("v", F.round("r", 6).alias("rank"))


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights,
    salt: int = 0,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    method: str = "md5",
    _labels: DataFrame | None = None,
) -> DataFrame:
    """Leakage-safe train/val/test split: route every document by the md5
    hash of its near-dup CLUSTER representative (the component's min id),
    not its own id — so two near-duplicate documents can NEVER land in
    different splits. Splitting by doc id silently leaks eval content
    into training whenever the dedup pass missed (or was run after) the
    split; cluster-keyed routing makes the guarantee structural
    (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" §6 measure exactly this train-test leakage).

    Returns ``docs`` + ``cluster_id`` (own id for pair-free documents) +
    ``split``. Deterministic and engine-portable for ``method="md5"``
    (the ``hash_split`` contract), so an external auditor can recompute
    the assignment from the pair list alone.

    Scale shape: connected components exchange (id, label) pairs over
    the PAIR-dense ids only; the corpus joins the labels in once
    (left join — pair-free docs stay scan-stage) and the split itself is
    a scan-stage CASE over the hash. Text never shuffles.
    """
    from kinesiscat_spark.operators.sampling import hash_split

    for reserved in ("cluster_id", "split"):
        if reserved in docs.columns:
            raise ValueError(
                f"docs already has a {reserved!r} column — rename it; "
                "cluster_safe_split adds cluster_id and split"
            )
    # `_labels`: precomputed connected_components output (the `_ordered`
    # sharing precedent) — callers that already ran components over the
    # same pair graph pass it to avoid a second iterative labeling
    cc = (
        _labels
        if _labels is not None
        else connected_components(pairs, id_a, id_b)
    ).withColumnRenamed("id", "_cc_id")
    labeled = docs.join(
        cc, docs[id_col] == cc["_cc_id"], "left"
    ).select(
        *[docs[c] for c in docs.columns],
        F.coalesce(F.col("cluster_id"), docs[id_col]).alias("cluster_id"),
    )
    return hash_split(
        labeled, weights, ["cluster_id"], salt=salt, method=method
    )
