"""Deduplication queries over `documents` (extension surface X1/X2).

Scale design: exact dedup is a hash-partitioned aggregation on the dedup key
— at 100 TB the key should be a fixed-width digest (sha2) rather than the
full text so the shuffle moves 32 bytes/row instead of documents. Near-dup
variants (MinHash LSH, SimHash, n-gram Jaccard, embedding cosine) compose the
operators in kinesiscat_spark.operators.dedup; all are hash-checked against
DuckDB oracles — md5-derived hashing makes even the LSH variants
deterministic and SQL-reproducible (see operators/dedup.py module doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.dedup import (
    MOD48,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from kinesiscat_spark.registry import query


@query(
    "dedup_exact",
    oracle="""
SELECT
  sha256(text) AS text_hash,
  CAST(MIN(doc_id) AS BIGINT) AS doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY sha256(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup, scale form: keep the lowest doc_id per identical
    text, grouping on a sha-256 digest — a fixed-width shuffle key.

    At 100 TB the digest is computed in the scan stage (codegen) and only
    (digest, doc_id) shuffles; the text column never moves. Grouping by
    the digest is group-equivalent to grouping by the text itself
    (collision probability ~2⁻²⁵⁶), so this one lane carries both the
    semantic operator and its scale plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2("text", 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
    )


JACCARD_T = 0.4
_SHINGLES_CTE = r"""
toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id, list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                 i -> array_to_string(t[i:i+2], ' ')) AS s
  FROM toks
)"""

CONTAINMENT_T = 0.6

PR_DAMPING = 0.85
PR_ITERS = 4

# leakage-safe split (round 9): cluster-keyed 80/10/10 routing
_LS_W = {"train": 0.8, "val": 0.1, "test": 0.1}
_LS_SALT = 17


def _leak_split_ctes() -> str:
    """DuckDB twin of cluster_safe_split over the jaccard ∪ containment
    pair graph: transitive closure (min-id labels — tiny at oracle SF),
    pair-free docs label themselves, then the exact md5-threshold routing
    ``hash_split`` ships (same chr(31) key join, same hex thresholds).
    The audit CTE counts near-dup pairs whose endpoints straddle splits
    under naive doc-id routing vs cluster routing."""
    from kinesiscat_spark.operators.sampling import md5_threshold

    t_train = md5_threshold(_LS_W["train"])
    t_val = md5_threshold(_LS_W["train"] + _LS_W["val"])

    def route(key: str) -> str:
        h = f"substr(md5(CAST({key} AS VARCHAR) || chr(31) || '{_LS_SALT}'), 1, 12)"
        return (f"CASE WHEN {h} < '{t_train}' THEN 'train' "
                f"WHEN {h} < '{t_val}' THEN 'val' ELSE 'test' END")

    return f""",
lsedge AS (
  SELECT id_a, id_b FROM sim
  WHERE jaccard >= {JACCARD_T} OR containment >= {CONTAINMENT_T}
),
lsdir AS (
  SELECT id_a AS u, id_b AS v FROM lsedge
  UNION
  SELECT id_b, id_a FROM lsedge
),
lsreach(u, v) AS (
  SELECT u, v FROM lsdir
  UNION
  SELECT r.u, e.v FROM lsreach r JOIN lsdir e ON r.v = e.u
),
lslab AS (
  SELECT u AS id, LEAST(u, MIN(v)) AS cluster_id FROM lsreach GROUP BY u
),
lsall AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lslab l ON d.doc_id = l.id
),
lssplit AS (
  SELECT doc_id, cluster_id, {route("cluster_id")} AS split FROM lsall
),
lsnaive AS (
  SELECT doc_id, {route("doc_id")} AS split FROM lsall
),
lsaudit AS (
  SELECT
    (SELECT COALESCE(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0)
     FROM lsedge e JOIN lsnaive a ON e.id_a = a.doc_id
                   JOIN lsnaive b ON e.id_b = b.doc_id) AS n_naive,
    (SELECT COALESCE(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0)
     FROM lsedge e JOIN lssplit a ON e.id_a = a.doc_id
                   JOIN lssplit b ON e.id_b = b.doc_id) AS n_cluster
)"""


def _pagerank_layers() -> str:
    """WEIGHTED PageRank replay (Page et al. 1999; w = raw jaccard) over
    the jaccard ∪ containment pair graph: ``PR_ITERS`` unrolled CTE
    layers (the Lloyd-IVF recipe), per-node strength and neighbor sums
    folded in VALUE order (``list_sum(list(c ORDER BY c))`` ↔ Spark
    sort_array+aggregate — the DSIR-proven pairing), every arithmetic
    step in the operator's written order over identical IEEE doubles.
    The weights matter: dup clusters are near-cliques, and unweighted
    PageRank holds the uniform 1/N on every regular component — the
    similarity-weighted form is the one whose centrality actually varies
    (pinned non-degenerate at the oracle SF)."""
    d = PR_DAMPING
    layers = []
    for k in range(1, PR_ITERS + 1):
        layers.append(f""",
pr{k} AS (
  SELECT t.v, (1.0 - {d!r}) / (SELECT n FROM prn) + {d!r} * t.s AS r
  FROM (
    SELECT e.dst AS v,
           list_sum(list(p.r * e.w / s.s_out
                         ORDER BY p.r * e.w / s.s_out)) AS s
    FROM prw e JOIN pr{k - 1} p ON p.v = e.src
    JOIN prs s ON s.v = e.src
    GROUP BY e.dst
  ) t
)""")
    return f""",
predge AS (
  SELECT id_a, id_b, jaccard AS w FROM sim
  WHERE jaccard >= {{jt}} OR containment >= {{ct}}
),
prw AS (
  SELECT id_a AS src, id_b AS dst, w FROM predge
  UNION ALL
  SELECT id_b AS src, id_a AS dst, w FROM predge
),
prs AS (
  SELECT src AS v, list_sum(list(w ORDER BY w)) AS s_out
  FROM prw GROUP BY src
),
prn AS (SELECT COUNT(*)::BIGINT AS n FROM prs),
pr0 AS (SELECT v, 1.0 / (SELECT n FROM prn) AS r FROM prs)
{"".join(layers)}"""


# Both measures come off ONE common-count CTE: containment is just one
# more projected column (|A∩B| / min sizes) over the same pair counts the
# Jaccard rows use — the round-7 `kind='containment'` widening.
_JACCARD_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
dsh AS (SELECT doc_id, list_distinct(s) AS s FROM sh),
inv AS (SELECT doc_id, unnest(s) AS shingle FROM dsh),
sizes AS (SELECT doc_id, len(s) AS n FROM dsh),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sim AS (
  SELECT id_a, id_b,
         n_common / (sa.n + sb.n - n_common) AS jaccard,
         n_common / least(sa.n, sb.n) AS containment
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
){_pagerank_layers().format(jt=JACCARD_T, ct=CONTAINMENT_T)}{_leak_split_ctes()}
SELECT 'jaccard' AS kind, id_a, id_b, ROUND(jaccard, 6) AS jaccard,
       CAST(NULL AS DOUBLE) AS containment
FROM sim WHERE jaccard >= {JACCARD_T}
UNION ALL
SELECT 'containment' AS kind, id_a, id_b, ROUND(jaccard, 6) AS jaccard,
       ROUND(containment, 6) AS containment
FROM sim WHERE containment >= {CONTAINMENT_T}
UNION ALL
SELECT 'rank' AS kind, v AS id_a, CAST(NULL AS BIGINT) AS id_b,
       ROUND(r, 6) AS jaccard, CAST(NULL AS DOUBLE) AS containment
FROM pr{PR_ITERS}
UNION ALL
SELECT 'split_' || split AS kind, doc_id AS id_a, cluster_id AS id_b,
       CAST(NULL AS DOUBLE) AS jaccard, CAST(NULL AS DOUBLE) AS containment
FROM lssplit
UNION ALL
SELECT 'leak_audit' AS kind, CAST(n_naive AS BIGINT) AS id_a,
       CAST(n_cluster AS BIGINT) AS id_b,
       CAST(NULL AS DOUBLE) AS jaccard, CAST(NULL AS DOUBLE) AS containment
FROM lsaudit
"""


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact near-dup: word-3-gram Jaccard >= 0.4 via inverted index.

    The self-join key is a 64-bit shingle hash, so the exchange carries
    (hash, doc_id) pairs; per-doc cardinalities join back (unhinted — AQE
    broadcasts when small).

    ``kind='containment'`` (round-7 widening): the asymmetric
    short-in-long measure ``|A∩B| / min(|A|,|B|) >= 0.6``
    (``operators/dedup.py ngram_containment_pairs``) — catches a short
    document embedded in a long one, which Jaccard structurally misses.
    Same shingles, same common-count semantics, hash-checked against the
    same oracle CTE.
    """
    docs = load_table(spark, sf_dir, "documents")
    # ONE candidate-union + ONE verify pass computes BOTH measures
    # (operators/dedup.py ngram_similarity_pairs — round 9: the two
    # per-measure verifies and dedupe exchanges are merged; each
    # generator's candidate set is exact for its own measure, so
    # filtering the union by either threshold reproduces that measure's
    # pair set exactly). The merged frame materializes ONCE for its many
    # consumers — jaccard rows, containment rows, the rank branch's edge
    # graph (which pagerank re-reads across iterations), and the
    # split/audit branches — the PPJoin-in-codegen shape of the join
    # itself is pinned at the OPERATOR level in test_plan_shape.py.
    # count_plan_max_docs: bounded-probe adaptive plan choice (see the
    # operator docstring) — identical pairs either way.
    from kinesiscat_spark.operators.dedup import ngram_similarity_pairs

    # EAGER checkpoint (round 9): the first consumer to touch a lazy
    # checkpoint here is pagerank's bounded limit().collect(), and
    # executeTake materializes the expensive verify pass with throttled
    # parallelism (first a 1-partition job, then the rest — measured 2×
    # the frame's parallel noop cost); eager runs ONE fully parallel
    # materialization job instead, and every downstream collect reads
    # checkpointed partitions in ~10 ms.
    merged = ngram_similarity_pairs(
        docs, JACCARD_T, CONTAINMENT_T, n=3, count_plan_max_docs=200_000
    ).localCheckpoint(eager=True)
    jp = merged.filter(F.col("jaccard") >= JACCARD_T)
    jac = jp.select(
        F.lit("jaccard").alias("kind"),
        "id_a",
        "id_b",
        F.round("jaccard", 6).alias("jaccard"),
        F.lit(None).cast("double").alias("containment"),
    )
    cp = merged.filter(F.col("containment") >= CONTAINMENT_T)
    cont = cp.select(
        F.lit("containment").alias("kind"),
        "id_a",
        "id_b",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("containment", 6).alias("containment"),
    )
    # round-7 continuation (kind='rank'): similarity-WEIGHTED PageRank
    # centrality (Page et al. 1999; w = raw jaccard) over the jaccard ∪
    # containment pair graph — the representative score for duplicate
    # clusters (operators/clusters.py pagerank). The weighting matters:
    # dup clusters are near-cliques, where unweighted PageRank stays at
    # the uniform 1/N; the jaccard-weighted walk breaks the symmetry, so
    # the hash check pins genuinely varying centralities through all
    # four unrolled iterations.
    from kinesiscat_spark.operators.clusters import pagerank

    # merged holds each qualifying pair exactly once (J >= t OR C >= t'),
    # so the edge graph is a plain projection — no union, no distinct
    # exchange (round 9; was jp ∪ cp + distinct)
    edges = merged.select("id_a", "id_b", "jaccard")
    rank = pagerank(
        edges, damping=PR_DAMPING, n_iters=PR_ITERS, weight_col="jaccard"
    ).select(
        F.lit("rank").alias("kind"),
        F.col("v").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("rank").alias("jaccard"),
        F.lit(None).cast("double").alias("containment"),
    )
    # round-9 widening (kinds 'split_*' + 'leak_audit'): LEAKAGE-SAFE
    # train/val/test split (operators/clusters.py cluster_safe_split; Lee
    # et al. 2022 §6) — every document routed by the md5 hash of its
    # near-dup CLUSTER representative over the same jaccard ∪ containment
    # pair graph, so near-duplicates structurally cannot straddle splits.
    # The split name rides `kind` ('split_train'/'split_val'/'split_test'),
    # the cluster representative rides id_b — the hash check pins the full
    # transitive closure AND the routing for every document. The audit row
    # quantifies what the guarantee buys: near-dup pairs straddling splits
    # under the NAIVE doc-id routing (id_a, non-zero at this corpus) vs
    # under the cluster routing (id_b, structurally zero).
    from kinesiscat_spark.operators.clusters import (
        cluster_safe_split,
        connected_components,
    )

    # merged is already checkpointed and unique per pair: the components
    # run and both straddle joins read the same materialization — the
    # former distinct + second checkpoint are gone (round 9)
    pairs_audit = merged.select("id_a", "id_b")
    labels = connected_components(pairs_audit)
    lsplit = cluster_safe_split(
        docs.select("doc_id"), pairs_audit, _LS_W, salt=_LS_SALT,
        _labels=labels,
    ).localCheckpoint(eager=False)  # two consumers: rows + audit join
    split_rows = lsplit.select(
        F.concat(F.lit("split_"), F.col("split")).alias("kind"),
        F.col("doc_id").alias("id_a"),
        F.col("cluster_id").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
        F.lit(None).cast("double").alias("containment"),
    )
    from kinesiscat_spark.operators.sampling import hash_split

    def _straddle(assign: DataFrame) -> DataFrame:
        a = assign.select(
            F.col("doc_id").alias("id_a"), F.col("split").alias("_sa")
        )
        b = assign.select(
            F.col("doc_id").alias("id_b"), F.col("split").alias("_sb")
        )
        return pairs_audit.join(a, "id_a").join(b, "id_b").agg(
            F.coalesce(
                F.sum((F.col("_sa") != F.col("_sb")).cast("long")), F.lit(0)
            ).alias("n")
        )
    naive = _straddle(
        hash_split(docs.select("doc_id"), _LS_W, ["doc_id"], salt=_LS_SALT)
    )
    clustered = _straddle(lsplit)
    audit = naive.crossJoin(
        clustered.withColumnRenamed("n", "n_cluster")
    ).select(
        F.lit("leak_audit").alias("kind"),
        F.col("n").alias("id_a"),
        F.col("n_cluster").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
        F.lit(None).cast("double").alias("containment"),
    )
    # per-kind digests into DEBUG_dedup_ngram_jaccard.jsonl (VERDICT r8
    # task 7) — computed inside the driver's own collect job
    from kinesiscat_spark.debug_digests import observe_kind_digests

    return observe_kind_digests(
        jac.unionByName(cont)
        .unionByName(rank)
        .unionByName(split_rows)
        .unionByName(audit),
        "dedup_ngram_jaccard",
        [
            "jaccard",
            "containment",
            "rank",
            "split_train",
            "split_val",
            "split_test",
            "leak_audit",
        ],
    )


MINHASH_T = 0.5
N_HASHES, N_BANDS = 32, 8
_R = N_HASHES // N_BANDS

def minhash_oracle(distinct_pairs: bool = True) -> str:
    """DuckDB twin of the banded-minhash candidate pipeline. With
    ``distinct_pairs`` each qualifying pair appears once (the batch
    ``minhash_lsh_pairs`` contract); without, once PER colliding band —
    exactly the multiset the streaming operator emits when it drains
    (streaming/stateful.py streaming_minhash_candidates)."""
    distinct = "DISTINCT " if distinct_pairs else ""
    return f"""
WITH {_SHINGLES_CTE},
hp AS (
  SELECT doc_id,
         list_transform(list_transform(s, x -> md5(x)),
           m -> {{'a': ('0x' || substring(m, 1, 12))::BIGINT,
                  'b': ('0x' || substring(m, 13, 12))::BIGINT}}) AS hp
  FROM sh
),
sigs AS (
  SELECT doc_id,
         list_transform(generate_series(0, {N_HASHES - 1}),
           i -> list_min(list_transform(hp, p -> (p.a + i * p.b) % {MOD48}))) AS sig
  FROM hp
),
bands AS (
  SELECT doc_id, sig, t.b AS band, sig[{_R}*t.b + 1 : {_R}*t.b + {_R}] AS key
  FROM sigs CROSS JOIN range(0, {N_BANDS}) t(b)
),
cand AS (
  SELECT {distinct}a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
est AS (
  SELECT id_a, id_b,
         len(list_filter(list_zip(sig_a, sig_b), p -> p[1] = p[2])) / {N_HASHES}.0
           AS est_jaccard
  FROM cand
)
SELECT id_a, id_b, ROUND(est_jaccard, 6) AS est_jaccard
FROM est WHERE est_jaccard >= {MINHASH_T}
"""


_MINHASH_ORACLE = minhash_oracle(distinct_pairs=True)

# Round-6 widening: split-leakage detection rides the same lane under a
# `kind` column — the SAME candidate pairs joined against the md5-interval
# split assignment (operators/sampling.py hash_split, salt pinned to the
# sampling_mix lane's), filtered to pairs that STRADDLE splits.  The
# leak oracle reuses the minhash pair SQL verbatim plus the split CASE.
_LEAK_SALT = 11  # == curation_queries._SPLIT_SALT (same split assignment)


def _leak_oracle() -> str:
    from kinesiscat_spark.operators.sampling import md5_threshold

    split_case = f"""CASE WHEN substr(md5(doc_id || chr(31) || '{_LEAK_SALT}'), 1, 12)
             < '{md5_threshold(0.8)}' THEN 'train'
        WHEN substr(md5(doc_id || chr(31) || '{_LEAK_SALT}'), 1, 12)
             < '{md5_threshold(0.9)}' THEN 'val'
        ELSE 'test' END"""
    body = minhash_oracle(distinct_pairs=True)
    # ONE materialized pair CTE serves all four kinds (the Spark side's
    # shared candidate subtree, mirrored); the recursive reach walk
    # (the keep_canonical oracle's recipe) derives the component-size
    # histogram for kind='comp_hist'.
    return f"""
WITH RECURSIVE
mp AS MATERIALIZED ({body}),
chedges AS (
  SELECT id_a AS u, id_b AS v FROM mp
  UNION SELECT id_b, id_a FROM mp
),
chreach(u, v) AS (
  SELECT u, v FROM chedges
  UNION
  SELECT r.u, e.v FROM chreach r JOIN chedges e ON r.v = e.u
),
chlabels AS (
  SELECT u AS id, LEAST(u, MIN(v)) AS cluster_id FROM chreach GROUP BY u
),
chsizes AS (
  SELECT cluster_id, COUNT(*)::BIGINT AS sz FROM chlabels GROUP BY cluster_id
),
chhist AS (SELECT sz, COUNT(*)::BIGINT AS n FROM chsizes GROUP BY sz)
SELECT 'pairs' AS kind, id_a, id_b, est_jaccard,
       CAST(NULL AS VARCHAR) AS split_a, CAST(NULL AS VARCHAR) AS split_b
FROM mp
UNION ALL
SELECT 'leak' AS kind, p.id_a, p.id_b, p.est_jaccard, sa.split AS split_a,
       sb.split AS split_b
FROM mp p
JOIN (SELECT doc_id, {split_case} AS split FROM documents) sa
  ON sa.doc_id = p.id_a
JOIN (SELECT doc_id, {split_case} AS split FROM documents) sb
  ON sb.doc_id = p.id_b
WHERE sa.split <> sb.split
UNION ALL
SELECT 'src_overlap' AS kind, CAST(NULL AS BIGINT) AS id_a,
       CAST(NULL AS BIGINT) AS id_b, CAST(n AS DOUBLE) AS est_jaccard,
       ga AS split_a, gb AS split_b
FROM (
  SELECT least(sa.source, sb.source) AS ga,
         greatest(sa.source, sb.source) AS gb, COUNT(*)::BIGINT AS n
  FROM mp p
  JOIN documents sa ON sa.doc_id = p.id_a
  JOIN documents sb ON sb.doc_id = p.id_b
  GROUP BY 1, 2
)
UNION ALL
SELECT 'comp_hist' AS kind, sz AS id_a, n AS id_b,
       CAST(NULL AS DOUBLE) AS est_jaccard,
       CAST(NULL AS VARCHAR) AS split_a, CAST(NULL AS VARCHAR) AS split_b
FROM chhist
"""


@query("dedup_minhash_lsh", oracle=_leak_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 approximate near-dup: 32-hash / 8-band minhash LSH, est >= 0.5.

    Deterministic (md5 Carter-Wegman hashing) so the DuckDB oracle
    reproduces candidates AND estimates exactly; candidate volume scales
    with duplicate density, not n^2.

    ``kind='leak'`` (round-6 widening): train/eval split-LEAKAGE report
    (``operators/sampling.py split_leakage_report``) — the same candidate
    pairs joined against the deterministic 80/10/10 ``hash_split``
    assignment and filtered to pairs straddling splits: the near-twin
    contamination a row-level split cannot prevent (Lee et al. 2022
    §6.2).  Both kinds share one candidate computation in the oracle; on
    the Spark side the leak branch recomputes pairs (lazy plans dedupe
    the scan via ReusedExchange where shapes align) and the split lookup
    is two narrow broadcast joins.
    """
    from kinesiscat_spark.operators.sampling import (
        hash_split,
        split_leakage_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    # the pair frame materializes ONCE (lazy localCheckpoint) for its
    # FOUR consumers — pairs, leak, src_overlap, and comp_hist (whose
    # iterative CC would otherwise re-run the banded pipeline per
    # checkpoint); the one-Arrow-kernel/ReusedExchange shape of the
    # pipeline itself is pinned at the OPERATOR in test_plan_shape.py
    out = minhash_lsh_pairs(
        docs, threshold=MINHASH_T, n_hashes=N_HASHES, n_bands=N_BANDS, n=3
    ).localCheckpoint(eager=False)
    pairs = out.select(
        F.lit("pairs").alias("kind"),
        "id_a",
        "id_b",
        F.round("est_jaccard", 6).alias("est_jaccard"),
        F.lit(None).cast("string").alias("split_a"),
        F.lit(None).cast("string").alias("split_b"),
    )
    split_docs = hash_split(
        docs,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        key_cols=["doc_id"],
        salt=_LEAK_SALT,
        method="md5",
    )
    # share ONE candidate computation: the leak branch consumes the same
    # `out` subtree, so the union's two minhash subtrees are identical and
    # the band exchange (and its Arrow signature kernel) runs once
    # (ReusedExchange — pinned by test_minhash_single_kernel_join_est_codegen)
    leak = split_leakage_report(split_docs, pairs=out).select(
        F.lit("leak").alias("kind"),
        "id_a",
        "id_b",
        F.round("est_jaccard", 6).alias("est_jaccard"),
        "split_a",
        "split_b",
    )
    # round-7 continuation (kind='src_overlap'): cross-source duplication
    # report at DOC granularity (operators/dedup.py
    # duplication_overlap_report) — which datasets actually duplicate
    # each other, off the SAME shared candidate subtree; source pair
    # rides split_a/split_b, the pair count rides est_jaccard.
    from kinesiscat_spark.operators.dedup import duplication_overlap_report

    overlap = duplication_overlap_report(out, docs).select(
        F.lit("src_overlap").alias("kind"),
        F.lit(None).cast("long").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("n_pairs").cast("double").alias("est_jaccard"),
        F.col("group_a").alias("split_a"),
        F.col("group_b").alias("split_b"),
    )
    # round-7 continuation (kind='comp_hist'): duplicate-CLUSTER size
    # histogram — connected components over the same candidate pairs,
    # then (size, n_clusters): the "are dups twins or giant blobs"
    # diagnostic behind a dedup policy choice (keep-canonical is cheap
    # for twins, star-guarded banding matters for blobs). Size rides
    # id_a, the cluster count rides id_b.
    from kinesiscat_spark.operators.clusters import connected_components

    hist = (
        connected_components(out)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("_sz"))
        .groupBy("_sz")
        .agg(F.count("*").alias("_n"))
        .select(
            F.lit("comp_hist").alias("kind"),
            F.col("_sz").cast("long").alias("id_a"),
            F.col("_n").cast("long").alias("id_b"),
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(None).cast("string").alias("split_a"),
            F.lit(None).cast("string").alias("split_b"),
        )
    )
    # per-kind digests into DEBUG_dedup_minhash_lsh.jsonl (VERDICT r8
    # task 7) — computed inside the driver's own collect job
    from kinesiscat_spark.debug_digests import observe_kind_digests

    return observe_kind_digests(
        pairs.unionByName(leak).unionByName(overlap).unionByName(hist),
        "dedup_minhash_lsh",
        ["pairs", "leak", "src_overlap", "comp_hist"],
    )


SIMHASH_D = 3

_SIMHASH_ORACLE = f"""
WITH md5s AS (
  SELECT doc_id,
         list_transform(string_split_regex(lower(text), '\\s+'), t -> md5(t)) AS hs
  FROM documents
),
bits AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63), b ->
           list_sum(list_transform(hs, h ->
             CASE WHEN ((('0x' || substring(h, b // 4 + 1, 1))::INT >> (b % 4)) & 1) = 1
                  THEN 1 ELSE -1 END)) > 0) AS bv
  FROM md5s
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_filter(list_zip(a.bv, b.bv), p -> p[1] <> p[2])) AS INT)
           AS hamming
  FROM bits a JOIN bits b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {SIMHASH_D}
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 near-dup: 64-bit simhash pairs at Hamming distance <= 3.

    The 4x16-bit band join is exhaustive for d <= 3 (pigeonhole), so the
    result equals the oracle's full n^2 scan while shuffling only
    (band, 16-bit key, id).
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_distance=SIMHASH_D)


COSINE_T = 0.4

_EMB_NEAR_DUP_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(list_zip(a.embedding, b.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
    (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
     sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(sim, 6) AS sim FROM pairs WHERE sim >= {COSINE_T}
"""


@query("dedup_embedding_cosine", oracle=_EMB_NEAR_DUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 embedding near-dup: all pairs with cosine >= 0.4 (exact verify
    stage; at 100 TB runs on LSH candidates only)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = embedding_near_dup_pairs(emb, threshold=COSINE_T)
    return out.select("id_a", "id_b", F.round("sim", 6).alias("sim"))
