"""Hot-bucket skew guard for the LSH band self-joins (VERDICT r2 #1).

A band key shared by m documents puts m²/2 candidate pairs in ONE join
task; boilerplate-heavy corpora hit m ~ 10⁵ and AQE cannot split a
within-key cartesian. minhash_lsh_pairs / simhash_pairs divert buckets
above ``max_bucket`` into a star join against the bucket's min-id member
(m−1 pairs), which preserves connected components downstream.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kinesiscat_spark.operators.clusters import keep_canonical
from kinesiscat_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

BOILERPLATE = (
    "terms of service all rights reserved please enable javascript "
    "to continue to this site content copyright the respective owners"
)


def _hot_corpus(spark, n_dup: int, n_unique: int = 20):
    """n_dup identical boilerplate docs + n_unique distinct docs."""
    dup = [(i, BOILERPLATE) for i in range(n_dup)]
    uniq = [
        (n_dup + j, f"unique document number {j} with its own words {j * 17} "
                    f"and nothing shared beyond stopwords {j * 31}")
        for j in range(n_unique)
    ]
    return spark.createDataFrame(dup + uniq, "doc_id long, text string")


def test_minhash_hot_bucket_star_bounded(spark):
    """10⁴ identical docs: guarded plan emits m−1 star pairs, not m²/2
    (≈5×10⁷) clique pairs, and completes in bounded time."""
    n = 10_000
    docs = _hot_corpus(spark, n)
    t0 = time.monotonic()
    pairs = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=1000)
    rows = pairs.count()
    wall = time.monotonic() - t0
    # star: every dup links to hub id 0 exactly once
    assert rows == n - 1
    hubs = pairs.select("id_a").distinct().collect()
    assert [r["id_a"] for r in hubs] == [0]
    est = pairs.agg(F.min("est_jaccard"), F.max("est_jaccard")).collect()[0]
    assert est[0] == est[1] == 1.0  # identical docs agree on all hashes
    # the m² plan at this size would materialize ~5e7 join rows; the star
    # path finishes comfortably inside a local-mode minute
    assert wall < 120, f"hot-bucket guard did not bound the join ({wall:.0f}s)"


def test_simhash_hot_bucket_star_bounded(spark):
    n = 10_000
    docs = _hot_corpus(spark, n)
    pairs = simhash_pairs(docs, max_distance=3, max_bucket=1000)
    got = pairs.count()
    assert got == n - 1
    assert pairs.filter(F.col("hamming") != 0).count() == 0
    assert pairs.select("id_a").distinct().collect()[0]["id_a"] == 0


def test_star_equals_clique_for_cluster_resolution(spark):
    """Star-linked hot buckets resolve to the SAME surviving documents as
    the unguarded clique (connected components are preserved)."""
    docs = _hot_corpus(spark, 50, n_unique=10)
    survivors = {}
    for cap in (10, None):  # 10 → the 50-doc bucket is hot; None → clique
        pairs = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=cap)
        kept = keep_canonical(docs, pairs, id_col="doc_id")
        survivors[cap] = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert survivors[10] == survivors[None]
    assert 0 in survivors[10] and 1 not in survivors[10]


def test_minhash_hot_star_pairs_bypass_threshold(spark):
    """ADVICE r3: star pairs must NOT be est-filtered. When the hot
    bucket's min-id member is an outlier (est(hub, member) < threshold for
    every member), an est-filtered star would emit zero pairs for the
    bucket — disconnecting mutual duplicates that the star exists to keep
    linked. The fixed guard emits the star unfiltered (with the true
    estimate), accepting the documented mirror trade-off: the outlier is
    linked INTO the cluster, where the unguarded clique would drop it.

    The outlier text was found by offline search over the deterministic
    md5 Carter-Wegman family: it shares exactly one full signature band
    (band 7) with the base text at est_jaccard = 15/32 < 0.5."""
    from kinesiscat_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    outlier = (
        "the quick brown fox jumps over the lazy dog near "
        "suffix0 tail0 extra0 more0"
    )
    docs = spark.createDataFrame(
        [(0, outlier)] + [(i, base) for i in range(1, 9)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=5)
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    # the outlier is hub of the band-7 pileup: its star pairs carry
    # est < threshold and MUST survive
    for i in range(1, 9):
        assert got.get((0, i)) == 15 / 32, got
    # the identical docs stay linked through their own hot buckets
    for i in range(2, 9):
        assert got.get((1, i)) == 1.0
    # contrast: the unguarded clique est-filters the outlier pairs away
    clique = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=None)
    cl = {(r["id_a"], r["id_b"]) for r in clique.collect()}
    assert (0, 1) not in cl and (1, 2) in cl


def test_simhash_default_is_exact(spark):
    """ADVICE r3: simhash_pairs' documented EXACT contract (d ≤ 3) must
    hold with default arguments — the skew cap is opt-in."""
    import inspect

    from kinesiscat_spark.operators.dedup import simhash_pairs

    assert inspect.signature(simhash_pairs).parameters["max_bucket"].default is None
    # 40 identical docs: default (uncapped) output is the full clique
    docs = _hot_corpus(spark, 40, n_unique=5)
    assert simhash_pairs(docs, max_distance=3).count() == 40 * 39 // 2


def test_cold_buckets_unchanged_by_guard(spark):
    """Below the cap, guarded output is bit-identical to the unguarded
    operator (the driver lanes rely on this at sf0.01/sf0.1)."""
    docs = _hot_corpus(spark, 30, n_unique=15)
    for fn, kw in (
        (minhash_lsh_pairs, {"threshold": 0.5}),
        (simhash_pairs, {"max_distance": 3}),
    ):
        guarded = fn(docs, max_bucket=1000, **kw).sort("id_a", "id_b").collect()
        clique = fn(docs, max_bucket=None, **kw).sort("id_a", "id_b").collect()
        assert guarded == clique


def test_ngram_prefix_filter_matches_naive_plan(spark):
    """PPJoin prefix filtering is exact: identical output to the naive
    inverted-index plan on a mixed corpus."""
    from kinesiscat_spark.operators.dedup import ngram_jaccard_pairs

    docs = _hot_corpus(spark, 25, n_unique=15)
    fast = ngram_jaccard_pairs(docs, 0.4, prefix_filter=True).sort(
        "id_a", "id_b"
    ).collect()
    naive = ngram_jaccard_pairs(docs, 0.4, prefix_filter=False).sort(
        "id_a", "id_b"
    ).collect()
    assert fast == naive
    assert fast  # the boilerplate cluster produced pairs


def test_ngram_prefix_excludes_frequent_shingles(spark):
    """A shingle present in every document must not appear in any prefix
    (it sorts last by document frequency), so the candidate join never
    builds its m² posting pairs."""
    from kinesiscat_spark.operators.dedup import shingle_hashes
    from pyspark.sql import functions as F

    common = "alpha beta gamma"
    docs = spark.createDataFrame(
        [(i, f"{common} unique{i} words{i} tail{i} here{i}") for i in range(40)],
        "doc_id long, text string",
    )
    # the shared shingle's hash
    shared_h = (
        spark.createDataFrame([(common,)], "t string")
        .select(F.explode(shingle_hashes(F.col("t"), 3)).alias("h"))
        .collect()[0]["h"]
    )
    sh = docs.select(
        F.col("doc_id").alias("id"), shingle_hashes(F.col("text"), 3).alias("sh")
    )
    inv = sh.select("id", F.explode("sh").alias("h"))
    df_h = inv.groupBy("h").agg(F.count("*").alias("_df"))
    ordered = (
        inv.join(df_h, "h")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("_df", "h"))).alias("o"))
        .select("id", F.transform(F.col("o"), lambda s: s["h"]).alias("ord_h"))
    )
    n_sh = F.size("ord_h")
    p_len = n_sh - F.ceil(F.lit(0.4) * n_sh).cast("int") + 1
    prefixes = ordered.select(F.explode(F.slice("ord_h", 1, p_len)).alias("h"))
    assert prefixes.filter(F.col("h") == shared_h).count() == 0


def test_ngram_ppjoin_filters_bound_common_prefix_shingle(spark):
    """A moderately common shingle that survives INTO prefixes (rarer than
    the ring-filler boilerplate, so it sorts early in the rare-first
    order) used to pair up every carrier doc — the within-key m² blowup
    VERDICT r3 flagged. PPJoin's length + positional filters prune those
    rows inside the join, before the dedupe exchange, without losing any
    valid pair. Corpus: 60 docs over a 20-token ring (filler shingle
    df ≈ 34) in four geometric size classes, 30 docs carrying a needle
    phrase (df = 30 → ranks ahead of the filler)."""
    from kinesiscat_spark.operators.dedup import ngram_jaccard_pairs, shingle_hashes

    ring = [f"w{j}" for j in range(20)]
    needle = "moderately common needle"
    sizes = [5, 9, 16, 20]
    rows = []
    for i in range(60):
        filler = [ring[(i + k) % 20] for k in range(sizes[i // 15])]
        text = " ".join(filler)
        if i % 2 == 0:
            text = needle + " " + text
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.65

    # mirror the operator's prefix construction to observe the join input
    sh = docs.select(
        F.col("doc_id").alias("id"), shingle_hashes(F.col("text"), 3).alias("sh")
    )
    inv = sh.select("id", F.explode("sh").alias("h"))
    df_h = inv.groupBy("h").agg(F.count("*").alias("_df"))
    ordered = (
        inv.join(df_h, "h")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("_df", "h"))).alias("o"))
        .select("id", F.transform(F.col("o"), lambda s: s["h"]).alias("ord_h"))
    )
    n_sh = F.size("ord_h")
    p_len = n_sh - F.ceil(F.lit(t) * n_sh).cast("int") + 1
    prefix = ordered.select(
        "id",
        n_sh.alias("n_sh"),
        F.posexplode(F.slice("ord_h", 1, p_len)).alias("pos0", "h"),
    ).select("id", "n_sh", (F.col("pos0") + 1).alias("pos"), "h")

    # precondition: the needle really is a common PREFIX shingle
    needle_h = (
        spark.createDataFrame([(needle,)], "t string")
        .select(F.explode(shingle_hashes(F.col("t"), 3)).alias("h"))
        .collect()[0]["h"]
    )
    assert prefix.filter(F.col("h") == needle_h).count() >= 15

    a, b = prefix.alias("a"), prefix.alias("b")
    base = (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id"))
    alpha = F.ceil(
        (F.col("a.n_sh") + F.col("b.n_sh")) * F.lit(t / (1.0 + t)) - F.lit(1e-9)
    )
    length_ok = F.least(F.col("a.n_sh"), F.col("b.n_sh")) >= (
        F.greatest(F.col("a.n_sh"), F.col("b.n_sh")) * F.lit(t) - F.lit(1e-9)
    )
    pos_ok = (
        1
        + F.least(F.col("a.n_sh") - F.col("a.pos"), F.col("b.n_sh") - F.col("b.pos"))
    ) >= alpha
    unfiltered = a.join(b, base).count()
    filtered = a.join(b, base & length_ok & pos_ok).count()
    # measured locally: 2125 → 651 join rows (candidate pairs 865 → 354)
    assert filtered <= unfiltered / 2.5, (unfiltered, filtered)

    # and the filters are exactness-preserving on this corpus
    fast = ngram_jaccard_pairs(docs, t, prefix_filter=True).sort(
        "id_a", "id_b"
    ).collect()
    naive = ngram_jaccard_pairs(docs, t, prefix_filter=False).sort(
        "id_a", "id_b"
    ).collect()
    assert fast == naive and len(fast) > 100


def test_ngram_prefix_property_random_corpora(spark):
    """Property check: on randomized corpora drawn from a small word pool
    (maximal shingle sharing — the adversarial case for prefix filtering),
    the prefix-filtered plan emits exactly the naive plan's pairs."""
    import random

    from kinesiscat_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(1234)
    pool = [f"w{i}" for i in range(12)]
    for trial in range(5):
        docs = [
            (i, " ".join(rng.choice(pool) for _ in range(rng.randint(3, 12))))
            for i in range(30)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        t = rng.choice([0.3, 0.5, 0.8, 1.0])
        fast = ngram_jaccard_pairs(df, t, prefix_filter=True).sort(
            "id_a", "id_b"
        ).collect()
        naive = ngram_jaccard_pairs(df, t, prefix_filter=False).sort(
            "id_a", "id_b"
        ).collect()
        assert fast == naive, f"trial {trial} t={t}"


def test_utc_wall_is_dst_proof(spark):
    """utc_wall must render the UTC digits of instants on both sides of a
    DST transition identically under any session timezone (the naive
    to_utc_timestamp(current_timezone()) trick is off by an hour around
    the spring-forward gap; pure epoch arithmetic is not)."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.io_tables import utc_wall

    import datetime as dt

    # 2024-03-10 07:00 UTC is 01:59 EST / 03:00 EDT — the transition
    instants = ["2024-03-10 06:59:00", "2024-03-10 07:00:00",
                "2024-11-03 05:30:00", "2024-11-03 06:30:00"]
    epoch_us = [
        int(
            dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
        )
        * 1_000_000
        for s in instants
    ]
    df = spark.createDataFrame([(u,) for u in epoch_us], "us long")
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        rendered = {}
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            ts = F.timestamp_micros(F.col("us"))  # instant, tz-independent
            out = df.select(
                F.date_format(utc_wall(ts), "yyyy-MM-dd HH:mm:ss").alias("w")
            ).collect()
            rendered[tz] = [r.w for r in out]
        assert rendered["UTC"] == rendered["America/New_York"] == instants
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
