"""Near-duplicate detection over text columns (extension surface X2).

All operators are pure DataFrame compositions designed around one idea:
never shuffle the documents themselves — shuffle fixed-width keys
(shingle hashes, minhash bands, simhash bands) and join doc ids back.

- ``shingles``: word n-grams as an array column (JVM transform over a
  sequence — no Python, no explode until needed).
- ``ngram_jaccard_pairs``: EXACT pairwise Jaccard ≥ t. Default plan is
  PPJoin-style: candidates from rare-first prefixes under a global
  (doc-frequency, hash) order — frequent boilerplate shingles never meet
  in the join — then exact array_intersect verification. The join keys
  are 64-bit xxhashes: at 100 TB the exchanges carry (hash, doc_id)
  pairs and candidate-pair hash sets, never text.
- ``minhash_signature`` / ``minhash_lsh_pairs``: approximate candidates via
  banded minhash, then estimated-similarity filter. Collision work scales
  with actual near-dup density, not n².
- ``simhash64`` / ``simhash_pairs``: 64-bit simhash; near-dups = Hamming
  distance ≤ d found via 4-way band join (pigeonhole: distance ≤ 3 ⇒ at
  least one 16-bit quarter equal).
- ``embedding_near_dup_pairs``: exact all-pairs cosine ≥ t (validation
  scale); the 100 TB path is an LSH prefilter (operators.similarity) with
  this as the verify stage on candidates only.

Hashing is md5-derived (not murmur3) on purpose: md5 is bit-identical in
Spark and DuckDB, so minhash/simhash results are *oracle-checkable* —
the driver hash-compares them against ANSI-SQL twins. Minhash uses one
md5 per shingle and derives the H hash functions Carter-Wegman style
(g_i = (h1 + i*h2) mod 2^48), so the md5 cost is O(shingles), not
O(shingles × H). To trade oracle checkability for raw speed at 100 TB,
swap ``_md5_h1h2`` for ``F.xxhash64`` with seed columns — everything else
is unchanged.
"""

from __future__ import annotations

from hashlib import md5 as _md5

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesiscat_spark.let import let_

MOD48 = 1 << 48  # Carter-Wegman modulus: 48-bit values fit BIGINT with i*h2 headroom


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string>; docs shorter than n words
    produce a single shingle of the whole doc.

    Built as a zip of n shifted slices of the LET-BOUND token array, NOT
    as ``transform(sequence, i -> slice(toks, i, n))`` — a subexpression
    referenced inside a HOF lambda is re-evaluated per element by Catalyst,
    which would recompute the full ``split`` once per shingle (O(len²) per
    document); the let_ binding (kinesiscat_spark/let.py) evaluates the
    split exactly once per row (the zip alone would still pay it n+1
    times). ``concat_ws`` skips nulls, which handles both the zip padding
    and the shorter-than-n single-shingle case.
    """
    def body(toks: Column) -> Column:
        count = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        out = F.slice(toks, 1, count)
        for j in range(2, n + 1):
            out = F.zip_with(
                out, F.slice(toks, j, count), lambda a, b: F.concat_ws(" ", a, b)
            )
        return out

    return let_(tokens(text), body)


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct 64-bit xxhash64 of the n-gram shingles (inverted-index key)."""
    return F.array_distinct(F.transform(shingles(text, n), lambda s: F.xxhash64(s)))


def _hexint(h: Column, start: int, length: int) -> Column:
    """Parse ``length`` hex chars of ``h`` (1-based ``start``) as a long."""
    return F.conv(F.substring(h, start, length), 16, 10).cast("long")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_filter: bool = True,
    max_shingle_df: int | None = None,
    _ordered: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs ≥ threshold.

    ``prefix_filter=True`` (default): PPJoin prefix-filtered plan
    (Xiao et al., WWW'08 — public algorithm). Shingles are globally
    ordered by (document frequency, hash); a pair with Jaccard ≥ t must
    share an element within the first ``|d| − ⌈t·|d|⌉ + 1`` shingles of
    BOTH docs under that ordering (pigeonhole on the required overlap
    ⌈t·|d|⌉), so only the rare-first prefixes are indexed and the
    frequent boilerplate shingles — the m²-posting hot spots of a plain
    inverted index — never meet in the candidate join. Matched prefix
    rows then pass PPJoin's length filter (min size ≥ t·max size) and
    positional filter (1 + min remaining-after-match ≥ required overlap
    α) inside the join's codegen — both prune only pairs that cannot
    reach t, bounding the within-key blowup of a moderately common
    prefix shingle BEFORE the dedupe exchange. Candidates are
    then verified EXACTLY with a JVM ``array_intersect`` of the full
    hash sets, so the output is identical to the naive plan (and to the
    SQL oracle); only the candidate-generation cost changes. The verify
    exchange carries shingle arrays for candidate pairs only — its
    volume scales with near-dup density, not with posting-list skew.

    ``prefix_filter=False``: the classic inverted-index count plan
    (explode → self-join on hash → count collisions) — fewer shuffles,
    right when posting lists are known to be short.

    ``max_shingle_df`` (round 7, the documented 100 TB pruning knob):
    shingles whose document frequency exceeds the cap are dropped from
    the CANDIDATE INDEX only — verify still runs over the full hash
    sets, so every emitted pair's Jaccard is exact and precision is
    unchanged; the trade is RECALL: a pair whose entire shared prefix is
    boilerplate (all shared rare-first-prefix shingles above the cap) is
    never considered. Boilerplate shingles carry no near-dup signal at
    meaningful thresholds, and they are exactly the m²-posting hot spots
    that dominate candidate cost at corpus scale. None (default) keeps
    the operator exact. Prefix-path only (the inverted-index fallback
    has no index to prune).
    """
    from kinesiscat_spark.io_tables import spread

    sh = spread(docs, id_col).select(
        F.col(id_col).alias("id"), shingle_hashes(F.col(text_col), n).alias("sh")
    )
    if not prefix_filter:
        sizes = sh.select("id", F.size("sh").alias("n_sh"))
        inv = sh.select("id", F.explode("sh").alias("h"))
        a, b = inv.alias("a"), inv.alias("b")
        common = (
            a.join(
                b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id"))
            )
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("n_common"))
        )
        # No broadcast hint on the size frames: they are one row PER
        # DOCUMENT, so forcing a broadcast is a driver/executor OOM at
        # corpus scale. Left unhinted, AQE broadcasts them when they are
        # actually small and shuffle-joins otherwise.
        sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
        sim = (
            common.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "jaccard",
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
            )
        )
        return sim.filter(F.col("jaccard") >= threshold).select(
            "id_a", "id_b", "jaccard"
        )

    ordered = _ordered if _ordered is not None else _ordered_shingles(sh)
    cand = _jaccard_prefix_candidates(
        ordered, threshold, max_shingle_df
    ).dropDuplicates(["id_a", "id_b"])
    verified = _verify_candidates(ordered, cand)
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def _jaccard_prefix_candidates(
    ordered: DataFrame, threshold: float, max_shingle_df: int | None = None
) -> DataFrame:
    """PPJoin candidate generation for Jaccard >= threshold over the
    ordered-shingle table: rare-first prefix self-join with the length /
    positional / suffix filters inside the join's codegen (see
    ``ngram_jaccard_pairs``). Returns raw (id_a, id_b) MATCH ROWS — one
    per shared prefix shingle, NOT deduplicated — so callers can union
    several candidate generators and pay ONE dedupe exchange.
    """
    n_sh = F.size("ord_h")
    # clamp: at threshold 0, n - ceil(t*n) + 1 = n + 1 (the whole array is
    # the prefix; there is no (n+1)-th element to index)
    p_len = F.least(
        n_sh - F.ceil(F.lit(float(threshold)) * n_sh).cast("int") + 1, n_sh
    )
    # carry doc size, the 1-based position of each prefix shingle, AND the
    # suffix-filter summary (the (df,h)-order middle element of this
    # position's suffix plus its left/right partition sizes): the three
    # PPJoin filters below need them, and they ride the same (h, id)
    # exchange as one small struct + three ints — no extra shuffle.
    def _pref_struct(ordc: Column, pos: Column) -> Column:
        n = F.size(ordc)
        s = n - pos  # suffix size at this position
        m = pos + 1 + F.floor((s - 1) / F.lit(2)).cast("int")  # pivot index
        return F.struct(
            pos.alias("pos"),
            F.element_at(ordc, pos)["h"].alias("h"),
            F.element_at(ordc, pos)["_df"].alias("df"),
            # NULL pivot ⇔ empty suffix (when s = 0, m degenerates to pos
            # — the matched element itself — so the guard must be on s)
            F.when(s > 0, F.try_element_at(ordc, m)).alias("w"),
            (m - pos - 1).cast("int").alias("l"),
            (n - m).cast("int").alias("r"),
        )

    prefix = ordered.select(
        "id",
        n_sh.alias("n_sh"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), p_len),
                lambda pos: _pref_struct(F.col("_ord"), pos),
            )
        ).alias("p"),
    ).select("id", "n_sh", "p.pos", "p.h", "p.df", "p.w", "p.l", "p.r")
    if max_shingle_df is not None:
        # index pruning only: dropping a prefix ROW loses the candidates
        # that row would have generated, nothing else — the positional/
        # suffix bounds of surviving rows still reference positions in
        # the FULL rare-first order, so they stay exactness-preserving
        # for every pair that is still found.
        prefix = prefix.filter(F.col("df") <= max_shingle_df)
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin filters (Xiao et al. WWW'08 §3; both exactness-preserving —
    # they prune only pairs that CANNOT reach Jaccard ≥ t, so the verified
    # output is unchanged):
    #  - length filter: J ≤ min/max, so a valid pair needs
    #    min(|a|,|b|) ≥ t·max(|a|,|b|).
    #  - positional filter: for the FIRST shingle the two prefixes share
    #    (under the global rare-first order), no common shingle can rank
    #    before it in either doc, so overlap ≤ 1 + min(|a|−pa, |b|−pb);
    #    a valid pair needs overlap ≥ α = ⌈t·(|a|+|b|)/(1+t)⌉. Applied
    #    per matched row with overlap-so-far = 1: the first-shared-shingle
    #    row of every valid pair passes, so the pair survives the
    #    dropDuplicates; later-shingle rows it prunes were redundant.
    # The 1e-9 slack keeps FP rounding of t·size from pruning boundary
    # pairs. Both run inside the join's codegen, BEFORE the dedupe
    # exchange — candidate volume, not just verify cost, shrinks.
    alpha = F.ceil(
        (F.col("a.n_sh") + F.col("b.n_sh"))
        * F.lit(float(threshold) / (1.0 + float(threshold)))
        - F.lit(1e-9)
    )
    length_ok = F.least(F.col("a.n_sh"), F.col("b.n_sh")) >= (
        F.greatest(F.col("a.n_sh"), F.col("b.n_sh")) * F.lit(float(threshold))
        - F.lit(1e-9)
    )
    pos_ok = (
        1
        + F.least(
            F.col("a.n_sh") - F.col("a.pos"), F.col("b.n_sh") - F.col("b.pos")
        )
    ) >= alpha
    # Suffix filter (PPJoin+, Xiao et al. WWW'08 §4, depth-1): each prefix
    # row carries the middle element w of its own suffix under the global
    # (df, h) order, plus the sizes (l, r) of the suffix parts strictly
    # before/after it. For the first-shared-shingle row of a pair, the
    # suffix overlap c = |Sa ∩ Sb| is bounded by partitioning the ordered
    # domain at the two pivots (distinct (df,h) per doc → strict order):
    #   wa = wb: the pivots can match (1), the halves pairwise intersect —
    #            c ≤ min(la,lb) + 1 + min(ra,rb);
    #   wa < wb: split at wb (Sa-side elements ≥ wb all lie in Ra) and,
    #            independently, at wa (Sb-side elements ≤ wa all lie in
    #            Lb) — c ≤ min(lb, sa) + min(ra, rb+1) and
    #            c ≤ min(la+1, lb) + min(ra, sb); take the least;
    #   wa > wb: mirror.
    # Every case only DROPS pairs whose overlap provably cannot reach α,
    # so the verified output is unchanged (differential-pinned in
    # tests/test_dedup.py). Degenerate suffixes (s = 0, pivot NULL) fall
    # back to the positional bound. All comparisons are struct codegen —
    # the filter runs inside the join, before the dedupe exchange.
    _sa = F.col("a.n_sh") - F.col("a.pos")
    _sb = F.col("b.n_sh") - F.col("b.pos")
    _la, _ra = F.col("a.l"), F.col("a.r")
    _lb, _rb = F.col("b.l"), F.col("b.r")
    _c_eq = F.least(_la, _lb) + 1 + F.least(_ra, _rb)
    _c_ab = F.least(
        F.least(_lb, _sa) + F.least(_ra, _rb + 1),
        F.least(_la + 1, _lb) + F.least(_ra, _sb),
    )
    _c_ba = F.least(
        F.least(_la, _sb) + F.least(_rb, _ra + 1),
        F.least(_lb + 1, _la) + F.least(_rb, _sa),
    )
    _c = F.least(
        F.when(F.col("a.w") == F.col("b.w"), _c_eq)
        .when(F.col("a.w") < F.col("b.w"), _c_ab)
        .otherwise(_c_ba),
        F.least(_sa, _sb),
    )
    suffix_ok = F.when(
        F.col("a.w").isNotNull() & F.col("b.w").isNotNull(), (1 + _c) >= alpha
    ).otherwise(F.lit(True))
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id"))
            & length_ok
            & pos_ok
            & suffix_ok,
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    return cand


def _verify_candidates(ordered: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact verify: set intersection of the full hash sets for candidate
    pairs only. Computes BOTH similarity measures off the one
    ``array_intersect`` (containment is one extra ``least`` + division, and
    unused measure columns prune away), so any mix of candidate
    generators shares a single verify pass. ``ord_h`` carries the SAME
    distinct hash set as the raw shingles (just rare-first ordered —
    array_intersect is order-blind), so verifying against it avoids
    another shingle scan."""
    full = ordered.select("id", F.col("ord_h").alias("_hs"))
    return (
        cand.join(
            full.select(F.col("id").alias("id_a"), F.col("_hs").alias("_ha")),
            "id_a",
        )
        .join(
            full.select(F.col("id").alias("id_b"), F.col("_hs").alias("_hb")),
            "id_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("_ha", "_hb")))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.size("_ha") + F.size("_hb") - F.col("n_common")).cast(
                "double"
            ),
        )
        .withColumn(
            "containment",
            F.col("n_common")
            / F.least(F.size("_ha"), F.size("_hb")).cast("double"),
        )
    )


def ngram_similarity_pairs(
    docs: DataFrame,
    jaccard_t: float,
    containment_t: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
    count_plan_max_docs: int = 0,
    count_plan_max_sq: int = 50_000_000,
    _ordered: DataFrame | None = None,
) -> DataFrame:
    """BOTH exact near-dup measures from ONE candidate-union + ONE verify
    pass: (id_a, id_b, jaccard, containment) for every pair with
    Jaccard >= jaccard_t OR containment >= containment_t.

    Equivalent to ``ngram_jaccard_pairs(jaccard_t)`` full-outer-merged
    with ``ngram_containment_pairs(containment_t)`` — each generator's
    candidate set is exact for its own measure, so filtering the union by
    either threshold reproduces that measure's pair set exactly — but the
    dedupe exchange and the two verify joins run ONCE instead of twice
    (the round-9 sharing for the dedup_ngram_jaccard lane, which needs
    jaccard rows, containment rows, and the J-or-C edge graph).

    ``count_plan_max_docs`` (round 9, the small-graph-fast-path
    precedent): when > 0 and the corpus has at most that many documents
    (checked with a bounded ``limit().count()`` probe), the EXACT size of
    the naive postings self-join — Σ_h df(h)², one small aggregate over
    the (h → df) table the PPJoin substrate needs anyway — decides the
    plan: at or under ``count_plan_max_sq`` rows the classic
    inverted-index count plan runs (explode → self-join on h → one
    per-pair count aggregate); over it, or on corpora larger than the doc
    gate (where even the probe would be a wasted pass), the
    prefix-filtered PPJoin plan runs unchanged. Rationale: prefix
    filtering earns its extra passes from SKEWED shingle frequencies; on
    a corpus whose every shingle is common (the bench corpus: max df 25
    over 27k distinct shingles) the candidate set degenerates toward the
    full postings join anyway, and the count plan computes n_common
    directly — n_common / sizes are the same integers either way, so
    jaccard and containment are bit-identical doubles (differential-
    pinned in tests/test_dedup.py). Both decision probes are bounded:
    the doc gate by its limit, the Σdf² aggregate by the doc gate.
    """
    if not 0.0 < containment_t <= 1.0:
        raise ValueError(
            f"containment_t must be in (0, 1], got {containment_t}"
        )
    from kinesiscat_spark.io_tables import spread

    if _ordered is not None:
        ordered = _ordered
    else:
        sh = spread(docs, id_col).select(
            F.col(id_col).alias("id"),
            shingle_hashes(F.col(text_col), n).alias("sh"),
        )
        if count_plan_max_docs > 0 and (
            sh.select("id").limit(count_plan_max_docs + 1).count()
            <= count_plan_max_docs
        ):
            sh_ck = sh.localCheckpoint(eager=True)
            inv = sh_ck.select("id", F.explode("sh").alias("h"))
            [sq] = (
                inv.groupBy("h")
                .agg(F.count("*").alias("_df"))
                .agg(F.sum(F.col("_df") * F.col("_df")))
                .first()
            )
            if sq is not None and sq <= count_plan_max_sq:
                if max_shingle_df is not None:
                    # the df cap is an index-pruning knob of the PPJoin
                    # plan; the count plan has no index to prune
                    raise ValueError(
                        "max_shingle_df requires the prefix plan "
                        "(count_plan_max_docs=0)"
                    )
                sizes = sh_ck.select("id", F.size("sh").alias("n_sh"))
                a, b = inv.alias("a"), inv.alias("b")
                common = (
                    a.join(
                        b,
                        (F.col("a.h") == F.col("b.h"))
                        & (F.col("a.id") < F.col("b.id")),
                    )
                    .groupBy(
                        F.col("a.id").alias("id_a"),
                        F.col("b.id").alias("id_b"),
                    )
                    .agg(F.count("*").alias("n_common"))
                )
                sa = sizes.select(
                    F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")
                )
                sb = sizes.select(
                    F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")
                )
                sim = (
                    common.join(sa, "id_a")
                    .join(sb, "id_b")
                    .withColumn(
                        "jaccard",
                        F.col("n_common")
                        / (
                            F.col("n_a") + F.col("n_b") - F.col("n_common")
                        ).cast("double"),
                    )
                    .withColumn(
                        "containment",
                        F.col("n_common")
                        / F.least("n_a", "n_b").cast("double"),
                    )
                )
                return sim.filter(
                    (F.col("jaccard") >= jaccard_t)
                    | (F.col("containment") >= containment_t)
                ).select("id_a", "id_b", "jaccard", "containment")
            sh = sh_ck
        ordered = _ordered_shingles(sh)
    cand = (
        _jaccard_prefix_candidates(ordered, jaccard_t, max_shingle_df)
        .unionByName(
            _containment_prefix_candidates(
                ordered, containment_t, max_shingle_df
            )
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = _verify_candidates(ordered, cand)
    return verified.filter(
        (F.col("jaccard") >= jaccard_t)
        | (F.col("containment") >= containment_t)
    ).select("id_a", "id_b", "jaccard", "containment")


def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_filter: bool = True,
    max_shingle_df: int | None = None,
    _ordered: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT similarity for all pairs ≥ threshold:
    ``|A∩B| / min(|A|, |B|)`` — the asymmetric near-dup measure that
    catches a short document embedded in a long one (quote farms,
    aggregator pages, boilerplate-wrapped reposts), which Jaccard
    structurally misses (a tiny subset of a huge doc has near-zero
    Jaccard but containment 1.0).

    Returns ``(id_a, id_b, containment, jaccard)`` — both measures from
    ONE verify pass, so callers can split "true subsets" (high
    containment, low Jaccard) from mutual near-dups.

    ``prefix_filter=True`` (default): PPJoin's LENGTH/positional bounds
    do not transfer to containment (it deliberately admits extreme size
    ratios), but the PREFIX bound does, one-sided (round 7): a
    qualifying pair needs overlap α = ⌈t·|s|⌉ on its SMALLER side s, so
    the overlap cannot fit entirely in s's last α − 1 rare-first
    positions — the smaller side's prefix (its first |s| − α + 1
    rare-first shingles, the SAME per-doc prefix formula as Jaccard's)
    must hit the other side's FULL shingle set. Candidates are therefore
    prefix(x) ⋈ full-index(y) with |x| ≤ |y|, then verified EXACTLY via
    array_intersect — output identical to the naive plan. Because
    prefixes are rare-first, boilerplate shingles enter the index only
    through the docs that have almost nothing else — the m²-posting hot
    spots never pair two prefix rows. ``max_shingle_df`` composes as a
    further (recall-trading) cap, exactly as in ``ngram_jaccard_pairs``.

    ``prefix_filter=False``: the classic inverted-index count plan
    (explode → self-join → count) — fewer stages, right when posting
    lists are known short.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from kinesiscat_spark.io_tables import spread

    sh = spread(docs, id_col).select(
        F.col(id_col).alias("id"), shingle_hashes(F.col(text_col), n).alias("sh")
    )
    if prefix_filter:
        return _containment_prefix_plan(sh, threshold, max_shingle_df, _ordered)
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("h"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # Size frames are one row per document — never force-broadcast them
    # (at 100 TB that is an O(n_docs) frame pinned on every executor and
    # the driver). AQE broadcasts when the frame is actually small.
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    sim = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "containment",
            F.col("n_common") / F.least("n_a", "n_b").cast("double"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    return sim.filter(F.col("containment") >= threshold).select(
        "id_a", "id_b", "containment", "jaccard"
    )


def _ordered_shingles(sh: DataFrame) -> DataFrame:
    """(id, _ord, ord_h, ord_df): each doc's distinct shingle hashes in
    the global rare-first (document frequency, hash) order, plus the h
    and df arrays projected out — the shared substrate of the
    prefix-filtered Jaccard AND containment plans.

    One explicit hash exchange on h feeds BOTH the document-frequency
    aggregate and the inv ⋈ df_h join (ReusedExchange): the shingle
    scan + explode — the widest stage — runs once. Multiple consumers
    read the result (prefix index, full index, both verify sides; the
    dedup_ngram_jaccard lane reuses ONE build for both measures), and
    per-branch column pruning would make their subtrees differ so
    ReusedExchange never fires — a lazy localCheckpoint materializes it
    once (the semdedup/clusters/bpe discipline). At 100 TB this is the
    deliberate "build the ordered shingle table once, then index and
    verify against it" design."""
    inv = sh.select("id", F.explode("sh").alias("h")).repartition("h")
    df_h = inv.groupBy("h").agg(F.count("*").alias("_df"))
    return (
        inv.join(df_h, "h")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("_df", "h"))).alias("_ord"))
        .select(
            "id",
            "_ord",
            F.transform(F.col("_ord"), lambda s: s["h"]).alias("ord_h"),
            F.transform(F.col("_ord"), lambda s: s["_df"]).alias("ord_df"),
        )
        .localCheckpoint(eager=False)
    )


def _containment_prefix_plan(
    sh: DataFrame,
    threshold: float,
    max_shingle_df: int | None,
    ordered: DataFrame | None = None,
) -> DataFrame:
    """The one-sided prefix-filtered containment plan (see
    ``ngram_containment_pairs``): candidates = smaller side's rare-first
    prefix ⋈ the full inverted index, exact ``array_intersect`` verify.
    Exactness-preserving — differential-pinned against the count plan in
    tests/test_dedup.py."""
    if ordered is None:
        ordered = _ordered_shingles(sh)
    cand = _containment_prefix_candidates(
        ordered, threshold, max_shingle_df
    ).dropDuplicates(["id_a", "id_b"])
    verified = _verify_candidates(ordered, cand)
    return verified.filter(F.col("containment") >= threshold).select(
        "id_a", "id_b", "containment", "jaccard"
    )


def _containment_prefix_candidates(
    ordered: DataFrame, threshold: float, max_shingle_df: int | None = None
) -> DataFrame:
    """One-sided prefix candidate generation for containment >= threshold
    (see ``ngram_containment_pairs``): the smaller side's rare-first
    prefix ⋈ the full inverted index. Returns raw (id_a, id_b) match
    rows — one per index hit, NOT deduplicated — so callers can union
    several candidate generators and pay ONE dedupe exchange."""
    n_sh = F.size("ord_h")
    # prefix bound with the doc's OWN size (it only matters when the doc
    # is the smaller side): |d| − ⌈t·|d|⌉ + 1, clamped at t = 0
    p_len = F.least(
        n_sh - F.ceil(F.lit(float(threshold)) * n_sh).cast("int") + 1, n_sh
    )
    prefix = ordered.select(
        "id",
        n_sh.alias("n_sh"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), p_len),
                lambda pos: F.struct(
                    pos.cast("int").alias("pos"),
                    F.element_at(F.col("ord_h"), pos).alias("h"),
                    F.element_at(F.col("ord_df"), pos).alias("df"),
                ),
            )
        ).alias("p"),
    ).select("id", "n_sh", "p.pos", "p.h", "p.df")
    if max_shingle_df is not None:
        prefix = prefix.filter(F.col("df") <= max_shingle_df)
    fi = ordered.select(
        F.col("id").alias("_fid"),
        n_sh.alias("_fn"),
        F.posexplode("ord_h").alias("_fp0", "h"),
    )
    # positional filter (round 9, exactness-preserving — the PPJoin §3
    # argument transferred to the one-sided join): both per-doc arrays are
    # sorted by the SAME global (df, h) key with distinct elements, so for
    # the FIRST shared shingle — at 1-based positions pos (prefix side)
    # and _fp0+1 (index side) — every other common shingle ranks after it
    # in BOTH docs: overlap ≤ 1 + min(|x|−pos, |y|−(_fp0+1)). A qualifying
    # pair needs overlap ≥ α = ⌈t·|x|⌉, and its first-shared row always
    # satisfies the bound, so it survives the dedupe; rows it prunes were
    # redundant duplicates of the pair. Runs inside the join's codegen —
    # candidate volume (the dedupe exchange AND the verify fan-in)
    # shrinks, output pairs are unchanged (differential-pinned in
    # tests/test_dedup.py).
    alpha = F.ceil(
        prefix["n_sh"] * F.lit(float(threshold)) - F.lit(1e-9)
    )
    pos_ok = (
        1
        + F.least(
            prefix["n_sh"] - prefix["pos"], fi["_fn"] - (fi["_fp0"] + 1)
        )
    ) >= alpha
    return prefix.join(
        fi,
        (prefix["h"] == fi["h"])
        & (prefix["id"] != fi["_fid"])
        & (prefix["n_sh"] <= fi["_fn"])
        & pos_ok,
    ).select(
        F.least(prefix["id"], fi["_fid"]).alias("id_a"),
        F.greatest(prefix["id"], fi["_fid"]).alias("id_b"),
    )


def minhash_signature(text: Column, n_hashes: int = 32, n: int = 3) -> Column:
    """array<long> minhash signature, all JVM-side.

    One md5 per shingle; hash function i is Carter-Wegman
    ``(h1 + i*h2) mod 2^48`` where h1/h2 are the two 48-bit halves of the
    md5's first 96 bits. Deterministic and reproducible in ANSI SQL.
    """
    md5s = F.transform(shingles(text, n), lambda s: F.md5(s))
    hp = F.transform(
        md5s, lambda m: F.struct(_hexint(m, 1, 12).alias("a"), _hexint(m, 13, 12).alias("b"))
    )

    # NB: must be a one-arg lambda — a second Python-level default arg would
    # make F.transform treat it as the (element, index) two-arg form.
    def g(i: int):
        return lambda p: (p["a"] + F.lit(i) * p["b"]) % F.lit(MOD48)

    return F.array(*[F.array_min(F.transform(hp, g(i))) for i in range(n_hashes)])


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig) DataFrame of minhash signatures — the scalable form of
    ``minhash_signature``.

    Explodes distinct shingles so each md5 is computed exactly once, then
    takes the H Carter-Wegman minima as ``min()`` aggregates (map-side
    partial, one shuffle on id). The Column form recomputes the md5 array
    once per hash function — and Catalyst duplicates that whole subtree
    into every consumer (each side of a self-join, the estimate column),
    which turns quadratic in expression size; the aggregation here is a
    materialization barrier, so downstream plans reuse ``sig`` as a plain
    column. Values are bit-identical to ``minhash_signature``.
    """
    from kinesiscat_spark.io_tables import spread

    sh = spread(docs, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("s"),
    )
    hp = sh.select(
        "id",
        _hexint(F.md5("s"), 1, 12).alias("h1"),
        _hexint(F.md5("s"), 13, 12).alias("h2"),
    )
    # One SQL string = one py4j round trip for all n_hashes aggregates
    # (round 9 — see corpus_minhash_signatures); identical expressions,
    # identical results.
    sig = "array(" + ",".join(
        f"min((h1 + {i} * h2) % {MOD48}L)" for i in range(n_hashes)
    ) + ")"
    return hp.groupBy("id").agg(F.expr(sig).alias("sig"))


def minhash_signature_udf(n_hashes: int = 32, n: int = 3):
    """Arrow-batched minhash signature kernel, bit-identical to
    ``minhash_signature`` / ``minhash_signatures`` (differential-tested).

    Same tokenization as the Column spec (lowercase + ASCII ``\\s+`` split,
    matching Java/RE2 — see simhash64_udf), same shingling (n-gram join,
    short docs → one shingle), same md5-derived Carter-Wegman family
    (h1/h2 = first/second 6 digest bytes == conv(substring(hex,1,12)) /
    conv(substring(hex,13,12))), same ``(h1 + i*h2) mod 2^48`` minima —
    computed as one numpy (n_hashes × n_shingles) matrix per document.
    One md5 per DISTINCT shingle, one pass, no exploded-shingle shuffle
    and no 32-aggregate groupBy.
    """
    import re

    import numpy as np

    from pyspark.sql import types as T

    ws = re.compile(r"\s+", re.ASCII)
    i_arr = None  # built lazily so the closure pickles small

    def one(text: str) -> list:
        nonlocal i_arr
        if i_arr is None:
            i_arr = np.arange(n_hashes, dtype=np.int64)[:, None]
        toks = ws.split(text.lower())
        cnt = max(len(toks) - (n - 1), 1)
        seen = dict.fromkeys(" ".join(toks[i : i + n]) for i in range(cnt))
        h1 = np.empty(len(seen), dtype=np.int64)
        h2 = np.empty(len(seen), dtype=np.int64)
        for j, s in enumerate(seen):
            d = _md5(s.encode("utf-8")).digest()
            h1[j] = int.from_bytes(d[:6], "big")
            h2[j] = int.from_bytes(d[6:12], "big")
        sigs = (h1[None, :] + i_arr * h2[None, :]) % MOD48
        return sigs.min(axis=1).tolist()

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    return sig


def _minhash_bands(
    docs: DataFrame,
    n_hashes: int,
    n_bands: int,
    n: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, _m0.._m{n_hashes-1}, bk: struct<band, key>) — one row per
    (document, band).

    Signatures come from the Arrow kernel (one md5 per distinct shingle,
    no exploded-shingle shuffle, no 32-aggregate groupBy; bit-identical
    to the Column spec — see minhash_signature_udf), unpacked to
    n_hashes SEPARATE long columns so per-pair agreement counts compile
    to scalar comparisons inside whole-stage codegen (the array form's
    size(filter(zip_with(...))) is an interpreted HOF chain — at ~200k
    candidate-band pairs × 32 elements that alone cost ~1 s at sf0.1).
    The band key is xxhash64 of the r-length signature slice: a single
    fixed-width long instead of an array<long> in the join exchange.
    """
    r = n_hashes // n_bands
    from kinesiscat_spark.io_tables import spread

    raw_sig = spread(docs, id_col).select(
        F.col(id_col).alias("id"),
        minhash_signature_udf(n_hashes, n)(F.col(text_col)).alias("_sig"),
    )
    # selectExpr / expr strings: the former per-column Column listcomps
    # cost hundreds of py4j round trips per invocation (round 9, measured
    # with cProfile — pure driver-side construction overhead); one parsed
    # string builds identical expressions.
    sig = raw_sig.selectExpr(
        "id", *[f"_sig[{i}] AS _m{i}" for i in range(n_hashes)]
    )
    bands_arr = ",".join(
        "struct({b} AS band, xxhash64({cols}) AS key)".format(
            b=b, cols=",".join(f"_m{b * r + j}" for j in range(r))
        )
        for b in range(n_bands)
    )
    return sig.select(
        "id",
        *[f"_m{i}" for i in range(n_hashes)],
        F.expr(f"explode(array({bands_arr}))").alias("bk"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 32,
    n_bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Candidate pairs via banded minhash; estimated Jaccard = fraction of
    agreeing minhashes, filtered at `threshold`.

    Band key is ``xxhash64`` of the r-length signature slice: a single
    fixed-width long, so the self-join exchange carries (id, band, 8-byte
    key) instead of an array<long>. A 64-bit hash collision could admit a
    false candidate pair, but candidates are re-scored from the FULL
    signatures before the threshold filter, so a collision only matters
    if that unrelated pair also estimates ≥ threshold — ~2⁻⁶⁴ per
    pair-band, negligible against minhash's own estimation variance.

    Hot-bucket skew guard: a band key shared by m documents yields m²/2
    candidate pairs inside ONE join task — real corpora have
    boilerplate-heavy buckets with m ~ 10⁵, a within-key cartesian that
    AQE skew splitting cannot divide. Buckets larger than ``max_bucket``
    are diverted out of the self-join and STAR-LINKED instead: every
    member pairs with the bucket's minimum id only (m−1 pairs).

    Star pairs BYPASS the ``threshold`` filter (cold pairs do not): m
    documents agreeing on a full signature band is stronger duplicate
    evidence than the per-pair estimate, and an est-filtered star would
    disconnect the whole bucket whenever the min-id member happens to be
    its one outlier (est(hub, member) < t for every member even though
    the members are mutual duplicates) — for a dedup pipeline, silently
    letting 10⁵ duplicates through. The documented trade-off is the
    mirror case: a hot bucket's outlier is linked INTO the cluster (the
    unguarded clique would have left it out), i.e. the guard can
    over-merge a hot bucket but never under-merge one. ``est_jaccard``
    still carries the true estimate for star rows, so callers that need
    the conservative behavior can re-filter. Pairwise-complete,
    threshold-filtered output is guaranteed for buckets ≤ ``max_bucket``;
    pass ``max_bucket=None`` to disable the guard entirely.
    """
    assert n_hashes % n_bands == 0
    bands = _minhash_bands(docs, n_hashes, n_bands, n, id_col, text_col)
    # Shuffle on the band key before the self-join (same rationale as
    # simhash_pairs): one canonical Exchange → the signature kernel runs
    # once, both aliases reuse it, and the join needs no further shuffle.
    target = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    bands = bands.repartition(target, "bk")
    if max_bucket is not None:
        # Bucket size via a count window over the SAME canonical exchange
        # (bk is the partitioning key, so the window needs no shuffle —
        # just a per-partition sort). A separate groupBy+broadcast subtree
        # would canonicalize differently from the join sides and defeat
        # ReusedExchange, re-running the signature kernel per consumer.
        from pyspark.sql.window import Window

        bands = bands.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("bk"))
        )
        cold = bands.filter(F.col("_bn") <= max_bucket).drop("_bn")
        hot = bands.filter(F.col("_bn") > max_bucket).drop("_bn")
    else:
        cold, hot = bands, None
    a, b = cold.alias("a"), cold.alias("b")
    # Agreement estimate computed IN the join projection (pure codegen);
    # functionally dependent on the pair, so dedupe after the threshold
    # filter carries just three narrow columns.
    n_agree = F.expr(
        "+".join(
            f"(CASE WHEN a._m{i} = b._m{i} THEN 1 ELSE 0 END)"
            for i in range(n_hashes)
        )
    )
    pairs = a.join(
        b,
        (F.col("a.bk.band") == F.col("b.bk.band"))
        & (F.col("a.bk.key") == F.col("b.bk.key"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (n_agree.cast("double") / F.lit(float(n_hashes))).alias("est_jaccard"),
    )
    # threshold applies to COLD pairs only — star pairs bypass it (see
    # docstring); a pair reachable both ways carries identical
    # est_jaccard, so the dedupe's arbitrary pick is value-stable.
    pairs = pairs.filter(F.col("est_jaccard") >= threshold)
    if hot is not None:
        # Star-link each hot bucket to its min-id member: the co-partitioned
        # hub join emits m−1 pairs per bucket (not m²/2), each carrying the
        # true full-signature estimate (unfiltered).
        hub = hot.groupBy("bk").agg(
            F.min(F.struct("id", *[f"_m{i}" for i in range(n_hashes)])).alias("_h")
        )
        hub_agree = F.expr(
            "+".join(
                f"(CASE WHEN _h._m{i} = _m{i} THEN 1 ELSE 0 END)"
                for i in range(n_hashes)
            )
        )
        hot_pairs = (
            hot.join(hub, "bk")
            .filter(F.col("id") != F.col("_h.id"))
            .select(
                F.col("_h.id").alias("id_a"),
                F.col("id").alias("id_b"),
                (hub_agree.cast("double") / F.lit(float(n_hashes))).alias(
                    "est_jaccard"
                ),
            )
        )
        pairs = pairs.unionByName(hot_pairs)
    return pairs.dropDuplicates(["id_a", "id_b"])


def simhash64(text: Column) -> Column:
    """64-bit simhash over word tokens (term frequency weighted).

    Bit b's contribution for a token is ±1 by bit b of md5(token): hex
    digit b//4, bit b%4. Packed little-endian into a signed long (bit 63
    via the sign bit). One md5 + 16 hex-digit parses per token.
    """
    md5s = F.transform(tokens(text), lambda t: F.md5(t))

    def bits_of(m: Column) -> Column:
        elems = []
        for c in range(16):
            d = F.conv(F.substring(m, c + 1, 1), 16, 10).cast("int")
            for k in range(4):
                bit = F.shiftright(d, k).bitwiseAND(F.lit(1))
                elems.append(bit * 2 - 1)
        return F.array(*elems)

    sums = F.aggregate(
        md5s,
        F.array_repeat(F.lit(0), 64),
        lambda acc, m: F.zip_with(acc, bits_of(m), lambda x, y: x + y),
    )
    # Pack the 64 sign bits in ONE pass over `sums`. Referencing
    # element_at(sums, b) in 64 separate terms would make Catalyst inline
    # (and re-evaluate) the whole token fold 64 times per row.
    bitvals = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(64)
        ]
    )
    return F.aggregate(
        F.zip_with(
            sums,
            bitvals,
            lambda s, bv: F.when(s > 0, bv).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash64_udf():
    """Arrow-batched simhash64 kernel, bit-identical to ``simhash64``.

    Same tokenization (regex whitespace split, lowercased — Java and
    Python regex split agree on leading/trailing empties), same md5 (the
    algorithm is the algorithm), same bit extraction (hex digit b//4, bit
    b%4 of the first 16 hex chars), same ±1 packing. hashlib does ~1M
    md5/s per core vs the interpreted per-token zip-fold of the Column
    form; the Column form remains the spec (differential-tested)."""
    import re

    # re.ASCII: Java/RE2 \s (the Column spec and the DuckDB oracle) is
    # ASCII-only [ \t\n\x0b\f\r]; Python's default \s also matches U+00A0,
    # U+2028 etc., which would silently break bit-identity on non-ASCII
    # whitespace.
    ws = re.compile(r"\s+", re.ASCII)

    def one(text: str) -> int:
        sums = [0] * 64
        for tok in ws.split(text.lower()):
            hd = _md5(tok.encode("utf-8")).hexdigest()
            for c in range(16):
                d = int(hd[c], 16)
                for k in range(4):
                    sums[4 * c + k] += ((d >> k) & 1) * 2 - 1
        out = 0
        for b in range(64):
            if sums[b] > 0:
                out += (1 << b) if b < 63 else -(1 << 63)
        return out

    @F.pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    return sh


def simhash_pairs(
    docs: DataFrame,
    max_distance: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """Pairs with simhash Hamming distance ≤ max_distance.

    EXACT for max_distance ≤ 3 with the default ``max_bucket=None``: with
    4 disjoint 16-bit bands, pigeonhole guarantees at least one band
    matches, so the band join misses nothing.

    Setting ``max_bucket`` (the 100 TB skew posture — see
    ``minhash_lsh_pairs`` for the m²-in-one-task rationale) trades that
    contract for a bounded plan: buckets above the cap are star-linked to
    their min-id member (m−1 pairs, still Hamming-filtered, so every
    emitted pair honors ``hamming ≤ max_distance``). The output is then a
    SUBSET of the exact result, and the precise drop case is: a
    member-member pair of a hot bucket is lost iff BOTH its endpoints are
    beyond ``max_distance`` from the bucket's min-id member in every hot
    bucket the pair shares and the pair collides in no cold band — i.e. a
    hub-outlier hot bucket can under-link its members (unlike
    ``minhash_lsh_pairs``, whose unfiltered star can only over-link).
    Pileup buckets whose members sit within ``max_distance`` of the hub
    keep their components for downstream ``keep_canonical``.
    """
    from kinesiscat_spark.io_tables import spread

    # Signature via the Arrow-batched kernel (same bits as simhash64 —
    # see simhash64_udf); its output is an attribute, so the 4 band keys +
    # output below are free column reads. spread() parallelizes the
    # per-doc hashing on under-partitioned input.
    sig = spread(docs, id_col).select(
        F.col(id_col).alias("id"), simhash64_udf()(F.col(text_col)).alias("sh")
    )
    bands = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    )
    # Shuffle on the band key BEFORE self-joining: both aliases then share
    # one canonical Exchange, so ReusedExchange computes the signature
    # kernel ONCE instead of once per join side — and the join consumes the
    # co-partitioned sides with no further shuffle. (Without this, each
    # side re-runs scan→kernel→explode; with an expensive Python kernel
    # that doubles the dominant cost. Measured 1.6s → 1.1s at sf0.1.)
    target = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    bands = bands.repartition(target, "bk")
    if max_bucket is not None:
        # Window count over the shared exchange — see minhash_lsh_pairs.
        from pyspark.sql.window import Window

        bands = bands.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("bk"))
        )
        cold = bands.filter(F.col("_bn") <= max_bucket).drop("_bn")
        hot = bands.filter(F.col("_bn") > max_bucket).drop("_bn")
    else:
        cold, hot = bands, None
    a, b = cold.alias("a"), cold.alias("b")
    cand = a.join(
        b,
        (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.sh").alias("sh_a"),
        F.col("b.sh").alias("sh_b"),
    )
    if hot is not None:
        hub = hot.groupBy("bk").agg(F.min(F.struct("id", "sh")).alias("_h"))
        hot_cand = (
            hot.join(hub, "bk")
            .filter(F.col("id") != F.col("_h.id"))
            .select(
                F.col("_h.id").alias("id_a"),
                F.col("id").alias("id_b"),
                F.col("_h.sh").alias("sh_a"),
                F.col("sh").alias("sh_b"),
            )
        )
        cand = cand.unionByName(hot_cand)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        cand.withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 512,
    fp_exact: bool = True,
) -> DataFrame:
    """All pairs with cosine similarity ≥ threshold (exact, all-pairs).

    O(n²) verify-stage operator; for candidate-driven verification at
    scale use ``embedding_cosine_verify`` on LSH candidate pairs
    (operators.similarity.random_hyperplane_lsh buckets), where the pair
    count scales with duplicate density.

    Physical shape: fully DISTRIBUTED block nested-loop with NO broadcast
    of vector data. Vectors are packed into chunk rows of ``chunk_rows``
    each (one shuffle on the chunk id); each side then explodes its
    partner chunk-id range (bounded by a broadcast 1-row min/max
    aggregate — two longs, not the table) and the upper-triangle grid is
    a plain co-partitioned equi-join on (ck_a, ck_b). Nothing is ever
    collected to the driver, no broadcast grows with the corpus, and no
    task holds more than two chunks (2 × chunk_rows × d doubles) — the
    inherent O(n²/chunk_rows) chunk-copy shuffle is spillable and
    AQE-splittable, which is the scale contract a broadcast cannot make.

    FP fidelity at BLAS speed: each block computes ``A @ B.T`` (BLAS) to
    PRUNE, keeping pairs within 1e-9 of the threshold, then recomputes
    dots and norms for the surviving pairs only, dimension-by-dimension —
    exactly the fold order of the Column form and the SQL oracle — and
    applies the threshold to those exact values. Output `sim` is
    bit-identical to the pure sequential kernel (BLAS error ~1e-15
    relative, far inside the 1e-9 pruning margin) while the O(n²) part
    runs at matrix-multiply speed. ``fp_exact=False`` skips the exact
    re-verify and emits raw BLAS sims (last-ulp differences possible).
    """
    import numpy as np

    packed = (
        emb.select(
            # Chunk by id range (ids are dense in the corpus); for sparse id
            # spaces switch to pmod(xxhash64(id), n_chunks) with n_chunks
            # derived from a count — balance matters more than locality here.
            F.floor(F.col(id_col) / F.lit(chunk_rows)).cast("long").alias("ck"),
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .groupBy("ck")
        .agg(F.array_sort(F.collect_list(F.struct("id", "v"))).alias("rows"))
    )
    bounds = packed.agg(
        F.min("ck").alias("_mn"), F.max("ck").alias("_mx")
    )  # 1 row, 2 longs — the only broadcast
    left = packed.join(F.broadcast(bounds)).select(
        F.col("ck").alias("ck_a"),
        F.explode(F.sequence(F.col("ck"), F.col("_mx"))).alias("ck_b"),
        F.col("rows").alias("rows_a"),
    )
    right = packed.join(F.broadcast(bounds)).select(
        F.explode(F.sequence(F.col("_mn"), F.col("ck"))).alias("ck_a"),
        F.col("ck").alias("ck_b"),
        F.col("rows").alias("rows_b"),
    )
    grid = left.join(right, ["ck_a", "ck_b"])

    def _unpack(rows) -> tuple:
        ids = np.fromiter((r["id"] for r in rows), dtype=np.int64, count=len(rows))
        M = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
        return ids, M

    def kernel(batches):
        for pdf in batches:
            for rows_a, rows_b in zip(pdf["rows_a"], pdf["rows_b"]):
                a_ids, A = _unpack(rows_a)
                b_ids, B = _unpack(rows_b)
                # BLAS prune: fast approximate sims, margin-widened mask
                dots = A @ B.T
                norms = (
                    np.sqrt((A * A).sum(axis=1))[:, None]
                    * np.sqrt((B * B).sum(axis=1))
                )
                sims = dots / norms
                margin = 1e-9 if fp_exact else 0.0
                mask = (sims >= threshold - margin) & (a_ids[:, None] < b_ids)
                ia, ib = np.nonzero(mask)
                out = sims[ia, ib]
                if fp_exact and len(ia):
                    # exact re-verify on survivors only: sequential fold
                    # order (vectorized across pairs), bit-identical to
                    # the Column spec / SQL oracle
                    Ai, Bi = A[ia], B[ib]
                    d = np.zeros(len(ia))
                    na = np.zeros(len(ia))
                    nb = np.zeros(len(ia))
                    for i in range(A.shape[1]):
                        d += Ai[:, i] * Bi[:, i]
                        na += Ai[:, i] * Ai[:, i]
                        nb += Bi[:, i] * Bi[:, i]
                    out = d / (np.sqrt(na) * np.sqrt(nb))
                    keep = out >= threshold
                    ia, ib, out = ia[keep], ib[keep], out[keep]
                yield pd.DataFrame(
                    {"id_a": a_ids[ia], "id_b": b_ids[ib], "sim": out}
                )

    return grid.mapInPandas(kernel, "id_a long, id_b long, sim double")


def embedding_cosine_verify(
    pairs: DataFrame,
    emb: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine for an explicit candidate-pair set — the 100 TB verify
    stage: pair count scales with duplicate density (LSH candidates), not
    n². Two hash joins on the vector id bring both embeddings to the pair,
    then the JVM fold (same dimension-sequential order as the oracle)
    computes `sim`. No Python, no driver materialization.
    """
    from kinesiscat_spark.operators.similarity import dot, l2_norm

    sides = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    a = sides.select(
        F.col("_id").alias(id_a), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = sides.select(
        F.col("_id").alias(id_b), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    return (
        pairs.join(a, id_a)
        .join(b, id_b)
        .select(
            id_a,
            id_b,
            (dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "sim"
            ),
        )
    )


def dedup_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_threshold: float | None = None,
    n_hashes: int = 32,
    n_bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Incremental dedup: drop NEW documents already present in (or, with
    ``near_threshold``, near-duplicating) an EXISTING corpus snapshot —
    the continuous-pretraining step that keeps refreshed crawls from
    re-admitting what earlier snapshots already contributed.

    Exact stage (always): left anti join of sha-256 content digests —
    the corpus side reduces to DISTINCT digests first, so the exchange
    carries one 32-byte row per distinct corpus text regardless of the
    corpus's own duplication.

    Near stage (``near_threshold`` set): the batch pipeline's minhash
    machinery, asymmetric — new-side band rows join corpus-side band
    rows on the 8-byte band key, agreement is re-scored from the FULL
    signatures in the join projection (codegen scalar comparisons, the
    minhash_lsh_pairs shape), and a new doc is dropped iff any corpus
    doc estimates >= threshold.  Skew note: corpus band rows collapse to
    one row per (band key, full signature) before the join —
    boilerplate-heavy corpus buckets are typically signature-identical,
    so the classic hot bucket shrinks to one row LOSSLESSLY (duplicate
    signatures add no evidence: the estimate depends only on the
    signature values).

    Only (digest) and (band-key, signature) rows ever shuffle; neither
    side's text column leaves the scan stage.
    """
    digests = corpus.select(F.sha2(F.col(text_col), 256).alias("_h")).distinct()
    out = (
        new_docs.withColumn("_h", F.sha2(F.col(text_col), 256))
        .join(digests, "_h", "left_anti")
        .drop("_h")
    )
    if near_threshold is None:
        return out
    assert n_hashes % n_bands == 0
    nb = _minhash_bands(out, n_hashes, n_bands, n, id_col, text_col)
    cb = _minhash_bands(corpus, n_hashes, n_bands, n, id_col, text_col).drop(
        "id"
    ).dropDuplicates(["bk"] + [f"_m{i}" for i in range(n_hashes)])
    n_agree = sum(
        F.when(F.col(f"x._m{i}") == F.col(f"y._m{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    hits = (
        nb.alias("x")
        .join(cb.alias("y"), F.col("x.bk") == F.col("y.bk"))
        .filter(
            (n_agree.cast("double") / F.lit(float(n_hashes)))
            >= F.lit(near_threshold)
        )
        .select(F.col("x.id").alias(id_col))
        .distinct()
    )
    return out.join(hits, id_col, "left_anti")


def corpus_minhash_similarity(
    docs: DataFrame,
    group_col: str = "source",
    n_hashes: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-LEVEL similarity matrix: estimated shingle-set Jaccard
    between every pair of document groups (sources/snapshots/dumps) from
    per-group MinHash UNION signatures (Broder 1997 — min over a union
    is the min of the mins, so a group's signature over the union of its
    documents' shingle sets is the element-wise min of its documents'
    signatures).

    The dataset-overlap diagnostic behind mixing decisions: "how much of
    source B is already in source A" at corpus granularity, where
    doc-level near-dup pairs are the wrong unit (two dumps can share 80%
    of their shingle mass with few exact doc-level near-dups).

    Returns (group_a, group_b, n_matches, est_jaccard) for group_a <
    group_b, est rounded to 6 dp.

    Scale shape: one corpus pass (distinct shingles per doc -> one md5
    each), then ONE map-side-combined aggregation whose result is
    (n_groups x n_hashes) minima — the only exchange is bounded by the
    number of groups, never corpus size; the pairwise compare runs on
    n_groups rows. Deterministic (md5-derived Carter-Wegman hashes, the
    minhash_lsh hash family) and replayable in ANSI SQL.
    """
    sigs = corpus_minhash_signatures(
        docs, group_col=group_col, n_hashes=n_hashes, n=n,
        id_col=id_col, text_col=text_col,
    )
    # materialize the (n_groups x H) signature table once — both sides of
    # the pairwise self-join would otherwise re-run the full corpus
    # scan + aggregation (the _ordered_shingles lesson); the checkpoint
    # is n_groups rows, never corpus-sized
    sigs = sigs.localCheckpoint(eager=False)
    a = sigs.select(F.col("grp").alias("group_a"), F.col("sig").alias("_sa"))
    b = sigs.select(F.col("grp").alias("group_b"), F.col("sig").alias("_sb"))
    # one parsed string instead of nested HOF Column calls (round 9 —
    # the expr-string discipline); identical expression, identical result
    matches = F.expr(
        "size(filter(zip_with(_sa, _sb, (x, y) -> x = y), m -> m))"
    )
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            matches.cast("long").alias("n_matches"),
            F.round(matches / F.lit(float(n_hashes)), 6).alias("est_jaccard"),
        )
    )


def corpus_minhash_signatures(
    docs: DataFrame,
    group_col: str = "source",
    n_hashes: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(grp, sig) per-group MinHash UNION signatures — the signature half
    of ``corpus_minhash_similarity``, split out because element-wise min
    is a MONOID: the same groupBy-min is a standard STREAMING aggregation
    with bounded state (n_groups x n_hashes minima), so a streaming
    caller drains a LIVE per-group signature in complete mode that equals
    the batch signature over the same rows (pinned in tests/test_dedup.py
    — the cms_slots/hll_slots incremental-sketch pattern)."""
    from kinesiscat_spark.io_tables import spread

    src = docs if docs.isStreaming else spread(docs, id_col)
    sh = src.select(
        F.col(group_col).alias("grp"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("s"),
    )
    hp = sh.select(
        "grp",
        _hexint(F.md5("s"), 1, 12).alias("h1"),
        _hexint(F.md5("s"), 13, 12).alias("h2"),
    )
    # One SQL string builds all n_hashes aggregate expressions in a
    # single py4j round trip (round 9, guide §1.2 step 2): the former
    # per-hash Column listcomp cost ~8 gateway calls per term (~1 s of
    # driver time per invocation at H=64, measured with cProfile —
    # pure construction overhead the bench pays three times per lane).
    # Identical expressions, identical aggregate, identical results.
    sig = "array(" + ",".join(
        f"min((h1 + {i} * h2) % {MOD48}L)" for i in range(n_hashes)
    ) + ")"
    return hp.groupBy("grp").agg(F.expr(sig).alias("sig"))


def duplication_overlap_report(
    pairs: DataFrame,
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source duplication report at DOCUMENT granularity: how many
    verified near-dup pairs land between each (group_a, group_b) source
    combination — the "which datasets actually duplicate each other"
    card that decides what to drop from a mixture (the doc-level
    complement of ``corpus_minhash_similarity``'s signature-level
    estimate; diagonal rows are within-source duplication). Groups are
    canonicalized with least/greatest so each combination appears once.
    Returns (group_a, group_b, n_pairs).

    Scale shape: two narrow (id, group) joins against the pair list —
    the same lookup pattern as split_leakage_report, AQE-broadcast when
    the doc-side projection is small, key-partitioned otherwise — then
    one map-side-combinable count over source-pair keys (bounded by
    |groups|²). Text never moves.
    """
    lookup = docs.select(
        F.col(id_col).alias("_id"), F.col(group_col).alias("_g")
    )
    ga = lookup.select(
        F.col("_id").alias("id_a"), F.col("_g").alias("_g_a")
    )
    gb = lookup.select(
        F.col("_id").alias("id_b"), F.col("_g").alias("_g_b")
    )
    return (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            F.least("_g_a", "_g_b").alias("group_a"),
            F.greatest("_g_a", "_g_b").alias("group_b"),
        )
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("n_pairs"))
    )
