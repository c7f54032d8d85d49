"""Deterministic sampling and corpus mixing for training-data curation.

Every operator here samples by CONTENT HASH, not ``rand()``: Spark's
``rand(seed)`` is seeded per partition, so the selected rows change
whenever partitioning changes (different cluster size, AQE coalescing,
file split). A training pipeline needs the opposite — the same documents
selected on every run, every cluster, every retry — so the sampling
predicate is ``xxhash64(key, salt) / 2^64 < fraction``: a pure scan-stage
filter (pushdown-friendly, no shuffle, no state) that is reproducible
anywhere and oracle-checkable in SQL.

- ``hash_sample``: Bernoulli sample at a fraction, keyed on chosen columns.
- ``stratified_sample``: per-stratum fractions (e.g. downsample by lang).
- ``exact_stratified_sample``: exactly n rows per stratum — hash-ranked
  window, deterministic ties.
- ``mix_corpora``: weighted mixture of sources with per-source salts.
"""

from __future__ import annotations

import math
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_U64_SPAN = float(1 << 64)

# md5-method prefix length: 12 hex chars = 48 bits of threshold
# granularity (bias < 2^-48 on any fraction)
_MD5_PREFIX = 12


def _unit_hash(cols: Sequence[Column | str], salt: int) -> Column:
    """Deterministic value in [0, 1) from the row's key columns + salt."""
    h = F.xxhash64(*cols, F.lit(salt))
    # shift the signed long into [0, 2^64) then scale; double precision
    # gives ~2^-53 granularity, plenty for sampling fractions
    return (h.cast("double") + F.lit(2.0**63)) / F.lit(_U64_SPAN)


def _md5_prefix(cols: Sequence[Column | str], salt: int) -> Column:
    """First 12 hex chars of md5 over the \\x1f-joined key columns + salt.

    The cross-engine twin of ``_unit_hash``: md5 of the same text is
    identical in every engine (DuckDB, Trino, BigQuery...), and the hex
    prefix compares lexicographically == numerically, so a sampling
    decision is reproducible OUTSIDE Spark too — the property the
    sampling oracle lanes verify. Key columns are rendered with their
    engine-default string casts, so stick to string/integer keys.
    """
    to_cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    joined = F.concat_ws("\x1f", *to_cols, F.lit(str(salt)))
    return F.substring(F.md5(joined), 1, _MD5_PREFIX)


def md5_threshold(fraction: float) -> str:
    """Hex threshold such that P(md5_prefix < threshold) == fraction
    (to within 2^-48).

    At fraction >= 1 the exact threshold would be a 13-digit hex string
    ('1' + 12 zeros) — LEXICOGRAPHICALLY that sorts below any 12-char
    prefix starting with '1'-'f', silently keeping ~1/16 of rows instead
    of all of them. Return 'g' instead: every hex digit sorts below 'g'
    (in Spark, DuckDB, and ASCII alike), so `prefix < 'g'` is the
    always-true comparison and fraction 1.0 keeps everything."""
    n = int(fraction * (16**_MD5_PREFIX))
    if n >= 16**_MD5_PREFIX:
        return "g"
    return format(n, f"0{_MD5_PREFIX}x")


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: Sequence[str],
    salt: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli sample: a row is kept iff the unit hash of
    its key columns falls below ``fraction``. Same keys → same decision on
    any cluster, any partitioning, any rerun; different ``salt`` values
    draw independent samples.

    ``method="xxhash64"`` (default) is the cheapest JVM path;
    ``method="md5"`` costs a digest per row but reproduces the exact
    same selection in any engine with md5 (cross-engine pipelines, and
    the DuckDB oracle lane).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if method == "md5":
        return df.filter(
            _md5_prefix(list(key_cols), salt) < F.lit(md5_threshold(fraction))
        )
    if method != "xxhash64":
        raise ValueError(f"unknown hash method {method!r}")
    return df.filter(_unit_hash(list(key_cols), salt) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_cols: Sequence[str],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli fractions (e.g. ``{"en": 0.1, "de": 1.0}``);
    strata absent from ``fractions`` keep ``default_fraction``. One scan,
    no shuffle — the fraction is a CASE over the stratum column."""
    frac = F.lit(float(default_fraction))
    for value, p in fractions.items():
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1], got {p}")
        frac = F.when(F.col(strata_col) == value, float(p)).otherwise(frac)
    return df.filter(_unit_hash(list(key_cols), salt) < frac)


def exact_stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_cols: Sequence[str],
    salt: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller): rank by the unit hash inside each stratum and keep the first
    n. Deterministic (hash order, key tie-break) and single-shuffle on the
    stratum; at scale the rank window's group-limit keeps only n rows per
    partition before the exchange. Skew note: few huge strata concentrate
    on few reducers — the group-limit caps what each MAP task forwards at
    n rows per stratum, so the reducer receives at most n·n_map rows, not
    the stratum.

    ``method="md5"`` ranks by the md5 key prefix instead of xxhash64 —
    the exact same selection in any engine with md5 (the ``sampling_mix``
    lane's ``kind='strat'`` oracle replays it row-for-row)."""
    if method == "md5":
        u: Column = _md5_prefix(list(key_cols), salt)
    elif method == "xxhash64":
        u = _unit_hash(list(key_cols), salt)
    else:
        raise ValueError(f"unknown hash method {method!r}")
    w = Window.partitionBy(strata_col).orderBy(u, *key_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def mix_corpora(
    sources: Sequence[tuple[DataFrame, float]],
    key_cols: Sequence[str],
    salt: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Weighted corpus mixture: source i contributes a deterministic
    ``weight_i`` Bernoulli sample (weights in [0, 1] are per-source keep
    rates, not normalized shares), tagged with its index. Each source gets
    an independent salt so mixing the same table twice draws disjoint-ish
    samples."""
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    parts = []
    for i, (df, w) in enumerate(sources):
        parts.append(
            hash_sample(df, w, key_cols, salt=salt + i, method=method).withColumn(
                "source_id", F.lit(i)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def deterministic_shuffle(
    df: DataFrame, key_cols: Sequence[str], salt: int = 0, method: str = "md5"
) -> DataFrame:
    """Global deterministic shuffle — the training-order randomization step:
    sort by a content hash of the key columns, so the order is
    pseudo-random w.r.t. any data attribute yet IDENTICAL on every
    cluster, partitioning, and rerun (``rand()`` order would change with
    the file layout; a different ``salt`` draws an independent order).

    Scale shape: one range exchange (Spark's distributed sort) — the same
    cost as any global ``orderBy`` — with the hash computed scan-stage.
    ``method="md5"`` reproduces the exact order in any engine (the
    ORDER BY twin of the sampling oracles); ``method="xxhash64"`` is the
    cheaper JVM-only path. Ties (identical keys+salt) break on the key
    columns themselves, keeping the order total and deterministic.
    """
    if method == "md5":
        h: Column = _md5_prefix(list(key_cols), salt)
    elif method == "xxhash64":
        h = F.xxhash64(*key_cols, F.lit(salt))
    else:
        raise ValueError(f"unknown hash method {method!r}")
    return df.orderBy(h, *key_cols)


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n_keep: int,
    salt: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
    method: str = "xxhash64",
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): keep the ``n_keep``
    raw documents ranked highest by log importance weight + Gumbel noise
    — Gumbel-top-k sampling ∝ the importance weight, exactly the paper's
    resampling step. The importance weight uses two add-k unigram models
    (the hashed-n-gram generalization shares this shape):
    ``log w(x) = Σ_tokens [log p_target(t) − log p_raw(t)]``.

    The Gumbel noise is DETERMINISTIC — derived from the content hash of
    the doc id (``−ln(−ln(u))``, u = unit hash), not ``rand()`` — so the
    same corpus selects the same documents on any cluster, any
    partitioning, any rerun, while still drawing a proper
    weight-proportional sample across salts.  ``method="md5"`` derives u
    from the md5 hex prefix instead of xxhash64 — the engine-portable
    variant the ``sampling_mix`` lane's ``kind='dsir'`` rows hash-check
    in DuckDB (u is an exact 48-bit dyadic rational, identical in every
    engine; ln is the already-hash-proven cross-engine pairing).

    Per-document log-probability sums fold over the VALUE-sorted token
    logp lists (the repo's order-defined-double-fold discipline), so
    ``log_w`` is bit-identical on any partitioning AND replayable as
    DuckDB ``list_sum(list(lp ORDER BY lp))``.

    Scale shape: ONE explode pass over the raw corpus (the widest stage)
    with BOTH vocabulary-sized model tables broadcast-joined to the same
    token stream, aggregated once per document; the selection is a
    TakeOrderedAndProject global top-k (per-partition heaps, no full
    sort). Returns (id, n_tokens, log_w, key) for the kept docs.
    """
    from kinesiscat_spark.operators.dedup import tokens
    from kinesiscat_spark.operators.text import unigram_model

    m_t = unigram_model(target, id_col, text_col, k=smoothing)
    m_r = unigram_model(raw, id_col, text_col, k=smoothing)
    toks = raw.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    scored = toks.join(
        F.broadcast(m_t.df.select("w", F.col("logp").alias("_t"))), "w", "left"
    ).join(
        F.broadcast(m_r.df.select("w", F.col("logp").alias("_r"))), "w", "left"
    )
    ordered_sum = lambda c: F.aggregate(  # noqa: E731
        F.array_sort(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    sums = scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        ordered_sum(F.coalesce("_t", F.lit(m_t.oov_logp))).alias("_sum_t"),
        ordered_sum(F.coalesce("_r", F.lit(m_r.oov_logp))).alias("_sum_r"),
    )
    # token-less (empty/null-text) docs produce no token rows; a LEFT join
    # from the full id set keeps them selectable with log_w = 0 (weight 1
    # — an empty product, matching DSIR) instead of silently shrinking the
    # returned sample below n_keep
    ids = raw.select(F.col(id_col).alias("id"))
    log_w = F.coalesce(F.col("_sum_t") - F.col("_sum_r"), F.lit(0.0))
    if method == "md5":
        # 48-bit dyadic rational: exact in double, identical in any engine
        u = F.conv(_md5_prefix([F.col("id")], salt), 16, 10).cast(
            "double"
        ) / F.lit(float(16**_MD5_PREFIX))
    elif method == "xxhash64":
        u = _unit_hash([F.col("id")], salt)
    else:
        raise ValueError(f"unknown hash method {method!r}")
    # clamp u off the endpoints: ln(0) would make the noise infinite
    u = F.greatest(F.least(u, F.lit(1.0 - 1e-15)), F.lit(1e-15))
    gumbel = -F.log(-F.log(u))
    return (
        ids.join(sums, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round(log_w, 9).alias("log_w"),
            F.round(log_w + gumbel, 9).alias("key"),
        )
        .orderBy(F.desc("key"), F.asc("id"))
        .limit(n_keep)
    )


def token_budget_sample(
    docs: DataFrame,
    token_budget: int,
    salt: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Deterministic TOKEN-budget prefix sample: order documents by
    content hash (a deterministic shuffle — same order on any cluster,
    any partitioning, any rerun) and keep the shortest prefix whose
    cumulative whitespace-token count reaches ``token_budget``; the
    crossing document is kept, so the returned total is the first sum
    ≥ the budget (or the whole corpus when it is smaller). Training
    mixtures are specified in TOKENS, not document counts — this is the
    per-source "take N tokens" step a docs-fraction sample can't express
    when document lengths vary.

    Returns (id, n_tokens) of the kept documents.

    Scale shape — the naive form is a GLOBAL running sum (one partition);
    this runs it hierarchically instead: documents bucket by the leading
    hex of their md5 order key (bucket order == hash order, since the
    bucket is a prefix of the key), per-bucket token totals aggregate to
    ``n_buckets`` rows, the bucket prefix sums decide driver-side which
    buckets are taken WHOLE (a scan-stage filter) and which single bucket
    straddles the boundary; only that one bucket — 1/n_buckets of the
    corpus — computes an exact within-bucket running sum. The md5 keys
    make the exact selected set reproducible in any engine (the DuckDB
    differential replays the naive global cumsum and must agree
    row-for-row, crossing document included).
    """
    if token_budget <= 0:
        empty = docs.select(
            F.col(id_col).alias("id"), F.lit(0).cast("long").alias("n_tokens")
        )
        return empty.filter(F.lit(False))

    hkey = _md5_prefix([F.col(id_col)], salt)
    n_tok = F.size(
        F.filter(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("id"),
        hkey.alias("_hk"),
        n_tok.alias("n_tokens"),
    )
    # hex prefix length covering n_buckets: ceil(log16(n_buckets))
    hex_digits = max(1, ((n_buckets - 1).bit_length() + 3) // 4)
    base = base.withColumn("_bucket", F.substring("_hk", 1, hex_digits))

    # phase 1: n_buckets rows to the driver — k-proportional metadata
    totals = sorted(
        (r._bucket, r.t)
        for r in base.groupBy("_bucket").agg(F.sum("n_tokens").alias("t")).collect()
    )
    full: list[str] = []
    running = 0
    boundary: str | None = None
    for bucket, t in totals:
        if running >= token_budget:
            break
        if running + t < token_budget:
            full.append(bucket)
            running += t
        else:
            boundary = bucket
            break
    if boundary is None:
        return base.filter(F.col("_bucket").isin(full)).select("id", "n_tokens")

    remaining = token_budget - running
    w = Window.partitionBy("_bucket").orderBy("_hk", "id")
    in_boundary = (
        base.filter(F.col("_bucket") == boundary)
        .withColumn("_cum", F.sum("n_tokens").over(w))
        # keep while the sum BEFORE this doc is under the remaining
        # budget — the crossing document is the last one kept
        .filter((F.col("_cum") - F.col("n_tokens")) < remaining)
        .select("id", "n_tokens")
    )
    return (
        base.filter(F.col("_bucket").isin(full))
        .select("id", "n_tokens")
        .unionByName(in_boundary)
    )


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float],
    key_cols: Sequence[str],
    salt: int = 0,
    method: str = "md5",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: each row lands in the named
    split whose hash interval its content hash falls in — mutually
    exclusive, exhaustive, and IDENTICAL on every cluster, partitioning,
    and rerun (``randomSplit`` re-draws whenever the partitioning
    changes, which silently leaks eval rows into training on a re-run).
    ``weights`` maps split name → share; shares must sum to 1 (±1e-9) and
    the LAST split absorbs the hash-granularity remainder, so the
    assignment is total. A different ``salt`` draws an independent split.

    Scale shape: one scan-stage CASE over the hash — no shuffle, no
    state; ``method="md5"`` reproduces the exact assignment in any
    engine with md5 (the oracle twin), ``method="xxhash64"`` is the
    cheaper JVM-only path.
    """
    if not weights:
        raise ValueError("hash_split needs at least one split")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    names = list(weights)
    if method == "md5":
        h: Column = _md5_prefix(list(key_cols), salt)
        thresholds = []
        cum = 0.0
        for name in names[:-1]:
            cum += weights[name]
            thresholds.append(F.lit(md5_threshold(cum)))
    elif method == "xxhash64":
        h = _unit_hash(list(key_cols), salt)
        thresholds = []
        cum = 0.0
        for name in names[:-1]:
            cum += weights[name]
            thresholds.append(F.lit(cum))
    else:
        raise ValueError(f"unknown hash method {method!r}")
    expr: Column | None = None
    for name, t in zip(names[:-1], thresholds):
        cond = h < t
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assigned = names[-1] if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, F.lit(assigned) if expr is None else assigned)


def mix_corpora_tokens(
    sources: Sequence[tuple[DataFrame, int]],
    salt: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Token-budget corpus mixture: source i contributes its
    ``token_budget_sample`` prefix of ``budget_i`` tokens, tagged with its
    index — the "LLaMA-style data mixture" step where each source's share
    is a TOKEN count. Each source gets an independent salt, so mixing the
    same table twice draws independent prefixes. Returns
    (id, n_tokens, source_id)."""
    if not sources:
        raise ValueError("mix_corpora_tokens needs at least one source")
    parts = []
    for i, (df, budget) in enumerate(sources):
        parts.append(
            token_budget_sample(
                df, budget, salt=salt + i, id_col=id_col,
                text_col=text_col, n_buckets=n_buckets,
            ).withColumn("source_id", F.lit(i))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_corpora_temperature(
    sources: Sequence[DataFrame],
    total_tokens: int,
    alpha: float = 0.5,
    salt: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Temperature-weighted corpus mixture (the multilingual-pretraining
    α-sampling recipe — Conneau & Lample 2019 XLM §3.1; Xue et al. 2021
    mT5 §3.2): source i's token budget is
    ``total_tokens · n_i^α / Σ_j n_j^α`` where ``n_i`` is its corpus
    token count — α < 1 UPWEIGHTS small sources relative to proportional
    sampling (α=1) and α=0 gives the uniform mixture.  Budgets floor to
    ints; each source then contributes its deterministic
    ``token_budget_sample`` prefix (independent salt per source), so the
    whole mixture is a content-hash function of the data.

    Returns (id, n_tokens, source_id).

    Determinism/cross-engine note: per-source token counts are exact
    integer aggregates; ``n^α`` at the default α=0.5 is ``sqrt`` —
    correctly rounded per IEEE-754 in every engine — and the budget
    expression evaluates in one fixed order, so a SQL twin reproduces the
    budgets (and therefore the exact selected set) bit-for-bit.  The
    ``sampling_mix`` lane's ``kind='temp'`` rows hash-check exactly that.

    Scale shape: ONE aggregate per source for the counts (scalar to the
    driver — #sources numbers), then the hierarchical token-budget plan
    per source (bucket totals + a single boundary-bucket cumsum).
    """
    if not sources:
        raise ValueError("mix_corpora_temperature needs at least one source")
    if total_tokens <= 0 or alpha < 0:
        raise ValueError(
            f"need total_tokens > 0 and alpha >= 0 (got {total_tokens}, {alpha})"
        )
    n_tok = lambda df: F.sum(  # noqa: E731
        F.size(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).cast("long")
    )
    counts = [
        (df.agg(n_tok(df).alias("n")).collect()[0].n or 0) for df in sources
    ]
    # Empty sources get weight 0 at ANY alpha: Python's 0.0 ** 0.0 is 1.0,
    # which at alpha=0 would hand empty corpora a full budget share and
    # silently divert tokens from non-empty ones — the XLM/mT5 recipe
    # defines n_i = 0 as weight 0 (ADVICE r6).
    weights = [(float(c) ** alpha) if c > 0 else 0.0 for c in counts]
    denom = sum(weights)
    # All-empty corpus: every budget is 0 and the selection is empty by
    # definition — degrade to zero budgets instead of raising, so lanes
    # survive empty inputs like every other operator in the repo.
    budgets = [
        int(math.floor(total_tokens * w / denom)) if denom > 0 else 0
        for w in weights
    ]
    return mix_corpora_tokens(
        [(df, b) for df, b in zip(sources, budgets)],
        salt=salt,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
    )


def split_leakage_report(
    docs: DataFrame,
    split_col: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_hashes: int = 32,
    n_bands: int = 8,
    n: int = 3,
    max_bucket: int | None = 1000,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs that STRADDLE split boundaries — the
    train/eval contamination a row-level split cannot prevent when the
    corpus holds near-duplicates (an eval document whose near-twin sits
    in train is effectively memorized, not held out; Lee et al. 2022 §6.2
    measure exactly this leak class).

    ``docs`` must already carry ``split_col`` (``hash_split`` upstream).
    Returns ``(id_a, id_b, est_jaccard, split_a, split_b)`` — every
    banded-minhash candidate pair at ``threshold`` whose two sides landed
    in different splits.  Run it AFTER near-dup dedup to certify the
    split (the report should be empty), or BEFORE to decide which twin to
    drop/requarantine.  Pass a precomputed ``pairs`` DataFrame
    (``minhash_lsh_pairs`` output — (id_a, id_b, est_jaccard)) to share
    one candidate computation with other consumers: a subtree-identical
    plan lets Spark reuse the band exchange instead of running the
    signature kernel twice (the driver lane does this).

    Scale shape: the pair generation is ``minhash_lsh_pairs`` (banded
    8-byte keys, hot-bucket star guard — see its docstring); the split
    lookups are two joins of the narrow (id, split) projection onto the
    candidate pairs, which AQE broadcasts when the pair set is small (the
    expected case — pairs ≪ corpus).
    """
    from kinesiscat_spark.operators.dedup import minhash_lsh_pairs

    if pairs is None:
        pairs = minhash_lsh_pairs(
            docs,
            threshold=threshold,
            n_hashes=n_hashes,
            n_bands=n_bands,
            n=n,
            id_col=id_col,
            text_col=text_col,
            max_bucket=max_bucket,
        )
    sa = docs.select(
        F.col(id_col).alias("_la"), F.col(split_col).alias("split_a")
    )
    sb = docs.select(
        F.col(id_col).alias("_lb"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(sa, pairs["id_a"] == sa["_la"])
        .join(sb, pairs["id_b"] == sb["_lb"])
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "est_jaccard", "split_a", "split_b")
    )


def prototype_prune(
    emb: DataFrame,
    prototypes: Sequence[Sequence[float]],
    keep_per_cell: int,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Prototype-based data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws"): assign every vector to its nearest prototype (squared
    L2), rank each cell's members HARDEST-first (largest distance to the
    prototype = least prototypical), and keep the top ``keep_per_cell``
    per cell — the keep-hard selection that beats random pruning in the
    data-abundant regime while equalizing cluster budgets.

    Prototypes are a FIXED list (k-means centroids trained elsewhere —
    ``ivf_centroids`` — or externally supplied class anchors); passing
    them as literals keeps the operator scan-stage: the only exchange is
    the per-cell rank window, partitioned on ``cell`` (k-bounded skew:
    each cell's members sort independently).

    Deterministic: distances fold left-to-right in dimension order
    (IEEE-identical to the ANSI-SQL ``list_sum(list_transform(
    list_zip(...)))`` replay), rounded to 9 decimals, ties broken by id;
    NULL / ragged vectors get NULL cell and are dropped (they have no
    distance to any prototype).

    Returns (id, cell, dist2) for the kept rows, dist2 rounded to 9 dp.
    """
    if keep_per_cell < 1:
        raise ValueError(f"keep_per_cell must be >= 1 (got {keep_per_cell})")
    dim = len(prototypes[0])
    if any(len(p) != dim for p in prototypes):
        raise ValueError("ragged prototype list")
    v = F.col(vec)
    ok = v.isNotNull() & (F.size(v) == dim)
    dists = F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(x)) for x in p]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
                9,
            )
            for p in prototypes
        ]
    )
    assigned = (
        emb.filter(ok)
        .select(
            F.col(id_col).alias("id"),
            dists.alias("_d"),
        )
        .select(
            "id",
            (F.array_position(F.col("_d"), F.array_min("_d")) - 1)
            .cast("int")
            .alias("cell"),
            F.array_min("_d").alias("dist2"),
        )
    )
    w = Window.partitionBy("cell").orderBy(F.desc("dist2"), F.asc("id"))
    return (
        assigned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= keep_per_cell)
        .select("id", "cell", "dist2")
    )


def mix_corpora_unimax(
    sources: Sequence[DataFrame],
    total_tokens: int,
    max_epochs: float = 4.0,
    salt: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """UniMax corpus mixture (Chung et al. 2023, "UniMax: Fairer and More
    Effective Language Sampling"): water-filling budget allocation with a
    per-source EPOCH cap — smallest source first, each source gets
    ``min(max_epochs · n_i, remaining_budget / remaining_sources)``
    tokens, so small sources are repeated at most ``max_epochs`` times
    (never oversampled into memorization) and the leftover budget pools
    to the large ones, instead of the temperature recipe's fixed
    power-law shares.

    Budgets floor to ints; each source then contributes its
    deterministic ``token_budget_sample`` prefix (independent salt per
    source). Returns (id, n_tokens, source_id).

    Determinism/cross-engine note: counts are exact integer aggregates;
    the water-fill visits sources in (count, index) order and evaluates
    ``min(max_epochs·n, rem/k)`` with one double multiply/divide per
    step, so an unrolled SQL twin reproduces budgets — and therefore the
    exact selected set — bit-for-bit.

    Scale shape: ONE aggregate per source for the counts (#sources
    scalars to the driver), then the hierarchical token-budget plan per
    source; the water-fill itself is O(#sources log #sources) driver
    arithmetic.
    """
    if not sources:
        raise ValueError("mix_corpora_unimax needs at least one source")
    if total_tokens <= 0 or max_epochs <= 0:
        raise ValueError(
            f"need total_tokens > 0 and max_epochs > 0 "
            f"(got {total_tokens}, {max_epochs})"
        )
    n_tok = lambda df: F.sum(  # noqa: E731
        F.size(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).cast("long")
    )
    counts = [
        (df.agg(n_tok(df).alias("n")).collect()[0].n or 0) for df in sources
    ]
    k = len(sources)
    order = sorted(range(k), key=lambda i: (counts[i], i))
    budgets = [0] * k
    rem = float(total_tokens)
    for pos, i in enumerate(order):
        fair = rem / (k - pos)
        b = min(float(max_epochs) * counts[i], fair)
        budgets[i] = int(math.floor(b))
        rem -= b
    return mix_corpora_tokens(
        [(df, b) for df, b in zip(sources, budgets)],
        salt=salt,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
    )


def weighted_reservoir_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    salt: int = 0,
    id_col: str = "doc_id",
    method: str = "xxhash64",
) -> DataFrame:
    """A-ES weighted reservoir sampling (Efraimidis & Spirakis 2006):
    keep the ``k`` rows with the largest key u_i^(1/w_i) — ranked here
    by the monotone-equivalent ln(u_i)/w_i — a weight-proportional
    WITHOUT-replacement sample (P(row i drawn first) = w_i/Σw). The
    "take a 10B-token sample weighted by document quality/length" step
    of a mixture pipeline, in one pass, no global sort.

    The noise u is DETERMINISTIC — a unit hash of the row id + salt,
    never ``rand()`` — so the same corpus selects the same reservoir on
    any cluster, any partitioning, any rerun; ``method='md5'`` derives u
    from the md5 hex prefix (an exact 48-bit dyadic rational — the
    engine-portable variant the ``sampling_mix`` lane's
    ``kind='reservoir'`` rows hash-check in DuckDB, the DSIR recipe).
    Rows with NULL or non-positive weight are excluded (the algorithm
    requires w > 0). Keys round to 9 dp with an id tie-break, so the
    selected set is stable and replayable. Returns (id, weight, key).

    Scale shape: the key is scan-stage Column algebra over the row
    itself; selection is a TakeOrderedAndProject global top-k
    (per-partition heaps — no shuffle of the corpus, no full sort).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    return (
        docs.filter(F.col(weight_col).cast("double") > 0.0)
        .select(
            F.col(id_col).alias("id"),
            F.col(weight_col).alias("weight"),
            reservoir_key(id_col, weight_col, salt, method).alias("key"),
        )
        .orderBy(F.desc("key"), F.asc("id"))
        .limit(k)
    )


def reservoir_key(
    id_col: str,
    weight_col: str,
    salt: int = 0,
    method: str = "xxhash64",
) -> Column:
    """The A-ES exponential key ln(u)/w, rounded to 9 dp — the shared
    scan-stage column of the batch ``weighted_reservoir_sample`` and the
    streaming reservoir (streaming/stateful.py), so both select the
    identical rows for the same (corpus, salt)."""
    if method == "md5":
        u = F.conv(_md5_prefix([F.col(id_col)], salt), 16, 10).cast(
            "double"
        ) / F.lit(float(16**_MD5_PREFIX))
    elif method == "xxhash64":
        u = _unit_hash([F.col(id_col)], salt)
    else:
        raise ValueError(f"unknown hash method {method!r}")
    u = F.greatest(F.least(u, F.lit(1.0 - 1e-15)), F.lit(1e-15))
    return F.round(F.log(u) / F.col(weight_col).cast("double"), 9)


def doremi_domain_weights(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta: float = 1.0,
    k: float = 0.5,
) -> DataFrame:
    """One exponentiated-gradient step of DoReMi domain reweighting (Xie
    et al. 2023, Algorithm 1, collapsed to a single proxy-loss step):
    domains whose text the corpus-level model finds HARD (above-average
    per-token loss) get upweighted relative to their token share,

        w(d) ∝ share(d) · exp(η · (loss(d) − loss(corpus))),

    normalized over domains. The proxy loss is the add-``k`` unigram LM
    trained on the whole corpus (the DSIR machinery's model family), so
    the whole step is deterministic and ANSI-SQL-replayable: every
    floating-point reduction is a VALUE-ORDERED fold (sort_array +
    aggregate ↔ DuckDB ``list_sum(list(x ORDER BY x))`` — the
    hash-proven pairing), folded per document, then per domain, then
    globally, and the exp/ln calls are the same libm doubles on both
    engines (the Zipf-fit precedent).

    Returns (group, n_tokens, loss, excess, weight), weights rounded to
    9 dp and summing to ~1.

    Scale shape: one token explode feeding a vocab-bounded count
    (map-side combine); the model join is vocab-sized (AQE broadcasts
    when small); per-doc folds see one doc's tokens, per-domain folds see
    one domain's DOC SUMS (documents-per-domain-bounded, never tokens),
    and the domain table itself is tiny. Text never shuffles.
    """
    from kinesiscat_spark.operators.dedup import tokens

    if eta <= 0.0:
        raise ValueError(f"eta must be > 0 (got {eta})")
    if k <= 0.0:
        raise ValueError(f"k must be > 0 (got {k})")
    tok = docs.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    counts = tok.groupBy("w").agg(F.count("*").alias("c"))
    [tot] = counts.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    ).collect()
    if tot.n is None:  # empty corpus: no domains, empty report
        return docs.sparkSession.createDataFrame(
            [],
            "group string, n_tokens long, loss double, excess double, "
            "weight double",
        )
    n, v = float(tot.n), float(tot.v)
    model = counts.select(
        "w", F.log((F.col("c") + F.lit(k)) / F.lit(n + k * v)).alias("lp")
    )
    _vsum = lambda c: F.aggregate(  # noqa: E731 — the repo's value-ordered fold
        F.sort_array(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    per_doc = (
        tok.join(model, "w")
        .groupBy("group", "id")
        .agg(_vsum("lp").alias("s"), F.count("*").alias("nt"))
    )
    dom = per_doc.groupBy("group").agg(
        _vsum("s").alias("slp"), F.sum("nt").alias("nt")
    )
    g = dom.agg(_vsum("slp").alias("gs"), F.sum("nt").alias("gn"))
    loss = -(F.col("slp") / F.col("nt"))
    gloss = -(F.col("gs") / F.col("gn"))
    excess = loss - gloss
    pre = dom.crossJoin(F.broadcast(g)).select(
        "group",
        "nt",
        loss.alias("loss"),
        excess.alias("excess"),
        (
            (F.col("nt").cast("double") / F.col("gn"))
            * F.exp(F.lit(float(eta)) * excess)
        ).alias("raw"),
    )
    z = pre.agg(_vsum("raw").alias("z"))
    return pre.crossJoin(F.broadcast(z)).select(
        "group",
        F.col("nt").cast("long").alias("n_tokens"),
        F.round("loss", 9).alias("loss"),
        F.round("excess", 9).alias("excess"),
        F.round(F.col("raw") / F.col("z"), 9).alias("weight"),
    )
