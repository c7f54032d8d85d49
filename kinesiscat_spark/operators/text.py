"""Text-analysis operators (extension surface X5): language-ID and
document fingerprinting.

Both are pure built-in column expressions (JVM codegen, no UDF) with exact
ANSI-SQL twins:

- ``language_id``: character-n-gram profile scoring. Score for language L =
  total occurrences of L's characteristic n-grams in the lowercased text,
  counted via the replace-length trick
  ``(len(t) - len(replace(t, g, ''))) / len(g)`` — no arrays, no shuffle,
  fully scan-stage. Argmax with deterministic tie-break via integer
  encoding ``score * 8 + lang_idx`` (highest index wins ties).
- ``winnow_fingerprints``: Rabin-Karp-style rolling k-gram hashes +
  winnowing (min hash per sliding window of w) — the standard
  near-copy / provenance fingerprint (Schleimer et al., SIGMOD'03).
  Hash = first 48 bits of md5(k-gram) so the DuckDB oracle reproduces it
  bit-for-bit; at 100 TB swap in ``F.xxhash64`` for raw speed.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.let import let_

# Characteristic character n-grams per language (word-boundary padded where
# it helps). Index order is the tie-break order: later wins ties.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("sch", "der ", "ein", " und ", "ich", "cht"),
    "en": (" the ", " and ", "ing ", " of ", "th", " is "),
    "es": (" el ", " los ", "ción", " una ", " es ", " para "),
    "fr": (" le ", " les ", " des ", " est ", " que ", "eau"),
    "zh": ("的", "是", "了", "在", "我", "不"),
}
LANGS = sorted(LANG_PROFILES)  # idx = position here


def ngram_count(text: Column, gram: str) -> Column:
    """Occurrences of ``gram`` in ``text`` via the replace-length trick."""
    removed = F.length(text) - F.length(F.replace(text, F.lit(gram), F.lit("")))
    return (removed / F.lit(len(gram))).cast("long")


def lang_score(text: Column, lang: str) -> Column:
    """Total profile-n-gram occurrences for one language."""
    s = F.lit(0).cast("long")
    for g in LANG_PROFILES[lang]:
        s = s + ngram_count(text, g)
    return s


def language_id(text: Column) -> tuple[Column, Column]:
    """(predicted_lang, top_score) by argmax over profile scores.

    Pads with spaces so boundary-anchored grams match at string edges.
    """
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    encoded = [
        lang_score(padded, lang) * 8 + idx for idx, lang in enumerate(LANGS)
    ]
    m = F.greatest(*encoded)
    idx = m % 8
    score = ((m - idx) / 8).cast("long")
    pred = F.element_at(F.array(*[F.lit(lang) for lang in LANGS]), (idx + 1).cast("int"))
    return pred, score


_LANGID_TEXT_MEMO: "tuple[Column, Column] | None" = None


def language_id_text() -> tuple[Column, Column]:
    """``language_id(F.col("text"))``, built ONCE per process (round 9):
    the profile trees are ~150 Column calls (~0.5 s of py4j round trips
    per build, measured) over nothing but the literal profiles and the
    ``text`` column — a pure expression, safely reusable verbatim."""
    global _LANGID_TEXT_MEMO
    if _LANGID_TEXT_MEMO is None:
        _LANGID_TEXT_MEMO = language_id(F.col("text"))
    return _LANGID_TEXT_MEMO


class UnigramModel(NamedTuple):
    """A trained unigram model: the (word, logp) table plus the smoothing
    log-probability for out-of-vocabulary words. An explicit pair — not
    DataFrame metadata — so it survives cache()/checkpoint()/write+reload
    of the table (reconstruct with ``UnigramModel(reloaded_df, oov_logp)``).
    """

    df: "DataFrame"
    oov_logp: float
    # total corpus token count, measured by the same aggregate that
    # computes the smoothing mass — zero extra jobs. None for models
    # reconstructed from a bare table. Used as a FREE upper bound on
    # downstream type counts (bigram types <= tokens).
    n_tokens: "float | None" = None
    # vocabulary size, from the SAME training aggregate (round 10) — the
    # bigram/KN trainers previously re-counted the vocab table, one
    # extra job per model build. None for reconstructed models (callers
    # fall back to counting df).
    v: "float | None" = None


def unigram_model(
    docs, id_col: str = "doc_id", text_col: str = "text", k: float = 0.5
) -> UnigramModel:
    """Add-k-smoothed unigram model of a corpus: ``UnigramModel`` of the
    (word, logp) table and the OOV log-probability.

    One explode + one groupBy (map-side partial) — the model table is tiny
    relative to the corpus (vocabulary-sized) and broadcastable. ``logp``
    is ln((count + k) / (N + k·V)); the leftover smoothing mass covers
    out-of-vocabulary words at scoring time.
    """
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.dedup import tokens

    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
    counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    if totals.n is None:  # empty corpus: no vocabulary, neutral OOV mass
        return UnigramModel(
            counts.select("w", F.lit(0.0).alias("logp")), 0.0, None, 0.0
        )
    n, v = float(totals.n), float(totals.v)
    model = counts.select(
        "w", F.log((F.col("c") + F.lit(k)) / F.lit(n + k * v)).alias("logp")
    )
    return UnigramModel(model, float(math.log(k / (n + k * v))), n, v)


def score_documents(
    docs,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_logp: float | None = None,
):
    """(id, n_tokens, avg_logp): mean unigram log-probability of each
    document under ``model`` — the classic 'looks like the reference
    corpus' pretraining quality gate (CCNet/DSIR-style importance
    scoring). Train the model on a trusted corpus, score candidates, keep
    the high-avg_logp tail.

    Scale shape: explode tokens, join the (broadcast) model on the word,
    one groupBy on the doc id. Unseen words get the smoothing mass.

    ``model`` is a ``UnigramModel`` (or a bare (word, logp) DataFrame with
    ``oov_logp`` passed explicitly).
    """
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.dedup import tokens

    if isinstance(model, UnigramModel):
        if oov_logp is None:
            oov_logp = model.oov_logp
        model = model.df
    if oov_logp is None:
        raise ValueError("pass a UnigramModel or an explicit oov_logp")
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    scored = toks.join(F.broadcast(model), "w", "left").select(
        id_col, F.coalesce("logp", F.lit(oov_logp)).alias("lp")
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"), F.avg("lp").alias("avg_logp")
    )


class BigramModel(NamedTuple):
    """A trained interpolated bigram model: the (w1, w2, p_bi) conditional
    table, the per-context denominators baked in; plus the unigram model
    it interpolates with, the vocabulary size, smoothing k and mixture
    weight lam. Probabilities (not logs) are stored so interpolation is a
    single multiply-add before ONE ln at scoring time."""

    df: "DataFrame"  # (w1, w2, p_bi) — add-k conditional probability
    ctx: "DataFrame"  # (w1, c1) — context totals, for unseen-pair backoff
    unigram: UnigramModel
    v: float
    k: float
    lam: float
    # UPPER BOUND on the bigram-type count, recorded at train time at
    # ZERO cost (bigram types <= corpus tokens, and the unigram training
    # aggregate already measures the token count — an exact count would
    # re-execute the whole pair aggregation). None (e.g. a model built by
    # an older persisted artifact) means scoring counts model.df on
    # demand. The CCNet use trains on a bounded reference corpus, but
    # nothing stops a caller training on the full corpus — where bigram
    # types approach token count and a forced broadcast is an OOM
    # (VERDICT r6 #4). The bound is conservative in the safe direction:
    # it can only ever DISABLE a broadcast that was actually fine.
    n_bi: "float | None" = None


def bigram_model(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    lam: float = 0.7,
    eager: bool = False,
) -> BigramModel:
    """Interpolated add-k bigram model (the next rung of the CCNet-style
    LM ladder after ``unigram_model``; production CCNet uses 5-gram
    KenLM — same distributive shape, deeper context):

      p(w2 | w1) = lam * (c(w1,w2) + k) / (c1(w1) + k*V)
                 + (1 - lam) * p_uni(w2)

    with V the UNIGRAM vocabulary size and c1(w1) = sum_w2 c(w1,w2)
    (occurrences of w1 as a left context). An unseen context scores
    lam/V + (1-lam)*p_uni — never zero.

    Scale shape: one explode to (w1, w2) pairs + one groupBy (map-side
    partial) for the bigram counts; the context totals are a groupBy of
    the COUNTS table (bigram-type-sized, not corpus-sized). The model is
    bigram-type-sized — broadcastable when trained on a bounded reference
    corpus (the CCNet use), but NOT in general: trained on the full
    corpus, bigram types approach token count. The type count is measured
    here (``n_bi``) and ``score_documents_bigram`` size-switches its join
    hints on it (VERDICT r6 #4).
    """
    from pyspark.sql import functions as F

    uni = unigram_model(docs, id_col, text_col, k)
    # V rides the unigram training aggregate (round 10 — no re-count job)
    v = uni.v if uni.v is not None else float(uni.df.count())
    counts = _bigram_pair_counts(docs, text_col)
    if eager:
        # for save/multi-consumer callers: pin the corpus-scale pair
        # aggregate so per-consumer pruning cannot re-run the explode
        counts = counts.localCheckpoint(eager=True)
    return _bigram_from_counts(counts, uni, v, k, lam)


def _bigram_pair_counts(docs, text_col: str = "text"):
    """(w1, w2, c) adjacent-pair counts of the corpus — ONE explode + one
    map-side-combined groupBy; the shared training aggregate of the
    add-k bigram and Kneser-Ney models."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.dedup import tokens

    toks = docs.select(tokens(F.col(text_col)).alias("t"))
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.zip_with(
                    F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                    F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    return pairs.groupBy("w1", "w2").agg(F.count("*").alias("c"))


def _bigram_from_counts(counts, uni, v: float, k: float, lam: float):
    """Finish the add-k bigram model from a (w1, w2, c) counts frame."""
    from pyspark.sql import functions as F

    ctx = counts.groupBy("w1").agg(F.sum("c").alias("c1"))
    model = counts.join(ctx, "w1").select(
        "w1",
        "w2",
        ((F.col("c") + F.lit(k)) / (F.col("c1") + F.lit(k * v))).alias("p_bi"),
    )
    return BigramModel(model, ctx, uni, v, k, lam, uni.n_tokens)


def _kn_from_counts(counts, v: float, d: float, k: float):
    """Finish the interpolated-KN model from a (w1, w2, c) counts frame.
    ``n_types`` is one count job over the (type-sized) counts frame —
    callers pass a checkpointed frame so it never re-runs the corpus
    aggregation."""
    from pyspark.sql import functions as F

    dcounts = counts.select(
        "w1", "w2", F.col("c").cast("double").alias("c")
    )
    ctx = dcounts.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").cast("double").alias("n1f")
    )
    back = dcounts.groupBy("w2").agg(
        F.count("*").cast("double").alias("n1b")
    )
    n_types = float(dcounts.count())
    return KNModel(dcounts, ctx, back, n_types, v, d, k)


def bigram_and_kn_models(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    lam: float = 0.7,
    d: float = 0.75,
):
    """Train the add-k bigram AND interpolated-KN models in one pass
    (round 10, guide §2.4): both models derive from the SAME (w1, w2, c)
    pair-count aggregate and the SAME unigram, so the corpus explode +
    pair groupBy runs ONCE — eagerly checkpointed, because each model's
    tables are consumed by several downstream jobs (saves, scoring
    joins) whose per-branch pruning defeats ReusedExchange. Numerically
    identical to calling ``bigram_model`` and ``kneser_ney_model``
    separately: the derivations are the same expressions over the same
    integer counts (KN casts to double — exact for counts)."""
    uni = unigram_model(docs, id_col, text_col, k)
    # the unigram table is corpus-scale to compute but vocab-sized as a
    # result, and it too has several consumers (artifact write + scoring
    # join) — pin it alongside the pair counts
    uni = uni._replace(df=uni.df.localCheckpoint(eager=True))
    v = uni.v if uni.v is not None else float(uni.df.count())
    counts = _bigram_pair_counts(docs, text_col).localCheckpoint(eager=True)
    return (
        _bigram_from_counts(counts, uni, v, k, lam),
        _kn_from_counts(counts, v, d, k),
    )


def score_documents_bigram(
    docs,
    model: BigramModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_rows: int = 10_000_000,
):
    """(id, n_tokens, avg_logp2): mean interpolated-bigram log-probability
    of each document under ``model``. The first token scores at its
    unigram probability; token i > 1 at lam*p_bi(w_i | w_{i-1}) +
    (1-lam)*p_uni(w_i). The per-doc sum folds over the VALUE-sorted logp
    list so the double arithmetic is order-defined and cross-engine
    stable (the unigram lane discipline).

    Scale shape: one positions explode, model-table joins, one per-doc
    aggregate — map-side partialed. The model joins carry a broadcast
    hint only while the bigram-type count stays under ``broadcast_rows``
    (measured at train time, or counted on demand for loaded artifacts):
    the CCNet use trains on a bounded reference corpus, but an LM trained
    on the full corpus has bigram types ≈ token count, and a forced
    broadcast of that frame is an OOM — above the threshold the joins go
    unhinted and shuffle on the word keys (VERDICT r6 #4).
    """
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.dedup import tokens

    lam = model.lam
    uni = model.unigram
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    pos = (
        toks.select(id_col, "t", F.posexplode("t").alias("i", "w2"))
        .withColumn(
            "w1", F.when(F.col("i") > 0, F.element_at(F.col("t"), F.col("i")))
        )
        .drop("t")
    )
    bi = model.df.select(
        F.col("w1").alias("_bw1"), F.col("w2").alias("_bw2"), "p_bi"
    )
    ctx = model.ctx.select(F.col("w1").alias("_cw1"), "c1")
    un = uni.df.select(F.col("w").alias("_uw"), F.exp("logp").alias("p_uni"))
    # unseen-pair backoff keeps the SEEN context's denominator:
    # p = k / (c1(w1) + k*V); a wholly unseen context has c1 = 0
    backoff = F.lit(model.k) / (
        F.coalesce("c1", F.lit(0)) + F.lit(model.k * model.v)
    )
    n_bi = model.n_bi if model.n_bi is not None else float(model.df.count())
    small = n_bi <= broadcast_rows
    if small:
        bi = F.broadcast(bi)
        ctx = F.broadcast(ctx)
        un = F.broadcast(un)
    joined = (
        pos.join(
            bi,
            (pos["w1"] == bi["_bw1"]) & (pos["w2"] == bi["_bw2"]),
            "left",
        )
        .join(ctx, pos["w1"] == ctx["_cw1"], "left")
        .join(un, pos["w2"] == un["_uw"], "left")
        .select(
            id_col,
            "i",
            F.coalesce("p_uni", F.lit(math.exp(uni.oov_logp))).alias("_pu"),
            F.coalesce("p_bi", backoff).alias("_pb"),
        )
    )
    lp = F.when(
        F.col("i") == 0, F.log(F.col("_pu"))
    ).otherwise(F.log(F.lit(lam) * F.col("_pb") + F.lit(1.0 - lam) * F.col("_pu")))
    return (
        joined.select(id_col, lp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.aggregate(
                    F.sort_array(F.collect_list("_lp")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.count("*")
            ).alias("avg_logp2"),
        )
    )


def perplexity_buckets(
    scored,
    score_col: str = "avg_logp",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    method: str = "thresholds",
    exact: bool = False,
):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3): split a
    scored corpus into ``n_buckets`` quality tiers by the LM score —
    head / middle / tail at the default 3. Higher score (= lower
    perplexity) is better, so bucket 1 is the head.

    Adds ``ppl_bucket`` (1-based long) and ``ppl_label``
    (``head``/``middle``/``tail`` when n_buckets == 3, else ``b<i>``).

    Two methods:

    - ``method='thresholds'`` (the production path): bucket against
      score quantile cut-points — ONE aggregate pass over the corpus for
      the thresholds (``approx_percentile`` t-digest by default; mergeable
      map-side, constant exchange), broadcast as a 1-row literal join,
      then a scan-stage CASE. ``exact=True`` swaps in exact
      ``percentile`` (sorts values on one reducer — fine up to ~10⁸ rows,
      not at 100 TB).
    - ``method='rank'`` (the deterministic / oracle twin): global
      ``row_number`` over (score DESC, id) and integer bucket math
      ``1 + (rn-1)·k div n`` — bit-exact in any engine (no float
      thresholds, ties broken by id), at the cost of a total-order sort;
      use it when reproducibility across engines matters more than the
      sort (CI fixtures, cross-engine replays, driver oracles).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1 (got {n_buckets})")
    labels = (
        ["head", "middle", "tail"]
        if n_buckets == 3
        else [f"b{i}" for i in range(1, n_buckets + 1)]
    )
    label_arr = F.array(*[F.lit(s) for s in labels])
    # NULL-score rows are UNBUCKETED (NULL bucket/label) in both methods:
    # the thresholds CASE would otherwise dump them in the worst bucket
    # (NULL >= cut drops from the filter → size 0 → bucket n) and the
    # rank window would order them after the scored rows — neither is a
    # quality statement about an unscored document (ADVICE r6).
    scored_ok = F.col(score_col).isNotNull()

    def _guarded(bucket: Column) -> list[Column]:
        b = F.when(scored_ok, bucket)
        # the label is when-guarded too: Catalyst simplifies
        # element_at(array(lit), idx) to the literal even for NULL idx,
        # so a NULL bucket would otherwise still get a label
        return [
            b.alias("ppl_bucket"),
            F.when(scored_ok, F.element_at(label_arr, b.cast("int"))).alias(
                "ppl_label"
            ),
        ]

    if n_buckets == 1:
        # single tier: constant bucket — the thresholds path would build
        # approx_percentile(score, array()) whose NULL cuts null every
        # bucket (ADVICE r6); rank degenerates to the same constant.
        return scored.select("*", *_guarded(F.lit(1).cast("long")))
    if method == "rank":
        # NULLs sort last so scored rows keep ranks 1..n_scored, and n
        # counts only scored rows — unscored rows must not widen the tail
        w = Window.orderBy(F.desc_nulls_last(score_col), F.asc(id_col))
        rn = F.row_number().over(w).cast("long")
        n = F.count(score_col).over(Window.partitionBy())
        bucket = (F.lit(1) + ((rn - 1) * n_buckets / n).cast("long")).cast(
            "long"
        )
        return scored.select("*", *_guarded(bucket))
    if method != "thresholds":
        raise ValueError(f"unknown method {method!r}")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    fn = "percentile" if exact else "approx_percentile"
    cuts = scored.agg(
        F.expr(
            f"{fn}({score_col}, array({', '.join(str(p) for p in probs)}))"
        ).alias("_cuts")
    )
    # bucket 1 = head (highest scores): count the cut-points the score
    # clears from the top
    bucket = (
        F.lit(n_buckets)
        - F.size(
            F.filter(F.col("_cuts"), lambda c: F.col(score_col) >= c)
        )
    ).cast("long")
    return (
        scored.join(F.broadcast(cuts))
        .select(*scored.columns, *_guarded(bucket))
    )


def kgram_hashes(text: Column, k: int = 5) -> Column:
    """Rolling k-char-gram hashes: 48-bit ints from md5 of each window."""
    n = F.greatest(F.length(text) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(F.substring(F.md5(F.substring(text, i, k)), 1, 12), 16, 10).cast(
            "long"
        ),
    )


def winnow_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Distinct winnowing fingerprints: min k-gram hash per window of w.

    Sliding-window minima are computed as a zip of w shifted slices of the
    LET-BOUND hash array, NOT as ``transform(sequence, j -> min(slice(hs,
    j, w)))`` — a subexpression referenced inside a HOF lambda is
    re-evaluated per element by Catalyst, which would recompute every
    k-gram md5 once per window (O(len²) md5s per document); the let_
    binding (kinesiscat_spark/let.py) computes the k-gram hashes exactly
    once per row (the zip alone would still pay them w+1 times).
    ``least`` skips nulls, handling both zip padding and shorter-than-w
    docs.
    """
    def body(hs: Column) -> Column:
        nw = F.greatest(F.size(hs) - (w - 1), F.lit(1))
        mins = F.slice(hs, 1, nw)
        for j in range(2, w + 1):
            mins = F.zip_with(mins, F.slice(hs, j, nw), lambda a, b: F.least(a, b))
        return F.array_distinct(mins)

    return let_(kgram_hashes(text, k), body)


def winnow_fingerprints_udf(k: int = 5, w: int = 4):
    """Arrow-batched winnowing kernel, bit-identical to
    ``winnow_fingerprints`` (differential-tested).

    The Column form's w shifted slices each re-evaluate the k-gram hash
    array (Catalyst inlines the transform into every slice), so every
    document pays w+1 passes of per-window md5. The kernel hashes each
    k-gram exactly once (hashlib md5, 48 bits = first 6 digest bytes ==
    conv(substring(hex,1,12))), takes sliding-window minima vectorized in
    numpy, and dedupes preserving first occurrence (array_distinct order).
    """
    import numpy as np
    from hashlib import md5

    from pyspark.sql import types as T

    def one(t: str) -> list:
        n = max(len(t) - (k - 1), 1)
        hs = np.fromiter(
            (
                int.from_bytes(md5(t[i : i + k].encode("utf-8")).digest()[:6], "big")
                for i in range(n)
            ),
            dtype=np.int64,
            count=n,
        )
        if n >= w:
            mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
        else:
            mins = hs.min(keepdims=True)
        return list(dict.fromkeys(mins.tolist()))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fp(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    return fp


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...] | list[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25-ranked keyword search (Robertson-Sparck Jones; the Okapi
    formula with the standard +1 idf smoothing Lucene uses): top-``k``
    documents for a bag of query ``terms``.

    Scale shape, 100 TB: ONE scan computes per-document length and the
    per-term frequencies as scan-stage array filters (a handful of query
    terms — tf is a column each, no explode, no inverted-index shuffle);
    the corpus statistics (N, avgdl, per-term document frequencies) are a
    single 1-row aggregate broadcast back via cross join; scoring is pure
    codegen arithmetic; and the global top-k is ``orderBy().limit(k)`` —
    Spark's TakeOrderedAndProject, a per-partition heap + k-row merge,
    never a single-partition sort. Deterministic (ties break on id), so
    the whole ranking is DuckDB-reproducible.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    # coalesce: NULL text is an empty document, not a NULL token array
    # (size(NULL) = -1 would poison dl and avgdl)
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )

    # NB: must be a ONE-arg lambda — a second Python-level default arg would
    # make F.filter treat it as the (element, index) two-arg form (same
    # pitfall as minhash_signature above).
    def _is(word: str):
        return lambda t: t == F.lit(word)

    # Bind the token array ONCE per row as its own projection: the split +
    # length-filter is the dominant per-row cost and is referenced by the
    # dl column and every per-term tf — CollapseProject keeps a non-cheap
    # expression used more than once as a real intermediate attribute
    # (pinned below by counting split() occurrences in the optimized plan
    # in tests/test_text.py), so each scan splits the text exactly once.
    with_toks = docs.select(F.col(id_col), toks.alias("_toks"))
    base = with_toks.select(
        F.col(id_col),
        F.size("_toks").cast("double").alias("_dl"),
        *[
            F.size(F.filter(F.col("_toks"), _is(w))).cast("double").alias(f"_tf{i}")
            for i, w in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    # an all-empty corpus has avgdl = 0: try_divide -> NULL -> treat the
    # length normalization as neutral (every dl is 0 there anyway)
    dl_norm = F.coalesce(
        F.try_divide(F.col("_dl"), F.col("_avgdl")), F.lit(1.0)
    )
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5) + 1.0
        )
        tf = F.col(f"_tf{i}")
        part = idf * (
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl_norm))
        )
        score = part if score is None else score + part
    out = (
        scored.select(F.col(id_col), score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return out.withColumn("rnk", F.row_number().over(w).cast("long"))


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size token chunks with optional overlap —
    the retrieval/context-window twin of sequence packing (packing
    concatenates ACROSS documents; chunking splits WITHIN them, the shape
    RAG indexes and context-bounded training want).

    Output: one row per chunk — ``id``, ``chunk_idx`` (0-based),
    ``chunk_text`` (space-joined tokens), ``n_chunk_tokens``. Chunks
    start every ``chunk_tokens - overlap`` tokens; the last chunk may be
    short; an empty/NULL document yields no rows.

    Scale shape: pure scan-stage — one split per document (let-bound so
    the per-chunk slices read the bound array, not re-split), a
    ``sequence``/``transform`` over chunk starts, one ``posexplode``. No
    shuffle, no state; chunk count is data-derived per row.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    step = chunk_tokens - overlap

    def chunks(toks: Column) -> Column:
        n = F.size(toks)
        # chunk starts: 1, 1+step, ... while start <= n (1-based slice)
        n_chunks = F.when(
            n > 0, F.floor((n - 1) / F.lit(step)).cast("int") + 1
        ).otherwise(F.lit(0))
        # cap: once a chunk reaches the end, later overlapping starts add
        # only suffixes of it — stop at the first chunk containing token n
        n_full = F.when(
            n > chunk_tokens,
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(step)).cast("int") + 1,
        ).otherwise(F.when(n > 0, F.lit(1)).otherwise(F.lit(0)))
        n_out = F.least(n_chunks, n_full)
        return F.when(
            n_out > 0,
            F.transform(
                F.sequence(F.lit(0), n_out - 1),
                lambda i: F.slice(toks, i * step + 1, chunk_tokens),
            ),
        )

    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    per_doc = docs.select(
        F.col(id_col).alias("id"), let_(toks, chunks).alias("_chunks")
    )
    out = per_doc.select(
        "id", F.posexplode("_chunks").alias("chunk_idx", "_c")
    )
    return out.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join("_c", " ").alias("chunk_text"),
        F.size("_c").cast("long").alias("n_chunk_tokens"),
    )


def ngram_novelty(
    docs,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(id, n_grams, n_novel, novelty): the share of a document's DISTINCT
    word n-gram shingles whose FIRST corpus occurrence (lowest id) is this
    document — the per-document duplication-awareness signal behind
    "how much of this doc is new text?" analyses (Lee et al. 2022 use the
    inverse: memorized/duplicated spans). A verbatim re-post scores ~0, a
    fresh document ~1; training-data pipelines sample high-novelty docs
    first or downweight low-novelty tails.

    Scale shape: distinct shingles explode once (64-bit hashes — text
    never shuffles), a (gram → min id) aggregate with map-side partials,
    one join back on the gram hash, and a per-doc count aggregate. Two
    hash exchanges total, both linear; no per-doc state. "First" is the
    LOWEST id — deterministic, partition-invariant, and replayable in
    ANSI SQL (the lane's DuckDB oracle).
    """
    from pyspark.sql import functions as F

    from kinesiscat_spark.io_tables import spread
    from kinesiscat_spark.operators.dedup import shingle_hashes

    inv = spread(docs, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(F.col(text_col), n)).alias("g"),
    )
    first = inv.groupBy("g").agg(F.min("id").alias("_first"))
    return (
        inv.join(first, "g")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("_first") == F.col("id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_novel",
            (F.col("n_novel") / F.col("n_grams")).alias("novelty"),
        )
    )


def vocab_coverage(
    docs,
    targets: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    id_col: str = "doc_id",
    text_col: str = "text",
    _counts=None,
    _ranked=None,
):
    """Tokenizer-prep vocabulary sizing: for each coverage target t, the
    SMALLEST vocabulary (most-frequent words first, ties broken
    lexicographically) whose occurrences cover >= t of the corpus token
    mass — the classic "how big must the vocab be for 99% coverage"
    curve behind vocab-size decisions.

    Returns one row per target: (target, vocab_size, coverage) with
    coverage the exact mass fraction the chosen prefix attains.

    Scale shape: one token explode + word count (map-side combined,
    vocabulary-sized result), then ONE rank window over the vocab table
    — the expensive global sort runs over distinct words, never corpus
    tokens. Deterministic: (count DESC, word) total order, exact integer
    cumulative sums; only the final fraction is floating point, so the
    selection replays in ANSI SQL.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kinesiscat_spark.operators.dedup import tokens

    if not targets or not all(0.0 < t <= 1.0 for t in targets):
        raise ValueError(f"targets must be in (0, 1], got {targets}")
    # ``_counts``: a precomputed (w, c) exact word-count table over the
    # SAME ``tokens(text_col)`` stream (round 9, guide §2.4) — callers
    # running several vocab-table consumers in one action (the
    # text_heavy_ngrams lane) derive it once from a shared aggregate so
    # the corpus explode+shuffle is paid once, not per consumer. Counts
    # are exact integers either way, so the output is bit-identical.
    # ``_ranked``: a precomputed (rk, cum, total) table under the same
    # (count DESC, word ASC) window — callers with several vocab-table
    # consumers (text_heavy_ngrams shares one materialized ranking with
    # zipf_fit) pay the global sort once.  Values are exact integers, so
    # the output is bit-identical either way.
    if _ranked is not None:
        ranked = _ranked
    else:
        counts = _counts if _counts is not None else (
            docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("c"))
        )
        w = Window.orderBy(F.desc("c"), F.asc("w"))
        ranked = counts.select(
            F.row_number().over(w).alias("rk"),
            F.sum("c").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
            F.sum("c").over(Window.partitionBy()).alias("total"),
        )
    # ONE conditional aggregate answers every target (round 9, guide
    # §2.4): min-over-filter == min of the CASE indicator over all rows,
    # so the former per-target filtered aggregates (one full ranked pass
    # + exchange each) collapse into a single pass; an unreachable
    # target's conditional min/max are NULL exactly as the filtered
    # aggregate's were.
    from kinesiscat_spark.expr_memo import expr_memo

    def _build_vocab_exprs() -> tuple:
        aggs = []
        for j, t in enumerate(targets):
            cond = (
                F.col("cum").cast("double") / F.col("total")
                >= F.lit(float(t))
            )
            aggs += [
                F.min(F.when(cond, F.col("rk"))).alias(f"_vs{j}"),
                F.min(F.when(cond, F.struct("rk", "cum"))).alias(
                    f"_first{j}"
                ),
                F.max(F.when(cond, F.col("total"))).alias(f"_total{j}"),
            ]
        rows = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(t)).alias("target"),
                        F.col(f"_vs{j}").cast("long").alias("vocab_size"),
                        F.round(
                            F.col(f"_first{j}")["cum"].cast("double")
                            / F.col(f"_total{j}"),
                            6,
                        ).alias("coverage"),
                    )
                    for j, t in enumerate(targets)
                ]
            )
        ).alias("s")
        return aggs, rows

    aggs, rows = expr_memo(
        ("vocab_coverage", tuple(targets)), _build_vocab_exprs
    )
    return ranked.agg(*aggs).select(rows).select(
        "s.target", "s.vocab_size", "s.coverage"
    )


def zipf_fit(
    docs: DataFrame,
    top_n: int = 512,
    text_col: str = "text",
    _counts: "DataFrame | None" = None,
    _ranked: "DataFrame | None" = None,
) -> DataFrame:
    """Zipf-law fit over the corpus token-frequency curve: least-squares
    slope/intercept of ln(frequency) on ln(rank) across the ``top_n``
    most frequent whitespace tokens (Zipf 1949; natural text slopes near
    -1, so a shallow slope flags boilerplate/spam-heavy corpora and a
    steep one flags low-diversity templated text — a corpus-level
    quality diagnostic next to the per-document Gopher/C4 signals).

    Returns two rows: (stat='slope', n_points, value) and
    (stat='intercept', n_points, value), value rounded to 6 dp.

    Scale shape: one token explode + word count (map-side combined,
    vocabulary-sized), ONE rank window over the vocab table, then the
    four regression sums fold over a single collected array of at most
    ``top_n`` (rank, ln x, ln y) structs — deterministic because the
    fold order is rank order on BOTH engines (sort_array <-> DuckDB
    ``list(... ORDER BY rk)``, the DSIR-proven pairing), so the fit
    replays bit-for-bit in ANSI SQL.
    """
    from kinesiscat_spark.operators.dedup import tokens

    if top_n < 2:
        raise ValueError(f"top_n must be >= 2 (got {top_n})")
    # ``_counts``: same contract as vocab_coverage — a precomputed exact
    # (w, c) table over ``tokens(text_col)`` shares one corpus explode
    # across consumers (round 9, guide §2.4); bit-identical output.
    # ``_ranked``: a precomputed (rk, c) table under the same
    # (count DESC, word ASC) window — shares one materialized global
    # sort with vocab_coverage (bit-identical ranks either way).
    if _ranked is not None:
        ranked = _ranked.select("rk", "c").filter(F.col("rk") <= top_n)
    else:
        counts = _counts if _counts is not None else (
            docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("c"))
        )
        w = Window.orderBy(F.desc("c"), F.asc("w"))
        ranked = counts.select(
            F.row_number().over(w).alias("rk"), F.col("c")
        ).filter(F.col("rk") <= top_n)
    from kinesiscat_spark.expr_memo import expr_memo

    def _build_zipf_exprs() -> tuple:
        arr = F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("rk"),
                    F.log(F.col("rk").cast("double")).alias("x"),
                    F.log(F.col("c").cast("double")).alias("y"),
                )
            )
        )
        zero = F.lit(0.0)
        sums_aggs = [
            F.count("*").cast("double").alias("n"),
            F.aggregate(arr, zero, lambda a, p: a + p["x"]).alias("sx"),
            F.aggregate(arr, zero, lambda a, p: a + p["y"]).alias("sy"),
            F.aggregate(arr, zero, lambda a, p: a + p["x"] * p["y"]).alias(
                "sxy"
            ),
            F.aggregate(arr, zero, lambda a, p: a + p["x"] * p["x"]).alias(
                "sxx"
            ),
        ]
        # degenerate corpora (empty, or a single distinct rank) have a
        # zero slope denominator: NULL fit instead of an ANSI
        # divide-by-zero
        den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        slope = F.when(
            den != 0.0,
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den,
        )
        fit_sel = [
            F.col("n").cast("long").alias("n_points"),
            slope.alias("_slope"),
            F.when(
                (F.col("n") != 0.0) & slope.isNotNull(),
                (F.col("sy") - slope * F.col("sx")) / F.col("n"),
            ).alias("_icpt"),
        ]
        out_sel = F.explode(
            F.map_from_arrays(
                F.array(F.lit("slope"), F.lit("intercept")),
                F.array(F.round("_slope", 6), F.round("_icpt", 6)),
            )
        ).alias("stat", "value")
        return sums_aggs, fit_sel, out_sel

    sums_aggs, fit_sel, out_sel = expr_memo("zipf_fit", _build_zipf_exprs)
    return (
        ranked.agg(*sums_aggs)
        .select(*fit_sel)
        .select(out_sel, "n_points")
        .select("stat", "n_points", "value")
    )


class KNModel(NamedTuple):
    """A trained interpolated Kneser-Ney bigram model (Kneser & Ney 1995;
    Chen & Goodman 1999 interpolated form): raw pair counts, per-context
    totals + continuation fan-outs, per-word continuation fan-ins, and
    the scalar type/vocab masses the closed-form probability needs.
    Tables hold COUNTS (not probabilities) because KN's discount applies
    at scoring time: p(w2|w1) = max(c-D,0)/c1 + (D·n1f(w1)/c1)·p_cont(w2).
    """

    pairs: "DataFrame"  # (w1, w2, c)
    ctx: "DataFrame"  # (w1, c1, n1f) — total count + distinct-successor fan-out
    back: "DataFrame"  # (w2, n1b) — distinct-predecessor fan-in
    n_types: float  # distinct bigram types
    v: float  # unigram vocabulary size
    d: float  # absolute discount
    k: float  # add-k smoothing of the continuation distribution


def kneser_ney_model(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: float = 0.75,
    k: float = 0.5,
) -> KNModel:
    """Interpolated Kneser-Ney bigram model — the next rung of the LM
    ladder after ``bigram_model``'s add-k interpolation, and the
    smoothing family production KenLM actually uses (modified KN):
    instead of mixing with the raw unigram, mass discounted from seen
    pairs backs off to the CONTINUATION distribution
    ``p_cont(w2) ∝ N1+(·w2)`` — how many contexts a word completes, not
    how often it occurs — which famously stops high-frequency but
    single-context words ("Francisco") from absorbing backoff mass.
    ``p_cont`` is add-``k`` smoothed over (n_types + k·V) so OOV words
    keep nonzero mass.

    Scale shape: identical to ``bigram_model`` — one explode to (w1, w2)
    pairs, one map-side-combined groupBy for counts; ctx/back fan-outs
    are groupBys of the COUNTS table (bigram-type-sized); two scalar
    aggregates (n_types, V). Every table is bigram-type- or vocab-sized.
    """
    if not (0.0 < d < 1.0):
        raise ValueError(f"discount d must be in (0, 1), got {d}")
    uni = unigram_model(docs, id_col, text_col, k)
    v = uni.v if uni.v is not None else float(uni.df.count())
    # checkpoint the corpus-scale pair aggregate: n_types, ctx, back and
    # every downstream save/score consume it, and per-branch pruning
    # would otherwise re-run the corpus explode per consumer
    counts = _bigram_pair_counts(docs, text_col).localCheckpoint(eager=True)
    return _kn_from_counts(counts, v, d, k)


def score_documents_kn(
    docs,
    model: KNModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_rows: int = 10_000_000,
):
    """(id, n_tokens, avg_logp_kn): mean interpolated-Kneser-Ney bigram
    log-probability per document. Token i > 1 with a SEEN context w1
    scores ``ln(max(c-D,0)/c1 + (D·n1f(w1)/c1)·p_cont(w2))``; the first
    token and unseen contexts score ``ln(p_cont(w2))``. The per-doc sum
    folds over the VALUE-sorted logp list (the unigram lane discipline)
    so the double fold is order-defined and cross-engine stable.

    Scale shape: one positions explode + three model joins + one per-doc
    aggregate, map-side partialed; the joins carry a broadcast hint only
    while the bigram-type count stays under ``broadcast_rows`` (the
    bigram lane's size switch — a full-corpus-trained model shuffles on
    the word keys instead).
    """
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.dedup import tokens

    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    pos = (
        toks.select(id_col, "t", F.posexplode("t").alias("i", "w2"))
        .withColumn(
            "w1", F.when(F.col("i") > 0, F.element_at(F.col("t"), F.col("i")))
        )
        .drop("t")
    )
    bi = model.pairs.select(
        F.col("w1").alias("_bw1"), F.col("w2").alias("_bw2"), "c"
    )
    ctx = model.ctx.select(F.col("w1").alias("_cw1"), "c1", "n1f")
    back = model.back.select(F.col("w2").alias("_kw"), "n1b")
    small = model.n_types <= broadcast_rows
    if small:
        bi, ctx, back = F.broadcast(bi), F.broadcast(ctx), F.broadcast(back)
    # try_divide: identical for any non-empty model; an EMPTY training
    # corpus (n_types = v = 0) yields NULL scores instead of an ANSI
    # DIVIDE_BY_ZERO (the per-column digest observation keeps this
    # column un-prunable even under count())
    pc = F.try_divide(
        F.coalesce("n1b", F.lit(0.0)) + F.lit(model.k),
        F.lit(model.n_types + model.k * model.v),
    )
    seen = (
        F.greatest(F.coalesce("c", F.lit(0.0)) - F.lit(model.d), F.lit(0.0))
        / F.col("c1")
        + F.lit(model.d) * F.col("n1f") / F.col("c1") * pc
    )
    p = F.when((F.col("i") == 0) | F.col("c1").isNull(), pc).otherwise(seen)
    joined = (
        pos.join(
            bi,
            (pos["w1"] == bi["_bw1"]) & (pos["w2"] == bi["_bw2"]),
            "left",
        )
        .join(ctx, pos["w1"] == ctx["_cw1"], "left")
        .join(back, pos["w2"] == back["_kw"], "left")
        .select(id_col, F.log(p).alias("_lp"))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.aggregate(
                    F.sort_array(F.collect_list("_lp")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.count("*")
            ).alias("avg_logp_kn"),
        )
    )


def score_documents_bigram_kn(
    docs,
    bmodel: BigramModel,
    kmodel: KNModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_rows: int = 10_000_000,
):
    """(id, n_tokens, avg_logp2, avg_logp_kn): BOTH the interpolated
    add-k bigram fold and the interpolated Kneser-Ney fold from ONE
    positions explode and ONE per-doc aggregate (round 9 — guide §2.4
    "two operations keyed the same way share one exchange"). The two
    scorers read the identical (id, i, w1, w2) positions frame, so
    running them separately pays the tokenize+explode scan and the
    groupBy(id) exchange twice for byte-identical inputs.

    Per-row log-probabilities are the exact expressions of
    ``score_documents_bigram`` and ``score_documents_kn`` (their model
    joins are all 1:1 left joins on distinct keys, so the join order
    cannot change multiplicities), and each fold sorts its OWN value
    list before summing — bit-identical to the separate scorers
    (differential-pinned in tests/test_text_ops.py)."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.dedup import tokens

    lam = bmodel.lam
    uni = bmodel.unigram
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    pos = (
        toks.select(id_col, "t", F.posexplode("t").alias("i", "w2"))
        .withColumn(
            "w1", F.when(F.col("i") > 0, F.element_at(F.col("t"), F.col("i")))
        )
        .drop("t")
    )
    bi = bmodel.df.select(
        F.col("w1").alias("_bw1"), F.col("w2").alias("_bw2"), "p_bi"
    )
    ctx = bmodel.ctx.select(F.col("w1").alias("_cw1"), "c1")
    un = uni.df.select(F.col("w").alias("_uw"), F.exp("logp").alias("p_uni"))
    n_bi = bmodel.n_bi if bmodel.n_bi is not None else float(bmodel.df.count())
    if n_bi <= broadcast_rows:
        bi, ctx, un = F.broadcast(bi), F.broadcast(ctx), F.broadcast(un)
    kbi = kmodel.pairs.select(
        F.col("w1").alias("_kw1"), F.col("w2").alias("_kw2"),
        F.col("c").alias("_kc"),
    )
    kctx = kmodel.ctx.select(
        F.col("w1").alias("_kcw"), F.col("c1").alias("_kc1"),
        F.col("n1f").alias("_kn1f"),
    )
    kback = kmodel.back.select(
        F.col("w2").alias("_kbw"), F.col("n1b").alias("_kn1b")
    )
    if kmodel.n_types <= broadcast_rows:
        kbi, kctx, kback = (
            F.broadcast(kbi), F.broadcast(kctx), F.broadcast(kback)
        )
    backoff = F.lit(bmodel.k) / (
        F.coalesce("c1", F.lit(0)) + F.lit(bmodel.k * bmodel.v)
    )
    pc = F.try_divide(
        F.coalesce("_kn1b", F.lit(0.0)) + F.lit(kmodel.k),
        F.lit(kmodel.n_types + kmodel.k * kmodel.v),
    )
    seen = (
        F.greatest(F.coalesce("_kc", F.lit(0.0)) - F.lit(kmodel.d), F.lit(0.0))
        / F.col("_kc1")
        + F.lit(kmodel.d) * F.col("_kn1f") / F.col("_kc1") * pc
    )
    pk = F.when((F.col("i") == 0) | F.col("_kc1").isNull(), pc).otherwise(seen)
    joined = (
        pos.join(
            bi,
            (pos["w1"] == bi["_bw1"]) & (pos["w2"] == bi["_bw2"]),
            "left",
        )
        .join(ctx, pos["w1"] == ctx["_cw1"], "left")
        .join(un, pos["w2"] == un["_uw"], "left")
        .join(
            kbi,
            (pos["w1"] == kbi["_kw1"]) & (pos["w2"] == kbi["_kw2"]),
            "left",
        )
        .join(kctx, pos["w1"] == kctx["_kcw"], "left")
        .join(kback, pos["w2"] == kback["_kbw"], "left")
        .select(
            id_col,
            "i",
            F.coalesce("p_uni", F.lit(math.exp(uni.oov_logp))).alias("_pu"),
            F.coalesce("p_bi", backoff).alias("_pb"),
            F.log(pk).alias("_lpk"),
        )
    )
    lpb = F.when(
        F.col("i") == 0, F.log(F.col("_pu"))
    ).otherwise(F.log(F.lit(lam) * F.col("_pb") + F.lit(1.0 - lam) * F.col("_pu")))
    return (
        joined.select(id_col, lpb.alias("_lpb"), "_lpk")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.aggregate(
                    F.sort_array(F.collect_list("_lpb")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.count("*")
            ).alias("avg_logp2"),
            (
                F.aggregate(
                    F.sort_array(F.collect_list("_lpk")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.count("*")
            ).alias("avg_logp_kn"),
        )
    )


def class_tfidf(
    docs: DataFrame,
    group_col: str = "source",
    top_k: int = 3,
    text_col: str = "text",
    _ct: "DataFrame | None" = None,
) -> DataFrame:
    """Class-based TF-IDF (c-TF-IDF, Grootendorst 2022 — the BERTopic
    class-representation formula): treat each document group as ONE
    pseudo-document and score term t in class s as

        score(t, s) = tf_{t,s} · ln(1 + A / f_t)

    with ``tf_{t,s}`` the term's count inside the class, ``f_t`` its
    corpus-wide count, and ``A`` the average class token mass — the
    "what distinguishes this source from the rest" diagnostic behind
    per-source corpus cards. Returns the ``top_k`` terms per class:
    (group, term, rank, score), score rounded to 6 dp.

    Deterministic: counts are exact integer aggregates; A = total/n
    classes divides in one fixed order; ranking is (score DESC, term)
    with the rank window over the (class, term) COUNT table — never
    corpus tokens. Replayable in ANSI SQL.

    Scale shape: one token explode + one map-side-combined groupBy for
    (class, term) counts; corpus term totals and class masses are
    groupBys OF that table. The rank window partitions by class over
    vocabulary-sized rows.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kinesiscat_spark.operators.dedup import tokens

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1 (got {top_k})")
    # ``_ct``: a precomputed (grp, t, c) exact per-class term-count table
    # over the same ``tokens(text_col)`` stream (round 9, guide §2.4) —
    # lets a multi-consumer lane share the one corpus explode; exact
    # integer counts, so the output is bit-identical.
    ct = _ct if _ct is not None else (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens(F.col(text_col))).alias("t"),
        )
        .groupBy("grp", "t")
        .agg(F.count("*").alias("c"))
    )
    ft = ct.groupBy("t").agg(F.sum("c").alias("f"))
    mass = ct.groupBy("grp").agg(F.sum("c").alias("m"))
    a = mass.agg(
        (F.sum("m").cast("double") / F.count("*")).alias("_a")
    )
    scored = (
        ct.join(ft, "t")
        .crossJoin(a)
        .select(
            "grp",
            "t",
            (
                F.col("c").cast("double")
                * F.log(
                    F.lit(1.0) + F.col("_a") / F.col("f").cast("double")
                )
            ).alias("_score"),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("_score"), F.asc("t"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("grp").alias("group"),
            F.col("t").alias("term"),
            F.col("rank").cast("long"),
            F.round("_score", 6).alias("score"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 10,
    text_col: str = "text",
    _pairs_all: "DataFrame | None" = None,
) -> DataFrame:
    """Pointwise-mutual-information collocations (Church & Hanks 1990):
    adjacent word pairs whose co-occurrence beats chance,

        pmi(a, b) = ln( p(a,b) / (p(a) · p(b)) )
                  = ln c_ab − ln c_a − ln c_b + 2·ln N − ln M

    with ``c_ab`` the bigram's count, ``c_a``/``c_b`` unigram counts,
    ``N`` total words and ``M`` total bigrams. The phrase-mining /
    tokenizer-seeding diagnostic (high-PMI pairs are the multi-word units
    a BPE merge table learns first); a ``min_count`` floor drops the
    unstable rare-pair tail as the paper prescribes. Returns the
    ``top_k`` pairs: (gram, cnt, pmi), pmi rounded to 6 dp.

    Deterministic: every count is an exact integer aggregate; the score
    is five ``ln`` calls folded in one written order (same libm doubles
    on both engines — the Zipf-fit precedent), so it replays in ANSI
    SQL. Ranking is (pmi DESC, gram ASC) via orderBy+limit, which Spark
    executes as TakeOrderedAndProject — a distributed top-k, no single
    reducer sees the full collocation table.

    Scale shape: the corpus is exploded exactly TWICE (once to words,
    once to bigrams); both count frames are vocab-bounded and lazily
    checkpointed so the scalar totals N and M are derived from them by a
    cheap vocab-sized sum instead of two additional full corpus explodes
    (r7's 8x probe charged PMI 2.15 — half of it was the four-scan
    plan). The two scalar totals ride a 1-row crossJoin; the unigram
    joins are vocab-sized (AQE broadcasts when small). Text itself never
    shuffles.
    """
    from kinesiscat_spark.operators.curation import word_ngrams, words

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1 (got {min_count})")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1 (got {top_k})")
    w = docs.select(F.explode(words(F.col(text_col))).alias("w"))
    uni = (
        w.groupBy("w").agg(F.count("*").alias("c")).localCheckpoint(eager=False)
    )
    # ``_pairs_all``: a precomputed exact (gram, cnt) bigram count table
    # over the same ``word_ngrams(text_col, 2)`` stream (round 9, guide
    # §2.4) — the text_heavy_ngrams lane derives it from its shared
    # even/odd-half aggregate so the corpus bigram explode+shuffle is
    # paid once for all consumers; exact integer counts either way. The
    # caller owns materialization (no second checkpoint of a frame the
    # lane already shares).
    if _pairs_all is not None:
        pairs_all = _pairs_all
    else:
        g = docs.select(
            F.explode(word_ngrams(F.col(text_col), 2)).alias("gram")
        )
        pairs_all = (
            g.groupBy("gram")
            .agg(F.count("*").alias("cnt"))
            .localCheckpoint(eager=False)
        )
    pairs = pairs_all.filter(F.col("cnt") >= min_count)
    totals = uni.agg(F.sum("c").alias("_n")).crossJoin(
        pairs_all.agg(F.sum("cnt").alias("_m"))
    )
    # a bigram occurring >= min_count times implies BOTH its words occur
    # >= min_count times, so the unigram join sides can be pruned by the
    # same floor BEFORE the joins — under Zipf that drops the long rare
    # tail (most of the vocab) from both exchanges without changing any
    # surviving pair's score (VERDICT r8 task 4; the max_shingle_df
    # precedent of pushing the prune below the big tables)
    uni_f = uni.filter(F.col("c") >= min_count)
    ua = uni_f.select(F.col("w").alias("_wa"), F.col("c").alias("_ca"))
    ub = uni_f.select(F.col("w").alias("_wb"), F.col("c").alias("_cb"))
    scored = (
        pairs.withColumn("_wa", F.substring_index("gram", " ", 1))
        .withColumn("_wb", F.substring_index("gram", " ", -1))
        .join(ua, "_wa")
        .join(ub, "_wb")
        .crossJoin(totals)
        .select(
            "gram",
            "cnt",
            (
                F.log(F.col("cnt").cast("double"))
                - F.log(F.col("_ca").cast("double"))
                - F.log(F.col("_cb").cast("double"))
                + F.lit(2.0) * F.log(F.col("_n").cast("double"))
                - F.log(F.col("_m").cast("double"))
            ).alias("_pmi"),
        )
    )
    return scored.orderBy(F.desc("_pmi"), F.asc("gram")).limit(top_k).select(
        "gram", "cnt", F.round("_pmi", 6).alias("pmi")
    )


def rm3_terms(
    docs: DataFrame,
    terms: tuple[str, ...] | list[str],
    fb_docs: int = 10,
    fb_terms: int = 5,
    alpha: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    _scored: DataFrame | None = None,
) -> DataFrame:
    """RM3 pseudo-relevance-feedback term model (Lavrenko & Croft 2001;
    the RM3 interpolation Anserini/Indri ship): from the BM25 top-
    ``fb_docs`` first pass, estimate the relevance model

        P(w|R) = Σ_d  (score_d / Σ score) · tf_{w,d} / dl_d

    take the ``fb_terms`` highest-probability NON-query terms as the
    expansion set, and interpolate with the uniform query model:
    original terms weigh α/|Q| + (1−α)·P(w|R), expansion terms
    (1−α)·P(w|R). Returns (term, weight, is_original), weight rounded
    to 9 dp — the query model a second weighted-BM25 pass consumes
    (``rm3_topk``).

    Deterministic: first-pass scores come from the hash-proven
    ``bm25_topk``; every cross-document sum folds in VALUE order
    (sort_array + aggregate ↔ DuckDB ``list_sum(list(x ORDER BY x))``);
    expansion picks break ties (P DESC, term ASC).

    Scale shape: the feedback set is ``fb_docs`` rows — its token
    explode, the per-term contributions, and the rank are all bounded
    by the feedback set, never the corpus.
    """
    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1 (got {fb_docs})")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1 (got {fb_terms})")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1] (got {alpha})")
    qset = list(dict.fromkeys(terms))
    # ``_scored``: a precomputed bm25_topk(docs, qset, k', ...) ranking
    # with k' >= fb_docs — its rnk <= fb_docs prefix IS the feedback set
    # (same total order, same scores), so a caller that already ranks
    # the corpus for its own top-k shares that one scan here (round 10,
    # guide §2.4: the lane's first pass used to run twice)
    if _scored is not None:
        fb = _scored.filter(F.col("rnk") <= fb_docs).select(
            F.col(id_col).alias("_fid"), F.col("score").alias("_fscore")
        )
    else:
        fb = bm25_topk(docs, qset, fb_docs, k1=k1, b=b, id_col=id_col,
                       text_col=text_col).select(
            F.col(id_col).alias("_fid"), F.col("score").alias("_fscore")
        )
    ordered_sum = lambda c: F.aggregate(  # noqa: E731
        F.sort_array(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    total = fb.agg(ordered_sum("_fscore").alias("_tot"))
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    fbtok = (
        docs.select(F.col(id_col).alias("_fid"), toks.alias("_toks"))
        .join(fb, "_fid")
        .select(
            "_fid",
            "_fscore",
            F.size("_toks").cast("double").alias("_dl"),
            F.explode("_toks").alias("term"),
        )
    )
    # contrib(w, d) = (score_d / Σscore) · tf_{w,d} / dl_d, assembled as
    # one written order: tf counted by the (doc, term) group size
    contrib = (
        fbtok.groupBy("_fid", "term")
        .agg(
            F.count("*").cast("double").alias("_tf"),
            F.first("_fscore").alias("_fscore"),
            F.first("_dl").alias("_dl"),
        )
        .crossJoin(F.broadcast(total))
        # an EMPTY feedback set (no document matched any query term) has
        # tot = 0.0 — guard the division so the model degrades to the
        # plain α/|Q| query weights instead of NaN everywhere
        .filter(F.col("_tot") > 0.0)
        .select(
            "term",
            (
                F.col("_fscore") / F.col("_tot") * F.col("_tf") / F.col("_dl")
            ).alias("_c"),
        )
    )
    prm = contrib.groupBy("term").agg(ordered_sum("_c").alias("_prm"))
    w_exp = Window.orderBy(F.desc("_prm"), F.asc("term"))
    expansion = (
        prm.filter(~F.col("term").isin(qset))
        .withColumn("_rk", F.row_number().over(w_exp))
        .filter(F.col("_rk") <= fb_terms)
        .select(
            "term",
            F.round((1.0 - alpha) * F.col("_prm"), 9).alias("weight"),
            F.lit(False).alias("is_original"),
        )
    )
    originals = (
        docs.sparkSession.createDataFrame(
            [(t,) for t in qset], "term string"
        )
        .join(prm, "term", "left")
        .select(
            "term",
            F.round(
                F.lit(alpha / len(qset))
                + (1.0 - alpha) * F.coalesce("_prm", F.lit(0.0)),
                9,
            ).alias("weight"),
            F.lit(True).alias("is_original"),
        )
    )
    return originals.unionByName(expansion)


def rm3_topk(
    docs: DataFrame,
    terms: tuple[str, ...] | list[str],
    k: int,
    fb_docs: int = 10,
    fb_terms: int = 5,
    alpha: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    _model: DataFrame | None = None,
) -> DataFrame:
    """RM3 second pass: weighted-BM25 ranking under the interpolated
    query model from ``rm3_terms`` — each matched term contributes
    weight_w · idf_w · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), per-doc
    parts folded in VALUE order. Returns (doc_id, score, rnk), the
    pseudo-relevance-feedback upgrade of plain ``bm25_topk`` (recall
    from feedback vocabulary the original query missed).

    Scale shape: the term model is a ≤(|Q|+fb_terms)-row broadcast; one
    corpus token explode joins it (everything else is dropped at the
    join), per-term dfs aggregate from that same joined stream, and the
    global top-k is TakeOrderedAndProject. The corpus scans twice total
    (first pass + second pass), never more.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    # ``_model``: a precomputed (ideally materialized) rm3_terms frame —
    # callers emitting BOTH the term table and the ranking share one
    # first pass instead of re-deriving the model here
    model = (
        _model
        if _model is not None
        else rm3_terms(
            docs, terms, fb_docs, fb_terms, alpha, k1, b, id_col, text_col
        )
    ).select("term", "weight")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    stats = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(F.size("_toks").cast("double")).alias("_avgdl"),
    )
    matched = (
        base.select(
            F.col(id_col),
            F.size("_toks").cast("double").alias("_dl"),
            F.explode("_toks").alias("term"),
        )
        .join(F.broadcast(model), "term")
        .groupBy(id_col, "term")
        .agg(
            F.count("*").cast("double").alias("_tf"),
            F.first("_dl").alias("_dl"),
            F.first("weight").alias("_w"),
        )
    )
    dfs = matched.groupBy("term").agg(
        F.count("*").cast("double").alias("_df")
    )
    ordered_sum = lambda c: F.aggregate(  # noqa: E731
        F.sort_array(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    part = (
        F.col("_w")
        * F.log(
            (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
        )
        * (
            F.col("_tf") * (k1 + 1.0)
            / (
                F.col("_tf")
                + k1
                * (
                    1.0
                    - b
                    + b
                    * F.coalesce(
                        F.try_divide(F.col("_dl"), F.col("_avgdl")),
                        F.lit(1.0),
                    )
                )
            )
        )
    )
    scored = (
        matched.join(dfs, "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), part.alias("_part"))
        .groupBy(id_col)
        .agg(ordered_sum("_part").alias("score"))
    )
    out = (
        scored.filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return out.withColumn("rnk", F.row_number().over(w).cast("long"))


def fim_transform(
    docs: DataFrame,
    rate: float = 0.5,
    salt: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre_tok: str = "<PRE>",
    mid_tok: str = "<MID>",
    suf_tok: str = "<SUF>",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, "FIM"):
    for a ``rate`` fraction of documents, split the text at two
    positions and emit the PSM reordering

        <PRE> prefix <SUF> suffix <MID> middle

    so an autoregressive model learns infilling from plain left-to-right
    training — the data-side half of the paper (its "free-lunch"
    augmentation). The split points are DETERMINISTIC: three md5-derived
    48-bit dyadic rationals per document (the DSIR/reservoir recipe) —
    u0 gates application, a = floor(u1·L) and b = floor(u2·L) (ordered)
    are the character offsets — so the same corpus transforms the same
    way on any cluster, any partitioning, any rerun, and the transform
    replays in ANSI SQL. Untouched documents pass through verbatim
    (including NULL). Returns (id, applied, n_prefix, n_middle,
    n_suffix, fim_text).

    Scale shape: pure scan-stage Column algebra — three hash prefixes,
    two substrings, one concat per row; zero shuffle, zero Python.
    """
    from kinesiscat_spark.operators.sampling import _MD5_PREFIX, _md5_prefix

    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1] (got {rate})")

    def unit(s: int) -> Column:
        return F.conv(_md5_prefix([F.col(id_col)], s), 16, 10).cast(
            "double"
        ) / F.lit(float(16**_MD5_PREFIX))

    txt = F.coalesce(F.col(text_col), F.lit(""))
    ln = F.length(txt)
    a1 = F.floor(unit(salt + 1) * ln).cast("long")
    a2 = F.floor(unit(salt + 2) * ln).cast("long")
    a = F.least(a1, a2)
    b = F.greatest(a1, a2)
    applied = (unit(salt) < F.lit(rate)) & (ln >= 2)
    fim_text = F.concat(
        F.lit(pre_tok),
        F.substring(txt, F.lit(1), a),
        F.lit(suf_tok),
        F.substring(txt, b + 1, ln - b),
        F.lit(mid_tok),
        F.substring(txt, a + 1, b - a),
    )
    return docs.select(
        F.col(id_col).alias("id"),
        applied.alias("applied"),
        F.when(applied, a).alias("n_prefix"),
        F.when(applied, b - a).alias("n_middle"),
        F.when(applied, ln - b).cast("long").alias("n_suffix"),
        F.when(applied, fim_text).otherwise(F.col(text_col)).alias(
            "fim_text"
        ),
    )


def corpus_card(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus card (the quantitative core of a dataset
    datasheet, Gebru et al. 2021): for every ``group_col`` value —
    document count, whitespace-token total, distinct-language count,
    and the dominant language with its share. The at-a-glance table a
    mixture decision starts from, next to `class_tfidf`'s distinctive
    terms and `corpus_minhash_similarity`'s overlap estimates.

    Returns (group, n_docs, n_tokens, n_langs, top_lang,
    top_lang_share), share rounded to 6 dp.

    Deterministic and engine-exact: every count is an integer
    aggregate, the dominant language is an argmax with (count DESC,
    lang ASC) tie-break, and the share is one integer ratio. Scale
    shape: one scan computes per-doc token counts; everything
    aggregates by (group, lang) then group — map-side combinable,
    bounded by |groups|·|langs|; text never shuffles.
    """
    from kinesiscat_spark.operators.curation import words

    per_doc = docs.select(
        F.col(group_col).alias("group"),
        F.coalesce(F.col(lang_col), F.lit("")).alias("_lang"),
        # NULL text counts as an EMPTY doc (0 tokens), not a NULL that
        # aggregate skipping would silently drop from the totals
        F.size(
            words(F.coalesce(F.col(text_col), F.lit("")))
        ).cast("long").alias("_ntok"),
    )
    by_lang = per_doc.groupBy("group", "_lang").agg(
        F.count("*").alias("_nl"),
        F.sum("_ntok").alias("_tl"),
    )
    return (
        by_lang.groupBy("group")
        .agg(
            F.sum("_nl").cast("long").alias("n_docs"),
            F.sum("_tl").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_langs"),
            # argmax with (count DESC, lang ASC): minimize the struct
            # (−count, lang) — struct MIN orders by −count ascending
            # (= count descending) and breaks ties on the smaller lang
            F.min(
                F.struct(
                    (-F.col("_nl")).alias("_neg"), F.col("_lang")
                )
            ).alias("_top"),
        )
        .select(
            "group",
            "n_docs",
            "n_tokens",
            "n_langs",
            F.col("_top._lang").alias("top_lang"),
            F.round(
                (-F.col("_top._neg")).cast("double") / F.col("n_docs"), 6
            ).alias("top_lang_share"),
        )
    )
