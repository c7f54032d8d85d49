"""Corpus-curation signals: repetition statistics, PII detection, and
benchmark decontamination.

These are the quality gates a training-data pipeline runs between dedup
and sampling (the repetition heuristics follow the public Gopher rules,
Rae et al. 2021 §A1.1; decontamination follows the n-gram-overlap method
of the GPT-3 paper, Brown et al. 2020 §C). All three are Spark-first:

- ``repetition_signals`` / ``top_ngram_char_frac`` / ``dup_ngram_char_frac``
  are pure built-in Column expressions over the document's own line/word
  arrays — scan-stage, whole-stage codegen, zero shuffle. Per-row cost is
  O(distinct × total) in the doc's lines/grams (the within-array count is
  a ``filter`` per distinct element); that is a per-document constant
  independent of corpus size, so the operator scales linearly to 100 TB.
- ``pii_signals`` / ``redact_pii`` are ``regexp_count``/``regexp_replace``
  chains — scan-stage, no Python.
- ``contamination_report`` explodes each document's distinct word n-grams
  and joins them against the benchmark's n-gram set. Benchmarks (test
  sets) are small by construction, so the join side is broadcast — the
  corpus never shuffles; the only aggregation is the per-document hit
  count, partially aggregated map-side. At 100 TB swap the join key from
  the raw n-gram string to ``xxhash64(gram)`` to cut exchange bytes; the
  string form is kept here so the DuckDB oracle matches byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesiscat_spark.let import let_

# --- word n-grams ----------------------------------------------------------


def words(text: Column) -> Column:
    """Whitespace tokens, empty-safe (split of '' yields [''] — drop it)."""
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty when fewer than n words).

    The token array is let-bound so the slice lambda reads a materialized
    value: inlining ``words(text)`` into the lambda would re-split the
    text once per gram — O(words²) per document (kinesiscat_spark/let.py)."""

    def body(ws: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1))
        return F.when(
            F.size(ws) >= n,
            F.transform(idx, lambda i: F.array_join(F.slice(ws, i, n), " ")),
        ).otherwise(F.array().cast("array<string>"))

    return let_(words(text), body)


def _count_in(arr: Column, elem: Column) -> Column:
    return F.size(F.filter(arr, lambda x: x == elem))


# --- repetition (Gopher §A1.1) --------------------------------------------


def repetition_signals(text: Column) -> Column:
    """Struct of line-level repetition statistics:

    - ``n_lines``: number of lines;
    - ``dup_line_frac``: fraction of lines that repeat an earlier line
      (1 − distinct/total);
    - ``dup_line_char_frac``: fraction of line characters inside repeated
      occurrences (for a line of length l occurring c times, (c−1)·l
      characters count as duplicated).

    Gopher drops documents with dup_line_frac > 0.30 or
    dup_line_char_frac > 0.20.

    The line array is let-bound: ``_count_in(lines, d)`` runs inside the
    dup-chars fold, and an inlined split there would re-split the text per
    distinct line — O(lines²·len) per document (kinesiscat_spark/let.py).
    """

    def body(lines: Column) -> Column:
        n_lines = F.size(lines)
        distinct = F.array_distinct(lines)
        zero = F.lit(0).cast("long")
        total_chars = F.aggregate(lines, zero, lambda acc, x: acc + F.length(x))
        dup_chars = F.aggregate(
            distinct,
            zero,
            lambda acc, d: acc + (_count_in(lines, d) - 1) * F.length(d),
        )
        return F.struct(
            n_lines.cast("long").alias("n_lines"),
            F.when(
                n_lines > 0,
                1.0 - F.size(distinct) / n_lines.cast("double"),
            ).alias("dup_line_frac"),
            F.when(total_chars > 0, dup_chars / total_chars.cast("double")).alias(
                "dup_line_char_frac"
            ),
        )

    return let_(F.split(text, "\n"), body)


# --- C4 line/document cleaning (Raffel et al. 2020 §2.2) -------------------

# a line is retained iff it ends in terminal punctuation (period,
# exclamation/question mark, or a closing quote)
C4_TERMINAL_RE = '[.!?"”]$'
C4_BAD_LINE_WORD = "javascript"
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3


def c4_line_keep(
    line: Column, min_words: int = C4_MIN_WORDS_PER_LINE
) -> Column:
    """C4's line-retention predicate (Raffel et al. 2020 §2.2): the line
    ends in a terminal punctuation mark, has at least ``min_words``
    whitespace words, and does not mention "javascript" (the boilerplate
    tell). Pure built-in predicate — usable inside an array lambda."""
    wc = F.size(F.filter(F.split(F.trim(line), r"\s+"), lambda w: F.length(w) > 0))
    return (
        F.rtrim(line).rlike(C4_TERMINAL_RE)
        & (wc >= min_words)
        & ~F.contains(F.lower(line), F.lit(C4_BAD_LINE_WORD))
    )


def c4_signals(
    text: Column,
    min_words: int = C4_MIN_WORDS_PER_LINE,
    min_sentences: int = C4_MIN_SENTENCES,
) -> Column:
    """C4-style cleaning signals as one scan-stage struct:

    - ``n_lines`` / ``kept_lines``: line counts before/after the line
      filter (``c4_line_keep``);
    - ``clean_text`` / ``clean_chars``: the document rebuilt from the
      retained lines;
    - ``keep``: the document-level gate — no ``{`` (code tell), no
      "lorem ipsum" (placeholder tell) anywhere in the ORIGINAL text, and
      at least ``min_sentences`` sentence-terminal marks in the retained
      lines (C4 discards pages with fewer than 3 sentences).

    Zero shuffle: every field is a built-in Column over the document's own
    line array (let-bound once — an inlined split would re-split per
    lambda use), so per-row cost is a per-document constant and the
    operator scales linearly to 100 TB. The same expressions reproduce in
    DuckDB (`list_filter` + `regexp_matches`), which is what the
    ``curation_signals`` lane hash-checks.
    """
    t = F.coalesce(text, F.lit(""))

    def body(lines: Column) -> Column:
        def with_kept(kept: Column) -> Column:
            clean = F.array_join(kept, "\n")
            n_sentences = F.regexp_count(clean, F.lit("[.!?]"))
            keep = (
                ~F.contains(t, F.lit("{"))
                & ~F.contains(F.lower(t), F.lit("lorem ipsum"))
                & (n_sentences >= min_sentences)
            )
            return F.struct(
                F.size(lines).cast("long").alias("n_lines"),
                F.size(kept).cast("long").alias("kept_lines"),
                F.length(clean).cast("long").alias("clean_chars"),
                keep.alias("keep"),
                clean.alias("clean_text"),
            )

        return let_(
            F.filter(lines, lambda l: c4_line_keep(l, min_words)), with_kept
        )

    return let_(F.split(t, "\n"), body)


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = C4_MIN_WORDS_PER_LINE,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """Apply the C4 cleaning pass: drop documents failing the page gate
    and rewrite ``text_col`` to the retained lines. One scan, no shuffle,
    filter-then-rewrite in a single projection."""
    sig = c4_signals(F.col(text_col), min_words, min_sentences)
    return (
        df.withColumn("_c4", sig)
        .filter(F.col("_c4.keep"))
        .withColumn(text_col, F.col("_c4.clean_text"))
        .drop("_c4")
    )


# --- Gopher document-quality rules (Rae et al. 2021 §A1.1) -----------------

# Published defaults: a document is kept iff 50 <= words <= 100k, mean word
# length in [3, 10], hash/ellipsis symbols per word <= 0.1, at most 90% of
# lines start with a bullet, at most 30% end with an ellipsis, >= 80% of
# words contain an alphabetic character, and >= 2 of the stopword set occur.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLET_PREFIXES = ("•", "‣", "-", "*")


def gopher_signals(
    text: Column, stopwords: tuple[str, ...] = GOPHER_STOPWORDS
) -> Column:
    """Struct of the Gopher §A1.1 document-quality signals:

    - ``n_words``: whitespace word count;
    - ``mean_word_len``: average characters per word (NULL when empty);
    - ``alpha_word_frac``: fraction of words containing >= 1 ASCII letter;
    - ``hash_word_ratio`` / ``ellipsis_word_ratio``: ``#`` count per word
      and ``...``/``…`` count per word — SEPARATE ratios, because Rae et
      al. A1.1 applies its 0.1 threshold to each symbol individually;
    - ``symbol_word_ratio``: their sum (the combined diagnostic);
    - ``bullet_line_frac``: fraction of lines whose first non-blank char
      is a bullet mark; ``ellipsis_line_frac``: fraction ending in an
      ellipsis; - ``stop_hits``: number of DISTINCT stopwords present.

    Pure built-in Column algebra over the document's own word/line arrays
    — scan-stage, whole-stage codegen, ZERO shuffle — so the operator is a
    per-row constant and scales linearly to 100 TB. The word array is
    let-bound once and shared by all word-level signals
    (kinesiscat_spark/let.py)."""

    def body(ws: Column) -> Column:
        n_words = F.size(ws)
        nd = n_words.cast("double")
        # disjoint patterns, so the counts sum exactly to the combined
        # `#|\.\.\.|…` scan the ratio previously used
        hashes = F.regexp_count(F.coalesce(text, F.lit("")), F.lit("#"))
        ellipses = F.regexp_count(
            F.coalesce(text, F.lit("")), F.lit(r"\.\.\.|…")
        )
        lower_ws = F.transform(ws, F.lower)
        stop_arr = F.array([F.lit(s) for s in stopwords])

        def lines_body(lines: Column) -> Column:
            n_lines = F.size(lines)
            bullet = F.size(
                F.filter(
                    lines,
                    lambda l: F.substring(F.ltrim(l), 1, 1).isin(
                        *GOPHER_BULLET_PREFIXES
                    ),
                )
            )
            ellipsis = F.size(
                F.filter(
                    lines,
                    lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"),
                )
            )
            return F.struct(
                n_words.cast("long").alias("n_words"),
                F.when(
                    n_words > 0,
                    F.aggregate(
                        ws,
                        F.lit(0).cast("long"),
                        lambda acc, w: acc + F.length(w),
                    )
                    / nd,
                ).alias("mean_word_len"),
                F.when(
                    n_words > 0,
                    F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))) / nd,
                ).alias("alpha_word_frac"),
                F.when(n_words > 0, hashes / nd).alias("hash_word_ratio"),
                F.when(n_words > 0, ellipses / nd).alias(
                    "ellipsis_word_ratio"
                ),
                F.when(n_words > 0, (hashes + ellipses) / nd).alias(
                    "symbol_word_ratio"
                ),
                F.when(
                    n_lines > 0, bullet / n_lines.cast("double")
                ).alias("bullet_line_frac"),
                F.when(
                    n_lines > 0, ellipsis / n_lines.cast("double")
                ).alias("ellipsis_line_frac"),
                F.size(
                    F.filter(
                        stop_arr, lambda s: F.array_contains(lower_ws, s)
                    )
                )
                .cast("long")
                .alias("stop_hits"),
            )

        return let_(F.split(F.coalesce(text, F.lit("")), "\n"), lines_body)

    return let_(words(F.coalesce(text, F.lit(""))), body)


def gopher_keep(
    sig: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """The Gopher keep predicate over a ``gopher_signals`` struct, with the
    published defaults. NULL signals (empty document) evaluate to a kept
    =false — an explicit policy, not a NULL-filter side effect.

    ``max_symbol_ratio`` applies to the hash ratio and the ellipsis ratio
    SEPARATELY, as published (Rae et al. A1.1 thresholds each
    symbol-to-word ratio at 0.1 individually; checking their sum would be
    stricter than the published defaults — ADVICE r6)."""
    return (
        (sig["n_words"] >= min_words)
        & (sig["n_words"] <= max_words)
        & F.coalesce(sig["mean_word_len"] >= min_mean_word_len, F.lit(False))
        & F.coalesce(sig["mean_word_len"] <= max_mean_word_len, F.lit(False))
        & F.coalesce(
            sig["hash_word_ratio"] <= max_symbol_ratio, F.lit(False)
        )
        & F.coalesce(
            sig["ellipsis_word_ratio"] <= max_symbol_ratio, F.lit(False)
        )
        & F.coalesce(
            sig["bullet_line_frac"] <= max_bullet_frac, F.lit(False)
        )
        & F.coalesce(
            sig["ellipsis_line_frac"] <= max_ellipsis_frac, F.lit(False)
        )
        & F.coalesce(sig["alpha_word_frac"] >= min_alpha_frac, F.lit(False))
        & (sig["stop_hits"] >= min_stop_hits)
    )


def top_ngram_char_frac(text: Column, n: int) -> Column:
    """Fraction of the text's characters covered by the single most
    frequent word n-gram (count × gram length / text length). Ties break
    to the lexicographically largest gram (struct max), deterministically.
    Gopher's thresholds: 0.20 / 0.18 / 0.16 for n = 2 / 3 / 4.

    The gram array is let-bound: ``_count_in(grams, g)`` runs once per
    distinct gram, and an inlined gram construction there would rebuild
    every gram per distinct — O(grams²) per document (kinesiscat_spark/let.py).
    """

    def body(grams: Column) -> Column:
        distinct = F.array_distinct(grams)
        best = F.array_max(
            F.transform(
                distinct,
                lambda g: F.struct(_count_in(grams, g).alias("c"), g.alias("g")),
            )
        )
        covered = best["c"] * F.length(best["g"])
        return F.when(
            F.size(distinct) > 0,
            covered / F.greatest(F.length(text), F.lit(1)).cast("double"),
        ).otherwise(F.lit(0.0))

    return let_(word_ngrams(text, n), body)


def dup_ngram_char_frac(text: Column, n: int) -> Column:
    """Fraction of characters inside word n-grams that occur more than
    once (sum over duplicated grams of count × length, over text length,
    capped at 1.0 — overlapping grams can double-count; the cap keeps the
    signal a fraction, and the Gopher thresholds 0.15…0.10 for n = 5…10
    sit far below it). 0.0 when there are no n-grams.

    The gram array is let-bound for the same reason as
    ``top_ngram_char_frac`` (kinesiscat_spark/let.py)."""

    def body(grams: Column) -> Column:
        distinct = F.array_distinct(grams)
        zero = F.lit(0).cast("long")
        # _count_in is the O(total-grams) dominant inner cost: materialize
        # each distinct gram's (count, length) struct ONCE via transform,
        # then fold over the structs — the when() reads a struct field, it
        # does not re-run the count (a second _count_in here would double
        # the per-document work).
        counted = F.transform(
            distinct,
            lambda g: F.struct(
                _count_in(grams, g).alias("c"), F.length(g).cast("long").alias("w")
            ),
        )
        dup_chars = F.aggregate(
            counted,
            zero,
            lambda acc, s: acc + F.when(s["c"] > 1, s["c"] * s["w"]).otherwise(zero),
        )
        return F.least(
            dup_chars / F.greatest(F.length(text), F.lit(1)).cast("double"),
            F.lit(1.0),
        )

    return let_(word_ngrams(text, n), body)


def token_entropy(text: Column) -> Column:
    """Shannon entropy (nats) of the document's own token distribution:

        H = −Σ_t (c_t/n) · ln(c_t/n)

    over the doc's distinct whitespace tokens — the classic
    repetitiveness/gibberish diagnostic next to the Gopher repetition
    fractions (a spam page looping three phrases scores near 0; varied
    prose scores near ln of its distinct-token count). NULL for empty
    docs.

    Deterministic and ANSI-SQL-replayable: the entropy terms fold in
    VALUE order (sort_array + aggregate ↔ DuckDB ``list_sum(list_sort(
    ...))``), each term is one written arithmetic order over identical
    IEEE doubles. Scan-stage Column algebra, zero shuffle; the token
    array is let-bound and each term's probability binds once, so the
    cost is O(n·distinct) per document, not O(n²·distinct)
    (kinesiscat_spark/let.py).
    """

    def body(ws: Column) -> Column:
        n = F.size(ws).cast("double")
        terms = F.transform(
            F.array_distinct(ws),
            lambda t: let_(
                _count_in(ws, t).cast("double") / n,
                lambda p: p * F.log(p),
            ),
        )
        return F.when(
            F.size(ws) > 0,
            -F.aggregate(
                F.sort_array(terms), F.lit(0.0), lambda a, x: a + x
            ),
        )

    return let_(words(text), body)


# --- blocklist word filtering (C4 §2.2 "List of ... Bad Words") ------------


def blocklist_signals(text: Column, blocklist: tuple[str, ...]) -> Column:
    """Struct of blocklist statistics: ``n_list_hits`` (tokens whose
    lowercase form is in ``blocklist``) and ``list_word_frac`` (hits /
    tokens; NULL for token-free documents).  C4 drops any page with a
    single hit; Gopher-style pipelines gate on the fraction.

    Scan-stage: the blocklist travels as ONE array literal
    (``Literal(ArrayData)`` — a constant reference, not len(list)
    expressions) and each token pays an O(|list|) ``array_contains``.
    Real-world lists are a few hundred words, so the per-token cost is
    a small constant; for an outsized list, pre-filter with a Bloom
    filter (operators/bloom.py) and verify the survivors.
    """

    def body(ws: Column) -> Column:
        arr = F.lit([w.lower() for w in blocklist])
        hits = F.size(F.filter(ws, lambda t: F.array_contains(arr, F.lower(t))))
        return F.struct(
            hits.cast("long").alias("n_list_hits"),
            F.when(
                F.size(ws) > 0, hits / F.size(ws).cast("double")
            ).alias("list_word_frac"),
        )

    return let_(words(text), body)


# --- PII -------------------------------------------------------------------

# Deterministic, oracle-reproducible patterns (Java regex ∩ RE2 subset so
# Spark and DuckDB agree): pragmatic detectors, not validators.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d\-. ]{6,}\d"


def pii_signals(text: Column) -> Column:
    """Struct of PII match counts (emails, IPv4 addresses, +-prefixed
    international phone numbers). Pure ``regexp_count`` — scan-stage."""
    return F.struct(
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(text, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    )


def redact_pii(text: Column, token: str = "<PII>") -> Column:
    """Replace every PII match with ``token``. Email first: an address
    would otherwise leave its domain after IP/phone passes."""
    out = F.regexp_replace(text, EMAIL_RE, token)
    out = F.regexp_replace(out, IPV4_RE, token)
    out = F.regexp_replace(out, PHONE_RE, token)
    return out


# --- cross-document repeated spans ----------------------------------------


def cross_doc_spans(
    docs: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Word ``n``-gram spans appearing in ≥ ``min_docs`` distinct documents
    — the word-granularity analogue of exact substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"; the
    suffix-array construction there finds character spans, this finds the
    boilerplate at span length ``n`` with one aggregation).

    Returns (span, n_docs). Scale shape: per-document DISTINCT grams
    explode into one exchange keyed on the span, and the count is
    partially aggregated map-side — a span repeated in every document
    costs one partial count per task, not a posting list. At 100 TB key
    the exchange on ``xxhash64(span)`` and keep an example span per hash.
    """
    grams = docs.select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("span")
    )
    return (
        grams.groupBy("span")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def span_dup_frac(
    docs: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Per-document fraction of its distinct word ``n``-grams that also
    appear in ≥ ``min_docs`` − 1 OTHER documents (cross-document
    boilerplate load). Returns (id, n_repeated, n_grams, span_dup_frac);
    documents with no n-grams are omitted.

    Scale shape: the text scan + n-gram explode — the widest stage — runs
    ONCE: the cross-document count is a window over the span partitioning
    (one hash exchange keyed on the span), and the per-document rollup is
    then a plain (id, counts) aggregation, partially combined map-side.
    No joins, no second scan — the same rides-the-exchange trick the
    minhash guard uses (``dedup.minhash_lsh_pairs``)."""
    from pyspark.sql import Window

    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("span"),
    )
    n_docs = F.count("*").over(Window.partitionBy("span"))
    return (
        doc_grams.withColumn("n_docs", n_docs)
        .groupBy("id")
        .agg(
            F.count(F.when(F.col("n_docs") >= min_docs, 1)).alias("n_repeated"),
            F.count("*").alias("n_grams"),
        )
        .select(
            "id",
            "n_repeated",
            "n_grams",
            F.round(
                F.col("n_repeated") / F.col("n_grams").cast("double"), 6
            ).alias("span_dup_frac"),
        )
    )


def doc_windows(
    docs: DataFrame,
    w: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, win_idx, h, win_len): each document's consecutive
    non-overlapping ``w``-token windows as md5 hashes — the shared span
    derivation of batch ``remove_duplicate_spans`` and the streaming
    first-seen twin (one definition, so the two can never drift)."""
    toks = words(F.coalesce(F.col(text_col), F.lit("")))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
    n_tokens = F.size("toks")
    # Guarded sequence: ceil(0/w)-1 = -1 would make sequence() descend
    # (step defaults to -1 when start > stop) and emit phantom windows.
    n_wins = F.ceil(n_tokens / F.lit(w)).cast("int")
    spans = F.when(
        n_wins > 0,
        F.transform(
            F.sequence(F.lit(0), n_wins - 1),
            lambda i: F.struct(
                F.md5(F.array_join(F.slice("toks", i * w + 1, w), " ")).alias("h"),
                F.least(F.lit(w), n_tokens - i * w).cast("int").alias("win_len"),
            ),
        ),
    )
    return base.select("id", F.posexplode(spans).alias("win_idx", "s")).select(
        "id", "win_idx", "s.h", "s.win_len"
    )


def remove_duplicate_spans(
    docs: DataFrame,
    w: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr-style duplicate-span REMOVAL (Lee et al. 2022 §3.1,
    token-window granularity) — the rewrite counterpart of
    ``span_dup_frac``'s detection: each document is cut into consecutive
    NON-overlapping ``w``-token windows; every window whose exact token
    sequence occurred earlier in the corpus (global order =
    ``(id, win_idx)``) is removed, and the surviving windows are
    reassembled in document order. Exactly one copy of every repeated
    span survives, so re-running the operator on its own output is a
    no-op — the fixed-point property the suffix-array method has.

    Returns ``(id, n_tokens, n_removed, clean_text)``; ``n_removed``
    counts removed tokens, so the cleaned document always has
    ``n_tokens − n_removed`` tokens.

    Scale shape: the only wide exchange carries
    ``(md5(window), id, win_idx, win_len)`` — fixed ~52 bytes per window
    regardless of ``w`` — for the global first-occurrence window
    function; the removed indexes flow back as a narrow
    ``(id, array<long>)`` join, and the cleaned text is rebuilt from the
    original scan with an index-aware array filter, so document text is
    NEVER shuffled. Deterministic on any partitioning: first occurrence
    is a total order, not a partition accident.
    """
    from pyspark.sql import Window

    toks = words(F.coalesce(F.col(text_col), F.lit("")))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
    n_tokens = F.size("toks")
    wins = doc_windows(docs, w, id_col, text_col)

    rn = F.row_number().over(Window.partitionBy("h").orderBy("id", "win_idx"))
    dup = (
        wins.withColumn("rn", rn)
        .filter(F.col("rn") > 1)
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list(F.col("win_idx").cast("long"))).alias("rem"),
            F.sum("win_len").alias("n_removed"),
        )
    )

    def rebuild(rem: Column) -> Column:
        return F.array_join(
            F.filter(
                F.col("toks"),
                lambda tok, i: ~F.array_contains(rem, F.floor(i / F.lit(w))),
            ),
            " ",
        )

    return base.join(dup, "id", "left").select(
        "id",
        n_tokens.cast("long").alias("n_tokens"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        let_(
            F.coalesce(F.col("rem"), F.expr("CAST(array() AS ARRAY<BIGINT>)")),
            rebuild,
        ).alias("clean_text"),
    )


# --- benchmark decontamination --------------------------------------------


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
    bloom_bits: int | None = None,
    bloom_k: int = 5,
    _bench_grams: DataFrame | None = None,
) -> DataFrame:
    """Documents sharing ≥ ``min_hits`` distinct word ``n``-grams with the
    benchmark set (train/test overlap, Brown et al. 2020 §C).

    Returns (id, n_gram_hits, n_grams, contamination_frac) — the fraction
    of the document's distinct n-grams that appear anywhere in the
    benchmark. One pass over the corpus: the document grams explode ONCE,
    LEFT-join the broadcast benchmark gram set (small by construction) to
    tag hits in the scan stage, and a single per-document aggregation
    counts both totals and hits (partially combined map-side) — the only
    exchange is the per-document count rows. Pass
    ``broadcast_benchmark=False`` for an outsized benchmark to fall back
    to a shuffle join on the gram.

    ``bloom_bits`` switches to the large-benchmark scale path: a
    bit-packed Bloom filter over the benchmark grams (operators/bloom.py)
    is broadcast instead of the gram set itself (8–10× smaller at ~10
    bits/element), non-member grams are rejected in the scan stage, and
    only the FPR-sized survivor stream reaches the exact verify join —
    so the corpus gram stream never shuffles even when the benchmark is
    too big to broadcast (``broadcast_benchmark=False``). Bloom filters
    have no false negatives and the survivors are re-verified exactly,
    so the output is row-for-row IDENTICAL to the default path — the
    same DuckDB oracle checks both.
    """
    # ``_bench_grams``: a precomputed distinct (g, _hit) benchmark gram
    # set — callers running several report variants over ONE benchmark
    # (the curation_decontaminate lane's exact + bloom twins) materialize
    # it once so the benchmark explode + distinct exchange is paid once
    # instead of three times (exact broadcast, bloom build, bloom
    # verify).  Same rows either way — output unchanged.
    bench_grams = _bench_grams if _bench_grams is not None else (
        benchmark.select(
            F.explode(word_ngrams(F.col(bench_text_col), n)).alias("g")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g"),
    )
    bench_side = F.broadcast(bench_grams) if broadcast_benchmark else bench_grams
    if bloom_bits is not None:
        return _contamination_report_bloom(
            doc_grams, bench_side, bloom_bits, bloom_k, min_hits
        )
    return (
        doc_grams.join(bench_side, "g", "left")
        .groupBy("id")
        .agg(
            F.count("_hit").alias("n_gram_hits"),
            F.count("*").alias("n_grams"),
        )
        .select(
            "id",
            "n_gram_hits",
            "n_grams",
            F.round(
                F.col("n_gram_hits") / F.col("n_grams").cast("double"), 6
            ).alias("contamination_frac"),
        )
        .filter(F.col("n_gram_hits") >= min_hits)
    )


def _contamination_report_bloom(
    doc_grams: DataFrame,
    bench_side: DataFrame,
    bloom_bits: int,
    bloom_k: int,
    min_hits: int,
) -> DataFrame:
    """Bloom-prefiltered contamination report (see contamination_report).

    Plan shape — one corpus scan, no corpus-wide gram shuffle:

      1. build the filter over the benchmark grams (one aggregation whose
         shuffle payload is ≤ bloom_bits/64 mask rows),
      2. cross-join the single filter row (broadcast) into the gram scan
         and aggregate per document in ONE pass: total gram count plus
         the collect_list of grams that might be contaminated (NULLs —
         bloom misses — are dropped by collect_list, so the list is
         FPR-sized, and the per-doc exchange carries only it),
      3. explode the survivors and verify against the actual benchmark
         gram set (inner join; shuffle- or broadcast- per bench_side) —
         false positives die here, so counts are exact.

    A document none of whose grams survive the filter cannot reach
    min_hits ≥ 1 and exits at the explode; for min_hits < 1 the totals
    are joined back so zero-hit documents are reported like the default
    path does.
    """
    from kinesiscat_spark.operators.bloom import bloom_build, bloom_might_contain

    bloom = bloom_build(bench_side.select("g"), "g", bloom_bits, bloom_k)
    # The probe MUST be evaluated in this Project, not inside the
    # aggregate: collect_list compiles to ObjectHashAggregate, which has
    # no whole-stage codegen — hoisting the getbit/transform probes into
    # its update expression re-evaluates them INTERPRETED per row (~40×
    # slower, measured).  Down here they run compiled, and the aggregate
    # sees a plain column.
    tagged = doc_grams.crossJoin(F.broadcast(bloom)).select(
        "id",
        F.when(
            bloom_might_contain(F.col("bloom"), F.col("g"), bloom_bits, bloom_k),
            F.col("g"),
        ).alias("cand_g"),
    )
    per_doc = tagged.groupBy("id").agg(
        F.count("*").alias("n_grams"),
        F.collect_list("cand_g").alias("cand"),
    )
    hits = (
        per_doc.select("id", "n_grams", F.explode("cand").alias("g"))
        .join(bench_side.drop("_hit"), "g")
        .groupBy("id", "n_grams")
        .agg(F.count("*").alias("n_gram_hits"))
    )
    if min_hits < 1:
        hits = (
            per_doc.select("id", "n_grams")
            .join(hits.drop("n_grams"), "id", "left")
            .withColumn("n_gram_hits", F.coalesce("n_gram_hits", F.lit(0)))
        )
    return hits.select(
        "id",
        "n_gram_hits",
        "n_grams",
        F.round(
            F.col("n_gram_hits") / F.col("n_grams").cast("double"), 6
        ).alias("contamination_frac"),
    ).filter(F.col("n_gram_hits") >= min_hits)


def dedup_lines_across_docs(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document LINE deduplication (the RefinedWeb/FineWeb line-wise
    stage, Penedo et al. 2023 §4.2): drop every line whose exact text
    appears in >= ``min_docs`` DISTINCT documents — navbars, cookie
    banners, boilerplate footers — and reassemble each document from its
    surviving lines in original order.

    Returns (id, n_lines, n_removed_lines, clean_text). A document whose
    every line is boilerplate comes back with clean_text '' (kept row,
    empty rewrite — dropping whole documents is a separate gate's call).

    Scale shape: lines explode once with their position; the cross-doc
    frequency groups on the 64-bit xxhash64 of the line (one narrow
    (hash, id) exchange — the line TEXT never shuffles for the count,
    and the distinct-docs pre-aggregation combines map-side); the
    boilerplate hash set joins back to the positioned lines (hash equi-
    join, AQE broadcasts it when small — it is bounded by boilerplate
    density, not corpus size, but nothing forces the hint); each doc
    then reassembles surviving lines with one (id)-keyed aggregation.
    Collision note: a 64-bit hash collision could blame an innocent line
    at ~n_lines²/2⁶⁴ probability; at trillion-line scale swap in the
    128-bit md5 the oracle already replays.
    """
    from kinesiscat_spark.io_tables import spread

    lines = spread(docs, id_col).select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    freq = (
        lines.select(F.xxhash64("line").alias("h"), "id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
    )
    boiler = freq.filter(F.col("n_docs") >= min_docs).select("h")
    kept = lines.join(
        boiler, F.xxhash64(F.col("line")) == F.col("h"), "left_anti"
    )
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))
    rebuilt = kept.groupBy("id").agg(
        F.count("*").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            "id",
            "n_lines",
            (F.col("n_lines") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_removed_lines"
            ),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def semantic_contamination_report(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    tau: float,
    corpus_id: str = "vec_id",
    bench_id: str = "vec_id",
    vec: str = "embedding",
    method: str = "arrow",
) -> DataFrame:
    """SEMANTIC decontamination (round 7): corpus vectors within cosine
    ``tau`` of ANY benchmark vector — the embedding-space complement of
    the n-gram ``contamination_report``, catching paraphrased/reworded
    benchmark leakage that exact n-gram overlap structurally misses
    (the "rephrased samples" contamination of Yang et al. 2023).

    Returns (id, n_bench_hits, max_sim) for flagged vectors only; anti-
    join the ids to drop them.

    ``method='arrow'`` (default): a vectorized kernel accumulating dots
    and norms DIMENSION-BY-DIMENSION across a (batch × n_bench) array —
    the exact fold order of the Column cosine and the DuckDB oracle
    (the ivf_assign_arrow discipline; bit-identical, differential-pinned
    in tests/test_curation.py), at numpy constants instead of n·m
    interpreted HOF folds (~10× at sf0.1). ``method='column'`` is the
    pure-Column spec it is tested against.

    Scale shape: benchmarks are small by construction (test sets), so
    the bench matrix ships in the kernel closure (arrow) or broadcasts
    (column) and the corpus scans ONCE — per-row output, zero corpus
    shuffle in the arrow path. At extreme bench sizes restrict
    candidates first with the ANN machinery (similarity.ivf_topk on
    bench queries) and exact-verify the candidates with the column math.
    """
    if method == "column":
        from kinesiscat_spark.operators.similarity import cosine

        c = corpus_emb.select(
            F.col(corpus_id).alias("id"), F.col(vec).alias("_cv")
        )
        bench_rows = bench_emb.select(
            F.col(bench_id).alias("_bid"), F.col(vec).alias("_bv")
        )
        sim = cosine(F.col("_cv"), F.col("_bv"))
        pairs = (
            c.crossJoin(F.broadcast(bench_rows))
            .select("id", sim.alias("sim"))
            .filter(F.col("sim") >= F.lit(float(tau)))
        )
        return pairs.groupBy("id").agg(
            F.count("*").alias("n_bench_hits"),
            F.max("sim").alias("max_sim"),
        )
    if method != "arrow":
        raise ValueError(f"unknown method {method!r}")

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = bench_emb.select(F.col(vec).alias("v")).collect()
    B = (
        np.stack([np.asarray(r.v, dtype=np.float64) for r in rows])
        if rows
        else np.zeros((0, 0))
    )
    n_bench, dim = B.shape if rows else (0, 0)
    # bench norms accumulate dimension-by-dimension too: np.sum's pairwise
    # summation differs in the last ulp from the Column fold's sequential
    # order (caught by the equality pin — sim(v, v) read 1.0000000000000002)
    _bn = np.zeros(n_bench)
    for _i in range(dim):
        _bn += B[:, _i] * B[:, _i]
    bnorm = np.sqrt(_bn)

    out_schema = T.StructType(
        [
            T.StructField("id", corpus_emb.schema[corpus_id].dataType),
            T.StructField("n_bench_hits", T.LongType()),
            T.StructField("max_sim", T.DoubleType()),
        ]
    )

    # mapInPandas, not a scalar struct UDF: the flagged-only filter runs
    # INSIDE the kernel, so the plan is one ArrowEvalPython-equivalent
    # node (a filter pushed against a struct-returning scalar UDF
    # re-evaluates the kernel — pinned by test_plan_shape.py).
    def scan(batches):
        for pdf in batches:
            n = len(pdf)
            if not n or not n_bench:
                continue
            arr = pdf["_v"].to_numpy()
            valid = np.fromiter(
                (v is not None and len(v) == dim for v in arr),
                dtype=bool,
                count=n,
            )
            if not valid.any():
                continue
            V = np.stack(arr[valid]).astype(np.float64)
            dots = np.zeros((V.shape[0], n_bench))
            nrm = np.zeros(V.shape[0])
            # dimension-by-dimension: the Column fold's exact order
            for i in range(dim):
                dots += V[:, i : i + 1] * B[:, i]
                nrm += V[:, i] * V[:, i]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = dots / (np.sqrt(nrm)[:, None] * bnorm)
            hits = sims >= tau  # NaN compares false, like SQL null
            flagged = hits.any(axis=1)
            if not flagged.any():
                continue
            ids = pdf["id"].to_numpy()[valid][flagged]
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_bench_hits": hits[flagged].sum(axis=1),
                    "max_sim": np.where(hits[flagged], sims[flagged], -np.inf)
                    .max(axis=1),
                }
            )

    return corpus_emb.select(
        F.col(corpus_id).alias("id"), F.col(vec).alias("_v")
    ).mapInPandas(scan, out_schema)
