"""End-to-end corpus curation: the composed pipeline a training-data team
actually runs, built entirely from this engine's operators.

    raw documents
      → quality gate        (text heuristics — scan-stage filter)
      → repetition gate     (Gopher dup-line / top-n-gram fractions)
      → language gate       (char-n-gram language ID)
      → PII policy          (redact or drop — regexp, scan-stage)
      → decontamination     (benchmark n-gram overlap, broadcast anti-join)
      → exact dedup         (sha-256 digest, keep lowest id)
      → near-dup dedup      (minhash LSH pairs → connected components →
                             keep one canonical doc per cluster)
      → sampling / mixing   (deterministic content-hash)

Each stage is independently oracle-checked through its query lane; this
module only composes them, so the pipeline inherits their scale shapes:
the gates are scan-stage filters (pushdown-friendly), dedup shuffles
fixed-width keys, and sampling decisions are partition-invariant hashes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesiscat_spark.operators.quality_classifier import QualityModel


@dataclass
class CurationConfig:
    min_tokens: int = 8
    min_stopword_ratio: float = 0.0  # 0 disables the stopword gate
    keep_langs: tuple[str, ...] = ()  # empty = keep all
    near_dup_threshold: float = 0.5
    minhash_hashes: int = 32
    minhash_bands: int = 8
    # near-dup cluster winner: "canonical" (lowest id) or "best" (highest
    # ``near_dup_score_col``, ties → lowest id — the keep-the-best-
    # representative policy once a quality signal exists)
    near_dup_keep: str = "canonical"
    near_dup_score_col: str = "n_chars"
    sample_fraction: float = 1.0  # 1.0 disables sampling
    sample_salt: int = 0
    # "xxhash64" (cheapest JVM path) or "md5" (reproduces the exact same
    # selection in any engine with md5 — cross-engine pipelines + oracles)
    sample_method: str = "xxhash64"
    # Gopher-style repetition gates (0 disables each; the published
    # thresholds are dup_line_frac 0.30, top-2-gram char fraction 0.20)
    max_dup_line_frac: float = 0.0
    max_top_ngram_char_frac: float = 0.0
    top_ngram_n: int = 2
    # Gopher §A1.1 document-quality rules (word count / mean word length /
    # symbol ratio / bullet & ellipsis lines / alpha words / stopwords) at
    # the PUBLISHED thresholds (operators/curation.py gopher_keep). False
    # disables (the default). gopher_stopwords overrides the stopword set
    # for corpora whose vocabulary lacks the published one.
    gopher_rules: bool = False
    gopher_stopwords: tuple[str, ...] | None = None
    # Blocklist word filtering (C4 §2.2): drop documents whose blocklist
    # word fraction exceeds the threshold (0.0 = any hit drops, the C4
    # rule). Empty blocklist disables.
    blocklist: tuple[str, ...] = ()
    max_blocklist_frac: float = 0.0
    # PII handling: "keep" (default), "redact" (mask in place), or "drop"
    # (remove documents with any match)
    pii_policy: str = "keep"
    # Benchmark decontamination: a DataFrame of held-out text to exclude
    # by n-gram overlap (None disables)
    benchmark: DataFrame | None = None
    contamination_ngram: int = 8
    # ExactSubstr-style duplicate-span REMOVAL (Lee et al. 2022), applied
    # after near-dup dedup (the RefinedWeb stage order): rewrite each
    # surviving document with every w-token window that already occurred
    # earlier in the corpus removed. None disables (the default).
    span_removal_w: int | None = None
    # Quality-classifier filtering (Brown et al. 2020 §A), applied after
    # dedup like GPT-3's pipeline: score with the trained model
    # (operators/quality_classifier.py) and keep via the deterministic
    # Pareto rule. None disables (the default).
    quality_model: "QualityModel | None" = None
    pareto_alpha: float = 9.0
    pareto_salt: int = 0
    # SemDeDup semantic dedup (Abbas et al. 2023), applied after the
    # text-level near-dedup (the paper runs it on the already-exact-
    # deduped corpus): an embeddings DataFrame keyed by ``id_col``'s
    # values in ``semdedup_id_col``. None disables (the default).
    semdedup_embeddings: DataFrame | None = None
    semdedup_cells: int = 1024
    semdedup_tau: float = 0.95
    semdedup_id_col: str = "vec_id"
    semdedup_vec_col: str = "embedding"
    semdedup_iters: int = 0
    # SEMANTIC decontamination (round 7): drop documents whose embedding
    # is within cosine ``semantic_tau`` of ANY benchmark embedding — the
    # embedding-space complement of the n-gram ``benchmark`` gate,
    # catching paraphrased leakage. Keyed like semdedup: the embeddings
    # frame's ``semdedup_id_col`` values are ``id_col`` values. Runs in
    # the decontamination stage. None disables (the default).
    benchmark_embeddings: DataFrame | None = None
    corpus_embeddings: DataFrame | None = None
    semantic_tau: float = 0.95
    # RefinedWeb-style cross-document LINE dedup (round 7, Penedo et al.
    # 2023 §4.2): drop lines appearing in >= this many distinct docs and
    # rewrite the survivors in order; runs after near-dup dedup with the
    # other rewrite stages. None disables (the default).
    line_dedup_min_docs: int | None = None
    # C4 line/document cleaning (Raffel et al. 2020 §2.2), applied FIRST
    # (C4 cleans pages before any other gate): retain only lines ending
    # in terminal punctuation with >= 5 words and no "javascript"; drop
    # pages with "{", "lorem ipsum", or < 3 sentences. False disables
    # (the default — the gate is vacuous on punctuation-free corpora).
    c4_cleaning: bool = False
    # Streaming decontamination size switch (VERDICT r5 task 3): at or
    # below this many distinct benchmark grams the gram set inlines as a
    # plan literal (optimal small case); above it the grams never enter
    # the plan — a Bloom filter built batch-side rides as ONE broadcast
    # static row (scan-stage getbit probe) and only the bloom-hit
    # trickle is exactly verified against a broadcast gram set.
    stream_bloom_gram_threshold: int = 10_000
    id_col: str = "doc_id"
    text_col: str = "text"
    stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")
    # Audit opt-in: pass an (empty) dict to have curate() record per-stage
    # surviving-row counts into it. None (the default) keeps the pipeline a
    # single lazy plan — no eager counts, no stage re-execution.
    stage_counts: dict | None = None


def quality_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Length + stopword-density heuristics (C4/Gopher-style), scan-stage.

    ``min_tokens <= 0`` disables the length gate entirely (matching the
    other thresholds' `> 0` opt-in convention) — important because
    ``size(split(NULL))`` is -1, so even ``>= 0`` would silently drop
    NULL-text documents the later stages explicitly keep-on-null.
    """
    tokens = F.split(F.lower(F.col(cfg.text_col)), " ")
    n_tokens = F.size(tokens)
    out = docs
    if cfg.min_tokens > 0:
        out = out.filter(n_tokens >= cfg.min_tokens)
    if cfg.min_stopword_ratio > 0:
        stop_arr = F.array(*[F.lit(s) for s in cfg.stopwords])
        n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t)))
        out = out.filter(
            n_stop.cast("double") / n_tokens >= cfg.min_stopword_ratio
        )
    return out


def repetition_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Drop repetition-heavy documents (Gopher §A1.1) — scan-stage."""
    from kinesiscat_spark.operators.curation import (
        repetition_signals,
        top_ngram_char_frac,
    )

    out = docs
    if cfg.max_dup_line_frac > 0:
        dlf = repetition_signals(F.col(cfg.text_col))["dup_line_frac"]
        out = out.filter(F.coalesce(dlf, F.lit(0.0)) <= cfg.max_dup_line_frac)
    if cfg.max_top_ngram_char_frac > 0:
        frac = top_ngram_char_frac(F.col(cfg.text_col), cfg.top_ngram_n)
        out = out.filter(frac <= cfg.max_top_ngram_char_frac)
    return out


def gopher_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Drop documents failing the Gopher §A1.1 quality rules at the
    published thresholds — a pure scan-stage Column predicate (zero
    shuffle; gopher_keep rejects NULL/empty text explicitly)."""
    if not cfg.gopher_rules:
        return docs
    from kinesiscat_spark.operators.curation import (
        GOPHER_STOPWORDS,
        gopher_keep,
        gopher_signals,
    )

    sig = gopher_signals(
        F.col(cfg.text_col), stopwords=cfg.gopher_stopwords or GOPHER_STOPWORDS
    )
    return docs.filter(gopher_keep(sig))


def blocklist_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Drop blocklist-heavy documents (C4 §2.2) — scan-stage; documents
    with no tokens have no hits and are kept."""
    if not cfg.blocklist:
        return docs
    from kinesiscat_spark.operators.curation import blocklist_signals

    frac = blocklist_signals(F.col(cfg.text_col), cfg.blocklist)[
        "list_word_frac"
    ]
    return docs.filter(F.coalesce(frac, F.lit(0.0)) <= cfg.max_blocklist_frac)


def pii_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Apply the PII policy: redact in place or drop matching docs."""
    from kinesiscat_spark.operators.curation import pii_signals, redact_pii

    if cfg.pii_policy == "keep":
        return docs
    if cfg.pii_policy == "redact":
        return docs.withColumn(cfg.text_col, redact_pii(F.col(cfg.text_col)))
    if cfg.pii_policy == "drop":
        p = pii_signals(F.col(cfg.text_col))
        return docs.filter(
            (p["n_emails"] + p["n_ipv4"] + p["n_phones"]) == 0
        )
    raise ValueError(f"unknown pii_policy {cfg.pii_policy!r}")


def decontaminate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Remove documents overlapping the held-out benchmark (broadcast
    anti-join on the contamination report's doc ids)."""
    if cfg.benchmark is None:
        return docs
    from kinesiscat_spark.operators.curation import contamination_report

    dirty = contamination_report(
        docs,
        cfg.benchmark,
        n=cfg.contamination_ngram,
        id_col=cfg.id_col,
        text_col=cfg.text_col,
    ).select(F.col("id").alias(cfg.id_col))
    # No broadcast hint: the dirty-id set is bounded by contamination
    # density, not the benchmark — a heavily contaminated corpus could
    # make it O(n_docs). AQE broadcasts it when actually small.
    return docs.join(dirty, cfg.id_col, "left_anti")


def language_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    if not cfg.keep_langs:
        return docs
    from kinesiscat_spark.operators.text import language_id

    pred, _score = language_id(F.col(cfg.text_col))
    return docs.filter(pred.isin(*cfg.keep_langs))


def exact_dedup(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Keep the lowest-id doc per identical text (sha-256 digest key, so
    only (digest, id) shuffles — never the text)."""
    winners = (
        docs.select(F.sha2(cfg.text_col, 256).alias("_h"), cfg.id_col)
        .groupBy("_h")
        .agg(F.min(cfg.id_col).alias(cfg.id_col))
        .select(cfg.id_col)
    )
    return docs.join(winners, cfg.id_col, "left_semi")


def near_dedup(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    from kinesiscat_spark.operators.clusters import keep_best, keep_canonical
    from kinesiscat_spark.operators.dedup import minhash_lsh_pairs

    if cfg.near_dup_keep not in ("canonical", "best"):
        raise ValueError(f"unknown near_dup_keep {cfg.near_dup_keep!r}")
    pairs = minhash_lsh_pairs(
        docs,
        threshold=cfg.near_dup_threshold,
        n_hashes=cfg.minhash_hashes,
        n_bands=cfg.minhash_bands,
        id_col=cfg.id_col,
        text_col=cfg.text_col,
    )
    if cfg.near_dup_keep == "best":
        return keep_best(
            docs, pairs, cfg.near_dup_score_col, id_col=cfg.id_col
        )
    return keep_canonical(docs, pairs, id_col=cfg.id_col)


def span_removal(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Rewrite the text column with duplicate spans removed (see
    ``curation.remove_duplicate_spans``), preserving every other column
    via a narrow (id, clean_text) join back — the document's OTHER
    columns never ride the span exchange.

    Documents with NOTHING removed keep their ORIGINAL text byte-for-byte
    — the token-rebuilt form collapses whitespace runs/newlines, which is
    inherent to rewriting (and matches the operator's lane contract) but
    must not touch untouched documents (ExactSubstr removal only edits
    what it removes)."""
    from kinesiscat_spark.operators.curation import remove_duplicate_spans

    cleaned = remove_duplicate_spans(
        docs, w=cfg.span_removal_w, id_col=cfg.id_col, text_col=cfg.text_col
    ).select(
        F.col("id").alias(cfg.id_col),
        "n_removed",
        F.col("clean_text").alias("_clean"),
    )
    return (
        docs.join(cleaned, cfg.id_col)
        .withColumn(
            cfg.text_col,
            F.when(F.col("n_removed") > 0, F.col("_clean")).otherwise(
                F.col(cfg.text_col)
            ),
        )
        .drop("n_removed", "_clean")
    )


def curate(
    docs: DataFrame,
    cfg: CurationConfig | None = None,
    _frames: list[tuple[str, DataFrame]] | None = None,
) -> DataFrame:
    """Run the full curation pipeline.

    By default the stages compose lazily into ONE plan — no job runs until
    the caller acts on the result. Auditing is opt-in: pass a cfg with
    ``stage_counts={}`` and per-stage surviving-row counts are recorded in
    it (each count materializes its stage; exchange-bearing stages are
    lazily checkpointed first so their subtrees run once, but scan-stage
    prefixes still re-execute per count — never audit in production plans;
    the one-job alternative is ``attrition_report``). ``_frames`` is the
    internal lazy-stage tap that report uses.
    """
    cfg = cfg or CurationConfig()
    audit = cfg.stage_counts is not None

    def step(name: str, df: DataFrame, barrier: bool = False) -> DataFrame:
        # `barrier` marks a stage whose subtree contains an exchange
        # (aggregate/join) — declared AT the stage call site so a renamed
        # or new shuffle-bearing stage can't silently lose its
        # checkpoint. In report/audit mode every LATER stage's count
        # would re-execute those subtrees, so attach the lazy
        # localCheckpoint FIRST (the audit count then reads through it —
        # one materialization, not two). The production path (no audit,
        # no frames tap) stays one pure-lazy plan.
        if barrier and (_frames is not None or audit):
            df = df.localCheckpoint(eager=False)
        if audit:
            cfg.stage_counts[name] = df.count()
        if _frames is not None:
            _frames.append((name, df))
        return df

    out = step("input", docs)
    if cfg.c4_cleaning:
        from kinesiscat_spark.operators.curation import c4_clean

        out = step("c4", c4_clean(out, cfg.text_col))
    out = step("quality", quality_gate(out, cfg))
    out = step("repetition", repetition_gate(out, cfg))
    out = step("gopher", gopher_gate(out, cfg))
    out = step("blocklist", blocklist_gate(out, cfg))
    out = step("language", language_gate(out, cfg))
    out = step("pii", pii_gate(out, cfg))
    out = step("decontaminate", decontaminate(out, cfg), barrier=True)
    if cfg.benchmark_embeddings is not None:
        from kinesiscat_spark.operators.curation import (
            semantic_contamination_report,
        )

        if cfg.corpus_embeddings is None:
            raise ValueError(
                "benchmark_embeddings needs corpus_embeddings (the corpus "
                "side of the cosine check, keyed like semdedup)"
            )
        flagged = semantic_contamination_report(
            cfg.corpus_embeddings,
            cfg.benchmark_embeddings,
            tau=cfg.semantic_tau,
            corpus_id=cfg.semdedup_id_col,
            bench_id=cfg.semdedup_id_col,
            vec=cfg.semdedup_vec_col,
        ).select(F.col("id").alias(cfg.id_col))
        # flagged ids are bounded by benchmark-similarity density, not
        # the corpus — unhinted anti-join, AQE broadcasts when small
        out = step(
            "semantic_decontaminate",
            out.join(flagged, cfg.id_col, "left_anti"),
            barrier=True,
        )
    out = step("exact_dedup", exact_dedup(out, cfg), barrier=True)
    out = step("near_dedup", near_dedup(out, cfg), barrier=True)
    if cfg.semdedup_embeddings is not None:
        from kinesiscat_spark.operators.semdedup import semdedup_keep

        out = step(
            "semantic_dedup",
            semdedup_keep(
                out,
                cfg.semdedup_embeddings,
                n_cells=cfg.semdedup_cells,
                tau=cfg.semdedup_tau,
                doc_id=cfg.id_col,
                emb_id=cfg.semdedup_id_col,
                vec=cfg.semdedup_vec_col,
                n_iters=cfg.semdedup_iters,
            ),
            barrier=True,
        )
    if cfg.line_dedup_min_docs is not None:
        from kinesiscat_spark.operators.curation import (
            dedup_lines_across_docs,
        )

        rewritten = dedup_lines_across_docs(
            out,
            min_docs=cfg.line_dedup_min_docs,
            id_col=cfg.id_col,
            text_col=cfg.text_col,
        ).select(F.col("id").alias(cfg.id_col), "clean_text")
        out = step(
            "line_dedup",
            out.join(rewritten, cfg.id_col).withColumn(
                cfg.text_col, F.col("clean_text")
            ).drop("clean_text"),
            barrier=True,
        )
    if cfg.span_removal_w:
        out = step("span_removal", span_removal(out, cfg))
    if cfg.quality_model is not None:
        from kinesiscat_spark.operators.quality_classifier import (
            pareto_keep,
            score_documents_quality,
        )

        scored = score_documents_quality(
            out, cfg.quality_model, cfg.text_col, out_col="_q"
        )
        # NULL-text policy (explicit, not a NULL-filter side effect): a
        # NULL text scores NULL (pinned in test_score_null_text) and a
        # bare filter would silently drop it.  Keep-on-null, matching
        # blocklist_gate's explicit keep-on-null and semdedup's "must
        # not drop what it cannot compare" principle — gates earlier in
        # the pipeline own the decision about NULL/empty documents.
        out = step(
            "classifier",
            scored.filter(
                F.coalesce(
                    pareto_keep(
                        F.col("_q"),
                        F.col(cfg.id_col),
                        cfg.pareto_alpha,
                        cfg.pareto_salt,
                    ),
                    F.lit(True),
                )
            ).drop("_q"),
        )
    if cfg.sample_fraction < 1.0:
        from kinesiscat_spark.operators.sampling import hash_sample

        out = step(
            "sample",
            hash_sample(
                out,
                cfg.sample_fraction,
                [cfg.id_col],
                cfg.sample_salt,
                method=cfg.sample_method,
            ),
        )
    return out


def attrition_report(
    docs: DataFrame, cfg: CurationConfig | None = None
) -> DataFrame:
    """Per-stage attrition of the curation pipeline — (stage, stage_idx,
    n_docs) for every stage ``curate`` composes under this config, in
    pipeline order: the observability card that says where documents die
    (a quality gate eating 60% of a new crawl is a bug you want to see
    before training, not after).

    One LAZY plan: each stage's surviving-row count is a 1-row aggregate
    over that stage's frame, unioned — a single Spark action computes the
    whole funnel, with shared stage prefixes deduplicated by exchange
    reuse (unlike ``cfg.stage_counts`` auditing, which runs one job per
    stage). Counts are exact integers, so the report is engine-exact.
    """
    frames: list[tuple[str, DataFrame]] = []
    curate(docs, cfg, _frames=frames)
    parts = [
        df.agg(F.count("*").alias("n_docs")).select(
            F.lit(name).alias("stage"),
            F.lit(i).cast("long").alias("stage_idx"),
            "n_docs",
        )
        for i, (name, df) in enumerate(frames)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def decontaminate_scan_stage(
    docs: DataFrame, benchmark_grams: list[str], n: int, text_col: str = "text"
) -> DataFrame:
    """Streaming-safe decontamination: drop documents sharing any word
    n-gram with the (small, driver-collected) benchmark gram set, as a
    pure scan-stage predicate — ``arrays_overlap`` against a literal
    array. Unlike ``contamination_report`` (aggregate + anti-join, fine
    in batch), this shape is legal inside a streaming plan and pushes to
    the scan. Right for SMALL gram sets only: above
    ``CurationConfig.stream_bloom_gram_threshold``, ``curate_stream``
    switches to :func:`decontaminate_scan_stage_bloom`, which keeps the
    gram set out of the plan entirely (round 6)."""
    from kinesiscat_spark.operators.curation import word_ngrams

    if not benchmark_grams:
        return docs
    bench_arr = F.array(*[F.lit(g) for g in benchmark_grams])
    return docs.filter(
        ~F.arrays_overlap(word_ngrams(F.col(text_col), n), bench_arr)
    )


def decontaminate_scan_stage_bloom(
    docs: DataFrame,
    gram_df: DataFrame,
    n: int,
    text_col: str = "text",
    n_bits: int | None = None,
    k: int = 5,
) -> DataFrame:
    """Large-benchmark streaming decontamination (VERDICT r5 task 3):
    the benchmark grams never enter the plan.

    - The Bloom bits build BATCH-side (``bloom_build`` — distributed
      bit_or aggregation) and ride into the stream as ONE static row via
      a broadcast stream-static join, so the probe
      (``bloom_might_contain`` — pure getbit Column math) evaluates in
      the scan stage of every micro-batch with no plan literal and no
      driver round-trip for the bits.
    - Only the bloom-SURVIVING trickle (true hits + FPR false positives,
      ~1% of clean docs at the 10-bits/elem default) reaches the exact
      verify: an Arrow-batched membership probe against a torrent-
      broadcast frozen gram set.  No false negatives (Bloom never
      under-reports), and the verify kills every false positive, so the
      kept set is IDENTICAL to the exact ``arrays_overlap`` path —
      ``tests/test_curate_stream.py`` pins the doc-for-doc equality.

    Residual driver cost: one copy of the gram set for the broadcast
    variable — bounded by the BENCHMARK size (never the corpus), shipped
    once per executor instead of per-plan like the literal form.  NULL
    text drops in both paths (the ``arrays_overlap`` twin's NULL
    semantics), keeping the switch behavior-invisible.
    """
    from kinesiscat_spark.operators.bloom import (
        K_DEFAULT,
        N_BITS_DEFAULT,
        bloom_build,
        bloom_might_contain,
    )
    from kinesiscat_spark.operators.curation import word_ngrams

    n_bits = n_bits or N_BITS_DEFAULT
    k = k or K_DEFAULT
    bits = bloom_build(gram_df, "g", n_bits, k)
    spark = docs.sparkSession
    bset = spark.sparkContext.broadcast(
        frozenset(r.g for r in gram_df.collect())
    )

    hits_col = F.filter(
        F.array_distinct(word_ngrams(F.col(text_col), n)),
        lambda g: bloom_might_contain(F.col("bloom"), g, n_bits, k),
    )
    tagged = (
        docs.crossJoin(F.broadcast(bits))
        .withColumn("_bh", hits_col)
        .drop("bloom")
    )
    clean = tagged.filter(F.size("_bh") == 0).drop("_bh")
    # branch-then-union: only the suspect rows reach the Arrow verify.
    # The verify is a mapInPandas PLAN NODE, not a UDF inside a Filter
    # expression — a UDF-bearing Filter can be pushed below the
    # streaming stateful exchange where Spark cannot evaluate PythonUDF
    # (INTERNAL_ERROR: Cannot evaluate expression), while a map node is
    # structurally un-pushable.
    suspect = tagged.filter(F.size("_bh") > 0)
    out_schema = clean.schema

    def _verify(batches):
        s = bset.value
        for pdf in batches:
            mask = pdf["_bh"].apply(
                lambda arr: not any(g in s for g in arr)
            )
            yield pdf.loc[mask, [f.name for f in out_schema.fields]]

    verified = suspect.mapInPandas(_verify, out_schema)
    return clean.unionByName(verified)


def curate_stream(stream_docs: DataFrame, cfg: CurationConfig | None = None) -> DataFrame:
    """Streaming form of ``curate()``: the ingest-time curation a pipeline
    runs as documents ARRIVE, rather than over a finished corpus.

    - The stateless gates (quality, repetition, language, PII policy)
      apply unchanged — they are scan-stage Column predicates.
    - Decontamination: small benchmarks run the scan-stage
      ``arrays_overlap`` literal form; above
      ``cfg.stream_bloom_gram_threshold`` grams, the Bloom path — bits
      built batch-side and broadcast as one static row, scan-stage
      getbit probe, exact verify on the bloom-hit trickle only — keeps
      the plan gram-free (round 6, VERDICT r5 task 3).
    - Exact dedup becomes STREAMING first-seen dedup keyed on the sha-256
      text digest (``streaming/stateful.py dedup_first_seen`` — state in
      the checkpoint, survives restarts). Within one micro-batch the
      winner is the lowest id (= batch ``exact_dedup`` on a single-batch
      drain, which tests/test_pipelines.py pins); across batches it is
      the earliest ARRIVAL — the streaming notion of "first".
    - Near-dup detection runs as the separate candidate stream
      (``streaming_minhash_candidates``); cluster resolution over the
      accumulated pairs is a periodic batch job (`keep_canonical`), as in
      every production ingest design — an unbounded transitive closure is
      not a single-pass streaming operator.
    - Sampling stays the content-hash filter — partition- and
      batch-invariant by construction.

    Returns the curated streaming DataFrame (id, text, and the upstream
    columns named in the output schema below).
    """
    from pyspark.sql import types as T

    from kinesiscat_spark.operators.curation import word_ngrams  # noqa: F401
    from kinesiscat_spark.operators.sampling import hash_sample
    from kinesiscat_spark.streaming.stateful import dedup_first_seen

    cfg = cfg or CurationConfig()
    out = quality_gate(stream_docs, cfg)
    out = repetition_gate(out, cfg)
    out = gopher_gate(out, cfg)
    out = blocklist_gate(out, cfg)
    out = language_gate(out, cfg)
    out = pii_gate(out, cfg)
    if cfg.benchmark is not None:
        gram_df = (
            cfg.benchmark.select(
                F.explode(
                    F.array_distinct(
                        word_ngrams(F.col(cfg.text_col), cfg.contamination_ngram)
                    )
                ).alias("g")
            )
            .distinct()
        )
        # pinned size switch (stream_bloom_gram_threshold): small
        # benchmarks inline as a literal (optimal); large ones go through
        # the Bloom prefilter + survivors-only exact verify so the plan
        # never carries the gram set (see decontaminate_scan_stage_bloom)
        if gram_df.count() <= cfg.stream_bloom_gram_threshold:
            grams = [r.g for r in gram_df.collect()]
            out = decontaminate_scan_stage(
                out, grams, cfg.contamination_ngram, cfg.text_col
            )
        else:
            out = decontaminate_scan_stage_bloom(
                out, gram_df, cfg.contamination_ngram, cfg.text_col
            )
    # streaming exact dedup: first-seen per content digest. The output
    # schema is DERIVED from the stream's own schema, so any id/text
    if cfg.benchmark_embeddings is not None:
        # SEMANTIC decontamination, batch/stream parity (round 7): the
        # flagged-id frame is computed BATCH-side (embeddings are static)
        # and anti-joined stream-static — supported append-mode join, no
        # state. Same stage as curate() above.
        from kinesiscat_spark.operators.curation import (
            semantic_contamination_report,
        )

        if cfg.corpus_embeddings is None:
            raise ValueError(
                "benchmark_embeddings needs corpus_embeddings (the corpus "
                "side of the cosine check, keyed like semdedup)"
            )
        flagged = semantic_contamination_report(
            cfg.corpus_embeddings,
            cfg.benchmark_embeddings,
            tau=cfg.semantic_tau,
            corpus_id=cfg.semdedup_id_col,
            bench_id=cfg.semdedup_id_col,
            vec=cfg.semdedup_vec_col,
        ).select(F.col("id").alias(cfg.id_col))
        out = out.join(flagged, cfg.id_col, "left_anti")
    # column types the batch pipeline accepts work here too (a hardcoded
    # LongType id would crash applyInPandasWithState on string ids).
    keyed = out.withColumn("_h", F.sha2(F.col(cfg.text_col), 256)).select(
        "_h", cfg.id_col, cfg.text_col
    )
    deduped = dedup_first_seen(
        keyed,
        keys=["_h"],
        order_col=cfg.id_col,
        output_schema=T.StructType(keyed.schema.fields),
    ).drop("_h")
    if cfg.quality_model is not None:
        from kinesiscat_spark.operators.quality_classifier import (
            pareto_keep,
            score_documents_quality,
        )

        # streaming-safe: the weight row rides as a literal array (see
        # score_documents_quality), so this stays a scan-stage filter.
        # Keep-on-null coalesce EXACTLY as in batch curate() above — a
        # NULL text scores NULL, and without the coalesce the stream
        # would silently drop a doc the batch pipeline keeps
        # (batch/stream parity, VERDICT r6 #3).
        deduped = score_documents_quality(
            deduped, cfg.quality_model, cfg.text_col, out_col="_q"
        ).filter(
            F.coalesce(
                pareto_keep(
                    F.col("_q"), F.col(cfg.id_col), cfg.pareto_alpha,
                    cfg.pareto_salt,
                ),
                F.lit(True),
            )
        ).drop("_q")
    if cfg.sample_fraction < 1.0:
        deduped = hash_sample(
            deduped,
            cfg.sample_fraction,
            [cfg.id_col],
            cfg.sample_salt,
            method=cfg.sample_method,
        )
    return deduped
