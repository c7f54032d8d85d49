"""Scaling probe: do the headline operators scale ~linearly with input size?

Synthesizes N× copies of the sf0.1 `documents` / `embeddings` / `events`
tables (ids shifted per copy so keys stay unique; text salted per copy so
near-dup cluster sizes stay CONSTANT instead of growing N× — growing
clusters would make candidate-pair counts super-linear by construction,
which measures the data, not the plan) into /tmp, then times each operator
at 1× and N× and reports the ratio against the ideal N.

This is the local stand-in for the 100 TB question: a ratio far above N
means a super-linear plan (all-pairs blow-up, driver collect, skew) that
would not survive scale-up. The all-pairs embedding verify stage is
EXPECTED to be ~N²; it is annotated as such.

    python tools/scale_probe.py [N]           # default 4
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def synth(spark, n_copies: int) -> str:
    """N× tables under a temp dir; per-copy id shift + text salt."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix=f"kc_scale_x{n_copies}_")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_docs = docs.count()
    n_emb = emb.count()
    copies = []
    for c in range(n_copies):
        copies.append(
            docs.select(
                (F.col("doc_id") + c * n_docs).alias("doc_id"),
                # Suffix EVERY token with the copy id: all shingles/tokens
                # become copy-local (no cross-copy candidates at any level
                # — shingle, simhash band, minhash band), while every
                # within-copy relationship is preserved exactly, so dup
                # CLUSTER SIZES stay constant as N grows. A suffix only at
                # the document tail leaves ~all shingles shared across
                # copies and silently turns the corpus into N×-sized
                # clusters — measuring the data, not the plan.
                F.regexp_replace("text", r"(\S+)", f"$1c{c}").alias("text"),
                *[col for col in docs.columns if col not in ("doc_id", "text")],
            )
        )
    big_docs = copies[0]
    for c in copies[1:]:
        big_docs = big_docs.unionByName(c)
    big_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    ecopies = []
    for c in range(n_copies):
        ecopies.append(
            emb.select(
                (F.col("vec_id") + c * n_emb).alias("vec_id"),
                # rotate one dimension's sign per copy so cross-copy cosine
                # pairs don't all collapse into near-dups
                F.transform(
                    "embedding",
                    lambda x, i: F.when(i == c % 64, -x).otherwise(x),
                ).alias("embedding"),
                "label",
            )
        )
    big_emb = ecopies[0]
    for c in ecopies[1:]:
        big_emb = big_emb.unionByName(c)
    big_emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # events: shift user/event ids per copy, keep timestamps — every copy
    # carries the SAME per-user temporal structure, so funnel/retention
    # row counts scale exactly with N while per-user work stays constant.
    # (load_table handles the TIMESTAMP(NANOS) source; the copy we write
    # is plain microseconds, which the probes read directly.)
    from kinesiscat_spark.io_tables import load_table

    ev = load_table(spark, BASE, "events")
    vcopies = []
    for c in range(n_copies):
        vcopies.append(
            ev.select(
                (F.col("event_id") + c * 100_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + c * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    big_ev = vcopies[0]
    for c in vcopies[1:]:
        big_ev = big_ev.unionByName(c)
    big_ev.write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def probes():
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators import dedup, text

    def p_exact(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return (
            docs.select(F.sha2("text", 256).alias("h"), "doc_id")
            .groupBy("h")
            .agg(F.min("doc_id"))
            .count()
        )

    def p_minhash(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dedup.minhash_lsh_pairs(docs, 0.5, 32, 8).count()

    def p_simhash(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dedup.simhash_pairs(docs, 3).count()

    def p_jaccard(spark, d):
        # round 7: probes the documented 100 TB configuration — the
        # df-capped index (max_shingle_df prunes boilerplate postings
        # from candidate generation; verify stays exact, see
        # ngram_jaccard_pairs). The exact path is p_jaccard_exact.
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dedup.ngram_jaccard_pairs(docs, 0.4, max_shingle_df=30).count()

    def p_jaccard_exact(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dedup.ngram_jaccard_pairs(docs, 0.4).count()

    def p_containment(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dedup.ngram_containment_pairs(docs, 0.6).count()

    def p_fingerprint(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return docs.select(
            "doc_id",
            F.explode(text.winnow_fingerprints_udf()(F.col("text"))).alias("fp"),
        ).count()

    def p_embedding_allpairs(spark, d):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return dedup.embedding_near_dup_pairs(emb, 0.4).count()

    def p_cluster_resolve(spark, d):
        from kinesiscat_spark.operators.clusters import keep_canonical

        docs = spark.read.parquet(f"{d}/documents.parquet")
        pairs = dedup.minhash_lsh_pairs(docs, 0.5, 32, 8)
        return keep_canonical(docs, pairs).count()

    def p_repetition(spark, d):
        from kinesiscat_spark.operators import curation

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return docs.select(
            curation.repetition_signals(F.col("text")).alias("s"),
            curation.top_ngram_char_frac(F.col("text"), 2).alias("t2"),
            curation.pii_signals(F.col("text")).alias("p"),
        ).count()

    def p_span_dup(spark, d):
        from kinesiscat_spark.operators import curation

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return curation.span_dup_frac(docs, n=6).count()

    def p_span_remove(spark, d):
        from kinesiscat_spark.operators import curation

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return curation.remove_duplicate_spans(docs, w=6).count()

    def p_decontaminate(spark, d):
        from kinesiscat_spark.operators import curation

        docs = spark.read.parquet(f"{d}/documents.parquet")
        # fixed-size benchmark (286 copy-0 docs — ids below the base-table
        # size survive every copy shift), like a real test set: the corpus
        # grows, the broadcast side does not
        bench = docs.filter(
            (F.col("doc_id") < 2000) & (F.col("doc_id") % 7 == 0)
        ).select(
            F.array_join(
                F.slice(F.split(F.trim("text"), r"\s+"), 3, 12), " "
            ).alias("text")
        )
        return curation.contamination_report(docs, bench, n=5).count()

    def p_bloom_decontaminate(spark, d):
        from kinesiscat_spark.operators import curation

        docs = spark.read.parquet(f"{d}/documents.parquet")
        bench = docs.filter(
            (F.col("doc_id") < 2000) & (F.col("doc_id") % 7 == 0)
        ).select(
            F.array_join(
                F.slice(F.split(F.trim("text"), r"\s+"), 3, 12), " "
            ).alias("text")
        )
        return curation.contamination_report(
            docs,
            bench,
            n=5,
            broadcast_benchmark=False,
            bloom_bits=1 << 18,
        ).count()

    def p_quality_classifier(spark, d):
        from kinesiscat_spark.operators.quality_classifier import (
            score_documents_quality,
            train_quality_classifier,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{d}/documents.parquet")
        labeled = docs.select(
            "text", (F.col("lang") == "en").cast("int").alias("label")
        )
        model = train_quality_classifier(labeled, n_iter=3)
        return score_documents_quality(docs, model).count()

    def p_bpe_train(spark, d):
        from kinesiscat_spark.operators.bpe import train_bpe_detailed

        docs = spark.read.parquet(f"{d}/documents.parquet")
        # per-copy token salting grows the DISTINCT-WORD table ~N×, which
        # is exactly the dimension training cost should follow
        return len(train_bpe_detailed(docs, 4))

    def p_packing(spark, d):
        from kinesiscat_spark.operators.packing import pack_sequences

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return pack_sequences(docs, budget=512, n_shards=64).count()

    def p_token_budget(spark, d):
        from kinesiscat_spark.operators.sampling import token_budget_sample

        docs = spark.read.parquet(f"{d}/documents.parquet")
        # half the corpus's tokens: the boundary bucket stays mid-range
        budget = docs.select(
            F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        ).collect()[0][0] // 2
        return token_budget_sample(docs, budget).count()

    def p_pq_adc(spark, d):
        from kinesiscat_spark.operators.quantize import pq_adc_topk
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        corpus = emb.filter(F.col("vec_id") >= 5)
        return pq_adc_topk(corpus, queries, 10, m=8, ks=16).count()

    def p_bm25(spark, d):
        from kinesiscat_spark.operators.text import bm25_topk

        docs = spark.read.parquet(f"{d}/documents.parquet")
        # query the corpus's own 3 most frequent words (the synth copies
        # salt every token, so fixed literals would match nothing at N×
        # and the probe would time a degenerate no-hit query)
        terms = tuple(
            r.t
            for r in docs.select(
                F.explode(F.split(F.lower("text"), " ")).alias("t")
            )
            .groupBy("t")
            .count()
            .orderBy(F.desc("count"), "t")
            .limit(3)
            .collect()
        )
        return bm25_topk(docs, terms, k=25).count()

    def p_pca(spark, d):
        from kinesiscat_spark.operators.pca import pca_project, pca_train

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        model = pca_train(emb, 16)
        return float(
            pca_project(emb, model).select(F.sum(F.col("pca")[0])).first()[0]
        )

    def p_semdedup(spark, d):
        from kinesiscat_spark.operators.semdedup import semdedup

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        # n_cells grows with the corpus (the SemDeDup design point: size
        # k so n/k stays constant) — with fixed cells the per-cell
        # quadratic stage would grow N² by construction, measuring the
        # parameter choice, not the plan
        n_cells = max(16, emb.count() // 30)
        # round 7: the 100 TB assign (BLAS rank + exact top-8 re-rank,
        # differentially equal to 'exact' — test_semdedup.py); the n·k
        # exact fold is p_semdedup_exact.
        return (
            semdedup(emb, n_cells=n_cells, tau=0.3, assign="blas")
            .filter("kept")
            .count()
        )

    def p_semdedup_exact(spark, d):
        from kinesiscat_spark.operators.semdedup import semdedup

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n_cells = max(16, emb.count() // 30)
        return semdedup(emb, n_cells=n_cells, tau=0.3).filter("kept").count()

    def p_dedup_against(spark, d):
        from pyspark.sql import functions as F

        from kinesiscat_spark.operators.dedup import dedup_against

        docs = spark.read.parquet(f"{d}/documents.parquet")
        new = docs.filter(F.col("doc_id") % 2 == 1)
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        return dedup_against(new, corpus, near_threshold=0.5).count()

    def p_heavy_ngrams(spark, d):
        from kinesiscat_spark.operators.curation import word_ngrams
        from kinesiscat_spark.operators.sketches import heavy_hitters

        docs = spark.read.parquet(f"{d}/documents.parquet")
        grams = docs.select(
            F.explode(word_ngrams(F.col("text"), 2)).alias("gram")
        )
        # per-copy token salting keeps every copy's gram counts equal to
        # the 1x counts, so a fixed threshold yields N x as many heavy
        # hitters — the linear dimension the sketch path should follow
        return heavy_hitters(grams, "gram", min_count=30).count()

    def p_hll_distinct(spark, d):
        from kinesiscat_spark.operators.curation import word_ngrams
        from kinesiscat_spark.operators.sketches import hll_distinct

        docs = spark.read.parquet(f"{d}/documents.parquet")
        grams = docs.select(
            F.explode(word_ngrams(F.col("text"), 2)).alias("gram")
        )
        return float(hll_distinct(grams, "gram").collect()[0].est)

    def p_temperature_mix(spark, d):
        from kinesiscat_spark.operators.sampling import mix_corpora_temperature

        docs = spark.read.parquet(f"{d}/documents.parquet")
        en = docs.filter(F.col("lang") == "en")
        rest = docs.filter(F.col("lang") != "en")
        # budget scales with the corpus so the boundary bucket stays
        # mid-range at every N (the token_budget_sample probe discipline)
        total = int(docs.count()) * 10
        return mix_corpora_temperature([en, rest], total, alpha=0.5).count()

    def p_c4(spark, d):
        from kinesiscat_spark.operators.curation import c4_signals

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return docs.select(
            F.sum(c4_signals(F.col("text"))["clean_chars"])
        ).first()[0] or 0

    def p_gopher(spark, d):
        from kinesiscat_spark.operators.curation import (
            gopher_keep,
            gopher_signals,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        sig = gopher_signals(F.col("text"), stopwords=("the", "a"))
        return docs.filter(gopher_keep(sig)).count()

    def p_ppl_buckets(spark, d):
        from kinesiscat_spark.operators.text import (
            perplexity_buckets,
            score_documents,
            unigram_model,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        model = unigram_model(docs.filter(F.col("lang") == "en"))
        scored = score_documents(docs, model)
        # thresholds method — the 100 TB path (approx_percentile pass +
        # scan-stage CASE); the rank twin's global sort is the lane path
        return (
            perplexity_buckets(scored, method="thresholds")
            .groupBy("ppl_bucket")
            .count()
            .count()
        )

    def p_split_leakage(spark, d):
        from kinesiscat_spark.operators.sampling import (
            hash_split,
            split_leakage_report,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        split_docs = hash_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1},
            key_cols=["doc_id"], salt=11, method="md5",
        )
        return split_leakage_report(split_docs).count()

    def p_corpus_sim(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dedup.corpus_minhash_similarity(docs, n_hashes=64).count()

    def p_zipf(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return text.zipf_fit(docs, top_n=512).count()

    def p_prototype_prune(spark, d):
        from kinesiscat_spark.operators.sampling import prototype_prune
        from kinesiscat_spark.queries.prototypes import PROTOTYPES

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return prototype_prune(emb, PROTOTYPES, keep_per_cell=64).count()

    def p_funnel(spark, d):
        from kinesiscat_spark.operators.funnel import funnel_report

        ev = spark.read.parquet(f"{d}/events.parquet")
        return funnel_report(
            ev, ("view", "click", "purchase"), 200_000 * 1_000_000
        ).count()

    def p_retention(spark, d):
        from kinesiscat_spark.operators.funnel import retention_report

        ev = spark.read.parquet(f"{d}/events.parquet")
        return retention_report(
            ev, (1, 7, 14), activity_type="purchase"
        ).count()

    def p_kn_lm(spark, d):
        from kinesiscat_spark.operators.text import (
            kneser_ney_model,
            score_documents_kn,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        model = kneser_ney_model(docs.filter(F.col("lang") == "en"))
        return score_documents_kn(docs, model).count()

    def p_unimax(spark, d):
        from kinesiscat_spark.operators.sampling import mix_corpora_unimax

        docs = spark.read.parquet(f"{d}/documents.parquet")
        en = docs.filter(F.col("lang") == "en")
        rest = docs.filter(F.col("lang") != "en")
        return mix_corpora_unimax(
            [en, rest], 240_000, max_epochs=1.0, salt=29
        ).count()

    def p_pmi(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return text.pmi_collocations(docs, min_count=5, top_k=10).count()

    def p_pagerank(spark, d):
        from kinesiscat_spark.operators.clusters import pagerank

        docs = spark.read.parquet(f"{d}/documents.parquet")
        edges = dedup.ngram_jaccard_pairs(docs, 0.4)
        return pagerank(edges, n_iters=4, weight_col="jaccard").count()

    def p_token_entropy(spark, d):
        from kinesiscat_spark.operators.curation import token_entropy

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return (
            docs.select(token_entropy(F.col("text")).alias("h"))
            .agg(F.sum("h"))
            .count()
        )

    def p_reservoir(spark, d):
        from kinesiscat_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        w = docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))),
                            r"\s+"),
                    lambda t: F.length(t) > 0,
                )
            ).cast("long").alias("n_tokens"),
        )
        return weighted_reservoir_sample(w, 64, "n_tokens", salt=31).count()

    def p_rm3(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        # corpus-derived terms: the synth copies salt every token (see
        # p_bm25), so fixed literals would match nothing at N×
        terms = tuple(
            r.t
            for r in docs.select(
                F.explode(F.split(F.lower("text"), " ")).alias("t")
            )
            .groupBy("t")
            .count()
            .orderBy(F.desc("count"), "t")
            .limit(3)
            .collect()
        )
        return text.rm3_topk(
            docs, terms, 25, fb_docs=10, fb_terms=5
        ).count()

    def p_fim(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return text.fim_transform(docs, rate=0.5, salt=41).filter(
            "applied"
        ).count()

    def p_corpus_card(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return text.corpus_card(docs).count()

    def p_calibration(spark, d):
        from kinesiscat_spark.operators.quality_classifier import (
            calibration_report,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        scored = docs.select(
            "doc_id",
            (F.col("lang") == "en").cast("double").alias("y"),
            F.length("text").cast("double").alias("margin"),
        )
        return calibration_report(scored, n_bins=10).count()

    def p_triplets(spark, d):
        from kinesiscat_spark.operators.similarity import semi_hard_triplets

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        corpus = emb.filter(F.col("vec_id") >= 5)
        return semi_hard_triplets(corpus, queries, n_candidates=10).count()

    def p_pack_eff(spark, d):
        from kinesiscat_spark.operators.packing import (
            packing_efficiency_report,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return packing_efficiency_report(docs, (128, 512, 2048)).count()

    def p_gap_pctl(spark, d):
        from kinesiscat_spark.operators.funnel import (
            inter_event_gap_percentiles,
        )

        ev = spark.read.parquet(f"{d}/events.parquet").select(
            "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
        )
        return inter_event_gap_percentiles(ev, method="exact").count()

    def p_gap_pctl_approx(spark, d):
        from kinesiscat_spark.operators.funnel import (
            inter_event_gap_percentiles,
        )

        ev = spark.read.parquet(f"{d}/events.parquet").select(
            "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
        )
        return inter_event_gap_percentiles(ev, method="approx").count()

    def p_doremi(spark, d):
        from kinesiscat_spark.operators.sampling import doremi_domain_weights

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return doremi_domain_weights(docs).count()

    def p_attrition(spark, d):
        from kinesiscat_spark.pipelines import CurationConfig, attrition_report

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return attrition_report(docs, CurationConfig(min_tokens=3)).count()

    def p_mmr(spark, d):
        from kinesiscat_spark.operators.similarity import mmr_rerank

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        corpus = emb.filter(F.col("vec_id") >= 5)
        return mmr_rerank(corpus, queries, k=5, n_candidates=16).count()

    def p_src_overlap(spark, d):
        from kinesiscat_spark.operators.dedup import (
            duplication_overlap_report,
            minhash_lsh_pairs,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        pairs = minhash_lsh_pairs(docs, 0.5, 32, 8)
        return duplication_overlap_report(pairs, docs).count()

    return {
        "dedup_exact": (p_exact, "linear"),
        "pca_train_project": (p_pca, "linear (1-pass Gram partials + scan projection)"),
        "c4_signals": (p_c4, "linear (scan-stage line filter)"),
        "minhash_lsh": (p_minhash, "linear+dup-density"),
        "simhash": (p_simhash, "linear+dup-density"),
        "ngram_jaccard": (p_jaccard, "linear+dup-density (df-capped index)"),
        "ngram_jaccard_exact": (p_jaccard_exact, "linear+dup-density"),
        "ngram_containment": (p_containment, "linear+dup-density (one-sided prefix index)"),
        "winnow_fingerprint": (p_fingerprint, "linear"),
        "cluster_resolve": (p_cluster_resolve, "linear+dup-density (iterative CC)"),
        "embedding_allpairs": (p_embedding_allpairs, "QUADRATIC by design"),
        "semdedup": (p_semdedup, "linear (cells sized with corpus; BLAS+top-8 exact re-rank assign)"),
        "semdedup_exact": (p_semdedup_exact, "n·k exact fold assign (superlinear by construction as k grows with n)"),
        "heavy_ngrams": (p_heavy_ngrams, "linear (d*w sketch exchange + survivor-only count)"),
        "dedup_against": (p_dedup_against, "linear+dup-density (digest anti + asymmetric band join)"),
        "repetition_pii_signals": (p_repetition, "linear (scan-stage)"),
        "span_dup_frac": (p_span_dup, "linear (one span exchange)"),
        "span_remove": (p_span_remove, "linear (hash exchange + narrow join)"),
        "decontaminate": (p_decontaminate, "linear (one pass, broadcast bench)"),
        "bloom_decontaminate": (p_bloom_decontaminate, "linear (bloom prefilter + FPR-sized verify join)"),
        "bpe_train": (p_bpe_train, "linear in distinct words (4 merges)"),
        "quality_classifier": (p_quality_classifier, "linear (3 GD iters + scan-stage scoring)"),
        "packing": (p_packing, "linear (one shard-window exchange)"),
        "bm25_topk": (p_bm25, "linear (scan + 1-row stats + TakeOrdered)"),
        "pq_adc_topk": (p_pq_adc, "linear (codes scan + LUT broadcast)"),
        "token_budget_sample": (p_token_budget, "linear (bucket totals + 1-bucket cumsum)"),
        "hll_distinct": (p_hll_distinct, "linear (2^p register exchange)"),
        "temperature_mix": (p_temperature_mix, "linear (per-source counts + bucket plans)"),
        "gopher_rules": (p_gopher, "linear (scan-stage)"),
        "ppl_buckets": (p_ppl_buckets, "linear (LM score pass + t-digest pass + scan CASE)"),
        "split_leakage": (p_split_leakage, "linear+dup-density (minhash pairs + narrow split joins)"),
        "corpus_minhash_sim": (p_corpus_sim, "linear (group-bounded minima exchange)"),
        "zipf_fit": (p_zipf, "linear (vocab count + one rank window over vocab)"),
        "prototype_prune": (p_prototype_prune, "linear (literal-prototype scan assign + k-cell window)"),
        "unimax_mix": (p_unimax, "linear (per-source counts + bucket plans)"),
        "kn_lm": (p_kn_lm, "linear (pair counts + size-switched model joins + per-doc fold)"),
        "funnel": (p_funnel, "linear (per-step user-keyed min-agg + join)"),
        "retention": (p_retention, "linear (user min-agg + distinct days + keyed joins)"),
        "pmi_collocations": (p_pmi, "linear (word/bigram counts + vocab joins + TakeOrdered)"),
        "pagerank": (p_pagerank, "linear+dup-density (edge-bounded contrib exchanges x iters)"),
        "token_entropy": (p_token_entropy, "linear (scan-stage)"),
        "weighted_reservoir": (p_reservoir, "linear (scan-stage key + TakeOrdered)"),
        "src_overlap": (p_src_overlap, "linear+dup-density (pair joins + bounded count)"),
        "mmr_rerank": (p_mmr, "linear (corpus scan for candidates; greedy on bounded pool)"),
        "rm3_topk": (p_rm3, "linear (two corpus passes + fb-bounded model)"),
        "fim_transform": (p_fim, "linear (scan-stage string algebra)"),
        "corpus_card": (p_corpus_card, "linear ((group,lang)-bounded aggregates)"),
        "calibration_report": (p_calibration, "linear (global scalar rank + bin aggregate)"),
        "semi_hard_triplets": (p_triplets, "linear (candidate top-k + per-query windows)"),
        "packing_efficiency": (p_pack_eff, "linear (two bounded aggregates)"),
        "gap_percentiles": (p_gap_pctl, "linear (user-keyed lag + distinct-gap cumsum)"),
        "gap_percentiles_approx": (p_gap_pctl_approx, "linear (one mergeable GK-sketch aggregate)"),
        "attrition_report": (p_attrition, "linear (one plan of staged counts)"),
        "doremi_weights": (p_doremi, "linear (token explode + vocab join + domain-bounded folds)"),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    only = set(sys.argv[2:])  # optional probe-name filter
    from kinesiscat_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    small = synth(spark, 1)
    big = synth(spark, n)
    results = {}
    try:
        for name, (fn, expect) in probes().items():
            if only and name not in only:
                continue
            passes = int(os.environ.get("SCALE_PROBE_PASSES", "1"))
            fn(spark, small)  # warm (codegen/JIT)

            def _timed(d):
                t0 = time.perf_counter()
                r = fn(spark, d)
                return time.perf_counter() - t0, r

            # min-of-passes: ratios on a shared host are noise-bounded by
            # the slower pass; SCALE_PROBE_PASSES=2+ tightens receipts
            t1 = min(_timed(small)[0] for _ in range(passes))
            tn, rows = _timed(big)
            for _ in range(passes - 1):
                t2, rows = _timed(big)
                tn = min(tn, t2)
            results[name] = {
                "t_1x_sec": round(t1, 2),
                f"t_{n}x_sec": round(tn, 2),
                "ratio": round(tn / t1, 2),
                "ideal": float(n),
                "expected_shape": expect,
                "rows_at_big": rows,
            }
            print(f"{name:22s} 1x={t1:6.2f}s  {n}x={tn:6.2f}s  ratio={tn/t1:5.2f} ({expect})")
    finally:
        shutil.rmtree(small, ignore_errors=True)
        shutil.rmtree(big, ignore_errors=True)
    print(json.dumps({"n_copies": n, "results": results}))


if __name__ == "__main__":
    main()
