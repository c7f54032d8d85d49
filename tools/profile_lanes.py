"""Component-level profiler for the expensive bench lanes (round 9).

Times individual pipeline pieces with the noop sink (guide §1.4) so the
computation is measured, not the collect; jobs are labelled (guide §1.5).
Diagnostic only — never part of the bench contract.

    python tools/profile_lanes.py [sf_dir] [section ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = set(sys.argv[2:]) or None

    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.session import get_spark

    spark = get_spark("kc-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def run(name: str, mk, reps: int = 2) -> None:
        sc.setJobDescription(name)
        best = None
        for _ in range(reps):
            dt = noop(mk())
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        print(f"{name:55s} {best:7.3f}s", flush=True)

    docs = load_table(spark, sf_dir, "documents")

    if sections is None or "ngram" in sections:
        from kinesiscat_spark.io_tables import spread
        from kinesiscat_spark.operators.dedup import (
            _jaccard_prefix_candidates,
            _containment_prefix_candidates,
            _ordered_shingles,
            _verify_candidates,
            shingle_hashes,
        )
        from kinesiscat_spark.queries.dedup_queries import (
            CONTAINMENT_T,
            JACCARD_T,
        )

        def mk_sh():
            return spread(docs, "doc_id").select(
                F.col("doc_id").alias("id"),
                shingle_hashes(F.col("text"), 3).alias("sh"),
            )

        run("ngram: ordered shingles build", lambda: _ordered_shingles(mk_sh()))
        ordered = _ordered_shingles(mk_sh())
        run(
            "ngram: jaccard candidates (raw rows)",
            lambda: _jaccard_prefix_candidates(ordered, JACCARD_T, None),
        )
        run(
            "ngram: union candidates + dedupe",
            lambda: _jaccard_prefix_candidates(ordered, JACCARD_T, None)
            .unionByName(
                _containment_prefix_candidates(ordered, CONTAINMENT_T, None)
            )
            .dropDuplicates(["id_a", "id_b"]),
        )

        def mk_verified():
            cand = (
                _jaccard_prefix_candidates(ordered, JACCARD_T, None)
                .unionByName(
                    _containment_prefix_candidates(ordered, CONTAINMENT_T, None)
                )
                .dropDuplicates(["id_a", "id_b"])
            )
            return _verify_candidates(ordered, cand).filter(
                (F.col("jaccard") >= JACCARD_T)
                | (F.col("containment") >= CONTAINMENT_T)
            ).select("id_a", "id_b", "jaccard", "containment")

        run("ngram: candidates+verify (merged frame)", mk_verified)

        from kinesiscat_spark.registry import all_queries

        qs = all_queries()
        run("ngram: FULL lane", lambda: qs["dedup_ngram_jaccard"](spark, sf_dir), reps=2)

    if sections is None or "minhash" in sections:
        from kinesiscat_spark.operators.dedup import (
            _minhash_bands,
            minhash_lsh_pairs,
        )
        from kinesiscat_spark.queries.dedup_queries import (
            MINHASH_T,
            N_BANDS,
            N_HASHES,
        )

        run(
            "minhash: bands frame (arrow kernel)",
            lambda: _minhash_bands(docs, N_HASHES, N_BANDS, 3, "doc_id", "text"),
        )
        run(
            "minhash: pairs (join+dedupe)",
            lambda: minhash_lsh_pairs(
                docs, threshold=MINHASH_T, n_hashes=N_HASHES, n_bands=N_BANDS, n=3
            ),
        )
        from kinesiscat_spark.registry import all_queries

        qs = all_queries()
        run("minhash: FULL lane", lambda: qs["dedup_minhash_lsh"](spark, sf_dir))

    if sections is None or "heavy" in sections:
        from kinesiscat_spark.operators.curation import word_ngrams
        from kinesiscat_spark.operators.dedup import corpus_minhash_similarity
        from kinesiscat_spark.operators.sketches import heavy_hitters
        from kinesiscat_spark.operators.text import (
            class_tfidf,
            corpus_card,
            pmi_collocations,
            vocab_coverage,
            zipf_fit,
        )
        from kinesiscat_spark.queries import sketch_queries as sq

        grams = docs.select(
            F.explode(word_ngrams(F.col("text"), sq._HH_N)).alias("gram")
        )
        run("heavy: raw gram explode+groupBy count",
            lambda: grams.groupBy("gram").agg(F.count("*").alias("_c")))
        run("heavy: heavy_hitters (CMS 2-pass)",
            lambda: heavy_hitters(grams, "gram", min_count=sq._HH_MIN))
        run("heavy: vocab_coverage", lambda: vocab_coverage(docs, targets=sq._VOCAB_TARGETS))
        run("heavy: zipf_fit", lambda: zipf_fit(docs, top_n=sq._ZIPF_TOP))
        run("heavy: corpus_minhash_similarity",
            lambda: corpus_minhash_similarity(docs, n_hashes=sq._CSIM_H))
        run("heavy: class_tfidf", lambda: class_tfidf(docs, group_col="source", top_k=sq._CTFIDF_TOPK))
        run("heavy: pmi_collocations",
            lambda: pmi_collocations(docs, min_count=sq._PMI_MIN, top_k=sq._PMI_TOPK))
        run("heavy: corpus_card", lambda: corpus_card(docs))
        from kinesiscat_spark.registry import all_queries

        qs = all_queries()
        run("heavy: FULL lane", lambda: qs["text_heavy_ngrams"](spark, sf_dir))

    if sections is None or "misc" in sections:
        from kinesiscat_spark.registry import all_queries

        qs = all_queries()
        for lane in (
            "text_quality_score",
            "events_topk_users_per_type",
            "curation_decontaminate",
            "dedup_incremental",
            "dedup_semantic",
            "curation_signals",
            "similarity_topk_ivf",
            "tpch_q3_shipping_priority",
            "tpch_q5_local_supplier",
            "events_sessionization",
            "similarity_topk_quantized",
        ):
            run(f"lane: {lane}", lambda lane=lane: qs[lane](spark, sf_dir))


if __name__ == "__main__":
    main()
