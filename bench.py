"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count) after a
warmup that (a) touches each table once and (b) runs every headline query
once at sf0.001.

Cross-round comparability: the r4 lane set minus jp_array_hof (folded into
the wider jp_array_index_slice in round 5) is the stable common subset;
packing_layout and similarity_topk_ivf_sq are round-5 additions. The `env`
block (loadavg, timestamps) and `pass_totals` distinguish host noise from
code drift — see COVERAGE.md "Bench-drift adjudication". The tiny-SF pass compiles the same whole-stage-codegen
units and JIT-warms the same code paths at negligible data cost, so the
timed pass measures steady-state throughput at the target SF rather than
one-time Janino/JIT compilation (which dominates first execution of the
larger plans and is amortized away on any long-lived cluster).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "lineitem_scalar_aggregates",
    "events_tumbling_window",
    "events_sessionization",
    "events_topk_users_per_type",
    "jp_filter_compare",
    "jp_array_index_slice",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_quantized",
    "similarity_topk_ivf_sq",
    "dedup_ngram_jaccard",
    "packing_layout",
    "text_quality_score",
    "text_fingerprint",
    "text_bm25_topk",
    "curation_signals",
    "curation_span_dup",
    "curation_decontaminate",
    "text_bpe_train",
    "text_quality_classifier",
    "similarity_hybrid_rrf",
    "text_chunks_shuffled",
    "dedup_semantic",
    "text_heavy_ngrams",
    "dedup_incremental",
)


def _load_snapshot() -> dict:
    la = os.getloadavg()
    return {"load_1m": round(la[0], 2), "load_5m": round(la[1], 2), "ts": round(time.time(), 1)}


def _spin_fingerprint() -> float:
    """Single-thread host-speed fingerprint (sum of 10^6 squares, sec) —
    the round-5 adjudication's microbenchmark at 1/10 scale, recorded per
    run so cross-round bench comparisons can normalize for a slow/throttled
    host (round 9 observed the same code 2.5x slower at spin 1.6 vs the
    round-5 fingerprint 0.65 = 10x this number)."""
    t = time.time()
    s = 0
    for i in range(10**6):
        s += i * i
    return round(time.time() - t, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Host-noise instrumentation: timings are only comparable across rounds
    # when the host is quiet. If it isn't, wait (bounded) for it to drain
    # rather than recording numbers that can't be interpreted later.
    env_start = _load_snapshot()
    waited = 0.0
    while env_start["load_1m"] > 6.0 and waited < 180.0:
        time.sleep(10.0)
        waited += 10.0
        env_start = _load_snapshot()

    import __spark_entry__ as entrymod
    from kinesiscat_spark.io_tables import TABLES, load_table
    from kinesiscat_spark.session import get_spark

    spark = get_spark("kinesiscat-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + parquet footers, not attributed to any query.
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    qs = entrymod.queries()

    # Codegen/JIT warmup: same plans, tiny data (see module docstring).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is not None:
                fn(spark, warm_dir).count()
    # Three timed passes per lane, report the min: a long-lived cluster's
    # steady-state throughput, insulated from JIT/GC spikes and the
    # measured up-to-2x noisy-neighbor variance of the shared host.
    # All three per-pass timings are recorded too (`passes`), so a uniform
    # within-session slowdown (accumulated JVM state) is distinguishable
    # from host noise (random per-lane spikes) after the fact.
    timings: dict[str, float] = {}
    passes: list[dict[str, float]] = []
    for _ in range(3):
        this_pass: dict[str, float] = {}
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is None:
                continue
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            this_pass[name] = dt
            if name not in timings or dt < timings[name]:
                timings[name] = dt
        passes.append(this_pass)

    # Per-method sub-timings for the widened lanes (VERDICT r5: cross-round
    # per-lane comparison shouldn't need manual halving).  Method-
    # discriminated lanes sub-time via a literal filter — Catalyst folds
    # `lit('bloom') = 'exact'` to false and prunes the other union branch,
    # so each sub-timing executes exactly one method's plan.  Join-shaped
    # lanes sub-time their component operators directly.  One pass each,
    # diagnostic only (excluded from `value`).
    def _decon_sub(m):
        return lambda: qs["curation_decontaminate"](spark, sf_dir).filter(
            f"method = '{m}'"
        )

    def _quant_sub(m):
        return lambda: qs["similarity_topk_quantized"](spark, sf_dir).filter(
            f"method = '{m}'"
        )

    def _span_sub(which):
        from kinesiscat_spark.operators.curation import (
            remove_duplicate_spans,
            span_dup_frac,
        )

        docs = load_table(spark, sf_dir, "documents")
        return (span_dup_frac(docs, n=6) if which == "detect"
                else remove_duplicate_spans(docs, w=6))

    def _line_dedup_sub():
        from kinesiscat_spark.operators.curation import (
            dedup_lines_across_docs,
        )
        from kinesiscat_spark.queries.curation_queries import (
            _LINE_MIN_DOCS,
            _c4_fixture_col,
        )

        docs = load_table(spark, sf_dir, "documents")
        fixture = docs.select("doc_id", _c4_fixture_col().alias("text"))
        return dedup_lines_across_docs(fixture, min_docs=_LINE_MIN_DOCS)

    from kinesiscat_spark.queries.text_queries import (
        text_bigram_lm,
        text_bigram_lm_persisted,
        text_kn_lm,
        text_language_id,
        text_unigram_lm,
    )

    def _kind_sub(lane, kind):
        return lambda: qs[lane](spark, sf_dir).filter(f"kind = '{kind}'")

    def _kind_subs(lane, kinds):
        return {k: _kind_sub(lane, k) for k in kinds}

    sub_specs = {
        "curation_decontaminate": {
            "exact": _decon_sub("exact"),
            "bloom": _decon_sub("bloom"),
            "semantic": _decon_sub("semantic"),
        },
        # round-6 TPC-H widenings: plain UNION ALL of aggregates, so the
        # kind filter constant-folds the sibling branches away and each
        # sub-timing runs exactly one query's plan.  Caveat: the q3 lane's
        # q3/q10 branches end in ORDER BY + LIMIT, and predicates cannot
        # push through Limit — so this lane's sub-timings each run the two
        # limited branches too (upper bounds, not isolates).
        "tpch_q3_shipping_priority": _kind_subs(
            "tpch_q3_shipping_priority",
            ("q3_shipping", "q10_returned", "q18_big_orders", "q2_min_cost"),
        ),
        "tpch_q5_local_supplier": _kind_subs(
            "tpch_q5_local_supplier",
            ("q5_local", "q7_volume", "q8_share", "q9_profit")
        ),
        "lineitem_scalar_aggregates": _kind_subs(
            "lineitem_scalar_aggregates",
            ("q17_avg_yearly", "q6_revenue", "q14_promo_share",
             "q19_disjunctive"),
        ),
        "dedup_minhash_lsh": _kind_subs(
            "dedup_minhash_lsh",
            ("pairs", "leak", "src_overlap", "comp_hist"),
        ),
        "dedup_ngram_jaccard": _kind_subs(
            "dedup_ngram_jaccard", ("jaccard", "containment", "rank")
        ),
        "events_sessionization": _kind_subs(
            "events_sessionization",
            ("batch", "stream_closed", "stream_multi", "gap_pctl"),
        ),
        "similarity_topk_quantized": {
            "sq8": _quant_sub("sq8"),
            "pq": _quant_sub("pq"),
        },
        # per-method plans built directly (filtering the lane's union does
        # not prune the sibling branches — Arrow/checkpoint nodes block
        # the constant fold; see similarity_queries.ivf_family_method)
        "similarity_topk_ivf": {
            m: (lambda m=m: __import__(
                "kinesiscat_spark.queries.similarity_queries",
                fromlist=["ivf_family_method"],
            ).ivf_family_method(spark, sf_dir, m))
            for m in ("ivf", "ivf_index", "exact", "ivf_refined", "mmr",
                      "triplet")
        },
        "curation_span_dup": {
            "detect": lambda: _span_sub("detect"),
            "remove": lambda: _span_sub("remove"),
            "line_dedup": lambda: _line_dedup_sub(),
        },
        "text_fingerprint": _kind_subs("text_fingerprint", ("fp", "novelty")),
        "packing_layout": _kind_subs(
            "packing_layout", ("layout", "efficiency")
        ),
        "text_bm25_topk": _kind_subs(
            "text_bm25_topk", ("bm25", "rm3", "rm3_terms")
        ),
        "text_bpe_train": _kind_subs(
            "text_bpe_train", ("doc", "doc_persisted", "fertility")
        ),
        "text_quality_score": {
            "langid_heuristic": lambda: text_language_id(spark, sf_dir),
            "unigram_lm": lambda: text_unigram_lm(spark, sf_dir),
            "bigram_lm": lambda: text_bigram_lm(spark, sf_dir),
            "bigram_lm_persisted": lambda: text_bigram_lm_persisted(
                spark, sf_dir
            ),
            "kn_lm": lambda: text_kn_lm(spark, sf_dir),
        },
        "text_heavy_ngrams": {
            m: (lambda m=m: qs["text_heavy_ngrams"](spark, sf_dir).filter(
                f"kind = '{m}'"
            ))
            for m in ("heavy", "hll_distinct", "exact_distinct", "vocab",
                      "zipf", "corpus_sim", "hll_union", "hll_intersect",
                      "cms_dot", "ctfidf", "pmi", "card", "distinct_n")
        },
        "events_tumbling_window": _kind_subs(
            "events_tumbling_window", ("window", "retention")
        ),
        "events_topk_users_per_type": _kind_subs(
            "events_topk_users_per_type",
            ("topk", "funnel", "funnel_stream"),
        ),
    }
    sub_timings: dict[str, dict[str, float]] = {}
    for lane, subs in sub_specs.items():
        if lane not in timings:
            continue
        sub_timings[lane] = {}
        for sub, mk in subs.items():
            t0 = time.perf_counter()
            mk().count()
            sub_timings[lane][sub] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    env_end = _load_snapshot()
    summary = {
        "metric": "headline-suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "env": {
            "start": env_start,
            "end": env_end,
            "waited_for_quiet_sec": waited,
            "cpus": os.cpu_count(),
            "spin_1m_sec": _spin_fingerprint(),
        },
        "pass_totals": [round(sum(p.values()), 3) for p in passes],
        "sub_timings": sub_timings,
    }
    # Full detail goes to a file, NOT stdout: the driver captures a bounded
    # TAIL of stdout, and rounds 5 AND 6 both produced "parsed": null
    # because the final line exceeded that capture (r6's ~2.3 KB line was
    # cut mid-key).  The stdout line must be SMALL: only the contract keys
    # (metric/value/unit/queries/sf) plus pass_totals, with per-lane
    # timings at 2 dp.  env / sub_timings / passes live in bench_last.json.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_last.json"), "w") as f:
        json.dump({**summary, "passes": passes}, f, indent=1)
    line = json.dumps({
        "metric": "headline-suite wall time",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf,
        "pass_totals": summary["pass_totals"],
    }, separators=(",", ":"))
    assert len(line) < 1500, f"stdout bench line too big: {len(line)}B"
    print(line)


if __name__ == "__main__":
    main()
