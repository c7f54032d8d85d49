"""The round-7-continuation lane folds must stay NON-DEGENERATE at the
oracle SF: a fold whose rows are all-equal/trivial would still hash-match
its twin while verifying nothing."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def test_sketch_lane_zipf_and_corpus_sim(spark, qs):
    rows = qs["text_heavy_ngrams"](spark, SF_ORACLE).collect()
    zipf = {r.gram: r for r in rows if r.kind == "zipf"}
    assert set(zipf) == {"slope", "intercept"}
    assert zipf["slope"].est < -0.05         # a falling curve (synthetic
    # corpus: flatter than natural text's ~-1, but decisively negative)
    assert zipf["slope"].cnt >= 20           # fit spans the (small) vocab
    csim = [r for r in rows if r.kind == "corpus_sim"]
    assert len(csim) == 190                  # C(20,2) source pairs
    ests = {r.est for r in csim}
    assert len(ests) > 5                     # estimates actually vary
    assert all(0.0 <= r.est <= 1.0 for r in csim)


def test_sampling_lane_cluster_and_unimax(spark, qs):
    rows = qs["sampling_mix"](spark, SF_ORACLE).collect()
    clus = [r for r in rows if r.kind == "cluster"]
    cells = {r.source_id for r in clus}
    assert len(cells) >= 4                   # multiple prototypes in play
    assert len(clus) > len(cells)            # more than one keeper per cell
    dists = {r.n_tokens for r in clus}
    assert len(dists) > 10                   # distances vary (hash pins them)
    uni = [r for r in rows if r.kind == "unimax"]
    assert {r.source_id for r in uni} == {0, 1}
    n0 = sum(1 for r in uni if r.source_id == 0)
    n1 = sum(1 for r in uni if r.source_id == 1)
    assert n0 > 0 and n1 > 0


def test_quality_lane_kn_scores(spark, qs):
    rows = qs["text_quality_score"](spark, SF_ORACLE).collect()
    kn = [r.avg_logp_kn for r in rows if r.avg_logp_kn is not None]
    assert len(kn) == len(rows)              # every doc scored
    assert len(set(kn)) > len(rows) // 2     # scores vary per doc
    assert all(v < 0 for v in kn)            # log-probs


def test_events_lane_funnel_and_retention(spark, qs):
    rows = qs["events_topk_users_per_type"](spark, SF_ORACLE).collect()
    fun = [r for r in rows if r.kind == "funnel"]
    assert len(fun) > 0
    flags = {r.completed for r in fun}
    assert flags == {True, False}            # horizon actually splits
    stream = [r for r in rows if r.kind == "funnel_stream"]
    full = [r for r in fun if r.rank == 3]
    assert {(r.user_id, r.t0_us, r.t_end_us, r.completed) for r in stream} \
        == {(r.user_id, r.t0_us, r.t_end_us, r.completed) for r in full}

    trows = qs["events_tumbling_window"](spark, SF_ORACLE).collect()
    ret = [r for r in trows if r.kind == "retention"]
    assert len(ret) >= 3
    assert any(0.0 < r.retention < 1.0 for r in ret)  # non-trivial rates


def test_pipeline_lane_best_policy_differs(spark, qs):
    rows = qs["curation_pipeline"](spark, SF_ORACLE).collect()
    batch = {r.doc_id for r in rows if r.kind == "batch"}
    best = {r.doc_id for r in rows if r.kind == "batch_best"}
    assert batch and best
    assert batch != best                     # the winner policy changes picks


def test_sketch_lane_pmi(spark, qs):
    rows = qs["text_heavy_ngrams"](spark, SF_ORACLE).collect()
    pmi = [r for r in rows if r.kind == "pmi"]
    assert len(pmi) == 10                    # full top-k populated
    assert len({r.est for r in pmi}) > 5     # scores actually vary
    assert all(r.cnt >= 5 for r in pmi)      # floor respected
    assert all(r.est > 0 for r in pmi)       # genuine collocations


def test_jaccard_lane_pagerank(spark, qs):
    rows = qs["dedup_ngram_jaccard"](spark, SF_ORACLE).collect()
    pairs = [r for r in rows if r.kind in ("jaccard", "containment")]
    rank = [r for r in rows if r.kind == "rank"]
    nodes = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert {r.id_a for r in rank} == nodes    # every graph node ranked
    ests = [r.jaccard for r in rank]
    assert abs(sum(ests) - 1.0) < 1e-3        # rank mass conserved
    # the similarity weighting breaks the clique symmetry: the multi-node
    # component's members separate from the uniform 1/N of isolated pairs
    assert len(set(ests)) > 2


def test_bpe_lane_fertility(spark, qs):
    rows = qs["text_bpe_train"](spark, SF_ORACLE).collect()
    fert = {r.lhs: r.cnt for r in rows if r.kind == "fertility"}
    assert set(fert) == {"total_tokens", "total_words", "total_chars"}
    # totals cross-check the doc branch exactly
    assert fert["total_tokens"] == sum(
        r.n_bpe_tokens for r in rows if r.kind == "doc"
    )
    # sane tokenizer shape: >=1 BPE token per word (merges only fuse
    # within words), and chars-per-token >= 1 after the 6 lane merges
    assert fert["total_tokens"] >= fert["total_words"] > 0
    assert fert["total_chars"] >= fert["total_words"]


def test_sampling_lane_reservoir(spark, qs):
    rows = qs["sampling_mix"](spark, SF_ORACLE).collect()
    resv = [r for r in rows if r.kind == "reservoir"]
    assert len(resv) == 64                    # full reservoir drawn
    toks = [int(r.n_tokens) for r in resv]
    assert all(t > 0 for t in toks)           # w > 0 enforced
    assert len(set(toks)) > 5                 # weights actually vary
    # the streamed reservoir kind must EQUAL the batch kind row-for-row
    # (its in-lane self-check raises on divergence before this point)
    srows = [r for r in rows if r.kind == "reservoir_stream"]
    assert len(srows) == 64
    assert {(int(r.doc_id), int(r.n_tokens)) for r in srows} == {
        (int(r.doc_id), int(r.n_tokens)) for r in resv
    }


def test_minhash_lane_src_overlap(spark, qs):
    rows = qs["dedup_minhash_lsh"](spark, SF_ORACLE).collect()
    pairs = [r for r in rows if r.kind == "pairs"]
    ov = [r for r in rows if r.kind == "src_overlap"]
    assert ov and sum(int(r.est_jaccard) for r in ov) == len(pairs)
    assert all(r.split_a <= r.split_b for r in ov)   # canonicalized
    assert len({(r.split_a, r.split_b) for r in ov}) == len(ov)


def test_similarity_lane_mmr(spark, qs):
    rows = qs["similarity_topk_ivf"](spark, SF_ORACLE).collect()
    mmr = [r for r in rows if r.method == "mmr"]
    exact = {
        (r.qid, r.rnk): r.cid for r in rows if r.method == "exact"
    }
    qids = {r.qid for r in mmr}
    assert len(qids) == 5 and len(mmr) == 25      # 5 picks x 5 queries
    # diversification is load-bearing: some query's pick sequence must
    # deviate from the plain cosine rank order
    deviates = any(
        exact.get((r.qid, r.rnk)) is not None
        and exact[(r.qid, r.rnk)] != r.cid
        for r in mmr
    )
    assert deviates
    for q in qids:                                 # scores decay per query
        seq = sorted((r for r in mmr if r.qid == q), key=lambda r: r.rnk)
        assert all(a.sim >= b.sim for a, b in zip(seq, seq[1:]))


def test_bm25_lane_rm3(spark, qs):
    rows = qs["text_bm25_topk"](spark, SF_ORACLE).collect()
    model = [r for r in rows if r.kind == "rm3_terms"]
    assert sum(1 for r in model if r.rnk == 0) == 5   # 5 expansion terms
    assert sum(1 for r in model if r.rnk == 1) == 3   # 3 originals
    assert len({r.score for r in model}) == len(model)  # weights vary
    bm = {r.rnk: r.doc_id for r in rows if r.kind == "bm25"}
    rm = {r.rnk: r.doc_id for r in rows if r.kind == "rm3"}
    assert len(bm) == len(rm) == 25
    # feedback expansion actually moves the ranking
    assert any(bm[i] != rm[i] for i in bm)


def test_pipeline_lane_attrition(spark, qs):
    rows = qs["curation_pipeline"](spark, SF_ORACLE).collect()
    attr = {r.kind: r.doc_id for r in rows if r.kind.startswith("attr_")}
    assert len(attr) == 12                    # full stage funnel present
    batch = [r for r in rows if r.kind == "batch"]
    assert attr["attr_sample"] == len(batch)  # funnel ends at the output
    assert attr["attr_input"] > attr["attr_sample"]
    # at least two distinct stages actually drop documents
    drops = sum(
        1
        for a, b in [
            ("attr_input", "attr_quality"),
            ("attr_pii", "attr_decontaminate"),
            ("attr_decontaminate", "attr_semantic_decontaminate"),
            ("attr_semantic_decontaminate", "attr_exact_dedup"),
            ("attr_exact_dedup", "attr_near_dedup"),
            ("attr_near_dedup", "attr_sample"),
        ]
        if attr[a] > attr[b]
    )
    assert drops >= 2


def test_sessionization_lane_gap_pctls(spark, qs):
    rows = qs["events_sessionization"](spark, SF_ORACLE).collect()
    gaps = {r.session_id: r for r in rows if r.kind == "gap_pctl"}
    assert set(gaps) == {50, 90, 99}
    vals = [gaps[p].session_start_us for p in (50, 90, 99)]
    assert vals[0] <= vals[1] <= vals[2]       # a real CDF
    assert len(set(vals)) > 1                  # distribution has spread
    assert all(gaps[p].n_events > 1000 for p in gaps)
    # heavy upper tail (the synthetic users' cadence spans days): exactly
    # the shape the diagnostic exists to surface before picking a gap
    assert vals[2] > 2 * vals[0] > 0


def test_chunks_lane_fim(spark, qs):
    rows = qs["text_chunks_shuffled"](spark, SF_ORACLE).collect()
    fim = [r for r in rows if r.kind == "fim"]
    assert len(fim) == 500                       # one row per document
    applied = [r for r in fim if r.shuffle_rank == 1]
    # the rate gate splits the corpus nontrivially both ways
    assert 100 < len(applied) < 400
    assert all("<MID>" in r.chunk_text for r in applied)
    assert len({r.n_chunk_tokens for r in applied}) > 10  # offsets vary
    passthrough = [r for r in fim if r.shuffle_rank == 0]
    assert all("<PRE>" not in (r.chunk_text or "") for r in passthrough)


def test_classifier_lane_calibration(spark, qs):
    rows = qs["text_quality_classifier"](spark, SF_ORACLE).collect()
    calib = sorted(
        (r for r in rows if r.kind == "calib"), key=lambda r: r.doc_id
    )
    assert len(calib) == 10
    assert sum(r.n_docs for r in calib) == sum(
        1 for r in rows if r.kind == "margin"
    )
    rates = [r.pos_rate if hasattr(r, "pos_rate") else r.y for r in calib]
    assert len(set(rates)) > 2                    # bins actually differ
    # one-step margins already separate en from rest: the top bin must be
    # richer in positives than the bottom bin
    assert rates[-1] > rates[0]
    means = [r.margin for r in calib]
    assert means == sorted(means)                 # bins are score-ordered


def test_sketch_lane_corpus_card(spark, qs):
    rows = qs["text_heavy_ngrams"](spark, SF_ORACLE).collect()
    card = [r for r in rows if r.kind == "card"]
    assert len(card) == 80                    # 20 sources x 4 metrics
    docs = [r.cnt for r in card if r.gram.endswith("|docs")]
    assert sum(docs) == 500                   # every doc accounted for
    toks = [r.cnt for r in card if r.gram.endswith("|tokens")]
    assert len(set(toks)) > 10                # source sizes genuinely vary
    shares = [r.est for r in card if "|top|" in r.gram]
    assert len(shares) == 20 and all(0.0 < s <= 1.0 for s in shares)
    assert len(set(shares)) > 3               # sources actually differ


def test_minhash_lane_comp_hist(spark, qs):
    rows = qs["dedup_minhash_lsh"](spark, SF_ORACLE).collect()
    hist = {r.id_a: r.id_b for r in rows if r.kind == "comp_hist"}
    pairs = [r for r in rows if r.kind == "pairs"]
    nodes = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert len(hist) >= 2                     # twins AND a bigger cluster
    assert all(sz >= 2 for sz in hist)        # every component is a dup
    assert sum(sz * n for sz, n in hist.items()) == len(nodes)


def test_pca_lane_whitening(spark, qs):
    import math

    rows = qs["embeddings_pca"](spark, SF_ORACLE).collect()
    proj = {(r.vec_id, r.k): r.coord for r in rows if r.kind == "proj"}
    white = {(r.vec_id, r.k): r.coord for r in rows if r.kind == "white"}
    assert set(proj) == set(white) and len(proj) > 1000
    # whitening rescales by 1/sqrt(ev) — per-component variances equalize
    from kinesiscat_spark.queries.pca_queries import _PCA_EIGENVALUES

    for (v, k) in list(proj)[:50]:
        scaled = proj[(v, k)] / math.sqrt(_PCA_EIGENVALUES[k])
        assert abs(white[(v, k)] - scaled) < 1e-4
    ratios = {round(abs(white[p]) / max(abs(proj[p]), 1e-9), 1)
              for p in list(proj)[:200] if abs(proj[p]) > 0.01}
    assert ratios                          # genuine rescale (~6x here)


def test_similarity_lane_triplets(spark, qs):
    rows = qs["similarity_topk_ivf"](spark, SF_ORACLE).collect()
    tri = [r for r in rows if r.method == "triplet"]
    pos = {r.qid: r for r in tri if r.rnk == 1}
    neg = {r.qid: r for r in tri if r.rnk == 2}
    assert len(pos) == 5                       # every anchor has a positive
    assert len(neg) >= 3                       # semi-hard negatives exist
    for q in neg:
        assert neg[q].sim < pos[q].sim - 0.05  # margin respected
        assert neg[q].cid != pos[q].cid


def test_packing_lane_efficiency(spark, qs):
    rows = qs["packing_layout"](spark, SF_ORACLE).collect()
    eff = {r.seq: r for r in rows if r.kind == "efficiency"}
    assert set(eff) == {128, 512, 2048}
    for c, r in eff.items():
        assert r.n_tokens <= r.n_in_seq <= r.seq_off  # packed <= naive
        assert r.n_in_seq % c == 0 and r.seq_off % c == 0
    # the gap packing buys must be real at the large context
    assert eff[2048].seq_off > eff[2048].n_in_seq
    # layout rows agree with the report's total at the lane budget
    layout_total = sum(r.n_in_seq for r in rows if r.kind == "layout")
    assert layout_total == eff[512].n_tokens


def test_sketch_lane_distinct_n(spark, qs):
    rows = qs["text_heavy_ngrams"](spark, SF_ORACLE).collect()
    dn = [r for r in rows if r.kind == "distinct_n"]
    exact = [r for r in rows if r.kind == "exact_distinct"]
    assert len(dn) == 1 and len(exact) == 1
    assert 0.0 < dn[0].est < 1.0              # a real repetition signal
    # the ratio's numerator IS the exact distinct count the lane pins
    assert round(exact[0].cnt / dn[0].cnt, 6) == dn[0].est


def test_ngram_lane_leak_split_nondegenerate(spark, qs):
    """Round-9 fold: the leakage-safe split kinds must exercise every
    branch — all three splits populated, clusters actually shared across
    near-dup pairs, and the audit row showing naive routing LEAKS (> 0)
    while cluster routing structurally cannot (= 0)."""
    rows = qs["dedup_ngram_jaccard"](spark, SF_ORACLE).collect()
    splits = {r.kind: 0 for r in rows if r.kind.startswith("split_")}
    for r in rows:
        if r.kind.startswith("split_"):
            splits[r.kind] += 1
    assert set(splits) == {"split_train", "split_val", "split_test"}
    assert all(n > 0 for n in splits.values())
    # near-dup members inherit a shared (non-self) cluster representative
    assigned = {r.id_a: (r.id_b, r.kind) for r in rows
                if r.kind.startswith("split_")}
    pair_rows = [r for r in rows if r.kind == "jaccard"]
    assert pair_rows
    for p in pair_rows:
        ca, sa = assigned[p.id_a]
        cb, sb = assigned[p.id_b]
        assert ca == cb          # same component -> same representative
        assert sa == sb          # -> same split, by construction
    [audit] = [r for r in rows if r.kind == "leak_audit"]
    assert audit.id_a > 0        # naive doc-id routing leaks at this corpus
    assert audit.id_b == 0       # cluster routing never does


def test_packing_lane_manifest_nondegenerate(spark, qs):
    """Round-9 fold: the export manifest must cover every shard with
    varying digests and internally consistent masses."""
    rows = qs["packing_layout"](spark, SF_ORACLE).collect()
    man = [r for r in rows if r.kind == "manifest"]
    layout = [r for r in rows if r.kind == "layout"]
    assert len(man) == 8                       # N_SHARDS
    assert len({r.seq for r in man}) == 8      # digests all distinct
    # manifest masses agree with the layout it describes
    from collections import defaultdict

    docs_per_shard: dict[int, set] = defaultdict(set)
    toks_per_shard: dict[int, int] = defaultdict(int)
    seqs_per_shard: dict[int, int] = defaultdict(int)
    for r in layout:
        docs_per_shard[r.shard].add(r.id)
        toks_per_shard[r.shard] += r.n_in_seq
        seqs_per_shard[r.shard] = max(seqs_per_shard[r.shard], r.seq + 1)
    for m in man:
        assert m.id == len(docs_per_shard[m.shard])
        assert m.n_tokens == toks_per_shard[m.shard]
        assert m.n_in_seq == seqs_per_shard[m.shard]
        assert 0 < m.seq_off <= m.n_tokens     # max doc within bounds
    # round-9 continuation: the length histogram populates a real grid
    # and the interpolated quantiles are ordered and in-range
    lh = [r for r in rows if r.kind == "len_hist"]
    assert len(lh) >= 6                        # multiple bins in play
    assert sum(r.id for r in lh) == 500        # every document counted
    assert len({r.id for r in lh}) > 2         # counts vary across bins
    lq = {r.seq: r.n_tokens for r in rows if r.kind == "len_q"}
    assert set(lq) == {500, 900, 990}
    assert lq[500] < lq[900] < lq[990]         # micro-quantized estimates
    assert 0 < lq[500] < 200 * 10**6           # sane magnitude (< 200 tok)
