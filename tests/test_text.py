"""Text-analysis operator tests (X5): the Arrow winnowing kernel must be
bit-identical to the Column spec, including edge shapes the corpus never
hits (short docs, exact-k docs, non-ASCII)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesiscat_spark.operators.text import (
    winnow_fingerprints,
    winnow_fingerprints_udf,
)

CASES = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "abc"),  # shorter than k=5: single k-gram of the whole text
    (2, "abcde"),  # exactly k
    (3, "abcdefg"),  # fewer windows than w=4
    (4, "aaaaaaaaaaaaaaaaaaaa"),  # all k-grams identical → one fingerprint
    (5, "naïve café déjà vu — franç"),  # non-ASCII: chars, not bytes
    (6, "x" * 500 + "y" * 500),  # long doc, two hash regimes
]


def test_winnow_kernel_matches_column_spec(spark):
    df = spark.createDataFrame(CASES, ["doc_id", "text"])
    got = df.select(
        "doc_id",
        winnow_fingerprints(F.col("text")).alias("spec"),
        winnow_fingerprints_udf()(F.col("text")).alias("kernel"),
    ).collect()
    for r in got:
        assert r.spec == r.kernel, f"doc {r.doc_id}: {r.spec} != {r.kernel}"


def test_winnow_fingerprint_is_subset_of_kgram_hashes(spark):
    """Every fingerprint must be one of the document's k-gram hashes."""
    from kinesiscat_spark.operators.text import kgram_hashes

    df = spark.createDataFrame(CASES, ["doc_id", "text"])
    rows = df.select(
        kgram_hashes(F.col("text")).alias("hs"),
        winnow_fingerprints_udf()(F.col("text")).alias("fps"),
    ).collect()
    for r in rows:
        assert set(r.fps) <= set(r.hs)
        assert len(r.fps) >= 1


def test_unigram_model_is_a_distribution(spark):
    """Vocabulary probabilities + OOV mass behave like a distribution:
    in-vocab probs sum to (N + kV)/(N + kV) minus the OOV share."""
    import math

    from kinesiscat_spark.operators.text import unigram_model

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "b c")], ["doc_id", "text"]
    )
    model = unigram_model(docs, k=0.5)
    rows = {r.w: r.logp for r in model.df.collect()}
    # counts: a=3, b=2, c=1; N=6, V=3, k=0.5 -> denom 7.5
    assert math.isclose(math.exp(rows["a"]), 3.5 / 7.5)
    assert math.isclose(math.exp(rows["b"]), 2.5 / 7.5)
    assert math.isclose(math.exp(rows["c"]), 1.5 / 7.5)
    assert math.isclose(math.exp(model.oov_logp), 0.5 / 7.5)


def test_unigram_model_survives_table_roundtrip(spark, tmp_path):
    """The OOV mass is explicit state, not DataFrame metadata — a model
    table written and reloaded still scores (ADVICE r2)."""
    from kinesiscat_spark.operators.text import (
        UnigramModel,
        score_documents,
        unigram_model,
    )

    docs = spark.createDataFrame([(0, "a a b")], ["doc_id", "text"])
    model = unigram_model(docs, k=0.5)
    path = str(tmp_path / "model.parquet")
    model.df.write.parquet(path)
    reloaded = UnigramModel(spark.read.parquet(path), model.oov_logp)
    out = score_documents(docs, reloaded).collect()
    assert out and out[0].n_tokens == 3


def test_score_documents_prefers_in_distribution_text(spark):
    """A document made of the reference corpus's common words must score
    higher than one full of unseen words."""
    from kinesiscat_spark.operators.text import score_documents, unigram_model

    reference = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)], ["doc_id", "text"]
    )
    model = unigram_model(reference)
    candidates = spark.createDataFrame(
        [(0, "the cat sat"), (1, "zyx qwv jkl")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.avg_logp for r in score_documents(candidates, model).collect()}
    assert got[0] > got[1]
    # both docs have 3 tokens
    n = {r.doc_id: r.n_tokens for r in score_documents(candidates, model).collect()}
    assert n == {0: 3, 1: 3}


def test_bm25_ranking_properties(spark):
    """BM25 sanity: a doc stuffed with a rare query term outranks docs with
    common terms; docs without any term are absent; ties break on id."""
    from kinesiscat_spark.operators.text import bm25_topk

    rows = [
        (1, "zebra zebra zebra filler filler"),
        (2, "zebra filler filler filler filler"),
        (3, "common common common common common"),
        (4, "filler filler filler filler filler"),
        (5, "zebra filler filler filler filler"),  # tie with doc 2
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(docs, ("zebra", "common"), k=10).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rnk)]
    # 'common' has df=1 (rarest -> highest idf) and tf=5: doc 3 tops;
    # among the zebra docs, tf=3 (doc 1) beats tf=1 (docs 2, 5)
    assert ranked[0] == 3
    assert ranked.index(1) < ranked.index(2)
    assert 4 not in ranked                # no query terms -> no row
    assert ranked.index(2) < ranked.index(5)  # equal scores: lower id first
    scores = {r.doc_id: r.score for r in out}
    assert scores[2] == scores[5]


def test_bm25_validates_terms(spark):
    import pytest as _pytest

    from kinesiscat_spark.operators.text import bm25_topk

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        bm25_topk(docs, (), k=5)


def test_bm25_null_text_is_empty_doc_in_stats(spark, duck):
    """NULL text participates as an EMPTY document (dl=0 counted in N and
    avgdl) — and the DuckDB twin encodes the same semantics instead of
    AVG silently skipping a NULL dl (round-5 review catch)."""
    import pandas as pd

    from kinesiscat_spark.operators.text import bm25_topk
    from kinesiscat_spark.queries.text_queries import _BM25_K1, _BM25_B

    rows = [(1, "zebra cat"), (2, None), (3, "zebra zebra dog cat")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.score
        for r in bm25_topk(docs, ("zebra",), k=10, k1=_BM25_K1, b=_BM25_B).collect()
    }
    # hand computation: N=3 (null doc counted), dls = [2, 0, 4], avgdl = 2
    import math

    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    def s(tf, dl):
        return idf * tf * (_BM25_K1 + 1) / (tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / 2.0))

    assert got.keys() == {1, 3}
    assert abs(got[1] - s(1, 2)) < 1e-12
    assert abs(got[3] - s(2, 4)) < 1e-12

    # and the DuckDB twin agrees on the same tiny corpus
    con = __import__("duckdb").connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    from kinesiscat_spark.queries.text_queries import _bm25_oracle

    want = {
        int(r[0]): float(r[1])
        for r in con.execute(
            "SELECT doc_id, score FROM ("
            + _bm25_oracle(terms=("zebra",))
            + ") WHERE kind = 'bm25'"
        ).fetchall()
    }
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6


def test_bm25_splits_text_once_per_scan(spark):
    """The token split (the dominant per-row cost) must appear as ONE
    intermediate projection per scan subtree, not be inlined into the dl
    column and every per-term tf (T+1 re-splits)."""
    from kinesiscat_spark.operators.text import bm25_topk

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = bm25_topk(docs, ("a", "b", "c"), k=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # two scan subtrees (stats aggregate + scored join) -> at most 2 splits
    assert plan.count("split(") <= 2, plan


def test_chunk_documents_shapes(spark):
    from kinesiscat_spark.operators.text import chunk_documents

    rows = [
        (1, " ".join(f"t{j}" for j in range(10))),  # 10 tokens
        (2, "a b"),                                  # shorter than chunk
        (3, None),                                   # no rows
        (4, ""),                                     # no rows
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.id, r.chunk_idx)):
        by_doc.setdefault(r.id, []).append((r.chunk_text, r.n_chunk_tokens))
    # doc 1: starts 0,2,4,6 (stop once the end is covered), sizes 4,4,4,4
    assert [c for c, _ in by_doc[1]] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
    ]
    assert by_doc[2] == [("a b", 2)]
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_documents_no_overlap_covers_exactly(spark):
    from kinesiscat_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(11)))], ["doc_id", "text"]
    )
    out = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=0).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_text for r in out] == ["t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9 t10"]
    # non-overlapping chunks partition the token stream exactly
    assert sum(r.n_chunk_tokens for r in out) == 11


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from kinesiscat_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_hypothesis_fuzz(spark):
    """Property fuzz of the chunk arithmetic vs a python replay: starts
    every step tokens, stop at the first chunk covering the end."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kinesiscat_spark.operators.text import chunk_documents

    def python_chunks(n, chunk, step):
        if n == 0:
            return []
        out = []
        start = 0
        while True:
            out.append((start, min(chunk, n - start)))
            if start + chunk >= n:
                break
            start += step
        return out

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        chunk=st.integers(1, 12),
        overlap_frac=st.integers(0, 11),
        lens=st.lists(st.integers(0, 40), min_size=1, max_size=12),
    )
    def run(chunk, overlap_frac, lens):
        overlap = overlap_frac % chunk
        step = chunk - overlap
        rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(lens)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {}
        for r in chunk_documents(docs, chunk, overlap).collect():
            got.setdefault(r.id, []).append(
                (r.chunk_idx, r.chunk_text.split(" ") if r.chunk_text else [], r.n_chunk_tokens)
            )
        for i, n in enumerate(lens):
            want = python_chunks(n, chunk, step)
            mine = sorted(got.get(i, []))
            assert len(mine) == len(want), (i, n, chunk, overlap, mine, want)
            for (idx, toks, cnt), (start, size) in zip(mine, want):
                assert cnt == size
                assert toks == [f"t{j}" for j in range(start, start + size)]

    run()


def test_perplexity_buckets_rank_exact(spark):
    from kinesiscat_spark.operators.text import perplexity_buckets

    rows = [(i, s) for i, s in enumerate([-1.0, -2.0, -3.0, -4.0, -5.0, -6.0])]
    df = spark.createDataFrame(rows, ["doc_id", "avg_logp"])
    out = {
        r.doc_id: (r.ppl_bucket, r.ppl_label)
        for r in perplexity_buckets(df, method="rank").collect()
    }
    # highest score = head; 6 rows, 3 buckets -> 2 per bucket, ties none
    assert out == {
        0: (1, "head"), 1: (1, "head"),
        2: (2, "middle"), 3: (2, "middle"),
        4: (3, "tail"), 5: (3, "tail"),
    }
    # ties broken by id: equal scores fill buckets in id order
    tied = spark.createDataFrame(
        [(i, -1.0) for i in range(6)], ["doc_id", "avg_logp"]
    )
    t = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(tied, method="rank").collect()
    }
    assert t == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3}


def test_perplexity_buckets_thresholds_vs_rank(spark):
    from kinesiscat_spark.operators.text import perplexity_buckets

    # 99 distinct scores: both methods must produce monotone buckets
    # (every head score >= every middle >= every tail) and near-equal
    # bucket sizes (exact thresholds may shift one row at a boundary)
    df = spark.createDataFrame(
        [(i, -float(i) / 7.0) for i in range(99)], ["doc_id", "avg_logp"]
    )
    for kw in [dict(method="rank"), dict(method="thresholds", exact=True)]:
        rows = perplexity_buckets(df, **kw).collect()
        by_bucket = {}
        for r in rows:
            by_bucket.setdefault(r.ppl_bucket, []).append(r.avg_logp)
        assert set(by_bucket) == {1, 2, 3}, kw
        assert min(by_bucket[1]) >= max(by_bucket[2]) >= min(by_bucket[2]), kw
        assert min(by_bucket[2]) >= max(by_bucket[3]), kw
        assert all(abs(len(v) - 33) <= 1 for v in by_bucket.values()), (
            kw,
            {k: len(v) for k, v in by_bucket.items()},
        )


def test_perplexity_buckets_validation_and_approx(spark):
    import pytest as _pytest

    from kinesiscat_spark.operators.text import perplexity_buckets

    df = spark.createDataFrame(
        [(i, float(-i)) for i in range(30)], ["doc_id", "avg_logp"]
    )
    with _pytest.raises(ValueError):
        perplexity_buckets(df, n_buckets=0)
    with _pytest.raises(ValueError):
        perplexity_buckets(df, method="nope").collect()
    # default approx thresholds still produce a full partition with
    # non-empty head and tail and 5 custom labels
    out = perplexity_buckets(df, n_buckets=5).collect()
    assert {r.ppl_label for r in out} <= {"b1", "b2", "b3", "b4", "b5"}
    assert len(out) == 30 and {r.ppl_bucket for r in out} >= {1, 5}


def test_bigram_model_matches_python_replay(spark):
    """score_documents_bigram is bit-exact against a pure-Python replay,
    including the two backoff cases: seen context + unseen pair (keeps
    the context denominator) and wholly unseen context (c1 = 0)."""
    import math
    from collections import Counter

    import pytest

    from kinesiscat_spark.operators.text import (
        bigram_model,
        score_documents_bigram,
    )

    train_texts = ["the cat sat", "the cat ran", "dogs bark loud"]
    train = spark.createDataFrame(
        list(enumerate(train_texts)), ["doc_id", "text"]
    )
    score_texts = {10: "the cat sat", 11: "cat bark the", 12: "zeb qux the cat"}
    score = spark.createDataFrame(
        [(d, t) for d, t in score_texts.items()], ["doc_id", "text"]
    )
    m = bigram_model(train, k=0.5, lam=0.7)
    got = {
        r.doc_id: r.avg_logp2
        for r in score_documents_bigram(score, m).collect()
    }

    toks = [t.split() for t in train_texts]
    uni = Counter(w for t in toks for w in t)
    n, v, k, lam = sum(uni.values()), len(uni), 0.5, 0.7
    bi = Counter((t[i], t[i + 1]) for t in toks for i in range(len(t) - 1))
    c1 = Counter()
    for (a, _), c in bi.items():
        c1[a] += c

    def pu(w):
        return (uni.get(w, 0) + k) / (n + k * v)

    def pb(a, b):
        return (bi.get((a, b), 0) + k) / (c1.get(a, 0) + k * v)

    for d, text in score_texts.items():
        t = text.split()
        lps = [math.log(pu(t[0]))] + [
            math.log(lam * pb(t[i - 1], t[i]) + (1 - lam) * pu(t[i]))
            for i in range(1, len(t))
        ]
        want = sum(sorted(lps)) / len(t)
        assert got[d] == pytest.approx(want, abs=1e-12), d


def test_bigram_prefers_in_distribution_order(spark):
    """Scrambling word ORDER hurts the bigram score but not the unigram:
    the bigram model actually uses context."""
    import pytest

    from kinesiscat_spark.operators.text import (
        bigram_model,
        score_documents,
        score_documents_bigram,
    )

    base = "the quick brown fox jumps over the lazy dog " * 3
    train = spark.createDataFrame(
        [(i, base) for i in range(4)], ["doc_id", "text"]
    )
    m = bigram_model(train)
    words = base.split()
    scrambled = " ".join(reversed(words))
    probe = spark.createDataFrame(
        [(0, base.strip()), (1, scrambled)], ["doc_id", "text"]
    )
    bg = {r.doc_id: r.avg_logp2 for r in score_documents_bigram(probe, m).collect()}
    un = {
        r.doc_id: r.avg_logp for r in score_documents(probe, m.unigram).collect()
    }
    assert bg[0] > bg[1]  # in-order text scores higher under the bigram
    assert un[0] == pytest.approx(un[1], abs=1e-9)  # unigram is order-blind


def test_perplexity_buckets_single_bucket_and_null_scores(spark):
    """n_buckets=1 is a constant bucket (the thresholds path would build
    approx_percentile(score, array()) → NULL buckets everywhere), and
    NULL-score rows stay UNBUCKETED in both methods instead of being
    dumped in the worst tier (ADVICE r6)."""
    from kinesiscat_spark.operators.text import perplexity_buckets

    df = spark.createDataFrame(
        [(1, -1.0), (2, -2.0), (3, -3.0), (4, None)],
        "doc_id long, avg_logp double",
    )
    for method in ("thresholds", "rank"):
        one = {
            r.doc_id: (r.ppl_bucket, r.ppl_label)
            for r in perplexity_buckets(df, n_buckets=1, method=method).collect()
        }
        assert one[1] == (1, "b1") and one[2] == (1, "b1")
        assert one[4] == (None, None), method

        three = {
            r.doc_id: r.ppl_bucket
            for r in perplexity_buckets(df, n_buckets=3, method=method).collect()
        }
        assert three[4] is None, method
        # scored rows all land in a tier; under rank (deterministic) the
        # NULL row must not widen the tail — n counts scored rows only
        assert all(three[i] is not None for i in (1, 2, 3)), method
        if method == "rank":
            assert sorted(three[i] for i in (1, 2, 3)) == [1, 2, 3]


def test_bigram_scoring_size_switches_off_broadcast(spark):
    """A bigram LM whose type count exceeds broadcast_rows must score
    through UNHINTED joins (no BroadcastHashJoin on the model tables) and
    produce the identical scores (VERDICT r6 #4: nothing guarded against
    training on a corpus where bigram types ≈ tokens)."""
    import random

    from kinesiscat_spark.operators.text import (
        bigram_model,
        score_documents_bigram,
    )

    rng = random.Random(7)
    # a deliberately large synthetic vocab: ~2k distinct words, mostly
    # unique bigrams
    rows = [
        (i, " ".join(f"w{rng.randrange(2000)}" for _ in range(30)))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = bigram_model(docs, k=0.5, lam=0.7)
    assert model.n_bi is not None and model.n_bi > 1000

    hinted = score_documents_bigram(docs, model)  # under default threshold
    unhinted = score_documents_bigram(docs, model, broadcast_rows=10)
    plan_h = hinted._jdf.queryExecution().executedPlan().toString()
    plan_u = unhinted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_h
    assert "BroadcastHashJoin" not in plan_u  # the non-broadcast path
    a = {r.doc_id: r.avg_logp2 for r in hinted.collect()}
    b = {r.doc_id: r.avg_logp2 for r in unhinted.collect()}
    assert a == b


def test_vocab_coverage_exact_values(spark):
    """Hand-computable corpus: counts a=4 b=3 c=2 d=1 (total 10) ->
    50% needs {a, b} (7/10), 90% needs {a,b,c} (9/10), 99% all four."""
    from kinesiscat_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b d"), (3, "a b c")],
        "doc_id long, text string",
    )
    got = {
        r.target: (r.vocab_size, r.coverage)
        for r in vocab_coverage(docs, targets=(0.5, 0.9, 0.99)).collect()
    }
    assert got[0.5] == (2, 0.7)
    assert got[0.9] == (3, 0.9)
    assert got[0.99] == (4, 1.0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vocab_coverage(docs, targets=())
    with _pytest.raises(ValueError):
        vocab_coverage(docs, targets=(1.5,))


def test_zipf_fit_exact_power_law(spark):
    """A corpus whose rank-frequency curve is EXACTLY freq = 64 / rank
    must fit slope -1, intercept ln(64), on all ranked points."""
    import math

    words = []
    for rank, freq in enumerate((12, 6, 4, 3), start=1):  # freq = 12/rank
        words += [f"w{rank:02d}"] * freq
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    from kinesiscat_spark.operators.text import zipf_fit

    got = {r.stat: r for r in zipf_fit(docs, top_n=512).collect()}
    assert got["slope"].n_points == 4
    assert abs(got["slope"].value + 1.0) < 1e-6
    assert abs(got["intercept"].value - math.log(12.0)) < 1e-6

    exact = []
    for rank, freq in enumerate((27, 9, 3, 1), start=1):  # freq = 27/3^r
        exact += [f"w{rank}"] * freq
    docs3 = spark.createDataFrame(
        [(1, " ".join(exact))], "doc_id long, text string"
    )
    got3 = {r.stat: r for r in zipf_fit(docs3, top_n=4).collect()}
    # ln(27/3^(rank-1)) = ln(81) - rank*ln(3) against x=ln(rank) is NOT
    # linear; but slope must be negative and n_points respects top_n
    assert got3["slope"].n_points == 4
    assert got3["slope"].value < 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zipf_fit(docs, top_n=1)


def test_kneser_ney_hand_computed(spark):
    """KN arithmetic on a corpus small enough to do by hand.

    Train on one doc "a b a c": pairs (a,b),(b,a),(a,c) each once;
    ctx a: c1=2 n1f=2, b: c1=1 n1f=1; fan-ins all 1; n_types=3, V=3;
    p_cont(seen w) = (1+0.5)/(3+0.5*3) = 1/3, p_cont(OOV) = 0.5/4.5."""
    import math

    from kinesiscat_spark.operators.text import (
        kneser_ney_model,
        score_documents_kn,
    )

    train = spark.createDataFrame(
        [("t1", "a b a c")], "doc_id string, text string"
    )
    model = kneser_ney_model(train, d=0.75, k=0.5)
    assert model.n_types == 3.0 and model.v == 3.0

    docs = spark.createDataFrame(
        [("d1", "a b"), ("d2", "c z")], "doc_id string, text string"
    )
    got = {r.doc_id: r for r in score_documents_kn(docs, model).collect()}
    # d1: first token a -> p_cont(a)=1/3; "b" after seen ctx "a":
    # max(1-0.75,0)/2 + 0.75*(2/2)*(1/3) = 0.125 + 0.25 = 0.375
    exp_d1 = (math.log(1.5 / 4.5) + math.log(0.375)) / 2
    assert abs(got["d1"].avg_logp_kn - exp_d1) < 1e-12
    # d2: first token c -> 1/3; "z" after ctx "c" (NEVER a context) and
    # z OOV -> p_cont(z) = 0.5/4.5
    exp_d2 = (math.log(1.5 / 4.5) + math.log(0.5 / 4.5)) / 2
    assert abs(got["d2"].avg_logp_kn - exp_d2) < 1e-12

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kneser_ney_model(train, d=1.5)


def test_zipf_fit_matches_numpy_lstsq(spark):
    """On random corpora the fold-order fit must agree with numpy's
    least-squares solution to ~1e-9 (same math, different summation
    order), including the top_n truncation and (count DESC, word)
    tie-break."""
    import random

    import numpy as np

    from kinesiscat_spark.operators.text import zipf_fit

    rng = random.Random(41)
    vocab = [f"t{i}" for i in range(60)]
    words = [vocab[min(int(rng.expovariate(0.08)), 59)] for _ in range(3000)]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 300: (i + 1) * 300])) for i in range(10)],
        "doc_id long, text string",
    )
    for top_n in (8, 512):
        got = {r.stat: r.value for r in zipf_fit(docs, top_n=top_n).collect()}
        from collections import Counter

        counts = Counter(w for i in range(10) for w in words[i * 300: (i + 1) * 300])
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
        x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
        y = np.log(np.array([c for _, c in ranked], dtype=float))
        slope, icpt = np.polyfit(x, y, 1)
        assert abs(got["slope"] - round(slope, 6)) <= 2e-6
        assert abs(got["intercept"] - round(icpt, 6)) <= 2e-6


def test_class_tfidf_distinctive_terms(spark):
    """c-TF-IDF surfaces each class's DISTINCTIVE terms: a term unique to
    one class tops that class even when a shared term is more frequent,
    and validation rejects top_k < 1."""
    import pytest

    from kinesiscat_spark.operators.text import class_tfidf

    docs = spark.createDataFrame(
        [
            ("a", "s1", "common common common zebra zebra"),
            ("b", "s1", "common zebra"),
            ("c", "s2", "common common common yak"),
            ("d", "s2", "common yak yak"),
        ],
        "doc_id string, source string, text string",
    )
    out = class_tfidf(docs, top_k=2).collect()
    top = {
        r.group: r.term for r in out if r.rank == 1
    }
    assert top == {"s1": "zebra", "s2": "yak"}
    # ranks dense per class, scores positive
    assert sorted((r.group, r.rank) for r in out) == [
        ("s1", 1), ("s1", 2), ("s2", 1), ("s2", 2)
    ]
    assert all(r.score > 0 for r in out)
    with pytest.raises(ValueError):
        class_tfidf(docs, top_k=0)


def test_pmi_collocations_hand_computed(spark):
    """PMI on a 2-doc corpus replays Church & Hanks' formula with the
    operator's exact fold order (the five-ln sum), ties break gram-asc,
    and the min_count floor drops singleton pairs."""
    import math

    import pytest

    from kinesiscat_spark.operators.text import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x z q"), (3, None)],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=1, top_k=10).collect()
    # words: x y x y | x z q -> N=7; bigrams: x y, y x, x y | x z, z q -> M=5
    n, m = 7, 5
    uni = {"x": 3, "y": 2, "z": 1, "q": 1}
    pairs = {"x y": 2, "y x": 1, "x z": 1, "z q": 1}

    def pmi(g, c):
        a, b = g.split(" ")
        return round(
            math.log(c) - math.log(uni[a]) - math.log(uni[b])
            + 2.0 * math.log(n) - math.log(m),
            6,
        )

    got = {r.gram: (r.cnt, r.pmi) for r in out}
    assert got == {g: (c, pmi(g, c)) for g, c in pairs.items()}
    # ordering: pmi desc, gram asc ("x y" and "x z" tie at ln(49/15))
    assert [r.gram for r in out] == ["z q", "x y", "x z", "y x"]
    # the floor drops every singleton pair
    only = pmi_collocations(docs, min_count=2, top_k=10).collect()
    assert [(r.gram, r.cnt) for r in only] == [("x y", 2)]
    with pytest.raises(ValueError):
        pmi_collocations(docs, min_count=0)
    with pytest.raises(ValueError):
        pmi_collocations(docs, top_k=0)


def test_rm3_expansion_recalls_feedback_vocabulary(spark):
    """RM3's selling point: a document that never mentions the query term
    but is rich in the feedback docs' vocabulary enters the second-pass
    ranking; originals keep the alpha floor; validation rejects bad
    params."""
    import pytest

    from kinesiscat_spark.operators.text import rm3_terms, rm3_topk

    rows = [
        (1, "kernel kernel gpu cuda"),
        (2, "kernel gpu cuda memory"),
        (3, "gpu cuda memory bandwidth"),   # no 'kernel' — expansion bait
        (4, "recipe flour sugar butter"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = {
        r.term: (r.weight, r.is_original)
        for r in rm3_terms(
            docs, ("kernel",), fb_docs=2, fb_terms=2, alpha=0.5
        ).collect()
    }
    assert model["kernel"][1] is True
    exp = {t for t, (_, orig) in model.items() if not orig}
    assert exp <= {"gpu", "cuda", "memory"} and len(exp) == 2
    assert all(w > 0 for w, _ in model.values())
    out = rm3_topk(docs, ("kernel",), 4, fb_docs=2, fb_terms=2, alpha=0.5)
    ranked = [r.doc_id for r in out.collect()]
    assert 3 in ranked          # recalled purely via expansion terms
    assert 4 not in ranked      # unrelated doc stays out
    with pytest.raises(ValueError):
        rm3_terms(docs, ("kernel",), fb_docs=0)
    with pytest.raises(ValueError):
        rm3_terms(docs, ("kernel",), fb_terms=0)
    with pytest.raises(ValueError):
        rm3_terms(docs, ("kernel",), alpha=1.5)
    with pytest.raises(ValueError):
        rm3_topk(docs, ("kernel",), 0)


def test_fim_transform_psm_reassembly(spark):
    """FIM: applied docs carry all three pieces in PSM order and the
    pieces reassemble the original text exactly; untouched docs (rate 0
    or too short) pass through verbatim including NULL."""
    import pytest

    from kinesiscat_spark.operators.text import fim_transform

    docs = spark.createDataFrame(
        [(i, "abcdefghij") for i in range(40)] + [(100, "x"), (101, None)],
        "doc_id long, text string",
    )
    out = {r.id: r for r in fim_transform(docs, rate=0.6, salt=7).collect()}
    assert out[100].applied is False and out[100].fim_text == "x"
    assert out[101].applied is False and out[101].fim_text is None
    applied = [r for r in out.values() if r.applied]
    assert applied and len(applied) < 42          # the gate actually splits
    for r in applied:
        assert r.n_prefix + r.n_middle + r.n_suffix == 10
        assert r.fim_text.startswith("<PRE>")
        body = r.fim_text[len("<PRE>"):]
        pre, rest = body.split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == "abcdefghij"    # pieces reassemble
        assert len(pre) == r.n_prefix and len(mid) == r.n_middle
    # deterministic across reruns
    again = {r.id: r.fim_text
             for r in fim_transform(docs, rate=0.6, salt=7).collect()}
    assert again == {i: r.fim_text for i, r in out.items()}
    # rate 0 / rate 1 bounds + validation
    none = fim_transform(docs, rate=0.0).filter("applied").count()
    assert none == 0
    allr = fim_transform(docs, rate=1.0).filter("applied").count()
    assert allr == 40                             # every len>=2 doc
    with pytest.raises(ValueError):
        fim_transform(docs, rate=1.5)


def test_corpus_card_aggregates(spark):
    """Corpus card: exact per-source totals, dominant language by
    (count desc, lang asc) tie-break, NULL text counted as empty."""
    from kinesiscat_spark.operators.text import corpus_card

    docs = spark.createDataFrame(
        [
            ("a", "en", "one two three"),
            ("a", "de", "eins zwei"),
            ("a", "en", None),
            ("b", "fr", "un"),
            ("b", "de", "drei vier"),
        ],
        "source string, lang string, text string",
    )
    got = {r.group: r for r in corpus_card(docs).collect()}
    assert got["a"].n_docs == 3 and got["a"].n_tokens == 5
    assert got["a"].n_langs == 2
    assert got["a"].top_lang == "en" and got["a"].top_lang_share == round(2 / 3, 6)
    # b: fr and de tie at 1 doc each -> lexicographically smaller 'de'
    assert got["b"].top_lang == "de" and got["b"].top_lang_share == 0.5


def test_rm3_degrades_to_query_model_without_feedback(spark):
    """No document matches the query: the relevance model is empty and
    the interpolation degrades to the alpha/|Q| query weights (no NaN)."""
    from kinesiscat_spark.operators.text import rm3_terms

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    model = rm3_terms(docs, ("zzz",), fb_docs=3, fb_terms=2, alpha=0.5)
    rows = model.collect()
    assert [(r.term, r.weight, r.is_original) for r in rows] == [
        ("zzz", 0.5, True)
    ]


def test_fused_bigram_kn_scorer_matches_separate(spark):
    """score_documents_bigram_kn (round 9 — one positions explode + one
    per-doc aggregate for both LM folds) is bit-exact against running
    score_documents_bigram and score_documents_kn separately, including
    OOV tokens, unseen contexts, and single-token documents."""
    from kinesiscat_spark.operators.text import (
        bigram_model,
        kneser_ney_model,
        score_documents_bigram,
        score_documents_bigram_kn,
        score_documents_kn,
    )

    train_texts = ["the cat sat", "the cat ran", "dogs bark loud"]
    train = spark.createDataFrame(
        list(enumerate(train_texts)), ["doc_id", "text"]
    )
    score_texts = {
        10: "the cat sat",
        11: "cat bark the",
        12: "zeb qux the cat",
        13: "solo",
    }
    score = spark.createDataFrame(
        [(d, t) for d, t in score_texts.items()], ["doc_id", "text"]
    )
    bm = bigram_model(train, k=0.5, lam=0.7)
    km = kneser_ney_model(train, d=0.75, k=0.5)
    fused = {
        r.doc_id: r for r in score_documents_bigram_kn(score, bm, km).collect()
    }
    sep_b = {
        r.doc_id: r for r in score_documents_bigram(score, bm).collect()
    }
    sep_k = {r.doc_id: r for r in score_documents_kn(score, km).collect()}
    assert set(fused) == set(score_texts)
    for d in score_texts:
        assert fused[d].n_tokens == sep_b[d].n_tokens
        assert fused[d].avg_logp2 == sep_b[d].avg_logp2, d
        assert fused[d].avg_logp_kn == sep_k[d].avg_logp_kn, d


def test_kn_model_store_roundtrip(spark, tmp_path):
    """save_kn → load_kn reproduces identical KN scores (the round-9
    content-keyed KN artifact behind the quality lane)."""
    from kinesiscat_spark.operators.model_store import load_kn, save_kn
    from kinesiscat_spark.operators.text import (
        kneser_ney_model,
        score_documents_kn,
    )

    train = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran"), (2, "dogs bark loud")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zeb the cat")], ["doc_id", "text"]
    )
    km = kneser_ney_model(train, d=0.75, k=0.5)
    save_kn(spark, km, str(tmp_path / "kn"))
    loaded = load_kn(spark, str(tmp_path / "kn"))
    assert loaded.n_types == km.n_types and loaded.v == km.v
    assert loaded.d == km.d and loaded.k == km.k
    want = {r.doc_id: r.avg_logp_kn
            for r in score_documents_kn(docs, km).collect()}
    got = {r.doc_id: r.avg_logp_kn
           for r in score_documents_kn(docs, loaded).collect()}
    assert got == want
