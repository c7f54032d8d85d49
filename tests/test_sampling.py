"""Deterministic content-hash sampling: reproducibility is the contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.sampling import (
    exact_stratified_sample,
    hash_sample,
    mix_corpora,
    stratified_sample,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_ORACLE, "documents")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = _ids(hash_sample(docs, 0.3, ["doc_id"]))
    b = _ids(hash_sample(docs.repartition(7), 0.3, ["doc_id"]))
    assert a == b and a  # same rows regardless of partitioning
    # roughly the requested fraction (binomial, 500 docs)
    assert 0.2 < len(a) / docs.count() < 0.4


def test_hash_sample_salts_draw_independent_samples(docs):
    a = set(_ids(hash_sample(docs, 0.3, ["doc_id"], salt=1)))
    b = set(_ids(hash_sample(docs, 0.3, ["doc_id"], salt=2)))
    assert a != b
    # overlap near fraction^2, far from identical
    assert len(a & b) < 0.75 * min(len(a), len(b))


def test_stratified_fractions_respected(docs):
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep_all, keep_none = langs[0], langs[1]
    out = stratified_sample(
        docs, "lang", {keep_all: 1.0, keep_none: 0.0}, ["doc_id"]
    )
    got = {r.lang for r in out.select("lang").distinct().collect()}
    assert keep_all in got and keep_none not in got
    n_all = docs.filter(F.col("lang") == keep_all).count()
    assert out.filter(F.col("lang") == keep_all).count() == n_all


def test_exact_stratified_sample_counts(docs):
    out = exact_stratified_sample(docs, "lang", 5, ["doc_id"])
    counts = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in counts.items():
        assert n == min(5, sizes[lang])
    # deterministic: same selection on rerun
    assert _ids(out) == _ids(exact_stratified_sample(docs, "lang", 5, ["doc_id"]))


def test_mix_corpora_weights_and_tags(docs):
    half = docs.filter(F.col("doc_id") % 2 == 0)
    out = mix_corpora([(docs, 0.2), (half, 1.0)], ["doc_id"])
    by_src = {
        r.source_id: r.n
        for r in out.groupBy("source_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_src[1] == half.count()  # weight 1.0 keeps everything
    assert 0 < by_src[0] < docs.count() // 2  # ~20% of source 0


def test_md5_method_matches_duckdb_selection(spark):
    """The md5 hash method exists for cross-engine reproducibility: the
    exact same rows must be selected by the equivalent DuckDB predicate
    (this is what makes the sampling_mix driver lane hash-checkable)."""
    import duckdb

    from kinesiscat_spark.operators.sampling import hash_sample, md5_threshold

    docs = load_table(spark, SF_SMOKE, "documents")
    got = sorted(
        r.doc_id
        for r in hash_sample(docs, 0.3, ["doc_id"], salt=3, method="md5")
        .select("doc_id")
        .collect()
    )
    con = duckdb.connect()
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{SF_SMOKE}/documents.parquet' "
            f"WHERE substr(md5(doc_id || chr(31) || '3'), 1, 12) "
            f"< '{md5_threshold(0.3)}'"
        ).fetchall()
    )
    assert got == want and got


def test_deterministic_shuffle_is_partition_invariant(spark):
    from kinesiscat_spark.operators.sampling import deterministic_shuffle

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in deterministic_shuffle(df.repartition(1), ["doc_id"], salt=3).collect()]
    b = [r.doc_id for r in deterministic_shuffle(df.repartition(17), ["doc_id"], salt=3).collect()]
    assert a == b
    assert a != sorted(a)  # actually shuffled, not id order
    c = [r.doc_id for r in deterministic_shuffle(df, ["doc_id"], salt=4).collect()]
    assert c != a  # independent order per salt
    assert sorted(c) == sorted(a)


def test_deterministic_shuffle_md5_matches_python(spark):
    """The md5 order reproduces outside Spark: sort by the same prefix."""
    import hashlib

    from kinesiscat_spark.operators.sampling import deterministic_shuffle

    df = spark.range(50).withColumnRenamed("id", "doc_id")
    got = [r.doc_id for r in deterministic_shuffle(df, ["doc_id"], salt=7).collect()]
    want = sorted(
        range(50),
        key=lambda i: (hashlib.md5(f"{i}\x1f7".encode()).hexdigest()[:12], i),
    )
    assert got == want


def test_split_leakage_report(spark):
    from pyspark.sql import functions as F

    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.dedup import minhash_lsh_pairs
    from kinesiscat_spark.operators.sampling import (
        hash_split,
        split_leakage_report,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    split_docs = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1},
        key_cols=["doc_id"], salt=11, method="md5",
    )
    leaks = split_leakage_report(split_docs).collect()
    all_pairs = {
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()
    }
    # every leak is a real candidate pair and straddles splits
    assert leaks, "corpus has near-dups; some must straddle an 80/10/10 split"
    for r in leaks:
        assert (r.id_a, r.id_b) in all_pairs
        assert r.split_a != r.split_b
    # a near-dup-free corpus reports nothing: docs with unique texts
    clean = spark.createDataFrame(
        [(i, " ".join(f"u{i}w{j}" for j in range(20))) for i in range(50)],
        ["doc_id", "text"],
    )
    clean_split = hash_split(
        clean, {"train": 0.5, "test": 0.5}, key_cols=["doc_id"]
    )
    assert split_leakage_report(clean_split).count() == 0


def test_exact_stratified_sample_md5_method(docs):
    """method='md5' selects a deterministic per-stratum quota that is
    engine-replayable (the sampling_mix kind='strat' oracle) and differs
    from the xxhash64 ranking only in ORDER, never in count."""
    from kinesiscat_spark.operators.sampling import exact_stratified_sample

    out = exact_stratified_sample(
        docs, "lang", 5, ["doc_id"], salt=23, method="md5"
    )
    per = {
        r.lang: r.n for r in out.groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    full = {
        r.lang: r.n for r in docs.groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    for lang, n in per.items():
        assert n == min(5, full[lang])
    # determinism across reruns
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in exact_stratified_sample(
            docs, "lang", 5, ["doc_id"], salt=23, method="md5"
        ).collect()
    )
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        exact_stratified_sample(docs, "lang", 5, ["doc_id"], method="crc")


def test_prototype_prune_keep_hard(spark):
    """Nearest-prototype assignment, hardest-first keep, NULL/ragged
    dropped, lowest-cell tie-break."""
    import pytest

    from kinesiscat_spark.operators.sampling import prototype_prune

    protos = [[0.0, 0.0], [10.0, 0.0]]
    rows = [
        (1, [1.0, 0.0]),    # cell 0, d2=1
        (2, [3.0, 0.0]),    # cell 0, d2=9  (hardest in cell 0)
        (3, [0.5, 0.0]),    # cell 0, d2=0.25
        (4, [9.0, 0.0]),    # cell 1, d2=1
        (5, [7.0, 0.0]),    # cell 1, d2=9  (hardest in cell 1)
        (6, [5.0, 0.0]),    # equidistant (d2=25) -> tie, lowest cell 0
        (7, None),          # NULL -> dropped
        (8, [1.0, 0.0, 0.0]),  # ragged -> dropped
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        r.id: (r.cell, r.dist2)
        for r in prototype_prune(emb, protos, keep_per_cell=2).collect()
    }
    # cell 0 hardest two: id 6 (25) then id 2 (9); cell 1: id 5 (9), id 4 (1)
    assert got == {
        6: (0, 25.0),
        2: (0, 9.0),
        5: (1, 9.0),
        4: (1, 1.0),
    }
    with pytest.raises(ValueError):
        prototype_prune(emb, protos, keep_per_cell=0)
    with pytest.raises(ValueError):
        prototype_prune(emb, [[0.0], [1.0, 2.0]], keep_per_cell=1)


def test_unimax_water_fill_budgets(spark):
    """Small source capped at max_epochs·n, leftover pools to the large
    one; selections are the deterministic token-budget prefixes."""
    import pytest

    from kinesiscat_spark.operators.sampling import (
        mix_corpora_unimax,
        token_budget_sample,
    )

    small = spark.createDataFrame(
        [(f"s{i}", "a b c") for i in range(10)],  # 30 tokens
        "doc_id string, text string",
    )
    big = spark.createDataFrame(
        [(f"b{i}", "a b c d e f g h i j") for i in range(30)],  # 300 tokens
        "doc_id string, text string",
    )
    out = mix_corpora_unimax([small, big], 200, max_epochs=2.0, salt=7)
    rows = out.collect()
    by_src = {0: [], 1: []}
    for r in rows:
        by_src[r.source_id].append(r)
    # water-fill: small first (30 < 300), cap 2*30=60 < fair 100 -> 60;
    # big: min(600, 200-60=140) -> 140
    small_ids = {r.id for r in by_src[0]}
    assert small_ids == {f"s{i}" for i in range(10)}  # 30 <= 60: all kept
    exp_big = {
        r.id
        for r in token_budget_sample(big, 140, salt=8).collect()
    }
    assert {r.id for r in by_src[1]} == exp_big
    with pytest.raises(ValueError):
        mix_corpora_unimax([], 100)
    with pytest.raises(ValueError):
        mix_corpora_unimax([small], 0)
    with pytest.raises(ValueError):
        mix_corpora_unimax([small], 100, max_epochs=0)


def test_unimax_water_fill_properties(spark):
    """Water-fill invariants across regimes: budgets never exceed the
    epoch cap, never exceed the total, all-capped corpora undershoot by
    design, and the small source always gets >= its fair share when
    uncapped."""
    import math

    def water_fill(counts, total, epochs):
        k = len(counts)
        order = sorted(range(k), key=lambda i: (counts[i], i))
        budgets = [0] * k
        rem = float(total)
        for pos, i in enumerate(order):
            fair = rem / (k - pos)
            b = min(float(epochs) * counts[i], fair)
            budgets[i] = int(math.floor(b))
            rem -= b
        return budgets

    # regime 1: everything capped -> sum < total (UniMax undershoots)
    b = water_fill([10, 20, 30], total=1000, epochs=2.0)
    assert b == [20, 40, 60]
    # regime 2: nothing capped -> equal fair shares
    b = water_fill([10_000, 20_000, 30_000], total=300, epochs=4.0)
    assert b == [100, 100, 100]
    # regime 3: mixed — leftover from capped small sources pools upward
    b = water_fill([50, 10_000, 10_000], total=1000, epochs=1.0)
    assert b[0] == 50 and b[1] == b[2] == 475
    for counts, total, epochs in [
        ([3, 7, 11, 1000], 500, 1.5),
        ([0, 5, 5], 100, 2.0),
        ([1], 10, 0.5),
    ]:
        got = water_fill(counts, total, epochs)
        assert sum(got) <= total
        assert all(g <= epochs * c for g, c in zip(got, counts))

    # the Spark operator agrees with the reference water-fill on budgets:
    # three sources in the mixed regime, budget check via selected tokens
    from kinesiscat_spark.operators.sampling import mix_corpora_unimax

    small = spark.createDataFrame(
        [(f"s{i}", "a b c d e") for i in range(10)],  # 50 tokens
        "doc_id string, text string",
    )
    big1 = spark.createDataFrame(
        [(f"x{i}", " ".join(["w"] * 20)) for i in range(500)],
        "doc_id string, text string",
    )
    big2 = spark.createDataFrame(
        [(f"y{i}", " ".join(["w"] * 20)) for i in range(500)],
        "doc_id string, text string",
    )
    out = mix_corpora_unimax([small, big1, big2], 1000, max_epochs=1.0)
    per_src = {
        r.source_id: r.total
        for r in out.groupBy("source_id")
        .agg(__import__("pyspark").sql.functions.sum("n_tokens").alias("total"))
        .collect()
    }
    # small fully selected (50 <= cap 50); each big source's prefix may
    # CROSS its 475 budget by at most one doc (20 tokens)
    assert per_src[0] == 50
    for s in (1, 2):
        assert 475 <= per_src[s] < 475 + 20


def test_weighted_reservoir_sample_proportional_and_deterministic(spark):
    """A-ES: heavier rows are sampled more often across salts, zero/NULL
    weights are never drawn, reruns reproduce the set exactly, and k
    caps the reservoir."""
    import pytest

    from kinesiscat_spark.operators.sampling import weighted_reservoir_sample

    rows = [(i, 100 if i < 5 else 1) for i in range(50)]
    rows += [(90, 0), (91, None)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")

    hits = {i: 0 for i, _ in rows}
    for salt in range(12):
        got = weighted_reservoir_sample(docs, 5, "w", salt=salt).collect()
        assert len(got) == 5
        for r in got:
            hits[r.id] += 1
    assert hits[90] == 0 and hits[91] == 0     # w <= 0 excluded
    heavy = sum(hits[i] for i in range(5))
    light = sum(hits[i] for i in range(5, 50))
    assert heavy > light                       # 500:45 total mass
    a = {r.id for r in weighted_reservoir_sample(docs, 5, "w", salt=3).collect()}
    b = {r.id for r in weighted_reservoir_sample(docs, 5, "w", salt=3).collect()}
    assert a == b                              # rerun-stable
    md = {r.id for r in
          weighted_reservoir_sample(docs, 5, "w", salt=3, method="md5").collect()}
    assert len(md) == 5
    with pytest.raises(ValueError):
        weighted_reservoir_sample(docs, 0, "w")
    with pytest.raises(ValueError):
        weighted_reservoir_sample(docs, 5, "w", method="bogus")


def test_doremi_domain_weights_hand_computed(spark):
    """DoReMi one-step reweighting: weights sum to 1, the domain the
    corpus-level unigram LM finds HARD is upweighted past its token
    share, and the exact values match a pure-Python replay of the
    formula (same value-ordered summation)."""
    import math

    from kinesiscat_spark.operators.sampling import doremi_domain_weights

    rows = [
        (1, "easy", "the the the cat"),
        (2, "easy", "the the dog"),
        (3, "hard", "zyx qwv jkl"),
        (4, "hard", "pqr zyx"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.group: r
        for r in doremi_domain_weights(docs, eta=1.0, k=0.5).collect()
    }

    # pure-Python replay
    toks = [(s, d, w) for d, s, t in rows for w in t.split(" ")]
    from collections import Counter

    c = Counter(w for _, _, w in toks)
    n, v = float(sum(c.values())), float(len(c))
    lp = {w: math.log((cnt + 0.5) / (n + 0.5 * v)) for w, cnt in c.items()}
    per_doc = {}
    for s, d, w in toks:
        per_doc.setdefault((s, d), []).append(lp[w])
    dom = {}
    for (s, _d), lps in per_doc.items():
        acc = 0.0
        for x in sorted(lps):
            acc += x
        dom.setdefault(s, []).append((acc, len(lps)))
    stats = {}
    for s, pairs in dom.items():
        acc = 0.0
        for x in sorted(p[0] for p in pairs):
            acc += x
        stats[s] = (acc, sum(p[1] for p in pairs))
    gs = 0.0
    for x in sorted(slp for slp, _ in stats.values()):
        gs += x
    gn = sum(nt for _, nt in stats.values())
    raws = {
        s: (nt / gn) * math.exp(1.0 * ((-(slp / nt)) - (-(gs / gn))))
        for s, (slp, nt) in stats.items()
    }
    z = 0.0
    for x in sorted(raws.values()):
        z += x
    for s in raws:
        assert got[s].weight == round(raws[s] / z, 9), (s, got[s].weight)
        assert got[s].n_tokens == stats[s][1]
    assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-8
    # the rare-word domain is harder than its token share
    hard_share = stats["hard"][1] / gn
    assert got["hard"].weight > hard_share
    assert got["easy"].weight < stats["easy"][1] / gn

    import pytest

    with pytest.raises(ValueError):
        doremi_domain_weights(docs, eta=0.0)
    with pytest.raises(ValueError):
        doremi_domain_weights(docs, k=-1.0)
    # empty corpus: empty report, not a crash
    empty = spark.createDataFrame(
        [], "doc_id long, source string, text string"
    )
    assert doremi_domain_weights(empty).count() == 0
