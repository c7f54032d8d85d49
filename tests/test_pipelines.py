"""End-to-end corpus curation pipeline."""

from __future__ import annotations

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.pipelines import CurationConfig, curate
from tests.conftest import SF_ORACLE


def test_curate_monotone_and_deduped(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    cfg = CurationConfig(min_tokens=5, near_dup_threshold=0.5, stage_counts={})
    out = curate(docs, cfg)
    counts = cfg.stage_counts
    # every stage only removes rows
    order = ["input", "quality", "exact_dedup", "near_dedup"]
    for a, b in zip(order, order[1:]):
        assert counts[b] <= counts[a], counts
    # near-dup dedup actually fired (the corpus has minhash near-dups;
    # exact dups may or may not exist at this SF)
    assert counts["near_dedup"] < counts["input"]
    # result has no exact duplicates left
    n = out.count()
    assert out.select("text").distinct().count() == n
    assert n == counts["near_dedup"]


def test_curate_sampling_stage(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    cfg = CurationConfig(min_tokens=1, sample_fraction=0.5, stage_counts={})
    out = curate(docs, cfg)
    assert 0 < out.count() < cfg.stage_counts["near_dedup"]
    # deterministic: rerun selects the same documents
    cfg2 = CurationConfig(min_tokens=1, sample_fraction=0.5)
    again = curate(docs, cfg2)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_curate_default_is_lazy(spark, monkeypatch):
    """Default curate() must build ONE lazy plan: no action (count/collect)
    may run while composing — audit is strictly opt-in (VERDICT r2 #2)."""
    from pyspark.sql import DataFrame

    docs = load_table(spark, SF_ORACLE, "documents")
    actions: list[str] = []
    real_count = DataFrame.count

    def spy_count(self):
        actions.append("count")
        return real_count(self)

    monkeypatch.setattr(DataFrame, "count", spy_count)
    out = curate(docs)  # default cfg: no stage_counts dict
    assert actions == [], "default curate() triggered eager actions"
    monkeypatch.undo()
    # the composed plan still executes and dedupes
    n = out.count()
    assert 0 < n <= docs.count()
    # opt-in audit still records every stage
    cfg = CurationConfig(stage_counts={})
    curate(docs, cfg)
    assert set(cfg.stage_counts) == {
        "input", "quality", "repetition", "gopher", "blocklist", "language",
        "pii", "decontaminate", "exact_dedup", "near_dedup",
    }


def test_curate_language_gate(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    cfg = CurationConfig(min_tokens=1, keep_langs=("en",))
    out = curate(docs, cfg)
    assert 0 < out.count() < docs.count()


def test_curate_repetition_pii_decontamination_gates(spark):
    from pyspark.sql import functions as F

    def filler(tag):  # distinct per doc: keeps top-2-gram frac low without
        return " ".join(f"{tag}{i}" for i in range(40))  # creating near-dups

    rows = [
        (1, f"alpha beta gamma delta epsilon zeta eta theta {filler('a')}"),
        (2, "spam spam spam spam spam spam spam spam"),          # repetitive
        (3, f"write to admin@site.example.org for details {filler('b')}"),  # PII
        (4, f"the quick brown fox jumps over the lazy dog {filler('c')}"),
        (5, f"totally unrelated clean document text goes here {filler('d')}"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], ["text"]
    )
    cfg = CurationConfig(
        min_tokens=1,
        near_dup_threshold=0.99,
        max_top_ngram_char_frac=0.2,
        pii_policy="drop",
        benchmark=bench,
        contamination_ngram=5,
        stage_counts={},
    )
    kept = {r.doc_id for r in curate(docs, cfg).collect()}
    assert 2 not in kept  # repetition gate
    assert 3 not in kept  # pii drop
    assert 4 not in kept  # contaminated vs benchmark
    assert {1, 5} <= kept
    c = cfg.stage_counts
    assert c["repetition"] == c["quality"] - 1
    assert c["pii"] == c["repetition"] - 1
    assert c["decontaminate"] == c["pii"] - 1

    # redact policy keeps the doc but masks the address
    cfg2 = CurationConfig(min_tokens=1, near_dup_threshold=0.99, pii_policy="redact")
    red = {r.doc_id: r.text for r in curate(docs, cfg2).collect()}
    assert 3 in red and "admin@site.example.org" not in red[3]
    assert "<PII>" in red[3]


def test_curate_gopher_gate(spark):
    from kinesiscat_spark.pipelines import gopher_gate

    docs = load_table(spark, SF_ORACLE, "documents")
    total = docs.count()
    # corpus-adapted stopword set (the synthetic vocabulary lacks the
    # published one); published thresholds otherwise — the 50-word rule
    # drops roughly half of this corpus
    cfg_on = CurationConfig(gopher_rules=True, gopher_stopwords=("the", "a"))
    n_on = gopher_gate(docs, cfg_on).count()
    assert 0 < n_on < total
    # gate off (default) is the identity
    assert gopher_gate(docs, CurationConfig()).count() == total
    # and the full pipeline with the gate on never keeps more than the
    # gate alone allows
    assert curate(docs, cfg_on).count() <= n_on


def test_curate_semantic_decontaminate_stage(spark):
    """curate() with benchmark_embeddings drops exactly the documents
    whose embedding is within semantic_tau of a benchmark vector."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.curation import (
        semantic_contamination_report,
    )
    from kinesiscat_spark.pipelines import CurationConfig, curate
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    bench = emb.filter(F.col("vec_id") % 9 == 0)
    cfg = CurationConfig(
        min_tokens=1,
        benchmark_embeddings=bench,
        corpus_embeddings=emb,
        semantic_tau=0.4,
    )
    got = sorted(r.doc_id for r in curate(docs, cfg).select("doc_id").collect())
    flagged = {
        r.id for r in semantic_contamination_report(emb, bench, 0.4).collect()
    }
    # equivalent composition: drop flagged docs BEFORE the pipeline (the
    # stage runs before dedup, so post-hoc filtering of the base result
    # would differ — removing a near-dup cluster's canonical shifts which
    # member the dedup keeps)
    base = CurationConfig(min_tokens=1)
    pre = docs.filter(~F.col("doc_id").isin([int(i) for i in flagged]))
    want = sorted(r.doc_id for r in curate(pre, base).select("doc_id").collect())
    assert flagged and got == want
    assert not (set(got) & flagged)  # no flagged doc survives
    assert 0 < len(got) < docs.count()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate(docs, CurationConfig(benchmark_embeddings=bench))


def test_curate_line_dedup_stage(spark):
    """curate() with line_dedup_min_docs rewrites documents to their
    surviving lines (boilerplate lines in >= k docs removed everywhere)."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.pipelines import CurationConfig, curate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta\nSUBSCRIBE NOW"),
            (2, "epsilon zeta eta theta\nSUBSCRIBE NOW"),
            (3, "iota kappa lambda mu"),
        ],
        "doc_id long, text string",
    )
    cfg = CurationConfig(min_tokens=1, line_dedup_min_docs=2)
    got = {r.doc_id: r.text for r in curate(docs, cfg).collect()}
    assert got[1] == "alpha beta gamma delta"
    assert got[2] == "epsilon zeta eta theta"
    assert got[3] == "iota kappa lambda mu"


def test_attrition_report_funnel(spark):
    """attrition_report: one row per composed stage in pipeline order,
    monotone non-increasing counts through the gate stages, and counts
    that agree with the (multi-job) stage_counts audit."""
    from kinesiscat_spark.pipelines import (
        CurationConfig,
        attrition_report,
        curate,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", 10),
            (2, "alpha beta gamma delta epsilon zeta", 10),  # exact dup
            (3, "x", 1),                                     # too short
            (4, None, 0),
        ],
        "doc_id long, text string, n_chars long",
    )
    cfg = CurationConfig(min_tokens=3)
    rep = attrition_report(docs, cfg).collect()
    ordered = sorted(rep, key=lambda r: r.stage_idx)
    assert ordered[0].stage == "input" and ordered[0].n_docs == 4
    names = [r.stage for r in ordered]
    assert names.index("quality") < names.index("exact_dedup")
    counts = [r.n_docs for r in ordered]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert dict((r.stage, r.n_docs) for r in rep)["exact_dedup"] == 1

    audit_cfg = CurationConfig(min_tokens=3, stage_counts={})
    curate(docs, audit_cfg)
    assert {r.stage: r.n_docs for r in rep} == audit_cfg.stage_counts
