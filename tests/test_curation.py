"""Curation operators: Gopher-style repetition signals, PII detection, and
benchmark decontamination — exact-value unit tests plus DuckDB
differentials on the real documents table (same harness as the driver's
t2 gate)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.curation import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    contamination_report,
    dup_ngram_char_frac,
    pii_signals,
    redact_pii,
    repetition_signals,
    top_ngram_char_frac,
    word_ngrams,
)
from tests.conftest import SF_ORACLE
from tools.oracle_check import compare

# DuckDB twin of curation.words / word_ngrams — the single definition lives
# next to the driver lanes so the two can never drift.
from kinesiscat_spark.queries.curation_queries import _ngrams_sql


@pytest.fixture(scope="module")
def synth(spark):
    rows = [
        (0, "a b c\na b c\nx y z\na b c"),           # dup lines
        (1, "one two one two one two one two end"),   # dominant 2-gram
        (2, ""),                                      # empty
        (3, "solo"),                                  # single word
        (4, "mail me at bob.smith+x@corp.example.com or 10.0.0.1 "
            "or +1 555-123-4567 thanks"),
        (5, "unique words only here today friend"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_exact_values(synth):
    out = {
        r.doc_id: r
        for r in synth.withColumn("s", repetition_signals(F.col("text")))
        .select(
            "doc_id",
            F.col("s.n_lines").alias("n_lines"),
            F.col("s.dup_line_frac").alias("dlf"),
            F.col("s.dup_line_char_frac").alias("dlcf"),
            top_ngram_char_frac(F.col("text"), 2).alias("top2"),
            dup_ngram_char_frac(F.col("text"), 2).alias("dup2"),
        )
        .collect()
    }
    # doc 0: 4 lines, 2 distinct -> dup_line_frac = 0.5; "a b c" (len 5)
    # repeats 3x -> 2 duplicated occurrences -> 10 dup chars / 20 total
    assert out[0].n_lines == 4
    assert out[0].dlf == pytest.approx(0.5)
    assert out[0].dlcf == pytest.approx(10 / 20)
    # doc 1: "one two" x4 among 8 bigrams, covered = 4*7=28 of 35 chars
    assert out[1].top2 == pytest.approx(28 / 35)
    # dup2: "one two" 4x (28) + "two one" 3x (21) = 49 -> capped at 1.0
    assert out[1].dup2 == pytest.approx(1.0)
    # empty + single-word docs: all-zero signals, no nulls/NaNs
    for d in (2, 3):
        assert out[d].top2 == 0.0 and out[d].dup2 == 0.0
    assert out[5].dlf == pytest.approx(0.0)


def test_pii_exact_values(synth):
    r = {
        x.doc_id: x
        for x in synth.select(
            "doc_id",
            pii_signals(F.col("text")).alias("p"),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (r[4].p.n_emails, r[4].p.n_ipv4, r[4].p.n_phones) == (1, 1, 1)
    assert "corp.example.com" not in r[4].red
    assert "10.0.0.1" not in r[4].red
    assert "555-123-4567" not in r[4].red
    assert r[4].red.count("<PII>") == 3
    assert (r[0].p.n_emails, r[0].p.n_ipv4, r[0].p.n_phones) == (0, 0, 0)


def test_repetition_matches_duckdb(spark, duck):
    docs = load_table(spark, SF_ORACLE, "documents")
    got = docs.withColumn("s", repetition_signals(F.col("text"))).select(
        "doc_id",
        F.round(top_ngram_char_frac(F.col("text"), 2), 6).alias("top2"),
        F.round(dup_ngram_char_frac(F.col("text"), 3), 6).alias("dup3"),
        F.col("s.dup_line_frac").alias("dlf"),
    )
    g2, g3 = _ngrams_sql("text", 2), _ngrams_sql("text", 3)
    want = duck.sql(
        f"""
        WITH g AS (
          SELECT doc_id, text, {g2} AS grams2, {g3} AS grams3,
                 string_split(text, chr(10)) AS lines
          FROM documents
        )
        SELECT doc_id,
          CASE WHEN len(list_distinct(grams2)) > 0 THEN round(
            (SELECT cnt * len(g) FROM (
               SELECT g, len(list_filter(grams2, x -> x = g)) AS cnt
               FROM unnest(list_distinct(grams2)) AS t(g))
             ORDER BY cnt DESC, g DESC LIMIT 1)
            / greatest(len(text), 1)::double, 6) ELSE 0.0 END AS top2,
          round(least(coalesce((
            SELECT sum(CASE WHEN cnt > 1 THEN cnt * len(g) ELSE 0 END) FROM (
               SELECT g, len(list_filter(grams3, x -> x = g)) AS cnt
               FROM unnest(list_distinct(grams3)) AS t(g))), 0)
            / greatest(len(text), 1)::double, 1.0), 6) AS dup3,
          CASE WHEN len(lines) > 0
               THEN 1.0 - len(list_distinct(lines)) / len(lines)::double
          END AS dlf
        FROM g
        """
    ).df()
    ok, msg = compare(got, want)
    assert ok, msg


def test_pii_matches_duckdb(spark, duck):
    docs = load_table(spark, SF_ORACLE, "documents")
    got = docs.withColumn("p", pii_signals(F.col("text"))).select(
        "doc_id",
        F.col("p.n_emails").alias("n_emails"),
        F.col("p.n_ipv4").alias("n_ipv4"),
        F.col("p.n_phones").alias("n_phones"),
    )
    want = duck.sql(
        f"""
        SELECT doc_id,
          len(regexp_extract_all(text, '{EMAIL_RE}'))::bigint AS n_emails,
          len(regexp_extract_all(text, '{IPV4_RE}'))::bigint AS n_ipv4,
          len(regexp_extract_all(text, '{PHONE_RE}'))::bigint AS n_phones
        FROM documents
        """
    ).df()
    ok, msg = compare(got, want)
    assert ok, msg


def test_contamination_matches_duckdb(spark, duck):
    docs = load_table(spark, SF_ORACLE, "documents")
    # benchmark = substrings of some real docs (guaranteed overlap) plus
    # a disjoint control row
    bench = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 3, 12), " ").alias(
                "text"
            )
        )
        .union(spark.createDataFrame([("zz qq ww ee rr tt yy uu",)], ["text"]))
    )
    got = contamination_report(docs, bench, n=5)
    bench.toPandas().to_parquet("/tmp/curation_bench.parquet")
    g5 = _ngrams_sql("text", 5)
    want = duck.sql(
        f"""
        WITH bg AS (
          SELECT DISTINCT g
          FROM (SELECT unnest({g5}) AS g
                FROM read_parquet('/tmp/curation_bench.parquet'))
        ),
        dg AS (
          SELECT doc_id AS id, unnest(list_distinct({g5})) AS g FROM documents
        ),
        per_doc AS (SELECT id, count(*) AS n_grams FROM dg GROUP BY id),
        hits AS (
          SELECT id, count(*) AS n_gram_hits FROM dg JOIN bg USING (g) GROUP BY id
        )
        SELECT id, n_gram_hits, n_grams,
               round(n_gram_hits / n_grams::double, 6) AS contamination_frac
        FROM per_doc JOIN hits USING (id)
        WHERE n_gram_hits >= 1
        """
    ).df()
    assert got.count() > 0  # the planted substrings must be found
    ok, msg = compare(got, want)
    assert ok, msg


def test_curation_plan_shape(spark, synth):
    """Repetition/PII stay Python-free scan-stage; contamination
    broadcasts the benchmark side."""
    sig = synth.select(
        repetition_signals(F.col("text")).alias("s"),
        pii_signals(F.col("text")).alias("p"),
        top_ngram_char_frac(F.col("text"), 2).alias("t2"),
    )
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # scan-stage: no shuffle at all
    rep = contamination_report(synth, synth.select("text"), n=2)
    jplan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in jplan or "BroadcastExchange" in jplan
    assert "EvalPython" not in jplan


def test_repeated_spans_matches_duckdb(spark, duck):
    docs = load_table(spark, SF_ORACLE, "documents")
    from kinesiscat_spark.operators.curation import cross_doc_spans, span_dup_frac

    got_spans = cross_doc_spans(docs, n=6)
    got_frac = span_dup_frac(docs, n=6)
    g6 = _ngrams_sql("text", 6)
    want_spans = duck.sql(
        f"""
        SELECT span, count(*)::bigint AS n_docs
        FROM (SELECT unnest(list_distinct({g6})) AS span FROM documents)
        GROUP BY span HAVING count(*) >= 2
        """
    ).df()
    want_frac = duck.sql(
        f"""
        WITH dg AS (
          SELECT doc_id AS id, unnest(list_distinct({g6})) AS span FROM documents
        ),
        spans AS (SELECT span FROM dg GROUP BY span HAVING count(*) >= 2),
        per_doc AS (SELECT id, count(*) AS n_grams FROM dg GROUP BY id),
        rep AS (
          SELECT id, count(*) AS n_repeated FROM dg JOIN spans USING (span) GROUP BY id
        )
        SELECT id, coalesce(n_repeated, 0)::bigint AS n_repeated, n_grams,
               round(coalesce(n_repeated, 0) / n_grams::double, 6) AS span_dup_frac
        FROM per_doc LEFT JOIN rep USING (id)
        """
    ).df()
    assert got_spans.count() > 0  # the synthetic corpus has boilerplate
    ok, msg = compare(got_spans, want_spans)
    assert ok, msg
    ok, msg = compare(got_frac, want_frac)
    assert ok, msg


def test_remove_duplicate_spans_exact(spark):
    """Handcrafted corpus, w=2: global first occurrence (order = (id,
    win_idx)) survives, later exact windows are removed — including the
    short tail window — and token accounting balances."""
    from kinesiscat_spark.operators.curation import remove_duplicate_spans

    rows = [
        (0, "a b c d e f"),   # [a b][c d][e f] — all first occurrences
        (1, "a b c d x y"),   # [a b],[c d] dup → removed; [x y] kept
        (2, "e f a b q"),     # [e f],[a b] dup; tail [q] (len 1) first
        (3, ""),              # no tokens, no windows
        (4, "q"),             # [q] duplicates doc 2's tail → removed
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in remove_duplicate_spans(docs, w=2).collect()
    }
    assert got == {
        0: (6, 0, "a b c d e f"),
        1: (6, 4, "x y"),
        2: (5, 4, "q"),
        3: (0, 0, ""),
        4: (1, 1, ""),
    }


def test_remove_duplicate_spans_idempotent_and_partition_invariant(spark):
    """Fixed point: re-running on its own output removes nothing (exactly
    one copy of every span survives). And the result is identical under a
    different partitioning — first occurrence is a total order, not a
    partition accident."""
    from kinesiscat_spark.operators.curation import remove_duplicate_spans

    docs = load_table(spark, SF_ORACLE, "documents")
    out = remove_duplicate_spans(docs, w=6)
    rows = {(r.id, r.n_tokens, r.n_removed, r.clean_text) for r in out.collect()}
    assert sum(r[2] for r in rows) > 0  # the corpus has cross-doc spans
    for _, n_tokens, n_removed, clean in rows:
        n_clean = len(clean.split()) if clean else 0
        assert n_clean == n_tokens - n_removed

    again = remove_duplicate_spans(
        spark.createDataFrame(
            [(r[0], r[3]) for r in rows], ["doc_id", "text"]
        ),
        w=6,
    )
    assert again.agg(F.sum("n_removed")).collect()[0][0] == 0

    shuffled = remove_duplicate_spans(docs.repartition(7, "lang"), w=6)
    assert {
        (r.id, r.n_tokens, r.n_removed, r.clean_text) for r in shuffled.collect()
    } == rows


def test_remove_duplicate_spans_text_never_shuffled(spark):
    """The wide exchange carries window hashes, not document text: no
    Exchange in the plan has `toks` (or the raw text) in its schema, and
    nothing falls back to Python."""
    from kinesiscat_spark.operators.curation import remove_duplicate_spans

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = (
        remove_duplicate_spans(docs, w=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "toks" not in line and "text" not in line, line


def test_span_dup_frac_single_scan(spark):
    """The span_dup_frac plan scans the text ONCE: the cross-doc count is
    a window riding the span exchange, not a join against a second
    explode of the corpus."""
    from kinesiscat_spark.operators.curation import span_dup_frac

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = span_dup_frac(docs, n=6)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "EvalPython" not in plan


def test_curation_invariants_random_texts(spark):
    """Batch-property sweep on adversarial random texts (one Spark job,
    many generated rows): all fractions land in [0, 1], empty/degenerate
    docs yield zeros not nulls/NaNs, and redact_pii removes every match
    its own detectors count."""
    import random

    rng = random.Random(99)
    alphabet = ["word", "the", "a@b.cd", "1.2.3.4", "+1 23456789", "x",
                "", " ", "\n", "ümlaut", "列車", "a" * 50, ".", "@", "+"]
    texts = [
        " ".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(300)
    ] + ["", " ", "\n\n\n", "a", "a b", "\x00weird\x01"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    out = (
        df.withColumn("s", repetition_signals(F.col("text")))
        .select(
            "i",
            F.col("s.dup_line_frac").alias("dlf"),
            F.col("s.dup_line_char_frac").alias("dlcf"),
            top_ngram_char_frac(F.col("text"), 2).alias("top2"),
            dup_ngram_char_frac(F.col("text"), 3).alias("dup3"),
            pii_signals(F.col("text")).alias("p"),
            redact_pii(F.col("text")).alias("red"),
        )
        .collect()
    )
    import math as _math

    for r in out:
        for v in (r.dlf, r.dlcf, r.top2, r.dup3):
            if v is not None:
                assert not _math.isnan(v) and 0.0 <= v <= 1.0, (r.i, v)
        assert r.top2 is not None and r.dup3 is not None  # total functions
    # redaction is complete by its own detectors
    red_df = spark.createDataFrame([(r.i, r.red) for r in out], ["i", "text"])
    residue = (
        red_df.select(pii_signals(F.col("text")).alias("p"))
        .filter((F.col("p.n_emails") + F.col("p.n_ipv4") + F.col("p.n_phones")) > 0)
        .count()
    )
    assert residue == 0


class TestBlocklist:
    def test_signals_case_insensitive_and_frac(self, spark):
        from kinesiscat_spark.operators.curation import blocklist_signals

        df = spark.createDataFrame(
            [("Bad word bAD good",), ("clean text only here",), ("",), (None,)],
            "text string",
        )
        rows = df.select(
            blocklist_signals(F.col("text"), ("bad", "worse")).alias("s")
        ).collect()
        assert (rows[0].s.n_list_hits, rows[0].s.list_word_frac) == (2, 0.5)
        assert (rows[1].s.n_list_hits, rows[1].s.list_word_frac) == (0, 0.0)
        assert rows[2].s.n_list_hits == 0 and rows[2].s.list_word_frac is None
        assert rows[3].s.n_list_hits is None

    def test_gate_drop_any_hit_and_threshold(self, spark):
        from kinesiscat_spark.pipelines import CurationConfig, blocklist_gate

        df = spark.createDataFrame(
            [(1, "bad apple pie dish"), (2, "all fine here"), (3, "")],
            "doc_id long, text string",
        )
        strict = CurationConfig(blocklist=("bad",))
        kept = sorted(r.doc_id for r in blocklist_gate(df, strict).collect())
        assert kept == [2, 3]  # any hit drops; token-free doc kept
        lax = CurationConfig(blocklist=("bad",), max_blocklist_frac=0.3)
        kept = sorted(r.doc_id for r in blocklist_gate(df, lax).collect())
        assert kept == [1, 2, 3]  # 1/4 = 0.25 <= 0.3
        off = CurationConfig()
        assert blocklist_gate(df, off) is df


class TestGopher:
    """Gopher §A1.1 quality rules (operators/curation.py gopher_signals /
    gopher_keep) — exact values on handcrafted docs, published-default
    gate semantics, NULL policy."""

    def _sig(self, spark, text, **kw):
        from kinesiscat_spark.operators.curation import gopher_signals

        return (
            spark.range(1)
            .select(gopher_signals(F.lit(text), **kw).alias("s"))
            .collect()[0]
            .s.asDict()
        )

    def test_word_stats_exact(self, spark):
        s = self._sig(spark, "the cat sat on the mat")
        assert s["n_words"] == 6
        assert s["mean_word_len"] == pytest.approx(17 / 6)
        assert s["alpha_word_frac"] == 1.0
        assert s["stop_hits"] == 1  # 'the' (distinct), not 2 occurrences

    def test_symbol_bullet_ellipsis(self, spark):
        text = "# tag one...\n- bullet line\nplain line ends…\n* second"
        s = self._sig(spark, text)
        # symbols: '#', '...', '…' -> 3 over 11 words
        assert s["symbol_word_ratio"] == pytest.approx(3 / 11)
        assert s["bullet_line_frac"] == pytest.approx(2 / 4)
        assert s["ellipsis_line_frac"] == pytest.approx(2 / 4)

    def test_empty_and_null_text(self, spark):
        from kinesiscat_spark.operators.curation import (
            gopher_keep,
            gopher_signals,
        )

        for t in [F.lit(""), F.lit(None).cast("string")]:
            row = (
                spark.range(1)
                .select(
                    gopher_signals(t).alias("s"),
                    gopher_keep(gopher_signals(t)).alias("k"),
                )
                .collect()[0]
            )
            assert row.s.n_words == 0
            assert row.s.mean_word_len is None
            assert row.k is False  # explicit reject, not NULL

    def test_published_gate_defaults(self, spark):
        from kinesiscat_spark.operators.curation import (
            gopher_keep,
            gopher_signals,
        )

        good = " ".join(
            ["the", "be", "to", "of"] + [f"word{i}" for i in range(60)]
        )
        short = "the be to of tiny doc"
        symbolic = " ".join(["the be to of"] + ["#"] * 60)
        df = spark.createDataFrame(
            [(0, good), (1, short), (2, symbolic)], ["i", "text"]
        )
        out = {
            r.i: r.k
            for r in df.select(
                "i", gopher_keep(gopher_signals(F.col("text"))).alias("k")
            ).collect()
        }
        assert out == {0: True, 1: False, 2: False}

    def test_threshold_overrides(self, spark):
        from kinesiscat_spark.operators.curation import (
            gopher_keep,
            gopher_signals,
        )

        text = "the be cats dogs foxes"  # 5 words, 2 stopwords, mwl 3.6
        k = (
            spark.range(1)
            .select(
                gopher_keep(
                    gopher_signals(F.lit(text)), min_words=5
                ).alias("k")
            )
            .collect()[0]
            .k
        )
        assert k is True


def test_gopher_symbol_threshold_is_per_symbol(spark):
    """Rae et al. A1.1 thresholds EACH symbol-to-word ratio at 0.1
    individually — a doc with hash ratio 0.08 and ellipsis ratio 0.08
    (combined 0.16) must pass, one with hash ratio 0.12 must fail
    (ADVICE r6: the combined check was stricter than published)."""
    from kinesiscat_spark.operators.curation import (
        gopher_keep,
        gopher_signals,
    )

    # 50 base words; symbols ride mid-text so the line-level ellipsis-END
    # rule (<= 0.3 of lines) stays out of the way
    words = ("the be to of and that have with " + "lexeme " * 42).split()
    doc_ok = " ".join(words) + " #### ... ... ... ... end"
    doc_hash_heavy = " ".join(words) + " " + "#" * 7  # 7/51 > 0.1, no ellipsis
    df = spark.createDataFrame(
        [(1, doc_ok), (2, doc_hash_heavy)], "doc_id long, text string"
    )
    sig = gopher_signals(F.col("text"))
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            sig["hash_word_ratio"].alias("h"),
            sig["ellipsis_word_ratio"].alias("e"),
            sig["symbol_word_ratio"].alias("s"),
            gopher_keep(sig).alias("keep"),
        ).collect()
    }
    r1 = rows[1]
    assert r1.h <= 0.1 and r1.e <= 0.1 and r1.s > 0.1
    assert r1.keep  # passes per-symbol, would fail the combined check
    assert abs(rows[1].s - (rows[1].h + rows[1].e)) < 1e-12
    assert not rows[2].keep  # hash ratio alone over 0.1


def test_dedup_lines_across_docs(spark):
    """Cross-doc line dedup: a line in >= min_docs docs is dropped from
    ALL of them, unique lines survive in original order, an all-boiler
    doc rewrites to '' (kept, empty), single-doc repeats are untouched."""
    from kinesiscat_spark.operators.curation import dedup_lines_across_docs

    rows = [
        (1, "unique one\nSUBSCRIBE NOW\nunique two"),
        (2, "SUBSCRIBE NOW\nother text"),
        (3, "SUBSCRIBE NOW"),
        (4, "solo line\nsolo line"),  # repeats within ONE doc only: kept
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.n_lines, r.n_removed_lines, r.clean_text)
        for r in dedup_lines_across_docs(docs, min_docs=2).collect()
    }
    assert got[1] == (3, 1, "unique one\nunique two")
    assert got[2] == (2, 1, "other text")
    assert got[3] == (1, 1, "")  # all-boiler doc: kept row, empty rewrite
    assert got[4] == (2, 0, "solo line\nsolo line")
    # NULL text -> a single '' line, unique in this corpus -> kept as ''
    assert got[5] == (1, 0, "")


def test_semantic_contamination_report(spark):
    """Embedding-space decontamination: benchmark members flag themselves
    at sim 1.0, near-duplicates above tau flag too, orthogonal vectors
    don't; n_bench_hits counts matching benchmark vectors."""
    from kinesiscat_spark.operators.curation import (
        semantic_contamination_report,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),       # benchmark member
            (2, [0.999, 0.045]),   # near-dup of 1 (cos ~0.999)
            (3, [0.0, 1.0]),       # orthogonal to 1: clean
            (4, [-1.0, 0.0]),      # anti-parallel: clean
        ],
        "vec_id long, embedding array<double>",
    )
    bench = emb.filter("vec_id = 1")
    got = {
        r.id: (r.n_bench_hits, round(r.max_sim, 3))
        for r in semantic_contamination_report(emb, bench, tau=0.9).collect()
    }
    assert got[1] == (1, 1.0)
    assert got[2][0] == 1 and got[2][1] >= 0.99
    assert 3 not in got and 4 not in got


def test_semantic_contamination_arrow_equals_column(spark):
    """The arrow kernel's (id, n_bench_hits, max_sim) must equal the
    Column spec bit-for-bit on the real embeddings table."""
    from kinesiscat_spark.operators.curation import (
        semantic_contamination_report,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    bench = emb.filter(F.col("vec_id") % 9 == 0)
    key = lambda rows: sorted(  # noqa: E731
        (r.id, r.n_bench_hits, r.max_sim) for r in rows
    )
    a = key(semantic_contamination_report(emb, bench, 0.4).collect())
    c = key(
        semantic_contamination_report(
            emb, bench, 0.4, method="column"
        ).collect()
    )
    assert a == c and len(a) > 0


def test_token_entropy_hand_computed(spark):
    """Token entropy replays -sum(p ln p) with the value-sorted fold:
    a one-token loop scores 0, a uniform doc scores ln(k), and
    empty/NULL docs are NULL."""
    import math

    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.curation import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "a b c d"),
            (3, "x x y"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", F.round(token_entropy(F.col("text")), 6).alias("h")
        ).collect()
    }
    # value-sorted fold: the x-term (2/3·ln 2/3) > y-term (1/3·ln 1/3)
    terms = sorted([(2 / 3) * math.log(2 / 3), (1 / 3) * math.log(1 / 3)])
    h3 = -(terms[0] + terms[1])
    assert got[1] == 0.0                      # pure repetition
    assert got[2] == round(math.log(4), 6)    # uniform over 4 tokens
    assert got[3] == round(h3, 6)
    assert got[4] is None and got[5] is None  # no tokens -> unscored
