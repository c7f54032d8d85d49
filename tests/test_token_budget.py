"""token_budget_sample: the hierarchical (bucketed) prefix-by-budget
selection must agree row-for-row with a naive global-cumsum DuckDB
replay over the md5 order — crossing document included — and be
partition-invariant."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.sampling import token_budget_sample
from tests.conftest import SF_ORACLE


def _oracle(sf_dir: str, budget: int, salt: int):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(
        f"""
        WITH base AS (
          SELECT doc_id AS id,
                 substr(md5(doc_id || chr(31) || '{salt}'), 1, 12) AS hk,
                 len(list_filter(string_split_regex(trim(coalesce(text, '')),
                     '\\s+'), x -> len(x) > 0))::BIGINT AS n_tokens
          FROM documents
        ),
        cum AS (
          SELECT id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY hk, id
                   ROWS UNBOUNDED PRECEDING) AS c
          FROM base
        )
        SELECT id, n_tokens FROM cum WHERE c - n_tokens < {budget}
        ORDER BY id
        """
    ).fetchall()


@pytest.mark.parametrize("budget", [1, 500, 7000, 10**9])
def test_token_budget_matches_global_cumsum_oracle(spark, budget):
    docs = load_table(spark, SF_ORACLE, "documents")
    got = sorted(
        (r.id, r.n_tokens)
        for r in token_budget_sample(docs, budget, salt=3).collect()
    )
    want = [tuple(r) for r in _oracle(SF_ORACLE, budget, 3)]
    assert got == want
    if budget >= 10**9:
        assert len(got) == docs.count()  # budget beyond corpus: keep all
    else:
        # the kept total is the FIRST cumulative sum >= budget (crossing
        # doc kept), and dropping the last kept doc goes under budget
        total = sum(t for _, t in got)
        assert total >= min(budget, total)
        if len(got) < docs.count():
            assert total >= budget


def test_token_budget_partition_invariant_and_small_buckets(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    a = sorted(
        (r.id, r.n_tokens)
        for r in token_budget_sample(docs, 4000, salt=1).collect()
    )
    b = sorted(
        (r.id, r.n_tokens)
        for r in token_budget_sample(
            docs.repartition(17, "lang"), 4000, salt=1, n_buckets=16
        ).collect()
    )
    assert a == b  # neither partitioning nor bucket count changes the set
    assert token_budget_sample(docs, 0).count() == 0


def test_mix_corpora_tokens_budgets_and_independence(spark):
    from kinesiscat_spark.operators.sampling import mix_corpora_tokens

    docs = load_table(spark, SF_ORACLE, "documents")
    en = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")
    out = mix_corpora_tokens([(en, 2000), (rest, 1000)], salt=5)
    rows = out.collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source_id, set()).add((r.id, r.n_tokens))
    # each source contributes exactly its standalone token-budget prefix
    # (independent salts), and each kept total reaches its budget
    want0 = {
        (r.id, r.n_tokens)
        for r in token_budget_sample(en, 2000, salt=5).collect()
    }
    want1 = {
        (r.id, r.n_tokens)
        for r in token_budget_sample(rest, 1000, salt=6).collect()
    }
    assert by_src[0] == want0 and by_src[1] == want1
    assert sum(t for _, t in by_src[0]) >= 2000
    assert sum(t for _, t in by_src[1]) >= 1000


# --- temperature mixture (round 6) ----------------------------------------


def test_temperature_budgets_follow_alpha(spark):
    """alpha < 1 upweights the small source relative to proportional
    sampling; alpha=0 is uniform, alpha=1 proportional. Budgets are
    floor(total * n^alpha / sum)."""
    import math

    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.sampling import mix_corpora_temperature

    big = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("w w w w w w w w w w").alias("text"),  # 10 tokens each
    )
    small = spark.range(1000, 1050).select(
        F.col("id").alias("doc_id"), F.lit("w w w w w").alias("text")
    )  # 5 tokens each
    n_big, n_small = 4000, 250
    total = 1000
    for alpha in (0.0, 0.5, 1.0):
        out = mix_corpora_temperature([big, small], total, alpha=alpha)
        got = {
            r.source_id: r.t
            for r in out.groupBy("source_id").agg(F.sum("n_tokens").alias("t")).collect()
        }
        wb, ws = n_big**alpha, n_small**alpha
        bb = math.floor(total * wb / (wb + ws))
        bs = math.floor(total * ws / (wb + ws))
        # prefix crosses the budget: total within [budget, budget + max_doc)
        # — unless the source has fewer tokens than its budget, in which
        # case the whole source is kept (the token_budget_sample contract)
        assert min(bb, n_big) <= got[0] < min(bb, n_big) + 10, (alpha, got)
        assert min(bs, n_small) <= got[1] < min(bs, n_small) + 5, (alpha, got)


def test_temperature_mixture_deterministic(spark):
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.sampling import mix_corpora_temperature

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"),
    )
    a = {
        (r.id, r.source_id)
        for r in mix_corpora_temperature([docs], 100, salt=3).collect()
    }
    b = {
        (r.id, r.source_id)
        for r in mix_corpora_temperature(
            [docs.repartition(7)], 100, salt=3
        ).collect()
    }
    assert a == b and a


def test_temperature_validation(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.sampling import mix_corpora_temperature

    docs = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("a b").alias("text")
    )
    with _pytest.raises(ValueError):
        mix_corpora_temperature([], 100)
    with _pytest.raises(ValueError):
        mix_corpora_temperature([docs], 0)
    # all-empty corpus degrades to zero budgets (empty selection), not an
    # error — the every-lane-survives-empty-tables invariant (round 6)
    empty = docs.filter(F.lit(False))
    assert mix_corpora_temperature([empty], 100).count() == 0


def test_temperature_empty_source_gets_zero_weight(spark):
    """alpha=0 must NOT hand an empty corpus a budget share: Python's
    0.0**0.0 == 1.0 would silently divert tokens from non-empty sources;
    the XLM/mT5 recipe defines n_i = 0 as weight 0 (ADVICE r6)."""
    from kinesiscat_spark.operators.sampling import mix_corpora_temperature

    full = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    empty = full.limit(0)
    out = mix_corpora_temperature([full, empty], total_tokens=40, alpha=0.0)
    # all 40 tokens of budget go to the non-empty source (10 docs of 4)
    assert out.count() == 10
