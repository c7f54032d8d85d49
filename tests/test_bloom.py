"""Bloom filter (operators/bloom.py) and the bloom-prefiltered
decontamination path: no false negatives, bounded false-positive rate,
and output identity with the exact broadcast-join path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)
from kinesiscat_spark.operators.curation import contamination_report

from .conftest import SF_SMOKE

N_BITS = 1 << 14
K = 4


def _membership(spark, keys, probes, n_bits=N_BITS, k=K):
    keys_df = spark.createDataFrame([(v,) for v in keys], "g string")
    bloom = bloom_build(keys_df, "g", n_bits, k)
    probe_df = spark.createDataFrame([(v,) for v in probes], "g string")
    return (
        probe_df.crossJoin(F.broadcast(bloom))
        .select(
            "g",
            bloom_might_contain(F.col("bloom"), F.col("g"), n_bits, k).alias(
                "m"
            ),
        )
        .collect()
    )


def test_no_false_negatives(spark):
    keys = [f"gram-{i} word" for i in range(500)]
    rows = _membership(spark, keys, keys)
    assert all(r.m for r in rows)


def test_false_positive_rate_bounded(spark):
    keys = [f"member-{i}" for i in range(500)]
    others = [f"absent-{i}" for i in range(2000)]
    rows = _membership(spark, keys, others)
    fp = sum(1 for r in rows if r.m)
    # m/n = 16384/500 ≈ 33 bits/elem, k=4 → theoretical FPR ≈ 0.03 %;
    # allow a generous 2 % before calling the hash construction broken
    assert fp / len(others) < 0.02, fp


def test_empty_key_set_rejects_everything(spark):
    keys_df = spark.createDataFrame([], "g string")
    bloom = bloom_build(keys_df, "g", N_BITS, K)
    [row] = bloom.collect()
    assert len(row.bloom) == N_BITS // 64
    assert all(w == 0 for w in row.bloom)
    rows = _membership(spark, [], ["a", "b", ""])
    assert not any(r.m for r in rows)


def test_n_bits_not_multiple_of_64(spark):
    # 100 bits packs into 2 words; positions stay in range
    rows = _membership(spark, ["x", "y"], ["x", "y"], n_bits=100, k=3)
    assert all(r.m for r in rows)


def test_invalid_sizing_rejected():
    with pytest.raises(ValueError):
        bloom_might_contain(F.lit(None), F.lit("x"), 0, 4)
    with pytest.raises(ValueError):
        bloom_might_contain(F.lit(None), F.lit("x"), 64, 0)


def _bench(docs):
    return docs.filter(F.col("doc_id") % 7 == 0).select(
        F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 3, 12), " ").alias(
            "text"
        )
    )


@pytest.mark.parametrize("broadcast_benchmark", [True, False])
def test_bloom_report_equals_exact(spark, broadcast_benchmark):
    docs = load_table(spark, SF_SMOKE, "documents")
    bench = _bench(docs)
    exact = contamination_report(docs, bench, n=5).collect()
    bloom = contamination_report(
        docs,
        bench,
        n=5,
        broadcast_benchmark=broadcast_benchmark,
        bloom_bits=1 << 18,
        bloom_k=5,
    ).collect()
    key = lambda r: r.id
    assert sorted(exact, key=key) == sorted(bloom, key=key)


def test_bloom_report_min_hits_zero_reports_clean_docs(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    bench = _bench(docs)
    exact = contamination_report(docs, bench, n=5, min_hits=0).collect()
    bloom = contamination_report(
        docs, bench, n=5, min_hits=0, bloom_bits=1 << 18
    ).collect()
    key = lambda r: r.id
    assert sorted(exact, key=key) == sorted(bloom, key=key)
    # zero-hit documents are present with exact zeros
    assert any(r.n_gram_hits == 0 for r in bloom)
