"""Degenerate-input robustness: every registered lane must run (possibly
to an empty result) against schema-only tables. At 100 TB, empty partitions
and empty filtered subsets are routine; an operator that throws on zero
rows (seed selection, window over nothing, kernel on an empty Arrow batch)
would fail sporadically in production."""

from __future__ import annotations

import pytest

from kinesiscat_spark.io_tables import TABLES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.limit(0).write.parquet(f"{out}/{t}.parquet")
    return out


def test_every_lane_survives_empty_tables(spark, empty_sf_dir):
    import __spark_entry__ as entrymod

    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, empty_sf_dir).count()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def nasty_sf_dir(spark, tmp_path_factory):
    """Single pathological row per table: empty text (no tokens, no
    k-grams), all-zero embedding (cosine → NaN), corrupt JSON props."""
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("nasty_sf"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        one = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").limit(1)
        if t == "documents":
            one = one.withColumn("text", F.lit(""))
        if t == "embeddings":
            one = one.withColumn(
                "embedding", F.expr("transform(embedding, x -> float(0.0))")
            )
        if t == "events":
            one = one.withColumn("props", F.lit("not json {"))
        one.write.parquet(f"{out}/{t}.parquet")
    return out


def test_every_lane_survives_pathological_rows(spark, nasty_sf_dir):
    """Empty text, zero vectors (NaN sims must filter out, not throw),
    undecodable JSON (→ null per S9) — no lane may crash."""
    import __spark_entry__ as entrymod

    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, nasty_sf_dir).count()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
    assert not failures, "\n".join(failures)
