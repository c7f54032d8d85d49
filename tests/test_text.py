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
