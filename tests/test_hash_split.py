"""hash_split: deterministic train/val/test assignment — exclusive,
exhaustive, partition-invariant, and (md5 method) reproducible
row-for-row in a DuckDB replay of the same interval CASE."""

from __future__ import annotations

import duckdb
import pytest

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.sampling import hash_split, md5_threshold
from tests.conftest import SF_ORACLE

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SALT = 11


def _oracle(sf_dir: str):
    t1 = md5_threshold(0.8)
    t2 = md5_threshold(0.9)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(
        f"""
        SELECT doc_id,
               CASE WHEN substr(md5(doc_id || chr(31) || '{SALT}'), 1, 12)
                         < '{t1}' THEN 'train'
                    WHEN substr(md5(doc_id || chr(31) || '{SALT}'), 1, 12)
                         < '{t2}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents ORDER BY doc_id
        """
    ).fetchall()


def test_hash_split_matches_duckdb_replay_and_is_total(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = hash_split(docs, WEIGHTS, ["doc_id"], salt=SALT)
    got = sorted((r.doc_id, r.split) for r in out.select("doc_id", "split").collect())
    want = [tuple(r) for r in _oracle(SF_ORACLE)]
    assert got == want
    # exhaustive: every row assigned, all three splits non-empty at 500 docs
    assert len(got) == docs.count()
    counts = {}
    for _, s in got:
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    # shares roughly proportional (binomial tolerance at n=500)
    n = len(got)
    assert abs(counts["train"] / n - 0.8) < 0.08


def test_hash_split_partition_invariant_and_salt_independent(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    a = sorted(
        (r.doc_id, r.split)
        for r in hash_split(docs, WEIGHTS, ["doc_id"], salt=SALT).collect()
    )
    b = sorted(
        (r.doc_id, r.split)
        for r in hash_split(
            docs.repartition(13, "lang"), WEIGHTS, ["doc_id"], salt=SALT
        ).collect()
    )
    assert a == b
    c = sorted(
        (r.doc_id, r.split)
        for r in hash_split(docs, WEIGHTS, ["doc_id"], salt=SALT + 1).collect()
    )
    assert a != c  # different salt draws an independent assignment
    # xxhash64 method: still total and partition-invariant (JVM-only path)
    x1 = sorted(
        (r.doc_id, r.split)
        for r in hash_split(docs, WEIGHTS, ["doc_id"], method="xxhash64").collect()
    )
    x2 = sorted(
        (r.doc_id, r.split)
        for r in hash_split(
            docs.repartition(7), WEIGHTS, ["doc_id"], method="xxhash64"
        ).collect()
    )
    assert x1 == x2 and len(x1) == len(a)


def test_hash_split_validation(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    with pytest.raises(ValueError):
        hash_split(docs, {}, ["doc_id"])
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.4}, ["doc_id"])
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 1.5, "b": -0.5}, ["doc_id"])
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 1.0}, ["doc_id"], method="sha1")
    # single split: everything lands in it
    one = hash_split(docs, {"all": 1.0}, ["doc_id"])
    assert one.filter(one.split != "all").count() == 0


def test_md5_threshold_fraction_one_keeps_everything(spark):
    # regression: md5_threshold(1.0) used to emit a 13-digit hex string,
    # which lexicographically sorts BELOW most 12-char prefixes — md5
    # sampling at fraction 1.0 silently kept ~1/16 of rows. The 'g'
    # sentinel makes `prefix < threshold` always true.
    from kinesiscat_spark.operators.sampling import hash_sample

    assert md5_threshold(1.0) == "g"
    docs = load_table(spark, SF_ORACLE, "documents")
    n = docs.count()
    assert hash_sample(docs, 1.0, ["doc_id"], method="md5").count() == n
    # a 1.0/0.0 split assigns every row to the first name
    out = hash_split(docs, {"train": 1.0, "test": 0.0}, ["doc_id"])
    assert out.filter(out.split != "train").count() == 0
