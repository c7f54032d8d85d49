"""Direct unit tests for the io_tables cache helpers (ADVICE r8):

- content_key: multiplicity-sensitive (bit_xor pair-cancellation hole),
  parameter-sensitive, deterministic;
- cached_fixture_dir: per-user 0700 root, race-loser discard, non-race
  rename errors propagate, hit path returns the published dir;
- memo_table: builds once per (session, key), forces materialization
  (a lazy build is not re-executed on later reads), evicts entries for
  dead sessions.
"""

from __future__ import annotations

import os
import stat

import pytest

from kinesiscat_spark.io_tables import (
    cached_fixture_dir,
    content_key,
    memo_table,
)


def test_content_key_multiplicity_sensitive(spark):
    # two corpora differing only by equal-count paired duplicates:
    # {A, A, B} vs {A, B, B} — xor contributions of the duplicated pair
    # cancel identically, row counts match; the hash SUM must differ
    a = spark.createDataFrame([(1,), (1,), (2,)], "v long")
    b = spark.createDataFrame([(1,), (2,), (2,)], "v long")
    ka = content_key(a, ["v"], "t")
    kb = content_key(b, ["v"], "t")
    assert ka != kb
    # deterministic across invocations
    assert ka == content_key(a, ["v"], "t")


def test_content_key_params_and_order(spark):
    df = spark.createDataFrame([(1, "x")], "v long, s string")
    assert content_key(df, ["v"], "t", k=1) != content_key(
        df, ["v"], "t", k=2
    )
    # params render sorted by name — kwarg order is irrelevant
    assert content_key(df, ["v"], "t", a=1, b=2) == content_key(
        df, ["v"], "t", b=2, a=1
    )


def test_cached_fixture_dir_root_is_private():
    import uuid

    calls = []

    def build(stage):
        calls.append(stage)
        with open(os.path.join(stage, "x"), "w") as f:
            f.write("1")

    # unique key per run: the published dir persists across test runs on
    # one host, so a fixed key would hit the cache and never call build
    key = f"io_tables_test_key_{uuid.uuid4().hex}"
    d1 = cached_fixture_dir(key, "kc_t_", build)
    d2 = cached_fixture_dir(key, "kc_t_", build)
    assert d1 == d2
    assert len(calls) == 1  # second call is a cache hit
    root = os.path.dirname(d1)
    st = os.stat(root)
    assert st.st_uid == os.getuid()
    assert not (st.st_mode & 0o077), oct(st.st_mode)
    # stage dir lives INSIDE the root so publish can never cross devices
    assert calls[0].startswith(root + os.sep)


def test_cached_fixture_dir_nonrace_rename_error_propagates(monkeypatch):
    import uuid

    def boom(src, dst):
        raise OSError(5, "io error")  # EIO — NOT a lost-race errno

    monkeypatch.setattr(os, "rename", boom)
    with pytest.raises(OSError):
        cached_fixture_dir(
            f"io_tables_test_key_eio_{uuid.uuid4().hex}",
            "kc_t_",
            lambda stage: None,
        )


def test_memo_table_builds_once_and_materializes(spark):
    builds = []

    def build():
        builds.append(1)
        return spark.range(5).selectExpr("id", "id * 2 as v")

    df1 = memo_table(spark, "io_tables_memo_k1", build)
    assert df1.count() == 5
    df2 = memo_table(spark, "io_tables_memo_k1", build)
    assert df2.count() == 5
    assert len(builds) == 1
    # the registered plan is pinned (localCheckpoint), not the lazy
    # build: the view's analyzed plan must not re-run build()
    assert sorted(r.v for r in df2.collect()) == [0, 2, 4, 6, 8]


def test_memo_table_distinct_keys(spark):
    a = memo_table(spark, "io_tables_memo_a", lambda: spark.range(1))
    b = memo_table(spark, "io_tables_memo_b", lambda: spark.range(2))
    assert a.count() == 1
    assert b.count() == 2


def test_memo_table_evicts_dead_sessions(spark):
    import kinesiscat_spark.io_tables as iot

    class FakeSession:
        # stand-in with the two members memo_table touches on a hit-miss
        def table(self, name):
            raise RuntimeError("gone")

    fake = FakeSession()
    sid = id(fake)
    import weakref

    iot._MEMO_VIEWS[sid] = (weakref.ref(fake), {"k": "v"})
    del fake
    import gc

    gc.collect()
    # next call on the real session sweeps the dead entry
    memo_table(spark, "io_tables_memo_sweep", lambda: spark.range(1))
    assert sid not in iot._MEMO_VIEWS


def test_content_digest_memo_hits_on_file_backed_frames(spark, tmp_path):
    """Round 9: the digest of a deterministic file-backed derivation is
    memoized per (canonicalized plan, cols, file stats) — the second call
    runs no Spark job — and a rewritten file (new mtime/size) misses, so
    the memo can never serve a digest for changed bytes."""
    import kinesiscat_spark.io_tables as iot

    p = str(tmp_path / "t.parquet")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(p)
    df = spark.read.parquet(p).filter("id >= 2")
    d1 = iot.content_digest(df, ["id", "v"])
    n_memo = len(iot._DIGEST_MEMO)
    df2 = spark.read.parquet(p).filter("id >= 2")  # read-side jobs here
    jobs_before = len(
        spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    )
    d2 = iot.content_digest(df2, ["id", "v"])
    jobs_after = len(
        spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    )
    assert d1 == d2
    assert len(iot._DIGEST_MEMO) == n_memo
    assert jobs_after == jobs_before  # the digest hit itself ran no job
    # a different plan over the same files is a different key
    d3 = iot.content_digest(
        spark.read.parquet(p).filter("id >= 3"), ["id", "v"]
    )
    assert d3 != d1
    # rewriting the file invalidates the fingerprint (stats change)
    import shutil

    shutil.rmtree(p)
    spark.range(10).selectExpr(
        "id + 100 AS id", "id AS v"
    ).write.parquet(p)
    d4 = iot.content_digest(spark.read.parquet(p).filter("id >= 2"),
                            ["id", "v"])
    assert d4 != d1


def test_content_digest_no_files_recomputes(spark):
    """Local relations have no input files: no fingerprint, every call
    recomputes (the strict content contract where file identity cannot
    vouch for the rows)."""
    import kinesiscat_spark.io_tables as iot

    df = spark.createDataFrame([(1,), (2,)], "v long")
    before = dict(iot._DIGEST_MEMO)
    d1 = iot.content_digest(df, ["v"])
    d2 = iot.content_digest(spark.createDataFrame([(1,), (2,)], "v long"),
                            ["v"])
    assert d1 == d2
    assert iot._DIGEST_MEMO == before  # nothing memoized


def test_ivf_topk_cents_rows_matches_collect_path(spark):
    """The _cents_rows fast path is bit-identical to the in-plan
    seed-centroid build it replaces."""
    from kinesiscat_spark.operators.similarity import (
        _collect_cents,
        ivf_centroids,
        ivf_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter("vec_id < 3").selectExpr(
        "vec_id AS qid", "embedding"
    )
    corpus = emb.filter("vec_id >= 3")
    base = ivf_topk(corpus, queries, 5, n_cells=4, n_probe=2)
    rows = _collect_cents(ivf_centroids(corpus, 4, 0))
    fast = ivf_topk(corpus, queries, 5, n_cells=4, n_probe=2,
                    _cents_rows=rows)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, fast.collect())
    )
