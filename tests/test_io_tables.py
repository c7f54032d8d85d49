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
