"""Direct unit tests for the io_tables helpers.

Round 10 contracts (VERDICT r9 "What's wrong" item 1):

- content_key: multiplicity-sensitive (bit_xor pair-cancellation hole),
  parameter-sensitive, deterministic;
- content_digest: runs its aggregate on EVERY call — the round-9
  fingerprint memo is gone, so bench passes can never skip the digest;
- cached_fixture_dir: roots in a PER-PROCESS private tempdir (nothing
  survives a restart), race-loser discard, non-race rename errors
  propagate, hit path returns the published dir.
"""

from __future__ import annotations

import os

import pytest

from kinesiscat_spark.io_tables import (
    cached_fixture_dir,
    content_key,
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


def test_content_digest_runs_a_job_every_call(spark, tmp_path):
    """Round 10: no fingerprint memo — identical file-backed frames still
    pay the digest aggregate on every call (the honest per-invocation
    cost), and the digests agree."""
    import kinesiscat_spark.io_tables as iot

    p = str(tmp_path / "t.parquet")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(p)
    df = spark.read.parquet(p).filter("id >= 2")
    d1 = iot.content_digest(df, ["id", "v"])
    df2 = spark.read.parquet(p).filter("id >= 2")
    jobs_before = len(
        spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    )
    d2 = iot.content_digest(df2, ["id", "v"])
    jobs_after = len(
        spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    )
    assert d1 == d2
    assert jobs_after > jobs_before  # the second call really ran a job
    assert not hasattr(iot, "_DIGEST_MEMO")  # the memo class is gone


def test_cached_fixture_dir_process_scoped_root():
    import tempfile
    import uuid

    import kinesiscat_spark.io_tables as iot

    calls = []

    def build(stage):
        calls.append(stage)
        with open(os.path.join(stage, "x"), "w") as f:
            f.write("1")

    key = f"io_tables_test_key_{uuid.uuid4().hex}"
    d1 = cached_fixture_dir(key, "kc_t_", build)
    d2 = cached_fixture_dir(key, "kc_t_", build)
    assert d1 == d2
    assert len(calls) == 1  # second call is a within-process hit
    root = os.path.dirname(d1)
    # per-process private root: mkdtemp under the system tempdir, owned
    # by us, 0700 — NOT the old cross-run per-user kc_cache_<uid> path
    assert root == iot._PROCESS_CACHE_ROOT
    assert root.startswith(tempfile.gettempdir() + os.sep)
    assert "kc_cache_proc_" in os.path.basename(root)
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


def test_no_cross_invocation_result_memos_left():
    """The round-9 data-memo surfaces are gone: memo_table, the digest
    fingerprint memo, the model-load memo, and the centroid-row memos
    (VERDICT r9 item 3). expr_memo (plan fragments) is the one blessed
    survivor."""
    import kinesiscat_spark.io_tables as iot
    import kinesiscat_spark.operators.model_store as ms
    import kinesiscat_spark.operators.semdedup as sd
    import kinesiscat_spark.queries.similarity_queries as sq
    import kinesiscat_spark.streaming.source as src

    for mod, name in [
        (iot, "memo_table"),
        (iot, "_DIGEST_MEMO"),
        (src, "memo_table"),
        (ms, "_LOAD_MEMO"),
        (sd, "_SD_CENTS_MEMO"),
        (sq, "_CENTS_ROWS_MEMO"),
        (sq, "_INDEX_CENTS"),
    ]:
        assert not hasattr(mod, name), f"{mod.__name__}.{name} still exists"


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
