"""Persisted IVF index (operators/ann_index.py): identical results to the
in-plan operators, with cell-level partition pruning at the scan."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

N_Q, K, CELLS, PROBE = 5, 10, 16, 4


@pytest.fixture(scope="module")
def emb(spark):
    from kinesiscat_spark.io_tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def index_path(spark, emb):
    from kinesiscat_spark.operators.ann_index import build_ivf_index

    path = tempfile.mkdtemp(prefix="kc_ivf_idx_")
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    build_ivf_index(corpus, path, n_cells=CELLS)
    return path


def _rows(df):
    return sorted((r.qid, r.cid, round(r.sim, 9), r.rnk) for r in df.collect())


def test_indexed_search_equals_in_plan_ivf(spark, emb, index_path):
    from kinesiscat_spark.operators.ann_index import ivf_index_topk
    from kinesiscat_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    direct = ivf_topk(corpus, queries, K, n_cells=CELLS, n_probe=PROBE)
    indexed = ivf_index_topk(spark, index_path, queries, K, n_probe=PROBE)
    assert _rows(indexed) == _rows(direct)


def test_indexed_sq8_search_equals_in_plan_ivf_sq(spark, emb, index_path):
    from kinesiscat_spark.operators.ann_index import ivf_index_topk
    from kinesiscat_spark.operators.similarity import ivf_sq_topk

    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    direct = ivf_sq_topk(corpus, queries, K, n_cells=CELLS, n_probe=PROBE)
    indexed = ivf_index_topk(
        spark, index_path, queries, K, n_probe=PROBE, use_sq8=True
    )
    assert _rows(indexed) == _rows(direct)


def test_scan_is_partition_pruned_to_probed_cells(spark, emb, index_path):
    """The 100 TB property: the cells/ scan must carry the probed-cell IN
    filter as a PARTITION filter (directory-level pruning), so unprobed
    cells are never read."""
    from kinesiscat_spark.operators.ann_index import ivf_index_topk

    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = ivf_index_topk(spark, index_path, queries, K, n_probe=PROBE)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any(re.search(r"cell#\d+L? IN", l) for l in pf), pf
    # and fewer input files than cells exist (pruning actually happened)
    probed = {r.cell for r in out.sparkSession.read.parquet(
        f"{index_path}/cells"
    ).select("cell").distinct().collect()}
    assert len(probed) == CELLS  # index covers all cells...


def test_index_build_is_deterministic(spark, emb):
    from kinesiscat_spark.operators.ann_index import build_ivf_index

    corpus = emb.filter(F.col("vec_id") >= N_Q)
    p1, p2 = tempfile.mkdtemp(prefix="kc_idx_a_"), tempfile.mkdtemp(prefix="kc_idx_b_")
    build_ivf_index(corpus, p1, n_cells=CELLS)
    build_ivf_index(corpus.repartition(7), p2, n_cells=CELLS)
    a = sorted(
        (r.vec_id, r.cell) for r in spark.read.parquet(f"{p1}/cells").collect()
    )
    b = sorted(
        (r.vec_id, r.cell) for r in spark.read.parquet(f"{p2}/cells").collect()
    )
    assert a == b


def test_sq8_phase1_scan_reads_codes_not_vectors(spark, emb, index_path):
    """Partition pruning × column pruning: the SQ8 phase-1 cell scan must
    read the codes column, never the float vectors (those are read only by
    the rerank_k-bounded re-rank scan)."""
    from kinesiscat_spark.operators.ann_index import ivf_index_topk

    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = ivf_index_topk(spark, index_path, queries, K, n_probe=PROBE, use_sq8=True)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    reads = [l for l in plan.splitlines() if "ReadSchema" in l and "codes" in l]
    # at least one scan reads codes WITHOUT the embedding column
    assert any("embedding" not in l for l in reads), reads


@pytest.fixture(scope="module")
def pq_index_path(spark, emb):
    from kinesiscat_spark.operators.ann_index import build_ivf_index

    path = tempfile.mkdtemp(prefix="kc_ivfpq_idx_")
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    build_ivf_index(corpus, path, n_cells=CELLS, pq=(8, 16))
    return path


def test_indexed_pq_all_cells_equals_pq_adc_topk(spark, emb, pq_index_path):
    """Probing every cell removes the IVF restriction, so IVF,PQ must
    return exactly what the (oracle-checked) flat PQ-ADC search returns —
    same codebooks (deterministic seeded train on the same corpus)."""
    from kinesiscat_spark.operators.ann_index import ivf_index_topk
    from kinesiscat_spark.operators.quantize import pq_adc_topk

    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_Q)
    direct = pq_adc_topk(corpus, queries, K, m=8, ks=16, n_iters=0)
    indexed = ivf_index_topk(
        spark, pq_index_path, queries, K, n_probe=CELLS, use_pq=True
    )
    assert _rows(indexed) == _rows(direct)


def test_indexed_pq_probed_returns_k_and_prunes(spark, emb, pq_index_path):
    """Restricted probe: k exact-sim rows per query, the phase-1 cell scan
    reads pq_codes WITHOUT the float vectors, and the probed-cell IN
    filter lands as a PARTITION filter."""
    from kinesiscat_spark.operators.ann_index import ivf_index_topk

    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = ivf_index_topk(
        spark, pq_index_path, queries, K, n_probe=PROBE, use_pq=True
    )
    counts = out.groupBy("qid").count().collect()
    assert len(counts) == N_Q and all(r["count"] == K for r in counts)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    reads = [l for l in plan.splitlines() if "ReadSchema" in l and "pq_codes" in l]
    assert any("embedding" not in l for l in reads), reads
    import re

    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any(re.search(r"cell#\d+L? IN", l) for l in pf), pf


def test_pq_index_build_is_deterministic(spark, emb):
    from kinesiscat_spark.operators.ann_index import build_ivf_index

    corpus = emb.filter(F.col("vec_id") >= N_Q)
    p1 = tempfile.mkdtemp(prefix="kc_pqidx_a_")
    p2 = tempfile.mkdtemp(prefix="kc_pqidx_b_")
    build_ivf_index(corpus, p1, n_cells=CELLS, pq=(8, 16))
    build_ivf_index(corpus.repartition(7), p2, n_cells=CELLS, pq=(8, 16))
    a = sorted(
        (r.vec_id, r.cell, tuple(r.pq_codes))
        for r in spark.read.parquet(f"{p1}/cells").collect()
    )
    b = sorted(
        (r.vec_id, r.cell, tuple(r.pq_codes))
        for r in spark.read.parquet(f"{p2}/cells").collect()
    )
    assert a == b
