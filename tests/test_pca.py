"""PCA train/project: numpy differential, orthonormality, partition
invariance, and the variance-ordering contract."""

from __future__ import annotations

import numpy as np
import pytest

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.pca import pca_project, pca_train
from tests.conftest import SF_ORACLE

DIM_OUT = 16


def _np_pca(X: np.ndarray, k: int):
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    comps = []
    for i in order:
        v = eigvecs[:, i]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    return mean, np.array(comps), eigvals[order]


def _corpus(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    rows = sorted(emb.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id)
    return emb, np.array([r.embedding for r in rows], dtype=np.float64)


def test_pca_matches_numpy_and_is_orthonormal(spark):
    emb, X = _corpus(spark)
    model = pca_train(emb, DIM_OUT)
    want_mean, want_comps, want_vals = _np_pca(X, DIM_OUT)
    C = np.array(model.components)
    assert np.allclose(model.mean, want_mean, atol=1e-6)
    assert np.allclose(C, want_comps, atol=1e-5)
    assert np.allclose(model.explained_variance, want_vals, atol=1e-6)
    # descending variance, orthonormal rows
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert np.allclose(C @ C.T, np.eye(DIM_OUT), atol=1e-6)


def test_pca_project_matches_numpy_and_partition_invariant(spark):
    emb, X = _corpus(spark)
    model = pca_train(emb, DIM_OUT)
    mean = np.array(model.mean)
    C = np.array(model.components)
    got = {
        r.vec_id: np.array(r.pca)
        for r in pca_project(emb, model).select("vec_id", "pca").collect()
    }
    ids = sorted(got)
    G = np.array([got[i] for i in ids])
    assert G.shape == (len(X), DIM_OUT)
    assert np.allclose(G, (X - mean) @ C.T, atol=1e-6)
    # projection preserves most variance at 16/64 on this corpus
    assert np.var(G, axis=0).sum() / np.var(X - mean, axis=0).sum() > 0.2
    # partition invariance: model refit on a reshuffled corpus agrees
    model2 = pca_train(emb.repartition(13, "label"), DIM_OUT)
    assert np.allclose(np.array(model2.components), C, atol=1e-6)
    assert np.allclose(model2.mean, mean, atol=1e-9)


def test_pca_validation_and_uncentered(spark):
    emb, X = _corpus(spark)
    with pytest.raises(ValueError):
        pca_train(emb, 0)
    with pytest.raises(ValueError):
        pca_train(emb, 65)
    m = pca_train(emb, 4, center=False)
    assert all(x == 0.0 for x in m.mean)
    # uncentered: components diagonalize E[x xT] instead
    gram = np.round((X.T @ X) / len(X), 9)
    eigvals = np.sort(np.linalg.eigvalsh(gram))[::-1][:4]
    assert np.allclose(m.explained_variance, eigvals, atol=1e-6)


def test_pca_plan_is_scan_stage(spark):
    emb, _ = _corpus(spark)
    model = pca_train(emb, 4)
    plan = pca_project(emb, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # projection is scan-stage, no shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
