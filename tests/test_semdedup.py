"""SemDeDup (operators/semdedup.py): pure-python greedy replay
differential, planted-duplicate semantics, partition invariance,
keep-policy orders, and pipeline form."""

from __future__ import annotations

import math
import random

import pytest

from kinesiscat_spark.operators.semdedup import semdedup, semdedup_keep

SCHEMA = "vec_id long, embedding array<float>"


def _norm(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    )


def _replay(rows, n_cells, tau, keep="outlier"):
    """Reference SemDeDup: seed centroids = lowest-id vectors normalized,
    assign by max raw dot (ties lowest cell), rank by centroid cosine
    (asc for outlier / desc for medoid, ties on id), drop on any
    earlier-ranked neighbor with cos >= tau."""
    rows = sorted(rows)
    cents = [_norm(v) for _, v in rows[:n_cells]]
    cells: dict[int, list] = {}
    for i, v in rows:
        dots = [sum(x * y for x, y in zip(v, c)) for c in cents]
        cell = max(range(len(cents)), key=lambda j: (dots[j], -j))
        cells.setdefault(cell, []).append((i, v, _cos(v, cents[cell])))
    kept = {}
    for cell, members in cells.items():
        sgn = 1 if keep == "outlier" else -1
        members.sort(key=lambda m: (sgn * m[2], m[0]))
        for pos, (i, v, _) in enumerate(members):
            dup = any(
                _cos(v, members[p][1]) >= tau for p in range(pos)
            )
            kept[i] = not dup
    return kept


def _random_rows(n, dim, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, base))
        # plant a near-duplicate for every third vector
        if i % 3 == 0:
            rows.append(
                (n + i, [x + rng.gauss(0, 0.01) for x in base])
            )
    return [(i, [float(x) for x in v]) for i, v in rows]


def test_matches_python_replay(spark):
    rows = _random_rows(30, 8, seed=5)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.vec_id: r.kept
        for r in semdedup(df, n_cells=4, tau=0.9).collect()
    }
    # float32 storage: replay on the float32-rounded values Spark sees
    import struct

    f32 = lambda v: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
    want = _replay([(i, f32(v)) for i, v in rows], 4, 0.9)
    assert got == want
    assert not all(got.values())  # planted dups actually dropped
    assert any(got.values())


def test_planted_duplicate_keeps_exactly_one(spark):
    # two identical vectors land in the same cell; outlier order ranks
    # the lower id first on the tie, so the higher id is dropped
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (7, [0.6, 0.8, 0.0, 0.0]),
        (8, [0.6, 0.8, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    flags = {r.vec_id: r.kept for r in semdedup(df, 2, tau=0.999).collect()}
    assert flags[7] and not flags[8]
    assert flags[0] and flags[1]


def test_partition_invariance(spark):
    rows = _random_rows(40, 8, seed=11)
    df = spark.createDataFrame(rows, SCHEMA)
    base = {(r.vec_id, r.cell, r.kept) for r in semdedup(df, 4, 0.9).collect()}
    shuf = {
        (r.vec_id, r.cell, r.kept)
        for r in semdedup(df.repartition(13), 4, 0.9).collect()
    }
    assert base == shuf


def test_tau_above_one_keeps_everything(spark):
    rows = _random_rows(12, 4, seed=3)
    df = spark.createDataFrame(rows, SCHEMA)
    out = semdedup(df, 3, tau=1.01).collect()
    assert all(r.kept for r in out)
    assert len(out) == len(rows)


def test_medoid_order_flips_survivor(spark):
    # one cell, centroid = normalized seed v0. Similarities:
    #   cos(v0,v1) ~ 0.978, cos(v1,v2) ~ 0.906, cos(v0,v2) = 0.8 < tau.
    # Outlier order (csim asc) is v2, v1, v0: v2 survives, v1 dies to
    # v2, v0 dies to v1 — even though v1 itself was dropped, proving the
    # published "earlier-ranked regardless of survival" greedy.
    # Medoid order is v0, v1, v2: only v0 survives.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.95, 0.2]),
        (2, [0.8, 0.6]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.vec_id: r.kept for r in semdedup(df, 1, tau=0.9).collect()}
    med = {
        r.vec_id: r.kept
        for r in semdedup(df, 1, tau=0.9, keep="medoid").collect()
    }
    assert out == {0: False, 1: False, 2: True}
    assert med == {0: True, 1: False, 2: False}


def test_lloyd_refined_build_runs(spark):
    rows = _random_rows(30, 8, seed=7)
    df = spark.createDataFrame(rows, SCHEMA)
    out = semdedup(df, 4, 0.9, n_iters=1).collect()
    assert len(out) == len(rows)


def test_pipeline_form_drops_losers_keeps_unembedded(spark):
    emb = spark.createDataFrame(
        [(7, [0.6, 0.8]), (8, [0.6, 0.8]), (1, [1.0, 0.0])], SCHEMA
    )
    docs = spark.createDataFrame(
        [(1, "a"), (7, "b"), (8, "c"), (99, "no-embedding")],
        "doc_id long, text string",
    )
    out = semdedup_keep(docs, emb, n_cells=2, tau=0.999)
    assert sorted(r.doc_id for r in out.collect()) == [1, 7, 99]


def test_bad_args(spark):
    df = spark.createDataFrame([(0, [1.0])], SCHEMA)
    with pytest.raises(ValueError):
        semdedup(df, 0, 0.9)
    with pytest.raises(ValueError):
        semdedup(df, 2, 0.9, keep="random")


def test_empty_input(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert semdedup(df, 4, 0.9).count() == 0


def test_curate_semdedup_stage(spark):
    """semdedup_embeddings wires SemDeDup into curate() after near-dedup:
    the semantic loser disappears, the unembedded docs survive."""
    from kinesiscat_spark.pipelines import CurationConfig, curate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (7, "one two three four five six seven eight nine"),
            (8, "ten eleven twelve thirteen fourteen fifteen sixteen seventeen"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(7, [0.6, 0.8]), (8, [0.6, 0.8]), (1, [1.0, 0.0])], SCHEMA
    )
    counts: dict[str, int] = {}
    cfg = CurationConfig(
        min_tokens=1,
        semdedup_embeddings=emb,
        semdedup_cells=2,
        semdedup_tau=0.999,
        stage_counts=counts,
    )
    out = curate(docs, cfg)
    assert sorted(r.doc_id for r in out.collect()) == [1, 7]
    assert counts["semantic_dedup"] == 2


def test_directionless_vectors_kept_not_crashing(spark):
    """Zero-norm / NULL / empty embeddings have no cosine: they must be
    excluded from the cell machinery (never seeds — a zero seed would be
    an ANSI DIVIDE_BY_ZERO) and emitted kept with NULL cell/sim."""
    rows = [
        (0, [0.0, 0.0]),          # zero norm — would be the seed by id
        (1, None),                # NULL embedding
        (2, []),                  # empty array
        (7, [0.6, 0.8]),
        (8, [0.6, 0.8]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.vec_id: r for r in semdedup(df, 2, tau=0.999).collect()}
    assert len(out) == 5
    for i in (0, 1, 2):
        assert out[i].kept and out[i].cell is None and out[i].centroid_sim is None
    assert out[7].kept and not out[8].kept


def test_arrow_assign_equals_column_assign(spark):
    """ivf_assign_arrow (the round-6 assign kernel) must agree with the
    Column-fold ivf_assign row for row — including on engineered exact
    ties (ties -> lowest cell, the struct-min rule) — because the
    dedup_semantic lane's exactness contract and DuckDB oracle assume
    the Column semantics."""
    import random

    from kinesiscat_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_arrow,
        ivf_centroids,
    )

    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)
    ]
    # engineered ties: duplicate centroid seeds (vectors 0 and 1 equal)
    rows[1] = (1, list(rows[0][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_centroids(df, 8)
    col = {(r.vec_id, r.cell) for r in ivf_assign(df, cents).collect()}
    arrow = {(r.vec_id, r.cell) for r in ivf_assign_arrow(df, cents).collect()}
    assert col == arrow


def test_blas_assign_equals_exact_assign(spark):
    """ivf_assign_blas (BLAS rank + exact top-m re-rank, the 100 TB
    assign path) must pick the identical cell as the exact fold on every
    test corpus — including ties and NULL/ragged vectors."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.similarity import (
        ivf_assign_arrow,
        ivf_assign_blas,
        ivf_centroids,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    for n_cells in (4, 64):
        cents = ivf_centroids(emb, n_cells)
        a = {r.vec_id: r.cell for r in ivf_assign_arrow(emb, cents).collect()}
        b = {r.vec_id: r.cell for r in ivf_assign_blas(emb, cents).collect()}
        assert a == b, n_cells
    # NULL/ragged degrade identically
    bad = spark.createDataFrame(
        [(1, [1.0] * 64), (2, None), (3, [1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_centroids(emb, 8)
    got = {r.vec_id: r.cell for r in ivf_assign_blas(bad, cents).collect()}
    assert got[2] is None and got[3] is None and got[1] is not None


def test_semdedup_blas_assign_equals_exact(spark):
    """semdedup(assign='blas') keeps/drops exactly the same vectors as
    the default exact assign (the lane's method) on the test corpus."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.semdedup import semdedup

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    key = lambda rows: sorted(  # noqa: E731
        (r.vec_id, r.cell, r.kept) for r in rows
    )
    exact = key(semdedup(emb, n_cells=32, tau=0.8).collect())
    blas = key(semdedup(emb, n_cells=32, tau=0.8, assign="blas").collect())
    assert exact == blas
