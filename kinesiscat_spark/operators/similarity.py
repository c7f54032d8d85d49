"""Similarity search over embedding columns (extension surface X3/X4).

Two lanes, both pure DataFrame ops (no Python in the loop):

- ``cosine_topk``: exact brute force — broadcast the (small) query set
  against the corpus, cosine via zip_with/aggregate (JVM codegen),
  per-query top-k via a rank window (WindowGroupLimit pushes k into the
  sort, no global sort). At 100 TB the corpus never shuffles: the only
  exchange is the final per-query k rows.
- ``random_hyperplane_lsh`` + ``lsh_topk``: the scale path — signed
  random-projection signatures, banded; candidates meet in a bucket join
  (shuffle on band keys ~ |corpus|·bands rows of a few bytes), exact
  re-rank within buckets. Recall tunable via (planes, bands).

The hyperplane matrix is generated deterministically on the driver
(seeded) and folded into the plan as literals — identical across
executors, no broadcast variable needed at this size.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from kinesiscat_spark.let import let_


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns, double math, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def pair_cosine_udf():
    """Arrow-batched per-pair cosine, bit-identical to
    ``dot(a,b) / (l2_norm(a) * l2_norm(b))`` (differential-tested).

    The Column forms are interpreted HOF folds (CodegenFallback) — ~100µs
    per 64-dim fold; on thousands of candidate pairs the re-rank dominates
    a lane. The kernel accumulates dots and both norms dimension-by-
    dimension (vectorized across pairs) — exactly the fold order of the
    Column form and the SQL oracle's ``list_sum`` — then divides by the
    product of the square roots, so ``sim`` carries the same bits.

    The UDF object is built once per process (expr_memo): it depends on
    nothing but its own body, and rebuilding it on every caller paid a
    py4j registration round trip per similarity lane invocation.
    """
    from kinesiscat_spark.expr_memo import expr_memo

    def build():
        import numpy as np

        @F.pandas_udf("double")
        def cos(a: pd.Series, b: pd.Series) -> pd.Series:
            if not len(a):
                return pd.Series([], dtype="float64")
            A = np.stack(a.to_numpy()).astype(np.float64)
            B = np.stack(b.to_numpy()).astype(np.float64)
            dots = np.zeros(len(A))
            na = np.zeros(len(A))
            nb = np.zeros(len(A))
            for i in range(A.shape[1]):
                dots += A[:, i] * B[:, i]
                na += A[:, i] * A[:, i]
                nb += B[:, i] * B[:, i]
            return pd.Series(dots / (np.sqrt(na) * np.sqrt(nb)))

        return cos

    return expr_memo("sim.pair_cosine_udf", build)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    queries is expected to be small (it is broadcast); corpus scans once
    with no shuffle of the vectors — only (qid, cid, sim) tuples move.
    """
    from kinesiscat_spark.expr_memo import expr_memo

    def build() -> dict:
        w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("cid"))
        return {
            "q_sel": [F.col(query_id), F.col(vec).alias("_qvec")],
            "c_sel": [F.col(corpus_id).alias("cid"), F.col(vec).alias("_cvec")],
            "sim": pair_cosine_udf()(F.col("_qvec"), F.col("_cvec")).alias(
                "sim"
            ),
            "rnk": F.row_number().over(w).cast("long"),
            "keep": F.col("rnk") <= k,
        }

    ex = expr_memo(("sim.cosine_topk", corpus_id, query_id, vec, k), build)
    q = queries.select(*ex["q_sel"])
    pairs = corpus.select(*ex["c_sel"]).join(F.broadcast(q))
    # Arrow pair-cosine kernel: one vectorized pass over all pairs, same
    # fold order as the Column form/oracle (see pair_cosine_udf).
    sims = pairs.select(query_id, "cid", ex["sim"])
    return sims.withColumn("rnk", ex["rnk"]).filter(ex["keep"])


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _band_keys_udf(planes: list[list[float]], n_bands: int):
    """Arrow-batched band-key kernel: (vec) -> array<long> of n_bands keys.

    Dot products against the plan-time constant hyperplanes are the one
    numeric kernel where Spark's expression layer loses badly: array HOFs
    (zip_with/aggregate) are CodegenFallback (interpreted, ~100µs per
    fold), and unrolling the fold into 1000+ arithmetic nodes blows up
    optimizer/codegen time instead. A vectorized pandas UDF computes all
    plane dots for a whole Arrow batch in numpy.

    FP fidelity: the accumulation loops over dimensions SEQUENTIALLY
    (vectorized across rows), i.e. ((v0*w0 + v1*w1) + v2*w2) + ... — the
    exact fold order of ``dot`` and of the SQL oracle's list_sum, so sign
    bits (and therefore keys) are bit-identical to the Column form.
    """
    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    n_planes = P.shape[1]
    r = n_planes // n_bands

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        V = np.stack(vecs.to_numpy()).astype(np.float64)  # (N, dim)
        dots = np.zeros((V.shape[0], n_planes))
        for i in range(P.shape[0]):
            dots += V[:, i : i + 1] * P[i]
        bits = (dots >= 0).astype(np.int64)
        keys = np.zeros((V.shape[0], n_bands), dtype=np.int64)
        for b in range(n_bands):
            for j in range(r):
                keys[:, b] = keys[:, b] * 2 + bits[:, b * r + j]
        return pd.Series(list(keys))

    return band_keys


def random_hyperplane_lsh(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    n_bands: int = 4,
    vec: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Attach `bands`: array of (band_id, band_key) bucket keys.

    band_key packs r = n_planes/n_bands sign bits; two vectors land in the
    same (band_id, band_key) bucket iff they agree on all bits of a band.
    """
    assert n_planes % n_bands == 0
    planes = _hyperplanes(n_planes, dim, seed)
    keys = _band_keys_udf(planes, n_bands)
    with_keys = df.withColumn("_keys", keys(F.col(vec)))
    # _keys is an attribute (ArrowEvalPython output), so the n_bands
    # references below are free column reads, not recomputation.
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.col("_keys")[b].alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return with_keys.withColumn("bands", F.array(*band_cols)).drop("_keys")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 16,
    n_bands: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket-join on LSH bands, exact re-rank on
    candidates.

    The candidate dedup carries only (qid, cid) through its exchange —
    vectors are joined back AFTER: the query side re-broadcasts (small),
    and the corpus side is an equi-join on cid whose build side is the
    (collision-sized) candidate set, so the corpus vectors never shuffle.
    """
    c = random_hyperplane_lsh(corpus, dim, n_planes, n_bands, vec).select(
        F.col(corpus_id).alias("cid"),
        F.explode("bands").alias("b"),
    )
    q = random_hyperplane_lsh(queries, dim, n_planes, n_bands, vec).select(
        F.col(query_id),
        F.explode("bands").alias("b"),
    )
    cand = (
        c.join(F.broadcast(q), c.b == q.b)
        .select(query_id, "cid")
        .dropDuplicates([query_id, "cid"])
    )
    qv = queries.select(F.col(query_id), F.col(vec).alias("_qvec"))
    cv = corpus.select(F.col(corpus_id).alias("cid"), F.col(vec).alias("_cvec"))
    # exact re-rank on candidates only, Arrow pair-cosine kernel
    sims = cand.join(F.broadcast(qv), query_id).join(cv, "cid").select(
        query_id,
        "cid",
        pair_cosine_udf()(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def normalize(vec: Column) -> Column:
    """Unit-normalize (double math); after this, L2 argmin == cosine argmax.

    The norm (an O(dim) fold) is let-bound before the transform references
    it: inlined, Catalyst would re-fold the vector once per element —
    O(dim²) per row (kinesiscat_spark/let.py). Callers that reuse the norm across
    several expressions (cosine_topk, ivf_assign) still carry an explicit
    norm column; that remains the right shape for cross-expression reuse."""
    return let_(
        l2_norm(vec), lambda n: F.transform(vec, lambda x: x.cast("double") / n)
    )


def sq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    n_iters: int = 0,
    id_col: str = "vec_id",
    vec: str = "embedding",
    round_decimals: int | None = 12,
) -> DataFrame:
    """(cell, cvec) centroids for an IVF index.

    Deterministic seed: the ``n_cells`` lowest-id corpus vectors,
    unit-normalized — with ``n_iters=0`` the whole IVF pipeline is
    reproducible in ANSI SQL (the oracle path). ``n_iters>0`` runs Lloyd
    refinement distributed (assign via broadcast centroid join, new means
    via posexplode + per-dimension avg); only k centroid rows ever reach
    the driver, so the loop scales to any corpus size.

    ``round_decimals`` quantizes each refined centroid coordinate (after
    renormalization) to that many decimals. Per-dimension means are
    partial-aggregation sums, so their low bits depend on partition
    layout (Spark) / thread interleaving (an external SQL twin);
    quantizing at 1e-12 — ten orders above double ulp, six below any
    meaningful centroid delta — makes the refined index reproducible
    across engines and parallelism instead of empirically so. ``None``
    keeps raw doubles.

    Round 6: each iteration MATERIALIZES its k centroid rows (collect +
    local relation — the "only k rows reach the driver" contract made
    literal).  The lazy form chained every iteration's corpus pass into
    one ever-deeper plan, and the Arrow assign's per-iteration centroid
    collect would have re-evaluated that chain from the seeds each time
    — O(n_iters²) corpus passes; materializing makes iteration i read
    exactly one corpus pass, the textbook Lloyd shape.  Values are
    bit-identical (collected doubles re-enter as the same doubles), so
    the refined oracle replay is unchanged.
    """
    seeds = (
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .cast("long")
            .alias("cell"),
            normalize(F.col(vec)).alias("cvec"),
        )
        .withColumn("cell", F.col("cell") - 1)
    )
    if n_iters > 0 and round_decimals is not None:
        # Round 10 (the clusters.py guarded-collect discipline): each
        # distributed Lloyd iteration pays an ArrowEvalPython assign pass
        # + a posexplode/avg shuffle + a k-row collect for milliseconds
        # of arithmetic. When the corpus fits comfortably on the driver,
        # run the loop in numpy with the SAME fold orders and the SAME
        # 1e-round_decimals quantization (which exists precisely to make
        # the refinement reproducible across summation orders) —
        # differential-pinned against the distributed loop in
        # tests/test_similarity.py. Oversized or degenerate corpora
        # (NULL/ragged/zero-norm vectors) take the distributed loop.
        rows = (
            corpus.select(F.col(id_col).alias("_i"), F.col(vec).alias("_v"))
            .limit(_LLOYD_DRIVER_LIMIT + 1)
            .collect()
        )
        driver = _lloyd_driver(rows, n_cells, n_iters, round_decimals)
        if driver is not None:
            return _cents_relation(corpus.sparkSession, driver)
    cents = seeds
    for _ in range(n_iters):
        cents = _materialize_cents(
            corpus.sparkSession,
            _lloyd_step(corpus, cents, id_col, vec, round_decimals),
        )
    return cents


# driver-side Lloyd engages only under this corpus row bound (64-dim
# float64 rows at the bound ≈ 32 MB on the driver); larger corpora run
# the exact distributed loop
_LLOYD_DRIVER_LIMIT = 65536


def _lloyd_driver(
    rows: list, n_cells: int, n_iters: int, round_decimals: int
) -> "list | None":
    """Pure-numpy twin of the distributed Lloyd loop over collected
    (id, vec) rows; returns the (cell, cvec) list, or None when the
    corpus is oversized/degenerate and the caller must run distributed.

    Exactness contract, term by term:
    - seed/renormalization norms and assignment dots accumulate
      DIMENSION-BY-DIMENSION (explicit += loops), the same left-fold
      order as the Column ``aggregate`` folds and the Arrow assign
      kernel — bit-identical doubles, so iteration-1 assignments (which
      compare against UNROUNDED seed centroids) cannot diverge;
    - per-cell per-dimension means sum in a different order than
      Spark's partial aggregation, exactly as the DuckDB oracle twin
      already does — the ``round_decimals`` quantization exists to make
      the refinement reproducible across summation orders (see
      ``ivf_centroids``), and it is applied here with
      ``decimal.Decimal`` HALF_UP, the same exact-decimal rounding as
      Spark's BigDecimal ``round()``;
    - ties in the argmin pick the lowest cell (first minimum), the
      struct-min rule.
    """
    import decimal

    if len(rows) > _LLOYD_DRIVER_LIMIT or not rows:
        return None
    first = rows[0]._v
    if first is None or not len(first):
        return None
    dim = len(first)
    for r in rows:
        if r._v is None or len(r._v) != dim:
            return None  # ragged/NULL vectors: distributed semantics
    rows = sorted(rows, key=lambda r: r._i)
    V = np.asarray([r._v for r in rows], dtype=np.float64)  # (n, d)
    # sequential-fold norms (dimension-by-dimension +=)
    norms_sq = np.zeros(len(rows))
    for i in range(dim):
        norms_sq += V[:, i] * V[:, i]
    norms = np.sqrt(norms_sq)
    if not (norms > 0.0).all():
        return None  # zero-norm vectors: distributed semantics
    if len(rows) < n_cells:
        n_cells = len(rows)  # seeds = every vector
    if n_cells == 0:
        return []
    C = V[:n_cells] / norms[:n_cells, None]  # unit seeds, lowest ids
    cell_ids = list(range(n_cells))  # C's rows, ordered by cell id
    N = V / norms[:, None]  # normalized members for the means
    q = decimal.Decimal(1).scaleb(-round_decimals)

    def _round_half_up(x: float) -> float:
        return float(
            decimal.Decimal(x).quantize(q, rounding=decimal.ROUND_HALF_UP)
        )

    for _ in range(n_iters):
        dots = np.zeros((V.shape[0], C.shape[0]))
        for i in range(dim):
            dots += V[:, i : i + 1] * C[:, i]
        # argmin over -dots: first minimum = lowest POSITION, and C's
        # rows are ordered by cell id, so ties pick the lowest cell
        assigned = [cell_ids[j] for j in np.argmin(-dots, axis=1)]
        assigned = np.asarray(assigned, dtype=np.int64)
        new_cells = []
        for cell in sorted(set(assigned.tolist())):  # empty cells drop
            m = N[assigned == cell].mean(axis=0)
            s = 0.0
            for i in range(dim):
                s += m[i] * m[i]
            nm = m / np.sqrt(s)
            new_cells.append((cell, [_round_half_up(float(x)) for x in nm]))
        C = np.asarray([cv for _, cv in new_cells], dtype=np.float64)
        cell_ids = [c for c, _ in new_cells]
    return [
        (cell_ids[j], [float(x) for x in C[j]]) for j in range(len(cell_ids))
    ]


def _lloyd_step(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec: str,
    round_decimals: int | None,
) -> DataFrame:
    """One lazy Lloyd iteration: Arrow assign → per-dimension means →
    renormalize + quantize.  Split out so the plan-shape test can pin
    the norm-materialized-once property on the means pipeline directly
    (the public ``ivf_centroids`` materializes each iteration's k rows,
    so its final plan is a local relation)."""
    # Arrow assign (round 6): bit-identical, numpy constants — see
    # ivf_assign_arrow; every Lloyd iteration assigns the full corpus
    assigned = ivf_assign_arrow(corpus, cents, id_col, vec)
    # The norm is materialized ONCE per row as its own attribute so
    # every exploded element row divides by the same computed value
    # (an element-wise normalize(vec) before posexplode would carry
    # the full normalized array through the explode instead). Values
    # are bit-identical: same x.cast(double) / norm per element.
    sides = corpus.select(
        F.col(id_col),
        F.col(vec).alias("_v"),
        l2_norm(F.col(vec)).alias("_n"),
    )
    new = (
        assigned.join(sides, id_col)
        .select("cell", F.posexplode("_v").alias("pos", "x"), "_n")
        .groupBy("cell", "pos")
        .agg(F.avg(F.col("x").cast("double") / F.col("_n")).alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "cell",
            F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec"),
        )
    )
    # renormalize + quantize act on n_cells rows
    cvec = normalize(F.col("cvec"))
    if round_decimals is not None:
        cvec = F.transform(cvec, lambda x: F.round(x, round_decimals))
    return new.select("cell", cvec.alias("cvec"))


def _collect_cents(cents: DataFrame) -> list:
    """The k (cell, cvec) rows in cell order — ONE bounded collect."""
    return [
        (r.cell, list(r.cvec) if r.cvec is not None else None)
        for r in cents.orderBy("cell").collect()
    ]


def _cents_relation(spark, rows: list) -> DataFrame:
    """Collected centroid rows → local relation (exact: doubles
    round-trip bit-for-bit through collect/createDataFrame)."""
    return spark.createDataFrame(rows, "cell long, cvec array<double>")


def _materialize_cents(spark, cents: DataFrame) -> DataFrame:
    """k centroid rows → driver → local relation (see ivf_centroids:
    one corpus pass per Lloyd iteration instead of a re-evaluated chain).
    Exact: doubles round-trip bit-for-bit through collect/createDataFrame."""
    return _cents_relation(spark, _collect_cents(cents))


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Nearest ``n_probe`` cells per vector: broadcast the centroid table,
    rank by squared L2 on normalized vectors (ties → lower cell id).

    At 100 TB the cross product row count is |vectors| × n_cells — the
    standard IVF assign cost. Centroids broadcast, so the candidate rows
    never shuffle; for ``n_probe=1`` (the index-build path) the argmin is
    a ``min(struct(_d, cell))`` aggregation — map-side partial combine,
    so the one exchange carries a single (id, dist, cell) row per vector
    and map partition, never the vectors. ``n_probe>1`` (the query path,
    small input) keeps the rank window.
    """
    # Rank by -dot(vec, cvec) instead of sq_l2(normalize(vec), cvec):
    # within the per-vector group, sq_l2 of the normalized vector equals
    # 2 - 2*dot(vec, cvec)/||vec|| — a strictly decreasing function of the
    # raw dot product — so the ranking (and tie set) is identical while
    # skipping the normalize pass over every candidate vector entirely.
    from kinesiscat_spark.expr_memo import expr_memo

    def build() -> dict:
        w = Window.partitionBy(id_col).orderBy("_d", "cell")
        return {
            "in_sel": [F.col(id_col), F.col(vec).alias("_v")],
            "d": -dot(F.col("_v"), F.col("cvec")),
            "best_agg": F.min(F.struct("_d", "cell")).alias("_best"),
            "best_sel": [F.col(id_col), F.col("_best.cell").alias("cell")],
            "r": F.row_number().over(w),
            "keep": F.col("_r") <= n_probe,
        }

    ex = expr_memo(("sim.ivf_assign", id_col, vec, n_probe), build)
    pairs = (
        df.select(*ex["in_sel"])
        .join(F.broadcast(centroids))
        .withColumn("_d", ex["d"])
    )
    if n_probe == 1:
        # lexicographic struct-min == orderBy("_d", "cell") first row
        return (
            pairs.groupBy(id_col).agg(ex["best_agg"]).select(*ex["best_sel"])
        )
    return (
        pairs.withColumn("_r", ex["r"])
        .filter(ex["keep"])
        .select(id_col, "cell")
    )


def ivf_assign_arrow(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    _rows: list | None = None,
) -> DataFrame:
    """Nearest cell per vector — BIT-IDENTICAL to
    ``ivf_assign(..., n_probe=1)``, computed by a vectorized Arrow
    kernel instead of n·k interpreted HOF folds.

    The Column form's per-pair ``-dot`` is a zip_with/aggregate fold —
    CodegenFallback, ~100µs per 64-dim fold — and the assign stage
    evaluates it |vectors| × n_cells times, which dominates SemDeDup
    wall time once n_cells grows with the corpus (VERDICT r5 task 8:
    8× probe 4.27).  This kernel accumulates the dots
    DIMENSION-BY-DIMENSION across a (batch × n_cells) numpy array —
    exactly the fold order of ``dot`` and of the SQL oracle's
    ``list_sum`` (the ``_band_keys_udf`` precedent) — so every distance
    carries the same bits and the argmin (ties → lowest cell, matching
    the struct-min rule: np.argmin returns the FIRST minimum and the
    centroid matrix is ordered by cell) selects the identical cell.
    ``tests/test_semdedup.py`` pins row-for-row equality with the
    Column form; the ``dedup_semantic`` lane's DuckDB oracle is the
    cross-engine proof.

    The centroid table collects to the driver (k × d floats — the same
    k-bounded collect every Lloyd iteration already does) and ships in
    the kernel closure; per batch the work is d fused multiply-adds
    over an (N × k) array instead of N·k interpreted folds.
    """
    # _rows: the caller already holds the collected (cell, cvec) rows
    # (round 9 — ivf_topk collects once for assign AND probe broadcast)
    rows = _rows if _rows is not None else centroids.orderBy("cell").collect()
    if not rows:
        return df.select(
            F.col(id_col), F.lit(None).cast("long").alias("cell")
        ).limit(0)
    C = np.asarray([r[1] for r in rows], dtype=np.float64)  # (k, d)
    cell_ids = np.asarray([r[0] for r in rows], dtype=np.int64)

    dim = C.shape[1]

    @F.pandas_udf(T.LongType())
    def best_cell(vs: pd.Series) -> pd.Series:
        n = len(vs)
        if not n:
            return pd.Series([], dtype="Int64")
        # NULL / ragged vectors get a NULL cell instead of crashing the
        # batch in np.stack (ADVICE r6: semdedup pre-filters these, but
        # ivf_topk / ivf_sq_topk / build_ivf_index call this kernel on
        # the raw corpus). A NULL cell falls out of the downstream cell
        # equijoins — the same graceful degrade as the Column form.
        arr = vs.to_numpy()
        valid = np.fromiter(
            (v is not None and len(v) == dim for v in arr), dtype=bool, count=n
        )
        out = pd.array([None] * n, dtype="Int64")
        if valid.any():
            V = np.stack(arr[valid]).astype(np.float64)  # (N_valid, d)
            dots = np.zeros((V.shape[0], C.shape[0]))
            for i in range(dim):
                dots += V[:, i : i + 1] * C[:, i]
            # rank by -dot, ties -> lowest cell: argmin over -dots picks
            # the first (lowest-cell) minimum, the struct-min tie rule
            out[valid] = cell_ids[np.argmin(-dots, axis=1)]
        return pd.Series(out, dtype="Int64")

    return df.select(F.col(id_col), best_cell(F.col(vec)).alias("cell"))


def ivf_assign_blas(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    rerank: int = 8,
    _rows: list | None = None,
) -> DataFrame:
    """Nearest cell per vector — the 100 TB assign path (round 7,
    VERDICT r6 task 5): one float64 BLAS matmul ranks all cells, then the
    top-``rerank`` candidates are re-scored with the EXACT
    dimension-by-dimension fold of :func:`ivf_assign_arrow` (same bits,
    same lowest-cell tie rule), so the chosen cell is the exact-fold
    argmax within the BLAS top-m.

    Why not just BLAS: pairwise/blocked summation makes BLAS dots differ
    from the fold in the last ulps, and the lane contract (and the DuckDB
    oracle) pins the fold's bits. Why not just the fold: accumulating
    (N × k) temps once per dimension is the 8×-probe bottleneck once
    n_cells grows with the corpus (SemDeDup's design point — n·k work
    with a ~50× interpreted constant). This path pays the fold only on
    m ≪ k candidate cells per vector; it differs from the full exact
    fold only if the true argmax falls outside the BLAS top-m, which
    needs m cells within ~1e-15 relative of the best — differential
    equality on every test corpus is pinned in tests/test_semdedup.py.

    NULL/ragged vectors get a NULL cell, exactly like ivf_assign_arrow.
    """
    # _rows: the caller already holds the collected (cell, cvec) rows
    # (round 9 — ivf_topk collects once for assign AND probe broadcast)
    rows = _rows if _rows is not None else centroids.orderBy("cell").collect()
    if not rows:
        return df.select(
            F.col(id_col), F.lit(None).cast("long").alias("cell")
        ).limit(0)
    C = np.asarray([r[1] for r in rows], dtype=np.float64)  # (k, d)
    cell_ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    k, dim = C.shape
    m = min(rerank, k)

    @F.pandas_udf(T.LongType())
    def best_cell(vs: pd.Series) -> pd.Series:
        n = len(vs)
        if not n:
            return pd.Series([], dtype="Int64")
        arr = vs.to_numpy()
        valid = np.fromiter(
            (v is not None and len(v) == dim for v in arr), dtype=bool, count=n
        )
        out = pd.array([None] * n, dtype="Int64")
        if valid.any():
            V = np.stack(arr[valid]).astype(np.float64)  # (N, d)
            approx = V @ C.T  # BLAS — ranking only, never the final bits
            if m < k:
                top = np.argpartition(-approx, m - 1, axis=1)[:, :m]
            else:
                top = np.broadcast_to(np.arange(k), (V.shape[0], k)).copy()
            # candidate columns in ascending cell order so argmin's
            # first-minimum rule is the lowest-cell tie rule
            top.sort(axis=1)
            exact = np.zeros(top.shape)
            for i in range(dim):
                exact += V[:, i : i + 1] * C[top, i]
            out[valid] = cell_ids[
                top[np.arange(top.shape[0]), np.argmin(-exact, axis=1)]
            ]
        return pd.Series(out, dtype="Int64")

    return df.select(F.col(id_col), best_cell(F.col(vec)).alias("cell"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    n_iters: int = 0,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
    _cents: DataFrame | None = None,
    _cents_rows: list | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: search only the ``n_probe`` cells
    nearest to each query, exact cosine re-rank inside them.

    Scale shape: the corpus is bucketed by cell (shuffle once at index
    build, reusable across query batches); a query touches
    n_probe/n_cells of the data. Recall vs exact top-k is asserted in
    tests; with n_iters=0 the result is deterministic and SQL-checkable.

    ``_cents`` injects a precomputed centroid frame (the rm3 `_model`
    passthrough precedent) so a caller that already materialized the
    Lloyd-refined build — or memoized it per corpus content — skips the
    training loop; it must have the (cell, cvec) shape ``ivf_centroids``
    produces. ``_cents_rows`` goes one step further (round 9): the
    caller already holds the collected (cell, cvec) rows — e.g. a
    content-keyed process memo — so this call runs NO training job and
    NO collect at all; the rows become a local relation directly.
    """
    if _cents_rows is not None:
        cents_rows = list(_cents_rows)
    else:
        cents = (
            _cents
            if _cents is not None
            else ivf_centroids(corpus, n_cells, n_iters, corpus_id, vec)
        )
        # ONE centroid collect (round 9, guide §2.4): the k rows are
        # needed on the driver anyway (the Arrow assign ships them in its
        # closure), and the probe assign broadcasts the same values —
        # without this, each consumer re-evaluated the seed/refined
        # subtree (one collect + one broadcast build per call).
        # Bit-identical (doubles round-trip exactly — the Lloyd contract).
        cents_rows = _collect_cents(cents)
    cents = _cents_relation(corpus.sparkSession, cents_rows)
    # corpus-side assign via the Arrow kernel (round 6): bit-identical to
    # the Column fold (see ivf_assign_arrow) but at numpy constants
    # instead of n_cells interpreted folds per vector — the n·k term is
    # the dominant in-plan cost once either n or n_cells grows.
    corpus_cells = ivf_assign_arrow(
        corpus, cents, corpus_id, vec, _rows=cents_rows
    )
    from kinesiscat_spark.expr_memo import expr_memo

    def build() -> dict:
        w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("cid"))
        return {
            "c_sel": [F.col(corpus_id).alias("cid"), F.col(vec).alias("_cvec")],
            "cid_sel": [F.col(corpus_id).alias("cid"), F.col("cell")],
            "q_sel": [F.col(query_id), F.col(vec).alias("_qvec")],
            "sim": pair_cosine_udf()(F.col("_qvec"), F.col("_cvec")).alias(
                "sim"
            ),
            "rnk": F.row_number().over(w).cast("long"),
            "keep": F.col("rnk") <= k,
        }

    ex = expr_memo(("sim.ivf_topk", corpus_id, query_id, vec, k), build)
    indexed = corpus.select(*ex["c_sel"]).join(
        corpus_cells.select(*ex["cid_sel"]), "cid"
    )
    probes = ivf_assign(queries, cents, query_id, vec, n_probe=n_probe)
    q = queries.select(*ex["q_sel"]).join(probes, query_id)
    cand = indexed.join(F.broadcast(q), "cell").select(
        query_id, "cid", ex["sim"]
    )
    return cand.withColumn("rnk", ex["rnk"]).filter(ex["keep"])


def ivf_sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    n_iters: int = 0,
    rerank_k: int | None = None,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
    _cents_rows: list | None = None,
) -> DataFrame:
    """IVF top-k with SQ8 cell scans: the probed cells are ranked on int8
    codes, and only the ``rerank_k`` survivors (default ``4k``) touch the
    float vectors for an exact cosine re-rank — the standard SQ8+IVF
    pairing (FAISS ``IVF,SQ8``).

    Scale shape: the stored index is (cell, codes: array<tinyint>) — the
    cell-scan and its candidate exchange move 4 bytes/dim less than
    float64 arrays (4× under float32, 8× under this table's doubles);
    queries broadcast as codes too. Only ``rerank_k`` (cid, qid) pairs
    per query reach the float join, so the expensive column is read for a
    k-proportional row count, not per candidate. Returned ``sim`` values
    are exact; membership beyond the re-rank frontier inherits SQ8
    approximation on top of IVF cell pruning (recall vs exact is pinned
    in tests/test_quantize.py).
    """
    from kinesiscat_spark.operators.quantize import (
        int8_dot,
        quantize_embeddings,
    )

    rerank_k = rerank_k or 4 * k
    # one centroid collect for both assigns (see ivf_topk); a caller-side
    # content-keyed rows memo skips even that (``_cents_rows``, round 9)
    cents_rows = (
        list(_cents_rows)
        if _cents_rows is not None
        else _collect_cents(
            ivf_centroids(corpus, n_cells, n_iters, corpus_id, vec)
        )
    )
    cents = _cents_relation(corpus.sparkSession, cents_rows)
    # corpus-side assign via the Arrow kernel (round 6): bit-identical to
    # the Column fold (see ivf_assign_arrow) but at numpy constants
    # instead of n_cells interpreted folds per vector — the n·k term is
    # the dominant in-plan cost once either n or n_cells grows.
    corpus_cells = ivf_assign_arrow(
        corpus, cents, corpus_id, vec, _rows=cents_rows
    )
    from kinesiscat_spark.expr_memo import expr_memo

    def build() -> dict:
        w = Window.partitionBy(query_id).orderBy(
            F.desc_nulls_last("_asim"), F.asc("cid")
        )
        return {
            "c_sel": [
                F.col(corpus_id).alias("cid"),
                F.col("codes").alias("_cc"),
            ],
            "cn": F.sqrt(int8_dot(F.col("_cc"), F.col("_cc")).cast("double")),
            "cid_sel": [F.col(corpus_id).alias("cid"), F.col("cell")],
            "q_sel": [F.col(query_id), F.col("codes").alias("_qc")],
            "qn": F.sqrt(int8_dot(F.col("_qc"), F.col("_qc")).cast("double")),
            "asim": F.try_divide(
                int8_dot(F.col("_qc"), F.col("_cc")).cast("double"),
                F.col("_qn") * F.col("_cn"),
            ).alias("_asim"),
            "r": F.row_number().over(w),
            "keep": F.col("_r") <= rerank_k,
            "cand_sel": [F.col(query_id), F.col("cid")],
        }

    ex = expr_memo(
        ("sim.ivf_sq", corpus_id, query_id, rerank_k), build
    )
    # the stored index: cell + codes + code norm, no float vectors
    indexed = (
        quantize_embeddings(corpus, corpus_id, vec)
        .select(*ex["c_sel"])
        .withColumn("_cn", ex["cn"])
        .join(corpus_cells.select(*ex["cid_sel"]), "cid")
    )
    probes = ivf_assign(queries, cents, query_id, vec, n_probe=n_probe)
    q = (
        quantize_embeddings(queries, query_id, vec)
        .select(*ex["q_sel"])
        .withColumn("_qn", ex["qn"])
        .join(probes, query_id)
    )
    # phase 1: integer-dot cosine inside the probed cells (per-vector SQ8
    # scales cancel against the code norms; zero vectors score null → last)
    approx = indexed.join(F.broadcast(q), "cell").select(
        query_id, "cid", ex["asim"]
    )
    cand = (
        approx.withColumn("_r", ex["r"])
        .filter(ex["keep"])
        .select(*ex["cand_sel"])
    )
    # phase 2: exact float re-rank for the survivors only — the candidate
    # side broadcasts so the corpus float column is scanned in place and
    # never exchanged (quantize.exact_float_rerank, shared by every
    # quantized search path; letting Catalyst pick by stats here can flip
    # to shuffling the whole corpus vector table at scale).
    from kinesiscat_spark.operators.quantize import exact_float_rerank

    return exact_float_rerank(corpus, queries, cand, k, corpus_id, query_id, vec)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    key_cols: tuple[str, ...] = ("cid",),
    rank_col: str = "rnk",
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked lists:
    score(d) = Σ_r 1/(k + rank_r(d)) over the lists that contain d. The
    standard way to fuse lexical (bm25_topk) and vector (cosine/ivf/lsh
    top-k) retrieval without score calibration; k=60 is the published
    default.

    ``key_cols`` identifies a result row across lists — ("cid",) fuses
    single-query lists, ("qid", "cid") fuses per-query top-k tables (the
    fusion then ranks within each qid). Scale shape: each input
    contributes (keys, 1/(k+rank)) rows — top-k-sized, not corpus-sized —
    one union + one keyed aggregation; the final rank is a window over
    top-k-bounded groups.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(*key_cols, (1.0 / (k + F.col(rank_col))).alias("_c"))
        for r in rankings
    ]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy(*key_cols).agg(F.sum("_c").alias("rrf_score"))
    group = list(key_cols[:-1])  # rank within qid when present
    w = (
        Window.partitionBy(*group) if group else Window.partitionBy()
    ).orderBy(F.desc("rrf_score"), F.asc(key_cols[-1]))
    out = fused.withColumn("rnk", F.row_number().over(w).cast("long"))
    return out.filter(F.col("rnk") <= top_k) if top_k else out


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 16,
    lam: float = 0.7,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
    _candidates: DataFrame | None = None,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick, per query, the candidate maximizing

        λ · sim(q, d)  −  (1−λ) · max_{s ∈ selected} sim(d, s)

    over an exact top-``n_candidates`` cosine candidate pool — the
    relevance-vs-redundancy re-rank a retrieval pipeline runs so the k
    results aren't k near-duplicates of each other. The empty-selection
    penalty is 0.0, so pick 1 is the plain cosine argmax. Ties break
    (score DESC, cid ASC). Returns (qid, cid, score, rnk) with rnk the
    pick order 1..k, score rounded to 6 dp.

    Deterministic and ANSI-SQL-replayable: candidate qsims come from the
    hash-proven pair-cosine kernel; candidate-pair sims accumulate
    dimension-by-dimension in the kernel (exactly the oracle's
    ``list_sum`` fold order — the semdedup precedent), the score is one
    written arithmetic order with the (1.0 − λ) coefficient computed
    identically, and the k greedy steps unroll into oracle CTE layers
    (the Lloyd recipe).

    Scale shape: candidate generation is the distributed ``cosine_topk``
    (corpus never shuffles); the greedy runs per-query over
    ``n_candidates`` rows via applyInPandas — O(k·n + n·n·dim) on a
    bounded pool, never the corpus.
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if n_candidates < k:
        raise ValueError(
            f"n_candidates must be >= k (got {n_candidates} < {k})"
        )
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1] (got {lam})")
    # ``_candidates``: a precomputed (ideally materialized) cosine_topk
    # frame covering >= n_candidates ranks — family lanes share ONE
    # candidate pass across their exact/mmr/triplet methods
    cands = (
        _candidates.filter(F.col("rnk") <= n_candidates)
        if _candidates is not None
        else cosine_topk(
            corpus, queries, n_candidates, corpus_id, query_id, vec
        )
    )
    withvec = cands.join(
        corpus.select(F.col(corpus_id).alias("cid"), F.col(vec).alias("_cvec")),
        "cid",
    )
    pen = 1.0 - lam

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("cid").reset_index(drop=True)
        V = np.stack(pdf["_cvec"].to_numpy()).astype(np.float64)
        n = len(pdf)
        dots = np.zeros((n, n))
        nrm = np.zeros(n)
        # dimension-by-dimension accumulation == the oracle's list_sum
        # left-to-right fold (np.dot's pairwise summation would differ
        # in the last ulp)
        for d in range(V.shape[1]):
            dots += np.outer(V[:, d], V[:, d])
            nrm += V[:, d] * V[:, d]
        rn = np.sqrt(nrm)
        qsim = pdf["sim"].to_numpy()
        cids = pdf["cid"].to_numpy()
        selected: list[int] = []
        remaining = list(range(n))
        out_cid, out_score, out_rnk = [], [], []
        for step in range(1, min(k, n) + 1):
            best = None
            for i in remaining:
                # true max over the selected set (can be negative —
                # only the EMPTY set coalesces to 0.0, matching the
                # oracle's COALESCE(MAX(psim), 0.0))
                p = None
                for j in selected:
                    s = dots[i, j] / (rn[i] * rn[j])
                    if p is None or s > p:
                        p = s
                if p is None:
                    p = 0.0
                score = lam * qsim[i] - pen * p
                key = (-score, int(cids[i]))
                if best is None or key < best[0]:
                    best = (key, i, score)
            _, bi, bscore = best
            selected.append(bi)
            remaining.remove(bi)
            out_cid.append(int(cids[bi]))
            out_score.append(round(bscore, 6))
            out_rnk.append(step)
        return pd.DataFrame(
            {
                "qid": [int(pdf[query_id][0])] * len(out_cid),
                "cid": out_cid,
                "score": out_score,
                "rnk": out_rnk,
            }
        )

    return withvec.groupBy(query_id).applyInPandas(
        greedy, schema="qid long, cid long, score double, rnk long"
    )


def semi_hard_triplets(
    corpus: DataFrame,
    queries: DataFrame,
    n_candidates: int = 10,
    margin: float = 0.05,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec: str = "embedding",
    _candidates: DataFrame | None = None,
) -> DataFrame:
    """Semi-hard triplet mining (Schroff et al. 2015, FaceNet §3.2 —
    the anchor/positive/negative selection rule contrastive embedding
    finetuning trains on): per query (anchor), the POSITIVE is the
    nearest neighbor, and the semi-hard NEGATIVE is the highest-ranked
    candidate at least ``margin`` below the positive's similarity —
    close enough to be informative, far enough to be a true negative
    (the hardest-negative rule without the label-noise failure mode).
    Queries with no candidate below the margin emit no negative row
    (the caller widens ``n_candidates``).

    Returns (qid, cid, sim, role, rnk): role ∈ {'pos','neg'}, rnk 1/2.
    Deterministic: candidates come from the hash-proven ``cosine_topk``
    ordering; the negative pick is a rank-min over an exact sim
    comparison, ties already broken (sim DESC, cid ASC) upstream.

    Scale shape: everything after the distributed candidate top-k is
    per-query window logic over ≤ ``n_candidates`` rows.
    """
    if margin < 0.0:
        raise ValueError(f"margin must be >= 0 (got {margin})")
    cands = (
        _candidates.filter(F.col("rnk") <= n_candidates)
        if _candidates is not None
        else cosine_topk(
            corpus, queries, n_candidates, corpus_id, query_id, vec
        )
    )
    pos = cands.filter(F.col("rnk") == 1).select(
        F.col(query_id), F.col("cid").alias("_pos_cid"),
        F.col("sim").alias("_pos_sim"),
    )
    neg_w = Window.partitionBy(query_id).orderBy("rnk")
    neg = (
        cands.join(pos, query_id)
        .filter(F.col("sim") < F.col("_pos_sim") - F.lit(margin))
        .withColumn("_nr", F.row_number().over(neg_w))
        .filter(F.col("_nr") == 1)
        .select(
            F.col(query_id),
            "cid",
            "sim",
            F.lit("neg").alias("role"),
            F.lit(2).cast("long").alias("rnk"),
        )
    )
    pos_rows = pos.select(
        F.col(query_id),
        F.col("_pos_cid").alias("cid"),
        F.col("_pos_sim").alias("sim"),
        F.lit("pos").alias("role"),
        F.lit(1).cast("long").alias("rnk"),
    )
    return pos_rows.unionByName(neg)
