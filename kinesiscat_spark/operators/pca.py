"""PCA dimensionality reduction for embedding columns.

The standard ANN preprocessing step (the FAISS ``PCAR64,IVF...`` index
prefix; public technique — Jolliffe, Principal Component Analysis): learn
an orthogonal projection from the corpus covariance, then project every
vector before indexing/search. Cuts vector bytes (and every downstream
distance) by dim_out/dim while keeping most of the variance.

Spark-first shape:

- **Training is ONE corpus pass with a tiny exchange.** Each row emits a
  single flattened array [upper-triangle of x·xᵀ | x | 1] (d(d+1)/2 + d +
  1 doubles, 2 145 for d = 64); ``posexplode`` + ``groupBy(pos).sum``
  aggregates it with map-side partials, so the shuffle carries at most
  (#partitions × 2 145) rows regardless of corpus size, and exactly
  2 145 rows reach the driver. No mapInPandas, no collect of vectors.
- **The eigendecomposition is driver-side numpy** on the d×d covariance —
  d is the embedding dimension (64 here, ≤ a few thousand anywhere), so
  this is O(d³) on a d²-sized object: never a distributed problem.
- **Projection is scan-stage Columns**: the (rounded) components become a
  literal array-of-arrays; each output coordinate is a zip_with/aggregate
  dot product against the let-bound centered vector — JVM codegen, no
  UDF, no shuffle.

Determinism: the Gram partial sums are floating-point and associativity-
sensitive, so the covariance is quantized (``round_decimals``, default
1e-9 — the Lloyd-centroid precedent) before ``eigh``, and each
eigenvector's sign is fixed (largest-|coordinate| entry made positive).
The model and all projections then reproduce across partitionings to
float precision (quantization-boundary sums aside); tests pin numpy
agreement and partition invariance at 1e-6.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesiscat_spark.let import let_


@dataclass(frozen=True)
class PCAModel:
    mean: tuple[float, ...]  # zeros when center=False
    components: tuple[tuple[float, ...], ...]  # dim_out rows of dim floats
    explained_variance: tuple[float, ...]  # descending eigenvalues


def pca_train(
    corpus: DataFrame,
    dim_out: int,
    vec_col: str = "embedding",
    center: bool = True,
    round_decimals: int = 9,
) -> PCAModel:
    """Fit PCA on the corpus vectors (see module docstring for the
    distributed shape). Returns the top ``dim_out`` components by
    explained variance, sign-fixed and rounded for reproducibility."""
    import numpy as np

    row = corpus.select(F.col(vec_col).alias("v")).first()
    if row is None:
        raise ValueError("pca_train: empty corpus")
    d = len(row.v)
    if not 1 <= dim_out <= d:
        raise ValueError(f"dim_out must be in [1, {d}], got {dim_out}")

    # flattened stats vector: upper triangle (i <= j) of x xT, then x,
    # then 1 — built with nested transform/sequence, NOT d(d+1)/2 literal
    # subexpressions: the literal form compiles a ~2k-term codegen method
    # per plan (tens of seconds of fixed JIT cost); the HOF form is a
    # constant-size expression tree that loops at runtime instead
    idx_pairs = [(i, j) for i in range(d) for j in range(i, d)]
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def stats_of(v: Column) -> Column:
        seq = F.sequence(F.lit(0), F.lit(d - 1))
        el = lambda i: F.element_at(v, i + 1)  # noqa: E731
        upper = F.flatten(
            F.transform(
                seq,
                lambda i: F.transform(
                    F.sequence(i, F.lit(d - 1)), lambda j: el(i) * el(j)
                ),
            )
        )
        return F.concat(upper, v, F.array(F.lit(1.0)))

    stats = let_(dv, stats_of)
    sums = (
        corpus.select(F.posexplode(stats).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum("x").alias("s"))
        .collect()
    )
    flat = np.zeros(len(idx_pairs) + d + 1)
    for r in sums:
        flat[r.pos] = r.s
    n = flat[-1]
    if n < 2:
        raise ValueError("pca_train: need at least 2 vectors")
    mean = flat[len(idx_pairs) : len(idx_pairs) + d] / n
    gram = np.zeros((d, d))
    for k, (i, j) in enumerate(idx_pairs):
        gram[i, j] = gram[j, i] = flat[k]
    cov = gram / n
    if center:
        cov = cov - np.outer(mean, mean)
    else:
        mean = np.zeros(d)
    # quantize before eigh: partial-sum order must not leak into the model
    cov = np.round(cov, round_decimals)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:dim_out]
    comps = []
    for k in order:
        vec = eigvecs[:, k]
        if vec[int(np.argmax(np.abs(vec)))] < 0:  # sign fix
            vec = -vec
        comps.append(tuple(float(x) for x in np.round(vec, round_decimals)))
    return PCAModel(
        mean=tuple(float(x) for x in np.round(mean, round_decimals)),
        components=tuple(comps),
        explained_variance=tuple(float(eigvals[k]) for k in order),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vec_col`` onto the model's components — appends
    ``out_col`` as ``array<double>`` of length dim_out. Pure scan-stage
    Column math (the components are plan literals, the centered vector is
    let-bound so it computes once per row), zero shuffle."""
    mean_lit = F.array(*[F.lit(m) for m in model.mean])
    comps_lit = F.array(
        *[F.array(*[F.lit(x) for x in c]) for c in model.components]
    )
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mean_lit, lambda x, m: x - m
    )

    def body(cv: Column) -> Column:
        return F.transform(
            comps_lit,
            lambda c: F.aggregate(
                F.zip_with(cv, c, lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )

    return df.withColumn(out_col, let_(centered, body))
