"""Quality-classifier filtering: hashed-feature logistic regression.

The GPT-3 / CCNet curation recipe (Brown et al. 2020 §A; Wenzek et al.
2020) trains a linear classifier to separate a high-quality reference
corpus from raw web text, scores every document, and keeps a
score-biased sample.  This module is that recipe, Spark-first:

- **Features** are the hashing trick (Weinberger et al. 2009): each
  whitespace word maps to ``pmod(xxhash64(salt, word), n_features)``.
  No vocabulary object, no fit step, no dense vector materialized —
  the per-document feature map is (hashed id, count) rows derived
  scan-stage from the word array.
- **Training** is full-batch gradient descent run as a driver loop
  (the same shape as Lloyd refinement and BPE training): one job per
  iteration computes the gradient ``Xᵀ(σ(Xw) − y)`` with a narrow
  (feature id, partial) exchange — the corpus text never shuffles —
  and the driver applies the step.  The weight vector travels to
  executors as a one-row DataFrame cross-join (the bloom.py pattern;
  a literal array of n_features elements would hit the codegen wall
  PCA documented).  Gradients are quantized at 1e-9 per iteration so
  the learned model is partition-invariant (the PCA/Lloyd precedent
  for float partial-sum order).
- **Scoring** is scan-stage: one aggregate over the word array against
  the broadcast weight row, no shuffle, no Python.
- **Selection** replays GPT-3's Pareto trick deterministically:
  GPT-3 keeps a document iff ``np.random.pareto(α) > 1 − score``; here
  the uniform draw is content-hashed (the sampling.py discipline — no
  ``rand()``), so the kept set is identical on any cluster, any
  partitioning, any rerun.

Training set sizing: the classifier is trained on a labeled SAMPLE
(reference-vs-raw), not the corpus — |sample| ≪ corpus, so the
iteration cost is bounded; scoring is the only corpus-wide pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.operators.curation import words

N_FEATURES_DEFAULT = 1 << 10
HASH_SALT = 101


def feature_ids(
    text: Column,
    n_features: int = N_FEATURES_DEFAULT,
    method: str = "xxhash64",
    salt: int = HASH_SALT,
) -> Column:
    """array<int> of hashed feature ids, one per word occurrence, in
    word order.  ``method='md5'`` costs a digest per word but reproduces
    in any engine with md5 (12 hex chars → 48-bit int → mod — the
    sampling.py discipline), which is what lets the classifier lane
    carry a DuckDB twin; xxhash64 is the fast default."""
    if method == "md5":
        hashed = lambda w: F.conv(  # noqa: E731
            F.substring(
                F.md5(F.concat_ws("\x1f", w, F.lit(str(salt)))), 1, 12
            ),
            16,
            10,
        ).cast("long")
    elif method == "xxhash64":
        hashed = lambda w: F.xxhash64(F.lit(salt), w)  # noqa: E731
    else:
        raise ValueError(f"unknown hash method {method!r}")
    return F.transform(
        words(text),
        lambda w: F.pmod(hashed(w), F.lit(n_features)).cast("int"),
    )


@dataclass(frozen=True)
class QualityModel:
    weights: tuple[float, ...]  # n_features
    bias: float
    n_features: int
    hash_method: str = "xxhash64"
    hash_salt: int = HASH_SALT


def _margin(ids: Column, weights: Column, bias: Column) -> Column:
    """wᵀx + b over the hashed-id array, reading the weight row slot-wise."""
    return (
        F.aggregate(
            ids,
            F.lit(0.0),
            lambda acc, j: acc + F.element_at(weights, j + F.lit(1)),
        )
        + bias
    )


def _weights_row(spark, w: list[float], bias: float) -> DataFrame:
    # Underscore-prefixed temp names (repo convention: _h, _q, _nrm) so a
    # caller DataFrame that already has a column named "w" or "b" neither
    # collides nor gets silently dropped by the post-score .drop().
    return spark.createDataFrame(
        [(w, float(bias))], "_w array<double>, _b double"
    )


def _ordered_sum(col: str) -> Column:
    """Sum as a VALUE-ORDERED left fold: collect, sort, accumulate.
    Float addition is deterministic given the order, so the gradient is
    bit-identical on any partitioning (the repo's value-ordered-fold
    pattern); fine here because training runs on a labeled SAMPLE, so
    per-feature lists are bounded by the sample size.  The sort + fold
    evaluate once per group, after the aggregate."""
    return F.aggregate(
        F.array_sort(F.collect_list(col)), F.lit(0.0), lambda a, x: a + x
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = N_FEATURES_DEFAULT,
    n_iter: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
    hash_method: str = "xxhash64",
    hash_salt: int = HASH_SALT,
) -> QualityModel:
    """Fit logistic weights on (text, label∈{0,1}) rows; deterministic
    and partition-invariant (gradients quantized at 1e-9 per step).

    One narrow aggregation per iteration: margins evaluate scan-stage
    against the broadcast weight row, per-feature gradient partials
    shuffle as at most (n_features + 1) rows after map-side combine.
    """
    spark = labeled.sparkSession
    feats = labeled.select(
        F.col(label_col).cast("double").alias("y"),
        feature_ids(F.col(text_col), n_features, hash_method, hash_salt).alias(
            "ids"
        ),
    ).cache()
    n = feats.count()
    if n == 0:
        return QualityModel(
            (0.0,) * n_features, 0.0, n_features, hash_method, hash_salt
        )

    w = [0.0] * n_features
    b = 0.0
    for _ in range(n_iter):
        wrow = _weights_row(spark, w, b)
        err = feats.crossJoin(F.broadcast(wrow)).select(
            "ids",
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-_margin(F.col("ids"), F.col("_w"), F.col("_b"))))
                - F.col("y")
            ).alias("e"),
        )
        # the bias gradient (Σe) rides the same aggregation as feature id
        # −1 — every row contributes one sentinel — so each iteration is
        # ONE job, not a gradient job plus a bias job
        grad_rows = (
            err.select(
                F.explode(
                    F.concat(F.col("ids"), F.array(F.lit(-1)))
                ).alias("j"),
                "e",
            )
            .groupBy("j")
            .agg(_ordered_sum("e").alias("g"))
            .collect()
        )
        bias_grad = 0.0
        grad = [0.0] * n_features
        for r in grad_rows:
            if r.j < 0:
                bias_grad = r.g
            else:
                grad[r.j] = r.g
        # 1e-9 quantization is belt-and-braces on top of the ordered
        # folds; the step itself runs driver-side in plain Python
        w = [
            wi - lr * (round(gi / n, 9) + l2 * wi)
            for wi, gi in zip(w, grad)
        ]
        b -= lr * round(bias_grad / n, 9)
    feats.unpersist()
    return QualityModel(tuple(w), b, n_features, hash_method, hash_salt)


def quality_margin(
    text: Column, model: QualityModel, weights: Column, bias: Column
) -> Column:
    """wᵀx + b (pre-sigmoid) given the broadcast weight-row columns.
    The margin is pure +/× arithmetic — no transcendental — so it is
    the quantity the classifier lane hash-checks cross-engine (libm
    ``exp`` is not bit-specified between engines; σ is monotone, so
    thresholding on either is equivalent)."""
    ids = feature_ids(
        text, model.n_features, model.hash_method, model.hash_salt
    )
    return _margin(ids, weights, bias)


def quality_score(
    text: Column, model: QualityModel, weights: Column, bias: Column
) -> Column:
    """σ(wᵀx + b) given the broadcast weight-row columns."""
    return F.lit(1.0) / (
        F.lit(1.0) + F.exp(-quality_margin(text, model, weights, bias))
    )


def score_documents_quality(
    docs: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    out_col: str = "quality_score",
    output: str = "score",
) -> DataFrame:
    """Append σ(wᵀx + b) (``output='score'``) or the raw margin
    (``output='margin'``) — one scan, weight row broadcast, no shuffle.

    On a STREAMING DataFrame the weights ride as a single array literal
    instead of the 1-row cross join (stream-static cross joins are not
    reliably supported; one Literal(ArrayData) is a constant reference,
    not n_features expressions, so there is no codegen-wall risk).
    """
    if output not in ("score", "margin"):
        raise ValueError(f"unknown output {output!r}")
    expr = quality_score if output == "score" else quality_margin
    if docs.isStreaming:
        return docs.withColumn(
            out_col,
            expr(
                F.col(text_col),
                model,
                F.lit(list(model.weights)),
                F.lit(model.bias),
            ),
        )
    wrow = _weights_row(docs.sparkSession, list(model.weights), model.bias)
    return (
        docs.crossJoin(F.broadcast(wrow))
        .withColumn(
            out_col, expr(F.col(text_col), model, F.col("_w"), F.col("_b"))
        )
        .drop("_w", "_b")
    )


def pareto_keep(
    score: Column,
    id_col: Column,
    alpha: float = 9.0,
    salt: int = 0,
) -> Column:
    """GPT-3's score-biased keep rule, made deterministic: keep iff
    ``pareto(α) > 1 − score`` where the Pareto draw comes from a
    content-hashed uniform via the inverse CDF ``(1−u)^(−1/α) − 1``
    (Brown et al. 2020 §A used np.random.pareto; a seeded RNG would
    re-draw under retries/repartitioning, silently changing the kept
    set — content hashing cannot).  High scores always survive; low
    scores survive with Pareto-tail probability.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive (got {alpha})")
    u = (
        F.pmod(F.xxhash64(F.lit(salt), id_col), F.lit(1 << 30)).cast("double")
        / F.lit(float(1 << 30))
    )
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return pareto > (F.lit(1.0) - score)


def sigmoid(x: float) -> float:
    """Reference scalar sigmoid (numerically symmetric) for tests."""
    if x >= 0:
        return 1.0 / (1.0 + math.exp(-x))
    z = math.exp(x)
    return z / (1.0 + z)


def calibration_report(
    scored: DataFrame,
    n_bins: int = 10,
    label_col: str = "y",
    score_col: str = "margin",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binned calibration (reliability-diagram) report for a classifier's
    scores (Zadrozny & Elkan 2002's binning estimator; the table behind
    every reliability plot): rank documents by score, cut into
    ``n_bins`` equal-count bins, and report each bin's empirical
    positive rate next to its mean score — "does a higher quality
    margin actually mean a higher P(en)?" A monotone pos_rate column is
    a calibratable score; flat or non-monotone bins flag a filter whose
    threshold does not mean what its user thinks.

    Exact and engine-replayable WITHOUT transcendentals (the reason this
    is the hash-checked calibration surface while Platt scaling — libm
    ``exp`` — stays pytest-only): the bin of rank r is
    floor((r−1)·B/n)+1 in integer arithmetic, pos_rate is an exact
    0/1-sum ratio, and mean_score folds in VALUE order. Returns
    (bin, n_docs, n_pos, pos_rate, mean_score).

    Scale shape: ONE global rank over (score, id) scalars — the same
    documented exactness cost as the percentile surfaces (at 100 TB,
    approx quantile cuts give the same report shape) — then a
    map-side-combinable per-bin aggregate.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2 (got {n_bins})")
    w = Window.orderBy(score_col, id_col)
    ranked = scored.select(
        F.col(label_col).cast("double").alias("_y"),
        F.col(score_col).alias("_s"),
        F.row_number().over(w).alias("_rk"),
    )
    n1 = ranked.agg(F.count("*").alias("_n"))
    binned = ranked.crossJoin(F.broadcast(n1)).select(
        (
            F.floor((F.col("_rk") - 1) * n_bins / F.col("_n")) + 1
        ).cast("long").alias("bin"),
        "_y",
        "_s",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_y").cast("long").alias("n_pos"),
            (F.sum("_y") / F.count("*")).alias("pos_rate"),
            (
                F.aggregate(
                    F.sort_array(F.collect_list("_s")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.count("*")
            ).alias("mean_score"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.round("pos_rate", 6).alias("pos_rate"),
            F.round("mean_score", 6).alias("mean_score"),
        )
    )
