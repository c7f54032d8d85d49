"""Quality-classifier filtering (operators/quality_classifier.py):
pure-python gradient-descent replay differential, separation on
synthetic data, exact partition invariance (value-ordered gradient
folds), scan-stage scoring, and the deterministic Pareto keep rule."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from kinesiscat_spark.operators.quality_classifier import (
    QualityModel,
    feature_ids,
    pareto_keep,
    score_documents_quality,
    sigmoid,
    train_quality_classifier,
)

N_FEATURES = 64
GOOD = [
    "a thoughtful essay with careful prose and clear structure",
    "careful prose and a clear argument in every thoughtful paragraph",
    "clear careful writing with thoughtful structure and prose",
]
BAD = [
    "click here buy now cheap cheap deals click buy",
    "buy cheap deals now click here now cheap",
    "cheap click buy deals deals now here click",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(t, 1) for t in GOOD] + [(t, 0) for t in BAD]
    return spark.createDataFrame(rows, "text string, label int")


def _collect_ids(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        r.ids
        for r in df.select(feature_ids(F.col("text"), N_FEATURES).alias("ids"))
        .collect()
    ]


def _replay(ids_list, ys, n_features, n_iter, lr, l2):
    """Driver-faithful GD: value-ordered error folds, round-at-1e-9."""
    w = [0.0] * n_features
    b = 0.0
    n = len(ys)
    for _ in range(n_iter):
        errs = []
        for ids, y in zip(ids_list, ys):
            m = 0.0
            for j in ids:
                m += w[j]
            errs.append(sigmoid(m + b) - y)
        grad = [[] for _ in range(n_features)]
        for ids, e in zip(ids_list, errs):
            for j in ids:
                grad[j].append(e)
        gsum = []
        for vals in grad:
            acc = 0.0
            for v in sorted(vals):
                acc += v
            gsum.append(acc)
        bacc = 0.0
        for v in sorted(errs):
            bacc += v
        w = [wi - lr * (round(gi / n, 9) + l2 * wi) for wi, gi in zip(w, gsum)]
        b -= lr * round(bacc / n, 9)
    return w, b


def test_train_matches_python_replay(spark, labeled):
    model = train_quality_classifier(
        labeled, n_features=N_FEATURES, n_iter=10, lr=0.5, l2=1e-4
    )
    ids = _collect_ids(spark, GOOD + BAD)
    w, b = _replay(ids, [1] * 3 + [0] * 3, N_FEATURES, 10, 0.5, 1e-4)
    assert max(abs(a - e) for a, e in zip(model.weights, w)) < 1e-8
    assert abs(model.bias - b) < 1e-8


def test_model_separates_synthetic_corpus(spark, labeled):
    model = train_quality_classifier(labeled, n_features=N_FEATURES, n_iter=30)
    scored = score_documents_quality(labeled, model).collect()
    pos = [r.quality_score for r in scored if r.label == 1]
    neg = [r.quality_score for r in scored if r.label == 0]
    assert min(pos) > max(neg)
    assert all(0.0 <= s <= 1.0 for s in pos + neg)


def test_train_partition_invariant_exact(spark, labeled):
    m1 = train_quality_classifier(
        labeled.repartition(7), n_features=N_FEATURES, n_iter=8
    )
    m2 = train_quality_classifier(
        labeled.coalesce(1), n_features=N_FEATURES, n_iter=8
    )
    assert m1 == m2  # bit-identical: ordered folds + driver-side steps


def test_empty_training_set(spark):
    df = spark.createDataFrame([], "text string, label int")
    model = train_quality_classifier(df, n_features=16, n_iter=3)
    assert model == QualityModel((0.0,) * 16, 0.0, 16)


def test_score_matches_manual_sigmoid(spark, labeled):
    model = train_quality_classifier(labeled, n_features=N_FEATURES, n_iter=5)
    scored = score_documents_quality(labeled, model).collect()
    ids = _collect_ids(spark, [r.text for r in scored])
    for r, row_ids in zip(scored, ids):
        m = 0.0
        for j in row_ids:
            m += model.weights[j]
        assert abs(r.quality_score - sigmoid(m + model.bias)) < 1e-12


def test_score_null_text(spark):
    model = QualityModel((0.5,) * 16, -0.25, 16)
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    rows = score_documents_quality(df, model).orderBy("doc_id").collect()
    # no words → margin = bias for empty; NULL text propagates NULL score
    assert rows[0].quality_score is None
    assert abs(rows[1].quality_score - sigmoid(-0.25)) < 1e-12


def test_pareto_keep_deterministic_and_score_biased(spark):
    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(0.95)).otherwise(F.lit(0.05)).alias("s"),
    )
    kept = df.filter(pareto_keep(F.col("s"), F.col("id"), alpha=9.0, salt=3))
    k1 = sorted(r.id for r in kept.collect())
    k2 = sorted(r.id for r in kept.repartition(13).collect())
    assert k1 == k2
    hi = sum(1 for i in k1 if i % 2 == 0) / 2000
    lo = sum(1 for i in k1 if i % 2 == 1) / 2000
    # P(pareto(9) > 1−s): s=.95 → 1.05⁻⁹ ≈ .645; s=.05 → 1.95⁻⁹ ≈ .0025
    assert 0.55 < hi < 0.75
    assert lo < 0.05
    assert lo > 0.0  # the tail does sometimes win (GPT-3 semantics)


def test_pareto_invalid_alpha():
    with pytest.raises(ValueError):
        pareto_keep(F.lit(0.5), F.lit(1), alpha=0.0)


def test_curate_classifier_stage(spark, labeled):
    from kinesiscat_spark.pipelines import CurationConfig, curate
    from kinesiscat_spark.operators.quality_classifier import (
        score_documents_quality,
    )

    model = train_quality_classifier(labeled, n_features=N_FEATURES, n_iter=20)
    docs = labeled.select(
        F.monotonically_increasing_id().alias("doc_id"),
        "text",
        F.lit("en").alias("lang"),
    )
    counts: dict = {}
    cfg = CurationConfig(
        min_tokens=1, quality_model=model, pareto_salt=5, stage_counts=counts
    )
    out = curate(docs, cfg)
    # the stage ran, filtered something, and equals the manual composition
    manual = score_documents_quality(docs, model).filter(
        pareto_keep(F.col("quality_score"), F.col("doc_id"), 9.0, 5)
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in manual.collect()
    )
    assert counts["classifier"] <= counts["pii"]
    assert "quality_score" not in out.columns and "_q" not in out.columns


def test_calibration_report_hand_computed(spark):
    """The reliability table: equal-count bins in rank order, exact
    positive rates, value-ordered mean scores; a perfectly separable
    score yields a monotone 0-to-1 pos_rate staircase."""
    import pytest

    from kinesiscat_spark.operators.quality_classifier import (
        calibration_report,
    )

    rows = [(i, float(i >= 6), float(i)) for i in range(12)]
    scored = spark.createDataFrame(rows, "doc_id long, y double, margin double")
    rep = {r.bin: r for r in calibration_report(scored, n_bins=3).collect()}
    assert set(rep) == {1, 2, 3}
    assert all(rep[b].n_docs == 4 for b in rep)
    assert [rep[b].n_pos for b in (1, 2, 3)] == [0, 2, 4]
    assert [rep[b].pos_rate for b in (1, 2, 3)] == [0.0, 0.5, 1.0]
    assert rep[1].mean_score == 1.5 and rep[3].mean_score == 9.5
    with pytest.raises(ValueError):
        calibration_report(scored, n_bins=1)
