"""Metrics CV harness (pipeline/metrics.py): scorer math, fold semantics,
and the calculate_metrics report layout replayed against the reference's
golden CSVs (structure + data-derived columns; metric VALUES come from the
dependency-free fallback estimator, CatBoost being absent by design)."""

import os
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

FIXTURE_DIR = "/root/reference/tests/test_data/enricher"
GOLDEN_BINARY = os.path.join(FIXTURE_DIR, "test_metrics/test_default_metric_binary.csv")
GOLDEN_RMSLE = os.path.join(FIXTURE_DIR, "test_metrics/test_blocked_timeseries_rmsle.csv")

DISPLAY_RE = re.compile(r"^-?\d+\.\d{3} ± \d+\.\d{3}$")


# -- scorers ----------------------------------------------------------------

def test_roc_auc_matches_rank_definition():
    from upgini_spark.pipeline.metrics import roc_auc_score

    y = np.array([0, 0, 1, 1])
    s = np.array([0.1, 0.4, 0.35, 0.8])
    assert roc_auc_score(y, s) == 0.75  # sklearn's doc example
    # ties take average ranks
    assert roc_auc_score(np.array([0, 1]), np.array([0.5, 0.5])) == 0.5
    assert roc_auc_score(np.array([0, 1, 1, 0]), np.array([0, 1, 1, 0])) == 1.0


def test_scorer_ladder_and_gini_naming():
    from upgini_spark.pipeline.metrics import define_scorer

    s = define_scorer("BINARY", None)
    assert (s.metric_name, s.multiplier) == ("GINI", 1)
    s = define_scorer("REGRESSION", None)
    assert (s.metric_name, s.multiplier) == ("MAPE", -1)
    s = define_scorer("MULTICLASS", None)
    assert (s.metric_name, s.multiplier) == ("accuracy", 1)
    s = define_scorer("REGRESSION", "RMSLE")
    assert (s.metric_name, s.multiplier) == ("RMSLE", -1)
    # error metrics return sklearn-convention negatives
    assert s.fn(np.array([1.0, 2.0]), np.array([1.0, 2.0])) == 0.0
    assert s.fn(np.array([1.0]), np.array([3.0])) < 0
    with pytest.raises(ValueError):
        define_scorer("BINARY", "nope")


def test_rmsle_clips_negative_predictions():
    from upgini_spark.pipeline.metrics import define_scorer

    s = define_scorer("REGRESSION", "rmsle")
    # _ext_root_mean_squared_log_error clips negatives instead of raising
    v = s.fn(np.array([1.0, 2.0]), np.array([-5.0, 2.0]))
    assert np.isfinite(v) and v < 0


# -- estimators -------------------------------------------------------------

def test_logistic_estimator_learns_separable():
    from upgini_spark.pipeline.metrics import LogisticEstimator

    rng = np.random.RandomState(7)
    x = pd.DataFrame({"a": rng.normal(size=400)})
    y = (x["a"] > 0).astype(int).to_numpy()
    est = LogisticEstimator().fit(x, y)
    proba = est.predict_proba(x)[:, 1]
    assert ((proba > 0.5) == (y == 1)).mean() > 0.97
    # deterministic: refit gives bit-identical probabilities
    proba2 = LogisticEstimator().fit(x, y).predict_proba(x)[:, 1]
    assert (proba == proba2).all()


def test_ridge_estimator_exact_linear():
    from upgini_spark.pipeline.metrics import RidgeEstimator

    x = pd.DataFrame({"a": np.arange(50, dtype=float)})
    y = 3.0 * x["a"].to_numpy() + 5.0
    pred = RidgeEstimator(alpha=1e-8).fit(x, y).predict(x)
    assert np.allclose(pred, y, atol=1e-6)


def test_prep_handles_categories_and_nulls():
    from upgini_spark.pipeline.metrics import _Prep

    x = pd.DataFrame({"c": ["b", "a", None, "b"], "n": [1.0, None, 3.0, 4.0]})
    p = _Prep().fit(x)
    m = p.transform(x)
    assert m.shape == (4, 2) and np.isfinite(m).all()
    # unseen category at transform falls back to train mean, not a crash
    m2 = p.transform(pd.DataFrame({"c": ["zzz"], "n": [2.0]}))
    assert np.isfinite(m2).all()


# -- fold semantics ---------------------------------------------------------

def _toy(n=120):
    rng = np.random.RandomState(3)
    x = rng.normal(size=n)
    y = (x + rng.normal(scale=0.5, size=n) > 0).astype(int)
    return pd.DataFrame({
        "f": x, "noise": rng.normal(size=n), "target": y,
        "fold_id": np.arange(n) % 4,
    })


def test_kfold_cross_val_predict_and_eval_reuse():
    from upgini_spark.pipeline.metrics import CVMetricsHarness

    pdf = _toy()
    h = CVMetricsHarness("BINARY")
    res = h.cross_val_predict(pdf, ["f"], "target", "fold_id")
    assert len(h.estimators) == 4
    assert 0.5 < res.metric <= 1.0  # GINI of an informative feature
    assert DISPLAY_RE.match(res.get_display_metric())
    ev = h.calculate_metric(pdf, "target")
    assert ev.metric is not None and len(h.estimators) == 4


def test_time_series_scheme_trains_only_on_past():
    from upgini_spark.pipeline.metrics import CVMetricsHarness

    # fold ids 0..2 chronological; null head rows
    pdf = pd.DataFrame({
        "f": np.arange(40, dtype=float),
        "target": np.arange(40, dtype=float) * 2,
        "fold_id": [None] * 10 + [0] * 10 + [1] * 10 + [2] * 10,
    })
    h = CVMetricsHarness("REGRESSION", "rmse", cv_scheme="time_series")
    splits = list(h._splits(pdf, "fold_id"))
    assert len(splits) == 3
    for train, test in splits:
        assert train["f"].max() < test["f"].min()  # strictly earlier rows only
    res = h.cross_val_predict(pdf, ["f"], "target", "fold_id")
    assert res.metric is not None


def test_blocked_scheme_uses_roles():
    from upgini_spark.pipeline.metrics import CVMetricsHarness

    pdf = pd.DataFrame({
        "f": np.arange(30, dtype=float),
        "target": np.arange(30, dtype=float),
        "fold_id": [0] * 10 + [1] * 10 + [2] * 10,
        "cv_role": (["train"] * 8 + ["test"] * 2) * 3,
    })
    h = CVMetricsHarness("REGRESSION", "rmse", cv_scheme="blocked")
    for train, test in h._splits(pdf, "fold_id"):
        assert set(train["cv_role"]) == {"train"} and set(test["cv_role"]) == {"test"}
        assert train["fold_id"].nunique() == 1  # within-block only


# -- report golden replay ---------------------------------------------------

@pytest.mark.skipif(not os.path.exists(GOLDEN_BINARY), reason="reference fixtures absent")
def test_metrics_report_binary_golden_structure(spark):
    """Reference test_default_metric_binary layout: same input slicing
    (train 500 / eval 250+250 of input.csv), same headers, same Rows and
    Mean target values; metric values from the fallback estimator pass
    the display-format contract."""
    from upgini_spark.pipeline.cv import stratified_kfold_column
    from upgini_spark.pipeline.metrics import calculate_metrics_report

    golden = pd.read_csv(GOLDEN_BINARY)
    df = pd.read_csv(os.path.join(FIXTURE_DIR, "input.csv"))
    # enrichment stand-in: a feature correlated with target (the mocked
    # ads_feature1 plays this role in the reference test)
    h = pd.util.hash_array(df["phone"].to_numpy()).astype(float)
    df["ads_feature1"] = df["target"] * 2.0 + (h % 997) / 997.0

    train, ev1, ev2 = df[0:500].copy(), df[500:750].copy(), df[750:1000].copy()
    sdf = spark.createDataFrame(train)
    train = (
        stratified_kfold_column(sdf, "target", ["phone"], n_splits=5)
        .toPandas()
    )
    report = calculate_metrics_report(
        train, "target",
        baseline_cols=["feature1"],
        enriched_cols=["feature1", "ads_feature1"],
        fold_col="fold_id", task_type="BINARY",
        eval_frames=[ev1, ev2],
    )
    assert list(report.columns) == list(golden.columns)
    assert report["Dataset type"].tolist() == golden["Dataset type"].tolist()
    assert report["Rows"].tolist() == golden["Rows"].tolist()
    assert report["Mean target"].tolist() == golden["Mean target"].tolist()
    for cell in report["Baseline GINI"].tolist() + report["Enriched GINI"].tolist():
        assert DISPLAY_RE.match(cell), cell
    for cell in report["Uplift, %"]:
        assert cell.endswith("%")
    # the informative enrichment must register as positive uplift on train
    assert report.loc[0, "Uplift, abs"] > 0


@pytest.mark.skipif(not os.path.exists(GOLDEN_RMSLE), reason="reference fixtures absent")
def test_metrics_report_rmsle_golden_structure(spark):
    """test_blocked_timeseries_rmsle layout with blocked CV folds."""
    from upgini_spark.pipeline.cv import blocked_time_series_column
    from upgini_spark.pipeline.metrics import calculate_metrics_report

    golden = pd.read_csv(GOLDEN_RMSLE)
    df = pd.read_csv(os.path.join(FIXTURE_DIR, "input.csv"))
    df["date"] = np.arange(len(df))
    h = pd.util.hash_array(df["phone"].to_numpy()).astype(float)
    df["ads_feature1"] = df["target"] * 2.0 + (h % 997) / 997.0
    train, ev1, ev2 = df[0:500].copy(), df[500:750].copy(), df[750:1000].copy()
    sdf = spark.createDataFrame(train)
    train = blocked_time_series_column(
        sdf, "date", ["phone"], n_splits=3, test_size=0.2
    ).toPandas()
    report = calculate_metrics_report(
        train, "target",
        baseline_cols=["feature1"],
        enriched_cols=["feature1", "ads_feature1"],
        fold_col="fold_id", task_type="REGRESSION",
        eval_frames=[ev1, ev2], scoring="RMSLE", cv_scheme="blocked",
    )
    assert list(report.columns) == list(golden.columns)
    assert report["Dataset type"].tolist() == golden["Dataset type"].tolist()
    assert report["Rows"].tolist() == golden["Rows"].tolist()
    assert report["Mean target"].tolist() == golden["Mean target"].tolist()
    for cell in report["Baseline RMSLE"]:
        assert DISPLAY_RE.match(cell), cell


def test_report_skips_oot_eval_and_handles_no_baseline():
    from upgini_spark.pipeline.metrics import calculate_metrics_report

    pdf = _toy()
    oot = pdf.copy()
    oot["target"] = np.nan
    report = calculate_metrics_report(
        pdf, "target", baseline_cols=["f"], enriched_cols=["f", "noise"],
        fold_col="fold_id", task_type="BINARY", eval_frames=[oot, pdf.copy()],
    )
    # OOT (all-null target) eval skipped: Train + Eval 2 only
    assert report["Dataset type"].tolist() == ["Train", "Eval 2"]
    # no client features at all -> no baseline/uplift columns
    r2 = calculate_metrics_report(
        pdf, "target", baseline_cols=[], enriched_cols=["f"],
        fold_col="fold_id", task_type="BINARY",
    )
    assert "Baseline GINI" not in r2.columns and "Uplift, abs" not in r2.columns
    assert "Enriched GINI" in r2.columns


# -- end-to-end: enricher.calculate_metrics over Spark frames ---------------

def test_enricher_calculate_metrics_e2e(spark):
    from upgini_spark.fixtures import feature_source, tokenized_sequences
    from upgini_spark.pipeline.enricher import SparkFeaturesEnricher

    left = tokenized_sequences(spark, 600).withColumn(
        "client_f", (F.col("n_tok") % 100).cast("double")
    ).withColumn(
        # binary target correlated with the client feature
        "target_bin", (F.col("n_tok") % 2).cast("int")
    ).withColumn(
        "eval_set_index", F.when(F.col("n_tok") % 5 == 0, 1).otherwise(0)
    )
    right = feature_source(spark, 600)
    enr = SparkFeaturesEnricher(right).fit(
        left, "doc_id", "event_time", feature_cols=["client_f"],
        target_col="target_bin", validate_features=False,
    )
    report = enr.calculate_metrics(left, "target_bin")
    assert report["Dataset type"].tolist() == ["Train", "Eval 1"]
    assert "Baseline GINI" in report.columns
    assert "Enriched GINI" in report.columns
    assert (report["Rows"] > 0).all()


# -- permutation importance (the deterministic SHAP stand-in) ---------------

def test_permutation_importance_ranks_informative_feature():
    from upgini_spark.pipeline.metrics import CVMetricsHarness

    pdf = _toy(240)
    h = CVMetricsHarness("BINARY")
    h.cross_val_predict(pdf, ["f", "noise"], "target", "fold_id")
    imp = h.permutation_importance(pdf, "target", "fold_id")
    assert set(imp) == {"f", "noise"}
    assert imp["f"] > imp["noise"]
    assert imp["f"] > 0
    # deterministic: same inputs, bit-identical result
    h2 = CVMetricsHarness("BINARY")
    h2.cross_val_predict(pdf, ["f", "noise"], "target", "fold_id")
    assert h2.permutation_importance(pdf, "target", "fold_id") == imp


def test_permutation_importance_error_metric_orientation():
    """For an error scorer (RMSE) a helpful feature must still come out
    POSITIVE (raw scores are greater-is-better internally)."""
    from upgini_spark.pipeline.metrics import CVMetricsHarness

    rng = np.random.RandomState(11)
    x = rng.normal(size=200)
    pdf = pd.DataFrame({
        "f": x, "noise": rng.normal(size=200),
        "target": 3 * x + rng.normal(scale=0.1, size=200),
        "fold_id": np.arange(200) % 4,
    })
    h = CVMetricsHarness("REGRESSION", "rmse")
    h.cross_val_predict(pdf, ["f", "noise"], "target", "fold_id")
    imp = h.permutation_importance(pdf, "target", "fold_id")
    assert imp["f"] > 0.5  # destroying the only real feature hurts a lot
    assert abs(imp["noise"]) < 0.2


def test_report_return_harnesses_and_importances():
    from upgini_spark.pipeline.metrics import calculate_metrics_report

    pdf = _toy()
    report, bh, eh = calculate_metrics_report(
        pdf, "target", baseline_cols=["f"], enriched_cols=["f", "noise"],
        fold_col="fold_id", task_type="BINARY", return_harnesses=True,
    )
    assert "Enriched GINI" in report.columns
    imp = eh.permutation_importance(pdf, "target", "fold_id")
    assert imp["f"] > imp["noise"]


def test_baseline_score_column_gini_no_fit():
    """features_enricher.py:1104-1118 / metrics.py:475-481: with a
    baseline_score_column and GINI, the baseline metric is roc_auc of
    that column (×2−1), no model fit, no std; eval frames score the
    same column directly — but the reference's EVAL-side path
    (metrics.py:549-551) returns RAW roc_auc with NO GINI post-process
    (an asymmetry we replay exactly, r5 ADVICE item)."""
    from upgini_spark.pipeline.metrics import (
        CVMetricsHarness,
        calculate_metrics_report,
        roc_auc_score,
    )

    pdf = _toy()
    pdf["ext_score"] = pdf["f"]  # the informative signal as a raw score
    h = CVMetricsHarness("BINARY")
    res = h.cross_val_predict(
        pdf, ["f"], "target", "fold_id", baseline_score_column="ext_score"
    )
    expect = 2 * roc_auc_score(pdf["target"].to_numpy(), pdf["ext_score"].to_numpy()) - 1
    assert res.metric == expect and res.metric_std is None
    assert res.get_display_metric() == f"{expect:.3f}"  # no ± suffix
    assert h.estimators == []
    ev = h.calculate_metric(pdf, "target")
    raw_auc = roc_auc_score(pdf["target"].to_numpy(), pdf["ext_score"].to_numpy())
    assert ev.metric == raw_auc  # raw, NOT 2*auc-1 (reference parity)
    # report path: baseline column present, enriched still CV-fit
    report = calculate_metrics_report(
        pdf, "target", baseline_cols=["f"], enriched_cols=["f", "noise"],
        fold_col="fold_id", task_type="BINARY",
        baseline_score_column="ext_score",
    )
    assert report.loc[0, "Baseline GINI"] == f"{expect:.3f}"
    assert "±" in report.loc[0, "Enriched GINI"]


def test_enricher_check_stability_e2e(spark):
    from upgini_spark.fixtures import feature_source, tokenized_sequences
    from upgini_spark.pipeline.enricher import SparkFeaturesEnricher

    n = 2400
    left = tokenized_sequences(spark, n).withColumn(
        "client_f", (F.col("n_tok") % 100).cast("double")
    ).withColumn("target_bin", (F.col("n_tok") % 2).cast("int")).withColumn(
        # eval segment = trailing half of the time range, >=1000 rows
        "eval_set_index",
        F.when(F.col("event_time") >= F.lit("2023-03-15"), 1).otherwise(0),
    )
    right = feature_source(spark, n)
    enr = SparkFeaturesEnricher(right).fit(
        left, "doc_id", "event_time", feature_cols=["client_f"],
        target_col="target_bin", validate_features=False,
    )
    unstable, stable_vals = enr.check_stability(left)
    # attributes recorded; the synthetic features are stationary so most
    # (possibly all) survive — the contract is shape + partition
    assert enr.unstable_features_ == unstable
    assert all(p <= 0.2 for p in stable_vals.values())
    assert set(unstable).isdisjoint(stable_vals)
    # frames without an eval set short-circuit like the reference
    assert enr.check_stability(left.drop("eval_set_index")) == ([], {})
