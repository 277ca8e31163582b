"""Metrics CV harness — the driver-side `calculate_metrics` lifecycle step.

Reference: src/upgini/metrics.py:464-667 (EstimatorWrapper.cross_val_predict
/ calculate_metric / _calculate_metric_from_folds / get_display_metric:255-261),
define_scorer + _get_scorer_by_name (metrics.py:1018-1196) and the report
assembly in features_enricher.py:1060-1290 (train row = CV mean ± std over
folds; each eval row = the per-fold estimators re-scored on that eval frame;
uplift = (enriched − baseline) × multiplier).

The reference runs this step on a ≤100k-row sampled *pandas* frame (its own
design — model training never touches the distributed table). The Spark
engine reproduces exactly that contract: sampling (functions/sampling.py)
and fold assignment (pipeline/cv.py) happen distributed, the frame is then
collected once and cross-validated here. CatBoost/LightGBM are not in this
environment, so the estimators are deterministic, dependency-free numpy
models (ridge closed form / logistic gradient descent) standing in for the
reference's model wrappers; the scorers, fold math, display formatting and
report layout ARE the reference's.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Scorers (sklearn conventions: error metrics return NEGATED values, the
# display multiplier −1 flips them back — metrics.py:1093-1196)
# ---------------------------------------------------------------------------


def roc_auc_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney with average ranks for ties) — the
    exact statistic sklearn's roc_auc_score computes for binary targets."""
    y_true = np.asarray(y_true, dtype=float)
    y_score = np.asarray(y_score, dtype=float)
    pos = y_true == np.max(y_true)
    n_pos = int(pos.sum())
    n_neg = int(len(y_true) - n_pos)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("roc_auc needs both classes present")
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty(len(y_score), dtype=float)
    sorted_scores = y_score[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0  # average rank, 1-based
        i = j + 1
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def _accuracy(y, p):
    return float(np.mean(np.asarray(y) == np.asarray(p)))


def _neg_rmse(y, p):
    return -float(np.sqrt(np.mean((np.asarray(y, float) - np.asarray(p, float)) ** 2)))


def _neg_mae(y, p):
    return -float(np.mean(np.abs(np.asarray(y, float) - np.asarray(p, float))))


def _neg_mape(y, p):
    y = np.asarray(y, float)
    p = np.asarray(p, float)
    denom = np.maximum(np.abs(y), np.finfo(float).eps)
    return -float(np.mean(np.abs((y - p) / denom)))


def _neg_msle(y, p):
    y = np.asarray(y, float)
    p = np.clip(np.asarray(p, float), 0.0, None)  # _ext_* clips negatives
    return -float(np.mean((np.log1p(y) - np.log1p(p)) ** 2))


def _neg_rmsle(y, p):
    return -float(math.sqrt(-_neg_msle(y, p)))


@dataclass
class Scorer:
    fn: object
    metric_name: str
    multiplier: int
    needs_proba: bool


def define_scorer(task_type: str, scoring: str | None = None) -> Scorer:
    """Reference define_scorer (metrics.py:1084-1106): defaults
    BINARY→roc_auc (displayed GINI), MULTICLASS→accuracy,
    REGRESSION→MAPE; name ladder from _get_scorer_by_name."""
    if scoring is None:
        scoring = {"BINARY": "roc_auc", "MULTICLASS": "accuracy",
                   "REGRESSION": "MAPE"}.get(task_type)
        if scoring is None:
            raise ValueError(f"unsupported target type {task_type}")
    s = scoring.lower()
    table = {
        "msle": Scorer(_neg_msle, "MSLE", -1, False),
        "mean_squared_log_error": Scorer(_neg_msle, "MSLE", -1, False),
        "rmsle": Scorer(_neg_rmsle, "RMSLE", -1, False),
        "root_mean_squared_log_error": Scorer(_neg_rmsle, "RMSLE", -1, False),
        "rmse": Scorer(_neg_rmse, "RMSE", -1, False),
        "root_mean_squared_error": Scorer(_neg_rmse, "RMSE", -1, False),
        "mape": Scorer(_neg_mape, "MAPE", -1, False),
        "mean_absolute_percentage_error": Scorer(_neg_mape, "MAPE", -1, False),
        "mae": Scorer(_neg_mae, "MAE", -1, False),
        "mean_absolute_error": Scorer(_neg_mae, "MAE", -1, False),
        "roc_auc": Scorer(roc_auc_score, "roc_auc", 1, True),
        "accuracy": Scorer(_accuracy, "accuracy", 1, False),
    }
    if s not in table:
        raise ValueError(f"unsupported scoring {scoring}")
    sc = table[s]
    if sc.metric_name == "roc_auc" and task_type == "BINARY":
        sc = Scorer(sc.fn, "GINI", sc.multiplier, sc.needs_proba)
    return sc


def _post_process(metric: float, metric_name: str) -> float:
    """GINI = 2·AUC − 1 (metrics.py post_process_metric:541)."""
    return 2 * metric - 1 if metric_name == "GINI" else metric


# ---------------------------------------------------------------------------
# Dependency-free deterministic estimators
# ---------------------------------------------------------------------------


class _Prep:
    """Train-frame-fitted feature prep: non-numeric → ordinal codes by
    sorted category; numeric nulls → train mean; standardize."""

    def fit(self, x: pd.DataFrame) -> "_Prep":
        self.cols = list(x.columns)
        self.cat_maps = {}
        mat = np.empty((len(x), len(self.cols)), dtype=float)
        for j, c in enumerate(self.cols):
            col = x[c]
            if not pd.api.types.is_numeric_dtype(col):
                cats = sorted({str(v) for v in col.dropna()})
                self.cat_maps[c] = {v: i for i, v in enumerate(cats)}
                mat[:, j] = self._encode_cat(col, c)
            else:
                mat[:, j] = pd.to_numeric(col, errors="coerce").astype(float)
        self.means = np.nanmean(mat, axis=0)
        self.means = np.where(np.isfinite(self.means), self.means, 0.0)
        mat = np.where(np.isnan(mat), self.means, mat)
        self.stds = np.std(mat, axis=0)
        self.stds = np.where(self.stds > 0, self.stds, 1.0)
        return self

    def _encode_cat(self, col: pd.Series, c: str) -> np.ndarray:
        m = self.cat_maps[c]
        return np.array(
            [m.get(str(v), np.nan) if not pd.isna(v) else np.nan for v in col],
            dtype=float,
        )

    def transform(self, x: pd.DataFrame) -> np.ndarray:
        mat = np.empty((len(x), len(self.cols)), dtype=float)
        for j, c in enumerate(self.cols):
            col = x[c]
            if c in self.cat_maps:
                mat[:, j] = self._encode_cat(col, c)
            else:
                mat[:, j] = pd.to_numeric(col, errors="coerce").astype(float)
        mat = np.where(np.isnan(mat), self.means, mat)
        return (mat - self.means) / self.stds


class RidgeEstimator:
    """Closed-form ridge regression — deterministic, no iteration."""

    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha

    def fit(self, x: pd.DataFrame, y: np.ndarray) -> "RidgeEstimator":
        self.prep = _Prep().fit(x)
        m = self.prep.transform(x)
        m = np.hstack([m, np.ones((len(m), 1))])
        a = m.T @ m + self.alpha * np.eye(m.shape[1])
        a[-1, -1] -= self.alpha  # don't penalize the intercept
        self.w = np.linalg.solve(a, m.T @ np.asarray(y, float))
        return self

    def predict(self, x: pd.DataFrame) -> np.ndarray:
        m = self.prep.transform(x)
        return np.hstack([m, np.ones((len(m), 1))]) @ self.w


class LogisticEstimator:
    """Batch gradient-descent logistic regression (fixed schedule —
    bit-deterministic, seed-free). One-vs-rest for multiclass."""

    def __init__(self, lr: float = 0.5, n_iter: int = 200, l2: float = 1e-3):
        self.lr, self.n_iter, self.l2 = lr, n_iter, l2

    def _fit_binary(self, m: np.ndarray, y01: np.ndarray) -> np.ndarray:
        w = np.zeros(m.shape[1])
        n = len(y01)
        for _ in range(self.n_iter):
            z = np.clip(m @ w, -35, 35)
            p = 1.0 / (1.0 + np.exp(-z))
            g = m.T @ (p - y01) / n + self.l2 * w
            g[-1] -= self.l2 * w[-1]  # unpenalized intercept
            w -= self.lr * g
        return w

    def fit(self, x: pd.DataFrame, y: np.ndarray) -> "LogisticEstimator":
        self.prep = _Prep().fit(x)
        m = np.hstack([self.prep.transform(x), np.ones((len(x), 1))])
        self.classes = sorted(pd.unique(pd.Series(y).dropna()), key=str)
        ya = np.asarray(y)
        self.ws = [self._fit_binary(m, (ya == c).astype(float)) for c in self.classes]
        return self

    def predict_proba(self, x: pd.DataFrame) -> np.ndarray:
        m = np.hstack([self.prep.transform(x), np.ones((len(x), 1))])
        z = np.clip(np.stack([m @ w for w in self.ws], axis=1), -35, 35)
        p = 1.0 / (1.0 + np.exp(-z))
        return p / p.sum(axis=1, keepdims=True)

    def predict(self, x: pd.DataFrame) -> np.ndarray:
        idx = np.argmax(self.predict_proba(x), axis=1)
        return np.array([self.classes[i] for i in idx])


def _make_estimator(
    task_type: str, estimator: str = "linear",
    estimator_params: dict | None = None,
):
    """'linear' = the closed-form/GD stand-ins above; 'gbdt' = the
    histogram-GBDT twin of the reference's CatBoost metric estimators
    (pipeline/gbdt.py — real trees + exact TreeSHAP).
    ``estimator_params`` carries the custom-loss resolution output
    (e.g. {'loss_function': 'MAPE'} from
    custom_loss.get_additional_params_custom_loss)."""
    if estimator == "gbdt":
        from upgini_spark.pipeline.gbdt import GBDTClassifier, GBDTRegressor

        params = dict(estimator_params or {})
        if task_type == "REGRESSION":
            return GBDTRegressor(**params)
        return GBDTClassifier(**params)
    return RidgeEstimator() if task_type == "REGRESSION" else LogisticEstimator()


# ---------------------------------------------------------------------------
# CV harness
# ---------------------------------------------------------------------------


@dataclass
class CrossValResult:
    metric: float | None
    metric_std: float | None

    def get_display_metric(self) -> str | None:
        """metrics.py:255-261 — '0.108 ± 0.062' formatting."""
        if self.metric is None:
            return None
        if self.metric_std is None:
            return f"{self.metric:.3f}"
        return f"{self.metric:.3f} ± {self.metric_std:.3f}"


@dataclass
class CVMetricsHarness:
    """cross_val_predict + per-fold estimator reuse on eval frames.

    ``fold_col`` values come from pipeline/cv.py assignment columns (the
    distributed splitters); rows with a null fold (TS train-only head /
    blocked 'unused' remainder) never enter any validation fold but do
    train every fold whose id differs — matching index-array semantics
    where they appear only in train slices.
    """

    task_type: str
    scoring: str | None = None
    cv_scheme: str = "kfold"  # kfold | time_series | blocked
    role_col: str = "cv_role"
    estimator: str = "linear"  # linear | gbdt
    estimator_params: dict | None = None
    estimators: list = field(default_factory=list)
    fold_feature_cols: list = field(default_factory=list)

    def __post_init__(self):
        self.scorer = define_scorer(self.task_type, self.scoring)

    def _splits(self, pdf: pd.DataFrame, fold_col: str):
        """(train, test) frames per fold, honoring the splitter semantics
        the fold columns encode: KFold = rest-vs-fold; TimeSeriesSplit =
        strictly-earlier rows (null fold = leading train-only head) vs
        test block; Blocked = block head vs block tail (cv_role)."""
        for f in sorted(pdf[fold_col].dropna().unique()):
            if self.cv_scheme == "time_series":
                yield (
                    pdf[pdf[fold_col].isna() | (pdf[fold_col] < f)],
                    pdf[pdf[fold_col] == f],
                )
            elif self.cv_scheme == "blocked":
                blk = pdf[pdf[fold_col] == f]
                yield (
                    blk[blk[self.role_col] == "train"],
                    blk[blk[self.role_col] == "test"],
                )
            else:
                yield (
                    pdf[pdf[fold_col].isna() | (pdf[fold_col] != f)],
                    pdf[pdf[fold_col] == f],
                )

    def _score(self, est, x: pd.DataFrame, y: np.ndarray) -> float:
        if self.scorer.needs_proba:
            proba = est.predict_proba(x)
            if proba.shape[1] != 2:
                # proba.max(axis=1) into roc_auc would be a meaningless
                # statistic — fail loudly rather than return a bogus metric
                raise ValueError(
                    f"probability scorer '{self.scorer.metric_name}' supports "
                    f"binary targets only, got {proba.shape[1]} classes "
                    "(use a multiclass-aware scoring instead)"
                )
            pred = proba[:, 1]
        else:
            pred = est.predict(x)
        return self.scorer.fn(np.asarray(y), pred)

    def _fold_metrics(self, raw: list[float]) -> CrossValResult:
        """_calculate_metric_from_folds (metrics.py:569-573): post-process
        (GINI) each fold, mean × multiplier, std × |multiplier|."""
        vals = [_post_process(m, self.scorer.metric_name) for m in raw]
        return CrossValResult(
            float(np.mean(vals)) * self.scorer.multiplier,
            float(np.std(vals)) * abs(self.scorer.multiplier),
        )

    def cross_val_predict(
        self, pdf: pd.DataFrame, feature_cols: list[str], target_col: str,
        fold_col: str, baseline_score_column: str | None = None,
    ) -> CrossValResult:
        """With ``baseline_score_column`` and a GINI metric, no model is
        fit at all: the metric is roc_auc of that pre-scored column vs
        the target (metrics.py:475-481 — an externally-scored baseline),
        post-processed to GINI, no std."""
        if baseline_score_column is not None and self.scorer.metric_name == "GINI":
            m = roc_auc_score(
                pdf[target_col].to_numpy(), pdf[baseline_score_column].to_numpy()
            )
            self.estimators = []
            self._baseline_score_col = baseline_score_column
            return CrossValResult(
                _post_process(m, "GINI") * self.scorer.multiplier, None
            )
        if not feature_cols:
            return CrossValResult(None, None)
        self.fold_feature_cols = list(feature_cols)

        def _one_fold(train, test):
            est = _make_estimator(
                self.task_type, self.estimator, self.estimator_params
            ).fit(train[feature_cols], train[target_col].to_numpy())
            return est, self._score(
                est, test[feature_cols], test[target_col].to_numpy()
            )

        # the per-fold fits are independent pure functions of disjoint
        # slices (fixed GD schedule, no RNG, no shared state), so running
        # them in threads changes NO numbers — numpy ufuncs/BLAS release
        # the GIL on these 10k+-row arrays. pool.map preserves fold order
        # for self.estimators and the fold-metric sequence.
        splits = list(self._splits(pdf, fold_col))
        from concurrent.futures import ThreadPoolExecutor

        if len(splits) > 1:
            with ThreadPoolExecutor(max_workers=min(8, len(splits))) as pool:
                results = list(pool.map(lambda p: _one_fold(*p), splits))
        else:
            results = [_one_fold(tr, te) for tr, te in splits]
        self.estimators = [est for est, _m in results]
        raw = [m for _est, m in results]
        return self._fold_metrics(raw)

    def permutation_importance(
        self, pdf: pd.DataFrame, target_col: str, fold_col: str
    ) -> dict[str, float]:
        """Per-feature importance — the dependency-free stand-in for the
        reference's per-fold SHAP averaging (metrics.py calculate_shap /
        features_enricher._update_shap_values): on each fold's
        VALIDATION slice, importance of feature f = score drop when f's
        column is cyclically shifted by one position (breaks row
        alignment deterministically — no RNG, bit-reproducible), averaged
        over folds. Call after :meth:`cross_val_predict` (reuses the
        fold estimators). Returns {feature: mean importance} in the
        scorer's display orientation (positive = feature helps)."""
        if not self.estimators:
            return {}
        sums = {f: 0.0 for f in self.fold_feature_cols}
        n_folds = 0
        for (train, test), est in zip(self._splits(pdf, fold_col), self.estimators):
            if not len(test):
                continue
            y = test[target_col].to_numpy()
            base = self._score(est, test[self.fold_feature_cols], y)
            n_folds += 1
            for f in self.fold_feature_cols:
                x = test[self.fold_feature_cols].copy()
                x[f] = np.roll(x[f].to_numpy(), 1)
                # raw scores are greater-is-better (errors arrive negated,
                # sklearn scorer convention), so base − permuted > 0 ⇔
                # the feature helps — for every scorer, no multiplier.
                sums[f] += base - self._score(est, x, y)
        if not n_folds:
            return {}
        return {f: s / n_folds for f, s in sums.items()}

    def shap_importance(
        self, pdf: pd.DataFrame, fold_col: str
    ) -> dict[str, float]:
        """The reference's calculate_shap statistic (metrics.py:
        np.mean(np.abs(shap_values), axis=0)) from the REAL trees: exact
        TreeSHAP on each fold's validation slice, mean |phi| per feature,
        averaged over folds. Only the gbdt estimator exposes SHAP; call
        after :meth:`cross_val_predict`."""
        if not self.estimators or self.estimator != "gbdt":
            return {}
        from upgini_spark.pipeline.gbdt import shap_importances

        sums = np.zeros(len(self.fold_feature_cols))
        n_folds = 0
        for (train, test), est in zip(self._splits(pdf, fold_col), self.estimators):
            if not len(test):
                continue
            sums += shap_importances(est, test[self.fold_feature_cols])
            n_folds += 1
        if not n_folds:
            return {}
        return dict(zip(self.fold_feature_cols, sums / n_folds))

    def calculate_metric(self, pdf: pd.DataFrame, target_col: str) -> CrossValResult:
        """Eval-segment scoring: every fold estimator re-scored on the
        full eval frame, folded with the same mean ± std (metrics.py
        calculate_metric:549-567); the baseline_score_column path scores
        the pre-scored column directly, no estimators."""
        bsc = getattr(self, "_baseline_score_col", None)
        if bsc is not None and self.scorer.metric_name == "GINI":
            # Reference asymmetry, replayed exactly (metrics.py:549-551):
            # the EVAL-side baseline path returns RAW roc_auc — no GINI
            # post-process, no multiplier — while the train-side path
            # (cross_val_predict, metrics.py:475-481) post-processes.
            m = roc_auc_score(pdf[target_col].to_numpy(), pdf[bsc].to_numpy())
            return CrossValResult(float(m), None)
        if not self.estimators:
            return CrossValResult(None, None)
        raw = [
            self._score(est, pdf[self.fold_feature_cols], pdf[target_col].to_numpy())
            for est in self.estimators
        ]
        return self._fold_metrics(raw)


# ---------------------------------------------------------------------------
# Report assembly (features_enricher.py:1155-1290 layout)
# ---------------------------------------------------------------------------

SEGMENT_HEADER = "Dataset type"
TRAIN_SEGMENT = "Train"
EVAL_SEGMENT = "Eval {}"
ROWS_HEADER = "Rows"
MEAN_TARGET_HEADER = "Mean target"
BASELINE_HEADER = "Baseline {}"
ENRICHED_HEADER = "Enriched {}"
UPLIFT_HEADER = "Uplift, abs"
UPLIFT_PERC_HEADER = "Uplift, %"


def calculate_metrics_report(
    train: pd.DataFrame,
    target_col: str,
    baseline_cols: list[str],
    enriched_cols: list[str],
    fold_col: str,
    task_type: str,
    eval_frames: list[pd.DataFrame] | None = None,
    scoring: str | None = None,
    cv_scheme: str = "kfold",
    role_col: str = "cv_role",
    baseline_score_column: str | None = None,
    return_harnesses: bool = False,
    estimator: str = "linear",
    estimator_params: dict | None = None,
):
    """The `calculate_metrics` report frame, reference layout exactly:
    one Train row (CV mean ± std), one row per eval frame (per-fold
    estimators re-scored), headers/rounding/uplift formatting from
    resource_bundle strings.properties:289-298. All-null-target eval
    frames are skipped (OOT, features_enricher.py:1199-1201)."""
    scorer = define_scorer(task_type, scoring)
    metric = scorer.metric_name

    baseline_h = CVMetricsHarness(
        task_type, scoring, cv_scheme, role_col, estimator, estimator_params
    )
    baseline_res = baseline_h.cross_val_predict(
        train, baseline_cols, target_col, fold_col,
        baseline_score_column=baseline_score_column,
    )
    enriched_res = CrossValResult(None, None)
    enriched_h = CVMetricsHarness(
        task_type, scoring, cv_scheme, role_col, estimator, estimator_params
    )
    if set(enriched_cols) != set(baseline_cols):
        enriched_res = enriched_h.cross_val_predict(train, enriched_cols, target_col, fold_col)

    def _row(segment, frame, b: CrossValResult, e: CrossValResult):
        row = {SEGMENT_HEADER: segment, ROWS_HEADER: len(frame)}
        if task_type in ("BINARY", "REGRESSION") and pd.api.types.is_numeric_dtype(
            frame[target_col]
        ):
            row[MEAN_TARGET_HEADER] = round(float(np.mean(frame[target_col])), 4)
        if b.metric is not None:
            row[BASELINE_HEADER.format(metric)] = b.get_display_metric()
        if e.metric is not None:
            row[ENRICHED_HEADER.format(metric)] = e.get_display_metric()
        if b.metric is not None and e.metric is not None:
            uplift = (e.metric - b.metric) * scorer.multiplier
            row[UPLIFT_HEADER] = round(uplift, 3)
            row[UPLIFT_PERC_HEADER] = f"{round(uplift / abs(b.metric) * 100, 1)}%"
        return row

    rows = [_row(TRAIN_SEGMENT, train, baseline_res, enriched_res)]
    for i, ev in enumerate(eval_frames or []):
        if ev[target_col].isna().all():
            continue  # OOT segment
        b = baseline_h.calculate_metric(ev, target_col)
        e = enriched_h.calculate_metric(ev, target_col)
        rows.append(_row(EVAL_SEGMENT.format(i + 1), ev, b, e))
    out = pd.DataFrame(rows)
    if MEAN_TARGET_HEADER in out.columns:
        out[MEAN_TARGET_HEADER] = out[MEAN_TARGET_HEADER].astype("float64")
    if return_harnesses:
        return out, baseline_h, enriched_h
    return out
