"""Dependency-free histogram gradient-boosted trees + exact TreeSHAP.

The reference's metric-calculation path fits CatBoost models
(src/upgini/metrics.py:560-640 CatBoostWrapper) and derives feature
importances from per-fold SHAP values (src/upgini/metrics.py
calculate_shap, features_enricher.py:4707+ __prepare_feature_importances).
CatBoost/LightGBM are not installable in this sandbox, so this module is
a deterministic numpy stand-in with the same *shape*: histogram split
finding (the LightGBM/CatBoost plan — bin once, then every split scan is
O(bins) not O(rows)), second-order leaf values (XGBoost gain), and the
exact polynomial-time path-dependent TreeSHAP algorithm (Lundberg &
Lee 2018, "Consistent Individualized Feature Attribution for Tree
Ensembles", Algorithm 2) so `phi.sum() + expected_value == raw margin`
holds to machine precision — the invariant the tests assert.

Loss functions follow the calculation ladder that
`custom_loss.get_additional_params_custom_loss` resolves to
(CatBoost names): RMSE, Logloss, Poisson, Quantile (alpha=0.5), MAPE.
Non-smooth losses use unit hessians (gradient-descent leaves), like
LightGBM's default for L1-family objectives.

Everything is seed-free and bit-deterministic: quantile binning, greedy
split ties broken by (feature index, bin index), fixed iteration counts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Feature prep: cat -> ordinal codes, numeric passthrough, NaN preserved
# (bin 0 is the reserved missing bin — trees route missing explicitly).
# ---------------------------------------------------------------------------


class _GBPrep:
    def fit(self, x: pd.DataFrame) -> "_GBPrep":
        self.cols = list(x.columns)
        self.cat_maps: dict[str, dict[str, int]] = {}
        for c in self.cols:
            if not pd.api.types.is_numeric_dtype(x[c]):
                cats = sorted({str(v) for v in x[c].dropna()})
                self.cat_maps[c] = {v: i for i, v in enumerate(cats)}
        return self

    def transform(self, x: pd.DataFrame) -> np.ndarray:
        mat = np.empty((len(x), len(self.cols)), dtype=np.float64)
        for j, c in enumerate(self.cols):
            col = x[c]
            if c in self.cat_maps:
                m = self.cat_maps[c]
                mat[:, j] = [
                    m.get(str(v), np.nan) if not pd.isna(v) else np.nan
                    for v in col
                ]
            else:
                mat[:, j] = pd.to_numeric(col, errors="coerce").astype(np.float64)
        return mat


def _fit_bins(mat: np.ndarray, max_bins: int) -> list[np.ndarray]:
    """Per-feature quantile bin edges (deterministic np.quantile on the
    non-NaN train values, deduped). Bin 0 is reserved for NaN; finite
    values land in 1..len(edges)+1 via searchsorted."""
    edges = []
    for j in range(mat.shape[1]):
        col = mat[:, j]
        col = col[np.isfinite(col)]
        if len(col) == 0:
            edges.append(np.empty(0))
            continue
        qs = np.quantile(col, np.linspace(0, 1, max_bins + 1)[1:-1])
        edges.append(np.unique(qs))
    return edges


def _apply_bins(mat: np.ndarray, edges: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(mat.shape, dtype=np.int32)
    for j, e in enumerate(edges):
        col = mat[:, j]
        ok = np.isfinite(col)
        # right-closed bins: value <= e[k] -> bin k+1
        out[ok, j] = np.searchsorted(e, col[ok], side="left") + 1
    return out


# ---------------------------------------------------------------------------
# Single tree: histogram greedy, depth-wise
# ---------------------------------------------------------------------------


class _Tree:
    """Parallel-array binary tree. Internal node: go LEFT iff
    bin[feature] <= split_bin (missing = bin 0 always goes left).
    `cover` is the training-sample count per node — the path-dependent
    TreeSHAP weights."""

    __slots__ = ("feature", "split_bin", "left", "right", "value", "cover")

    def __init__(self):
        self.feature: list[int] = []
        self.split_bin: list[int] = []
        self.left: list[int] = []
        self.right: list[int] = []
        self.value: list[float] = []
        self.cover: list[float] = []

    def _add(self) -> int:
        self.feature.append(-1)
        self.split_bin.append(-1)
        self.left.append(-1)
        self.right.append(-1)
        self.value.append(0.0)
        self.cover.append(0.0)
        return len(self.feature) - 1

    def predict(self, binned: np.ndarray) -> np.ndarray:
        """Vectorized level-walk: every row descends one level per pass."""
        node = np.zeros(len(binned), dtype=np.int64)
        feat = np.asarray(self.feature)
        spl = np.asarray(self.split_bin)
        lft = np.asarray(self.left)
        rgt = np.asarray(self.right)
        val = np.asarray(self.value)
        active = feat[node] >= 0
        while active.any():
            idx = np.nonzero(active)[0]
            cur = node[idx]
            go_left = binned[idx, feat[cur]] <= spl[cur]
            node[idx] = np.where(go_left, lft[cur], rgt[cur])
            active = feat[node] >= 0
        return val[node]


def _grow_tree(
    binned: np.ndarray,
    grad: np.ndarray,
    hess: np.ndarray,
    n_bins: list[int],
    max_depth: int,
    reg_lambda: float,
    min_child_weight: float,
    min_gain: float,
) -> _Tree:
    tree = _Tree()
    root = tree._add()
    # (node_id, row_index_array, depth)
    stack = [(root, np.arange(len(binned)), 0)]
    while stack:
        nid, rows, depth = stack.pop()
        g_tot = float(grad[rows].sum())
        h_tot = float(hess[rows].sum())
        tree.cover[nid] = float(len(rows))
        tree.value[nid] = -g_tot / (h_tot + reg_lambda)
        if depth >= max_depth or len(rows) < 2:
            continue
        parent_score = g_tot * g_tot / (h_tot + reg_lambda)
        best = None  # (gain, j, split_bin)
        for j in range(binned.shape[1]):
            nb = n_bins[j]
            if nb <= 1:
                continue
            b = binned[rows, j]
            gh = np.zeros(nb)
            hh = np.zeros(nb)
            np.add.at(gh, b, grad[rows])
            np.add.at(hh, b, hess[rows])
            gl = np.cumsum(gh)[:-1]
            hl = np.cumsum(hh)[:-1]
            gr = g_tot - gl
            hr = h_tot - hl
            ok = (hl >= min_child_weight) & (hr >= min_child_weight)
            if not ok.any():
                continue
            gain = np.where(
                ok,
                gl * gl / (hl + reg_lambda) + gr * gr / (hr + reg_lambda)
                - parent_score,
                -np.inf,
            )
            k = int(np.argmax(gain))  # first max — deterministic tie-break
            if gain[k] > min_gain and (best is None or gain[k] > best[0]):
                best = (float(gain[k]), j, k)
        if best is None:
            continue
        _, j, k = best
        go_left = binned[rows, j] <= k
        lid, rid = tree._add(), tree._add()
        tree.feature[nid] = j
        tree.split_bin[nid] = k
        tree.left[nid] = lid
        tree.right[nid] = rid
        stack.append((lid, rows[go_left], depth + 1))
        stack.append((rid, rows[~go_left], depth + 1))
    return tree


# ---------------------------------------------------------------------------
# Exact path-dependent TreeSHAP (Lundberg & Lee 2018, Algorithm 2)
# ---------------------------------------------------------------------------


def _extend(m: list[list[float]], pz: float, po: float, pi: int) -> None:
    l = len(m)
    m.append([pi, pz, po, 1.0 if l == 0 else 0.0])
    for i in range(l - 1, -1, -1):
        m[i + 1][3] += po * m[i][3] * (i + 1) / (l + 1)
        m[i][3] = pz * m[i][3] * (l - i) / (l + 1)


def _unwind(m: list[list[float]], i: int) -> None:
    l = len(m) - 1
    n = m[l][3]
    o, z = m[i][2], m[i][1]
    for j in range(l - 1, -1, -1):
        if o != 0:
            t = m[j][3]
            m[j][3] = n * (l + 1) / ((j + 1) * o)
            n = t - m[j][3] * z * (l - j) / (l + 1)
        else:
            m[j][3] = m[j][3] * (l + 1) / (z * (l - j))
    for j in range(i, l):
        m[j][0], m[j][1], m[j][2] = m[j + 1][0], m[j + 1][1], m[j + 1][2]
    m.pop()


def _unwound_sum(m: list[list[float]], i: int) -> float:
    l = len(m) - 1
    o, z = m[i][2], m[i][1]
    total = 0.0
    if o != 0:
        n = m[l][3]
        for j in range(l - 1, -1, -1):
            t = n / ((j + 1) * o)
            total += t
            n = m[j][3] - t * z * (l - j)
    else:
        for j in range(l - 1, -1, -1):
            total += m[j][3] / (z * (l - j))
    return total * (l + 1)


def _tree_shap_row(tree: _Tree, xb: np.ndarray, phi: np.ndarray) -> None:
    feature, split_bin = tree.feature, tree.split_bin
    left, right = tree.left, tree.right
    value, cover = tree.value, tree.cover

    def recurse(j: int, m: list[list[float]], pz: float, po: float, pi: int):
        m = [row[:] for row in m]
        _extend(m, pz, po, pi)
        f = feature[j]
        if f < 0:  # leaf
            v = value[j]
            for i in range(1, len(m)):
                w = _unwound_sum(m, i)
                phi[int(m[i][0])] += w * (m[i][2] - m[i][1]) * v
            return
        if xb[f] <= split_bin[j]:
            h, c = left[j], right[j]
        else:
            h, c = right[j], left[j]
        iz = io = 1.0
        k = next((i for i in range(len(m)) if m[i][0] == f), -1)
        if k >= 0:
            iz, io = m[k][1], m[k][2]
            _unwind(m, k)
        recurse(h, m, iz * cover[h] / cover[j], io, f)
        recurse(c, m, iz * cover[c] / cover[j], 0.0, f)

    recurse(0, [], 1.0, 1.0, -1)


# ---------------------------------------------------------------------------
# Loss ladder (CatBoost calculation names from custom_loss resolution)
# ---------------------------------------------------------------------------


def _loss_grad_hess(loss: str, y: np.ndarray, f: np.ndarray, alpha: float):
    """(grad, hess) of the loss wrt the raw score f. Non-smooth losses
    (Quantile, MAPE) use unit hessians — gradient-descent leaf values,
    the LightGBM convention for L1-family objectives."""
    if loss == "RMSE":
        return f - y, np.ones_like(f)
    if loss == "Logloss":
        p = 1.0 / (1.0 + np.exp(-np.clip(f, -35, 35)))
        return p - y, np.maximum(p * (1.0 - p), 1e-16)
    if loss == "Poisson":  # f is log-rate
        mu = np.exp(np.clip(f, -35, 35))
        return mu - y, mu
    if loss == "Quantile":
        return np.where(f >= y, 1.0 - alpha, -alpha), np.ones_like(f)
    if loss == "MAPE":
        w = 1.0 / np.maximum(np.abs(y), 1.0)
        return np.sign(f - y) * w, np.ones_like(f)
    raise ValueError(f"unsupported loss_function {loss!r}")


def _init_score(loss: str, y: np.ndarray, alpha: float) -> float:
    if loss == "Logloss":
        p = min(max(float(np.mean(y)), 1e-6), 1 - 1e-6)
        return math.log(p / (1.0 - p))
    if loss == "Poisson":
        return math.log(max(float(np.mean(y)), 1e-12))
    if loss == "Quantile":
        return float(np.quantile(y, alpha))
    return float(np.mean(y))


# ---------------------------------------------------------------------------
# Boosted ensembles
# ---------------------------------------------------------------------------


class _GBDTCore:
    def __init__(
        self,
        loss: str,
        n_estimators: int = 60,
        learning_rate: float = 0.15,
        max_depth: int = 3,
        max_bins: int = 64,
        reg_lambda: float = 1.0,
        min_child_weight: float = 1.0,
        min_gain: float = 1e-9,
        quantile_alpha: float = 0.5,
    ):
        self.loss = loss
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.max_bins = max_bins
        self.reg_lambda = reg_lambda
        self.min_child_weight = min_child_weight
        self.min_gain = min_gain
        self.quantile_alpha = quantile_alpha

    def fit_binned(self, binned: np.ndarray, n_bins: list[int], y: np.ndarray):
        self.base_score = _init_score(self.loss, y, self.quantile_alpha)
        f = np.full(len(y), self.base_score)
        self.trees: list[_Tree] = []
        for _ in range(self.n_estimators):
            grad, hess = _loss_grad_hess(self.loss, y, f, self.quantile_alpha)
            tree = _grow_tree(
                binned, grad, hess, n_bins, self.max_depth, self.reg_lambda,
                self.min_child_weight, self.min_gain,
            )
            if tree.feature[0] < 0:  # root never split — converged
                break
            for i in range(len(tree.value)):
                tree.value[i] *= self.learning_rate
            self.trees.append(tree)
            f = f + tree.predict(binned)
        return self

    def raw_margin(self, binned: np.ndarray) -> np.ndarray:
        f = np.full(len(binned), self.base_score)
        for t in self.trees:
            f = f + t.predict(binned)
        return f

    def shap_values(self, binned: np.ndarray) -> tuple[np.ndarray, float]:
        """Exact per-row SHAP in raw-margin space; the additivity
        invariant `phi.sum(1) + expected == raw_margin` holds exactly.
        expected = base_score + sum of per-tree root expectations."""
        n, p = binned.shape
        phi = np.zeros((n, p))
        expected = self.base_score
        for t in self.trees:
            # path-dependent expectation of the tree = cover-weighted
            # leaf mean, computable as value at each leaf × leaf cover
            exp_t = sum(
                t.value[i] * t.cover[i]
                for i in range(len(t.value))
                if t.feature[i] < 0
            ) / t.cover[0]
            expected += exp_t
            for r in range(n):
                _tree_shap_row(t, binned[r], phi[r])
        return phi, float(expected)


class GBDTRegressor:
    """Histogram-GBDT regression; ``loss_function`` accepts the CatBoost
    calculation names the custom-loss ladder emits (RMSE, Poisson,
    Quantile, MAPE)."""

    def __init__(self, loss_function: str = "RMSE", **kw):
        self.core = _GBDTCore(loss_function, **kw)

    def fit(self, x: pd.DataFrame, y: np.ndarray) -> "GBDTRegressor":
        self.prep = _GBPrep().fit(x)
        mat = self.prep.transform(x)
        self.edges = _fit_bins(mat, self.core.max_bins)
        self.n_bins = [len(e) + 2 for e in self.edges]
        binned = _apply_bins(mat, self.edges)
        self.core.fit_binned(binned, self.n_bins, np.asarray(y, dtype=np.float64))
        return self

    def _binned(self, x: pd.DataFrame) -> np.ndarray:
        return _apply_bins(self.prep.transform(x), self.edges)

    def predict(self, x: pd.DataFrame) -> np.ndarray:
        f = self.core.raw_margin(self._binned(x))
        if self.core.loss == "Poisson":
            return np.exp(f)
        return f

    def shap_values(self, x: pd.DataFrame) -> tuple[np.ndarray, float]:
        return self.core.shap_values(self._binned(x))


class GBDTClassifier:
    """Histogram-GBDT Logloss classifier; one-vs-rest for multiclass
    (`MultiClassOneVsAll` twin; plain `MultiClass` uses the same OVR
    with normalized probabilities — a documented stand-in for softmax)."""

    def __init__(self, loss_function: str = "Logloss", **kw):
        self.kw = kw
        if loss_function not in ("Logloss", "MultiClass", "MultiClassOneVsAll"):
            raise ValueError(f"unsupported loss_function {loss_function!r}")

    def fit(self, x: pd.DataFrame, y: np.ndarray) -> "GBDTClassifier":
        self.prep = _GBPrep().fit(x)
        mat = self.prep.transform(x)
        max_bins = self.kw.get("max_bins", 64)
        self.edges = _fit_bins(mat, max_bins)
        self.n_bins = [len(e) + 2 for e in self.edges]
        binned = _apply_bins(mat, self.edges)
        self.classes = sorted(pd.unique(pd.Series(y).dropna()), key=str)
        ya = np.asarray(y)
        self.cores = []
        for c in self.classes if len(self.classes) > 2 else self.classes[1:]:
            core = _GBDTCore("Logloss", **self.kw)
            core.fit_binned(binned, self.n_bins, (ya == c).astype(np.float64))
            self.cores.append(core)
        return self

    def _binned(self, x: pd.DataFrame) -> np.ndarray:
        return _apply_bins(self.prep.transform(x), self.edges)

    def predict_proba(self, x: pd.DataFrame) -> np.ndarray:
        binned = self._binned(x)
        if len(self.classes) <= 2:
            f = self.cores[0].raw_margin(binned)
            p1 = 1.0 / (1.0 + np.exp(-np.clip(f, -35, 35)))
            return np.stack([1.0 - p1, p1], axis=1)
        z = np.stack([c.raw_margin(binned) for c in self.cores], axis=1)
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
        return p / p.sum(axis=1, keepdims=True)

    def predict(self, x: pd.DataFrame) -> np.ndarray:
        idx = np.argmax(self.predict_proba(x), axis=1)
        return np.array([self.classes[i] for i in idx])

    def shap_values(self, x: pd.DataFrame) -> tuple[np.ndarray, float]:
        """Binary: SHAP of the positive-class raw margin. Multiclass:
        mean |per-class SHAP| is what importance consumers need — return
        the class-0 core's values for the invariant test and the mean of
        absolute values via :func:`shap_importances` instead."""
        binned = self._binned(x)
        return self.cores[0].shap_values(binned)


def shap_importances(est, x: pd.DataFrame) -> np.ndarray:
    """mean(|SHAP|) per feature — the reference's importance statistic
    (metrics.py calculate_shap: np.mean(np.abs(shap_values), axis=0))."""
    if isinstance(est, GBDTClassifier) and len(est.classes) > 2:
        binned = est._binned(x)
        tot = np.zeros(binned.shape[1])
        for core in est.cores:
            phi, _ = core.shap_values(binned)
            tot += np.abs(phi).mean(axis=0)
        return tot / len(est.cores)
    phi, _ = est.shap_values(x)
    return np.abs(phi).mean(axis=0)
