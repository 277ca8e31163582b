"""Custom-loss parameter resolution for the metrics/fit pipeline.

Reference: src/upgini/utils/custom_loss_utils.py:1-113 (replayed against
tests/test_custom_loss_utils.py). A user-supplied ``loss`` string is
validated against the task type and lowered into (a) the LightGBM
objective applied to the three server-side selection stages and (b) the
CatBoost ``loss_function`` used for metric calculation. The two ladders
intentionally differ (selection admits huber/gamma/tweedie with no
CatBoost twin, and the reference maps 'ovr' → MultiClass while
'multiclass_ova'/'ova' → MultiClassOneVsAll — quirks replayed as-is).

Task types are our ``define_task`` strings ('REGRESSION' / 'BINARY' /
'MULTICLASS'); unsupported (loss, task) pairs leave the params untouched
and log a warning, exactly like the reference."""

from __future__ import annotations

import logging

SELECTION_LOSS_REG = [
    "regression", "regression_l1", "huber", "poisson", "quantile",
    "mape", "mean_absolute_percentage_error", "gamma", "tweedie",
]
SELECTION_LOSS_BINARY = ["binary"]
SELECTION_LOSS_MULTICLASS = [
    "multiclass", "multiclassova", "multiclass_ova", "ova", "ovr",
]

CALCULATION_LOSS_REG = {
    "regression": "RMSE",
    "poisson": "Poisson",
    "quantile": "Quantile",
    "mape": "MAPE",
    "mean_absolute_percentage_error": "MAPE",
}
CALCULATION_LOSS_BINARY = {"binary": "Logloss"}
CALCULATION_LOSS_MULTICLASS = {
    "multiclass": "MultiClass",
    "multiclassova": "MultiClassOneVsAll",
    "multiclass_ova": "MultiClassOneVsAll",
    "ova": "MultiClassOneVsAll",
    "ovr": "MultiClass",  # reference inconsistency, replayed verbatim
}

_SELECTION_STAGES = ("preselection", "base", "segment")


def get_runtime_params_custom_loss(
    loss: str,
    task_type: str,
    runtime_properties: dict,
    logger: logging.Logger | None = None,
) -> dict:
    """Inject the LightGBM objective into the three selection stages'
    runtime properties when the loss fits the task; otherwise return the
    dict unchanged (custom_loss_utils.py:8-59)."""
    if not loss:
        return runtime_properties
    logger = logger or logging.getLogger(__name__)
    ok = (
        (task_type == "REGRESSION" and loss in SELECTION_LOSS_REG)
        or (task_type == "BINARY" and loss in SELECTION_LOSS_BINARY)
        or (task_type == "MULTICLASS" and loss in SELECTION_LOSS_MULTICLASS)
    )
    if ok:
        for stage in _SELECTION_STAGES:
            runtime_properties[f"lightgbm_params_{stage}.objective"] = loss
        logger.info("using custom loss %s for feature selection", loss)
    else:
        logger.warning(
            "custom loss %s does not fit task type %s — ignored for selection",
            loss, task_type,
        )
    return runtime_properties


def get_additional_params_custom_loss(
    loss: str | None,
    task_type: str,
    logger: logging.Logger | None = None,
) -> dict:
    """CatBoost ``loss_function`` for metric calculation when the loss
    has a calculation twin; empty dict otherwise
    (custom_loss_utils.py:62-113)."""
    logger = logger or logging.getLogger(__name__)
    out: dict = {}
    if loss is None:
        return out
    table = {
        "REGRESSION": CALCULATION_LOSS_REG,
        "BINARY": CALCULATION_LOSS_BINARY,
        "MULTICLASS": CALCULATION_LOSS_MULTICLASS,
    }.get(task_type, {})
    if loss in table:
        out["loss_function"] = table[loss]
        logger.info("using custom loss %s for metrics calculation", loss)
    else:
        logger.warning(
            "custom loss %s does not fit task type %s — ignored for metrics",
            loss, task_type,
        )
    return out
