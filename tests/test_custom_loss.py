"""Custom-loss parameter resolution — reference
tests/test_custom_loss_utils.py replayed verbatim (same parametrization,
same expected dicts), plus the full mapping tables."""

import pytest


@pytest.mark.parametrize(
    "loss,task,accepted",
    [
        ("regression", "REGRESSION", True),
        ("poisson", "REGRESSION", True),
        ("binary", "BINARY", True),
        ("binary", "REGRESSION", False),
        ("multiclass", "MULTICLASS", True),
        ("multiclass_ova", "BINARY", False),
    ],
)
def test_runtime_params_custom_loss(loss, task, accepted):
    from upgini_spark.pipeline.custom_loss import get_runtime_params_custom_loss

    props = {"key": "value"}
    out = get_runtime_params_custom_loss(loss, task, props)
    if accepted:
        assert out == {
            "key": "value",
            "lightgbm_params_preselection.objective": loss,
            "lightgbm_params_base.objective": loss,
            "lightgbm_params_segment.objective": loss,
        }
    else:
        assert out == {"key": "value"}


@pytest.mark.parametrize(
    "loss,loss_cb,task,accepted",
    [
        ("regression", "RMSE", "REGRESSION", True),
        ("poisson", "Poisson", "REGRESSION", True),
        ("binary", "Logloss", "BINARY", True),
        ("binary", "", "REGRESSION", False),
        ("multiclass", "MultiClass", "MULTICLASS", True),
        ("multiclass_ova", "MultiClassOneVsAll", "BINARY", False),
    ],
)
def test_additional_params_custom_loss(loss, loss_cb, task, accepted):
    from upgini_spark.pipeline.custom_loss import get_additional_params_custom_loss

    params = get_additional_params_custom_loss(loss, task)
    assert params == ({"loss_function": loss_cb} if accepted else {})


def test_full_mapping_tables_and_quirks():
    """The selection list admits huber/gamma/tweedie with NO CatBoost
    twin, and 'ovr' maps to MultiClass while 'ova'/'multiclass_ova' map
    to MultiClassOneVsAll — reference inconsistencies replayed as-is
    (custom_loss_utils.py:20-29, 70-85)."""
    from upgini_spark.pipeline.custom_loss import (
        get_additional_params_custom_loss,
        get_runtime_params_custom_loss,
    )

    for loss in ("huber", "gamma", "tweedie", "regression_l1"):
        assert "lightgbm_params_base.objective" in get_runtime_params_custom_loss(
            loss, "REGRESSION", {}
        )
        assert get_additional_params_custom_loss(loss, "REGRESSION") == {}
    assert get_additional_params_custom_loss("ovr", "MULTICLASS") == {
        "loss_function": "MultiClass"
    }
    assert get_additional_params_custom_loss("ova", "MULTICLASS") == {
        "loss_function": "MultiClassOneVsAll"
    }
    # empty/None losses are no-ops
    assert get_runtime_params_custom_loss("", "BINARY", {"a": 1}) == {"a": 1}
    assert get_additional_params_custom_loss(None, "BINARY") == {}
