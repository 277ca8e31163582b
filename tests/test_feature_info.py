"""Features-info report parity (reference utils/feature_info.py:1-207 +
features_enricher.py:4707-4836): display rounding, deterministic value
preview, provider/source resolution, ordering/skip rules, drift-column
drop — and the enricher's get_features_info end to end."""

import numpy as np
import pandas as pd
import pytest


def test_round_shap_display():
    """feature_info.py:199-203: [0, 0.0001) displays as 0.0001; others
    round to 4dp (negatives untouched by the floor)."""
    from upgini_spark.pipeline.feature_info import _round_shap_value

    assert _round_shap_value(0.0) == 0.0001
    assert _round_shap_value(0.00005) == 0.0001
    assert _round_shap_value(0.0001) == 0.0001
    assert _round_shap_value(0.12345678) == 0.1235
    assert _round_shap_value(-0.00005) == -0.0001  # round(-0.00005, 4)


def test_feature_sample_reference_exact():
    """feature_info.py:104-120: RandomState(42) choice of 3 from the
    str-sorted uniques, floats 4dp, 30-char truncation."""
    from upgini_spark.pipeline.feature_info import _get_feature_sample

    data = pd.DataFrame({"f": [3.14159265, 1.0, 2.71828, None, 1.0, 9.9]})
    rand = np.random.RandomState(42)
    uniq = sorted(data["f"].dropna().unique(), key=str)
    expect = ", ".join(str(round(f, 4)) for f in rand.choice(uniq, 3, replace=False))
    assert _get_feature_sample("f", data) == expect

    # <=3 rows: all uniques, original order, no RNG
    small = pd.DataFrame({"f": ["b", "a", "b"]})
    assert _get_feature_sample("f", small) == "b, a"
    # truncation at 30 chars
    longs = pd.DataFrame({"f": [f"value_{i}_padded_out_long" for i in range(10)]})
    s = _get_feature_sample("f", longs)
    assert len(s) == 33 and s.endswith("...")
    assert _get_feature_sample("missing", data) == ""
    assert _get_feature_sample("f", None) == ""


def test_build_features_info_rules():
    """Ordering (-shap, name), zero-shap skip, dup skip, drift drop,
    AutoFE/client/LLM source ladder, Upgini provider default."""
    from upgini_spark.pipeline.feature_info import (
        DRIFT_COL,
        NAME_COL,
        PROVIDER_COL,
        PSI_COL,
        SHAP_COL,
        SOURCE_COL,
        FeatureMeta,
        build_features_info,
    )

    metas = [
        FeatureMeta("client_f", shap_value=0.2, hit_rate=100.0),
        FeatureMeta("ext_feat", shap_value=0.5, hit_rate=87.5, psi_value=0.03),
        FeatureMeta("gen_roll", shap_value=0.5),        # ties: name asc
        FeatureMeta("zero_f", shap_value=0.0),          # skipped
        FeatureMeta("ext_feat", shap_value=0.1),        # dup skipped
        FeatureMeta("addr_country", shap_value=0.05),   # suffix → no LLM source
    ]
    info, nolinks, internal = build_features_info(
        metas,
        sample_data=pd.DataFrame({"ext_feat": [1.5, 2.5]}),
        client_features={"client_f"},
        generated_features={"gen_roll"},
    )
    names = list(nolinks[NAME_COL])
    assert names == ["ext_feat", "gen_roll", "client_f", "addr_country"]
    row = nolinks.set_index(NAME_COL)
    assert row.loc["gen_roll", SOURCE_COL] == "AutoFE: features from Training dataset"
    assert row.loc["client_f", SOURCE_COL] == ""
    assert row.loc["client_f", PROVIDER_COL] == ""
    assert row.loc["ext_feat", SOURCE_COL] == "LLM with external data augmentation"
    assert row.loc["ext_feat", PROVIDER_COL] == "Upgini"
    assert row.loc["addr_country", SOURCE_COL] == ""  # _country suffix rule
    assert row.loc["ext_feat", PSI_COL] == 0.03
    assert DRIFT_COL not in info.columns  # all drift null → dropped
    assert "Upgini" in info.set_index(NAME_COL).loc["ext_feat", PROVIDER_COL]
    assert "<a href=" in info.set_index(NAME_COL).loc["ext_feat", PROVIDER_COL]
    assert list(info[SHAP_COL]) == [0.5, 0.5, 0.2, 0.05]
    # drift kept when any non-zero
    metas[0].drift_score = 0.4
    info2, _, _ = build_features_info(metas, None, {"client_f"}, set())
    assert DRIFT_COL in info2.columns


def test_hit_rates_one_agg(spark):
    from upgini_spark.pipeline.feature_info import hit_rates

    df = spark.createDataFrame(
        [(1.0, None), (2.0, "x"), (None, "y"), (4.0, "z")], "a double, b string"
    )
    assert hit_rates(df, ["a", "b"]) == {"a": 75.0, "b": 75.0}
    assert hit_rates(df, []) == {}


def test_enricher_features_info_end_to_end(spark):
    """fit → calculate_metrics → get_features_info: report rows ordered
    by importance, generated features tagged AutoFE, client features
    blank-source, coverage present."""
    from upgini_spark.fixtures import feature_source, tokenized_sequences
    from upgini_spark.pipeline.enricher import SparkFeaturesEnricher
    from upgini_spark.pipeline.feature_info import (
        HITRATE_COL,
        NAME_COL,
        SHAP_COL,
        SOURCE_COL,
    )
    from pyspark.sql import functions as F

    seq = tokenized_sequences(spark, 1500).withColumn(
        "client_f", (F.col("n_tok") % 97).cast("double")
    ).withColumn("target_bin", (F.col("n_tok") % 2).cast("int"))
    enr = SparkFeaturesEnricher(feature_source(spark, 1500, points_per_entity=4))
    enr.fit(seq, "doc_id", "event_time", feature_cols=["client_f"],
            target_col="target_bin", validate_features=False)
    with pytest.raises(RuntimeError):
        enr.get_features_info()
    enr.calculate_metrics(seq, "target_bin", max_rows=3000)
    info = enr.get_features_info()
    assert len(info) >= 1
    assert list(info[SHAP_COL]) == sorted(info[SHAP_COL], reverse=True)
    nolinks = enr._features_info_without_links
    by_name = nolinks.set_index(NAME_COL)
    autofe = [n for n in by_name.index if n.startswith("f_autofe_")]
    for n in autofe:
        assert by_name.loc[n, SOURCE_COL] == "AutoFE: features from Training dataset"
    assert (nolinks[HITRATE_COL].dropna() <= 100.0).all()
    assert enr.features_info is not None
