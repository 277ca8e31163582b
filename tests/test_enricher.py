"""Enricher lifecycle: fit freezes the plan, transform replays it; token
byte-identity and zero-leakage hold end to end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from upgini_spark.fixtures import feature_source, tokenized_sequences
from upgini_spark.pipeline.enricher import SparkFeaturesEnricher
from upgini_spark.pipeline.normalizer import (
    detect_decimal_comma,
    hash_column_name,
    normalize_types,
    rename_columns_hashed,
    validate_features,
)


@pytest.fixture(scope="module")
def frames(spark):
    left = tokenized_sequences(spark, 500, n_partitions=4)
    right = feature_source(spark, 500, points_per_entity=6, n_partitions=4)
    return left, right


def test_fit_transform_end_to_end(spark, frames):
    left, right = frames
    enricher = SparkFeaturesEnricher(right)
    out = enricher.fit(
        left, entity_col="doc_id", ts_col="event_time",
        feature_cols=["n_tok", "source"],
    ).transform(left)

    assert enricher.state.generated_formulas
    for c in ["f_ext_num_1", "f_autofe_roll_7d_mean", "f_autofe_lag_1d",
              "datetime_day_in_quarter_sin", "matched_ts", "tokens"]:
        assert c in out.columns, c

    # zero temporal leakage
    assert out.filter("matched_ts IS NOT NULL AND matched_ts > event_time").count() == 0

    # token byte identity through the whole pipeline
    src = {(r["doc_id"], r["event_time"], r["n_tok"]): r["tokens"] for r in left.collect()}
    for r in out.select("doc_id", "event_time", "n_tok", "tokens").collect():
        exp = src[(r["doc_id"], r["event_time"], r["n_tok"])]
        assert np.asarray(r["tokens"], dtype=np.int32).tobytes() == np.asarray(
            exp, dtype=np.int32
        ).tobytes()


def test_transform_is_deterministic_replay(spark, frames):
    left, right = frames
    enricher = SparkFeaturesEnricher(right)
    enricher.fit(left, entity_col="doc_id", ts_col="event_time")
    a = enricher.transform(left)
    b = enricher.transform(left)
    key = ["doc_id", "event_time", "n_tok"]
    pa = a.select(*key, "f_autofe_roll_7d_mean").toPandas().sort_values(key).reset_index(drop=True)
    pb = b.select(*key, "f_autofe_roll_7d_mean").toPandas().sort_values(key).reset_index(drop=True)
    np.testing.assert_allclose(
        pa["f_autofe_roll_7d_mean"].astype(float),
        pb["f_autofe_roll_7d_mean"].astype(float),
        equal_nan=True,
    )


def test_min_rows_gate(spark, frames):
    left, right = frames
    enricher = SparkFeaturesEnricher(right)
    with pytest.raises(ValueError, match="at least 100 rows"):
        enricher.fit(left.limit(10), entity_col="doc_id", ts_col="event_time")


def test_column_rename_hash():
    assert hash_column_name("My Column!") == "my_column__" + __import__(
        "hashlib"
    ).sha256(b"My Column!").hexdigest()[:6]


def test_rename_and_types(spark):
    df = spark.createDataFrame(
        [(True, "1,5", "x" * 30000, 1.0)], ["flag", "dec", "longstr", "num"]
    )
    renamed, mapping = rename_columns_hashed(df, exclude={"num"})
    assert mapping["num"] == "num"
    assert mapping["flag"].startswith("flag_")

    feats = ["flag", "dec", "longstr", "num"]
    dc = detect_decimal_comma(df, feats)
    assert dc == ["dec"]
    out = normalize_types(df, feats, decimal_comma_cols=dc).collect()[0]
    assert out["flag"] == "true"
    assert out["dec"] == 1.5
    assert len(out["longstr"]) == 24573
    assert out["num"] == 1.0


def test_validate_features_drops(spark):
    # "ok" is 50-distinct (reference drops INTEGER ids at >=0.85 unique
    # share too, so a full-range int column would be high-cardinality)
    rows = [(1.0, i % 50, f"id{i}") for i in range(200)]
    df = spark.createDataFrame(rows, ["const", "ok", "unique_str"])
    out, dropped = validate_features(df, ["const", "ok", "unique_str"], exact=True)
    assert dropped["const"] == "constant"
    assert dropped["unique_str"] == "high_cardinality"
    assert "ok" in out.columns and "const" not in out.columns


def test_validate_features_reference_replay(spark):
    """tests/test_etalon_validation.py test_constant_and_empty_validation
    replayed verbatim: only 'a' drops — 'b' (995 nulls + 5 values) and
    'c' (0.0/1.0) have exactly 2 distinct values incl. null, 'd' is
    integer-valued; 'a' is float, 3 values, top share 99.5%."""
    rows = []
    for i in range(1000):
        rows.append((
            1.1 if i < 995 else (2.2 if i < 998 else 3.3),
            None if i < 995 else 3,
            0.0 if i < 995 else 1.0,
            1 if i < 10 else 0,
        ))
    df = spark.createDataFrame(rows, "a double, b int, c double, d int")
    out, dropped = validate_features(df, ["a", "b", "c", "d"])
    assert dropped == {"a": "almost_constant"}
    assert set(out.columns) == {"b", "c", "d"}


def test_validate_features_int_high_card_and_generate_exempt(spark):
    df = spark.createDataFrame(
        [(i, f"text_{i}") for i in range(200)], "intid int, text string"
    )
    _, dropped = validate_features(df, ["intid", "text"])
    assert dropped == {"intid": "high_cardinality", "text": "high_cardinality"}
    _, dropped2 = validate_features(
        df, ["intid", "text"], features_for_generate=["text"]
    )
    assert dropped2 == {"intid": "high_cardinality"}
