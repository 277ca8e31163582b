"""Eval-set combine / target correction / key-validity / hit-rate /
autodetection / FitState round-trip."""

from pyspark.sql import functions as F

from upgini_spark.pipeline.autodetect import detect_search_keys
from upgini_spark.pipeline.enricher import FitState
from upgini_spark.pipeline.evalset import (
    combine_train_eval,
    correct_target,
    filter_invalid_keys,
    hit_rate_report,
)


def test_combine_train_eval_oot(spark):
    train = spark.createDataFrame([(1, 1.0), (2, 0.0)], ["id", "y"])
    ev1 = spark.createDataFrame([(3, 1.0)], ["id", "y"])
    oot = spark.createDataFrame([(4, 1.0)], ["id", "y"])
    out = combine_train_eval(train, [ev1, oot], target_col="y", oot_indices={2})
    rows = {r["id"]: (r["eval_set_index"], r["y"]) for r in out.collect()}
    assert rows[1] == (0, 1.0) and rows[3] == (1, 1.0)
    assert rows[4][0] == 2 and rows[4][1] is None  # OOT target nulled


def test_correct_target_coerce_and_categorical(spark):
    # <5% bad numeric -> coerce path
    rows = [(str(float(i)),) for i in range(50)] + [("oops",)]
    df = spark.createDataFrame(rows, ["y"])
    out = correct_target(df, "y")
    got = out.filter("y = 'oops'").collect()[0]["y_corrected"]
    assert got is None
    assert out.filter("y_corrected IS NOT NULL").count() == 50

    # categorical path: singleton class nulled
    df2 = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 5 + [("rare",)], ["y"]
    )
    out2 = correct_target(df2, "y")
    assert out2.filter("y = 'rare'").collect()[0]["y_corrected"] is None
    assert out2.filter("y_corrected IS NOT NULL").count() == 10


def test_filter_invalid_keys(spark):
    df = spark.createDataFrame(
        [("a@x.com", None), (None, "2024-01-01"), (None, None)],
        ["email", "date"],
    )
    filtered, stats = filter_invalid_keys(
        df,
        {"email": F.col("email").isNotNull(), "date": F.col("date").isNotNull()},
    )
    assert filtered.count() == 2  # all-invalid row dropped
    s = stats.collect()[0]
    assert s["total_rows"] == 3
    assert abs(s["valid_share__email"] - 1 / 3) < 1e-6


def test_hit_rate_report(spark):
    df = spark.createDataFrame(
        [(1, "m"), (2, None), (3, "m"), (4, "m")], ["id", "matched"]
    )
    r = hit_rate_report(df, "matched").collect()[0]
    assert r["rows"] == 4 and r["hit_rate"] == 0.75


def test_detect_search_keys(spark):
    df = spark.createDataFrame(
        [
            ("2024-05-06", "a@x.com", "+1 212 555 0100", "US", "02134", 1.5),
            ("2024-05-07", "b@y.org", "+1 212 555 0101", "Germany", "94016", 2.5),
        ],
        ["rep_date", "contact", "phone_num", "country", "zip_code", "feat"],
    )
    keys = detect_search_keys(df)
    assert keys.get("rep_date") == "DATE"
    assert keys.get("contact") == "EMAIL"
    assert keys.get("phone_num") == "PHONE"
    assert keys.get("country") == "COUNTRY"
    assert keys.get("zip_code") == "POSTAL_CODE"
    assert "feat" not in keys


def test_fitstate_roundtrip():
    st = FitState(
        search_keys={"doc_id": "CUSTOM_KEY", "event_time": "DATETIME"},
        entity_col="doc_id",
        ts_col="event_time",
        dropped_features={"c1": "constant"},
        generated_formulas={"f": "roll_7D_mean(event_time,doc_id,v)"},
        feature_cols=["v"],
    )
    st2 = FitState.from_json(st.to_json())
    assert st2 == st
