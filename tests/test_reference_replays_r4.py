"""Round-4 reference unit-test replays: the remaining small reference
test modules not yet covered verbatim — test_ts_utils.py (modal time
unit + trailing truncation), test_country_utils.py (detector + ISO
conversion), test_postal_code_utils.py (name detector)."""

import pandas as pd
from pyspark.sql import functions as F


# -- tests/test_ts_utils.py::test_get_most_frequent_time_unit ---------------

def _dates_df(spark, ids, dates, id_cols=("id",)):
    rows = [tuple(list(i if isinstance(i, tuple) else (i,)) + [d])
            for i, d in zip(ids, dates)]
    schema = ", ".join(f"{c} string" for c in id_cols) + ", date string"
    return spark.createDataFrame(rows, schema)


def test_most_frequent_time_unit_reference_cases(spark):
    from upgini_spark.functions.sampling import modal_time_unit_seconds

    def unit(ids, dates, id_cols=("id",)):
        df = _dates_df(spark, ids, dates, id_cols)
        return modal_time_unit_seconds(df, list(id_cols), "date")

    day = 86_400
    # daily
    assert unit(["1"] * 3, ["2023-01-01", "2023-01-02", "2023-01-03"]) == day
    # irregular month intervals -> most frequent = 59 days (smallest tie)
    assert unit(["1"] * 3, ["2023-01-01", "2023-03-01", "2023-07-01"]) == 59 * day
    # mixed, daily most common
    assert unit(
        ["1"] * 4,
        ["2023-01-01", "2023-01-02", "2023-01-03", "2023-01-03 12:00:00"],
    ) == day
    # mixed, hourly most common
    assert unit(
        ["1"] * 5,
        ["2023-01-01 12:00:00", "2023-01-01 13:00:00", "2023-01-01 14:00:00",
         "2023-01-02", "2023-01-03"],
    ) == 3600
    # multiple id columns -> tie between 1d and 1h, smallest wins
    assert unit(
        [("1", "A"), ("1", "A"), ("2", "B"), ("2", "B")],
        ["2023-01-01", "2023-01-02", "2023-01-01 12:00:00", "2023-01-01 13:00:00"],
        id_cols=("id1", "id2"),
    ) == 3600
    # no ids
    df = spark.createDataFrame(
        [("2023-01-01",), ("2023-01-02",), ("2023-01-03",)], "date string"
    )
    assert modal_time_unit_seconds(df, [], "date") == day
    # empty frame -> None
    empty = spark.createDataFrame([], "id string, date string")
    assert modal_time_unit_seconds(empty, ["id"], "date") is None


# -- tests/test_ts_utils.py::test_trunc_datetime ----------------------------

def test_trunc_datetime_reference_cases(spark):
    from upgini_spark.functions.sampling import trunc_datetime_offset

    df = _dates_df(spark, ["1"] * 4,
                   ["2023-01-01", "2023-01-02", "2023-01-03", "2023-01-04"])
    out = trunc_datetime_offset(df, ["id"], "date", months=0, days=2).collect()
    got = sorted(r["date"] for r in out)
    assert got == ["2023-01-03", "2023-01-04"]

    df2 = _dates_df(
        spark, [("1", "A"), ("1", "A"), ("2", "B"), ("2", "B")],
        ["2023-01-01", "2023-01-02", "2023-01-03", "2023-01-04"],
        id_cols=("id1", "id2"),
    )
    out2 = trunc_datetime_offset(df2, ["id1", "id2"], "date", months=0, days=1)
    assert sorted(r["date"] for r in out2.collect()) == ["2023-01-02", "2023-01-04"]

    df3 = spark.createDataFrame(
        [("2023-01-0%d" % d,) for d in range(1, 5)], "date string"
    )
    out3 = trunc_datetime_offset(df3, [], "date", months=0, days=2)
    assert sorted(r["date"] for r in out3.collect()) == ["2023-01-03", "2023-01-04"]


# -- tests/test_country_utils.py --------------------------------------------

def test_country_detector_reference_cases(spark):
    from upgini_spark.pipeline.autodetect import detect_search_keys

    # by values: 2 of 10 resolve (ES, IT) -> >10% share -> COUNTRY
    df = spark.createDataFrame(
        [("not country",)] * 8 + [("ES",), ("IT",)], "cntr string"
    )
    assert detect_search_keys(df).get("cntr") == "COUNTRY"
    # 1 of 10 -> not detected
    df2 = spark.createDataFrame(
        [("not country",)] * 9 + [("IT",)], "cntr string"
    )
    assert "cntr" not in detect_search_keys(df2)
    # numeric column -> not detected
    df3 = spark.createDataFrame([(i,) for i in range(1, 6)], "cntr int")
    assert detect_search_keys(df3).get("cntr") != "COUNTRY"
    # by name alone, even with non-country values
    df4 = spark.createDataFrame([("not country",)] * 10, "country string")
    assert detect_search_keys(df4).get("country") == "COUNTRY"


def test_country_to_iso_reference_cases(spark):
    from upgini_spark.functions.keys import country_full_name_to_iso

    vals = ["Austria", "England", "Poland",
            "United Kingdom of Great Britain and Northern Ireland",
            "", "Unknown", "US", "United States"]
    df = spark.createDataFrame([(v,) for v in vals], "country string")
    out = [r[0] for r in df.select(
        country_full_name_to_iso(F.col("country")).alias("c")
    ).collect()]
    assert out == ["AT", "GB", "PL", "GB", "", "Unknown", "US", "US"]


# -- tests/test_postal_code_utils.py ----------------------------------------

def test_postal_detector_reference_cases(spark):
    from upgini_spark.pipeline.autodetect import detect_search_keys

    def detected(colname):
        df = spark.createDataFrame(
            [("123",), ("321",), ("345",)], f"{colname} string"
        )
        return detect_search_keys(df).get(colname) == "POSTAL_CODE"

    assert not detected("pstlcd")
    for name in ("zip", "zipcode", "zip_code", "postal_code", "postalcode"):
        assert detected(name), name


# -- autofe/test_operator_registry.py ---------------------------------------

def test_parametrized_operator_registry_roundtrip():
    """The reference's registry round-trip: parse 'roll_3d_mean' into its
    parts, re-emit the formula, resolve it again (operator.py:38-49)."""
    from upgini_spark.plans.feature_dag import parse_ts_op

    kind, p = parse_ts_op("roll_3d_mean")
    assert kind == "roll"
    assert p == {"n": 3, "unit": "d", "agg": "mean"}
    formula = f"roll_{p['n']}{p['unit']}_{p['agg']}"
    assert formula == "roll_3d_mean"
    kind2, p2 = parse_ts_op(formula)
    assert (kind2, p2) == (kind, p)
