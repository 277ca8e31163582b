"""Replay reference golden expectations for scalar operators
(tests/autofe/test_date_diff.py, test_sim.py, test_distance.py,
test_vector.py, test_trend.py — expected values only)."""

import math

import pytest
from pyspark.sql import functions as F

from upgini_spark.functions.keys import parse_datetime_multi
from upgini_spark.operators import binary as B
from upgini_spark.operators import date as D
from upgini_spark.operators import vector as V

# pandas Timestamp range — the reference inherits these bounds via
# pd.to_datetime(errors='coerce'); we gate explicitly where parity needs it
PD_MIN_YEAR, PD_MAX_YEAR = 1678, 2261


def _pd_range(ts):
    return F.when(
        (F.year(ts) >= PD_MIN_YEAR) & (F.year(ts) <= PD_MAX_YEAR), ts
    )


def _check_rows(got, expected):
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        if e is None:
            assert g is None or (isinstance(g, float) and math.isnan(g)), (g, e)
        else:
            assert g is not None and abs(g - e) < 1e-6, (g, e)


def test_date_diff_golden(spark):
    import pandas as pd

    rows = [
        ("2022-10-10", pd.to_datetime("1993-12-10").timestamp()),
        ("2022-10-10", pd.to_datetime("2023-10-10").timestamp()),
        ("2022-10-10", pd.to_datetime("1966-10-10").timestamp()),
        ("1022-10-10", pd.to_datetime("1966-10-10").timestamp()),
        (None, pd.to_datetime("1966-10-10").timestamp()),
        ("2022-10-10", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "ord int, d1 string, d2 double"
    )
    a = _pd_range(parse_datetime_multi(F.col("d1")))
    b = _pd_range(F.timestamp_seconds(F.col("d2")))
    out = df.select(
        "ord",
        D.date_diff(a, b, "D").alias("dd"),
        D.date_diff(a, b, "D", replace_negative=True).alias("ddp"),
    ).orderBy("ord").collect()
    _check_rows([r["dd"] for r in out], [10531.0, -365.0, 20454.0, None, None, None, None])
    _check_rows([r["ddp"] for r in out], [10531.0, None, 20454.0, None, None, None, None])


def test_date_diff_type2_golden(spark):
    import pandas as pd

    rows = [
        (pd.to_datetime("2022-10-10").timestamp(), "1993-12-10"),
        (pd.to_datetime("2022-10-10").timestamp(), "1993-04-10"),
        (pd.to_datetime("2022-10-10").timestamp(), "0993-04-10"),
        (None, "1993-04-10"),
        (pd.to_datetime("2022-10-10").timestamp(), None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "ord int, d1 double, d2 string"
    )
    a = _pd_range(F.timestamp_seconds(F.col("d1")))
    b = _pd_range(parse_datetime_multi(F.col("d2")))
    out = df.select("ord", D.date_diff_type2(a, b).alias("t2")).orderBy("ord").collect()
    _check_rows([r["t2"] for r in out], [61.0, 182.0, None, None, None, None])


def test_date_list_diff_golden(spark):
    rows = [
        (0, "2022-10-10", ["1993-12-10", "1993-12-11"]),
        (1, "2022-10-10", ["1993-12-10", "1993-12-10"]),
        (2, "2022-10-10", ["2023-10-10"]),
        (3, "2022-10-10", ["1023-10-10"]),
        (4, "2022-10-10", []),
    ]
    df = spark.createDataFrame(rows, "ord int, d1 string, dl array<string>")
    a = parse_datetime_multi(F.col("d1"))
    # element-wise parse with pandas-range gate (out-of-range -> null)
    dates = F.transform(
        F.col("dl"),
        lambda s: F.when(
            (F.year(F.to_date(s)) >= PD_MIN_YEAR) & (F.year(F.to_date(s)) <= PD_MAX_YEAR),
            F.to_date(s),
        ),
    )
    out = df.select(
        "ord",
        D.date_list_diff(a, dates, "min").alias("mn"),
        D.date_list_diff(a, dates, "max").alias("mx"),
    ).orderBy("ord").collect()
    _check_rows([r["mn"] for r in out], [10530.0, 10531.0, -365.0, None, None])
    _check_rows([r["mx"] for r in out], [10531.0, 10531.0, -365.0, None, None])


def test_string_sim_golden(spark):
    rows = [
        (0, "book", "look"), (1, "blow", None), (2, None, "Jeremy"),
        (3, "below", "bewoll"), (4, None, None), (5, "abc", "abc"),
        (6, "four", "seven"),
    ]
    df = spark.createDataFrame(rows, "ord int, a string, b string")
    out = df.select(
        "ord",
        F.round(B.sim_jaro_winkler(F.col("a"), F.col("b")), 3).alias("jw1"),
        F.round(B.sim_jaro_winkler_reversed(F.col("a"), F.col("b")), 3).alias("jw2"),
        F.round(B.sim_levenshtein(F.col("a"), F.col("b")), 3).alias("lv"),
    ).orderBy("ord").collect()
    _check_rows([r["jw1"] for r in out], [0.833, None, None, 0.902, None, 1.0, 0.0])
    _check_rows([r["jw2"] for r in out], [0.883, None, None, 0.739, None, 1.0, 0.0])
    _check_rows([r["lv"] for r in out], [0.75, None, None, 0.5, None, 1.0, 0.0])


def test_distance_golden(spark):
    rows = [
        (0, [1.0, 0.0], [0.0, 1.0]),   # perpendicular -> 1
        (1, [0.0, 1.0], [1.0, 0.0]),   # perpendicular -> 1
        (2, [1.0, 1.0], [1.0, 1.0]),   # same -> 0
        (3, [0.0, 0.0], [0.0, 0.0]),   # zero vectors -> None
        (4, None, [1.0, 0.0]),         # null left -> None
        (5, [3.0, 4.0], [6.0, 8.0]),   # same direction -> 0
        (6, [3.0, 4.0], None),
        (7, None, None),
    ]
    df = spark.createDataFrame(rows, "ord int, a array<double>, b array<double>")
    out = df.select("ord", F.round(B.distance(F.col("a"), F.col("b")), 6).alias("d")).orderBy("ord").collect()
    _check_rows([r["d"] for r in out], [1.0, 1.0, 0.0, None, None, 0.0, None, None])


def test_vector_ops_golden(spark):
    rows = [
        (0, 1.0, 4.0, 7.0), (1, 2.0, 5.0, 8.0),
        (2, 3.0, None, 9.0), (3, None, 7.0, 10.0),
    ]
    df = spark.createDataFrame(rows, "ord int, s1 double, s2 double, s3 double")
    cols = [F.col("s1"), F.col("s2"), F.col("s3")]
    out = df.select(
        "ord",
        V.mean(cols).alias("m"),
        V.sum_(cols).alias("s"),
        V.vectorize(cols).alias("v"),
    ).orderBy("ord").collect()
    _check_rows([r["m"] for r in out], [4.0, 5.0, 4.0, 17 / 3])
    _check_rows([r["s"] for r in out], [12.0, 15.0, 12.0, 17.0])
    assert out[2]["v"] == [3.0, None, 9.0]  # vectorize preserves nulls
    assert out[3]["v"] == [None, 7.0, 10.0]


def test_trend_coef_golden(spark):
    from upgini_spark.operators.timeseries import trend_coefficient

    df = spark.createDataFrame(
        [(i, f"2024-05-0{6+i}", float(v)) for i, v in enumerate([1, 2, 3, 4])],
        "ord int, d string, value double",
    ).withColumn("ts", F.to_timestamp("d"))
    out = trend_coefficient(df, "ts", [], "value", out_col="tc").orderBy("ord").collect()
    _check_rows([r["tc"] for r in out], [1.0, 1.0, 1.0, 1.0])


def test_bin_golden(spark):
    from upgini_spark.operators.unary import bin_

    df = spark.createDataFrame(
        [(0, 10.0), (1, 20.0), (2, 30.0), (3, 40.0), (4, 50.0), (5, None)],
        "ord int, x double",
    )
    out = df.select("ord", bin_(F.col("x"), [0.0, 25.0, 45.0]).alias("b")).orderBy("ord").collect()
    assert [r["b"] for r in out] == [1, 1, 2, 2, 3, -1]
    out0 = df.select(bin_(F.col("x"), []).alias("b")).collect()
    assert all(r["b"] == -1 for r in out0)
    neg = spark.createDataFrame(
        [(0, -20.0), (1, -10.0), (2, 0.0), (3, 10.0)], "ord int, x double"
    )
    outn = neg.select("ord", bin_(F.col("x"), [-30.0, -15.0, 0.0, 15.0]).alias("b")).orderBy("ord").collect()
    assert [r["b"] for r in outn] == [1, 2, 3, 3]


def test_norm_golden(spark):
    from upgini_spark.operators.unary import norm_

    vals = [None, 1.0, 333.0, 1.0, 3.0, 0.0, 1.0, 2.0, 3.0, 1.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "ord int, a double")
    l2 = df.agg(F.sqrt(F.sum(F.col("a") ** 2))).collect()[0][0]
    out = df.select("ord", norm_(F.col("a"), l2).alias("n")).orderBy("ord").collect()
    got = [r["n"] for r in out]
    # reference golden digits carry ~1e-5 relative error vs its own formula
    # (assert_series_equal default rtol) — compare at that tolerance
    exp = [None, 0.00300266, 0.99988729, 0.00300266, 0.00900799,
           0.0, 0.00300266, 0.00600533, 0.00900799, 0.00300266]
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        else:
            assert abs(g - e) <= 2e-5 * max(abs(e), 1e-9) + 1e-9, (g, e)


def test_date_percentile_boundary_golden(spark):
    # bucket = #bounds <= x (test_percentile.py: 32 vs [...,31.4,32.0,...] -> 51)
    bounds = [0.0] + [2.6 + 0.6 * i for i in range(50)]  # 0.0,2.6,...,31.99-ish,32.0? emulate boundary
    # explicit boundary case
    df = spark.createDataFrame([(0, 2.0), (1, 32.0)], "ord int, x double")
    out = df.select("ord", D.date_percentile(F.col("x"), [0.0, 2.6, 32.0]).alias("p")).orderBy("ord").collect()
    assert [r["p"] for r in out] == [1, 3]  # 32.0 counts (<= semantics)
