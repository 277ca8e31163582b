"""Formula parser + Spark lowering (reference grammar:
src/upgini/autofe/feature.py:308-371; operator resolution
src/upgini/autofe/operator.py:38-49)."""

import math

import pytest
from pyspark.sql import functions as F

from upgini_spark.plans.feature_dag import (
    Col,
    Op,
    compile_features,
    parse_formula,
    parse_ts_op,
)


def test_parse_roundtrip():
    cases = [
        "(a+b)",
        "(a+b*c)",
        "GroupByThenFreq(a,b)",
        "log(GroupByThenMean(x,y))",
        "Combine(a,b)",
        "lag_3d(date,g,v)",
        "roll_2D_mean(date,v)",
        "sim_jw1(a,b)",
    ]
    for c in cases:
        node = parse_formula(c)
        assert isinstance(node, (Col, Op))
        # reparse of the formatted form is stable
        f = node.formula() if isinstance(node, Op) else node.name
        reparsed = parse_formula(f)
        f2 = reparsed.formula() if isinstance(reparsed, Op) else reparsed.name
        assert f == f2


def test_parse_ts_names():
    assert parse_ts_op("lag_3d") == ("lag", {"n": 3, "unit": "d"})
    assert parse_ts_op("lag_10D_offset_1D") == (
        "lag", {"n": 10, "unit": "D", "offset": (1, "D")}
    )
    assert parse_ts_op("roll_2D_mean") == ("roll", {"n": 2, "unit": "D", "agg": "mean"})
    assert parse_ts_op("roll_10D_max_offset_1D") == (
        "roll", {"n": 10, "unit": "D", "agg": "max", "offset": (1, "D")}
    )
    assert parse_ts_op("delta2_1D") == ("delta", {"n": 1, "unit": "D", "order": 2})
    assert parse_ts_op("not_a_lag_formula") is None
    assert parse_ts_op("lag_abc") is None
    assert parse_ts_op("roll_3d") is None


def test_compile_scalar_features(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, "g1"), (3.0, 4.0, "g1"), (5.0, 6.0, "g2")], ["a", "b", "g"]
    )
    out = compile_features(
        df,
        {
            "f_sum": "(a+b)",
            "f_sq": "square(a)",
            "f_gbmean": "GroupByThenMean(a,g)",
            "f_combo": "log(GroupByThenSum(b,g))",
            "f_concat": "Combine(g,a)",
        },
    ).orderBy("a")
    rows = out.collect()
    assert [r["f_sum"] for r in rows] == [3.0, 7.0, 11.0]
    assert [r["f_sq"] for r in rows] == [1.0, 9.0, 25.0]
    assert [r["f_gbmean"] for r in rows] == [2.0, 2.0, 5.0]
    assert rows[0]["f_combo"] == pytest.approx(math.log(6.0), abs=1e-9)
    assert rows[0]["f_concat"] == "g1_1.0"


def test_compile_ts_feature(spark):
    df = spark.createDataFrame(
        [
            ("2024-05-06", "a", 1.0, 0),
            ("2024-05-07", "a", 2.0, 1),
            ("2024-05-08", "a", 3.0, 2),
            ("2024-05-07", "b", 10.0, 3),
            ("2024-05-08", "b", 20.0, 4),
        ],
        ["d", "g", "v", "ord"],
    ).withColumn("d", F.to_timestamp("d"))
    out = compile_features(
        df,
        {"f_lag": "lag_1D(d,g,v)", "f_roll": "roll_2D_mean(d,g,v)"},
        order_col="ord",
    )
    got = {(r["g"], str(r["d"])[:10]): (r["f_lag"], r["f_roll"]) for r in out.collect()}
    assert got[("a", "2024-05-07")] == (1.0, 1.5)
    assert got[("a", "2024-05-08")] == (2.0, 2.5)
    assert got[("b", "2024-05-07")][0] is None
    assert got[("b", "2024-05-08")] == (10.0, 15.0)


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_formula("(a+b")
    with pytest.raises(ValueError):
        parse_formula("f(a,)")
