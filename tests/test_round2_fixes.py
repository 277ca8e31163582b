"""Round-2 regression tests: ADVICE bug fixes (Feb-29 anniversary,
broadcast as-of same-name keys, null-ts leakage, record-id tie-break,
pre-fit guard) and the single-partition scale-killer rewrites
(record ids, hash sample, freq family)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from upgini_spark.joins.asof import asof_join
from upgini_spark.operators.date import date_diff_type2
from upgini_spark.pipeline.record_ids import add_system_record_id
from upgini_spark.functions.sampling import hash_sample_exact
from upgini_spark.operators import binary as B
from upgini_spark.operators import unary as U


# -- date_diff_type2 Feb-29 / ANSI -----------------------------------------

def test_anniversary_feb29_matches_pandas(spark):
    """b = Feb 29: naive make_date throws under ANSI; pandas rolls to
    Feb 28 and keeps day 28 when the +1y crosses into a leap year."""
    rows = [
        ("2023-03-15", "2020-02-29"),  # rolled anniversary already passed
        ("2023-01-15", "2020-02-29"),  # upcoming in same (non-leap) year
        ("2024-01-15", "2020-02-29"),  # leap year: pandas still Feb 29? no — direct replace works
        ("2021-03-01", "2020-02-29"),  # +1y from rolled Feb 28 → Feb 28 2022
    ]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        r["a"]: r["dd"]
        for r in df.select(
            "a", date_diff_type2(F.col("a"), F.col("b")).alias("dd")
        ).collect()
    }

    import numpy as np

    left = pd.to_datetime(pd.Series([r[0] for r in rows]))
    right = pd.to_datetime(pd.Series([r[1] for r in rows]))
    future = right + (left.dt.year - right.dt.year).apply(
        lambda y: pd.tseries.offsets.DateOffset(years=0 if np.isnan(y) else y)
    )
    future = pd.to_datetime(future)
    before = future[future < left]
    future[future < left] = before + pd.tseries.offsets.DateOffset(years=1)
    exp = ((future - left) / np.timedelta64(1, "D")).tolist()
    for (a, _), e in zip(rows, exp):
        assert got[a] == e, (a, got[a], e)


# -- broadcast as-of with by_right omitted (same key names) ------------------

def test_asof_broadcast_same_key_names(spark):
    left = spark.createDataFrame(
        [("e1", dt.datetime(2023, 6, 2), 10), ("e2", dt.datetime(2023, 6, 3), 20)],
        ["entity", "ts", "x"],
    )
    right = spark.createDataFrame(
        [
            ("e1", dt.datetime(2023, 6, 1), 1.0),
            ("e1", dt.datetime(2023, 6, 5), 9.0),
            ("e2", dt.datetime(2023, 6, 1), 2.0),
        ],
        ["entity", "fts", "f"],
    )
    out = asof_join(
        left, right, left_on="ts", right_on="fts",
        by_left="entity",  # by_right omitted → defaults to by_left
        engine="broadcast",
    ).toPandas().set_index("entity")
    assert out.loc["e1", "f"] == 1.0 and out.loc["e2", "f"] == 2.0
    assert list(out.columns) == ["ts", "x", "f"]


# -- null event-time must not match (zero temporal leakage) ------------------

@pytest.mark.parametrize("engine", ["native", "arrow", "broadcast"])
def test_null_event_time_gets_no_match(spark, engine):
    left = spark.createDataFrame(
        [("e1", dt.datetime(2023, 6, 2), 1), ("e1", None, 2)],
        "entity string, ts timestamp, rid int",
    )
    right = spark.createDataFrame(
        [("e1", dt.datetime(2023, 6, 1), 7.0)], "entity string, fts timestamp, f double"
    )
    out = asof_join(
        left, right, left_on="ts", right_on="fts", by_left="entity", engine=engine
    ).toPandas().set_index("rid")
    assert out.loc[1, "f"] == 7.0
    assert pd.isna(out.loc[2, "f"]), f"{engine}: null-ts row leaked a match"
    assert len(out) == 2


# -- record ids: distributed plan, dense per segment, tie-break --------------

def _events(spark, n=500):
    return spark.range(n).select(
        (F.col("id") % 7).alias("k"),
        F.to_timestamp(F.lit("2023-01-01")).alias("ts"),
        (F.col("id") % 3).cast("int").alias("eval_set_index"),
        F.col("id").alias("payload"),
    ).repartition(8)


def test_record_ids_dense_per_segment_and_distributed(spark):
    df = _events(spark)
    out = add_system_record_id(df, "ts", ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    pdf = out.toPandas()
    # r3: ONE continuous 0-based sequence laid across segment-sorted
    # blocks (reference reset_index-after-concat, verified against
    # expected_prepared_with_entity_system_record_id.parquet) — segments
    # occupy contiguous id blocks in eval_set_index order
    lo = 0
    for seg in sorted(pdf["eval_set_index"].unique()):
        g = pdf[pdf["eval_set_index"] == seg]
        ids = sorted(g["system_record_id"])
        assert ids == list(range(lo, lo + len(g))), f"segment {seg} block broken"
        lo += len(g)


def test_record_ids_partition_invariant_with_duplicates(spark):
    """Rows duplicated on (date, hash_cols) get partition-invariant ids via
    the all-columns tie-break."""
    base = spark.range(300).select(
        (F.col("id") % 5).alias("k"),
        F.to_timestamp(F.lit("2023-01-01")).alias("ts"),
        (F.col("id") % 11).alias("payload"),
    )
    a = add_system_record_id(base.repartition(2), "ts", ["k"]).toPandas()
    b = add_system_record_id(base.repartition(16), "ts", ["k"]).toPandas()
    key = ["k", "payload", "system_record_id"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


# -- hash sample: TakeOrderedAndProject, not a global window -----------------

def test_hash_sample_plan_and_determinism(spark):
    df = spark.range(2000).select(F.col("id"), (F.col("id") % 9).alias("v"))
    out = hash_sample_exact(df, 100, ["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in hash_sample_exact(df.repartition(13), 100, ["id"]).collect())
    assert a == b and len(a) == 100


# -- freq family: fit-time total, no global window ---------------------------

def test_freq_requires_total_and_matches(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], ["v"])
    with pytest.raises(ValueError):
        U.freq_(F.col("v"))
    out = df.select(U.freq_(F.col("v"), 4).alias("f")).toPandas()["f"]
    got = sorted(out.fillna(-1.0).tolist())
    assert got == [-1.0, 0.25, 0.5, 0.5]
    plan_df = df.select(U.freq_(F.col("v"), 4).alias("f"))
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_combine_then_freq_total(spark):
    df = spark.createDataFrame([("a", "x"), ("a", "x"), ("b", "y")], ["p", "q"])
    out = df.select(
        B.combine_then_freq(F.col("p"), F.col("q"), 3).alias("f")
    ).toPandas()["f"]
    assert sorted(round(v, 6) for v in out) == [
        round(1 / 3, 6), round(2 / 3, 6), round(2 / 3, 6)]


# -- pre-fit guard ------------------------------------------------------------

def test_clean_duplicates_before_fit_raises(spark):
    from upgini_spark.pipeline.enricher import SparkFeaturesEnricher

    df = spark.range(3).select(F.col("id").alias("x"))
    enr = SparkFeaturesEnricher(feature_source=df)
    with pytest.raises(RuntimeError, match="before fit"):
        enr.clean_duplicates(df, "x", "x")


# -- DatePercentile month-offset scaling (reference test_percentile.py) ------

def test_date_percentile_reference_golden(spark):
    """Replays tests/autofe/test_percentile.py:test_date_percentile
    verbatim: zero_month=2, zero_year=2024, step=30, 100 bounds."""
    from upgini_spark.operators.date import date_percentile

    zero_bounds = (
        [0.0]
        + [2.6 + 0.6 * i for i in range(50)]      # 2.6 .. 32.0
        + [32.04 + 0.04 * i for i in range(49)]   # 32.04 .. 33.96
    )
    assert len(zero_bounds) == 100
    rows = [
        ("2024-03-03", 2.0, None),
        ("2024-02-03", 2.0, 1),
        ("2024-02-04", 34.0, 100),
        ("2024-02-05", 32.0, 51),
        ("2023-03-03", 60.0, 100),
        ("2023-03-02", None, None),
    ]
    df = spark.createDataFrame(
        [(i, d, f) for i, (d, f, _) in enumerate(rows)], "ord int, date string, f double"
    )
    out = (
        df.select(
            "ord",
            date_percentile(
                F.col("f"), zero_bounds, date=F.col("date"),
                zero_year=2024, zero_month=2, step=30,
            ).alias("p"),
        )
        .orderBy("ord")
        .collect()
    )
    assert [r["p"] for r in out] == [exp for _, _, exp in rows]


# -- approx-quantile rolling variant (scale path) ----------------------------

def test_roll_quantile_approx_variant(spark):
    """percentile_approx rolling variant: same window, returns an actual
    element (no interpolation) — the sketch-based 100x path. Must agree
    with the exact variant wherever the window holds an odd count."""
    from upgini_spark.operators.timeseries import roll_feature

    df = spark.range(200).select(
        "id",
        (F.col("id") % 5).alias("k"),
        F.expr("timestampadd(HOUR, cast(id as int), timestamp'2023-01-01')").alias("ts"),
        (F.col("id") % 17).cast("double").alias("v"),
    )
    exact = roll_feature(df, "ts", ["k"], "v", 1, "D", "median", out_col="m")
    approx = roll_feature(df, "ts", ["k"], "v", 1, "D", "median_approx", out_col="m")
    a = {r["id"]: r["m"] for r in exact.select("id", "m").collect()}
    b = {r["id"]: r["m"] for r in approx.select("id", "m").collect()}
    close = sum(1 for i in a if abs(a[i] - b[i]) <= 8.5)  # within half value range
    assert close == len(a)
    same = sum(1 for i in a if a[i] == b[i])
    assert same > len(a) * 0.5  # odd-count windows agree exactly


# -- distributed running sum (cumsum twin of zip_with_index) -----------------

def test_global_running_sum_distributed(spark):
    from upgini_spark.pipeline.record_ids import global_running_sum

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("v")
    ).repartition(8)
    out = global_running_sum(df, [F.col("id").asc()], "v", "cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    pdf = out.toPandas().sort_values("id").reset_index(drop=True)
    expect = pdf["v"].cumsum()
    assert (pdf["cum"].values == expect.values).all()
    # partition invariance
    out2 = global_running_sum(df.repartition(3), [F.col("id").asc()], "v", "cum")
    pdf2 = out2.toPandas().sort_values("id").reset_index(drop=True)
    assert (pdf2["cum"].values == pdf["cum"].values).all()
