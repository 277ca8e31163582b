"""Round-3 regressions: ADVICE fixes (null segments, identifier-safe melt,
NaN PSI binning, persist leaks) and the remaining plan/scale gaps from
VERDICT round 2."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


# -- ADVICE: null eval_set_index must not vanish / crash ---------------------

def test_record_ids_null_segment(spark):
    from upgini_spark.pipeline.record_ids import add_system_record_id

    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else i % 2, f"u{i % 5}", float(i)) for i in range(30)],
        "rid int, eval_set_index int, user string, val double",
    )
    out = add_system_record_id(df, None, ["user"])
    assert out.count() == 30
    nulls = out.filter(F.col("eval_set_index").isNull())
    assert nulls.count() == 10
    ids = sorted(r[0] for r in nulls.select("system_record_id").collect())
    assert ids == list(range(1, 11))  # dense per-segment numbering


def test_fintech_dedup_null_segment(spark):
    from upgini_spark.functions.dedup import remove_fintech_duplicates

    fd = spark.createDataFrame(
        [
            (f"p{i % 4}", "2024-01-0%d" % (i % 5 + 1), i % 2,
             None if i % 4 == 0 else 1)
            for i in range(40)
        ],
        "phone string, d string, target int, eval_set_index int",
    ).withColumn("d", F.to_timestamp("d"))
    out = remove_fintech_duplicates(fd, ["phone"], "target", "d")
    assert out.count() == 40  # gates keep everything; nothing dropped/crashed


# -- ADVICE: identifier-safe stack melt + exotic column names ----------------

def test_validator_stats_quoted_column_names(spark):
    from upgini_spark.functions.stats import feature_validator_stats

    df = spark.range(100).select(
        (F.col("id") % 7).alias("it's"),
        (F.col("id") % 2).alias("back`tick"),
        F.lit(1).alias("const"),
    )
    out = {r["column_name"]: r.asDict() for r in
           feature_validator_stats(df, ["it's", "back`tick", "const"]).collect()}
    assert out["it's"]["n_distinct"] == 7
    assert out["back`tick"]["n_distinct"] == 2
    assert out["const"]["drop_constant"] is True


# -- ADVICE: NaN routes to the null bin in monthly PSI -----------------------

def test_psi_monthly_nan_in_null_bin(spark):
    from upgini_spark.functions.stats import psi_monthly_report

    # 60 distinct values so the numerical-quantile path triggers; NaN rows
    # in the SECOND month only — with NaN in the top bin the distribution
    # shift would be large, with NaN counted as null both months match.
    rows = []
    for m in (1, 2):
        for i in range(60):
            rows.append((f"2024-0{m}-15", float(i)))
        for _ in range(20):
            rows.append((f"2024-0{m}-15", float("nan") if m == 2 else None))
    df = spark.createDataFrame(rows, "d string, x double").withColumn(
        "d", F.to_timestamp("d")
    )
    psi = dict(psi_monthly_report(df, ["x"], [], "d", min_intervals=2))
    assert psi["x"] == pytest.approx(0.0, abs=1e-9)


# -- ADVICE: no session-lifetime cache leak from record-id helpers -----------

def test_zip_with_index_no_cachemanager_entry(spark):
    from upgini_spark.pipeline.record_ids import add_system_record_id

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 3).alias("k"), F.col("id").cast("string").alias("s")
    )
    out = add_system_record_id(df, None, ["k"])
    assert out.count() == 500
    # DataFrame.persist would register in the shared CacheManager and leak;
    # localCheckpoint must leave it empty.
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), "record-id helper leaked a CacheManager entry"
