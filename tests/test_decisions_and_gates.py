"""is_time_series / is_blocked_time_series decisions and the fintech-dedup
applicability gates — replays reference tests/test_datetime_utils.py and
the deduplicate_utils.py:21-135 gate semantics."""

import pandas as pd
from pyspark.sql import functions as F

from upgini_spark.functions.dedup import remove_fintech_duplicates
from upgini_spark.functions.stats import is_blocked_time_series, is_time_series


def _dates_df(spark, dates):
    return spark.createDataFrame(pd.DataFrame({"date": pd.to_datetime(pd.Series(dates))}))


# reference test_datetime_utils.py:~95-130
def test_is_time_series(spark):
    assert is_time_series(
        _dates_df(spark, ["2020-01-0%d" % d for d in range(1, 6)]), "date")
    assert not is_time_series(
        _dates_df(spark, ["2020-01-01", None, "2020-01-03", "2020-01-04", "2020-01-05"]),
        "date")
    assert is_time_series(
        _dates_df(spark, [f"2020-01-01 0{h}:00:00" for h in range(5)]), "date")
    assert is_time_series(
        _dates_df(spark, [f"2020-01-01 00:00:0{s}" for s in (0, 2, 4, 6, 8)]), "date")
    # monthly series: calendar-aware step (relativedelta), not fixed days
    assert is_time_series(
        _dates_df(spark, ["2020-01-01", "2020-02-01", "2020-03-01", "2020-04-01"]),
        "date")
    # gap → not a series
    assert not is_time_series(
        _dates_df(spark, ["2020-01-01", "2020-01-02", "2020-01-05"]), "date")
    # multivariate: constant per-date count, gap-free unique dates
    dup = ["2020-01-01", "2020-01-01", "2020-01-02", "2020-01-02",
           "2020-01-03", "2020-01-03"]
    assert is_time_series(_dates_df(spark, dup), "date")


# reference test_datetime_utils.py:test_multivariate_time_series
def test_is_blocked_time_series(spark):
    short = _dates_df(spark, [f"2020-01-01 00:00:0{s}" for s in (0, 2, 4, 6, 8)])
    assert not is_blocked_time_series(short, "date", ["date"])

    month = _dates_df(spark, [str(d.date()) for d in pd.date_range("2020-01-01", "2020-02-01")])
    assert not is_blocked_time_series(month, "date", ["date"])  # <270 dates

    year_single = _dates_df(spark, [str(d.date()) for d in pd.date_range("2020-01-01", "2021-01-01")])
    assert not is_blocked_time_series(year_single, "date", ["date"])  # single-row dates

    dates = [str(d.date()) for d in pd.date_range("2020-01-01", "2021-01-01")]
    n = len(dates)

    def blocked(f3a, f3b):
        pdf = pd.DataFrame({
            "date": pd.to_datetime(dates * 2),
            "feature1": [(i * 37) % 1000 for i in range(n)] + [(i * 53) % 1000 for i in range(n)],
            "feature2": [(i * 11) % 1000 for i in range(n)] + [(i * 29) % 1000 for i in range(n)],
            "feature3": f3a + f3b,
        })
        return spark.createDataFrame(pdf)

    # feature3 identical across the two blocks → only f1, f2 change per date
    same3 = blocked(list(range(n)), list(range(n)))
    assert is_blocked_time_series(same3, "date", ["date"])

    # all three features change per date → >2 changing columns
    diff3 = blocked(list(range(n)), [(i * 7 + 1) % 1000 for i in range(n)])
    assert not is_blocked_time_series(diff3, "date", ["date"])
    # dropping feature3 as a search key leaves ≤3 columns → True
    assert is_blocked_time_series(diff3, "date", ["date", "feature3"])


def _fintech_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["phone", "target", "date", "eval_set_index"])
    ).select(
        "phone", "target", F.to_timestamp("date").alias("date"), "eval_set_index"
    )


def test_fintech_gates_binary_only(spark):
    # 3 distinct targets → MULTICLASS → unchanged even with conflicts
    rows = [("p1", t, "2023-01-0%d" % (t + 1), 0) for t in (0, 1, 2)]
    df = _fintech_df(spark, rows)
    assert remove_fintech_duplicates(df, ["phone"], "target", "date").count() == 3


def test_fintech_gates_multi_date_share(spark):
    # every duplicated group spans multiple dates (share 100% ≥ 60%) →
    # looks like a time series → unchanged
    rows = []
    for p in ("p1", "p2", "p3"):
        rows += [(p, 0, "2023-01-01", 0), (p, 1, "2023-01-05", 0)]
    df = _fintech_df(spark, rows)
    assert remove_fintech_duplicates(df, ["phone"], "target", "date").count() == 6


def test_fintech_removes_close_conflicts(spark):
    rows = [
        # p1: conflicting targets 4 days apart (same-date share 2/3 < 60%)
        ("p1", 0, "2023-01-01", 0), ("p1", 1, "2023-01-05", 0),
        # p2: duplicated same-day, consistent target → kept
        ("p2", 1, "2023-02-01", 0), ("p2", 1, "2023-02-01", 0),
        # p3: duplicated same-day consistent → kept
        ("p3", 0, "2023-03-01", 0), ("p3", 0, "2023-03-01", 0),
        # p4: conflicting but 90 days apart → kept
        ("p4", 0, "2023-01-01", 0), ("p4", 1, "2023-04-10", 0),
    ]
    df = _fintech_df(spark, rows)
    out = remove_fintech_duplicates(df, ["phone"], "target", "date").toPandas()
    assert "p1" not in set(out["phone"])
    assert sorted(set(out["phone"])) == ["p2", "p3", "p4"]
    assert len(out) == 6


def test_fintech_per_segment(spark):
    # conflict in train removed; eval segment with ts-like share untouched
    rows = [
        ("p1", 0, "2023-01-01", 0), ("p1", 1, "2023-01-05", 0),
        ("p2", 0, "2023-01-01", 0), ("p2", 0, "2023-01-01", 0),
        ("q1", 0, "2023-01-01", 1), ("q1", 1, "2023-01-05", 1),
        ("q2", 0, "2023-02-01", 1), ("q2", 1, "2023-02-05", 1),
    ]
    df = _fintech_df(spark, rows)
    out = remove_fintech_duplicates(
        df, ["phone"], "target", "date", eval_set_index_col="eval_set_index"
    ).toPandas()
    assert "p1" not in set(out[out["eval_set_index"] == 0]["phone"])
    # eval segment: both groups multi-date → share 100% ≥ 60% → unchanged
    assert len(out[out["eval_set_index"] == 1]) == 4


def test_dump_input_digest_dedup(spark, tmp_path):
    from upgini_spark.sources.io import dump_input

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    p1 = dump_input(df, str(tmp_path), "x")
    assert p1 is not None
    p2 = dump_input(df.repartition(5), str(tmp_path), "x")  # same content
    assert p2 == p1  # digest dedup, partition-invariant
    assert dump_input(df, str(tmp_path), "y", max_bytes=10) is None  # size cap
    back = spark.read.parquet(p1)
    assert back.count() == 100


def test_calculate_features_psi_target_gate(spark):
    from upgini_spark.functions.stats import calculate_features_psi

    df = spark.range(400).select(
        F.expr("timestampadd(HOUR, cast(id % 720 as int), timestamp'2023-01-01')")
        .alias("ts"),
        (F.col("id") % 2).cast("int").alias("target"),
        (F.col("id") % 13).cast("double").alias("f1"),
    )
    # stable target → features get real PSI values
    out = calculate_features_psi(df, ["f1"], [], "ts", target_col="target")
    assert "f1" in out and out["f1"] is not None
    # impossible threshold → gate trips → empty_res zeros
    gated = calculate_features_psi(
        df, ["f1"], [], "ts", target_col="target", target_threshold=-1.0
    )
    assert gated == {"f1": 0.0}


def test_calculate_sparsity_psi(spark):
    from upgini_spark.functions.stats import calculate_sparsity_psi

    df = spark.range(400).select(
        F.expr("timestampadd(HOUR, cast(id % 720 as int), timestamp'2023-01-01')")
        .alias("ts"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("sparse_col"),
        F.col("id").alias("dense_col"),
    )
    out = calculate_sparsity_psi(df, ["sparse_col", "dense_col"], "ts")
    assert "sparse_col" in out and "dense_col" not in out


def test_autodetect_full_country_names(spark):
    from upgini_spark.pipeline.autodetect import detect_search_keys

    df = spark.createDataFrame(
        [("Bosnia and Herzegovina", 1), ("Ukraine", 2), ("COTE D'IVOIRE", 3),
         ("north macedonia", 4), ("Sweden", 5)] * 20,
        "ctry string, x int",
    )
    keys = detect_search_keys(df)
    assert keys.get("ctry") == "COUNTRY"


def test_autodetect_reference_name_rules(spark):
    """Replays reference test_phone_utils/test_email_utils name-detection
    cases: the listed names alone suffice, regardless of values."""
    from upgini_spark.pipeline.autodetect import detect_search_keys

    for name in ("cellphone", "msisdn", "phone", "phonenumber", "phone_number"):
        df = spark.createDataFrame([("123",), ("321",), ("345",)], [name])
        assert detect_search_keys(df).get(name) == "PHONE", name
    df = spark.createDataFrame([("123",), ("321",), ("345",)], ["phne"])
    assert "phne" not in detect_search_keys(df)

    for name in ("email", "e_mail",):
        df = spark.createDataFrame([("123",), ("321",)], [name])
        assert detect_search_keys(df).get(name) == "EMAIL", name
    # value-based email: 2 of 10 valid > 10%
    df = spark.createDataFrame(
        [("asdf@asdf.sad",), ("woei@skdjfh.fnj",)] + [("12@3",)] * 8, ["eml"]
    )
    assert detect_search_keys(df).get("eml") == "EMAIL"
    df = spark.createDataFrame([("asdf@asdf.sad",)] + [("12@",)] * 9, ["eml"])
    assert "eml" not in detect_search_keys(df)


def test_autodetect_country_postal_name_rules(spark):
    """country_utils.py:23-25 / postal_code_utils.py:15-16: the name alone
    detects COUNTRY and POSTAL_CODE; country values need >10% resolvable."""
    from upgini_spark.pipeline.autodetect import detect_search_keys

    df = spark.createDataFrame([("not country",)] * 10, ["country"])
    assert detect_search_keys(df).get("country") == "COUNTRY"
    for name in ("zip", "zipcode", "zip_code", "postal_code", "postalcode"):
        df = spark.createDataFrame([("123",)] * 3, [name])
        assert detect_search_keys(df).get(name) == "POSTAL_CODE", name
    df = spark.createDataFrame([("123",)] * 3, ["pstlcd"])
    assert "pstlcd" not in detect_search_keys(df)
    # value rule: 2/10 known countries > 10% detected; 1/10 not
    df = spark.createDataFrame([("not country",)] * 8 + [("ES",), ("IT",)], ["cntr"])
    assert detect_search_keys(df).get("cntr") == "COUNTRY"
    df = spark.createDataFrame([("not country",)] * 9 + [("IT",)], ["cntr"])
    assert "cntr" not in detect_search_keys(df)
