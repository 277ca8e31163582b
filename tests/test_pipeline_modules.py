"""Lineage/checkpoint, CV splits, unnest/one-hot, cross-series, multimodal."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from upgini_spark.fixtures import tokenized_sequences
from upgini_spark.operators.binary import subtract
from upgini_spark.operators.timeseries import cross_series_interaction
from upgini_spark.pipeline.cv import (
    blocked_time_series_column,
    group_kfold_column,
    kfold_column,
    stratified_kfold_column,
    time_series_split_column,
)
from upgini_spark.pipeline.lineage import (
    StageLedger,
    content_digest,
    key_skew_histogram,
    partition_metrics,
    suggest_salt,
)
from upgini_spark.pipeline.unnest import (
    SEARCH_KEY_UNNEST,
    collapse_unnested,
    decode_one_hot,
    detect_one_hot_groups,
    explode_multi_keys,
)
from upgini_spark.functions.multimodal import extract_media_features, synthetic_media


def test_content_digest_order_invariant(spark):
    df = tokenized_sequences(spark, 200, n_partitions=4)
    d1 = content_digest(df)
    d2 = content_digest(df.repartition(11))
    d3 = content_digest(df.orderBy(F.desc("doc_id")))
    assert d1 == d2 == d3
    d4 = content_digest(df.limit(150))
    assert d4 != d1


def test_partition_metrics_and_skew(spark):
    df = tokenized_sequences(spark, 1000, n_partitions=8)
    m = partition_metrics(df)
    assert m["rows"] == 1000
    assert m["partitions"] >= 1
    hist = key_skew_histogram(df, ["doc_id"], top_n=3)
    assert hist["total_rows"] == 1000
    assert len(hist["top_keys"]) == 3
    assert suggest_salt(df, ["doc_id"], rows_per_task=10) >= 1


def test_stage_ledger_resume(spark, tmp_path):
    root = str(tmp_path / "ledger")
    ledger = StageLedger(spark, root)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return tokenized_sequences(spark, 100, n_partitions=2)

    a = ledger.run("stage1", build)
    assert calls["n"] == 1
    b = ledger.run("stage1", build)  # resume: no rebuild
    assert calls["n"] == 1
    assert a.count() == b.count() == 100
    # a fresh ledger instance also resumes from disk
    ledger2 = StageLedger(spark, root)
    c = ledger2.run("stage1", build)
    assert calls["n"] == 1 and c.count() == 100
    ledger2.invalidate("stage1")
    ledger2.run("stage1", build)
    assert calls["n"] == 2


def test_cv_folds(spark):
    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") % 3).alias("cls"),
        (F.col("id") % 50).alias("grp"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
    )
    kf = kfold_column(df, ["id"], 5)
    counts = [r["count"] for r in kf.groupBy("fold_id").count().collect()]
    assert len(counts) == 5 and min(counts) > 50

    sk = stratified_kfold_column(df, "cls", ["id"], 5)
    per = sk.groupBy("cls", "fold_id").count().collect()
    ns = [r["count"] for r in per]
    assert max(ns) - min(ns) <= 1  # perfectly stratified

    gk = group_kfold_column(df, ["grp"], 4)
    assert gk.groupBy("grp").agg(F.countDistinct("fold_id").alias("k")).filter(
        "k > 1"
    ).count() == 0

    ts = time_series_split_column(df, "ts", ["id"], 4)
    # fold id must be non-decreasing in time
    rows = ts.orderBy("ts").select("fold_id").collect()
    seq = [r["fold_id"] for r in rows if r["fold_id"] is not None]
    assert seq == sorted(seq)
    assert rows[0]["fold_id"] is None  # first block never test

    bl = blocked_time_series_column(df, "ts", ["id"], n_splits=3, test_size=0.2)
    agg = bl.groupBy("fold_id", "cv_role").count().orderBy("fold_id", "cv_role").collect()
    by_block = {}
    for r in agg:
        by_block.setdefault(r["fold_id"], {})[r["cv_role"]] = r["count"]
    for blk, d in by_block.items():
        total = d.get("train", 0) + d.get("test", 0)
        assert abs(d.get("test", 0) - total * 0.2) <= 1


def test_explode_and_collapse(spark):
    df = spark.createDataFrame(
        [(1, "a@x.com", "b@y.com", 10.0), (2, "c@z.com", None, 20.0)],
        ["rid", "email", "email2", "feat"],
    )
    ex = explode_multi_keys(df, ["email", "email2"], "email_key")
    assert ex.count() == 4
    assert set(r[SEARCH_KEY_UNNEST] for r in ex.collect()) == {"email", "email2"}
    back = collapse_unnested(ex, "rid")
    assert back.count() == 2
    assert SEARCH_KEY_UNNEST not in back.columns


def test_one_hot_decode(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, 5.0), (0, 1, 0, 6.0), (0, 0, 1, 7.0)],
        ["cat0", "cat1", "cat2", "other"],
    )
    groups = detect_one_hot_groups(df)
    assert groups == {"cat": ["cat0", "cat1", "cat2"]}
    out = decode_one_hot(df, "cat", groups["cat"])
    vals = sorted(r["cat"] for r in out.collect())
    assert vals == ["0", "1", "2"]
    assert "cat0" not in out.columns


def test_cross_series_interaction(spark):
    rows = []
    for d, a_v, b_v in [("2024-05-06", 10.0, 4.0), ("2024-05-07", 20.0, 5.0)]:
        rows.append((d, "A", a_v))
        rows.append((d, "B", b_v))
    rows.append(("2024-05-08", "C", 1.0))
    df = spark.createDataFrame(rows, ["d", "series", "v"]).withColumn(
        "d", F.to_timestamp("d")
    )
    out = cross_series_interaction(
        df, "d", ["series"], ["A"], ["B"], "v", subtract, out_col="a_minus_b"
    )
    got = {(str(r["d"])[:10], r["series"]): r["a_minus_b"] for r in out.collect()}
    assert got[("2024-05-06", "A")] == 6.0
    assert got[("2024-05-06", "B")] == 6.0
    assert got[("2024-05-07", "A")] == 15.0
    assert got[("2024-05-08", "C")] is None


def test_multimodal_stub(spark):
    media = synthetic_media(spark, 50)
    assert dict(media.dtypes)["content"] == "binary"
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["features"]) == 16
        assert 0.0 <= min(r["features"]) and max(r["features"]) <= 1.0
        assert len(r["content_sha256"]) == 64
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in extract_media_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_media_features(media, strict=True).collect()


def test_outlier_distance(spark):
    from upgini_spark.operators.vector import class_centroids, outlier_distance

    df = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]), ("a", [3.0, 0.0]),     # centroid a = [2, 0]
            ("b", [0.0, 2.0]), ("b", [0.0, 4.0]),     # centroid b = [0, 3]
        ],
        ["cls", "vec"],
    )
    cents = {r["cls"]: r["centroid"] for r in class_centroids(df, "vec", "cls").collect()}
    assert cents["a"] == [2.0, 0.0] and cents["b"] == [0.0, 3.0]
    out = outlier_distance(df, "vec", "cls")
    for r in out.collect():
        assert abs(r["outlier_dist"]) < 1e-9  # colinear with centroid -> cos dist 0
    eu = outlier_distance(df, "vec", "cls", metric="euclidean")
    got = sorted(round(r["outlier_dist"], 9) for r in eu.collect())
    assert got == [1.0, 1.0, 1.0, 1.0]


def test_server_side_op_detection():
    from upgini_spark.plans.feature_dag import is_server_side

    assert is_server_side("onnx")
    assert is_server_side("catboost_model1")
    assert is_server_side("emb")
    assert not is_server_side("embX")
    assert not is_server_side("roll_7D_mean")
