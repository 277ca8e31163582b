"""CSV sniffing ingest + correlation-ranked deterministic fit sort."""

from upgini_spark.pipeline.sort import deterministic_fit_sort, rank_feature_columns
from upgini_spark.sources.io import read_csv_auto, sniff_delimiter, write_parquet_bounded


def test_csv_sniff_and_read(spark, tmp_path):
    p = tmp_path / "semi.csv"
    p.write_text("a;b;c\n1;x;2.5\n2;y;3.5\n")
    assert sniff_delimiter(str(p)) == ";"
    df = read_csv_auto(spark, str(p))
    assert df.columns == ["a", "b", "c"]
    assert df.count() == 2
    assert dict(df.dtypes)["c"] == "double"


def test_write_parquet_bounded(spark, tmp_path):
    df = spark.range(1000).selectExpr("id", "id % 7 AS g")
    out = str(tmp_path / "bounded")
    write_parquet_bounded(df, out, max_records_per_file=100)
    import glob

    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 10
    assert spark.read.parquet(out).count() == 1000


def test_rank_feature_columns(spark):
    df = spark.range(500).selectExpr(
        "CAST(id AS DOUBLE) AS y",
        "CAST(id AS DOUBLE) * 2 AS perfect",
        "CAST(id % 7 AS DOUBLE) AS weak",
        "CAST(1.0 AS DOUBLE) AS constant",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS cat",
    )
    ranked = rank_feature_columns(df, ["weak", "perfect", "constant", "cat"], "y")
    assert ranked[0] == "perfect"
    assert ranked[-1] == "constant"


def test_deterministic_fit_sort_stable(spark):
    df = spark.range(300).selectExpr(
        "id",
        "CAST(id AS DOUBLE) AS y",
        "CAST(id % 13 AS DOUBLE) AS f1",
        "timestamp_seconds(id * 3600) AS ts",
        "CAST(id % 5 AS STRING) AS k",
    )
    a = deterministic_fit_sort(df, "ts", ["k"], ["f1"], "y")
    b = deterministic_fit_sort(df.repartition(7), "ts", ["k"], ["f1"], "y")
    ga = {r["id"]: r["system_record_id"] for r in a.collect()}
    gb = {r["id"]: r["system_record_id"] for r in b.collect()}
    assert ga == gb  # identical ids regardless of partitioning
    assert sorted(ga.values()) == list(range(0, 300))  # 0-based reset_index parity


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts join
    WITHOUT any exchange — the co-located-join layout from the brief."""
    from upgini_spark.sources.io import write_bucketed
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(1000).select(
            (F.col("id") % 50).alias("entity"), F.col("id").alias("x")
        )
        right = spark.range(50).select(
            F.col("id").alias("entity"), (F.col("id") * 2.0).alias("f")
        )
        write_bucketed(left, "bkt_events", ["entity"], 8)
        write_bucketed(right, "bkt_feats", ["entity"], 8)
        a = spark.table("bkt_events")
        b = spark.table("bkt_feats")
        joined = a.join(b, "entity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_events")
        spark.sql("DROP TABLE IF EXISTS bkt_feats")
