"""Streaming feature operators: batch equivalence via Trigger.AvailableNow
file streams (no reference semantics to match — we define ours and test
against the batch twin, SURVEY.md §7 risk register)."""

import os

import pytest
from pyspark.sql import functions as F

from upgini_spark.fixtures import feature_source, tokenized_sequences
from upgini_spark.streaming.stream_features import (
    enrich_stream_static,
    session_agg_stream,
    windowed_agg_stream,
)


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events")
    df = tokenized_sequences(spark, 300, n_partitions=2).select(
        "doc_id", "event_time", F.col("n_tok").cast("double").alias("value")
    )
    df.write.parquet(path)
    return path, df


def _run_stream(spark, stream_df, name, mode="append"):
    # append mode only emits watermark-closed windows; equivalence tests
    # use complete mode so end-of-stream windows are visible too
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_agg_batch_equivalence(spark, stream_input):
    path, batch_df = stream_input
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = _run_stream(
        spark,
        windowed_agg_stream(stream, "event_time", ["doc_id"], "value", "1 day"),
        "win_agg", mode="complete",
    ).toPandas()

    exp = (
        batch_df.groupBy("doc_id", F.window("event_time", "1 day").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "doc_id",
            F.col("win.start").alias("window_start"),
            "n_events", "mean_value", "sum_value",
        )
        .toPandas()
    )
    key = ["doc_id", "window_start"]
    got = out[key + ["n_events", "mean_value"]].sort_values(key).reset_index(drop=True)
    want = exp[key + ["n_events", "mean_value"]].sort_values(key).reset_index(drop=True)
    # availableNow + append mode: all windows close at end-of-stream
    assert len(got) == len(want)
    assert (got["n_events"].values == want["n_events"].values).all()


def test_session_agg_stream_runs(spark, stream_input):
    path, _ = stream_input
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = _run_stream(
        spark,
        session_agg_stream(stream, "event_time", ["doc_id"], "value", gap="1 hour"),
        "sess_agg", mode="complete",
    )
    assert out.count() > 0
    bad = out.filter("session_end < session_start").count()
    assert bad == 0


def test_enrich_stream_static_pit(spark, stream_input, tmp_path_factory):
    path, batch_df = stream_input
    feat = feature_source(spark, 300, points_per_entity=4, n_partitions=2)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    enriched = enrich_stream_static(
        stream, feat, entity_col="doc_id", ts_col="event_time"
    )
    out = _run_stream(spark, enriched, "stream_enrich")
    assert out.count() == 300
    # zero temporal leakage on the stream path
    assert out.filter("matched_ts IS NOT NULL AND matched_ts > event_time").count() == 0

    # batch twin: as-of join gives identical matches
    from upgini_spark.joins.asof import asof_join

    exp = asof_join(
        batch_df, feat, left_on="event_time", right_on="feature_ts",
        by_left="doc_id", by_right="entity_id", keep_match_ts=True,
    ).toPandas()
    got = out.toPandas()
    key = ["doc_id", "event_time"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert (
        got["matched_ts"].fillna(0).values == exp["matched_ts"].fillna(0).values
    ).all()
    assert (
        got["f_ext_num_1"].fillna(-1).values == exp["f_ext_num_1"].fillna(-1).values
    ).all()


def test_running_entity_stats_stateful(spark, stream_input):
    """applyInPandasWithState custom stateful op: final running stats per
    entity equal the batch aggregates."""
    from upgini_spark.streaming.stream_features import running_entity_stats_stream

    path, batch_df = stream_input
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = _run_stream(
        spark,
        running_entity_stats_stream(stream, "event_time", "doc_id", "value"),
        "stateful_stats",
    ).toPandas()

    exp = (
        batch_df.groupBy("doc_id")
        .agg(
            F.count("value").alias("n"),
            F.avg("value").alias("running_mean"),
            F.stddev_samp("value").alias("running_std"),
        )
        .toPandas()
    )
    # one emission per entity per micro-batch; availableNow may produce
    # several micro-batches -> keep the final (max n) emission per entity
    out = out.sort_values("n").groupby("entity", as_index=False).last()
    got = out.set_index("entity")
    want = exp.set_index("doc_id")
    assert set(got.index) == set(want.index)
    for e in want.index:
        assert got.loc[e, "n"] == want.loc[e, "n"]
        assert abs(got.loc[e, "running_mean"] - want.loc[e, "running_mean"]) < 1e-9


def test_stream_stream_asof_immediate_matches_batch(spark, tmp_path):
    """Single availableNow micro-batch: immediate-mode stream-stream as-of
    must equal the batch as-of join exactly."""
    import pandas as pd

    from upgini_spark.joins.asof import asof_join
    from upgini_spark.streaming.stream_features import asof_join_stream_stream

    left = tokenized_sequences(spark, 300, n_partitions=2).select(
        F.col("doc_id").alias("entity"),
        F.col("event_time"),
        F.monotonically_increasing_id().alias("event_id"),
    )
    right = feature_source(spark, 80, points_per_entity=5, n_partitions=2).select(
        F.col("entity_id").alias("entity"),
        F.col("feature_ts"),
        F.col("f_ext_num_1").cast("double").alias("value"),
    )
    lpath, rpath = str(tmp_path / "ev"), str(tmp_path / "ft")
    left.write.parquet(lpath)
    right.write.parquet(rpath)

    ev_stream = spark.readStream.schema(left.schema).parquet(lpath)
    ft_stream = spark.readStream.schema(right.schema).parquet(rpath)
    out = _run_stream(
        spark,
        asof_join_stream_stream(ev_stream, ft_stream),
        "ss_asof",
    ).toPandas()

    exp = asof_join(
        left, right, left_on="event_time", right_on="feature_ts",
        by_left="entity", keep_match_ts=True,
    ).toPandas()
    exp["event_time_us"] = exp["event_time"].astype("datetime64[us]").astype("int64")

    got = out.sort_values("event_id").reset_index(drop=True)
    want = exp.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want) == 300
    assert got["event_time_us"].tolist() == want["event_time_us"].tolist()
    g_m = got["matched_ts_us"].fillna(-1).astype("int64").tolist()
    w_m = [
        -1 if pd.isna(x) else pd.Timestamp(x).value // 1000
        for x in want["matched_ts"]
    ]
    assert g_m == w_m
    import numpy as np

    np.testing.assert_allclose(
        got["value"].to_numpy(dtype=float),
        want["value"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_stream_stream_asof_watermark_buffers(spark, tmp_path):
    """Watermark mode: with one batch and no watermark advance, events stay
    buffered in state (nothing emitted prematurely); a follow-up batch
    after the watermark advances emits them with correct matches."""
    import datetime as dt
    import pandas as pd

    from upgini_spark.streaming.stream_features import asof_join_stream_stream

    lpath, rpath = str(tmp_path / "ev"), str(tmp_path / "ft")
    ev = spark.createDataFrame(
        [("e1", dt.datetime(2023, 6, 2), 1), ("e1", dt.datetime(2023, 6, 3), 2)],
        "entity string, event_time timestamp, event_id long",
    )
    ft = spark.createDataFrame(
        [("e1", dt.datetime(2023, 6, 1), 7.0)],
        "entity string, feature_ts timestamp, value double",
    )
    ev.write.parquet(lpath)
    ft.write.parquet(rpath)
    ev_stream = spark.readStream.schema(ev.schema).parquet(lpath)
    ft_stream = spark.readStream.schema(ft.schema).parquet(rpath)
    out = _run_stream(
        spark,
        asof_join_stream_stream(
            ev_stream, ft_stream, watermark="1 hour", emit="watermark"
        ),
        "ss_asof_wm",
    ).toPandas()
    # availableNow: watermark only advances AFTER the single batch; events
    # remain buffered — append emits nothing. (They would flush on the next
    # trigger of a live stream.)
    assert len(out) == 0


def test_stream_stream_asof_watermark_flushes_on_next_batch(spark, tmp_path):
    """Watermark mode with maxFilesPerTrigger=1: batch 1's events buffer;
    after the watermark advances past them (driven by batch 2's newer
    events), they flush with matches from the history that had arrived."""
    import datetime as dt

    from upgini_spark.streaming.stream_features import asof_join_stream_stream

    import time as _time

    lpath, rpath = str(tmp_path / "ev"), str(tmp_path / "ft")
    schema = "entity string, event_time timestamp, event_id long"
    batches = [
        [("e1", dt.datetime(2023, 6, 2), 1)],    # buffered in batch 1
        [("e1", dt.datetime(2023, 6, 15), 2)],   # advances watermark past #1
        [("e1", dt.datetime(2023, 6, 30), 3)],   # batch 3 flushes #1 (and #2)
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(lpath)
        _time.sleep(1.2)  # file mod-time order drives the per-batch intake
    # the GLOBAL watermark is the min across both streams — the feature
    # stream needs a recent row too, or it pins the watermark at June 1
    ft = spark.createDataFrame(
        [("e1", dt.datetime(2023, 6, 1), 7.0),
         ("e9", dt.datetime(2023, 6, 29), 9.0)],
        "entity string, feature_ts timestamp, value double",
    )
    ft.coalesce(1).write.parquet(rpath)

    ev_stream = (
        spark.readStream.schema(spark.read.parquet(lpath).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(lpath)
    )
    ft_stream = spark.readStream.schema(ft.schema).parquet(rpath)
    out = _run_stream(
        spark,
        asof_join_stream_stream(
            ev_stream, ft_stream, watermark="1 hour", emit="watermark"
        ),
        "ss_asof_wm2",
    ).toPandas()
    # event 1 (June 2) flushes once the watermark passes it (after the
    # June 15 batch), matched to the June 1 feature; the LAST event can
    # never flush — no batch runs after the watermark passes it
    flushed = out[out["event_id"] == 1]
    assert len(flushed) == 1
    assert flushed.iloc[0]["value"] == 7.0
    assert 3 not in set(out["event_id"])


def test_stream_stream_asof_wide_payload_through_state(spark, tmp_path):
    """Round-3: wide, mixed-type payload columns ride THROUGH state (no
    join-back on event_id) and match the batch as-of join exactly."""
    import numpy as np
    import pandas as pd

    from upgini_spark.joins.asof import asof_join
    from upgini_spark.streaming.stream_features import asof_join_stream_stream

    left = tokenized_sequences(spark, 200, n_partitions=2).select(
        F.col("doc_id").alias("entity"),
        F.col("event_time"),
        F.monotonically_increasing_id().alias("event_id"),
    )
    right = feature_source(spark, 60, points_per_entity=4, n_partitions=2).select(
        F.col("entity_id").alias("entity"),
        F.col("feature_ts"),
        F.col("f_ext_num_1").cast("double").alias("v_num"),
        (F.col("f_ext_num_1") * 100).cast("long").alias("v_long"),
        F.concat(F.lit("tag_"), F.col("entity_id")).alias("v_str"),
        # token arrays are first-class payload (north rule): must ride
        # through state byte-identical
        F.sequence(
            F.lit(1), (F.abs(F.xxhash64("entity_id")) % 5 + 1).cast("int")
        ).cast("array<int>").alias("v_tokens"),
    )
    lpath, rpath = str(tmp_path / "ev"), str(tmp_path / "ft")
    left.write.parquet(lpath)
    right.write.parquet(rpath)

    out = _run_stream(
        spark,
        asof_join_stream_stream(
            spark.readStream.schema(left.schema).parquet(lpath),
            spark.readStream.schema(right.schema).parquet(rpath),
            feature_val_cols=["v_num", "v_long", "v_str", "v_tokens"],
        ),
        "ss_asof_wide",
    )
    # the plan has no join-back: single stateful op, zero join nodes
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    got = out.toPandas().sort_values("event_id").reset_index(drop=True)
    exp = asof_join(
        left, right, left_on="event_time", right_on="feature_ts",
        by_left="entity", keep_match_ts=True,
    ).toPandas().sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(exp) == 200
    g_m = got["matched_ts_us"].fillna(-1).astype("int64").tolist()
    w_m = [
        -1 if pd.isna(x) else pd.Timestamp(x).value // 1000
        for x in exp["matched_ts"]
    ]
    assert g_m == w_m
    np.testing.assert_allclose(
        got["v_num"].to_numpy(dtype=float),
        exp["v_num"].to_numpy(dtype=float), equal_nan=True,
    )
    assert got["v_long"].fillna(-1).astype("int64").tolist() == \
        exp["v_long"].fillna(-1).astype("int64").tolist()
    assert got["v_str"].fillna("").tolist() == exp["v_str"].fillna("").tolist()
    # token-array byte identity through state
    g_tok = [None if x is None else list(x) for x in got["v_tokens"]]
    w_tok = [None if x is None else list(x) for x in exp["v_tokens"]]
    assert g_tok == w_tok


def test_dedup_stream_drops_replays(spark, tmp_path):
    """Streaming exact dedup: duplicate keys across micro-batches within
    the watermark are dropped; distinct keys all survive."""
    from upgini_spark.streaming.stream_features import dedup_stream

    base = tokenized_sequences(spark, 120, n_partitions=2).select(
        "doc_id", "event_time", F.col("n_tok").cast("double").alias("value")
    )
    dup = base.limit(40)  # replayed rows (same doc_id + event_time)
    path = str(tmp_path / "dups")
    base.unionByName(dup).write.parquet(path)

    stream = spark.readStream.schema(base.schema).parquet(path)
    out = _run_stream(
        spark, dedup_stream(stream, ["doc_id"], "event_time"), "dedup_stream"
    ).toPandas()
    assert len(out) == base.select("doc_id").distinct().count()
    assert out["doc_id"].is_unique


def test_media_decode_streams_batch_equivalent(spark, tmp_path):
    """The real media decode stage is stateless mapInPandas, so it runs
    unchanged on a stream: parquet-source readStream through decode_media
    equals the batch decode row-for-row (multimodal columns are
    first-class in the streaming path too)."""
    from upgini_spark.functions.multimodal import decode_media, synthetic_real_media

    path = str(tmp_path / "media")
    synthetic_real_media(spark, 60).write.parquet(path)
    batch = decode_media(spark.read.parquet(path))
    stream = decode_media(
        spark.readStream.schema(
            spark.read.parquet(path).schema
        ).parquet(path)
    )
    got = _run_stream(spark, stream, "media_decode_stream")

    def canon(df):
        return {
            tuple(
                tuple(v) if isinstance(v, list) else v for v in r
            )
            for r in df.collect()
        }

    b, g = canon(batch), canon(got)
    assert b == g and len(b) == 60


def test_dedup_stream_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics end-to-end: a duplicate
    key within the horizon drops (same batch AND across batches while
    state lives); after the watermark passes the stored event + delay
    AND end-of-batch cleanup runs (eviction lags one batch — the
    guarantee is drops-within-horizon, beyond it best-effort), the key
    legitimately re-emits — bounded state, not forever-dedup."""
    import datetime as dt
    import time as _time

    from upgini_spark.streaming.stream_features import dedup_stream

    path = str(tmp_path / "dd")
    schema = "k string, ts timestamp, event_id long"
    batches = [
        # batch 1: in-batch duplicate of 'a' -> #2 drops
        [("a", dt.datetime(2023, 6, 1, 0, 0), 1),
         ("a", dt.datetime(2023, 6, 1, 0, 30), 2)],
        # batch 2: new key advances the watermark far past a's expiry
        [("b", dt.datetime(2023, 6, 5, 0, 0), 3)],
        # batch 3 runs with watermark Jun4 23:00 -> its END-of-batch
        # cleanup evicts a's state (expired Jun1 01:00)
        [("c", dt.datetime(2023, 6, 6, 0, 0), 4)],
        # batch 4: 'a' state gone -> re-emits
        [("a", dt.datetime(2023, 6, 6, 1, 0), 5)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(path)
        _time.sleep(1.2)  # file mod-time order drives per-batch intake

    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = _run_stream(
        spark, dedup_stream(stream, ["k"], "ts", watermark="1 hour"),
        "dd_sink",
    ).toPandas()
    assert set(out["event_id"]) == {1, 3, 4, 5}, out
