"""Throughput benchmark.

Measures (a) the north-star metric — enriched sequences/sec for the
flagship pipeline (as-of enrichment join + windowed temporal features +
sessionization) over the synthetic tokenized-sequence table at the
SF-matched row count — and (b) per-query wall times for the headline
operator queries over $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "sequences_per_sec": ..., ...}

Timing uses the noop sink so every projected column is actually computed
(count() would let Catalyst prune the feature columns away).

Scaling evidence (BASELINE.md protocol): run twice —
  SPARK_GRAFT_CPUS=8  python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
and compare sequences_per_sec (efficiency = (thr_32 / thr_8) / 4).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# synthetic tokenized-sequence scale matched to the sf dir (TESTDATA.md:
# lineitem ~600k rows at sf0.1)
SEQ_ROWS = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}

HEADLINE = [
    "asof_join_backward",
    "asof_join_arrow",
    "asof_join_broadcast",
    "roll_windows_7d",
    "roll_quantiles_7d",
    "time_lag_1d",
    "sessionize_30m",
    "session_stats",
    "groupby_then_ops",
    "unary_scalars",
    "date_list_aggs",
    "minhash_signatures",
    "knn_cosine_top3",
    "text_stats",
    "dedup_key_conflicts",
    "psi_halves",
    "embedding_near_dup",
    "knn_cosine_ivf",
    "forced_downsample_binary",
    "ts_id_priority_sample",
    # round 3: new workload classes (token explode, iterative graph,
    # mixing filter, fit+assign)
    "pack_sequences_512",
    "dedup_components",
    "mix_sources_sample",
    "cluster_assign",
    # round 4: benchmark decontamination (shingle explode + semi-join),
    # plus the two re-staged text fingerprints (track the 40x/13x fixes)
    "decontaminate_overlap",
    "simhash_32",
    "repetition_share",
    # round 5: batched monthly-PSI report (track the per-feature-loop fix)
    "psi_monthly",
    # round 5 continuation: BM25 (1-row stats broadcast, no explode) and
    # PQ-ADC (eager codebook fit + encode + table-lookup scoring)
    "text_bm25_topk",
    "knn_cosine_pq_adc",
    # round 5 continuation: crawl-pipeline extraction + filtering pack
    # (regexp-chain HTML strip, hash-group paragraph dedup, corpus-trained
    # bigram-LM scoring, URL canonicalize+dedup)
    "html_strip_extract",
    "paragraph_dedup_corpus",
    "bigram_lm_nll",
    "url_canonical_dedup",
    # round 5 continuation: source-mixing + chunking pack (water-filling
    # plan composed with the broadcast rate filter; A-ES weighted top-n;
    # sliding-window token chunking over the vocab encoder)
    "temperature_mix_apply",
    "weighted_sample_100",
    "chunk_sliding_tokens",
    # round 5 final: IVF+PQ (eager coarse + codebook fits, cell-join
    # candidate fetch — track vs knn_cosine_pq_adc's full ADC scan)
    "knn_cosine_ivf_pq",
    # round 5 final: snapshot-to-snapshot anti-join dedup (the one
    # anti-join workload in the suite)
    "dedup_incremental",
]


def _noop_time(make_df) -> float:
    """Time DataFrame CONSTRUCTION + noop write: queries with an eager
    fit stage (connected components, k-means centroids, record ids) do
    real work while building the frame — excluding it would hide their
    dominant cost."""
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _steady_time(make_df, runs: int = 3) -> float:
    """Best of ``runs`` executions — the first run pays one-time costs
    (plan compilation, codegen, IO cache), and this VM exhibits multi-10s
    host-contention stalls (BASELINE.md), so the min over 3 is the
    reproducible steady-state figure."""
    return min(_noop_time(make_df) for _ in range(runs))


def main() -> None:
    from pyspark.sql import functions as F
    from upgini_spark.fixtures import feature_source, tokenized_sequences
    from upgini_spark.joins.asof import asof_join
    from upgini_spark.operators.timeseries import roll_features, sessionize
    from upgini_spark.session import get_spark
    import __spark_entry__ as entry_mod

    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    n_rows = SEQ_ROWS.get(sf_name, 600_000)

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=4 * CPUS)

    # --- north-star pipeline over the tokenized-sequence table ------------
    cache = f"/tmp/upgini_spark_bench_{sf_name}"
    left_path, right_path = f"{cache}/sequences", f"{cache}/features"
    if not os.path.isdir(left_path):
        shutil.rmtree(cache, ignore_errors=True)
        tokenized_sequences(spark, n_rows, n_partitions=4 * CPUS).write.parquet(left_path)
        feature_source(spark, n_rows, points_per_entity=8,
                       n_partitions=4 * CPUS).write.parquet(right_path)

    left = spark.read.parquet(left_path)
    right = spark.read.parquet(right_path)

    def flagship():
        enriched = asof_join(
            left, right, left_on="event_time", right_on="feature_ts",
            by_left="doc_id", by_right="entity_id", keep_match_ts=True,
        )
        feat = roll_features(
            enriched, "event_time", ["doc_id"], "f_ext_num_1",
            [(7, "D", "mean"), (7, "D", "std"), (30, "D", "max"), (1, "D", "count")],
        )
        return sessionize(feat, "event_time", ["doc_id"], gap_seconds=86400,
                          tie_cols=["n_tok"])

    flagship().write.format("noop").mode("overwrite").save()  # warm-up (JIT, IO cache)
    # best-of-5: this VM exhibits multi-10s stalls (documented in
    # BASELINE.md); the min is the reproducible steady-state figure
    t_flagship = _steady_time(flagship, runs=5)
    sequences_per_sec = n_rows / t_flagship

    # --- headline operator queries over the star schema -------------------
    qs = entry_mod.queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        per_query[name] = round(_steady_time(lambda n=name: qs[n](spark, SF_DIR)), 3)
    per_query["flagship_enrich"] = round(t_flagship, 3)

    # --- co-bucketed zero-exchange flagship variant (r5) ------------------
    # Both sides written bucketed on the join key (fixed 64 buckets so the
    # 8-core and 32-core runs read the SAME layout): the as-of plans as a
    # bucket-to-bucket sort-merge join and every window reuses the left
    # table's clustering — the token payload never crosses an Exchange.
    # The one-time layout write is reported separately (amortized cost).
    from upgini_spark.joins.asof import asof_join_hist, build_asof_hist
    from upgini_spark.sources.io import ensure_bucketed

    sf_tag = sf_name.replace(".", "_")
    lb_name, hb_name = f"bench_seq_bkt_{sf_tag}", f"bench_hist_bkt_{sf_tag}"
    t0 = time.time()
    ensure_bucketed(spark, lambda: left, lb_name, ["doc_id"], 64,
                    sort_cols=["doc_id", "event_time"])
    ensure_bucketed(
        spark, lambda: build_asof_hist(right, "feature_ts", ["entity_id"]),
        hb_name, ["entity_id"], 64,
    )
    if time.time() - t0 > 1.0:  # a real write happened, not a re-register
        per_query["bucketed_layout_write_once"] = round(time.time() - t0, 3)
    bl, bh = spark.table(lb_name), spark.table(hb_name)

    def flagship_bucketed():
        enriched = asof_join_hist(
            bl, bh, "event_time", ["doc_id"], ["entity_id"], keep_match_ts=True,
        )
        feat = roll_features(
            enriched, "event_time", ["doc_id"], "f_ext_num_1",
            [(7, "D", "mean"), (7, "D", "std"), (30, "D", "max"), (1, "D", "count")],
        )
        return sessionize(feat, "event_time", ["doc_id"], gap_seconds=86400,
                          tie_cols=["n_tok"])

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_exchanges = flagship_bucketed()._jdf.queryExecution().executedPlan(
        ).toString().count("Exchange")
        flagship_bucketed().write.format("noop").mode("overwrite").save()  # warm-up
        t_bucketed = _steady_time(flagship_bucketed, runs=5)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    per_query["flagship_bucketed"] = round(t_bucketed, 3)
    bucketed_seq_per_sec = n_rows / t_bucketed

    # --- pipeline-level composite: normalize → validate → dedup →
    # record-ids → as-of enrich over the events table (the fit lifecycle,
    # tests/test_lifecycle_e2e.py shape, at benchmark scale). Timed END TO
    # END including DataFrame construction: record-id assignment
    # materializes eagerly, and excluding it would hide real pipeline cost.
    def pipeline_e2e() -> float:
        from upgini_spark.functions.dedup import drop_full_duplicates
        from upgini_spark.pipeline.normalizer import normalize_types, validate_features
        from upgini_spark.pipeline.record_ids import add_system_record_id

        t0 = time.time()
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        feats = ["event_type", "value"]
        d = normalize_types(ev, feats)
        d, _dropped = validate_features(d, feats, exact=True)
        d = drop_full_duplicates(
            d, subset=["user_id", "ts", "value"], order_col="event_id"
        )
        d = add_system_record_id(d, "ts", ["user_id"])
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
            F.col("value").alias("click_value"),
        )
        out = asof_join(
            d, clicks, left_on="ts", right_on="r_ts",
            by_left="user_id", by_right="r_user", keep_match_ts=True,
        )
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    pipeline_e2e()  # warm-up
    per_query["pipeline_e2e"] = round(min(pipeline_e2e() for _ in range(2)), 3)

    # metrics lifecycle: enrich -> <=100k deterministic sample -> fold
    # column -> ONE collect -> driver-side CV (r4 harness). Timed end to
    # end; the driver-side fit is the reference's own <=100k design.
    def metrics_e2e() -> float:
        from upgini_spark.pipeline.enricher import SparkFeaturesEnricher

        t0 = time.time()
        seq = left.withColumn(
            "client_f", (F.col("n_tok") % 97).cast("double")
        ).withColumn("target_bin", (F.col("n_tok") % 2).cast("int"))
        enr = SparkFeaturesEnricher(right).fit(
            seq, "doc_id", "event_time", feature_cols=["client_f"],
            target_col="target_bin", validate_features=False,
        )
        enr.calculate_metrics(seq, "target_bin", max_rows=50_000)
        return time.time() - t0

    metrics_e2e()  # warm-up
    per_query["metrics_e2e"] = round(min(metrics_e2e() for _ in range(2)), 3)

    # real media decode throughput (r4): 20k genuine WAV/PPM payloads
    # synthesized + parsed with the stdlib decoders in one Arrow kernel
    def media_decode() -> float:
        from upgini_spark.functions.multimodal import (
            decode_media,
            synthetic_real_media,
        )

        t0 = time.time()
        decode_media(synthetic_real_media(spark, 20_000)).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    media_decode()  # warm-up
    per_query["media_decode_20k"] = round(min(media_decode() for _ in range(2)), 3)

    # GIF (LZW) + BMP decode throughput (r5 continuation): 20k genuine
    # compressed-bitstream payloads through the same Arrow kernel
    def media_decode_gif_bmp() -> float:
        from upgini_spark.functions.multimodal import (
            decode_media,
            synthetic_gif_bmp_media,
        )

        t0 = time.time()
        decode_media(synthetic_gif_bmp_media(spark, 20_000)).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    media_decode_gif_bmp()  # warm-up
    per_query["media_decode_gif_bmp_20k"] = round(
        min(media_decode_gif_bmp() for _ in range(2)), 3
    )

    # baseline JPEG decode throughput (r5): 20k genuine Huffman-coded
    # JFIF payloads (gray + YCbCr 4:2:0) through the same Arrow kernel
    def media_decode_jpeg() -> float:
        from upgini_spark.functions.multimodal import (
            decode_media,
            synthetic_jpeg_media,
        )

        t0 = time.time()
        decode_media(synthetic_jpeg_media(spark, 20_000)).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    media_decode_jpeg()  # warm-up
    per_query["media_decode_jpeg_20k"] = round(
        min(media_decode_jpeg() for _ in range(2)), 3
    )

    total = round(sum(per_query.values()), 3)
    print(json.dumps({
        "metric": "headline suite wall time (flagship as-of enrich + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf_name,
        "sequences_per_sec": round(sequences_per_sec, 1),
        "bucketed_sequences_per_sec": round(bucketed_seq_per_sec, 1),
        "flagship_bucketed_exchanges": n_exchanges,
        "seq_rows": n_rows,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
