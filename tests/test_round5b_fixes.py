"""Round-5 continuation: table-backed bucketed feature sources through the
enricher API, the numpy histogram-GBDT estimator + TreeSHAP, and stdlib
GIF/BMP media decode."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Enricher-level co-bucketed deployment (CLAUDE.md r5 candidate: "plumbing
# table-backed feature sources through the enricher API")
# ---------------------------------------------------------------------------


def test_enricher_bucketed_transform_zero_exchange(spark):
    """materialize_source_bucketed + bucketize_input: the FULL enricher
    transform — as-of enrichment, cyclical date features, and the three
    default generated TS formulas (dedup slim pass + join-back included)
    — plans with ZERO Exchange when both sides ride co-bucketed tables,
    and values match the native shuffled engine exactly."""
    from upgini_spark.fixtures import feature_source, tokenized_sequences
    from upgini_spark.pipeline.enricher import SparkFeaturesEnricher

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        seq = tokenized_sequences(spark, 2500)
        src = feature_source(spark, 2500, points_per_entity=3)

        enr = SparkFeaturesEnricher(src)
        enr.fit(seq, "doc_id", "event_time", validate_features=False)
        enr.materialize_source_bucketed("r5b_hist_bkt", 8)
        assert enr.asof_engine == "hist"
        bl = SparkFeaturesEnricher.bucketize_input(
            seq, "r5b_seq_bkt", "doc_id", "event_time", 8
        )

        out = enr.transform(bl)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:4000]

        ref_enr = SparkFeaturesEnricher(src, asof_engine="native")
        ref_enr.fit(seq, "doc_id", "event_time", validate_features=False)
        ref = ref_enr.transform(seq)

        cols = ["matched_ts", "f_ext_num_1", "f_autofe_roll_7d_mean",
                "f_autofe_roll_30d_max", "f_autofe_lag_1d",
                "datetime_day_in_quarter_sin"]
        key = ["doc_id", "event_time", "n_tok"]

        def snap(df):
            return {
                tuple(str(r[k]) for k in key): tuple(str(r[c]) for c in cols)
                for r in df.select(*key, *cols).collect()
            }

        assert snap(out) == snap(ref)

        # idempotent re-materialization in the same session (catalog hit)
        enr2 = SparkFeaturesEnricher(src)
        enr2.fit(seq, "doc_id", "event_time", validate_features=False)
        enr2.materialize_source_bucketed("r5b_hist_bkt", 8)
        out2 = enr2.transform(bl, keep_cyclical=False)
        assert "Exchange" not in out2._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "true")
        spark.sql("DROP TABLE IF EXISTS r5b_hist_bkt")
        spark.sql("DROP TABLE IF EXISTS r5b_seq_bkt")
