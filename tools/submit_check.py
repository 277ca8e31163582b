"""Minimal spark-submit job: as-of enrich + window feature over the
synthetic tokenized table, printing a one-line result."""
import json

from pyspark.sql import SparkSession

from upgini_spark.fixtures import feature_source, tokenized_sequences
from upgini_spark.joins.asof import asof_join
from upgini_spark.operators.timeseries import roll_feature

spark = (
    SparkSession.builder.appName("submit-check")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
left = tokenized_sequences(spark, 2000)
right = feature_source(spark, 300)
out = asof_join(left, right, left_on="event_time", right_on="feature_ts",
                by_left="doc_id", by_right="entity_id", keep_match_ts=True)
out = roll_feature(out, "event_time", ["doc_id"], "f_ext_num_1", 7, "D", "mean")
n = out.count()
n_matched = out.filter(out.matched_ts.isNotNull()).count()
leaks = out.filter(out.matched_ts > out.event_time).count()
print("SUBMIT_RESULT " + json.dumps({"rows": n, "matched": n_matched, "leaks": leaks}))
spark.stop()
