"""Scaling-efficiency evidence (BASELINE.md protocol).

Runs the identical flagship job (as-of enrichment + window features +
sessionization over the tokenized-sequence table) at a given parallelism
on the same input, repeats, and reports median throughput. The driver
protocol (no real cluster in this sandbox) evidences the north rule's
N-vs-4N criterion with local[N] vs local[4N] on the same input and
fixed shuffle-partition count.

Usage:
  python tools/scaling_run.py <cpus> [n_rows] [repeats] [--bucketed]
Then: efficiency = (thr_4N / thr_N) / 4.

``--bucketed`` (r5) runs the zero-exchange variant instead: both sides
read from tables bucketed on the join key (256 buckets, the same layout
for every core count), the as-of is a bucket-to-bucket sort-merge join
via asof_join_hist, and the plan is asserted Exchange-free before
timing — the configuration that attacks the measured 8→32 memory-bus
wall (no 1 KB/row token payload ever crosses a shuffle).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETED = "--bucketed" in sys.argv
ARROW = "--arrow" in sys.argv  # salted groupBy.applyInPandas merge_asof engine
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
CPUS = int(_args[0]) if len(_args) > 0 else 32
N_ROWS = int(_args[1]) if len(_args) > 1 else 4_000_000
REPEATS = int(_args[2]) if len(_args) > 2 else 3
SHUFFLE_PARTITIONS = 256  # fixed across runs: same plan, same task count


def main() -> None:
    from upgini_spark.fixtures import feature_source, tokenized_sequences
    from upgini_spark.joins.asof import asof_join
    from upgini_spark.operators.timeseries import roll_features, sessionize
    from upgini_spark.session import get_spark

    # Shuffle spill dirs on tmpfs: a single local disk does not scale with
    # thread count the way per-node disks do on a real cluster; tmpfs makes
    # the benchmark measure compute+shuffle CPU, which is what the N-vs-4N
    # criterion is about.
    os.makedirs("/dev/shm/spark-scaling", exist_ok=True)
    spark = get_spark(
        f"scaling_{CPUS}", master=f"local[{CPUS}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
            "spark.local.dir": "/dev/shm/spark-scaling",
        },
    )

    cache = f"/tmp/upgini_spark_scaling_{N_ROWS}"
    lp, rp = f"{cache}/sequences", f"{cache}/features"
    if not os.path.isdir(lp):
        tokenized_sequences(spark, N_ROWS, n_partitions=SHUFFLE_PARTITIONS).write.mode(
            "overwrite"
        ).parquet(lp)
        feature_source(spark, N_ROWS, points_per_entity=4,
                       n_partitions=SHUFFLE_PARTITIONS).write.mode("overwrite").parquet(rp)

    left, right = spark.read.parquet(lp), spark.read.parquet(rp)

    if BUCKETED:
        from upgini_spark.joins.asof import asof_join_hist, build_asof_hist
        from upgini_spark.sources.io import ensure_bucketed

        lb, hb = f"scaling_seq_bkt_{N_ROWS}", f"scaling_hist_bkt_{N_ROWS}"
        ensure_bucketed(spark, lambda: left, lb, ["doc_id"],
                        SHUFFLE_PARTITIONS, sort_cols=["doc_id", "event_time"])
        ensure_bucketed(
            spark,
            lambda: build_asof_hist(right, "feature_ts", ["entity_id"]),
            hb, ["entity_id"], SHUFFLE_PARTITIONS,
        )
        left, hist = spark.table(lb), spark.table(hb)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def flagship():
            enriched = asof_join_hist(
                left, hist, "event_time", ["doc_id"], ["entity_id"],
                keep_match_ts=True,
            )
            feat = roll_features(
                enriched, "event_time", ["doc_id"], "f_ext_num_1",
                [(7, "D", "mean"), (7, "D", "std"), (30, "D", "max"), (1, "D", "count")],
            )
            return sessionize(feat, "event_time", ["doc_id"], gap_seconds=86400,
                              tie_cols=["n_tok"])

        n_ex = flagship()._jdf.queryExecution().executedPlan().toString().count("Exchange")
        assert n_ex == 0, f"bucketed flagship plan has {n_ex} Exchange(s)"
    else:
        left.persist()
        right.persist()
        left.count(), right.count()  # materialize the in-memory cache

        def flagship():
            enriched = asof_join(
                left, right, left_on="event_time", right_on="feature_ts",
                by_left="doc_id", by_right="entity_id", keep_match_ts=True,
                **({"engine": "arrow", "salt": 2} if ARROW else {}),
            )
            feat = roll_features(
                enriched, "event_time", ["doc_id"], "f_ext_num_1",
                [(7, "D", "mean"), (7, "D", "std"), (30, "D", "max"), (1, "D", "count")],
            )
            return sessionize(feat, "event_time", ["doc_id"], gap_seconds=86400,
                              tie_cols=["n_tok"])

    for _ in range(2):  # warm-up: JIT + cache materialization
        flagship().write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        flagship().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    med = statistics.median(times)
    print(json.dumps({
        "cpus": CPUS,
        "n_rows": N_ROWS,
        "mode": "bucketed" if BUCKETED else ("arrow" if ARROW else "shuffled"),
        "shuffle_partitions": SHUFFLE_PARTITIONS,
        "times_sec": [round(t, 2) for t in times],
        "median_sec": round(med, 2),
        "sequences_per_sec": round(N_ROWS / med, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
