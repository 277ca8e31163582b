"""Scaling-efficiency evidence (BASELINE.md protocol).

Runs the identical flagship job (as-of enrichment + window features +
sessionization over the tokenized-sequence table) at a given parallelism
on the same input, repeats, and reports median throughput. The driver
protocol (no real cluster in this sandbox) evidences the north rule's
N-vs-4N criterion with local[N] vs local[4N] on the same input and
fixed shuffle-partition count.

Usage:
  python tools/scaling_run.py <cpus> [n_rows] [repeats]
Then: efficiency = (thr_4N / thr_N) / 4.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
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
    left.persist()
    right.persist()
    left.count(), right.count()  # materialize the in-memory cache

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
        "shuffle_partitions": SHUFFLE_PARTITIONS,
        "times_sec": [round(t, 2) for t in times],
        "median_sec": round(med, 2),
        "sequences_per_sec": round(N_ROWS / med, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
