"""Scaling evidence for the token-explode workload class: concat-and-chunk
sequence packing over a synthetic tokenized corpus (BASELINE.md N-vs-4N
protocol, third job family next to the flagship shuffle job and the
md5-bound minhash job).

Usage: python tools/scaling_pack.py <cpus> [n_docs] [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
SHUFFLE_PARTITIONS = 256
MAX_LEN = 1024


def main() -> None:
    from pyspark.sql import functions as F

    from upgini_spark.functions.tokens import pack_sequences
    from upgini_spark.session import get_spark

    os.makedirs("/dev/shm/spark-scaling", exist_ok=True)
    spark = get_spark(
        f"scaling_pack_{CPUS}", master=f"local[{CPUS}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
            "spark.local.dir": "/dev/shm/spark-scaling",
        },
    )
    # ~100 tokens/doc, deterministic; cached input so runs time the packing
    i = F.col("id")
    docs = spark.range(N_DOCS, numPartitions=SHUFFLE_PARTITIONS).select(
        i.alias("doc_id"),
        F.sequence(
            F.lit(0), (F.abs(F.xxhash64(i)) % 160 + 40).cast("int")
        ).alias("toks"),
    ).persist()
    n_tokens = docs.select(F.sum(F.size("toks"))).collect()[0][0]

    times = []
    for _ in range(2):  # warm-up
        pack_sequences(docs, "doc_id", "toks", MAX_LEN).write.format(
            "noop").mode("overwrite").save()
    for _ in range(REPEATS):
        t0 = time.time()
        pack_sequences(docs, "doc_id", "toks", MAX_LEN).write.format(
            "noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 2))
    med = statistics.median(times)
    print(json.dumps({
        "job": "pack_sequences_1024", "cpus": CPUS, "n_docs": N_DOCS,
        "n_tokens": int(n_tokens), "times_sec": times, "median_sec": med,
        "tokens_per_sec": round(n_tokens / med, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
