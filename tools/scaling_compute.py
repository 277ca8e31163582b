"""CPU-bound scaling evidence: MinHash signatures over synthetic documents.

The flagship enrich job moves ~1 KB/row of token payload, so on ONE box it
saturates memory bandwidth above ~8 threads (see BENCH/BASELINE.md). This
companion benchmark is compute-dominated (md5 per shingle x permutations,
no shuffle) and demonstrates that CPU-bound operators scale with cores on
the same box — isolating "plan scales" from "one box's memory bus".

Usage: python tools/scaling_compute.py <cpus> [n_docs] [repeats]
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


def main() -> None:
    from pyspark.sql import functions as F

    from upgini_spark.functions.dedup import minhash_signature
    from upgini_spark.session import get_spark

    spark = get_spark(
        f"scaling_compute_{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=256,
        extra_conf={"spark.local.dir": "/dev/shm/spark-scaling"},
    )
    # synthetic ~60-word documents from hash expressions
    words = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.concat(F.lit("w"), (F.abs(F.xxhash64(F.col("id"), j)) % 5000).cast("string")),
    )
    docs = spark.range(0, N_DOCS, numPartitions=256).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )
    docs.persist()
    docs.count()

    def job():
        return minhash_signature(docs, "text", k=8, shingle_n=3).select(
            "doc_id", "mh0", "mh1", "mh2", "mh3", "mh4", "mh5", "mh6", "mh7"
        )

    for _ in range(2):
        job().write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        job().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    med = statistics.median(times)
    print(json.dumps({
        "job": "minhash_k8",
        "cpus": CPUS,
        "n_docs": N_DOCS,
        "times_sec": [round(t, 2) for t in times],
        "median_sec": round(med, 2),
        "docs_per_sec": round(N_DOCS / med, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
