"""Per-stage lineage, row-count and skew metrics + checkpoint/resume.

North-rule requirements: the pipeline is resumable from snapshot
checkpoints with per-partition lineage and row-count/skew metrics logged
per stage. Without an Iceberg catalog in this sandbox, checkpoints are
parquet snapshot directories with a JSON ledger carrying: stage name,
content digest, per-partition row counts, skew ratio, and the config used.
On a cluster the same ledger rides next to Iceberg snapshots (the digest
doubles as the reference's deterministic upload digest,
src/upgini/dataset.py:494-507 / utils/hash_utils.py:13-100 — per-partition
xxhash64 rollup folded into one content hash, order-independent).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_digest(df: DataFrame) -> str:
    """Order-independent content hash: xxhash64 per row (all columns,
    arrays cast to json), XOR-folded per partition, summed driver-side.
    One distributed pass, O(1) driver data."""
    cols = [F.coalesce(F.to_json(F.struct(c)), F.lit("\x00")) for c in df.columns]
    row_hash = F.xxhash64(*cols)
    # sum in decimal(38,0): ANSI-safe (long sum overflows), folded to
    # 64 bits driver-side
    agg = df.select(
        F.spark_partition_id().alias("pid"),
        row_hash.cast("decimal(38,0)").alias("h"),
    ).groupBy("pid").agg(F.sum(F.col("h")).alias("hsum"))
    total = 0
    for r in agg.collect():
        total = (total + int(r["hsum"] or 0)) % (1 << 64)
    return f"{total:016x}"


def partition_metrics(df: DataFrame) -> dict:
    """Per-partition row counts + skew ratio (max/mean) in one job."""
    rows = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = {int(r["pid"]): int(r["count"]) for r in rows}
    n = sum(counts.values())
    n_parts = max(len(counts), 1)
    mean = n / n_parts if n_parts else 0.0
    skew = (max(counts.values()) / mean) if counts and mean else 1.0
    return {
        "rows": n,
        "partitions": n_parts,
        "per_partition": counts,
        "skew_max_over_mean": round(skew, 3),
    }


def key_skew_histogram(df: DataFrame, key_cols: list[str], top_n: int = 10) -> dict:
    """Hot-key histogram on the shuffle key — drives the salting factor for
    the as-of kernel (SURVEY.md §4 custom-strategy 2)."""
    total = df.count()
    top = (
        df.groupBy(*key_cols).count().orderBy(F.col("count").desc()).limit(top_n).collect()
    )
    return {
        "total_rows": total,
        "top_keys": [
            {"key": [str(r[c]) for c in key_cols], "rows": int(r["count"]),
             "share": round(r["count"] / total, 6) if total else 0.0}
            for r in top
        ],
    }


def suggest_salt(df: DataFrame, key_cols: list[str], rows_per_task: int = 500_000) -> int:
    """Salting factor from the hottest key: ceil(hottest / rows_per_task)."""
    hist = key_skew_histogram(df, key_cols, top_n=1)
    if not hist["top_keys"]:
        return 1
    hottest = hist["top_keys"][0]["rows"]
    return max(1, -(-hottest // rows_per_task))


class StageLedger:
    """Checkpoint ledger: write stage snapshots, resume completed stages.

    ``run(stage_name, build_fn)`` returns the stage DataFrame — from the
    snapshot if this stage already completed (resume path), else by
    executing ``build_fn()``, snapshotting, and recording metrics.
    """

    def __init__(self, spark, root: str) -> None:
        self.spark = spark
        self.root = root
        self.ledger_path = os.path.join(root, "ledger.json")
        os.makedirs(root, exist_ok=True)
        self.entries: dict[str, dict] = {}
        if os.path.exists(self.ledger_path):
            with open(self.ledger_path) as f:
                self.entries = json.load(f)

    def _flush(self) -> None:
        tmp = self.ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=1)
        os.replace(tmp, self.ledger_path)

    def run(self, stage: str, build_fn, digest: bool = False) -> DataFrame:
        path = os.path.join(self.root, stage)
        entry = self.entries.get(stage)
        if entry and entry.get("status") == "done" and os.path.isdir(path):
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = build_fn()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        metrics = partition_metrics(out)
        self.entries[stage] = {
            "status": "done",
            "path": path,
            "wall_sec": round(time.time() - t0, 2),
            "metrics": metrics,
            **({"digest": content_digest(out)} if digest else {}),
        }
        self._flush()
        return out

    def invalidate(self, stage: str) -> None:
        self.entries.pop(stage, None)
        self._flush()
