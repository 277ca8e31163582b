"""Sampling / rebalancing operators (reference src/upgini/utils/
sample_utils.py, target_utils.py:164-276).

The reference samples with a seeded RNG; a distributed engine needs
order-free determinism instead, so the primary primitive here is
*hash-rank sampling*: keep the n rows with the smallest md5(id) — the
same rows on any cluster size, any partitioning, and reproducible in
ANSI SQL. Seeded ``DataFrame.sample``/``sampleBy`` variants are provided
for statistical (non-exact) paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FIT_SAMPLE_THRESHOLD = 100_000  # reference utils/config.py:18-21
FORCE_SAMPLE_SIZE = 7_000       # reference dataset.py:65


def hash_sample_exact(df: DataFrame, n: int, id_cols: list[str]) -> DataFrame:
    """Deterministic exact-n sample: keep the n rows with the smallest
    md5 of the id tuple.

    Planned as ``TakeOrderedAndProject`` (per-partition top-n, merged) —
    NOT a global ``row_number()`` window, which would shuffle every row
    through one partition. Same rows on any cluster size.
    """
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols]))
    order = [h.asc()] + [F.col(c).asc() for c in id_cols]
    return df.orderBy(*order).limit(n)


def threshold_downsample(
    df: DataFrame, id_cols: list[str], threshold: int = FIT_SAMPLE_THRESHOLD
) -> DataFrame:
    """>threshold rows → exact-threshold deterministic sample
    (sample_utils.py:62-152)."""
    if df.count() <= threshold:
        return df
    return hash_sample_exact(df, threshold, id_cols)


def imbalance_quotas(df: DataFrame, target_col: str) -> dict:
    """Per-class keep-quotas (target_utils.py:164-276): BINARY keeps
    minority + 5·(minority + max(5000 − 2·minority, 0)) of majority;
    MULTICLASS quota = 2·(min + (25000 − k·min)/(k−1)) per class."""
    counts = {r[0]: r[1] for r in df.groupBy(target_col).count().collect()}
    k = len(counts)
    m = min(counts.values())
    if k == 2:
        quota = m + 5 * (m + max(5000 - 2 * m, 0))
    else:
        quota = int(2 * (m + (25000 - k * m) / max(k - 1, 1)))
    return {cls: min(c, quota) for cls, c in counts.items()}


def undersample_imbalanced(
    df: DataFrame, target_col: str, id_cols: list[str]
) -> DataFrame:
    """Deterministic per-class undersample to the reference quotas."""
    quotas = imbalance_quotas(df, target_col)
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols]))
    w = Window.partitionBy(target_col).orderBy(h.asc(), *[F.col(c).asc() for c in id_cols])
    ranked = df.withColumn("__rk__", F.row_number().over(w))
    quota_map = F.create_map(*[F.lit(x) for kv in quotas.items() for x in kv])
    return (
        ranked.filter(F.col("__rk__") <= quota_map[F.col(target_col)])
        .drop("__rk__")
    )


def ts_truncate_trailing(
    df: DataFrame, ts_col: str, groups: list[str], window_seconds: int
) -> DataFrame:
    """Keep each entity's trailing time window
    (sample_utils.py:155-332 trailing-window truncation)."""
    w = Window.partitionBy(*groups)
    max_us = F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
    keep = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        > max_us - F.lit(window_seconds).cast("long") * 1_000_000
    )
    return (
        df.withColumn("__keep__", keep)
        .filter(F.col("__keep__"))
        .drop("__keep__")
    )
