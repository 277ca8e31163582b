"""Distribution-stability and validation statistics.

- PSI (population stability index) — reference src/upgini/utils/psi.py:
  binned histograms per interval vs a base interval, Σ(p−q)·ln(p/q)
  (:180-181); we expose an equal-width variant (engine-portable bins) and
  a quantile variant (reference-faithful, approx_percentile edges).
- FeaturesValidator gates: constant / ≥99% top-share / ≥0.85 cardinality
  drops (src/upgini/utils/features_validator.py:25-91).
- Class-balance / imbalance detection (src/upgini/utils/target_utils.py:
  115-155: dedup'd min-class share < 0.6/k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-6


def psi_equal_width(
    df: DataFrame,
    value_col: str,
    split_col,
    n_bins: int = 10,
) -> DataFrame:
    """PSI between split=0 (base) and each other split, equal-width bins
    over the global [min, max]. Pure aggregates — two passes, no windows.

    ``split_col`` is a Column evaluating to an integer interval id
    (0 = base interval, per psi.py base-interval convention).
    """
    d = df.select(F.col(value_col).alias("v"), split_col.cast("int").alias("split"))
    rng = d.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = float(rng["lo"]), float(rng["hi"])
    width = (hi - lo) / n_bins or 1.0
    bin_expr = F.least(
        F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(n_bins - 1),
    )
    counts = (
        d.withColumn("bin", bin_expr)
        .groupBy("split", "bin")
        .count()
    )
    totals = counts.groupBy("split").agg(F.sum("count").alias("total"))
    shares = counts.join(totals, "split").select(
        "split", "bin", (F.col("count") / F.col("total")).alias("share")
    )
    base = shares.filter(F.col("split") == 0).select(
        "bin", F.col("share").alias("base_share")
    )
    rest = shares.filter(F.col("split") != 0)
    joined = rest.join(base, "bin", "full").select(
        F.coalesce(F.col("split"), F.lit(-1)).alias("split"),
        (F.coalesce(F.col("share"), F.lit(0.0)) + EPS).alias("p"),
        (F.coalesce(F.col("base_share"), F.lit(0.0)) + EPS).alias("q"),
    ).filter(F.col("split") >= 0)
    return joined.groupBy("split").agg(
        F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6).alias("psi")
    )


def class_balance(df: DataFrame, target_col: str) -> DataFrame:
    """Per-class counts + share + imbalance flag
    (target_utils.py:115-155: imbalanced iff min share < 0.6/k)."""
    counts = df.groupBy(target_col).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    k = counts.count()
    return counts.select(
        F.col(target_col),
        F.col("n"),
        F.round(F.col("n") / F.lit(float(total)), 6).alias("share"),
        (F.col("n") / F.lit(float(total)) < F.lit(0.6 / k)).alias("is_minor"),
    )


def feature_validator_stats(
    df: DataFrame, feature_cols: list[str],
    high_card_threshold: float = 0.85,
    top_share_threshold: float = 0.99,
) -> DataFrame:
    """Per-column: distinct count, top-value share, and the drop decisions
    (features_validator.py:25-91). Exact counts (the engine uses
    approx_count_distinct at scale; exact here for oracle parity)."""
    n = df.count()
    parts = []
    for c in feature_cols:
        top = (
            df.groupBy(F.col(c).cast("string").alias("v"))
            .count()
            .agg(F.max("count").alias("top_n"))
        )
        stats = df.agg(
            F.countDistinct(F.col(c)).alias("n_distinct"),
        )
        parts.append(
            stats.crossJoin(top).select(
                F.lit(c).alias("column_name"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                F.round(F.col("top_n") / F.lit(float(n)), 6).alias("top_share"),
                (F.col("n_distinct") <= 1).alias("drop_constant"),
                (F.col("n_distinct") / F.lit(float(n)) >= high_card_threshold).alias(
                    "drop_high_card"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
