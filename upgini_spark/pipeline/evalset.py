"""Eval-set combination, target correction, key-validity filtering and
hit-rate reporting.

Reference:
- train + eval pairs concatenate with an ``eval_set_index`` column
  (0 = train; OOT eval rows have all-null target)
  — features_enricher.py:2483-2501;
- target correction: non-numeric targets NaN-coerce when <5% bad, else
  singleton classes NaN-out — features_enricher.py:4597-4613;
- key-validity row filter + per-column validity stats
  — dataset.py:272-428;
- enrichment hit-rate reporting — metadata.py:308-314.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from upgini_spark.joins.enrich import EVAL_SET_INDEX


def combine_train_eval(
    train: DataFrame, evals: list[DataFrame], target_col: str | None = None,
    oot_indices: set[int] | None = None,
) -> DataFrame:
    """Union train + eval frames with eval_set_index (0 = train). Frames in
    ``oot_indices`` (1-based) get their target nulled (OOT discipline)."""
    parts = [train.withColumn(EVAL_SET_INDEX, F.lit(0).cast("int"))]
    for i, ev in enumerate(evals, start=1):
        p = ev.withColumn(EVAL_SET_INDEX, F.lit(i).cast("int"))
        if target_col and oot_indices and i in oot_indices:
            p = p.withColumn(target_col, F.lit(None).cast(dict(ev.dtypes)[target_col]))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def correct_target(
    df: DataFrame, target_col: str, bad_share_threshold: float = 0.05
) -> DataFrame:
    """Non-numeric target correction (features_enricher.py:4597-4613):
    if <threshold of values fail numeric coercion → coerce (bad → null);
    otherwise treat as categorical and null-out singleton classes."""
    as_num = F.col(target_col).try_cast("double")  # ANSI-safe coercion
    stats = df.agg(
        F.avg((as_num.isNull() & F.col(target_col).isNotNull()).cast("double")).alias("bad"),
    ).collect()[0]
    bad_share = stats["bad"] or 0.0
    if bad_share < bad_share_threshold:
        return df.withColumn(target_col + "_corrected", as_num)
    cls_n = F.count(F.lit(1)).over(Window.partitionBy(target_col))
    return df.withColumn(
        target_col + "_corrected",
        F.when(cls_n > 1, F.col(target_col)),
    )


def filter_invalid_keys(
    df: DataFrame, key_valid_flags: dict[str, F.Column]
) -> tuple[DataFrame, DataFrame]:
    """Drop rows where ALL search keys are invalid (dataset.py:272-428).
    Returns (filtered df, per-key validity stats frame)."""
    any_valid = None
    for flag in key_valid_flags.values():
        any_valid = flag if any_valid is None else (any_valid | flag)
    stats = df.agg(
        *[
            F.round(F.avg(flag.cast("double")), 6).alias(f"valid_share__{k}")
            for k, flag in key_valid_flags.items()
        ],
        F.count(F.lit(1)).alias("total_rows"),
    )
    return df.filter(any_valid), stats


def hit_rate_report(
    enriched: DataFrame, match_indicator_col: str, by: list[str] | None = None
) -> DataFrame:
    """Share of rows with an enrichment match (metadata.py:308-314),
    overall or per segment."""
    hit = F.col(match_indicator_col).isNotNull().cast("double")
    if by:
        return enriched.groupBy(*by).agg(
            F.count(F.lit(1)).alias("rows"),
            F.round(F.avg(hit), 6).alias("hit_rate"),
        )
    return enriched.agg(
        F.count(F.lit(1)).alias("rows"), F.round(F.avg(hit), 6).alias("hit_rate")
    )
