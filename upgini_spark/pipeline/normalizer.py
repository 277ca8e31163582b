"""Schema normalization pipeline (reference: src/upgini/normalizer/
normalize_utils.py:52-242 + src/upgini/utils/features_validator.py).

Everything here is metadata ops + native expressions:
- deterministic column renaming ``name → f"{lower_sanitized}_{sha256[:6]}"``
  (normalize_utils.py:95-140,229-242);
- type coercions: bool→string (:169-176), float16→float64 (:178-185),
  decimal-comma strings→double (:187-195), non-numeric features→string
  (:220-226);
- string truncation to 24 573 chars (:158-167);
- datetime-typed feature columns dropped (:147-156) — dates are only
  legal as search keys;
- constant / high-cardinality feature drops (features_validator.py:25-91).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

MAX_STRING_FEATURE_LENGTH = 24_573  # normalize_utils.py:36


def hash_column_name(name: str) -> str:
    """``name → lower_sanitized + "_" + sha256(name)[:6]``
    (normalize_utils.py:95-140)."""
    sanitized = re.sub(r"[^a-z0-9]", "_", name.lower())
    digest = hashlib.sha256(name.encode()).hexdigest()[:6]
    return f"{sanitized}_{digest}"


def rename_columns_hashed(df: DataFrame, exclude: set[str] | None = None) -> tuple[DataFrame, dict[str, str]]:
    """Pure-metadata rename; returns (df, original→new map)."""
    exclude = exclude or set()
    mapping = {
        c: (c if c in exclude else hash_column_name(c)) for c in df.columns
    }
    return df.toDF(*[mapping[c] for c in df.columns]), mapping


def normalize_types(
    df: DataFrame,
    feature_cols: list[str],
    decimal_comma_cols: list[str] | None = None,
) -> DataFrame:
    """Apply the reference's type floor to feature columns."""
    exprs = []
    for fld in df.schema.fields:
        c = F.col(fld.name)
        if fld.name not in feature_cols:
            exprs.append(c)
            continue
        if isinstance(fld.dataType, BooleanType):
            exprs.append(c.cast("string").alias(fld.name))
        elif fld.name in (decimal_comma_cols or []):
            exprs.append(
                F.regexp_replace(c.cast("string"), ",", ".").cast("double").alias(fld.name)
            )
        elif isinstance(fld.dataType, StringType):
            exprs.append(F.substring(c, 1, MAX_STRING_FEATURE_LENGTH).alias(fld.name))
        elif isinstance(fld.dataType, NumericType):
            exprs.append(c.cast("double").alias(fld.name))
        else:
            exprs.append(c.cast("string").alias(fld.name))
    return df.select(*exprs)


def drop_datetime_features(df: DataFrame, feature_cols: list[str]) -> tuple[DataFrame, list[str]]:
    """Datetime-typed feature columns are dropped entirely
    (normalize_utils.py:147-156)."""
    dropped = [
        f.name for f in df.schema.fields
        if f.name in feature_cols
        and isinstance(f.dataType, (TimestampType, TimestampNTZType, DateType))
    ]
    return df.drop(*dropped), dropped


def detect_decimal_comma(df: DataFrame, feature_cols: list[str], probe_rows: int = 10) -> list[str]:
    """Decimal-comma probe on a head sample (utils/__init__.py:16-25):
    string columns where every non-null probe value matches ``-?\\d+,\\d+``."""
    string_cols = [
        f.name for f in df.schema.fields
        if f.name in feature_cols and isinstance(f.dataType, StringType)
    ]
    if not string_cols:
        return []
    head = df.select(string_cols).limit(probe_rows).collect()
    out = []
    pat = re.compile(r"^-?\d+,\d+$")
    for c in string_cols:
        vals = [r[c] for r in head if r[c] is not None]
        if vals and all(pat.match(v) for v in vals):
            out.append(c)
    return out


def validate_features(
    df: DataFrame,
    feature_cols: list[str],
    high_card_threshold: float = 0.85,
    top_share_threshold: float = 0.99,
    exact: bool = False,
) -> tuple[DataFrame, dict[str, str]]:
    """Drop constant and high-cardinality features
    (features_validator.py:25-91). One aggregation pass over all columns
    (approx_count_distinct at scale; exact opt-in)."""
    if not feature_cols:
        return df, {}
    cnt_fn = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in feature_cols:
        aggs.append(cnt_fn(F.col(c)).alias(f"nd__{c}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n__"] or 1
    dropped: dict[str, str] = {}
    for c in feature_cols:
        nd = row[f"nd__{c}"]
        if nd is not None and nd <= 1:
            dropped[c] = "constant"
        elif nd is not None and nd / n >= high_card_threshold:
            f_type = dict(df.dtypes)[c]
            if f_type in ("string",) or f_type.startswith("varchar"):
                dropped[c] = "high_cardinality"
    return df.drop(*dropped.keys()), dropped
