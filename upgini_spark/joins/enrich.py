"""Enrichment equi-join on entity record ids.

Mirrors the reference's final merge of input rows with downloaded feature
rows on ENTITY_SYSTEM_RECORD_ID (src/upgini/features_enricher.py:4630-4698,
merge at :4680-4685): left join, input columns first, feature columns
appended, system ids dropped. The small feature side is broadcast when it
fits (Catalyst/AQE decides; we hint when we know it is dimension-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENTITY_SYSTEM_RECORD_ID = "entity_system_record_id"
SYSTEM_RECORD_ID = "system_record_id"
EVAL_SET_INDEX = "eval_set_index"


def add_entity_record_id(
    df: DataFrame,
    key_cols: list[str],
    feature_cols: list[str] | None = None,
    out_col: str = ENTITY_SYSTEM_RECORD_ID,
) -> DataFrame:
    """Deterministic entity id = hash of (sorted keys + features).

    The reference hashes with pandas' hash_pandas_object
    (src/upgini/features_enricher.py:2906-2910); we use ``xxhash64`` — a
    different hash family by design (SURVEY.md §1.3): parity is defined on
    feature *values*, the id only needs determinism + uniformity.
    """
    cols = sorted(key_cols) + sorted(feature_cols or [])
    return df.withColumn(out_col, F.xxhash64(*[F.col(c) for c in cols]))


def enrich(
    left: DataFrame,
    features: DataFrame,
    on: str = ENTITY_SYSTEM_RECORD_ID,
    how: str = "left",
    broadcast_features: bool = False,
) -> DataFrame:
    """Left/inner enrichment join; drops the join id from the feature side."""
    fcols = [c for c in features.columns if c != on]
    clash = set(fcols) & set(left.columns)
    if clash:
        raise ValueError(f"feature columns clash with input: {sorted(clash)}")
    right = F.broadcast(features) if broadcast_features else features
    return left.join(right, on=on, how=how)


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "left",
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Interval/range enrichment (SearchKey.IP_RANGE_*, reference
    metadata.py:75-92 — server-side there, modeled here): attach the range
    row whose [lo, hi] contains the value. Small range tables broadcast
    (the IP-geo case); large ones rely on AQE. Assumes non-overlapping
    ranges (IP allocations)."""
    r = F.broadcast(ranges) if broadcast_ranges else ranges
    cond = (left[value_col] >= r[lo_col]) & (left[value_col] <= r[hi_col])
    return left.join(r, on=cond, how=how)
