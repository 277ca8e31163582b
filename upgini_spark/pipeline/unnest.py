"""Multi-key melt/unnest + one-hot decoding.

Reference:
- multiple same-type search keys are melted into one key column with a
  ``search_key_unnest`` provenance column, joined, then collapsed back by
  entity id (src/upgini/features_enricher.py:4450-4485, conversion
  :3836-3864);
- one-hot groups ``prefix+int`` where each column is ≥60% constant binary
  are collapsed into one categorical via the bit suffix
  (src/upgini/normalizer/one_hot_encoder.py:13-110).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SEARCH_KEY_UNNEST = "search_key_unnest"


def explode_multi_keys(
    df: DataFrame, key_cols: list[str], out_col: str
) -> DataFrame:
    """Melt N same-type key columns into one + provenance column.

    ``F.stack``-equivalent via explode(array(structs)); the original key
    columns are dropped; null keys keep their row (left semantics)."""
    pairs = F.array(*[
        F.struct(F.lit(c).alias(SEARCH_KEY_UNNEST), F.col(c).alias(out_col))
        for c in key_cols
    ])
    exploded = df.withColumn("__kv__", F.explode(pairs))
    return (
        exploded.select(
            *[c for c in df.columns if c not in key_cols],
            F.col(f"__kv__.{SEARCH_KEY_UNNEST}").alias(SEARCH_KEY_UNNEST),
            F.col(f"__kv__.{out_col}").alias(out_col),
        )
    )


def collapse_unnested(
    df: DataFrame, entity_col: str, order_col: str | None = None
) -> DataFrame:
    """Post-join collapse: one row per original entity, preferring rows
    whose exploded key actually matched (non-null enriched columns sort
    first via the order column)."""
    order = [F.col(order_col).asc()] if order_col else [F.col(SEARCH_KEY_UNNEST).asc()]
    w = Window.partitionBy(entity_col).orderBy(*order)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", SEARCH_KEY_UNNEST)
    )


def detect_one_hot_groups(
    df: DataFrame, sample_rows: int = 1000, min_binary_share: float = 0.6
) -> dict[str, list[str]]:
    """Detect ``prefix + int`` column groups that look one-hot encoded
    (one_hot_encoder.py:13-110): every member ≥``min_binary_share`` of
    non-null sampled values in {0,1}. Driver-side over a head sample."""
    groups: dict[str, list[str]] = {}
    pat = re.compile(r"^(.*?)(\d+)$")
    for c in df.columns:
        m = pat.match(c)
        if m and m.group(1):
            groups.setdefault(m.group(1), []).append(c)
    groups = {p: sorted(cols, key=lambda x: int(pat.match(x).group(2)))
              for p, cols in groups.items() if len(cols) >= 2}
    if not groups:
        return {}
    sample = df.select(*[c for cols in groups.values() for c in cols]).limit(sample_rows).collect()
    out = {}
    for prefix, cols in groups.items():
        ok = True
        for c in cols:
            vals = [r[c] for r in sample if r[c] is not None]
            if not vals:
                ok = False
                break
            binary = sum(1 for v in vals if str(v) in ("0", "1", "0.0", "1.0", "True", "False"))
            if binary / len(vals) < min_binary_share:
                ok = False
                break
        if ok:
            out[prefix] = cols
    return out


def decode_one_hot(df: DataFrame, prefix: str, cols: list[str], out_col: str | None = None) -> DataFrame:
    """Collapse a one-hot group to one categorical: the bit suffix of the
    hot column; multi-hot rows (pseudo groups) keep a joined string."""
    out_col = out_col or prefix.rstrip("_") or "one_hot_decoded"
    pat = re.compile(r"^(.*?)(\d+)$")
    hot = F.array_compact(F.array(*[
        F.when(F.col(c).cast("double") == 1.0, F.lit(pat.match(c).group(2)))
        for c in cols
    ]))
    return df.withColumn(
        out_col, F.when(F.size(hot) > 0, F.array_join(hot, "_"))
    ).drop(*cols)
