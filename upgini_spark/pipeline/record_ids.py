"""System record ids + the deterministic fit sort.

Reference semantics (src/upgini/features_enricher.py:4488-4595 and
src/upgini/utils/sort.py:16-61): rows are sorted by [date column, row-hash
of (sorted search keys + ranked feature columns)], per eval-set segment,
then numbered. Spark has no implicit row order, so every ordered semantic
gets an explicit total order: (date, hash, tie-break hash of all columns).

The row-hash here is md5 of the concatenated normalized values — chosen
over xxhash64 because it is reproducible in ANSI SQL (DuckDB oracle
parity), while remaining deterministic and uniform. Ids are dense
row_numbers per eval segment, exactly like the reference's reset_index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from upgini_spark.joins.enrich import EVAL_SET_INDEX, SYSTEM_RECORD_ID


def row_hash(cols: list[str], sep: str = "\x1f") -> F.Column:
    """Deterministic, engine-portable row hash (md5 hex of joined values)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    return F.md5(F.concat_ws(sep, *parts))


def add_system_record_id(
    df: DataFrame,
    sort_date_col: str | None,
    hash_cols: list[str],
    out_col: str = SYSTEM_RECORD_ID,
    per_eval_segment: bool = True,
) -> DataFrame:
    """Assign order-defining ids after the deterministic sort.

    Mirrors _add_fit_system_record_id (features_enricher.py:4488-4595):
    order by [date, row-hash], numbered per eval_set_index segment when the
    column is present.
    """
    h = row_hash(hash_cols)
    order = ([F.col(sort_date_col).asc_nulls_last()] if sort_date_col else []) + [h.asc()]
    if per_eval_segment and EVAL_SET_INDEX in df.columns:
        w = Window.partitionBy(EVAL_SET_INDEX).orderBy(*order)
    else:
        w = Window.partitionBy().orderBy(*order)
    return df.withColumn(out_col, F.row_number().over(w))
