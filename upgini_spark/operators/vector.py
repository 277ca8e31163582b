"""Vector (multi-column) operators (reference: src/upgini/autofe/vector.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mean(cols: list[Column]) -> Column:
    """Row-wise mean across columns, nulls as 0 (vector.py:8-17)."""
    s = sum((F.coalesce(c.cast("double"), F.lit(0.0)) for c in cols), F.lit(0.0))
    return s / F.lit(float(len(cols)))


def sum_(cols: list[Column]) -> Column:
    """Row-wise sum, nulls as 0 (vector.py:19-25)."""
    return sum((F.coalesce(c.cast("double"), F.lit(0.0)) for c in cols), F.lit(0.0))


def vectorize(cols: list[Column]) -> Column:
    """Pack N columns into an array cell (vector.py:27-33)."""
    return F.array(*[c.cast("double") for c in cols])
