"""Unary scalar operators (reference: src/upgini/autofe/unary.py).

All emit native Spark Column expressions (whole-stage codegen). The
reference truncates (not rounds) some results to 10 decimal places via
``_round_value`` (src/upgini/autofe/operator.py:162-172) — reproduced by
sign-aware truncation in :func:`trunc10`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def trunc10(c: Column, digits: int = 10) -> Column:
    """Truncate toward zero at ``digits`` decimals (operator.py:162-172)."""
    m = float(10**digits)
    scaled = c * m
    return (
        F.when(scaled >= 0, F.floor(scaled)).otherwise(-F.floor(-scaled)) / m
    )


def abs_(c: Column) -> Column:  # unary.py:10-21
    return F.abs(c.cast("double"))


def log_(c: Column) -> Column:
    """ln(abs(x)), x=0 → null, truncated to 10 dp (unary.py:23-35)."""
    x = c.cast("double")
    return trunc10(F.log(F.abs(F.when(x != 0, x))))


def sqrt_(c: Column) -> Column:  # unary.py:37-49
    return trunc10(F.sqrt(F.abs(c.cast("double"))))


def square_(c: Column) -> Column:  # unary.py:51-62
    return F.pow(c.cast("double"), 2)


def sigmoid_(c: Column) -> Column:  # unary.py:64-76
    return trunc10(F.lit(1.0) / (F.lit(1.0) + F.exp(-c.cast("double"))))


def floor_(c: Column) -> Column:  # unary.py:78-91
    return F.floor(c.cast("double")).cast("double")


def residual_(c: Column) -> Column:  # unary.py:93-104
    x = c.cast("double")
    return x - F.floor(x)


def freq_(c: Column, total: float | None = None) -> Column:
    """Global relative frequency of the value (unary.py:107-116);
    null values get null (reference excludes NaN).

    ``total`` is the fit-time row count (like :func:`norm_`'s learned
    param). Passing it keeps the plan fully distributed: the per-value
    count is a ``partitionBy(value)`` window (parallel shuffle); a
    ``count() OVER ()`` denominator would be an ``Exchange
    SinglePartition`` — every row through one task — so total=None
    (legacy) is refused rather than silently planting the scale-killer.
    """
    if total is None:
        raise ValueError(
            "freq_ needs the fit-time total row count (df.count()); "
            "a global-window denominator would single-partition the job"
        )
    cnt = F.count(F.when(c.isNotNull(), 1)).over(Window.partitionBy(c))
    return F.when(c.isNotNull(), cnt.cast("double") / F.lit(float(total)))


def norm_(c: Column, norm_value: float) -> Column:
    """L2 normalize by a fit-time learned norm (unary.py:119-148);
    fit computes sqrt(sum(x^2)) as an aggregate, replayed via the param."""
    return c.cast("double") / F.lit(float(norm_value))


def bin_(c: Column, bounds: list[float]) -> Column:
    """Bucket index by learned ascending bounds (unary.py:158-190):
    result = #bounds <= x; null, empty bounds, AND below-all-bounds all
    → -1 (the reference's _bin returns NaN on no hit and fillna(-1)s —
    tests/autofe/test_bin.py:test_bin_out_of_bounds: -10 vs [0, 50] → -1)."""
    x = c.cast("double")
    if not bounds:
        return F.lit(-1)
    expr = F.lit(0)
    for b in bounds:
        expr = expr + F.when(x >= F.lit(float(b)), 1).otherwise(0)
    return F.when(x.isNull() | (expr == 0), F.lit(-1)).otherwise(expr)
