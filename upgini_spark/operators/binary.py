"""Binary scalar operators (reference: src/upgini/autofe/binary.py).

Vector distance/similarity work on ``array<double>`` cells with native
higher-order functions (zip_with / aggregate) — no Python in the hot path.
String similarity: normalized Levenshtein is native; Jaro-Winkler is a
vectorized pandas UDF (no per-row Python loop, unlike the reference's
binary.py:174-238 row loop).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window


def min_(a: Column, b: Column) -> Column:  # binary.py:12-20
    return F.least(a, b)


def max_(a: Column, b: Column) -> Column:  # binary.py:21-29
    return F.greatest(a, b)


def add(a: Column, b: Column) -> Column:  # binary.py:32-44
    return a.cast("double") + b.cast("double")


def subtract(a: Column, b: Column) -> Column:
    return a.cast("double") - b.cast("double")


def multiply(a: Column, b: Column) -> Column:
    return a.cast("double") * b.cast("double")


def divide(a: Column, b: Column) -> Column:
    """a / b with zero divisor → null (binary.py:88-105)."""
    return a.cast("double") / F.when(b.cast("double") != 0, b.cast("double"))


def combine(a: Column, b: Column) -> Column:
    """str(a) + "_" + str(b); null if either side null (binary.py:108-117)."""
    return F.when(
        a.isNotNull() & b.isNotNull(),
        F.concat_ws("_", a.cast("string"), b.cast("string")),
    )


def combine_then_freq(a: Column, b: Column, total: float | None = None) -> Column:
    """Frequency of the combined value (binary.py:120-133). The reference
    body is missing its ``return`` (latent bug); its tests define intent as
    the relative frequency — we implement the intent.

    ``total`` is the fit-time row count (see unary.freq_): required, so the
    denominator never becomes a single-partition global window."""
    if total is None:
        raise ValueError(
            "combine_then_freq needs the fit-time total row count (df.count())"
        )
    c = combine(a, b)
    cnt = F.count(F.when(c.isNotNull(), 1)).over(Window.partitionBy(c))
    return F.when(c.isNotNull(), cnt.cast("double") / F.lit(float(total)))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """sim = cos(a, b) over array<double> cells (binary.py:155-171)."""
    denom = _norm2(a) * _norm2(b)
    return F.when(denom != 0, _dot(a, b) / denom)


def distance(a: Column, b: Column) -> Column:
    """dist = 1 − cosine (binary.py:136-152)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def sim_levenshtein(a: Column, b: Column) -> Column:
    """1 − levenshtein/max_len — native (binary.py:214-238 does a Python
    loop; Spark's levenshtein is JVM-side)."""
    ml = F.greatest(F.length(a), F.length(b))
    sim = F.when(ml > 0, F.lit(1.0) - F.levenshtein(a, b) / ml).otherwise(F.lit(1.0))
    return F.when(a.isNotNull() & b.isNotNull(), sim)


def _jaro_winkler(s1: str, s2: str) -> float:
    """Plain-Python Jaro-Winkler (public algorithm), driven vectorized."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - match_window), min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / len1 + matches / len2 + (matches - t) / matches) / 3
    prefix = 0
    for a_ch, b_ch in zip(s1, s2):
        if a_ch == b_ch and prefix < 4:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1 - jaro)


@F.pandas_udf(DoubleType())
def sim_jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized Jaro-Winkler similarity (binary.py:174-199).

    The INNER loop is per-pair Python inside the Arrow-batched UDF — the
    one remaining Python inner loop reachable from a formula. Deliberate:
    no vectorized JW exists in this container (numpy can't express the
    match-window scan; the reference runs the same per-row loop), and the
    Arrow batching amortizes transfer. If the environment ever grows
    `rapidfuzz`, swap the kernel for
    ``rapidfuzz.process.cpdist(a, b, scorer=JaroWinkler.similarity)``."""
    out = []
    for x, y in zip(a, b):
        if x is None or y is None or (isinstance(x, float) and pd.isna(x)) or (
            isinstance(y, float) and pd.isna(y)
        ):
            out.append(None)
        else:
            out.append(_jaro_winkler(str(x), str(y)))
    return pd.Series(out, dtype="float64")


def sim_jaro_winkler_reversed(a: Column, b: Column) -> Column:
    """Jaro-Winkler on reversed strings (binary.py:202-211, sim_jw2)."""
    return sim_jaro_winkler(F.reverse(a), F.reverse(b))
