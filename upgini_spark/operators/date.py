"""Date operators (reference: src/upgini/autofe/date.py) + cyclical
features (src/upgini/utils/datetime_utils.py:184-252).

All native expressions: datediff / higher-order array functions for the
date-list aggregates; sin/cos for cyclical encodings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_PI = 6.283185307179586


def date_diff(a: Column, b: Column, unit: str = "D", replace_negative: bool = False) -> Column:
    """(date(a) − date(b)) in days or years; optional negative→null
    (date.py:47-79; time-of-day dropped via .dt.date at date.py:73)."""
    if unit == "D":
        d = F.datediff(F.to_date(a), F.to_date(b)).cast("double")
    elif unit == "Y":
        # reference: (timedelta / 365 / ... ).astype(int) — trunc toward 0
        days = F.datediff(F.to_date(a), F.to_date(b)).cast("double") / 365.0
        d = F.when(days >= 0, F.floor(days)).otherwise(-F.floor(-days)).cast("double")
    else:
        raise ValueError(f"unsupported diff unit {unit!r}")
    if replace_negative:
        d = F.when(d >= 0, d)
    return d


def date_diff_type2(a: Column, b: Column) -> Column:
    """Days until the next anniversary of b, relative to a (date.py:82-109).

    The day-of-month is clamped to the target month's length (Feb 29 → Feb 28
    in non-leap years), matching pandas ``DateOffset`` rollback; the naive
    ``make_date(year(a), month(b), day(b))`` throws under ANSI mode when b is
    Feb 29 and year(a) is non-leap.
    """
    a_d, b_d = F.to_date(a), F.to_date(b)

    month_start = F.make_date(F.year(a_d), F.month(b_d), F.lit(1))
    day = F.least(F.dayofmonth(b_d), F.dayofmonth(F.last_day(month_start)))
    this_year = F.make_date(F.year(a_d), F.month(b_d), day)
    # +1 year from the ALREADY-ROLLED date (pandas applies DateOffset(years=1)
    # to `future`, so Feb 28 stays Feb 28 even entering a leap year);
    # add_months preserves day-of-month and clamps on overflow, same rule.
    anniversary = F.when(this_year < a_d, F.add_months(this_year, 12)).otherwise(this_year)
    return F.datediff(anniversary, a_d).cast("double")


_LIST_AGGS = ("min", "max", "mean", "nunique", "count")


def _agg_diffs(diffs: Column, agg: str, empty_zero: bool) -> Column:
    if agg == "min":
        e = F.array_min(diffs).cast("double")
    elif agg == "max":
        e = F.array_max(diffs).cast("double")
    elif agg == "mean":
        e = F.when(
            F.size(diffs) > 0,
            F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v) / F.size(diffs),
        )
    elif agg == "nunique":
        e = F.size(F.array_distinct(diffs)).cast("double")
    elif agg == "count":
        e = F.size(diffs).cast("double")
    else:
        raise ValueError(f"unsupported list agg {agg!r}")
    if agg in ("nunique", "count") and empty_zero:
        return F.coalesce(e, F.lit(0.0))
    return e


def date_list_diff(a: Column, dates: Column, agg: str) -> Column:
    """a − each element of array<date> b, aggregated (date.py:112-184);
    count-ish aggs are 0 on empty lists."""
    diffs = F.transform(dates, lambda x: F.datediff(F.to_date(a), F.to_date(x)))
    return _agg_diffs(diffs, agg, empty_zero=True)


def date_list_diff_bounded(
    a: Column, dates: Column, agg: str, lo: float | None = None, hi: float | None = None,
    normalize: bool = False, unit: str = "D",
) -> Column:
    """Filter diffs into [lo, hi) before aggregating (date.py:187-242);
    ``_norm`` divides by the original list length. ``unit='Y'`` converts
    each diff to trunc(days/365) years BEFORE bounding (reference
    _convert_diff_to_unit, date.py:38-41: ``(diff/365/…).astype(int)`` —
    the age-bucket features like date_diff_Y_18_23_count)."""
    diffs = F.transform(dates, lambda x: F.datediff(F.to_date(a), F.to_date(x)))
    if unit == "Y":
        # cast truncates toward zero, matching numpy astype(int)
        diffs = F.transform(diffs, lambda d: (d / 365).cast("int"))
    elif unit != "D":
        raise ValueError(f"unsupported diff unit {unit!r}")
    cond = lambda d: F.lit(True)  # noqa: E731
    if lo is not None and hi is not None:
        cond = lambda d: (d >= F.lit(lo)) & (d < F.lit(hi))  # noqa: E731
    elif lo is not None:
        cond = lambda d: d >= F.lit(lo)  # noqa: E731
    elif hi is not None:
        cond = lambda d: d < F.lit(hi)  # noqa: E731
    filtered = F.filter(diffs, cond)
    out = _agg_diffs(filtered, agg, empty_zero=True)
    if normalize:
        # reference divides only when the ORIGINAL list is non-empty
        # (date.py:231-235: `if self.normalize and orig_len > 0`), so an
        # empty list keeps the raw agg (0 for count-ish, NaN otherwise)
        out = F.when(F.size(dates) > 0, out / F.size(dates)).otherwise(out)
    return out


def date_percentile(
    c: Column,
    bounds: list[float],
    date: Column | None = None,
    zero_year: int | None = None,
    zero_month: int | None = None,
    step: int = 30,
) -> Column:
    """DatePercentile (date.py:289-323): bucket = #(shifted bounds <= x),
    where each row's bounds are the fit-time ``zero_bounds`` shifted by
    ``month_diff * step`` with month_diff = 12·(year − zero_year) +
    (month − zero_month) of the row's date. No bound hit → null (the
    reference's _perc returns NaN, NOT bucket 0 — test_percentile.py:
    f=2 in month_diff=1 → None; f=32 vs [...31.4, 32.0...] → 51,
    i.e. >= semantics, boundary counts)."""
    x = c.cast("double")
    if date is not None:
        d = F.to_date(date)
        diff = (
            (F.year(d) - F.lit(zero_year or 0)) * 12
            + (F.month(d) - F.lit(zero_month or 0))
        ).cast("double")
        shift = diff * F.lit(float(step))
    else:
        shift = F.lit(0.0)
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    cnt = F.size(F.filter(arr, lambda b: x >= b + shift))
    return F.when(x.isNull() | (cnt <= 0), F.lit(None).cast("int")).otherwise(cnt)


def cyclical_features(ts: Column, intraday: bool = False) -> dict[str, Column]:
    """sin/cos of day-in-quarter (variable period = days in that quarter),
    plus intraday second/minute/half-hour/hour encodings when time-of-day
    is present (datetime_utils.py:184-252)."""
    d = F.to_date(ts)
    q_start = F.trunc(d, "quarter")
    q_end = F.add_months(q_start, 3)
    days_in_q = F.datediff(q_end, q_start).cast("double")
    day_in_q = (F.datediff(d, q_start) + 1).cast("double")
    # names are the reference's EXACT generated-feature names
    # (datetime_utils.py:184-240: f"datetime_{column}_{sin|cos}{_period}",
    # day_in_quarter carries no period suffix) — the hashed renames in
    # expected_prepared*.parquet derive from these strings, so parity of
    # the NAME matters as much as the value
    out = {
        "datetime_day_in_quarter_sin": F.sin(F.lit(TWO_PI) * day_in_q / days_in_q),
        "datetime_day_in_quarter_cos": F.cos(F.lit(TWO_PI) * day_in_q / days_in_q),
    }
    if intraday:
        for name, val, period in (
            ("second", F.second(ts), 60.0),
            ("minute", F.minute(ts), 60.0),
            ("minute", F.minute(ts), 30.0),
            ("hour", F.hour(ts), 24.0),
        ):
            v = val.cast("double")
            p = int(period)
            out[f"datetime_{name}_sin_{p}"] = F.sin(F.lit(TWO_PI) * v / F.lit(period))
            out[f"datetime_{name}_cos_{p}"] = F.cos(F.lit(TWO_PI) * v / F.lit(period))
    return out
