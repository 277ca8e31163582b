"""Property-based as-of join testing (hypothesis): random event/feature
sets, both engines must equal pandas merge_asof — beyond the reference's
test strategy (it has no randomized testing; SURVEY.md §5)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from upgini_spark.joins.asof import asof_join

BASE = dt.datetime(2024, 1, 1)


def _events(draw_entities, draw_offsets):
    return [
        (f"e{e}", BASE + dt.timedelta(seconds=int(off)))
        for e, off in zip(draw_entities, draw_offsets)
    ]


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(2, 25))
    n_right = draw(st.integers(0, 25))
    left_entities = draw(
        st.lists(st.integers(0, 4), min_size=n_left, max_size=n_left)
    )
    left_offsets = draw(
        st.lists(st.integers(0, 10_000), min_size=n_left, max_size=n_left)
    )
    right_entities = draw(
        st.lists(st.integers(0, 4), min_size=n_right, max_size=n_right)
    )
    right_offsets = draw(
        st.lists(st.integers(0, 10_000), min_size=n_right, max_size=n_right,
                 unique=True)  # unique right ts: merge_asof tie rule is
                               # order-dependent otherwise
    )
    direction = draw(st.sampled_from(["backward", "forward"]))
    tolerance = draw(st.sampled_from([None, 600, 3600]))
    return left_entities, left_offsets, right_entities, right_offsets, direction, tolerance


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=asof_case())
def test_asof_matches_merge_asof(spark, case):
    le, lo, re_, ro, direction, tolerance = case
    left_rows = [
        (i, f"e{e}", BASE + dt.timedelta(seconds=int(off)))
        for i, (e, off) in enumerate(zip(le, lo))
    ]
    right_rows = [
        (f"e{e}", BASE + dt.timedelta(seconds=int(off)), float(i))
        for i, (e, off) in enumerate(zip(re_, ro))
    ]
    left = spark.createDataFrame(left_rows, "rid int, ent string, ts timestamp")
    if right_rows:
        right = spark.createDataFrame(right_rows, "rent string, rts timestamp, val double")
    else:
        right = spark.createDataFrame([], "rent string, rts timestamp, val double")

    got = asof_join(
        left, right, left_on="ts", right_on="rts",
        by_left="ent", by_right="rent", direction=direction,
        tolerance_seconds=tolerance,
    ).toPandas().sort_values("rid").reset_index(drop=True)

    lp = pd.DataFrame(left_rows, columns=["rid", "ent", "ts"]).sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(right_rows, columns=["ent", "rts", "val"]).sort_values("rts", kind="mergesort")
    if rp.empty:
        exp = lp.assign(val=np.nan)
    else:
        exp = pd.merge_asof(
            lp, rp, left_on="ts", right_on="rts", by="ent",
            direction=direction,
            tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
        )
    exp = exp.sort_values("rid").reset_index(drop=True)
    np.testing.assert_allclose(
        got["val"].to_numpy(dtype=float), exp["val"].to_numpy(dtype=float),
        equal_nan=True,
    )
