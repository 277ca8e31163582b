"""HTML report rendering (reference utils/display_utils.py:23-143):
cell typing/formatting, blank handling, long-string wrapping, fallback
print path, pandas-limit restoration."""

import math

import pandas as pd


def test_make_table_cell_typing():
    from upgini_spark.pipeline.display import make_table

    df = pd.DataFrame({
        "name": ["feat_a", "", "nan"],
        "shap": [0.123456, float("nan"), 0.5],
        "n": [10, 20, 30],
    })
    html = make_table(df)
    assert "<table class='upgini-df'>" in html
    assert "<th>name</th><th>shap</th><th>n</th>" in html
    assert "<td class='upgini-number'>0.1235</td>" in html  # float → 4dp
    assert "<td class='upgini-number'>10</td>" in html       # int plain
    assert "<td class='upgini-text'>feat_a</td>" in html
    # NaN float and empty/'nan' strings → &nbsp;
    assert html.count("&nbsp;") == 3


def test_make_table_wraps_long_unbroken_strings():
    from upgini_spark.pipeline.display import make_table

    long_token = "x" * 50
    spaced = "y " * 25
    df = pd.DataFrame({"v": [long_token, spaced.strip()]})
    html = make_table(df, wrap_long_string=20)
    assert "</br>" in html                      # unbroken string wrapped
    assert spaced.strip() in html               # spaced string untouched


def test_display_fallback_prints_and_returns_html(capsys):
    from upgini_spark.pipeline.display import display_html_dataframe

    df = pd.DataFrame({"a": [1.0]})
    internal = pd.DataFrame({"a": [2.0]})
    html = display_html_dataframe(df, internal, header="My report")
    out = capsys.readouterr().out
    assert "My report" in out and "2.0" in out  # prints the INTERNAL frame
    assert "<h2>My report</h2>" in html and "upgini-df" in html


def test_do_without_pandas_limits_restores():
    from upgini_spark.pipeline.display import do_without_pandas_limits

    pd.options.display.max_rows = 7
    seen = {}

    def probe():
        seen["rows"] = pd.options.display.max_rows
        raise ValueError("boom")

    try:
        do_without_pandas_limits(probe)
    except ValueError:
        pass
    assert seen["rows"] is None            # lifted inside
    assert pd.options.display.max_rows == 7  # restored even on raise
    pd.options.display.max_rows = 60


def test_features_info_renders():
    """End-to-end: a features_info frame renders with its display labels
    as headers."""
    from upgini_spark.pipeline.display import render_report_html
    from upgini_spark.pipeline.feature_info import (
        NAME_COL,
        FeatureMeta,
        build_features_info,
    )

    info, _, _ = build_features_info(
        [FeatureMeta("f1", shap_value=0.3, hit_rate=99.0)], None, set(), set()
    )
    html = render_report_html(info, "Relevant features")
    assert f"<th>{NAME_COL}</th>" in html
    assert "<h2>Relevant features</h2>" in html
