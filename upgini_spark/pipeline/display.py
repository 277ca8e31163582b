"""HTML rendering of the report frames — the notebook-facing last mile.

Reference: src/upgini/utils/display_utils.py:23-143 (make_table cell
typing/formatting, the styled container with zebra rows, the
plain-print fallback when IPython is absent). REST-driven pieces
(download-PDF button, quote button, progress bars) are out of scope by
architecture. Rendering is driver-side string assembly over the small
pandas report frames."""

from __future__ import annotations

import math
import textwrap
from collections.abc import Callable

import pandas as pd

TABLE_CLASS = "upgini-df"
NUM_CLASS = "upgini-number"
TEXT_CLASS = "upgini-text"

_STYLE = f"""<style>
.{TABLE_CLASS} thead th {{ font-weight: bold; text-align: center; padding: 0.5em; border-bottom: 2px solid black; }}
.{TABLE_CLASS} tbody td {{ padding: 0.5em; color: black; }}
.{TABLE_CLASS} tbody tr:nth-child(odd) {{ background-color: #ffffff; }}
.{TABLE_CLASS} tbody tr:nth-child(even) {{ background-color: #f2f2f2; }}
.{TEXT_CLASS} {{ text-align: left; }}
.{NUM_CLASS} {{ text-align: center; }}
</style>"""


def _format_cell(value, wrap_long_string: int | None) -> str:
    """One <td>: floats display at 4dp (non-finite → blank), ints plain,
    everything else as left-aligned text with optional hard wrapping of
    long unbroken strings (display_utils.py:44-61 cell typing)."""
    if isinstance(value, float):
        shown = "&nbsp;" if not math.isfinite(value) else f"{value:.4f}"
        return f"<td class='{NUM_CLASS}'>{shown}</td>"
    if isinstance(value, int):
        return f"<td class='{NUM_CLASS}'>{value}</td>"
    text = value
    if text is None or (isinstance(text, str) and (not text or text == "nan")):
        text = "&nbsp;"
    elif (
        wrap_long_string is not None
        and isinstance(text, str)
        and len(text) > wrap_long_string
        and " " not in text
    ):
        text = "</br>".join(textwrap.wrap(text, wrap_long_string))
    return f"<td class='{TEXT_CLASS}'>{text}</td>"


def make_table(df: pd.DataFrame, wrap_long_string: int | None = None) -> str:
    """The report table as an HTML string (class-tagged cells so the
    shared stylesheet applies)."""
    head = "".join(f"<th>{c}</th>" for c in df.columns)
    body = "".join(
        "<tr>" + "".join(_format_cell(v, wrap_long_string) for v in row) + "</tr>"
        for row in df.itertuples(index=False)
    )
    return (
        f"<table class='{TABLE_CLASS}'><thead>{head}</thead>"
        f"<tbody>{body}</tbody></table>"
    )


def render_report_html(df: pd.DataFrame, header: str) -> str:
    """Full styled report block (stylesheet + header + table) — what the
    notebook path displays (display_utils.py:104-139)."""
    return (
        f"{_STYLE}\n<h2>{header}</h2>\n"
        f"<div style='width: fit-content;'>{make_table(df)}</div>"
    )


def _ipython_display():
    try:
        from IPython.display import HTML, display  # noqa: F401

        get_ipython  # type: ignore[name-defined]  # noqa: B018
        return HTML, display
    except Exception:
        return None


def display_html_dataframe(
    df: pd.DataFrame, internal_df: pd.DataFrame | None = None, header: str = ""
):
    """Render in a notebook when IPython is live; otherwise print the
    plain (link-free) frame — the reference's exact fallback ladder
    (display_utils.py:75-82). Returns the HTML string either way so
    callers/tests can capture it."""
    html = render_report_html(df, header)
    ipy = _ipython_display()
    if ipy is None:
        print(header)
        print(internal_df if internal_df is not None else df)
        return html
    HTML, display = ipy
    display(HTML(html))
    return html


def do_without_pandas_limits(func: Callable) -> None:
    """Run ``func`` with pandas display limits lifted, restoring them
    afterwards (display_utils.py:23-40)."""
    saved = {
        "max_rows": pd.options.display.max_rows,
        "max_columns": pd.options.display.max_columns,
        "max_colwidth": pd.options.display.max_colwidth,
        "width": pd.options.display.width,
    }
    pd.options.display.max_rows = None
    pd.options.display.max_columns = None
    pd.options.display.max_colwidth = None
    pd.options.display.width = 150
    try:
        func()
    finally:
        pd.options.display.max_rows = saved["max_rows"]
        pd.options.display.max_columns = saved["max_columns"]
        pd.options.display.max_colwidth = saved["max_colwidth"]
        pd.options.display.width = saved["width"]
