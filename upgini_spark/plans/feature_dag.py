"""Feature DAG: formula parsing + Spark lowering.

The reference serializes generated features as formula strings —
``GroupByThenFreq(a,b)``, ``(a+b)``, ``log(GroupByThenMean(x,y))``,
parametrized time-series names like ``lag_3d_offset_1D`` / ``roll_2D_mean``
(grammar: src/upgini/autofe/feature.py:308-371; registry resolution
src/upgini/autofe/operator.py:10-49). This module is a clean-room
recursive-descent parser for the same grammar plus a lowering that turns
each node into either a native Spark Column expression or a staged
time-series computation (window spec / pandas-UDF kernel).

Column-expression ops compile to ONE select — the Spark analog of the
reference's FeatureGroup.make_groups vectorized batching
(src/upgini/autofe/feature.py:433-451): Catalyst fuses the expressions in
a single WholeStageCodegen pass.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from upgini_spark.operators import binary as B
from upgini_spark.operators import date as DT
from upgini_spark.operators import groupby as G
from upgini_spark.operators import unary as U
from upgini_spark.operators import vector as V
from upgini_spark.operators import timeseries as TS


@dataclass
class Node:
    pass


@dataclass
class Col(Node):
    name: str


@dataclass
class Op(Node):
    op: str
    children: list[Node] = field(default_factory=list)
    params: dict = field(default_factory=dict)

    def formula(self) -> str:
        if self.op in "+-*/":
            return "(" + self.op.join(_fmt(c) for c in self.children) + ")"
        return f"{self.op}({','.join(_fmt(c) for c in self.children)})"


def _fmt(n: Node) -> str:
    return n.name if isinstance(n, Col) else n.formula()


_SPECIALS = set("()+-*/,")


def parse_formula(s: str) -> Node:
    """Parse the reference formula grammar into a DAG."""
    s = s.strip()
    pos = 0

    def peek() -> str:
        return s[pos] if pos < len(s) else ""

    def parse_expr() -> Node:
        nonlocal pos
        node = parse_term()
        while peek() != "" and peek() in "+-*/":
            op = s[pos]
            pos += 1
            rhs = parse_term()
            node = Op(op, [node, rhs])
        return node

    def parse_term() -> Node:
        nonlocal pos
        if peek() == "(":
            pos += 1
            node = parse_expr()
            if peek() != ")":
                raise ValueError(f"unbalanced parens in {s!r} at {pos}")
            pos += 1
            return node
        start = pos
        while pos < len(s) and s[pos] not in _SPECIALS:
            pos += 1
        name = s[start:pos]
        if not name:
            raise ValueError(f"empty token in {s!r} at {pos}")
        if peek() == "(":  # call form op(child, ...)
            pos += 1
            children = [parse_expr()]
            while peek() == ",":
                pos += 1
                children.append(parse_expr())
            if peek() != ")":
                raise ValueError(f"unbalanced call parens in {s!r} at {pos}")
            pos += 1
            return Op(name, children)
        return Col(name)

    node = parse_expr()
    if pos != len(s):
        raise ValueError(f"trailing characters in formula {s!r} at {pos}")
    return node


# --------------------------------------------------------------------------
# Parametrized time-series names (lag_3d, roll_2D_mean_offset_1D, ...)
# --------------------------------------------------------------------------

_TS_PATTERNS = [
    ("lag", re.compile(r"^lag_(\d+)([a-zA-Z])(?:_offset_(\d+)([a-zA-Z]))?$")),
    ("roll", re.compile(r"^roll_(\d+)([a-zA-Z])_([a-z0-9_]+?)(?:_offset_(\d+)([a-zA-Z]))?$")),
    ("delta", re.compile(r"^delta_(\d+)([a-zA-Z])(?:_offset_(\d+)([a-zA-Z]))?$")),
    ("delta2", re.compile(r"^delta2_(\d+)([a-zA-Z])(?:_offset_(\d+)([a-zA-Z]))?$")),
    ("roll_vol", re.compile(r"^roll_vol_(\d+)([a-zA-Z])$")),
    ("vol_ratio", re.compile(r"^vol_ratio_(\d+)_to_(\d+)([a-zA-Z])?$")),
    ("ewma_vol", re.compile(r"^ewma_vol_(\d+)$")),
    ("trend_coef", re.compile(r"^trend_coef$")),
]


def parse_ts_op(name: str) -> tuple[str, dict] | None:
    for kind, pat in _TS_PATTERNS:
        m = pat.match(name)
        if not m:
            continue
        g = m.groups()
        if kind == "lag":
            p = {"n": int(g[0]), "unit": g[1]}
            if g[2]:
                p["offset"] = (int(g[2]), g[3])
            return "lag", p
        if kind == "roll":
            p = {"n": int(g[0]), "unit": g[1], "agg": g[2]}
            if p["agg"] not in TS.ROLL_AGGS:
                return None
            if g[3]:
                p["offset"] = (int(g[3]), g[4])
            return "roll", p
        if kind in ("delta", "delta2"):
            p = {"n": int(g[0]), "unit": g[1], "order": 1 if kind == "delta" else 2}
            if g[2]:
                p["offset"] = (int(g[2]), g[3])
            return "delta", p
        if kind == "roll_vol":
            return "roll_vol", {"n": int(g[0]), "unit": g[1]}
        if kind == "vol_ratio":
            return "vol_ratio", {"short": int(g[0]), "long": int(g[1]), "unit": g[2] or "D"}
        if kind == "ewma_vol":
            return "ewma_vol", {"span": int(g[0])}
        if kind == "trend_coef":
            return "trend_coef", {}
    return None


# --------------------------------------------------------------------------
# Lowering: scalar nodes → Column; TS nodes → staged df transform
# --------------------------------------------------------------------------

_UNARY = {
    "abs": U.abs_, "log": U.log_, "sqrt": U.sqrt_, "square": U.square_,
    "sigmoid": U.sigmoid_, "floor": U.floor_, "residual": U.residual_,
    "freq": U.freq_,
}

_BINARY = {
    "min": B.min_, "max": B.max_,
    "+": B.add, "-": B.subtract, "*": B.multiply, "/": B.divide,
    "Combine": B.combine, "CombineThenFreq": B.combine_then_freq,
    "dist": B.distance, "sim": B.cosine_similarity,
    "sim_jw1": B.sim_jaro_winkler,
    "sim_jw2": B.sim_jaro_winkler_reversed,
    "sim_lv": B.sim_levenshtein,
    "date_diff": lambda a, b: DT.date_diff(a, b, "D"),
    "date_diff_Y": lambda a, b: DT.date_diff(a, b, "Y"),
    "date_diff_type2": DT.date_diff_type2,
}

_GROUPBY = {
    "GroupByThenMin": lambda k, v: G.group_by_then("min", k, v),
    "GroupByThenMax": lambda k, v: G.group_by_then("max", k, v),
    "GroupByThenMean": lambda k, v: G.group_by_then("mean", k, v),
    "GroupByThenMedian": lambda k, v: G.group_by_then("median", k, v),
    "GroupByThenStd": lambda k, v: G.group_by_then("std", k, v),
    "GroupByThenSum": lambda k, v: G.group_by_then("sum", k, v),
    "GroupByThenRank": G.group_by_then_rank,
    "GroupByThenNUnique": G.group_by_then_nunique,
    "GroupByThenFreq": G.group_by_then_freq,
}

_VECTOR = {"mean": V.mean, "sum": V.sum_, "vectorize": V.vectorize}


def _needs_total(node: Node) -> bool:
    """freq-family ops divide by the fit-time row count."""
    if isinstance(node, Op):
        if node.op in ("freq", "CombineThenFreq"):
            return True
        return any(_needs_total(c) for c in node.children)
    return False


def lower_to_column(node: Node, total: float | None = None) -> Column:
    """Lower a scalar DAG to one Column expression. Raises on TS nodes —
    those need :func:`compile_features`' staged path. ``total`` is the
    fit-time row count consumed by the freq family (see unary.freq_)."""
    if isinstance(node, Col):
        return F.col(node.name)
    assert isinstance(node, Op)
    kids = [lower_to_column(c, total) for c in node.children]
    if node.op == "freq" and len(kids) == 1:
        return U.freq_(kids[0], total)
    if node.op == "CombineThenFreq" and len(kids) == 2:
        return B.combine_then_freq(kids[0], kids[1], total)
    if node.op in _UNARY and len(kids) == 1:
        return _UNARY[node.op](kids[0])
    if node.op in _BINARY and len(kids) == 2:
        # note: reference groupby ops take (value_of_interest, group_key)
        return _BINARY[node.op](kids[0], kids[1])
    if node.op in _GROUPBY and len(kids) == 2:
        # reference argument order: GroupByThenX(value, key)
        return _GROUPBY[node.op](kids[1], kids[0])
    if node.op in _VECTOR:
        return _VECTOR[node.op](kids)
    if parse_ts_op(node.op) is not None:
        raise ValueError(
            f"time-series op {node.op!r} needs staged compilation — use compile_features"
        )
    raise ValueError(f"unknown operator {node.op!r} (arity {len(kids)})")


def compile_features(
    df: DataFrame,
    formulas: dict[str, str],
    ts_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Compute named features from formulas in as few passes as possible:
    all scalar formulas in one ``select`` (codegen-fused); each TS formula
    as a window/kernel stage. TS formulas take children
    ``(date, group..., value)`` like the reference's vector form."""
    scalar_cols: list[Column] = []
    staged: list[tuple[str, Op]] = []
    nodes = {out_name: parse_formula(formula) for out_name, formula in formulas.items()}
    # fit-time row count, computed once, only if a freq-family op appears
    total = float(df.count()) if any(_needs_total(n) for n in nodes.values()) else None
    for out_name, node in nodes.items():
        if isinstance(node, Op) and parse_ts_op(node.op) is not None:
            staged.append((out_name, node))
        else:
            scalar_cols.append(lower_to_column(node, total).alias(out_name))
    out = df.select("*", *scalar_cols) if scalar_cols else df

    for out_name, node in staged:
        kind, p = parse_ts_op(node.op)
        child_names = [c.name for c in node.children]
        date_col = child_names[0] if child_names else ts_col
        groups = child_names[1:-1]
        value = child_names[-1]
        offset = p.pop("offset", None)

        if kind == "lag":
            fn = lambda s, p=p: TS.lag_feature(s, date_col, groups, value, p["n"], p["unit"], out_col=out_name)  # noqa: E501,E731
        elif kind == "roll":
            fn = lambda s, p=p: TS.roll_feature(s, date_col, groups, value, p["n"], p["unit"], p["agg"], out_col=out_name)  # noqa: E501,E731
        elif kind == "delta":
            fn = lambda s, p=p: TS.delta_feature(s, date_col, groups, value, p["n"], p["unit"], order=p["order"], out_col=out_name)  # noqa: E501,E731
        elif kind == "roll_vol":
            fn = lambda s, p=p: TS.rolling_volatility(s, date_col, groups, value, p["n"], p["unit"], out_col=out_name)  # noqa: E501,E731
        elif kind == "vol_ratio":
            fn = lambda s, p=p: TS.volatility_ratio(s, date_col, groups, value, p["short"], p["long"], p["unit"], out_col=out_name)  # noqa: E501,E731
        elif kind == "ewma_vol":
            fn = lambda s, p=p: TS.ewma_volatility(s, date_col, groups, value, p["span"], out_col=out_name)  # noqa: E501,E731
        elif kind == "trend_coef":
            fn = lambda s, p=p: TS.trend_coefficient(s, date_col, groups, value, out_col=out_name)  # noqa: E501,E731
        else:
            raise ValueError(kind)
        out = TS.ts_feature_parity(
            out, date_col, groups, value, fn, out_name,
            order_col=order_col, offset=offset,
        )
    return out


# Server-side / external-model operators: the reference declares them for
# formula round-trip but computes them remotely (unary.py:151-156,
# vector.py:36-76). We preserve registry identity and fail loudly at
# lowering time.
SERVER_SIDE_OPS = {"emb", "cluster", "onnx", "catboost"}


def is_server_side(op_name: str) -> bool:
    return op_name in SERVER_SIDE_OPS or any(
        op_name.startswith(p + "_") for p in SERVER_SIDE_OPS
    )
