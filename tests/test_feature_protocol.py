"""Feature protocol parity — display names, stable hash, fit-param
round-trip, and formula lowering of parametrized ops (bin/norm/date_per/
DateListDiff). Replays reference tests/autofe/test_feature.py and
test_bin.py cases."""

from pyspark.sql import functions as F

from upgini_spark.plans.feature_dag import (
    compile_features,
    display_name,
    feature_hash,
    get_op_params,
    lower_to_column,
    parse_formula,
    set_op_params,
)


# reference test_feature.py:test_get_display_name
def test_display_names():
    f1 = parse_formula("abs(f1)")
    assert display_name(f1, index="123") == "f_f1_autofe_abs_123"
    assert display_name(f1, index="123", shorten=True) == "f_f1_autofe_abs_123"

    f2 = parse_formula("(f1/f2)")
    assert display_name(f2, index="123") == "f_f1_f_f2_autofe_div_123"
    assert display_name(f2, index="123", shorten=True) == "f_autofe_div_123"

    f3 = parse_formula("GroupByThenMin(abs(f1),f2)")
    assert display_name(f3, index="123") == "f_f1_f_f2_autofe_groupbythenmin_123"
    assert display_name(f3, index="123", shorten=True) == "f_autofe_groupbythenmin_123"

    f4 = parse_formula("mean(f1,f2,f3)")
    assert display_name(f4, index="123") == "f_f1_f_f2_f_f3_autofe_mean_123"

    f5 = parse_formula("date_per(f1,date_diff(f1,f2))")
    assert display_name(f5, index="123") == "f_f1_f_f2_autofe_date_per_method1_123"

    f6 = parse_formula("abs(date_diff(b,c))")
    assert display_name(f6, index="123") == "f_b_f_c_autofe_date_diff_type1_abs_123"
    assert display_name(f6, index="123", shorten=True) == "f_autofe_date_diff_type1_abs_123"

    f7 = parse_formula("date_diff(b,c)")
    assert display_name(f7, index="123") == "f_b_f_c_autofe_date_diff_type1_123"
    assert display_name(f7, index="123", use_op_alias=False) == "f_b_f_c_autofe_date_diff_123"

    f9 = parse_formula("bin(abs(date_diff(b,c)))")
    assert display_name(f9, index="123") == "f_b_f_c_autofe_date_diff_type1_abs_bin_123"

    f8 = parse_formula("lag_10D(date,f1,f2,value)")
    assert display_name(f8, index="123") == "f_date_f_f1_f_f2_f_value_autofe_lag_10d_123"
    assert display_name(f8, index="123", shorten=True) == "f_autofe_lag_10d_123"

    assert display_name(f2, index="123", alias="myalias") == "f_autofe_myalias_123"


# reference test_feature.py:test_get_hash — distinct DAGs, distinct hashes
def test_feature_hash_stability():
    h1 = feature_hash(parse_formula("GroupByThenMin(f1,f2)"))
    h2 = feature_hash(parse_formula("GroupByThenMin(abs(f1),f2)"))
    assert h1 != h2
    assert len(h1) == 10 and all(c in "0123456789abcdef" for c in h1)
    # pure function of the DAG
    assert h1 == feature_hash(parse_formula("GroupByThenMin(f1,f2)"))


# reference test_feature.py:test_op_params (norm values through the tree)
def test_op_params_roundtrip():
    tree = parse_formula("(norm(a)/abs(norm(b)))")
    norm_a = tree.children[0]
    norm_b = tree.children[1].children[0]
    norm_a.params["norm"] = 1.0
    norm_b.params["norm"] = 2.0

    flat = get_op_params(tree)
    assert flat == {
        "alias": "div",
        "f_a_autofe_norm_norm": "1.0",
        "f_b_autofe_norm_abs_f_b_autofe_norm_norm": "2.0",
    }

    # unprefixed fallback reaches every node (reference behavior)
    fresh = parse_formula("(norm(a)/abs(norm(b)))")
    set_op_params(fresh, {"norm": "3"})
    assert fresh.children[0].params["norm"] == "3"
    assert fresh.children[1].children[0].params["norm"] == "3"

    # prefixed round-trip restores the exact values
    fresh2 = parse_formula("(norm(a)/abs(norm(b)))")
    set_op_params(fresh2, flat)
    assert float(fresh2.children[0].params["norm"]) == 1.0
    assert float(fresh2.children[1].children[0].params["norm"]) == 2.0


def test_parametrized_lowering_replay(spark):
    """A frozen FitState replays entirely from (formula, params): bin,
    norm, date_per, DateListDiff all reachable from formula strings."""
    df = spark.createDataFrame(
        [(1, 10.0, "2024-02-05", ["2024-01-01", "2024-02-01"]),
         (2, 30.0, "2024-03-03", ["2024-02-20"]),
         (3, None, "2024-02-03", [])],
        "id int, x double, d string, dl array<string>",
    ).select("id", "x", "d", F.transform("dl", lambda s: F.to_date(s)).alias("dl"))

    node_bin = parse_formula("bin(x)")
    set_op_params(node_bin, {"bin_bounds": "[0, 25, 45]"})
    node_norm = parse_formula("norm(x)")
    set_op_params(node_norm, {"norm": "10.0"})
    node_per = parse_formula("date_per(d,x)")
    set_op_params(node_per, {
        "zero_month": "2", "zero_year": "2024", "step": "30",
        "zero_bounds": "[0.0, 2.6, 32.0]",
    })
    node_dld = parse_formula("date_diff_count(d,dl)")
    node_dldb = parse_formula("date_diff_D_0_plusinf_count_norm(d,dl)")

    out = df.select(
        "id",
        lower_to_column(node_bin).alias("b"),
        lower_to_column(node_norm).alias("n"),
        lower_to_column(node_per).alias("p"),
        lower_to_column(node_dld).alias("c"),
        lower_to_column(node_dldb).alias("cn"),
    ).orderBy("id").collect()

    assert [r["b"] for r in out] == [1, 2, -1]
    assert [r["n"] for r in out] == [1.0, 3.0, None]
    # date_per: x=10 in month_diff 0 → 3 bounds <= 10 except 32 → 2;
    # x=30, month_diff 1 → bounds+30 = [30, 32.6, 62] → 1; null → None
    assert [r["p"] for r in out] == [2, 1, None]
    assert [r["c"] for r in out] == [2.0, 1.0, 0.0]
    # bounded [0, inf) count / len: row1 both diffs >= 0 → 2/2; row2 diff
    # (2024-03-03 - 2024-02-20)=12d → 1/1; empty → 0 (count agg, no norm div)
    assert [r["cn"] for r in out] == [1.0, 1.0, 0.0]


def test_compile_features_with_param_nodes(spark):
    """compile_features accepts param-carrying nodes — the full FitState
    replay: serialize (formula, get_op_params) → parse + set_op_params →
    compile."""
    df = spark.createDataFrame([(1, 7.0), (2, 49.0)], "id int, x double")
    node = parse_formula("norm(x)")
    set_op_params(node, {"norm": "7.0"})
    frozen = (node.formula(), get_op_params(node))

    replayed = parse_formula(frozen[0])
    set_op_params(replayed, frozen[1])
    out = compile_features(df, {"f_norm": replayed}).orderBy("id").collect()
    assert [r["f_norm"] for r in out] == [1.0, 7.0]


def test_rename_columns_and_params():
    from upgini_spark.plans.feature_dag import (
        get_all_operand_names, rename_columns, rename_op_params,
    )

    node = parse_formula("GroupByThenMean(norm(price),region)")
    assert get_all_operand_names(node) == {"GroupByThenMean", "norm"}

    rename_columns(node, {"price": "p2", "region": "r2"})
    assert node.formula() == "GroupByThenMean(norm(p2),r2)"
    assert display_name(node) == "f_p2_f_r2_autofe_groupbythenmean"

    inner = node.children[0]
    inner.params = {"norm_price": "3.0", "alias": "x"}
    rename_op_params(node, {"price": "p2"})
    assert inner.params == {"norm_p2": "3.0", "alias": "x"}


def test_registry_parity_sweep(spark):
    """Every operator name in the reference registry (autofe/*.py `name`
    attrs) either lowers from its formula form or is an explicit
    server-side stub — nothing silently missing."""
    from upgini_spark.plans.feature_dag import is_server_side, parse_ts_op

    scalar_formulas = [
        "abs(x)", "log(x)", "sqrt(x)", "square(x)", "sigmoid(x)",
        "floor(x)", "residual(x)",
        "(a+b)", "(a-b)", "(a*b)", "(a/b)", "min(a,b)", "max(a,b)",
        "Combine(s1,s2)", "dist(va,vb)", "sim(va,vb)",
        "sim_jw1(s1,s2)", "sim_jw2(s1,s2)", "sim_lv(s1,s2)",
        "date_diff(d1,d2)", "date_diff_type2(d1,d2)",
        "date_diff_min(d1,dl)", "date_diff_max(d1,dl)",
        "date_diff_mean(d1,dl)", "date_diff_nunique(d1,dl)",
        "date_diff_count(d1,dl)", "date_diff_D_0_plusinf_count_norm(d1,dl)",
        "GroupByThenMin(x,k)", "GroupByThenMax(x,k)", "GroupByThenMean(x,k)",
        "GroupByThenMedian(x,k)", "GroupByThenStd(x,k)", "GroupByThenSum(x,k)",
        "GroupByThenRank(x,k)", "GroupByThenNUnique(x,k)",
        "GroupByThenFreq(s1,k)",
        "mean(a,b,x)", "sum(a,b,x)", "vectorize(a,b,x)",
    ]
    param_formulas = {
        "norm(x)": {"norm": "2.0"},
        "bin(x)": {"bin_bounds": "[0, 10]"},
        "date_per(d1,x)": {"zero_year": "2020", "zero_month": "1",
                           "step": "30", "zero_bounds": "[0.0, 5.0]"},
        "freq(s1)": {"total": "100"},
        "CombineThenFreq(s1,s2)": {"total": "100"},
        "outlier_dist(va)": {"centroid": "[0.1, 0.2, 0.3]"},
        "outlier_dist_1(va)": {"centroid": "[0.1, 0.2, 0.3]"},
        "cluster(va)": {"centroids": "[[0.1, 0.2, 0.3], [0.3, 0.1, 0.2]]"},
        "cluster_2(va)": {"centroids": "[[0.1, 0.2, 0.3], [0.3, 0.1, 0.2]]"},
    }
    ts_names = [
        "lag_3D", "roll_7D_mean", "roll_7D_q75", "delta_1D", "delta2_1D",
        "roll_vol_7D", "vol_ratio_7_to_14D", "ewma_vol_10", "trend_coef",
    ]
    server_side = ["emb", "onnx_score", "catboost_score"]

    failures = []
    for f in scalar_formulas:
        try:
            node = parse_formula(f)
            col = lower_to_column(node)
            assert col is not None
        except Exception as e:  # noqa: BLE001
            failures.append((f, str(e)[:100]))
    for f, params in param_formulas.items():
        try:
            node = parse_formula(f)
            set_op_params(node, params)
            assert lower_to_column(node) is not None
        except Exception as e:  # noqa: BLE001
            failures.append((f, str(e)[:100]))
    for name in ts_names:
        if parse_ts_op(name) is None:
            failures.append((name, "ts name did not parse"))
    for name in server_side:
        if not is_server_side(name):
            failures.append((name, "not recognized as server-side"))
    assert not failures, failures
