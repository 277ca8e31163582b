"""Round-4 regressions: ADVICE fixes (phone float overflow under ANSI,
null-group GroupKFold join, null target classes in is_imbalanced,
degenerate TS splits raising) plus round-4 verdict items."""

import pytest
from pyspark.sql import functions as F


# -- ADVICE: phone float beyond bigint range must yield null, not throw -----

def test_phone_to_int_float_overflow_null(spark):
    from upgini_spark.functions.keys import phone_to_int

    df = spark.createDataFrame(
        [("1e20",), ("99999999999999999999.0",), ("123456789012345.1",),
         ("12345678.9",), ("+86 10 6552 9988",)],
        "p string",
    )
    out = df.select(phone_to_int(F.col("p")).alias("v")).collect()
    vals = [r["v"] for r in out]
    # overflow rows null (reference phone_float_to_int_safe -> None);
    # in-range floats truncate toward zero; separator strings strip digits
    assert vals[0] is None
    assert vals[1] is None
    assert vals[2] == 123456789012345
    assert vals[3] == 12345678
    assert vals[4] == 861065529988


# -- ADVICE: null group keys must receive their assigned fold ---------------

def test_group_kfold_null_group_gets_fold(spark):
    from upgini_spark.pipeline.cv import group_kfold_column

    rows = [(i, None if i % 5 == 0 else f"g{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "rid int, grp string")
    out = group_kfold_column(df, ["grp"], n_splits=3)
    got = out.select("rid", "grp", "fold_id").collect()
    # every row — including null-group rows — has a fold
    assert all(r["fold_id"] is not None for r in got)
    # all null-group rows share ONE fold (they are one group)
    null_folds = {r["fold_id"] for r in got if r["grp"] is None}
    assert len(null_folds) == 1
    # group atomicity holds for the rest too
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], set()).add(r["fold_id"])
    assert all(len(v) == 1 for v in by_grp.values())
    # balance: fold loads within one greedy step of each other
    loads = {}
    for r in got:
        loads[r["fold_id"]] = loads.get(r["fold_id"], 0) + 1
    assert max(loads.values()) - min(loads.values()) <= 14  # largest group


# -- ADVICE: null target is not a class but its rows count ------------------

def test_is_imbalanced_null_target_not_a_class(spark):
    from upgini_spark.functions.stats import is_imbalanced

    # class 0: 700, class 1: 290, nulls: 10 -> k must be 2 (pandas
    # nunique dropna) with total 1000: threshold (0.6/2)*1000 = 300 > 290
    rows = [(i, 0) for i in range(700)]
    rows += [(700 + i, 1) for i in range(290)]
    rows += [(990 + i, None) for i in range(10)]
    df = spark.createDataFrame(rows, "rid int, target int")
    # k must be 2 (not 3): with 2 classes, threshold = 300 > 290 -> True
    assert is_imbalanced(df, "target", "MULTICLASS") is True
    # and a balanced 2-class frame with nulls still reads balanced
    rows2 = [(i, i % 2) for i in range(1000)] + [(1000 + i, None) for i in range(50)]
    df2 = spark.createDataFrame(rows2, "rid int, target int")
    assert is_imbalanced(df2, "target", "MULTICLASS") is False


# -- ADVICE: degenerate TS splits raise like sklearn ------------------------

def test_time_series_split_too_few_rows_raises(spark):
    from upgini_spark.pipeline.cv import (
        blocked_time_series_column,
        time_series_split_column,
    )

    df = spark.createDataFrame([(i, i) for i in range(4)], "rid int, ts int")
    with pytest.raises(ValueError):
        time_series_split_column(df, "ts", ["rid"], n_splits=5)
    df2 = spark.createDataFrame([(i, i) for i in range(2)], "rid int, ts int")
    with pytest.raises(ValueError):
        blocked_time_series_column(df2, "ts", ["rid"], n_splits=3)
    # boundary: n == n_splits+1 works (test_size 1)
    df3 = spark.createDataFrame([(i, i) for i in range(6)], "rid int, ts int")
    out = time_series_split_column(df3, "ts", ["rid"], n_splits=5)
    assert out.filter(F.col("fold_id").isNotNull()).count() == 5


# -- bigint running-sum accumulator: exact past 2^53 ------------------------

def test_global_running_sum_bigint_exact(spark):
    from upgini_spark.pipeline.record_ids import global_running_sum

    big = (1 << 53) + 1  # not representable as double
    df = spark.createDataFrame(
        [(i, big) for i in range(8)], "id int, v long"
    ).repartition(4)
    out = global_running_sum(df, [F.col("id").asc()], "v", "cum")
    assert dict(out.dtypes)["cum"] == "bigint"
    rows = {r["id"]: r["cum"] for r in out.collect()}
    assert rows == {i: big * (i + 1) for i in range(8)}
    # double arithmetic would collapse big*(k)+big and big*(k)+big+1:
    assert rows[1] - rows[0] == big  # exact, no 2^53 rounding


def test_pack_sequences_offsets_exact_past_2_53(spark):
    """pack_sequences' offset feed must stay exact with huge counts: unit
    test on the narrow (id, count) projection the packer uses."""
    from upgini_spark.pipeline.record_ids import global_running_sum

    base = (1 << 53) + 7
    df = spark.createDataFrame(
        [(f"d{i:02d}", base + i) for i in range(6)], "pid string, n_tok long"
    ).repartition(3)
    out = global_running_sum(df, [F.col("pid").asc()], "n_tok", "end_off")
    got = {r["pid"]: r["end_off"] for r in out.collect()}
    expect, acc = {}, 0
    for i in range(6):
        acc += base + i
        expect[f"d{i:02d}"] = acc
    assert got == expect


# -- IVF per-cell candidate cap: bounded work, measured recall --------------

def _vec(i, dims=16):
    import hashlib
    h = hashlib.md5(f"v{i}".encode()).digest()
    return [((h[j % 16] + i * (j + 3)) % 101 - 50) / 50.0 for j in range(dims)]


def test_ivf_cell_cap_bounds_and_recall(spark):
    from upgini_spark.functions.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf_kmeans,
    )

    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in range(400)], "vid int, v array<double>"
    )
    queries = corpus.filter(F.col("vid") < 10)

    def topk(df):
        return {(r["q_id"], r["n_id"]) for r in df.collect()}

    exact = topk(cosine_topk_bruteforce(queries, corpus, "vid", "vid", "v", "v", k=3))
    uncapped = cosine_topk_ivf_kmeans(
        queries, corpus, "vid", "vid", "v", "v", k=3, n_probe=4
    )
    capped = cosine_topk_ivf_kmeans(
        queries, corpus, "vid", "vid", "v", "v", k=3, n_probe=4, cell_cap=40
    )
    got_unc, got_cap = topk(uncapped), topk(capped)
    # the cap may only REMOVE candidates relative to the uncapped run
    assert got_cap  # non-degenerate
    rec_unc = len(got_unc & exact) / len(exact)
    rec_cap = len(got_cap & exact) / len(exact)
    assert rec_cap <= rec_unc + 1e-9
    assert rec_cap >= 0.5  # measured recall floor on the fixture
    # a generous cap changes nothing (cells of 400/20 ≈ 20 rows < 100)
    same = cosine_topk_ivf_kmeans(
        queries, corpus, "vid", "vid", "v", "v", k=3, n_probe=4, cell_cap=100
    )
    assert topk(same) == got_unc
