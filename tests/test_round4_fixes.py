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


# -- distributed rank AUC == numpy roc_auc on randomized frames -------------

def test_rank_auc_matches_numpy_randomized(spark):
    import numpy as np
    from upgini_spark.functions.stats import rank_auc
    from upgini_spark.pipeline.metrics import roc_auc_score

    for seed in (1, 7, 42):
        rng = np.random.RandomState(seed)
        y = rng.randint(0, 2, 600)
        s = np.round(rng.normal(size=600) + 0.6 * y, 1)  # heavy ties
        df = spark.createDataFrame(
            [(int(a), float(b), int(i % 3)) for i, (a, b) in enumerate(zip(y, s))],
            "t int, sc double, g int",
        ).repartition(7)
        # global (runs through the distributed running sum)
        row = rank_auc(df, "t", "sc").collect()[0]
        assert row["auc"] == round(roc_auc_score(y, s), 6)
        # grouped (per-group window cumsum)
        for r in rank_auc(df, "t", "sc", group_cols=["g"]).collect():
            mask = np.arange(600) % 3 == r["g"]
            assert r["auc"] == round(roc_auc_score(y[mask], s[mask]), 6)


# -- reference imbalanced prepare replay ------------------------------------

def test_prepared_imbalanced_layout_vs_reference_golden(spark):
    """tests/test_features_enricher.py test_idempotent_order_with_
    imbalanced_dataset replayed: train 8000 + deduped eval sets through
    combine -> date/phone converters + day-in-quarter cyclical features
    (reference-EXACT generated names) -> hashed renames -> continuous
    record ids -> BINARY undersample of the train segment only
    (binary_min_sample_threshold=1000, SampleConfig override). The
    reference samples the majority rows with a seeded RNG; our engine
    uses md5-rank selection (documented deviation) — so the replay
    asserts everything EXCEPT row identity of the sampled majority:
    column names (incl. hashed cyclical names), per-segment row and
    class counts, id block layout with pre-sample ids, minority side
    kept whole, and bit-level value parity on the unsampled eval
    segments."""
    import os
    import pandas as pd
    import pytest as _pytest

    base = "/root/reference/tests/test_data/binary"
    if not os.path.exists(f"{base}/expected_prepared_imbalanced.parquet"):
        _pytest.skip("reference fixtures not available")

    from upgini_spark.functions.keys import parse_datetime_multi, to_epoch_ms
    from upgini_spark.functions.sampling import undersample_imbalanced
    from upgini_spark.operators.date import cyclical_features
    from upgini_spark.pipeline.evalset import combine_train_eval
    from upgini_spark.pipeline.normalizer import rename_columns_hashed
    from upgini_spark.pipeline.record_ids import add_system_record_id

    train = pd.read_parquet(f"{base}/initial_train_imbalanced.parquet")
    key = ["phone_num", "rep_date", "target"]

    def dedup_eval(p):
        ev = pd.read_parquet(p)
        return ev[~ev.set_index(key).index.isin(train.set_index(key).index)]

    ev1 = dedup_eval(f"{base}/initial_eval1_imbalanced.parquet")
    ev2 = dedup_eval(f"{base}/initial_eval2_imbalanced.parquet")
    exp = pd.read_parquet(f"{base}/expected_prepared_imbalanced.parquet")

    combined = combine_train_eval(
        spark.createDataFrame(train.reset_index(drop=True)),
        [spark.createDataFrame(ev1.reset_index(drop=True)),
         spark.createDataFrame(ev2.reset_index(drop=True))],
        "target",
    )
    # the reference's prepare runs the gated fintech dedup per segment
    # (features_enricher.py:3543): the TRAIN segment is skipped by the
    # ≥60% multi-date-share gate (0.63 here), both eval segments dedup
    # 478/482 → 434/434 — the expected parquet's exact eval sizes
    from upgini_spark.functions.dedup import remove_fintech_duplicates

    combined = remove_fintech_duplicates(
        combined, ["phone_num"], "target", "rep_date"
    )
    parsed = parse_datetime_multi(F.col("rep_date"))
    cyc = cyclical_features(parsed)
    converted = combined.select(
        "phone_num",
        to_epoch_ms(parsed, floor_day=True).alias("rep_date"),
        "target", "eval_set_index",
        *[e.alias(n) for n, e in cyc.items()],
    )
    renamed, _m = rename_columns_hashed(
        converted, exclude={"target", "eval_set_index"}
    )
    with_ids = add_system_record_id(
        renamed, "rep_date_f5d6bb", ["phone_num_a54a33", "rep_date_f5d6bb"]
    ).withColumn("entity_system_record_id", F.col("system_record_id"))

    tr = with_ids.filter(F.col("eval_set_index") == 0)
    evs = with_ids.filter(F.col("eval_set_index") != 0)
    sampled = undersample_imbalanced(
        tr, "target", ["phone_num_a54a33", "rep_date_f5d6bb"],
        task_type="BINARY", binary_min_sample_threshold=1000,
    )
    out = sampled.unionByName(evs).toPandas()

    # column-name parity (hashed cyclical names included)
    assert set(out.columns) == set(exp.columns)

    # segment sizes + train class quotas (reference formula: majority
    # capped at min(7000, 5*(1000 + max(1000-2000, 0))) = 5000)
    assert out.groupby("eval_set_index").size().to_dict() == \
        exp.groupby("eval_set_index").size().to_dict()
    got_tr = out[out.eval_set_index == 0]
    assert got_tr.target.value_counts().to_dict() == \
        exp[exp.eval_set_index == 0].target.value_counts().to_dict()
    # minority kept whole: every pre-sample minority row survives
    assert (got_tr.target == 1).sum() == 1000

    # id block layout: pre-sample ids preserved in train (subset of
    # 0..7999), eval blocks contiguous and identical to the reference
    assert set(got_tr.system_record_id) <= set(range(0, 8000))
    for s in (1, 2):
        assert set(out[out.eval_set_index == s].system_record_id) == \
            set(exp[exp.eval_set_index == s].system_record_id)
    assert (out.system_record_id == out.entity_system_record_id).all()

    # eval segments are NOT sampled: bit-level value parity per segment
    vals = ["phone_num_a54a33", "rep_date_f5d6bb", "target",
            "datetime_day_in_quarter_sin_65d4f7",
            "datetime_day_in_quarter_cos_eeb97a"]
    cyc = ["datetime_day_in_quarter_sin_65d4f7", "datetime_day_in_quarter_cos_eeb97a"]
    for s in (1, 2):
        g = out[out.eval_set_index == s][vals].copy()
        w = exp[exp.eval_set_index == s][vals].copy()
        # JVM vs numpy libm differ in the LAST bit of cos (1 ULP:
        # -0.5766803221148671 vs ...670) — compare trig at 12 dp, far
        # inside the north rule's allclose; keys/target stay exact
        for c in cyc:
            g[c] = g[c].round(12)
            w[c] = w[c].round(12)
        g = g.astype({"phone_num_a54a33": "int64", "rep_date_f5d6bb": "int64"})
        w = w.astype({"phone_num_a54a33": "int64", "rep_date_f5d6bb": "int64"})
        g = g.sort_values(vals).reset_index(drop=True)
        w = w.sort_values(vals).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_exact=True)


# -- OOT-PSI stability selection (the reference _check_stability flow) ------

def test_select_stable_features_decision(spark):
    from upgini_spark.functions.stats import select_stable_features

    def frame(start_day, n, drift):
        rows = []
        for i in range(n):
            day = start_day + (i % 60)
            # f_stable: same distribution everywhere; f_drift: shifts with
            # time when drift=True; f_sparse: nulls appear only late
            rows.append((
                f"2023-{1 + day // 28:02d}-{1 + day % 28:02d}",
                float(i % 10),
                float(i % 10) + (10.0 * (day // 30) if drift else 0.0),
                None if (drift and day % 60 >= 30 and i % 2 == 0) else float(i % 5),
            ))
        return spark.createDataFrame(
            rows, "d string, f_stable double, f_drift double, f_sparse double"
        )

    train = frame(0, 2000, drift=False)
    ev_small = frame(60, 200, drift=True)       # <1000 rows -> skipped
    ev_late = frame(60, 2000, drift=True)       # elected: latest window
    unstable, stable_vals, idx = select_stable_features(
        train, [ev_small, ev_late], "d",
        ["f_stable", "f_drift", "f_sparse"], [],
    )
    assert idx == 1
    assert "f_drift" in unstable          # value drift over the intervals
    assert "f_sparse" in unstable         # null-mask drift (sparsity PSI)
    assert "f_stable" not in unstable
    assert "f_stable" in stable_vals and stable_vals["f_stable"] <= 0.2
    # no qualifying eval set -> empty decision, like the reference
    assert select_stable_features(train, [ev_small], "d", ["f_stable"], []) \
        == ([], {}, None)


# -- formula parser round-trip property -------------------------------------

def test_formula_parser_roundtrip_property():
    """Random formula trees emit → parse → emit to a fixed point, and
    malformed inputs raise ValueError (never IndexError/crash)."""
    import random

    from upgini_spark.plans.feature_dag import Col, Op, parse_formula

    rng = random.Random(404)
    ops = ["GroupByThenMean", "GroupByThenFreq", "Combine", "sim", "min", "max"]
    unary = ["abs", "log", "sqrt", "sigmoid", "freq"]

    def tree(depth):
        if depth == 0 or rng.random() < 0.3:
            return Col(rng.choice(["a", "b", "col3", "f_x"]))
        r = rng.random()
        if r < 0.3:
            return Op(rng.choice(list("+-*/")), [tree(depth - 1), tree(depth - 1)])
        if r < 0.6:
            return Op(rng.choice(unary), [tree(depth - 1)])
        return Op(rng.choice(ops), [tree(depth - 1), tree(depth - 1)])

    for _ in range(200):
        t = tree(3)
        if isinstance(t, Col):
            continue
        f = t.formula()
        f2 = parse_formula(f).formula()
        assert f2 == f, (f, f2)

    import pytest as _pytest
    for bad in ["", "(", "a+", "f(a,", "a)b", "f(,a)", "((a)", "a++b"]:
        with _pytest.raises(ValueError):
            parse_formula(bad)


# -- real stdlib media decode (WAV + PPM) -----------------------------------

def test_media_decode_real_ground_truth(spark):
    from upgini_spark.functions.multimodal import decode_media, synthetic_real_media

    out = {r["media_id"]: r for r in decode_media(synthetic_real_media(spark, 40)).collect()}
    assert len(out) == 40
    for i in range(40):
        r = out[f"m{i:09d}"]
        if i % 2 == 0:  # WAV: square wave — rms == mean_abs == peak == amp/32768
            amp = 1000 + (i % 7) * 1000
            assert r["format"] == "wav"
            assert r["sample_rate"] == 8000 and r["n_channels"] == 1
            assert r["duration_ms"] == (400 + (i % 5) * 80) // 8
            assert r["features"] == [amp / 32768.0] * 3
        else:  # PPM: solid color — exact channel means
            assert r["format"] == "ppm", (i, r["format"])
            assert (r["width"], r["height"]) == (4 + i % 5, 3 + i % 4)
            rgb = [(i % 256) / 255.0, ((i * 7) % 256) / 255.0, ((i * 13) % 256) / 255.0]
            assert r["features"][:3] == rgb
            lum = 0.2126 * rgb[0] + 0.7152 * rgb[1] + 0.0722 * rgb[2]
            assert r["features"][3] == lum


def test_media_decode_whitespace_first_pixel(spark):
    """Regression: PPM whose FIRST pixel byte is whitespace (0x0a) must
    decode — the split-based header parse ate pixel bytes."""
    from upgini_spark.functions.multimodal import _decode_ppm

    content = b"P6\n2 1\n255\n" + bytes([0x0A, 0x20, 0x09, 200, 100, 50])
    w, h, feats = _decode_ppm(content)
    assert (w, h) == (2, 1)
    assert feats[0] == (0x0A + 200) / 2 / 255.0


def test_media_decode_corrupt_and_unknown(spark):
    from upgini_spark.functions.multimodal import MEDIA_SCHEMA, decode_media

    rows = [
        ("a", "image", b"P6\n9 9\n255\n" + b"xy", None, None, None, None),  # truncated
        ("b", "video", b"\x00\x01\x02lol", None, None, None, None),         # unknown
        ("c", "audio", None, None, None, None, None),                        # null payload
    ]
    out = {r["media_id"]: r for r in decode_media(
        spark.createDataFrame(rows, MEDIA_SCHEMA)
    ).collect()}
    assert out["a"]["format"] == "corrupt"
    assert out["b"]["format"] == "unknown" and out["b"]["n_bytes"] == 6
    assert out["c"]["format"] == "unknown" and out["c"]["n_bytes"] is None


def test_video_frame_sampling_ground_truth(spark):
    from upgini_spark.functions.multimodal import sample_video_frames, synthetic_y4m

    rows = sample_video_frames(synthetic_y4m(spark, 12), stride=3).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert len(by_vid) == 12
    for i in range(12):
        vid = sorted(by_vid[f"v{i:09d}"], key=lambda r: r["frame_idx"])
        nf = 6 + i % 5
        assert [r["frame_idx"] for r in vid] == list(range(0, nf, 3))
        for r in vid:
            assert r["format"] == "y4m"
            assert (r["width"], r["height"], r["n_frames"]) == (4 + i % 3, 2 + i % 3, nf)
            assert r["luma_mean"] == ((i * 5 + r["frame_idx"] * 11) % 256) / 255.0
    # corrupt stream flagged, not crashed
    from upgini_spark.functions.multimodal import MEDIA_SCHEMA

    bad = spark.createDataFrame(
        [("x", "video", b"YUV4MPEG2 W4 H4 Cmono\nFRAME\nxy", None, None, None, None)],
        MEDIA_SCHEMA,
    )
    out = sample_video_frames(bad).collect()
    assert len(out) == 1 and out[0]["format"] == "corrupt"


def test_resize_images_exact_pixels(spark):
    from upgini_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _parse_ppm,
        resize_images,
    )

    checker = b"P6\n2 2\n255\n" + bytes([0, 0, 0, 255, 255, 255,
                                          255, 255, 255, 0, 0, 0])
    rows = [
        ("img", "image", checker, None, 2, 2, None),
        ("wav", "audio", b"RIFFxxxxWAVE", None, None, None, None),  # untouched
    ]
    out = {r["media_id"]: r for r in resize_images(
        spark.createDataFrame(rows, MEDIA_SCHEMA), 4, 4
    ).collect()}
    w, h, _mv, px = _parse_ppm(bytes(out["img"]["content"]))
    assert (w, h) == (4, 4) == (out["img"]["width"], out["img"]["height"])
    # 2x2 checker upsampled to 2x2 blocks, nearest neighbor
    grid = [list(px[r * 12 : (r + 1) * 12 : 3]) for r in range(4)]
    assert grid == [[0, 0, 255, 255], [0, 0, 255, 255],
                    [255, 255, 0, 0], [255, 255, 0, 0]]
    # non-ppm payload passes through byte-identical
    assert bytes(out["wav"]["content"]) == b"RIFFxxxxWAVE"
