"""Round-6 optimization regression tests: the rewritten internals must
produce bit-identical results to their previous forms.

- connected_components gained a size-dispatched driver-side union-find
  (small edge sets) next to the distributed min-label loop: both paths
  must emit the same (node, component) frame.
- _nearest_cell/_nearest_subcell gained an Arrow kernel for heavy score
  matrices: kernel and JVM-join paths must agree exactly (scores are
  required bit-identical; ties to the smallest cell).
- pack_sequences dropped its countDistinct (Expand rewrite) for an
  in-struct doc id: n_docs must still count distinct docs per chunk.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from upgini_spark.session import get_spark

    s = get_spark("t_r06", master="local[4]", shuffle_partitions=8)
    yield s


def test_cc_driver_matches_distributed(spark):
    from upgini_spark.functions.dedup import connected_components

    # chain 1-2-3-4, clique {10,11,12}, pair (20, 21), self-contained dup
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21),
         (2, 1)],
        "id_a long, id_b long",
    )
    drv = connected_components(pairs).collect()
    dist = connected_components(pairs, driver_edge_cap=0).collect()
    assert sorted(map(tuple, drv)) == sorted(map(tuple, dist))
    comp = {r["node"]: r["component"] for r in drv}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20}


def test_nearest_cell_kernel_matches_jvm(spark):
    import upgini_spark.functions.similarity as SIM

    df = spark.createDataFrame(
        [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)])
         for i in range(50)] + [(99, [0.0] * 8)],  # zero vector -> NULL score
        "vid long, v array<double>",
    )
    cent = spark.createDataFrame(
        [(c, [float((c * 5 + d) % 7) - 3.0 for d in range(8)])
         for c in range(6)],
        "cell int, cvec array<double>",
    )
    rows = sorted(cent.collect(), key=lambda r: int(r["cell"]))
    via_kernel = SIM._nearest_cell_kernel(df, rows, "v").collect()
    # force the JVM broadcast-join path regardless of threshold
    old = SIM._KERNEL_MIN_WORK
    SIM._KERNEL_MIN_WORK = 10**9
    try:
        via_jvm = SIM._nearest_cell(df, cent, "v").collect()
    finally:
        SIM._KERNEL_MIN_WORK = old
    key = lambda r: r["vid"]  # noqa: E731
    for a, b in zip(sorted(via_kernel, key=key), sorted(via_jvm, key=key)):
        assert a["vid"] == b["vid"]
        assert a["cell"] == b["cell"]
        assert list(a["v"]) == list(b["v"])


def test_pack_sequences_n_docs_gaps(spark):
    from upgini_spark.functions.tokens import pack_sequences

    # doc ids with gaps; chunk 0 spans docs {1, 5}, chunk 1 spans {5, 9}
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (5, [4, 5, 6]), (9, [7, 8])],
        "doc_id long, toks array<int>",
    )
    out = {r["chunk_id"]: r for r in pack_sequences(df, "doc_id", "toks", 4).collect()}
    assert out[0]["n_docs"] == 2 and out[0]["first_doc"] == 1
    assert out[0]["tokens"] == [1, 2, 3, 4]
    assert out[1]["n_docs"] == 2 and out[1]["tokens"] == [5, 6, 7, 8]


def _composed_pq_encode(corpus, id_col, vec_col, codebooks, dim, m):
    """The pre-r6 pq_encode pipeline (explode → _nearest_subcell →
    struct-min regroup), kept here as the equality reference for the
    fused one-pass _index_rows_kernel."""
    import upgini_spark.functions.similarity as SIM

    long_df = corpus.select(
        F.col(id_col).alias("__pid__"),
        F.posexplode(SIM._subvectors(vec_col, m, dim)).alias("sub", "sv"),
    )
    assigned = SIM._nearest_subcell(long_df, codebooks)
    return (
        assigned.groupBy("__pid__")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "cell"))),
                lambda s: s["cell"],
            ).alias("codes")
        )
        .select(F.col("__pid__").alias(id_col), "codes")
    )


def test_fused_encode_matches_composed(spark):
    """pq_encode's fused one-pass kernel must equal the previous
    explode/join/regroup composition — including NULL, short,
    empty and NaN vectors, and codebooks with a missing subspace."""
    import upgini_spark.functions.similarity as SIM

    rows = [
        (1, [1.0] * 16), (2, None), (3, [0.5] * 8),
        (4, [float("nan")] * 16), (5, [0.0] * 16), (6, [2.0] * 16),
        (7, [1.0] * 15), (8, []),
    ] + [
        (100 + i, [float((i * 13 + d * 5) % 17) - 8.0 for d in range(16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cbrows = []
    for sub in range(4):
        cbrows.append((sub, 0, [0.1 * sub, 1.0, 0.0, 2.0]))
        cbrows.append(
            (sub, 1, [1.5, float("nan") if sub == 2 else 0.5, 1.0, 0.0])
        )
    cb = spark.createDataFrame(cbrows, "sub int, cell int, cvec array<double>")
    for book in (cb, cb.filter(F.col("sub") != 1)):
        a = _composed_pq_encode(df, "vec_id", "v", book, 16, 4)
        b = SIM.pq_encode(df, "vec_id", "v", book, 16, 4)
        pa = {r["vec_id"]: list(r["codes"]) for r in a.collect()}
        pb = {r["vec_id"]: list(r["codes"]) for r in b.collect()}
        assert pa == pb


def test_fused_index_matches_composed(spark):
    """build_ivf_pq_index's fused (cell + codes) kernel row set must
    equal the previous _nearest_cell ⋈ pq_encode composition."""
    import upgini_spark.functions.similarity as SIM

    df = spark.createDataFrame(
        [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(16)])
         for i in range(80)] + [(99, [0.0] * 16)],
        "vec_id long, v array<double>",
    )
    fit = SIM.fit_vector_sample(df, "vec_id", "v")
    cent = SIM.kmeans_centroids(df, "vec_id", "v", n_cells=3, n_iter=1, fit=fit)
    cb = SIM.pq_codebooks(df, "vec_id", "v", 16, m=2, k_sub=2, n_iter=1, fit=fit)
    src = df.select(F.col("vec_id").alias("n_id"), F.col("v").alias("n_vec"))
    composed = SIM._nearest_cell(src, cent, "n_vec").select("n_id", "cell").join(
        _composed_pq_encode(df, "vec_id", "v", cb, 16, 2)
        .select(F.col("vec_id").alias("n_id"), "codes"),
        "n_id",
    )
    fused = SIM._index_rows_kernel(
        src, "n_id", "n_vec", SIM._cb_by_sub(cb), 16, 2,
        cent_rows=sorted(cent.collect(), key=lambda r: int(r["cell"])),
    )
    assert composed.exceptAll(fused).count() == 0
    assert fused.exceptAll(composed).count() == 0


def test_ts_features_masked_matches_parity(spark):
    """The single-pass masked TS-formula path must equal the slim
    dedup + join-back parity form on frames with duplicate (group, ts)
    rows carrying different values, kept NULL values and NULL
    timestamps — with and without an explicit order column."""
    import datetime as dt
    import random

    import upgini_spark.operators.timeseries as TS

    base = dt.datetime(2023, 1, 1)
    rnd = random.Random(7)
    rows = []
    for g in ["a", "b"]:
        for i in range(150):
            ts = base + dt.timedelta(hours=rnd.randint(0, 1500))
            v = None if rnd.random() < 0.12 else round(rnd.uniform(-5, 5), 3)
            rows.append((g, ts, v, rnd.randint(0, 10**6)))
            if rnd.random() < 0.3:  # dup ts, DIFFERENT value
                rows.append(
                    (g, ts, round(rnd.uniform(-5, 5), 3), rnd.randint(0, 10**6))
                )
    rows += [("a", None, 1.5, 1), ("a", None, None, 2)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double, ord long")

    specs = [
        ("f_mean", "roll", {"n": 7, "unit": "D", "agg": "mean"}),
        ("f_max", "roll", {"n": 30, "unit": "D", "agg": "max"}),
        ("f_std", "roll", {"n": 7, "unit": "D", "agg": "std"}),
        ("f_med", "roll", {"n": 7, "unit": "D", "agg": "median"}),
        ("f_cnt", "roll", {"n": 7, "unit": "D", "agg": "count"}),
        ("f_lag1", "lag", {"n": 1, "unit": "D"}),
    ]

    def fns():
        out = []
        for o, k, p in specs:
            if k == "roll":
                out.append((o, lambda s, p=p, o=o: TS.roll_feature(
                    s, "ts", ["g"], "v", p["n"], p["unit"], p["agg"], out_col=o)))
            else:
                out.append((o, lambda s, p=p, o=o: TS.lag_feature(
                    s, "ts", ["g"], "v", p["n"], p["unit"], out_col=o)))
        return out

    for oc in (None, "ord"):
        a = TS.ts_features_parity(df, "ts", ["g"], "v", fns(), order_col=oc)
        b = TS.ts_features_masked(df, "ts", ["g"], "v", specs, order_col=oc)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def _packed_exploded_reference(d_groups, df, id_col, tokens_col, max_len):
    """The pre-r6c pack_sequences chunk assembly (one row per TOKEN
    through the chunk shuffle), kept as the equality reference for the
    per-(doc, chunk) array-slice form."""
    from pyspark.sql.window import Window

    from upgini_spark.pipeline.record_ids import global_running_sum

    groups = list(d_groups or [])
    d = df.select(
        *groups,
        F.col(id_col).alias("__pid__"),
        F.col(tokens_col).alias("__ptok__"),
        F.size(tokens_col).cast("long").alias("__pnt__"),
    )
    if groups:
        w = (
            Window.partitionBy(*groups)
            .orderBy(F.col("__pid__").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        d = d.withColumn("__pend__", F.sum("__pnt__").over(w))
    else:
        offs = global_running_sum(
            d.select("__pid__", "__pnt__"),
            [F.col("__pid__").asc()], "__pnt__", "__pend__",
        ).select("__pid__", "__pend__")
        d = d.join(offs, "__pid__")
    tok = (
        d.select(
            *groups,
            "__pid__",
            (F.col("__pend__").cast("long") - F.col("__pnt__")).alias("__poff__"),
            F.posexplode("__ptok__").alias("__pi__", "tok"),
        )
        .withColumn("__pp__", F.col("__poff__") + F.col("__pi__"))
        .withColumn("chunk_id", (F.col("__pp__") / max_len).cast("long"))
        .withColumn("pos", (F.col("__pp__") % max_len).cast("int"))
    )
    agged = tok.groupBy(*groups, "chunk_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.min("__pid__").alias("first_doc"),
        F.max("__pid__").alias("last_doc"),
        F.array_sort(
            F.collect_list(F.struct("pos", "tok", "__pid__"))
        ).alias("__st__"),
    )
    return agged.select(
        *groups,
        "chunk_id",
        "n_tokens",
        F.size(
            F.array_distinct(
                F.transform(F.col("__st__"), lambda s: s["__pid__"])
            )
        ).cast("int").alias("n_docs"),
        "first_doc",
        "last_doc",
        F.transform(F.col("__st__"), lambda s: s["tok"]).alias("tokens"),
    )


def test_pack_sequences_slices_match_exploded(spark):
    """The slice-per-(doc, chunk) chunk assembly must equal the per-token
    explode byte for byte: multi-chunk docs, chunk-aligned boundaries,
    empty/NULL token arrays, in-array NULL tokens, id gaps, and the
    grouped (per-source) path."""
    from upgini_spark.functions.tokens import pack_sequences

    rows = [
        (1, "a", list(range(10))),          # spans multiple 4-chunks
        (2, "a", []),                       # empty -> invisible
        (3, "a", [99]),
        (5, "a", None),                     # NULL array -> invisible
        (7, "a", [1, None, 3]),             # NULL tokens preserved
        (8, "b", list(range(8))),           # exactly two aligned chunks
        (9, "b", [5]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, toks array<int>")
    for groups in (None, ["src"]):
        new = pack_sequences(df, "doc_id", "toks", 4, group_cols=groups)
        ref = _packed_exploded_reference(groups, df, "doc_id", "toks", 4)
        assert new.exceptAll(ref).count() == 0
        assert ref.exceptAll(new).count() == 0


def test_encode_words_map_matches_exploded(spark):
    """The one-row-map encoder must equal the exploded broadcast-join
    form: OOV -> 0, order preserved, empty/NULL texts -> empty arrays."""
    from upgini_spark.functions.tokens import build_word_vocab, encode_words

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "dog  dog unknown"),
         (3, ""), (4, None), (5, "   "), (6, "the the the")],
        "doc_id long, text string",
    )
    vocab = build_word_vocab(df, "text", 3)
    out = {r["doc_id"]: r for r in
           encode_words(df, "doc_id", "text", vocab).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # vocab: the(5) dog(2) cat(1 by asc tie over mat/on/sat? no: count desc,
    # word asc) -> the=1, dog=2, cat=3
    assert out[6]["token_ids"] == [1, 1, 1]
    assert out[3]["token_ids"] == [] and out[3]["n_tok"] == 0
    assert out[4]["token_ids"] == [] and out[4]["n_oov"] == 0
    assert out[5]["token_ids"] == []
    assert out[2]["token_ids"][:2] == [2, 2] and out[2]["n_oov"] == 1
    enc1 = out[1]
    assert enc1["n_tok"] == 6 and enc1["token_ids"][0] == 1
    assert enc1["token_ids"][4] == 1  # second 'the'


def test_driver_lloyd_fits_match_distributed(spark):
    """kmeans_centroids / pq_codebooks driver-side numpy fits must equal
    the distributed Lloyd loops exactly (same seeds, same assignment
    ordering, same HALF_UP-rounded means), and ragged samples must fall
    back to the distributed path."""
    import upgini_spark.functions.similarity as SIM

    corpus = spark.createDataFrame(
        [(i, [float((i * 13 + d * 7) % 23) / 7.0 - 1.5 for d in range(8)])
         for i in range(300)],
        "vid long, v array<double>",
    )
    old = SIM._DRIVER_FIT_ELEMS
    try:
        SIM._DRIVER_FIT_ELEMS = 10**9
        cent_drv = SIM.kmeans_centroids(
            corpus, "vid", "v", n_cells=5, n_iter=2).collect()
        cb_drv = SIM.pq_codebooks(
            corpus, "vid", "v", 8, m=2, k_sub=3, n_iter=2).collect()
        SIM._DRIVER_FIT_ELEMS = 0  # force the distributed loops
        cent_dist = SIM.kmeans_centroids(
            corpus, "vid", "v", n_cells=5, n_iter=2).collect()
        cb_dist = SIM.pq_codebooks(
            corpus, "vid", "v", 8, m=2, k_sub=3, n_iter=2).collect()
    finally:
        SIM._DRIVER_FIT_ELEMS = old
    k = lambda r: (r[0] if len(r) < 3 else (r[0], r[1]))  # noqa: E731
    for a, b in zip(sorted(cent_drv, key=k), sorted(cent_dist, key=k)):
        assert a["cell"] == b["cell"]
        assert list(a["cvec"]) == list(b["cvec"])  # exact float equality
    for a, b in zip(sorted(cb_drv, key=k), sorted(cb_dist, key=k)):
        assert (a["sub"], a["cell"]) == (b["sub"], b["cell"])
        assert list(a["cvec"]) == list(b["cvec"])

    # ragged sample (one NULL vector) -> collect_fit_matrix refuses
    ragged = corpus.union(
        spark.createDataFrame([(999, None)], "vid long, v array<double>"))
    fit = SIM.fit_vector_sample(ragged, "vid", "v")
    assert SIM.collect_fit_matrix(fit[1], fit[0], 8) is None
    # and the public entry still works (falls back internally)
    cent_ragged = SIM.kmeans_centroids(
        ragged, "vid", "v", n_cells=5, n_iter=1, fit=fit).collect()
    assert len(cent_ragged) >= 1


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up must agree with F.round(double, 9) bit for bit on
    representative values (incl. shortest-repr decimal midpoints, where
    banker's rounding would diverge)."""
    import upgini_spark.functions.similarity as SIM

    vals = [0.1234567895, -0.1234567895, 1.0000000005, 2.5e-9, -2.5e-9,
            0.123456789123, 7.000000001499999, -3.1415926535897931,
            1e20, 5e-10, 1.5e-9, 0.0, -0.0]
    rows = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.round("x", 9).alias("r")).collect()
    import struct as st
    for v, r in zip(vals, rows):
        a, b = SIM._round_half_up(v, 9), r["r"]
        assert st.pack("d", a) == st.pack("d", b), (v, a, b)


def test_range_partitions_bounds(spark):
    """_range_partitions: floored at default parallelism, capped at the
    configured shuffle partitions, scaled by the size estimate."""
    from upgini_spark.pipeline.record_ids import _range_partitions

    dp = spark.sparkContext.defaultParallelism
    conf_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tiny = spark.range(100).toDF("id")
    n = _range_partitions(tiny)
    assert dp <= n <= conf_n or n == conf_n  # tiny frame -> the dp floor
    assert n == max(1, min(conf_n, dp))
    # a checkpointed frame has an exact (small) size estimate -> floor
    ck = spark.range(1000).toDF("id").localCheckpoint(eager=True)
    assert _range_partitions(ck) == max(1, min(conf_n, dp))


def test_asof_arrow_bucket_invariance(spark):
    """The arrow engine's result must not depend on the bucket count
    (the adaptive default changes it with input size)."""
    from upgini_spark.joins.asof import asof_join

    left = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(300)], "eid long, k long, t double"
    ).select("eid", "k", F.timestamp_seconds(F.col("t") * 60).alias("ts"))
    right = spark.createDataFrame(
        [(i % 7, float(i) + 0.5, i * 10) for i in range(0, 300, 3)],
        "rk long, rt double, v long",
    ).select("rk", F.timestamp_seconds(F.col("rt") * 60).alias("rts"), "v")
    outs = []
    for nb in (None, 3, 64):
        o = asof_join(
            left, right, left_on="ts", right_on="rts", by_left="k",
            by_right="rk", engine="arrow", n_buckets=nb, keep_match_ts=True,
        )
        outs.append(o)
    for o in outs[1:]:
        assert outs[0].exceptAll(o).count() == 0
        assert o.exceptAll(outs[0]).count() == 0
