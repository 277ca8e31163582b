"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; random-hyperplane
LSH bucketing as the scale path (bucketing turns the O(N·M) cross join
into per-bucket joins — at 10^12 rows the bucket key is the shuffle key).
Planes are derived deterministically from md5 bits, so results are
reproducible and oracle-checkable without storing plane matrices.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from upgini_spark.operators.binary import _dot, _norm2, cosine_similarity


def _staged_cos(a_vec: str, b_vec: str, a_norm: str, b_norm: str):
    """Pairwise cosine with the per-side norms STAGED as columns before
    the join (see _nearest_cell's docstring): identical float expression
    to ``cosine_similarity`` — sqrt(Σv²) per side, one multiply, one
    divide — but each side's aggregate runs once per ROW instead of once
    per PAIR (3 array aggregates → 1 on every join-scoring path)."""
    denom = F.col(a_norm) * F.col(b_norm)
    return F.when(denom != 0, _dot(F.col(a_vec), F.col(b_vec)) / denom)


def auto_n_planes(
    n_rows: int, target_bucket_rows: int = 64, min_planes: int = 8
) -> int:
    """Size the hyperplane family so the EXPECTED bucket stays joinable:
    ``n_planes = max(min, ceil(log2(N / target_bucket_rows)))`` — then
    N / 2^n_planes <= target_bucket_rows at any N, so the per-bucket
    self-join cost is bounded as the corpus grows (the round-2 gap:
    a fixed 8 planes = 256 buckets melts down at 10^9+ rows)."""
    if n_rows <= target_bucket_rows:
        return min_planes
    return max(min_planes, math.ceil(math.log2(n_rows / target_bucket_rows)))


def auto_n_cells(n_rows: int, min_cells: int = 8, max_cells: int = 65_536) -> int:
    """IVF cell count ≈ sqrt(N): per-cell candidate lists are O(sqrt(N))
    and the centroid table stays broadcastable (capped)."""
    return min(max_cells, max(min_cells, math.ceil(math.sqrt(max(n_rows, 1)))))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors by cosine (desc, id asc tie-break). The small
    query side should be broadcast (Catalyst does for a filtered query set)."""
    q = queries.select(
        F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec"),
        _norm2(F.col(query_vec)).alias("__qn__"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("n_id"), F.col(corpus_vec).alias("n_vec"),
        _norm2(F.col(corpus_vec)).alias("__nn__"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", _staged_cos("q_vec", "n_vec", "__qn__", "__nn__"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _plane_sign(p: int, d: int) -> float:
    """+1.0 if the first hex digit of md5(f"{p}_{d}") >= '8' else -1.0 —
    the exact value the DuckDB oracles derive in SQL (knn_cosine_lsh
    planes CTE), computed driver-side so plans carry only literals."""
    import hashlib

    return 1.0 if hashlib.md5(f"{p}_{d}".encode()).hexdigest()[0] >= "8" else -1.0


def hyperplane_sign_bits(
    vec_col: str, n_planes: int = 8, dims: int = 64, plane_offset: int = 0
) -> F.Column:
    """LSH bucket key: concat of sign(v · plane_p) bits, where
    plane_p[d] = +1 if the first md5 hex digit of "p_d" >= '8' else −1.
    Deterministic, engine-portable, no stored state. ``plane_offset``
    selects an independent plane family (band b uses offset b*n_planes).

    Scale rule: bucket count is 2^n_planes — size n_planes ≈
    log2(N / target_bucket_rows) so buckets stay joinable; a fixed 8
    planes = 256 global buckets is NOT enough at 10^9+ rows."""
    v = F.col(vec_col)
    bits = []
    for p in range(plane_offset, plane_offset + n_planes):
        # Plane signs are pure functions of (p, d): evaluate the md5 bit
        # in PYTHON (bit-identical to the SQL form the oracles replay) and
        # ship one literal array per plane. The previous per-dim
        # when(md5(substring)) chain built n_bands*n_planes*dims nested
        # nodes (1024 at 2x8x64) that the optimizer constant-folded on
        # EVERY plan compile — a measured 6x wall-time cliff at sf0.1
        # (BENCH/BASELINE.md round-4 note).
        signs = F.array(*[F.lit(_plane_sign(p, d)) for d in range(dims)])
        dot = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _banded(df: DataFrame, id_alias: str, vec_alias: str, id_col: str, vec_col: str,
            n_planes: int, n_bands: int, dims: int,
            norm_alias: str | None = None) -> DataFrame:
    """Explode a table into (band, bucket) candidate rows — one row per
    band, each with an independent plane family. Multi-band OR-probing:
    a pair collides if ANY band agrees, recall 1-(1-p^b)^L.
    ``norm_alias`` additionally stages the vector's L2 norm (computed
    once per input row, BEFORE the band explode) for _staged_cos."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            hyperplane_sign_bits(vec_col, n_planes, dims, plane_offset=b * n_planes).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    extra = [_norm2(F.col(vec_col)).alias(norm_alias)] if norm_alias else []
    keep = [id_alias, vec_alias] + ([norm_alias] if norm_alias else [])
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        *extra,
        F.explode(bands).alias("bb"),
    ).select(*keep, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
    n_planes: int | None = 8,
    dims: int = 64,
    n_bands: int = 1,
    target_bucket_rows: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s), then exact cosine rank within the candidate set. The
    (band, bucket) equi-join replaces the cross join — this is the 100TB
    plan. ``n_bands`` > 1 unions independent plane families (multi-probe
    OR) for recall; duplicates collapse before ranking.

    ``n_planes=None`` auto-sizes from the corpus count via
    :func:`auto_n_planes`, keeping the expected bucket at
    ``target_bucket_rows`` as N grows."""
    if n_planes is None:
        n_planes = auto_n_planes(corpus.count(), target_bucket_rows)
    q = _banded(queries, "q_id", "q_vec", query_id, query_vec, n_planes,
                n_bands, dims, norm_alias="__qn__")
    c = _banded(corpus, "n_id", "n_vec", corpus_id, corpus_vec, n_planes,
                n_bands, dims, norm_alias="__nn__")
    scored = (
        q.join(c, on=["band", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", _staged_cos("q_vec", "n_vec", "__qn__", "__nn__"))
        .select("q_id", "n_id", "cos")
        .distinct()  # same pair may collide in several bands
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int | None = 8,
    n_bands: int = 4,
    dims: int = 64,
    target_bucket_rows: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs through banded hyperplane LSH —
    the scale path for dedup.embedding_near_dup_pairs (whose all-pairs
    form is an O(N²) BroadcastNestedLoopJoin).

    Per band: bucket self-join (equi-join on the 2^n_planes-way key),
    id_a < id_b, exact cosine ≥ threshold. Bands are OR-ed and duplicate
    pairs collapsed. For sign-LSH the per-plane agree probability is
    1 − acos(cos)/π, so at 0.95+ thresholds a handful of bands gives
    ~certain recall (miss = (1−p^b)^L). Giant identical buckets are
    still quadratic in bucket size — ``n_planes=None`` auto-sizes via
    :func:`auto_n_planes` so the EXPECTED bucket stays at
    ``target_bucket_rows`` as N grows (identical-vector clusters remain
    quadratic by nature; cap them upstream with exact dedup first).
    """
    if n_planes is None:
        n_planes = auto_n_planes(df.count(), target_bucket_rows)
    # materialize the banded frame ONCE (eager localCheckpoint): the
    # bucket SELF-join consumes it as both sides and neither static
    # ReuseExchange nor AQE stage reuse fires for the aliased twin, so
    # the n_bands × n_planes sign-bit dot products (and any upstream
    # spread) otherwise compute twice (measured 2.1 → 1.6 s at 20k×64,
    # outputs identical)
    banded = _banded(df, "id_a", "va", id_col, vec_col, n_planes, n_bands,
                     dims, norm_alias="__an__").localCheckpoint(eager=True)
    other = banded.select(
        F.col("id_a").alias("id_b"), F.col("va").alias("vb"),
        F.col("__an__").alias("__bn__"), "band", "bucket",
    )
    return (
        banded.join(other, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _staged_cos("va", "vb", "__an__", "__bn__"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .distinct()
    )


def _pyfold_norm(v: list[float]) -> float:
    """sqrt of the left-fold Σv² — the EXACT IEEE sequence of
    operators.binary._norm2 (acc = acc + v*v, then sqrt), evaluated
    driver-side for broadcast-small centroid tables."""
    acc = 0.0
    for x in v:
        acc = acc + x * x
    return math.sqrt(acc)


# Arrow-kernel dispatch threshold: the mapInPandas assignment pays a
# fixed Python/Arrow toll per stage, so it only wins when the per-row
# score work is big enough — measured at sf1.0/local[32]: 142 cells x
# 64 dims (9088 mul-adds/row) runs 2.6 s JVM vs 1.6 s kernel, while the
# 8x32 PQ subcell assignment REGRESSED under the kernel. Crossover is
# around a few thousand mul-adds per row.
_KERNEL_MIN_WORK = 4096


def _nearest_cell(df: DataFrame, cent: DataFrame, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment via a broadcast join + struct-max
    aggregation (map-side combinable — no per-row window shuffle):
    argmax cosine, ties to the SMALLEST cell id. ``cent`` must have
    columns (cell int, cvec array<double>) and be broadcast-small.

    The vector rides INSIDE the max struct rather than the grouping key —
    hashing a wide array per (row × cell) would dominate the agg at
    scale; (s, nc) is unique within a group, so the vector field is never
    actually compared. Rows sharing the non-vector keys collapse to one
    assignment (ids are expected unique).

    Norms are STAGED per row / per centroid BEFORE the crossJoin (the r4
    higher-order-lambda lesson applied to joins). When the per-row score
    work is heavy enough to amortize the Python boundary
    (cells × dims ≥ _KERNEL_MIN_WORK), the score matrix is instead
    computed in the bit-exact Arrow kernel :func:`_nearest_cell_kernel`.
    Both paths produce identical scores and ties."""
    from upgini_spark.operators.binary import _dot, _norm2

    rows = sorted(
        cent.select("cell", "cvec").collect(), key=lambda r: int(r["cell"])
    )
    dim = len(rows[0]["cvec"]) if rows else 0
    if len(rows) * dim >= _KERNEL_MIN_WORK:
        return _nearest_cell_kernel(df, rows, vec_col)

    keys = [c for c in df.columns if c != vec_col]
    dfn = df.withColumn("__vn__", _norm2(F.col(vec_col)))
    centn = cent.withColumn("__cn__", _norm2(F.col("cvec")))
    denom = F.col("__vn__") * F.col("__cn__")
    scored = dfn.crossJoin(F.broadcast(centn)).withColumn(
        "__s__",
        F.when(denom != 0, _dot(F.col(vec_col), F.col("cvec")) / denom),
    )
    best = scored.groupBy(*keys).agg(
        F.max(
            F.struct(
                F.col("__s__").alias("s"),
                (-F.col("cell")).alias("nc"),
                F.col(vec_col).alias("v"),
            )
        ).alias("__b__")
    )
    return best.select(
        *keys,
        F.col("__b__.v").alias(vec_col),
        (-F.col("__b__.nc")).cast("int").alias("cell"),
    )


def _nearest_cell_kernel(df: DataFrame, rows: list, vec_col: str) -> DataFrame:
    """Arrow-kernel form of :func:`_nearest_cell` for heavy score
    matrices. ``rows`` is the collected (cell, cvec) table sorted by
    cell id.

    The N×k score matrix is computed in an Arrow ``mapInPandas`` kernel
    (guide §4.2 — hand whole batches to vectorized numpy instead of
    evaluating k interpreted higher-order dot-folds per row; measured
    ~8× on the 20k×142 assignment at sf1.0). Bit-exactness contract: the
    kernel accumulates dot products and norms PER DIMENSION in array
    order (``acc = acc + x*y`` — numpy ufuncs round each multiply and
    add separately, no FMA), i.e. the identical IEEE sequence as the
    ``F.aggregate`` left fold in ``operators.binary._dot``/``_norm2``,
    so every score is bit-identical to the previous crossJoin form and
    the k-means oracles still hash-match. Spark's ordering semantics are
    replicated per row: s=NULL (zero/NULL denom, NULL or
    dimension-mismatched vectors) loses to any real score, NaN beats
    every real score, and all ties fall to the smallest cell id.

    Per-row winners then collapse through the same struct-max
    aggregation as before (max over per-row maxes == max over all
    (row × cell) pairs), so rows sharing the non-vector keys still fold
    to one assignment with unchanged tie-break semantics."""
    import numpy as np

    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    keys = [c for c in df.columns if c != vec_col]
    cell_ids = [int(r["cell"]) for r in rows]
    cvecs = [[float(x) for x in r["cvec"]] for r in rows]
    cnorms = [_pyfold_norm(v) for v in cvecs]

    out_schema = StructType(
        [df.schema[k] for k in keys]
        + [
            df.schema[vec_col],
            StructField("__s__", DoubleType(), True),
            StructField("__cell__", IntegerType(), True),
        ]
    )

    def assign(batches):
        import pandas as pd

        if not cell_ids:
            return
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            raw = list(pdf[vec_col])
            dims = {len(v) for v in raw if v is not None}
            dim = max(dims) if dims else 0
            # NULL or dimension-mismatched vectors score NULL against
            # every cell (zip_with pads with null -> null dot) — model
            # them as zero vectors, whose denom==0 path yields the same
            # NULL score and smallest-cell fallback.
            bad = np.array(
                [v is None or len(v) != dim for v in raw], dtype=bool
            )
            V = np.zeros((n, dim), dtype=np.float64)
            for i, v in enumerate(raw):
                if not bad[i]:
                    V[i, :] = v
            V[bad, :] = 0.0
            acc = np.zeros(n)
            for d in range(dim):
                x = V[:, d]
                acc = acc + x * x
            vn = np.sqrt(acc)
            # per-row running best under Spark struct-max ordering:
            # class 0 = NULL score (smallest), 2 = real, 3 = NaN (largest)
            best_cls = np.full(n, -1, dtype=np.int8)
            best_s = np.full(n, np.nan)
            best_cell = np.full(n, cell_ids[0], dtype=np.int64)
            for c_id, cv, cn in zip(cell_ids, cvecs, cnorms):
                acc = np.zeros(n)
                for d in range(len(cv)):
                    acc = acc + V[:, d] * cv[d]
                denom = vn * cn
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = acc / denom
                isnull = denom == 0.0
                # class-0 scores are NULL: force NaN so the tie compare
                # below is always False (two NULLs tie -> smaller cell)
                s = np.where(isnull, np.nan, s)
                cls = np.where(
                    isnull, 0, np.where(np.isnan(s), 3, 2)
                ).astype(np.int8)
                # iterate cells ASCENDING: strict > keeps the first
                # (smallest) cell on every tie, matching max(struct(s,
                # -cell)); NaN>NaN and NULL-vs-NULL both compare False
                take = (cls > best_cls) | ((cls == best_cls) & (s > best_s))
                best_cls = np.where(take, cls, best_cls)
                best_s = np.where(take, s, best_s)
                best_cell = np.where(take, c_id, best_cell)
            out = pdf[keys].copy()
            out[vec_col] = pdf[vec_col]
            s_col = pd.Series(best_s)
            s_col[best_cls == 0] = None
            out["__s__"] = s_col
            out["__cell__"] = best_cell.astype("int32")
            yield out

    scored = df.mapInPandas(assign, out_schema)
    best = scored.groupBy(*keys).agg(
        F.max(
            F.struct(
                F.col("__s__").alias("s"),
                (-F.col("__cell__")).alias("nc"),
                F.col(vec_col).alias("v"),
            )
        ).alias("__b__")
    )
    return best.select(
        *keys,
        F.col("__b__.v").alias(vec_col),
        (-F.col("__b__.nc")).cast("int").alias("cell"),
    )


_DRIVER_FIT_ELEMS = 16_000_000  # sample rows × dims ceiling for driver-side fits


def _round_half_up(v: float, dp: int) -> float:
    """Replicate Spark's ROUND(double, dp): HALF_UP over the SHORTEST
    round-trip decimal representation (java ``BigDecimal.valueOf`` ==
    ``Double.toString``; Python ``repr()`` is the same shortest
    correctly-rounded decimal), so the driver-side Lloyd means round to
    exactly the bits ``F.round`` produces."""
    import decimal
    from decimal import ROUND_HALF_UP, Decimal

    if v != v or v == float("inf") or v == float("-inf"):
        return v
    with decimal.localcontext() as ctx:
        ctx.prec = 400  # |double| ≤ ~1e308: never trimmed at any dp
        r = float(
            Decimal(repr(v)).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP)
        )
    # java BigDecimal has no signed zero: F.round(-0.0 / -tiny) = +0.0,
    # python Decimal keeps the sign — normalize (the driver hash sees
    # the sign bit; the CLAUDE.md -0.0 class)
    return r + 0.0 if r == 0.0 else r


def collect_fit_matrix(fsample: DataFrame, n_sample: int, dim_hint: int):
    """Collect the ≤sample_cap fit sample into one (n × dim) float64
    matrix for the driver-side Lloyd fits, or None to keep the
    distributed path. Engages only when the sample is CLEAN — every
    vector non-null and of one uniform length with no NULL elements
    (verified by one tiny agg over the checkpointed sample; Spark's avg
    SKIPS null elements, a dense matrix cannot, while NaN flows through
    both paths identically) — and bounded (n × dim ≤ 16M elements ≈
    128 MB, the same driver-bound spirit as the ≤100k metrics collect
    and the ≤1M-edge union-find dispatch). At any corpus size the fit
    sample is already ≤100k rows by construction, so this is a latency
    dispatch, not a scale gamble: ragged/huge-dim inputs keep the
    unchanged distributed loop."""
    import numpy as np

    if n_sample <= 0 or dim_hint <= 0 or n_sample * dim_hint > _DRIVER_FIT_ELEMS:
        return None
    st = fsample.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("__fv__").isNull(), 1).otherwise(0)).alias("nv"),
        F.min(F.size("__fv__")).alias("lo"),
        F.max(F.size("__fv__")).alias("hi"),
        F.max(
            F.when(F.exists("__fv__", lambda x: x.isNull()), 1).otherwise(0)
        ).alias("ne"),
    ).collect()[0]
    if (
        not st["n"]
        or (st["nv"] or 0) > 0
        or (st["ne"] or 0) > 0
        or st["lo"] != st["hi"]
        or not st["lo"]
        or st["n"] * st["lo"] > _DRIVER_FIT_ELEMS
    ):
        return None
    pdf = fsample.select("__fv__").toPandas()
    return np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__fv__"]])


def _kmeans_fit_driver(V, seed_vecs, n_cells, n_iter, round_dp):
    """Driver-side twin of the distributed Lloyd loop in
    :func:`kmeans_centroids` (engaged by :func:`collect_fit_matrix`):
    the assignment replays `_nearest_cell_kernel`'s exact sequence —
    per-dimension ``acc = acc + x*y`` folds, ``_pyfold_norm`` centroid
    norms, NULL denom loses / NaN beats real / ties to the smallest
    cell — and per-dim means round HALF_UP like ``F.round``; summation
    order differences are absorbed by the round_dp quantum (the
    documented partition-invariance contract). Cells that lose every
    point drop out, ids stay sparse ascending."""
    import numpy as np

    cents = [
        (i, [float(x) for x in v]) for i, v in enumerate(seed_vecs[:n_cells])
    ]
    n, dim = V.shape
    acc = np.zeros(n)
    for d in range(dim):
        x = V[:, d]
        acc = acc + x * x
    vn = np.sqrt(acc)
    for _ in range(n_iter):
        best_cls = np.full(n, -1, dtype=np.int8)
        best_s = np.full(n, np.nan)
        best_cell = np.full(n, cents[0][0] if cents else 0, dtype=np.int64)
        for c_id, cv in cents:
            if len(cv) != dim:
                s = np.full(n, np.nan)
                cls = np.zeros(n, dtype=np.int8)
            else:
                acc = np.zeros(n)
                for d in range(dim):
                    acc = acc + V[:, d] * cv[d]
                cn = _pyfold_norm(cv)
                denom = vn * cn
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = acc / denom
                isnull = denom == 0.0
                s = np.where(isnull, np.nan, s)
                cls = np.where(
                    isnull, 0, np.where(np.isnan(s), 3, 2)
                ).astype(np.int8)
            take = (cls > best_cls) | ((cls == best_cls) & (s > best_s))
            best_cls = np.where(take, cls, best_cls)
            best_s = np.where(take, s, best_s)
            best_cell = np.where(take, c_id, best_cell)
        new = []
        for c_id, _cv in cents:
            mask = best_cell == c_id
            cnt = int(mask.sum())
            if cnt == 0:
                continue
            mean = V[mask].sum(axis=0) / cnt
            new.append(
                (c_id, [_round_half_up(float(x), round_dp) for x in mean])
            )
        cents = new
    return cents


def _pq_fit_driver(V, seed_vecs, m, dim, k_sub, n_iter, round_dp):
    """Driver-side twin of the distributed PQ Lloyd loop in
    :func:`pq_codebooks`: per-subspace argmin-L2 with
    `_nearest_subcell`'s exact per-dimension ``(x-y)^2`` folds and
    min-struct ordering (ties to the smallest cell, NaN is the
    maximum), HALF_UP per-dim means, and the same m×k_sub density
    contract enforced after every step."""
    import numpy as np

    dm = dim // m
    cb = {
        j: [
            (i, [float(x) for x in v[j * dm:(j + 1) * dm]])
            for i, v in enumerate(seed_vecs[:k_sub])
        ]
        for j in range(m)
    }
    n = V.shape[0]
    subs = [V[:, j * dm:(j + 1) * dm] for j in range(m)]
    for _ in range(n_iter):
        new_cb = {}
        for j in range(m):
            S = subs[j]
            cells = cb[j]
            best_cls = np.full(n, 4, dtype=np.int8)
            best_d = np.full(n, np.nan)
            best_cell = np.full(n, cells[0][0] if cells else 0, dtype=np.int64)
            for c_id, cv in cells:
                if len(cv) != dm:
                    dd = np.full(n, np.nan)
                    cls = np.zeros(n, dtype=np.int8)
                else:
                    acc = np.zeros(n)
                    for d in range(dm):
                        t = S[:, d] - cv[d]
                        acc = acc + t * t
                    dd = acc
                    cls = np.where(np.isnan(dd), 3, 2).astype(np.int8)
                take = (cls < best_cls) | ((cls == best_cls) & (dd < best_d))
                best_cls = np.where(take, cls, best_cls)
                best_d = np.where(take, dd, best_d)
                best_cell = np.where(take, c_id, best_cell)
            rows = []
            for c_id, _cv in cells:
                mask = best_cell == c_id
                cnt = int(mask.sum())
                if cnt == 0:
                    continue
                mean = S[mask].sum(axis=0) / cnt
                rows.append(
                    (c_id, [_round_half_up(float(x), round_dp) for x in mean])
                )
            new_cb[j] = rows
        cb = new_cb
        if sum(len(v) for v in cb.values()) != m * k_sub:
            raise ValueError(
                f"PQ codebook collapsed to "
                f"{sum(len(v) for v in cb.values())} (sub, cell) rows, "
                f"expected m*k_sub = {m * k_sub}: a Lloyd step emptied a "
                "codebook cell (duplicate seed subvectors?) — lower k_sub "
                "or dedup the training vectors"
            )
    return [(j, c, v) for j in range(m) for c, v in cb[j]]


def fit_vector_sample(
    corpus: DataFrame, id_col: str, vec_col: str, sample_cap: int = 100_000
) -> tuple[int, DataFrame]:
    """(count, eager-checkpointed ≤``sample_cap``-row (__fid__, __fv__)
    training sample) — the shared fit input of ``kmeans_centroids`` and
    ``pq_codebooks``, split out so :func:`build_ivf_pq_index` counts and
    materializes the corpus ONCE instead of once per fit (each count +
    checkpoint is a full corpus scan — two redundant jobs per index
    build)."""
    from upgini_spark.functions.sampling import hash_sample_exact

    n = corpus.count()
    s = corpus.select(
        F.col(id_col).alias("__fid__"), F.col(vec_col).alias("__fv__")
    )
    if n > sample_cap:
        s = hash_sample_exact(s, sample_cap, ["__fid__"])
    # the sample feeds ~5 jobs (init + per-iteration assign/update) —
    # materialize once so the corpus scan / top-n sort never re-executes;
    # bounded by sample_cap rows.  Coalesce to ~6.25k rows/partition
    # first: the fit stages are tiny (≤sample_cap rows) but inherit the
    # CORPUS partitioning, so every Lloyd assign/update stage otherwise
    # schedules a full task wave (32 Arrow-kernel tasks for a 2k-row
    # sample — measured 2.3→1.0 s on the two overlapped IVF+PQ fits at
    # sf0.1), while a single partition serializes the one genuinely
    # compute-heavy stage (the per-row assign: a 20k-row sample ran its
    # 20k×cells×dims fold on ONE core — 1.1-1.8 s that 4 partitions cut
    # ~4×).  Input-adaptive, not a core-count constant: a 2k sample still
    # fits one partition, the 100k cap gets 16 on any cluster, and
    # coalesce beyond the current partition count is a no-op.  Partition
    # count does not change results: the 9dp round absorbs summation-
    # order noise (the documented partition-invariance contract).
    parts = max(1, -(-min(n, sample_cap) // 6_250))
    return n, s.coalesce(parts).localCheckpoint(eager=True)


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int | None = None,
    n_iter: int = 2,
    sample_cap: int = 100_000,
    round_dp: int = 9,
    fit: tuple[int, DataFrame] | None = None,
    seed_vecs: list | None = None,
    fit_matrix=None,
) -> DataFrame:
    """Deterministic Lloyd-refined IVF centroids as a (cell, cvec)
    DataFrame. Init = the md5-hash-ordered corpus sample (the round-2
    ``deterministic_centroids`` seed), then ``n_iter`` Lloyd steps:
    assign → per-dim mean → round to ``round_dp`` decimals.
    ``seed_vecs`` (optional) injects an already-fetched ordered seed
    prefix — :func:`build_ivf_pq_index` fetches ONE (md5(id), id)-ordered
    prefix and shares it between this fit and :func:`pq_codebooks`
    instead of each fit running its own TakeOrdered job.
    ``fit_matrix`` (optional) likewise shares one
    :func:`collect_fit_matrix` collect; when the sample is clean and
    driver-bounded the whole Lloyd loop runs in numpy on the driver
    (`_kmeans_fit_driver` — a chain of ~2 tiny Spark jobs per iteration
    becomes zero), with the distributed loop unchanged as the fallback
    and for ragged/oversized samples.

    Every step is engine-portable and SQL-replayable: the rounding
    quantum (1e-9) dwarfs float-summation order noise (~1e-12 for 1e5-row
    cells), so Spark and DuckDB converge to bit-identical centroids.
    Training runs on an md5 sample capped at ``sample_cap`` rows (k-means
    needs a representative sample, not the corpus); the full corpus is
    only touched by the single final assignment in the caller.
    ``n_cells=None`` auto-sizes to ~sqrt(N) via :func:`auto_n_cells`.
    Cells that lose every point drop out (ids stay sparse, consistently
    on both engines)."""
    if fit is None:
        fit = fit_vector_sample(corpus, id_col, vec_col, sample_cap)
    n, fsample = fit
    if n_cells is None:
        n_cells = auto_n_cells(n)
    sample = fsample.select(
        F.col("__fid__").alias("__kid__"), F.col("__fv__").alias("__kv__")
    )
    if seed_vecs is None:
        h = F.md5(F.col("__kid__").cast("string"))
        seed_vecs = list(
            sample.orderBy(h, F.col("__kid__"))
            .limit(n_cells)
            .select("__kv__")
            .toPandas()["__kv__"]
        )
    spark = corpus.sparkSession
    if n_iter > 0 and seed_vecs:
        if fit_matrix is None:
            dim_hint = max(len(v) for v in seed_vecs[:n_cells])
            fit_matrix = collect_fit_matrix(
                fsample, min(n, sample_cap), dim_hint
            )
        if fit_matrix is not None:
            cents = _kmeans_fit_driver(
                fit_matrix, seed_vecs, n_cells, n_iter, round_dp
            )
            return spark.createDataFrame(
                [(c, v) for c, v in cents], "cell int, cvec array<double>"
            )
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(seed_vecs[:n_cells])],
        "cell int, cvec array<double>",
    )
    for _ in range(n_iter):
        assigned = _nearest_cell(sample, cent_df, "__kv__")
        per_dim = (
            assigned.select("cell", F.posexplode("__kv__").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("x"), round_dp).alias("m"))
        )
        cent_df = (
            per_dim.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
            .select(F.col("cell").cast("int"), "cvec")
        )
        # small (n_cells rows) — materialize so each Lloyd step is one job
        cent_df = spark.createDataFrame(
            cent_df.toPandas(), "cell int, cvec array<double>"
        )
    return cent_df


def cosine_topk_ivf_kmeans(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 2,
    n_iter: int = 2,
    cell_cap: int | None = None,
) -> DataFrame:
    """IVF approximate top-k with Lloyd-refined, auto-sized centroids —
    the scale evolution of :func:`cosine_topk_ivf` (which pins a handful
    of md5-sampled centroids as literal expressions): centroids live in a
    broadcast DataFrame, so cells ≈ sqrt(N) works at any corpus size; the
    corpus is scanned once for assignment, queries probe their ``n_probe``
    nearest cells, and ranking is exact within candidates.

    ``cell_cap`` bounds the WORST-CASE per-query candidate list at
    ``n_probe × cell_cap`` even under cell skew (a hot cell with ≫ √N
    members would otherwise blow up every query that probes it): each
    cell keeps only its ``cell_cap`` members most similar to the cell
    centroid (a static index-build rank — one broadcast join + one
    per-cell window, fully distributed). Rows cut from a cell are lost
    to recall exactly like standard IVF list truncation; the recall
    trade is measured in tests/test_round4_fixes.py
    (test_ivf_cell_cap_bounds_and_recall)."""
    cent = kmeans_centroids(
        corpus, corpus_id, corpus_vec, n_cells=n_cells, n_iter=n_iter,
    )
    c = _nearest_cell(
        corpus.select(
            F.col(corpus_id).alias("n_id"), F.col(corpus_vec).alias("n_vec")
        ),
        cent,
        "n_vec",
    )
    if cell_cap is not None:
        wc = Window.partitionBy("cell").orderBy(
            F.col("__cs__").desc(), F.col("n_id").asc()
        )
        c = (
            c.join(F.broadcast(cent), on="cell")
            .withColumn("__cs__", cosine_similarity(F.col("n_vec"), F.col("cvec")))
            .withColumn("__cr__", F.row_number().over(wc))
            .filter(F.col("__cr__") <= cell_cap)
            .select("n_id", "n_vec", "cell")
        )
    q0 = queries.select(
        F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec"),
        _norm2(F.col(query_vec)).alias("__qn__"),
    )
    qs = q0.crossJoin(
        F.broadcast(cent.withColumn("__cn__", _norm2(F.col("cvec"))))
    ).withColumn("__s__", _staged_cos("q_vec", "cvec", "__qn__", "__cn__"))
    wq = Window.partitionBy("q_id").orderBy(F.col("__s__").desc(), F.col("cell").asc())
    q = (
        qs.withColumn("__rn__", F.row_number().over(wq))
        .filter(F.col("__rn__") <= n_probe)
        .select("q_id", "q_vec", "__qn__", "cell")
    )
    scored = (
        q.join(c.withColumn("__nn__", _norm2(F.col("n_vec"))), on="cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", _staged_cos("q_vec", "n_vec", "__qn__", "__nn__"))
        .select("q_id", "n_id", "cos")
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )


# --------------------------------------------------------------------------
# Product quantization (IVF-PQ building block, r5 continuation). PQ is the
# standard memory-scale path for ANN over 10^9+ vectors: d-dim vectors
# compress to m uint8 codes (here d=64 → m subspace ids), and query-time
# scoring is O(m) table lookups instead of O(d) multiply-adds — the
# distance table is built ONCE per query against the (m × k_sub)-row
# codebook, then every corpus row costs m array lookups. Codebooks train
# with the same deterministic 9dp-rounded Lloyd recipe as
# ``kmeans_centroids`` (md5-ordered seed, argmin-L2 assignment with ties
# to the smallest cell), so the whole train → encode → ADC-score pipeline
# is bit-replayable in DuckDB SQL (see the knn_cosine_pq_adc oracle).
# --------------------------------------------------------------------------


def _l2sq(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvectors(vec_col: str, m: int, dim: int) -> F.Column:
    dm = dim // m
    return F.array(
        *[F.slice(F.col(vec_col), j * dm + 1, dm) for j in range(m)]
    )


def _nearest_subcell(long_df: DataFrame, cb: DataFrame) -> DataFrame:
    """Per-(row, subspace) argmin-L2 codebook assignment — ties to the
    SMALLEST cell id, subvector riding inside the min struct exactly
    like ``_nearest_cell``'s cosine twin.

    Same Arrow-kernel design as :func:`_nearest_cell` (guide §4.2): the
    row×cell L2 table is computed per batch in numpy with PER-DIMENSION
    accumulation ``acc = acc + (x-y)*(x-y)`` — the identical IEEE
    sequence as the ``_l2sq`` left fold, so distances are bit-identical
    and the PQ oracles still hash-match. Spark min-struct ordering is
    replicated: a NULL distance (NULL or dimension-mismatched
    subvector) is the MINIMUM, NaN the maximum, ties fall to the
    smallest cell id; per-row winners then collapse through the same
    struct-min aggregation (min over per-row minima == min over all
    pairs), keeping duplicate-key semantics unchanged."""
    import numpy as np

    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    by_sub: dict[int, list[tuple[int, list[float]]]] = {}
    for r in cb.select("sub", "cell", "cvec").collect():
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["cell"]), [float(x) for x in r["cvec"]])
        )
    for cells in by_sub.values():
        cells.sort()

    out_schema = StructType(
        [
            long_df.schema["__pid__"],
            long_df.schema["sub"],
            long_df.schema["sv"],
            StructField("__d__", DoubleType(), True),
            StructField("__cell__", IntegerType(), True),
        ]
    )

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = []
            for sub, g in pdf.groupby("sub", sort=False):
                cells = by_sub.get(int(sub))
                if not cells:
                    continue  # inner join: subspaces absent from cb drop
                n = len(g)
                raw = list(g["sv"])
                dims = {len(v) for v in raw if v is not None}
                dim = max(dims) if dims else 0
                bad = np.array(
                    [v is None or len(v) != dim for v in raw], dtype=bool
                )
                V = np.zeros((n, dim), dtype=np.float64)
                for i, v in enumerate(raw):
                    if not bad[i]:
                        V[i, :] = v
                # min-struct ordering: class 0 = NULL d (minimum),
                # 2 = real, 3 = NaN (maximum)
                best_cls = np.full(n, 4, dtype=np.int8)
                best_d = np.full(n, np.nan)
                best_cell = np.full(n, cells[0][0], dtype=np.int64)
                for c_id, cv in cells:
                    mismatch = bad | (len(cv) != dim)
                    acc = np.zeros(n)
                    for d in range(min(dim, len(cv))):
                        t = V[:, d] - cv[d]
                        acc = acc + t * t
                    dd = np.where(mismatch, np.nan, acc)
                    cls = np.where(
                        mismatch, 0, np.where(np.isnan(dd), 3, 2)
                    ).astype(np.int8)
                    take = (cls < best_cls) | (
                        (cls == best_cls) & (dd < best_d)
                    )
                    best_cls = np.where(take, cls, best_cls)
                    best_d = np.where(take, dd, best_d)
                    best_cell = np.where(take, c_id, best_cell)
                out = g[["__pid__", "sub"]].copy()
                out["sv"] = g["sv"]
                d_col = pd.Series(best_d, index=g.index)
                d_col[best_cls == 0] = None
                out["__d__"] = d_col
                out["__cell__"] = best_cell.astype("int32")
                parts.append(out)
            if parts:
                yield pd.concat(parts)

    scored = long_df.mapInPandas(assign, out_schema)
    best = scored.groupBy("__pid__", "sub").agg(
        F.min(
            F.struct(
                F.col("__d__").alias("d"),
                F.col("__cell__").alias("c"),
                F.col("sv").alias("v"),
            )
        ).alias("__b__")
    )
    return best.select(
        "__pid__", "sub",
        F.col("__b__.v").alias("sv"),
        F.col("__b__.c").cast("int").alias("cell"),
    )


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 2,
    k_sub: int = 8,
    n_iter: int = 1,
    sample_cap: int = 100_000,
    round_dp: int = 9,
    fit: tuple[int, DataFrame] | None = None,
    seed_vecs: list | None = None,
    fit_matrix=None,
) -> DataFrame:
    """Deterministic PQ codebooks as a (sub, cell, cvec) DataFrame: the
    md5-hash-ordered sample seeds ALL subspaces (one seed row yields m
    sliced centroids), then ``n_iter`` Lloyd steps per subspace — argmin
    L2 → per-dim mean rounded to ``round_dp`` — run over one exploded
    (id, sub, subvector) frame so every subspace trains in the same
    jobs. Engine-portable for the same reason as ``kmeans_centroids``:
    the 1e-9 rounding quantum dwarfs summation-order noise.
    ``seed_vecs`` / ``fit_matrix`` share one ordered seed prefix and one
    collected sample matrix with the coarse fit — see
    :func:`kmeans_centroids`; a clean driver-bounded sample runs the
    whole loop in `_pq_fit_driver` (zero Spark jobs), the distributed
    loop below is the unchanged fallback."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dm = dim // m
    if fit is None:
        fit = fit_vector_sample(corpus, id_col, vec_col, sample_cap)
    _n, fsample = fit
    sample = fsample.select(
        F.col("__fid__").alias("__pid__"), F.col("__fv__").alias("__pv__")
    )
    if seed_vecs is None:
        seed_vecs = list(
            sample.orderBy(
                F.md5(F.col("__pid__").cast("string")), F.col("__pid__")
            )
            .limit(k_sub)
            .select("__pv__")
            .toPandas()["__pv__"]
        )
    spark = corpus.sparkSession
    if n_iter > 0 and seed_vecs:
        if fit_matrix is None:
            fit_matrix = collect_fit_matrix(fsample, min(_n, sample_cap), dim)
        if fit_matrix is not None and fit_matrix.shape[1] == dim:
            out = _pq_fit_driver(
                fit_matrix, seed_vecs, m, dim, k_sub, n_iter, round_dp
            )
            return spark.createDataFrame(
                out, "sub int, cell int, cvec array<double>"
            )
    rows = []
    for i, v in enumerate(seed_vecs[:k_sub]):
        v = [float(x) for x in v]
        for j in range(m):
            rows.append((j, i, v[j * dm:(j + 1) * dm]))
    cb = spark.createDataFrame(rows, "sub int, cell int, cvec array<double>")
    long_df = sample.select(
        "__pid__", F.posexplode(_subvectors("__pv__", m, dim)).alias("sub", "sv")
    )
    for _ in range(n_iter):
        assigned = _nearest_subcell(long_df, cb)
        per_dim = (
            assigned.select(
                "sub", "cell", F.posexplode("sv").alias("dim", "x")
            )
            .groupBy("sub", "cell", "dim")
            .agg(F.round(F.avg("x"), round_dp).alias("m"))
        )
        cb = (
            per_dim.groupBy("sub", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
            .select("sub", F.col("cell").cast("int"), "cvec")
        )
        # small (m × k_sub rows) — materialize so each step is one job
        pdf = cb.toPandas()
        # density contract (r5 advice): the ADC table lookup indexes
        # ptab by jx*k_sub + code + 1, assuming every subspace keeps
        # exactly k_sub cells — a Lloyd step that empties a cell (e.g.
        # duplicate seed subvectors) would silently shift every later
        # subspace's lookups (or raise INVALID_ARRAY_INDEX under ANSI).
        # Fail loudly at build time instead.
        if len(pdf) != m * k_sub:
            raise ValueError(
                f"PQ codebook collapsed to {len(pdf)} (sub, cell) rows, "
                f"expected m*k_sub = {m * k_sub}: a Lloyd step emptied a "
                "codebook cell (duplicate seed subvectors?) — lower k_sub "
                "or dedup the training vectors"
            )
        cb = spark.createDataFrame(
            pdf, "sub int, cell int, cvec array<double>"
        )
    return cb


def _index_rows_kernel(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    by_sub: dict[int, list[tuple[int, list[float]]]],
    dim: int,
    m: int,
    cent_rows: list | None = None,
) -> DataFrame:
    """One-pass Arrow kernel computing, per input ROW, the PQ codes (and
    optionally the coarse cell): (id[, cell], codes).  Replaces the
    explode → broadcast-join → struct-min → regroup [→ join] pipeline
    with a single ``mapInPandas`` stage — zero shuffles, which is what
    the (row-local by construction) encode actually needs.

    Bit-exactness contract — same as :func:`_nearest_cell_kernel` /
    :func:`_nearest_subcell`, whose per-row logic this reuses verbatim:
    per-dimension sequential accumulation (identical IEEE sequence as
    the ``_l2sq`` / ``_dot`` left folds), L2 ties to the smallest cell,
    NULL distance (NULL / dimension-mismatched subvector) is the
    struct-min MINIMUM, NaN the maximum; cosine cell assignment uses the
    struct-MAX ordering (NULL score smallest, NaN largest, ties to the
    smallest cell).  Subvector slicing replicates ``_subvectors``:
    ``v[j*dm : j*dm+dm]`` (short slices for short vectors, NULL vector →
    every subvector NULL).  Subspaces absent from ``by_sub`` drop out of
    the codes array (the composed form's inner join).

    One output row per input row: callers must hold the documented
    unique-id contract (the composed form's groupBy collapse is the
    identity there)."""
    import numpy as np

    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    dm = dim // m
    subs = sorted(by_sub)
    fields = [df.schema[id_col]]
    if cent_rows is not None:
        cell_ids = [int(r["cell"]) for r in cent_rows]
        cvecs = [[float(x) for x in r["cvec"]] for r in cent_rows]
        cnorms = [_pyfold_norm(v) for v in cvecs]
        fields.append(StructField("cell", IntegerType(), True))
    fields.append(StructField("codes", ArrayType(IntegerType(), True), True))
    out_schema = StructType(fields)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0 or (not subs and cent_rows is None):
                continue
            raw = list(pdf[vec_col])
            out = pdf[[id_col]].copy()

            if cent_rows is not None:
                # ---- coarse cell: _nearest_cell_kernel per-row logic ----
                dims = {len(v) for v in raw if v is not None}
                cdim = max(dims) if dims else 0
                bad = np.array(
                    [v is None or len(v) != cdim for v in raw], dtype=bool
                )
                V = np.zeros((n, cdim), dtype=np.float64)
                for i, v in enumerate(raw):
                    if not bad[i]:
                        V[i, :] = v
                acc = np.zeros(n)
                for d in range(cdim):
                    x = V[:, d]
                    acc = acc + x * x
                vn = np.sqrt(acc)
                best_cls = np.full(n, -1, dtype=np.int8)
                best_s = np.full(n, np.nan)
                best_cell = np.full(
                    n, cell_ids[0] if cell_ids else 0, dtype=np.int64
                )
                for c_id, cv, cn in zip(cell_ids, cvecs, cnorms):
                    acc = np.zeros(n)
                    for d in range(len(cv)):
                        acc = acc + V[:, d] * cv[d]
                    denom = vn * cn
                    with np.errstate(divide="ignore", invalid="ignore"):
                        s = acc / denom
                    isnull = denom == 0.0
                    s = np.where(isnull, np.nan, s)
                    cls = np.where(
                        isnull, 0, np.where(np.isnan(s), 3, 2)
                    ).astype(np.int8)
                    take = (cls > best_cls) | ((cls == best_cls) & (s > best_s))
                    best_cls = np.where(take, cls, best_cls)
                    best_s = np.where(take, s, best_s)
                    best_cell = np.where(take, c_id, best_cell)
                out["cell"] = best_cell.astype("int32")

            # ---- PQ codes: _nearest_subcell per-row logic per subspace --
            code_cols = []
            for sub in subs:
                cells = by_sub[sub]
                svs = [
                    None if v is None else list(v[sub * dm:sub * dm + dm])
                    for v in raw
                ]
                sdims = {len(v) for v in svs if v is not None}
                sdim = max(sdims) if sdims else 0
                sbad = np.array(
                    [v is None or len(v) != sdim for v in svs], dtype=bool
                )
                S = np.zeros((n, sdim), dtype=np.float64)
                for i, v in enumerate(svs):
                    if not sbad[i]:
                        S[i, :] = v
                b_cls = np.full(n, 4, dtype=np.int8)
                b_d = np.full(n, np.nan)
                b_cell = np.full(n, cells[0][0], dtype=np.int64)
                for c_id, cv in cells:
                    mismatch = sbad | (len(cv) != sdim)
                    acc = np.zeros(n)
                    for d in range(min(sdim, len(cv))):
                        t = S[:, d] - cv[d]
                        acc = acc + t * t
                    dd = np.where(mismatch, np.nan, acc)
                    cls = np.where(
                        mismatch, 0, np.where(np.isnan(dd), 3, 2)
                    ).astype(np.int8)
                    take = (cls < b_cls) | ((cls == b_cls) & (dd < b_d))
                    b_cls = np.where(take, cls, b_cls)
                    b_d = np.where(take, dd, b_d)
                    b_cell = np.where(take, c_id, b_cell)
                code_cols.append(b_cell.astype("int32"))
            out["codes"] = (
                [list(t) for t in zip(*code_cols)] if code_cols else None
            )
            yield out

    return df.select(id_col, vec_col).mapInPandas(encode, out_schema)


def _cb_by_sub(codebooks: DataFrame) -> dict[int, list[tuple[int, list[float]]]]:
    by_sub: dict[int, list[tuple[int, list[float]]]] = {}
    for r in codebooks.select("sub", "cell", "cvec").collect():
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["cell"]), [float(x) for x in r["cvec"]])
        )
    for cells in by_sub.values():
        cells.sort()
    return by_sub


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: DataFrame,
    dim: int,
    m: int = 2,
) -> DataFrame:
    """Compress every corpus vector to its m subspace code ids:
    (id, codes array<int>), codes ordered by subspace, one output row
    per corpus row (ids are expected unique — the documented contract of
    the whole index family).  One corpus scan through the zero-shuffle
    :func:`_index_rows_kernel` (the encode is row-local: the previous
    explode → broadcast-join → struct-min → regroup pipeline paid two
    shuffles for work that never needed one).  At 10^12 rows this is the
    index build: the output is ~m bytes/row instead of 4·d."""
    by_sub = _cb_by_sub(codebooks)
    out = _index_rows_kernel(corpus, id_col, vec_col, by_sub, dim, m)
    if not by_sub:
        # composed-form parity: with an empty codebook every subspace
        # dropped from the inner join and no rows survived the regroup
        return out.limit(0)
    return out


def pq_topk_adc(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    dim: int,
    k: int = 5,
    m: int = 2,
    k_sub: int = 8,
    n_iter: int = 1,
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k by inner product:
    train PQ codebooks, encode the corpus once, then per query build the
    (m × k_sub) dot-product table against the codebooks and score every
    corpus row with m array LOOKUPS — ``adc = Σ_j table[j][codes[j]]`` —
    via an index-aware ``transform`` + ordered ``aggregate`` (the
    left-to-right sum makes the float result partition- and
    engine-deterministic). The codes frame never touches the original
    vectors at query time, which is the entire point of PQ at 10^12
    rows. Exact re-ranking of the ADC top-k (fetch true vectors for k·n_q
    ids) is the standard next stage and composes with
    ``cosine_topk_bruteforce`` on the filtered id set."""
    cb = pq_codebooks(
        corpus, corpus_id, corpus_vec, dim, m=m, k_sub=k_sub, n_iter=n_iter
    )
    codes = pq_encode(corpus, corpus_id, corpus_vec, cb, dim, m=m)
    from upgini_spark.operators.binary import _dot

    qlong = queries.select(
        F.col(query_id).alias("q_id"),
        F.posexplode(_subvectors(query_vec, m, dim)).alias("sub", "qsv"),
    )
    tbl = qlong.join(F.broadcast(cb), on="sub").withColumn(
        "__p__", _dot(F.col("qsv"), F.col("cvec"))
    )
    flat = tbl.groupBy("q_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cell", "__p__"))),
            lambda s: s["__p__"],
        ).alias("ptab")
    )
    # two-arg transform lambda receives (element, index) — here that
    # index IS the subspace id, used deliberately for the table lookup
    partials = F.transform(
        F.col("codes"),
        lambda c, jx: F.element_at(F.col("ptab"), jx * k_sub + c + 1),
    )
    scored = (
        codes.crossJoin(F.broadcast(flat))
        .filter(F.col("q_id") != F.col(corpus_id))
        .withColumn(
            "adc",
            F.aggregate(partials, F.lit(0.0), lambda acc, v: acc + v),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", F.col(corpus_id).alias("n_id"),
            F.round("adc", 6).alias("adc"), "rank",
        )
    )


def deterministic_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_cells: int = 8
) -> list[tuple]:
    """IVF coarse quantizer: the ``n_cells`` corpus vectors with the
    smallest md5(id) — a deterministic, engine-portable "random" sample
    (any SQL engine picks the same rows), standing in for k-means
    centroids. Returns [(id, vector)] sorted by the hash order."""
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    return [(r["cid"], list(r["cvec"])) for r in rows]


def _cell_assign(vec_col: str, centroids: list[tuple]) -> F.Column:
    """argmax-cosine cell id as a native expression: array of
    (sim, cell_idx) structs → array_max picks the best (ties → larger
    idx loses because array_max compares sim first, then idx — use
    negative idx so the SMALLEST cell index wins ties)."""
    cells = []
    for i, (_cid, cvec) in enumerate(centroids):
        c = F.array(*[F.lit(float(x)) for x in cvec])
        cells.append(
            F.struct(
                cosine_similarity(F.col(vec_col), c).alias("s"),
                F.lit(-i).alias("ni"),
            )
        )
    best = F.array_max(F.array(*cells))
    return (-best["ni"]).cast("int")


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: corpus partitioned into cells by
    nearest centroid; each query probes its ``n_probe`` closest cells and
    ranks exactly within the candidates. The cell equi-join replaces the
    cross join; cell count scales with corpus size (cells ≈ sqrt(N) on a
    real deployment — then the per-cell candidate list is O(sqrt(N)))."""
    centroids = deterministic_centroids(corpus, corpus_id, corpus_vec, n_cells)
    # corpus assignment through the Arrow kernel (bit-identical scores
    # and ties — see _nearest_cell): ~8 interpreted dot-folds per row
    # become one vectorized numpy batch. _cell_assign stays the
    # Column-level form for composability.
    cent_df = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in cv]) for i, (_cid, cv) in enumerate(centroids)],
        "cell int, cvec array<double>",
    )
    c = _nearest_cell(
        corpus.select(
            F.col(corpus_id).alias("n_id"), F.col(corpus_vec).alias("n_vec")
        ),
        cent_df,
        "n_vec",
    )
    # query probes: top n_probe cells by centroid similarity
    probe_structs = []
    for i, (_cid, cvec) in enumerate(centroids):
        cv = F.array(*[F.lit(float(x)) for x in cvec])
        probe_structs.append(
            F.struct(
                cosine_similarity(F.col(query_vec), cv).alias("s"),
                F.lit(-i).alias("ni"),
            )
        )
    probes = F.slice(F.reverse(F.array_sort(F.array(*probe_structs))), 1, n_probe)
    q = queries.select(
        F.col(query_id).alias("q_id"),
        F.col(query_vec).alias("q_vec"),
        _norm2(F.col(query_vec)).alias("__qn__"),
        F.explode(F.transform(probes, lambda p: (-p["ni"]).cast("int"))).alias("cell"),
    )
    scored = (
        q.join(c.withColumn("__nn__", _norm2(F.col("n_vec"))), on="cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", _staged_cos("q_vec", "n_vec", "__qn__", "__nn__"))
        .select("q_id", "n_id", "cos")
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    dim: int,
    m: int = 2,
    k_sub: int = 8,
    n_cells: int | None = None,
    coarse_iter: int = 1,
    pq_iter: int = 1,
    materialize: bool = True,
) -> dict:
    """One-time IVF+PQ index build — the expensive N×√N half of
    :func:`pq_topk_ivf_adc`, split out so it runs ONCE per corpus and
    amortizes across every query batch (same build/query split as the
    as-of family's ``build_asof_hist``): coarse k-means fit, full-corpus
    cell assignment, PQ codebook fit, and the m-code encode. Returns
    {"centroids": (cell, cvec), "codebooks": (sub, cell, cvec),
    "index": (n_id, cell, codes)} — the index frame is ~m bytes + a
    cell id per corpus row (the vectors themselves are NOT in it).

    ``materialize=True`` eagerly localCheckpoints the index so query
    batches scan the compact materialized frame instead of re-deriving
    the assignment (on a cluster, write it to a bucketed table on
    ``cell`` instead — then the candidate fetch is exchange-free)."""
    fit = fit_vector_sample(corpus, corpus_id, corpus_vec)
    # ONE (md5(id), id)-ordered TakeOrdered serves both fits' seeds: the
    # coarse fit uses the first n_cells vectors, the PQ fit the first
    # k_sub — identical rows to the per-fit fetches by construction
    # (same sample, same total order), one small job instead of two.
    n_corpus, fsample = fit
    n_seed = max(n_cells or auto_n_cells(n_corpus), k_sub)
    seed_vecs = list(
        fsample.orderBy(
            F.md5(F.col("__fid__").cast("string")), F.col("__fid__")
        )
        .limit(n_seed)
        .select("__fv__")
        .toPandas()["__fv__"]
    )
    # ONE sample collect serves both driver-side Lloyd fits (None for
    # ragged/oversized samples — the fits then run their unchanged
    # distributed loops)
    fit_matrix = collect_fit_matrix(fsample, min(n_corpus, 100_000), dim)
    # the coarse k-means and the PQ codebook fits are INDEPENDENT chains
    # of small sequential jobs over the shared checkpointed sample — run
    # them concurrently so the second fit's jobs back-fill the idle
    # executors of the first (guide §2.6 "overlap independent jobs");
    # Spark's scheduler handles concurrent driver threads natively.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        cent_f = pool.submit(
            kmeans_centroids, corpus, corpus_id, corpus_vec,
            n_cells=n_cells, n_iter=coarse_iter, fit=fit,
            seed_vecs=seed_vecs, fit_matrix=fit_matrix,
        )
        cb_f = pool.submit(
            pq_codebooks, corpus, corpus_id, corpus_vec, dim,
            m=m, k_sub=k_sub, n_iter=pq_iter, fit=fit,
            seed_vecs=seed_vecs, fit_matrix=fit_matrix,
        )
        cent, cb = cent_f.result(), cb_f.result()
    # cell assignment + PQ encode fused into ONE zero-shuffle kernel pass
    # (was: crossJoin+agg assignment, explode+agg encode, then an id JOIN
    # of two corpus-sized frames — three shuffles for row-local work);
    # identical per-row semantics as _nearest_cell/_nearest_subcell, and
    # ids are unique per the index family's documented contract
    cent_rows = sorted(
        cent.select("cell", "cvec").collect(), key=lambda r: int(r["cell"])
    )
    index = _index_rows_kernel(
        corpus.select(
            F.col(corpus_id).alias("n_id"), F.col(corpus_vec).alias("n_vec")
        ),
        "n_id", "n_vec", _cb_by_sub(cb), dim, m, cent_rows=cent_rows,
    )
    if materialize:
        index = index.localCheckpoint(eager=True)
    return {"centroids": cent, "codebooks": cb, "index": index}


def pq_topk_ivf_adc(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    dim: int,
    k: int = 5,
    m: int = 2,
    k_sub: int = 8,
    n_cells: int | None = None,
    n_probe: int = 2,
    coarse_iter: int = 1,
    pq_iter: int = 1,
    index: dict | None = None,
) -> DataFrame:
    """IVF+PQ — the full-scale ANN composition (the r4 verdict tracked
    this as PQ's refinement): a coarse k-means quantizer partitions the
    corpus into cells, every vector is PQ-encoded ONCE (the index is
    (id, cell, codes) — ~m bytes + a cell id per row), and each query
    ADC-scores ONLY the rows of its ``n_probe`` nearest cells. The
    candidate fetch is an EQUI-JOIN on the cell id — unlike
    :func:`pq_topk_adc`'s whole-corpus broadcast scan, the per-query
    work is |probed cells| not |corpus|, which is the entire point at
    10^12 rows (FAISS IVFADC, Jégou et al. 2011, minus the residual
    encoding: codes quantize RAW vectors so the same codebook serves
    every cell and the whole train → encode → probe → ADC pipeline
    stays bit-replayable in SQL — the standard recall trade documented
    there as IVFPQ-no-residual).

    Coarse cells use :func:`kmeans_centroids` (cosine assignment,
    deterministic md5 seed); codes use :func:`pq_codebooks` (L2
    subspace assignment). Exact re-rank of the returned ids composes
    with :func:`cosine_topk_bruteforce`.

    Pass ``index=build_ivf_pq_index(...)`` to reuse a materialized
    index across query batches — without it every call lazily re-runs
    the N×√N coarse fit + assignment + encode, which at 200k×16d
    measured ~100× the per-batch query cost (BENCH/BASELINE.md r5)."""
    if index is None:
        index = build_ivf_pq_index(
            corpus, corpus_id, corpus_vec, dim, m=m, k_sub=k_sub,
            n_cells=n_cells, coarse_iter=coarse_iter, pq_iter=pq_iter,
            materialize=False,
        )
    cent, cb, idx = index["centroids"], index["codebooks"], index["index"]

    q0 = queries.select(
        F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec"),
        _norm2(F.col(query_vec)).alias("__qn__"),
    )
    qs = q0.crossJoin(
        F.broadcast(cent.withColumn("__cn__", _norm2(F.col("cvec"))))
    ).withColumn("__s__", _staged_cos("q_vec", "cvec", "__qn__", "__cn__"))
    wq = Window.partitionBy("q_id").orderBy(
        F.col("__s__").desc(), F.col("cell").asc()
    )
    probes = (
        qs.withColumn("__rn__", F.row_number().over(wq))
        .filter(F.col("__rn__") <= n_probe)
        .select("q_id", "cell")
    )

    from upgini_spark.operators.binary import _dot

    qlong = queries.select(
        F.col(query_id).alias("q_id"),
        F.posexplode(_subvectors(query_vec, m, dim)).alias("sub", "qsv"),
    )
    tbl = qlong.join(F.broadcast(cb), on="sub").withColumn(
        "__p__", _dot(F.col("qsv"), F.col("cvec"))
    )
    flat = tbl.groupBy("q_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cell", "__p__"))),
            lambda s: s["__p__"],
        ).alias("ptab")
    )

    # candidate fetch: equi-join on cell (each corpus row has ONE cell,
    # (q_id, cell) probes are distinct -> no duplicate pairs)
    cand = probes.join(idx, on="cell").filter(
        F.col("q_id") != F.col("n_id")
    )
    # two-arg transform lambda receives (element, index) — the index IS
    # the subspace id, used deliberately for the ADC table lookup
    partials = F.transform(
        F.col("codes"),
        lambda c, jx: F.element_at(F.col("ptab"), jx * k_sub + c + 1),
    )
    scored = cand.join(F.broadcast(flat), on="q_id").withColumn(
        "adc", F.aggregate(partials, F.lit(0.0), lambda acc, v: acc + v)
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("adc", 6).alias("adc"), "rank")
    )
