"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; random-hyperplane
LSH bucketing as the scale path (bucketing turns the O(N·M) cross join
into per-bucket joins — at 10^12 rows the bucket key is the shuffle key).
Planes are derived deterministically from md5 bits, so results are
reproducible and oracle-checkable without storing plane matrices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from upgini_spark.operators.binary import cosine_similarity


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
    q = queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec"))
    c = corpus.select(F.col(corpus_id).alias("n_id"), F.col(corpus_vec).alias("n_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_similarity(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )


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
        signs = F.array(*[
            F.when(
                F.substring(F.md5(F.lit(f"{p}_{d}")), 1, 1) >= "8", F.lit(1.0)
            ).otherwise(F.lit(-1.0))
            for d in range(dims)
        ])
        dot = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _banded(df: DataFrame, id_alias: str, vec_alias: str, id_col: str, vec_col: str,
            n_planes: int, n_bands: int, dims: int) -> DataFrame:
    """Explode a table into (band, bucket) candidate rows — one row per
    band, each with an independent plane family. Multi-band OR-probing:
    a pair collides if ANY band agrees, recall 1-(1-p^b)^L."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            hyperplane_sign_bits(vec_col, n_planes, dims, plane_offset=b * n_planes).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.explode(bands).alias("bb"),
    ).select(id_alias, vec_alias, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
    n_planes: int = 8,
    dims: int = 64,
    n_bands: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s), then exact cosine rank within the candidate set. The
    (band, bucket) equi-join replaces the cross join — this is the 100TB
    plan. ``n_bands`` > 1 unions independent plane families (multi-probe
    OR) for recall; duplicates collapse before ranking."""
    q = _banded(queries, "q_id", "q_vec", query_id, query_vec, n_planes, n_bands, dims)
    c = _banded(corpus, "n_id", "n_vec", corpus_id, corpus_vec, n_planes, n_bands, dims)
    scored = (
        q.join(c, on=["band", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_similarity(F.col("q_vec"), F.col("n_vec")))
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
    n_planes: int = 8,
    n_bands: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs through banded hyperplane LSH —
    the scale path for dedup.embedding_near_dup_pairs (whose all-pairs
    form is an O(N²) BroadcastNestedLoopJoin).

    Per band: bucket self-join (equi-join on the 2^n_planes-way key),
    id_a < id_b, exact cosine ≥ threshold. Bands are OR-ed and duplicate
    pairs collapsed. For sign-LSH the per-plane agree probability is
    1 − acos(cos)/π, so at 0.95+ thresholds a handful of bands gives
    ~certain recall (miss = (1−p^b)^L). Giant identical buckets are
    still quadratic in bucket size — raise n_planes with N (see
    hyperplane_sign_bits) so expected bucket size stays bounded.
    """
    banded = _banded(df, "id_a", "va", id_col, vec_col, n_planes, n_bands, dims)
    other = banded.select(
        F.col("id_a").alias("id_b"), F.col("va").alias("vb"), "band", "bucket"
    )
    return (
        banded.join(other, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .distinct()
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
    c = corpus.select(
        F.col(corpus_id).alias("n_id"),
        F.col(corpus_vec).alias("n_vec"),
        _cell_assign(corpus_vec, centroids).alias("cell"),
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
        F.explode(F.transform(probes, lambda p: (-p["ni"]).cast("int"))).alias("cell"),
    )
    scored = (
        q.join(c, on="cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_similarity(F.col("q_vec"), F.col("n_vec")))
        .select("q_id", "n_id", "cos")
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )
