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


def hyperplane_sign_bits(vec_col: str, n_planes: int = 8, dims: int = 64) -> F.Column:
    """LSH bucket key: concat of sign(v · plane_p) bits, where
    plane_p[d] = +1 if the first md5 hex digit of "p_d" >= '8' else −1.
    Deterministic, engine-portable, no stored state."""
    v = F.col(vec_col)
    bits = []
    for p in range(n_planes):
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
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within bucket. The bucket equi-join replaces the
    cross join — this is the 100TB plan."""
    q = queries.select(
        F.col(query_id).alias("q_id"),
        F.col(query_vec).alias("q_vec"),
        hyperplane_sign_bits(query_vec, n_planes, dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("n_id"),
        F.col(corpus_vec).alias("n_vec"),
        hyperplane_sign_bits(corpus_vec, n_planes, dims).alias("bucket"),
    )
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_similarity(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )
