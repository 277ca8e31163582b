"""Vector (multi-column) operators (reference: src/upgini/autofe/vector.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mean(cols: list[Column]) -> Column:
    """Row-wise mean across columns, nulls as 0 (vector.py:8-17)."""
    s = sum((F.coalesce(c.cast("double"), F.lit(0.0)) for c in cols), F.lit(0.0))
    return s / F.lit(float(len(cols)))


def sum_(cols: list[Column]) -> Column:
    """Row-wise sum, nulls as 0 (vector.py:19-25)."""
    return sum((F.coalesce(c.cast("double"), F.lit(0.0)) for c in cols), F.lit(0.0))


def vectorize(cols: list[Column]) -> Column:
    """Pack N columns into an array cell (vector.py:27-33)."""
    return F.array(*[c.cast("double") for c in cols])


def class_centroids(df, vec_col: str, class_col: str):
    """Per-class centroid of array<double> vectors (unary.py:193-219
    outlier_dist fit stage): posexplode + avg per (class, dim) + rebuild.
    One shuffle on (class, dim)."""
    from pyspark.sql import functions as F

    exploded = df.select(
        class_col, F.posexplode(vec_col).alias("dim", "x")
    )
    per_dim = exploded.groupBy(class_col, "dim").agg(F.avg("x").alias("m"))
    return (
        per_dim.groupBy(class_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select(
            class_col,
            F.transform("dm", lambda s: s["m"]).alias("centroid"),
        )
    )


def outlier_distance(df, vec_col: str, class_col: str, metric: str = "cosine"):
    """outlier_dist transform stage: each row's distance to its class
    centroid (broadcast the tiny centroid table)."""
    from pyspark.sql import functions as F

    from upgini_spark.operators.binary import cosine_similarity

    cents = class_centroids(df, vec_col, class_col)
    joined = df.join(F.broadcast(cents), on=class_col, how="left")
    if metric == "cosine":
        dist = F.lit(1.0) - cosine_similarity(F.col(vec_col), F.col("centroid"))
    elif metric == "euclidean":
        dist = F.sqrt(
            F.aggregate(
                F.zip_with(F.col(vec_col), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    else:
        raise ValueError(f"unsupported metric {metric!r}")
    return joined.withColumn("outlier_dist", dist).drop("centroid")
