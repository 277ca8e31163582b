"""Recall@k report for every ANN path vs exact brute force.

Deterministic (md5-derived corpus, no RNG) so the numbers are
reproducible on any machine; timings are deliberately NOT reported here
(use bench.py / BENCH/BASELINE.md) — this tool isolates the QUALITY side
of the speed/recall trade each scale path makes.

    python tools/ann_recall.py [n_corpus] [k]
"""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from upgini_spark.functions.similarity import (
        build_ivf_pq_index,
        cosine_topk_bruteforce,
        cosine_topk_ivf_kmeans,
        cosine_topk_lsh,
        pq_topk_adc,
        pq_topk_ivf_adc,
    )
    from upgini_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q, dims = 50, 64

    spark = get_spark("ann_recall", master="local[8]", shuffle_partitions=16)

    # CLUSTERED corpus (200 md5-derived centers + small per-id jitter):
    # uniform random vectors have NO neighbor structure at dim=64 — all
    # pairwise cosines concentrate, the exact top-k is within noise of
    # rank 1000, and every method (including a full-scan PQ) measures at
    # chance. Recall is only meaningful when true neighbors exist; here
    # a query's true neighbors are its cluster mates.
    n_centers, jitter = 200, 0.25
    i = F.col("id")

    def _u(prefix, a, b):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), a.cast("string"),
                               F.lit("_"), b.cast("string"))),
                1, 4,
            ),
            16, 10,
        ).cast("double") / 65535.0 * 2 - 1

    c = (i % n_centers)
    v = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: _u("c", c, d) + F.lit(jitter) * _u("j", i, d),
    )
    corpus = spark.range(n).select(i.alias("vec_id"), v.alias("v"))
    corpus = corpus.localCheckpoint(eager=True)
    q = corpus.filter(F.col("vec_id") < n_q)

    def ids(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["q_id"], set()).add(r["n_id"])
        return out

    truth = ids(cosine_topk_bruteforce(q, corpus, "vec_id", "vec_id",
                                       "v", "v", k=k))

    def recall(df) -> float:
        got = ids(df)
        return sum(
            len(got.get(qi, set()) & t) / len(t) for qi, t in truth.items()
        ) / len(truth)

    args = (q, corpus, "vec_id", "vec_id", "v", "v")
    rows = []
    for bands in (1, 2, 4):
        rows.append((
            f"LSH auto-planes, {bands} band(s)",
            recall(cosine_topk_lsh(*args, k=k, n_planes=None, n_bands=bands)),
        ))
    for probe in (1, 2, 4):
        rows.append((
            f"IVF kmeans sqrt(N) cells, probe {probe}",
            recall(cosine_topk_ivf_kmeans(*args, k=k, n_cells=None,
                                          n_probe=probe, n_iter=1)),
        ))
    def rerank(cand_df):
        """Exact-cosine re-rank of an ADC candidate list — the documented
        compose step (PQ collapses within-cluster ranking: cluster mates
        share a code, ADC ties exactly, and raw recall@k measures the
        tie-break, not the method — FAISS re-ranks for the same reason)."""
        cand = cand_df.select("q_id", "n_id")
        withv = cand.join(
            corpus.select(F.col("vec_id").alias("n_id"), "v"), "n_id"
        ).join(
            F.broadcast(
                q.select(F.col("vec_id").alias("q_id"),
                         F.col("v").alias("qv"))
            ),
            "q_id",
        )
        from upgini_spark.operators.binary import cosine_similarity
        from pyspark.sql.window import Window

        scored = withv.withColumn(
            "cos", cosine_similarity(F.col("qv"), F.col("v"))
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("cos").desc(), F.col("n_id").asc()
        )
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
        )

    kw = dict(dim=dims, m=4, k_sub=16)
    rows.append((
        "PQ-ADC full scan m=4 k_sub=16 (raw)",
        recall(pq_topk_adc(*args, k=k, n_iter=1, **kw)),
    ))
    rows.append((
        f"PQ-ADC k'=100 + exact re-rank@{k}",
        recall(rerank(pq_topk_adc(*args, k=100, n_iter=1, **kw))),
    ))
    idx = build_ivf_pq_index(corpus, "vec_id", "v", n_cells=None,
                             coarse_iter=1, pq_iter=1, **kw)
    for probe in (2, 4):
        rows.append((
            f"IVF+PQ probe {probe} (raw)",
            recall(pq_topk_ivf_adc(*args, k=k, n_cells=None, n_probe=probe,
                                   index=idx, **kw)),
        ))
        rows.append((
            f"IVF+PQ probe {probe}, k'=100 + re-rank@{k}",
            recall(rerank(pq_topk_ivf_adc(*args, k=100, n_cells=None,
                                          n_probe=probe, index=idx, **kw))),
        ))
    print(f"\nrecall@{k} vs brute force — N={n}, {n_q} queries, dim={dims}")
    for name, r in rows:
        print(f"  {name:42s} {r:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
