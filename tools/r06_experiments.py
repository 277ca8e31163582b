"""Round-6 kernel A/B experiments (scratch; cited in OPTIMIZATION_r06.md).

Each experiment times variants of a hot expression kernel with the noop
sink at the given SF and asserts the variant output EQUALS the current
implementation (exceptAll both ways) before trusting the timing.

    python tools/r06_experiments.py simhash|textstats|repshare|minhash ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(df, label, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:28s} {best:.3f}s")
    return best


def assert_equal(a, b, label):
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    assert d1 == 0 and d2 == 0, f"{label}: MISMATCH {d1}/{d2}"
    print(f"  {label}: outputs identical")


def main():
    from upgini_spark.session import get_spark

    spark = get_spark("r06exp", master=f"local[{CPUS}]",
                      shuffle_partitions=4 * CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    which = sys.argv[1:] or ["simhash"]

    if "simhash" in which:
        from upgini_spark.functions.dedup import simhash_table
        cur = simhash_table(docs, "text", out_col="simhash", bits=32,
                            keep=["doc_id"])

        # variant A: single aggregate traversal, 16 packed 32-bit lanes
        # (2 counts per long) in an array accumulator
        words = F.split(F.col("text"), " ")
        staged = docs.select(
            "doc_id",
            F.transform(
                words,
                lambda tk: F.conv(F.substring(F.md5(tk), 1, 8), 16, 10).cast("long"),
            ).alias("__th__"),
        )
        th = F.col("__th__")
        n = F.size(th)

        def lane(h, b):  # bit b of h, shifted into lane position
            return F.shiftright(h, b).bitwiseAND(F.lit(1))

        init = F.array(*[F.lit(0).cast("long") for _ in range(16)])
        packed = F.aggregate(
            th,
            init,
            # zip_with: the spread array is an ARGUMENT (evaluated once per
            # token), not captured inside the lambda (which would rebuild
            # it per lane — the r4 higher-order-lambda trap)
            lambda acc, h: F.zip_with(
                acc,
                F.array(*[
                    lane(h, 2 * j) + F.shiftleft(lane(h, 2 * j + 1), 32)
                    for j in range(16)
                ]),
                lambda a, d: a + d,
            ),
        )
        # unpack: count of bit (2j) = acc[j] & 0xFFFFFFFF; bit (2j+1) = acc[j]>>32
        sim = F.lit(0).cast("long")
        cnt = lambda j, hi: (
            F.shiftright(F.element_at(F.col("__pk__"), j + 1), 32)
            if hi
            else F.element_at(F.col("__pk__"), j + 1).bitwiseAND(F.lit(0xFFFFFFFF))
        )
        for b in range(32):
            j, hi = divmod(b, 2)[0], b % 2
            c = cnt(b // 2, b % 2 == 1)
            sim = sim + F.when(2 * c > n, F.lit(1 << b).cast("long")).otherwise(0)
        va = staged.withColumn("__pk__", packed).select(
            "doc_id", sim.alias("simhash")
        )

        # variant B: explode + codegen conditional sums + group back
        ex = staged.select("doc_id", n.alias("__n__"), F.explode(th).alias("h"))
        aggs = [
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"c{b}")
            for b in range(32)
        ]
        g = ex.groupBy("doc_id", "__n__").agg(*aggs)
        simb = F.lit(0).cast("long")
        for b in range(32):
            simb = simb + F.when(
                2 * F.col(f"c{b}") > F.col("__n__"), F.lit(1 << b).cast("long")
            ).otherwise(0)
        vb = g.select("doc_id", simb.alias("simhash"))

        print("simhash_32 variants:")
        t(cur, "current (32 aggregates)")
        t(va, "A: packed-lane aggregate")
        t(vb, "B: explode+codegen sums")
        assert_equal(cur, va, "A")
        assert_equal(cur, vb, "B")

    if "textstats" in which:
        from upgini_spark.functions import text as TX
        c = F.col("text")
        cur = docs.select(
            "doc_id",
            TX.token_count_ws(c).alias("n_tokens"),
            TX.token_count_bpe_ish(c).alias("n_tokens_bpe"),
            F.round(TX.stopword_ratio(c), 6).alias("stopword_ratio"),
            F.round(TX.mean_word_length(c), 6).alias("mean_word_len"),
        )
        # staged: tokens array computed once
        sw = F.array(*[F.lit(s) for s in TX.EN_STOPWORDS])
        staged = docs.select(
            "doc_id", "text",
            F.filter(
                F.split(F.trim(c), r"\s+"), lambda tk: F.length(tk) > 0
            ).alias("__toks__"),
        )
        tk = F.col("__toks__")
        nt = F.size(tk)
        hits = F.size(
            F.filter(tk, lambda x: F.array_contains(sw, F.lower(x)))
        )
        tot_len = F.aggregate(tk, F.lit(0), lambda acc, x: acc + F.length(x))
        va = staged.select(
            "doc_id",
            nt.alias("n_tokens"),
            TX.token_count_bpe_ish(c).alias("n_tokens_bpe"),
            F.round(
                F.try_divide(hits.cast("double"), nt), 6
            ).alias("stopword_ratio"),
            F.round(
                F.try_divide(tot_len.cast("double"), nt), 6
            ).alias("mean_word_len"),
        )
        print("text_stats variants:")
        t(cur, "current")
        t(va, "A: staged tokens")
        assert_equal(cur, va, "A")

    if "repshare" in which:
        from upgini_spark.functions.text import dup_ngram_share, tokens_ws
        boosted = F.when(
            F.col("doc_id") % 10 == 0,
            F.concat_ws(" ", "text", "text", "text"),
        ).otherwise(F.col("text"))
        cur = docs.select(
            "doc_id", F.round(dup_ngram_share(boosted, n=3), 6).alias("dup3_share")
        )
        # staged words + struct-distinct instead of string-concat distinct
        staged = docs.select(
            "doc_id", tokens_ws(boosted).alias("__w__")
        )
        w = F.col("__w__")
        k = F.size(w) - 2
        kk = F.greatest(k, F.lit(0))
        s1, s2, s3 = (F.slice(w, j + 1, kk) for j in range(3))
        grams = F.arrays_zip(s1, s2, s3)
        share = F.when(
            k >= 1,
            F.lit(1.0) - F.size(F.array_distinct(grams)) / k.cast("double"),
        )
        va = staged.select("doc_id", F.round(share, 6).alias("dup3_share"))

        # staged words + original string-concat grams
        zipped = F.zip_with(s1, s2, lambda a, b: F.concat(a, F.lit(" "), b))
        zipped = F.zip_with(zipped, s3, lambda a, b: F.concat(a, F.lit(" "), b))
        share_b = F.when(
            k >= 1,
            F.lit(1.0) - F.size(F.array_distinct(zipped)) / k.cast("double"),
        )
        vb = staged.select("doc_id", F.round(share_b, 6).alias("dup3_share"))
        print("repetition_share variants:")
        t(cur, "current")
        t(va, "A: staged + struct grams")
        t(vb, "B: staged + concat grams")
        assert_equal(cur, va, "A")
        assert_equal(cur, vb, "B")

    if "minhash" in which:
        from upgini_spark.functions.dedup import (
            _minhash_perm_constants, minhash_signature,
        )
        k = 8
        cur = minhash_signature(docs.select("doc_id", "text"), "text", k, 3)
        masks = _minhash_perm_constants(k)
        words = F.split(F.col("text"), " ")
        wh = F.transform(
            words,
            lambda wq: F.conv(F.substring(F.md5(wq), 1, 12), 16, 10).cast("long"),
        )
        n_sh = F.size(words) - 2
        staged = docs.select(
            "doc_id", "text", wh.alias("__wh__")
        ).withColumn(
            "__hs__",
            F.when(
                n_sh >= 1,
                F.zip_with(
                    F.slice(F.col("__wh__"), 1, F.greatest(n_sh, F.lit(0))),
                    F.zip_with(
                        F.slice(F.col("__wh__"), 2, F.greatest(n_sh, F.lit(0))),
                        F.slice(F.col("__wh__"), 3, F.greatest(n_sh, F.lit(0))),
                        lambda b, cc: b * 31 + cc,
                    ),
                    lambda a, bc: a * 31 * 31 + bc,
                ),
            ).otherwise(
                F.array(
                    F.aggregate(
                        F.col("__wh__"), F.lit(0).cast("long"),
                        lambda a, x: a * 31 + x,
                    )
                )
            ),
        )
        # NOTE: (w1*31+w2)*31+w3 = w1*961 + w2*31 + w3 EXACTLY in int64
        # two's-complement (multiplication distributes mod 2^64)
        hs = F.col("__hs__")

        def _xored(m: int):
            return lambda h: h.bitwiseXOR(F.lit(m))

        va = staged.select(
            "doc_id", "text",
            *[
                F.array_min(F.transform(hs, _xored(masks[j]))).alias(f"mh{j}")
                for j in range(k)
            ],
        )
        # variant B: single aggregate producing all k minima at once
        init = F.array(*[F.lit((1 << 62)).cast("long") for _ in range(k)])
        packed = F.aggregate(
            hs,
            init,
            lambda acc, h: F.zip_with(
                acc,
                F.array(*[h.bitwiseXOR(F.lit(masks[j])) for j in range(k)]),
                lambda a, x: F.least(a, x),
            ),
        )
        vb = staged.withColumn("__pk__", packed).select(
            "doc_id", "text",
            *[F.element_at(F.col("__pk__"), j + 1).alias(f"mh{j}") for j in range(k)],
        )
        print("minhash variants:")
        t(cur, "current")
        t(va, "A: slice-zip shingles")
        t(vb, "B: slice-zip + packed mins")
        assert_equal(cur, va, "A")
        assert_equal(cur, vb, "B")

    spark.stop()


if __name__ == "__main__":
    main()
