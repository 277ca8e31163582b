"""Physical-plan audit: sweep every ``queries()`` entry for scale-killer
operators and print offenders.

Flags, per query:

- ``Exchange SinglePartition`` — every row through one task (global
  windows / global sorts);
- ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` — O(N*M) joins;
  broadcast NLJ against a literal/tiny side is fine, so offenders list
  the join for human review;
- row-at-a-time Python UDFs (``BatchEvalPython``) — the slow serialization
  path (Arrow ``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` are fine).

Known-acceptable cases are allowlisted with the reason printed, so the
output is actionable: anything NOT allowlisted is a regression.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

# query -> (pattern, reason) pairs that are understood and accepted
ALLOWED: dict[str, list[tuple[str, str]]] = {
    # deterministic exact-n sampling: TakeOrderedAndProject merges per-
    # partition top-n on the driver — bounded by n, not by data size
    # (these show no flagged pattern; listed for documentation only)
    # small constructed dimension crossJoins (size-1 or size-k literals)
    "trend_per_user": [
        ("CartesianProduct|BroadcastNestedLoopJoin",
         "scalar aggregate cross-joined back (1-row side)"),
    ],
    "ts_decisions": [
        ("CartesianProduct|BroadcastNestedLoopJoin",
         "400-row synthetic fixture x 2-row block table"),
    ],
    "psi_monthly": [
        ("SinglePartition", "collected per-interval count table (<=132 rows)"),
    ],
    "psi_categorical": [
        ("SinglePartition", "collected per-interval count table (<=132 rows)"),
    ],
    # final global aggregates: the single-partition exchange carries one
    # PARTIAL-aggregate row per upstream partition, not data rows
    "date_distribution_check": [
        ("SinglePartition", "global agg of per-partition partials (1 row each)"),
    ],
    "is_time_series_stats": [
        ("SinglePartition", "global agg of per-partition partials (1 row each)"),
    ],
    # brute-force kNN is the documented correctness baseline; the scale
    # path is knn_cosine_lsh (equi-join on LSH buckets)
    "knn_cosine_top3": [
        ("BroadcastNestedLoopJoin", "by-design exact baseline, query side broadcast"),
    ],
    # IVF cell assignment is inherently corpus x broadcast(centroids):
    # every vector scores all sqrt(N) centroids to find its cell (the same
    # N*k cost FAISS pays); broadcast side is the tiny centroid table, the
    # corpus is never shuffled
    "knn_cosine_ivf_kmeans": [
        ("BroadcastNestedLoopJoin",
         "argmax over broadcast centroid table — IVF's inherent N×√N assignment, no shuffle"),
    ],
    "knn_cosine_ivf": [
        ("BroadcastNestedLoopJoin",
         "argmax over broadcast centroid table — IVF's inherent N×√N assignment, no shuffle"
         " (r6: the sub-kernel-threshold JVM path of _nearest_cell)"),
    ],
    # same IVF assignment shape at INDEX-BUILD time only; the query-time
    # candidate fetch is the equi-join on cell (BroadcastHashJoin,
    # asserted in test_ivf_pq_full_probe_equals_adc_scan)
    "knn_cosine_ivf_pq": [
        ("BroadcastNestedLoopJoin",
         "coarse/PQ centroid assignment at index build — query path joins on cell"),
    ],
    # demo slice (40 docs); at scale pair generation comes from
    # minhash_band_pairs (equi-join), see functions/dedup.py docstring
    "ngram_jaccard_pairs": [
        ("BroadcastNestedLoopJoin", "fixture-sized demo; LSH generates pairs at scale"),
    ],
    # 1-row global-stat broadcast pattern (bm25 N/avgdl/df, bigram-LM
    # vocabulary V): the SinglePartition exchange carries one partial-agg
    # row per upstream partition, and the BNLJ is a crossJoin against
    # that broadcast single row — both are the intended shape for a
    # global scalar statistic
    "text_bm25_topk": [
        ("Exchange SinglePartition", "global corpus-stats agg (1 partial row/partition)"),
        ("BroadcastNestedLoopJoin", "crossJoin of the broadcast 1-row stats"),
    ],
    # r6c encode_words: the vocabulary collapses to a ONE-ROW map column
    # broadcast-crossJoined to the documents (replacing the per-word
    # explode + join + regroup shuffle) — same shape as the bm25/bigram
    # 1-row scalar broadcasts
    "vocab_encode_words": [
        ("BroadcastNestedLoopJoin", "crossJoin of the broadcast 1-row vocab map"),
    ],
    "chunk_sliding_tokens": [
        ("BroadcastNestedLoopJoin", "crossJoin of the broadcast 1-row vocab map"),
    ],
    "mask_tokens_mlm": [
        ("BroadcastNestedLoopJoin", "crossJoin of the broadcast 1-row vocab map"),
    ],
    "bigram_lm_nll": [
        ("Exchange SinglePartition", "global vocabulary-size agg (1 partial row/partition)"),
        ("BroadcastNestedLoopJoin", "crossJoin of the broadcast 1-row vocab scalar"),
    ],
    # ADC is BY DESIGN a corpus linear scan with O(m) table lookups per
    # row against the broadcast per-query tables (n_q x m.k_sub floats);
    # the corpus is never shuffled. The scale refinement is IVF+PQ (scan
    # only probed cells), tracked as a candidate in CLAUDE.md.
    "knn_cosine_pq_adc": [
        ("BroadcastNestedLoopJoin",
         "ADC scan: corpus x broadcast query-ADC tables — PQ's intended shape"),
    ],
    # temperature water-filling: the window/orderBy runs over the PER-
    # GROUP aggregate (k rows, k = #sources — 10^3-ish even at 100 TB),
    # never corpus rows; the BNLJ is the broadcast 1-row totals/λ scalar
    "temperature_mix_plan": [
        ("Exchange SinglePartition", "k-row per-source aggregate (k = #sources)"),
        ("BroadcastNestedLoopJoin", "crossJoin of broadcast 1-row totals/λ"),
    ],
    "temperature_mix_apply": [
        ("Exchange SinglePartition", "k-row per-source plan frame (k = #sources)"),
        ("BroadcastNestedLoopJoin", "crossJoin of broadcast 1-row totals/λ"),
    ],
    "temperature_mix_tokens": [
        ("Exchange SinglePartition", "k-row per-source aggregate (k = #sources)"),
        ("BroadcastNestedLoopJoin", "crossJoin of broadcast 1-row totals/λ"),
    ],
}

PATTERNS = [
    "Exchange SinglePartition",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
]


def main() -> None:
    from upgini_spark.session import get_spark
    import __spark_entry__ as entry_mod

    only = set(sys.argv[1:])
    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=16)
    qs = entry_mod.queries()
    n_clean = n_flagged = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {str(e)[:200]}")
            n_flagged += 1
            continue
        hits = [p for p in PATTERNS if p in plan]
        allowed = ALLOWED.get(name, [])
        unexplained = []
        for h in hits:
            reasons = [r for pat, r in allowed if any(x in h for x in pat.split("|")) or h in pat]
            if reasons:
                print(f"ok    {name}: {h} — allowed: {reasons[0]}")
            else:
                unexplained.append(h)
        if unexplained:
            print(f"FLAG  {name}: {', '.join(unexplained)}")
            n_flagged += 1
        else:
            n_clean += 1
    print(f"\n{n_clean} clean, {n_flagged} flagged")
    spark.stop()
    sys.exit(1 if n_flagged else 0)


if __name__ == "__main__":
    main()
