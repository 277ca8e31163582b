"""Stage-level profile of the bench metrics_e2e entry (scratch, r06).

Replicates bench.py's metrics_e2e workload (600k tokenized sequences,
8-point feature source) and times each lifecycle stage separately so the
enrich / sample / CV split is measured, not guessed.

    python tools/r06b_metrics_profile.py [runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ROWS = int(os.environ.get("PROFILE_ROWS", "600000"))


def main() -> None:
    from upgini_spark.fixtures import feature_source, tokenized_sequences
    from upgini_spark.pipeline.enricher import SparkFeaturesEnricher
    from upgini_spark.session import get_spark

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    spark = get_spark(
        "metrics_profile", master=f"local[{CPUS}]", shuffle_partitions=4 * CPUS
    )
    cache = "/tmp/upgini_spark_bench_sf0.1"
    left_path, right_path = f"{cache}/sequences", f"{cache}/features"
    if not os.path.isdir(left_path):
        shutil.rmtree(cache, ignore_errors=True)
        tokenized_sequences(spark, N_ROWS, n_partitions=4 * CPUS).write.parquet(
            left_path
        )
        feature_source(
            spark, N_ROWS, points_per_entity=8, n_partitions=4 * CPUS
        ).write.parquet(right_path)
    left = spark.read.parquet(left_path)
    right = spark.read.parquet(right_path)

    seq = left.withColumn(
        "client_f", (F.col("n_tok") % 97).cast("double")
    ).withColumn("target_bin", (F.col("n_tok") % 2).cast("int"))

    def one_run(tag: str) -> None:
        t0 = time.time()
        enr = SparkFeaturesEnricher(right).fit(
            seq, "doc_id", "event_time", feature_cols=["client_f"],
            target_col="target_bin", validate_features=False,
        )
        t_fit = time.time()
        report = enr.calculate_metrics(seq, "target_bin", max_rows=50_000)
        t_all = time.time()
        print(
            f"  [{tag}] fit {t_fit - t0:6.2f}s  calculate_metrics "
            f"{t_all - t_fit:6.2f}s  total {t_all - t0:6.2f}s"
        )

    # stage-split replication of calculate_metrics internals
    def staged_run(tag: str) -> None:
        from upgini_spark.functions.sampling import hash_sample_exact
        from upgini_spark.functions.stats import define_task
        from upgini_spark.pipeline.cv import stratified_kfold_column

        enr = SparkFeaturesEnricher(right).fit(
            seq, "doc_id", "event_time", feature_cols=["client_f"],
            target_col="target_bin", validate_features=False,
        )
        st = enr.state
        t0 = time.time()
        needed = dict.fromkeys(
            [st.entity_col, st.ts_col, "target_bin", *st.feature_cols,
             "eval_set_index"]
        )
        enriched = enr.transform(
            seq.select(*[c for c in needed if c in seq.columns])
        )
        task = define_task(seq.select("target_bin"), "target_bin", has_date=True)
        t_plan = time.time()
        keep = [st.entity_col, st.ts_col, "target_bin", "client_f",
                *st.generated_formulas, "eval_set_index"]
        narrow = enriched.select(*keep).localCheckpoint(eager=True)
        t_ckpt = time.time()
        segcol = F.col("eval_set_index")
        train_sdf = narrow.filter(segcol.isNull() | (segcol == 0))
        n_train = train_sdf.count()
        if n_train > 50_000:
            train_sdf = hash_sample_exact(
                train_sdf, 50_000, [st.entity_col, st.ts_col], total=n_train
            )
        folded = stratified_kfold_column(
            train_sdf, "target_bin", [st.entity_col, st.ts_col], 5
        )
        train_pdf = folded.drop("eval_set_index").toPandas()
        t_sample = time.time()
        segs = sorted(
            r[0] for r in narrow.select("eval_set_index").distinct().collect()
            if r[0] not in (None, 0)
        )
        eval_frames = []
        for s in segs:
            ev = narrow.filter(segcol == s).drop("eval_set_index")
            n_ev = ev.count()
            if n_ev > 50_000:
                ev = hash_sample_exact(
                    ev, 50_000, [st.entity_col, st.ts_col], total=n_ev
                )
            eval_frames.append(ev.toPandas())
        t_evals = time.time()
        from upgini_spark.pipeline.metrics import calculate_metrics_report

        calculate_metrics_report(
            train_pdf, "target_bin", baseline_cols=["client_f"],
            enriched_cols=["client_f", *st.generated_formulas],
            fold_col="fold_id", task_type=task, eval_frames=eval_frames,
            return_harnesses=True,
        )
        t_cv = time.time()
        print(
            f"  [{tag}] plan+task {t_plan - t0:5.2f}  ckpt(enrich) "
            f"{t_ckpt - t_plan:5.2f}  sample+fold+collect {t_sample - t_ckpt:5.2f}  "
            f"evals {t_evals - t_sample:5.2f}  cv {t_cv - t_evals:5.2f}  "
            f"total {t_cv - t0:5.2f}"
        )

    for i in range(runs):
        one_run(f"e2e warm{i}")
    for i in range(runs):
        staged_run(f"staged {i}")
    spark.stop()


if __name__ == "__main__":
    main()
