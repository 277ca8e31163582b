"""Round-6 optimization harness (bench.py stays FROZEN — guide §1.4).

Per-query noop-sink timing + .explain("formatted") capture, runnable for
any subset of the declared queries:

    python bench_extra.py time  q1 q2 ...      # best-of-N noop timings
    python bench_extra.py plan  q1 q2 ...      # write plans/r06/<q>_{tag}.txt
    python bench_extra.py jobs  q1             # per-job wall breakdown

Env: SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's measured scale),
SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_RUNS (default 3),
BENCH_EXTRA_TAG (plan file suffix, default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")


def _noop(make_df) -> float:
    """Time CONSTRUCTION + noop write, same methodology as bench.py:
    eager-fit queries (k-means, connected components, record ids) do
    real work while building the frame."""
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    from upgini_spark.session import get_spark
    import __spark_entry__ as entry_mod

    mode, names = sys.argv[1], sys.argv[2:]
    spark = get_spark(
        "bench_extra", master=f"local[{CPUS}]", shuffle_partitions=4 * CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry_mod.queries()
    out: dict[str, object] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        if mode == "time":
            samples = [
                round(_noop(lambda: fn(spark, SF_DIR)), 3) for _ in range(RUNS)
            ]
            out[name] = {"min": min(samples), "samples": samples}
            print(json.dumps({name: out[name]}), flush=True)
        elif mode == "plan":
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r06/{name}_{TAG}.txt"
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange)", flush=True)
        elif mode == "jobs":
            t0 = time.time()
            _noop(lambda: fn(spark, SF_DIR))
            print(f"{name}: {time.time() - t0:.3f}s total", flush=True)
        spark.sparkContext.setJobDescription(None)
    if mode == "time":
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
