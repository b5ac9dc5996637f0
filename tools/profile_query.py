#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query: warm the session the same way bench.py does, then
run the query to the noop sink N times reporting
  - construction seconds (the fn() call — driver-side eager work:
    localCheckpoints, convergence loops, collects)
  - action seconds (the noop write of the returned DataFrame)
  - Spark job count attributed to each phase (scheduling round-trips are
    the dominant fixed cost at fixture scale; each job is also a driver
    barrier at any scale)

Usage: python tools/profile_query.py <query> [<query> ...] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbench_agentic_data_pipeline_spark import registry
from tbench_agentic_data_pipeline_spark.session import get_session


def _job_count(spark) -> int:
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    return len(tracker.getJobIdsForGroup(None))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
        args = [a for a in args if a != str(runs)]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_session("profile")
    fns = {n: e.fn for n, e in registry.collect().items()}
    try:
        from bench import _extra_queries

        fns.update(_extra_queries())
    except Exception:
        pass

    # bench.py-equivalent warmup: JVM + parquet footers + python workers
    parallelism = spark.sparkContext.defaultParallelism

    def _touch(batches):
        yield from batches

    (
        spark.range(parallelism * 4, numPartitions=parallelism)
        .mapInPandas(_touch, "id long")
        .count()
    )

    for name in args:
        if name not in fns:
            print(f"{name}: NOT FOUND")
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # one untimed warm run (codegen/JIT), like bench's best-of-3 min
        try:
            fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"{name}: warmup FAILED {type(e).__name__}: {e}")
            continue
        import gc

        gc.collect()
        for r in range(runs):
            j0 = _job_count(spark)
            t0 = time.perf_counter()
            df = fns[name](spark, sf_dir)
            t1 = time.perf_counter()
            j1 = _job_count(spark)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = _job_count(spark)
            print(
                f"{name} run{r}: total={t2 - t0:.3f}s "
                f"construct={t1 - t0:.3f}s ({j1 - j0} jobs) "
                f"action={t2 - t1:.3f}s ({j2 - j1} jobs)",
                flush=True,
            )
            gc.collect()
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
