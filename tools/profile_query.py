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

With ``--jobs`` the Spark UI is enabled on an ephemeral port and, after
the last timed run of each query, the per-job wall-clock durations and
descriptions of the jobs that query issued are printed from the UI REST
API — the stage-level truth §1.1 of the optimization guide starts from.

Usage: python tools/profile_query.py <query> [<query> ...] [--runs N] [--jobs]
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


def _job_details(spark, since_job_id: int) -> list[str]:
    """Per-job wall times from the UI REST API for jobs after
    ``since_job_id`` (requires the session to run with the UI on)."""
    import json
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/jobs", timeout=5
        ) as r:
            jobs = json.loads(r.read())
    except Exception as e:
        return [f"  (job details unavailable: {type(e).__name__}: {e})"]
    out = []
    from datetime import datetime

    def _ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

    for j in sorted(jobs, key=lambda j: j["jobId"]):
        if j["jobId"] <= since_job_id:
            continue
        try:
            dur = (_ts(j["completionTime"]) - _ts(j["submissionTime"])).total_seconds()
        except Exception:
            dur = float("nan")
        desc = (j.get("description") or j.get("name") or "")[:110]
        out.append(
            f"  job {j['jobId']}: {dur:.3f}s stages={len(j.get('stageIds', []))} "
            f"tasks={j.get('numTasks')} {desc}"
        )
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
        args = [a for a in args if a != str(runs)]
    want_jobs = "--jobs" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    extra = {"spark.ui.enabled": "true", "spark.ui.port": "4047"} if want_jobs else None
    spark = get_session("profile", extra_conf=extra)
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
            j0_max = max(
                spark.sparkContext._jsc.sc()
                .statusTracker()
                .getJobIdsForGroup(None)
                or [-1]
            )
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
            if want_jobs and r == runs - 1:
                for line in _job_details(spark, j0_max):
                    print(line, flush=True)
            gc.collect()
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
