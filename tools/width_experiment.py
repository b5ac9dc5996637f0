#!/usr/bin/env python
"""r16 item-1 measurement harness (guide §1: measure FIRST): how does the
Python/Arrow-boundary stage width affect the PQ/kNN similarity family at
fixture scale?

The r15 driver scaling block showed NEGATIVE core-scaling for exactly the
MapInPandas/applyInPandas family (sim_pq_adc_topk 8-vs-32-core ratio 0.32:
3x FASTER on 8 cores), i.e. the 32-way Arrow fan-out costs more than the
work at sf0.1. This sweeps the fan-out width W while the session stays at
local[32], by rebinding the operators' ``spread_for_compute`` reference to
a fixed-width repartition (same key, same shape, different N):

    python tools/width_experiment.py [widths...]

Prints best-of-3 noop-sink seconds per (query, width). W=0 means "shipped
code, untouched" (the control arm).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbench_agentic_data_pipeline_spark.session import get_session


def main() -> None:
    widths = [int(a) for a in sys.argv[1:]] or [0, 2, 4, 8, 16, 32]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("width-exp")

    from tbench_agentic_data_pipeline_spark.operators import similarity as S

    # bench-equivalent warmers: python worker pool + codegen paths
    par = spark.sparkContext.defaultParallelism

    def _touch(batches):
        yield from batches

    spark.range(par * 4, numPartitions=par).mapInPandas(_touch, "id long").count()

    queries = {
        "sim_pq_adc_topk": S.sim_pq_adc_topk,
        "sim_topk_cosine_arrow": S.sim_topk_cosine_arrow,
        "sim_knn_join_arrow": S.sim_knn_join_arrow,
        "sim_knn_join_auto": S.sim_knn_join_auto,
        "sim_ivfpq_topk": S.sim_ivfpq_topk,
    }

    shipped = S.spread_for_compute

    def fixed_width(w):
        def _spread(df, key, *, source_path=None):
            return df.repartition(w, key)

        return _spread

    # warm each query once on the shipped path
    for name, fn in queries.items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"{name}: warm FAILED {e}", flush=True)

    import gc

    for w in widths:
        S.spread_for_compute = shipped if w == 0 else fixed_width(w)
        for name, fn in queries.items():
            best = None
            for _ in range(3):
                gc.collect()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            print(f"w={w:>2} {name}: {best:.3f}s", flush=True)
    S.spread_for_compute = shipped
    spark.stop()


if __name__ == "__main__":
    main()
