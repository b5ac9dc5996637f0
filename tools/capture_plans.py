#!/usr/bin/env python
"""Dump explain('formatted') for headline queries into plans/r<N>/ as
<query>_<tag>.txt — the optimization rounds' before/after plan evidence.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag: e.g. "before" / "after"; with no query names, all HEADLINE
  queries from bench.py are captured.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _extra_queries
from tbench_agentic_data_pipeline_spark import registry
from tbench_agentic_data_pipeline_spark.plans.explain import formatted_plan
from tbench_agentic_data_pipeline_spark.session import get_session

ROUND = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        ROUND,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("capture-plans")
    fns = {n: e.fn for n, e in registry.collect().items()}
    fns.update(_extra_queries())
    for name in names:
        if name not in fns:
            print(f"skip {name}: not found", flush=True)
            continue
        try:
            plan = formatted_plan(fns[name](spark, sf_dir))
        except Exception as e:
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
