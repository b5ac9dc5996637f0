#!/usr/bin/env python
"""Regenerate the plan-metrics table in SCALING.md (between the AUTOGEN
markers): per registered query — shuffle count, broadcast use, pushdown."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbench_agentic_data_pipeline_spark import registry
from tbench_agentic_data_pipeline_spark.plans.explain import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
)
from tbench_agentic_data_pipeline_spark.session import get_session

SF = "/root/testdata/sf0.01"
START, END = "<!-- AUTOGEN:PLAN_METRICS -->", "<!-- /AUTOGEN:PLAN_METRICS -->"


def main() -> None:
    spark = get_session("scaling")
    rows = []
    for name, e in sorted(registry.collect().items()):
        df = e.fn(spark, SF)
        push = "yes" if any(p.strip() for p in pushed_filters(df)) else "—"
        rows.append(
            f"| `{name}` | {count_exchanges(df)} | "
            f"{'yes' if has_broadcast_join(df) else '—'} | {push} |"
        )
    table = "\n".join(
        ["| query | shuffles | broadcast | pushdown |", "|---|---|---|---|"] + rows
    )
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    text = open(path).read()
    text = re.sub(
        f"{re.escape(START)}.*?{re.escape(END)}",
        f"{START}\n{table}\n{END}",
        text,
        flags=re.S,
    )
    open(path, "w").write(text)
    print(f"SCALING.md updated: {len(rows)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
