"""Plan inspection helpers (SURVEY.md §4).

A plan that is correct at sf0.01 but wrong-shaped at 100 TB is a bug the
result hash cannot catch, so the shape itself is asserted in tests:
filters pushed into the parquet scan, projections pruned, dimension joins
broadcast, exchange counts bounded. These helpers parse
``explain('formatted')`` output — the same thing a human reviews — and
give tests something to pin.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``explain('formatted')`` output as a string. Captured from the
    public ``DataFrame.explain`` (it only prints) instead of reaching
    into ``_jvm`` — r6: the package now uses NO private JVM APIs
    anywhere (guarded by ``tests/test_plans.py``), so every code path,
    including these diagnostics, works under Spark Connect."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every parquet scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning witness."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count: ``(N) Exchange`` operator entries in the formatted
    plan. BroadcastExchange and ReusedExchange print under their own names
    and are deliberately not counted — broadcasts move dim-sized data and
    reuse moves nothing."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans (``[codegen id : N]`` markers in formatted
    mode) — fewer/wider is better for scalar pipelines."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))
