"""Oracle-differential tests: every registered query with an oracle must
hash-match DuckDB at sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import os
import pytest

from tbench_agentic_data_pipeline_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

_ENTRIES = registry.collect()
_WITH_ORACLE = sorted(n for n, e in _ENTRIES.items() if e.oracle is not None)
_ROWS_ONLY = sorted(n for n, e in _ENTRIES.items() if e.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, name):
    e = _ENTRIES[name]
    res = compare(name, spark, e.fn, e.oracle, SF_ORACLE)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows > 0, f"{name}: query returned 0 rows — weak test"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = _ENTRIES[name].fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_DEEP_PARITY"),
    reason="sf0.1 window sweep is a multi-minute opt-in (SPARK_GRAFT_DEEP_PARITY=1)",
)
@pytest.mark.parametrize(
    "name", [n for n in __import__("tbench_agentic_data_pipeline_spark.registry", fromlist=["_FRONT_ORDER"])._FRONT_ORDER]
)
def test_window_parity_at_bench_scale(spark, name):
    """Scale-dependent oracle divergences (frame precision, NULL-vs-empty
    aggregates, rounding at sum magnitudes) can be invisible at sf0.01 and
    bite at sf0.1 — exactly how the w8 RANGE-frame bug surfaced. This
    sweep re-runs the driver's gate for every window query at bench
    scale. Round-4 baseline: 50/50 green."""
    e = _ENTRIES[name]
    if e.oracle is None:
        return
    res = compare(name, spark, e.fn, e.oracle, "/root/testdata/sf0.1")
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows > 0
