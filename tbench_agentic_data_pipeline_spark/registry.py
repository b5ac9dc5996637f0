"""Query registry: the bridge between operator modules and the driver contract.

Every operator module registers its oracle-checkable queries with the
``@query`` decorator; ``__spark_entry__.py`` asks this module for the full
``queries()`` / ``oracle_sql()`` maps. Keeping registration next to each
operator implementation keeps the SURVEY.md §2 parity auditable: the
operator, its query form, and its DuckDB oracle live in one file.

Contract reminders (driver semantics, /root/repo/__spark_entry__.py):
- each query callable takes (spark, sf_dir) and returns a DataFrame;
- oracle SQL runs under DuckDB against the same parquet tables registered
  as views (region nation customer supplier part orders lineitem events
  documents embeddings);
- the driver compares row-count + schema + order-insensitive value hash,
  sorting columns BY NAME — so Spark and SQL column names must match
  exactly (alias everything);
- queries without oracle SQL get a weaker rows-only check (reserved for
  genuinely non-SQL-expressible ops: pandas-UDF AST analysis, stateful
  streaming).

Determinism rules for hash-stable results (both engines):
- no bare LIMIT without a total order that ends in a unique key;
- floating aggregates rounded (sum-order across engines differs in ulps);
- DuckDB integer SUM yields HUGEINT → always CAST to BIGINT in oracle SQL;
- timestamps in outputs formatted to strings ('yyyy-MM-dd HH:mm:ss').
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    survey_ids: tuple[str, ...]  # SURVEY.md §2 operator ids this covers


_REGISTRY: dict[str, QueryEntry] = {}

# Modules that define @query entries. Imported lazily by collect() so that a
# partially-built tree never breaks the already-registered queries.
_QUERY_MODULES: tuple[str, ...] = (
    "tbench_agentic_data_pipeline_spark.operators.aggregates",
    "tbench_agentic_data_pipeline_spark.operators.analytics",
    "tbench_agentic_data_pipeline_spark.operators.filters",
    "tbench_agentic_data_pipeline_spark.operators.joins",
    "tbench_agentic_data_pipeline_spark.operators.setops",
    "tbench_agentic_data_pipeline_spark.operators.windows",
    "tbench_agentic_data_pipeline_spark.operators.mutations",
    "tbench_agentic_data_pipeline_spark.operators.queue",
    "tbench_agentic_data_pipeline_spark.operators.validation",
    "tbench_agentic_data_pipeline_spark.operators.dedup",
    "tbench_agentic_data_pipeline_spark.operators.similarity",
    "tbench_agentic_data_pipeline_spark.operators.text",
    "tbench_agentic_data_pipeline_spark.operators.multimodal",
    "tbench_agentic_data_pipeline_spark.functions.scalars",
    "tbench_agentic_data_pipeline_spark.functions.udfs",
    "tbench_agentic_data_pipeline_spark.streaming.windows",
)


def query(
    name: str, *, oracle: str | None = None, survey: str = ""
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a driver-checkable query.

    ``oracle`` is the DuckDB-dialect SQL equivalent (None → rows-only).
    ``survey`` lists the SURVEY.md §2 ids covered, comma-separated.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryEntry(
            name=name,
            fn=fn,
            oracle=oracle,
            survey_ids=tuple(s.strip() for s in survey.split(",") if s.strip()),
        )
        return fn

    return deco


def collect() -> dict[str, QueryEntry]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Tolerate only the query module ITSELF being absent
            # (incremental bring-up). A missing transitive dependency
            # (pandas, pyarrow, a typo'd import inside the module) must
            # fail loudly — silently shrinking queries()/oracle_sql()
            # would quietly weaken the driver's correctness gate.
            if e.name != mod:
                raise
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in collect().items() if e.oracle is not None}
