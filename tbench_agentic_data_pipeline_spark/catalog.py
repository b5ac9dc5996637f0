"""Table catalog: load the driver's parquet fixtures and register views.

The driver provides deterministic TPC-H-ish tables plus an events stream
table and LLM-pipeline tables (documents, embeddings) under
``/root/testdata/sf{0.001,0.01,0.1}/`` (TESTDATA.md). This module is the
single place that knows table names and how to load them, so every operator
takes DataFrames (or a sf_dir) and stays storage-agnostic.

At cluster scale the same API points at object-store prefixes; nothing else
in the engine changes.
"""

from __future__ import annotations

import os


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join these against fact tables.
DIM_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# The driver's parquet fixtures store timestamps as INT64 TIMESTAMP(NANOS),
# which Spark's vectorized reader rejects. We read nanos as long (legacy
# flag, runtime-settable) and rebuild proper TimestampType columns here, so
# the rest of the engine only ever sees real timestamps.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Parquet scan → column pruning + predicate
    pushdown come free from the declarative plan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[col] if col in df.columns else None
        if field is not None and isinstance(field.dataType, T.LongType):
            # nanos → micros. Integer `div`, NOT `/`: float division of
            # epoch-nanos (~1.7e18 > 2^53) silently loses precision.
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000L"))
            )
    return df


def spread_for_compute(df: DataFrame, key: str) -> DataFrame:
    """Repartition narrow-but-compute-heavy input to full parallelism.

    Small parquet fixtures arrive as ONE scan partition (file <
    maxPartitionBytes), which would serialize the per-row shingle/hash/
    ngram/vector work onto a single core — measured 8× slowdown at sf0.1.
    The shuffle moves only the selected columns: trivial bytes for full
    CPU fan-out. At 100 TB the scan is already thousands of partitions,
    so the exchange is SKIPPED entirely (conditional, below) —
    narrow-input fan-out never costs a shuffle on a real cluster.

    Partition introspection goes through ``df.rdd`` (the only pre-action
    probe in classic mode) inside a try/except: under Spark Connect
    ``.rdd`` is unsupported, and there we keep the unconditional
    repartition — AQE coalesces it to near-no-op when the input is already
    wide, so the fallback is safe on both narrow and wide inputs."""
    try:
        sc = df.sparkSession.sparkContext
        parallelism = sc.defaultParallelism
        if df.rdd.getNumPartitions() >= parallelism:
            return df
    except Exception:
        parallelism = df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"
        )
    return df.repartition(int(parallelism), key)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so ``spark.sql`` works
    against the same names the DuckDB oracle uses."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
