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

import math
import os
from functools import lru_cache


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


def table_path(sf_dir: str, name: str) -> str:
    """Filesystem path of one fixture table (single place for the layout)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


# Per-process table-schema cache (r15 optimization round, guide §1.2/§6):
# footer schema inference launches one Spark job (~0.1 s even warm) on
# EVERY ``spark.read.parquet`` call, and nearly every query loads 1-4
# fixture tables — a uniform per-query tax that a metastore would absorb
# at cluster scale (the catalog, not the files, is the schema source of
# truth there). The cache holds ONLY metadata (StructType), never rows or
# results, and is keyed on the table's file signature (per-file name,
# size, mtime_ns), so a rewritten or regenerated fixture re-infers
# automatically — the cached schema can never describe different bytes.
_TABLE_SCHEMA_CACHE: dict[str, tuple[tuple, T.StructType]] = {}


def _file_signature(path: str) -> tuple | None:
    """Stable content signature of a scan source: (name, size, mtime_ns)
    per data file, sorted. None when unknowable (object stores) — the
    caller then skips caching, exactly like `_source_file_sizes`."""
    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return ((os.path.basename(path), st.st_size, st.st_mtime_ns),)
        if os.path.isdir(path):
            entries = []
            for root, _, files in os.walk(path):
                for f in files:
                    if f.startswith((".", "_")):
                        continue
                    st = os.stat(os.path.join(root, f))
                    entries.append((f, st.st_size, st.st_mtime_ns))
            return tuple(sorted(entries))
    except OSError:
        return None
    return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Parquet scan → column pruning + predicate
    pushdown come free from the declarative plan. The schema comes from
    the per-process cache when the table's file signature matches a
    prior inference (see `_TABLE_SCHEMA_CACHE`); plans are byte-identical
    either way — supplying the schema only skips the inference job."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, name)
    sig = _file_signature(path)
    key = os.path.realpath(path)
    cached = _TABLE_SCHEMA_CACHE.get(key)
    if sig is not None and cached is not None and cached[0] == sig:
        df = spark.read.schema(cached[1]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if sig is not None:
            _TABLE_SCHEMA_CACHE[key] = (sig, df.schema)
    for col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[col] if col in df.columns else None
        if field is None:
            continue
        if isinstance(field.dataType, T.LongType):
            # nanos → micros. Integer `div`, NOT `/`: float division of
            # epoch-nanos (~1.7e18 > 2^53) silently loses precision.
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000L"))
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            # Fixture generations vary: TIMESTAMP(NANOS) long-encoded vs
            # TIMESTAMP(MICROS) isAdjustedToUTC=false (read as NTZ). The
            # engine (and its DuckDB-hash-verified outputs) is typed
            # against TimestampType; under the UTC session timezone the
            # cast is value-preserving, and NTZ-rejecting functions
            # (unix_millis et al.) keep working.
            df = df.withColumn(col, F.col(col).cast(T.TimestampType()))
    return df


@lru_cache(maxsize=256)
def _scan_partition_estimate(
    path: str, max_partition_bytes: int, open_cost: int, parallelism: int
) -> int | None:
    """Estimate how many partitions Spark's file scan will produce for
    ``path``, from file sizes alone — no plan analysis, no ``.rdd``.

    Mirrors ``FilePartition.maxSplitBytes``: files are split into chunks of
    ``min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism))``
    and bin-packed, so the partition count is ~``ceil(total/maxSplit)``.
    Returns None for non-local paths (object stores) — the caller falls
    back to an unconditional repartition that AQE coalesces when wide.
    Cached: fixture file sizes never change within a session, and this is
    called once per query invocation (the old ``df.rdd`` probe re-analyzed
    the plan every call — a uniform +0.1-0.3 s tax on every small query).
    """
    sizes = _source_file_sizes(path)
    if sizes is None:
        return None
    if not sizes:
        return 0
    total = sum(sizes) + open_cost * len(sizes)
    max_split = max(
        1,
        min(
            max_partition_bytes,
            max(open_cost, total // max(parallelism, 1)),
        ),
    )
    # Split each file into <= max_split chunks, then greedy-pack (Spark's
    # FilePartition.getFilePartitions): a partition closes when adding the
    # next chunk would exceed max_split; open_cost pads each chunk.
    chunks: list[int] = []
    for sz in sorted(sizes, reverse=True):
        n = max(1, math.ceil(sz / max_split))
        chunks.extend([math.ceil(sz / n)] * n)
    partitions, current = 0, 0
    for c in chunks:
        if current > 0 and current + c > max_split:
            partitions += 1
            current = 0
        current += c + open_cost
    return partitions + (1 if current > 0 else 0)


def _parse_byte_conf(value: object, default: int) -> int:
    """Parse a Spark byte-size conf ("134217728", "128m", "1g", "512kb").

    Unsuffixed values are plain bytes (Spark's own convention for
    ``maxPartitionBytes``) — no magnitude guessing."""
    s = str(value).strip().lower()
    mult = 1
    for suffix, m in (
        ("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024)
    ):
        if s.endswith(suffix + "b"):
            s, mult = s[: -2], m
            break
        if s.endswith(suffix):
            s, mult = s[: -1], m
            break
    else:
        s = s.removesuffix("b")
    try:
        return int(s) * mult
    except (ValueError, TypeError):
        return default


def _target_parallelism(spark: SparkSession) -> int:
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:
        # Spark Connect: no SparkContext. Conf may be non-numeric ('auto').
        try:
            return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        except (ValueError, TypeError):
            return 200


def release_local_checkpoint(df: DataFrame) -> None:
    """Eagerly free a ``localCheckpoint()``'s executor storage blocks.

    ContextCleaner frees a checkpoint's blocks only after the driver-side
    Python reference is GC'd — the r13 residue mechanism that degraded
    checkpoint-heavy session-mates 2-4× (SCALING.md, bench protocol).
    Cross-query that is handled by ``gc.collect()`` between bench queries;
    WITHIN a query that keeps superseded checkpoints (a convergence
    loop's previous round — ``connected_components`` is the user) pinned
    for the query's whole lifetime. This reaches through the checkpointed
    DataFrame's ``LogicalRDD`` to the persisted internal RDD and
    unpersists it directly (non-blocking).

    Only call on checkpoints that no live plan still reads: an unpersisted
    local checkpoint is NOT recomputable. Best-effort — on Spark Connect
    (no ``_jdf``) or an unexpected plan shape it silently does nothing
    and the driver-GC path reclaims the blocks as before. This is the
    package's single sanctioned private-handle use, exempted by name in
    ``tests/test_plans.py::test_package_uses_no_private_jvm_apis``."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def spread_for_compute(
    df: DataFrame, key: str, *, source_path: str | None = None
) -> DataFrame:
    """Repartition narrow-but-compute-heavy input to full parallelism.

    Small parquet fixtures arrive as ONE scan partition (file <
    maxPartitionBytes), which would serialize the per-row shingle/hash/
    ngram/vector work onto a single core — measured 8× slowdown at sf0.1.
    The shuffle moves only the selected columns: trivial bytes for full
    CPU fan-out. At 100 TB the scan is already thousands of partitions,
    so the exchange is SKIPPED entirely (conditional, below) —
    narrow-input fan-out never costs a shuffle on a real cluster.

    ``source_path`` is the scan's file/directory (``catalog.table_path``);
    with it the narrow/wide decision comes from a cached file-size
    estimate — zero per-call plan analysis. Without it (derived inputs,
    object-store paths) we repartition unconditionally and let AQE
    coalesce the exchange to near-no-op when the input is already wide."""
    spark = df.sparkSession
    parallelism = _target_parallelism(spark)
    if source_path is not None:
        mpb = _parse_byte_conf(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"),
            134_217_728,
        )
        # openCostInBytes must come from the session like mpb does — a
        # deployment tuning it for many-small-files layouts would
        # otherwise make this estimate diverge from Spark's actual
        # maxSplitBytes and mis-skip (or mis-add) the fan-out
        oc = _parse_byte_conf(
            spark.conf.get("spark.sql.files.openCostInBytes", "4194304"),
            4_194_304,
        )
        est = _scan_partition_estimate(source_path, mpb, oc, parallelism)
        if est is not None and est >= parallelism:
            return df
    return df.repartition(parallelism, key)


# Byte floor per partition for stages whose heavy work crosses the
# JVM→Python Arrow boundary (r16 optimization round, guide §4: batch
# sizing is part of the boundary cost). Each MapInPandas/applyInPandas
# TASK pays a fixed Python-side cost (worker dispatch, Arrow
# serialization setup, numpy dispatch) regardless of rows, so fanning a
# small input to full parallelism multiplies fixed cost past the work:
# the r15 driver scaling block measured the PQ/kNN family 1.3-3x FASTER
# at 8 cores than 32 (sim_pq_adc_topk low/high ratio 0.32), and the r16
# width sweep (tools/width_experiment.py, local[32], sf0.1, best-of-3)
# reproduced it directly:
#
#   width          2      4      8     16     32(=shipped)
#   pq_adc       0.588  0.546  0.525  0.526  0.890
#   topk_cosine  0.521  0.511  0.474  0.479  0.619
#   knn_arrow    0.414  0.366  0.362  0.341  0.447
#   knn_auto     0.514  0.506  0.504  0.479  0.780
#   ivfpq        1.450  1.343  1.222  1.362  1.830
#
# 128 KB of compressed source per task ≈ 1k embedding rows ≈ one Arrow
# batch of real work — the knee of the curve above. The clamp below
# keeps this strictly a SMALL-INPUT gate: at any real scale
# ceil(bytes / floor) dwarfs the session parallelism, so the width is
# the session parallelism (or, wide-scan case, no exchange at all) and
# plans are unchanged.
_PY_STAGE_PARTITION_BYTES = 128 * 1024


def spread_for_py_compute(
    df: DataFrame, key: str, *, source_path: str | None = None
) -> DataFrame:
    """:func:`spread_for_compute` for pipelines whose dominant compute
    runs in Python workers (``mapInPandas``/``applyInPandas`` GEMM,
    codec, encode stages): same narrow/wide gate, but when the source is
    fixture-small the fan-out width is derived from the source bytes
    (``ceil(bytes / _PY_STAGE_PARTITION_BYTES)``, clamped to [1,
    parallelism]) instead of pinned at full parallelism — per-task
    Python fixed costs dominate tiny partitions (measurements above).
    Wide inputs (a 100 TB scan) skip the exchange exactly like
    ``spread_for_compute``; unknowable sizes (object stores) fall back
    to the full-parallelism repartition that AQE coalesces."""
    spark = df.sparkSession
    parallelism = _target_parallelism(spark)
    if source_path is not None:
        mpb = _parse_byte_conf(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"),
            134_217_728,
        )
        oc = _parse_byte_conf(
            spark.conf.get("spark.sql.files.openCostInBytes", "4194304"),
            4_194_304,
        )
        est = _scan_partition_estimate(source_path, mpb, oc, parallelism)
        if est is not None and est >= parallelism:
            return df
        nbytes = source_bytes(source_path)
        if nbytes is not None:
            width = max(
                1,
                min(
                    parallelism,
                    math.ceil(nbytes / _PY_STAGE_PARTITION_BYTES),
                ),
            )
            return df.repartition(width, key)
    return df.repartition(parallelism, key)


def _source_file_sizes(path: str) -> list[int] | None:
    """Per-file byte sizes of a scan source (file or directory; hidden
    and marker files excluded, matching Spark's file-index filter), or
    None when unknowable (object stores) — the single walk both the
    partition estimate and ``source_bytes`` consume."""
    try:
        if os.path.isfile(path):
            return [os.path.getsize(path)]
        if os.path.isdir(path):
            return [
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
                if not f.startswith((".", "_"))
            ]
    except OSError:
        return None
    return None


def source_bytes(path: str) -> int | None:
    """Total on-disk bytes of a scan source (file or directory), or None
    when unknowable (object stores). For operators whose in-memory rows
    BLOW UP relative to the compressed scan (shingle/token arrays run
    30-60x parquet bytes), Spark's file-size-based join estimation will
    happily broadcast a multi-hundred-MB relation — callers use this to
    switch join strategy BEFORE the estimator walks off that cliff."""
    sizes = _source_file_sizes(path)
    return None if sizes is None else sum(sizes)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so ``spark.sql`` works
    against the same names the DuckDB oracle uses."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
