"""SparkSession factory.

One place to encode the engine-wide execution policy:

- UTC session timezone (the reference mixes naive and UTC-aware timestamps,
  SURVEY.md §1.2 — we normalize to UTC at the session level).
- Adaptive Query Execution ON (runtime re-plan: coalesce post-shuffle
  partitions, convert to broadcast join when a side turns out small, split
  skewed shuffle partitions). At 100 TB these are not nice-to-haves.
- Arrow enabled for every Python<->JVM data exchange (pandas UDFs,
  mapInPandas, toPandas) — row-at-a-time pickling is never acceptable.
- ``spark.sql.shuffle.partitions`` defaults sized for the local harness but
  is env-overridable; on a real cluster AQE coalescing makes the static
  value mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults for the local[32] test harness. On a 1000-executor cluster the
# launcher overrides master/shuffle-partitions; everything else carries over.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(
    app_name: str = "tbench-agentic-data-pipeline-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with the standard policy."""
    cpus = int(_DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime coalescing, broadcast-join demotion/promotion, skew split.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffle width: explicit, not the 200 default. AQE coalesces down.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Shuffled-hash join policy (optimization guide §3.1 and its §9
        # config block): SHJ skips both sort passes of sort-merge when the
        # build side fits a per-partition hash map. At sf0.1 this is a
        # deliberate no-op — the only two static SortMergeJoins in the
        # headline plans (q20/q21) are promoted to broadcast by AQE at
        # runtime either way (interleaved A/B confirmed timing-neutral) —
        # but at cluster scale, joins whose smaller side exceeds the
        # broadcast threshold yet is ≥3x smaller than the other side take
        # SHJ instead of sorting both sides. The planner's
        # canBuildLocalHashMap size gate and AQE's skew split keep
        # oversized builds on sort-merge automatically.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # AQE's runtime SMJ→SHJ rewrite is OFF until this is set (guide
        # §3.1): with it equal to advisoryPartitionSizeInBytes, a planned
        # sort-merge whose every post-shuffle build partition measures
        # ≤64 MB at runtime is rewritten to shuffled-hash before the
        # final stage runs (verified via the AQE plan-change log; at
        # sf0.1 broadcast promotion wins first, so local plans are
        # unchanged). Per-partition size-gated → scale-safe.
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "67108864")
        # Arrow for all Python exchange paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet: prune + push down aggressively.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Keep partition files right-sized for scan parallelism.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Broadcast threshold: dims (region/nation/vocab tables) always fit.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Catalog warehouse outside the repo (bucketed-table tests et al.).
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
