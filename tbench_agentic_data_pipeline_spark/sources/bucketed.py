"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4, scale).

At 100 TB the dominant cost of a fact⋈fact equi-join is the shuffle.
Bucketing both sides on the join key at WRITE time (same bucket count)
lets Spark plan a SortMergeJoin with NO Exchange: each task reads bucket
i of both tables. The write pays one shuffle once; every subsequent join,
aggregation, or dedup keyed on the bucket column is exchange-free.

``write_bucketed`` targets the session catalog (`saveAsTable` — bucketing
metadata lives in the catalog, not the parquet files); this works on the
in-memory catalog locally and any HMS/Unity/Glue catalog in production.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """Remove warehouse residue for ``table`` when the catalog has no entry.

    A killed session can leave ``<warehouse>/<table>`` on disk while the
    next session's fresh in-memory catalog knows nothing about it;
    ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS and
    ``mode("overwrite")`` cannot help because overwrite only reclaims
    locations the catalog owns. A location with no catalog entry is
    unreachable residue, so deleting it is safe. Only unqualified names
    resolved against the DEFAULT database are handled — the path cleared
    is the default database's managed location (``<warehouse>/<name>``),
    so when the session's current database is anything else, an
    unqualified ``tableExists`` would consult the wrong namespace and
    the clear could destroy a LIVE ``default.<name>``'s data (r14
    self-review); qualified names and non-default sessions keep Spark's
    own behavior. Two further guards bound the rm -rf blast radius (r14
    ADVICE — an EXTERNAL table in another database LOCATION'd at the
    default warehouse path would otherwise be live data): the delete is
    skipped when any other database carries a same-named table (the
    plausible way such an external gets created; skipping only forfeits
    cleanup — ``saveAsTable`` then surfaces the real error), and the
    location is deleted only when its content is shaped like Spark task
    output (directory of part-*/_SUCCESS/_committed*/_temporary/CRCs;
    Spark never leaves a plain file at a managed location, so a plain
    file there is someone's data and always survives — r15 self-review),
    so a location holding anything a human put there is never touched.
    The cross-database scan runs only once residue is actually present
    (r15 self-review: the common clean-warehouse write must not pay a
    per-database catalog RPC). Deletion failures (permissions, odd
    residue) are swallowed so ``saveAsTable`` surfaces the real,
    actionable error.
    """
    if "." in table or spark.catalog.currentDatabase() != "default":
        return
    if spark.catalog.tableExists(table):
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix):]
            break
    if not warehouse:
        return
    location = Path(warehouse) / table.lower()
    try:
        if not location.is_dir():
            return  # absent, or a plain file (never Spark residue)
        if not all(_spark_output_shaped(p.name) for p in location.iterdir()):
            return  # human content present — never delete
    except OSError:
        return
    try:
        for db in spark.catalog.listDatabases():
            if db.name != "default" and spark.catalog.tableExists(
                f"`{db.name}`.`{table}`"
            ):
                return
    except Exception:
        return  # can't prove the location is orphaned → don't delete
    try:
        shutil.rmtree(location)
    except OSError:
        pass


def _spark_output_shaped(name: str) -> bool:
    """True when a directory entry looks like Spark task/commit output —
    the only content ``_clear_stale_location`` may delete."""
    return (
        name.startswith("part-")
        or name.startswith(".part-")
        or name.startswith("_SUCCESS")
        or name.startswith("_committed")
        or name.startswith("_started")
        or name.startswith("_temporary")
        or name.endswith(".crc")
    )


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table."""
    _clear_stale_location(df.sparkSession, table)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key. With
    matching bucket specs the physical plan contains zero Exchange
    operators (assert via plans.explain.count_exchanges)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
