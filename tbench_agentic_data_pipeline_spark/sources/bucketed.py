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
    unreachable residue, so deleting it is safe. Only unqualified names in
    the default database are handled (the managed location is
    ``<warehouse>/<lowercased name>``); qualified names keep Spark's own
    behavior.
    """
    if "." in table or spark.catalog.tableExists(table):
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix):]
            break
    if not warehouse:
        return
    location = Path(warehouse) / table.lower()
    if location.exists():
        shutil.rmtree(location, ignore_errors=True)


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
