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

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table."""
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
