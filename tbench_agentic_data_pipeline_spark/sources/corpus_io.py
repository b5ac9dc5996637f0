"""JSONL corpus I/O: the interchange format training-data pipelines live on.

The reference stores datapoints in CSV/JSON files; a 100 TB text corpus
ships as line-delimited JSON (one document per line, gzip/zstd shards).
These readers/writers add that surface with the two properties corpus
ingest actually needs:

- an EXPLICIT schema (never inference: a schema-inferring read is a full
  extra pass over 100 TB, and drifting shards would silently widen types);
- a corrupt-line QUARANTINE instead of a crash or a silent drop — real
  crawls contain truncated lines, and both failure modes (abort after 3
  days / lose rows invisibly) are wrong. PERMISSIVE mode keeps bad lines
  in a ``_corrupt_record`` column; ``read_jsonl`` splits them into a
  separate frame the caller can count, sample, and archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON with a required schema. Returns
    ``(good, quarantine)``: ``good`` holds rows matching the schema,
    ``quarantine`` holds the raw text of unparseable/mismatched lines.

    Spark requires the corrupt-record column to be selected AND the
    frame cached before filtering on it (the JSON reader otherwise
    prunes the very parse that populates it); the cache here is
    metadata-scale at fixture size and bounded by the corrupt fraction's
    line width in production."""
    # StructType.add MUTATES the receiver — copy so the caller's schema
    # survives repeated reads.
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    ).cache()
    good = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "gzip",
) -> None:
    """Write line-delimited JSON shards, optionally hive-partitioned
    (``lang=en/part-*.json.gz``) so downstream language/source filters
    prune whole directories. Uses Spark's native JSON sink — one document
    per line, codec-compressed, splittable ingest at any scale."""
    writer = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
