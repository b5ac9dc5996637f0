"""Scan-side sources (SURVEY.md §2.1 S1-S5).

The reference's tables are CSVs with embedded newlines, quotes and
JSON-in-cell payloads (``agents/dp_builder_workspace/review/
datapoints_for_review.csv``), read row-at-a-time via ``csv.DictReader``
(``shared_tools/patch_dp.py:37-47``), plus a whole-document JSON state
store (``task_manager/task_manager.py:92-95``) and recursive
directory-tree ingests (``shared_tools/patch_additional_files.py:105-122``,
``init_seed_tasks.py:91-119``). Each becomes a declarative Spark source
with the reference's normalization semantics (missing columns filled,
``''`` treated as the system's null) applied at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Datapoint-table schemas (SURVEY.md §1.3): staging, review, production.
STAGING_COLUMNS: tuple[str, ...] = (
    "task_id", "prompt", "dockerfile", "test_functions", "test_weights",
    "additional_files", "difficulty", "created_at", "updated_at",
)
REVIEW_COLUMNS: tuple[str, ...] = STAGING_COLUMNS + ("reviewed_at",)
PRODUCTION_COLUMNS: tuple[str, ...] = (
    "task_id", "difficulty", "title", "use_case_category", "prompt",
    "dockerfile", "test_functions", "test_weights", "additional_files",
    "category", "tags", "created_at", "updated_at",
)

# Task-store schema (task_manager/README.md; ``task_manager.py:51-62``).
TASK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("parent_id", T.StringType()),
        T.StructField("locked_by", T.StringType()),
        T.StructField("locked_at", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("completed_at", T.StringType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_datapoint_csv(
    spark: SparkSession, path: str, columns: tuple[str, ...] = REVIEW_COLUMNS
) -> DataFrame:
    """S1: read a reference-shaped datapoint CSV.

    ``multiLine`` + symmetric quote/escape handle the embedded newlines and
    ``""``-escaped quotes inside prompt/dockerfile/test cells. The result
    is then normalized to the declared column list the way
    ``normalize_datapoint`` does (``add_dp_to_review.py:71-79``): missing
    columns filled with ``''``, extra drift columns (the shipped staging
    file carries ``tests``/``weights``) preserved only if asked for.
    """
    raw = spark.read.csv(
        path, header=True, multiLine=True, quote='"', escape='"', inferSchema=False
    )
    out = raw
    for c in columns:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(""))
    return out.select(*columns)


def write_datapoint_csv(df: DataFrame, path: str) -> None:
    """S6/S7 CSV sink, reference-compatible quoting: embedded newlines and
    quotes survive a roundtrip through ``read_datapoint_csv`` (symmetric
    quote/escape, quoteAll so JSON cells always arrive quoted). Single
    output file via coalesce(1) — the reference's consumers expect one
    CSV; at scale you keep parquet and export on demand."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("quoteAll", True)
        # The CSV WRITER trims cell whitespace by default — which silently
        # eats trailing newlines in dockerfile/test cells. Keep bytes exact.
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_task_store(spark: SparkSession, path: str) -> DataFrame:
    """S2: the task-queue state as a DataFrame — tasks dict exploded to
    rows. The reference stores ``{workflow_type, metadata, tasks:{id: t}}``
    in one JSON document; we read it whole (it is small by the store's own
    design ceiling) and explode to a queryable table."""
    doc = spark.read.json(path, multiLine=True)
    if "tasks" not in doc.columns:
        return spark.createDataFrame([], TASK_SCHEMA)
    # tasks is a struct keyed by task id → melt via stack of struct fields.
    task_fields = doc.select("tasks.*").columns
    stacked = doc.select(
        F.explode(
            F.array(*[F.col(f"tasks.`{tid}`") for tid in task_fields])
        ).alias("t")
    )
    cols = [
        F.col(f"t.{f.name}").alias(f.name)
        for f in TASK_SCHEMA.fields
        if f.name in stacked.select("t.*").columns
    ]
    return stacked.select(*cols)


def read_file_tree(spark: SparkSession, root: str, strip_prefix: str) -> DataFrame:
    """S4: recursive directory scan → (path, content) rows, the Spark form
    of ``sync_from_workspace`` (``patch_additional_files.py:105-122``).
    Aggregating to a files-map per key is then
    ``map_from_entries(collect_list(struct(path, content)))``."""
    import re as _re

    # recursiveFileLookup, not a glob: `root/**` only reaches depth ≤ 2 and
    # silently drops deeper files (a/b/deep.txt) — the reference's walk is
    # fully recursive (os.walk).
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .text(root, wholetext=True)
        .withColumn("path", F.input_file_name())
    )
    # input_file_name() yields PERCENT-ENCODED URI form (file:///abs/path,
    # spaces as %20): decode before stripping, or any workspace path with
    # an encodable character surfaces encoded keys and misses the prefix
    # match (diverging from the reference's os.walk). url_decode treats
    # '+' as space (form encoding), so protect literal '+' — a valid URI
    # pchar that input_file_name leaves as-is — by re-encoding it first.
    decoded = F.url_decode(F.regexp_replace("path", r"\+", "%2B"))
    rel = F.regexp_replace(
        F.regexp_replace(decoded, r"^[a-z0-9+.-]+://", ""),
        f"^{_re.escape(strip_prefix.rstrip('/'))}/",
        "",
    )
    return raw.select(rel.alias("path"), F.col("value").alias("content"))


def files_map(tree: DataFrame, key: object = None) -> DataFrame:
    """Collapse a (path, content) tree scan into a single-row files-map —
    the ``additional_files`` cell representation (F1/F2 encode it to JSON
    for CSV storage)."""
    return tree.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("path"), F.col("content")))
        ).alias("files")
    )
