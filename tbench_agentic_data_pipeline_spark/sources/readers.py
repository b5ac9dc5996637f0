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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tbench_agentic_data_pipeline_spark.functions.scalars import strip_all_ws

# Datapoint-table schemas (SURVEY.md §1.3): staging, review, production.
STAGING_COLUMNS: tuple[str, ...] = (
    "task_id", "prompt", "dockerfile", "test_functions", "test_weights",
    "additional_files", "difficulty", "created_at", "updated_at",
)
REVIEW_COLUMNS: tuple[str, ...] = STAGING_COLUMNS + ("reviewed_at",)
PRODUCTION_COLUMNS: tuple[str, ...] = (
    # Field order matches the reference's production CSV header
    # (``approve_datapoint.py:108-113``).
    "task_id", "difficulty", "title", "use_case_category", "prompt",
    "category", "tags", "dockerfile", "test_functions", "test_weights",
    "additional_files", "created_at", "updated_at",
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


# ---------------------------------------------------------------------------
# S5: multi-file task ingest (``init_seed_tasks.py:28-119``) — per-task-dir
# task.yaml / Dockerfile / tests/*.py cleaned and pivoted into one record.
# ---------------------------------------------------------------------------

_CANARY_MARKS = ("BENCHMARK DATA SHOULD NEVER APPEAR", "terminal-bench-canary")
_TEMPLATE_MARK = "This is a template test file"
_HARNESS_MARK = "by the test harness"


def _strip_all_ws(c: Column) -> Column:
    """Python ``str.strip()`` (ALL whitespace, Unicode-aware) — shared
    implementation in ``functions.scalars.strip_all_ws``."""
    return strip_all_ws(c)


def _finalize_content(c: Column) -> Column:
    """Common tail of ``clean_content`` (``init_seed_tasks.py:80-87``):
    collapse 3+ newline runs to exactly two, then strip."""
    return _strip_all_ws(F.regexp_replace(c, r"\n{3,}", "\n\n"))


def _is_canary(line: Column) -> Column:
    out = F.lit(False)
    for mark in _CANARY_MARKS:
        out = out | line.contains(mark)
    return out


def clean_dockerfile(c: Column) -> Column:
    """Dockerfile cleanup (``init_seed_tasks.py:33-48``): cut everything
    before the first ``FROM``; if there is no FROM, fall back to dropping
    canary lines."""
    idx = F.locate("FROM", c)
    no_canary = F.array_join(
        F.filter(F.split(c, "\n"), lambda l: ~_is_canary(l)), "\n"
    )
    return _finalize_content(
        F.when(idx > 0, c.substr(idx, F.length(c))).otherwise(no_canary)
    )


def clean_task_yaml(c: Column) -> Column:
    """task.yaml cleanup (``init_seed_tasks.py:50-54``): cut everything
    before ``instruction:`` when present."""
    idx = F.locate("instruction:", c)
    return _finalize_content(
        F.when(idx > 0, c.substr(idx, F.length(c))).otherwise(c)
    )


def clean_test_file(c: Column) -> Column:
    """Test-file cleanup (``init_seed_tasks.py:56-79``): drop canary lines
    always; after a template-marker line, also drop ``by the test
    harness`` lines and the FIRST blank line (which ends the template
    block).

    The reference is a sequential skip_template state machine; the
    columnar form computes, per line i, the last template-marker index
    j < i and whether any blank line lies strictly between — the machine
    is in skip state at i iff j exists with no intervening blank. All
    per-file array work (no shuffle, no UDF); line counts are task-file
    sized, so the O(lines × markers) inner scans are trivial."""
    lines = F.split(c, "\n")
    blank = lambda l: l.rlike(r"(?U)^\s*$")
    tmpl_idx = F.filter(
        F.transform(
            lines,
            lambda l, i: F.when(l.contains(_TEMPLATE_MARK), i).otherwise(-1),
        ),
        lambda x: x >= 0,
    )
    blank_idx = F.filter(
        F.transform(
            lines, lambda l, i: F.when(blank(l), i).otherwise(F.lit(-1))
        ),
        lambda x: x >= 0,
    )

    def keep(l: Column, i: Column) -> Column:
        last_tmpl = F.aggregate(
            tmpl_idx,
            F.lit(-1),
            lambda acc, x: F.when(x < i, F.greatest(acc, x)).otherwise(acc),
        )
        in_skip = (last_tmpl >= 0) & ~F.exists(
            blank_idx, lambda b: (b > last_tmpl) & (b < i)
        )
        return ~(
            _is_canary(l)
            | l.contains(_TEMPLATE_MARK)
            | (in_skip & l.contains(_HARNESS_MARK))
            | (in_skip & blank(l))
        )

    return _finalize_content(F.array_join(F.filter(lines, keep), "\n"))


def ingest_task_dirs(spark: SparkSession, root: str) -> DataFrame:
    """S5: recursive scan of an eval-tasks directory → one record per task
    dir, the ``extract_task_data`` pivot (``init_seed_tasks.py:91-119``).

    Composition: S4 tree scan → path split → per-kind cleanup → groupBy
    task dir with conditional-first pivots and a sorted files-map for
    tests/*.py. One shuffle on task_name — the natural partitioning for
    every downstream per-task stage. Output: (task_name, task_yaml,
    dockerfile, test_files map<string,string>); missing files surface as
    NULL (reference: ``None``) and an empty map. A task dir containing
    only unrecognized files (solution.sh, notes.txt) still yields its
    all-NULL record — the reference emits one record per DIRECTORY, not
    per recognized file. (A fully EMPTY directory is invisible to a file
    scan — the one divergence from ``iterdir``; files directly under the
    root are ignored, as the reference only walks subdirectories.)"""
    tree = read_file_tree(spark, root, root)
    parts = F.split("path", "/")
    depth = F.size(parts)
    fname = F.element_at(parts, -1)
    kind = (
        F.when((depth == 2) & (fname == "task.yaml"), "task_yaml")
        .when((depth == 2) & (fname == "Dockerfile"), "dockerfile")
        .when(
            (depth == 3)
            & (F.element_at(parts, 2) == "tests")
            & fname.endswith(".py"),
            "test",
        )
    )
    content = F.col("content")
    # No `otherwise`: unknown kinds keep NULL content (never cleaned) but
    # their rows SURVIVE to the groupBy so the task dir still gets a record.
    cleaned = (
        F.when(F.col("kind") == "task_yaml", clean_task_yaml(content))
        .when(F.col("kind") == "dockerfile", clean_dockerfile(content))
        .when(F.col("kind") == "test", clean_test_file(content))
    )
    typed = (
        tree.where(depth >= 2)
        .select(
            F.element_at(parts, 1).alias("task_name"),
            fname.alias("file_name"),
            kind.alias("kind"),
            "content",
        )
        .select("task_name", "file_name", "kind", cleaned.alias("content"))
    )
    return typed.groupBy("task_name").agg(
        F.max(
            F.when(F.col("kind") == "task_yaml", F.col("content"))
        ).alias("task_yaml"),
        F.max(
            F.when(F.col("kind") == "dockerfile", F.col("content"))
        ).alias("dockerfile"),
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("kind") == "test",
                        F.struct("file_name", "content"),
                    )
                )
            )
        ).alias("test_files"),
    )
