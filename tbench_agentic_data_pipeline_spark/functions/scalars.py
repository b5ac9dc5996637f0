"""Scalar function layer (SURVEY.md §2.8, F1-F22).

Every scalar computation the reference performs — JSON map encode/decode,
pipe-splitting, regex extraction, truncation, timestamp math, tolerance
compares, doc rendering — as named column expressions built purely from
``pyspark.sql.functions``. Nothing here leaves the JVM: all of it inlines
into whole-stage codegen, which is the difference between a scalar layer
that survives 100 TB and one that doesn't.

Registered queries are "gauntlets": each exercises a family of functions in
one pass over a fixture table so the oracle hash pins down every function's
semantics at once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Named expressions (the engine's scalar vocabulary)
# ---------------------------------------------------------------------------


def json_map(col: Column | str, value_type: str = "string") -> Column:
    """F1: decode a JSON-object cell into a typed map
    (``validators.py:276``, ``patch_dp.py:80``)."""
    return F.from_json(col, f"map<string,{value_type}>")


def json_is_valid(col: Column | str) -> Column:
    """F3: JSON validity — invalid text decodes to NULL
    (``data_pipeline.py:243-246``)."""
    return F.from_json(col, "map<string,string>").isNotNull()


def pipe_split_tags(col: Column | str) -> Column:
    """F4: pipe-split + trim + drop empties (``categories_tags.py:58``)."""
    return F.filter(
        F.transform(F.split(col, r"\|"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def bounded_size(col: Column, lo: int, hi: int) -> Column:
    """F5: array length bound (1..3 tags, ``categories_tags.py:60-64``)."""
    return F.size(col).between(lo, hi)


def truncate_ellipsis(col: Column | str, n: int) -> Column:
    """F12: truncate with ellipsis (``add_dp_to_review.py:176``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > n, F.concat(F.substring(c, 1, n), F.lit("..."))).otherwise(c)


def strip_all_ws(col: Column | str) -> Column:
    """Python ``str.strip()`` equivalent: remove leading/trailing
    whitespace. ``(?U)`` makes Java's ``\\s`` Unicode-aware (NBSP, etc.) —
    without it, whitespace the reference's ``str.strip()`` removes would
    survive. ``F.trim`` is spaces-only; plain ``\\s`` is ASCII-only."""
    return F.regexp_replace(col, r"(?U)^\s+|\s+$", "")


def collapse_blank_runs(col: Column | str) -> Column:
    """F11: collapse 3+ newlines to 2 and trim (``init_seed_tasks.py:81-88``)."""
    return F.trim(F.regexp_replace(col, r"\n{3,}", "\n\n"))


def drop_matching_lines(col: Column | str, pattern: str) -> Column:
    """F10: remove lines matching a pattern, rejoin
    (``init_seed_tasks.py:40-48`` drops canary lines)."""
    return F.array_join(
        F.filter(F.split(col, "\n"), lambda l: ~l.rlike(pattern)), "\n"
    )


def weight_in_unit_interval(col: Column) -> Column:
    """F20: numeric positivity/range check (``validators.py:304-309``).
    ``try_cast``, not ``cast``: under Spark 4's ANSI mode a malformed
    string cast THROWS — the reference treats it as merely invalid."""
    d = col.try_cast("double")
    return d.isNotNull() & (d > 0) & (d <= 1)


# ---------------------------------------------------------------------------
# Registered gauntlet queries
# ---------------------------------------------------------------------------


@query(
    "f_string_gauntlet",
    survey="F4,F5,F6,F8,F12,F13,F14",
    oracle="""
        SELECT
            doc_id,
            length(text)                                    AS n_chars_computed,
            len(string_split(text, ' '))                    AS n_tokens,
            upper(substr(text, 1, 10))                      AS head_upper,
            contains(text, 'spark')                         AS mentions_spark,
            (text LIKE 'the%')                              AS starts_the,
            CASE WHEN length(text) > 50
                 THEN substr(text, 1, 50) || '...'
                 ELSE text END                              AS preview,
            CASE lang WHEN 'en' THEN 'english'
                      WHEN 'fr' THEN 'french'
                      WHEN 'de' THEN 'german'
                      WHEN 'es' THEN 'spanish'
                      ELSE 'other' END                      AS lang_name,
            position('data' IN text)                        AS data_pos
        FROM documents
    """,
)
def f_string_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family string gauntlet: length (F13), tokenize (F4), case/substr,
    contains (F8), prefix predicate (F6), truncate-with-ellipsis (F12),
    dictionary mapping (F14), substring position (F8/F9) — one codegen'd
    projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    lang_map = F.create_map(
        F.lit("en"), F.lit("english"), F.lit("fr"), F.lit("french"),
        F.lit("de"), F.lit("german"), F.lit("es"), F.lit("spanish"),
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.col("text").contains("spark").alias("mentions_spark"),
        F.col("text").startswith("the").alias("starts_the"),
        truncate_ellipsis("text", 50).alias("preview"),
        F.coalesce(F.element_at(lang_map, F.col("lang")), F.lit("other")).alias(
            "lang_name"
        ),
        F.instr(F.col("text"), "data").cast("bigint").alias("data_pos"),
    )


@query(
    "f_json_gauntlet",
    survey="F1,F2,F3,F19,F20",
    oracle="""
        SELECT
            event_id,
            CAST(json_extract(props, '$.k') AS BIGINT)          AS k_val,
            json_valid(props)                                   AS props_valid,
            (CAST(json_extract(props, '$.k') AS DOUBLE) / 100.0 > 0
             AND CAST(json_extract(props, '$.k') AS DOUBLE) / 100.0 <= 1.0)
                                                                AS k_in_unit,
            (ABS(CAST(json_extract(props, '$.k') AS BIGINT) - 50) <= 10)
                                                                AS near_fifty
        FROM events
    """,
)
def f_json_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3 JSON decode + validity, F20 unit-interval check, F19 tolerance
    band — the weight-validation scalar kernel (``validators.py:274-315``)
    phrased over the events props column."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    k_unit = k.cast("double") / 100.0
    return events.select(
        "event_id",
        k.alias("k_val"),
        json_is_valid("props").alias("props_valid"),
        ((k_unit > 0) & (k_unit <= 1.0)).alias("k_in_unit"),
        (F.abs(k - 50) <= 10).alias("near_fifty"),
    )


@query(
    "f_datetime_gauntlet",
    survey="F16,F17,F18",
    oracle="""
        SELECT
            event_id,
            strftime(ts, '%Y-%m-%dT%H:%M:%S')               AS iso_s,
            strftime(ts, '%Y%m%d_%H%M%S')                   AS backup_name,
            CAST(year(ts) AS BIGINT)                        AS y,
            CAST(month(ts) AS BIGINT)                       AS m,
            CAST(dayofweek(ts) AS BIGINT)                   AS dow,
            strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
            epoch_ms(ts)                                    AS ts_ms
        FROM events
    """,
)
def f_datetime_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16/F17/F18 timestamp kernel: ISO formatting, timestamped backup
    names (``approve_datapoint.py:58-60``), calendar parts, hour bucketing,
    epoch millis. DuckDB ``dayofweek`` is 0=Sunday; Spark ``dayofweek`` is
    1=Sunday — aligned here via ``dayofweek - 1``."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_s"),
        F.date_format("ts", "yyyyMMdd_HHmmss").alias("backup_name"),
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_bucket"
        ),
        F.unix_millis("ts").alias("ts_ms"),
    )


@query(
    "f_substring_extract",
    survey="F8,F9",
    oracle="""
        SELECT doc_id,
               CASE WHEN position('join' IN text) > 0
                    THEN substr(text, position('join' IN text))
                    ELSE '' END                             AS from_join,
               substr(text, 1, CASE WHEN position(' ' IN text) > 0
                                    THEN position(' ' IN text) - 1
                                    ELSE length(text) END)  AS first_word
        FROM documents WHERE doc_id < 150
    """,
)
def f_substring_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: substring-from-located-index — cut the payload at a marker the
    way the reference cuts Dockerfiles at 'FROM' and task YAML at
    'instruction:' (``init_seed_tasks.py:34-38``, ``:51-54``)."""
    docs = load_table(spark, sf_dir, "documents")
    pos = F.instr(F.col("text"), "join")
    sp = F.instr(F.col("text"), " ")
    return docs.where(F.col("doc_id") < 150).select(
        "doc_id",
        F.when(pos > 0, F.expr("substr(text, instr(text, 'join'))"))
        .otherwise("")
        .alias("from_join"),
        F.substring(
            F.col("text"), 1, F.when(sp > 0, sp - 1).otherwise(F.length("text"))
        ).alias("first_word"),
    )


@query(
    "f_markdown_render",
    survey="F22,S9,F12",
    oracle="""
        SELECT doc_id,
               '# Document ' || CAST(doc_id AS VARCHAR) || chr(10) ||
               '**Language:** ' || lang || chr(10) ||
               '**Source:** ' || source || chr(10) ||
               '## Preview' || chr(10) ||
               CASE WHEN length(text) > 80
                    THEN substr(text, 1, 80) || '...'
                    ELSE text END
                   AS markdown
        FROM documents WHERE doc_id < 50
    """,
)
def f_markdown_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F22/S9: row → human-readable markdown artifact
    (``add_dp_to_review.py:154-211``, ``read_datapoint.py:27-127``) as a
    pure concat projection; the single-file artifact write is a driver-side
    sink concern, not a query concern."""
    docs = load_table(spark, sf_dir, "documents")
    md = F.concat(
        F.lit("# Document "), F.col("doc_id").cast("string"), F.lit("\n"),
        F.lit("**Language:** "), F.col("lang"), F.lit("\n"),
        F.lit("**Source:** "), F.col("source"), F.lit("\n"),
        F.lit("## Preview\n"),
        truncate_ellipsis("text", 80),
    )
    return docs.where(F.col("doc_id") < 50).select("doc_id", md.alias("markdown"))


@query(
    "f_line_cleanup",
    survey="F10,F11,F4",
    oracle="""
        SELECT
            doc_id,
            array_to_string(
                list_filter(string_split(text, ' '), w -> w <> 'the'), ' '
            )                                               AS cleaned,
            len(list_filter(string_split(text, ' '), w -> w = 'the'))
                                                            AS n_dropped
        FROM documents
        WHERE doc_id < 200
    """,
)
def f_line_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: filter-and-rejoin cleanup (canary-line removal,
    ``init_seed_tasks.py:40-48``) — higher-order filter over the token
    array, no UDF, fully codegen'd."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.where(F.col("doc_id") < 200).select(
        "doc_id",
        F.array_join(F.filter(toks, lambda w: w != "the"), " ").alias("cleaned"),
        F.size(F.filter(toks, lambda w: w == "the")).cast("bigint").alias("n_dropped"),
    )


@query(
    "f_array_gauntlet",
    survey="F4,F13,SO4",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '), w -> len(w))
                       AS lens
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id,
               CAST(len(lens) AS BIGINT)                       AS n,
               array_to_string(list_sort(lens), ',')           AS sorted_lens,
               array_to_string(list_reverse_sort(lens)[1:3], ',')
                                                               AS top3_lens,
               CAST(COALESCE(list_sum(list_filter(lens, x -> x >= 5)), 0)
                    AS BIGINT)                                 AS long_chars,
               CAST(list_max(lens) - list_min(lens) AS BIGINT) AS span
        FROM t
    """,
)
def f_array_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function parity in one pass: transform, sort (both
    directions), slice, filter + aggregate fold, min/max — the
    higher-order-function surface the corpus operators build on, pinned
    against DuckDB's list functions on integer values (length arrays —
    engine-exact, no float folds). All per-row projections: zero
    shuffles, one scan."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    lens = F.transform(F.split("text", " "), lambda w: F.length(w))
    t = docs.select("doc_id", lens.alias("lens"))
    return t.select(
        "doc_id",
        F.size("lens").cast("bigint").alias("n"),
        F.array_join(F.array_sort("lens"), ",").alias("sorted_lens"),
        F.array_join(
            F.slice(F.sort_array(F.col("lens"), asc=False), 1, 3), ","
        ).alias("top3_lens"),
        F.aggregate(
            F.filter("lens", lambda x: x >= 5),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("bigint").alias("long_chars"),
        (F.array_max("lens") - F.array_min("lens")).cast("bigint").alias("span"),
    )


@query(
    "f_map_gauntlet",
    survey="U2,U7,F1",
    oracle="""
        WITH g AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               COALESCE(array_to_string(
                   list_sort(list(event_type || '=' || CAST(n * 2 AS VARCHAR))
                             FILTER (n * 2 >= 4)),
                   ','
               ), '') AS doubled_hot
        FROM g
        GROUP BY user_id
    """,
)
def f_map_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions in one pass — the building blocks the
    U-family mutations (``map_put``, metadata merge) compose, pinned
    directly: build a per-user map with ``map_from_entries``, mutate
    every value with ``transform_values``, prune with ``map_filter``,
    then serialize deterministically (entries → sort by key → k=v join).
    The oracle mirrors the semantics on sorted lists — DuckDB needs no
    MAP type for the contract to be exact, because the serialization IS
    the contract (maps have no cross-engine order)."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("event_type"), F.col("n")))
    )
    agg = per_type.groupBy("user_id").agg(m.alias("type_counts"))
    doubled = F.transform_values(
        F.col("type_counts"), lambda k, v: v * 2
    )
    hot = F.map_filter(doubled, lambda k, v: v >= 4)
    serialized = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(hot),
                lambda e: F.concat_ws("=", e["key"], e["value"].cast("string")),
            )
        ),
        ",",
    )
    return agg.select(
        "user_id",
        F.size("type_counts").cast("bigint").alias("n_types"),
        serialized.alias("doubled_hot"),
    )
