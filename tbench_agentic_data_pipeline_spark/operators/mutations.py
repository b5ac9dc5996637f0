"""Per-row transform operators: updates, merges, derivations
(SURVEY.md §2.7, U1-U11).

The reference mutates rows in place: read whole CSV → patch dict → rewrite
file (keyed patch ``shared_tools/patch_dp.py:110-177``; map-column
mutations ``shared_tools/patch_additional_files.py:192-330``; status
transitions ``task_manager/task_manager.py:204-303``; timeout release
``:109-138``; production derivation ``approve_datapoint.py:117-131``;
deterministic ids ``task_manager.py:158``). Spark-first, a mutation is a
pure transform producing the next table version: conditional
``withColumn``s guarded by the key/ownership predicate, committed as a
snapshot by the sources layer. No read-modify-write cycle exists anywhere —
which is exactly why the same code runs at 100 TB: a "patch" is a map-side
projection over the scan, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Reusable operator API
# ---------------------------------------------------------------------------


def keyed_patch(
    df: DataFrame, key_col: str, key: object, patches: dict[str, Column]
) -> DataFrame:
    """U1: update N columns of the row(s) matching ``key``; all other rows
    pass through unchanged (``patch_dp.py:110-177``). Map-side only."""
    cond = F.col(key_col) == F.lit(key)
    # One withColumns call: every patch expression evaluates against the
    # ORIGINAL row (chained withColumn would let an earlier patch feed a
    # later patch's inputs — not the reference's dict-update semantics).
    return df.withColumns(
        {
            col_name: F.when(cond, new_val).otherwise(F.col(col_name))
            for col_name, new_val in patches.items()
        }
    )


def map_put(df: DataFrame, map_col: str, key: Column, value: Column) -> DataFrame:
    """U2 (update/append): upsert one entry into a map column
    (``patch_additional_files.py:226-247``). ``map_concat`` with the new
    entry last would duplicate keys — filter the old key out first."""
    cleaned = F.map_filter(F.col(map_col), lambda k, _: k != key)
    return df.withColumn(
        map_col, F.map_concat(cleaned, F.map_from_entries(F.array(F.struct(key, value))))
    )


def map_remove(df: DataFrame, map_col: str, key: Column) -> DataFrame:
    """U2 (remove): drop one entry (``patch_additional_files.py:249-265``)."""
    return df.withColumn(
        map_col, F.map_filter(F.col(map_col), lambda k, _: k != key)
    )


def transition(
    df: DataFrame,
    predicate: Column,
    updates: dict[str, Column],
) -> DataFrame:
    """U3/U4/U5: guarded status transition — apply ``updates`` to rows
    satisfying ``predicate`` (claim/complete/release,
    ``task_manager.py:204-303``). All updates and the predicate evaluate
    against the ORIGINAL row (single withColumns), so a transition whose
    predicate tests a column it also updates behaves atomically."""
    return df.withColumns(
        {
            col_name: F.when(
                predicate, new_val
            ).otherwise(F.col(col_name) if col_name in df.columns else F.lit(None))
            for col_name, new_val in updates.items()
        }
    )


def deterministic_id(prefix: Column | str, *content: Column) -> Column:
    """U11: content-hash id — ``{type}_{8 hex}`` like ``task_manager.py:158``
    but reproducible (uuid4 would break oracle checks and retry idempotency
    at scale)."""
    p = F.lit(prefix) if isinstance(prefix, str) else prefix
    return F.concat(p, F.lit("_"), F.substring(F.md5(F.concat_ws("\x1f", *content)), 1, 8))


# ---------------------------------------------------------------------------
# Registered oracle-checkable queries
# ---------------------------------------------------------------------------


@query(
    "u1_keyed_patch",
    survey="U1,U9,S7",
    oracle="""
        SELECT
            o_orderkey,
            CASE WHEN o_orderkey = 42 THEN 'PATCHED'
                 ELSE o_orderpriority END                   AS o_orderpriority,
            CASE WHEN o_orderkey = 42 THEN 'X'
                 ELSE o_orderstatus END                     AS o_orderstatus,
            (o_orderkey = 42)                               AS was_patched
        FROM orders
    """,
)
def u1_keyed_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: keyed multi-column patch (``patch_dp.py:110-177``) — the whole
    next-version table, two columns rewritten for one key. The plan is a
    single projection over the scan: patching 1 row of 10^12 costs one
    pass, no shuffle, and the sink commits it as a new snapshot."""
    orders = load_table(spark, sf_dir, "orders")
    patched = keyed_patch(
        orders, "o_orderkey", 42,
        {"o_orderpriority": F.lit("PATCHED"), "o_orderstatus": F.lit("X")},
    )
    return patched.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        (F.col("o_orderkey") == 42).alias("was_patched"),
    )


@query(
    "u2_map_mutation",
    survey="U2,F1,F2",
    oracle="""
        SELECT event_id, 'k' AS key, CAST(json_extract(props, '$.k') AS BIGINT) AS val
        FROM events WHERE event_id < 300
        UNION ALL
        SELECT event_id, 'k_squared' AS key,
               CAST(json_extract(props, '$.k') AS BIGINT)
               * CAST(json_extract(props, '$.k') AS BIGINT) AS val
        FROM events WHERE event_id < 300
    """,
)
def u2_map_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: map-column mutation (``patch_additional_files.py:192-330``) —
    decode the JSON map, upsert a derived entry, explode to entries.
    Exploded output keeps the oracle hash independent of map iteration
    order (JSON text comparison would not be engine-stable)."""
    events = load_table(spark, sf_dir, "events")
    base = events.where(F.col("event_id") < 300).select(
        "event_id", F.from_json("props", "map<string,bigint>").alias("m")
    )
    mutated = map_put(
        base, "m", F.lit("k_squared"),
        F.element_at(F.col("m"), "k") * F.element_at(F.col("m"), "k"),
    )
    return mutated.select(
        "event_id", F.explode("m").alias("key", "val")
    )


@query(
    "u3_claim_transition",
    survey="U3,ST1,P3",
    oracle="""
        SELECT
            event_id,
            user_id,
            CASE WHEN rn = 1 THEN 'in_progress' ELSE 'pending' END AS status,
            CASE WHEN rn = 1 THEN 'agent_' || CAST(user_id AS VARCHAR)
                 ELSE NULL END                                     AS locked_by
        FROM (
            SELECT event_id, user_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events WHERE event_type = 'click'
        )
    """,
)
def u3_claim_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3/ST1: claim transition — each worker's first pending task flips
    pending→in_progress with locked_by stamped (``task_manager.py:204-218``).
    Deterministic batch claim (SURVEY.md §4.4): identical outcome to N
    serialized get_next_task calls, no lock."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    pending = events.where(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = pending.withColumn("rn", F.row_number().over(w))
    # transition() leaves newly-added columns NULL on non-matching rows;
    # coalesce restores the pending default for unclaimed tasks.
    claimed = transition(
        ranked,
        F.col("rn") == 1,
        {
            "status": F.lit("in_progress"),
            "locked_by": F.concat(F.lit("agent_"), F.col("user_id").cast("string")),
        },
    )
    return claimed.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("status"), F.lit("pending")).alias("status"),
        "locked_by",
    )


@query(
    "u6_timeout_release",
    survey="U6,P6,ST2",
    oracle="""
        SELECT
            CASE
                WHEN event_type = 'view'
                     AND ts < TIMESTAMP '2024-01-08 00:00:00' - INTERVAL 24 HOUR
                THEN 'released'
                WHEN event_type = 'view' THEN 'in_progress'
                ELSE 'other'
            END      AS status,
            COUNT(*) AS n
        FROM events
        GROUP BY status
    """,
)
def u6_timeout_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6/ST2: timeout auto-release sweep (``task_manager.py:109-138``) —
    stale in-progress work returns to the pool in one batch pass; the
    streaming twin is a state timeout (streaming/stateful.py)."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-08 00:00:00").cast("timestamp") - F.expr("INTERVAL 24 HOURS")
    status = (
        F.when(
            (F.col("event_type") == "view") & (F.col("ts") < cutoff), "released"
        )
        .when(F.col("event_type") == "view", "in_progress")
        .otherwise("other")
    )
    return events.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "u4_complete_transition",
    survey="U4,U5,U7,F16",
    oracle="""
        SELECT event_id,
               CASE WHEN event_type = 'view' THEN 'completed'
                    WHEN event_type = 'error' THEN 'failed'
                    ELSE 'pending' END                           AS status,
               CASE WHEN event_type IN ('view', 'error')
                    THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
                    ELSE NULL END                                AS completed_at,
               CASE WHEN event_type IN ('view', 'error')
                    THEN NULL ELSE 'agent_' || CAST(user_id AS VARCHAR) END
                                                                 AS locked_by
        FROM events
    """,
)
def u4_complete_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4/U5: complete/fail transitions — terminal states stamp
    completed_at and clear locks; everything else keeps its claim
    (``task_manager.py:225-303``). One atomic withColumns pass."""
    events = load_table(spark, sf_dir, "events")
    terminal = F.col("event_type").isin("view", "error")
    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.concat(F.lit("agent_"), F.col("user_id").cast("string")).alias("locked_by"),
    )
    done = transition(
        base,
        terminal,
        {
            "status": F.when(F.col("event_type") == "view", "completed").otherwise(
                "failed"
            ),
            "completed_at": F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
            "locked_by": F.lit(None).cast("string"),
        },
    )
    return done.select(
        "event_id",
        F.coalesce(F.col("status"), F.lit("pending")).alias("status"),
        "completed_at",
        "locked_by",
    )


@query(
    "u8_production_derivation",
    survey="U8,U10,U11",
    oracle="""
        SELECT
            'doc_' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS derived_id,
            CAST(doc_id AS VARCHAR)                              AS title,
            lang                                                 AS category,
            COALESCE(NULLIF(source, ''), 'unknown')              AS use_case_category,
            CASE WHEN n_chars >= 400 THEN 'hard'
                 WHEN n_chars >= 200 THEN 'medium'
                 ELSE 'easy' END                                 AS difficulty
        FROM documents
    """,
)
def u8_production_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U8/U10/U11: review-row → production-row derivation
    (``approve_datapoint.py:117-131``: title=task_id, category copied,
    difficulty defaulted) with the content-hash id of U11
    (``task_manager.py:158``, determinized)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        deterministic_id("doc", F.col("doc_id").cast("string")).alias("derived_id"),
        F.col("doc_id").cast("string").alias("title"),
        F.col("lang").alias("category"),
        F.coalesce(
            F.nullif(F.col("source"), F.lit("")), F.lit("unknown")
        ).alias("use_case_category"),
        F.when(F.col("n_chars") >= 400, "hard")
        .when(F.col("n_chars") >= 200, "medium")
        .otherwise("easy")
        .alias("difficulty"),
    )
