"""Projection / filter / predicate operators (SURVEY.md §2.2, P1-P8).

The reference implements every lookup as a full-CSV Python scan
(point lookup ``shared_tools/patch_dp.py:50-55``; conjunctive filter+project
``data_pipeline.py:175-200``; first-match claim ``task_manager.py:199-218``;
existence guard ``create_dp.py:42-49``; stage predicate
``cancel_datapoint.py:108-109``; timeout predicate ``task_manager.py:122-128``;
ownership gate ``task_manager.py:250-251``; prefix projection
``scripts/create_verified_csv.py:37-40``). Spark-first, each is a declarative
filter that Catalyst pushes into the parquet scan: `.explain` shows
``PushedFilters`` on the key predicate and a pruned ``ReadSchema`` — a point
lookup at 100 TB touches only row groups whose min/max straddle the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Reusable operator API
# ---------------------------------------------------------------------------


def point_lookup(df: DataFrame, key_col: str, key: object) -> DataFrame:
    """P1: single-row lookup by key. Predicate pushes to the scan; the
    caller checks emptiness (reference errors on absent key)."""
    return df.where(F.col(key_col) == F.lit(key))


def first_match(df: DataFrame, predicate: Column, order_cols: list[str]) -> DataFrame:
    """P3: first row matching ``predicate`` under a deterministic total
    order (reference: dict-insertion order ≈ created_at). LIMIT 1 plans a
    ``CollectLimit`` — the scan stops early per partition."""
    return df.where(predicate).orderBy(*order_cols).limit(1)


def exists_key(df: DataFrame, key_col: str, key: object) -> DataFrame:
    """P4: duplicate-guard existence predicate as a 1-row DataFrame."""
    return (
        df.where(F.col(key_col) == F.lit(key))
        .select(F.lit(1).alias("one"))
        .limit(1)
        .agg(F.count(F.lit(1)).alias("hits"))
        .select((F.col("hits") > 0).alias("exists_flag"))
    )


def stale_filter(df: DataFrame, ts_col: str, now_expr: Column, hours: float) -> DataFrame:
    """P6: timeout predicate — rows whose ``ts_col`` is strictly older than
    ``hours`` before ``now_expr`` (reference: strictly > 24h,
    ``task_manager.py:128``)."""
    age_hours = (F.unix_millis(now_expr) - F.unix_millis(F.col(ts_col))) / 3_600_000.0
    return df.where(age_hours > F.lit(hours))


# ---------------------------------------------------------------------------
# Registered oracle-checkable queries
# ---------------------------------------------------------------------------

# Fixed "now" for deterministic timeout predicates (fixture data is 2024).
_NOW = "2024-01-08 00:00:00"


@query(
    "p1_point_lookup",
    survey="P1,S3",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
               o_orderpriority
        FROM orders WHERE o_orderkey = 42
    """,
)
def p1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/S3: keyed single-row lookup (``patch_dp.py:50-55``). The early-exit
    CSV scan of the reference becomes parquet row-group skipping on the
    pushed ``o_orderkey = 42`` predicate."""
    orders = load_table(spark, sf_dir, "orders")
    return point_lookup(orders, "o_orderkey", 42).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate_s"),
        "o_orderpriority",
    )


@query(
    "p2_filter_project",
    survey="P2",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
    """,
)
def p2_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: conjunctive filter + narrow projection (``data_pipeline.py:175-200``).
    Both predicate and 4-column projection reach the scan (pruned ReadSchema)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@query(
    "p3_first_match_claim",
    survey="P3,W4",
    oracle="""
        SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s
        FROM orders
        WHERE o_orderstatus = 'O'
        ORDER BY o_orderdate, o_orderkey
        LIMIT 1
    """,
)
def p3_first_match_claim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: claim-next-pending — first 'open' order in (time, key) order
    (``task_manager.py:199-218``). Deterministic: the order ends in the
    unique key, so LIMIT 1 is stable across engines."""
    orders = load_table(spark, sf_dir, "orders")
    return first_match(
        orders, F.col("o_orderstatus") == "O", ["o_orderdate", "o_orderkey"]
    ).select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate_s"),
    )


@query(
    "p4_existence_guard",
    survey="P4",
    oracle="SELECT (COUNT(*) > 0) AS exists_flag FROM orders WHERE o_orderkey = 42",
)
def p4_existence_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: duplicate guard (``create_dp.py:42-49``) — does the key already
    exist? LIMIT-1-then-count stops the scan at the first hit."""
    return exists_key(load_table(spark, sf_dir, "orders"), "o_orderkey", 42)


@query(
    "p5_stage_predicate",
    survey="P5",
    oracle="""
        SELECT event_id, user_id, ROUND(value, 2) AS value
        FROM events
        WHERE event_type = 'purchase' AND value > 100.0
    """,
)
def p5_stage_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: stage-gate predicate ('already reviewed' guard,
    ``cancel_datapoint.py:108-109``) — typed rows past a threshold."""
    events = load_table(spark, sf_dir, "events")
    return events.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 100.0)
    ).select("event_id", "user_id", F.round("value", 2).alias("value"))


@query(
    "p6_timeout_predicate",
    survey="P6,F17",
    oracle=f"""
        SELECT event_id, user_id,
               (epoch_ms(TIMESTAMP '{_NOW}') - epoch_ms(ts)) AS age_ms
        FROM events
        WHERE epoch_ms(TIMESTAMP '{_NOW}') - epoch_ms(ts) > 24 * 3600000
    """,
)
def p6_timeout_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/F17: stale-work sweep — strictly older than 24h against a fixed
    'now' (``task_manager.py:122-128``; strict > per ``:128``).

    Age is kept in integer milliseconds end-to-end: ROUND on a float hours
    value is NOT engine-stable (Spark rounds the shortest-decimal repr
    HALF_UP, DuckDB rounds the binary value — they disagree on exact
    half-boundaries like .23995)."""
    events = load_table(spark, sf_dir, "events")
    now = F.lit(_NOW).cast("timestamp")
    age_ms = F.unix_millis(now) - F.unix_millis(F.col("ts"))
    return (
        events.withColumn("age_ms", age_ms)
        .where(F.col("age_ms") > 24 * 3_600_000)
        .select("event_id", "user_id", "age_ms")
    )


@query(
    "p7_ownership_predicate",
    survey="P7",
    oracle="""
        SELECT event_id, event_type, ROUND(value, 2) AS value
        FROM events WHERE user_id = 7
    """,
)
def p7_ownership_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: ownership gate — only the locking agent may mutate
    (``task_manager.py:250-251``); phrased as an owner-keyed slice."""
    events = load_table(spark, sf_dir, "events")
    return events.where(F.col("user_id") == 7).select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    )


@query(
    "p8_prefix_projection",
    survey="P8,F15",
    oracle="""
        SELECT CAST(regexp_extract(source, 'src([0-9]+)', 1) AS BIGINT) AS src_num,
               COUNT(*) AS n
        FROM documents
        GROUP BY src_num
    """,
)
def p8_prefix_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/F15: derive the original id by stripping a prefix
    (``create_verified_csv.py:37-40`` strips ``validate_``); here
    ``src<N>`` → N, then a histogram over the derived key."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.regexp_extract("source", r"src([0-9]+)", 1).cast("bigint").alias("src_num")
        )
        .groupBy("src_num")
        .agg(F.count(F.lit(1)).alias("n"))
    )
