"""Event-time windowing: tumbling, sliding, session (SURVEY.md §2.10).

Each window kind is implemented ONCE as a DataFrame transform that works
in both batch and streaming mode (Spark's unified API), plus a registered
batch-mode query whose DuckDB oracle pins the semantics. Streaming mode
adds a watermark for state eviction / late-data drop; tests drive the
streaming path with an in-memory source.

Scale notes: windowed aggregation shuffles on (window, keys) — group
cardinality, not input size. Session windows shuffle on the session key;
skewed users are the hazard and AQE skew-join handling plus the watermark
bound state growth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Unified batch/streaming window transforms
# ---------------------------------------------------------------------------


def tumbling_counts(
    df: DataFrame, ts_col: str, duration: str, *keys: str,
    watermark: str | None = None,
) -> DataFrame:
    """ST-window: tumbling event-time aggregation. With ``watermark`` set
    and a streaming ``df``, late rows beyond the delay are dropped and
    window state is evicted — the 100 TB/day property."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration).alias("w"), *keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("value_sum"),
    )


def sliding_counts(
    df: DataFrame, ts_col: str, duration: str, slide: str, *keys: str,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows: each row contributes to duration/slide windows."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys).agg(
        F.count(F.lit(1)).alias("n")
    )


def session_aggregate(
    df: DataFrame, ts_col: str, gap: str, key: str,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows with inactivity ``gap`` (``session_window`` —
    dynamic, merging; the streaming form keeps per-key session state and
    closes sessions at the watermark)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), F.col(key)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# Registered batch-mirror queries (oracle-checkable)
# ---------------------------------------------------------------------------


def _fmt(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


@query(
    "st_tumbling_window",
    survey="ST2,ST3,F16",
    oracle="""
        SELECT
            strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
            event_type,
            COUNT(*)                 AS n,
            ROUND(SUM(value), 2)     AS value_sum
        FROM events
        GROUP BY window_start, event_type
    """,
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h × event_type counts/sums — batch mirror of the
    streaming aggregation (aligned tumbling window ≡ date_trunc)."""
    events = load_table(spark, sf_dir, "events")
    out = tumbling_counts(events, "ts", "1 hour", "event_type")
    return out.select(
        _fmt(F.col("w.start")).alias("window_start"),
        "event_type",
        "n",
        F.round("value_sum", 2).alias("value_sum"),
    )


@query(
    "st_sliding_window",
    survey="ST2,ST3",
    oracle="""
        WITH assigned AS (
            SELECT e.event_id, ws.window_start
            FROM events e,
                 UNNEST([
                     time_bucket(INTERVAL '30 minutes', e.ts) - INTERVAL '30 minutes',
                     time_bucket(INTERVAL '30 minutes', e.ts)
                 ]) AS ws(window_start)
        )
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n
        FROM assigned
        GROUP BY window_start
    """,
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h window, 30min slide: every event lands in exactly two
    windows; the oracle materializes both assignments with UNNEST."""
    events = load_table(spark, sf_dir, "events")
    out = sliding_counts(events, "ts", "1 hour", "30 minutes")
    return out.select(_fmt(F.col("w.start")).alias("window_start"), "n")


@query(
    "st_session_windows",
    survey="ST2,W4",
    oracle="""
        WITH gapped AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER w >= INTERVAL '10 minutes'
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM gapped
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S')  AS session_start,
               strftime(MAX(ts) + INTERVAL '10 minutes',
                        '%Y-%m-%d %H:%M:%S')           AS session_end,
               COUNT(*)                                AS n_events,
               ROUND(SUM(value), 2)                    AS value_sum
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 10-minute inactivity gap, per user — Spark's
    merging ``session_window`` vs the oracle's lag+cumsum sessionization.
    Spark merges only while next_ts < prev_ts + gap (an event exactly
    ``gap`` later STARTS a new session), so the oracle's new-session rule
    is ``gap >= 10min``; session_end = last + gap."""
    events = load_table(spark, sf_dir, "events")
    out = session_aggregate(events, "ts", "10 minutes", "user_id")
    return out.select(
        "user_id",
        _fmt(F.col("w.start")).alias("session_start"),
        _fmt(F.col("w.end")).alias("session_end"),
        "n_events",
        F.round("value_sum", 2).alias("value_sum"),
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Streaming deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key among events
    whose timestamps fall within the watermark delay of each other, and
    EVICTS key state once the watermark passes — the property that lets a
    forever-running dedup hold state proportional to the delay window, not
    the stream's lifetime. Works on both streaming and batch frames (on
    batch it degrades to plain dropDuplicates semantics)."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


@query(
    "st_dedup_watermark",
    survey="ST2,SO2",
    oracle="""
        SELECT user_id, event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS bucket_start,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
               CAST(COUNT(*) AS BIGINT) AS n_dups
        FROM events
        GROUP BY user_id, event_type, date_trunc('hour', ts)
    """,
)
def st_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of streaming dedup: first event + duplicate count per
    (user_id, event_type) within each hour bucket — the deterministic twin
    of ``dropDuplicatesWithinWatermark`` over an hourly-bounded stream
    (dedup state scoped to a time bucket ≡ watermark-bounded key state).
    The true streaming path — watermark advance, state eviction,
    batch-equivalence on in-order input — is pinned in
    ``tests/test_streaming.py::test_dedup_within_watermark_streaming``."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    return (
        events.groupBy("user_id", "event_type", bucket.alias("__b"))
        .agg(
            F.min("ts").alias("__first"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        )
        .select(
            "user_id",
            "event_type",
            _fmt(F.col("__b")).alias("bucket_start"),
            _fmt(F.col("__first")).alias("first_ts"),
            "n_dups",
        )
    )
