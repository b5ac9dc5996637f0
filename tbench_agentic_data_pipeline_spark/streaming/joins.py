"""Streaming join builders: stream-static enrichment and watermarked
stream-stream joins.

Reference parity: the reference enriches its task stream against static
config/owner tables row-by-row at claim time (`shared_tools/store.py`
read-modify-write loops); Structured Streaming expresses both patterns
declaratively and they scale to unbounded input:

- **stream-static**: the static side is re-planned each micro-batch (so
  dimension updates are picked up) and broadcast when small — the stream
  side never shuffles for the join.
- **stream-stream**: both sides buffered in state, bounded by watermarks
  plus an event-time range predicate; without BOTH bounds state grows
  without limit — the range condition is what lets Spark evict rows, so
  this module refuses to build an unbounded join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, key: str, broadcast: bool = True
) -> DataFrame:
    """Stream-static left join: attach dimension attributes to each
    streaming row. The static side is resolved fresh every micro-batch;
    ``broadcast=True`` (the default — dims that fit on executors) keeps
    the streaming side shuffle-free, which is the only shape that holds
    up when the stream is the 100 TB side."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, key, "left")


def join_within_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair left/right rows with the
    same ``key`` where ``right_ts`` falls in ``[left_ts, left_ts +
    window]`` (click-after-view attribution, the canonical shape).

    Both sides get a ``watermark`` so Spark can bound the join state: a
    buffered left row is evictable once the right watermark passes
    ``left_ts + window``. The range predicate is REQUIRED — an equi-only
    stream-stream join must keep every row forever.

    The result is COMPOSABLE: one ``key`` column survives, and every
    right-side column that collides with a left-side name comes back
    prefixed ``r_`` (with the defaults, right's ``ts`` → ``r_ts``) — no
    ambiguous references for downstream selects or sinks.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    taken = set(lw.columns) | set(rw.columns)

    def fresh(c: str) -> str:
        new = f"r_{c}"
        while new in taken:  # e.g. right already has a literal r_ts
            new = f"r_{new}"
        taken.add(new)
        return new

    renames = {
        c: fresh(c) for c in rw.columns if c != key and c in lw.columns
    }
    rw = rw.withColumnsRenamed(renames)
    r_ts = renames.get(right_ts, right_ts)
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{r_ts}")
    joined = lw.alias("l").join(
        rw.alias("r"),
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rcol >= lcol)
        & (rcol <= lcol + F.expr(f"INTERVAL {window}")),
    )
    return joined.select(
        "l.*", *[F.col(f"r.{c}") for c in rw.columns if c != key]
    )


@query(
    "st_interval_join",
    survey="ST2,ST3,J4",
    oracle="""
        SELECT v.event_id                              AS view_id,
               c.event_id                              AS click_id,
               v.user_id                               AS user_id,
               strftime(v.ts, '%Y-%m-%d %H:%M:%S')     AS view_ts,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S')     AS click_ts,
               ROUND(v.value + c.value, 2)             AS pair_value
        FROM events v
        JOIN events c
          ON v.user_id = c.user_id
         AND c.ts >= v.ts
         AND c.ts <= v.ts + INTERVAL '2 hours'
        WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch mirror: click-after-view
    attribution pairing each view with same-user clicks inside a 2 h
    event-time window — THROUGH :func:`join_within_window` itself (the
    unified batch/streaming API makes ``withWatermark`` a no-op in batch,
    so the exact production join builder gets oracle-pinned; the
    streaming form with live state eviction is driven by
    ``tests/test_streaming.py``). Reference parity: the reference
    correlates task-claim and task-completion events per worker inside a
    timeout horizon (`shared_tools/store.py` claim/complete loops); this
    is that correlation as one declarative bounded-state join. Output is
    unique per (view_id, click_id) so the unordered hash gate is stable;
    the filters sit BEFORE the join so each side scans pruned
    (PushedFilters on event_type)."""
    events = load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    joined = join_within_window(
        views, clicks, key="user_id", watermark="2 hours", window="2 hours"
    )
    return joined.select(
        F.col("event_id").alias("view_id"),
        F.col("r_event_id").alias("click_id"),
        F.col("user_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round(F.col("value") + F.col("r_value"), 2).alias("pair_value"),
    )
