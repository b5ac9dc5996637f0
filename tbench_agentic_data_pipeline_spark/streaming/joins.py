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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
