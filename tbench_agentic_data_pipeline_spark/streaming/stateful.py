"""Stateful streaming: timeout expiry and drain loops (SURVEY.md §2.10
ST2/ST3/ST5/ST6).

The reference expires stale claims with a scan inside every queue call
(``task_manager/task_manager.py:109-138``) and drains work with a poll
loop (``scripts/validate_all_prod_dps.py:143-151``). Streaming-first:

- ``expire_stale_tasks``  — ``applyInPandasWithState`` keeping per-task
  state with a processing-time timeout: when no update arrives within the
  TTL, the state times out and the operator emits a 'released' record
  (the push-based form of U6's batch sweep).
- ``drain_available``     — ``Trigger.AvailableNow`` writeStream: process
  everything pending, checkpoint, stop — the poll loop collapsed into one
  resumable invocation (exactly-once via checkpoint + idempotent sink,
  the streaming twin of J2's anti-join re-init).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

if TYPE_CHECKING:
    import pandas as pd

RELEASE_SCHEMA = T.StructType(
    [
        T.StructField("task_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("n_updates", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("n_updates", T.LongType())]
)


def _expire_fn(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Per-task state handler: count updates; on processing-time timeout,
    emit the release record and drop state (the 24h auto-release of
    ``task_manager.py:109-138`` with the clock pushed into the engine)."""
    import pandas as pd

    if state.hasTimedOut:
        (n,) = state.get
        state.remove()
        yield pd.DataFrame(
            {"task_id": [key[0]], "status": ["released"], "n_updates": [n]}
        )
        return
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    state.setTimeoutDuration(24 * 3600 * 1000)  # 24h TTL per update
    yield pd.DataFrame(
        {"task_id": [key[0]], "status": ["in_progress"], "n_updates": [n]}
    )


def expire_stale_tasks(updates: DataFrame, key_col: str = "task_id") -> DataFrame:
    """Wire the stateful timeout operator over a streaming updates frame.
    State is one counter per task — O(live tasks) memory, evicted on
    timeout; the output stream carries claim liveness transitions."""
    return updates.groupBy(key_col).applyInPandasWithState(
        _expire_fn,
        outputStructType=RELEASE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def upsert_drain(stream: DataFrame, table, key_col: str, checkpoint: str):
    """ST6 via foreachBatch: drain the stream, MERGE each micro-batch into
    a snapshot table (delete-matching + append = upsert). The batch is
    deduplicated on the key first, so replays collapse idempotently —
    checkpoint + idempotent merge = exactly-once table state."""
    from pyspark.sql import functions as F

    def merge(batch: DataFrame, batch_id: int) -> None:
        fresh = batch.dropDuplicates([key_col])
        if table.current_version() is None:
            table.commit(fresh, operation=f"upsert_batch_{batch_id}")
            return
        kept = table.read().join(
            fresh.select(key_col), on=key_col, how="left_anti"
        )
        table.commit(
            kept.unionByName(fresh, allowMissingColumns=True),
            operation=f"upsert_batch_{batch_id}",
        )

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def upsert_drain_delta(stream: DataFrame, table, key_col: str, checkpoint: str):
    """O(|batch|) streaming upsert: each micro-batch lands as ONE delta
    commit (``append_delta``) and readers resolve latest-wins through
    ``read_merged(key_col)`` — merge-on-read ingestion, vs
    :func:`upsert_drain`'s COW merge that re-reads and rewrites the
    WHOLE table every micro-batch (fine for control tables, ruinous for
    a 100 TB fact stream). Exactly-once at the merged view: the
    checkpoint prevents re-delivery, and a crash-window replay would
    append identical rows in a later commit, which resolve to the same
    values (physical duplicates reclaimed at the next
    ``compact(merge_key=...)``)."""

    def merge(batch: DataFrame, batch_id: int) -> None:
        fresh = batch.dropDuplicates([key_col])
        if table.current_version() is None:
            table.commit(fresh, operation=f"upsert_delta_batch_{batch_id}")
        else:
            table.append_delta(fresh)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def drain_available(
    stream: DataFrame, sink_path: str, checkpoint: str, fmt: str = "parquet"
):
    """ST3/ST6: process-everything-then-stop drain with checkpointed
    exactly-once progress — rerunning after a crash resumes from the
    checkpoint instead of re-reading (the reference achieves the same with
    its resumable anti-join init, ``validate_all_prod_dps.py:94-133``)."""
    return (
        stream.writeStream.format(fmt)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def rollup_partial(batch: DataFrame, keys: list[str], sum_cols: list[str]) -> DataFrame:
    """One micro-batch's additive contribution: count + sums per key
    (map-side combinable; output is key-cardinality, never batch-sized)."""
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )


def rollup_merge(
    cur: DataFrame, partial: DataFrame, keys: list[str], val_cols: list[str]
) -> DataFrame:
    """Fold a partial into the current rollup: union the two
    key-cardinality tables and re-aggregate. Additive merges need no
    join machinery — groupBy gives null-safe key semantics for free
    (a NULL key is one group), an all-NULL sum stays NULL exactly as
    SQL's SUM does (a full-outer/coalesce-add formulation reads 0
    there), and the plan is ONE key-cardinality exchange where the
    null-safe full-outer join this replaced needed a re-shuffle of
    both sides onto the null-safe composite key."""
    return (
        cur.select(*keys, *val_cols)
        .unionByName(partial.select(*keys, *val_cols))
        .groupBy(*keys)
        .agg(
            *[
                # only the count column's type is pinned; value sums keep
                # their native type (the drain rolls float sums)
                (F.sum(v).cast("bigint") if v == "n" else F.sum(v)).alias(v)
                for v in val_cols
            ]
        )
    )


@query(
    "st_incremental_rollup",
    survey="ST3,A1,A7",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)                              AS n,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                                                                     AS sum_cents
        FROM events GROUP BY event_type
    """,
)
def st_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, proven equal to the batch recompute:
    the events table arrives as three micro-batches (event_id mod 3 —
    the batch mirror of the drain's trigger boundaries) and each batch's
    partial count/sum folds ADDITIVELY into the running rollup via the
    SAME ``rollup_partial``/``rollup_merge`` the streaming
    ``incremental_rollup_drain`` commits per micro-batch — so the driver
    hash against the one-pass SQL aggregate certifies the merge algebra
    (union + re-aggregate) itself, not a lookalike. Value sums are
    integer cents (``floor(value·100)``): integer addition is
    associative, so the three-fold merge order cannot drift from the
    oracle's single-pass sum the way float accumulation order can.
    (Replay idempotence — a re-delivered batch id must be a no-op — is
    the commit-log seam, pinned in tests/test_streaming.py.)

    Scale shape: ONE events scan (the 3-column projection is
    localCheckpointed, batches slice from memory); each partial is a
    map-side-combined aggregate whose output is |event_type| rows, and
    each merge is a key-cardinality full-outer join — at 100 TB the
    per-batch cost is the batch scan + a tiny-table merge, never a
    recompute over history, which is the operator's reason to exist."""
    events = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            # pmod + NULL→bucket 0: Spark's % keeps the dividend sign and
            # NULL ids yield NULL buckets — either would silently drop
            # rows from every batch and diverge from the oracle's
            # full-table aggregate (r12 ADVICE; fixtures are dense
            # non-null today, but the 3-way cover must not depend on it)
            F.coalesce(F.pmod(F.col("event_id"), F.lit(3)), F.lit(0)).alias("b"),
        )
        .localCheckpoint()
    )
    keys, val_cols = ["event_type"], ["n", "sum_cents"]
    state = rollup_partial(events.where(F.col("b") == 0), keys, ["cents"])
    for b in (1, 2):
        partial = rollup_partial(events.where(F.col("b") == b), keys, ["cents"])
        state = rollup_merge(state, partial, keys, val_cols)
    return state.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
    )


def incremental_rollup_drain(
    stream: DataFrame,
    table,
    keys: list[str],
    sum_cols: list[str],
    checkpoint: str,
):
    """Incrementally-maintained aggregate table: each micro-batch's
    PARTIAL count/sums merge additively into a snapshot rollup keyed by
    ``keys`` — corpus statistics stay current under continuous ingest
    with per-batch work proportional to the BATCH, never a recompute
    over history. (``upsert_drain`` above is last-writer-wins row state;
    this is the additive twin for counts/sums — the two merge shapes
    incremental view maintenance needs.)

    Exactly-once: the streaming checkpoint guarantees each batch id is
    DELIVERED once, but foreachBatch may re-run a batch after a crash
    mid-merge, and addition is not idempotent. So each merge commits
    under operation ``rollup_batch_<id>`` and replays consult the table's
    commit history first — the snapshot history doubles as the applied-
    transaction log (the role Delta's txn action plays). Output columns:
    ``keys``, ``n`` (count), and ``sum_<col>`` per ``sum_cols``."""

    def merge(batch: DataFrame, batch_id: int) -> None:
        op = f"rollup_batch_{batch_id}"
        if any(h.get("operation") == op for h in table.history()):
            return  # replayed batch — already folded in
        partial = rollup_partial(batch, keys, sum_cols)
        if table.current_version() is None:
            table.commit(partial, operation=op)
            return
        val_cols = ["n"] + [f"sum_{c}" for c in sum_cols]
        table.commit(
            rollup_merge(table.read(), partial, keys, val_cols), operation=op
        )

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
