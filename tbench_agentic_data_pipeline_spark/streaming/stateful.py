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

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
    from pyspark.sql import functions as F

    def merge(batch: DataFrame, batch_id: int) -> None:
        op = f"rollup_batch_{batch_id}"
        if any(h.get("operation") == op for h in table.history()):
            return  # replayed batch — already folded in
        partial = batch.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        )
        if table.current_version() is None:
            table.commit(partial, operation=op)
            return
        cur = table.read()
        val_cols = ["n"] + [f"sum_{c}" for c in sum_cols]
        new = partial.select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            *[F.col(v).alias(f"__v_{v}") for v in val_cols],
        )
        cond = [cur[k].eqNullSafe(F.col(f"__k_{k}")) for k in keys]
        merged = cur.join(new, cond, "full_outer").select(
            *[
                F.coalesce(cur[k], F.col(f"__k_{k}")).alias(k)
                for k in keys
            ],
            *[
                (
                    F.coalesce(cur[v], F.lit(0)) + F.coalesce(F.col(f"__v_{v}"), F.lit(0))
                ).alias(v)
                for v in val_cols
            ],
        )
        merged = merged.withColumn("n", F.col("n").cast("bigint"))
        table.commit(merged, operation=op)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
