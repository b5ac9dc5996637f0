"""Task-queue coordination as batch dataflow (SURVEY.md §2.10, §4.4).

The reference coordinates 20+ agents through an fcntl-flock'd JSON store
(``task_manager/task_manager.py:64-90``): claim = lock → load → linear scan
→ mutate → atomic save. Spark is a single-logical-writer system, so the
engine replaces the mutex with *deterministic batch assignment*: given the
same pending set, ``claim_assignment`` produces the same worker→task map as
N serialized ``get_next_task`` calls — provable, lock-free, and shuffle-
bounded by the number of pending tasks, not the table size.

The real-time multi-writer mutex (if a deployment truly needs one) lives in
a thin driver-side coordinator OUTSIDE the engine — see SURVEY.md §4.4 for
the rationale; every downstream computation (status aggregates, semi-joins,
timeouts) is indifferent to which equivalent serialization happened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Reusable operator API
# ---------------------------------------------------------------------------


def claim_assignment(
    pending: DataFrame, n_workers: int, order_cols: list[str],
    worker_col: str = "worker_id",
) -> DataFrame:
    """ST1/ST4: deterministically deal pending tasks across ``n_workers``
    in FIFO order (round-robin over the claim order). Equivalent outcome to
    workers repeatedly calling get_next_task (``task_manager.py:199-218``)
    when tasks are uniform; one window shuffle, no locks."""
    w = Window.orderBy(*order_cols)
    return pending.withColumn(
        worker_col, ((F.row_number().over(w) - 1) % n_workers).cast("bigint")
    )


def status_summary(tasks: DataFrame, status_col: str = "status") -> DataFrame:
    """A1/A3 over the queue: per-status counts plus grand total
    (``task_manager.py:348-376``)."""
    return tasks.groupBy(status_col).agg(F.count(F.lit(1)).alias("n"))


def release_owned(
    tasks: DataFrame, agent: str, status_col: str = "status",
    owner_col: str = "locked_by",
) -> DataFrame:
    """U5 + P7: release only the caller's in-progress tasks
    (``task_manager.py:269-303``)."""
    cond = (F.col(status_col) == "in_progress") & (F.col(owner_col) == agent)
    # Single withColumns call: both updates see the ORIGINAL row. Chained
    # withColumn would flip status first and the owner update's predicate
    # would no longer match its own transition.
    return tasks.withColumns(
        {
            status_col: F.when(cond, "pending").otherwise(F.col(status_col)),
            owner_col: F.when(cond, F.lit(None)).otherwise(F.col(owner_col)),
        }
    )


# ---------------------------------------------------------------------------
# Registered oracle-checkable queries
# ---------------------------------------------------------------------------


@query(
    "st1_claim_assignment",
    survey="ST1,ST4,W4",
    oracle="""
        SELECT event_id,
               CAST((ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1) % 4 AS BIGINT)
                   AS worker_id
        FROM events
        WHERE event_type = 'click'
    """,
)
def st1_claim_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1/ST4: the lock-free claim — round-robin assignment of the pending
    queue ('click' events) to 4 workers in FIFO order, mirroring the
    reference's ``--workers 4`` fan-out (``validate_all_prod_dps.py:305-314``).

    Scale note: the global row_number is a single-partition window — fine
    for a work queue (thousands of tasks, reference's own ceiling). For
    billions of rows use a per-group claim (u3) or zipWithIndex-style
    partition offsets instead."""
    events = load_table(spark, sf_dir, "events")
    pending = events.where(F.col("event_type") == "click")
    return claim_assignment(pending, 4, ["ts", "event_id"]).select(
        "event_id", "worker_id"
    )
