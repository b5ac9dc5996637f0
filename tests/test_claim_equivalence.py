"""Property test for SURVEY.md §4.4 / §7 hard-part 3: the lock-free batch
claim assignment produces identical outcomes to the reference's serialized
get_next_task protocol (flock → scan pending in FIFO order → claim),
when workers poll round-robin."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tbench_agentic_data_pipeline_spark.operators.queue import claim_assignment


def serialized_simulator(task_ids: list[int], n_workers: int) -> dict[int, int]:
    """The reference's semantics, minus the lock (we ARE the serialization):
    each get_next_task call scans pending tasks in insertion (FIFO) order
    and claims the first one (task_manager.py:199-218). Workers poll
    round-robin until the queue drains."""
    pending = dict.fromkeys(task_ids, True)  # insertion-ordered
    assignment: dict[int, int] = {}
    w = 0
    while any(pending.values()):
        first = next(t for t, p in pending.items() if p)
        pending[first] = False
        assignment[first] = w
        w = (w + 1) % n_workers
    return assignment


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    st.integers(1, 6),
)
@settings(max_examples=20, deadline=None)
def test_batch_claim_equals_serialized_protocol(task_seq, n_workers):
    # hypothesis can't inject pytest fixtures; grab the shared session.
    from tbench_agentic_data_pipeline_spark.session import get_session

    spark = get_session("tests", shuffle_partitions=8)
    # created_at follows list position → FIFO order == list order.
    rows = [(tid, pos) for pos, tid in enumerate(task_seq)]
    df = spark.createDataFrame(rows, "task_id long, created_at long")
    out = {
        r["task_id"]: r["worker_id"]
        for r in claim_assignment(
            df, n_workers, ["created_at", "task_id"]
        ).collect()
    }
    assert out == serialized_simulator(task_seq, n_workers)
