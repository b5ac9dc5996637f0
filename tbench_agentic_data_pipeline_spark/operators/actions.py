"""External-action executor (SURVEY.md §2.9 X4/X5, §7 Phase 4).

The reference shells out to Docker per datapoint — build the image
(``validators.py:102-149``), run the container and exec pytest
(``validators.py:572-647``) — under a 10-minute subprocess timeout with a
4-worker pool (``validate_all_prod_dps.py:34``, ``:355-373``). Those are
side effects, deliberately OUTSIDE query semantics (never oracle-checked).

The engine's pattern: `run_actions` executes an arbitrary per-row action
inside ``mapInPandas`` with

- bounded parallelism  — ``repartition(n)`` is the old ``--workers`` knob;
- per-row timeout      — a worker thread per action, joined with the
  budget; a timeout yields a structured failure row, never a task crash;
- structured results   — ``{key, ok, result, error, elapsed_ms}`` joined
  back to the table, so downstream stays declarative.

Docker itself is out of scope for this environment; ``ShellBackend``
(subprocess, the reference's own mechanism) and ``FakeBackend`` (pure,
deterministic, for tests and the registered rows-only query) exercise the
identical machinery.
"""

from __future__ import annotations

import concurrent.futures as cf
import time
from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("result", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("elapsed_ms", T.LongType()),
    ]
)

Action = Callable[[str, str], str]  # (key, payload) -> result text


def fake_backend(key: str, payload: str) -> str:
    """Deterministic stand-in for docker build/run: 'succeeds' unless the
    payload asks otherwise — lets tests drive both paths."""
    if "FAIL" in payload:
        raise RuntimeError(f"fake action failed for {key}")
    if "SLOW" in payload:
        time.sleep(5)
    return f"ok:{len(payload)}"


def shell_backend(key: str, payload: str, timeout_s: float = 600.0) -> str:
    """The reference's actual mechanism (subprocess), pointed at /bin/sh
    instead of docker; payload is the command line. The subprocess gets
    its own timeout (and unlike a Python thread, actually dies on it) —
    wire the same budget as ``run_actions(timeout_s=...)`` via
    ``functools.partial(shell_backend, timeout_s=...)``."""
    import subprocess

    out = subprocess.run(
        ["/bin/sh", "-c", payload], capture_output=True, text=True,
        timeout=timeout_s,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip() or f"exit {out.returncode}")
    return out.stdout.strip()


def run_actions(
    df: DataFrame,
    key_col: str,
    payload_col: str,
    action: Action = fake_backend,
    *,
    workers: int = 4,
    timeout_s: float = 600.0,
) -> DataFrame:
    """Execute ``action`` per row with bounded parallelism and per-row
    timeouts; emit structured result rows (X4/X5 with the side effect
    behind an interface). ``workers`` bounds cluster-wide concurrency the
    way the reference's process pool did machine-wide."""
    slim = df.select(key_col, payload_col).repartition(workers)

    def run_partition(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def one(key: str, payload: str) -> dict:
            t0 = time.perf_counter()
            # NOT a `with` block: context-manager exit calls
            # shutdown(wait=True), which would block on the runaway action
            # until it finished — defeating the timeout. shutdown with
            # wait=False abandons the worker thread (Python can't kill
            # threads; a truly wedged action leaks one thread, which is
            # still strictly better than wedging the Spark task).
            pool = cf.ThreadPoolExecutor(max_workers=1)
            fut = pool.submit(action, key, payload)
            try:
                res = fut.result(timeout=timeout_s)
                return {
                    "key": key, "ok": True, "result": res, "error": None,
                    "elapsed_ms": int((time.perf_counter() - t0) * 1000),
                }
            except cf.TimeoutError:
                return {
                    "key": key, "ok": False, "result": None,
                    "error": f"timeout after {timeout_s}s",
                    "elapsed_ms": int(timeout_s * 1000),
                }
            except Exception as e:  # structured failure, never a crash
                return {
                    "key": key, "ok": False, "result": None,
                    "error": str(e)[:500],
                    "elapsed_ms": int((time.perf_counter() - t0) * 1000),
                }
            finally:
                pool.shutdown(wait=False, cancel_futures=True)

        for pdf in it:
            rows = [
                one(str(k), str(p))
                for k, p in zip(pdf[key_col], pdf[payload_col])
            ]
            yield pd.DataFrame(rows, columns=list(RESULT_SCHEMA.fieldNames()))

    return slim.mapInPandas(run_partition, RESULT_SCHEMA)
