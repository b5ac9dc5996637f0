"""Strong-scaling measurement: fixed ~sf1 work, varying local[] threads.

The scale curve answers "what happens when the DATA grows 10×"; this
answers the other half of the 1000-executor question — "does the same
work actually spread across more cores". For each thread count the tool
spawns a FRESH subprocess (its own JVM; SPARK_GRAFT_CPUS is read at
session build), runs a set of heavy shuffle/join/iterative queries
against the ~sf1 fixture (built by tools/scaling_curve.py), best-of-2,
and the parent renders speedup and parallel efficiency relative to the
smallest thread count into SCALING.md's AUTOGEN:STRONG_SCALING block.

spark.sql.shuffle.partitions stays at the session default (32) for every
run so the PLANS are identical — only executor-thread parallelism varies.

Noise protocol (r12 verdict task #2 — the same two-pass min-merge the
headline bench got in r11): the box's intermittent CPU neighbor bursts
for minutes, so a single sweep's back-to-back in-JVM repeats can both
land inside one burst (the r11 embdup 16→32 step and the r12 ivfpq
0.62× cell were both post-hoc-adjudicated noise). The ENTIRE thread
sweep now runs SPARK_GRAFT_STRONG_PASSES (default 2) full passes and
each (thread, query) cell keeps its cross-pass MINIMUM via bench.py's
``_fold_pass`` — repeats of a cell are separated by the length of a
whole sweep, so a burst must span both passes to reach the table.

Usage: python tools/strong_scaling.py [--update-md]
       python tools/strong_scaling.py --worker   (internal)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_BIG = os.path.join(REPO, ".scaling", "sf1")
THREADS = (4, 8, 16, 32)
# Heavy, compute/shuffle-bound shapes where parallelism should pay:
# the banded-LSH contract pipeline, iterative pointer-jumping CC, the
# co-partitioned semi/anti TPC-H join, and the LSH→CC→survivor chain.
# r9 (VERDICT r8 #7): plus the two INDEX-LIFECYCLE paths — the composed
# IVF+PQ query (coarse-stats build → snapshot commit → reload → probe →
# cell-pruned ADC) and incremental dedup (persisted-index band join) —
# so the build-vs-search serial fraction is a measured row, not prose.
QUERIES = (
    "dedup_minhash_fast",
    "dedup_cluster_components",
    "q21_sole_late_supplier",
    "dedup_resolve_survivors",
    "sim_ivfpq_topk",
    "dedup_incremental",
    # r10 (VERDICT r9 #7): the one iterative-driver-loop path without a
    # parallel-efficiency row — the Sennrich BPE trainer (one corpus
    # shuffle, then vocab-sized argmax rounds with a 1-row collect each)
    "bpe_train_8rounds",
    # r11: the two full corpus-build compositions (token LSH→CC→survivor
    # and embedding multiprobe→CC→survivor) — each carries an in-query
    # CC loop whose per-round driver scheduling is the suspected serial
    # floor; a parallel-efficiency row makes that measured, not prose
    "pipeline_corpus_build_neardup",
    "pipeline_corpus_build_embdup",
    # r12: the incremental corpus-build tick (index save + band join +
    # quantizer assignment — the O(batch) lifecycle path, expected to be
    # fixed-overhead-bound like dedup_incremental) and the cross-doc
    # n-gram novelty audit (explode → gram-window shuffle → doc rollup,
    # the widest-fanout shuffle shape in the registry — expected to
    # spread well)
    "pipeline_incremental_tick",
    "text_ngram_novelty",
)


def _bpe_train_8rounds(spark, sf_dir):
    """Full BPE training loop at fixed work (8 merge rounds over the
    corpus vocab) — not a registry query (it returns a merge LIST, not a
    DataFrame), timed here as its own driver-loop action."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.text import bpe_train

    merges = bpe_train(
        load_table(spark, sf_dir, "documents"), num_merges=8, min_count=2
    )
    assert len(merges) == 8, f"trainer converged early: {len(merges)} rounds"


_EXTRA_ACTIONS = {"bpe_train_8rounds": _bpe_train_8rounds}
START = "<!-- AUTOGEN:STRONG_SCALING -->"
END = "<!-- /AUTOGEN:STRONG_SCALING -->"

PASSES = int(os.environ.get("SPARK_GRAFT_STRONG_PASSES", "2"))


def fold_results(
    acc: dict[int, dict[str, float]],
    pass_results: dict[int, dict[str, float]],
) -> None:
    """Fold one full sweep pass into the accumulated grid: per-cell
    MINIMUM across passes, via bench.py's ``_fold_pass`` (the committed
    headline-bench protocol — one fold implementation, one set of
    semantics to test)."""
    from bench import _fold_pass

    for n, times in pass_results.items():
        _fold_pass(acc.setdefault(n, {}), {}, times, {})


def worker() -> None:
    from tbench_agentic_data_pipeline_spark import registry
    from tbench_agentic_data_pipeline_spark.session import get_session

    spark = get_session("strong-scaling")
    fns = {n: e.fn for n, e in registry.collect().items()}
    # warm JVM + python workers like bench.py
    try:
        fns[QUERIES[0]](spark, SF_BIG).count()
    except Exception:
        pass
    times = {}
    for name in QUERIES:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            if name in _EXTRA_ACTIONS:
                _EXTRA_ACTIONS[name](spark, SF_BIG)
            else:
                fns[name](spark, SF_BIG).write.format("noop").mode(
                    "overwrite"
                ).save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        times[name] = round(best, 3)
        # Free the finished query's localCheckpoint blocks before the
        # next cell: ContextCleaner only drops executor storage after
        # the driver-side Python reference is GC'd, and the residue of
        # the checkpoint-heavy dedup family measured 2.49 -> 9.32 s on
        # the following ivfpq cell at ~sf1/local[32] (r13). Same
        # per-query collect the bench shard runner applies.
        gc.collect()
    print(json.dumps(times))
    spark.stop()


def _probe_ratio() -> float | None:
    """One calibration-probe invocation (bench.py's byte-stable q6/q14
    shard at the sf0.1 floor SF), folded to the r15 worst-window metric:
    max per-query t/floor. A ~50 min sweep outruns the bench's own
    probe brackets, so the sweep interleaves its OWN probes between
    workers — the printed trail is what lets a reader accept or discard
    the table (the r15 re-measure was discarded exactly for lacking
    this). None when the probe shard dies (itself suspicious)."""
    import subprocess

    from bench import CALIBRATION_FLOORS

    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "bench.py"), "--shard",
            *CALIBRATION_FLOORS,
        ],
        capture_output=True, text=True,
        env=dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1"),
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            times = json.loads(line).get("times", {})
        except (json.JSONDecodeError, AttributeError):
            continue
        timed = {n: t for n, t in times.items() if n in CALIBRATION_FLOORS}
        if timed:
            return round(
                max(t / CALIBRATION_FLOORS[n] for n, t in timed.items()), 2
            )
    return None


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    if not os.path.isdir(os.path.join(SF_BIG, "lineitem.parquet")):
        sys.exit("~sf1 fixture missing — run tools/scaling_curve.py first")
    from _common import run_worker_json, splice_autogen

    results: dict[int, dict[str, float]] = {}
    probe_trail: list[float | None] = [_probe_ratio()]
    for p in range(PASSES):
        pass_results: dict[int, dict[str, float]] = {}
        for n in THREADS:
            parsed = run_worker_json(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                dict(os.environ, SPARK_GRAFT_CPUS=str(n)),
                f"pass {p + 1} local[{n}] worker",
            )
            pass_results[n] = parsed
            probe_trail.append(_probe_ratio())
            print(
                f"pass {p + 1}/{PASSES} local[{n}]: {parsed} "
                f"(loadavg {os.getloadavg()[0]:.1f}, "
                f"probe {probe_trail[-1]})",
                file=sys.stderr,
            )
        fold_results(results, pass_results)

    base = THREADS[0]
    lines = [
        "| query | " + " | ".join(f"local[{n}] (s)" for n in THREADS)
        + " | speedup @32 | efficiency @32 |",
        "|---|" + "---|" * (len(THREADS) + 2),
    ]
    for q in QUERIES:
        ts = [results[n][q] for n in THREADS]
        sp = ts[0] / ts[-1] if ts[-1] > 0 else float("nan")
        eff = sp / (THREADS[-1] / base)
        lines.append(
            f"| `{q}` | " + " | ".join(f"{t:.2f}" for t in ts)
            + f" | {sp:.2f}× | {eff:.0%} |"
        )
    tot = [sum(results[n][q] for q in QUERIES) for n in THREADS]
    sp = tot[0] / tot[-1]
    lines.append(
        "| **total** | " + " | ".join(f"{t:.2f}" for t in tot)
        + f" | {sp:.2f}× | {sp / (THREADS[-1] / base):.0%} |"
    )
    lines.append("")
    lines.append(
        "`sim_ivfpq_topk`'s flat row is a fixed ~2.4 s in-query index "
        "LIFECYCLE constant (stats build + snapshot save/load + probe "
        "before the ADC scan — the r12 bench-step adjudication below), "
        "not a scaling defect of the search path; the thread-responsive "
        "ADC/search half is covered by `sim_pq_adc_topk` in the scale "
        "curve."
    )
    lines.append("")
    lines.append(
        "Box-health probe trail for THIS sweep (q6/q14 shard before the "
        "sweep and after every worker; max per-query t/floor, ~1.0 = "
        f"quiet): {probe_trail}. Cells measured next to a ≳1.3 probe "
        "are burst-suspect — defer to the per-stage floors and "
        "COMPOSITION_FLOORS before reading a regression off this table."
    )
    table = "\n".join(lines)
    print(table)
    if "--update-md" in sys.argv:
        splice_autogen(START, END, table)


if __name__ == "__main__":
    main()
