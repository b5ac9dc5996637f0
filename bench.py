#!/usr/bin/env python
"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Per-query wall time includes plan + execution to completion (count-style
action that consumes every output row), excluding session startup. The
headline metric is total seconds across headline queries.
"""

from __future__ import annotations

import gc
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tbench_agentic_data_pipeline_spark import registry
from tbench_agentic_data_pipeline_spark.session import get_session

# Headline set: one per operator family, weighted toward shuffle-heavy work.
HEADLINE = [
    "flagship_pricing_summary",
    "a4_completion_rate",
    "a8_distinct_users_per_type",
    "j1_semi_join_customers_with_orders",
    "j5_broadcast_dim_join",
    "w3_pergroup_topn",
    "so1_union_by_name",
    "dedup_exact",
    "dedup_minhash_fast",
    "sim_topk_cosine_arrow",
    "text_quality_score",
    "st_session_windows",
    # heavy round-2 additions under regression tracking (VERDICT r2 #6):
    "dedup_cluster_components",
    "text_contamination",
    "text_tfidf_topk",
    # heaviest previously-unbenched families (VERDICT r3 #8). The kNN
    # join benches its GEMM production twin — the fold twin stays the
    # oracle path but measured α=1.66 super-linear wall-clock on the
    # scale curve (SCALING.md), exactly what the bench must not track:
    "sim_knn_join_arrow",
    "st_dedup_watermark",
    # round-4 TPC-H tail: the two with the most join/shuffle work
    "q9_profit_by_nation_year",
    "q21_sole_late_supplier",
    # round-5 widening (VERDICT r4 #3): the 3-5-shuffle plans that had no
    # recorded perf signal — a regression here was invisible to BENCH_rN.
    "q2_min_cost_supplier",
    "q11_important_part_value",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q20_dominant_suppliers",
    "events_funnel",
    "j_asof_last_view",
    "w8_trailing_week_activity",
    "dedup_threshold_sweep",
    # round-5 additions, benched from birth:
    "st_interval_join",
    "mm_image_codec",
    "text_bm25_topk",
    "sim_centroid_outliers",
    "dedup_incremental",
    "a_profile_documents",
    "events_attribution",
    # the kNN entry point users actually call: dispatcher overhead
    # (bucket accounting + routing) measured against sim_knn_join_arrow
    "sim_knn_join_auto",
    # round-6 additions, benched from birth: the in-plan CMS (its real
    # 6-exchange plan replaced the old driver-side sketch read), the
    # snapshot write path (commit + delta chain + compact + merge-on-read
    # — the only write-bound bench entry, noisier by nature), and the
    # AVI/MJPG video decode stage
    "a_heavy_hitters_cms",
    "snap_merge_on_read",
    "mm_video_codec",
    # round-7 addition, benched from birth: PQ/ADC top-k — the Arrow
    # encode + lookup-table search over m-byte codes
    "sim_pq_adc_topk",
    # late round-7: the composed IVF+PQ path (cell-pruned ADC scan).
    # r8 note: the query's semantics WIDENED to the full index lifecycle
    # (stats build + snapshot save/load + centroid probe now run eagerly
    # inside the fn before the ADC scan), so its benched time includes an
    # index build per run — the write-bound snap_merge_on_read posture,
    # expect ~2-3 s at sf0.1 vs r7's 0.88 s search-only reading.
    "sim_ivfpq_topk",
    # round-8 additions, benched from birth: the RIFF/WAV audio decode
    # stage (fixture-encode + chunk-walk parse, the audio twin of the
    # image/video codec entries), the BPE pair-counting stage (the
    # tokenizer-training counting shuffle — bounded-cardinality key),
    # and the GIF-LZW/BMP decode stage
    "mm_audio_codec",
    "text_bpe_pairs",
    "mm_gif_codec",
    # sim_pq_trained_topk (r8) is deliberately NOT benched: ~10 s of its
    # wall-clock is pq_train's m-per-subspace Lloyd's chains — an OFFLINE
    # index build at 100 TB, not a per-query throughput path (the same
    # reasoning that keeps the fold-cosine sim_knn_join off the bench).
    # The search half it feeds (encode + ADC + rerank) is covered by
    # sim_pq_adc_topk / sim_ivfpq_topk above.
    # round-10 additions, benched from birth: the FULL near-dup corpus
    # build (quality → exact dedup → LSH pairs → connected components →
    # survivor resolution → sample → accounting — the end-to-end
    # training-data-build shape) and the composited animated-GIF frame
    # sampler (1→3 explode + featurize in one fused Arrow stage)
    "pipeline_corpus_build_neardup",
    "mm_gif_frames",
    # round-11 additions, benched from birth: incremental IVF maintenance
    # (existing half trains the integer-milli quantizer, arriving half is
    # assigned to it — broadcast crossJoin + argmin fold + per-cell drift
    # report; the corpus side never shuffles for the assignment) and the
    # embedding-space corpus-build pass (multiprobe near-dup pairs -> CC ->
    # keep-longest survivors over documents -> stratified sample -> lang
    # accounting — the semantic complement of pipeline_corpus_build_neardup)
    "sim_ivf_incremental",
    "pipeline_corpus_build_embdup",
    # round-12 additions, benched from birth: the incremental corpus-build
    # tick (arriving batch -> MinHash dedup vs the history index -> accepted
    # embeddings assigned to the saved quantizer -> per-lang tick report
    # with the drift numerators) — the O(batch) streaming twin of the two
    # batch corpus compositions — and the cross-doc 8-gram novelty audit
    # (explode distinct grams -> window count over gram -> per-doc rollup;
    # the corpus-vs-itself memorization signal), and the incremental-rollup
    # merge certification (three micro-batch partials folded via the
    # streaming drain's own union+re-aggregate merge)
    "pipeline_incremental_tick",
    "text_ngram_novelty",
    "st_incremental_rollup",
    # round-13 addition, benched from birth: the drift->retrain-and-swap
    # report (stale per-cell quantizer from history, batch shifted in odd
    # cells only, refit quantizer over history+batch, per-cell pre/post
    # means + integer-exact retrain decision — the oracle twin of
    # clustering.ivf_retrain's full lifecycle)
    "sim_ivf_retrain",
    # round-15 addition, benched from birth: the streaming minhash-dedup
    # batch mirror (per-row signatures over one documents scan, band
    # join against the arrival-rank index state, exact-Jaccard verify —
    # the dedup family's streaming-ingestion shape)
    "st_minhash_dedup",
]


def _extra_queries():
    """Benched production paths that are deliberately NOT registry entries:
    sim_topk_cosine_arrow is the GEMM twin of the oracle-gated fold query
    (ulp-level float divergence keeps it off the hash gate; the bench must
    measure the production path)."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        sim_knn_join_arrow,
        sim_knn_join_auto,
        sim_topk_cosine_arrow,
    )

    return {
        "sim_topk_cosine_arrow": sim_topk_cosine_arrow,
        "sim_knn_join_arrow": sim_knn_join_arrow,
        "sim_knn_join_auto": sim_knn_join_auto,
    }


# Untimed per-shard warmers (r8 verdict #5): the sharding experiment
# showed fresh JVMs read +31% slower at shard-6 because C2 JIT warmth
# dominates — best-of-3 alone doesn't close it, since a sub-second query
# finishes its three runs before the background C2 threads finish
# compiling the hot scan/shuffle/codegen infrastructure. Two diverse
# warmers give the compiler samples of the big shared paths before any
# timed run: a lineitem-scale scan+agg+join, and a shuffle+explode+hash
# pipeline. Their cost (~3-4 s/shard) is session infrastructure, never
# counted.
_WARMUP = ["flagship_pricing_summary", "dedup_minhash_fast"]


def _run_shard(names: list[str], sf_dir: str, stream: bool = False) -> dict:
    """Run one shard of headline queries in THIS process's fresh session
    and return {times, errors, cc_rounds}. Sharding exists because a
    42-query single-session sweep accumulates JVM/codegen/GC state that
    inflated late-position queries ~1.2-3.4× over their fresh-session
    times (r7 measured 2.67 s in-session vs 0.78 s fresh for the same
    query) — the committed BENCH record should read fresh-session truth,
    not sweep-position noise.

    With ``stream=True`` every per-query outcome is also printed as its
    own JSON line ({"start": name} before, {"q", "t"|"err"} after) so
    the parent can salvage completed timings when the shard process dies
    mid-query (one OOMing query must not discard or take the blame for
    its shard-mates' results)."""

    def emit(obj: dict) -> None:
        if stream:
            print(json.dumps(obj), flush=True)

    spark = get_session("bench")
    fns = {n: e.fn for n, e in registry.collect().items()}
    fns.update(_extra_queries())
    names = [n for n in names if n in fns]
    # Warm the JVM + parquet footers once with the shard's own first
    # query, pre-spawn the Python worker pool (first mapInPandas pays
    # ~7 s of parallel pandas imports across 32 workers — session
    # infrastructure, like JVM startup, not per-query work; measured
    # 8.4 s cold → 1.1 s warm for the same query), then run the fixed
    # diverse warmers.
    try:
        fns[names[0]](spark, sf_dir).count()
        parallelism = spark.sparkContext.defaultParallelism

        def _touch(batches):
            yield from batches

        (
            spark.range(parallelism * 4, numPartitions=parallelism)
            .mapInPandas(_touch, "id long")
            .count()
        )
        for warm in _WARMUP:
            if warm in fns:
                fns[warm](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
    except Exception:
        pass

    # Best-of-3 per query: the first run pays one-time whole-stage-codegen
    # compilation and JIT warmup (measured 2-4× on the heavy queries: e.g.
    # the minhash band pipeline 2.55 s cold → 0.94 s warm at sf0.1) —
    # per-process compile cost that amortizes to nothing over a 100 TB
    # run. min reports steady-state throughput, the quantity that
    # extrapolates; plan + full execution is still included in each run.
    # Three runs, not two: run-to-run noise on sub-second queries measured
    # ±30% on this box, enough for a carried-over query to read as a
    # round-over-round regression that isn't there.
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    cc_rounds: int | None = None
    for name in names:
        emit({"start": name})
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                df = fns[name](spark, sf_dir)
                # Force full materialization of every output row.
                df.write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 3)
                best = elapsed if best is None else min(best, elapsed)
            except Exception as e:  # one broken query must not sink the run
                errors[name] = f"{type(e).__name__}: {e}"[:200]
                break
        if best is not None:
            times[name] = best
            # A run-1 success followed by a run-2 failure still counts as
            # timed — don't report the query as both timed and failed.
            errors.pop(name, None)
            emit({"q": name, "t": best})
        else:
            emit({"q": name, "err": errors[name]})
        if name == "dedup_cluster_components":
            # Snapshot immediately: last_rounds is process-global and any
            # later query that also calls connected_components (e.g. the
            # leakage-safe split) would overwrite the attribution.
            cc_rounds = connected_components.last_rounds
        # Release the finished query's localCheckpoint/persist blocks
        # BEFORE the next query starts: executor storage for a
        # checkpointed RDD is freed by the ContextCleaner only after the
        # driver-side Python reference is garbage-collected, so without
        # an explicit collect the residue of a checkpoint-heavy query
        # degrades its shard-mates (r13 measured at ~sf1/local[32]:
        # sim_ivfpq_topk 2.49 s fresh vs 9.32 s after the dedup family
        # in one session; 2.61 s with this collect).
        gc.collect()

    spark.stop()
    return {"times": times, "errors": errors, "cc_rounds": cc_rounds}


def _parse_shard_output(
    shard: list[str], stdout: str, stderr: str, returncode: int
) -> tuple[dict[str, float], dict[str, str], int | None]:
    """Fold one shard subprocess's output into (times, errors, cc_rounds).

    The shard streams {"start"}/{"q"} event lines and ends with a
    {"times", ...} summary. Collect every parseable dict line (a stray
    parseable line — bare number, py4j noise — must not shadow a
    payload: require the dict shape). When the summary is missing the
    process died mid-shard: salvage the streamed per-query results and
    attribute the crash to the query that was actually RUNNING — one
    OOMing query must not discard or take the blame for its
    shard-mates' completed timings."""
    summary = None
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    running: str | None = None
    for line in (stdout or "").strip().splitlines():
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if not isinstance(cand, dict):
            continue
        if "times" in cand:
            summary = cand
        elif "start" in cand:
            running = cand["start"]
        elif "q" in cand:
            if "t" in cand:
                times[cand["q"]] = cand["t"]
            elif "err" in cand:
                errors[cand["q"]] = cand["err"]
            if cand["q"] == running:
                # the query finished (well or badly): a later crash is
                # between-queries/teardown, not this query's fault
                running = None
    if summary is not None:
        return (
            summary.get("times", {}),
            summary.get("errors", {}),
            summary.get("cc_rounds"),
        )
    tail = (stderr or stdout or "").strip()[-200:]
    if running is not None:
        where = f"during {running}"
    elif times or errors:
        where = "between queries/session teardown"
    else:
        where = "during session startup"
    for n in shard:
        if n in times or n in errors:
            continue
        if n == running:
            errors[n] = f"shard died running this query (rc={returncode}): {tail}"
        else:
            errors[n] = f"not run: shard died {where} (rc={returncode})"
    return times, errors, None


# Queries per fresh-session shard. 14 → four shards (14/14/14/10) for
# the current 52-entry headline: small enough that no query sits deep
# in an accumulated session, large enough that the per-shard ~10 s
# session startup + warmup (excluded from timings) stays a minor
# fraction of the sweep.
SHARD_SIZE = int(os.environ.get("SPARK_GRAFT_BENCH_SHARD_SIZE", "14"))

# Hard ceiling per shard subprocess: a hung query (deadlock, livelock,
# non-converging loop) must surface as an attributed error like a crash
# does, not wedge the whole sweep with no BENCH record at all. The
# slowest shard legitimately runs ~2 min (best-of-3 over 14 queries at
# sf0.1 incl. warmup); 20 min is an order of magnitude of headroom.
SHARD_TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_BENCH_SHARD_TIMEOUT", "1200"))

# Post-kill drain bound: after killpg the pipes normally close at once;
# this only binds the D-state-writer corner (module constant so the test
# can exercise that path without a 30 s sleep).
SHARD_DRAIN_TIMEOUT_S = 30

def _invoke_shard(shard: list[str]) -> tuple[str, str, int]:
    """One shard subprocess → (stdout, stderr, returncode). A hang is
    converted to crash-shaped output at SHARD_TIMEOUT_S: whatever the
    shard printed before the kill is kept (completed queries salvage
    their timings), and the hung query is attributed by name through the
    same _parse_shard_output path a crash takes.

    The shard runs in its own session (process group) and the timeout
    path kills the WHOLE group: a plain run(timeout=...) SIGKILLs only
    the direct python child, then blocks in communicate() until every
    writer of the captured pipes exits — the PySpark JVM grandchild
    inherits those pipes, so a wedged JVM (deadlocked executors, hung
    shutdown hooks) would re-wedge the sweep past the guard. killpg
    takes the JVM down with the driver; the post-kill drain is itself
    bounded in case an unkillable (D-state) writer survives."""
    import subprocess

    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--shard", *shard],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,
    )
    try:
        out, err = proc.communicate(timeout=SHARD_TIMEOUT_S)
        return out, err, proc.returncode
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        try:
            out, _ = proc.communicate(timeout=SHARD_DRAIN_TIMEOUT_S)
        except subprocess.TimeoutExpired as te:
            # A truly unkillable (D-state) writer still holds the pipe:
            # SALVAGE what communicate already buffered — the completed
            # queries' timings are exactly what this path exists to
            # keep — and release our pipe ends instead of leaking them.
            out = te.stdout or b""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            for pipe in (proc.stdout, proc.stderr):
                if pipe is not None:
                    pipe.close()
        try:
            proc.wait(timeout=0)  # reap the SIGKILLed direct child
        except (subprocess.TimeoutExpired, OSError):
            pass
        return out or "", f"shard timeout after {SHARD_TIMEOUT_S}s", -1


# Full-sweep passes, min-merged per query (the same per-cell-minimum
# protocol tools/scaling_curve.py --merge-best applies to curve tables).
# The in-shard best-of-3 above defends against cold-start/JIT cost but
# NOT against the box's intermittent CPU neighbor, whose bursts last
# minutes — three back-to-back runs all land inside one burst, which is
# exactly how the r9 and r10 committed records came to overstate quiet
# cost by ~20-30%. A second full pass separates each query's repeats by
# the length of an entire sweep (~4 min at sf0.1), so a burst would have
# to span both passes to poison the minimum. A query counts as timed if
# ANY pass timed it; error attribution survives only when every pass
# failed it.
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))


def _fold_pass(
    times: dict[str, float],
    errors: dict[str, str],
    s_times: dict[str, float],
    s_errors: dict[str, str],
) -> None:
    """Fold one shard result into the sweep accumulators: per-query
    MINIMUM across passes for timings; for errors, a genuinely
    ATTRIBUTED failure (the query was running, or ran and raised) always
    beats a "not run:" infrastructure placeholder — pass 1's real OOM
    must not be rewritten as "not run: shard died during session
    startup" by a pass-2 transient. (Error attribution is resolved at
    the END of all passes: any query with a timing from any pass drops
    out of the error map.)"""
    for n, t in s_times.items():
        times[n] = min(times[n], t) if n in times else t
    for n, msg in s_errors.items():
        have_real = n in errors and not errors[n].startswith("not run:")
        if have_real and msg.startswith("not run:"):
            continue
        errors[n] = msg


def _box_stamp() -> dict:
    """Box-state stamp for the committed record (r11 verdict task #7):
    the documented ±30-50% sub-second noise comes from an intermittent
    CPU neighbor, so a future noisy record must be self-diagnosing —
    1/5/15-min load averages at sweep end, rounded readable. Empty dict
    only where the platform lacks getloadavg."""
    try:
        return {"loadavg": [round(x, 2) for x in os.getloadavg()]}
    except (OSError, AttributeError):  # absent on some platforms vs raising
        return {}


# Box-health calibration (r13 verdict task #3): two byte-stable TPC-H
# probes run through the SAME fresh-shard path as the sweep — before it,
# between passes, and after it — so environmental inflation becomes a
# NUMBER in the committed JSON instead of a prose adjudication (r12 and
# r13 both needed one). The floors are the per-query minima of five
# quiet-box shard invocations at the committed bench SF (sf0.1,
# local[32], loadavg ~1.3, 2026-08-16); the probes are q6 (single-table
# scan+agg) and q14 (lineitem⋈part join+agg) — files untouched since
# r11, chosen exactly because no round churns them. Two ratios are
# stamped at the floor SF: calibration_ratio = Σ per-query minima /
# Σ floors (the quiet-floor evidence — ~1.0 means at least one probe
# window was clean; r13's +76% byte-identical inflation would have read
# ~1.5-1.8 here) and calibration_ratio_worst = max over probe
# invocations of its max per-query t/floor (the burst evidence — a
# CPU-neighbor burst confined BETWEEN the outer probes still shows in
# the mid-sweep one, and a single-query burst can't hide behind the
# other probe's quiet reading the way a Σ-ratio allowed; r14/r15
# self-reviews closed those blind spots). Other SFs stamp raw
# probe seconds only (the quick sf0.01 verify run has no floor).
CALIBRATION_FLOORS = {
    "q6_forecast_revenue": 0.396,
    "q14_promo_revenue": 0.529,
}
CALIBRATION_QUERIES = tuple(CALIBRATION_FLOORS)  # single source of truth
CALIBRATION_FLOOR_SF = 0.1

# Composition-family quiet floors (r14 verdict task #3): the four corpus
# compositions consumed every cross-round adjudication cycle of r12-r14
# (committed records drifting 3.04 -> 3.62 -> 3.84 s on
# pipeline_incremental_tick while two checkout A/Bs concluded
# "overlapping distributions"). These floors end that: a future record's
# delta on any of them is judged against the FLOOR below — the best
# value ever observed on a probe-verified quiet box under
# byte-comparable code — not against whichever prior record was lucky.
# Protocol: reading/floor ≤ ~1.35 is inside the documented single-box
# noise band (the 2026-08-16 sweeps alone spread tick 3.39-4.58 s
# across 9 fresh-JVM invocations bracketed by quiet probes); only a
# sustained reading beyond that band with a quiet calibration stamp
# warrants a code bisect, and the first step remains the byte-diff rule.
# Provenance (sf0.1, local[32]): RE-FLOORED at the r15 optimization
# close (2026-08-17) — r15 changed all four compositions' code (CC
# driver-local solve, single-expr IVF construction, overlapped tick
# fronts, constant-folded tick argmin), so the r12-r14 floors described
# code that no longer ships. Each floor is the min over this round's
# optimized-code observations: two full bench records (probe-bracketed,
# calibration stamps 0.821/1.273 and 0.825/1.399; per-query min-merge
# over 2 passes each — plans/r15/BENCH_final*.json) plus 5 fresh-JVM
# `bench.py --shard <q>` solo invocations per query the same session.
# Pre-r15 floors for the archive: build 0.706, neardup 3.332,
# embdup 4.737, tick 3.04.
COMPOSITION_FLOORS = {
    "pipeline_corpus_build": 0.631,
    "pipeline_corpus_build_neardup": 2.464,
    "pipeline_corpus_build_embdup": 2.596,
    "pipeline_incremental_tick": 1.432,
}


CALIBRATION_NOISY_THRESHOLD = 1.3  # worst-window ratio above this → warn-stamp


def _calibration_stamp(probe_passes: list[dict], sf: object) -> dict:
    """Fold the pre/mid/post-sweep probe timings into the committed stamp.

    ``probe_passes``: per-invocation {name: seconds} dicts (missing
    queries tolerated — a dead probe shard must not kill the record).
    Returns {} when nothing was timed; otherwise stamps per-query minima
    and, at the floor SF, the best-window and worst-window ratios.

    Worst-window evidence counts INCOMPLETE probe invocations too (r14
    ADVICE: a probe window hit so hard one query timed out is exactly
    the burst the stamp exists to capture — dropping it understates the
    noise): every invocation — complete or partial — contributes the
    max of its per-query t/floor ratios (uniform per-query max, r15
    self-review: a Σ-ratio let one quiet probe mask the other's burst),
    and ``calibration_probe_incomplete`` stamps how many invocations
    were missing a probe query so a reader knows the worst
    ratio may rest on partial windows. A record whose worst window
    exceeds ``CALIBRATION_NOISY_THRESHOLD`` is warn-stamped
    (``calibration_warning``) rather than refused — the driver must
    always get its one JSON line — so the committed record is
    self-labeling and the round-close protocol re-runs on a quiet box
    (r14 verdict task #6)."""
    best: dict[str, float] = {}
    for run in probe_passes:
        for n, t in run.items():
            if n in CALIBRATION_FLOORS:
                best[n] = min(best.get(n, float("inf")), t)
    if not best:
        return {}
    stamp: dict = {"calibration_probe_sec": {n: round(t, 3) for n, t in best.items()}}
    if sf == CALIBRATION_FLOOR_SF and set(best) == set(CALIBRATION_FLOORS):
        floor_sum = sum(CALIBRATION_FLOORS.values())
        stamp["calibration_ratio"] = round(sum(best.values()) / floor_sum, 3)
        worst = 0.0
        incomplete = 0
        for run in probe_passes:
            timed = {n: t for n, t in run.items() if n in CALIBRATION_FLOORS}
            if not timed:
                incomplete += 1  # probe shard died entirely: burst evidence
                continue
            if set(timed) != set(CALIBRATION_FLOORS):
                incomplete += 1
            # Per-query max, uniformly, complete windows included (r15
            # self-review): a sum-ratio lets one quiet probe mask the
            # other's burst (q6 at 1.6x + q14 at floor sums to 1.26 —
            # under the warn threshold — while the identical burst in a
            # window where q14 died would have stamped 1.6).
            worst = max(
                worst,
                max(t / CALIBRATION_FLOORS[n] for n, t in timed.items()),
            )
        # best was non-empty and complete, so at least one invocation
        # timed a probe query → worst > 0 here always.
        stamp["calibration_ratio_worst"] = round(worst, 3)
        if incomplete:
            stamp["calibration_probe_incomplete"] = incomplete
        if worst > CALIBRATION_NOISY_THRESHOLD:
            stamp["calibration_warning"] = (
                f"noisy box: worst probe window {round(worst, 3)}x floors "
                f"(threshold {CALIBRATION_NOISY_THRESHOLD}); "
                "cross-round comparisons need a quiet re-run"
            )
    return stamp


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if "--shard" in sys.argv:
        names = sys.argv[sys.argv.index("--shard") + 1 :]
        print(json.dumps(_run_shard(names, sf_dir, stream=True)))
        return

    names = list(HEADLINE)
    shards = [names[i : i + SHARD_SIZE] for i in range(0, len(names), SHARD_SIZE)]
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    cc_rounds: int | None = None
    probe_passes: list[dict] = []

    def _run_probe() -> None:
        probe = list(CALIBRATION_QUERIES)
        p_times, _p_errors, _ = _parse_shard_output(probe, *_invoke_shard(probe))
        probe_passes.append(p_times)

    _run_probe()  # pre-sweep box-health probe
    n_passes = max(1, PASSES)
    for p in range(n_passes):
        for shard in shards:
            s_times, s_errors, s_cc = _parse_shard_output(
                shard, *_invoke_shard(shard)
            )
            _fold_pass(times, errors, s_times, s_errors)
            if s_cc is not None:
                cc_rounds = s_cc
        if p < n_passes - 1:
            _run_probe()  # mid-sweep: a burst confined between the outer
            # probes (starts after pre, ends before post) still shows
    _run_probe()  # post-sweep probe
    # A later pass's success clears an earlier pass's failure (and the
    # reverse): only queries with no timing from ANY pass report an error.
    errors = {n: msg for n, msg in errors.items() if n not in times}

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "headline_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        payload["errors"] = errors
    # Iterative-operator observability: rounds-to-convergence is the cost
    # driver of the components query; surface it next to its time
    # (snapshotted right after dedup_cluster_components ran, so the
    # attribution survives other connected_components callers).
    if cc_rounds is not None:
        payload["cc_rounds"] = cc_rounds
    payload.update(_box_stamp())
    payload.update(_calibration_stamp(probe_passes, payload["sf"]))
    if payload["sf"] == CALIBRATION_FLOOR_SF:
        # Self-adjudicating composition readings: each benched
        # composition-family query stamps its reading/floor ratio so a
        # cross-round delta is read against the recorded floor, not the
        # previous (possibly lucky) record.
        ratios = {
            n: round(times[n] / f, 2)
            for n, f in COMPOSITION_FLOORS.items()
            if n in times and f > 0
        }
        if ratios:
            payload["composition_floor_ratio"] = ratios
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
