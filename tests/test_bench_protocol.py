"""The bench/measurement-tool protocol contracts: shard crash-salvage
parsing (r8 ADVICE: a dead shard subprocess used to discard its
completed timings and stamp every shard-mate with the same error),
pass-fold semantics shared by bench.py and tools/strong_scaling.py, and
the hung-shard group-kill path (which spawns REAL bash subprocesses —
everything else here is pure parsing, no Spark session)."""

from __future__ import annotations

import json
import shlex

from bench import _parse_shard_output


SHARD = ["q_a", "q_b", "q_c", "q_d"]


def _lines(*objs):
    return "\n".join(json.dumps(o) for o in objs)


def test_summary_line_wins_when_present():
    out = _lines(
        {"start": "q_a"},
        {"q": "q_a", "t": 1.5},
        {"start": "q_b"},
        {"q": "q_b", "err": "Boom"},
        {"times": {"q_a": 1.5}, "errors": {"q_b": "Boom"}, "cc_rounds": 4},
    )
    times, errors, cc = _parse_shard_output(SHARD, out, "", 0)
    assert times == {"q_a": 1.5}
    assert errors == {"q_b": "Boom"}
    assert cc == 4


def test_dead_shard_salvages_completed_and_blames_the_runner():
    # process died (no summary) while q_c was running: q_a keeps its
    # timing, q_b keeps its own error, q_c gets the crash, q_d is
    # marked not-run — nobody inherits q_c's failure.
    out = _lines(
        {"start": "q_a"},
        {"q": "q_a", "t": 0.8},
        {"start": "q_b"},
        {"q": "q_b", "err": "AnalysisException: x"},
        {"start": "q_c"},
    )
    times, errors, cc = _parse_shard_output(SHARD, out, "java OOM", 137)
    assert times == {"q_a": 0.8}
    assert errors["q_b"] == "AnalysisException: x"
    assert "died running this query" in errors["q_c"]
    assert "rc=137" in errors["q_c"] and "java OOM" in errors["q_c"]
    assert errors["q_d"] == "not run: shard died during q_c (rc=137)"
    assert cc is None


def test_dead_shard_before_any_query_blames_startup():
    times, errors, _ = _parse_shard_output(SHARD, "", "sigkill", 9)
    assert times == {}
    assert all("session startup" in errors[n] for n in SHARD)


def test_noise_lines_are_ignored():
    out = "\n".join(
        ["py4j noise", "42", '"str"', json.dumps({"q": "q_a", "t": 2.0})]
    )
    times, errors, _ = _parse_shard_output(SHARD[:1], out, "", 1)
    assert times == {"q_a": 2.0}
    assert errors == {}


def test_warmup_and_curve_names_exist_in_registry():
    """A renamed query must not silently disable the shard warmers
    (bench._invoke_shard skips unknown names without error) or drop a
    scale-curve row: every name in bench._WARMUP, bench.HEADLINE, and
    tools/scaling_curve.EXTRA_CURVE must resolve to a registry entry or
    a bench extra."""
    import importlib.util
    import os
    import sys

    from bench import HEADLINE, _WARMUP, _extra_queries
    from tbench_agentic_data_pipeline_spark import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "scaling_curve_for_test", os.path.join(repo, "tools", "scaling_curve.py")
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)

    known = set(registry.collect()) | set(_extra_queries())
    for group, names in (
        ("_WARMUP", _WARMUP),
        ("HEADLINE", HEADLINE),
        ("EXTRA_CURVE", sc.EXTRA_CURVE),
    ):
        unknown = [n for n in names if n not in known]
        assert not unknown, f"{group} references unregistered queries: {unknown}"


def test_two_pass_min_merge_and_error_clearing():
    """r10 verdict task #2: the committed record is the per-query MINIMUM
    across full sweep passes, a query timed by ANY pass is never
    reported as an error, and only all-pass failures keep their error.
    (The end-of-main filter `errors = {n: m for ... if n not in times}`
    is replayed here exactly.)"""
    from bench import _fold_pass

    times: dict = {}
    errors: dict = {}
    # pass 1: q_a fast, q_b slow (neighbor burst), q_c fails
    _fold_pass(times, errors, {"q_a": 1.0, "q_b": 9.9}, {"q_c": "OOM"})
    # pass 2: q_a slower, q_b quiet, q_c still failing, q_d appears
    _fold_pass(
        times, errors, {"q_a": 1.4, "q_b": 1.1, "q_d": 0.5}, {"q_c": "OOM2"}
    )
    errors = {n: m for n, m in errors.items() if n not in times}
    assert times == {"q_a": 1.0, "q_b": 1.1, "q_d": 0.5}
    assert errors == {"q_c": "OOM2"}

    # a query that failed pass 1 but succeeded pass 2 ends up timed-only
    times2, errors2 = {}, {}
    _fold_pass(times2, errors2, {}, {"q_e": "transient"})
    _fold_pass(times2, errors2, {"q_e": 2.0}, {})
    errors2 = {n: m for n, m in errors2.items() if n not in times2}
    assert times2 == {"q_e": 2.0} and errors2 == {}

    # r11 review: a genuinely attributed pass-1 failure must survive a
    # pass-2 infrastructure placeholder — and the reverse upgrade holds
    times3, errors3 = {}, {}
    _fold_pass(times3, errors3, {}, {"q_f": "OutOfMemoryError: heap"})
    _fold_pass(
        times3, errors3,
        {}, {"q_f": "not run: shard died during session startup (rc=1)"},
    )
    assert errors3["q_f"] == "OutOfMemoryError: heap"
    times4, errors4 = {}, {}
    _fold_pass(times4, errors4, {}, {"q_g": "not run: shard died during session startup (rc=1)"})
    _fold_pass(times4, errors4, {}, {"q_g": "OutOfMemoryError: heap"})
    assert errors4["q_g"] == "OutOfMemoryError: heap"


def test_dead_shard_between_queries_blames_no_finished_query():
    """r9 ADVICE: a crash AFTER a query's result line (cc_rounds
    snapshot, summary printing) must not blame the finished query —
    its timing is salvaged AND the not-run attribution says the death
    was between queries, not during one."""
    out = _lines(
        {"start": "q_a"},
        {"q": "q_a", "t": 0.8},
        {"start": "q_b"},
        {"q": "q_b", "t": 1.2},
    )
    times, errors, _ = _parse_shard_output(SHARD, out, "killed", 137)
    assert times == {"q_a": 0.8, "q_b": 1.2}
    assert errors["q_c"] == errors["q_d"] == (
        "not run: shard died between queries/session teardown (rc=137)"
    )


def test_payload_carries_loadavg_stamp():
    """r11 verdict task #7: the committed bench record must be
    self-diagnosing against box noise — main() merges _box_stamp() into
    the payload, and on this platform the stamp must be the 1/5/15-min
    load averages: three non-negative JSON-serializable floats (absent
    only where os.getloadavg is unavailable, which this box is not)."""
    from bench import _box_stamp

    stamp = _box_stamp()
    assert "loadavg" in stamp
    load = json.loads(json.dumps(stamp))["loadavg"]
    assert len(load) == 3 and all(
        isinstance(x, (int, float)) and x >= 0 for x in load
    )


def test_calibration_stamp_ratio_and_probe_minima():
    """r13 verdict task #3: environmental inflation must be a number in
    the committed JSON, not a prose adjudication. At the floor SF with
    both probes timed, the stamp carries calibration_ratio =
    Σ min(probe passes) / Σ floors and the per-query probe minima; at
    any other SF only raw probe seconds are stamped (no floor to
    compare); a fully dead probe stamps nothing (and must not kill the
    record)."""
    from bench import (
        CALIBRATION_FLOOR_SF,
        CALIBRATION_FLOORS,
        CALIBRATION_QUERIES,
        _calibration_stamp,
    )

    q6, q14 = CALIBRATION_QUERIES
    assert CALIBRATION_QUERIES == tuple(CALIBRATION_FLOORS)  # one truth
    # pre-sweep pass slow, post-sweep pass at floor: min wins per query,
    # and the slow window is preserved in the WORST ratio (the mid-sweep
    # burst evidence — r14 self-review)
    passes = [
        {q6: CALIBRATION_FLOORS[q6] * 2.0, q14: CALIBRATION_FLOORS[q14] * 2.0},
        {q6: CALIBRATION_FLOORS[q6], q14: CALIBRATION_FLOORS[q14]},
    ]
    stamp = _calibration_stamp(passes, CALIBRATION_FLOOR_SF)
    assert stamp["calibration_ratio"] == 1.0
    assert stamp["calibration_ratio_worst"] == 2.0
    assert stamp["calibration_probe_sec"] == {
        n: round(t, 3) for n, t in CALIBRATION_FLOORS.items()
    }
    # a 1.5x-inflated box reads as 1.5 on both ratios
    inflated = [{n: t * 1.5 for n, t in CALIBRATION_FLOORS.items()}]
    st2 = _calibration_stamp(inflated, CALIBRATION_FLOOR_SF)
    assert st2["calibration_ratio"] == 1.5
    assert st2["calibration_ratio_worst"] == 1.5
    # an incomplete invocation (probe shard died mid-run) still counts
    # as worst-window evidence via its per-query ratio (r14 ADVICE: the
    # hardest-hit window is exactly the burst the stamp must capture),
    # and the record is labeled with how many windows were partial
    mixed = passes + [{q6: CALIBRATION_FLOORS[q6] * 9.0}]
    st3 = _calibration_stamp(mixed, CALIBRATION_FLOOR_SF)
    assert st3["calibration_ratio"] == 1.0
    assert st3["calibration_ratio_worst"] == 9.0
    assert st3["calibration_probe_incomplete"] == 1
    # 9x floors is past the noisy threshold → warn-stamp, never refusal
    # (the driver must always get its one JSON line); the 2x-burst
    # window in `passes` also trips it (r14 verdict task #6)
    assert "noisy box" in st3["calibration_warning"]
    assert "noisy box" in stamp["calibration_warning"]
    # r15 self-review: a single-query burst in a COMPLETE window must
    # not hide behind the other probe's quiet reading (the old Σ-ratio
    # read 1.6x-q6 + floor-q14 as 1.26 — under the warn threshold)
    one_burst = [
        {q6: CALIBRATION_FLOORS[q6] * 1.6, q14: CALIBRATION_FLOORS[q14]}
    ]
    st5 = _calibration_stamp(one_burst, CALIBRATION_FLOOR_SF)
    assert st5["calibration_ratio_worst"] == 1.6
    assert "noisy box" in st5["calibration_warning"]
    assert "calibration_probe_incomplete" not in st5
    # quiet complete windows: no incomplete count, no warning
    quiet = [dict(CALIBRATION_FLOORS), dict(CALIBRATION_FLOORS)]
    st_q = _calibration_stamp(quiet, CALIBRATION_FLOOR_SF)
    assert st_q["calibration_ratio_worst"] == 1.0
    assert "calibration_probe_incomplete" not in st_q
    assert "calibration_warning" not in st_q
    # an entirely dead invocation among live ones counts as incomplete
    st4 = _calibration_stamp(passes + [{}], CALIBRATION_FLOOR_SF)
    assert st4["calibration_probe_incomplete"] == 1
    assert st4["calibration_ratio_worst"] == 2.0
    # off-floor SF: probe seconds only, never a ratio
    off = _calibration_stamp(passes, 0.01)
    assert "calibration_ratio" not in off and "calibration_probe_sec" in off
    # one probe missing from every pass: no ratio (partial sum would lie)
    partial = _calibration_stamp([{q6: 0.4}], CALIBRATION_FLOOR_SF)
    assert "calibration_ratio" not in partial
    # dead probe shards: empty stamp, record survives
    assert _calibration_stamp([{}, {}], CALIBRATION_FLOOR_SF) == {}
    # the committed record must be round-trippable JSON
    json.loads(json.dumps(stamp))


def test_calibration_probes_exist_in_registry_and_not_headline():
    """The probes must be real registered queries (the shard path runs
    them by name) and byte-stable anchors OUTSIDE the headline sweep —
    inside it their timings would churn with every headline protocol
    change."""
    from bench import CALIBRATION_QUERIES, HEADLINE
    from tbench_agentic_data_pipeline_spark import registry

    reg = registry.collect()
    for name in CALIBRATION_QUERIES:
        assert name in reg, name
        assert name not in HEADLINE, name


def test_hung_shard_is_killed_and_salvaged(monkeypatch):
    """r12 review + r12 ADVICE (bench.py:345): a hung query must surface
    as an attributed error at SHARD_TIMEOUT_S — with everything the
    shard printed before the kill salvaged — instead of wedging the
    sweep. This drives the REAL kill path (no subprocess mocks): the
    fake shard prints partial output, then a GRANDCHILD inheriting the
    stdout pipe out-sleeps the timeout, exactly the PySpark-JVM shape
    that wedges a child-only kill in communicate(). Only a process-group
    kill passes the elapsed-time bound."""
    import subprocess
    import time as _time

    import bench

    partial = _lines(
        {"start": "q_a"},
        {"q": "q_a", "t": 0.9},
        {"start": "q_b"},
    )
    script = (
        f"printf %s {shlex.quote(partial)}\n"
        "sleep 600 &\n"  # pipe-holding grandchild (the JVM analog)
        "sleep 600\n"
    )

    real_popen = subprocess.Popen

    def fake_popen(cmd, **kw):
        assert kw.get("start_new_session") is True, (
            "shard must run in its own process group so the timeout "
            "path can killpg the JVM grandchild"
        )
        assert cmd[1].endswith("bench.py") and cmd[2] == "--shard"
        return real_popen(["bash", "-c", script], **kw)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setattr(bench, "SHARD_TIMEOUT_S", 2)
    t0 = _time.monotonic()
    out, err, rc = bench._invoke_shard(["q_a", "q_b", "q_c"])
    elapsed = _time.monotonic() - t0
    assert elapsed < 30, (
        f"kill+drain took {elapsed:.0f}s — the grandchild's pipe was "
        "not released, i.e. the group kill did not happen"
    )
    assert rc == -1 and "timeout" in err
    times, errors, _ = _parse_shard_output(["q_a", "q_b", "q_c"], out, err, rc)
    assert times == {"q_a": 0.9}
    assert "died running this query" in errors["q_b"] and "timeout" in errors["q_b"]
    assert errors["q_c"].startswith("not run")
def test_strong_scaling_fold_is_cross_pass_minimum(monkeypatch):
    """r12 verdict task #2: the strong-scaling sweep min-merges full
    passes like the headline bench — per (thread, query) cell minimum
    via bench._fold_pass — so a single neighbor-burst cell (the r11
    embdup 16→32 step, the r12 sim_ivfpq_topk 0.62× cell) can no longer
    reach the committed AUTOGEN table."""
    import importlib.util
    import os

    # assert the DEFAULT protocol, not whatever a quick single-pass
    # shell exported (the env knob is legitimate; this test is not
    # about it)
    monkeypatch.delenv("SPARK_GRAFT_STRONG_PASSES", raising=False)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "strong_scaling_for_test", os.path.join(repo, "tools", "strong_scaling.py")
    )
    ss = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ss)

    acc: dict = {}
    # pass 1: the @16 cell catches a burst on q_b
    ss.fold_results(acc, {16: {"q_a": 1.0, "q_b": 9.9}, 32: {"q_a": 0.7, "q_b": 2.1}})
    # pass 2: quiet @16, burst moved to @32
    ss.fold_results(acc, {16: {"q_a": 1.1, "q_b": 2.4}, 32: {"q_a": 2.5, "q_b": 2.0}})
    assert acc == {
        16: {"q_a": 1.0, "q_b": 2.4},
        32: {"q_a": 0.7, "q_b": 2.0},
    }
    assert ss.PASSES >= 2  # the protocol default is min-merge, not single-pass


def test_unkillable_writer_still_salvages_buffered_output(monkeypatch):
    """r13 review: if even killpg cannot release the pipe (a D-state
    writer), the bounded drain must keep what communicate() already
    buffered — the completed queries' timings — and close our pipe ends,
    not discard everything. Simulated by neutering os.killpg so the
    grandchild survives, with the drain bound shrunk via the module
    constant."""
    import time as _time

    import bench

    partial = _lines({"start": "q_a"}, {"q": "q_a", "t": 0.9}, {"start": "q_b"})
    script = (
        f"printf %s {shlex.quote(partial)}\n"
        "sleep 600 &\n"
        "sleep 600\n"
    )

    import subprocess

    real_popen = subprocess.Popen
    procs = []

    def fake_popen(cmd, **kw):
        p = real_popen(["bash", "-c", script], **kw)
        procs.append(p)
        return p

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setattr(bench, "SHARD_TIMEOUT_S", 2)
    monkeypatch.setattr(bench, "SHARD_DRAIN_TIMEOUT_S", 1)
    monkeypatch.setattr(bench.os, "killpg", lambda *a: None)
    t0 = _time.monotonic()
    out, err, rc = bench._invoke_shard(["q_a", "q_b"])
    assert _time.monotonic() - t0 < 15
    assert rc == -1 and "timeout" in err
    times, errors, _ = _parse_shard_output(["q_a", "q_b"], out, err, rc)
    assert times == {"q_a": 0.9}  # the buffered partial survived
    assert "died running this query" in errors["q_b"]
    # our pipe ends were released, not leaked
    assert all(p.stdout.closed and p.stderr.closed for p in procs)
    # cleanup: actually kill the surviving group now
    import os as _os
    import signal as _signal

    for p in procs:
        try:
            _os.killpg(p.pid, _signal.SIGKILL)
        except ProcessLookupError:
            pass


def test_composition_floors_reference_registered_queries():
    """r14 verdict task #3: the composition-family quiet floors must
    track real registry entries (a renamed query would silently orphan
    its floor and the adjudication protocol with it), be positive, and
    cover exactly the four queries the r12-r14 adjudication cycles were
    spent on."""
    from bench import COMPOSITION_FLOORS, HEADLINE
    from tbench_agentic_data_pipeline_spark import registry

    names = set(registry.queries())
    assert set(COMPOSITION_FLOORS) == {
        "pipeline_corpus_build",
        "pipeline_corpus_build_neardup",
        "pipeline_corpus_build_embdup",
        "pipeline_incremental_tick",
    }
    assert set(COMPOSITION_FLOORS) <= names
    assert all(v > 0 for v in COMPOSITION_FLOORS.values())
    # the three benched compositions stamp composition_floor_ratio in
    # the committed record; pipeline_corpus_build is registry-only
    assert {
        "pipeline_corpus_build_neardup",
        "pipeline_corpus_build_embdup",
        "pipeline_incremental_tick",
    } <= set(HEADLINE)


def test_calibration_ratio_never_exceeds_worst_property():
    """Invariant of the r15 uniform per-query worst metric: the best-
    window ratio (Σ per-query minima / Σ floors — a floor-weighted
    average of per-query minima ratios) can never exceed the worst-
    window ratio (max per-query t/floor over all windows), for ANY
    probe history including partial and dead windows. A violation would
    mean the stamp's two numbers can cross and the 'quiet floor vs
    burst' reading becomes incoherent."""
    from hypothesis import given, strategies as st

    from bench import (
        CALIBRATION_FLOOR_SF,
        CALIBRATION_FLOORS,
        _calibration_stamp,
    )

    names = sorted(CALIBRATION_FLOORS)
    window = st.dictionaries(
        st.sampled_from(names),
        st.floats(min_value=0.01, max_value=100.0,
                  allow_nan=False, allow_infinity=False),
        max_size=len(names),
    )

    @given(st.lists(window, min_size=1, max_size=6))
    def check(passes):
        stamp = _calibration_stamp(passes, CALIBRATION_FLOOR_SF)
        if "calibration_ratio" in stamp:
            assert (
                stamp["calibration_ratio"]
                <= stamp["calibration_ratio_worst"] + 1e-9
            ), stamp

    check()
