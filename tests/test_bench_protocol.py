"""The bench shard protocol's crash-salvage contract (r8 ADVICE: a dead
shard subprocess used to discard its completed timings and stamp every
shard-mate with the same error, hiding which query actually crashed).

Pure parsing tests — no Spark session, no subprocess."""

from __future__ import annotations

import json

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
