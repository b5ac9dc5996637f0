"""Shared plumbing for the measurement tools (r13 review: the worker
spawn/parse block and the SCALING.md AUTOGEN splice were copy-pasted
across tools and had started to drift — one implementation, one set of
semantics)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_worker_json(args: list[str], env: dict, what: str) -> dict:
    """Spawn a worker subprocess and return the LAST JSON-object line of
    its stdout (Spark/log4j noise precedes it). Exits the tool with the
    worker's tail on failure — a measurement with a missing cell must
    not render a table."""
    proc = subprocess.run(args, capture_output=True, text=True, env=env)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(cand, dict):
            return cand
    tail = (proc.stderr or proc.stdout or "").strip()[-400:]
    sys.exit(f"{what} produced no result (rc={proc.returncode}): {tail}")


def splice_autogen(start: str, end: str, table: str, path: str | None = None) -> None:
    """Replace (or append) the ``start``..``end`` AUTOGEN block in
    SCALING.md (or ``path``) with ``table``. A half-corrupted block
    (START present but END missing or before it) exits with a clear
    message instead of an IndexError, leaving the file untouched (r13
    ADVICE)."""
    path = path or os.path.join(REPO, "SCALING.md")
    text = open(path).read()
    block = f"{start}\n{table}\n{end}"
    i = text.find(start)
    if i >= 0:
        j = text.find(end, i)
        if j < 0:
            sys.exit(
                f"{path}: AUTOGEN block corrupted — START marker {start!r} "
                f"present but END marker {end!r} missing or before it; "
                "repair the block by hand, then re-run"
            )
        text = text[:i] + block + text[j + len(end):]
    else:
        text += "\n" + block + "\n"
    open(path, "w").write(text)
