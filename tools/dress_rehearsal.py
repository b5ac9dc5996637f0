"""Dress-rehearse the external driver's exact correctness path.

The driver imports __spark_entry__ with its OWN plain SparkSession (no
engine configs) and runs the first 50 queries() entries at sf0.01. This
tool reproduces that environment verbatim — vanilla local[4] session,
window prefix only, full collect per query — and reports failures and
anything slower than the --slow threshold. Run it before round close:
it has caught vanilla-session-only issues (nanos timestamps, eager
write paths) that the engine-session test suite cannot.

Usage: python tools/dress_rehearsal.py [--sf /root/testdata/sf0.01]
                                       [--slow 5.0] [--all]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    slow_s = 5.0
    if "--slow" in sys.argv:
        slow_s = float(sys.argv[sys.argv.index("--slow") + 1])

    from pyspark.sql import SparkSession

    # Deliberately NO shuffle.partitions override: the driver runs a
    # plain session (200 partitions), and partition-count-sensitive
    # misbehavior (tie-breaking that only surfaces in 200-way shuffles,
    # AQE decisions that differ at 8 vs 200) must be caught HERE, not in
    # the real driver window. local[4] only bounds concurrency, which
    # correctness must not depend on.
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = list(qs) if "--all" in sys.argv else list(qs)[:50]
    failures, slow = [], []
    t_all = time.perf_counter()
    for n in names:
        t0 = time.perf_counter()
        try:
            rows = qs[n](spark, sf).collect()
            el = time.perf_counter() - t0
            if el > slow_s:
                slow.append((n, round(el, 1), len(rows)))
        except Exception as ex:  # noqa: BLE001 — report, keep going
            failures.append((n, f"{type(ex).__name__}: {ex}"[:160]))
            print(f"FAIL {n}: {failures[-1][1]}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 1)
    print(f"{len(names)} queries in {total}s on a vanilla session at {sf}")
    print(f"slow (>{slow_s}s): {slow}")
    print(f"failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
