#!/usr/bin/env python
"""Is the neardup pair stage's thread-count-invariance the AQE
coalescer's CHOICE or a serial dependency? (r12 verdict task #5 — the
one open scale argument.)

The r12 stage-floor decomposition attributed `pipeline_corpus_build_
neardup`'s flat 8→32 pair-stage time to AQE coalescing the band
shuffles to a handful of tasks at fixture scale, with "at 100 TB the
shuffle carries volume and spreads" left as an argument. This tool
turns it into a measurement: the SAME pair stage (quality-dedup front →
shingle → minhash bands → LSH candidate pairs, the exact code
`tools/corpus_stage_floor.py` isolates) runs at ~sf1 under

  - default AQE (coalescePartitions shrinks post-shuffle parallelism
    to the fixture's shuffle volume: the quality-dedup window exchange
    lands on ~6 partitions of ≥minPartitionSize, so the downstream
    shingle+minhash compute runs 6-wide regardless of cores), and
  - `spark.sql.adaptive.coalescePartitions.enabled = false` (the
    post-shuffle partition count stays at spark.sql.shuffle.partitions
    — exactly what the coalescer itself would keep once the shuffle
    carries 100 TB-scale volume. NOT minPartitionNum: that conf still
    exists in Spark 4.1 but is deprecated/advisory — with
    parallelismFirst=true the minimum already defaults to
    defaultParallelism, so pinning it to the thread count is a
    behavioral no-op, and the minPartitionSize floor wins at fixture
    shuffle volume regardless [measured: the minPartitionNum variant
    changed nothing]. Disabling the coalescer is the honest pin),

each at 8 and 32 threads (fresh JVM per cell; two full passes,
per-cell min via bench._fold_pass). If the default cells are flat
8→32 while the pinned cells scale, the invariance is the coalescer's
volume heuristic — i.e. the 100 TB spreading behavior is selectable
today with one conf — and NOT a serial dependency in the stage.

Usage: python tools/aqe_spread_check.py [--update-md]
       python tools/aqe_spread_check.py --worker <1=coalescing-off|0=default>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_BIG = os.path.join(REPO, ".scaling", "sf1")
THREADS = (8, 32)
PASSES = 2
REPEATS = 2
START = "<!-- AUTOGEN:AQE_SPREAD -->"
END = "<!-- /AUTOGEN:AQE_SPREAD -->"


def _pair_stage(spark, sf_dir: str) -> float:
    """The neardup pair stage, verbatim from tools/corpus_stage_floor.py
    (same fences the production fn uses); returns its wall seconds."""
    from pyspark.sql import functions as F

    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.corpus import (
        NEARDUP_BANDS,
        NEARDUP_HASH,
        NEARDUP_SHINGLE_W,
        _quality_deduped,
    )
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_band_df,
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    deduped = _quality_deduped(docs).localCheckpoint()

    t0 = time.perf_counter()
    toks = F.split("text", " ")
    shingled = (
        deduped.select("doc_id", toks.alias("w"))
        .where(F.size("w") >= NEARDUP_SHINGLE_W)
        .select(
            "doc_id",
            shingles(F.col("w"), NEARDUP_SHINGLE_W, guard_short=False)
            .alias("sh"),
        )
    )
    with_bands = minhash_band_df(
        shingled, "doc_id", "sh", *NEARDUP_BANDS, hash_fn=NEARDUP_HASH
    )
    (
        lsh_candidate_pairs(with_bands, "doc_id", "bands")
        .select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
        .localCheckpoint()
    )
    return time.perf_counter() - t0


def worker(coalescing_off: bool) -> None:
    from tbench_agentic_data_pipeline_spark.session import get_session

    spark = get_session("aqe-spread")
    if coalescing_off:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
    best = min(_pair_stage(spark, SF_BIG) for _ in range(REPEATS))
    print(json.dumps({"pairs": round(best, 3)}))
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        worker(bool(int(sys.argv[sys.argv.index("--worker") + 1])))
        return
    if not os.path.isdir(os.path.join(SF_BIG, "documents.parquet")):
        sys.exit("~sf1 fixture missing — run tools/scaling_curve.py first")
    from bench import _fold_pass

    from _common import run_worker_json, splice_autogen

    # grid key: (mode, threads) → {"pairs": seconds}
    results: dict[tuple[str, int], dict[str, float]] = {}
    for p in range(PASSES):
        for n in THREADS:
            for mode, minp in (("default", 0), ("nocoalesce", 1)):
                parsed = run_worker_json(
                    [
                        sys.executable, os.path.abspath(__file__),
                        "--worker", str(minp),
                    ],
                    dict(os.environ, SPARK_GRAFT_CPUS=str(n)),
                    f"pass {p + 1} {mode} local[{n}]",
                )
                _fold_pass(
                    results.setdefault((mode, n), {}), {}, parsed, {}
                )
                print(
                    f"pass {p + 1}/{PASSES} {mode} local[{n}]: {parsed} "
                    f"(loadavg {os.getloadavg()[0]:.1f})",
                    file=sys.stderr,
                )

    lines = [
        "| coalescer | local[8] pairs (s) | local[32] pairs (s) "
        "| 8→32 speedup |",
        "|---|---|---|---|",
    ]
    for mode, label in (
        ("default", "default (volume heuristic)"),
        ("nocoalesce", "coalescing OFF (volume-scale shape)"),
    ):
        t8 = results[(mode, 8)]["pairs"]
        t32 = results[(mode, 32)]["pairs"]
        lines.append(
            f"| {label} | {t8:.2f} | {t32:.2f} | {t8 / t32:.2f}× |"
        )
    table = "\n".join(lines)
    print(table)
    if "--update-md" in sys.argv:
        splice_autogen(START, END, table)


if __name__ == "__main__":
    main()
