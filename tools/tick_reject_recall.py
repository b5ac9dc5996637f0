#!/usr/bin/env python
"""Planted-dup recall THROUGH the incremental tick's reject stage
(r12 verdict task #3 — completes the recall story for all three corpus
compositions: neardup 1.000 under the skew cap, embdup 0.939/0.976,
and now the tick).

``pipeline_incremental_tick``'s stage 1 (``corpus.tick_reject_list``,
shared verbatim with the registered query) rejects an arriving batch
doc when its MinHash bands collide with the history index AND exact
token-Jaccard ≥ 0.5 verifies. This tool plants partner docs that
STRADDLE the history/batch split at graded exact Jaccard and measures,
per grade:

  - reject recall: fraction of planted partners with J ≥ 0.5 that the
    shipped stage actually rejects (the verify never drops a true
    ≥ 0.5 pair, so this is the LSH band-candidate recall — 4 bands × 2
    rows over 3-shingles, the S-curve 1-(1-J_sh²)^4);
  - false roll-up: planted partners with J < 0.5 that got rejected.
    ZERO by construction-backed math, not luck: partners are built as
    base ∪ fresh-unique tokens, so for EVERY history doc f,
    |f∩p| ≤ |f∩base| ≤ n and |f∪p| ≥ n+m, hence J(f,p) ≤ n/(n+m) =
    the planted grade < 0.5 — the exact verify cannot pass.

Construction (superset form): partner text = base text + m fresh
globally-unique tokens, m = round(n·(1−J)/J) for n distinct base
tokens — token Jaccard is exactly n/(n+m). Partner doc_id =
1_000_001 + base doc_id (odd → batch side; base even → history side),
grade recoverable from the id, so no side table rides along. The
planted corpus is written as a real sf-dir and the measurement calls
the SAME loader + reject path the registered query runs.

Usage: python tools/tick_reject_recall.py [--update-md] [--sf-dir DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
PARTNER_OFFSET = 1_000_001
EVERY = 16  # every 8th history doc (ids are dense; history = even ids)
J_GRADES = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
START = "<!-- AUTOGEN:TICK_REJECT_RECALL -->"
END = "<!-- /AUTOGEN:TICK_REJECT_RECALL -->"


def _grade_expr(base_id):
    """Planted grade for a base doc id — same cycle used at build and
    measure time (derived from the id, no side table)."""
    return (base_id / EVERY).cast("long") % len(J_GRADES)


def build_planted_sf_dir(spark, sf_dir: str, out_dir: str):
    """Write ``out_dir/documents.parquet`` = the fixture corpus plus one
    graded-Jaccard partner per EVERY-th history doc. Returns the planted
    ground truth as {partner_doc_id: grade_index}."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # Planted partners live at base_id + PARTNER_OFFSET; a fixture whose
    # ids reach the offset would silently alias partners onto real docs,
    # corrupting both the truth map and the recall/false-reject counts
    # (r13 ADVICE) — refuse loudly instead.
    max_id = docs.agg(F.max("doc_id")).first()[0]
    if max_id is None or max_id >= PARTNER_OFFSET:
        sys.exit(
            f"{sf_dir}: max doc_id {max_id} >= PARTNER_OFFSET "
            f"{PARTNER_OFFSET}; planted partner ids would collide with "
            "real docs — raise PARTNER_OFFSET for this fixture"
        )
    grade_j = F.array(*[F.lit(j) for j in J_GRADES])[
        _grade_expr(F.col("doc_id")).cast("int")
    ]
    bases = (
        docs.where(F.col("doc_id") % EVERY == 0)
        .withColumn("n", F.size(F.array_distinct(F.split("text", " "))))
        .where(F.col("n") >= 9)  # m ≥ 1 at the loosest grade
        .withColumn("jt", grade_j)
        .withColumn(
            "m", F.round(F.col("n") * (1 - F.col("jt")) / F.col("jt"))
            .cast("int")
        )
    )
    partners = bases.select(
        (F.col("doc_id") + PARTNER_OFFSET).alias("doc_id"),
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.col("m")),
                    lambda i: F.concat(
                        F.lit("zqx"), F.col("doc_id"), F.lit("t"), i
                    ),
                ),
            ),
        ).alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    planted = docs.unionByName(partners)
    planted.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    truth = {
        r["doc_id"] + PARTNER_OFFSET: int(r["g"])
        for r in bases.select(
            "doc_id", _grade_expr(F.col("doc_id")).alias("g")
        ).collect()
    }
    return truth


def measure(spark, planted_dir: str, truth: dict[int, int]):
    """Run the shipped reject stage over the planted corpus and fold the
    reject list against the planted truth: per grade (planted, rejected,
    recall) plus the false-reject count for sub-threshold grades."""
    from tbench_agentic_data_pipeline_spark.catalog import (
        load_table,
        spread_for_compute,
        table_path,
    )
    from tbench_agentic_data_pipeline_spark.operators.corpus import (
        tick_reject_list,
    )

    docs = spread_for_compute(
        load_table(spark, planted_dir, "documents"),
        "doc_id",
        source_path=table_path(planted_dir, "documents"),
    )
    rejected = {
        r["doc_id"] for r in tick_reject_list(planted_dir, docs).collect()
    }
    per_grade = []
    false_rejects = 0
    for gi, j in enumerate(J_GRADES):
        ids = [d for d, g in truth.items() if g == gi]
        hit = sum(1 for d in ids if d in rejected)
        per_grade.append((j, len(ids), hit))
        if j < 0.5:
            false_rejects += hit
    return per_grade, false_rejects


def main() -> None:
    from tbench_agentic_data_pipeline_spark.session import get_session

    sf_dir = SF_DIR
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    spark = get_session("tick-recall")
    out_dir = tempfile.mkdtemp(prefix="tick_recall_")
    try:
        truth = build_planted_sf_dir(spark, sf_dir, out_dir)
        per_grade, false_rejects = measure(spark, out_dir, truth)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    lines = [
        "| planted exact Jaccard | planted | rejected | reject recall |",
        "|---|---|---|---|",
    ]
    for j, n, hit in per_grade:
        rate = f"{hit / n:.3f}" if n else "—"
        note = " (sub-threshold: any reject is FALSE)" if j < 0.5 else ""
        lines.append(f"| {j:.1f}{note} | {n} | {hit} | {rate} |")
    lines.append(
        f"| **false rejects < 0.5** | — | **{false_rejects}** | — |"
    )
    table = "\n".join(lines)
    print(table)
    if "--update-md" in sys.argv:
        from _common import splice_autogen

        splice_autogen(START, END, table)
    spark.stop()


if __name__ == "__main__":
    main()
