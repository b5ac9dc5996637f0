#!/usr/bin/env python
"""Bounded-split recall at the NEAR-DUP operating point (r9 verdict
quality note #1): the r9 measurement covered only the fixture's natural
cos 0.3-0.6 band, but the number embedding dedup actually depends on is
per-pair recall at s >= 0.85. The shipped fixtures have no pairs there,
so PLANT them: take the sf0.1 embeddings (2,000 vectors, cells 182-218
-> split depth 4 at cap 16, exactly dedup_embedding_multiprobe's
operating point), hash-decorrelate them (same construction as
tools/ivf_recall.py), then add >=200 deterministic perturbed partners
whose exact cosine to their base spans 0.85-0.99. Ground truth is
brute-force same-cell cosine >= 0.85 on the final corpus; what is
measured is the per-pair recall of

  - single probe: both members land in the same (cell, subkey) under
    the production ``bounded_cell_keys`` (cap 16), and
  - multi probe:  subkeys within hamming distance 1 (the
    ``multiprobe_keys`` hamming-1 union joins exactly these),

against the closed forms p^d and p^d + d p^(d-1)(1-p) with
p = 1 - arccos(s)/pi evaluated per pair (not at a band midpoint).

Usage: python tools/multiprobe_recall.py [--update-md]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.operators.similarity import (
    as_double,
    bounded_cell_keys,
    cosine,
)
from tbench_agentic_data_pipeline_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
CAP = 16  # dedup_embedding_multiprobe's in-query cap -> depth 4 here
TAU = 0.85  # the near-dup regime the r9 verdict asked to measure
MIN_PLANTED = 200
START, END = "<!-- AUTOGEN:MULTIPROBE_RECALL -->", "<!-- /AUTOGEN:MULTIPROBE_RECALL -->"

# Perturbation mix weights, CALIBRATED on this fixture (probe run: the
# per-weight exact-cos medians are 0.87 / 0.91 / 0.95 / 0.98), spanning
# the >=0.85 near-dup band; the handful of mix-1.0 draws that land
# below tau simply drop out of the ground-truth set.
MIX = (1.0, 0.8, 0.55, 0.3)


def _hash_noise(id_col, seed: int, amp: float):
    """Deterministic zero-mean +-amp per-(id, dim, seed) draw — the
    ivf_recall decorrelation construction (pmod, not %, for zero mean)."""
    return lambda x, i: x + F.lit(amp) * (
        (F.pmod(F.xxhash64(id_col, i, F.lit(seed)), F.lit(2001)) - 1000) / 1000.0
    )


def main() -> None:
    update_md = "--update-md" in sys.argv
    spark = get_session("multiprobe-recall")

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    rms = (
        emb.select(F.explode("emb").alias("x"))
        .agg(F.sqrt(F.avg(F.col("x") * F.col("x"))))
        .collect()[0][0]
    )
    amp = 0.5 * float(rms)
    base = emb.select(
        "vec_id",
        "label",
        F.transform("emb", _hash_noise(F.col("vec_id"), 0, amp)).alias("emb"),
    )

    # Planted partners: every 8th vec_id (250 of 2,000) gets a perturbed
    # twin with the SAME label (the pair join is within-cell by
    # construction); the mix weight cycles so exact cosines spread over
    # the whole >=0.85 band instead of clumping at one value. Partner
    # noise is seeded differently from the decorrelation draw; ground
    # truth recomputes exact cosine from the final vectors, so the
    # weights only need to SPAN the band (see MIX calibration note).
    mix = F.element_at(
        F.array(*[F.lit(c) for c in MIX]),
        (F.col("vec_id") / 8 % len(MIX)).cast("int") + 1,
    )
    partners = (
        base.where(F.col("vec_id") % 8 == 0)
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            "label",
            F.transform(
                "emb",
                lambda x, i: x
                + mix
                * F.lit(2.0 * amp)
                * ((F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(7)), F.lit(2001)) - 1000) / 1000.0),
            ).alias("emb"),
        )
    )
    corpus = base.unionByName(partners)
    keyed = bounded_cell_keys(
        corpus, "label", "emb", max_cell=CAP, depth_col="depth"
    ).select("vec_id", "label", "emb", "subkey", "depth")
    keyed.persist().count()

    # Ground truth: ALL same-cell pairs at exact cos >= TAU (planted +
    # incidental), with per-pair probe outcomes read straight off the
    # production subkeys: equality = single-probe hit, hamming<=1 =
    # multi-probe hit (multiprobe_keys joins exactly hamming<=1).
    a = keyed.select(
        "label",
        F.col("vec_id").alias("va"),
        F.col("emb").alias("ea"),
        F.col("subkey").alias("ka"),
        F.col("depth").alias("da"),
    )
    b = keyed.select(
        "label",
        F.col("vec_id").alias("vb"),
        F.col("emb").alias("eb"),
        F.col("subkey").alias("kb"),
    )
    pairs = (
        a.join(b, "label")
        .where(F.col("va") < F.col("vb"))
        .withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("cos") >= TAU)
        .select(
            "va",
            "vb",
            "cos",
            "da",
            (F.col("ka") == F.col("kb")).alias("single"),
            (F.bit_count(F.col("ka").bitwiseXOR(F.col("kb"))) <= 1).alias("multi"),
            (F.col("vb") >= 1_000_000).alias("planted"),
        )
    )
    p = 1 - F.acos(F.least(F.col("cos"), F.lit(1.0))) / math.pi
    d = F.col("da").cast("double")
    pred_single = F.pow(p, d)
    pred_multi = F.pow(p, d) + d * F.pow(p, d - 1) * (1 - p)
    band = F.when(F.col("cos") < 0.90, "0.85-0.90").otherwise(
        F.when(F.col("cos") < 0.95, "0.90-0.95").otherwise("0.95-1.00")
    )
    rows = (
        pairs.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("planted").cast("int")).alias("n_planted"),
            F.avg("da").alias("depth"),
            F.avg(F.col("single").cast("double")).alias("rec_single"),
            F.avg(F.col("multi").cast("double")).alias("rec_multi"),
            F.avg(pred_single).alias("pred_single"),
            F.avg(pred_multi).alias("pred_multi"),
        )
        .orderBy("band")
        .collect()
    )
    total = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("planted").cast("int")).alias("n_planted"),
        F.avg("da").alias("depth"),
        F.avg(F.col("single").cast("double")).alias("rec_single"),
        F.avg(F.col("multi").cast("double")).alias("rec_multi"),
        F.avg(pred_single).alias("pred_single"),
        F.avg(pred_multi).alias("pred_multi"),
    ).collect()[0]

    assert total["n_planted"] >= MIN_PLANTED, (
        f"only {total['n_planted']} planted pairs landed >= {TAU} — "
        "perturbation weights drifted off the band"
    )

    def fmt(r, name):
        return (
            f"| {name} | {r['n']} | {r['depth']:.1f} "
            f"| {r['rec_single']:.3f} | {r['pred_single']:.3f} "
            f"| {r['rec_multi']:.3f} | {r['pred_multi']:.3f} |"
        )

    lines = [
        "| cos band | pairs | depth | single | predicted | multi (hamming-1) | predicted |",
        "|---|---|---|---|---|---|---|",
        *[fmt(r, r["band"]) for r in rows],
        fmt(total, f"all >= {TAU}"),
    ]
    table = (
        f"sf0.1 embeddings (2,000 vectors, hash-decorrelated) + "
        f"{total['n_planted']} planted perturbed twins, cap {CAP} -> split "
        f"depth 4 in every cell (`bounded_cell_keys`, the "
        f"`dedup_embedding_multiprobe` operating point); ground truth = "
        f"brute-force same-cell pairs at exact cos >= {TAU}; predictions "
        f"are the closed forms p^d and p^d + d*p^(d-1)*(1-p) averaged "
        f"per pair.\n\n" + "\n".join(lines)
    )
    print(table)
    print(json.dumps({"rows": [r.asDict() for r in rows], "total": total.asDict()}))

    if update_md:
        md_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
        )
        with open(md_path) as f:
            md = f.read()
        block = f"{START}\n{table}\n{END}"
        if START in md:
            pre = md[: md.index(START)]
            post = md[md.index(END) + len(END):]
            md = pre + block + post
        else:
            raise SystemExit("no AUTOGEN:MULTIPROBE_RECALL block in SCALING.md")
        with open(md_path, "w") as f:
            f.write(md)
        print("SCALING.md updated", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
