#!/usr/bin/env python
"""IVF quality loop at scale (VERDICT r4 "Next round" #6): measure
recall@k vs nprobe — and the latency each probe level buys — on the ~sf1
embeddings fixture, searching through a PERSISTED index (fit once,
``save_ivf_index``, then every search loads + broadcasts the saved
centroids: the production lifecycle, not a fit-per-query shortcut).

Ground truth is the exact Arrow GEMM top-k. The assignment step (corpus →
cluster column) is part of INDEX BUILD, so it is materialized before any
timing starts; what is timed is the search half only — the same split a
serving deployment has. Output: an AUTOGEN:IVF_RECALL table in SCALING.md.

Usage: python tools/ivf_recall.py [--update-md]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    load_ivf_index,
    save_ivf_index,
)
from pyspark.sql import Window

from tbench_agentic_data_pipeline_spark.operators.clustering import _l2_sq
from tbench_agentic_data_pipeline_spark.operators.similarity import (
    as_double,
    brute_force_topk_arrow,
    ivf_search_topk,
    ivfpq_search_topk,
    pq_encode_arrow,
    pq_rerank_exact,
    pq_search_topk_arrow,
    recall_at_k,
)
from tbench_agentic_data_pipeline_spark.session import get_session
from tools.scaling_curve import SF_BIG, build_sf1

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INDEX_ROOT = os.path.join(REPO, ".scaling", "ivf_index")
K, N_QUERIES, CELLS, DIM = 10, 100, 32, 64
PQ_M, PQ_K = 8, 16
START, END = "<!-- AUTOGEN:IVF_RECALL -->", "<!-- /AUTOGEN:IVF_RECALL -->"
PQ_START, PQ_END = "<!-- AUTOGEN:PQ_RECALL -->", "<!-- /AUTOGEN:PQ_RECALL -->"
IVFPQ_START, IVFPQ_END = (
    "<!-- AUTOGEN:IVFPQ_RECALL -->",
    "<!-- /AUTOGEN:IVFPQ_RECALL -->",
)


def main() -> None:
    spark = get_session("ivf-recall")
    if not os.path.isdir(os.path.join(SF_BIG, "embeddings.parquet")):
        print("building ~sf1 fixture...", file=sys.stderr)
        build_sf1(spark)

    emb = load_table(spark, SF_BIG, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    # The ~sf1 fixture keeps vectors VERBATIM across its 10 key-shifted
    # copies — fine for throughput curves, degenerate for recall (every
    # query's top-10 is its 9 identical clones, co-assigned to the same
    # cell: nprobe=1 reads a meaningless 1.000). Decorrelate with
    # deterministic per-(vec_id, dim) hash noise at half the corpus RMS,
    # turning the 20k rows into one genuine corpus; ground truth is
    # recomputed on the same perturbed vectors, so the measurement stays
    # internally consistent.
    rms = emb.select(F.explode("emb").alias("x")).agg(
        F.sqrt(F.avg(F.col("x") * F.col("x")))
    ).collect()[0][0]
    amp = 0.5 * float(rms)
    emb = emb.select(
        "vec_id",
        F.transform(
            "emb",
            # pmod, not %: Spark's % keeps the dividend's sign, which
            # would give half the draws a systematic negative shift and
            # double amplitude instead of zero-mean ±amp
            lambda x, i: x
            + F.lit(amp)
            * ((F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2001)) - 1000) / 1000.0),
        ).alias("emb"),
    )
    n = emb.count()

    # ---- index build (not timed per-search): fit, persist, load ----------
    print(f"fitting {CELLS}-cell quantizer over {n} vectors...", file=sys.stderr)
    version = save_ivf_index(
        kmeans_fit(emb, "vec_id", "emb", k=CELLS, dim=DIM, iters=3), INDEX_ROOT
    )
    cents = load_ivf_index(spark, INDEX_ROOT, version=version)
    assigned = assign_clusters(emb, "vec_id", "emb", cents).select(
        "vec_id", "emb", "cluster"
    )
    assigned.persist().count()  # materialize: assignment is index build

    queries = emb.limit(N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )

    # ---- exact baseline: ground truth AND the latency to beat ------------
    t0 = time.perf_counter()
    exact = brute_force_topk_arrow(emb, queries, K)
    exact.persist().count()
    t_exact = round(time.perf_counter() - t0, 3)

    rows = []
    for nprobe in (1, 2, 4, 8, 16, CELLS):
        t0 = time.perf_counter()
        res = ivf_search_topk(assigned, queries, cents, K, nprobe=nprobe)
        res.write.format("noop").mode("overwrite").save()
        t = round(time.perf_counter() - t0, 3)
        rec = round(recall_at_k(res, exact, K), 3)
        rows.append(
            {
                "nprobe": nprobe,
                "scanned_pct": round(100.0 * nprobe / CELLS, 1),
                "recall": rec,
                "sec": t,
            }
        )
        print(f"nprobe={nprobe}: recall@{K}={rec} in {t}s", file=sys.stderr)

    lines = [
        f"| nprobe (of {CELLS} cells) | corpus scanned | recall@{K} | search (s) |",
        "|---|---|---|---|",
        *[
            f"| {r['nprobe']} | {r['scanned_pct']}% | {r['recall']:.3f} | {r['sec']:.2f} |"
            for r in rows
        ],
        f"| exact GEMM baseline | 100% | 1.000 | {t_exact:.2f} |",
    ]
    table = (
        f"{n} vectors (~sf1, hash-decorrelated — the raw fixture clones "
        f"vectors verbatim across copies, which degenerates recall), "
        f"{N_QUERIES} queries, k={K}, index v{version} persisted + "
        f"reloaded via `save_ivf_index`/`load_ivf_index`; assignment "
        f"materialized before timing (index build, not search).\n\n"
        + "\n".join(lines)
    )
    print(table)
    print(json.dumps({"rows": rows, "exact_sec": t_exact, "n": n}))

    # ---- PQ/ADC: recall vs candidate width (the rerank knob) -------------
    # Same decorrelated corpus, same queries, same exact ground truth.
    # Encoding is index build (materialized before timing); what is
    # timed is ADC search + (for N > k) the exact re-rank join.
    print(f"encoding {n} vectors to {PQ_M}-byte PQ codes...", file=sys.stderr)
    codes = pq_encode_arrow(emb, PQ_M, PQ_K, DIM)
    codes.persist().count()
    pq_rows = []
    for ncand in (K, 50, 200, 1000):
        t0 = time.perf_counter()
        cands = pq_search_topk_arrow(
            codes, queries, ncand, PQ_M, PQ_K, DIM, max_queries=N_QUERIES
        )
        res = (
            cands if ncand == K
            else pq_rerank_exact(cands, emb, queries, K)
        )
        res.write.format("noop").mode("overwrite").save()
        t = round(time.perf_counter() - t0, 3)
        rec = round(recall_at_k(res, exact, K), 3)
        pq_rows.append({"n_cand": ncand, "recall": rec, "sec": t})
        stage = "ADC only" if ncand == K else "ADC + exact re-rank"
        print(f"N={ncand} ({stage}): recall@{K}={rec} in {t}s", file=sys.stderr)
    pq_lines = [
        f"| ADC candidates N | stage | recall@{K} | search (s) |",
        "|---|---|---|---|",
        *[
            f"| {r['n_cand']} | {'ADC only' if r['n_cand'] == K else 'ADC + exact re-rank'} "
            f"| {r['recall']:.3f} | {r['sec']:.2f} |"
            for r in pq_rows
        ],
        f"| exact GEMM baseline | full float32 scan | 1.000 | {t_exact:.2f} |",
    ]
    pq_table = (
        f"Same corpus/queries/ground-truth as the IVF table; m={PQ_M} "
        f"subspaces x {PQ_K} md5-deterministic codewords (one byte per "
        f"subspace — the untrained-codebook floor; k-means codebooks "
        f"raise the ADC-only row). Encoding materialized before timing "
        f"(index build); N is the two-stage pipeline's recall knob.\n\n"
        + "\n".join(pq_lines)
    )
    print(pq_table)
    print(json.dumps({"pq_rows": pq_rows}))

    # ---- IVF+PQ composed: cell-pruned ADC + exact re-rank -----------------
    # Same corpus/queries/ground-truth. The codes table carries its cell
    # id through the encode (carry_cols) — cell-searchable as written;
    # both the cell assignment and the encode are index build
    # (materialized before timing). Timed per nprobe: centroid probe
    # selection + ADC over the probed cells' codes (N=200 candidates) +
    # the exact re-rank join — the full composed search path.
    print("encoding with cell ids for IVFPQ...", file=sys.stderr)
    codes_cells = pq_encode_arrow(
        assigned, PQ_M, PQ_K, DIM, carry_cols=("cluster",)
    )
    codes_cells.persist().count()
    N_CAND = 200
    ivfpq_rows = []
    for nprobe in (1, 2, 4, 8, 16, CELLS):
        t0 = time.perf_counter()
        probed = (
            queries.crossJoin(
                F.broadcast(
                    cents.select(
                        F.col("cluster").alias("__pc"),
                        F.col("centroid").alias("__pcv"),
                    )
                )
            )
            .select(
                "q_id",
                "q_emb",
                "__pc",
                _l2_sq(F.col("q_emb"), F.col("__pcv")).alias("__pd"),
            )
            .withColumn(
                "__pr",
                F.row_number().over(
                    Window.partitionBy("q_id").orderBy("__pd", "__pc")
                ),
            )
            .where(F.col("__pr") <= nprobe)
            .groupBy("q_id")
            .agg(
                F.first("q_emb").alias("q_emb"),
                F.collect_list("__pc").alias("probe_cells"),
            )
        )
        cands = ivfpq_search_topk(
            codes_cells, probed, N_CAND, PQ_M, PQ_K, DIM,
            cell_col="cluster", max_queries=N_QUERIES,
        )
        res = pq_rerank_exact(cands, emb, queries, K)
        res.write.format("noop").mode("overwrite").save()
        t = round(time.perf_counter() - t0, 3)
        rec = round(recall_at_k(res, exact, K), 3)
        ivfpq_rows.append(
            {
                "nprobe": nprobe,
                "scanned_pct": round(100.0 * nprobe / CELLS, 1),
                "recall": rec,
                "sec": t,
            }
        )
        print(
            f"IVFPQ nprobe={nprobe}: recall@{K}={rec} in {t}s",
            file=sys.stderr,
        )
    ivfpq_lines = [
        f"| nprobe (of {CELLS} cells) | codes scanned | recall@{K} | search (s) |",
        "|---|---|---|---|",
        *[
            f"| {r['nprobe']} | {r['scanned_pct']}% | {r['recall']:.3f} | {r['sec']:.2f} |"
            for r in ivfpq_rows
        ],
        f"| exact GEMM baseline | 100% float32 | 1.000 | {t_exact:.2f} |",
    ]
    ivfpq_table = (
        f"Composed IVF+PQ (`ivfpq_search_topk`): probe nprobe cells by "
        f"centroid distance, ADC-scan only those cells' m-byte codes "
        f"(N={N_CAND} candidates), exact re-rank to top-{K}. Cell ids "
        f"ride the encode via `carry_cols`; recall is capped by the "
        f"md5-codebook ADC stage (the PQ table's N={N_CAND} row) and "
        f"approaches it as nprobe grows; the nprobe={CELLS} row IS "
        f"full-scan PQ+re-rank, so the gap to it prices each probe "
        f"level's IO savings.\n\n" + "\n".join(ivfpq_lines)
    )
    print(ivfpq_table)
    print(json.dumps({"ivfpq_rows": ivfpq_rows}))
    if "--update-md" in sys.argv:
        path = os.path.join(REPO, "SCALING.md")
        text = open(path).read()
        block = f"{START}\n{table}\n{END}"
        if START in text:
            text = text.split(START)[0] + block + text.split(END)[1]
        else:
            text += "\n" + block + "\n"
        pq_block = f"{PQ_START}\n{pq_table}\n{PQ_END}"
        if PQ_START in text:
            text = text.split(PQ_START)[0] + pq_block + text.split(PQ_END)[1]
        else:
            text += "\n" + pq_block + "\n"
        ivfpq_block = f"{IVFPQ_START}\n{ivfpq_table}\n{IVFPQ_END}"
        if IVFPQ_START in text:
            text = (
                text.split(IVFPQ_START)[0]
                + ivfpq_block
                + text.split(IVFPQ_END)[1]
            )
        else:
            text += "\n" + ivfpq_block + "\n"
        open(path, "w").write(text)
    spark.stop()


if __name__ == "__main__":
    main()
