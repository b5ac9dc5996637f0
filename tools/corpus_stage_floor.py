"""Per-stage serial-floor decomposition of the two corpus-build
compositions (r11 verdict task #3): the strong-scaling table shows both
at 16-18% parallel efficiency @32 and `pipeline_corpus_build_embdup`
non-monotonic 16→32 cores — this tool attributes that to STAGES the way
BPE's floor got a breakdown, so "driver round-loop scheduling, not data
volume" is a measured sentence.

For each thread count a FRESH subprocess (own JVM; SPARK_GRAFT_CPUS read
at session build) runs each composition ONCE per repeat, split at its
materialization fences:

  neardup:  front (quality→exact-dedup localCheckpoint) | pairs (bands →
            LSH candidate pairs, checkpointed) | cc (pointer-jump rounds,
            labels materialized) | tail (survivor window + sizes +
            sample + lang agg, collected)
  embdup:   pairs (multi-probe pair build, checkpointed) | cc | tail

Stage edges are the SAME fences the production fns use (the pair
checkpoint is what connected_components' own edge checkpoint consumes),
so the sum of stages tracks the composition's wall-clock. Per-stage
times are min over repeats; cc also reports rounds and the per-round
driver constant cc/rounds.

Usage: python tools/corpus_stage_floor.py [--update-md]
       python tools/corpus_stage_floor.py --worker   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_BIG = os.path.join(REPO, ".scaling", "sf1")
THREADS = (8, 16, 32)
REPEATS = 2
START = "<!-- AUTOGEN:CORPUS_STAGE_FLOOR -->"
END = "<!-- /AUTOGEN:CORPUS_STAGE_FLOOR -->"


def _neardup_stages(spark, sf_dir):
    from pyspark.sql import functions as F

    from tbench_agentic_data_pipeline_spark.catalog import (
        load_table,
        table_path,
    )
    from tbench_agentic_data_pipeline_spark.operators.corpus import (
        NEARDUP_BANDS,
        NEARDUP_HASH,
        NEARDUP_SHINGLE_W,
        _quality_deduped,
        _sample_bucket,
        _sample_rate,
        _spread_checkpointed,
    )
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        _BROADCAST_LABELS_BELOW,
        connected_components,
        lsh_candidate_pairs,
        minhash_band_df,
        resolve_near_duplicates,
        shingles,
    )

    out = {}
    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    deduped = _spread_checkpointed(
        _quality_deduped(docs), "doc_id", table_path(sf_dir, "documents")
    )
    out["front"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    toks = F.split("text", " ")
    shingled = (
        deduped.select("doc_id", toks.alias("w"))
        .where(F.size("w") >= NEARDUP_SHINGLE_W)
        .select(
            "doc_id",
            shingles(F.col("w"), NEARDUP_SHINGLE_W, guard_short=False).alias("sh"),
        )
    )
    with_bands = minhash_band_df(
        shingled, "doc_id", "sh", *NEARDUP_BANDS, hash_fn=NEARDUP_HASH
    )
    pairs = (
        lsh_candidate_pairs(with_bands, "doc_id", "bands")
        .select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
        .localCheckpoint()
    )
    out["pairs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    clusters = connected_components(pairs)
    n_labels = clusters.count()
    out["cc"] = time.perf_counter() - t0
    out["rounds"] = connected_components.last_rounds

    t0 = time.perf_counter()
    surv = resolve_near_duplicates(
        deduped, clusters, "doc_id",
        prefer=[F.length("text").desc()],
        keep_cluster_col="cluster_id",
        n_labels=n_labels,
    )
    sizes = clusters.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    if n_labels <= _BROADCAST_LABELS_BELOW:
        sizes = F.broadcast(sizes)
    (
        surv.join(sizes, "cluster_id", "left")
        .where(_sample_bucket() < _sample_rate())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
            F.sum("n_tok").cast("bigint").alias("tokens_total"),
        )
        .collect()
    )
    out["tail"] = time.perf_counter() - t0
    return out


def _embdup_stages(spark, sf_dir):
    from pyspark.sql import functions as F

    from tbench_agentic_data_pipeline_spark.catalog import (
        load_table,
        spread_for_compute,
        table_path,
    )
    from tbench_agentic_data_pipeline_spark.operators.corpus import (
        EMBDUP_MAX_CELL,
        EMBDUP_TAU,
        _sample_bucket,
        _sample_rate,
    )
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        _BROADCAST_LABELS_BELOW,
        connected_components,
        resolve_near_duplicates,
    )
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        embedding_multiprobe_pairs,
    )

    out = {}
    t0 = time.perf_counter()
    emb = spread_for_compute(
        load_table(spark, sf_dir, "embeddings"),
        "vec_id",
        source_path=table_path(sf_dir, "embeddings"),
    ).select("vec_id", "label", as_double(F.col("embedding")).alias("emb"))
    pairs = (
        embedding_multiprobe_pairs(emb, tau=EMBDUP_TAU, max_cell=EMBDUP_MAX_CELL)
        .select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
        .localCheckpoint()
    )
    out["pairs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    clusters = connected_components(pairs)
    n_labels = clusters.count()
    out["cc"] = time.perf_counter() - t0
    out["rounds"] = connected_components.last_rounds

    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    surv = resolve_near_duplicates(
        docs, clusters, "doc_id",
        prefer=[F.length("text").desc()],
        keep_cluster_col="cluster_id",
        n_labels=n_labels,
    )
    sizes = clusters.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    if n_labels <= _BROADCAST_LABELS_BELOW:
        sizes = F.broadcast(sizes)
    (
        surv.join(sizes, "cluster_id", "left")
        .where(_sample_bucket() < _sample_rate())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("docs_kept"))
        .collect()
    )
    out["tail"] = time.perf_counter() - t0
    return out


COMPOSITIONS = {"neardup": _neardup_stages, "embdup": _embdup_stages}


def worker() -> None:
    from tbench_agentic_data_pipeline_spark.session import get_session

    spark = get_session("corpus-stage-floor")
    # warm JVM + shuffle machinery off the books
    from pyspark.sql import functions as F

    spark.range(1_000_000).select((F.col("id") % 97).alias("k")).groupBy(
        "k"
    ).count().collect()
    results: dict[str, dict[str, float]] = {}
    for name, fn in COMPOSITIONS.items():
        best: dict[str, float] = {}
        for _ in range(REPEATS):
            run = fn(spark, SF_BIG)
            for k, v in run.items():
                if k == "rounds":
                    best[k] = v
                else:
                    best[k] = min(best.get(k, float("inf")), v)
        best["total"] = sum(
            v for k, v in best.items() if k not in ("rounds", "total")
        )
        results[name] = {
            k: (round(v, 3) if k != "rounds" else v) for k, v in best.items()
        }
    print(json.dumps(results))
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    if not os.path.isdir(os.path.join(SF_BIG, "documents.parquet")):
        sys.exit("~sf1 fixture missing — run tools/scaling_curve.py first")
    results: dict[int, dict] = {}
    for n in THREADS:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            capture_output=True, text=True, env=env,
        )
        parsed = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(cand, dict):
                parsed = cand
                break
        if parsed is None:
            tail = (proc.stderr or proc.stdout or "").strip()[-400:]
            sys.exit(
                f"local[{n}] worker produced no result "
                f"(rc={proc.returncode}): {tail}"
            )
        results[n] = parsed
        print(f"local[{n}]: {parsed}", file=sys.stderr)

    lines = [
        "| composition | stage | "
        + " | ".join(f"local[{n}] (s)" for n in THREADS)
        + " | note |",
        "|---|---|" + "---|" * (len(THREADS) + 1),
    ]
    for comp in COMPOSITIONS:
        stages = [
            s for s in ("front", "pairs", "cc", "tail", "total")
            if s in results[THREADS[0]][comp]
        ]
        for s in stages:
            vals = [results[n][comp][s] for n in THREADS]
            note = ""
            if s == "cc":
                r = results[THREADS[-1]][comp]["rounds"]
                per = results[THREADS[-1]][comp]["cc"] / r if r else 0
                note = f"{r} rounds → {per:.2f} s/round @32"
            lines.append(
                f"| `{comp}` | {s} | "
                + " | ".join(f"{v:.2f}" for v in vals)
                + f" | {note} |"
            )
    table = "\n".join(lines)
    print(table)
    if "--update-md" in sys.argv:
        path = os.path.join(REPO, "SCALING.md")
        text = open(path).read()
        block = f"{START}\n{table}\n{END}"
        if START in text:
            text = text.split(START)[0] + block + text.split(END)[1]
        else:
            text += "\n" + block + "\n"
        open(path, "w").write(text)


if __name__ == "__main__":
    main()
