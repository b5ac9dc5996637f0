#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline queries
with the scale-relevant properties called out. Run after changing any
headline query's implementation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbench_agentic_data_pipeline_spark import registry
from tbench_agentic_data_pipeline_spark.plans.explain import (
    codegen_stage_count,
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
)
from tbench_agentic_data_pipeline_spark.session import get_session

COMMENTARY = {
    "flagship_pricing_summary": "Filter+projection pushed to the scan; partial+final hash agg → ~6 groups cross the exchange.",
    "p1_point_lookup": "Key predicate in PushedFilters → row-group/page skipping; no shuffle at all.",
    "j5_broadcast_dim_join": "Both dims broadcast; the single exchange is the final small aggregate.",
    "q3_shipping_priority": "Selective filters before joins; TakeOrderedAndProject top-10 (no global sort).",
    "q5_local_supplier_volume": "region/nation/supplier broadcast; only the fact spine shuffles.",
    "dedup_minhash_fast": "md5-twin band bucket agg + two verify joins; xx recall-contract flag is per-row arrays_overlap (no extra exchange).",
    "sim_topk_cosine": "Queries broadcast over one corpus scan; per-query rank window.",
    "st_session_windows": "session_window agg shuffles on the session key only.",
    "q2_min_cost_supplier": "Correlated MIN decorrelated to a partkey window: dims broadcast, one fact exchange (agg+join-back shape measured 5 exchanges/20 scans).",
    "q9_profit_by_nation_year": "Five-way join; part/supplier/nation broadcast — only the orders join and final agg shuffle.",
    "q13_order_count_distribution": "LEFT outer keeps zero-order customers (predicate in the JOIN); custkey agg reuses the join partitioning.",
    "q20_dominant_suppliers": "One repartition(partkey) serves the (pk,sk) aggregate AND the per-part total window; broadcast LeftSemi into the dim.",
    "q21_sole_late_supplier": "EXISTS/NOT-EXISTS as LeftSemi+LeftAnti, all lineitem sides keyed on l_orderkey; supplier broadcast.",
    "dedup_cluster_components": "Iterative pointer-jumping loop: per-round scalar to the driver, labels broadcast below 5M nodes, rounds surfaced as cc_rounds.",
    "q11_important_part_value": "HAVING over a global scalar: the mean-of-group-sums threshold reuses the per-part aggregate's exchange (ReusedExchange) and joins back as a 1-row broadcast.",
    "q15_top_supplier": "Per-supplier revenue shuffles once on l_suppkey; the MAX scalar decorrelates to a 1-row broadcast join over the same aggregate; supplier broadcasts.",
    "q16_supplier_part_variety": "Broadcast LEFT ANTI against the tiny excluded-supplier list; part broadcast; one real shuffle for the (brand,type,size) distinct aggregate.",
    "events_funnel": "Stage predicates pushed to one events scan; per-user min-ts per stage partial-combines before the single user shuffle.",
    "j_asof_last_view": "As-of via tagged union + one per-key window — both sides share a single (user) exchange, no range-join explosion.",
    "w8_trailing_week_activity": "RANGE frame over unix_micros keeps the trailing-week sum a single per-user window; one exchange.",
    "dedup_threshold_sweep": "LSH candidates computed once; the threshold dimension is a tiny broadcast cross join over the scored pairs, not a re-scan per threshold.",
    "st_interval_join": "Filters on event_type pushed to both scans; the range predicate bounds stream-stream state; one user_id exchange pair feeds the interval join.",
    "mm_image_codec": "JVM-side payload assembly, one Arrow mapInPandas decode stage, no shuffle at all — the embarrassingly-parallel 100 TB binary-scan shape.",
    "text_tfidf_topk": "DF as COUNT OVER (PARTITION BY term) on the TF frame — one term exchange serves the document-frequency count, no aggregate+join-back (r5 rewrite: 5→4 exchanges).",
    "text_bm25_topk": "One conditional per-doc aggregate carries dl + every query term's tf; corpus stats are a 1-row broadcast; fixed-order contribution sum; TakeOrderedAndProject top-10.",
    "sim_centroid_outliers": "Per-label centroid table broadcast back onto the exploded corpus (corpus never shuffles for the join); stable-rounded distance ranks via TakeOrderedAndProject.",
    "sim_ivfpq_topk": "IVF+PQ composed: the cell id rides through the Arrow encode stage (carry_cols — no recovery join), probes broadcast with driver-built LUTs, and the cell-equality join prunes the ADC scan to probed cells; WindowGroupLimit cuts top-k before the single rank exchange.",
    "dedup_incremental": "New-batch bands equi-join the persisted index bands (new×existing only, cost ∝ batch); token join-back verifies integer-milli Jaccard.",
    "a_profile_documents": "Every column's nulls/distinct/min/max in ONE Expand-style aggregate (single scan); long format via zero-shuffle stack.",
    "pipeline_corpus_build_neardup": "The full training-data build: the quality→exact-dedup front is localCheckpointed ONCE and feeds both the LSH/CC edge build and the survivors side (r11 — the corpus parquet is scanned exactly once; the dedup window exchange left the final plan), labels + cluster sizes broadcast below 5M nodes, one survivor window, one final lang aggregate — 3 exchanges end to end.",
    "mm_gif_frames": "Composited animated-GIF frame sampling: fixture encode + LZW decode + disposal compositing + per-frame means in ONE fused Arrow stage (pre= and features=True) — zero shuffles, the embarrassingly-parallel binary-scan shape with a 1→3 explode inside the Python stage.",
    "sim_ivf_incremental": "Incremental IVF maintenance twin: integer-milli quantizer aggregated from the existing half (one map-side-combined exchange), arriving half assigned via broadcast crossJoin + partial-aggregated argmin (the corpus side never shuffles for the assignment), per-cell drift report aggregate + ordered output — 4 exchanges.",
    "pipeline_corpus_build_embdup": "The embedding-space corpus build: multi-probe near-dup pair build (bounded cells, hamming-1 probe union, exact-cosine verify) and connected components run inside localCheckpoints; labels + cluster sizes broadcast below 5M clustered nodes; one survivor window over documents, one final lang aggregate — 3 exchanges, documents parquet scanned once.",
    "pipeline_incremental_tick": "The O(batch) ingestion tick: the reject list (band join vs the history index + Jaccard verify) is built behind a localCheckpoint and rejoins the batch broadcast below 5M ids; assignment to the saved quantizer is a per-row argmin over the collected k-row codebook (zero crossJoin); one batch scan + one embeddings scan + one lang aggregate — 3 exchanges, cost ∝ batch, never corpus.",
    "text_ngram_novelty": "Corpus-vs-itself memorization audit: distinct 8-grams per doc via array_distinct INSIDE the generator (no pre-shuffle dedup), window count over gram (count-only frame, no join-back), per-doc rollup — spread exchange + gram window + doc agg = 3 exchanges, one corpus scan.",
    "st_incremental_rollup": "Incremental view maintenance certified against the one-pass aggregate: three micro-batch partials (one key-cardinality exchange each) folded via the streaming drain's own union+re-aggregate merge — the merges reuse the partials' partitioning, so 3 exchanges total and ONE events scan (checkpointed projection).",
    "sim_ivf_retrain": "Drift->retrain-and-swap twin (clustering.ivf_retrain): stale per-cell quantizer aggregated from the history half, refit quantizer over history+batch (two map-side-combined cell exchanges), then ONE scoring pass joins both broadcast centroid tables and folds the per-cell pre/post report + integer-exact retrain decision — cell aggs + report agg + ordered output = 4 exchanges, the corpus never shuffles for the centroid joins.",
    "st_minhash_dedup": "Streaming near-dup ingestion's batch mirror: per-row signatures/bands over one documents scan, band self-join with the strictly-earlier arrival-rank predicate (union of per-batch matches against the growing index, collapsed to one join), candidate distinct, size-split token-Jaccard verify — spread exchange + band-join sides + distinct = 4 exchanges; the production foreachBatch drain pays one |batch|-band join per micro-batch against the persisted index, never a corpus re-signature.",
}

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_session("plans")
    entries = registry.collect()
    out = [
        "# PLANS — formatted physical plans of the headline queries\n",
        "Generated by `tools/gen_plans.py` at sf0.01. The properties that",
        "matter at 100 TB are summarized per query; the full formatted plan",
        "follows for inspection.\n",
    ]
    for name, note in COMMENTARY.items():
        df = entries[name].fn(spark, SF)
        plan = formatted_plan(df)
        out.append(f"## {name}\n")
        out.append(f"{note}\n")
        out.append(
            f"- shuffles (Exchange): {count_exchanges(df)}  ·  "
            f"broadcast join: {has_broadcast_join(df)}  ·  "
            f"codegen stages: {codegen_stage_count(df)}  ·  "
            f"pushed filters: {pushed_filters(df) or '—'}\n"
        )
        out.append("```\n" + plan.strip() + "\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
