"""Exact exchange-count pins for every benched query.

The global ≤6 budget (test_plans.py) catches pile-ups; this fence
catches DRIFT — a lost broadcast pin, a filter that stopped pushing, or
an optimizer-rule change typically adds exactly one Exchange, which the
budget can absorb silently but a benchmark at 100 TB cannot. Counts are
the plan at sf0.01 with the session's own config (the bench
environment). If a change here is INTENTIONAL (a query rewrite), update
the pin in the same commit and say why in its message.
"""

from __future__ import annotations

import pytest

from bench import HEADLINE, _extra_queries
from tbench_agentic_data_pipeline_spark import registry
from tbench_agentic_data_pipeline_spark.plans.explain import count_exchanges
from tests.conftest import SF_ORACLE

# Measured 2026-08-14 (round 5) — every benched query's shuffle count.
_PINS = {
    "flagship_pricing_summary": 2,
    "a4_completion_rate": 1,
    "a8_distinct_users_per_type": 2,
    "j1_semi_join_customers_with_orders": 0,
    "j5_broadcast_dim_join": 1,
    "w3_pergroup_topn": 1,
    "so1_union_by_name": 0,
    "dedup_exact": 1,
    # round-7 rewrite: recall-contract form — md5-twin candidates +
    # shingle-Jaccard verify joins; the xx contract flag is a per-row
    # arrays_overlap, zero exchanges of its own
    "dedup_minhash_fast": 5,
    # round-7: PQ/ADC — encode mapInPandas -> score mapInPandas -> one
    # top-k exchange (plus the bounded query collect, not an exchange)
    "sim_ivfpq_topk": 2,
    "sim_pq_adc_topk": 2,
    "sim_topk_cosine_arrow": 2,
    "text_quality_score": 0,
    "st_session_windows": 1,
    "dedup_cluster_components": 1,
    "text_contamination": 2,
    # round-5 rewrite: DF via COUNT OVER (PARTITION BY term) instead of
    # aggregate+join-back — one less TF-table shuffle, measured faster
    "text_tfidf_topk": 4,
    "sim_knn_join_arrow": 2,
    "st_dedup_watermark": 1,
    "q9_profit_by_nation_year": 2,
    "q21_sole_late_supplier": 4,
    "q2_min_cost_supplier": 2,
    "q11_important_part_value": 4,
    "q13_order_count_distribution": 3,
    "q15_top_supplier": 4,
    "q16_supplier_part_variety": 3,
    "q20_dominant_suppliers": 4,
    "events_funnel": 5,
    "j_asof_last_view": 1,
    "w8_trailing_week_activity": 1,
    "dedup_threshold_sweep": 4,
    "st_interval_join": 0,
    # r9: + the conditional narrow-input fan-out exchange
    # (spread_for_compute — the fixture scan is ONE partition, which
    # serialized the whole codec CPU onto a single core; skipped on
    # wide scans at real scale) and the fixture encode FUSED into the
    # decode stage via pre= (each extra Python stage costs ~0.25 s
    # fixed at 32 tasks)
    "mm_image_codec": 1,
    "text_bm25_topk": 3,
    "sim_centroid_outliers": 2,
    "dedup_incremental": 4,
    "a_profile_documents": 2,
    # tagged-union window attribution: one user exchange + channel
    # rollup + ordered output — the decorrelated form of the oracle's
    # per-purchase correlated subquery
    "events_attribution": 3,
    # dispatcher: arrow path + per-bucket count accounting. r6: the
    # count table is collected once (it is broadcast-small by design)
    # and rebuilt driver-side for the broadcast tag join — the old
    # persisted-aggregate subplans (textual count 6) left the final
    # plan entirely, 6 → 2, and no cache outlives the call.
    "sim_knn_join_auto": 2,
    # r6 additions. a_heavy_hitters_cms is the in-plan CMS: term-count
    # agg + counter agg + top-5 + probe-join + final min + the single-row
    # N broadcast. snap_merge_on_read's plan is the read side only (the
    # chain writes happen eagerly inside the fn): window over the
    # compacted commit + final groupBy + order. mm_video_codec (r9) is
    # scan → conditional fan-out exchange → ONE fused Arrow stage (the
    # ~0.45 ms/row entropy decode is worth spreading; the encode fuses
    # via pre=).
    "a_heavy_hitters_cms": 6,
    "snap_merge_on_read": 3,
    "mm_video_codec": 1,
    # r8 addition; r9: ONE fused Arrow stage (WAV fixture-encode
    # composed into the parse via pre=), still shuffle-free — the
    # ~20 µs/row decode CPU is below the fan-out exchange's fixed cost,
    # so unlike image/video this query does NOT spread
    "mm_audio_codec": 0,
    # r8 addition: explode bigrams → one partial-aggregated count
    # exchange on a bounded-cardinality key; the global top-20 rides
    # TakeOrderedAndProject-style on the aggregated rows
    "text_bpe_pairs": 1,
    # r8 addition; r9: ONE fused Arrow stage (GIF/BMP fixture-encode
    # composed into the parse via pre=), still shuffle-free — ~45 µs/row
    # decode CPU, below the fan-out exchange's fixed cost
    "mm_gif_codec": 0,
    # r10 additions; r11: the quality→exact-dedup front is checkpointed
    # ONCE and feeds both sides, so the dedup window exchange left the
    # final plan (4 → 3) and the corpus parquet is scanned exactly once
    # (test_operators.test_corpus_neardup_scans_corpus_once pins that).
    # Remaining: survivor-window shuffle + cluster-size agg + final lang
    # agg (labels and sizes broadcast; the LSH/CC edge build runs inside
    # localCheckpoints and is not in the final plan).
    # mm_gif_frames: one fused Arrow stage (fixture encode via pre=,
    # sampling + compositing + means in-pass), shuffle-free.
    "pipeline_corpus_build_neardup": 3,
    "mm_gif_frames": 0,
    # r11 addition: quantizer-build agg over the existing half + argmin
    # partial-agg + per-cell report agg + ordered output; the assignment
    # itself is a broadcast crossJoin (corpus side never shuffles)
    "sim_ivf_incremental": 4,
    # r11 addition: survivor-window shuffle + cluster-size agg + final
    # lang agg; the multiprobe pair build + CC run inside localCheckpoints
    # and the label/size joins broadcast below 5M clustered nodes
    "pipeline_corpus_build_embdup": 3,
    # r12 addition: one spread exchange on the batch scan + final lang
    # agg + ordered output; the reject list (band join + Jaccard verify)
    # is built inside a localCheckpoint and rejoins broadcast below 5M
    # ids, and assignment is a per-row argmin over the collected k-row
    # codebook (zero crossJoin, zero extra exchange)
    "pipeline_incremental_tick": 3,
    # r12 addition: one spread exchange on the corpus scan (the Generate
    # is the heavy stage — spread before it), the window count over gram,
    # and the per-doc rollup; no join-back (tfidf's DF-over-term form)
    "text_ngram_novelty": 3,
    # r12 addition: one key-cardinality exchange per batch partial; the
    # two union+re-aggregate merges reuse the partials' partitioning
    # (the null-safe full-outer form this replaced measured 7)
    "st_incremental_rollup": 3,
    # r13 addition: stale-quantizer cell agg over the history half + refit
    # cell agg over all rows + per-cell report agg + ordered output; the
    # two centroid joins broadcast (corpus side never shuffles for them)
    "sim_ivf_retrain": 4,
    # r15 addition: the streaming minhash-dedup batch mirror — the
    # dedup_incremental shape plus the arrival-rank predicate: one
    # conditional spread exchange on the narrow fixture scan, the band
    # self-join's two sides, and the candidate distinct; the
    # token-Jaccard verify joins broadcast at the oracle SF
    # (_verify_join_sides' size split)
    "st_minhash_dedup": 4,
}


def test_every_benched_query_is_pinned():
    assert sorted(_PINS) == sorted(HEADLINE), (
        "bench HEADLINE changed — add/remove pins for the delta"
    )


@pytest.mark.parametrize("name", sorted(_PINS))
def test_exchange_count_pin(spark, name):
    fns = {n: e.fn for n, e in registry.collect().items()}
    fns.update(_extra_queries())
    got = count_exchanges(fns[name](spark, SF_ORACLE))
    assert got == _PINS[name], (
        f"{name}: plan now has {got} exchanges (pinned {_PINS[name]}) — "
        f"either a regression (lost broadcast/pushdown) or an intentional "
        f"rewrite that must update this pin"
    )
