"""Plan-shape assertions (SURVEY.md §4): pushdown, pruning, broadcast,
bounded shuffles — correctness the value hash can't see but 100 TB can."""

from __future__ import annotations

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.operators.aggregates import (
    flagship_pricing_summary,
)
from tbench_agentic_data_pipeline_spark.operators.filters import p1_point_lookup
from tbench_agentic_data_pipeline_spark.operators.joins import j5_broadcast_dim_join
from tbench_agentic_data_pipeline_spark.plans.explain import (
    codegen_stage_count,
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)
from tests.conftest import SF_ORACLE


def test_point_lookup_pushes_key_filter(spark):
    df = p1_point_lookup(spark, SF_ORACLE)
    pushed = pushed_filters(df)
    assert any("o_orderkey" in p for p in pushed), pushed


def test_flagship_prunes_columns_and_pushes_filter(spark):
    df = flagship_pricing_summary(spark, SF_ORACLE)
    schemas = read_schemas(df)
    # 7 needed columns only — o_orderkey/custkey etc. absent from the scan.
    assert schemas and all("l_partkey" not in s and "l_suppkey" not in s for s in schemas), schemas
    assert any("l_shipdate" in p for p in pushed_filters(df)), pushed_filters(df)


def test_dim_join_broadcasts(spark):
    df = j5_broadcast_dim_join(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    # fact side shuffles once (final aggregate), dims never:
    assert count_exchanges(df) <= 2, count_exchanges(df)


def test_narrow_projection_single_codegen_stage(spark):
    # A pure scalar pipeline must stay in one WholeStageCodegen span.
    docs = load_table(spark, SF_ORACLE, "documents").select(
        F.length("text").alias("n"), F.upper("lang").alias("l")
    )
    assert codegen_stage_count(docs) == 1


def test_q6_scan_only_pushdown_and_pruning(spark):
    # The canonical pushdown proof: predicates reach the scan, and the
    # scan reads only the 4 referenced columns.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q6_forecast_revenue,
    )

    df = q6_forecast_revenue(spark, SF_ORACLE)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    assert any("l_discount" in p for p in pushed), pushed
    schemas = read_schemas(df)
    assert schemas and all(
        "l_orderkey" not in s and "l_extendedprice" in s for s in schemas
    ), schemas
    # no join, one grouping-free aggregate: at most the final single
    # partition exchange
    assert count_exchanges(df) <= 1, count_exchanges(df)


def test_q14_broadcasts_part_dim(spark):
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q14_promo_revenue,
    )

    df = q14_promo_revenue(spark, SF_ORACLE)
    assert has_broadcast_join(df)


def test_q19_pushes_quantity_envelope_to_scan(spark):
    # The disjunction's single-table implication must reach the lineitem
    # scan: every branch bounds l_quantity, so the union envelope
    # [1, 30] is derivable and pushable even though the full predicate
    # references part columns too.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q19_disjunctive_revenue,
    )

    df = q19_disjunctive_revenue(spark, SF_ORACLE)
    pushed = pushed_filters(df)
    assert any("l_quantity" in p for p in pushed), pushed
    assert has_broadcast_join(df)


def test_q17_decorrelated_single_fact_exchange(spark):
    # The correlated AVG decorrelates to ONE per-part aggregate: the
    # only hash exchanges are that aggregate's shuffle (+ AQE reads);
    # the part dim and the avg side must broadcast back to the fact.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q17_small_quantity_revenue,
    )

    df = q17_small_quantity_revenue(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 2, count_exchanges(df)


def test_cube_is_single_pass_expand(spark):
    # CUBE must plan as Expand -> one partial+final aggregate pair,
    # never one scan per grouping set.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        a_cube_priority_status,
    )

    df = a_cube_priority_status(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1, plan.count("Scan parquet")


def test_zipf_corpus_never_shuffles_on_word_twice(spark):
    # The vocabulary derivation shuffles tokens on word once; the scoring
    # pass must reuse a BROADCAST of the top-256 vocab, not a second
    # word-keyed exchange of corpus tokens. Budget: word-count shuffle +
    # per-doc aggregate shuffle + the bounded vocab window's single
    # partition move.
    from tbench_agentic_data_pipeline_spark.operators.text import (
        text_zipf_fluency,
    )

    df = text_zipf_fluency(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 3, count_exchanges(df)


def test_runtime_bloom_filter_reduces_fact_join(spark):
    # Catalyst's runtime semi-join reduction: a selective filter on one
    # fact side injects a bloom-filter subquery into the OTHER side's
    # scan (might_contain on the join key), so the big side drops
    # non-joining rows BEFORE the shuffle. Default thresholds only fire
    # at real scan sizes (appSideScanSizeThreshold = 10 GB) — exactly the
    # 100 TB case — so the test lowers them to fixture scale to pin the
    # mechanism.
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        orders = load_table(spark, SF_ORACLE, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF_ORACLE, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_no_query_exceeds_exchange_budget(spark):
    """Global shuffle ceiling over EVERY registered query: the measured
    distribution at sf0.01 is 0-5 exchanges (median 1); anything above 6
    means an operator silently regressed into a shuffle pile-up (e.g. a
    lost broadcast pin or a filter that stopped pushing). Cheap early
    warning the per-query plan tests can't give for queries they don't
    cover."""
    from tbench_agentic_data_pipeline_spark import registry

    over_budget = {}
    for name, entry in registry.collect().items():
        df = entry.fn(spark, SF_ORACLE)
        n = count_exchanges(df)
        if n > 6:
            over_budget[name] = n
    assert over_budget == {}, over_budget


def test_no_token_array_broadcast_at_scale(spark, monkeypatch):
    """Registry-wide form of the r9 broadcast-underestimation hand audit
    (dedup._verify_join_sides): token/shingle string-arrays occupy 30-60×
    the parquet bytes the size estimator sees, so a BroadcastExchange
    whose build side still CARRIES such an array is a plan that works at
    fixture scale and fails (or floods the driver) on a real corpus.
    Simulate the big-corpus regime by forcing the guard's source-size
    probe high, then assert NO registered query's plan broadcasts a
    token-array build side — so the next token-array join added to the
    registry cannot silently reintroduce the hazard. (The detector is
    validated positively elsewhere: below the threshold the guard
    deliberately allows these broadcasts, and `token_array_broadcasts`
    flags dedup_minhash_fast's shingle verify join there.)"""
    from tbench_agentic_data_pipeline_spark import registry
    from tbench_agentic_data_pipeline_spark.operators import dedup
    from tbench_agentic_data_pipeline_spark.plans.explain import (
        token_array_broadcasts,
    )

    monkeypatch.setattr(dedup, "source_bytes", lambda path: 1 << 40)
    offenders = {}
    for name, entry in registry.collect().items():
        hits = token_array_broadcasts(entry.fn(spark, SF_ORACLE))
        if hits:
            offenders[name] = hits
    assert offenders == {}, offenders


def test_token_array_broadcast_detector_flags_unguarded_plan(spark):
    """Positive control for the audit above: below the source-size
    threshold the guard deliberately leaves the planner's broadcast in
    place (exchange-lean fixture plans), and the detector must see that
    shingle-array build side — otherwise the registry-wide assertion is
    vacuously green."""
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        dedup_minhash_fast,
    )
    from tbench_agentic_data_pipeline_spark.plans.explain import (
        token_array_broadcasts,
    )

    assert token_array_broadcasts(dedup_minhash_fast(spark, SF_ORACLE))


def test_q2_window_decorrelation_single_fact_exchange(spark):
    # The correlated-MIN decorrelates to ONE partkey window over ONE
    # fact lineage: all dims broadcast, and the only hash exchanges are
    # the window's partkey shuffle + the final order (no agg+join-back
    # double-scan: that shape measured 5 exchanges / 20 plan scans).
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q2_min_cost_supplier,
    )

    df = q2_min_cost_supplier(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 3, count_exchanges(df)


def test_q9_broadcasts_all_dims_single_fact_scan(spark):
    # Five-way join: part/supplier/nation broadcast; the fact shuffles
    # only for the orders join + final aggregate.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q9_profit_by_nation_year,
    )

    df = q9_profit_by_nation_year(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 4, count_exchanges(df)
    assert "CartesianProduct" not in plan


def test_q11_global_scalar_is_broadcast_not_cartesian(spark):
    # HAVING-over-global-scalar: the one-row threshold must join as a
    # broadcast nested loop (1 row), never a cartesian, and the whole
    # query stays inside the exchange budget.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q11_important_part_value,
    )

    df = q11_important_part_value(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert count_exchanges(df) <= 4, count_exchanges(df)


def test_q13_left_join_keeps_zero_order_customers(spark):
    # The priority predicate must live in the JOIN (not a post-filter
    # that would drop zero-order customers), and the distribution query
    # is 3 exchanges: custkey join, custkey agg reuse, histogram.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q13_order_count_distribution,
    )

    df = q13_order_count_distribution(spark, SF_ORACLE)
    # count BEFORE collect: an executed DataFrame's formatted plan shows
    # initial + final adaptive plans, double-counting every exchange
    assert count_exchanges(df) <= 3, count_exchanges(df)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    assert 0 in rows  # zero-order customers survive the outer join


def test_q16_exclusion_list_is_broadcast_anti(spark):
    # NOT IN over the tiny excluded-supplier list must plan as a
    # broadcast LEFT ANTI on the fact, not a shuffle.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q16_supplier_part_variety,
    )

    df = q16_supplier_part_variety(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]
    assert count_exchanges(df) <= 3, count_exchanges(df)


def test_q20_one_partkey_exchange_serves_both_aggregates(spark):
    # The explicit repartition(partkey) must be the ONLY fact exchange
    # feeding both the (pk, sk) aggregate and the per-part window —
    # agg+join-back measured 7 exchanges / 12 scans; this plan ≤4 / ≤8.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q20_dominant_suppliers,
    )

    df = q20_dominant_suppliers(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert count_exchanges(df) <= 4, count_exchanges(df)
    assert plan.count("Scan parquet") <= 8, plan.count("Scan parquet")
    assert "LeftSemi" in plan


def test_q21_semi_anti_chain_colocates_on_orderkey(spark):
    # EXISTS → LeftSemi, NOT EXISTS → LeftAnti, all lineitem sides keyed
    # on l_orderkey so the chain shares one partitioning; supplier
    # broadcasts; never a cartesian.
    from tbench_agentic_data_pipeline_spark.operators.analytics import (
        q21_sole_late_supplier,
    )

    df = q21_sole_late_supplier(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 5, count_exchanges(df)


def test_knn_arrow_paths_shuffle_shape(spark):
    # The benched kNN production path: ONE bucket exchange feeding the
    # per-bucket GEMM + the final per-vector window — nothing else. The
    # blocked variant adds exactly one more exchange (the block-pair
    # group) on top of the within-bucket numbering window.
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        knn_join_blocked,
        sim_knn_join_arrow,
    )

    df = sim_knn_join_arrow(spark, SF_ORACLE)
    assert count_exchanges(df) <= 2, count_exchanges(df)

    emb = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
    )
    blocked = knn_join_blocked(emb, 3, block_rows=64)
    assert count_exchanges(blocked) <= 3, count_exchanges(blocked)


def test_bm25_two_aggregate_shape(spark):
    """BM25 must stay the one-pass conditional-aggregate form: the corpus
    explodes once, per-doc and corpus-stats aggregates are the only real
    exchanges (≤3 with the top-k's local fan-in), the stats row joins
    back broadcast, and the top-10 is TakeOrderedAndProject — never a
    global sort or a per-term join chain (the first cut's tf/df joins
    measured 7 exchanges and blew the budget fence)."""
    from tbench_agentic_data_pipeline_spark.operators.text import text_bm25_topk

    df = text_bm25_topk(spark, SF_ORACLE)
    assert count_exchanges(df) <= 3, count_exchanges(df)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_centroid_outliers_broadcasts_centroids(spark):
    """The per-label centroid table is label-cardinality × dim — it must
    join back BROADCAST so the exploded corpus never shuffles for the
    join; the only exchanges are the two aggregates (+ top-k fan-in)."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        sim_centroid_outliers,
    )

    df = sim_centroid_outliers(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 4, count_exchanges(df)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_interval_join_pushes_type_filters_to_both_scans(spark):
    """Both sides of the interval join must arrive pre-pruned: the
    event_type predicates belong in the parquet scans, not above the
    join."""
    from tbench_agentic_data_pipeline_spark.streaming.joins import (
        st_interval_join,
    )

    df = st_interval_join(spark, SF_ORACLE)
    pushed = pushed_filters(df)
    assert any("view" in p for p in pushed), pushed
    assert any("click" in p for p in pushed), pushed


def test_package_uses_no_private_jvm_apis():
    """Spark Connect readiness (r5 verdict "What's wrong" #2 follow-up):
    no file in the package may touch `_jvm`, `_jsc`, `_jdf` or other
    py4j-private handles — the CMS query and even the plan diagnostics
    now go through public APIs only, so this greps the source and fails
    on any regression.

    ONE documented exemption (r14): ``catalog.release_local_checkpoint``
    reaches through ``_jdf`` to free a superseded localCheckpoint's
    executor blocks immediately (connected_components' per-round label
    tables — peak storage O(2 × labels) instead of O(rounds × labels)).
    PySpark exposes no public API for this; the helper is best-effort
    storage HYGIENE, never correctness: it catches everything and
    no-ops on Spark Connect, where ContextCleaner + driver GC reclaim
    the blocks as before. Any new private-handle use still fails here."""
    import io
    import pathlib
    import tokenize

    pkg = pathlib.Path(__file__).resolve().parent.parent / (
        "tbench_agentic_data_pipeline_spark"
    )
    private = {"_jvm", "_jsc", "_jdf", "_jsparkSession"}
    exempt = {("catalog.py", "_jdf"): 1}  # release_local_checkpoint only
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        # Tokenize so docstrings/comments that merely *mention* the
        # private handles (e.g. aggregates.py's note that the CMS
        # rewrite removed them) don't trip the guard — only real
        # attribute accesses in code do.
        toks = list(tokenize.generate_tokens(io.StringIO(path.read_text()).readline))
        for prev, tok in zip(toks, toks[1:]):
            if (
                tok.type == tokenize.NAME
                and tok.string in private
                and prev.type == tokenize.OP
                and prev.string == "."
            ):
                key = (path.name, tok.string)
                if exempt.get(key, 0) > 0:
                    exempt[key] -= 1
                    continue
                offenders.append(f"{path.name}:{tok.start[0]}: .{tok.string}")
    assert offenders == [], offenders


def test_token_array_taint_covers_guarded_and_inline_forms():
    """Unit pin of the taint walk's hazard coverage (r10 self-review):
    the guarded-shingles CASE form, inline-nested split, and plain
    chained projections must all taint; scalar consumers (size over
    split, band keys) must not; column-id matching must respect
    boundaries (w#4 is not inside w#45)."""
    from tbench_agentic_data_pipeline_spark.plans.explain import (
        _id_in,
        token_array_columns,
    )

    plan = """
(4) Project
Output [2]: [doc_id#0L, split(text#1,  , -1) AS w#4]

(5) Project
Output [2]: [doc_id#0L, CASE WHEN (size(w#4, false) >= 3) THEN array_distinct(transform(sequence(0, 1), x -> concat(element_at(w#4, x)))) ELSE array(repeat( , 3)) END AS sh#5]

(6) Project
Output [2]: [doc_id#0L, array_distinct(transform(split(text#1,  , -1), t -> upper(t))) AS toks#6]

(7) Project
Output [3]: [doc_id#0L, size(split(text#1,  , -1), false) AS n_tok#7, md5(concat(element_at(sh#5, 1))) AS band#8]

(8) Project
Output [2]: [doc_id#0L, sort_array(w#45, true) AS w2#9]

(9) Project
Output [3]: [doc_id#0L, concat(element_at(w#4, 1), element_at(w#4, 2)) AS s#10, concat(w#4[0], w#4[1]) AS s2#11]

(10) Project
Output [2]: [doc_id#0L, array_distinct(transform(sequence(1, 5), x -> concat(element_at(w#4, x), element_at(w#4, (x + 1))))) AS sh2#12]

(11) Project
Output [2]: [doc_id#0L, slice(w#4, 1, 100) AS head#13]

(12) Project
Output [3]: [doc_id#0L, concat(split(text#1,  , -1)[0], split(text#1,  , -1)[1]) AS s3#14, split(text#1,  , -1)[0] AS first#15]
"""
    tainted = token_array_columns(plan)
    assert {"w#4", "sh#5", "toks#6"} <= tainted
    assert "n_tok#7" not in tainted and "band#8" not in tainted
    # w#45 is NOT w#4: the chained sort_array references an untainted id
    assert "w2#9" not in tainted
    # r10 ADVICE #3: concat is ALSO a string function — a scalar string
    # assembled from literal-index extractions (element_at or bracket
    # indexing) out of a tainted array is not itself a token array
    assert "s#10" not in tainted and "s2#11" not in tainted
    # r11 review: the same false-taint via CollapseProject's inlined form
    # — a once-used split rendered as split(...)[0] directly inside the
    # scalar projection — must also stay out of the hazard class
    assert "s3#14" not in tainted and "first#15" not in tainted
    # ...but LAMBDA-index extraction inside an array constructor is the
    # inline shingle build and must stay in the hazard class
    assert "sh2#12" in tainted
    # and a genuine sub-array of tokens is still an array of tokens
    assert "head#13" in tainted
    assert _id_in("w#4", "a, w#4, b") and not _id_in("w#4", "a, w#45, b")
    assert not _id_in("w#4", "raw#4")


def test_mask_literal_extractions_nested_call_indexing():
    """r11 ADVICE: the call-result-index masking pass must survive a
    removal span that CONTAINS another match (nested inlined-split
    forms) — the pre-fix code iterated stale offsets against the
    mutated string and raised IndexError, crashing the registry-wide
    token-array audit on exactly the plans it exists to handle."""
    from tbench_agentic_data_pipeline_spark.plans.explain import (
        _mask_literal_extractions as mask,
    )

    # the two verified crash reproducers from the r11 ADVICE
    assert mask("split(split(text#1, ;, -1)[0],  , -1)[1]") == ""
    assert (
        mask("substring(concat(split(text#1,  , -1)[0])[1], 1, 3)")
        == "substring(, 1, 3)"
    )
    # masking must not touch the lambda-index shingle build (the hazard
    # the detector exists for) nor derived-index element_at
    inline = "array_distinct(transform(split(lower(text#1),  , -1), x -> x))"
    assert mask(inline) == inline
    assert mask("element_at(w#4, x)") == "element_at(w#4, x)"
    # unbalanced fragments are left untouched, without looping forever
    assert mask(")[0] stray") == ")[0] stray"


def test_taint_propagates_through_value_preserving_projections():
    """r12 review: the taint walk must follow VALUE-PRESERVING
    projections whose head is not an array producer — the identity
    renames Spark inserts to align Union branch attribute ids, coalesce
    null-defaults, CASE branches returning the array, and array casts —
    else a tokenized branch re-aliased into a BroadcastExchange passes
    the broadcast audit undetected. Scalar consumers must still NOT
    propagate (the r10 precision fix)."""
    from tbench_agentic_data_pipeline_spark.plans.explain import (
        token_array_columns,
    )

    seed = "Project [split(text#1,  , -1) AS w#4]\n"
    assert "w#12" in token_array_columns(seed + "Project [w#4 AS w#12]")
    assert "w2#9" in token_array_columns(
        seed + "Project [coalesce(w#4, array()) AS w2#9]"
    )
    assert "w3#7" in token_array_columns(
        seed
        + "Project [CASE WHEN (size(w#4, false) > 2) THEN w#4 ELSE null END AS w3#7]"
    )
    assert "w4#8" in token_array_columns(
        seed + "Project [cast(w#4 as array<string>) AS w4#8]"
    )
    # chained: rename then coalesce — the closure must reach the end
    chained = (
        seed
        + "Project [w#4 AS w#12]\nProject [coalesce(w#12, array()) AS w#20]"
    )
    assert "w#20" in token_array_columns(chained)
    # scalar consumers stay out
    got = token_array_columns(
        seed + "Project [concat_ws( , w#4) AS s#5, size(w#4, false) AS n#6]"
    )
    assert "s#5" not in got and "n#6" not in got
    # r12 ADVICE: a coalesce whose tainted id only appears under a SCALAR
    # consumer argument is itself scalar — per-argument judgement, not a
    # substring scan of the whole expression
    got = token_array_columns(
        seed
        + "Project [coalesce(size(w#4, false), 0) AS n2#7, "
        + "coalesce(concat_ws( , w#4), ) AS s2#8, "
        + "coalesce(element_at(w#4, 1), x) AS e#9]"
    )
    assert got == {"w#4"}
    # ...while a value-passing argument anywhere in the list still taints
    assert "w5#9" in token_array_columns(
        seed + "Project [coalesce(null, w#4, array()) AS w5#9]"
    )
    # nested value-preserving argument: coalesce(CASE ... THEN w#4 ...)
    assert "w6#10" in token_array_columns(
        seed
        + "Project [coalesce(CASE WHEN (x#2 > 0) THEN w#4 ELSE null END, array()) AS w6#10]"
    )
