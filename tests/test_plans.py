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
