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
