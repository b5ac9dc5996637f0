"""Join operators (SURVEY.md §2.3, J1-J5).

The reference's five join semantics are Python set-membership loops
(semi-join ``scripts/create_verified_csv.py:29-64``; anti-join
``scripts/validate_all_prod_dps.py:94-133``; full-outer reconciliation
``shared_tools/validators.py:293-300``; parent→children self-join
``task_manager/task_manager.py:326-346``; vocabulary validation
``shared_tools/categories_tags.py:43-68``). All are equi-joins on short
keys, so the Spark plans we want are broadcast-hash joins whenever one side
is dimension-sized, and AQE-managed shuffled hash joins otherwise.

Scale notes:
- J1/J2 phrased fact-to-fact (customer × orders) deliberately: at 100 TB
  the semi/anti side can exceed broadcast range, and the shuffled
  left-semi/left-anti plan with AQE skew handling is the design point.
- J5 pins ``broadcast()`` on the dims — never shuffle a 25-row table's
  join 100 TB of facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Reusable operator API
# ---------------------------------------------------------------------------


def semi_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """J1: keep rows whose key appears in ``keys`` (verified-rows filter,
    ``create_verified_csv.py:59-64``)."""
    return df.join(keys, on=on, how="left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """J2: keep rows whose key does NOT appear (idempotent re-init,
    ``validate_all_prod_dps.py:117-118``)."""
    return df.join(keys, on=on, how="left_anti")


def reconcile_keys(
    left: DataFrame, right: DataFrame, on: str,
    left_flag: str = "in_left", right_flag: str = "in_right",
) -> DataFrame:
    """J3: full-outer key reconciliation with per-side presence flags
    (weights-vs-tests report, ``validators.py:293-300``)."""
    lhs = left.select(on).distinct().withColumn(left_flag, F.lit(True))
    rhs = right.select(on).distinct().withColumn(right_flag, F.lit(True))
    return lhs.join(rhs, on=on, how="full_outer").select(
        on,
        F.coalesce(F.col(left_flag), F.lit(False)).alias(left_flag),
        F.coalesce(F.col(right_flag), F.lit(False)).alias(right_flag),
    )


def children_counts(
    parents: DataFrame, children: DataFrame, parent_key: str, child_fk: str
) -> DataFrame:
    """J4: per-parent child counts (``task_manager.py:326-346``,
    ``data_pipeline.py:169-171``). Aggregate BEFORE the join: the shuffle
    carries (fk, count) partials, not raw child rows."""
    counts = children.groupBy(F.col(child_fk).alias(parent_key)).agg(
        F.count(F.lit(1)).alias("n_children")
    )
    return (
        parents.join(counts, on=parent_key, how="left")
        .withColumn("n_children", F.coalesce(F.col("n_children"), F.lit(0)))
    )


def validate_against_dim(
    df: DataFrame, dim: DataFrame, on: str, valid_flag: str = "is_valid"
) -> DataFrame:
    """J5: FK membership against a broadcast vocabulary
    (``categories_tags.py:43-45``)."""
    marked = F.broadcast(dim.select(on).distinct().withColumn("__hit", F.lit(True)))
    return df.join(marked, on=on, how="left").withColumn(
        valid_flag, F.coalesce(F.col("__hit"), F.lit(False))
    ).drop("__hit")


# ---------------------------------------------------------------------------
# Registered oracle-checkable queries
# ---------------------------------------------------------------------------


@query(
    "j1_semi_join_customers_with_orders",
    survey="J1",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def j1_semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: left-semi 'verified rows' filter (``create_verified_csv.py``) —
    customers that placed at least one order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_join(customer, orders, "c_custkey").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "j2_anti_join_customers_without_orders",
    survey="J2,ST6",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
    """,
)
def j2_anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left-anti idempotent-init filter (``validate_all_prod_dps.py:94-133``)
    — customers with no urgent order yet; re-running appends nothing twice."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(customer, orders, "c_custkey").select("c_custkey", "c_name")


@query(
    "j3_full_outer_reconciliation",
    survey="J3,SO3",
    oracle="""
        WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
             sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        SELECT
            COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
            (cn.nationkey IS NOT NULL) AS in_left,
            (sn.nationkey IS NOT NULL) AS in_right,
            CASE
                WHEN cn.nationkey IS NULL THEN 'right_only'
                WHEN sn.nationkey IS NULL THEN 'left_only'
                ELSE 'both'
            END AS status
        FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def j3_full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: full-outer key reconciliation (``validators.py:293-300`` reports
    tests-missing-weights AND weights-missing-tests in one pass) — nations
    with customers vs nations with suppliers."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    rec = reconcile_keys(customer, supplier, "nationkey")
    return rec.withColumn(
        "status",
        F.when(~F.col("in_left"), "right_only")
        .when(~F.col("in_right"), "left_only")
        .otherwise("both"),
    )


@query(
    "j4_parent_child_counts",
    survey="J4",
    oracle="""
        SELECT o.o_orderkey, o.o_orderstatus,
               CAST(COALESCE(c.n_children, 0) AS BIGINT) AS n_children
        FROM orders o
        LEFT JOIN (
            SELECT l_orderkey, COUNT(*) AS n_children
            FROM lineitem GROUP BY l_orderkey
        ) c ON o.o_orderkey = c.l_orderkey
    """,
)
def j4_parent_child_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: parent→children enrichment (``task_manager.py:326-346``) —
    per-order lineitem counts, aggregated before the join so the shuffle
    carries partial counts only."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return children_counts(orders, lineitem, "o_orderkey", "l_orderkey").select(
        "o_orderkey", "o_orderstatus", "n_children"
    )


@query(
    "j5_broadcast_dim_join",
    survey="J5,A4",
    oracle="""
        SELECT n.n_name, r.r_name,
               COUNT(*) AS n_customers,
               ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name
    """,
)
def j5_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: broadcast dimension validation join (``categories_tags.py:43-68``
    checks category/tag vocabularies) — customers rolled up through the
    nation→region snowflake. Both dims are pinned broadcast: the fact side
    never shuffles for the join, only for the final (tiny) aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )
