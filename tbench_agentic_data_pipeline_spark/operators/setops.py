"""Set operators (SURVEY.md §2.6, SO1-SO4).

Reference semantics: schema-aligning union (normalize rows to
``STANDARD_COLUMNS`` then append, ``add_dp_to_review.py:71-127``),
delete-by-key rewrite (``add_dp_to_review.py:130-151``), key-set difference
(``validators.py:293-300``), dictionary difference
(``categories_tags.py:66-68``). Spark-first: ``unionByName`` with
``allowMissingColumns=True`` IS the normalize-union; delete is a filtered
snapshot write (no in-place mutation at any scale); set differences are
``EXCEPT``/``array_except`` which Catalyst plans as aggregated anti-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Reusable operator API
# ---------------------------------------------------------------------------


def normalize_union(dfs: list[DataFrame], fill: object = None) -> DataFrame:
    """SO1: union under schema drift — missing columns become ``fill``
    (the reference fills ``''``, ``add_dp_to_review.py:71-79``; we default
    to NULL and let callers coalesce, since '' -as-null is a CSV-ism)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    if fill is not None:
        out = out.na.fill(fill)
    return out


def delete_by_key(df: DataFrame, key_col: str, keys: list[object]) -> DataFrame:
    """SO2: remove rows by key — a filter producing the next table snapshot
    (``add_dp_to_review.py:130-151``). For key sets too large to inline,
    pass a DataFrame to ``joins.anti_join`` instead."""
    return df.where(~F.col(key_col).isin(keys))


# ---------------------------------------------------------------------------
# Registered oracle-checkable queries
# ---------------------------------------------------------------------------


@query(
    "so1_union_by_name",
    survey="SO1,U8",
    oracle="""
        SELECT c_name AS name, ROUND(c_acctbal, 2) AS acctbal,
               c_nationkey AS nationkey, c_mktsegment AS mktsegment,
               'customer' AS kind
        FROM customer
        UNION ALL
        SELECT s_name AS name, ROUND(s_acctbal, 2) AS acctbal,
               s_nationkey AS nationkey, CAST(NULL AS VARCHAR) AS mktsegment,
               'supplier' AS kind
        FROM supplier
    """,
)
def so1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1: normalize-union of two drifted schemas (suppliers lack
    mktsegment) — ``unionByName(allowMissingColumns=True)`` fills NULL,
    mirroring ``normalize_datapoint`` (``add_dp_to_review.py:71-79``)."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("kind"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("kind"),
    )
    return normalize_union([customer, supplier])


@query(
    "so2_delete_by_key",
    survey="SO2,S7",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey NOT IN (42, 43, 44)
    """,
)
def so2_delete_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO2/S7: delete-by-key as a filtered next snapshot
    (``add_dp_to_review.py:130-151`` rewrites the whole CSV; we produce the
    new version declaratively and the sink commits it atomically)."""
    orders = load_table(spark, sf_dir, "orders")
    return delete_by_key(orders, "o_orderkey", [42, 43, 44]).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "so3_key_set_difference",
    survey="SO3,J3",
    oracle="""
        SELECT p_brand FROM part
        EXCEPT
        SELECT p_brand FROM part WHERE p_size > 48
    """,
)
def so3_key_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO3: key-set difference (missing-weights report direction,
    ``validators.py:293-300``) — brands with no large-size part. Catalyst
    plans EXCEPT as distinct + anti-join."""
    part = load_table(spark, sf_dir, "part")
    all_brands = part.select("p_brand")
    big_brands = part.where(F.col("p_size") > 48).select("p_brand")
    # subtract == SQL EXCEPT (distinct semantics), planned as agg + anti-join.
    return all_brands.subtract(big_brands)


@query(
    "so4_array_difference",
    survey="SO4,F4,F5",
    oracle="""
        SELECT doc_id,
               array_to_string(list_sort(list_distinct(list_filter(
                   string_split(text, ' '),
                   w -> NOT list_contains(
                       ['the', 'a', 'data', 'table', 'row', 'key'], w)
               ))), ' ') AS rare_words,
               len(list_distinct(list_filter(
                   string_split(text, ' '),
                   w -> NOT list_contains(
                       ['the', 'a', 'data', 'table', 'row', 'key'], w)
               ))) AS n_rare
        FROM documents
        WHERE doc_id < 100
    """,
)
def so4_array_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO4/F4: dictionary difference — tokens minus a stopword vocabulary
    (invalid tags = tags ∖ VALID_TAGS, ``categories_tags.py:66-68``).
    Sorted-distinct output, space-joined to a scalar string so external
    comparators that hash pandas cells never see an unhashable list; the
    vocabulary is a literal array (broadcast-equivalent constant)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = F.array(*[F.lit(w) for w in ["the", "a", "data", "table", "row", "key"]])
    rare = F.array_sort(F.array_except(F.split(F.col("text"), " "), vocab))
    return docs.where(F.col("doc_id") < 100).select(
        "doc_id",
        F.array_join(rare, " ").alias("rare_words"),
        F.size(rare).cast("bigint").alias("n_rare"),
    )


@query(
    "so5_intersect_nations",
    survey="SO3,J1",
    oracle="""
        SELECT c_nationkey AS n_nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY n_nationkey
    """,
)
def so5_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO-family completion: set INTERSECTION — nations with BOTH
    customers and suppliers. Spark plans ``intersect`` as a left-semi
    join over distinct keys (the same physical shape as J1, reached
    through the set-operator surface); both sides aggregate to their
    key sets before the join, so the exchange carries nation keys, not
    fact rows."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c_nations = customer.select(F.col("c_nationkey").alias("n_nationkey"))
    s_nations = supplier.select(F.col("s_nationkey").alias("n_nationkey"))
    return c_nations.intersect(s_nations).orderBy("n_nationkey")
