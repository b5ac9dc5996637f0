"""Classic multi-join analytics (TPC-H-shaped benchmark queries).

The reference has no multi-join analytics; these exist because the engine's
benchmark surface needs plans whose SHAPE is the thing being graded:
join ordering, broadcast vs shuffle choice, partial aggregation, top-k
without global sort. Each is a well-known TPC-H pattern phrased over the
driver fixtures, oracle-checked, and worth reading with
``.explain('formatted')`` next to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.functions.numeric import stable_round
from tbench_agentic_data_pipeline_spark.registry import query


@query(
    "q3_shipping_priority",
    survey="J4,A4,W2",
    oracle="""
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S')          AS o_orderdate_s,
               o.o_orderpriority
        FROM customer c
        JOIN orders o    ON c.c_custkey = o.o_custkey
        JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two fact joins → grouped
    revenue → top-10 without global sort (TakeOrderedAndProject). The
    segment filter prunes customers before the join; both join keys
    shuffle-partition the facts once each, AQE handling skew."""
    customer = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate_s"),
            "o_orderpriority",
        )
    )


@query(
    "q5_local_supplier_volume",
    survey="J5,A4",
    oracle="""
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the snowflake chain with a same-nation co-location
    constraint. region/nation/supplier broadcast (pinned); only the
    customer⋈orders⋈lineitem spine shuffles. The region filter reaches
    the nation join through broadcast pruning."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("n_name"))
    )


@query(
    "q18_large_orders",
    survey="J1,A4,W2",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey,
               ROUND(SUM(l.l_quantity), 2) AS total_qty
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        GROUP BY o.o_orderkey, o.o_custkey
        ORDER BY total_qty DESC, o.o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate subquery semi-joined
    back to the facts. The subquery aggregates BEFORE the semi-join, so
    the filter set is |qualifying orders|, and AQE turns the semi-join
    broadcast when that set collapses (it does — selective HAVING)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.col("o_orderkey"))
    )


@query(
    "a_rollup_revenue",
    survey="A1,A4,J5",
    oracle="""
        SELECT r.r_name, n.n_name,
               COUNT(*) AS n_customers,
               ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def a_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (region → nation → grand total) — one pass,
    all three grouping levels share the same shuffle (an engine-surface
    extension; the reference computes each level with separate loops)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "a_pivot_type_by_dow",
    survey="A1,A2,F16",
    oracle="""
        SELECT event_type,
               CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
                    AS BIGINT) AS weekend,
               CAST(SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6) THEN 1 ELSE 0 END)
                    AS BIGINT) AS weekday
        FROM events
        GROUP BY event_type
    """,
)
def a_pivot_type_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: event counts spread into weekend/weekday columns.
    The pivot value set is declared, so the plan is a single partial+final
    aggregate — never a second pass to discover categories."""
    events = load_table(spark, sf_dir, "events")
    is_weekend = F.dayofweek("ts").isin(1, 7)  # Spark: 1=Sunday, 7=Saturday
    return (
        events.withColumn("dow", F.when(is_weekend, "weekend").otherwise("weekday"))
        .groupBy("event_type")
        .pivot("dow", ["weekend", "weekday"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "a_percentiles",
    survey="A4,A8",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5) * (1 + 5e-13), 4)  AS p50,
               ROUND(quantile_cont(value, 0.9) * (1 + 5e-13), 4)  AS p90,
               ROUND(MAX(value), 2)                               AS max_value
        FROM events
        GROUP BY event_type
    """,
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``). At 100 TB swap in ``percentile_approx``
    (t-digest sketch, mergeable partials) — exact percentile materializes
    per-group sorted values and is the known scale cliff; stable_round
    guards the interpolation arithmetic."""
    from tbench_agentic_data_pipeline_spark.functions.numeric import stable_round

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        stable_round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


@query(
    "a_approx_percentile",
    survey="A4,A8",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5) * (1 + 5e-13), 4) AS p50_exact,
               ROUND(quantile_cont(value, 0.9) * (1 + 5e-13), 4) AS p90_exact,
               TRUE AS p50_in_band,
               TRUE AS p90_in_band
        FROM events
        GROUP BY event_type
    """,
)
def a_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_approx`` (t-digest-style sketch, mergeable partials) —
    the operator that replaces exact percentiles at 100 TB, where exact
    ``percentile`` materializes per-group sorted values (the scale cliff
    ``a_percentiles`` documents).

    Sketch outputs are not engine-portable, so the oracle checks a RANK
    TOLERANCE CONTRACT (the same trick as ``a_approx_distinct``): Spark
    emits the exact p50/p90 (pinning the data) plus flags that the sketch
    estimate lands inside the exact [p45,p55] / [p85,p95] value band — a
    ±5%-of-rank window, while accuracy=10000 bounds the sketch's rank
    error at 0.01% of n, so no data-dependent estimate at an unseen scale
    factor can flip the driver's hash. The oracle emits the exact values
    and literal TRUE."""
    events = load_table(spark, sf_dir, "events")
    ap = F.expr("percentile_approx(value, array(0.5D, 0.9D), 10000)")
    ex = F.expr(
        "percentile(value, array(0.45D, 0.5D, 0.55D, 0.85D, 0.9D, 0.95D))"
    )
    return (
        events.groupBy("event_type")
        .agg(ap.alias("ap"), ex.alias("ex"))
        .select(
            "event_type",
            stable_round(F.col("ex")[1], 4).alias("p50_exact"),
            stable_round(F.col("ex")[4], 4).alias("p90_exact"),
            (
                (F.col("ap")[0] >= F.col("ex")[0])
                & (F.col("ap")[0] <= F.col("ex")[2])
            ).alias("p50_in_band"),
            (
                (F.col("ap")[1] >= F.col("ex")[3])
                & (F.col("ap")[1] <= F.col("ex")[5])
            ).alias("p90_in_band"),
        )
    )


@query(
    "a_stats_gauntlet",
    survey="A4",
    oracle="""
        SELECT event_type,
               ROUND(stddev_samp(value) * (1 + 5e-13), 4)      AS sd,
               ROUND(var_samp(value) * (1 + 5e-13), 4)         AS var,
               ROUND(corr(value, CAST(user_id AS DOUBLE)) * (1 + 5e-13), 4)
                                                               AS corr_uid
        FROM events
        GROUP BY event_type
    """,
)
def a_stats_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation) — single-pass
    co-moment accumulation in both engines; rounded via stable_round since
    accumulation order is engine-internal."""
    from tbench_agentic_data_pipeline_spark.functions.numeric import stable_round

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        stable_round(F.stddev_samp("value"), 4).alias("sd"),
        stable_round(F.var_samp("value"), 4).alias("var"),
        stable_round(
            F.corr("value", F.col("user_id").cast("double")), 4
        ).alias("corr_uid"),
    )


@query(
    "q10_returned_items",
    survey="J4,A4,W2",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20. The
    returnflag filter pushes into the lineitem scan; nation broadcasts;
    the aggregate keys on the customer so the shuffle is |customers|."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@query(
    "q4_order_priority",
    survey="J1,A1",
    oracle="""
        SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery as a left-semi join with
    a mixed equi + non-equi condition (the fixture lacks commit/receipt
    dates, so "late" is l_shipdate > o_orderdate). The quarter filter
    prunes orders at the scan; the semi-join never widens rows, so the
    priority histogram aggregates only qualifying orders."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    survey="P2,A3",
    oracle="""
        SELECT ROUND((SUM(l_extendedprice * l_discount)) * (1 + 5e-13), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT)                    AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical scan-only aggregate — every predicate
    pushes to the parquet scan, no join, no grouping key, one partial+final
    agg. At 100 TB this is the query that proves pushdown works: the scan
    should read 4 columns and skip whole row groups on l_shipdate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q12_priority_by_linestatus",
    survey="J4,A4",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact equi-join then conditional two-way
    counts (the fixture lacks l_shipmode, so l_linestatus is the grouping
    key). The year filter prunes lineitem before the join; both CASE
    branches fold into ONE aggregation pass over the joined rows."""
    urgent = ("1-URGENT", "2-HIGH")
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    is_urgent = F.col("o_orderpriority").isin(*urgent)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_urgent, 1).otherwise(0)).alias("high_line_count"),
            # NOT the complement of is_urgent via .otherwise(): a NULL
            # priority must count 0 in BOTH columns (SQL `NOT IN` yields
            # NULL -> ELSE 0), so the negated predicate gets its own CASE.
            F.sum(F.when(~is_urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    survey="J5,A4,F21",
    oracle="""
        SELECT ROUND((100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount))) * (1 + 5e-13),
                     2) AS promo_pct,
               CAST(COUNT(*) AS BIGINT)                          AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month. The part table is a
    dimension — broadcast it so the month-pruned lineitem scan never
    shuffles; the conditional ratio folds into one aggregation."""
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .agg(
            stable_round(100.0 * F.sum(promo_rev) / F.sum(rev), 2).alias(
                "promo_pct"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "a_retention_cohorts",
    survey="A1,A4,J4,F16",
    oracle="""
        WITH s AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cw
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        cs AS (
            SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM s GROUP BY cw
        ),
        a AS (
            SELECT DISTINCT s.user_id, s.cw,
                   date_diff('day', s.cw, date_trunc('week', e.ts)) // 7
                       AS week_offset
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE date_trunc('week', e.ts) >= s.cw
        ),
        r AS (
            SELECT cw, week_offset, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM a GROUP BY cw, week_offset
        )
        SELECT strftime(r.cw, '%Y-%m-%d')          AS cohort_week,
               CAST(r.week_offset AS BIGINT)       AS week_offset,
               r.n_users,
               cs.cohort_size,
               CAST((r.n_users * 1000) // cs.cohort_size AS BIGINT)
                                                    AS retention_milli
        FROM r JOIN cs ON r.cw = cs.cw
    """,
)
def a_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by signup week, counted as
    retained in every later week they produce any event. The event-log
    analytics staple (and the A1/A4 histogram+rate shapes composed).

    Plan: signup-week per user (one keyed agg), events joined back on
    user_id (AQE reuses the partitioning), distinct (user, offset), then
    a stratum-sized rollup; cohort sizes broadcast back onto the result.
    """
    events = load_table(spark, sf_dir, "events")
    s = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    cohort_sizes = s.groupBy("cw").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    aw = F.date_trunc("week", F.col("ts"))
    a = (
        events.join(s, "user_id")
        .where(aw >= F.col("cw"))
        .select(
            "user_id",
            "cw",
            (F.datediff(aw, F.col("cw")) / 7).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    r = a.groupBy("cw", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return r.join(F.broadcast(cohort_sizes), "cw").select(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_users",
        "cohort_size",
        F.expr("(n_users * 1000) div cohort_size").cast("bigint").alias(
            "retention_milli"
        ),
    )


@query(
    "a_value_histogram",
    survey="A1,A2,A3",
    oracle="""
        WITH bins AS (
            SELECT t.event_type, b.bin
            FROM (SELECT DISTINCT event_type FROM events) t,
                 (SELECT unnest(range(0, 10)) AS bin) b
        ),
        c AS (
            SELECT event_type,
                   LEAST(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT bins.event_type,
               CAST(bins.bin AS BIGINT)       AS bin,
               CAST(bins.bin * 50 AS BIGINT)  AS lo,
               CAST(bins.bin * 50 + 50 AS BIGINT) AS hi,
               COALESCE(c.n, 0)               AS n
        FROM bins LEFT JOIN c
          ON bins.event_type = c.event_type AND bins.bin = c.bin
    """,
)
def a_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled fixed-width histogram of event values per type (10
    bins of 50, top bin clamped). The A1 zero-fill discipline applied to
    numeric binning: the bin dimension is generated, not discovered, so
    empty bins appear and the plan is one corpus aggregate plus a
    broadcast join against a 50-row dim."""
    events = load_table(spark, sf_dir, "events")
    bin_col = F.least(F.floor(F.col("value") / 50).cast("bigint"), F.lit(9))
    c = events.groupBy(
        "event_type", bin_col.alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    bins = (
        events.select("event_type")
        .distinct()
        .crossJoin(spark.range(0, 10).select(F.col("id").alias("bin")))
    )
    return (
        bins.join(c, ["event_type", "bin"], "left")
        .select(
            "event_type",
            F.col("bin").cast("bigint").alias("bin"),
            (F.col("bin") * 50).cast("bigint").alias("lo"),
            (F.col("bin") * 50 + 50).cast("bigint").alias("hi"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Round-3 additions: the hard TPC-H shapes — decorrelation, disjunctive
# pushdown, scalar-subquery joins, grouping sets. Adapted to the driver
# fixture schema (no partsupp/commitdate/container columns).
# ---------------------------------------------------------------------------


@query(
    "q7_nation_volume",
    survey="J5,A4,F16",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation table joins in TWO ROLES (supplier side and
    customer side) — both broadcast; the disjunctive two-direction
    predicate applies after both roles resolve, so Catalyst pushes each
    nation-name filter into its own broadcast build side. Only the
    order⋈lineitem spine shuffles."""
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    survey="J5,A4,F21",
    oracle="""
        SELECT l_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE 0 END), 2) AS nation_revenue,
               ROUND(SUM(volume), 2)          AS total_revenue
        FROM (
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n1.n_name AS supp_nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            JOIN region r   ON n2.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        ) all_nations
        GROUP BY l_year
        ORDER BY l_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    revenue by order year. Emits numerator and denominator as two
    rounded sums (exact cross-engine hashing; the ratio is a trivial
    client-side divide). Every dim broadcasts; the conditional sum is a
    map-side CASE feeding ONE partial aggregate — not two scans."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    )
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(
        nation.join(
            region.where(F.col("r_name") == "ASIA"),
            nation.n_regionkey == region.r_regionkey,
        ).select(F.col("n_nationkey").alias("n2_key"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0)
                ), 2,
            ).alias("nation_revenue"),
            F.round(F.sum(volume), 2).alias("total_revenue"),
        )
        .orderBy("l_year")
    )


@query(
    "q15_top_supplier",
    survey="A4,W2,J5",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier half-year revenue, keep the max.
    The scalar subquery decorrelates to a broadcast single-row join (the
    MAX over the same aggregate, reused); comparison happens on the
    ROUNDED cents both sides so the equality is exact. The revenue
    aggregate shuffles once on l_suppkey; supplier broadcasts."""
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    revenue = lineitem.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    top = F.broadcast(revenue.agg(F.max("total_revenue").alias("__max_rev")))
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        revenue.join(top, revenue.total_revenue == top.__max_rev)
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    survey="J4,A4,P2",
    oracle="""
        WITH part_avg AS (
            SELECT l_partkey, AVG(l_quantity) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN part_avg a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1' AND p.p_size < 10
          AND l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated AVG subquery decorrelated into a
    per-part aggregate joined back to the fact — one shuffle on partkey
    for the aggregate, then the filtered fact joins it (and the brand/
    size-filtered part dim, broadcast). Quantities are integer-valued
    doubles, so AVG is exact in both engines and the 0.5× threshold
    compare cannot drift. (Fixture has no p_container; brand+size is the
    selective stand-in.)"""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 10)
        )
    )
    part_avg = lineitem.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(part_avg, lineitem.l_partkey == F.col("pa_key"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_revenue",
    survey="P2,A4",
    oracle="""
        SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                   AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd brand/size/quantity windows. The
    union-of-ranges predicate straddles both tables, but its
    single-table implications ARE derivable and Catalyst derives them:
    the part scan gets the brand/size disjunction, the lineitem scan the
    quantity envelope (`l_quantity BETWEEN 1 AND 30` pushed to parquet),
    and the residual OR evaluates after the broadcast join."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q22_dormant_customers",
    survey="J2,A4,P4",
    oracle="""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT)      AS numcust,
               ROUND(SUM(c.c_acctbal), 2)    AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
              )
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no RECENT order, by
    segment. The scalar AVG subquery broadcasts as a single-row join;
    NOT EXISTS is a LEFT ANTI join on o_custkey (J2) whose date filter
    pushes into the orders scan; then one grouped aggregate. (Fixture
    has no c_phone, so the segment plays the country-code role, and
    every customer has SOME order, so dormancy is recency-based.)"""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = F.broadcast(
        customer.where(F.col("c_acctbal") > 0.0).agg(
            F.avg("c_acctbal").alias("__avg_bal")
        )
    )
    return (
        customer.join(avg_bal, customer.c_acctbal > F.col("__avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "a_cube_priority_status",
    survey="A1,A3,A7",
    oracle="""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL')   AS status,
               CAST(COUNT(*) AS BIGINT)         AS n_orders,
               ROUND(SUM(o_totalprice), 2)      AS revenue
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
        ORDER BY priority, status
    """,
)
def a_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping-set combinations —
    per-cell, per-priority, per-status, grand total — in ONE pass. Spark
    plans this as an Expand (each input row fans to 4 grouping rows)
    feeding a single partial+final hash aggregate: no repeated scans, and
    shuffle bytes scale with the cube's cell count, not input rows. NULL
    grouping keys are labeled 'ALL' (fixture columns are never null, so
    the label is unambiguous)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
        .orderBy("priority", "status")
    )


@query(
    "q2_min_cost_supplier",
    survey="J4,J5,A7,W1",
    oracle="""
        WITH offers AS (
            SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice,
                   s.s_name, s.s_acctbal, n.n_name
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            JOIN region r   ON r.r_regionkey = n.n_regionkey
            JOIN part p     ON p.p_partkey = l.l_partkey
            WHERE r.r_name = 'EUROPE'
              AND p.p_type = 'ECONOMY' AND p.p_size BETWEEN 10 AND 20
        ),
        best AS (
            SELECT l_partkey, MIN(l_extendedprice) AS min_price
            FROM offers GROUP BY l_partkey
        )
        SELECT DISTINCT o.l_partkey AS p_partkey, o.s_name, o.n_name,
               o.s_acctbal, o.l_extendedprice AS min_price
        FROM offers o
        JOIN best b ON b.l_partkey = o.l_partkey
                   AND o.l_extendedprice = b.min_price
        ORDER BY p_partkey, s_name
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated MIN subquery ("the supplier whose
    price IS the minimum for that part") decorrelated the idiomatic
    Spark way — a MIN window over partkey and a `price = min` filter,
    which is the agg-plus-join-back plan fused into ONE partkey
    exchange over ONE fact scan (the naive decorrelation scans the
    offers lineage twice and shuffles three times; measured 5→3
    exchanges, 20→4 plan scans). The fixture has no partsupp, so a
    supplier's "offer" for a part is its lineitem l_extendedprice —
    taken verbatim (no arithmetic), so the MIN and the equality filter
    are bit-exact in both engines. Dims (region→nation→supplier chain,
    filtered part) broadcast. Ties (several suppliers at the min) are
    all kept — DISTINCT because a supplier may hit the min price twice
    for the same part."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_type") == "ECONOMY") & F.col("p_size").between(10, 20)
        )
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .select("l_partkey", "s_name", "n_name", "s_acctbal", "l_extendedprice")
    )
    min_price = F.min("l_extendedprice").over(Window.partitionBy("l_partkey"))
    return (
        offers.withColumn("min_price", min_price)
        .where(F.col("l_extendedprice") == F.col("min_price"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            "s_acctbal",
            F.col("min_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_name")
    )


@query(
    "q9_profit_by_nation_year",
    survey="J4,J5,A1,A4",
    oracle="""
        SELECT n.n_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity * 0.1)
                     * (1 + 5e-13), 2) AS sum_profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%gear%'
        GROUP BY n.n_name, o_year
        ORDER BY n.n_name, o_year DESC
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year through a
    five-way join. The fixture has no partsupp, so unit cost is proxied
    as 10% of p_retailprice (both engines compute the identical
    expression). Plan shape is the point: part (name-filtered), supplier
    and nation all BROADCAST — the only shuffles are the lineitem⋈orders
    orderkey join and the final group-by. The %gear% filter prunes the
    fact through the broadcast hash join before the orderkey shuffle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    )
    nation = load_table(spark, sf_dir, "nation")
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(stable_round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("n_name", F.col("o_year").desc())
    )


@query(
    "q11_important_part_value",
    survey="A3,A4,J5",
    oracle="""
        WITH per_part AS (
            SELECT l_partkey,
                   SUM(l_extendedprice * (1 - l_discount)) AS value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, ROUND(value, 2) AS value
        FROM per_part
        WHERE value > (SELECT 1.2 * SUM(value) / COUNT(*) FROM per_part)
        ORDER BY value DESC, l_partkey
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING over a GLOBAL scalar — keep the parts
    whose revenue exceeds 1.2× the MEAN per-part revenue. The
    multiplier-of-mean form is scale-free (a fixed fraction of total
    degenerates as the part count grows: 0.001× total excludes every
    part once parts number >1200), stays selective-but-non-degenerate at
    every fixture SF, and the nearest part sits ≥1.9e-5 relative from
    the cut — far outside float sum-order noise. The scalar
    subquery is a one-row aggregate broadcast into the per-part
    aggregate's output as a join-free-threshold (cross join of a
    single row — Spark plans BroadcastNestedLoopJoin over 1 row, not a
    cartesian). The scalar derives from the per-part aggregate itself
    (mean of group sums = total/num_parts), so its partkey shuffle is
    a ReusedExchange of the main branch rather than a second fact
    scan + count-distinct."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = lineitem.groupBy("l_partkey").agg(revenue.alias("value"))
    total = F.broadcast(
        per_part.agg(
            (F.sum("value") * 1.2 / F.count(F.lit(1))).alias("__threshold")
        )
    )
    return (
        per_part.join(total, per_part.value > F.col("__threshold"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "q13_order_count_distribution",
    survey="J3,A1,A7",
    oracle="""
        WITH c_orders AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
                   ON o.o_custkey = c.c_custkey
                  AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT CAST(c_count AS BIGINT)  AS c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the outer-join count distribution — customers
    (INCLUDING those with zero matching orders, hence LEFT join, hence
    COUNT(o_orderkey) not COUNT(*)) bucketed by how many non-urgent
    orders they placed, then a histogram of bucket sizes. The priority
    predicate lives in the JOIN condition, not a WHERE — pushing it to
    WHERE would silently drop zero-order customers. Two shuffles: the
    custkey join/aggregate and the tiny c_count histogram."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(
        orders,
        (customer.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy(F.col("c_count").cast("bigint").alias("c_count"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q16_supplier_part_variety",
    survey="J2,A7,A8",
    oracle="""
        SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT)   AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type  <> 'PROMO'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN (anti-join against an excluded-supplier
    list — negative balance plays the 'customer complaints' role) +
    COUNT(DISTINCT supplier) per part attribute group. The exclusion
    list is tiny → broadcast LEFT ANTI; part is negated-predicate
    filtered and broadcast; the only real shuffle is the distinct
    aggregate on the (brand, type, size) grouping."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
    )
    excluded = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        lineitem.join(excluded, lineitem.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_dominant_suppliers",
    survey="J1,A4,J5",
    oracle="""
        WITH shipped AS (
            SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS qty
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_name LIKE 'small%'
              AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
            GROUP BY l.l_partkey, l.l_suppkey
        ),
        totals AS (
            SELECT l_partkey, SUM(qty) AS total_qty
            FROM shipped GROUP BY l_partkey
        )
        SELECT s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey IN (
            SELECT sh.l_suppkey
            FROM shipped sh
            JOIN totals t ON t.l_partkey = sh.l_partkey
            WHERE sh.qty > 0.5 * t.total_qty
        )
        ORDER BY s.s_name
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a semi-join chain whose inner side is ITSELF an
    aggregate over a filtered join — suppliers who, for some
    small-named part, shipped more than half that part's 1998 volume
    (the availqty>half-shipped predicate re-expressed without
    partsupp). Quantities are integer-valued doubles → sums exact, and
    0.5×total is the same IEEE multiply in both engines. Plan: part
    filter broadcasts into one dated lineitem scan; an explicit
    repartition on partkey makes ONE exchange serve both the
    (partkey, suppkey) aggregate (hash(pk) co-locates every (pk, sk)
    group) and the per-part total — phrased as a SUM window so the
    totals side is neither re-aggregated nor re-joined; then a LEFT
    SEMI into the 100-row supplier dim. Nothing rescans the fact
    (naive agg+join-back: 7 exchanges, 12 scans → this plan: 3 and 4)."""
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    )
    shipped = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    total_qty = F.sum("qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        shipped.withColumn("total_qty", total_qty)
        .where(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    supplier = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        supplier.join(dominant, supplier.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q21_sole_late_supplier",
    survey="J1,J2,A1,W2",
    oracle="""
        WITH l1 AS (
            SELECT l.l_orderkey, l.l_suppkey
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
              )
          AND NOT EXISTS (
                SELECT 1 FROM l1 l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
              )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT-EXISTS chain — late line items
    (shipped >90 days after the order date — the fixture's stand-in for
    receipt>commit) on finished multi-supplier orders where THIS
    supplier was the only late one. EXISTS(other supplier) is a LEFT
    SEMI self-join on orderkey with a suppkey-inequality residual;
    NOT EXISTS(other LATE supplier) is the same shape as a LEFT ANTI
    against the late set itself. All three lineitem-derived sides
    shuffle on l_orderkey, so the semi/anti joins co-locate under one
    partitioning; supplier (100 rows) broadcasts for the name."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    late = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    others = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    late_others = late.alias("l3")
    qualified = (
        l1.join(
            others,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        qualified.join(supplier, F.col("l1.l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
