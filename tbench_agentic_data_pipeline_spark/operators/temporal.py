"""Temporal join operators Spark lacks natively: as-of join and range join.

Both are expressed as compositions of existing DataFrame ops (the
prompt-preferred path) rather than UDFs:

- **as-of join**: union the two tagged sides, one window pass per key
  carrying the last left-side row forward (``last(..., ignorenulls)``),
  keep right-side rows. ONE shuffle on the join key, no range explosion,
  identical semantics to pandas ``merge_asof`` / DuckDB ``ASOF JOIN``.
  This is the standard scale formulation: a naive
  ``ON a.key = b.key AND a.ts <= b.ts`` theta-join explodes to the full
  per-key cross product before taking max(ts) - quadratic per key -
  while the union+window shape is linear and sorts within partitions.

- **range join**: bin the time axis into fixed buckets; the interval side
  explodes to the buckets it covers, the point side computes its single
  bucket, and an EQUI-join on (key, bucket) + an exact containment filter
  replaces the theta-join. Fan-out is bounded by interval_len/bucket_len,
  so the join stays hash-partitioned at any scale even when the interval
  side is far too large to broadcast (when it IS tiny, AQE/broadcast
  does the right thing anyway - asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.functions.numeric import stable_round
from tbench_agentic_data_pipeline_spark.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    carry: list[str],
) -> DataFrame:
    """For every RIGHT row, attach the latest LEFT row with the same
    ``key`` and left.ts <= right.ts (a left row AT the right ts wins,
    matching DuckDB ASOF semantics; among LEFT rows tied on (key, ts)
    the greatest carry tuple wins — deterministic where pandas/DuckDB
    leave the pick input-order-dependent). Returns the right rows plus
    ``carry`` columns from the matched left row (null when no left row
    precedes).

    One shuffle: both sides exchange once on ``key`` for the window sort.

    The carry columns travel as ONE struct, not per-column: per-column
    ``last(ignorenulls)`` would skip a matched left row's NULL field and
    reach back to an OLDER left row for just that column, stitching a
    chimera of two rows (and could not distinguish "no preceding left
    row" from "preceding row with NULL value"). The struct is non-null
    exactly when a left row exists, so the matched row arrives whole —
    the row semantics of DuckDB ``ASOF JOIN`` / pandas ``merge_asof``.

    RESTRICTION: ``carry`` columns must be ORDERABLE types (no maps) —
    the struct serves as the deterministic tie-break sort key below; for
    a map-typed carry, pass a sortable surrogate (e.g. its sorted
    entries via ``map_entries`` + ``array_sort``) alongside it.
    """
    lt = left.select(
        F.lit(0).alias("_side"),
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.struct(*[F.col(c).alias(c) for c in carry]).alias("_carry"),
    )
    rt = right.select(
        F.lit(1).alias("_side"),
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(None).cast(lt.schema["_carry"].dataType).alias("_carry"),
        *right.columns,
    )
    # _carry as the FINAL sort key: left rows tied on (key, ts) would
    # otherwise be picked nondeterministically by last() (partition-order
    # dependent). Greatest-struct wins — an arbitrary but DETERMINISTIC
    # rule, stated in the docstring.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_carry")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt, allowMissingColumns=True).select(
        "*", F.last("_carry", ignorenulls=True).over(w).alias("_asof")
    )
    return carried.where(F.col("_side") == 1).select(
        *right.columns,
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in carry],
    )


@query(
    "j_asof_last_view",
    survey="J4,W1,F17",
    oracle="""
        WITH views AS (
            -- pre-dedup to ONE view per (user_id, ts): DuckDB ASOF's pick
            -- among equal timestamps is unspecified, Spark's tie-break is
            -- greatest carry struct = max event_id (event_id leads the
            -- struct). Keeping only that row makes both engines agree
            -- even if a future fixture contains duplicate view times.
            SELECT user_id, ts, event_id, value FROM (
                SELECT user_id, ts, event_id, value,
                       row_number() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'view'
            ) WHERE rn = 1
        ),
        clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        )
        SELECT c.event_id                                   AS click_id,
               c.user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S')          AS click_ts,
               v.event_id                                   AS asof_event_id,
               ROUND((v.value) * (1 + 5e-13), 2)            AS asof_value,
               date_diff('second', v.ts, c.ts)              AS secs_since_view
        FROM clicks c
        ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def j_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event matched to the same user's most
    recent view event at-or-before it (attribution, the canonical as-of
    workload). Spark has no ASOF JOIN; :func:`asof_join` composes it from
    a tagged union + one keyed window pass - linear, one exchange."""
    events = load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        views,
        clicks.withColumnRenamed("event_id", "click_id"),
        key="user_id",
        ts="ts",
        carry=["event_id", "value", "ts"],
    )
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("asof_event_id"),
        stable_round(F.col("asof_value"), 2).alias("asof_value"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")
        ).cast("bigint").alias("secs_since_view"),
    )


# Range-join binning: 30-minute buckets over epoch seconds. Incident
# windows are 30 minutes long, so each interval covers <= 2 buckets -
# bounded fan-out by construction.
_BUCKET_S = 1800
_WINDOW_S = 1800


@query(
    "j_range_incident_window",
    survey="J4,A4,F17",
    oracle=f"""
        WITH incidents AS (
            SELECT event_id AS incident_id, event_type, ts AS start_ts,
                   ts + INTERVAL {_WINDOW_S} SECOND AS end_ts
            FROM events WHERE event_id % 500 = 0
        )
        SELECT i.incident_id,
               i.event_type,
               CAST(COUNT(*) AS BIGINT)               AS n_events,
               ROUND((SUM(e.value)) * (1 + 5e-13), 2) AS total_value
        FROM incidents i
        JOIN events e
          ON e.event_type = i.event_type
         AND e.ts >= i.start_ts AND e.ts < i.end_ts
        GROUP BY i.incident_id, i.event_type
    """,
)
def j_range_incident_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: count/sum the events falling inside each incident's
    [start, start+30min) window of the same type. Implemented as a
    BUCKETED equi-join - the interval side explodes to its covered
    30-minute buckets, the point side computes one bucket, and the exact
    containment predicate filters after the hash join. No theta-join, no
    broadcast requirement: both sides hash-partition on (type, bucket),
    fan-out bounded at 2 buckets per interval."""
    events = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")  # second-truncated: bucket key ONLY
    incidents = (
        events.where(F.col("event_id") % 500 == 0)
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("event_type").alias("i_type"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr(f"INTERVAL {_WINDOW_S} SECONDS")).alias("end_ts"),
            epoch.alias("start_s"),
        )
        .select(
            "*",
            # Candidate buckets from TRUNCATED seconds; the exact
            # containment check below uses the full-precision timestamps,
            # so truncation can only widen (never lose) candidates.
            F.explode(
                F.sequence(
                    F.floor(F.col("start_s") / _BUCKET_S),
                    F.floor((F.col("start_s") + _WINDOW_S) / _BUCKET_S),
                )
            ).alias("bucket"),
        )
    )
    points = events.select(
        "event_type",
        F.col("value"),
        F.col("ts").alias("ev_ts"),
        F.floor(epoch / _BUCKET_S).alias("bucket"),
    )
    return (
        points.join(
            incidents,
            (points.event_type == incidents.i_type)
            & (points.bucket == incidents.bucket),
        )
        .where((F.col("ev_ts") >= F.col("start_ts")) & (F.col("ev_ts") < F.col("end_ts")))
        .groupBy("incident_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
    )


_FUNNEL_HOURS = 24


@query(
    "events_funnel",
    survey="A4,J1,F17",
    oracle=f"""
        WITH v AS (
            SELECT user_id, MIN(ts) AS v_ts FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e
            JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts >= v.v_ts
              AND e.ts <= v.v_ts + INTERVAL {_FUNNEL_HOURS} HOUR
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e
            JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
              AND e.ts <= c.c_ts + INTERVAL {_FUNNEL_HOURS} HOUR
            GROUP BY e.user_id
        )
        SELECT v.user_id,
               strftime(v.v_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
               strftime(c.c_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
                         WHEN c.c_ts IS NOT NULL THEN 2
                         ELSE 1 END AS BIGINT)        AS stage
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per user, first view -> first click within 24 h of
    it -> first purchase within 24 h of that; emits each user's stage
    timestamps and the funnel depth reached (1..3).

    Three chained per-user MIN aggregates; every join and groupBy keys on
    user_id, so AQE reuses one hash partitioning across the whole chain
    and each stage's input shrinks monotonically (the classic funnel
    shape at event-log scale)."""
    events = load_table(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {_FUNNEL_HOURS} HOURS")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") >= F.col("v_ts")) & (F.col("ts") <= F.col("v_ts") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("ts") >= F.col("c_ts")) & (F.col("ts") <= F.col("c_ts") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    stage = (
        F.when(F.col("p_ts").isNotNull(), 3)
        .when(F.col("c_ts").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
            F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            stage.cast("bigint").alias("stage"),
        )
    )


@query(
    "events_attribution",
    survey="J1,A4,W4",
    oracle="""
        WITH p AS (
            SELECT user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        t AS (
            SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('click', 'view')
        ),
        att AS (
            SELECT p.user_id, p.value,
                   (SELECT t.event_type FROM t
                    WHERE t.user_id = p.user_id
                      AND t.ts < p.ts
                      AND t.ts >= p.ts - INTERVAL 7 DAY
                    ORDER BY t.ts DESC, t.event_type
                    LIMIT 1) AS channel
            FROM p
        )
        SELECT COALESCE(channel, 'direct')   AS channel,
               CAST(COUNT(*) AS BIGINT)      AS n_purchases,
               ROUND(SUM(value), 2)          AS total_value
        FROM att
        GROUP BY 1
        ORDER BY 1
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent click/view STRICTLY before it within a 7-day lookback
    (no touch → 'direct'), reported as per-channel purchase counts and
    revenue — the marketing-analytics staple next to the funnel.

    Shape: ONE tagged union of touches and purchases, one user_id
    exchange, one ordered window — ``last(touch, ignorenulls)`` over
    rows sorted (ts, purchases-before-touches-at-equal-ts, touch_type
    desc) reproduces exactly the oracle's correlated
    ORDER-BY-ts-DESC-type-ASC LIMIT 1 semantics, including strict
    ``t.ts < p.ts`` (the equal-ts touch sorts AFTER the purchase, so
    the preceding-rows frame can't see it) and the click-over-view
    tiebreak. No correlated per-purchase subquery survives at scale;
    the window is the decorrelated form. The channel aggregate is a
    3-row rollup."""
    events = load_table(spark, sf_dir, "events")
    touches = events.where(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts",
        F.col("event_type").alias("touch_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_p"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(None).cast("string").alias("touch_type"),
        "value",
        F.lit(1).alias("is_p"),
    )
    u = touches.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_p").desc(), F.col("touch_type").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_touch = F.last(
        F.when(F.col("is_p") == 0, F.struct("ts", "touch_type")),
        ignorenulls=True,
    ).over(w)
    att = (
        u.withColumn("__lt", last_touch)
        .where(F.col("is_p") == 1)
        .select(
            "value",
            F.when(
                F.col("__lt").isNotNull()
                & (F.col("__lt.ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
                F.col("__lt.touch_type"),
            ).otherwise(F.lit("direct")).alias("channel"),
        )
    )
    return (
        att.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("channel")
    )
