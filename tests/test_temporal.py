"""As-of / range join semantics and plan-shape tests. Value parity with
DuckDB (its native ASOF JOIN / inequality join) is in test_oracle_parity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.operators.temporal import (
    asof_join,
    j_asof_last_view,
    j_range_incident_window,
)
from tbench_agentic_data_pipeline_spark.plans.explain import (
    count_exchanges,
    formatted_plan,
)
from tests.conftest import SF_ORACLE


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_tie_and_missing(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T11:00:00"), 101),
            (2, _ts("2024-01-01T12:00:00"), 200),
        ],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:30:00"), "a"),  # between -> 100
            (1, _ts("2024-01-01T11:00:00"), "b"),  # tie -> 101 (at-or-before)
            (2, _ts("2024-01-01T11:59:59"), "c"),  # before any left -> null
            (3, _ts("2024-01-01T09:00:00"), "d"),  # key never on left -> null
        ],
        ["k", "ts", "tag"],
    )
    out = {
        r.tag: r.asof_lv
        for r in asof_join(left, right, key="k", ts="ts", carry=["lv"]).collect()
    }
    assert out == {"a": 100, "b": 101, "c": None, "d": None}


def test_asof_join_null_carry_stays_one_row(spark):
    # The matched left row must arrive WHOLE even when one of its carry
    # fields is NULL: per-column last(ignorenulls) would reach back to an
    # older left row for the NULL column and stitch a chimera (lv=100
    # with tag='late'). DuckDB ASOF returns the 11:00 row as-is.
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100, "early"),
            (1, _ts("2024-01-01T11:00:00"), None, "late"),
        ],
        ["k", "ts", "lv", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "r1")], ["k", "ts", "rid"]
    )
    row = asof_join(left, right, key="k", ts="ts", carry=["lv", "tag"]).collect()[0]
    assert (row.asof_lv, row.asof_tag) == (None, "late")


def test_asof_join_single_exchange(spark):
    # The union+window formulation must shuffle each side once on the key
    # and never range-explode: exactly 1 Exchange in the plan.
    df = j_asof_last_view(spark, SF_ORACLE)
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_range_join_is_hash_not_theta(spark):
    df = j_range_incident_window(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert rows
    # every incident window contains at least its own seeding event
    assert all(r.n_events >= 1 for r in rows)


def test_range_join_bucket_fanout_bounded(spark):
    # 30-min windows over 30-min buckets cover at most 2 buckets, so the
    # exploded incident side is <= 2x (and >= 1x) the incident count.
    from tbench_agentic_data_pipeline_spark.catalog import load_table

    events = load_table(spark, SF_ORACLE, "events")
    n_incidents = events.where(F.col("event_id") % 500 == 0).count()
    total = j_range_incident_window(spark, SF_ORACLE).agg(
        F.sum("n_events").alias("s")
    ).collect()[0].s
    assert n_incidents >= 1 and total >= n_incidents


def test_funnel_stages_monotone(spark):
    from tbench_agentic_data_pipeline_spark.operators.temporal import events_funnel

    rows = events_funnel(spark, SF_ORACLE).collect()
    n1 = sum(1 for r in rows if r.stage >= 1)
    n2 = sum(1 for r in rows if r.stage >= 2)
    n3 = sum(1 for r in rows if r.stage >= 3)
    assert n1 >= n2 >= n3 >= 1
    # stage labels must agree with timestamp presence and ordering
    for r in rows:
        assert (r.stage >= 2) == (r.click_ts is not None)
        assert (r.stage >= 3) == (r.purchase_ts is not None)
        if r.stage == 3:
            assert r.view_ts <= r.click_ts <= r.purchase_ts


def test_asof_join_matches_pandas_merge_asof(spark):
    # Randomized equivalence against pandas merge_asof (the semantics the
    # docstring claims): per-key latest left row at-or-before each right
    # ts, rows carried whole, NULL-valued carries preserved.
    import random

    import pandas as pd

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    left_rows = [
        (
            rng.randrange(5),
            base + dt.timedelta(minutes=rng.randrange(0, 600)),
            rng.choice([None, rng.randrange(1000)]),
            f"L{i}",
        )
        for i in range(80)
    ]
    # Dedupe (k, ts): merge_asof resolves left ties by INPUT position,
    # asof_join by greatest carry tuple — equivalence only holds tie-free
    # (the tie rule itself is pinned in the dedicated test below).
    seen: set = set()
    left_rows = [
        r for r in left_rows if (r[0], r[1]) not in seen
        and not seen.add((r[0], r[1]))
    ]
    right_rows = [
        (
            rng.randrange(6),  # key 5 never on the left
            base + dt.timedelta(minutes=rng.randrange(0, 600)),
            f"R{i}",
        )
        for i in range(60)
    ]
    left = spark.createDataFrame(left_rows, ["k", "ts", "lv", "ltag"])
    right = spark.createDataFrame(right_rows, ["k", "ts", "rid"])
    got = {
        r.rid: (r.asof_lv, r.asof_ltag)
        for r in asof_join(
            left, right, key="k", ts="ts", carry=["lv", "ltag"]
        ).collect()
    }

    # pandas merge_asof needs sorted frames (left ties removed above).
    lpd = pd.DataFrame(left_rows, columns=["k", "ts", "lv", "ltag"]).sort_values(
        ["ts", "k"], kind="stable"
    )
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "rid"]).sort_values(
        ["ts", "k"], kind="stable"
    )
    merged = pd.merge_asof(rpd, lpd, on="ts", by="k", direction="backward")
    want = {
        row.rid: (
            None if pd.isna(row.lv) else int(row.lv),
            None if (not isinstance(row.ltag, str)) else row.ltag,
        )
        for row in merged.itertuples()
    }
    assert got == want


def test_asof_join_left_ties_resolve_to_greatest_carry(spark):
    # Two left rows at the SAME (key, ts): the greatest carry tuple wins,
    # deterministically, regardless of input order or partitioning.
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 7, "b"),
            (1, _ts("2024-01-01T10:00:00"), 7, "a"),
            (1, _ts("2024-01-01T10:00:00"), 3, "z"),
        ],
        ["k", "ts", "lv", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T11:00:00"), "r1")], ["k", "ts", "rid"]
    )
    for lt in (left, left.orderBy(F.desc("tag")), left.repartition(3)):
        row = asof_join(lt, right, key="k", ts="ts", carry=["lv", "tag"]).collect()[0]
        assert (row.asof_lv, row.asof_tag) == (7, "b")
