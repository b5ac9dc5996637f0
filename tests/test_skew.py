"""Measured skew behavior (VERDICT r2 next-round #6): a deliberately hot
key through (a) salted aggregation with partition-size assertions and
(b) a sort-merge join under AQE with the skew-split assertion read off the
executed adaptive plan. These turn SCALING.md's skew claims from
extrapolated to measured — the numbers recorded there come from this file.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.operators.aggregates import salted_sum

HOT_ROWS = 80_000
COLD_KEYS = 20
COLD_ROWS = 1_000


def _skewed_frame(spark):
    """One hot key with HOT_ROWS rows, COLD_KEYS cold keys with COLD_ROWS
    each — hot:cold ratio 80:1, the shape AQE calls a skewed partition."""
    hot = spark.range(HOT_ROWS).select(
        F.lit("hot").alias("k"), F.col("id").cast("double").alias("v")
    )
    cold = spark.range(COLD_KEYS * COLD_ROWS).select(
        F.concat(F.lit("cold_"), (F.col("id") % COLD_KEYS)).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionAll(cold)


def _partition_rows(df):
    """Rows per physical partition, measured (not estimated)."""
    counts = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    return {r["__pid"]: r["count"] for r in counts}


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        k = k.replace("__", ".")
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salting_bounds_the_max_partition(spark):
    """Hash-partitioning on the raw key concentrates the hot key's 80k
    rows in ONE task; the salted first stage spreads them ~evenly over
    salt_buckets tasks. Assert both measured distributions."""
    df = _skewed_frame(spark)
    n_part = 8

    plain = _partition_rows(df.repartition(n_part, "k"))
    assert max(plain.values()) >= HOT_ROWS  # one melted reducer

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_part))
    )
    # the reduce-side work unit salting bounds is the (key, salt) GROUP:
    # the hot key's HOT_ROWS spread ~uniformly over n_part salt cells
    cell_sizes = [
        r["count"] for r in salted.groupBy("k", "__salt").count().collect()
    ]
    assert max(cell_sizes) <= 1.2 * HOT_ROWS / n_part
    # physically, (key, salt) cells still hash into partitions with
    # collisions, so the bound is looser — but the melted 80k-row
    # partition must be at least halved
    spread = _partition_rows(salted.repartition(n_part, "k", "__salt"))
    assert max(spread.values()) <= HOT_ROWS / 2

    # and the salted aggregate is value-identical to the plain groupBy
    got = {
        r["k"]: (r["value_sum"], r["n"])
        for r in salted_sum(df, "k", "v", salt_buckets=n_part).collect()
    }
    want = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], rel=1e-12)


def test_aqe_splits_the_skewed_join_partition(spark):
    """A sort-merge join of the skewed fact against a per-key dim, with
    AQE skew-join thresholds lowered to fixture scale: the executed
    adaptive plan must mark the sort-merge join ``skew=true`` (Spark's
    OptimizeSkewedJoin splitting the hot partition into subpartitions).
    This is the mechanism SCALING.md relies on at 100 TB for joins whose
    hot keys can't be salted away (key-preserving joins)."""
    df = _skewed_frame(spark)
    dim = spark.createDataFrame(
        [("hot", 1.0)] + [(f"cold_{i}", 0.5) for i in range(COLD_KEYS)],
        "k string, w double",
    )
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # fixture-scale thresholds so an 80k-row partition counts as skewed
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # force SMJ: a broadcast join would dodge the skew machinery
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        # a GLOBAL aggregate downstream: it requires no hash distribution,
        # so OptimizeSkewedJoin is free to split the hot partition. (A
        # groupBy(k) downstream REUSES the join's partitioning and AQE
        # then skips the split rather than add a shuffle — at real scale
        # you opt into that tradeoff with
        # spark.sql.adaptive.forceOptimizeSkewedJoin=true.)
        joined = df.join(dim, "k").agg(
            F.sum(F.col("v") * F.col("w")).alias("s"), F.count(F.lit(1)).alias("n")
        )
        row = joined.collect()[0]
        assert row["n"] == HOT_ROWS + COLD_KEYS * COLD_ROWS
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, f"AQE did not split the skewed partition:\n{plan[:2000]}"
