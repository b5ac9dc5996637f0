"""The ~sf1 scale-curve fixture builder must not silently corrupt the
data it measures: key-shifted unions preserve per-copy row counts, keep
keys globally disjoint, and keep foreign keys resolvable."""

from __future__ import annotations

from pyspark.sql import functions as F

from tools.scaling_curve import _shift_union


def test_shift_union_counts_and_disjoint_keys(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(7)], "k bigint, v string"
    )
    out = _shift_union(df, "k", 3)
    assert out.count() == 21
    # keys globally unique and each copy occupies its own shifted range
    assert out.select("k").distinct().count() == 21
    ranges = (
        out.withColumn("copy", (F.col("k") / 7).cast("int"))
        .groupBy("copy")
        .agg(F.count(F.lit(1)).alias("n"), F.min("k").alias("lo"))
        .collect()
    )
    assert sorted((r.copy, r.n, r.lo) for r in ranges) == [
        (0, 7, 0), (1, 7, 7), (2, 7, 14)
    ]


def test_shift_union_preserves_non_key_columns(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    out = _shift_union(df, "k", 2)
    assert sorted((r.k, r.v) for r in out.collect()) == [
        (1, "a"), (2, "b"), (4, "a"), (5, "b")
    ]
