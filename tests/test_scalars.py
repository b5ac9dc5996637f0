"""Unit tests for the scalar-expression vocabulary (F-family helpers that
back the reference's exact semantics but aren't each a standalone query)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.functions.scalars import (
    bounded_size,
    collapse_blank_runs,
    drop_matching_lines,
    json_is_valid,
    json_map,
    pipe_split_tags,
    truncate_ellipsis,
    weight_in_unit_interval,
)
from tbench_agentic_data_pipeline_spark.operators.dedup import exact_dedup


def test_pipe_split_tags_trims_and_drops_empty(spark):
    # categories_tags.py:58: split on |, trim, drop empties.
    df = spark.createDataFrame([("a| b ||c|",)], "tags string")
    out = df.select(pipe_split_tags(F.col("tags")).alias("t")).collect()[0]["t"]
    assert out == ["a", "b", "c"]


def test_bounded_size_one_to_three(spark):
    df = spark.createDataFrame(
        [(["a"],), (["a", "b", "c"],), (["a", "b", "c", "d"],), ([],)],
        "t array<string>",
    )
    out = [r["ok"] for r in df.select(bounded_size(F.col("t"), 1, 3).alias("ok")).collect()]
    assert out == [True, True, False, False]


def test_json_map_and_validity(spark):
    df = spark.createDataFrame(
        [('{"test_a": 0.5}',), ("not json",), ("",)], "w string"
    )
    rows = df.select(
        json_map("w", "double").alias("m"), json_is_valid("w").alias("ok")
    ).collect()
    assert rows[0]["m"] == {"test_a": 0.5} and rows[0]["ok"]
    assert rows[1]["m"] is None and not rows[1]["ok"]
    assert rows[2]["m"] is None and not rows[2]["ok"]


def test_truncate_ellipsis_boundary(spark):
    df = spark.createDataFrame([("x" * 10,), ("y" * 11,)], "s string")
    out = [
        r["t"] for r in df.select(truncate_ellipsis("s", 10).alias("t")).collect()
    ]
    assert out[0] == "x" * 10          # exactly n → untouched
    assert out[1] == "y" * 10 + "..."  # n+1 → truncated with ellipsis


def test_line_cleanup_helpers(spark):
    df = spark.createDataFrame(
        [("keep\n# canary token\nalso keep\n\n\n\n\ntail",)], "s string"
    )
    cleaned = df.select(
        collapse_blank_runs(drop_matching_lines("s", "canary")).alias("t")
    ).collect()[0]["t"]
    assert "canary" not in cleaned
    assert "\n\n\n" not in cleaned
    assert cleaned.startswith("keep") and cleaned.endswith("tail")


def test_weight_in_unit_interval(spark):
    df = spark.createDataFrame(
        [("0.5",), ("1.0",), ("0",), ("1.2",), ("x",)], "w string"
    )
    out = [
        r["ok"]
        for r in df.select(
            weight_in_unit_interval(F.col("w")).alias("ok")
        ).collect()
    ]
    assert out == [True, True, False, False, False]


def test_exact_dedup_api(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="same"), Row(doc_id=2, text="same"),
         Row(doc_id=3, text="other")]
    )
    out = {r["doc_id"]: r["n_copies"] for r in exact_dedup(df, "text", "doc_id").collect()}
    assert out == {1: 2, 3: 1}  # smallest key survives as canonical
