"""External-action executor tests (X4/X5 machinery with fake/shell
backends): structured success/failure, timeout behavior, join-back."""

from __future__ import annotations

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.operators.actions import (
    fake_backend,
    run_actions,
    shell_backend,
)
from tbench_agentic_data_pipeline_spark.operators.aggregates import approx_distinct
from tbench_agentic_data_pipeline_spark.catalog import load_table
from tests.conftest import SF_ORACLE


def test_actions_success_and_failure_rows(spark):
    df = spark.createDataFrame(
        [("t1", "build ok"), ("t2", "this will FAIL"), ("t3", "also fine")],
        "task_id string, payload string",
    )
    out = {
        r["key"]: (r["ok"], r["result"], r["error"])
        for r in run_actions(df, "task_id", "payload", fake_backend).collect()
    }
    assert out["t1"] == (True, "ok:8", None)
    assert out["t3"][0] is True
    assert out["t2"][0] is False and "fake action failed" in out["t2"][2]


def test_actions_timeout_is_structured(spark):
    df = spark.createDataFrame(
        [("fast", "x"), ("slow", "SLOW op")], "task_id string, payload string"
    )
    out = {
        r["key"]: (r["ok"], r["error"])
        for r in run_actions(
            df, "task_id", "payload", fake_backend, timeout_s=1.0
        ).collect()
    }
    assert out["fast"][0] is True
    assert out["slow"][0] is False and "timeout" in out["slow"][1]


def test_actions_shell_backend_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", "echo hello"), ("b", "exit 3")], "task_id string, payload string"
    )
    out = {
        r["key"]: (r["ok"], r["result"])
        for r in run_actions(df, "task_id", "payload", shell_backend).collect()
    }
    assert out["a"] == (True, "hello")
    assert out["b"][0] is False


def test_actions_join_back_stays_declarative(spark):
    df = spark.createDataFrame(
        [("t1", "p"), ("t2", "FAIL")], "task_id string, payload string"
    )
    res = run_actions(df, "task_id", "payload", fake_backend).withColumnRenamed(
        "key", "task_id"
    )
    joined = df.join(res, "task_id").where(F.col("ok"))
    assert [r["task_id"] for r in joined.collect()] == ["t1"]


def test_approx_distinct_within_5pct(spark):
    out = approx_distinct(
        load_table(spark, SF_ORACLE, "documents"), "lang", "text"
    ).collect()
    exact = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .groupBy("lang")
        .agg(F.countDistinct("text").alias("n"))
        .collect()
    }
    for r in out:
        err = abs(r["approx_distinct"] - exact[r["lang"]]) / exact[r["lang"]]
        assert err <= 0.05, (r["lang"], r["approx_distinct"], exact[r["lang"]])
