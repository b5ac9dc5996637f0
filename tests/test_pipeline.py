"""End-to-end lifecycle integration: create → validate → review → approve
→ verify, with the reference's guard rails enforced at each step."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.pipeline import DatapointPipeline


def _seed_rows(spark, prompts):
    return spark.createDataFrame(
        [
            (
                p,
                "FROM python:3.11\n",
                "def test_one():\n    assert False\n",
                '{"test_one": 1.0}',
                "",
                "easy",
                "2024-01-01T00:00:00+00:00",
                "2024-01-01T00:00:00+00:00",
            )
            for p in prompts
        ],
        "prompt string, dockerfile string, test_functions string, "
        "test_weights string, additional_files string, difficulty string, "
        "created_at string, updated_at string",
    )


def test_full_lifecycle(spark, tmp_path):
    pipe = DatapointPipeline.at(spark, str(tmp_path))
    pipe.create(_seed_rows(spark, ["write a parser", "fix the race"]))

    # duplicate guard: same prompt → same deterministic id → rejected
    with pytest.raises(ValueError, match="duplicate"):
        pipe.create(_seed_rows(spark, ["write a parser"]))

    # weight validation: both rows in band
    verdicts = pipe.validate_weights().collect()
    assert all(r["valid"] for r in verdicts)
    ids = [r["task_id"] for r in verdicts]
    assert all(i.startswith("draft_dp_") for i in ids)

    # move one to review — destination-first, staging shrinks; the move
    # stamps reviewed_at (reference semantic, add_dp_to_review.py:88)
    pipe.submit_for_review([ids[0]])
    assert pipe.review.read().count() == 1
    assert pipe.staging.read().count() == 1
    move_stamp = pipe.review.read().collect()[0]["reviewed_at"]
    assert move_stamp != ""

    # vocabulary guard fires before any mutation
    with pytest.raises(ValueError, match="invalid category"):
        pipe.approve(ids[0], category="not-a-category", tags="python")
    with pytest.raises(ValueError, match="invalid tags"):
        pipe.approve(ids[0], category="debugging", tags="python|not-a-tag")

    # approve → production row derived verbatim + review re-stamped
    pipe.approve(ids[0], category="debugging", tags="python|unit-testing")
    prod = pipe.production.read().collect()
    assert len(prod) == 1
    row = prod[0]
    assert row["title"] == ids[0]
    assert row["category"] == "debugging"
    assert row["use_case_category"] == "debugging"
    # verbatim passthrough: empty additional_files stays empty (the
    # reference's '{}' default only fires for a MISSING column)
    assert row["additional_files"] == ""
    approve_stamp = pipe.review.read().collect()[0]["reviewed_at"]
    assert approve_stamp >= move_stamp

    # double-approve refused by the production-duplicate guard
    # (approve_datapoint.py:103-107 — NOT a reviewed_at check)
    with pytest.raises(ValueError, match="already exists in production"):
        pipe.approve(ids[0], category="debugging", tags="python")

    # cancel the second datapoint: artifact written, review stamped,
    # production untouched; double-cancel and cancel-after-approve refused
    pipe.submit_for_review([ids[1]])
    with pytest.raises(ValueError, match="invalid cancellation category"):
        pipe.cancel(ids[1], reason="too broad", category="not-a-kind")
    artifact_path = pipe.cancel(
        ids[1], reason="out of scope for the bench", category="scope", attempts=2
    )
    import json as _json

    artifact = _json.load(open(artifact_path))
    assert artifact["task_id"] == ids[1]
    assert artifact["category"] == "scope"
    assert artifact["review_attempts"] == 2
    assert artifact["final_decision"] == "cancelled"
    assert pipe.production.read().count() == 1  # unchanged
    with pytest.raises(ValueError, match="already cancelled"):
        pipe.cancel(ids[1], reason="again", category="scope")
    with pytest.raises(ValueError, match="already approved"):
        pipe.cancel(ids[0], reason="nope", category="other")

    # verified semi-join: only completed validation tasks survive
    completed = spark.createDataFrame([(ids[0],)], "task_id string")
    assert pipe.verified(completed).count() == 1
    none_done = spark.createDataFrame([("draft_dp_zzzzzzzz",)], "task_id string")
    assert pipe.verified(none_done).count() == 0

    # history: every mutation is a version (time travel intact)
    assert pipe.staging.versions() == [1, 2, 3]  # create, two move-deletes
    # move-append, approve stamp, move-append, cancel stamp
    assert pipe.review.versions() == [1, 2, 3, 4]
    assert pipe.production.versions() == [1]
