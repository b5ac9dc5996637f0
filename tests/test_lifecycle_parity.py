"""Whole-lifecycle parity vs the reference's shipped data.

Drives ``DatapointPipeline`` over the reference's ACTUAL 46-row drifted
staging CSV (``agents/dp_builder_workspace/staging/datapoints.csv``)
through stage-for-review → batch-approve, then diffs every cell of the
resulting production table against a pure-Python oracle that re-executes
the reference's own row logic (``add_dp_to_review.py:71-88`` normalize +
``approve_datapoint.py:117-132`` derivation) with ``csv.DictReader`` on
the same file. This pins the LIFECYCLE — CSV parsing, normalization,
verbatim passthrough, field order — not just individual operators.
"""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.functions.vocab import CATEGORIES, TAGS
from tbench_agentic_data_pipeline_spark.pipeline import DatapointPipeline
from tbench_agentic_data_pipeline_spark.sources.readers import (
    PRODUCTION_COLUMNS,
    STAGING_COLUMNS,
    read_datapoint_csv,
)

STAGING_CSV = "/root/reference/agents/dp_builder_workspace/staging/datapoints.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(STAGING_CSV), reason="reference staging CSV not present"
)


def _decisions(task_ids):
    """Deterministic (category, tags) per task: cycle the closed
    vocabularies so the fixture exercises many distinct decisions."""
    cats = sorted(CATEGORIES)
    tags = sorted(TAGS)
    out = {}
    for i, tid in enumerate(sorted(task_ids)):
        picked = [tags[i % len(tags)], tags[(i * 7 + 3) % len(tags)]]
        # reference rule: 1..3 distinct pipe-separated tags
        uniq = list(dict.fromkeys(picked))
        out[tid] = (cats[i % len(cats)], "|".join(uniq))
    return out


def _oracle_production_rows(decisions):
    """The reference's derivation, re-executed row-by-row on the same CSV:
    DictReader parse, normalize_datapoint's fill-missing-with-'' over the
    standard columns, then approve_datapoint's verbatim dict build."""
    with open(STAGING_CSV, newline="") as f:
        rows = list(csv.DictReader(f))
    out = {}
    for r in rows:
        dp = {c: r.get(c, "") for c in STAGING_COLUMNS}  # add_dp normalize
        cat, tags = decisions[dp["task_id"]]
        out[dp["task_id"]] = {  # approve_datapoint.py:117-132
            "task_id": dp["task_id"],
            "difficulty": dp.get("difficulty", "medium"),
            "title": dp["task_id"],
            "use_case_category": cat,
            "prompt": dp["prompt"],
            "category": cat,
            "tags": tags,
            "dockerfile": dp["dockerfile"],
            "test_functions": dp["test_functions"],
            "test_weights": dp["test_weights"],
            "additional_files": dp.get("additional_files", "{}"),
            "created_at": dp.get("created_at", ""),
            "updated_at": dp.get("updated_at", ""),
        }
    return out


def test_lifecycle_matches_reference_data(spark, tmp_path):
    pipe = DatapointPipeline.at(spark, str(tmp_path))

    # Seed staging with the shipped CSV exactly as the reference left it
    # (rows already carry ids — create_dp ran upstream). The drift columns
    # (tests/weights) are dropped by the standard-column normalization,
    # like normalize_datapoint does.
    staged = read_datapoint_csv(spark, STAGING_CSV, STAGING_COLUMNS).na.fill("")
    pipe.staging.commit(staged, operation="seed")
    ids = [r["task_id"] for r in staged.select("task_id").collect()]
    assert len(ids) == 46 and len(set(ids)) == 46

    # stage-for-review: destination-first move, reviewed_at stamped
    pipe.submit_for_review(ids)
    assert pipe.staging.read().count() == 0
    review = pipe.review.read()
    assert review.count() == 46
    assert review.where(F.col("reviewed_at") == "").count() == 0

    # batch approve all 46 — ONE production version, ONE review commit
    decisions = _decisions(ids)
    pipe.approve_many(decisions)
    assert pipe.production.versions() == [1]

    # cell-exact diff vs the reference-logic oracle
    prod = pipe.production.read()
    assert prod.columns == list(PRODUCTION_COLUMNS)
    got = {r["task_id"]: r.asDict() for r in prod.collect()}
    want = _oracle_production_rows(decisions)
    assert sorted(got) == sorted(want)
    for tid, w in want.items():
        g = got[tid]
        for col in PRODUCTION_COLUMNS:
            assert g[col] == w[col], f"{tid}.{col}: {g[col]!r} != {w[col]!r}"

    # re-approve of the whole batch refused by the production-dup guard
    with pytest.raises(ValueError, match="already exists in production"):
        pipe.approve_many(_decisions(ids[:1]))

    # verified export (create_verified_csv): only completed tasks survive
    done = spark.createDataFrame([(t,) for t in ids[:5]], "task_id string")
    assert pipe.verified(done).count() == 5


def test_verified_from_task_store(spark, tmp_path):
    """The two-step verification workflow end-to-end: a reference-shaped
    task-manager state (validate_* tasks with original_task_id payloads)
    filters production down to exactly the completed ids."""
    import json

    pipe = DatapointPipeline.at(spark, str(tmp_path))
    staged = read_datapoint_csv(spark, STAGING_CSV, STAGING_COLUMNS).na.fill("")
    pipe.staging.commit(staged, operation="seed")
    ids = sorted(r["task_id"] for r in staged.select("task_id").collect())
    pipe.submit_for_review(ids)
    pipe.approve_many(_decisions(ids))

    done, not_done = ids[:7], ids[7:]
    state = {
        "workflow_type": "validation",
        "metadata": {},
        "tasks": {
            **{
                f"validate_{t}": {
                    "id": f"validate_{t}",
                    "type": "validation",
                    "status": "completed",
                    "parent_id": "",
                    "locked_by": "",
                    "locked_at": "",
                    "created_at": "2025-01-01T00:00:00+00:00",
                    "completed_at": "2025-01-01T01:00:00+00:00",
                    "data": {"original_task_id": t},
                }
                for t in done
            },
            # a pending validation and an unrelated completed task must
            # NOT leak into the verified set
            f"validate_{not_done[0]}": {
                "id": f"validate_{not_done[0]}",
                "type": "validation",
                "status": "pending",
                "parent_id": "", "locked_by": "", "locked_at": "",
                "created_at": "2025-01-01T00:00:00+00:00",
                "completed_at": "",
                "data": {"original_task_id": not_done[0]},
            },
            "review_dp_x": {
                "id": "review_dp_x",
                "type": "review",
                "status": "completed",
                "parent_id": "", "locked_by": "", "locked_at": "",
                "created_at": "2025-01-01T00:00:00+00:00",
                "completed_at": "2025-01-01T01:00:00+00:00",
                "data": {"original_task_id": not_done[1]},
            },
        },
    }
    state_path = tmp_path / "state.json"
    state_path.write_text(json.dumps(state))

    got = sorted(
        r["task_id"]
        for r in pipe.verified_from_task_store(str(state_path))
        .select("task_id")
        .collect()
    )
    assert got == sorted(done)
