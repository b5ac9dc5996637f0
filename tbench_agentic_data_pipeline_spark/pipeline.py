"""The reference's complete datapoint lifecycle, composed on the engine.

create → validate → stage-for-review → approve-to-production → re-verify.
Maps the reference's CLI-per-step workflow (``create_dp.py`` →
``validate_datapoint.py`` → ``add_dp_to_review.py`` →
``approve_datapoint.py`` → ``validate_all_prod_dps.py`` +
``create_verified_csv.py``) onto snapshot tables and the operator layer:
every step is a pure transform + atomic snapshot commit, every transition
auditable via table history.

This module is the integration surface: tests/test_pipeline.py drives a
datapoint end-to-end and asserts the invariants the reference enforces
(duplicate guard, weight band, fail-first, review-before-approve,
destination-first moves).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.functions.vocab import (
    check_cancellation_category,
    check_category,
    check_tags,
)
from tbench_agentic_data_pipeline_spark.operators.aggregates import map_sum_check
from tbench_agentic_data_pipeline_spark.operators.joins import semi_join
from tbench_agentic_data_pipeline_spark.sources.readers import PRODUCTION_COLUMNS
from tbench_agentic_data_pipeline_spark.operators.mutations import deterministic_id
from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable, move_rows


def _now_iso() -> str:
    """UTC now in the reference's stamp format
    (``datetime.now(timezone.utc).isoformat()`` — microseconds, +00:00)."""
    return datetime.now(timezone.utc).isoformat()


@dataclass
class DatapointPipeline:
    spark: SparkSession
    staging: SnapshotTable
    review: SnapshotTable
    production: SnapshotTable

    @classmethod
    def at(cls, spark: SparkSession, root: str) -> "DatapointPipeline":
        return cls(
            spark,
            SnapshotTable(spark, f"{root}/staging"),
            SnapshotTable(spark, f"{root}/review"),
            SnapshotTable(spark, f"{root}/production"),
        )

    # -- create (create_dp.py) --------------------------------------------
    def create(self, rows: DataFrame) -> int:
        """Append new datapoints with the duplicate guard
        (``create_dp.py:42-49``) and deterministic ids (U11). Raises on
        duplicate task_id like the reference — both against staging AND
        within the incoming batch (two rows with the same prompt derive
        the same content-hash id; appending both would violate the
        uniqueness invariant every keyed operator assumes)."""
        with_ids = rows.withColumn(
            "task_id", deterministic_id("draft_dp", F.col("prompt"))
        )
        n_rows = with_ids.count()
        if with_ids.select("task_id").distinct().count() < n_rows:
            raise ValueError("duplicate task_id within the incoming batch")
        if self.staging.current_version() is not None:
            dup = semi_join(
                with_ids, self.staging.read().select("task_id"), "task_id"
            )
            if dup.limit(1).count() > 0:
                raise ValueError("duplicate task_id in staging")
        return self.staging.append(with_ids)

    # -- validate (validate_datapoint.py, weights slice) ------------------
    def validate_weights(self) -> DataFrame:
        """A5 weight-band verdicts for every staged row (the pure slice of
        the 4-validator pipeline; external actions go through
        operators.actions)."""
        staged = self.staging.read().select(
            "task_id", F.from_json("test_weights", "map<string,double>").alias("w")
        )
        return map_sum_check(staged, "task_id", "w")

    # -- stage for review (add_dp_to_review.py) ---------------------------
    def submit_for_review(self, task_ids: list[str]) -> tuple[int, int]:
        """Move rows staging→review, destination first
        (``add_dp_to_review.py:255-264``), normalized to the review schema.

        ``reviewed_at`` is stamped with the MOVE timestamp — the
        reference's semantic (``add_dp_to_review.py:88``): in its review
        CSV the field records when the row entered review, and approve /
        cancel overwrite it with their own timestamp. All 234 shipped
        review rows carry a non-empty value."""
        moving = (
            self.staging.read()
            .where(F.col("task_id").isin(task_ids))
            .withColumn("reviewed_at", F.lit(_now_iso()))
        )
        return move_rows(self.staging, self.review, moving, "task_id")

    # -- approve (approve_datapoint.py) -----------------------------------
    def approve(self, task_id: str, category: str, tags: str) -> int:
        """Approve one reviewed datapoint — see :meth:`approve_many`."""
        return self.approve_many({task_id: (category, tags)})

    def approve_many(self, decisions: dict[str, tuple[str, str]]) -> int:
        """Batch approve: derive production rows (U8), append to
        production, stamp reviewed_at (U9) — ONE production version and
        ONE review commit for the whole batch.

        Reference parity (``approve_datapoint.py:82-167``):

        - category/tags validated against the closed vocabulary
          (``shared_tools/categories_tags.py``) before anything is read;
        - the double-approve guard is a PRODUCTION-duplicate check
          (``approve_datapoint.py:103-107``) — the reference does NOT
          refuse on reviewed_at (that field holds the added-to-review
          stamp, see :meth:`submit_for_review`);
        - the production row passes staging fields through VERBATIM;
          the 'medium'/'{{}}'/now fallbacks fire only when the COLUMN is
          absent from the review table (``dict.get`` on a DictReader row
          defaults only for missing columns, never empty cells);
        - ``title`` = task_id, ``use_case_category`` = ``category`` =
          the decision's category; field order per ``PRODUCTION_COLUMNS``.

        Decisions are human review output — inherently driver-small — so
        they join in as a broadcast literal table; the corpus side stays
        distributed.
        """
        for task_id, (category, tags) in decisions.items():
            check_category(category)
            check_tags(tags)
        review = self.review.read()
        dec_df = self.spark.createDataFrame(
            [(t, c, g) for t, (c, g) in decisions.items()],
            "task_id string, _category string, _tags string",
        )
        picked = review.join(F.broadcast(dec_df), "task_id", "inner")
        found = {r["task_id"] for r in picked.select("task_id").collect()}
        missing = sorted(set(decisions) - found)
        if missing:
            raise KeyError(f"not in review: {', '.join(missing)}")
        if self.production.current_version() is not None:
            dup = semi_join(
                dec_df, self.production.read().select("task_id"), "task_id"
            )
            dup_ids = sorted(r["task_id"] for r in dup.select("task_id").collect())
            if dup_ids:
                raise ValueError(
                    "already exists in production dataset: " + ", ".join(dup_ids)
                )
        now = _now_iso()
        has = set(picked.columns)
        col_or = lambda c, d: (F.col(c) if c in has else F.lit(d)).alias(c)
        prod_rows = picked.select(
            "task_id",
            col_or("difficulty", "medium"),
            F.col("task_id").alias("title"),
            F.col("_category").alias("use_case_category"),
            "prompt",
            F.col("_category").alias("category"),
            F.col("_tags").alias("tags"),
            "dockerfile",
            "test_functions",
            "test_weights",
            col_or("additional_files", "{}"),
            col_or("created_at", now),
            col_or("updated_at", now),
        )
        v = self.production.append(prod_rows.select(*PRODUCTION_COLUMNS))
        stamped = review.withColumn(
            "reviewed_at",
            F.when(
                F.col("task_id").isin(list(decisions)), F.lit(now)
            ).otherwise(F.col("reviewed_at")),
        )
        self.review.commit(stamped, operation="review_stamp")
        return v

    # -- cancel (cancel_datapoint.py) --------------------------------------
    def cancel(
        self, task_id: str, reason: str, category: str, attempts: int = 0
    ) -> str:
        """Reject a reviewed datapoint: write a structured cancellation
        artifact, stamp reviewed_at, never touch production. Returns the
        artifact path.

        Reference parity (``cancel_datapoint.py:90-150``): category from
        the closed cancellation taxonomy; artifact JSON carries
        task_id/cancelled_at/cancelled_by/category/reason/review_attempts/
        details/final_decision; the review row is re-stamped.

        DOCUMENTED DEVIATION: the reference refuses when ``reviewed_at``
        is non-empty (``cancel_datapoint.py:107-109``) — but its own
        ``add_dp_to_review.py:88`` stamps that field on every row entering
        review, so the literal guard refuses every reachable row (all 234
        shipped review rows carry a stamp). We keep the guard's INTENT —
        no double-processing — by refusing ids already in production
        (approved) or already carrying a cancellation artifact."""
        check_cancellation_category(category)
        row = self.review.read().where(F.col("task_id") == task_id)
        if row.limit(1).count() == 0:
            raise KeyError(f"{task_id} not in review")
        if self.production.current_version() is not None:
            approved = (
                self.production.read()
                .where(F.col("task_id") == task_id)
                .limit(1)
                .count()
            )
            if approved:
                raise ValueError(f"{task_id} already approved to production")
        cancel_dir = os.path.join(self.review.root, "cancelled")
        artifact_path = os.path.join(cancel_dir, f"{task_id}_cancellation.json")
        if os.path.exists(artifact_path):
            raise ValueError(f"{task_id} already cancelled")
        now = _now_iso()
        os.makedirs(cancel_dir, exist_ok=True)
        artifact = {
            "task_id": task_id,
            "cancelled_at": now,
            "cancelled_by": "review_agent",
            "category": category,
            "reason": reason,
            "review_attempts": attempts,
            "details": {},
            "final_decision": "cancelled",
        }
        with open(artifact_path, "w") as f:
            json.dump(artifact, f, indent=2)
        stamped = self.review.read().withColumn(
            "reviewed_at",
            F.when(F.col("task_id") == task_id, F.lit(now)).otherwise(
                F.col("reviewed_at")
            ),
        )
        self.review.commit(stamped, operation="cancel_stamp")
        return artifact_path

    # -- re-verify (create_verified_csv.py) -------------------------------
    def verified(self, completed_task_ids: DataFrame) -> DataFrame:
        """J1: production rows whose validation task completed."""
        return semi_join(self.production.read(), completed_task_ids, "task_id")

    def verified_from_task_store(self, state_path: str) -> DataFrame:
        """The reference's full two-step verification sink
        (``create_verified_csv.py:29-42``): read the task-manager state,
        keep COMPLETED ``validate_*`` tasks, extract each one's
        ``data.original_task_id``, and semi-join production on it. The
        task store is S2's exploded-JSON scan; the id extraction is a
        filtered projection, so the whole step is one broadcast-ready
        semi-join over production."""
        from tbench_agentic_data_pipeline_spark.sources.readers import (
            read_task_store,
        )

        tasks = read_task_store(self.spark, state_path)
        completed = (
            tasks.where(
                (F.col("status") == "completed")
                & F.col("id").startswith("validate_")
            )
            .select(F.col("data")["original_task_id"].alias("task_id"))
            .where(F.col("task_id").isNotNull())
        )
        return self.verified(completed)
