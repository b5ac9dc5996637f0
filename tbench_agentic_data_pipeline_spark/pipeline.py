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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.operators.aggregates import map_sum_check
from tbench_agentic_data_pipeline_spark.operators.joins import semi_join
from tbench_agentic_data_pipeline_spark.operators.mutations import deterministic_id
from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable, move_rows


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
        (``add_dp_to_review.py:255-264``), normalized to the review schema
        (reviewed_at added empty)."""
        moving = (
            self.staging.read()
            .where(F.col("task_id").isin(task_ids))
            .withColumn("reviewed_at", F.lit(""))
        )
        return move_rows(self.staging, self.review, moving, "task_id")

    # -- approve (approve_datapoint.py) -----------------------------------
    def approve(self, task_id: str, category: str, tags: str) -> int:
        """Derive the production row (U8), stamp reviewed_at (U9), append
        to production, mark reviewed in review. Refuses rows already
        reviewed (P5 stage predicate)."""
        row = self.review.read().where(F.col("task_id") == task_id)
        if row.limit(1).count() == 0:
            raise KeyError(f"{task_id} not in review")
        if row.where(F.col("reviewed_at") != "").limit(1).count() > 0:
            raise ValueError(f"{task_id} already reviewed")
        now = F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX")
        prod_row = row.select(
            "task_id",
            F.coalesce(F.nullif(F.col("difficulty"), F.lit("")), F.lit("medium")).alias(
                "difficulty"
            ),
            F.col("task_id").alias("title"),
            F.lit(category).alias("use_case_category"),
            "prompt",
            "dockerfile",
            "test_functions",
            "test_weights",
            F.coalesce(
                F.nullif(F.col("additional_files"), F.lit("")), F.lit("{}")
            ).alias("additional_files"),
            F.lit(category).alias("category"),
            F.lit(tags).alias("tags"),
            "created_at",
            "updated_at",
        )
        v = self.production.append(prod_row)
        reviewed = self.review.read().withColumn(
            "reviewed_at",
            F.when(F.col("task_id") == task_id, now).otherwise(F.col("reviewed_at")),
        )
        self.review.commit(reviewed, operation="review_stamp")
        return v

    # -- re-verify (create_verified_csv.py) -------------------------------
    def verified(self, completed_task_ids: DataFrame) -> DataFrame:
        """J1: production rows whose validation task completed."""
        return semi_join(self.production.read(), completed_task_ids, "task_id")
