"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbench_agentic_data_pipeline_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session("tests", shuffle_partitions=8)
    yield spark
    spark.stop()


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of currently persisted RDDs (storage-residue assertions).

    Tests must compare ID SETS, not global counts: ContextCleaner
    asynchronously unpersists residue from EARLIER tests whenever their
    driver-side refs get GC'd, so a count captured "before" can shrink
    underneath an equality assertion mid-test (r14 self-review)."""
    key_set = spark.sparkContext._jsc.getPersistentRDDs().keySet()
    return {int(i) for i in key_set.toArray()}
