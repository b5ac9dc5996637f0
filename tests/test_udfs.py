"""Property-based tests for the pandas-UDF surface (SURVEY.md §5.2):
the analyzers never crash and match ``ast`` ground truth."""

from __future__ import annotations

import ast
import keyword

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tbench_agentic_data_pipeline_spark.functions.udfs import (
    _analyze_one,
    _split_tests,
)

identifiers = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: not keyword.iskeyword(s)
)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_analyze_never_crashes(src):
    out = _analyze_one(src)
    assert set(out) == {"valid", "message", "test_names", "bad_imports"}
    if not out["valid"]:
        assert out["test_names"] == []


@given(st.lists(identifiers, min_size=1, max_size=5, unique=True))
@settings(max_examples=100, deadline=None)
def test_discovery_matches_ast_ground_truth(names):
    src = "\n".join(f"def test_{n}():\n    pass" for n in names)
    out = _analyze_one(src)
    assert out["valid"]
    assert out["test_names"] == sorted(f"test_{n}" for n in names)


@given(st.lists(identifiers, min_size=1, max_size=4, unique=True))
@settings(max_examples=50, deadline=None)
def test_splitter_segments_reparse(names):
    src = "\n".join(
        f"def test_{n}():\n    x_{n} = {i}\n    assert x_{n} == {i}"
        for i, n in enumerate(names)
    )
    parts = _split_tests(src)
    assert [p["name"] for p in parts] == [f"test_{n}" for n in names]
    for p in parts:
        # every extracted segment is itself valid Python defining the test
        tree = ast.parse(p["code"])
        assert isinstance(tree.body[0], ast.FunctionDef)
        assert tree.body[0].name == p["name"]


def test_jaccard_matches_python_ground_truth():
    # jaccard_milli vs set arithmetic on randomized token arrays.
    import random

    from pyspark.sql import functions as F

    from tbench_agentic_data_pipeline_spark.operators.dedup import jaccard_milli
    from tbench_agentic_data_pipeline_spark.session import get_session

    spark = get_session("tests", shuffle_partitions=8)
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for _ in range(50):
        a = sorted(set(rng.choices(vocab, k=rng.randint(1, 20))))
        b = sorted(set(rng.choices(vocab, k=rng.randint(1, 20))))
        expect = len(set(a) & set(b)) * 1000 // len(set(a) | set(b))
        rows.append((a, b, expect))
    df = spark.createDataFrame(
        rows, "a array<string>, b array<string>, expect long"
    )
    out = df.select(
        "expect", jaccard_milli(F.col("a"), F.col("b")).alias("got")
    ).collect()
    assert all(r["expect"] == r["got"] for r in out)


def test_import_allowlist():
    out = _analyze_one("import os\nimport numpy\nfrom requests.api import get")
    assert out["valid"]
    assert out["bad_imports"] == ["numpy", "requests"]
