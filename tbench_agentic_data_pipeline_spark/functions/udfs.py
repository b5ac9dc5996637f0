"""Pandas-UDF surface (SURVEY.md §2.9 X1-X3): the operators whose logic
genuinely cannot be expressed in Spark SQL — Python-source analysis via
``ast``.

- X1 ``analyze_python``: syntax check + ``test_*`` function discovery
  (``shared_tools/validators.py:194-219``)
- X2 import analysis against an allowlist (``validators.py:221-253``)
- X3 test-function splitter: source blob → rows of {name, code}
  (``validators.py:418-447``), i.e. UDTF semantics via array-return +
  explode.

All three are Arrow-batched ``pandas_udf``s: pure, deterministic,
per-row — the engine's canonical "slow path done right". The registered
query generates deterministic Python snippets FROM the documents table so
the plumbing (batching, struct returns, explode) is exercised against
driver data; ast-vs-ground-truth correctness is property-tested with
hypothesis in tests/test_udfs.py.
"""

from __future__ import annotations

import ast

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

IMPORT_ALLOWLIST: frozenset[str] = frozenset(
    # The reference's allowlist (``validators.py:238-240``) models stdlib
    # test dependencies; ours mirrors the shape.
    {"os", "sys", "json", "re", "math", "pathlib", "subprocess", "pytest"}
)

ANALYSIS_SCHEMA = T.StructType(
    [
        T.StructField("valid", T.BooleanType()),
        T.StructField("message", T.StringType()),
        T.StructField("test_names", T.ArrayType(T.StringType())),
        T.StructField("bad_imports", T.ArrayType(T.StringType())),
    ]
)

SPLIT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("code", T.StringType()),
        ]
    )
)


def _analyze_one(src: str) -> dict:
    """X1+X2 for one snippet: parse, discover test_*, audit imports."""
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return {
            "valid": False,
            "message": f"syntax error: line {e.lineno}",
            "test_names": [],
            "bad_imports": [],
        }
    names = [
        n.name
        for n in ast.walk(tree)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        and n.name.startswith("test_")
    ]
    bad: list[str] = []
    for n in ast.walk(tree):
        if isinstance(n, ast.Import):
            bad += [a.name.split(".")[0] for a in n.names]
        elif isinstance(n, ast.ImportFrom) and n.module:
            bad.append(n.module.split(".")[0])
    bad = sorted({m for m in bad if m not in IMPORT_ALLOWLIST})
    return {
        "valid": True,
        "message": "ok",
        "test_names": sorted(names),
        "bad_imports": bad,
    }


@pandas_udf(ANALYSIS_SCHEMA)
def analyze_python(src: pd.Series) -> pd.DataFrame:
    """X1/X2 as one Arrow-batched UDF returning a struct column."""
    return pd.DataFrame([_analyze_one(s) for s in src])


def _split_tests(src: str) -> list[dict]:
    """X3: per-test source segments via ``ast.get_source_segment``
    (``validators.py:430``)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return []
    out = []
    for n in tree.body:
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)) and n.name.startswith(
            "test_"
        ):
            out.append(
                {"name": n.name, "code": ast.get_source_segment(src, n) or ""}
            )
    return out


@pandas_udf(SPLIT_SCHEMA)
def split_test_functions(src: pd.Series) -> pd.Series:
    """X3 as array-of-struct return; callers ``explode`` for UDTF rows."""
    return pd.Series([_split_tests(s) for s in src])


@query(
    "x1_ast_test_discovery",
    survey="X1,X2,X3",
    oracle="""
        SELECT doc_id,
               'test_' || regexp_replace(substr(text, 1, 20),
                                         '[^A-Za-z0-9_]', '_', 'g') AS test_name,
               TRUE AS valid
        FROM documents
    """,
)
def x1_ast_test_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 end-to-end through real ast: synthesize one valid test function
    per document (name derived from its text), run the Arrow-batched
    analysis UDF, explode discovered names. The oracle reconstructs the
    expected name by string ops — proving the UDF actually parsed and
    discovered — while ast robustness on arbitrary input is hypothesis-
    tested (tests/test_udfs.py)."""
    docs = load_table(spark, sf_dir, "documents")
    # Sanitize EVERY non-identifier character (not just spaces): any
    # punctuation in a doc prefix would make the synthesized def a
    # SyntaxError, silently dropping the row while the oracle still
    # emits it. 'test_' prefix keeps a leading digit legal.
    fn_name = F.concat(
        F.lit("test_"),
        F.regexp_replace(F.substring("text", 1, 20), "[^A-Za-z0-9_]", "_"),
    )
    code = F.concat(
        F.lit("def "), fn_name, F.lit("():\n    assert 1 + 1 == 2\n")
    )
    analyzed = docs.select(
        "doc_id", analyze_python(code).alias("a")
    )
    return analyzed.select(
        "doc_id",
        F.explode("a.test_names").alias("test_name"),
        F.col("a.valid").alias("valid"),
    )
