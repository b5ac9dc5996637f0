"""X6: test-infrastructure codegen — the reference's validator step that
assembles per-task ``test_outputs.py`` files plus the pytest bootstrap
scripts (``shared_tools/validators.py:449-570``).

Reference behavior being re-expressed:
- one function per discovered test (X3 split output) with its source code;
- if a task has exactly one function whose code already contains
  ``def test_``, the code is written through verbatim;
- otherwise import lines (``import `` / ``from ``, matched on the stripped
  line) are hoisted out of every function, deduplicated, sorted, and
  emitted once at the top; each function body keeps its non-import lines,
  stripped, joined with blank lines; no imports at all falls back to a
  default ``import os`` / ``import sys`` header;
- three static shell scripts (setup / run-pytest / run-tests) accompany
  the test file.

Spark-first formulation: the whole assembly is a single groupBy over
(task, order, code) rows using only built-in higher-order array functions
(``split`` / ``filter`` / ``flatten`` / ``array_distinct`` /
``array_sort`` / ``array_join``) — string codegen stays JVM-side inside
whole-stage codegen; no UDF, no driver loop. One shuffle on the task key,
the same key the downstream per-task container run (X4/X5) partitions by.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.functions.scalars import strip_all_ws
from tbench_agentic_data_pipeline_spark.registry import query

__all__ = [
    "assemble_test_file",
    "script_artifacts",
    "write_test_bundles",
]


def _strip_ws(c: Column) -> Column:
    """Python ``str.strip()`` equivalent (all whitespace, Unicode-aware) —
    shared implementation in ``functions.scalars.strip_all_ws``."""
    return strip_all_ws(c)


def _is_import(line: Column) -> Column:
    stripped = _strip_ws(line)
    return stripped.startswith("import ") | stripped.startswith("from ")


def import_lines(code: Column) -> Column:
    """Stripped import lines of one function's source, in order
    (``validators.py:478-486``: ``imports_seen.add(line.strip())``)."""
    return F.filter(
        F.transform(F.split(code, "\n"), _strip_ws), lambda l: _is_import(l)
    )


def body_without_imports(code: Column) -> Column:
    """The function source minus its import lines, stripped
    (``validators.py:492-497``)."""
    kept = F.filter(F.split(code, "\n"), lambda l: ~_is_import(l))
    return _strip_ws(F.array_join(kept, "\n"))


def assemble_test_file(
    df: DataFrame, group_col: str, order_col: str, code_col: str
) -> DataFrame:
    """Collapse (task, order, code) test-function rows into one
    ``test_outputs.py`` blob per task.

    Output: (group_col, n_tests bigint, test_outputs_py string).
    Deterministic: functions are ordered by ``order_col`` (sorted inside
    the collected struct array, not via a fragile pre-groupBy sort), and
    the import header is sorted-distinct, so the same rows always render
    byte-identical output regardless of partitioning.
    """
    per = df.select(
        F.col(group_col),
        F.struct(
            F.col(order_col).alias("o"),
            body_without_imports(F.col(code_col)).alias("body"),
            F.col(code_col).alias("raw"),
        ).alias("t"),
        import_lines(F.col(code_col)).alias("imps"),
    )
    agg = per.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tests"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("imps")))).alias(
            "imports"
        ),
        F.array_sort(F.collect_list("t")).alias("tests"),
    )
    header = F.when(
        F.size("imports") > 0, F.array_join("imports", "\n")
    ).otherwise(F.lit("import os\nimport sys"))
    bodies = F.array_join(
        F.transform(F.col("tests"), lambda t: t["body"]), "\n\n"
    )
    first = F.element_at("tests", 1)
    passthrough = (F.col("n_tests") == 1) & F.contains(
        first["raw"], F.lit("def test_")
    )
    blob = _strip_ws(
        F.when(passthrough, first["raw"]).otherwise(
            F.concat(header, F.lit("\n\n"), bodies)
        )
    )
    return agg.select(
        group_col, "n_tests", blob.alias("test_outputs_py")
    )


# Static bootstrap scripts (reference emits equivalent artifacts from
# validators.py:500-570). Independently phrased; behavior-equivalent:
# pick a python, ensure pytest, run the assembled test file verbosely.
_SETUP_PYTEST_SH = """\
#!/bin/bash
set -u

PYTHON_CMD=""
for candidate in python3 python; do
    if command -v "$candidate" > /dev/null 2>&1; then
        PYTHON_CMD="$candidate"
        break
    fi
done
if [ -z "$PYTHON_CMD" ]; then
    echo "ERROR: no python interpreter on PATH" >&2
    exit 1
fi
export PYTHON_CMD

if ! "$PYTHON_CMD" -m pytest --version > /dev/null 2>&1; then
    echo "pytest missing; installing"
    if command -v pip > /dev/null 2>&1; then
        pip install pytest
    elif command -v pip3 > /dev/null 2>&1; then
        pip3 install pytest
    elif command -v apt-get > /dev/null 2>&1; then
        apt-get update && apt-get install -y python3-pytest
    else
        echo "ERROR: no way to install pytest" >&2
        exit 1
    fi
fi
"""

_RUN_PYTEST_SH = """\
#!/bin/bash
set -u

PYTHON_CMD="${PYTHON_CMD:-python3}"
TEST_DIR="${TEST_DIR:-/tests/tests}"
exec "$PYTHON_CMD" -m pytest "$TEST_DIR/test_outputs.py" -rA
"""

_RUN_TESTS_SH = """\
#!/bin/bash
set -u

export TEST_DIR=/tests/tests
source "$TEST_DIR/setup-pytest.sh"
bash "$TEST_DIR/run-pytest.sh"
"""


def script_artifacts() -> dict[str, str]:
    """Relative path → content for the static bundle scripts
    (``validators.py:500-570``). The test file slots in at
    ``tests/test_outputs.py`` next to them."""
    return {
        "tests/setup-pytest.sh": _SETUP_PYTEST_SH,
        "tests/run-pytest.sh": _RUN_PYTEST_SH,
        "run-tests.sh": _RUN_TESTS_SH,
    }


def write_test_bundles(assembled: DataFrame, out_dir: str) -> list[str]:
    """Artifact sink: materialize one bundle directory per task row of
    ``assemble_test_file`` output (S9/S10-style sink for X6).

    Driver-side by design, like every artifact sink in sources/snapshot.py:
    there is exactly one row per TASK (thousands, not corpus-scale), and
    the bundles land on a local/posix path for the container runner (X4/X5)
    to mount. ``toLocalIterator`` streams partitions without holding the
    full result in driver memory. Returns the bundle dirs written."""
    written: list[str] = []
    scripts = script_artifacts()
    for row in assembled.toLocalIterator():
        key = str(row[0])
        # The group key names a directory UNDER out_dir; a key containing
        # a separator or '..' would write outside it. Refuse, don't mangle
        # — a surprising key means bad upstream grouping, not a filename
        # problem.
        if os.sep in key or (os.altsep and os.altsep in key) or ".." in key:
            raise ValueError(f"task key {key!r} is not a safe bundle name")
        bundle = os.path.join(out_dir, key)
        os.makedirs(os.path.join(bundle, "tests"), exist_ok=True)
        with open(
            os.path.join(bundle, "tests", "test_outputs.py"), "w"
        ) as f:
            f.write(row["test_outputs_py"])
        for rel, content in scripts.items():
            path = os.path.join(bundle, rel)
            with open(path, "w") as f:
                f.write(content)
            os.chmod(path, 0o755)
        written.append(bundle)
    return written


@query(
    "x6_test_codegen",
    survey="X6,F10,F12",
    oracle="""
        WITH per AS (
            SELECT lang, doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'import os'
                        ELSE 'import sys' END AS imp,
                   'def test_'
                       || regexp_replace(substr(text, 1, 20),
                                         '[^A-Za-z0-9_]', '_', 'g')
                       || '():' || chr(10)
                       || '    assert 1 + 1 == 2' AS body
            FROM documents
            WHERE doc_id < 200
        ),
        agg AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_tests,
                   array_to_string(list_sort(list_distinct(list(imp))),
                                   chr(10)) AS imports,
                   string_agg(body, chr(10) || chr(10)
                              ORDER BY doc_id) AS bodies,
                   min(imp || chr(10) || body) AS only_raw
            FROM per
            GROUP BY lang
        )
        SELECT lang, n_tests,
               CASE WHEN n_tests = 1 THEN only_raw
                    ELSE imports || chr(10) || chr(10) || bodies
               END AS test_outputs_py
        FROM agg
    """,
)
def x6_test_codegen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 end-to-end through the real assembly operator: synthesize one
    test function per document (import line varies by doc parity so the
    hoist-dedup-sort path is actually exercised), group into per-lang
    "tasks", and render each task's ``test_outputs.py``. The oracle
    reconstructs the byte-exact blob with plain string aggregation —
    proving import extraction, dedup, sort, ordering, and the
    single-function passthrough predicate all match the reference's
    renderer (``validators.py:455-497``)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    fn_name = F.concat(
        F.lit("test_"),
        F.regexp_replace(F.substring("text", 1, 20), "[^A-Za-z0-9_]", "_"),
    )
    imp = F.when(F.col("doc_id") % 2 == 0, F.lit("import os")).otherwise(
        F.lit("import sys")
    )
    code = F.concat(
        imp,
        F.lit("\ndef "),
        fn_name,
        F.lit("():\n    assert 1 + 1 == 2"),
    )
    per = docs.select("lang", "doc_id", code.alias("code"))
    return assemble_test_file(per, "lang", "doc_id", "code")
