"""X6 test-infrastructure codegen: golden byte-compared renders against
the reference assembly semantics (``shared_tools/validators.py:449-570``).
"""

import os
import stat

import pytest

from tbench_agentic_data_pipeline_spark.functions.codegen import (
    assemble_test_file,
    script_artifacts,
    write_test_bundles,
)

MULTI_A = (
    "import os\n"
    "from json import loads\n"
    "def test_alpha():\n"
    "    assert loads('1') == 1\n"
)
MULTI_B = (
    "import sys\n"
    "import os\n"
    "def test_beta():\n"
    "    assert sys.maxsize > 0\n"
)
SINGLE = (
    "import re\n"
    "def test_solo():\n"
    "    assert re.match('a', 'abc')\n"
)
NO_IMPORTS_A = "def test_one():\n    assert True\n"
NO_IMPORTS_B = "def test_two():\n    assert 2 > 1\n"

# Golden renders, derived by hand from the reference algorithm:
# imports hoisted (stripped, dedup'd, sorted), bodies stripped and joined
# with blank lines, whole file stripped.
GOLDEN_MULTI = (
    "from json import loads\n"
    "import os\n"
    "import sys\n"
    "\n"
    "def test_alpha():\n"
    "    assert loads('1') == 1\n"
    "\n"
    "def test_beta():\n"
    "    assert sys.maxsize > 0"
)
# Single function containing `def test_`: verbatim passthrough (stripped).
GOLDEN_SINGLE = SINGLE.strip()
# No imports anywhere: default header.
GOLDEN_DEFAULT_HEADER = (
    "import os\n"
    "import sys\n"
    "\n"
    "def test_one():\n"
    "    assert True\n"
    "\n"
    "def test_two():\n"
    "    assert 2 > 1"
)


@pytest.fixture(scope="module")
def rendered(spark):
    df = spark.createDataFrame(
        [
            ("multi", 1, MULTI_A),
            ("multi", 2, MULTI_B),
            ("single", 1, SINGLE),
            ("noimp", 1, NO_IMPORTS_A),
            ("noimp", 2, NO_IMPORTS_B),
        ],
        "task string, ord int, code string",
    )
    out = assemble_test_file(df, "task", "ord", "code")
    return {r["task"]: r for r in out.collect()}


def test_multi_function_render_is_byte_exact(rendered):
    assert rendered["multi"]["n_tests"] == 2
    assert rendered["multi"]["test_outputs_py"] == GOLDEN_MULTI


def test_single_function_passthrough(rendered):
    assert rendered["single"]["n_tests"] == 1
    assert rendered["single"]["test_outputs_py"] == GOLDEN_SINGLE


def test_default_header_when_no_imports(rendered):
    assert rendered["noimp"]["test_outputs_py"] == GOLDEN_DEFAULT_HEADER


def test_render_is_order_invariant(spark):
    """Same rows, reversed input order and awkward partitioning → identical
    bytes (ordering comes from the order column, not arrival order)."""
    df = spark.createDataFrame(
        [("multi", 2, MULTI_B), ("multi", 1, MULTI_A)],
        "task string, ord int, code string",
    ).repartition(7)
    out = assemble_test_file(df, "task", "ord", "code").collect()
    assert out[0]["test_outputs_py"] == GOLDEN_MULTI


def test_write_test_bundles_materializes_tree(spark, tmp_path):
    df = spark.createDataFrame(
        [("taskA", 1, MULTI_A), ("taskA", 2, MULTI_B)],
        "task string, ord int, code string",
    )
    out = assemble_test_file(df, "task", "ord", "code")
    written = write_test_bundles(out, str(tmp_path))
    assert written == [str(tmp_path / "taskA")]
    test_file = tmp_path / "taskA" / "tests" / "test_outputs.py"
    assert test_file.read_text() == GOLDEN_MULTI
    for rel, content in script_artifacts().items():
        path = tmp_path / "taskA" / rel
        assert path.read_text() == content
        assert path.read_text().startswith("#!/bin/bash")
        assert stat.S_IMODE(os.stat(path).st_mode) & stat.S_IXUSR


def test_emitted_test_file_actually_passes_pytest(tmp_path):
    """The rendered artifact is a runnable pytest module — execute the
    golden multi-function render in-process via compile/exec plus direct
    invocation of the discovered test functions."""
    ns: dict = {}
    exec(compile(GOLDEN_MULTI, "test_outputs.py", "exec"), ns)
    tests = [v for k, v in ns.items() if k.startswith("test_")]
    assert len(tests) == 2
    for t in tests:
        t()
