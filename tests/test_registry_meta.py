"""Registry hygiene: every registered query must carry its SURVEY.md §2
lineage (survey ids + docstring with the reference citation or rationale),
and oracle SQL must reference only driver-provided tables."""

from __future__ import annotations

import re

from tbench_agentic_data_pipeline_spark import registry
from tbench_agentic_data_pipeline_spark.catalog import TABLES

_ENTRIES = registry.collect()


def test_every_query_documents_its_lineage():
    undocumented = [
        n for n, e in _ENTRIES.items() if not (e.fn.__doc__ or "").strip()
    ]
    assert undocumented == []
    unmapped = [n for n, e in _ENTRIES.items() if not e.survey_ids]
    assert unmapped == []


def test_oracle_sql_uses_only_driver_tables():
    known = set(TABLES)
    for name, e in _ENTRIES.items():
        if e.oracle is None:
            continue
        # crude FROM/JOIN target extraction; CTE names register as known.
        ctes = set(
            re.findall(r"(\w+)\s*(?:\([^)]*\))?\s+AS\s*\(", e.oracle, re.I)
        )
        refs = set(
            t.lower()
            for t in re.findall(r"\b(?:FROM|JOIN)\s+([a-zA-Z_][\w.]*)", e.oracle, re.I)
        )
        unknown = {
            r for r in refs
            if r not in known and r not in {c.lower() for c in ctes}
            and not r.startswith(("unnest", "range", "lateral"))
        }
        assert not unknown, f"{name}: oracle references unknown tables {unknown}"


def test_rows_only_queries_are_the_documented_exceptions():
    rows_only = {n for n, e in _ENTRIES.items() if e.oracle is None}
    assert rows_only == {"dedup_minhash_fast"}, rows_only


def test_driver_window_prefix_is_exact():
    """The external driver checks only the first 50 queries() entries, so
    the registry must emit _FRONT_ORDER as an exact prefix — and every
    name in it must actually be registered (a typo would silently burn a
    window slot)."""
    names = list(_ENTRIES)
    front = registry._FRONT_ORDER
    assert [n for n in front if n not in _ENTRIES] == []
    assert len(front) == len(set(front)) == 50
    assert names[: len(front)] == list(front)
