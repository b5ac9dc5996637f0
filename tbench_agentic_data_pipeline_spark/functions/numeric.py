"""Cross-engine-stable numeric helpers.

Spark's ``round`` rounds the double's shortest-decimal representation
HALF_UP; DuckDB rounds the binary value. They disagree whenever a value's
decimal expansion terminates exactly on a half boundary at the rounding
position — which happens systematically for integer-derived ratios
(epoch_ms/3.6e6, percentages m/n, averages sum/count), not just with
ulp-probability. Observed concretely: 88.23995 hours → Spark 88.24,
DuckDB 88.2399.

``stable_round`` nudges the value by a relative 5e-13 (≳ one ulp at any
magnitude we produce, ≪ any data-significant digit) before rounding, in
BOTH engines, so no exact-half repr survives and identical doubles round
identically. Use it for every rounded ratio; plain sums of 2-decimal money
values may keep plain ROUND (boundary probability ~1e-7, and both engines
see identical sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPS = 5e-13


def stable_round(col: Column, scale: int) -> Column:
    """Engine-stable ROUND for ratio-valued doubles (Spark side)."""
    return F.round(col * (1 + F.lit(_EPS)), scale)


def stable_round_sql(expr: str, scale: int) -> str:
    """The matching DuckDB-side idiom."""
    return f"ROUND(({expr}) * (1 + 5e-13), {scale})"
