"""Validation pipeline (SURVEY.md §2.9 X7 + §5.1).

The reference runs 4 validators sequentially over each datapoint with a
shared context dict (``shared_tools/validate_datapoint.py:45-79``),
deliberately NOT short-circuiting (loop ``:62-72`` has no break) and
degrading gracefully when prerequisites are missing
(``validators.py:268-272``). The Spark form: each validator is a struct
column ``{valid, message}``; prerequisite threading is column dependency;
``overall`` is a conjunction column. Non-short-circuiting falls out of
columnar evaluation naturally — every verdict is computed for every row.

Also here: the fail-first policy truth table (``validators.py:377-410``):
a datapoint's declared tests must ALL fail pre-agent — zero failures ⇒
invalid, any pass ⇒ invalid, count mismatch ⇒ invalid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Reusable operator API
# ---------------------------------------------------------------------------


def verdict(valid: Column, message_ok: str, message_fail: Column | str) -> Column:
    """One validator's struct verdict column."""
    msg_fail = F.lit(message_fail) if isinstance(message_fail, str) else message_fail
    return F.struct(
        valid.alias("valid"),
        F.when(valid, message_ok).otherwise(msg_fail).alias("message"),
    )


def overall(*verdict_cols: str) -> Column:
    """X7: conjunction of all validator verdicts — evaluated over every
    row and every validator (non-short-circuiting by construction)."""
    out = F.lit(True)
    for v in verdict_cols:
        out = out & F.col(f"{v}.valid")
    return out


def fail_first_policy(
    declared: Column, failed: Column, passed: Column, errors: Column
) -> Column:
    """The fail-first truth table (``validators.py:377-410``):
    valid ⇔ failed == declared AND passed == 0 AND errors == 0 AND
    declared > 0. Each clause surfaces as its own flag for reporting."""
    return F.struct(
        (declared > 0).alias("has_tests"),
        (passed == 0).alias("none_pass"),
        (errors == 0).alias("no_errors"),
        (failed == declared).alias("all_fail"),
        (
            (declared > 0) & (passed == 0) & (errors == 0) & (failed == declared)
        ).alias("valid"),
    )


def validation_pipeline(df: DataFrame, validators: dict[str, Column]) -> DataFrame:
    """X7 driver: attach each validator's struct column, then ``overall``.
    ``validators`` maps name → verdict column; order is metadata only
    (columnar evaluation has no sequencing)."""
    out = df
    for name, col in validators.items():
        out = out.withColumn(name, col)
    return out.withColumn("overall", overall(*validators))


# ---------------------------------------------------------------------------
# Registered oracle-checkable queries
# ---------------------------------------------------------------------------


@query(
    "x7_validation_pipeline",
    survey="X7,F3,F19,F20,J5",
    oracle="""
        SELECT
            event_id,
            json_valid(props)                                   AS v_json,
            (value > 0 AND value <= 200)                        AS v_range,
            (event_type IN ('click','view','purchase','signup','error'))
                                                                AS v_type,
            (CAST(json_extract(props, '$.k') AS BIGINT)
                 BETWEEN 0 AND 99)                              AS v_k,
            (json_valid(props)
             AND (value > 0 AND value <= 200)
             AND (event_type IN ('click','view','purchase','signup','error'))
             AND (CAST(json_extract(props, '$.k') AS BIGINT) BETWEEN 0 AND 99))
                                                                AS overall
        FROM events
    """,
)
def x7_validation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: the 4-validator pipeline shape over the events table — JSON
    well-formedness (DockerfileValidator's cheap check analog), numeric
    range (weights bounds), enum membership (category vocabulary, J5),
    prerequisite-dependent check (k parses ⇒ band check). All four verdicts
    computed for every row; ``overall`` is their conjunction — exactly the
    reference's no-short-circuit semantics (``validate_datapoint.py:62-72``)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    v_json = F.from_json("props", "map<string,string>").isNotNull()
    v_range = (F.col("value") > 0) & (F.col("value") <= 200)
    v_type = F.col("event_type").isin("click", "view", "purchase", "signup", "error")
    v_k = k.between(0, 99)
    return events.select(
        "event_id",
        v_json.alias("v_json"),
        v_range.alias("v_range"),
        v_type.alias("v_type"),
        v_k.alias("v_k"),
        (v_json & v_range & v_type & v_k).alias("overall"),
    )


@query(
    "a8_pytest_summary_parse",
    survey="A8,F7",
    oracle="""
        WITH sim AS (
            SELECT event_id,
                   'collected ' || CAST(1 + CAST(json_extract(props, '$.k') AS BIGINT) % 4
                       AS VARCHAR) || ' items' || chr(10) ||
                   CASE WHEN event_type = 'error'
                        THEN 'FAILED test_a' || chr(10) || 'FAILED test_b' || chr(10)
                        ELSE 'PASSED test_a' || chr(10) END ||
                   CAST(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END AS VARCHAR)
                       || ' failed' AS out
            FROM events
        )
        SELECT event_id,
               CAST(regexp_extract(out, 'collected ([0-9]+) items?', 1) AS BIGINT)
                   AS n_collected,
               CAST(regexp_extract(out, '([0-9]+) failed', 1) AS BIGINT)
                   AS n_failed,
               CAST(len(regexp_extract_all(out, 'FAILED [a-z_]+')) AS BIGINT)
                   AS n_failed_lines
        FROM sim
    """,
)
def a8_pytest_summary_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/F7: pytest-output parsing (``validators.py:649-731``) — extract
    'collected N items', the 'N failed' summary, and count FAILED lines
    from synthesized runner output. The regex layer the reference applies
    to real pytest stdout, as codegen'd ``regexp_extract``s."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    out = F.concat(
        F.lit("collected "), (1 + k % 4).cast("string"), F.lit(" items\n"),
        F.when(
            F.col("event_type") == "error", "FAILED test_a\nFAILED test_b\n"
        ).otherwise("PASSED test_a\n"),
        F.when(F.col("event_type") == "error", 2).otherwise(0).cast("string"),
        F.lit(" failed"),
    )
    sim = events.select("event_id", out.alias("out"))
    return sim.select(
        "event_id",
        F.regexp_extract("out", r"collected (\d+) items?", 1).cast("bigint").alias(
            "n_collected"
        ),
        F.regexp_extract("out", r"(\d+) failed", 1).cast("bigint").alias("n_failed"),
        F.regexp_count("out", F.lit(r"FAILED [a-z_]+")).cast("bigint").alias(
            "n_failed_lines"
        ),
    )


@query(
    "x_fail_first_policy",
    survey="X7,A8",
    oracle="""
        WITH sim AS (
            SELECT event_id,
                   1 + CAST(json_extract(props, '$.k') AS BIGINT) % 4  AS declared,
                   CASE WHEN event_type = 'error'
                        THEN 1 + CAST(json_extract(props, '$.k') AS BIGINT) % 4
                        ELSE CAST(json_extract(props, '$.k') AS BIGINT) % 3 END
                       AS failed,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END    AS passed
            FROM events
        )
        SELECT event_id, declared, failed, CAST(passed AS BIGINT) AS passed,
               (declared > 0 AND passed = 0 AND failed = declared) AS valid
        FROM sim
    """,
)
def x_fail_first_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fail-first policy truth table (``validators.py:377-410``) over
    simulated pytest summaries derived from events: declared/failed/passed
    counts → valid ⇔ all declared tests fail and none pass. The native
    predicate form of what the reference regex-parses out of pytest output
    (A8 / F7)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    declared = 1 + k % 4
    failed = F.when(F.col("event_type") == "error", 1 + k % 4).otherwise(k % 3)
    passed = F.when(F.col("event_type") == "click", 1).otherwise(0).cast("bigint")
    policy = fail_first_policy(declared, failed, passed, F.lit(0))
    return events.select(
        "event_id",
        declared.alias("declared"),
        failed.alias("failed"),
        passed.alias("passed"),
        policy["valid"].alias("valid"),
    )
