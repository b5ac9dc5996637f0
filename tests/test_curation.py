"""Curation-operator behavior and plan-shape tests (repetition, PII,
contamination). Value parity with DuckDB is covered by
tests/test_oracle_parity.py; these pin semantics and scale shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.operators.curation import (
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    text_contamination,
    text_pii_redaction,
    text_repetition_filter,
    word_ngrams,
)
from tbench_agentic_data_pipeline_spark.plans.explain import (
    count_exchanges,
    has_broadcast_join,
)
from tests.conftest import SF_ORACLE


def test_word_ngrams_short_docs_empty(spark):
    df = spark.createDataFrame(
        [("a",), ("a b",), ("a b c",)], ["text"]
    ).select(
        word_ngrams(F.split("text", " "), 2).alias("g2"),
        word_ngrams(F.split("text", " "), 3).alias("g3"),
    )
    rows = df.collect()
    assert [r.g2 for r in rows] == [[], ["a b"], ["a b", "b c"]]
    assert [r.g3 for r in rows] == [[], [], ["a b c"]]


def test_repetition_metrics_on_known_doc(spark, monkeypatch):
    # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] -> top "x y"=3 of 5;
    # every 2-gram occurrence repeats -> dup2=1000; 3-grams all repeat too.
    import tbench_agentic_data_pipeline_spark.operators.curation as cur

    docs = spark.createDataFrame([(1, "x y x y x y")], ["doc_id", "text"])
    monkeypatch.setattr(cur, "load_table", lambda s, d, t: docs)
    row = text_repetition_filter(spark, "unused").collect()[0]
    assert row.n_grams2 == 5
    assert row.top2_milli == 600
    assert row.dup2_milli == 1000
    assert row.dup3_milli == 1000
    assert not row.keep


def test_pii_redaction_masks_all_planted(spark):
    out = text_pii_redaction(spark, SF_ORACLE)
    agg = out.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_ips").alias("i"),
    ).collect()[0]
    # 500 fixture docs, doc_id % 5 plants one PII item in 3 of 5 classes.
    assert (agg.e, agg.p, agg.i) == (100, 100, 100)


def test_pii_redaction_is_idempotent_no_residue(spark):
    # Rebuild the redacted text and recount: masking must leave zero hits.
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.curation import (
        _enrich_spark,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(_enrich_spark(), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IP_RE,
        "<IP>",
    )
    residue = docs.select(
        (
            F.regexp_count(red, F.lit(EMAIL_RE))
            + F.regexp_count(red, F.lit(PHONE_RE))
            + F.regexp_count(red, F.lit(IP_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("n")).collect()[0].n
    assert residue == 0


def test_pii_redaction_zero_shuffle(spark):
    # Pure projection: must run at scan speed with no Exchange at all.
    assert count_exchanges(text_pii_redaction(spark, SF_ORACLE)) == 0


def test_contamination_broadcasts_eval_set(spark):
    df = text_contamination(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    rows = df.collect()
    assert rows, "fixture corpus should have contaminated docs"
    # eval-set docs themselves are excluded from the report
    assert all(r.doc_id % 97 != 0 for r in rows)
    assert all(0 < r.n_overlap <= r.n_grams for r in rows)
    flagged = {r.flagged for r in rows}
    assert flagged == {True, False}, "threshold should split the fixture"
