"""End-to-end corpus construction: the composition layer that strings the
individual LLM-data-pipeline operators (quality scoring → exact dedup →
deterministic stratified sampling → per-stratum accounting) into the one
query shape a training-data build actually runs.

Each stage is individually oracle-checked elsewhere (text_quality_score,
dedup_exact, text_stratified_sample); this module pins the COMPOSITION —
that the stages chain without re-shuffling more than necessary and that
the end-to-end result hash-matches an independent engine.

Scale shape: quality scoring and sampling are pure projections/filters
(scan speed, no exchange); dedup is the single content-hash shuffle; the
final per-language accounting is a partial-aggregated groupBy on a
handful of keys. Two exchanges total for the whole build over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.operators.text import STOPWORDS
from tbench_agentic_data_pipeline_spark.registry import query


@query(
    "pipeline_corpus_build",
    survey="P2,A1,SO2,W3",
    oracle="""
        WITH q AS (
            SELECT doc_id, lang, text, n_chars,
                   len(string_split(text, ' ')) AS n_tok,
                   (len(list_filter(string_split(text, ' '),
                        t -> list_contains(['the','a','of','and','to'], t)))
                        * 1000) // len(string_split(text, ' '))
                       AS stop_milli,
                   (len(list_distinct(string_split(text, ' '))) * 1000)
                        // len(string_split(text, ' ')) AS uniq_milli
            FROM documents
        ),
        scored AS (
            SELECT doc_id, lang, text, n_tok,
                   (CASE WHEN n_chars BETWEEN 100 AND 450 THEN 400 ELSE 0 END)
                 + (CASE WHEN stop_milli BETWEEN 20 AND 400 THEN 300 ELSE 0 END)
                 + (CASE WHEN uniq_milli >= 300 THEN 300 ELSE 0 END)
                       AS quality_milli
            FROM q
        ),
        kept AS (SELECT * FROM scored WHERE quality_milli >= 600),
        deduped AS (
            SELECT * FROM kept
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY md5(text) ORDER BY doc_id) = 1
        ),
        sampled AS (
            SELECT * FROM deduped
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                      % 100
                  < CASE WHEN lang = 'en' THEN 50 ELSE 90 END
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS docs_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
               CAST(MIN(quality_milli) AS BIGINT) AS min_quality_milli
        FROM sampled
        GROUP BY lang
    """,
)
def pipeline_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus build end-to-end: Gopher-style quality gate (≥600 milli) →
    exact dedup on content hash keeping the lowest doc_id → deterministic
    hash-stratified downsampling (en to 50%, rest to 90%) → per-language
    docs/token accounting. One content-hash exchange + one tiny final
    groupBy; everything else rides the scan."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_tok = F.size(w).cast("bigint")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_milli = F.floor(
        F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t)))
        .cast("bigint") * 1000 / n_tok
    )
    uniq_milli = F.floor(
        F.size(F.array_distinct(w)).cast("bigint") * 1000 / n_tok
    )
    quality = (
        F.when(F.col("n_chars").between(100, 450), 400).otherwise(0)
        + F.when(stop_milli.between(20, 400), 300).otherwise(0)
        + F.when(uniq_milli >= 300, 300).otherwise(0)
    ).cast("bigint")
    scored = docs.select(
        "doc_id", "lang", "text", n_tok.alias("n_tok"),
        quality.alias("quality_milli"),
    )
    kept = scored.where(F.col("quality_milli") >= 600)
    dd_w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        kept.withColumn("__rn", F.row_number().over(dd_w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    rate = F.when(F.col("lang") == "en", 50).otherwise(90)
    sampled = deduped.where(bucket < rate)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        F.min("quality_milli").cast("bigint").alias("min_quality_milli"),
    )
