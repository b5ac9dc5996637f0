"""Corpus-curation operators: repetition filtering, PII redaction, and
benchmark decontamination.

These extend the text-analysis family (``operators/text.py``) with the
three filters every LLM training-data pipeline runs before a corpus ships:
Gopher-style repeated-n-gram quality gates, regex PII masking, and
eval-set contamination checks. The reference's validator layer
(``shared_tools/validators.py``) applies per-record regex/substring
checks; these are the corpus-scale generalizations of that idea.

Scale shapes (the part that matters at 100 TB):
- repetition: explode n-grams -> two keyed aggregations, both with
  map-side partial combine; no per-row O(n^2) array scans, no windows.
- PII: pure codegen'd regexp projection - filters at scan speed.
- contamination: the eval set is tiny by construction, so its distinct
  n-grams BROADCAST; the corpus side never shuffles except the final
  per-doc hit count (map-side combinable). The corpus is the big side
  and it is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import (
    load_table,
    spread_for_compute,
    table_path,
)
from tbench_agentic_data_pipeline_spark.registry import query


def word_ngrams(w: Column, n: int) -> Column:
    """Space-joined word ``n``-grams of a token-array column; empty array
    when the document has fewer than ``n`` tokens (Spark's ``sequence``
    would otherwise count DOWN and fabricate grams)."""
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])
    return F.when(F.size(w) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def _duck_ngrams(n: int) -> str:
    """DuckDB twin of :func:`word_ngrams` (1-based list indexing;
    ``range(1, len-n+2)`` is empty when the doc is too short)."""
    parts = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(n))
    return f"list_transform(range(1, len(w) - {n - 2}), i -> {parts})"


# ---------------------------------------------------------------------------
# Repetition filter (Gopher-style repeated n-gram gates)
# ---------------------------------------------------------------------------


@query(
    "text_repetition_filter",
    survey="F13,A1,A4",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        g AS (
            SELECT doc_id, 2 AS n, unnest({_duck_ngrams(2)}) AS gram FROM t
            UNION ALL
            SELECT doc_id, 3 AS n, unnest({_duck_ngrams(3)}) AS gram FROM t
        ),
        c AS (
            SELECT doc_id, n, gram, COUNT(*) AS cnt FROM g GROUP BY ALL
        ),
        p AS (
            SELECT doc_id,
                   MAX(CASE WHEN n = 2 THEN cnt END)               AS top2,
                   CAST(SUM(CASE WHEN n = 2 THEN cnt END) AS BIGINT) AS tot2,
                   COALESCE(CAST(SUM(CASE WHEN n = 2 AND cnt > 1
                                 THEN cnt END) AS BIGINT), 0)      AS dup2,
                   COALESCE(CAST(SUM(CASE WHEN n = 3 AND cnt > 1
                                 THEN cnt END) AS BIGINT), 0)      AS dup3,
                   CAST(SUM(CASE WHEN n = 3 THEN cnt END) AS BIGINT) AS tot3
            FROM c GROUP BY doc_id
        )
        SELECT doc_id,
               tot2                                            AS n_grams2,
               (top2 * 1000) // tot2                           AS top2_milli,
               (dup2 * 1000) // tot2                           AS dup2_milli,
               CASE WHEN tot3 IS NULL THEN 0
                    ELSE (dup3 * 1000) // tot3 END             AS dup3_milli,
               ((top2 * 1000) // tot2 <= 80 AND
                CASE WHEN tot3 IS NULL THEN 0
                     ELSE (dup3 * 1000) // tot3 END <= 100)    AS keep
        FROM p
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-n-gram quality gate (the Gopher repetition rules): per doc,
    the top-2-gram occupancy, the fraction of 2-/3-gram occurrences whose
    gram repeats, and a keep flag. Docs under 2 tokens drop out (no grams).

    Plan: one explode over tagged 2+3-grams, groupBy(doc,n,gram) count,
    groupBy(doc) conditional rollup - two shuffles, both partial-agg
    combinable, nothing quadratic in document length (the per-row
    ``filter(grams, g -> count(...))`` formulation is O(n^2) per doc and
    was rejected for exactly that reason).
    """
    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        source_path=table_path(sf_dir, "documents"),
    )
    w = F.split("text", " ")
    tagged = F.concat(
        F.transform(
            word_ngrams(w, 2),
            lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
        ),
        F.transform(
            word_ngrams(w, 3),
            lambda g: F.struct(F.lit(3).alias("n"), g.alias("gram")),
        ),
    )
    counts = (
        docs.select("doc_id", F.explode(tagged).alias("t"))
        .select("doc_id", "t.n", "t.gram")
        .groupBy("doc_id", "n", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    is2, is3 = F.col("n") == 2, F.col("n") == 3
    per_doc = counts.groupBy("doc_id").agg(
        F.max(F.when(is2, F.col("cnt"))).alias("top2"),
        F.sum(F.when(is2, F.col("cnt"))).alias("tot2"),
        F.coalesce(F.sum(F.when(is2 & (F.col("cnt") > 1), F.col("cnt"))), F.lit(0)).alias("dup2"),
        F.coalesce(F.sum(F.when(is3 & (F.col("cnt") > 1), F.col("cnt"))), F.lit(0)).alias("dup3"),
        F.sum(F.when(is3, F.col("cnt"))).alias("tot3"),
    )
    top2_milli = F.expr("(top2 * 1000) div tot2")
    dup2_milli = F.expr("(dup2 * 1000) div tot2")
    dup3_milli = F.expr(
        "CASE WHEN tot3 IS NULL THEN 0L ELSE (dup3 * 1000) div tot3 END"
    )
    return per_doc.select(
        "doc_id",
        F.col("tot2").cast("bigint").alias("n_grams2"),
        top2_milli.cast("bigint").alias("top2_milli"),
        dup2_milli.cast("bigint").alias("dup2_milli"),
        dup3_milli.cast("bigint").alias("dup3_milli"),
        ((top2_milli <= 80) & (dup3_milli <= 100)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2- and Java-compatible patterns (both engines): no lookaround, ASCII \b.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# The fixture corpus is synthetic word soup with no organic PII, so the
# query plants deterministic PII derived from doc_id before redacting -
# both engines compute the same enrichment, making the full
# inject->detect->mask cycle oracle-checkable instead of vacuously zero.
_ENRICH_SQL = """
    CASE doc_id % 5
        WHEN 0 THEN text || ' reach user' || doc_id || '@example.com today'
        WHEN 1 THEN text || ' call 415-555-' ||
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
        WHEN 2 THEN text || ' at host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
        ELSE text
    END
"""


def _enrich_spark() -> Column:
    d = F.col("doc_id")
    return (
        F.when(
            d % 5 == 0,
            F.concat(F.col("text"), F.lit(" reach user"), d.cast("string"),
                     F.lit("@example.com today")),
        )
        .when(
            d % 5 == 1,
            F.concat(F.col("text"), F.lit(" call 415-555-"),
                     F.lpad((d % 10000).cast("string"), 4, "0"), F.lit(" now")),
        )
        .when(
            d % 5 == 2,
            F.concat(F.col("text"), F.lit(" at host 10.0."),
                     (d % 256).cast("string"), F.lit("."),
                     ((d * 3) % 256).cast("string")),
        )
        .otherwise(F.col("text"))
    )


@query(
    "text_pii_redaction",
    survey="F7,F10,U2",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_ENRICH_SQL} AS etext FROM documents
        ),
        r AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(etext, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(etext, '{PHONE_RE}')) AS BIGINT) AS n_phones,
                   CAST(len(regexp_extract_all(etext, '{IP_RE}')) AS BIGINT)    AS n_ips,
                   regexp_replace(regexp_replace(regexp_replace(etext,
                       '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PHONE_RE}', '<PHONE>', 'g'),
                       '{IP_RE}', '<IP>', 'g') AS redacted
            FROM t
        )
        SELECT doc_id, n_emails, n_phones, n_ips,
               md5(redacted)                        AS redacted_md5,
               CAST(length(redacted) AS BIGINT)     AS n_redacted_chars
        FROM r
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and mask emails, NANP phone numbers, and IPv4
    addresses (email first - the other patterns can't create or destroy
    one; phone before IP - neither overlaps). Emits the redacted text's
    md5 + length so the oracle pins the full masked string without
    hashing megabytes of text columns.

    Pure regexp projection (codegen, no shuffle): at 100 TB this runs at
    parquet scan speed and is exactly how a production pass strips PII
    before tokenization.
    """
    docs = load_table(spark, sf_dir, "documents")
    etext = _enrich_spark()
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(etext, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(etext, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(etext, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count(etext, F.lit(IP_RE)).cast("bigint").alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("bigint").alias("n_redacted_chars"),
    )


# ---------------------------------------------------------------------------
# Benchmark contamination check
# ---------------------------------------------------------------------------


@query(
    "text_contamination",
    survey="J1,A4,F8",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        g AS (
            SELECT doc_id,
                   len(list_distinct({_duck_ngrams(3)})) AS n_grams,
                   unnest(list_distinct({_duck_ngrams(3)})) AS gram
            FROM t
        ),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
        SELECT g.doc_id,
               CAST(g.n_grams AS BIGINT)        AS n_grams,
               CAST(COUNT(*) AS BIGINT)         AS n_overlap,
               (COUNT(*) * 1000) // g.n_grams   AS contam_milli,
               (COUNT(*) * 1000) // g.n_grams >= 50 AS flagged
        FROM g JOIN bench USING (gram)
        WHERE g.doc_id % 97 <> 0
        GROUP BY g.doc_id, g.n_grams
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: find corpus documents sharing any
    3-gram with the held-out eval set (here a deterministic doc_id % 97
    slice standing in for an external benchmark table). Emits each
    contaminated doc's distinct-gram overlap count and fraction.

    Plan shape for 100 TB: the eval set's distinct grams are tiny ->
    BROADCAST to the corpus scan; the corpus explodes its distinct grams
    once, hash-semi-joins against the broadcast, and aggregates per doc
    (map-side combinable). The corpus side never shuffles on gram - the
    only exchange is the final per-doc count, bounded by hit rows.
    """
    raw = load_table(spark, sf_dir, "documents")
    g3 = F.array_distinct(word_ngrams(F.split("text", " "), 3))

    # The ngram pipeline lives INLINE in each Generate: explode over a
    # pre-projected HOF alias runs ~12× slower than the same expression
    # inline in the generator (measured 7 s vs 0.6 s at sf0.1), and a
    # size() sibling in the explode's select would get inlined into the
    # post-Generate projection and recomputed per gram row (255 s
    # before round 2). So the explode emits ONLY (doc_id, gram) and
    # n_grams is recovered per doc by counting the exploded rows — exact
    # because array_distinct makes gram rows unique within a doc.
    def grams_of(docs: DataFrame) -> DataFrame:
        return docs.select("doc_id", F.explode(g3).alias("gram"))

    # Bench side from the UNSPREAD scan: its doc_id filter then pushes
    # into the parquet read (a repartition blocks pushdown), so the
    # broadcast subquery tokenizes only the 1/97 eval slice.
    bench = (
        grams_of(raw.where(F.col("doc_id") % 97 == 0))
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = grams_of(
        spread_for_compute(
            raw.where(F.col("doc_id") % 97 != 0),
            "doc_id",
            source_path=table_path(sf_dir, "documents"),
        )
    )
    # ONE pass over the corpus grams: left-join the broadcast eval set,
    # then a single per-doc aggregate yields both the gram total and the
    # overlap count (map-side combinable).
    per_doc = (
        corpus.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count("hit").cast("bigint").alias("n_overlap"),
        )
        .where(F.col("n_overlap") > 0)
    )
    contam = F.expr("(n_overlap * 1000) div n_grams")
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_overlap",
        contam.cast("bigint").alias("contam_milli"),
        (contam >= 50).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Data-mixture weighting
# ---------------------------------------------------------------------------


@query(
    "text_mixture_weights",
    survey="A1,A4,F21",
    oracle="""
        WITH g AS (
            SELECT lang, source,
                   CAST(COUNT(*) AS BIGINT)                            AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)   AS n_tokens
            FROM documents GROUP BY lang, source
        ),
        t AS (
            SELECT *,
                   SUM(n_docs) OVER ()        AS n_total,
                   SUM(sqrt(n_docs)) OVER ()  AS s_total
            FROM g
        )
        SELECT lang, source, n_docs, n_tokens,
               CAST((n_docs * 1000) // n_total AS BIGINT) AS share_milli,
               ROUND((1000.0 * sqrt(n_docs) / s_total) * (1 + 5e-13), 2)
                   AS weight_milli
        FROM t
    """,
)
def text_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture weights per (lang, source) stratum: document and
    token counts, corpus share, and temperature-scaled sampling weights
    w_i ~ sqrt(n_i) (alpha=0.5 - upweights rare strata, the multilingual
    rebalancing rule). sqrt is IEEE-exact in both engines and the
    normalizer N cancels, so only the stable-rounded normalized weight
    touches cross-engine float noise.

    Plan: one groupBy over the corpus (map-side combinable), then totals
    as a broadcast scalar - the grouped table is stratum-cardinality
    (tiny by construction), so nothing corpus-sized passes a single
    partition."""
    from tbench_agentic_data_pipeline_spark.functions.numeric import stable_round

    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    totals = g.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.sqrt("n_docs")).alias("s_total"),
    )
    return g.crossJoin(F.broadcast(totals)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.expr("(n_docs * 1000) div n_total").cast("bigint").alias("share_milli"),
        stable_round(1000.0 * F.sqrt("n_docs") / F.col("s_total"), 2).alias(
            "weight_milli"
        ),
    )


# ---------------------------------------------------------------------------
# Cross-document n-gram novelty (memorization / boilerplate audit)
# ---------------------------------------------------------------------------


@query(
    "text_ngram_novelty",
    survey="F13,A1,A7",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        g AS (
            SELECT DISTINCT doc_id, unnest({_duck_ngrams(8)}) AS gram FROM t
        ),
        x AS (
            SELECT doc_id, COUNT(*) OVER (PARTITION BY gram) AS ndocs FROM g
        ),
        p AS (
            SELECT doc_id,
                   COUNT(*) AS n_grams,
                   CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END)
                        AS BIGINT)  AS shared_grams,
                   MAX(ndocs)       AS max_gram_docs
            FROM x GROUP BY doc_id
        )
        SELECT doc_id, n_grams, shared_grams, max_gram_docs,
               ((n_grams - shared_grams) * 1000) // n_grams AS novelty_milli
        FROM p
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document 8-gram novelty: for each doc, how many of its
    DISTINCT word 8-grams appear in at least one OTHER document
    (``shared_grams``), the widest spread of any of its grams
    (``max_gram_docs``), and the novel fraction in milli-units. The
    corpus-level memorization/boilerplate audit (ExactSubstr-lite at
    fixed gram length): exact duplicates read novelty 0, boilerplate
    families read high ``max_gram_docs``. Complements
    ``text_repetition_filter`` (WITHIN-doc repetition) and
    ``text_contamination`` (overlap vs a held-out eval set) — this is
    corpus-vs-itself. Reference analog: the validator layer's
    per-record substring checks (``shared_tools/validators.py``)
    generalized to corpus scale. Docs shorter than 8 tokens have no
    grams and drop out (both engines agree).

    Plan shape for 100 TB: grams are distinct per doc BEFORE the explode
    (``array_distinct`` inside the generator — per-doc set semantics for
    free, no pre-shuffle dedup), then exactly two exchanges: a window
    count over gram (the cross-doc spread — count-only frame, no sort,
    no join-back; the same one-shuffle-cheaper form as
    ``text_tfidf_topk``'s DF-over-term) and the per-doc rollup
    (map-side combinable). Nothing corpus-sized crosses the driver; the
    gram key is high-cardinality so the window partitioning spreads —
    the hot-gram skew ceiling is ``max_gram_docs`` rows per key, the
    number this query exists to report.
    """
    from pyspark.sql import Window

    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        source_path=table_path(sf_dir, "documents"),
    )
    # Inline in the generator (the contamination lesson: a pre-projected
    # HOF alias re-evaluates per gram row, measured ~12x slower).
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.split("text", " "), 8))).alias(
            "gram"
        ),
    )
    ndocs = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    per_doc = (
        grams.select("doc_id", ndocs.alias("ndocs"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("shared_grams"),
            F.max("ndocs").cast("bigint").alias("max_gram_docs"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "shared_grams",
        "max_gram_docs",
        F.expr("((n_grams - shared_grams) * 1000) div n_grams")
        .cast("bigint")
        .alias("novelty_milli"),
    )
