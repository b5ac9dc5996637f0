"""Text analysis for LLM-corpus curation: language ID, quality scoring,
token counting, document fingerprinting.

These generalize the reference's F-family text checks
(``shared_tools/validators.py`` substring/regex analyses) into the
corpus-level operators a training-data pipeline filters 100 TB with. All
are single-pass per-row projections (codegen, no Python), so throughput is
scan-bound; scores use integer milli-units so every value is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

# Marker vocabularies for the n-gram/stopword language heuristic. A real
# deployment loads per-language profiles as a broadcast dim table; the
# mechanism (per-language token-hit scoring + argmax) is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "small"),
    "fr": ("le", "la", "vite", "petit"),
    "de": ("der", "die", "schnell", "klein"),
    "es": ("el", "la", "rapido", "chico"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to")

# BPE-ish tokenization: words, numbers, or single non-space symbols.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def marker_hits(tokens: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that are marker words (not distinct — frequency
    matters for the heuristic)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, r"\s+"))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (words / numbers / symbols)."""
    return F.regexp_count(text, F.lit(TOKEN_RE))


def rolling_fingerprint(th: str) -> Column:
    """Polynomial rolling hash over a token-hash array column (name-bound
    for the same SQL-only reason as ``dedup.simhash32``): order-sensitive
    document fingerprint, one fold per row."""
    return F.expr(
        f"aggregate({th}, 0L, (acc, h) -> (acc * 31 + h) % 1000000007)"
    )


# ---------------------------------------------------------------------------
# Registered oracle-checkable queries
# ---------------------------------------------------------------------------


def _lang_score_sql(lang: str) -> str:
    arr = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), "
        f"t -> list_contains([{arr}], t)))"
    )


@query(
    "text_langid",
    survey="F8,A1",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_lang_score_sql('en')} AS s_en,
                   {_lang_score_sql('fr')} AS s_fr,
                   {_lang_score_sql('de')} AS s_de,
                   {_lang_score_sql('es')} AS s_es
            FROM documents
        )
        SELECT doc_id,
               CASE
                   WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                   WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                   WHEN s_de >= s_es THEN 'de'
                   ELSE 'es'
               END                                          AS predicted_lang,
               CAST(s_en AS BIGINT)                         AS s_en,
               (CASE
                   WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                   WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                   WHEN s_de >= s_es THEN 'de'
                   ELSE 'es'
               END = lang)                                  AS matches_label
        FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via marker-token scoring with deterministic argmax
    (ties break in en>fr>de>es order). The fixture corpus is synthetic so
    accuracy is meaningless; the operator mechanics — per-language hit
    scoring in one pass, argmax without a shuffle — are what's checked."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            marker_hits(toks, LANG_MARKERS[lang]).cast("bigint").alias(f"s_{lang}")
            for lang in ("en", "fr", "de", "es")
        ],
    )
    predicted = (
        F.when(
            (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es")),
            "en",
        )
        .when((F.col("s_fr") >= F.col("s_de")) & (F.col("s_fr") >= F.col("s_es")), "fr")
        .when(F.col("s_de") >= F.col("s_es"), "de")
        .otherwise("es")
    )
    return scored.select(
        "doc_id",
        predicted.alias("predicted_lang"),
        "s_en",
        (predicted == F.col("lang")).alias("matches_label"),
    )


@query(
    "text_quality_score",
    survey="F13,F19,F20",
    oracle="""
        WITH t AS (
            SELECT doc_id, n_chars,
                   string_split(text, ' ') AS w,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents
        )
        SELECT doc_id,
               CAST(n_tok AS BIGINT) AS n_tokens,
               (length(array_to_string(w, '')) * 1000) // n_tok
                   AS avg_token_len_milli,
               (len(list_filter(w, t -> list_contains(
                   ['the', 'a', 'of', 'and', 'to'], t))) * 1000) // n_tok
                   AS stopword_milli,
               (len(list_distinct(w)) * 1000) // n_tok
                   AS uniq_milli,
               CAST((CASE WHEN n_chars BETWEEN 100 AND 450 THEN 400 ELSE 0 END)
                + (CASE WHEN (len(list_filter(w, t -> list_contains(
                      ['the', 'a', 'of', 'and', 'to'], t))) * 1000) // n_tok
                      BETWEEN 20 AND 400 THEN 300 ELSE 0 END)
                + (CASE WHEN (len(list_distinct(w)) * 1000) // n_tok >= 300
                      THEN 300 ELSE 0 END) AS BIGINT)
                   AS quality_milli
        FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length band + stopword ratio + lexical diversity,
    combined into an integer milli-score (the Gopher-rules shape). Pure
    projection — filters 100 TB at scan speed; all ratios are integer
    floor-divisions so both engines agree exactly."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_tok = F.size(w).cast("bigint")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))).cast("bigint")
    n_uniq = F.size(F.array_distinct(w)).cast("bigint")
    char_total = F.length(F.array_join(w, "")).cast("bigint")
    avg_tok_milli = F.floor(char_total * 1000 / n_tok).cast("bigint")
    stop_milli = F.floor(n_stop * 1000 / n_tok).cast("bigint")
    uniq_milli = F.floor(n_uniq * 1000 / n_tok).cast("bigint")
    quality = (
        F.when(F.col("n_chars").between(100, 450), 400).otherwise(0)
        + F.when(stop_milli.between(20, 400), 300).otherwise(0)
        + F.when(uniq_milli >= 300, 300).otherwise(0)
    ).cast("bigint")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        avg_tok_milli.alias("avg_token_len_milli"),
        stop_milli.alias("stopword_milli"),
        uniq_milli.alias("uniq_milli"),
        quality.alias("quality_milli"),
    )


@query(
    "text_token_count",
    survey="F4,F7",
    oracle=r"""
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                    AS BIGINT)                                      AS n_bpe_tokens
        FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and BPE-ish regex
    (words|numbers|symbols) — the cost model for context budgeting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_ws(F.col("text")).cast("bigint").alias("n_ws_tokens"),
        token_count_bpe(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
    )


@query(
    "text_normalize",
    survey="F10,F11",
    oracle="""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS normalized,
               length(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS n_norm_chars
        FROM documents WHERE doc_id < 200
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus normalization (the pre-dedup canonical form): lowercase,
    strip non-alphanumerics, collapse whitespace — all codegen'd
    regexp_replace, the step every exact-dedup key hangs off."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.where(F.col("doc_id") < 200).select(
        "doc_id",
        norm.alias("normalized"),
        F.length(norm).cast("bigint").alias("n_norm_chars"),
    )


@query(
    "text_chunking",
    survey="F4,X3",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        chunks AS (
            SELECT doc_id, c AS chunk_idx,
                   array_to_string(w[c*16+1 : c*16+20], ' ') AS chunk
            FROM t, LATERAL (
                SELECT unnest(range(0, GREATEST((len(w) + 15) // 16, 1))) AS c
            )
        )
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk,
               CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_tokens
        FROM chunks WHERE chunk <> ''
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking with overlap: 16-token stride, 20-token window
    (4-token overlap) — the context-window preprocessing step. slice +
    posexplode keeps it JVM-side; one row in, ceil(n/16) rows out."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_chunks = F.greatest(F.ceil(F.size(w) / 16).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.array_join(F.slice(w, c * 16 + 1, 20), " "),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .where(F.col("chunk") != "")
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            "chunk",
            F.size(F.split("chunk", " ")).cast("bigint").alias("chunk_tokens"),
        )
    )


@query(
    "text_stratified_sample",
    survey="P4,A1",
    oracle="""
        SELECT doc_id, lang
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
              < CASE WHEN lang = 'en' THEN 10 ELSE 40 END
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates via a content
    hash (downsample dominant 'en', upsample the rest) — reproducible
    across runs/engines unlike rand(), and exactly the shape used to
    rebalance a 100 TB corpus by language/source."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    rate = F.when(F.col("lang") == "en", 10).otherwise(40)
    return docs.where(bucket < rate).select("doc_id", "lang")


@query(
    "text_sequence_packing",
    survey="W2,A4",
    oracle="""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
        ),
        packed AS (
            SELECT doc_id, n_tok,
                   SUM(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t
        )
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
               CAST((cum - n_tok) // 512 AS BIGINT) AS pack_id
        FROM packed
    """,
)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign docs (in stable doc_id order) to
    512-token training bins by running token count — bin = floor(tokens
    before me / 512). The batch-construction step of an LLM data loader;
    at scale the window runs per shard (partitionBy on a shard key) to
    avoid the global sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = docs.select("doc_id", n_tok.alias("n_tok"))
    cum = F.sum("n_tok").over(w)
    return t.select(
        "doc_id",
        "n_tok",
        F.floor((cum - F.col("n_tok")) / 512).cast("bigint").alias("pack_id"),
    )


@query(
    "text_fingerprint",
    survey="F1,P4",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '),
                       tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT) AS th
            FROM documents
        )
        SELECT doc_id,
               list_reduce(list_prepend(0::BIGINT, th),
                   (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS bow_fingerprint
        FROM (SELECT doc_id, text FROM documents) d
        JOIN t USING (doc_id)
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-sensitive polynomial rolling hash
    over token hashes, plus an order-insensitive bag-of-words md5 — the
    pair distinguishes reordered near-dups from true dups."""
    docs = load_table(spark, sf_dir, "documents")
    from tbench_agentic_data_pipeline_spark.operators.dedup import token_hashes32

    bow = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " "))
    return docs.select(
        "doc_id", token_hashes32(F.split("text", " ")).alias("th"), bow.alias("bow_fingerprint")
    ).select(
        "doc_id",
        rolling_fingerprint("th").alias("fingerprint"),
        "bow_fingerprint",
    )


@query(
    "text_tfidf_topk",
    survey="A1,J4,W3",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
        ),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   ROUND((tf.tf * ln(
                       (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents)
                       / df.df)) * (1 + 5e-13), 6) AS tfidf
            FROM tf JOIN df USING (term)
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
            FROM scored
        )
        SELECT doc_id, term, tf, df, tfidf,
               CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 5
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per document - the corpus-statistics workhorse
    (keyword extraction, topic labeling, relevance features).

    Shape: explode tokens -> TF groupBy(doc,term) -> DF as COUNT OVER
    (PARTITION BY term) on the TF frame -> per-doc window rank. The
    window formulation replaces the round-4 DF-aggregate + join-back
    (which re-shuffled the whole TF table on term a second time,
    measured 5 exchanges): one term exchange now serves the DF count
    directly, cutting the plan to 4 exchanges — at corpus scale the
    saved shuffle is TF-table-sized, the largest intermediate in the
    query. All aggregates keep map-side partial combine; the corpus
    count is a broadcast scalar. Ranking uses the STABLE-ROUNDED score
    so cross-engine ulp noise in ln() cannot reorder the top-k (ties
    then break on term).
    """
    from tbench_agentic_data_pipeline_spark.functions.numeric import stable_round
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # DF = rows per term in TF (each row is a distinct doc by
    # construction): a count over the term partition — no second
    # TF-table shuffle, no join build.
    df_over_term = F.count(F.lit(1)).over(Window.partitionBy("term"))
    scored = (
        tf.withColumn("df", df_over_term)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            stable_round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 5)
        .select("doc_id", "term", "tf", "df", "tfidf", F.col("rk").cast("bigint").alias("rk"))
    )


@query(
    "text_zipf_fluency",
    survey="A1,J5,W2",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        freq AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
        vocab AS (
            SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT)
                       AS rank
            FROM freq
            QUALIFY rank <= 256
        ),
        joined AS (
            SELECT t.doc_id, v.rank FROM toks t
            LEFT JOIN vocab v ON t.w = v.w
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT)                       AS n_tokens,
               CAST(COUNT(*) - COUNT(rank) AS BIGINT)         AS n_oov,
               CAST(CASE WHEN COUNT(rank) = 0 THEN -1
                         ELSE (SUM(rank) * 1000) // COUNT(rank)
                    END AS BIGINT)                            AS mean_rank_milli
        FROM joined
        GROUP BY doc_id
    """,
)
def text_zipf_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-class fluency scoring: rank the corpus's top-256 words
    by frequency (ties by word — deterministic), then score each document
    by its out-of-vocabulary token count and the mean frequency rank of
    its in-vocabulary tokens (milli-units, integer division — engine
    exact). Low mean rank + low OOV ≈ fluent common prose; high values
    flag jargon/noise docs for the curation gates.

    Scale shape: the vocabulary derives from a full-corpus word count —
    one shuffle on word with map-side combine — but the RESULT is
    top-256, a window over the vocabulary-sized aggregate that then
    BROADCASTS back to the per-token scoring pass. The corpus-side score
    is explode → broadcast-hash lookup → per-doc aggregate (map-side
    combinable): corpus rows never shuffle on word."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # Top-256 via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps, driver merges 256 rows) — the vocabulary-sized aggregate
    # never funnels through a single-partition sort. The deterministic
    # order (count desc, word asc) makes the cut identical to the
    # oracle's QUALIFY rank <= 256. The residual row_number window runs
    # over exactly 256 rows.
    top = freq.orderBy(F.desc("c"), F.col("w")).limit(256)
    vocab = top.select(
        "w",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.col("w")))
        .cast("bigint")
        .alias("rank"),
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            (F.count(F.lit(1)) - F.count("rank")).cast("bigint").alias("n_oov"),
            F.when(F.count("rank") == 0, F.lit(-1).cast("bigint"))
            .otherwise(
                F.expr("(sum(rank) * 1000) div count(rank)")
            )
            .alias("mean_rank_milli"),
        )
    )


@query(
    "text_bm25_topk",
    survey="A4,J5,W2",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS DOUBLE) AS dl,
                   CAST(SUM(CASE WHEN term = 'hash'   THEN 1 ELSE 0 END) AS DOUBLE) AS tf_hash,
                   CAST(SUM(CASE WHEN term = 'join'   THEN 1 ELSE 0 END) AS DOUBLE) AS tf_join,
                   CAST(SUM(CASE WHEN term = 'stream' THEN 1 ELSE 0 END) AS DOUBLE) AS tf_stream
            FROM toks GROUP BY doc_id
        ),
        stats AS (
            SELECT AVG(dl) AS avgdl,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CASE WHEN tf_hash   > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_hash,
                   CAST(SUM(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_join,
                   CAST(SUM(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_stream
            FROM per_doc
        ),
        scored AS (
            SELECT d.doc_id,
                   (CASE WHEN tf_hash > 0 THEN
                        ln(1 + (s.n - s.df_hash + 0.5) / (s.df_hash + 0.5))
                        * tf_hash * 2.2
                        / (tf_hash + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
                    ELSE 0 END)
                 + (CASE WHEN tf_join > 0 THEN
                        ln(1 + (s.n - s.df_join + 0.5) / (s.df_join + 0.5))
                        * tf_join * 2.2
                        / (tf_join + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
                    ELSE 0 END)
                 + (CASE WHEN tf_stream > 0 THEN
                        ln(1 + (s.n - s.df_stream + 0.5) / (s.df_stream + 0.5))
                        * tf_stream * 2.2
                        / (tf_stream + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
                    ELSE 0 END) AS score,
                   CAST((CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END)
                      + (CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)
                      + (CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_terms_hit
            FROM per_doc d CROSS JOIN stats s
        )
        SELECT doc_id, ROUND(score * (1 + 5e-13), 6) AS bm25, n_terms_hit
        FROM scored
        WHERE n_terms_hit > 0
        ORDER BY bm25 DESC, doc_id
        LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring: rank the corpus for the query
    {hash, join, stream} (k1=1.2, b=0.75) and return the top-10 docs —
    the lexical-retrieval half of a RAG/training-data search stack next
    to the embedding top-k family.

    Shape — TWO exchanges total for a corpus-wide ranked retrieval:
    tokens explode into ONE conditional per-doc aggregate (doc length +
    one tf column per query term in the same pass, map-side combined),
    corpus stats (avgdl, N, per-term df) are a second single-row
    aggregate over it, broadcast back via a 1-row cross join; the
    per-term BM25 contributions then sum in FIXED expression order (no
    cross-engine sum-order nondeterminism), and the top-10 is
    orderBy+limit → TakeOrderedAndProject (per-partition heaps, no
    global sort). This is the inverted-index-free form: at 100 TB the
    scored side stays one pass over the corpus and only doc-count-sized
    aggregates ever shuffle. Ranking compares the STABLE-ROUNDED score,
    ties break on doc_id."""
    from tbench_agentic_data_pipeline_spark.functions.numeric import stable_round

    terms = ["hash", "join", "stream"]
    k1, b = 1.2, 0.75
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("double")
            .alias(f"tf_{t}")
            for t in terms
        ],
    )
    stats = per_doc.agg(
        F.avg("dl").alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).cast("double").alias(f"df_{t}")
            for t in terms
        ],
    )

    def contrib(t: str):
        tf, df = F.col(f"tf_{t}"), F.col(f"df_{t}")
        idf = F.log(1 + (F.col("n") - df + 0.5) / (df + 0.5))
        part = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        return F.when(tf > 0, part).otherwise(F.lit(0.0))

    score = contrib(terms[0]) + contrib(terms[1]) + contrib(terms[2])
    hits = sum(
        (F.col(f"tf_{t}") > 0).cast("bigint") for t in terms
    )
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            stable_round(score, 6).alias("bm25"),
            hits.alias("n_terms_hit"),
        )
        .where(F.col("n_terms_hit") > 0)
        .orderBy(F.desc("bm25"), F.col("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (round 8): the missing half of "token counting".
# token_count_bpe COUNTS with a BPE-ish regex; these operators TRAIN the
# merge table itself, distributed — the corpus-scale half of building a
# tokenizer for a new training mix. Reference parity: generalizes the
# F-family token handling (shared_tools/validators.py) the same way the
# curation operators generalize its substring checks.
# ---------------------------------------------------------------------------


def char_symbols(word: Column) -> Column:
    """Initial BPE symbol sequence: one single-character symbol per
    position (per-row projection, no Python). Empty words (consecutive
    or edge whitespace after a split) yield an EMPTY sequence — Spark's
    ``sequence(1, 0)`` counts DOWN to ``[1, 0]``, which would emit two
    phantom empty-string symbols per empty word and break the lossless
    flatten contract."""
    return F.when(
        F.length(word) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def adjacent_pairs(syms: Column) -> Column:
    """array<struct<lhs,rhs>> of adjacent symbol pairs — the unit BPE
    counts. Empty for sequences shorter than 2."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.slice(syms, 1, n - 1),
            lambda s, i: F.struct(
                s.alias("lhs"),
                F.element_at(syms, i + F.lit(2)).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))


def bpe_apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """Apply one BPE merge left-to-right without overlap (``aaa`` under
    merge (a,a) → ``[aa, a]`` — the standard greedy semantics): a
    sequential fold with (emitted, pending) state, entirely in
    higher-order functions — per-row, no shuffle, no Python."""
    merged = lhs + rhs
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, s: Column) -> Column:
        out, pend = acc.getField("out"), acc.getField("pend")
        take = pend.isNotNull() & (pend == F.lit(lhs)) & (s == F.lit(rhs))
        return (
            F.when(take, F.struct(
                F.concat(out, F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ))
            .when(pend.isNull(), F.struct(
                out.alias("out"), s.alias("pend"),
            ))
            .otherwise(F.struct(
                F.concat(out, F.array(pend)).alias("out"), s.alias("pend"),
            ))
        )

    def fin(acc: Column) -> Column:
        return F.when(
            acc.getField("pend").isNull(), acc.getField("out")
        ).otherwise(F.concat(acc.getField("out"), F.array(acc.getField("pend"))))

    return F.aggregate(syms, init, step, fin)


def bpe_train(
    docs: DataFrame, text_col: str = "text", num_merges: int = 8,
    min_count: int = 2, checkpoint_every: int = 4,
) -> list[tuple[str, str]]:
    """Train a BPE merge table over a corpus (Sennrich-style): build the
    word-frequency table ONCE (the only full-corpus shuffle — at 100 TB
    the symbol work then runs over |vocab| rows, not |corpus|), then per
    round count weighted adjacent pairs, pick the most frequent
    (tie-break: lexicographic, deterministic), and apply the merge as a
    per-row fold. The per-round argmax is a 1-row collect — the same
    convergence-scalar pattern as k-means/connected-components — and
    lineage is truncated with ``localCheckpoint`` every
    ``checkpoint_every`` rounds exactly like pointer-jumping CC.
    Returns the ordered merge list."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.length("w") >= 1)
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    table = vocab.select(char_symbols(F.col("w")).alias("syms"), "freq")
    merges: list[tuple[str, str]] = []
    for r in range(num_merges):
        pairs = table.select(
            F.explode(adjacent_pairs(F.col("syms"))).alias("p"), "freq"
        )
        best = (
            pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        lhs, rhs = best[0]["lhs"], best[0]["rhs"]
        merges.append((lhs, rhs))
        table = table.select(
            bpe_apply_merge(F.col("syms"), lhs, rhs).alias("syms"), "freq"
        )
        if (r + 1) % checkpoint_every == 0:
            table = table.localCheckpoint(eager=True)
    return merges


@query(
    "text_bpe_pairs",
    survey="X3,A1,W2",
    oracle="""
        WITH w AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        p AS (
            SELECT unnest([substr(w, CAST(i AS INT), 1)
                           for i in range(1, len(w))]) AS lhs,
                   unnest([substr(w, CAST(i AS INT) + 1, 1)
                           for i in range(1, len(w))]) AS rhs
            FROM w WHERE len(w) >= 2
        ),
        counts AS (
            SELECT lhs, rhs, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM p GROUP BY lhs, rhs
        ),
        ranked AS (
            SELECT lhs, rhs, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, lhs, rhs) AS rank
            FROM counts
        )
        SELECT lhs, rhs, cnt, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 20
    """,
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training round over the corpus, externally pinned:
    adjacent character-pair frequencies within whitespace words, top 20
    by count (tie-break lexicographic — deterministic on both engines;
    integer counts, hash-exact). This is :func:`bpe_train`'s per-round
    counting stage as a standalone query — the iterative trainer itself
    is pinned against a pure-Python Sennrich reference in
    ``tests/test_bpe.py``. Scale shape: one explode + one
    partial-aggregated count shuffle on a 2-char key (bounded
    cardinality ≤ |alphabet|²), then a global top-k — the same
    TakeOrderedAndProject shape as ``w2_global_topn``."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") >= 2)
    # On single-char symbols the adjacent pair IS the 2-char substring —
    # one substr per position instead of a struct build + element_at
    # (the struct form measured ~2× slower on the explode hot path);
    # lhs/rhs split back out AFTER the count, on ≤|alphabet|² rows.
    bigrams = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.col("w").substr(i, F.lit(2)),
    )
    pairs = words.select(F.explode(bigrams).alias("bg"))
    counts = pairs.groupBy("bg").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    rank_w = Window.orderBy(F.desc("cnt"), F.col("bg"))
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= 20)
        .select(
            F.substring("bg", 1, 1).alias("lhs"),
            F.substring("bg", 2, 1).alias("rhs"),
            "cnt",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def save_bpe_merges(spark: SparkSession, merges: list[tuple[str, str]],
                    root: str) -> int:
    """Persist an ordered BPE merge table through the same versioned
    snapshot lifecycle as the IVF/PQ indexes (atomic manifest flip,
    previous version = rollback): (merge_rank, lhs, rhs) rows. Returns
    the committed version."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank long, lhs string, rhs string",
    )
    return SnapshotTable(spark, root).commit(
        df.coalesce(1), operation="bpe_merges"
    )


def load_bpe_merges(spark: SparkSession, root: str,
                    version: int | None = None) -> list[tuple[str, str]]:
    """Load a persisted merge table back into the ordered list
    :func:`bpe_encode` applies — merge tables are vocab-sized (tiny) by
    construction, so the collect is bounded like a codebook's."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    rows = SnapshotTable(spark, root).read(version).collect()
    return [
        (r["lhs"], r["rhs"])
        for r in sorted(rows, key=lambda r: r["merge_rank"])
    ]


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Apply a trained merge table: whitespace words → char symbols →
    the merges in training order, each one a per-row fold — k merges is
    k chained higher-order expressions inside one projection, zero
    shuffles, the shape that tokenizes 100 TB at scan speed. Output:
    the input rows plus a ``tokens array<string>`` column (words
    flattened in order)."""
    word_syms = F.transform(
        F.split(F.col(text_col), " "),
        lambda w: char_symbols(w),
    )
    def apply_one(col: Column, lhs: str, rhs: str) -> Column:
        # a named factory, not a defaulted lambda: pyspark reads the
        # lambda's arity from its signature, so extra bound params would
        # be mistaken for higher-order-function arguments
        return F.transform(col, lambda ws: bpe_apply_merge(ws, lhs, rhs))

    merged = word_syms
    for lhs, rhs in merges:
        merged = apply_one(merged, lhs, rhs)
    return docs.withColumn("tokens", F.flatten(merged))
