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

from tbench_agentic_data_pipeline_spark.catalog import (
    load_table,
    spread_for_compute,
    table_path,
)
from tbench_agentic_data_pipeline_spark.operators.dedup import (
    _BROADCAST_LABELS_BELOW,
    connected_components,
    lsh_candidate_pairs,
    minhash_band_df,
    resolve_near_duplicates,
    shingles,
)
from tbench_agentic_data_pipeline_spark.operators.similarity import (
    as_double,
    embedding_multiprobe_pairs,
)
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
    deduped = _quality_deduped(load_table(spark, sf_dir, "documents"))
    sampled = deduped.where(_sample_bucket() < _sample_rate())
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        F.min("quality_milli").cast("bigint").alias("min_quality_milli"),
    )


def _quality_deduped(docs: DataFrame) -> DataFrame:
    """Shared front of the corpus builds: quality gate (≥600 milli, the
    Gopher-style char-length/stopword/uniqueness bands) then exact dedup
    on the full-content hash keeping the lowest doc_id. Pure projection +
    ONE content-hash window exchange."""
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
    return (
        kept.withColumn("__rn", F.row_number().over(dd_w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _sample_bucket() -> F.Column:
    """Deterministic 0-99 sampling bucket from the doc key (hash-stratified
    downsampling both engines compute identically)."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )


def _sample_rate() -> F.Column:
    """Per-language keep rate: en downsampled to 50%, the rest to 90%."""
    return F.when(F.col("lang") == "en", 50).otherwise(90)


@query(
    "pipeline_corpus_build_neardup",
    survey="P2,A1,SO2,W3,J1,P4",
    oracle="""
        WITH RECURSIVE q AS (
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
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM deduped
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS shingles
            FROM toks WHERE len(w) >= 3
        ),
        sig AS (
            SELECT doc_id,
                   [list_min(list_transform(shingles,
                        s -> md5(s || '#' || CAST(h AS VARCHAR))))
                    for h in range(0, 8)] AS mh
            FROM sh
        ),
        bands AS (
            SELECT doc_id, b, md5(mh[2*b+1] || mh[2*b+2]) AS band_key
            FROM sig, range(0, 4) t(b)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
            FROM bands a
            JOIN bands b2 ON a.b = b2.b AND a.band_key = b2.band_key
                          AND a.doc_id < b2.doc_id
        ),
        edges AS (
            SELECT doc_a AS s, doc_b AS d FROM pairs
            UNION ALL
            SELECT doc_b AS s, doc_a AS d FROM pairs
        ),
        reach(node, label) AS (
            SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
            UNION
            SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
        ),
        lab AS (
            SELECT node AS doc_id, MIN(label) AS cluster_id
            FROM reach GROUP BY node
        ),
        sizes AS (
            SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
            FROM lab GROUP BY cluster_id
        ),
        labeled AS (
            SELECT d.*, l.cluster_id
            FROM deduped d LEFT JOIN lab l USING (doc_id)
        ),
        surv AS (
            SELECT * FROM labeled
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY COALESCE(cluster_id, doc_id)
                ORDER BY strlen(text) DESC, doc_id) = 1
        ),
        sampled AS (
            SELECT s.*, z.n_members
            FROM surv s LEFT JOIN sizes z USING (cluster_id)
            WHERE ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))::BIGINT
                      % 100
                  < CASE WHEN s.lang = 'en' THEN 50 ELSE 90 END
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS docs_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
               CAST(COUNT(cluster_id) AS BIGINT) AS neardup_survivors,
               CAST(SUM(COALESCE(n_members, 1)) AS BIGINT)
                   AS members_represented,
               CAST(MIN(quality_milli) AS BIGINT) AS min_quality_milli
        FROM sampled
        GROUP BY lang
    """,
)
def pipeline_corpus_build_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL training-data build — the single query shape a 100 TB
    corpus run actually executes (reference north star; each rung is
    individually green elsewhere, this pins the COMPOSITION end to end):

        quality gate → exact dedup → MinHash bands → LSH candidate pairs
        → connected components → survivor resolution (keep the LONGEST
        variant per near-dup cluster) → hash-stratified downsampling →
        per-language accounting.

    The accounting is value-bearing for every stage: ``docs_kept`` /
    ``tokens_total`` pin the survivor+sample set, ``neardup_survivors``
    counts sampled docs that came out of a near-dup cluster,
    ``members_represented`` weights each survivor by its cluster size
    (singletons count 1) so a wrong component labeling or a wrong
    keep-longest choice shifts the sums, and ``min_quality_milli`` pins
    the gate.

    Scale shape: one content-hash window exchange (exact dedup), one band
    exchange + pair distinct inside the checkpointed edge build, CC's
    per-round cost is O(clustered nodes) with pointer jumping, the label
    and cluster-size tables broadcast below 5M clustered nodes (above
    that the keyed shuffle joins return), one survivor window, one
    final groupBy on lang. The quality→dedup front is MATERIALIZED ONCE
    (localCheckpoint — at real scale a persist() or snapshot write) and
    feeds both the edge build and the survivors side, so the composition
    scans the corpus parquet exactly once; the r10 form recomputed the
    front on the survivors side, i.e. two full corpus scans + two dedup
    window shuffles where one of each suffices (r10 verdict task #3).
    Executor-storage cost is the post-gate post-dedup slice — already a
    fraction of the corpus, and the checkpoint truncates the window
    lineage exactly like connected_components' edge checkpoint."""
    docs = load_table(spark, sf_dir, "documents")
    deduped = _quality_deduped(docs).localCheckpoint()
    toks = F.split("text", " ")
    shingled = (
        deduped.select("doc_id", toks.alias("w"))
        .where(F.size("w") >= 3)
        .select(
            "doc_id", shingles(F.col("w"), 3, guard_short=False).alias("sh")
        )
    )
    with_bands = minhash_band_df(shingled, "doc_id", "sh", 8, 4, 2, hash_fn="md5")
    pairs = lsh_candidate_pairs(with_bands, "doc_id", "bands")
    clusters = connected_components(
        pairs.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
    )
    n_labels = clusters.count()  # checkpointed: a cheap scalar action
    surv = resolve_near_duplicates(
        deduped, clusters, "doc_id",
        prefer=[F.length("text").desc()],
        keep_cluster_col="cluster_id",
        n_labels=n_labels,
    )
    # at most one row per cluster; same size-aware decision as the label
    # join — a forced broadcast would fail at exactly the >5M-cluster
    # scale where the label join already falls back to shuffle
    sizes = clusters.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    if n_labels <= _BROADCAST_LABELS_BELOW:
        sizes = F.broadcast(sizes)
    sampled = (
        surv.join(sizes, "cluster_id", "left")
        .where(_sample_bucket() < _sample_rate())
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        F.count("cluster_id").cast("bigint").alias("neardup_survivors"),
        F.sum(F.coalesce("n_members", F.lit(1))).cast("bigint")
            .alias("members_represented"),
        F.min("quality_milli").cast("bigint").alias("min_quality_milli"),
    )


@query(
    "pipeline_corpus_build_embdup",
    survey="P2,A1,J1,P4,J5",
    oracle="""
        WITH RECURSIVE c AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ),
        planes AS (
            SELECT p, [CAST((('0x' || substr(md5('plane' || CAST(p AS VARCHAR)
                        || '_' || CAST(d AS VARCHAR)), 1, 8))::BIGINT % 2001
                        - 1000) AS DOUBLE) / 1000.0
                       for d in range(0, 64)] AS plane
            FROM range(0, 8) t(p)
        ),
        sigs AS (
            SELECT c.vec_id,
                   CAST(SUM(CASE WHEN list_dot_product(c.emb, p.plane) > 0
                            THEN (1::BIGINT << p.p) ELSE 0 END) AS BIGINT)
                       AS bucket
            FROM c, planes p
            GROUP BY c.vec_id
        ),
        keyed AS (
            -- bounded_cell_keys at cap 16 + hamming-1 multi-probe: the
            -- production embedding near-dup operating point, replayed
            -- exactly as dedup_embedding_multiprobe's oracle does
            SELECT vec_id, label, emb, depth,
                   bucket & ((1::BIGINT << depth) - 1) AS subkey
            FROM (
                SELECT c.vec_id, c.label, c.emb, s.bucket,
                       GREATEST(0::BIGINT, LEAST(8::BIGINT,
                           CAST(CEIL(LOG2((COUNT(*) OVER (PARTITION BY
                                c.label)) / 16.0)) AS BIGINT))) AS depth
                FROM c JOIN sigs s USING (vec_id)
            )
        ),
        probed AS (
            SELECT vec_id, label, emb, subkey AS b_subkey,
                   UNNEST(list_prepend(subkey,
                       [xor(subkey, 1::BIGINT << CAST(i AS INTEGER))
                        for i in range(0, depth)])) AS probe
            FROM keyed
        ),
        pairs AS (
            -- zero-norm vectors are DEFINED as cosine 0.0 (mirrors the
            -- guarded Spark-side cosine)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM keyed a
            JOIN probed b ON a.label = b.label AND a.subkey = b.probe
                          AND a.vec_id < b.vec_id
            WHERE CASE WHEN list_dot_product(a.emb, a.emb) > 0
                        AND list_dot_product(b.emb, b.emb) > 0
                       THEN list_dot_product(a.emb, b.emb)
                            / (sqrt(list_dot_product(a.emb, a.emb))
                               * sqrt(list_dot_product(b.emb, b.emb)))
                       ELSE 0.0 END >= 0.3
        ),
        edges AS (
            SELECT vec_a AS s, vec_b AS d FROM pairs
            UNION ALL
            SELECT vec_b AS s, vec_a AS d FROM pairs
        ),
        reach(node, lbl) AS (
            SELECT s, s FROM (SELECT DISTINCT s FROM edges) t
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node
        ),
        lab AS (
            SELECT node AS doc_id, MIN(lbl) AS cluster_id
            FROM reach GROUP BY node
        ),
        sizes AS (
            SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
            FROM lab GROUP BY cluster_id
        ),
        dd AS (
            SELECT doc_id, lang, text,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ),
        labeled AS (
            SELECT dd.*, l.cluster_id
            FROM dd LEFT JOIN lab l USING (doc_id)
        ),
        surv AS (
            SELECT * FROM labeled
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY COALESCE(cluster_id, doc_id)
                ORDER BY strlen(text) DESC, doc_id) = 1
        ),
        sampled AS (
            SELECT s.*, z.n_members
            FROM surv s LEFT JOIN sizes z USING (cluster_id)
            WHERE ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))::BIGINT
                      % 100
                  < CASE WHEN s.lang = 'en' THEN 50 ELSE 90 END
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS docs_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
               CAST(COUNT(cluster_id) AS BIGINT) AS embdup_survivors,
               CAST(SUM(COALESCE(n_members, 1)) AS BIGINT)
                   AS members_represented
        FROM sampled
        GROUP BY lang
    """,
)
def pipeline_corpus_build_embdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EMBEDDING-space corpus-build pass (r10 verdict task #4) — the
    complement every real training-data build runs NEXT TO the token
    pass (``pipeline_corpus_build_neardup``): token LSH catches lexical
    near-dups; this catches semantic ones the shingles miss (same
    content re-worded, translations, templated paraphrase):

        embedding multi-probe near-dup pairs (the measured-and-promoted
        production default, ``similarity.embedding_multiprobe_pairs`` at
        the cap-16 / cos ≥ 0.3 operating point) → connected components
        → survivor resolution over DOCUMENTS (vec_id ≙ doc_id; keep the
        LONGEST variant per embedding cluster, docs without a vector
        pass through as singletons) → hash-stratified downsampling →
        per-language accounting.

    Accounting is value-bearing for every stage exactly like the token
    composition: ``embdup_survivors`` counts sampled docs that came out
    of an embedding cluster, ``members_represented`` weights survivors
    by cluster size (graph-node count — the oracle replays the same),
    so wrong labeling or wrong survivor choice shifts the sums.

    Scale shape: the pair build is one window/join exchange on the cell
    key with a bounded (1+depth)× probe explode, all inside the CC
    localCheckpoint; CC is pointer-jumping (O(log diameter) rounds);
    label and cluster-size joins broadcast below 5M clustered nodes and
    revert to keyed shuffles together above it; one survivor window,
    one final lang groupBy. The corpus parquet is scanned once."""
    emb = spread_for_compute(
        load_table(spark, sf_dir, "embeddings"),
        "vec_id",
        source_path=table_path(sf_dir, "embeddings"),
    ).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    pairs = embedding_multiprobe_pairs(emb, tau=0.3, max_cell=16)
    clusters = connected_components(
        pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    )
    n_labels = clusters.count()  # checkpointed: a cheap scalar action
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    surv = resolve_near_duplicates(
        docs, clusters, "doc_id",
        prefer=[F.length("text").desc()],
        keep_cluster_col="cluster_id",
        n_labels=n_labels,
    )
    sizes = clusters.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    if n_labels <= _BROADCAST_LABELS_BELOW:
        sizes = F.broadcast(sizes)
    sampled = (
        surv.join(sizes, "cluster_id", "left")
        .where(_sample_bucket() < _sample_rate())
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        F.count("cluster_id").cast("bigint").alias("embdup_survivors"),
        F.sum(F.coalesce("n_members", F.lit(1))).cast("bigint")
            .alias("members_represented"),
    )
