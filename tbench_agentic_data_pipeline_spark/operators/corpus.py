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
    _target_parallelism,
    load_table,
    release_local_checkpoint,
    spread_for_compute,
    spread_for_py_compute,
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
    per_dim_sums,
)
from tbench_agentic_data_pipeline_spark.operators.text import STOPWORDS
from tbench_agentic_data_pipeline_spark.registry import query

# Production operating points, shared with the measurement tools
# (tools/corpus_stage_floor.py imports these) so a retune here cannot
# silently desynchronize a published per-stage floor table. The oracle
# SQL strings replay the same values literally — those can't drift
# silently either, the parity gate fails loudly on a mismatch.
NEARDUP_SHINGLE_W = 3
NEARDUP_BANDS = (8, 4, 2)  # minhashes, bands, rows/band
NEARDUP_HASH = "md5"
EMBDUP_TAU = 0.3
EMBDUP_MAX_CELL = 16


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
    groupBy; everything else rides the scan.

    Deliberately NOT ``_spread_checkpointed`` (r14, measured): the spread
    fence exists to parallelize heavy post-window compute (neardup's
    shingle/minhash build); here everything after the window is a trivial
    sample filter + groupBy, so the fence's extra exchange +
    materialization only add cost — interleaved min-of-4 at sf0.1 warm:
    0.68 s plain vs 1.05 s fenced (SCALING.md, r14 spread-extension
    note)."""
    deduped = _quality_deduped(load_table(spark, sf_dir, "documents"))
    sampled = deduped.where(_sample_bucket() < _sample_rate())
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        F.min("quality_milli").cast("bigint").alias("min_quality_milli"),
    )


def _spread_checkpointed(df: DataFrame, key: str, source_path: str) -> DataFrame:
    """Pre-checkpoint fan-out for a narrow slice (r13, from the
    `tools/aqe_spread_check.py` measurement): at fixture scale AQE's
    minPartitionSize floor coalesces the quality-dedup window exchange
    to a handful of partitions (~6 at ~sf1), which then serializes the
    downstream shingle/minhash compute on a 32-thread session — the
    pair stage measured 4.34 s coalesced vs 1.76 s at full parallelism
    @32. The narrow/wide decision comes FIRST from the SOURCE SCAN's
    cached file-size estimate (the ``spread_for_compute`` machinery,
    ``source_path`` = the corpus parquet): a scan narrower than the
    session's parallelism means fixture-volume data whose downstream
    exchanges AQE will coalesce below parallelism — spread BEFORE the
    one localCheckpoint (r14, closes the r13 ADVICE finding at the
    root: the r13 form checkpointed first to read the materialized
    width, then re-checkpointed the spread copy, leaving the superseded
    narrow copy pinned until driver GC — the exact checkpoint-residue
    class the bench's inter-query gc.collect was added to counter).
    When the estimate says WIDE, the materialized width is still
    verified against the checkpoint's free partition-count metadata —
    the estimate is a proxy, and there is a mid-scale gap (r14
    self-review) where the scan is wide but the post-gate slice is
    small enough that AQE coalesces the window exchange below
    parallelism anyway; only in that gap does the r13-style re-spread +
    re-checkpoint fire, and the superseded copy is then released
    immediately (``release_local_checkpoint``). At 100 TB both the
    estimate and the materialized width are wide — provable no-op. The
    explicit ``repartition(n, key)`` pins its partition count (AQE does
    not coalesce user-numbered repartitions), and the checkpoint keeps
    downstream consumers (edge build AND survivors side) reading one
    in-memory copy — the single-corpus-scan contract."""
    target = _target_parallelism(df.sparkSession)
    spread = spread_for_compute(df, key, source_path=source_path)
    cp = spread.localCheckpoint()
    if spread is df and cp.rdd.getNumPartitions() < target:
        wide = cp.repartition(target, key).localCheckpoint()
        release_local_checkpoint(cp)
        return wide
    return cp


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
    deduped = _spread_checkpointed(
        _quality_deduped(docs), "doc_id", table_path(sf_dir, "documents")
    )
    toks = F.split("text", " ")
    shingled = (
        deduped.select("doc_id", toks.alias("w"))
        .where(F.size("w") >= NEARDUP_SHINGLE_W)
        .select(
            "doc_id",
            shingles(F.col("w"), NEARDUP_SHINGLE_W, guard_short=False).alias("sh"),
        )
    )
    with_bands = minhash_band_df(
        shingled, "doc_id", "sh", *NEARDUP_BANDS, hash_fn=NEARDUP_HASH
    )
    pairs = lsh_candidate_pairs(with_bands, "doc_id", "bands")
    clusters = connected_components(
        pairs.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
    )
    # exact output cardinality, recorded by the CC call itself — no
    # re-count job (r16 optimization round)
    n_labels = connected_components.last_n_nodes
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

    Scale shape: the pair build takes its per-cell split depth from a
    map-side-combined ``groupBy(cell).count()`` broadcast (codebook-
    bounded, zero corpus-side exchange — the r14 depth-broadcast
    restructure) and carries one pair-join exchange on the (cell, key)
    pair with a bounded (1+depth)× probe explode, all inside the CC
    localCheckpoint; CC is pointer-jumping (O(log diameter) rounds);
    label and cluster-size joins broadcast below 5M clustered nodes and
    revert to keyed shuffles together above it; one survivor window,
    one final lang groupBy. The corpus parquet is scanned once.

    NOT ``_spread_checkpointed`` (r14, measured): this composition has no
    ``_quality_deduped`` front — the docs side goes straight into the
    survivor window. The sf0.1 stage split is pairs 2.2 s / CC 2.5 s
    (6 rounds × the measured per-round driver constant on 1019 nodes) /
    tail 0.7 s warm, i.e. fixed scheduling constants on a 2000-vector,
    722-pair fixture, not serialized data compute. A spread fence is
    unnecessary for the pair stage since the r14 depth-broadcast
    restructure: the per-row signature work now runs on the scan's own
    partitioning (no pre-GEMM exchange left to coalesce), and the one
    remaining pair-join exchange sits AFTER the per-row work — the
    historical AQE-coalescing cost of the old window form was measured
    at 2.23 s vs 1.60 s with coalescing off (SCALING.md, r14
    spread-extension note) before the restructure removed it.

    ``spread_for_py_compute`` rather than ``spread_for_compute`` (r16):
    the pair build's signature stage is a pandas-UDF GEMM
    (``lsh_bucket_assign_arrow``), so its fan-out width pays the
    Python-boundary fixed cost per task — size-gated exactly like the
    PQ/kNN family (the catalog.py measurement table). At ~sf1 and up
    the gate passes through at full width (8 MB source > the byte
    floor x parallelism), so the r14 strong-scaling findings hold
    unchanged."""
    emb = spread_for_py_compute(
        load_table(spark, sf_dir, "embeddings"),
        "vec_id",
        source_path=table_path(sf_dir, "embeddings"),
    ).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    pairs = embedding_multiprobe_pairs(emb, tau=EMBDUP_TAU, max_cell=EMBDUP_MAX_CELL)
    clusters = connected_components(
        pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    )
    # exact output cardinality, recorded by the CC call itself — no
    # re-count job (r16 optimization round)
    n_labels = connected_components.last_n_nodes
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


def tick_reject_list(sf_dir: str, docs: DataFrame) -> DataFrame:
    """Stage 1 of the incremental tick, shared verbatim by the registered
    query and the planted-recall measurement (tools/tick_reject_recall.py)
    so the measured recall is the recall of the SHIPPED code path:
    incremental MinHash dedup of the arriving batch (doc_id odd) against
    the history's band index (doc_id even) — new×existing candidates
    only, exact token-Jaccard ≥ 0.5 verify — returning the
    localCheckpointed reject list (one ``doc_id`` column). Cost ∝
    |batch|: the history side contributes only band-key matches, never a
    full scan join."""
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        _verify_join_sides,
        jaccard_milli,
        jaccard_prefilter,
        minhash_index,
    )

    history = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    idx = minhash_index(history, hash_fn="md5").select(
        F.col("doc_id").alias("dup_of"), "b", "band_key"
    )
    nb = minhash_index(batch, hash_fn="md5").select(
        F.col("doc_id").alias("new_id"), "b", "band_key"
    )
    cand = nb.join(idx, ["b", "band_key"]).select("new_id", "dup_of").distinct()
    t = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    tn = t.select(F.col("doc_id").alias("new_id"), F.col("toks").alias("toks_n"))
    te = t.select(F.col("doc_id").alias("dup_of"), F.col("toks").alias("toks_e"))
    tn, te = _verify_join_sides(sf_dir, tn, te)
    return (
        cand.join(tn, "new_id")
        .join(te, "dup_of")
        # size-bound prune first (see dedup.jaccard_prefilter)
        .where(jaccard_prefilter(F.col("toks_n"), F.col("toks_e"), 500))
        .where(jaccard_milli(F.col("toks_n"), F.col("toks_e")) >= 500)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
        .localCheckpoint()
    )


@query(
    "pipeline_incremental_tick",
    survey="P4,J1,J5,A4",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        t AS (SELECT doc_id, list_distinct(w) AS toks FROM toks),
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
            FROM sig, range(0, 4) r(b)
        ),
        cand AS (
            SELECT DISTINCT n.doc_id AS new_id, e.doc_id AS dup_of
            FROM bands n
            JOIN bands e ON n.b = e.b AND n.band_key = e.band_key
            WHERE n.doc_id % 2 = 1 AND e.doc_id % 2 = 0
        ),
        rejected AS (
            SELECT DISTINCT c.new_id AS doc_id
            FROM cand c
            JOIN t tn ON tn.doc_id = c.new_id
            JOIN t te ON te.doc_id = c.dup_of
            WHERE (len(list_intersect(tn.toks, te.toks)) * 1000)
                      // (len(tn.toks) + len(te.toks)
                          - len(list_intersect(tn.toks, te.toks))) >= 500
        ),
        iv AS (
            SELECT vec_id, label,
                   list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                       AS iv
            FROM embeddings
        ),
        ex AS (SELECT * FROM iv WHERE vec_id % 2 = 0),
        cellsum AS (
            SELECT label, r.i, SUM(iv[CAST(r.i AS INT)]) AS s
            FROM ex, range(1, 65) r(i)
            GROUP BY label, r.i
        ),
        celln AS (SELECT label, COUNT(*) AS n FROM ex GROUP BY label),
        cent AS (
            SELECT cs.label AS cluster,
                   list(CAST(FLOOR(1000.0 * cs.s / cn.n) AS BIGINT)
                        ORDER BY cs.i) AS cv
            FROM cellsum cs JOIN celln cn USING (label)
            GROUP BY cs.label, cn.n
        ),
        scored_train AS (
            SELECT v.vec_id, ct.cluster,
                   list_sum(list_transform(range(1, 65),
                       i -> (v.iv[CAST(i AS INT)] * 1000
                               - ct.cv[CAST(i AS INT)])
                            * (v.iv[CAST(i AS INT)] * 1000
                               - ct.cv[CAST(i AS INT)]))) AS d
            FROM ex v CROSS JOIN cent ct
        ),
        best_train AS (
            SELECT * FROM scored_train
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d, cluster) = 1
        ),
        baseline AS (
            SELECT CAST(SUM(d) // COUNT(*) AS BIGINT) AS train_mean_d
            FROM best_train
        ),
        bv AS (SELECT * FROM iv WHERE vec_id % 2 = 1),
        scored_batch AS (
            SELECT v.vec_id, ct.cluster,
                   list_sum(list_transform(range(1, 65),
                       i -> (v.iv[CAST(i AS INT)] * 1000
                               - ct.cv[CAST(i AS INT)])
                            * (v.iv[CAST(i AS INT)] * 1000
                               - ct.cv[CAST(i AS INT)]))) AS d
            FROM bv v CROSS JOIN cent ct
        ),
        best_batch AS (
            SELECT vec_id, d FROM scored_batch
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d, cluster) = 1
        ),
        batch AS (
            SELECT d.doc_id, d.lang,
                   CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
                   r.doc_id IS NOT NULL AS is_dup
            FROM documents d LEFT JOIN rejected r USING (doc_id)
            WHERE d.doc_id % 2 = 1
        ),
        tick AS (
            SELECT b.lang, b.n_tok, b.is_dup,
                   CASE WHEN NOT b.is_dup THEN bb.d END AS d
            FROM batch b LEFT JOIN best_batch bb ON bb.vec_id = b.doc_id
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_batch,
               CAST(COUNT(*) FILTER (is_dup) AS BIGINT) AS n_dup,
               CAST(COUNT(*) FILTER (NOT is_dup) AS BIGINT) AS n_accepted,
               CAST(COALESCE(SUM(n_tok) FILTER (NOT is_dup), 0) AS BIGINT)
                   AS tokens_accepted,
               CAST(COUNT(d) AS BIGINT) AS n_assigned,
               CAST(SUM(d) // NULLIF(COUNT(d), 0) AS BIGINT)
                   AS assign_mean_d,
               (SELECT train_mean_d FROM baseline) AS train_mean_d
        FROM tick
        GROUP BY lang
        ORDER BY lang
    """,
)
def pipeline_incremental_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL corpus-build tick (r11 verdict task #4) — the
    streaming twin of the two batch compositions, the job a
    continuously-fed training pipeline runs on EVERY arriving batch
    (reference analog: the per-datapoint ingest loop around
    ``get_next_task``/``add_dp_to_review``, re-expressed as one
    distributed maintenance pass):

        arriving batch (doc_id odd; even = indexed history) →
        incremental MinHash dedup against the history's band index
        (``dedup.minhash_index`` shape: new×existing candidates only,
        exact token-Jaccard ≥ 0.5 verifies — cost ∝ |batch|) → accepted
        survivors' embeddings assigned to the SAVED coarse quantizer
        (``clustering.ivf_append_batch``'s argmin, integer-milli twin so
        both engines agree to the last bit; vector-less docs are
        accepted but unassigned) → per-language tick report: batch /
        rejected / accepted / token counts, assigned count, floor-mean
        assignment distance, and the persisted training baseline
        (``ivf_train_stats``) repeated in-row — the exact
        numerators/denominators of ``clustering.ivf_drift_ratio``, whose
        float ratio stays out of the hash contract (same choice as
        ``sim_ivf_incremental``).

    Production path: the band index and quantizer+stats are
    ``SnapshotTable`` commits read per tick, and the assigned batch is
    ``append_delta``-chained (O(batch) writes) — both lifecycles pinned
    elsewhere (``tests/test_operators.py`` index round-trip,
    ``tests/test_ann.py`` append/drift). This query replays them
    in-plan (md5 twin, integer-milli quantizer) so the WHOLE tick is
    one oracle-checkable DataFrame.

    Scale shape: the dup-reject list is built once behind a
    localCheckpoint (band join + verify — at production the tick
    persists it anyway) and rejoins the batch size-aware (broadcast
    below 5M ids, keyed shuffle above); the quantizer is a k-row
    codebook collected to the driver (bounded scalar, the IVF
    broadcast-centroid pattern) so batch assignment is a PER-ROW argmin
    with zero crossJoin and zero extra exchange; the final plan is one
    batch scan + one embeddings scan, one keyed doc↔vec join, one lang
    groupBy — cost ∝ |batch|, never |corpus|."""
    import math

    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        source_path=table_path(sf_dir, "documents"),
    )
    batch = docs.where(F.col("doc_id") % 2 == 1)
    # Overlap the two INDEPENDENT eager fronts (optimization guide §2.6:
    # actions are only sequential because driver code calls them
    # sequentially): the dup-reject build (documents side — band index,
    # candidate join, Jaccard verify, one localCheckpoint) runs in a
    # driver thread while the quantizer codebook + training baseline
    # (embeddings side, stages 2-3 below) collect in this thread. The
    # two pipelines share no input and no intermediate state; their jobs
    # back-fill each other's stage tails on any cluster, and the tick's
    # wall-clock drops from sum to max of the two fronts (measured at
    # sf0.1: ~0.6 s off a ~3.0 s tick). Join before first use of the
    # result; exceptions propagate through Future.result().
    from concurrent.futures import ThreadPoolExecutor

    def _reject_front():
        r = tick_reject_list(sf_dir, docs)
        return r, r.count()  # checkpointed: a cheap scalar action

    pool = ThreadPoolExecutor(max_workers=1)
    try:
        reject_fut = pool.submit(_reject_front)

        # --- stage 2: the saved quantizer, replayed integer-milli (the
        # k-row codebook a production tick loads from its SnapshotTable),
        # collected while the reject front runs in the pool thread ------
        dim = 64
        iv_expr = F.transform(
            as_double(F.col("embedding")), lambda x: F.floor(x * 1000)
        )
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", iv_expr.alias("iv")
        )
        cellstats = (
            emb.where(F.col("vec_id") % 2 == 0)
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"), per_dim_sums(dim).alias("s"))
            .collect()
        )
        # floor(1000.0*s/n): multiply exact (< 2^53), then ONE double divide —
        # the same IEEE op order both engines use, so the floors agree
        codebook = sorted(
            (
                int(r["label"]),
                [math.floor(s * 1000.0 / r["n"]) for s in r["s"]],
            )
            for r in cellstats
        )

        def argmin_d(iv_col: str) -> F.Column:
            # One parsed SQL expression for the whole k-cell argmin instead
            # of k × (struct + fold + 64 literal Columns) — the literal-array
            # construction alone was ~1300 py4j round-trips per invocation
            # (r15 optimization round). The codebook is emitted as ONE
            # all-literal array-of-structs that ConstantFolding collapses
            # to a single Literal at optimization time, and the per-cell
            # distance fold runs as a `transform` LOOP over it — the
            # per-row generated code is a small loop instead of ~k×64
            # unrolled multiply-adds (whose compile cost dominated the
            # fixture-scale run and made the query hypersensitive to a
            # shard-mate's JIT/code-cache pressure). Semantics identical:
            # struct comparison is lexicographic → min by (d, cluster),
            # the oracle's ROW_NUMBER() ORDER BY d, cluster.
            cells = ",".join(
                "struct(array({arr}) AS cv, {c}L AS c)".format(
                    arr=",".join(f"{v}L" for v in cv), c=c
                )
                for c, cv in codebook
            )
            return F.expr(
                "array_min(transform("
                f"array({cells}), "
                f"cb -> struct(aggregate(zip_with({iv_col}, cb.cv, "
                "(a, b) -> (a * 1000 - b) * (a * 1000 - b)), "
                "0L, (acc, v) -> acc + v) AS d, cb.c AS c))).d"
            )

        # --- stage 3: the persisted training baseline (ivf_train_stats' global
        # floor-mean — at production read off the index, replayed here) ------
        tr = (
            emb.where(F.col("vec_id") % 2 == 0)
            .agg(
                F.sum(argmin_d("iv")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        train_mean_d = int(tr["s"]) // int(tr["n"]) if tr["n"] else None
        rejected, n_rejected = reject_fut.result()
    finally:
        pool.shutdown(wait=True)
    rej = rejected.select("doc_id", F.lit(True).alias("is_dup"))
    if n_rejected <= _BROADCAST_LABELS_BELOW:
        rej = F.broadcast(rej)

    # --- stage 4: the tick report — ONE pass over the batch ------------
    bv = emb.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("doc_id"), "iv"
    )
    rows = (
        batch.select(
            "doc_id", "lang",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        )
        .join(rej, "doc_id", "left")
        .withColumn("is_dup", F.coalesce("is_dup", F.lit(False)))
        .join(bv, "doc_id", "left")
        .withColumn(
            "d", F.when(~F.col("is_dup"), argmin_d("iv"))
        )
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_batch"),
            F.count(F.when(F.col("is_dup"), 1)).cast("bigint").alias("n_dup"),
            F.count(F.when(~F.col("is_dup"), 1)).cast("bigint")
                .alias("n_accepted"),
            F.coalesce(
                F.sum(F.when(~F.col("is_dup"), F.col("n_tok"))), F.lit(0)
            ).cast("bigint").alias("tokens_accepted"),
            F.count("d").cast("bigint").alias("n_assigned"),
            F.expr("CAST(sum(d) div NULLIF(count(d), 0) AS BIGINT)")
                .alias("assign_mean_d"),
        )
        .withColumn("train_mean_d", F.lit(train_mean_d).cast("bigint"))
        .orderBy("lang")
    )
