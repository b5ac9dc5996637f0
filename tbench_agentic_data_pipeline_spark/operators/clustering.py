"""K-means in pure DataFrame operations — the coarse quantizer for IVF.

No MLlib dependency and no driver-side math on the corpus: one Lloyd's
iteration is (a) assign — broadcast the k centroids, pick argmin L2 per
row (a per-row projection), and (b) update — per-dimension means via
posexplode + groupBy(cluster, dim) + collect-to-array. The shuffle per
iteration carries k × dim partial sums, invariant to corpus size; the
corpus itself is scanned once per iteration and never collected.

Determinism: initial centroids are the k rows with the smallest
``xxhash64(key)`` — seedless, reproducible on any cluster, no RNG to ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _l2_sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    df: DataFrame, key_col: str, vec_col: str, centroids: DataFrame
) -> DataFrame:
    """Assign each row to its nearest centroid (argmin squared-L2 over the
    broadcast centroid table). Adds ``cluster`` and ``dist_sq``.

    Argmin is a keyed min-struct aggregate, NOT a window over all columns:
    the window form silently collapses duplicate rows and shuffles+sorts
    all n×k scored rows; the aggregate partial-combines map-side so the
    shuffle carries one (key, best) row per input row, then joins the
    (narrow) result back for the remaining columns."""
    scored = df.select(key_col, vec_col).crossJoin(
        F.broadcast(centroids.select(
            F.col("cluster").alias("__c"), F.col("centroid").alias("__cv")
        ))
    ).select(
        key_col, F.struct(_l2_sq(F.col(vec_col), F.col("__cv")).alias("d"),
                          F.col("__c").alias("c")).alias("__dc")
    )
    best = scored.groupBy(key_col).agg(F.min("__dc").alias("__best"))
    return df.join(best, key_col).select(
        *df.columns,
        F.col("__best.c").alias("cluster"),
        F.col("__best.d").alias("dist_sq"),
    )


def _update_centroids(assigned: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-cluster elementwise mean: posexplode dims → groupBy(cluster,
    dim) avg → re-assemble ordered arrays."""
    exploded = assigned.select(
        "cluster", F.posexplode(F.col(vec_col)).alias("d", "x")
    )
    means = exploded.groupBy("cluster", "d").agg(F.avg("x").alias("m"))
    return (
        means.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
        .select(
            "cluster",
            F.transform(F.col("dm"), lambda s: s["m"]).alias("centroid"),
        )
    )


def kmeans_fit(
    df: DataFrame, key_col: str, vec_col: str, k: int, dim: int, iters: int = 3
) -> DataFrame:
    """Fit k centroids with ``iters`` Lloyd's rounds. Initial centroids =
    the k rows with smallest xxhash64(key) (deterministic). Returns
    (cluster, centroid) — the IVF coarse quantizer table (tiny: broadcast
    it everywhere)."""
    seeds = (
        df.select(key_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(key_col)))
        .orderBy("__h")
        .limit(k)
    )
    centroids = seeds.select(
        (F.row_number().over(Window.orderBy("__h")) - 1).alias("cluster"),
        F.col(vec_col).alias("centroid"),
    )
    for _ in range(iters):
        assigned = assign_clusters(
            df.select(key_col, vec_col), key_col, vec_col, centroids
        )
        updated = _update_centroids(assigned, vec_col, dim)
        # A cluster that lost every member vanishes from the groupBy —
        # keep its previous centroid so the quantizer always has k rows
        # with stable ids 0..k-1.
        centroids = (
            centroids.select("cluster", F.col("centroid").alias("__prev"))
            .join(updated, "cluster", "left")
            .select(
                "cluster",
                F.coalesce(F.col("centroid"), F.col("__prev")).alias("centroid"),
            )
        )
    return centroids


def inertia(assigned: DataFrame) -> float:
    """Total within-cluster squared distance — the convergence metric
    (one scalar to the driver, nothing else)."""
    return assigned.agg(F.sum("dist_sq")).collect()[0][0]


def save_ivf_index(
    centroids: DataFrame, root: str, operation: str = "ivf_index"
) -> int:
    """Persist the coarse quantizer as a versioned snapshot table — the
    index LIFECYCLE half of IVF: fit once over the corpus, commit, and
    every subsequent search/assign job broadcasts the saved centroids
    instead of re-running Lloyd's. Versioning comes from
    :class:`SnapshotTable` (atomic manifest flip, previous index = the
    rollback), so an index refresh is a commit and readers pin a version
    for reproducible retrieval. Returns the committed version.

    If the centroid frame carries :func:`ivf_train_stats` columns
    (``n_train``, ``train_mean_dist_sq``) they are persisted alongside —
    the drift baseline :func:`ivf_append_batch` judges new batches
    against."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    cols = ["cluster", "centroid"] + [
        c for c in ("n_train", "train_mean_dist_sq") if c in centroids.columns
    ]
    table = SnapshotTable(centroids.sparkSession, root)
    return table.commit(centroids.select(*cols), operation=operation)


def load_ivf_index(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Load a persisted quantizer (current or pinned version), ready for
    :func:`assign_clusters` / the IVF probe path. Centroid tables are
    k rows — always broadcast-sized by construction."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    return SnapshotTable(spark, root).read(version)


# Drift threshold: batch inertia per row above this multiple of the
# training baseline signals the quantizer no longer fits the arriving
# distribution. 1.5 = the batch's average cell is half again as loose as
# at training time — probes start missing true neighbors well before the
# assignments become nonsense, so retrain early. Callers tune per corpus.
IVF_DRIFT_RETRAIN = 1.5


def ivf_train_stats(assigned: DataFrame) -> DataFrame:
    """Per-cell training baseline, persisted NEXT TO the centroids
    (:func:`save_ivf_index` keeps these columns): member count and mean
    squared distance at training time — the denominator of the drift
    ratio every incremental batch is judged against. One
    map-side-combined aggregation over the assigned corpus; k rows out."""
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train"),
        F.avg("dist_sq").alias("train_mean_dist_sq"),
    )


def ivf_drift_ratio(assigned_batch: DataFrame, index: DataFrame) -> float:
    """Batch inertia per row over training inertia per row (the training
    side weighted by cell mass from the persisted stats). ~1.0 = the
    batch comes from the training distribution; well above 1 = the
    distribution moved and the quantizer is stale — retrain when it
    exceeds :data:`IVF_DRIFT_RETRAIN`. Two scalar driver actions (one
    over the batch aggregate, one over the k-row index), nothing else.

    Degenerate inputs resolve, not crash (a scheduled ingestion tick
    must survive them): an EMPTY batch carries no drift evidence →
    1.0; a zero/absent training baseline (k ≥ n_train puts every
    training point on its centroid) makes any nonzero batch inertia
    infinite drift → retrain."""
    if "train_mean_dist_sq" not in index.columns:
        raise ValueError(
            "index has no training stats — save it with ivf_train_stats "
            "columns attached (see save_ivf_index)"
        )
    batch_mean = assigned_batch.agg(F.avg("dist_sq")).collect()[0][0]
    if batch_mean is None:  # empty batch: no evidence either way
        return 1.0
    train_mean = (
        index.agg(
            F.sum(F.col("n_train") * F.col("train_mean_dist_sq"))
            / F.sum("n_train")
        ).collect()[0][0]
    )
    if not train_mean:  # zero or NULL baseline
        return 1.0 if batch_mean == 0.0 else float("inf")
    return float(batch_mean) / float(train_mean)


def ivf_append_batch(
    index_root: str,
    assignments_root: str,
    batch: DataFrame,
    key_col: str,
    vec_col: str,
) -> tuple[int, float]:
    """O(batch) IVF index maintenance — the embedding twin of the MinHash
    index's incremental path (``dedup.minhash_index`` +
    ``dedup_incremental``): assign ONLY the arriving batch to the SAVED
    quantizer (broadcast centroids; the historical corpus is never
    re-read or re-trained), APPEND the assigned rows to the
    cell-assignment snapshot — searches read that table and see the new
    rows immediately — and return ``(committed version, drift ratio)``.
    The caller retrains (a fresh :func:`kmeans_fit` +
    :func:`save_ivf_index` commit; readers keep the pinned old version
    until the flip) when the ratio exceeds :data:`IVF_DRIFT_RETRAIN`.
    Cost: one broadcast-assign pass over the batch plus one delta-chained
    parquet write of ONLY the new rows (``append_delta``, not the COW
    ``append`` that rewrites the whole table) — never a function of
    corpus size. The assigned batch is persisted so the write and the
    drift aggregate consume ONE assignment pass, and the drift ratio is
    computed BEFORE the commit: a failure never leaves a half-done
    maintenance tick already flipped into the manifest."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    spark = batch.sparkSession
    index = load_ivf_index(spark, index_root)
    assigned = assign_clusters(batch, key_col, vec_col, index).select(
        key_col, vec_col, "cluster", "dist_sq"
    ).persist()
    try:
        drift = ivf_drift_ratio(assigned, index)
        version = SnapshotTable(spark, assignments_root).append_delta(assigned)
    finally:
        assigned.unpersist()
    return version, drift


def ivf_retrain(
    spark: SparkSession,
    index_root: str,
    assignments_root: str,
    key_col: str,
    vec_col: str,
    k: int,
    dim: int,
    iters: int = 3,
) -> tuple[int, int]:
    """Close the drift loop: when :func:`ivf_drift_ratio` exceeds
    :data:`IVF_DRIFT_RETRAIN`, refit the coarse quantizer over the
    MAINTAINED corpus — history plus every accepted batch, read from the
    assignment snapshot — and commit the result as a NEW index version
    with fresh :func:`ivf_train_stats` baselines, plus the corpus
    re-assigned under the new quantizer as a NEW assignments version.
    Returns ``(index_version, assignments_version)``.

    Swap semantics (r13 review: two tables cannot flip in one atomic
    step, so the ORDER and the PAIRING carry the consistency): the
    re-assigned corpus commits FIRST, then the index commits carrying
    the matching assignments version in its history record
    (``operation="ivf_retrain asg_v=<n>"``) — the index flip is the
    single publish point. Readers that pair the two tables through
    :func:`load_ivf_state` are crash-consistent: a retrain that died
    between the commits (assignments flipped, index not) serves the OLD
    index with the newest assignments version still belonging to the
    old quantizer's chain — never new-labels-under-old-centroids or the
    reverse. Old versions stay readable until a ``vacuum`` past
    retention (pinned-reader rollback). The reference system has the
    same refresh-your-own-derived-state sweep
    (scripts/validate_all_prod_dps.py:94-133 re-validates and re-stamps
    every production datapoint); here the derived state is the ANN index.

    Cost shape: retraining is inherently a full pass — ``iters`` Lloyd's
    rounds (each one corpus scan + a k×dim-invariant shuffle) plus one
    re-assignment scan and one copy-on-write commit of the re-assigned
    corpus. Cluster ids change wholesale under a refit, so a delta
    append CANNOT express the swap; that is exactly why the drift ratio
    gates it — O(batch) ``ivf_append_batch`` ticks are the steady state
    and this full pass runs only when the distribution has moved."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    assignments = SnapshotTable(spark, assignments_root)
    corpus = assignments.read().select(key_col, vec_col)
    cents = kmeans_fit(corpus, key_col, vec_col, k=k, dim=dim, iters=iters)
    assigned = assign_clusters(corpus, key_col, vec_col, cents).persist()
    try:
        # left join: kmeans_fit guarantees k centroid rows, but a cell
        # that ended empty has no stats row — keep it with n_train=0 so
        # the index stays k rows and the drift denominator ignores it
        new_index = (
            cents.join(ivf_train_stats(assigned), "cluster", "left")
            .select(
                "cluster",
                "centroid",
                F.coalesce(F.col("n_train"), F.lit(0)).cast("bigint").alias(
                    "n_train"
                ),
                "train_mean_dist_sq",
            )
        )
        # assignments FIRST; the index commit records the pairing and is
        # the single publish point (see docstring / load_ivf_state)
        asg_version = assignments.commit(
            assigned.select(key_col, vec_col, "cluster", "dist_sq"),
            operation="ivf_retrain",
        )
        index_version = save_ivf_index(
            new_index, index_root, operation=f"ivf_retrain asg_v={asg_version}"
        )
    finally:
        assigned.unpersist()
    return index_version, asg_version


def load_ivf_state(
    spark: SparkSession, index_root: str, assignments_root: str
) -> tuple[DataFrame, DataFrame]:
    """The crash-consistent (index, assignments) PAIR for search/probe
    jobs — use this instead of pairing ``load_ivf_index`` with a bare
    ``read()`` when retrains run (r13 review): cluster labels only mean
    anything under the quantizer that assigned them, and the two tables
    flip in two commits.

    Resolution: the CURRENT index's history record names its paired
    retrain-assignments version (``asg_v``; absent for a never-retrained
    index → pair base None). The assignments version served is the
    newest one whose CHAIN BASE — the latest ``ivf_retrain`` commit at
    or before it — equals that pair base. A retrain that committed its
    assignments but crashed before the index flip therefore stays
    invisible (its chain belongs to an unpublished quantizer), while
    every ``append_delta`` tick on the published chain is included."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    idx = SnapshotTable(spark, index_root)
    asg = SnapshotTable(spark, assignments_root)
    cur = idx.current_version()
    paired = None
    for h in idx.history():
        if h["version"] == cur and h["operation"].startswith(
            "ivf_retrain asg_v="
        ):
            paired = int(h["operation"].rsplit("=", 1)[1])
    retrains = sorted(
        h["version"] for h in asg.history() if h["operation"] == "ivf_retrain"
    )

    def chain_base(v: int) -> int | None:
        return max((r for r in retrains if r <= v), default=None)

    serveable = [v for v in asg.versions() if chain_base(v) == paired]
    if not serveable:  # pairing record lost (manual surgery): fail loud
        raise ValueError(
            f"no assignments version pairs with index v{cur} "
            f"(paired asg_v={paired}, retrain commits={retrains})"
        )
    return idx.read(cur), asg.read(max(serveable))


def save_pq_codebook(codebook: DataFrame, root: str) -> int:
    """Persist trained PQ codebooks (``similarity.pq_train``'s
    (sub, code, centroid) table — m·k rows) with the same versioned
    snapshot lifecycle as :func:`save_ivf_index`: a codebook refresh is
    a commit, encode/search jobs pin a version, and the previous book
    is the rollback. Codes written under book v_n stay decodable by
    re-reading v_n even after a refresh — the reason versioning is not
    optional for PQ (re-encoding 100 TB is the cost of losing it)."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    table = SnapshotTable(codebook.sparkSession, root)
    return table.commit(
        codebook.select("sub", "code", "centroid"), operation="pq_codebook"
    )


def load_pq_codebook(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Load a persisted PQ codebook table (current or pinned version),
    ready for ``similarity.codebook_from_df``."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    return SnapshotTable(spark, root).read(version)
