"""ANN quality tests: multi-probe LSH recall is monotone in probe radius
(and exhaustive probing recovers brute force exactly); DataFrame k-means
converges and yields a working IVF quantizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.operators.clustering import (
    assign_clusters,
    inertia,
    kmeans_fit,
)
from tbench_agentic_data_pipeline_spark.operators.similarity import (
    as_double,
    brute_force_topk,
    lsh_bucket_assign,
    lsh_search_topk,
    recall_at_k,
)
from tests.conftest import SF_SMOKE

K, PLANES, DIM = 10, 8, 64


def _corpus(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )


def test_multiprobe_recall_monotone_and_exhaustive(spark):
    emb = _corpus(spark)
    with_bucket = emb.withColumn(
        "bucket", lsh_bucket_assign(F.col("emb"), PLANES, DIM)
    ).cache()
    queries = with_bucket.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"), "bucket"
    )
    exact = brute_force_topk(
        emb, queries.select("q_id", "q_emb"), K
    ).cache()

    recalls = {}
    for h in (0, 2, PLANES):
        approx = lsh_search_topk(with_bucket, queries, K, PLANES, h)
        recalls[h] = recall_at_k(approx, exact, K)
    assert recalls[0] <= recalls[2] <= recalls[PLANES], recalls
    # probing every bucket IS brute force:
    assert recalls[PLANES] == 1.0, recalls


def test_kmeans_converges_and_partitions(spark):
    emb = _corpus(spark)
    seeds = kmeans_fit(emb, "vec_id", "emb", k=8, dim=DIM, iters=0)
    assigned0 = assign_clusters(emb, "vec_id", "emb", seeds)
    centroids = kmeans_fit(emb, "vec_id", "emb", k=8, dim=DIM, iters=3)
    assigned3 = assign_clusters(emb, "vec_id", "emb", centroids)
    # Lloyd's never increases inertia; 3 rounds must improve on raw seeds.
    assert inertia(assigned3) < inertia(assigned0)
    # every vector lands in exactly one of the 8 clusters
    assert assigned3.count() == emb.count()
    n_clusters = assigned3.select("cluster").distinct().count()
    assert 1 < n_clusters <= 8


def test_ivf_with_learned_centroids(spark):
    emb = _corpus(spark)
    centroids = kmeans_fit(emb, "vec_id", "emb", k=8, dim=DIM, iters=2)
    assigned = assign_clusters(emb, "vec_id", "emb", centroids).select(
        "vec_id", "emb", "cluster"
    )
    queries = assigned.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("cluster").alias("q_cluster"),
    )
    # 1-probe IVF: search only the query's own partition.
    from tbench_agentic_data_pipeline_spark.operators.similarity import cosine

    scored = assigned.join(
        F.broadcast(queries), assigned.cluster == queries.q_cluster
    ).select("q_id", "vec_id", cosine(F.col("emb"), F.col("q_emb")).alias("cos"))
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    top = scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 5)
    rows = top.collect()
    # each query finds itself at rank 1 (it lives in its own partition)
    self_hits = {r["q_id"] for r in rows if r["rank"] == 1 and r["vec_id"] == r["q_id"]}
    assert self_hits == {0, 1, 2}


def test_quantized_topk_recall_vs_float_baseline(spark):
    """int8 quantization must preserve ranking quality: recall@10 of the
    quantized top-k against the exact float top-k stays high, and the
    quantized scores track the float scores closely on the overlap."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        cosine_quantized,
        quantize_int8,
    )
    from pyspark.sql import Window

    corpus = _corpus(spark)
    queries = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    exact = brute_force_topk(corpus, queries, K)

    qcorpus = corpus.select("vec_id", quantize_int8(F.col("emb")).alias("qv"))
    qqueries = qcorpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("q_qv")
    )
    scored = qcorpus.crossJoin(F.broadcast(qqueries)).select(
        "q_id", "vec_id",
        cosine_quantized(F.col("qv"), F.col("q_qv")).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("vec_id"))
    approx = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= K
    )
    assert recall_at_k(approx, exact, K) >= 0.9

    # scores on the joined overlap agree to ~quantization error
    joined = (
        approx.select("q_id", "vec_id", F.col("cos").alias("cos_q"))
        .join(exact.select("q_id", "vec_id", "cos"), ["q_id", "vec_id"])
        .select(F.max(F.abs(F.col("cos_q") - F.col("cos"))).alias("err"))
        .first()
    )
    assert joined["err"] < 0.02


def test_quantize_int8_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "id long, v array<double>",
    )
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        quantize_int8,
    )
    rows = {r["id"]: r["q"] for r in
            df.select("id", quantize_int8(F.col("v")).alias("q")).collect()}
    assert rows[1] == [64, -127, 32]
    assert rows[2] == [0, 0, 0]
    assert all(abs(x) <= 127 for x in rows[1])


def test_cosine_zero_vector_is_defined_zero(spark):
    # A zero-norm vector must yield cosine 0.0 (not NULL, not a
    # DIVIDE_BY_ZERO raise under Spark 4's ANSI default) in both the
    # float and the int8-quantized scorers.
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        cosine,
        cosine_quantized,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [0.0, 0.0]), (2, [1.0, 2.0], [2.0, 4.0])],
        "id long, a array<double>, b array<double>",
    )
    out = {
        r["id"]: r["c"]
        for r in df.select(
            "id", cosine(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    assert out[1] == 0.0
    assert abs(out[2] - 1.0) < 1e-12

    qdf = spark.createDataFrame(
        [(1, [1, 2], [0, 0]), (2, [1, 2], [2, 4])],
        "id long, a array<bigint>, b array<bigint>",
    )
    qout = {
        r["id"]: r["c"]
        for r in qdf.select(
            "id", cosine_quantized(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    assert qout[1] == 0.0
    assert abs(qout[2] - 1.0) < 1e-12


def test_arrow_topk_matches_fold_baseline(spark):
    # The numpy/Arrow production scorer must return the same top-5 sets
    # as the fold-based oracle path, with cosines equal to float-assoc
    # tolerance (numpy reorders the accumulation).
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        brute_force_topk,
        brute_force_topk_arrow,
        recall_at_k,
    )

    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    exact = brute_force_topk(emb, queries, 5)
    fast = brute_force_topk_arrow(emb, queries, 5)
    assert recall_at_k(fast, exact, 5) == 1.0
    # empty query set: both paths return empty instead of crashing
    empty_q = queries.where(F.lit(False))
    assert brute_force_topk_arrow(emb, empty_q, 5).count() == 0
    joined = (
        fast.select("q_id", "vec_id", F.col("cos").alias("cos_fast"))
        .join(exact.select("q_id", "vec_id", "cos"), ["q_id", "vec_id"])
        .select(F.max(F.abs(F.col("cos_fast") - F.col("cos"))).alias("d"))
        .first()
    )
    assert joined["d"] < 1e-9


def test_arrow_wrapper_matches_registered_query(spark):
    # sim_topk_cosine_arrow is the benched production twin of the
    # registered sim_topk_cosine; same (q_id, vec_id, rank) result set.
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        sim_topk_cosine,
        sim_topk_cosine_arrow,
    )

    from tests.conftest import SF_SMOKE

    keyed = lambda df: {
        (r.q_id, r.vec_id, r.rank) for r in df.collect()
    }
    assert keyed(sim_topk_cosine_arrow(spark, SF_SMOKE)) == keyed(
        sim_topk_cosine(spark, SF_SMOKE)
    )


def test_arrow_topk_refuses_oversized_query_side(spark):
    """The driver-collect contract is enforced, not assumed (VERDICT r3
    #5): a query side beyond _MAX_BRUTE_FORCE_QUERIES raises with a
    pointer to the distributed knn_join path instead of OOMing the
    driver."""
    import pytest

    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        brute_force_topk_arrow,
    )

    emb = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("emb"),
    )
    big_q = spark.range(50).select(
        F.col("id").alias("q_id"),
        F.array(F.rand(seed=3), F.rand(seed=4)).alias("q_emb"),
    )
    with pytest.raises(ValueError, match="knn_join"):
        brute_force_topk_arrow(emb, big_q, 3, max_queries=49)
    # at the default ceiling the same frame is fine
    assert brute_force_topk_arrow(emb, big_q, 3).count() > 0


def test_knn_join_arrow_matches_fold_twin(spark):
    """The GEMM kNN join must agree with the oracle-gated fold query:
    same (vec_id, nbr_id) neighbor sets (modulo rank-boundary ties whose
    cosines agree to 1e-9) and cosines within float-reassociation
    tolerance."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        sim_knn_join,
        sim_knn_join_arrow,
    )

    sf = "/root/testdata/sf0.001"
    fold = {
        (r.vec_id, r.nbr_id): r.cos for r in sim_knn_join(spark, sf).collect()
    }
    arrow = {
        (r.vec_id, r.nbr_id): r.cos
        for r in sim_knn_join_arrow(spark, sf).collect()
    }
    assert len(fold) == len(arrow) > 0
    common = set(fold) & set(arrow)
    assert max(abs(fold[p] - arrow[p]) for p in common) < 1e-9
    # pairs picked by only one path must be rank-boundary ties: the two
    # paths' 3rd-place cosines for that vector agree to 1e-9
    only = (set(fold) ^ set(arrow))
    for vec, nbr in only:
        f3 = min(c for (v, _), c in fold.items() if v == vec)
        a3 = min(c for (v, _), c in arrow.items() if v == vec)
        assert abs(f3 - a3) < 1e-9, (vec, nbr, f3, a3)
    assert len(only) <= len(fold) * 0.02, len(only)


def test_knn_join_arrow_refuses_oversized_bucket(spark):
    import pytest

    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        knn_join_arrow,
    )

    emb = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.lit(0).alias("label"),
        F.array(F.rand(seed=7), F.rand(seed=8)).alias("emb"),
    )
    with pytest.raises(Exception, match="Re-bucket"):
        knn_join_arrow(emb, 3, max_bucket_rows=10).count()
    assert knn_join_arrow(emb, 3, max_bucket_rows=1000).count() == 30 * 3


def test_knn_join_blocked_matches_single_task_path(spark):
    """Block-pair decomposition must be RESULT-IDENTICAL to the one-task
    GEMM: same neighbors, same cosines (both are numpy over float64 —
    the same dot products, just partitioned), with tiny blocks forcing
    many block pairs."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        knn_join_arrow,
        knn_join_blocked,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
    )
    one = {
        (r.vec_id, r.nbr_id): (r.rk, r.cos)
        for r in knn_join_arrow(emb, 3).collect()
    }
    blocked = {
        (r.vec_id, r.nbr_id): (r.rk, r.cos)
        for r in knn_join_blocked(emb, 3, block_rows=7).collect()
    }
    assert set(one) == set(blocked)
    assert all(
        one[p][0] == blocked[p][0] and abs(one[p][1] - blocked[p][1]) < 1e-12
        for p in one
    )


def test_knn_join_blocked_memory_is_block_bounded(spark):
    """The group fed to each pandas task holds at most 2·block_rows rows
    (one query block + one candidate block) — the property that removes
    the straggler/OOM, asserted by running with a block size far below
    the bucket size and checking completeness: every vector still gets
    min(k, bucket-1) neighbors."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        knn_join_blocked,
    )

    emb = spark.range(100).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 2).alias("label"),
        F.array(
            F.cos(F.col("id").cast("double")),
            F.sin(F.col("id").cast("double")),
        ).alias("emb"),
    )
    out = knn_join_blocked(emb, 5, block_rows=8)
    counts = out.groupBy("vec_id").count().collect()
    assert len(counts) == 100
    assert all(r["count"] == 5 for r in counts)


def test_ivf_index_persistence_roundtrip(spark, tmp_path):
    """Fit → save → load → assign must equal assigning with the in-memory
    quantizer, and a refreshed index keeps the old version readable
    (pinned retrieval)."""
    from tbench_agentic_data_pipeline_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
        load_ivf_index,
        save_ivf_index,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
    )
    cents = kmeans_fit(emb, "vec_id", "emb", k=4, dim=64, iters=2)
    root = str(tmp_path / "ivf_index")
    v1 = save_ivf_index(cents, root)
    assert v1 == 1

    direct = {
        r.vec_id: r.cluster
        for r in assign_clusters(emb, "vec_id", "emb", cents).collect()
    }
    loaded = load_ivf_index(spark, root)
    via_index = {
        r.vec_id: r.cluster
        for r in assign_clusters(emb, "vec_id", "emb", loaded).collect()
    }
    assert direct == via_index

    # refresh with a finer quantizer: new current, old version pinned
    v2 = save_ivf_index(
        kmeans_fit(emb, "vec_id", "emb", k=8, dim=64, iters=1), root
    )
    assert v2 == 2
    assert load_ivf_index(spark, root).count() == 8
    assert load_ivf_index(spark, root, version=1).count() == 4


def test_ivf_incremental_maintenance_lifecycle(spark, tmp_path):
    """r10 verdict task #7: the IVF index gets the MinHash index's
    incremental path. Save (centroids + training stats) → append an
    arriving batch with ivf_append_batch (assign-to-saved-centroids +
    delta-chained write of ONLY the batch) → a search over the
    assignment table must include the new rows; an in-distribution
    batch reads drift ≈ 1 (no retrain)."""
    from tbench_agentic_data_pipeline_spark.operators.clustering import (
        IVF_DRIFT_RETRAIN,
        assign_clusters,
        ivf_append_batch,
        ivf_train_stats,
        kmeans_fit,
        save_ivf_index,
    )
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        ivf_search_topk,
    )
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    train = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "emb"
    )

    cents = kmeans_fit(train, "vec_id", "emb", k=4, dim=64, iters=2)
    assigned_train = assign_clusters(train, "vec_id", "emb", cents)
    index_root = str(tmp_path / "ivf_index")
    asg_root = str(tmp_path / "ivf_assignments")
    save_ivf_index(
        cents.join(ivf_train_stats(assigned_train), "cluster"), index_root
    )
    SnapshotTable(spark, asg_root).commit(
        assigned_train.select("vec_id", "emb", "cluster", "dist_sq"),
        operation="ivf_assignments",
    )

    version, drift = ivf_append_batch(
        index_root, asg_root, batch, "vec_id", "emb"
    )
    assert version == 2
    # the delta version holds ONLY the batch (O(batch) write)…
    snap = SnapshotTable(spark, asg_root)
    assert snap.read(version).count() == train.count() + batch.count()
    assert (
        spark.read.parquet(str(tmp_path / "ivf_assignments" / "v=2")).count()
        == batch.count()
    )
    # …the batch is in-distribution, so no retrain signal
    assert 0.5 < drift < IVF_DRIFT_RETRAIN, drift

    # search over the maintained table sees the new rows: query AT a new
    # vector's position must return that exact row as its top hit
    from tbench_agentic_data_pipeline_spark.operators.clustering import (
        load_ivf_index,
    )

    corpus = snap.read()
    probe_vec = batch.limit(1).collect()[0]
    queries = spark.createDataFrame(
        [(0, probe_vec["emb"])], "q_id long, q_emb array<double>"
    )
    top = ivf_search_topk(
        corpus, queries, load_ivf_index(spark, index_root), k=1, nprobe=2
    ).collect()
    assert top and top[0]["vec_id"] == probe_vec["vec_id"]


def test_ivf_drift_triggers_retrain_and_swap(spark, tmp_path):
    """r12 verdict task #4: the drift signal now EXECUTES a retrain —
    full refit over history + accepted batches → new index version +
    re-assigned corpus version (atomic manifest flips; the old versions
    stay pinned-readable) → the swapped index serves ivf_search_topk and
    the batch that triggered the retrain reads in-distribution again."""
    from tbench_agentic_data_pipeline_spark.operators.clustering import (
        IVF_DRIFT_RETRAIN,
        assign_clusters,
        ivf_append_batch,
        ivf_drift_ratio,
        ivf_retrain,
        ivf_train_stats,
        kmeans_fit,
        load_ivf_index,
        save_ivf_index,
    )
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        ivf_search_topk,
    )
    from tbench_agentic_data_pipeline_spark.sources.snapshot import (
        SnapshotTable,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    train = emb.where(F.col("vec_id") % 5 != 0)
    # the arriving batch comes from a SHIFTED distribution — the case the
    # drift gate exists for
    batch = emb.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("emb", lambda x: x + F.lit(3.0)).alias("emb"),
    )

    cents = kmeans_fit(train, "vec_id", "emb", k=4, dim=64, iters=2)
    assigned_train = assign_clusters(train, "vec_id", "emb", cents)
    index_root = str(tmp_path / "ivf_index")
    asg_root = str(tmp_path / "ivf_assignments")
    save_ivf_index(
        cents.join(ivf_train_stats(assigned_train), "cluster"), index_root
    )
    SnapshotTable(spark, asg_root).commit(
        assigned_train.select("vec_id", "emb", "cluster", "dist_sq"),
        operation="ivf_assignments",
    )

    _, drift = ivf_append_batch(index_root, asg_root, batch, "vec_id", "emb")
    assert drift > IVF_DRIFT_RETRAIN, drift  # the trigger fires

    old_index = load_ivf_index(spark, index_root)
    iv, av = ivf_retrain(
        spark, index_root, asg_root, "vec_id", "emb", k=4, dim=64, iters=2
    )
    assert iv == 2 and av == 3

    # the old index version stays readable after the swap (rollback /
    # pinned-reader contract; vacuum-safe until retention expires)
    assert load_ivf_index(spark, index_root, version=1).count() == 4
    new_index = load_ivf_index(spark, index_root)
    assert new_index.count() == 4

    # improved batch inertia: the triggering batch is tighter under the
    # refit quantizer, and its drift ratio is back under the threshold
    quant_old = old_index.select("cluster", "centroid")
    quant_new = new_index.select("cluster", "centroid")
    mean_old = (
        assign_clusters(batch, "vec_id", "emb", quant_old)
        .agg(F.avg("dist_sq")).collect()[0][0]
    )
    mean_new = (
        assign_clusters(batch, "vec_id", "emb", quant_new)
        .agg(F.avg("dist_sq")).collect()[0][0]
    )
    assert mean_new < mean_old
    assert (
        ivf_drift_ratio(
            assign_clusters(batch, "vec_id", "emb", quant_new), new_index
        )
        < IVF_DRIFT_RETRAIN
    )

    # the swapped index + re-assigned corpus serve searches THROUGH the
    # crash-consistent pair loader: a query AT a shifted batch vector's
    # position returns that exact row as top hit
    from tbench_agentic_data_pipeline_spark.operators.clustering import (
        load_ivf_state,
    )

    state_index, corpus = load_ivf_state(spark, index_root, asg_root)
    assert state_index.count() == 4
    probe_vec = batch.limit(1).collect()[0]
    queries = spark.createDataFrame(
        [(0, probe_vec["emb"])], "q_id long, q_emb array<double>"
    )
    top = ivf_search_topk(
        corpus, queries, state_index, k=1, nprobe=2
    ).collect()
    assert top and top[0]["vec_id"] == probe_vec["vec_id"]

    # crash-window consistency (r13 review): an O(batch) delta tick on
    # the published chain is served, but a retrain whose assignments
    # committed WITHOUT the index flip (simulated crash between the two
    # commits) must stay invisible to the pair loader — new labels never
    # appear under the old quantizer
    served_before = corpus.count()
    _, d = ivf_append_batch(
        index_root, asg_root,
        batch.select((F.col("vec_id") + 5_000_000).alias("vec_id"), "emb"),
        "vec_id", "emb",
    )
    _, corpus2 = load_ivf_state(spark, index_root, asg_root)
    assert corpus2.count() == served_before + batch.count()  # delta visible
    SnapshotTable(spark, asg_root).commit(
        corpus2.withColumn("cluster", F.lit(99)),  # a would-be new chain
        operation="ivf_retrain",
    )
    state_index3, corpus3 = load_ivf_state(spark, index_root, asg_root)
    assert corpus3.count() == served_before + batch.count()
    assert corpus3.where(F.col("cluster") == 99).count() == 0
    assert state_index3.count() == 4


def test_ivf_drift_ratio_signals_retrain_on_shifted_batch(spark, tmp_path):
    """The drift trigger itself: a batch from a SHIFTED distribution
    (every component displaced by several training standard deviations)
    must push the inertia ratio past IVF_DRIFT_RETRAIN, while the
    unshifted twin of the same batch stays under it."""
    from tbench_agentic_data_pipeline_spark.operators.clustering import (
        IVF_DRIFT_RETRAIN,
        assign_clusters,
        ivf_drift_ratio,
        ivf_train_stats,
        kmeans_fit,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    cents = kmeans_fit(emb, "vec_id", "emb", k=4, dim=64, iters=2)
    index = cents.join(
        ivf_train_stats(assign_clusters(emb, "vec_id", "emb", cents)),
        "cluster",
    )

    same = assign_clusters(emb.limit(40), "vec_id", "emb", cents)
    assert ivf_drift_ratio(same, index) < IVF_DRIFT_RETRAIN

    shifted = emb.limit(40).select(
        "vec_id", F.transform("emb", lambda x: x + F.lit(3.0)).alias("emb")
    )
    moved = assign_clusters(shifted, "vec_id", "emb", cents)
    assert ivf_drift_ratio(moved, index) > IVF_DRIFT_RETRAIN

    # an index saved without stats must refuse, not silently divide
    import pytest

    with pytest.raises(ValueError, match="training stats"):
        ivf_drift_ratio(same, cents)

    # r11 review: degenerate inputs resolve, not crash — a scheduled
    # ingestion tick must survive an EMPTY batch (no drift evidence ->
    # 1.0) and a zero training baseline (any nonzero batch inertia is
    # infinite drift -> retrain)
    empty = assign_clusters(
        emb.where(F.lit(False)), "vec_id", "emb", cents
    )
    assert ivf_drift_ratio(empty, index) == 1.0
    degenerate = index.withColumn("train_mean_dist_sq", F.lit(0.0))
    import math

    assert math.isinf(ivf_drift_ratio(moved, degenerate))
    assert ivf_drift_ratio(empty, degenerate) == 1.0


def test_knn_join_paths_agree_on_null_buckets(spark):
    """A NULL bucket key is its own group in knn_join_arrow's groupBy; the
    blocked path's broadcast count-join must be null-safe so the two
    documented result-identical paths really are (ADVICE r4: a plain
    equi-join silently dropped NULL-bucket rows from the blocked path).

    The id/40 third component is load-bearing: pure [cos i, sin i]
    rotations make cosine similarity depend only on |i-j|, so pairs with
    equal gaps tie EXACTLY in real arithmetic (query 31's neighbors 25
    and 37, both gap 6), and this test compares ranks across DIFFERENT
    GEMM shapes (full bucket vs block_rows=5) whose BLAS kernels round
    such a tie to different last ulps — the paths' contract is agreement
    modulo accumulation order, not bit-equal ties. The magnitude term
    separates every within-row cosine pair by ≥1.7e-4 (verified
    numerically), 11 orders above kernel ulp noise."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        knn_join_arrow,
        knn_join_blocked,
    )

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id") % 3)
        .alias("label"),
        F.array(
            F.cos(F.col("id").cast("double")),
            F.sin(F.col("id").cast("double")),
            F.col("id").cast("double") / 40.0,
        ).alias("emb"),
    )
    one = {
        (r.vec_id, r.nbr_id): (r.rk, r.label)
        for r in knn_join_arrow(emb, 3).collect()
    }
    blocked = {
        (r.vec_id, r.nbr_id): (r.rk, r.label)
        for r in knn_join_blocked(emb, 3, block_rows=5).collect()
    }
    assert one == blocked
    # NULL-bucket vectors (id % 3 == 0: 14 of them) DID get neighbors
    assert sum(1 for (v, _) in one if v % 3 == 0) == 14 * 3


def test_knn_join_dispatcher_routes_dense_buckets(spark):
    """knn_join must route dense buckets to the blocked path silently (no
    max_bucket_rows ValueError) and produce exactly the result the
    one-task path gives with the guard lifted — including a NULL bucket
    and an empty small side."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        knn_join,
        knn_join_arrow,
    )

    emb = spark.range(120).select(
        F.col("id").alias("vec_id"),
        # bucket 0 is dense (60 rows), 1/2 small, plus a NULL bucket
        F.when(F.col("id") < 60, F.lit(0))
        .when(F.col("id") % 4 == 0, None)
        .otherwise(F.col("id") % 3)
        .alias("label"),
        F.array(
            F.cos(F.col("id").cast("double")),
            F.sin(F.col("id").cast("double")),
        ).alias("emb"),
    )
    dispatched = {
        (r.vec_id, r.nbr_id): r.rk
        for r in knn_join(emb, 3, max_bucket_rows=30).collect()
    }
    reference = {
        (r.vec_id, r.nbr_id): r.rk
        for r in knn_join_arrow(emb, 3, max_bucket_rows=10**9).collect()
    }
    assert dispatched == reference

    # all-dense input: the small side is empty, dispatcher still complete
    all_dense = emb.withColumn("label", F.lit(7))
    got = knn_join(all_dense, 2, max_bucket_rows=30)
    counts = got.groupBy("vec_id").count().collect()
    assert len(counts) == 120 and all(r["count"] == 2 for r in counts)


def test_knn_join_dispatcher_leaves_no_persisted_tables(spark):
    """r5 advisor: the dispatcher used to .persist() the per-bucket count
    table and never unpersist it — each call leaked a cached table until
    the JVM ContextCleaner collected it. The counts are now collected
    once (they are broadcast-small by design) so no cache entry should
    survive the call."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import knn_join

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    emb = spark.range(80).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 3).alias("label"),
        F.array(
            F.cos(F.col("id").cast("double")),
            F.sin(F.col("id").cast("double")),
        ).alias("emb"),
    )
    assert knn_join(emb, 2, max_bucket_rows=10).count() > 0
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before, f"knn_join leaked {after - before} persisted RDD(s)"


def test_pq_arrow_and_declarative_paths_are_bit_identical(spark):
    """Product quantization (r7): the Arrow/numpy encode+ADC twins must
    equal the declarative fold operators BIT-for-bit — same codes, same
    double scores, same ranks — because the numpy sums run in the same
    index order as the sequential folds. This is what licenses the
    registered query to hash-check the production path directly."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        pq_encode,
        pq_encode_arrow,
        pq_search_topk,
        pq_search_topk_arrow,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    m, k, dim = 8, 16, 64
    codes_decl = {
        r["vec_id"]: list(r["codes"])
        for r in emb.select(
            "vec_id", pq_encode(F.col("emb"), m, k, dim).alias("codes")
        ).collect()
    }
    codes_arrow = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode_arrow(emb, m, k, dim).collect()
    }
    assert codes_arrow == codes_decl
    assert all(0 <= c < k for cs in codes_arrow.values() for c in cs)
    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    codes_df = pq_encode_arrow(emb, m, k, dim)
    decl = {
        (r["q_id"], r["vec_id"]): (r["adc_sq"], r["rank"])
        for r in pq_search_topk(
            emb.select("vec_id", pq_encode(F.col("emb"), m, k, dim).alias("codes")),
            queries, 5, m, k, dim,
        ).collect()
    }
    arrow = {
        (r["q_id"], r["vec_id"]): (r["adc_sq"], r["rank"])
        for r in pq_search_topk_arrow(
            codes_df, queries, 5, m, k, dim
        ).collect()
    }
    assert arrow == decl  # exact float equality, deliberate
    # self is its own nearest code sequence: rank 1 at distance == LUT sum
    assert all(arrow[(q, q)][1] == 1 for q in range(5))


def test_lsh_bucket_assign_arrow_matches_fold(spark):
    """The Arrow bucket twin must reproduce the declarative fold's
    signatures EXACTLY (same md5 planes, same sequential sum order —
    the bit-identity that lets sim_lsh_buckets / bounded_cell_keys use
    the fast path against the fold-order oracle)."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        lsh_bucket_assign,
        lsh_bucket_assign_arrow,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    both = emb.select(
        "vec_id",
        lsh_bucket_assign(F.col("emb"), 8, 64).alias("fold"),
        lsh_bucket_assign_arrow(F.col("emb"), 8, 64).alias("arrow"),
    )
    assert both.where("fold <> arrow").count() == 0
    assert both.where("arrow < 0 or arrow > 255").count() == 0


def test_bounded_cell_keys_caps_oversized_cells(spark):
    """r7 verdict #2: the within-cell pair join must be bounded in-plan.
    Cells under the cap keep subkey 0 (exact semantics); oversized cells
    split into 2^depth hyperplane sub-buckets with depth chosen so the
    expected bucket size is back under the cap, and candidate pairs
    never cross sub-buckets."""
    import pandas as pd_local

    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        bounded_cell_keys,
    )

    rng_rows = []
    import hashlib
    import random

    rnd = random.Random(3)
    for i in range(300):  # one cell of 300 rows > cap 64 → depth 3
        rng_rows.append(("big", i, [rnd.uniform(-1, 1) for _ in range(64)]))
    for i in range(40):  # one cell under the cap → depth 0
        rng_rows.append(("small", 1000 + i, [rnd.uniform(-1, 1) for _ in range(64)]))
    df = spark.createDataFrame(
        rng_rows, "label string, vec_id long, emb array<double>"
    )
    keyed = bounded_cell_keys(df, "label", "emb").collect()
    small = [r for r in keyed if r["label"] == "small"]
    big = [r for r in keyed if r["label"] == "big"]
    assert {r["subkey"] for r in small} == {0}
    # depth = ceil(log2(300/64)) = 3 → subkeys within [0, 8)
    assert all(0 <= r["subkey"] < 8 for r in big)
    assert len({r["subkey"] for r in big}) > 1  # genuinely split
    sizes = pd_local.Series([r["subkey"] for r in big]).value_counts()
    # hyperplane splits are approximately balanced on random vectors
    assert sizes.max() < 300


def test_retired_embedding_cosine_twin_still_matches_its_oracle(spark):
    """r15 twin consolidation (registry capacity policy): the
    single-probe twin `dedup_embedding_cosine` is no longer a registered
    query — `dedup_embedding_multiprobe` is the registered
    representative — but its full-result oracle survives verbatim as
    EMBEDDING_COSINE_ORACLE and must keep hash-matching the function
    through the SAME gate the external driver applies (rows + schema +
    sorted value hash at the oracle SF). A drifted plane constant,
    depth formula, or cap would fail here exactly as it would have
    failed the driver."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        EMBEDDING_COSINE_ORACLE,
        dedup_embedding_cosine,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle_harness import compare

    res = compare(
        "dedup_embedding_cosine(retired twin)",
        spark,
        dedup_embedding_cosine,
        EMBEDDING_COSINE_ORACLE,
        SF_ORACLE,
    )
    assert res.ok, res


def test_bounded_cell_keys_rejects_reserved_column_collisions(spark):
    """r14 ADVICE: the split joins on temp columns __cell/__depth/__cnt
    and then drops them; a caller frame already carrying one of those
    names would make the join ambiguous or silently drop caller data.
    The helper must refuse loudly instead."""
    import pytest as pytest_local

    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        bounded_cell_keys,
    )

    df = spark.createDataFrame(
        [("a", 1, [0.1] * 64, 7)],
        "label string, vec_id long, emb array<double>, __cell int",
    )
    with pytest_local.raises(ValueError, match="__cell"):
        bounded_cell_keys(df, "label", "emb")


def test_pq_arrow_paths_accept_string_keys(spark):
    """r7 ADVICE: pq_encode_arrow / pq_search_topk_arrow hardcoded `long`
    key columns in their Arrow out-schemas while exposing the key names as
    parameters — string doc ids died with an Arrow schema mismatch. The
    dtypes now derive from the input schemas like brute_force_topk_arrow."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        pq_encode_arrow,
        pq_search_topk_arrow,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
        as_double(F.col("embedding")).alias("emb"),
    )
    m, k, dim = 8, 16, 64
    codes = pq_encode_arrow(emb, m, k, dim)
    assert codes.schema["vec_id"].dataType.simpleString() == "string"
    queries = emb.where("vec_id in ('doc-0','doc-1')").select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    rows = pq_search_topk_arrow(codes, queries, 3, m, k, dim).collect()
    assert len(rows) == 6
    # self is its own nearest code sequence under string keys too
    assert {r["q_id"] for r in rows if r["rank"] == 1 and r["vec_id"] == r["q_id"]} \
        == {"doc-0", "doc-1"}


def test_pq_trained_codebooks_beat_the_md5_floor(spark):
    """pq_train fits per-subspace k-means codebooks (the production
    quality path); they must flow through the same Arrow twins via the
    codebook seam and cut quantization error below the untrained
    md5-derived floor — k-means minimizes reconstruction MSE by
    construction, random constants don't. (Recall@10 on this fixture is
    a weak discriminator — the synthetic embeddings are near-uniform
    random, so the test asserts MSE strictly and recall as
    no-regression.)"""
    import numpy as np

    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        _pq_codebook_np,
        as_double,
        brute_force_topk,
        codebook_from_df,
        pq_encode_arrow,
        pq_search_topk_arrow,
        pq_train,
    )

    m, k, dim = 8, 16, 64
    ds = dim // m
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    queries = emb.where("vec_id < 10").select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, 10).collect()
    }

    def recall(codebook):
        codes = pq_encode_arrow(emb, m, k, dim, codebook=codebook)
        got = {
            (r["q_id"], r["vec_id"])
            for r in pq_search_topk_arrow(
                codes, queries, 10, m, k, dim, codebook=codebook
            ).collect()
        }
        assert len(got) == len(exact)  # k rows per query either way
        return len(got & exact) / len(exact)

    trained = codebook_from_df(pq_train(emb, m, k, dim, iters=3), m, k, dim)
    assert trained.shape == (m, k, ds)

    X = np.array([r["emb"] for r in emb.collect()])

    def mse(cb):
        err = 0.0
        for s in range(m):
            sv = X[:, s * ds : (s + 1) * ds]
            d = ((sv[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
            err += d.min(1).sum()
        return err / X.size

    mse_floor = mse(_pq_codebook_np(m, k, dim))
    mse_trained = mse(trained)
    assert mse_trained < 0.95 * mse_floor, (mse_trained, mse_floor)
    assert recall(trained) >= recall(None)  # both deterministic


def test_ivfpq_is_cell_restricted_pq(spark):
    """ivfpq_search_topk with a single probe cell must equal
    pq_search_topk run over the corpus pre-filtered to that cell —
    bit-identical adc_sq doubles and ranks (the driver-built numpy LUT
    sums in the fold's order). The IVF restriction changes WHAT is
    scanned, never the arithmetic."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        ivfpq_search_topk,
        pq_encode_arrow,
        pq_search_topk,
    )

    m, k, dim = 8, 16, 64
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    codes = pq_encode_arrow(emb, m, k, dim, carry_cols=("label",))
    queries = emb.where("vec_id < 4").select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.array(F.col("label")).alias("probe_cells"),
        F.col("label").alias("q_label"),
    )
    got = {
        (r["q_id"], r["vec_id"]): (r["adc_sq"], r["rank"])
        for r in ivfpq_search_topk(
            codes, queries, 5, m, k, dim, cell_col="label"
        ).collect()
    }
    want = {}
    for q in queries.select("q_id", "q_label").collect():
        cell_corpus = codes.where(F.col("label") == q["q_label"]).drop(
            "label"
        )
        one_q = emb.where(F.col("vec_id") == q["q_id"]).select(
            F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
        )
        for r in pq_search_topk(
            cell_corpus, one_q, 5, m, k, dim
        ).collect():
            want[(r["q_id"], r["vec_id"])] = (r["adc_sq"], r["rank"])
    assert got == want  # exact float equality, deliberate


def test_ivfpq_exhaustive_probe_recovers_full_pq_with_trained_codebook(
    spark,
):
    """Probing EVERY cell degenerates IVFPQ to plain PQ search — results
    must match pq_search_topk_arrow over the whole corpus exactly. Run
    through the trained-codebook seam end-to-end (train → encode →
    cell-restricted ADC), and with a duplicated probe list to pin the
    per-query dedup (a multi-probe list never double-scores)."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        codebook_from_df,
        ivfpq_search_topk,
        pq_encode_arrow,
        pq_search_topk_arrow,
        pq_train,
    )

    m, k, dim = 8, 16, 64
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    cb = codebook_from_df(pq_train(emb, m, k, dim, iters=1), m, k, dim)
    codes = pq_encode_arrow(
        emb, m, k, dim, codebook=cb, carry_cols=("label",)
    )
    all_cells = sorted(
        r["label"] for r in emb.select("label").distinct().collect()
    )
    queries = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    # duplicated probe list: every cell twice
    probed = queries.withColumn(
        "probe_cells",
        F.array(*[F.lit(c) for c in all_cells + all_cells]),
    )
    got = {
        (r["q_id"], r["vec_id"]): (r["adc_sq"], r["rank"])
        for r in ivfpq_search_topk(
            codes, probed, 7, m, k, dim, cell_col="label", codebook=cb
        ).collect()
    }
    want = {
        (r["q_id"], r["vec_id"]): (r["adc_sq"], r["rank"])
        for r in pq_search_topk_arrow(
            codes.drop("label"), queries, 7, m, k, dim, codebook=cb
        ).collect()
    }
    assert got == want


def test_pq_encode_arrow_carries_columns_verbatim(spark):
    """carry_cols rides extra columns through the encode stage with
    value and type preserved — the codes table is cell-searchable as
    written, no recovery join."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        pq_encode_arrow,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    codes = pq_encode_arrow(emb, 8, 16, 64, carry_cols=("label",))
    assert dict(codes.dtypes)["label"] == dict(emb.dtypes)["label"]
    got = {r["vec_id"]: r["label"] for r in codes.collect()}
    want = {r["vec_id"]: r["label"] for r in emb.collect()}
    assert got == want


def test_pq_adc_ties_break_by_key_across_batches(spark):
    """Duplicate vectors quantize to identical codes, so their ADC
    distances tie EXACTLY; the final order breaks ties by corpus key,
    and the Arrow path's per-batch cut must preserve that — an
    argpartition cut kept an arbitrary tied subset and could drop the
    smallest-key winner (caught in review, pinned here with a corpus
    that is one vector cloned 40 times across many partitions)."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        pq_encode_arrow,
        pq_search_topk_arrow,
    )

    base = [0.1] * 64
    rows = [(int(i), base) for i in range(40, 0, -1)]  # keys 40..1
    emb = spark.createDataFrame(
        rows, "vec_id long, emb array<double>"
    ).repartition(8)
    codes = pq_encode_arrow(emb, 8, 16, 64)
    queries = spark.createDataFrame(
        [(999, base)], "q_id long, q_emb array<double>"
    )
    got = (
        pq_search_topk_arrow(codes, queries, 5, 8, 16, 64)
        .orderBy("rank")
        .collect()
    )
    # all 40 clones tie: winners must be the five smallest keys, in order
    assert [r["vec_id"] for r in got] == [1, 2, 3, 4, 5]
    assert len({round(r["adc_sq"], 12) for r in got}) == 1


def test_pq_rerank_recovers_exact_topk_as_candidates_widen(spark):
    """Two-stage PQ: ADC top-N candidates re-ranked by exact cosine.
    Recall@5 vs the exact brute-force top-5 must be monotone
    non-decreasing in N and reach 1.0 when N covers the corpus — the
    recall knob contract the pipeline is used through."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        brute_force_topk,
        pq_encode_arrow,
        pq_rerank_exact,
        pq_search_topk_arrow,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    queries = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, 5).collect()
    }
    codes = pq_encode_arrow(emb, 8, 16, 64)
    n_corpus = emb.count()
    prev = -1.0
    for n_cand in (10, 50, n_corpus):
        cands = pq_search_topk_arrow(codes, queries, n_cand, 8, 16, 64)
        got = {
            (r["q_id"], r["vec_id"])
            for r in pq_rerank_exact(cands, emb, queries, 5).collect()
        }
        recall = len(got & exact) / len(exact)
        assert recall >= prev, (n_cand, recall, prev)
        prev = recall
    assert prev == 1.0  # full-coverage candidates == exact top-5


def test_pq_codebook_snapshot_lifecycle_roundtrip(spark, tmp_path):
    """Trained codebooks persist through the versioned snapshot
    lifecycle: save → load → collect equals the pre-save ndarray
    exactly, and a refreshed book leaves the prior version pinnable —
    codes encoded under v1 stay decodable after the v2 refresh."""
    import numpy as np

    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.clustering import (
        load_pq_codebook,
        save_pq_codebook,
    )
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        codebook_from_df,
        pq_train,
    )

    m, k, dim = 4, 8, 64
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    book_df = pq_train(emb, m, k, dim, iters=1)
    before = codebook_from_df(book_df, m, k, dim)
    root = str(tmp_path / "pq_book")
    v1 = save_pq_codebook(book_df, root)
    after = codebook_from_df(load_pq_codebook(spark, root, v1), m, k, dim)
    assert np.array_equal(before, after)  # exact doubles, deliberate
    # refresh: one more Lloyd's round commits as v2; v1 stays pinnable
    v2 = save_pq_codebook(pq_train(emb, m, k, dim, iters=2), root)
    assert v2 > v1
    pinned = codebook_from_df(load_pq_codebook(spark, root, v1), m, k, dim)
    assert np.array_equal(before, pinned)


def test_codebook_from_df_rejects_duplicates_and_gaps(spark):
    """A duplicate (sub, code) row would mask a missing centroid under a
    raw row count, leaving a silent zero row in the book — both defects
    must raise."""
    import pytest

    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        codebook_from_df,
    )

    m, k, ds = 2, 2, 2
    rows = [
        (s, c, [0.1 * s, 0.1 * c]) for s in range(m) for c in range(k)
    ]
    schema = "sub int, code int, centroid array<double>"
    ok = codebook_from_df(spark.createDataFrame(rows, schema), m, k, 4)
    assert ok.shape == (m, k, ds)
    dup = rows[:3] + [rows[2]]  # still m*k rows, one duplicated
    with pytest.raises(ValueError, match="duplicate"):
        codebook_from_df(spark.createDataFrame(dup, schema), m, k, 4)
    with pytest.raises(ValueError, match="expected"):
        codebook_from_df(spark.createDataFrame(rows[:3], schema), m, k, 4)


def test_pq_search_refuses_oversized_query_side(spark):
    """The Arrow ADC path ships per-query LUTs in the closure — the
    same driver-size contract as brute_force_topk_arrow, enforced by
    the same one-evaluation bounded collect."""
    import pytest

    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        pq_encode_arrow,
        pq_search_topk_arrow,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    codes = pq_encode_arrow(emb, 8, 16, 64)
    queries = emb.limit(30).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    with pytest.raises(ValueError, match="pq_search_topk"):
        pq_search_topk_arrow(codes, queries, 5, 8, 16, 64, max_queries=29)


def test_knn_join_bucket_count_cap_falls_back_to_plan_join(spark):
    """r6 advisor: the dispatcher collected the whole bucket-count table
    unconditionally — unbounded for bucketings approaching one bucket
    per row. Past max_broadcast_buckets it must fall back to joining the
    aggregation plan (and reduce routing to one MAX scalar) with results
    identical to the broadcast path, dense buckets included."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import knn_join

    emb = spark.range(90).select(
        F.col("id").alias("vec_id"),
        # bucket 0 dense (45 rows), others small, plus NULL buckets
        F.when(F.col("id") < 45, F.lit(0))
        .when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 4)
        .alias("label"),
        F.array(
            F.cos(F.col("id").cast("double")),
            F.sin(F.col("id").cast("double")),
        ).alias("emb"),
    )
    broadcast_path = {
        (r.vec_id, r.nbr_id): r.rk
        for r in knn_join(emb, 3, max_bucket_rows=30).collect()
    }
    capped = {
        (r.vec_id, r.nbr_id): r.rk
        for r in knn_join(
            emb, 3, max_bucket_rows=30, max_broadcast_buckets=2
        ).collect()
    }
    assert capped == broadcast_path


def test_ivf_search_refuses_oversized_query_side(spark):
    """r5 advisor: ivf_search_topk broadcasts the queries × nprobe probe
    table; the same LIMIT-probe guard brute_force_topk_arrow grew must
    refuse an oversized query set instead of silently collecting it."""
    import pytest

    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        ivf_search_topk,
    )

    emb = _corpus(spark)
    cents = kmeans_fit(emb, "vec_id", "emb", k=4, dim=DIM, iters=1)
    assigned = assign_clusters(emb, "vec_id", "emb", cents)
    queries = emb.limit(30).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    with pytest.raises(ValueError, match="knn_join"):
        ivf_search_topk(assigned, queries, cents, K, max_queries=29)
    # at/below the ceiling the same frame executes
    assert ivf_search_topk(assigned, queries, cents, K, max_queries=30).count() > 0


def test_ivf_search_recall_monotone_in_nprobe(spark):
    """The search half of IVF (learned quantizer + nprobe cell probing):
    recall@k must be monotone in nprobe, exact when every cell is probed,
    and above the measured-floor targets with a 16-cell quantizer — the
    curve the SCALING.md recall/latency table tracks at ~sf1."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        ivf_search_topk,
    )

    emb = _corpus(spark)
    cents = kmeans_fit(emb, "vec_id", "emb", k=16, dim=DIM, iters=2)
    assigned = assign_clusters(emb, "vec_id", "emb", cents)
    queries = emb.limit(20).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    exact = brute_force_topk(emb, queries, K)
    recalls = {
        nprobe: recall_at_k(
            ivf_search_topk(assigned, queries, cents, K, nprobe=nprobe),
            exact,
            K,
        )
        for nprobe in (1, 2, 4, 8, 16)
    }
    assert sorted(recalls.values()) == [recalls[n] for n in (1, 2, 4, 8, 16)], recalls
    assert recalls[16] == 1.0, recalls  # all cells probed ⇒ brute force
    # The fixture embeddings are only weakly clustered (near-random 64-d:
    # measured 0.57@4, 0.795@8 — spherical normalization does not move
    # these), so the floors pin the measured curve with a small margin;
    # the quantizer is deterministic (seedless hash init), so these are
    # stable, not flaky. SCALING.md records the same curve with latency
    # at ~sf1.
    assert recalls[4] >= 0.55, recalls
    assert recalls[8] >= 0.75, recalls


def test_int8_pack_unpack_roundtrip_and_size(spark):
    """pack_int8 realizes the 1-byte-per-dim storage the quantize_int8
    docstring promises: binary length == dims, round trip is exact for
    every quantized vector (including nulls), and cosine over unpacked
    vectors equals cosine over the originals bit-for-bit (integer
    arithmetic throughout)."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        cosine_quantized,
        pack_int8,
        quantize_int8,
        unpack_int8,
    )

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.when(
            F.col("id") == 7, F.lit(None).cast("array<double>")
        ).otherwise(
            F.array(
                F.cos(F.col("id").cast("double")),
                F.sin(F.col("id").cast("double")) * 3.5,
                F.lit(-1.0) * F.col("id").cast("double") / 7,
            )
        ).alias("emb"),
    )
    q = emb.withColumn("qv", quantize_int8(F.col("emb")))
    packed = q.withColumn("blob", pack_int8(F.col("qv")))
    back = packed.withColumn("qv2", unpack_int8(F.col("blob")))
    rows = back.select(
        "vec_id", "qv", "qv2", F.length("blob").alias("nbytes")
    ).collect()
    for r in rows:
        if r["qv"] is None:
            assert r["qv2"] is None and r["nbytes"] is None
        else:
            assert r["qv2"] == r["qv"]
            assert r["nbytes"] == 3  # 1 byte per dim
    # cosine through the packed representation is identical
    pair = (
        back.alias("a")
        .crossJoin(back.alias("b"))
        .where((F.col("a.vec_id") == 3) & (F.col("b.vec_id") == 11))
        .select(
            cosine_quantized(F.col("a.qv"), F.col("b.qv")).alias("c1"),
            cosine_quantized(F.col("a.qv2"), F.col("b.qv2")).alias("c2"),
        )
        .collect()[0]
    )
    assert pair["c1"] == pair["c2"]


def test_multiprobe_keys_hamming1_exactly_once(spark):
    """multiprobe_keys' pair-recovery contract: joining one side's exact
    subkey against the other side's probe set matches a pair EXACTLY
    once iff their subkeys are within hamming distance 1 of each other
    (inside the depth bits), and never otherwise — so the registered
    query needs no post-join dedup. Checked exhaustively at depth 3."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        multiprobe_keys,
    )

    depth = 3
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "ka long, kb long")
    probes = df.select(
        "ka", "kb",
        multiprobe_keys(F.col("kb"), F.lit(depth).cast("long")).alias("ps"),
    ).collect()
    for r in probes:
        ham = bin(r["ka"] ^ r["kb"]).count("1")
        hits = sum(1 for p in r["ps"] if p == r["ka"])
        assert hits == (1 if ham <= 1 else 0), (r["ka"], r["kb"], r["ps"])
        assert len(r["ps"]) == 1 + depth


def test_multiprobe_keys_depth_zero_is_identity(spark):
    """At depth 0 (cell under the cap) the probe set is exactly the base
    subkey — the multi-probe query degrades to the exact within-cell
    semantics, no phantom candidates."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        multiprobe_keys,
    )

    rows = spark.range(5).select(
        multiprobe_keys(F.col("id"), F.lit(0).cast("long")).alias("ps"),
        "id",
    ).collect()
    for r in rows:
        assert r["ps"] == [r["id"]]


def test_dedup_embedding_multiprobe_is_nonvacuous_and_a_superset(spark):
    """Guard of the mm_gif_codec class (a green row that never runs the
    namesake path): at the smoke scale factor the registered query must
    (a) report nonzero recovered=true pairs — pairs the single-probe
    split would have dropped — which requires the hyperplane split to
    be ACTIVE (cap 16 < every fixture cell), and (b) be a strict
    superset of the same-cap single-probe join's pairs."""
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        bounded_cell_keys,
        cosine,
        dedup_embedding_multiprobe,
    )
    from tbench_agentic_data_pipeline_spark.catalog import (
        spread_for_compute,
        table_path,
    )
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
    )

    out = dedup_embedding_multiprobe(spark, SF_SMOKE).collect()
    recovered = {(r["vec_a"], r["vec_b"]) for r in out if r["recovered"]}
    base = {(r["vec_a"], r["vec_b"]) for r in out if not r["recovered"]}
    assert len(recovered) > 0, "multi-probe never recovered a pair"
    assert len(base) > 0

    emb = spread_for_compute(
        load_table(spark, SF_SMOKE, "embeddings"),
        "vec_id",
        source_path=table_path(SF_SMOKE, "embeddings"),
    ).select("vec_id", "label", as_double(F.col("embedding")).alias("emb"))
    keyed = bounded_cell_keys(emb, "label", "emb", max_cell=16)
    a = keyed.select(
        "label", "subkey",
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"),
    )
    b = keyed.select(
        "label", "subkey",
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"),
    )
    single = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(b, ["label", "subkey"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cosine(F.col("emb_a"), F.col("emb_b")) >= 0.3)
        .collect()
    }
    assert single == base  # recovered really are the hamming-1 extras
    assert single < (base | recovered)


def test_pq_train_joint_matches_sequential_per_sub_kmeans(spark):
    """r9: pq_train trains all m subspaces in ONE assignment + ONE
    update job per Lloyd's round (exploded (key, sub, sv) table)
    instead of m sequential kmeans_fit chains. Seeding, argmin
    tie-break, and empty-cluster carry-forward are the same by
    construction; this pins the refactor to the sequential reference —
    per-(sub, code) centroids equal to float tolerance (aggregation
    order may differ, bit-exactness is not claimed)."""
    import numpy as np

    from tbench_agentic_data_pipeline_spark.operators.clustering import (
        kmeans_fit,
    )
    from tbench_agentic_data_pipeline_spark.operators.similarity import (
        as_double,
        codebook_from_df,
        pq_train,
    )

    m, k, dim, iters = 4, 8, 64, 2
    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .where(F.col("vec_id") < 200)
    )
    joint = codebook_from_df(pq_train(emb, m, k, dim, iters=iters), m, k, dim)

    ds = dim // m
    seq = np.zeros((m, k, ds))
    for sub in range(m):
        sub_df = emb.select(
            "vec_id", F.slice(F.col("emb"), sub * ds + 1, ds).alias("sv")
        )
        for r in kmeans_fit(
            sub_df, "vec_id", "sv", k=k, dim=ds, iters=iters
        ).collect():
            seq[sub, int(r["cluster"])] = np.asarray(r["centroid"])

    assert np.allclose(joint, seq, rtol=1e-9, atol=1e-12)


def test_ivfpq_stale_run_dir_sweep(tmp_path):
    """r9 ADVICE #1 + r10 ADVICE #2 (r11 review hardening): entry-time
    reaping of provably-dead ivfpq run dirs. Dead-pid dirs go; live-pid
    (another process: use our parent) and non-matching names stay;
    own-pid dirs created BY THIS PROCESS are never swept — a DataFrame
    derived from the result holds no Python reference back to it, so no
    reference-based scheme can know when the snapshot becomes
    unreadable — while own-pid dirs NOT in the created set (a recycled
    pid's leftovers) go once past the TTL age guard (a sibling thread
    between mkdir and set-add is microseconds young, never an hour)."""
    import os
    import time

    from tbench_agentic_data_pipeline_spark.operators import similarity

    base = tmp_path / "ivfpq_index"
    base.mkdir()
    me = os.getpid()
    # a LIVE foreign pid that is guaranteed visible from this process's
    # pid namespace for the test's duration: our parent (pid 1 can be
    # namespace-masked in containers, and merely "big" pids like
    # 4_000_000 can be live under systemd's default kernel.pid_max)
    live_pid = os.getppid()
    # above PID_MAX_LIMIT (4194304), the kernel's HARD ceiling
    dead_pid = 4_194_305
    for name in (
        f"run_{dead_pid}_0",
        f"run_{live_pid}_0",
        f"run_{me}_0",  # recycled-pid leftover, old -> swept
        f"run_{me}_1",  # recycled-pid leftover, FRESH -> kept (race guard)
        f"run_{me}_2",  # created by this process, old -> kept forever
        "v3_something_else",
    ):
        (base / name).mkdir()
        (base / name / "x").write_text("payload")
    old = time.time() - similarity._IVFPQ_RUN_TTL_SECONDS - 60
    os.utime(base / f"run_{me}_0", (old, old))
    os.utime(base / f"run_{me}_2", (old, old))
    created = str(base / f"run_{me}_2")
    similarity._IVFPQ_PROCESS_RUNS.add(created)
    try:
        similarity._sweep_stale_ivfpq_runs(str(base))
        left = sorted(p.name for p in base.iterdir())
        assert left == sorted(
            [
                f"run_{live_pid}_0",
                f"run_{me}_1",
                f"run_{me}_2",
                "v3_something_else",
            ]
        )
    finally:
        similarity._IVFPQ_PROCESS_RUNS.discard(created)

    # nonexistent base is a no-op, not an error
    similarity._sweep_stale_ivfpq_runs(str(tmp_path / "missing"))


def test_ivfpq_topk_derived_plan_survives_sibling_sweeps(spark):
    """The guarantee the created-set exists for: a DataFrame DERIVED from
    sim_ivfpq_topk's result (holding no Python reference to the returned
    object) must still read its snapshot after the original is dropped,
    garbage-collected, and a sibling call's entry sweep has run against
    a TTL-stale dir mtime."""
    import gc
    import os
    import time

    from tbench_agentic_data_pipeline_spark.operators import similarity

    before = set(similarity._IVFPQ_PROCESS_RUNS)
    df = similarity.sim_ivfpq_topk(spark, SF_SMOKE)
    created = set(similarity._IVFPQ_PROCESS_RUNS) - before
    assert len(created) == 1
    root = next(iter(created))
    derived = df.where("rank <= 3")  # no Python ref back to df
    del df
    gc.collect()
    # age the dir past the TTL and run a sibling's entry sweep
    old = time.time() - similarity._IVFPQ_RUN_TTL_SECONDS - 60
    os.utime(root, (old, old))
    similarity._sweep_stale_ivfpq_runs(os.path.dirname(root))
    assert os.path.isdir(root)
    assert len(derived.collect()) > 0  # read-after-delete would fail here
