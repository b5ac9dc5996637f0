"""Streaming-surface tests: the unified window transforms run in true
streaming mode, the availableNow drain completes with checkpointing, and
the stateful timeout operator wires (rate-source smoke)."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.streaming.stateful import (
    drain_available,
    expire_stale_tasks,
)
from tbench_agentic_data_pipeline_spark.streaming.windows import tumbling_counts


def _wait(q, timeout=60):
    q.awaitTermination(timeout)


def test_tumbling_window_streaming_mode(spark, tmp_path):
    # Same transform object as the oracle-checked batch mirror, fed a
    # file stream; watermark engaged.
    src = tmp_path / "in"
    src.mkdir()
    batch = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i:02d}:00", "click", float(i)) for i in range(30)],
        "event_id long, ts_s string, event_type string, value double",
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )
    batch.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    agg = tumbling_counts(stream, "ts", "10 minutes", "event_type", watermark="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    # append mode emits only watermark-closed windows: 30 min of data,
    # watermark 5 min → the first two 10-min windows are closed.
    rows = spark.sql("select * from tumbling_smoke").collect()
    assert len(rows) == 2
    assert all(r["n"] == 10 for r in rows)


def test_drain_available_checkpoint_resume(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    df = spark.range(10).withColumnRenamed("id", "task")
    df.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema("task long").parquet(str(src))
    q = drain_available(stream, str(out), str(ckpt))
    _wait(q)
    assert spark.read.parquet(str(out)).count() == 10
    # second drain with NO new data: checkpoint prevents reprocessing.
    q2 = drain_available(
        spark.readStream.schema("task long").parquet(str(src)), str(out), str(ckpt)
    )
    _wait(q2)
    assert spark.read.parquet(str(out)).count() == 10


def test_replay_events_through_session_windows(spark, tmp_path):
    # The full streaming path over DRIVER data: replay events as a
    # micro-batched stream → session windows with watermark → memory sink.
    # Batch mirror (oracle-checked st_session_windows) gives ground truth
    # for the sessions the stream must also close.
    from tbench_agentic_data_pipeline_spark.streaming.sources import replay_events
    from tbench_agentic_data_pipeline_spark.streaming.windows import (
        session_aggregate,
    )

    stream = replay_events(
        spark, "/root/testdata/sf0.001", str(tmp_path / "stage"),
        splits=4, files_per_trigger=1,
    )
    agg = session_aggregate(stream, "ts", "10 minutes", "user_id", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory").queryName("replay_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = spark.sql(
        "select count(*) c, sum(n_events) e from replay_sessions"
    ).collect()[0]
    # append mode emits only watermark-closed sessions; everything closed
    # must agree with the batch mirror's totals (closed ⊆ batch sessions).
    from tbench_agentic_data_pipeline_spark.catalog import load_table

    batch = session_aggregate(
        load_table(spark, "/root/testdata/sf0.001", "events"), "ts", "10 minutes", "user_id"
    )
    assert 0 < streamed["c"] <= batch.count()
    assert streamed["e"] <= 1000


def test_multimodal_resize_and_frame_sample(spark):
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        frame_sample_stub,
        resize_stub,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    media = attach_binary_payload(docs)
    resized = resize_stub(media, 16, 8).collect()
    assert all(len(r["payload"]) == 16 * 8 for r in resized)
    assert all(r["out_width"] == 16 and r["out_height"] == 8 for r in resized)

    frames = frame_sample_stub(media, stride=2, frame_bytes=32)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    lens = {r["doc_id"]: r["media_meta"]["n_bytes"] for r in media.collect()}
    for doc_id, n in per_doc.items():
        expect = -(-lens[doc_id] // 64)  # ceil(len / (stride*frame_bytes))
        assert n == expect, (doc_id, n, expect)


def test_upsert_drain_idempotent(spark, tmp_path):
    # ST6: stream → snapshot upsert. Key t1 appears in both files with a
    # newer value; the final table holds one row per key, and a re-drain
    # with no new data changes nothing (checkpoint + idempotent merge).
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable
    from tbench_agentic_data_pipeline_spark.streaming.stateful import upsert_drain

    src = tmp_path / "upsrc"
    src.mkdir()
    spark.createDataFrame(
        [("t1", 1), ("t2", 1)], "task_id string, rev int"
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [("t1", 2), ("t3", 1)], "task_id string, rev int"
    ).coalesce(1).write.mode("append").parquet(str(src))
    table = SnapshotTable(spark, str(tmp_path / "uptbl"))
    ckpt = str(tmp_path / "upckpt")

    def drain():
        q = upsert_drain(
            spark.readStream.schema("task_id string, rev int").parquet(str(src)),
            table, "task_id", ckpt,
        )
        q.awaitTermination(60)

    drain()
    rows = {r["task_id"]: r["rev"] for r in table.read().collect()}
    assert set(rows) == {"t1", "t2", "t3"}
    assert rows["t1"] in (1, 2)  # micro-batch split decides which arrived last
    v_after_first = table.current_version()
    drain()  # no new data → checkpoint prevents any new commit
    assert table.current_version() == v_after_first


def test_watermark_drops_late_data(spark, tmp_path):
    # Late-data policy: rows older than watermark - delay are dropped in
    # append-mode aggregation. Two micro-batches: the second delivers an
    # event for an hour the watermark has already passed.
    src = tmp_path / "late_in"
    src.mkdir()
    schema = "event_id long, ts_s string, event_type string, value double"

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type", "value",
        ).coalesce(1).write.mode("append").parquet(str(src))

    # batch 1: events through 03:30 → watermark advances past hour 00
    write_batch(
        [(i, f"2024-01-01 0{h}:30:00", "click", 1.0) for i, h in enumerate([0, 1, 2, 3])],
        "b1",
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).option("maxFilesPerTrigger", "1").parquet(str(src))
    agg = tumbling_counts(stream, "ts", "1 hour", "event_type", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory").queryName("late_smoke")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from late_smoke").collect()[0]["c"] >= 3:
                break
            time.sleep(1)
        # batch 2: one punctual event (04:30) advancing the watermark + one
        # very late event (00:45, hours behind) that must NOT reopen hour 00.
        write_batch([(100, "2024-01-01 04:30:00", "click", 1.0),
                     (101, "2024-01-01 00:45:00", "click", 1.0)], "b2")
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql(
                "select count(*) c from late_smoke where w.start >= timestamp '2024-01-01 03:00:00'"
            ).collect()[0]["c"]
            if n >= 1:
                break
            time.sleep(1)
        hour0 = spark.sql(
            "select w.start, n from late_smoke where w.start = timestamp '2024-01-01 00:00:00'"
        ).collect()
        # hour 00 closed with exactly its on-time row; the late 00:45 row
        # was dropped (no second emission, count stays 1).
        assert all(r["n"] == 1 for r in hour0), hour0
        assert len(hour0) <= 1, f"late row reopened a closed window: {hour0}"
    finally:
        q.stop()


def test_expire_stale_tasks_wires(spark, tmp_path):
    # Rate-source smoke: the stateful operator starts, processes batches,
    # and emits in_progress liveness records (timeout path needs wall-clock
    # 24h — the batch twin u6_timeout_release covers release semantics).
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            (F.col("value") % 5).cast("string").alias("task_id"),
        )
    )
    out = expire_stale_tasks(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("expire_smoke")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 45
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) c from expire_smoke").collect()[0]["c"]
            if n > 0:
                break
            time.sleep(1)
        assert n > 0
        rows = spark.sql(
            "select distinct status from expire_smoke"
        ).collect()
        assert {r["status"] for r in rows} <= {"in_progress", "released"}
    finally:
        q.stop()


def test_dedup_within_watermark_streaming(spark, tmp_path):
    """dropDuplicatesWithinWatermark in real streaming mode: availableNow
    drain over in-order parquet input must keep exactly one row per
    (user_id, event_type) — the same key set plain dropDuplicates keeps in
    batch — and the query must make progress with bounded state."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.streaming.windows import (
        dedup_within_watermark,
    )
    from tests.conftest import SF_SMOKE

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "ts")
        .limit(500)
    )
    src = tmp_path / "src"
    batch.write.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    dd = dedup_within_watermark(stream, ["user_id", "event_type"], "ts", "1 hour")
    q = (
        dd.writeStream.format("memory").queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, event_type FROM dedup_wm").collect()
    keys = {(r["user_id"], r["event_type"]) for r in got}
    expected = {
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert keys == expected
    assert len(got) == len(keys)  # exactly one survivor per key


def test_stream_static_enrichment(spark, tmp_path):
    from tbench_agentic_data_pipeline_spark.streaming.joins import (
        enrich_with_dim,
    )

    src = tmp_path / "enrich_src"
    src.mkdir()
    facts = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "cust long, amount double"
    )
    facts.write.mode("overwrite").parquet(str(src))
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "cust long, tier string"
    )
    stream = spark.readStream.schema(facts.schema).parquet(str(src))
    q = (
        enrich_with_dim(stream, dim, "cust")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    rows = {r.cust: r.tier for r in spark.sql("select * from enriched").collect()}
    # left join: unmatched stream rows survive with NULL tier
    assert rows == {1: "gold", 2: "silver", 3: None}


def test_stream_stream_join_within_window(spark, tmp_path):
    from tbench_agentic_data_pipeline_spark.streaming.joins import (
        join_within_window,
    )

    vsrc, csrc = tmp_path / "views_src", tmp_path / "clicks_src"
    vsrc.mkdir()
    csrc.mkdir()
    views = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "v1"), (2, "2024-01-01 10:00:00", "v2")],
        "user long, ts_s string, vid string",
    ).select("user", F.col("ts_s").cast("timestamp").alias("ts"), "vid")
    clicks = spark.createDataFrame(
        [
            (1, "2024-01-01 10:30:00", "c_in"),     # inside 1h window -> match
            (1, "2024-01-01 12:30:00", "c_late"),   # outside window -> dropped
            (2, "2024-01-01 09:30:00", "c_before"), # before the view -> dropped
        ],
        "user long, ts_s string, cid string",
    ).select("user", F.col("ts_s").cast("timestamp").alias("cts"), "cid")
    views.write.mode("overwrite").parquet(str(vsrc))
    clicks.write.mode("overwrite").parquet(str(csrc))
    vstream = spark.readStream.schema(views.schema).parquet(str(vsrc))
    cstream = spark.readStream.schema(clicks.schema).parquet(str(csrc))
    joined = join_within_window(
        vstream, cstream, key="user", left_ts="ts", right_ts="cts",
        watermark="10 minutes", window="1 hour",
    )
    # composable output: flat schema, no duplicate names, writable as-is
    assert sorted(joined.columns) == ["cid", "cts", "ts", "user", "vid"]
    q = (
        joined.select("vid", "cid")
        .writeStream.format("memory")
        .queryName("vc_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    rows = [(r.vid, r.cid) for r in spark.sql("select * from vc_join").collect()]
    assert rows == [("v1", "c_in")]


def test_minhash_banding_is_stream_safe(spark, tmp_path):
    """Unified batch/stream dedup front-end: the per-row signature +
    banding pipeline (zero shuffles, no aggregation) must run UNCHANGED
    under readStream — that's the property that lets a 100 TB ingest
    stream compute near-dup candidates incrementally (band keys land in a
    keyed store; the bucket join happens against it). Asserts streamed
    band keys are byte-identical to the batch run on the same documents."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.dedup import (
        minhash_band_df, shingles,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    src = tmp_path / "docs_src"
    docs.write.parquet(str(src))

    def band_pipeline(df):
        toks = F.split("text", " ")
        shingled = (
            df.select("doc_id", toks.alias("w"))
            .where(F.size("w") >= 3)
            .select(
                "doc_id",
                shingles(F.col("w"), 3, guard_short=False).alias("shingles"),
            )
        )
        return minhash_band_df(
            shingled, "doc_id", "shingles", 8, 4, 2
        ).select("doc_id", F.to_json(F.col("bands")).alias("bands_json"))

    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    q = (
        band_pipeline(stream)
        .writeStream.format("memory")
        .queryName("stream_bands")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: r["bands_json"]
        for r in spark.sql("select * from stream_bands").collect()
    }
    want = {
        r["doc_id"]: r["bands_json"] for r in band_pipeline(docs).collect()
    }
    assert got == want and len(got) > 0


def test_incremental_rollup_drain_maintains_aggregate(spark, tmp_path):
    """The additive-merge drain must equal a batch groupBy over ALL data
    after any number of incremental drains, and a replayed batch id must
    fold in exactly once (the history-log idempotence guard)."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable
    from tbench_agentic_data_pipeline_spark.streaming.stateful import (
        incremental_rollup_drain,
    )
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    a, b = events.randomSplit([0.5, 0.5], seed=7)
    src = tmp_path / "ev_src"
    ckpt = str(tmp_path / "ckpt")
    table = SnapshotTable(spark, str(tmp_path / "rollup"))

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(str(src))
        q = incremental_rollup_drain(
            stream, table, ["event_type"], ["value"], ckpt
        )
        q.awaitTermination(120)

    a.coalesce(1).write.mode("append").parquet(str(src))
    drain()
    b.coalesce(1).write.mode("append").parquet(str(src))
    drain()  # second drain folds ONLY the new files (checkpoint)

    got = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in table.read().collect()
    }
    want = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)

    # replay idempotence: drain again with a FRESH checkpoint over the
    # same source — batch ids restart at 0, which the table history
    # already records as applied, so the merge must skip (a re-delivered
    # batch id is exactly what a crash between merge and checkpoint
    # commit produces)
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = incremental_rollup_drain(
        stream, table, ["event_type"], ["value"], str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    got2 = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in table.read().collect()
    }
    assert got2 == got  # double-counting prevented by the history guard


def test_watermark_keeps_late_data_within_delay(spark, tmp_path):
    # The other half of the late-data contract (VERDICT r3 #7): an event
    # that arrives BEHIND the stream's max timestamp but whose window the
    # watermark has NOT yet closed must be KEPT and counted — late-but-
    # within-delay is merged, only beyond-delay is dropped.
    src = tmp_path / "late_keep_in"
    src.mkdir()
    schema = "event_id long, ts_s string, event_type string, value double"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type", "value",
        ).coalesce(1).write.mode("append").parquet(str(src))

    # b1 through 03:30, watermark delay 2h → watermark 01:30: hour 00
    # emitted, hour 02 still OPEN.
    write_batch(
        [(i, f"2024-01-01 0{h}:30:00", "click", 1.0) for i, h in enumerate([0, 1, 2, 3])]
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).option("maxFilesPerTrigger", "1").parquet(str(src))
    agg = tumbling_counts(stream, "ts", "1 hour", "event_type", watermark="2 hours")
    q = (
        agg.writeStream.format("memory").queryName("late_keep")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from late_keep").collect()[0]["c"] >= 1:
                break
            time.sleep(1)
        # b2: one event 45 min behind max ts into the still-open hour 02,
        # one punctual 05:30 event pushing the watermark to 03:30 so hour
        # 02 finalizes.
        write_batch([(100, "2024-01-01 02:45:00", "click", 1.0),
                     (101, "2024-01-01 05:30:00", "click", 1.0)])
        deadline = time.time() + 60
        hour2 = []
        while time.time() < deadline:
            hour2 = spark.sql(
                "select n from late_keep "
                "where w.start = timestamp '2024-01-01 02:00:00'"
            ).collect()
            if hour2:
                break
            time.sleep(1)
        # hour 02 must contain BOTH its on-time row and the late-but-
        # within-delay row.
        assert [r["n"] for r in hour2] == [2], hour2
    finally:
        q.stop()


def test_session_window_watermark_eviction(spark, tmp_path):
    # Session-path late-data pin (VERDICT r3 #7): a session the watermark
    # has closed stays closed — a beyond-delay event neither reopens it
    # nor seeds a new session — while the close itself emits the merged
    # pre-watermark events.
    from tbench_agentic_data_pipeline_spark.streaming.windows import (
        session_aggregate,
    )

    src = tmp_path / "sess_evict_in"
    src.mkdir()
    schema = "user_id string, ts_s string, value double"

    def write_batch(rows):
        # ONE file per logical batch: with maxFilesPerTrigger=1 every
        # file becomes its own micro-batch, and a multi-file write could
        # process the watermark-advancing event before its session-mates
        # (observed as a load-dependent flake), which is not the
        # scenario under test.
        spark.createDataFrame(rows, schema).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.mode("append").parquet(str(src))

    # b1: u1 session of two events (00:00:00 + 00:00:30, gap 1 min) and a
    # punctual event at 01:00 → watermark (delay 10 min) = 00:50 closes it.
    write_batch([("u1", "2024-01-01 00:00:00", 1.0),
                 ("u1", "2024-01-01 00:00:30", 1.0),
                 ("u1", "2024-01-01 01:00:00", 1.0)])
    stream = spark.readStream.schema(
        "user_id string, ts timestamp, value double"
    ).option("maxFilesPerTrigger", "1").parquet(str(src))
    agg = session_aggregate(stream, "ts", "1 minute", "user_id",
                            watermark="10 minutes")
    q = (
        agg.writeStream.format("memory").queryName("sess_evict")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from sess_evict").collect()[0]["c"] >= 1:
                break
            time.sleep(1)
        first = spark.sql(
            "select n_events from sess_evict "
            "where w.start = timestamp '2024-01-01 00:00:00'"
        ).collect()
        assert [r["n_events"] for r in first] == [2], first
        # b2: an event at 00:05 — 45+ min behind the watermark — plus a
        # punctual 02:00 event that closes the 01:00 session.
        write_batch([("u1", "2024-01-01 00:05:00", 1.0),
                     ("u1", "2024-01-01 02:00:00", 1.0)])
        deadline = time.time() + 60
        sess_100 = []
        while time.time() < deadline:
            sess_100 = spark.sql(
                "select n_events from sess_evict "
                "where w.start = timestamp '2024-01-01 01:00:00'"
            ).collect()
            if sess_100:
                break
            time.sleep(1)
        assert [r["n_events"] for r in sess_100] == [1], sess_100
        rows = spark.sql(
            "select w.start as s, n_events from sess_evict order by s"
        ).collect()
        # exactly the two legitimate sessions: the evicted 00:05 event
        # created nothing and reopened nothing.
        assert [(str(r["s"]), r["n_events"]) for r in rows] == [
            ("2024-01-01 00:00:00", 2),
            ("2024-01-01 01:00:00", 1),
        ], rows
    finally:
        q.stop()


def test_upsert_drain_delta_merge_on_read(spark, tmp_path):
    """The O(batch) streaming drain: micro-batches land as delta
    commits (no table rewrite), read_merged resolves latest-wins, a
    re-drain with no new data is a no-op, and merged compaction
    reclaims superseded rows."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable
    from tbench_agentic_data_pipeline_spark.streaming.stateful import (
        upsert_drain_delta,
    )

    src = tmp_path / "udsrc"
    src.mkdir()
    spark.createDataFrame(
        [("t1", 1), ("t2", 1)], "task_id string, rev int"
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [("t1", 2), ("t3", 1)], "task_id string, rev int"
    ).coalesce(1).write.mode("append").parquet(str(src))
    table = SnapshotTable(spark, str(tmp_path / "udtbl"))
    ckpt = str(tmp_path / "udckpt")

    def drain():
        q = upsert_drain_delta(
            spark.readStream.schema("task_id string, rev int")
            .option("maxFilesPerTrigger", "1").parquet(str(src)),
            table, "task_id", ckpt,
        )
        q.awaitTermination(60)

    drain()
    merged = {r["task_id"]: r["rev"] for r in table.read_merged("task_id").collect()}
    assert merged == {"t1": 2, "t2": 1, "t3": 1}
    # physical: 2 + 2 rows across base + one delta — no rewrite happened
    assert table.read().count() == 4
    v_after = table.current_version()
    drain()  # checkpoint: nothing re-delivered
    assert table.current_version() == v_after
    v = table.compact(merge_key="task_id")
    assert table.read(version=v).count() == 3


def test_rollup_merge_null_key_and_null_sum_semantics(spark):
    """The union+re-aggregate merge (r12 rewrite of the full-outer/
    coalesce-add form) pins the two semantics that changed shape: a NULL
    key is ONE group across merges (groupBy null-safety), and a group
    whose sums are NULL on both sides stays NULL — exactly SQL's SUM —
    where the old coalesce-add form would have fabricated 0."""
    from tbench_agentic_data_pipeline_spark.streaming.stateful import (
        rollup_merge,
        rollup_partial,
    )

    rows = [
        (None, 2.0), (None, None), ("a", 1.5),  # batch 0
        (None, 3.0), ("a", None), ("b", None),  # batch 1
        ("b", None),                            # batch 2 (b stays all-NULL)
    ]
    batches = [
        spark.createDataFrame(rows[:3], "k string, v double"),
        spark.createDataFrame(rows[3:6], "k string, v double"),
        spark.createDataFrame(rows[6:], "k string, v double"),
    ]
    state = rollup_partial(batches[0], ["k"], ["v"])
    for b in batches[1:]:
        state = rollup_merge(state, rollup_partial(b, ["k"], ["v"]), ["k"], ["n", "sum_v"])
    got = {r["k"]: (r["n"], r["sum_v"]) for r in state.collect()}
    assert got == {
        None: (3, 5.0),   # one NULL-key group, NULL values skipped by SUM
        "a": (2, 1.5),
        "b": (2, None),   # all-NULL sum stays NULL (SQL SUM), not 0
    }


def test_incremental_rollup_query_covers_negative_and_null_ids(spark, tmp_path):
    """r12 ADVICE (stateful.py:228): the query's 3-way batch split must
    provably cover the table — Spark's % keeps the dividend sign and a
    NULL id yields a NULL bucket, so negative/NULL event_ids would
    silently drop from every micro-batch and diverge from the oracle's
    full-table aggregate. pmod + NULL-coalesce pins the cover against
    fixture drift (today's fixtures are dense non-null)."""
    from tbench_agentic_data_pipeline_spark.streaming.stateful import (
        st_incremental_rollup,
    )

    rows = [
        ("click", 1.25, -7),
        ("click", 2.50, -1),
        ("view", 0.10, None),
        ("view", 3.33, 0),
        ("buy", 9.99, 5),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, value double, event_id long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: (r["n"], r["sum_cents"])
        for r in st_incremental_rollup(spark, str(tmp_path)).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["sum_cents"])
        for r in df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        )
        .collect()
    }
    assert got == want and sum(n for n, _ in got.values()) == len(rows)


def test_minhash_dedup_drain_matches_batch_mirror(spark, tmp_path):
    """r14 verdict task #7: the streaming near-dup drain must equal its
    registered batch mirror (`st_minhash_dedup`) when the three arriving
    micro-batches cross the same trigger boundaries the mirror encodes
    as arrival ranks — same matches, same batch attribution, same
    jaccard values — and the index/corpus tables must advance by one
    delta commit per batch. Then two exactly-once seams: a SAME-
    checkpoint re-drain with no new data is a no-op, and a FRESH-
    checkpoint replay over the full source (batch ids restart at 0 —
    the crash-between-commit-and-checkpoint shape) is absorbed by the
    per-table operation guard with every table byte-unchanged."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.operators.dedup import minhash_index
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable
    from tbench_agentic_data_pipeline_spark.streaming.stateful import (
        minhash_dedup_drain, st_minhash_dedup,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    history = docs.where(F.col("doc_id") % 2 == 0)
    index_table = SnapshotTable(spark, str(tmp_path / "band_index"))
    corpus_table = SnapshotTable(spark, str(tmp_path / "corpus_toks"))
    matches_table = SnapshotTable(spark, str(tmp_path / "matches"))
    index_table.commit(
        minhash_index(history, hash_fn="md5"), operation="minhash_seed"
    )
    corpus_table.commit(
        history.select(
            "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
        ),
        operation="minhash_seed",
    )

    src = tmp_path / "arriving"
    ckpt = str(tmp_path / "ckpt")

    def drain(checkpoint=ckpt):
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        q = minhash_dedup_drain(
            stream, index_table, corpus_table, matches_table,
            checkpoint, hash_fn="md5",
        )
        q.awaitTermination(120)

    for b in range(3):
        batch = docs.where(
            (F.col("doc_id") % 2 == 1)
            & (F.expr("pmod(doc_id, 6) div 2") == b)
        )
        batch.coalesce(1).write.mode("append").parquet(str(src))
        drain()  # same checkpoint: each drain folds ONLY the new file

    got = {
        (r["batch"], r["new_id"], r["dup_of"], r["jaccard_milli"])
        for r in matches_table.read().collect()
    }
    want = {
        (r["batch"], r["new_id"], r["dup_of"], r["jaccard_milli"])
        for r in st_minhash_dedup(spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) > 0
    # one delta commit per table per batch, on top of the seed
    assert len(index_table.versions()) == 4
    assert len(corpus_table.versions()) == 4

    v_before = (
        index_table.current_version(),
        corpus_table.current_version(),
        matches_table.current_version(),
    )
    drain()  # same checkpoint, no new data → checkpoint prevents re-read
    assert (
        index_table.current_version(),
        corpus_table.current_version(),
        matches_table.current_version(),
    ) == v_before

    # fresh checkpoint: all three files re-deliver as batch 0 of a NEW
    # lineage; every key is already in the corpus, so the first-wins
    # filter makes the whole batch a no-op — no duplicate rows, no
    # empty commits
    drain(checkpoint=str(tmp_path / "ckpt2"))
    assert (
        index_table.current_version(),
        corpus_table.current_version(),
        matches_table.current_version(),
    ) == v_before
    got2 = {
        (r["batch"], r["new_id"], r["dup_of"], r["jaccard_milli"])
        for r in matches_table.read().collect()
    }
    assert got2 == got

    # r15 self-review: checkpoint LOST while new data arrived — the old
    # batch-id-only op guard silently dropped the new file (its ops
    # collided with the dead lineage's batch 0). A brand-new doc whose
    # text duplicates an ingested doc lands in the source dir; a drain
    # under a third checkpoint re-delivers everything as one batch, the
    # already-ingested keys drop out via the key filter, and the new doc
    # is indexed AND matched against the pre-existing corpus.
    dup_src = docs.orderBy("doc_id").limit(1).collect()[0]
    new_id = 1_000_000 + dup_src["doc_id"]
    spark.createDataFrame(
        [(new_id, dup_src["text"])], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(src))
    drain(checkpoint=str(tmp_path / "ckpt3"))
    got3 = {
        (r["new_id"], r["dup_of"])
        for r in matches_table.read().collect()
    }
    assert (new_id, dup_src["doc_id"]) in got3, got3
    # exactly one new commit per table (the new doc's batch), keys never
    # duplicated in the corpus
    assert index_table.current_version() == v_before[0] + 1
    assert (
        corpus_table.read().groupBy("doc_id").count()
        .where(F.col("count") > 1).count() == 0
    )


def test_minhash_dedup_drain_live_mode_stop_and_resume(spark, tmp_path):
    """Live-mode checkpoint-resume for the near-dup ingestion drain (r14
    verdict task #7 'done' criterion): under a processingTime trigger
    the drain processes an arriving file, is STOPPED mid-stream (the
    crash/redeploy shape), and a restart from the same checkpoint picks
    up only the file that arrived while it was down — batch 1 matches
    against an index that already contains batch 0's bands (a cross-
    batch match proves the index state advanced), nothing is
    re-delivered, and each table carries exactly one commit per
    micro-batch on top of its seed."""
    import time as _t

    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable
    from tbench_agentic_data_pipeline_spark.streaming.stateful import (
        _drain_lineage_tag, minhash_dedup_drain,
    )

    schema = "doc_id long, text string"
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows0 = [(100, base + " one"), (101, "unrelated words entirely distinct tokens here")]
    # identical text to batch-0's doc 100 (every band collides — the
    # test pins resume semantics, not LSH recall probabilities), and no
    # overlap with history
    rows1 = [(200, base + " one")]
    history = [(1, "completely different historical document content")]

    index_table = SnapshotTable(spark, str(tmp_path / "idx"))
    corpus_table = SnapshotTable(spark, str(tmp_path / "corp"))
    matches_table = SnapshotTable(spark, str(tmp_path / "match"))
    hist_df = spark.createDataFrame(history, schema)
    from tbench_agentic_data_pipeline_spark.operators.dedup import minhash_index

    index_table.commit(minhash_index(hist_df), operation="seed")
    corpus_table.commit(
        hist_df.select(
            "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
        ),
        operation="seed",
    )

    src = tmp_path / "arriving"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    tag = _drain_lineage_tag(ckpt)

    def start_live():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        return minhash_dedup_drain(
            stream, index_table, corpus_table, matches_table, ckpt,
            trigger={"processingTime": "1 second"},
        )

    def wait_for(op, table, timeout=60):
        deadline = _t.time() + timeout
        while _t.time() < deadline:
            if any(h.get("operation") == op for h in table.history()):
                return True
            _t.sleep(1)
        return False

    spark.createDataFrame(rows0, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = start_live()
    try:
        assert wait_for(f"minhash_index_{tag}_0", index_table), "batch 0 never landed"
    finally:
        q.stop()  # mid-stream stop: checkpoint has batch 0 committed

    # file arrives while the job is down
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = start_live()
    try:
        assert wait_for(f"minhash_index_{tag}_1", index_table), "batch 1 never landed"
    finally:
        q.stop()

    got = {
        (r["batch"], r["new_id"], r["dup_of"])
        for r in matches_table.read().collect()
    }
    # the only qualifying pair: batch-1 doc 200 vs batch-0 doc 100 — a
    # CROSS-BATCH match that exists only because the restart resumed
    # onto the index state batch 0 had advanced
    assert got == {(1, 200, 100)}, got
    # exactly one commit per micro-batch per table (plus the seed on the
    # two seeded tables), so nothing was re-delivered across the
    # stop/restart boundary
    for t, want in (
        (index_table,
         ["seed", f"minhash_index_{tag}_0", f"minhash_index_{tag}_1"]),
        (corpus_table,
         ["seed", f"minhash_corpus_{tag}_0", f"minhash_corpus_{tag}_1"]),
        (matches_table,
         [f"minhash_matches_{tag}_0", f"minhash_matches_{tag}_1"]),
    ):
        assert [h["operation"] for h in t.history()] == want
