"""Sources & snapshot-table tests: drift-tolerant CSV ingest (against the
reference's real shipped CSVs when present), task-store explode, snapshot
commit/read/time-travel, and the review-then-staging move ordering."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.sources.readers import (
    REVIEW_COLUMNS,
    STAGING_COLUMNS,
    read_datapoint_csv,
)
from tbench_agentic_data_pipeline_spark.sources.snapshot import (
    SnapshotTable,
    move_rows,
)

_REF = "/root/reference/agents/dp_builder_workspace"


@pytest.mark.skipif(
    not os.path.exists(f"{_REF}/review/datapoints_for_review.csv"),
    reason="reference fixture CSVs not available",
)
def test_read_reference_review_csv(spark):
    # The shipped review CSV: 234 rows, 10 columns, multiline/quoting/JSON
    # cell stress (SURVEY.md §5.1). Row count is the parse-correctness
    # witness — a naive (non-multiLine) read shatters rows.
    df = read_datapoint_csv(
        spark, f"{_REF}/review/datapoints_for_review.csv", REVIEW_COLUMNS
    )
    assert df.count() == 234
    assert df.columns == list(REVIEW_COLUMNS)
    # JSON-in-cell integrity: every non-empty test_weights cell decodes.
    bad = df.where(
        (F.col("test_weights") != "")
        & F.from_json("test_weights", "map<string,double>").isNull()
    ).count()
    assert bad == 0


@pytest.mark.skipif(
    not os.path.exists(f"{_REF}/staging/datapoints.csv"),
    reason="reference fixture CSVs not available",
)
def test_read_reference_staging_csv_with_drift(spark):
    # The staging CSV carries 2 extra drift columns (tests, weights);
    # normalization projects to the declared schema (add_dp_to_review.py:71-79).
    df = read_datapoint_csv(
        spark, f"{_REF}/staging/datapoints.csv", STAGING_COLUMNS
    )
    assert df.count() == 46
    assert df.columns == list(STAGING_COLUMNS)


def test_csv_roundtrip_multiline_cells(spark, tmp_path):
    # S6/S7: a row with embedded newlines, quotes and JSON cells survives
    # write → read unchanged (the reference's CSV stress shape).
    from tbench_agentic_data_pipeline_spark.sources.readers import (
        write_datapoint_csv,
    )

    nasty = spark.createDataFrame(
        [
            (
                "t1",
                'line one\nline "quoted" two,\nwith, commas',
                "FROM python:3.11\nRUN echo hi\n",
                "def test_a():\n    assert 'x,y' == 'x,y'\n",
                '{"test_a": 1.0}',
                '{"a/b.txt": "content\\nmore"}',
                "easy",
                "2024-01-01T00:00:00+00:00",
                "2024-01-01T00:00:00+00:00",
            )
        ],
        "task_id string, prompt string, dockerfile string, "
        "test_functions string, test_weights string, additional_files string, "
        "difficulty string, created_at string, updated_at string",
    )
    path = str(tmp_path / "roundtrip")
    write_datapoint_csv(nasty, path)
    back = read_datapoint_csv(spark, path, STAGING_COLUMNS)
    assert back.count() == 1
    orig = nasty.select(*STAGING_COLUMNS).collect()[0]
    got = back.collect()[0]
    assert tuple(got) == tuple(orig)


def test_multi_file_task_ingest(spark, tmp_path):
    # S5 (init_seed_tasks.py:91-119): per task dir read task.yaml,
    # Dockerfile, tests → one record per task via groupBy + pivot.
    for task in ("task_a", "task_b"):
        d = tmp_path / task
        d.mkdir()
        (d / "task.yaml").write_text(f"instruction: do {task}\n")
        (d / "Dockerfile").write_text(f"FROM python:3.11\n# {task}\n")
    from tbench_agentic_data_pipeline_spark.sources.readers import read_file_tree

    tree = read_file_tree(spark, str(tmp_path), str(tmp_path))
    ingested = (
        tree.withColumn("task", F.split("path", "/")[0])
        .withColumn("fname", F.split("path", "/")[1])
        .groupBy("task")
        .pivot("fname", ["task.yaml", "Dockerfile"])
        .agg(F.first("content"))
        .orderBy("task")
    )
    rows = ingested.collect()
    assert [r["task"] for r in rows] == ["task_a", "task_b"]
    assert rows[0]["task.yaml"].startswith("instruction: do task_a")
    assert rows[1]["Dockerfile"].startswith("FROM python:3.11")


def test_snapshot_commit_read_history(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    v1 = t.commit(spark.createDataFrame([(1, "a")], "id int, s string"))
    v2 = t.commit(spark.createDataFrame([(2, "b")], "id int, s string"))
    assert (v1, v2) == (1, 2)
    assert t.current_version() == 2
    assert [tuple(r) for r in t.read().collect()] == [(2, "b")]
    # time travel: the previous version IS the backup (S8 semantics).
    assert [tuple(r) for r in t.read(version=1).collect()] == [(1, "a")]


def test_snapshot_append_unions_by_name(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "id int, s string"))
    t.append(spark.createDataFrame([(2,)], "id int"))
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(1, "a"), (2, None)]


def test_partitioned_snapshot_prunes(spark, tmp_path):
    # Stage-partitioned table version: a stage predicate becomes a
    # partition filter (directory pruning), not a data filter.
    from tbench_agentic_data_pipeline_spark.plans.explain import formatted_plan

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [("t1", "staging"), ("t2", "review"), ("t3", "production")],
        "task_id string, stage string",
    )
    t.commit(df, partition_by=["stage"])
    filtered = t.read().where(F.col("stage") == "review")
    assert [r["task_id"] for r in filtered.collect()] == ["t2"]
    plan = formatted_plan(filtered)
    assert "PartitionFilters" in plan and "stage" in plan.split("PartitionFilters", 1)[1][:200]


def test_move_rows_review_first_ordering(spark, tmp_path):
    # add_dp_to_review.py:255-264: add to destination, then delete from
    # source — crash between commits duplicates, never loses.
    staging = SnapshotTable(spark, str(tmp_path / "staging"))
    review = SnapshotTable(spark, str(tmp_path / "review"))
    staging.commit(
        spark.createDataFrame([("t1", "p1"), ("t2", "p2")], "task_id string, prompt string")
    )
    review.commit(spark.createDataFrame([], "task_id string, prompt string"))
    moving = staging.read().where(F.col("task_id") == "t1")
    move_rows(staging, review, moving, "task_id")
    assert [r["task_id"] for r in review.read().collect()] == ["t1"]
    assert [r["task_id"] for r in staging.read().collect()] == ["t2"]
    # history records both commits
    assert review.current_version() == 2 and staging.current_version() == 2


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    """JSONL corpus I/O: docs survive a partitioned gzip roundtrip
    byte-exactly, and corrupt lines land in quarantine instead of
    crashing the read or vanishing."""
    from pyspark.sql import types as T

    from tbench_agentic_data_pipeline_spark.catalog import load_table
    from tbench_agentic_data_pipeline_spark.sources.corpus_io import (
        read_jsonl,
        write_jsonl,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    )
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, out, partition_by=["lang"], compression="gzip")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good, quarantine = read_jsonl(spark, out, schema)
    assert quarantine.count() == 0
    got = {r["doc_id"]: (r["lang"], r["text"]) for r in good.collect()}
    want = {r["doc_id"]: (r["lang"], r["text"]) for r in docs.collect()}
    assert got == want

    # partition pruning surface: lang dirs exist
    import glob as _glob

    assert _glob.glob(f"{out}/lang=*")

    # corrupt shard: truncated JSON + schema-violating line both
    # quarantine; good lines on the same shard still parse
    bad_shard = tmp_path / "bad"
    bad_shard.mkdir()
    (bad_shard / "part-0.json").write_text(
        '{"doc_id": 1, "lang": "en", "text": "ok"}\n'
        '{"doc_id": 2, "lang": "en", "tex\n'
        '{"doc_id": "not-a-long", "lang": "en", "text": "bad type"}\n'
        '{"doc_id": 3, "lang": "fr", "text": "aussi ok"}\n'
    )
    good2, quarantine2 = read_jsonl(spark, str(bad_shard), schema)
    assert {r["doc_id"] for r in good2.collect()} == {1, 3}
    assert quarantine2.count() == 2


def test_jsonl_roundtrip_adversarial_strings(spark, tmp_path):
    """JSON escaping must carry corpus-hostile text — embedded newlines
    (one doc per LINE is the format's whole contract), quotes,
    backslashes, unicode, emoji — byte-exactly through a write/read."""
    from pyspark.sql import types as T

    from tbench_agentic_data_pipeline_spark.sources.corpus_io import (
        read_jsonl,
        write_jsonl,
    )

    nasty = [
        (1, 'line one\nline two\r\nline three'),
        (2, 'quote " backslash \\ slash / tab\t end'),
        (3, 'unicode: héllo wörld — ¿qué? 中文 русский'),
        (4, 'emoji: \U0001F600\U0001F680 combining: é'),
        (5, ''),
        (6, '{"looks": "like json"}'),
    ]
    df = spark.createDataFrame(nasty, "doc_id long, text string")
    out = str(tmp_path / "nasty_jsonl")
    write_jsonl(df, out, compression="none")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good, quarantine = read_jsonl(spark, out, schema)
    assert quarantine.count() == 0
    got = {r["doc_id"]: r["text"] for r in good.collect()}
    assert got == dict(nasty)


def test_snapshot_compact_rewrites_small_files(spark, tmp_path):
    """Compaction: a version fragmented across many files collapses to
    few right-sized files as a NEW version — rows identical, previous
    fragmented version still addressable (compaction is a commit, not a
    rewrite in place)."""
    import glob

    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "ct"))
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    v1 = t.commit(df.repartition(64))  # 64 tiny files
    files_before = glob.glob(str(tmp_path / "ct" / "v=1" / "*.parquet"))
    assert len(files_before) >= 32
    v2 = t.compact()
    assert v2 == v1 + 1
    files_after = glob.glob(str(tmp_path / "ct" / f"v={v2}" / "*.parquet"))
    assert len(files_after) < len(files_before)
    assert t.history()[-1]["operation"] == "compact"
    # row-for-row identical, and time travel to the fragmented version works
    assert t.read().exceptAll(t.read(version=v1)).count() == 0
    assert t.read(version=v1).exceptAll(t.read()).count() == 0
    assert t.read(version=v1).count() == 10_000


def test_snapshot_compact_preserves_hive_partitioning(spark, tmp_path):
    import glob

    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "cp"))
    df = spark.range(3_000).select(
        F.col("id"), (F.col("id") % 3).alias("stage")
    )
    t.commit(df.repartition(16), partition_by=["stage"])
    v2 = t.compact()
    # layout preserved: stage=* dirs exist, one file per partition
    for s in (0, 1, 2):
        files = glob.glob(
            str(tmp_path / "cp" / f"v={v2}" / f"stage={s}" / "*.parquet")
        )
        assert len(files) == 1, (s, files)
    assert t.read().count() == 3_000
    # partition pruning still applies after compaction
    assert t.read().where(F.col("stage") == 1).count() == 1_000


def test_snapshot_vacuum_drops_old_versions_keeps_current(spark, tmp_path):
    import os

    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "vt"))
    for i in range(4):
        t.commit(spark.range(10 + i))
    dropped = t.vacuum(keep_last=2)
    assert dropped == [1, 2]
    assert t.versions() == [3, 4]
    assert not os.path.isdir(str(tmp_path / "vt" / "v=1"))
    assert t.read().count() == 13  # current untouched
    assert t.read(version=3).count() == 12  # kept version readable
    import pytest

    with pytest.raises(ValueError):
        t.vacuum(keep_last=0)


def test_append_delta_chain_reads_and_compacts(spark, tmp_path):
    """O(batch) appends: each append_delta writes ONLY its rows; read()
    resolves the base+delta chain (including schema-evolved deltas);
    time travel addresses every link; compact() collapses the chain to
    one full commit with identical rows."""
    import glob

    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "dt"))
    t.commit(spark.range(100).select(F.col("id"), F.lit("base").alias("src")))
    t.append_delta(
        spark.range(100, 130).select(F.col("id"), F.lit("b1").alias("src"))
    )
    v3 = t.append_delta(
        spark.range(130, 140).select(
            F.col("id"), F.lit("b2").alias("src"), F.lit(1).alias("extra")
        )
    )
    assert v3 == 3
    # delta dirs hold only their own rows
    d2 = spark.read.parquet(str(tmp_path / "dt" / "v=2"))
    assert d2.count() == 30
    # the chain resolves, with the evolved column null for older links
    cur = t.read()
    assert cur.count() == 140
    assert cur.where(F.col("extra").isNull()).count() == 130
    # time travel: v2 = base + first delta
    assert t.read(version=2).count() == 130
    assert t.read(version=1).count() == 100

    v4 = t.compact()
    files = glob.glob(str(tmp_path / "dt" / f"v={v4}" / "*.parquet"))
    assert files  # one full commit
    assert t.read().count() == 140
    assert t.read().exceptAll(t.read(version=v3)).count() == 0
    assert t.read(version=v3).exceptAll(t.read()).count() == 0


def test_vacuum_never_orphans_a_delta_chain(spark, tmp_path):
    """vacuum(keep_last=1) while current is a DELTA must keep its base
    (dropping it would leave the current version unreadable); after
    compact() the chain becomes reclaimable."""
    import os

    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "vd"))
    t.commit(spark.range(50))
    t.append_delta(spark.range(50, 60))
    dropped = t.vacuum(keep_last=1)
    assert dropped == []  # v1 is v2's parent: protected
    assert t.read().count() == 60
    t.compact()  # v3 = full
    dropped = t.vacuum(keep_last=1)
    assert dropped == [1, 2]
    assert not os.path.isdir(str(tmp_path / "vd" / "v=1"))
    assert t.read().count() == 60


def test_compact_recovers_layout_from_legacy_history(spark, tmp_path):
    """History records written before partition_by was recorded must not
    silently flatten a partitioned table on compact: the layout is
    recovered from the version directory's hive structure."""
    import glob
    import json

    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "legacy"))
    t.commit(
        spark.range(900).select(F.col("id"), (F.col("id") % 3).alias("stage")),
        partition_by=["stage"],
    )
    # simulate a pre-round-5 manifest: strip the partition_by key
    mpath = tmp_path / "legacy" / "manifest.json"
    m = json.loads(mpath.read_text())
    for h in m["history"]:
        h.pop("partition_by", None)
    mpath.write_text(json.dumps(m))

    v2 = t.compact()
    dirs = glob.glob(str(tmp_path / "legacy" / f"v={v2}" / "stage=*"))
    assert len(dirs) == 3, dirs
    assert t.read().where(F.col("stage") == 2).count() == 300


def test_merge_on_read_upserts_over_delta_chain(spark, tmp_path):
    """append_delta + read_merged = O(batch) upserts: the latest commit
    containing a key wins, schema evolution composes, and
    compact(merge_key=...) reclaims superseded rows in the rewrite."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "mor"))
    t.commit(
        spark.createDataFrame(
            [("t1", "pending"), ("t2", "pending"), ("t3", "pending")],
            "task_id string, status string",
        )
    )
    t.append_delta(
        spark.createDataFrame(
            [("t1", "claimed"), ("t4", "pending")], "task_id string, status string"
        )
    )
    t.append_delta(
        spark.createDataFrame(
            [("t1", "completed", "w7")],
            "task_id string, status string, owner string",
        )
    )
    got = {
        r["task_id"]: (r["status"], r["owner"])
        for r in t.read_merged("task_id").collect()
    }
    assert got == {
        "t1": ("completed", "w7"),
        "t2": ("pending", None),
        "t3": ("pending", None),
        "t4": ("pending", None),
    }
    # raw read still shows the full chain (6 physical rows)
    assert t.read().count() == 6
    # merged compaction freezes the RESOLVED state and drops supersedes
    v = t.compact(merge_key="task_id")
    assert t.read(version=v).count() == 4
    assert {
        r["task_id"]: r["status"] for r in t.read_merged("task_id").collect()
    } == {"t1": "completed", "t2": "pending", "t3": "pending", "t4": "pending"}


def test_read_merged_ties_within_one_commit_are_deterministic(spark, tmp_path):
    """r5 advisor: duplicate keys landing in the SAME commit have no
    commit-order to rank by; read_merged must still pick the same winner
    every time (stable full-row-hash tiebreak), not whichever row
    row_number met first."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "ties"))
    dup = spark.createDataFrame(
        [("k1", "a"), ("k1", "b"), ("k1", "c"), ("k2", "x"), ("k2", "y")],
        "k string, v string",
    )
    t.commit(dup.repartition(4))
    first = {r["k"]: r["v"] for r in t.read_merged("k").collect()}
    for _ in range(3):
        again = {r["k"]: r["v"] for r in t.read_merged("k").collect()}
        assert again == first
    # the same duplicates arriving via append_delta resolve identically
    t2 = SnapshotTable(spark, str(tmp_path / "ties2"))
    t2.commit(spark.createDataFrame([("k0", "z")], "k string, v string"))
    t2.append_delta(dup.repartition(4))
    merged = {r["k"]: r["v"] for r in t2.read_merged("k").collect()}
    assert merged["k1"] == first["k1"] and merged["k2"] == first["k2"]


def test_cow_append_preserves_delta_chain_provenance(spark, tmp_path):
    """r5 advisor: COW append() on a table with a delta chain used to
    flatten the chain through read(), dropping __commit_v — after which
    read_merged resolved previously-ordered duplicates arbitrarily. The
    append must keep provenance: earlier upserts stay ordered, and the
    appended rows rank newest."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "cowprov"))
    t.commit(
        spark.createDataFrame(
            [("t1", "pending"), ("t2", "pending")], "task_id string, status string"
        )
    )
    t.append_delta(
        spark.createDataFrame([("t1", "claimed")], "task_id string, status string")
    )
    # COW append of a fresh row on top of the chain
    t.append(
        spark.createDataFrame([("t3", "pending")], "task_id string, status string")
    )
    got = {r["task_id"]: r["status"] for r in t.read_merged("task_id").collect()}
    assert got == {"t1": "claimed", "t2": "pending", "t3": "pending"}
    # appended rows are the NEWEST commit: re-upserting t1 via append wins
    t.append(
        spark.createDataFrame([("t1", "completed")], "task_id string, status string")
    )
    got = {r["task_id"]: r["status"] for r in t.read_merged("task_id").collect()}
    assert got["t1"] == "completed"
    # public read() still never exposes the internal column
    assert "__commit_v" not in t.read().columns


def test_cow_append_on_plain_commit_gets_latest_wins(spark, tmp_path):
    """r6 advisor (medium): append() on a plain single-commit table (no
    chain, no persisted __commit_v) used to flatten old and new rows
    into one commit with no provenance, so read_merged broke duplicate
    keys by row hash instead of recency. Appended rows must win."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "cowplain"))
    t.commit(
        spark.createDataFrame(
            [("t1", "pending"), ("t2", "pending")], "task_id string, status string"
        )
    )
    # duplicate key straight on top of a plain commit — recency, not hash,
    # must decide, for every possible hash ordering of the two rows
    t.append(
        spark.createDataFrame([("t1", "claimed")], "task_id string, status string")
    )
    got = {r["task_id"]: r["status"] for r in t.read_merged("task_id").collect()}
    assert got == {"t1": "claimed", "t2": "pending"}
    t.append(
        spark.createDataFrame([("t1", "completed")], "task_id string, status string")
    )
    got = {r["task_id"]: r["status"] for r in t.read_merged("task_id").collect()}
    assert got["t1"] == "completed"
    assert "__commit_v" not in t.read().columns


def test_read_merged_tolerates_map_columns(spark, tmp_path):
    """r6 advisor: the deterministic tie-break hashes the data columns
    with xxhash64, which rejects MapType — read_merged on a table
    carrying a map column (the reference's metadata dicts are maps here)
    must not raise, and commit recency must still order distinct
    commits."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "mapcol"))
    schema = "task_id string, status string, meta map<string,string>"
    t.commit(
        spark.createDataFrame(
            [("t1", "pending", {"a": "1"}), ("t2", "pending", {})], schema
        )
    )
    t.append_delta(
        spark.createDataFrame([("t1", "claimed", {"a": "2"})], schema)
    )
    got = {r["task_id"]: (r["status"], dict(r["meta"])) for r in
           t.read_merged("task_id").collect()}
    assert got == {"t1": ("claimed", {"a": "2"}), "t2": ("pending", {})}
    # within-commit duplicates on an all-map payload: no hashable
    # tie-break columns besides the key — must still resolve, stably
    t2 = SnapshotTable(spark, str(tmp_path / "maponly"))
    t2.commit(
        spark.createDataFrame(
            [("k1", {"v": "a"}), ("k1", {"v": "b"})], "k string, m map<string,string>"
        )
    )
    rows = t2.read_merged("k").collect()
    assert len(rows) == 1


def test_snapshot_delta_model_based_random_ops(spark, tmp_path):
    """Model-based check of the versioned-table state machine: replay 12
    seeded-random operation sequences (full commit / delta append /
    upsert-batch / compact / merged compact / vacuum) against a plain
    Python dict model; after every operation read_merged must equal the
    model exactly, and raw read row counts must match the model's
    physical-rows ledger. Catches chain-resolution, vacuum-protection
    and merge-ordering bugs that single-scenario tests can miss."""
    import random

    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    rng = random.Random(42)
    for seq in range(12):
        t = SnapshotTable(spark, str(tmp_path / f"m{seq}"))
        model: dict[str, int] = {}
        physical_rows = 0
        key_pool = [f"k{i}" for i in range(8)]

        def batch():
            ks = rng.sample(key_pool, rng.randint(1, 4))
            return {k: rng.randint(0, 99) for k in ks}

        def to_df(d):
            return spark.createDataFrame(
                sorted(d.items()), "task_id string, val int"
            )

        first = batch()
        t.commit(to_df(first))
        model = dict(first)
        physical_rows = len(first)

        for _ in range(rng.randint(3, 7)):
            op = rng.choice(["delta", "delta", "compact", "merged", "vacuum"])
            if op == "delta":
                b = batch()
                t.append_delta(to_df(b))
                model.update(b)
                physical_rows += len(b)
            elif op == "compact":
                t.compact()  # raw: freezes duplicates, row count unchanged
            elif op == "merged":
                t.compact(merge_key="task_id")
                physical_rows = len(model)
            else:
                t.vacuum(keep_last=1)

            got = {
                r["task_id"]: r["val"]
                for r in t.read_merged("task_id").collect()
            }
            assert got == model, (seq, op, got, model)
            assert t.read().count() == physical_rows, (seq, op)
            # the internal provenance column must never leak into the
            # public read surfaces, even after raw compaction persists it
            assert "__commit_v" not in t.read().columns, (seq, op)
            assert "__commit_v" not in t.read_merged("task_id").columns


def test_append_delta_custom_operation_stamp(spark, tmp_path):
    """r15: append_delta grew an ``operation`` parameter so streaming
    drains can use the snapshot history as their applied-transaction
    log. The custom stamp must appear verbatim in history() for both
    the empty-table path (delegates to commit) and the chained-delta
    path, and the default stamp must stay byte-compatible with prior
    rounds ('append_delta')."""
    from tbench_agentic_data_pipeline_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "opstamp"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t.append_delta(df, operation="drain_batch_0")  # empty-table path
    t.append_delta(df.selectExpr("k + 1 as k", "v"), operation="drain_batch_1")
    t.append_delta(df.selectExpr("k + 2 as k", "v"))  # default stamp
    assert [h["operation"] for h in t.history()] == [
        "drain_batch_0", "drain_batch_1", "append_delta",
    ]
    assert t.read().count() == 3


def test_drain_lineage_tag_is_stable_and_path_distinct():
    """The drain's operation namespace: same checkpoint path → same tag
    (same-lineage replays must collide and be skipped); different path →
    different tag (a fresh checkpoint's batch 0 must not be mistaken for
    a dead lineage's batch 0 — the r15 self-review data-loss shape)."""
    from tbench_agentic_data_pipeline_spark.streaming.stateful import (
        _drain_lineage_tag,
    )

    a1 = _drain_lineage_tag("/tmp/ckpt-a")
    a2 = _drain_lineage_tag("/tmp/ckpt-a")
    b = _drain_lineage_tag("/tmp/ckpt-b")
    assert a1 == a2 and a1 != b
    assert len(a1) == 8 and all(c in "0123456789abcdef" for c in a1)


def test_snapshot_stored_schema_matches_inference(spark, tmp_path):
    """r15 opt: unpartitioned commits record the written schema in the
    manifest so chain readers skip footer inference. The stored schema
    must be indistinguishable from inference — i.e. the written schema
    with every nullability flag (incl. nested) forced true."""
    t = SnapshotTable(spark, str(tmp_path / "sch"))
    df = spark.createDataFrame(
        [(1, ("a", [1, 2]), {"k": 1.5})],
        "id int, s struct<x:string, ys:array<int>>, m map<string,double>",
    )
    v = t.commit(df)
    manifest = t._read_manifest()
    stored = t._stored_schema(manifest, v)
    inferred = spark.read.parquet(
        os.path.join(str(tmp_path / "sch"), f"v={v}")
    ).schema
    assert stored == inferred
    # and the read path actually uses it without changing results
    assert t.read().schema == inferred
    assert [tuple(r) for r in t.read().collect()] == [
        (1, ("a", [1, 2]), {"k": 1.5})
    ]


def test_snapshot_stored_schema_partitioned_reconstructs(spark, tmp_path):
    """r16 opt (the r15 gap): partitioned versions reconstruct the
    inference-shaped read schema from the stored one — data fields in
    written order, partition fields appended in partition_by order —
    so partitioned chain reads skip footer inference too. For the
    string-valued partition columns the engine writes, the
    reconstruction must be byte-identical to discovery-time
    inference."""
    t = SnapshotTable(spark, str(tmp_path / "part"))
    # partition col deliberately NOT last in the written order: the
    # reconstruction must move it to the end, where discovery puts it
    df = spark.createDataFrame(
        [("staging", 1, "a"), ("review", 2, "b")],
        "stage string, id int, payload string",
    )
    v = t.commit(df, partition_by=["stage"])
    stored = t._stored_schema(t._read_manifest(), v)
    inferred = spark.read.parquet(
        os.path.join(str(tmp_path / "part"), f"v={v}")
    ).schema
    assert stored == inferred
    assert t.read().schema == inferred
    assert sorted(tuple(r) for r in t.read().collect()) == [
        (1, "a", "staging"),
        (2, "b", "review"),
    ]


def test_snapshot_stored_schema_partitioned_type_fidelity(spark, tmp_path):
    """Partition-column TYPES come from the stored schema (the log is
    the source of truth, Delta's rule): a LONG partition column whose
    directory values happen to fit int round-trips as long, where
    per-directory value inference would narrow it to int."""
    from pyspark.sql import types as T

    t = SnapshotTable(spark, str(tmp_path / "partlong"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "bucket long, s string")
    t.commit(df, partition_by=["bucket"])
    out = t.read()
    assert out.schema["bucket"].dataType == T.LongType()
    assert sorted(tuple(r) for r in out.collect()) == [("a", 1), ("b", 2)]


def test_snapshot_stored_schema_partitioned_malformed_falls_back(spark, tmp_path):
    """A manifest whose stored schema is missing a partition column
    (hand-edited / foreign writer) must stand down to inference, not
    produce a wrong read schema."""
    import json as _json

    t = SnapshotTable(spark, str(tmp_path / "partbad"))
    v = t.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, stage string"),
        partition_by=["stage"],
    )
    mp = t._manifest_path
    m = _json.load(open(mp))
    for h in m["history"]:
        sch = _json.loads(h["schema"])
        sch["fields"] = [f for f in sch["fields"] if f["name"] != "stage"]
        h["schema"] = _json.dumps(sch)
    with open(mp, "w") as f:
        _json.dump(m, f)
    assert t._stored_schema(t._read_manifest(), v) is None
    assert sorted(tuple(r) for r in t.read().collect()) == [(1, "a"), (2, "b")]


def test_snapshot_legacy_manifest_without_schema_falls_back(spark, tmp_path):
    """Manifests written before the schema field (pre-r15-opt) must keep
    reading via inference — including delta chains and cow appends."""
    import json as _json

    t = SnapshotTable(spark, str(tmp_path / "legacy"))
    t.commit(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.append_delta(spark.createDataFrame([(2, "b")], "id long, s string"))
    # strip the stored schemas, simulating a pre-upgrade manifest
    mp = t._manifest_path
    m = _json.load(open(mp))
    for h in m["history"]:
        h.pop("schema", None)
    with open(mp, "w") as f:
        _json.dump(m, f)
    assert t._stored_schema(t._read_manifest(), 1) is None
    assert sorted(tuple(r) for r in t.read().collect()) == [(1, "a"), (2, "b")]
    # cow append over the legacy chain (exercises the base_cols fallback)
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    assert t.read().count() == 3
