"""Snapshot-versioned tables: atomic commits, history, audit
(SURVEY.md §2.1 S6-S11, §4.2).

The reference's durability story is temp-file + ``os.replace`` per whole
CSV (``patch_dp.py:157-172``) and timestamped backup copies before
mutation (``approve_datapoint.py:56-63``). The engine generalizes both:
every write lands in a fresh ``v=<n>`` directory and a tiny manifest file
flips to name the current version — readers never see partial writes,
every prior version remains addressable (time travel), and a "backup" is
just the previous version. The manifest flip is the only non-Spark I/O and
is a single small-file write (rename-atomic on posix; conditional-put on
object stores).

This is deliberately plain-Spark (no Delta/Iceberg dependency): the point
is the commit *protocol*, which those formats industrialize.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..registry import query


@dataclass
class SnapshotTable:
    """A table whose versions are parquet dirs under ``root`` with a
    ``manifest.json`` naming the current one."""

    spark: SparkSession
    root: str

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": None, "versions": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _flip_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path)  # atomic on posix

    # -- public API --------------------------------------------------------
    def current_version(self) -> int | None:
        return self._read_manifest()["current"]

    def versions(self) -> list[int]:
        return list(self._read_manifest()["versions"])

    def history(self) -> list[dict]:
        """Commit log: one record per version ({version, operation, ts}).
        Transactional consumers (the incremental rollup drain) use the
        operation names as an applied-transaction set for replay
        idempotence — the same role Delta's txn table plays."""
        return list(self._read_manifest().get("history", []))

    def commit(
        self,
        df: DataFrame,
        operation: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> int:
        """S7/S8: write ``df`` as the next version and flip the manifest.
        The previous version IS the backup (``backup_file`` semantics,
        ``approve_datapoint.py:56-63``) — no copy step.

        ``partition_by`` lays the version out hive-partitioned (e.g. by
        stage or date): reads with a partition predicate prune whole
        directories (``PartitionFilters`` in the scan), and a mutation
        touching one partition can rewrite just that slice."""
        manifest = self._read_manifest()
        next_v = (manifest["current"] or 0) + 1 if manifest["current"] else 1
        path = os.path.join(self.root, f"v={next_v}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        manifest["versions"].append(next_v)
        manifest["current"] = next_v
        manifest.setdefault("history", []).append(
            {
                "version": next_v,
                "operation": operation,
                "ts": time.time(),
                # recorded so maintenance ops (compact) can preserve the
                # layout without the caller restating it
                "partition_by": list(partition_by or []),
                # the written schema (Delta-log style): readers supply
                # it instead of re-running footer inference — one Spark
                # job (~0.1 s even warm) saved per chain member per
                # read (r15 optimization round; partitioned versions
                # reconstruct the inference-shaped schema from it since
                # r16 — see _stored_schema).
                "schema": df.schema.json(),
            }
        )
        self._flip_manifest(manifest)
        return next_v

    def _stored_schema(self, manifest: dict, v: int):
        """The read schema for version ``v`` from its commit record, or
        None when unavailable (pre-schema manifests) — the caller then
        falls back to footer inference. Parquet inference on
        Spark-written files returns the written schema with every
        nullability flag forced true (file sources are always
        nullable-read), so the stored schema is normalized the same way
        — the resulting DataFrame is indistinguishable from the
        inferred one.

        PARTITIONED versions (r16 optimization round, the r15 gap): the
        partition columns live in directory names, not data files, so
        the written schema is not the FILE schema — but discovery-time
        inference always appends the partition columns AFTER the data
        columns, in ``partition_by`` (= directory nesting) order, so
        the inference-shaped schema is reconstructed here from the
        stored one: data fields in written order, then partition fields
        in ``partition_by`` order. Partition-column TYPES come from the
        stored schema (the transaction log is the source of truth,
        exactly Delta's rule): for the string-valued partition columns
        the engine writes this is byte-identical to value inference,
        and for numeric ones it round-trips the WRITTEN type where
        per-directory value inference could narrow it (e.g. a long
        column whose values happen to fit int). One footer-inference
        Spark job saved per chain member per partitioned read."""
        rec = next(
            (
                h
                for h in manifest.get("history", [])
                if h["version"] == v
            ),
            None,
        )
        if not rec or not rec.get("schema"):
            return None
        d = json.loads(rec["schema"])
        part_by = rec.get("partition_by") or []
        if part_by:
            fields = d.get("fields", [])
            names = {f.get("name") for f in fields}
            if not all(p in names for p in part_by):
                return None  # malformed record: stand down to inference
            d["fields"] = [
                f for f in fields if f.get("name") not in part_by
            ] + [
                next(f for f in fields if f.get("name") == p)
                for p in part_by
            ]

        def _force_nullable(x):
            if isinstance(x, dict):
                for k in ("nullable", "containsNull", "valueContainsNull"):
                    if k in x:
                        x[k] = True
                for val in x.values():
                    _force_nullable(val)
            elif isinstance(x, list):
                for val in x:
                    _force_nullable(val)

        _force_nullable(d)
        from pyspark.sql import types as T

        return T.StructType.fromJson(d)

    def _parents(self, manifest: dict) -> dict:
        """version → parent version (None for full commits). History
        records written before delta support lack the key — `.get`
        treats them as full commits, so old tables read unchanged."""
        return {
            h["version"]: h.get("parent")
            for h in manifest.get("history", [])
        }

    def _chain(self, manifest: dict, v: int) -> list[int]:
        """The versions whose directories compose version ``v``: ``v``
        itself plus transitive delta parents down to the nearest full
        commit, oldest first."""
        parents = self._parents(manifest)
        chain = [v]
        while parents.get(chain[-1]) is not None:
            chain.append(parents[chain[-1]])
        return list(reversed(chain))

    def _read_with_provenance(self, manifest: dict, v: int) -> DataFrame:
        """Chain union carrying ``__commit_v`` — the commit each row
        arrived in. A raw ``compact()`` persists this column into the
        full commit (coalesced here so persisted provenance survives
        flattening), which is what keeps ``read_merged`` correct after
        compaction: without it, collapsing a chain would erase the
        ordering latest-wins depends on (caught by the model-based
        random-ops test)."""
        from pyspark.sql import functions as F

        parts = []
        for c in self._chain(manifest, v):
            path = os.path.join(self.root, f"v={c}")
            stored = self._stored_schema(manifest, c)
            reader = (
                self.spark.read.schema(stored) if stored else self.spark.read
            )
            df = reader.parquet(path)
            if "__commit_v" in df.columns:
                df = df.withColumn(
                    "__commit_v", F.coalesce(F.col("__commit_v"), F.lit(c))
                )
            else:
                df = df.withColumn("__commit_v", F.lit(c))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def read(self, version: int | None = None) -> DataFrame:
        """Read the current (or a pinned historical) version. A delta
        version (``append_delta``) resolves to the union of its chain —
        base full commit plus every delta up to ``version`` — with
        by-name unions, so later deltas may add columns. The internal
        provenance column is never exposed."""
        manifest = self._read_manifest()
        v = version if version is not None else manifest["current"]
        if v is None:
            raise FileNotFoundError(f"snapshot table {self.root} has no versions")
        return self._read_with_provenance(manifest, v).drop("__commit_v")

    def compact(
        self, target_file_bytes: int = 128 << 20, merge_key: str | None = None
    ) -> int:
        """Small-file compaction: rewrite the current version into
        ⌈bytes/target⌉ right-sized files and commit the result as a new
        version. Data-identical by construction (pinned row-for-row in
        tests); the previous, fragmented version remains addressable —
        compaction is just another commit, so time travel and rollback
        survive it.

        This is the maintenance half of the copy-on-write story: every
        ``append`` writes task-count-many files, and at 100 TB the
        accumulated small files dominate scan cost (per-file open +
        footer read beats row IO long before data volume does) and melt
        file listings. Run compact on a cadence, exactly as Delta's
        OPTIMIZE / Iceberg's rewrite_data_files industrialize.

        Partitioned versions (``commit(partition_by=...)``) keep their
        hive layout — rows repartition ON the partition columns so each
        partition directory collapses to one file (the classic
        per-partition compaction); unpartitioned versions repartition to
        the byte-derived file count."""
        import math

        manifest = self._read_manifest()
        cur = manifest["current"]
        if cur is None:
            raise FileNotFoundError(f"snapshot table {self.root} has no versions")
        chain = self._chain(manifest, cur)
        total = 0
        for v in chain:
            for dirpath, _dirs, files in os.walk(
                os.path.join(self.root, f"v={v}")
            ):
                total += sum(
                    os.path.getsize(os.path.join(dirpath, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        # the layout to preserve is the chain BASE's (delta appends are
        # written unpartitioned; compacting a chain restores the base's
        # hive layout over the merged rows)
        part_by = next(
            (
                h.get("partition_by")
                for h in reversed(manifest.get("history", []))
                if h["version"] == chain[0] and h.get("partition_by")
            ),
            None,
        )
        if part_by is None:
            # history written before partition_by was recorded: recover
            # the layout from the directory itself (hive dirs are
            # key=value; nested levels are nested partition columns) so
            # upgrading never silently flattens an old partitioned table
            part_by = []
            probe = os.path.join(self.root, f"v={chain[0]}")
            while True:
                subs = [
                    d for d in sorted(os.listdir(probe))
                    if "=" in d and os.path.isdir(os.path.join(probe, d))
                ]
                if not subs:
                    break
                part_by.append(subs[0].split("=", 1)[0])
                probe = os.path.join(probe, subs[0])
        # merge_key: compacting an upsert-style table resolves
        # latest-wins BEFORE the rewrite, so superseded rows are
        # reclaimed instead of frozen into the new full commit. A RAW
        # compact keeps the provenance column so read_merged stays
        # correct over the flattened commit (duplicate keys would
        # otherwise all share one commit version and resolve
        # arbitrarily).
        if merge_key:
            df = self.read_merged(merge_key)
        elif len(chain) > 1:
            df = self._read_with_provenance(manifest, cur)
        else:
            df = self.read()
        if part_by:
            df = df.repartition(*part_by)
            return self.commit(df, operation="compact", partition_by=part_by)
        n_files = max(1, math.ceil(total / target_file_bytes))
        # coalesce, not repartition (r16 optimization round, guide §2.4
        # "remove shuffles outright"): file-sizing needs row COUNTS per
        # output file, not any particular co-location, so the rewrite
        # never needs an exchange — Delta's OPTIMIZE bin-packs without
        # shuffling for the same reason. At scale the byte-derived
        # n_files tracks the scan's own split count (both ~bytes/128 MB
        # at the defaults), so the narrow coalesce preserves rewrite
        # parallelism; at fixture scale it merges the chain in the same
        # single job that writes it. The partitioned branch above keeps
        # its repartition — hive layout genuinely requires clustering
        # rows BY the partition columns.
        return self.commit(df.coalesce(n_files), operation="compact")

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Storage reclamation: drop all but the newest ``keep_last``
        version directories (never the current one). The manifest flips
        BEFORE any directory is removed, so a reader that raced the
        vacuum can at worst see a version disappear from `versions()` —
        never a half-deleted directory named as current. Returns the
        versions removed."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        manifest = self._read_manifest()
        keep = set(manifest["versions"][-keep_last:]) | {manifest["current"]}
        # a kept delta version is unreadable without its chain: keep the
        # transitive parents of everything kept (compact() first if you
        # want the chain reclaimed)
        for v in list(keep):
            keep.update(self._chain(manifest, v))
        drop = [v for v in manifest["versions"] if v not in keep]
        manifest["versions"] = [v for v in manifest["versions"] if v in keep]
        self._flip_manifest(manifest)
        for v in drop:
            shutil.rmtree(os.path.join(self.root, f"v={v}"), ignore_errors=True)
        return drop

    def append(self, rows: DataFrame) -> int:
        """S6: append = current ∪ rows committed as a new version (the
        engine keeps append copy-on-write so readers get isolation; at
        scale :meth:`append_delta` is the right sink and this COW form
        remains for small control tables).

        If the current version is a delta chain (or a raw-compacted
        commit carrying persisted ``__commit_v``), the union keeps that
        provenance instead of flattening it away through :meth:`read` —
        otherwise a later :meth:`read_merged` would resolve previously
        ordered duplicate keys arbitrarily. New rows are tagged with a
        null ``__commit_v``, which readers coalesce to the append
        commit's own version (newer than every prior commit, as append
        semantics require)."""
        from pyspark.sql import functions as F

        manifest = self._read_manifest()
        cur = manifest["current"]
        if cur is None:
            return self.commit(rows, operation="append")
        chain = self._chain(manifest, cur)
        stored_base = self._stored_schema(manifest, chain[0])
        base_cols = (
            stored_base.names
            if stored_base
            else self.spark.read.parquet(
                os.path.join(self.root, f"v={chain[0]}")
            ).columns
        )
        if len(chain) > 1 or "__commit_v" in base_cols:
            existing = self._read_with_provenance(manifest, cur)
        else:
            # Plain single-commit table: tag existing rows with their
            # originating commit too, or the flattened append would
            # leave a later read_merged ranking base-vs-appended
            # duplicate keys by row hash instead of recency.
            existing = self.read().withColumn(
                "__commit_v", F.lit(cur).cast("long")
            )
        merged = existing.unionByName(
            rows.withColumn("__commit_v", F.lit(None).cast("long")),
            allowMissingColumns=True,
        )
        return self.commit(merged, operation="append")

    def append_delta(
        self, rows: DataFrame, operation: str = "append_delta"
    ) -> int:
        """O(|batch|) append: write ONLY the new rows as a delta version
        chained to the current one — the Delta-log mechanic that makes
        appends affordable at 100 TB (COW ``append`` rewrites the whole
        table per batch). Readers of the new version union the chain
        (base full commit + deltas); isolation and time travel are
        unchanged because the manifest still flips atomically and every
        prior version keeps meaning. Long chains tax readers with
        per-delta file listings — ``compact()`` collapses the chain back
        to one full commit on a cadence, after which ``vacuum()`` can
        reclaim it (``vacuum`` never drops a kept delta's parents).
        ``operation`` customizes the history stamp so streaming drains
        can use the commit log as their applied-transaction guard (the
        ``incremental_rollup_drain`` pattern — a replayed micro-batch id
        consults ``history()`` and skips)."""
        manifest = self._read_manifest()
        cur = manifest["current"]
        if cur is None:
            return self.commit(rows, operation=operation)
        next_v = cur + 1
        rows.write.mode("overwrite").parquet(
            os.path.join(self.root, f"v={next_v}")
        )
        manifest["versions"].append(next_v)
        manifest["current"] = next_v
        manifest.setdefault("history", []).append(
            {
                "version": next_v,
                "operation": operation,
                "ts": time.time(),
                "partition_by": [],
                "parent": cur,
                # see commit(): lets chain readers skip footer inference
                "schema": rows.schema.json(),
            }
        )
        self._flip_manifest(manifest)
        return next_v

    def read_merged(self, key_col: str, version: int | None = None) -> DataFrame:
        """Merge-on-read over the delta chain: latest-wins per
        ``key_col``, where 'latest' is the highest ORIGINATING commit of
        the key's rows — provenance that survives raw ``compact()``
        because flattening persists the ``__commit_v`` column. This
        turns :meth:`append_delta` into an O(|batch|) UPSERT: write only
        the changed rows, resolve at read time — Delta/Iceberg
        merge-on-read, minus deletes (a tombstone row with a status
        column is the idiomatic delete here, exactly how the reference's
        store marks cancelled tasks rather than erasing them). Compact
        an upsert table with ``compact(merge_key=...)`` when superseded
        rows should be physically reclaimed.

        Duplicate keys WITHIN one commit (a caller committing a frame
        that itself contains duplicates) have no commit-order to rank by;
        a stable full-row hash breaks the tie so the winner is
        deterministic across runs and engines, rather than whichever row
        ``row_number`` happened to meet first."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        manifest = self._read_manifest()
        v = version if version is not None else manifest["current"]
        if v is None:
            raise FileNotFoundError(f"snapshot table {self.root} has no versions")
        out = self._read_with_provenance(manifest, v)

        def _hashable(dt: T.DataType) -> bool:
            # xxhash64 rejects MapType anywhere in the type tree
            # (AnalysisException); maps sit out of the tie-break rather
            # than crash tables that carry them.
            if isinstance(dt, T.MapType):
                return False
            if isinstance(dt, T.ArrayType):
                return _hashable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(_hashable(f.dataType) for f in dt.fields)
            return True

        tie_cols = [
            f.name
            for f in out.schema.fields
            if f.name != "__commit_v" and _hashable(f.dataType)
        ]
        order = [F.desc("__commit_v")]
        if tie_cols:
            order.append(F.desc(F.xxhash64(*tie_cols)))
        w = Window.partitionBy(key_col).orderBy(*order)
        return (
            out.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .drop("__rk", "__commit_v")
        )


@query(
    "snap_merge_on_read",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price, 1 AS v
  FROM orders
), d1 AS (
  SELECT o_orderkey, 'X' AS status, o_totalprice + 10 AS price, 2 AS v
  FROM orders WHERE o_orderkey % 10 = 0
), d2 AS (
  SELECT o_orderkey, 'Z' AS status, o_totalprice * 2 AS price, 3 AS v
  FROM orders WHERE o_orderkey % 20 = 0
), merged AS (
  SELECT o_orderkey, status, price FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rk
    FROM (
      SELECT * FROM base
      UNION ALL SELECT * FROM d1
      UNION ALL SELECT * FROM d2
    )
  ) WHERE rk = 1
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(price), 2) AS total_price
FROM merged GROUP BY status ORDER BY status
""",
    survey="S6,S7,S8",
)
def snap_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read upsert end-to-end through the production snapshot
    layer (reference durability protocol: ``patch_dp.py:157-172`` atomic
    replace, ``approve_datapoint.py:56-63`` versioned backups —
    generalized to O(|batch|) delta appends): commit ``orders`` as the
    base version, ``append_delta`` two keyed patch batches (only the
    changed rows are written), raw-``compact`` the chain (provenance must
    survive flattening), then ``read_merged`` resolves latest-wins per
    key and aggregates by final status. The oracle replays the same
    base∪delta ranking in SQL. Scale shape: each delta write is
    O(|batch|), the merge is one window over the chain union — never a
    whole-table rewrite per batch."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    d1 = orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("status"),
        (F.col("o_totalprice") + 10).alias("price"),
    )
    d2 = orders.where(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.lit("Z").alias("status"),
        (F.col("o_totalprice") * 2).alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_snapshots",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
        "merge_on_read",
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    t = SnapshotTable(spark, root)
    t.commit(base.coalesce(4), operation="overwrite")
    t.append_delta(d1.coalesce(1))
    t.append_delta(d2.coalesce(1))
    t.compact()  # raw compact: chain → one commit, provenance persisted
    return (
        t.read_merged("o_orderkey")
        .groupBy("status")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("price"), 2).alias("total_price"),
        )
        .orderBy("status")
    )


@query(
    "snap_compact_vacuum",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price, 1 AS v
  FROM orders
), d1 AS (
  SELECT o_orderkey, 'U' AS status, o_totalprice + 5 AS price, 2 AS v
  FROM orders WHERE o_orderkey % 7 = 0
), d2 AS (
  SELECT o_orderkey, 'V' AS status, o_totalprice / 2 AS price, 3 AS v
  FROM orders WHERE o_orderkey % 3 = 0
), merged AS (
  SELECT o_orderkey, status, price FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rk
    FROM (
      SELECT * FROM base
      UNION ALL SELECT * FROM d1
      UNION ALL SELECT * FROM d2
    )
  ) WHERE rk = 1
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(price), 2) AS total_price,
       CAST(3 AS BIGINT) AS reclaimed_versions
FROM merged GROUP BY status ORDER BY status
""",
    survey="S6,S7,S8",
)
def snap_compact_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged compaction + vacuum end-to-end (r6 verdict #6: the
    maintenance half of the snapshot layer — ``compact(merge_key=...)``
    and ``vacuum()`` — externally proven, not just pytest-pinned).
    Reference lineage: the backup-then-replace cycle
    (``approve_datapoint.py:56-63``, ``patch_dp.py:157-172``)
    industrialized the way Delta's OPTIMIZE + VACUUM do.

    Commit ``orders`` as the base, ``append_delta`` two keyed patch
    batches, then ``compact(merge_key=...)`` — latest-wins resolves
    BEFORE the rewrite, physically reclaiming superseded rows — and
    ``vacuum(keep_last=1)``, dropping the three pre-compaction
    directories. The result reads the post-vacuum table with a PLAIN
    ``read()`` (no merge window): if merged compaction had left
    superseded duplicates, or vacuum had corrupted the surviving
    version, the per-status counts would inflate or vanish and the
    driver's hash would flip. ``reclaimed_versions`` pins vacuum's
    contract (3 reclaimable dirs: base + two deltas; the compacted
    commit has no delta parents) against a literal in the oracle.

    Scale shape: each delta write is O(|batch|); the merged compact is
    one latest-wins window + rewrite — the scheduled maintenance cost
    that buys back per-file open overhead at 100 TB; vacuum is manifest
    bookkeeping + directory removal, no data pass at all."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    d1 = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("o_totalprice") + 5).alias("price"),
    )
    d2 = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("V").alias("status"),
        (F.col("o_totalprice") / 2).alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_snapshots",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
        "compact_vacuum",
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    t = SnapshotTable(spark, root)
    t.commit(base.coalesce(4), operation="overwrite")
    t.append_delta(d1.coalesce(1))
    t.append_delta(d2.coalesce(1))
    t.compact(merge_key="o_orderkey")  # latest-wins resolved, then rewritten
    reclaimed = len(t.vacuum(keep_last=1))
    return (
        t.read()  # plain read: superseded rows must be physically gone
        .groupBy("status")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("price"), 2).alias("total_price"),
        )
        .withColumn("reclaimed_versions", F.lit(reclaimed).cast("bigint"))
        .orderBy("status")
    )


def audit_append(
    spark: SparkSession, audit_root: str, operation: str, payload: dict
) -> None:
    """S11: append-only audit record (``save_history``,
    ``patch_additional_files.py:87-103``) — one JSON file per mutation
    under ``.history/``-style dir; queryable later as a table."""
    os.makedirs(audit_root, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    rec = {"ts": ts, "operation": operation, **payload}
    path = os.path.join(audit_root, f"{ts}_{operation}_{int(time.time()*1e6)%10**6}.json")
    with open(path, "w") as f:
        json.dump(rec, f)


def move_rows(
    src: SnapshotTable, dst: SnapshotTable, rows: DataFrame, key_col: str
) -> tuple[int, int]:
    """The two-table transactional move (staging→review,
    ``add_dp_to_review.py:255-264``): commit to destination FIRST, then
    delete from source — the reference's ordering, preserving its crash
    exposure (crash between commits ⇒ duplicate, never loss). Returns the
    two new version ids."""
    v_dst = dst.append(rows)
    remaining = src.read().join(rows.select(key_col), on=key_col, how="left_anti")
    v_src = src.commit(remaining, "delete")
    return v_dst, v_src
