"""Z-order clustered writes: interleave correctness vs a Python
reference, and parquet-footer evidence that BOTH clustered columns get
narrow per-file min/max ranges (the property scans prune on)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.sources.layout import (
    _interleave2,
    write_zordered,
    zorder_value,
)
from tests.conftest import SF_ORACLE


def _py_interleave(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 9)]
    df = spark.createDataFrame(pairs, "x bigint, y bigint")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", _interleave2(F.col("x"), F.col("y"), 16).alias("z")
        ).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == _py_interleave(x, y, 16)


def test_zorder_preserves_rows_and_monotone_locality(spark):
    events = load_table(spark, SF_ORACLE, "events").select(
        "event_id", "user_id", "value"
    )
    z = zorder_value(events, ["user_id", "value"])
    assert z.count() == events.count()
    # identical (user_id, value) ⇒ identical z; z within bigint range
    row = z.agg(
        F.min("_z").alias("lo"), F.max("_z").alias("hi")
    ).collect()[0]
    assert 0 <= row.lo <= row.hi < (1 << 32)


def test_zordered_write_narrows_both_columns(spark, tmp_path):
    events = load_table(spark, SF_ORACLE, "events").select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "events_z")
    write_zordered(events, out, ["user_id", "value"], num_files=8)

    back = spark.read.parquet(out)
    assert back.count() == events.count()

    spans = {"user_id": [], "value": []}
    glo = {"user_id": None, "value": None}
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for col in spans:
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                los.append(st.min)
                his.append(st.max)
            spans[col].append(max(his) - min(los))
            g = (min(los), max(his)) if glo[col] is None else (
                min(min(los), glo[col][0]), max(max(his), glo[col][1])
            )
            glo[col] = g
    # Every file must cover MUCH less than the global range on BOTH
    # z-ordered columns (a single-column sort leaves the other at ~100%).
    for col in spans:
        global_span = glo[col][1] - glo[col][0]
        avg_span = sum(spans[col]) / len(spans[col])
        assert avg_span < 0.6 * global_span, (col, avg_span, global_span)


def test_bloom_filter_written_and_prunes(spark, tmp_path):
    from tbench_agentic_data_pipeline_spark.sources.layout import (
        write_bloom_filtered,
    )

    # High-cardinality key that overflows the dictionary page limit — the
    # case blooms exist for. (On a small dict-encodable column parquet-mr
    # correctly writes NO bloom: the dictionary is already exact; the
    # docstring documents this, and the fixture tables at test SF are all
    # dict-encoded.)
    big = spark.range(200_000).selectExpr(
        "id AS event_id", "CAST(id % 50000 AS LONG) AS user_id"
    ).coalesce(1)
    path = str(tmp_path / "bloomed")
    plain_path = str(tmp_path / "plain")
    write_bloom_filtered(big, path, ["user_id"], expected_items=50_000, fpp=0.01)
    big.write.mode("overwrite").parquet(plain_path)

    # physical evidence the filter bytes landed: pyarrow 16 exposes no
    # bloom_filter_offset accessor, so compare against an otherwise-
    # identical plain write (ndv=50k @ 1% FPP ≈ 60 KB of filter).
    import os

    size = lambda p: sum(
        os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet")
    )
    assert size(path) > size(plain_path) + 30_000, (size(path), size(plain_path))

    # behavioral evidence: an equality read returns exactly the right
    # rows (the filter is a pruning aid, never a semantic change)
    want = big.where(F.col("user_id") == 123).count()
    got = spark.read.parquet(path).where(F.col("user_id") == 123).count()
    assert got == want > 0
