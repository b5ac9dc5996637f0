"""Data-layout helpers for scan pruning: Z-order clustered writes.

Parquet scans skip row groups whose column min/max don't straddle the
predicate. A sort on ONE column gives that column tight per-file ranges
but leaves every other column's ranges global-width. Z-ordering
interleaves the bits of several columns into one sort key, so files end
up with NARROW min/max on ALL participating columns — multi-dimensional
data skipping from a plain sort, no index structure. This is the
standard lakehouse layout technique for the 100 TB "filter on user AND
time AND value" scan, and it composes with partition pruning.

Everything is column expressions: the quantization bounds are one tiny
aggregate broadcast back into the projection; the interleave is a fixed
unrolled shift/mask chain (whole-stage codegen'd — no UDFs); the write
is ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value, so
each output task writes one tight z-range.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-dimension quantization; 2 dims × 16 bits fit a bigint


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by linear min/max scaling.
    Constant columns (hi == lo) quantize to 0; NULLs to 0 (sort first)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    q = F.floor(
        (col.cast("double") - lo) / span * F.lit((1 << bits) - 1)
    ).cast("bigint")
    return F.coalesce(
        F.greatest(F.least(q, F.lit((1 << bits) - 1)), F.lit(0)), F.lit(0)
    )


def _interleave2(x: Column, y: Column, bits: int) -> Column:
    """Bit-interleave two quantized values: result bit 2i is x's bit i,
    bit 2i+1 is y's bit i. Fixed unrolled expression — codegen-friendly."""
    parts = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        .bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_value(df: DataFrame, cols: list[str], bits: int = _BITS) -> DataFrame:
    """Attach a ``_z`` column: the Z-order (Morton) key over two numeric
    columns. Bounds come from one scalar aggregate broadcast into the
    projection — a second full pass over the data, which is what every
    z-order writer pays (the bounds must be global)."""
    if len(cols) != 2:
        raise ValueError("zorder_value supports exactly 2 columns")
    a, b = cols
    bounds = df.agg(
        F.min(F.col(a).cast("double")).alias("_alo"),
        F.max(F.col(a).cast("double")).alias("_ahi"),
        F.min(F.col(b).cast("double")).alias("_blo"),
        F.max(F.col(b).cast("double")).alias("_bhi"),
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    z = _interleave2(
        _quantize(F.col(a), F.col("_alo"), F.col("_ahi"), bits),
        _quantize(F.col(b), F.col("_blo"), F.col("_bhi"), bits),
        bits,
    )
    return with_bounds.withColumn("_z", z).drop("_alo", "_ahi", "_blo", "_bhi")


def write_zordered(
    df: DataFrame, path: str, cols: list[str], num_files: int = 8,
    bits: int = _BITS,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the z-value (each task owns one contiguous
    z-range) and sort within partitions, so every output file carries
    narrow min/max on BOTH columns and scans with a predicate on either
    column skip most row groups."""
    zdf = zorder_value(df, cols, bits)
    (
        zdf.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bloom_filtered(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
) -> None:
    """Write parquet with COLUMN BLOOM FILTERS on ``bloom_cols``.

    Min/max skipping (and Z-ordering above) only helps predicates on
    columns the layout is clustered by; a point lookup on an UNSORTED
    high-cardinality column (user id, content hash) still reads every
    row group whose global range happens to straddle the key — usually
    all of them. A per-row-group bloom filter answers "definitely not
    here" for equality predicates on any column it's built on, at ~1.2
    bytes/item for 1% FPP, so the 100 TB point lookup touches only the
    row groups that might contain the key. This is the complement to
    Z-order: cluster by the 2 range-scan dimensions, bloom the equality
    dimensions.

    CAVEAT (parquet-mr behavior, relied on by the test): a column whose
    pages all stay DICTIONARY-encoded gets NO bloom filter — the
    dictionary is already an exact membership structure, so the writer
    skips the redundant filter. Blooms appear exactly where they pay:
    high-cardinality columns that overflow the dictionary page limit —
    which is the 100 TB case (billions of user ids / content hashes per
    file)."""
    writer = df.write.mode("overwrite")
    for c in bloom_cols:
        writer = (
            writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
            .option(f"parquet.bloom.filter.expected.ndv#{c}", str(expected_items))
            .option(f"parquet.bloom.filter.fpp#{c}", str(fpp))
        )
    writer.parquet(path)
