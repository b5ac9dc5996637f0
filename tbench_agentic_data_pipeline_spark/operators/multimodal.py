"""Multimodal column plumbing: binary payloads + typed metadata + batched
Python feature extraction.

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages. The container
has no imaging/audio libraries, so the decoder backend here is a
clearly-marked deterministic fake — but every Spark-side piece a real
deployment needs is real and tested: the schema contract, the batch
iterator shape, partition sizing, and the pandas-UDF signature. Swapping
``_fake_decode`` for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads make wide rows — keep
``spark.sql.files.maxPartitionBytes`` moderate and repartition before the
Python stage so each Arrow batch holds bounded bytes, not bounded rows of
unbounded size. Metadata-only predicates (format, size bands) stay
JVM-side and prune before any Python runs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

if TYPE_CHECKING:
    import pandas as pd

# Feature schema produced by the decode stage — the stable contract between
# the Python backend and everything downstream.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("fake_duration_ms", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: the document text bytes stand in for an
    encoded media payload, with a typed metadata struct alongside."""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        (F.col("doc_id") % 3 == 0).alias("keyframe_hint"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("media_meta"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decoder — deterministic arithmetic on the payload in place of a
    real media decode. A real deployment replaces this one function with
    PIL / torchaudio / pyav; everything around it is production-shaped.
    Raises nothing: decode failures in production should be caught and
    surfaced as a status column, never crash the stage."""
    n = len(payload)
    return n, n % 640, (n // 640) % 480, n * 10


def decode_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """The batched Python stage: Arrow-fed pandas batches in, feature
    frame out. ``partitions`` bounds per-task payload volume (repartition
    BEFORE the Python boundary, so executors stream bounded batches)."""
    if partitions is not None:
        media = media.repartition(partitions)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": [d[0] for d in decoded],
                    "fake_width": [d[1] for d in decoded],
                    "fake_height": [d[2] for d in decoded],
                    "fake_duration_ms": [d[3] for d in decoded],
                    "decoder": "fake-v0",
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


@query(
    "mm_decode_features",
    survey="X4,X5,S4",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT)              AS byte_len,
               CAST(strlen(text) % 640 AS BIGINT)        AS fake_width,
               CAST((strlen(text) // 640) % 480 AS BIGINT) AS fake_height,
               CAST(strlen(text) * 10 AS BIGINT)         AS fake_duration_ms,
               'fake-v0'                                  AS decoder
        FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline end-to-end: text→binary payload + typed
    metadata, then the Arrow-batched ``mapInPandas`` decode stage. The
    oracle reproduces the fake decoder's arithmetic from ``strlen(text)``
    (ASCII corpus: chars == bytes), proving the Python stage computes on
    the actual payload bytes — the external-action pattern of SURVEY.md
    §2.9 X4/X5 with the side-effect swapped for a pure stub."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return decode_features(media)
