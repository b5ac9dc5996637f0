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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage (STUB backend): real deployments call PIL/cv2 here;
    the stub truncates/pads the payload to width*height bytes so output
    size invariants are testable. Batch shape, schema contract and
    metadata pass-through are the production-shaped parts."""
    target = width * height

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            resized = [
                bytes(p[:target]).ljust(target, b"\0") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": resized,
                    "out_width": width,
                    "out_height": height,
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def frame_sample_stub(media: DataFrame, stride: int, frame_bytes: int = 64) -> DataFrame:
    """Frame-sampling stage (STUB backend): emit every ``stride``-th
    ``frame_bytes`` window of the payload as one frame row — the 1→N
    explode shape of real video sampling (pyav keyframe iteration), with
    deterministic fake frames. Row count = ceil(len/ (stride*frame_bytes))."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                for i, off in enumerate(range(0, len(p), stride * frame_bytes)):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame"].append(p[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


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
