"""Streaming sources: replay the driver's events table as a bounded
stream.

The reference's "stream" is agents polling a queue; the engine's streaming
surface needs a real source. ``replay_events`` re-exposes the events
parquet as a file stream (rate-limited via maxFilesPerTrigger over a
pre-split copy), which is how every windowing/stateful operator in this
package is integration-tested without external infrastructure. In
production the same transforms sit on Kafka/Kinesis readers — only this
module changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def replay_events(
    spark: SparkSession,
    sf_dir: str,
    stage_dir: str,
    *,
    splits: int = 8,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Split the events table into ``splits`` files under ``stage_dir``
    (once, driver-side) and return a file-stream DataFrame that replays
    them ``files_per_trigger`` per micro-batch, preserving event-time
    columns for watermarking."""
    from tbench_agentic_data_pipeline_spark.catalog import load_table

    marker = os.path.join(stage_dir, "_staged")
    if not os.path.exists(marker):
        events = load_table(spark, sf_dir, "events")
        events.repartitionByRange(splits, "ts").write.mode("overwrite").parquet(
            stage_dir
        )
        open(marker, "w").close()
    schema = spark.read.parquet(stage_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(stage_dir)
    )
