"""Streaming core plumbing: sources build streaming DFs, sinks build
writers, the availableNow harness materializes bounded results."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.streaming.core import (
    datagen,
    events_stream,
    run_foreach_batch,
    to_console,
    to_noop,
    to_partitioned_files,
)
from tests.conftest import SF_DIR


def test_events_stream_is_streaming(spark):
    sdf = events_stream(spark, SF_DIR)
    assert sdf.isStreaming
    assert dict(sdf.dtypes)["ts"] == "timestamp"


def test_datagen_rate_source(spark):
    sdf = datagen(spark, rows_per_second=10, projection=[F.col("value") * 2])
    assert sdf.isStreaming


def test_sink_builders(spark):
    sdf = events_stream(spark, SF_DIR)
    assert to_console(sdf) is not None
    assert to_noop(sdf) is not None
    assert to_partitioned_files(sdf, "/tmp/sg_out", partition_by=["event_type"]) is not None


def test_foreach_batch_collects_all_rows(spark):
    sdf = events_stream(spark, SF_DIR, watermark=None)
    seen: list[int] = []

    def fn(batch_df, batch_id):
        seen.append(batch_df.count())

    run_foreach_batch(sdf.select("event_id"), fn, output_mode="append")
    assert sum(seen) == spark.read.parquet(f"{SF_DIR}/events.parquet").count()
