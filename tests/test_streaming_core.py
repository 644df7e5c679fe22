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


def test_watermark_drops_late_data(spark):
    """Bounded-out-of-orderness contract: a row arriving after the
    watermark passed its window must be dropped from an append-mode
    windowed aggregation (reference WatermarkAssignerOperator +
    WindowOperator late-row drop path)."""
    import tempfile
    from datetime import datetime

    from flink_1_12_0_spark.streaming.core import run_to_memory

    import time

    d = tempfile.mkdtemp(prefix="sg_late_")
    mk = lambda *rows: spark.createDataFrame(list(rows), "ts timestamp, k int")
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)
    # Spark advances the watermark on batch COMMIT from that batch's max
    # event time, and a batch's input filter uses the wm committed before
    # it starts — so a watermark derived from batch N's data first FILTERS
    # in batch N+2.  Hence three files (mtime-separated so the file source
    # orders them into distinct micro-batches):
    # batch 0: window [10:00,11:00) gets 2 rows; max ts 11:59 -> wm 11:49
    mk((t(10, 5), 1), (t(10, 40), 1), (t(11, 59), 1)).coalesce(1).write.parquet(f"{d}/c0")
    time.sleep(1.1)
    # batch 1: carrier batch — wm 11:49 now committed and visible
    mk((t(12, 30), 1)).coalesce(1).write.parquet(f"{d}/c1")
    time.sleep(1.1)
    # batch 2: the LATE row (10:30 < wm) must drop; 13:30 advances wm
    mk((t(10, 30), 1), (t(13, 30), 1)).coalesce(1).write.parquet(f"{d}/c2")
    sdf = (
        spark.readStream.schema("ts timestamp, k int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/c*")
        .withWatermark("ts", "10 minutes")
    )
    from pyspark.sql import functions as F

    agg = sdf.groupBy(F.window("ts", "1 hour")).agg(F.count("*").alias("cnt"))
    out = run_to_memory(agg, output_mode="append")
    by_start = {str(r["window"]["start"]): r["cnt"] for r in out.collect()}
    # the late 10:30 row must NOT be counted in the 10:00 window
    assert by_start.get("2024-01-01 10:00:00") == 2


def test_foreach_batch_collects_all_rows(spark):
    sdf = events_stream(spark, SF_DIR, watermark=None)
    seen: list[int] = []

    def fn(batch_df, batch_id):
        seen.append(batch_df.count())

    run_foreach_batch(sdf.select("event_id"), fn, output_mode="append")
    assert sum(seen) == spark.read.parquet(f"{SF_DIR}/events.parquet").count()


def test_idle_partition_does_not_hold_back_watermark(spark):
    """Pin the documented divergence behind WatermarkStrategy.with_idleness
    (reference: flink-core .../eventtime/WatermarksWithIdleness.java).

    Flink's watermark is the MIN across input partitions: a partition that
    stops emitting holds the watermark back forever unless withIdleness
    marks it idle.  Spark's watermark is GLOBAL MAX minus delay: an idle
    key/partition simply stops contributing, so windows of an idle key
    still finalize once any OTHER partition advances event time.  That is
    exactly why with_idleness is a recorded no-op here — this test makes
    the behavioral gap auditable rather than silent."""
    import tempfile

    from flink_1_12_0_spark.streaming.core import WatermarkStrategy

    d = tempfile.mkdtemp(prefix="sg_idle_")
    # batch 0: both keys emit in hour 0; batch 1: only 'busy' advances time
    spark.createDataFrame(
        [("idle", "2024-01-01 00:01:00"), ("busy", "2024-01-01 00:02:00")],
        "k string, ts_s string",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts").coalesce(1).write.parquet(f"{d}/chunk0")
    spark.createDataFrame(
        [("busy", "2024-01-01 03:00:00")], "k string, ts_s string"
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts").coalesce(1).write.parquet(f"{d}/chunk1")

    sdf = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/chunk*")
    )
    strat = WatermarkStrategy.for_bounded_out_of_orderness("10 minutes").with_idleness(
        "1 minute"
    )
    assert strat.idleness == "1 minute"  # recorded, not enforced
    agg = (
        strat.apply(sdf, "ts")
        .groupBy(F.window("ts", "1 hour"), "k")
        .agg(F.count("*").alias("n"))
        .select("k", F.col("window.start").alias("ws"), "n")
    )
    captured = []

    def sink(bdf, bid):
        captured.extend(bdf.collect())

    with tempfile.TemporaryDirectory(prefix="sg_ckpt_") as ckpt:
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finalized = {(r["k"]) for r in captured}
    # the idle key's hour-0 window FINALIZED because the busy key advanced
    # the global watermark — under Flink's per-partition min without
    # idleness handling, this window would still be open
    assert "idle" in finalized and "busy" in finalized


def test_datagen_ddl_bounded_sequence_and_random(spark):
    """DDL datagen connector (DataGenTableSourceFactory): sequence fields
    count start..end; hash-uniform randoms respect min/max; string length
    honored; source bounded by the shortest sequence."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE gen (
            id BIGINT, score DOUBLE, tag STRING
        ) WITH (
            'connector' = 'datagen',
            'fields.id.kind' = 'sequence',
            'fields.id.start' = '5', 'fields.id.end' = '14',
            'fields.score.kind' = 'random',
            'fields.score.min' = '1.5', 'fields.score.max' = '2.5',
            'fields.tag.kind' = 'random', 'fields.tag.length' = '10')""")
    rows = spark.table("gen").collect()
    assert sorted(r["id"] for r in rows) == list(range(5, 15))
    assert all(1.5 <= r["score"] <= 2.5 for r in rows)
    assert all(len(r["tag"]) == 10 for r in rows)
    # deterministic across re-reads (hash-uniform, not a seeded RNG)
    again = spark.table("gen").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_datagen_ddl_number_of_rows(spark):
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE gen_n (v INT) WITH (
            'connector' = 'datagen', 'number-of-rows' = '7',
            'fields.v.min' = '0', 'fields.v.max' = '100')""")
    assert spark.table("gen_n").count() == 7


def test_datagen_ddl_unbounded_is_streaming(spark):
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE gen_s (v BIGINT) WITH (
            'connector' = 'datagen', 'rows-per-second' = '100',
            'fields.v.kind' = 'sequence')""")
    assert spark.table("gen_s").isStreaming


def test_datagen_rows_capped_by_sequence_end(spark):
    """number-of-rows can shrink but never extend a sequence past its
    declared end (the reference source terminates at exhaustion)."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE gen_cap (k BIGINT) WITH (
            'connector' = 'datagen', 'number-of-rows' = '100',
            'fields.k.kind' = 'sequence',
            'fields.k.start' = '0', 'fields.k.end' = '49')""")
    rows = [r["k"] for r in spark.table("gen_cap").collect()]
    assert sorted(rows) == list(range(50))


def test_local_table_schema_parsing_and_nulls(spark):
    """local_table must bind names through TOP-LEVEL commas only (a
    decimal(10,2) argument list contains a comma), stage integral Nones
    as proper NULLs with exact 64-bit range (not float64 NaN), carry
    array payloads, and reject a malformed DDL entry instead of
    mis-binding columns."""
    from decimal import Decimal

    import pytest

    from flink_1_12_0_spark.streaming.core import local_table

    out = local_table(
        spark,
        [(1, 2**53 + 1, [1, 2], Decimal("3.50")),
         (2, None, None, None)],
        "k int, big bigint, a array<int>, d decimal(10,2)")
    rows = out.orderBy("k").collect()
    assert [r["big"] for r in rows] == [2**53 + 1, None]
    assert rows[0]["a"] == [1, 2]
    assert str(rows[0]["d"]) == "3.50"
    assert dict(out.dtypes)["d"] == "decimal(10,2)"
    with pytest.raises(ValueError, match="malformed"):
        local_table(spark, [], "k int, bad")
