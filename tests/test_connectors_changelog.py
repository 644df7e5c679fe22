"""Kafka-shaped connector double, retraction changelog sink, watermark
strategy surface, temporal table function API."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_topic_offsets_monotonic_across_appends(spark, tmp_path):
    from flink_1_12_0_spark.streaming.kafka_shim import topic_read_batch, topic_write

    d = str(tmp_path / "t")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    first, second = ev.where("event_id % 2 = 0"), ev.where("event_id % 2 = 1")
    for chunk in (first, second):
        topic_write(chunk, d, key_col=F.col("user_id"),
                    value_col=F.to_json(F.struct("event_id")), ts_col="ts")
    rec = topic_read_batch(spark, d)
    assert rec.count() == ev.count()
    # offsets unique + contiguous per partition: max(offset) = count-1
    per_part = rec.groupBy("partition").agg(
        F.count("*").alias("n"), F.max("offset").alias("mx"),
        F.count_distinct("offset").alias("d")).collect()
    for r in per_part:
        assert r["d"] == r["n"] == r["mx"] + 1
    # a key lives in exactly one partition
    assert rec.groupBy("key").agg(
        F.count_distinct("partition").alias("p")).where("p > 1").count() == 0


def test_topic_stream_read(spark, tmp_path):
    from flink_1_12_0_spark.streaming.core import run_to_memory
    from flink_1_12_0_spark.streaming.kafka_shim import (
        json_table_source, topic_read_stream, topic_write)

    d = str(tmp_path / "t")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(100)
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    topic_write(ev, d, key_col=F.col("user_id"),
                value_col=F.to_json(F.struct("event_id", "event_type")), ts_col="ts")
    out = run_to_memory(
        json_table_source(topic_read_stream(spark, d),
                          "event_id bigint, event_type string", keep_meta=True))
    assert out.count() == 100
    assert {"key", "topic", "partition", "offset", "timestamp", "event_id",
            "event_type"} <= set(out.columns)


def test_changelog_upsert_sink_rowkinds(spark, tmp_path):
    from flink_1_12_0_spark.streaming.sinks import ChangelogUpsertSink

    p = str(tmp_path / "upsert")
    sink = ChangelogUpsertSink(spark, p, keys=["k"], seq_col="seq", delete_col="del")
    b0 = spark.createDataFrame(
        [(1, 1, 10.0, False), (2, 1, 20.0, False)], "k int, seq int, v double, del boolean")
    b1 = spark.createDataFrame(
        [(1, 2, 11.0, False), (2, 2, 0.0, True), (3, 2, 30.0, False)],
        "k int, seq int, v double, del boolean")
    sink.merge_batch(b0, 0)
    sink.merge_batch(b1, 1)
    # final table: k=1 updated, k=2 deleted, k=3 inserted
    final = {r["k"]: r["v"] for r in sink.table().collect()}
    assert final == {1: 11.0, 3: 30.0}
    log = [(r["batch"], r["op"], r["k"], r["v"]) for r in sink.changelog().collect()]
    assert (0, "+I", 1, 10.0) in log and (0, "+I", 2, 20.0) in log
    assert (1, "-U", 1, 10.0) in log and (1, "+U", 1, 11.0) in log
    assert (1, "-D", 2, 20.0) in log and (1, "+I", 3, 30.0) in log
    assert len(log) == 6
    # retry of batch 1 is idempotent (overwrite per batch id)
    sink.merge_batch(b1, 1)
    assert len(sink.changelog().collect()) == 6


def test_upsert_sink_distributed_snapshots(spark, tmp_path):
    """The versioned-snapshot upsert keeps latest per key with no driver
    collect; the manifest points at the newest version dir."""
    from flink_1_12_0_spark.streaming.sinks import UpsertSink

    p = str(tmp_path / "u")
    sink = UpsertSink(spark, p, keys=["k"], seq_col="seq")
    sink.merge_batch(spark.createDataFrame([(1, 1, "a"), (1, 2, "b")],
                                           "k int, seq int, v string"), 0)
    sink.merge_batch(spark.createDataFrame([(1, 3, "c"), (2, 1, "x")],
                                           "k int, seq int, v string"), 1)
    got = {r["k"]: r["v"] for r in sink.table().collect()}
    assert got == {1: "c", 2: "x"}
    assert os.path.exists(os.path.join(p, "_MANIFEST"))
    with open(os.path.join(p, "_MANIFEST")) as fh:
        assert fh.read().strip() == "v000000000001"


def test_watermark_strategy_surface(spark):
    from flink_1_12_0_spark.streaming.core import WatermarkStrategy, events_stream

    ws = (WatermarkStrategy.for_bounded_out_of_orderness("10 minutes")
          .with_idleness("1 minute"))
    assert ws.delay == "10 minutes" and ws.idleness == "1 minute"
    sdf = events_stream(spark, SF_DIR, watermark=None)
    out = ws.apply(sdf, "ts")
    assert out.isStreaming
    assert WatermarkStrategy.for_monotonous_timestamps().delay == "0 seconds"
    assert WatermarkStrategy.for_punctuated().delay == "0 seconds"


def test_temporal_table_function_api(spark):
    """Table.createTemporalTableFunction + joinLateral equals the direct
    temporal_join operator."""
    from flink_1_12_0_spark.api.table import Table
    from flink_1_12_0_spark.operators.joins import temporal_join
    from flink_1_12_0_spark.tables import load_tables

    t = load_tables(spark, SF_DIR)
    probe = t["events"].where("event_type = 'purchase'").select("user_id", "ts", "event_id")
    versions = (t["events"].where("event_type = 'login'")
                .select("user_id", F.col("ts").alias("vts"), F.col("event_id").alias("vid")))
    rates = Table(versions).create_temporal_table_function("vts", "user_id")
    got = Table(probe).join_lateral_temporal(rates, "ts").df
    want = temporal_join(probe, versions, ["user_id"], "ts", "vts", ["vid"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_kafka_connector_ddl(spark, tmp_path):
    """CREATE TABLE with connector='upsert-kafka' resolves through the
    topic double via executeSql."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment
    from flink_1_12_0_spark.streaming.kafka_shim import topic_write

    d = str(tmp_path / "t")
    rows = spark.createDataFrame(
        [(1, 10.0, "2024-01-01 00:00:00"), (1, 11.0, "2024-01-01 00:00:01"),
         (2, 20.0, "2024-01-01 00:00:02")],
        "uid int, v double, tss string").withColumn("tss", F.to_timestamp("tss"))
    topic_write(rows, d, key_col=F.col("uid"),
                value_col=F.to_json(F.struct("uid", "v")), ts_col="tss")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE k_up (uid BIGINT, v DOUBLE)
        WITH ('connector'='upsert-kafka', 'path'='{d}', 'format'='json')""")
    got = {r["uid"]: r["v"] for r in
           env.execute_sql("SELECT uid, v FROM k_up").collect()}
    assert got == {1: 11.0, 2: 20.0}


def test_sink_not_null_enforcer(spark):
    """SinkNotNullEnforcer: error mode fails the write on NULLs, drop mode
    filters them."""
    from flink_1_12_0_spark.sources.formats import enforce_not_null

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "k int, v string")
    assert enforce_not_null(df, ["v"], mode="drop").count() == 2
    assert enforce_not_null(df, ["k", "v"], mode="drop").count() == 2
    import pytest as _pt
    with _pt.raises(Exception, match="NOT NULL constraint"):
        enforce_not_null(df, ["v"], mode="error").collect()
    assert enforce_not_null(df.where("v is not null"), ["v"]).count() == 2


def test_topic_write_stream_roundtrip(spark, tmp_path):
    """Streaming producer → batch consumer: records survive with correct
    per-partition offset continuity across micro-batches."""
    from pyspark.sql import functions as F2

    from flink_1_12_0_spark.streaming.core import events_stream
    from flink_1_12_0_spark.streaming.kafka_shim import (
        topic_read_batch, topic_write_stream)

    d = str(tmp_path / "t")
    sdf = events_stream(spark, SF_DIR, watermark=None).where("event_id < 200")
    topic_write_stream(
        sdf, d, key_col=F2.col("user_id"),
        value_col=F2.to_json(F2.struct("event_id")), ts_col="ts")
    rec = topic_read_batch(spark, d)
    n = spark.read.parquet(f"{SF_DIR}/events.parquet").where("event_id < 200").count()
    assert rec.count() == n
    per_part = rec.groupBy("partition").agg(
        F2.count("*").alias("n"), F2.max("offset").alias("mx")).collect()
    for r in per_part:
        assert r["n"] == r["mx"] + 1


def test_raw_format_codec_types(spark):
    """raw format (RawFormatFactory.java): STRING verbatim, BYTES base64,
    numerics textual — all lossless through the string-valued transport."""
    import pandas as pd

    from flink_1_12_0_spark.streaming.kafka_shim import (
        raw_table_source,
        raw_value_encode,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"payload": [b"\x00\xffraw", b"", b"abc"]}), "payload binary"
    )
    rec = df.select(
        raw_value_encode("payload", "BYTES").alias("value"),
    )
    back = raw_table_source(rec, "payload", "BINARY")
    assert [bytes(r["payload"]) for r in back.collect()] == [b"\x00\xffraw", b"", b"abc"]

    num = spark.range(3).select((F.col("id") * 10).alias("v"))
    rec2 = num.select(raw_value_encode("v", "BIGINT").alias("value"))
    back2 = raw_table_source(rec2, "v", "BIGINT")
    assert sorted(r["v"] for r in back2.collect()) == [0, 10, 20]


def test_raw_format_option_validation(spark):
    import pytest

    from flink_1_12_0_spark.streaming.kafka_shim import raw_table_source

    rec = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(NotImplementedError, match="charset"):
        raw_table_source(rec, "c", "STRING", options={"raw.charset": "latin-1"})
    with pytest.raises(NotImplementedError, match="little-endian"):
        raw_table_source(rec, "c", "STRING", options={"raw.endianness": "little-endian"})
    # defaults pass
    assert raw_table_source(rec, "c", "STRING").collect()[0]["c"] == "x"


def test_raw_format_ddl_single_column(spark, tmp_path):
    import pytest

    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    env = TableEnvironment(spark)
    with pytest.raises(ValueError, match="one physical column"):
        env.execute_sql(f"""
            CREATE TABLE bad_raw (a STRING, b INT) WITH (
                'connector' = 'kafka', 'path' = '{tmp_path}/t', 'format' = 'raw')""")


def test_raw_format_charset_aliases(spark):
    """'utf8' / 'UTF_8' aliases resolve to UTF-8 like Java Charset.forName."""
    from flink_1_12_0_spark.streaming.kafka_shim import raw_table_source

    rec = spark.createDataFrame([("x",)], "value string")
    for alias in ("utf8", "UTF_8", "utf-8"):
        assert raw_table_source(
            rec, "c", "STRING", options={"raw.charset": alias}
        ).collect()[0]["c"] == "x"

