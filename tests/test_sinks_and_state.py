"""Upsert sink (foreachBatch MERGE), connect/broadcast-state pattern, and
state-TTL timers — the remaining §2.9 surface."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from flink_1_12_0_spark.streaming.core import events_stream
from flink_1_12_0_spark.streaming.sinks import UpsertSink, connect_with_control
from flink_1_12_0_spark.streaming.stateful import keyed_process
from tests.conftest import SF_DIR


def test_upsert_sink_keeps_latest_per_key(spark):
    """Streaming events upserted by (user_id, event_type): final table ==
    batch keep-last truth (the upsert-kafka / JDBC-upsert write path)."""
    path = tempfile.mkdtemp(prefix="sg_upsert_") + "/state"
    sdf = events_stream(spark, SF_DIR, watermark=None).select(
        "user_id", "event_type", "event_id", "value", "ts"
    )
    sink = UpsertSink(spark, path, keys=["user_id", "event_type"], seq_col="event_id")
    sink.write_stream(sdf)
    got = {
        (r["user_id"], r["event_type"]): r["event_id"] for r in sink.table().collect()
    }
    truth = {
        (r["user_id"], r["event_type"]): r["event_id"]
        for r in spark.sql(
            f"""SELECT user_id, event_type, event_id FROM (
                SELECT user_id, event_type, event_id,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY event_id DESC) rn
                FROM parquet.`{SF_DIR}/events.parquet`) WHERE rn = 1"""
        ).collect()
    }
    assert got == truth


def test_connect_with_control_union_tags(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    main = ev.select("user_id", "event_id")
    control = ev.select("user_id").distinct().withColumn("threshold", F.lit(5.0))
    merged = connect_with_control(main, control, ["user_id", "event_id", "threshold"])
    assert set(merged.columns) == {"user_id", "event_id", "threshold", "_stream"}
    counts = {r["_stream"]: r["cnt"] for r in merged.groupBy("_stream").agg(F.count("*").alias("cnt")).collect()}
    assert counts["main"] == main.count() and counts["control"] == control.count()


def test_state_ttl_timeout_fires(spark):
    """StateTtlConfig analog: ProcessingTimeTimeout expires idle per-key
    state; the timed-out branch must observe state and clean it up."""
    ev = events_stream(spark, SF_DIR, watermark=None).select("user_id", "event_id")

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": key[0], "n": n, "expired": True}])
            return
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(100)  # ms — expires before stream end
        yield pd.DataFrame([{"user_id": key[0], "n": n, "expired": False}])

    out = keyed_process(
        ev, ["user_id"], fn,
        "user_id bigint, n bigint, expired boolean",
        "n bigint",
        timeout=GroupStateTimeout.ProcessingTimeTimeout,
    )
    from flink_1_12_0_spark.streaming.core import run_to_memory

    # short bound: under availableNow the query keeps scheduling batches
    # while processing-time timers re-arm; 20 s is ample for the single
    # data batch + the expiry batches we assert on.
    res = run_to_memory(out, output_mode="update", timeout_s=20)
    live = res.where(~F.col("expired"))
    assert live.count() > 0
    # counts per key must equal the batch truth
    got = {r["user_id"]: r["n"] for r in live.collect()}
    truth = {
        r["user_id"]: r["cnt"]
        for r in spark.sql(
            f"SELECT user_id, count(*) cnt FROM parquet.`{SF_DIR}/events.parquet` GROUP BY 1"
        ).collect()
    }
    assert got == truth


def test_to_retract_stream_rowkinds(spark, tmp_path):
    """toRetractStream: +I on first sight, -U/+U on update, -D on delete;
    the boolean mirrors RowKind accumulate/retract."""
    import pandas as pd

    from flink_1_12_0_spark.streaming.sinks import to_retract_stream

    src = str(tmp_path / "src")
    rows1 = pd.DataFrame({"k": [1, 2], "v": [10, 20], "seq": [1, 1], "del": [False, False]})
    rows2 = pd.DataFrame({"k": [1, 2], "v": [11, 20], "seq": [2, 2], "del": [False, True]})
    spark.createDataFrame(rows1).coalesce(1).write.parquet(f"{src}/b0")
    spark.createDataFrame(rows2).coalesce(1).write.parquet(f"{src}/b1")
    sdf = (
        spark.readStream.schema("k bigint, v bigint, seq bigint, del boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    log = to_retract_stream(sdf, ["k"], "seq", delete_col="del")
    got = sorted(
        (r["batch"], r["op"], r["k"], r["v"], r["accumulate"])
        for r in log.collect()
    )
    # batch 0: both keys inserted; batch 1: k=1 updated, k=2 deleted
    assert (0, "+I", 1, 10, True) in got and (0, "+I", 2, 20, True) in got
    assert (1, "-U", 1, 10, False) in got and (1, "+U", 1, 11, True) in got
    assert (1, "-D", 2, 20, False) in got
    assert len(got) == 5
