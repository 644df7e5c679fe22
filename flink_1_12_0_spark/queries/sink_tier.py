"""Sink-tier oracle queries: upsert end-state and retraction changelog.

The last §2 streaming rows that were pytest-only for three rounds
(VERDICT r4-r6): the upsert / two-phase-commit sink family and the
RowKind retraction changelog.

Reference:
- flink-streaming-java .../functions/sink/TwoPhaseCommitSinkFunction.java:77
  (transactional sinks; our UpsertSink gets the same exactly-once effect
  from stable batch ids + idempotent snapshot overwrite),
- flink-table-planner-blink .../stream/StreamExecSink.scala:111 (upsert
  materialization of an updating table),
- flink-core .../types/RowKind.java:35-58 (+I/-U/+U/-D) and
  StreamTableEnvironment.toRetractStream.

Harness: the events table is split into THREE deterministic micro-batches
by ``event_id % 3`` (no global sort needed — any deterministic row->batch
rule works because the oracle models the same rule), written as chunk
files and streamed with ``maxFilesPerTrigger=1``.  Batch processing order
is chunk0 -> chunk1 -> chunk2 (Spark's FileStreamSource orders by
modification time then path; the chunks are written sequentially AND sort
alphabetically).  Rows with ``event_id % 10 = 0`` carry a delete marker,
so all four row kinds appear.  The DuckDB oracle replays the same
batch/delete rules with window functions: a key is PRESENT in the
snapshot iff its most recent appearance (latest event_id of its most
recent batch) was not a delete — which yields +I vs -U/+U vs -D (and the
no-op delete-of-absent-key) exactly as ChangelogUpsertSink computes them
by diffing snapshots.

Scale: the sink's merge is a distributed anti-join + union per batch (no
driver data path); the chunk-split harness is test-only plumbing standing
in for whatever file/Kafka cadence production has.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables

#: shared row->micro-batch and delete-marker rules (mirrored in SQL below)
_N_BATCHES = 3
_DEL_MOD = 10

# The oracle's replay of the sink semantics, shared by both queries:
#   src     = events + batch + is_del
#   latest  = the one row per (key, batch) the sink keeps (max event_id)
#   hist    = latest + the key's previous appearance (lag over batch)
# Presence-in-snapshot before a batch == previous appearance was non-del.
_ORACLE_HIST = f"""
    WITH src AS (
        SELECT user_id, event_type, event_id, value,
               (event_id % {_DEL_MOD} = 0) AS is_del,
               CAST(event_id % {_N_BATCHES} AS BIGINT) AS batch
        FROM events
    ),
    latest AS (
        SELECT user_id, event_type, event_id, value, is_del, batch
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type, batch
                                           ORDER BY event_id DESC) AS rn
              FROM src)
        WHERE rn = 1
    ),
    hist AS (
        SELECT *,
               lag(is_del) OVER (PARTITION BY user_id, event_type
                                 ORDER BY batch) AS prev_del,
               lag(event_id) OVER (PARTITION BY user_id, event_type
                                   ORDER BY batch) AS prev_id
        FROM latest
    )
"""


def _chunked_events(spark, sf_dir):
    """events -> (streaming DF with is_del column, one chunk file per
    ``event_id % _N_BATCHES`` value, streamed one file per trigger)."""
    ev = (
        load_tables(spark, sf_dir)["events"]
        .select("user_id", "event_type", "event_id", "value")
        .withColumn("is_del", F.col("event_id") % _DEL_MOD == 0)
    )
    d = tempfile.mkdtemp(prefix="sg_sink_chunks_")
    for b in range(_N_BATCHES):
        # sequential writes: strictly increasing mtimes AND alphabetical
        # names keep FileStreamSource's processing order = b order
        ev.where(F.col("event_id") % _N_BATCHES == b).coalesce(1).write.parquet(
            f"{d}/chunk{b}"
        )
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/chunk*")
    )


@query(
    "sink_changelog_rowkinds",
    oracle=_ORACLE_HIST + """
    , ops AS (
        SELECT CASE WHEN prev_del IS NULL OR prev_del THEN '+I'
                    ELSE '+U' END AS op,
               event_id AS id
        FROM hist WHERE NOT is_del
        UNION ALL
        SELECT '-U' AS op, prev_id AS id FROM hist
        WHERE NOT is_del AND prev_del IS NOT NULL AND NOT prev_del
        UNION ALL
        SELECT '-D' AS op, prev_id AS id FROM hist
        WHERE is_del AND prev_del IS NOT NULL AND NOT prev_del
    )
    SELECT op, count(*) AS n, CAST(sum(id) AS BIGINT) AS id_sum
    FROM ops GROUP BY op ORDER BY op
    """,
)
def sink_changelog_rowkinds(spark, sf_dir):
    """toRetractStream / ChangelogUpsertSink RowKind parity: stream the
    3-chunk events feed through the snapshot-diffing changelog sink and
    summarize the emitted +I/-U/+U/-D stream (count + event_id checksum
    per kind).  Covers RowKind.java semantics end-to-end: insert, the
    -U/+U retraction pair, delete-of-present, and the silent no-op
    delete-of-absent."""
    from flink_1_12_0_spark.streaming.sinks import to_retract_stream

    sdf = _chunked_events(spark, sf_dir)
    log = to_retract_stream(
        sdf, keys=["user_id", "event_type"], seq_col="event_id",
        delete_col="is_del",
    )
    return (
        log.groupBy("op")
        .agg(
            F.count("*").alias("n"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("op")
    )


@query(
    "sink_upsert_endstate",
    oracle=_ORACLE_HIST + """
    , last_app AS (
        SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                                    ORDER BY batch DESC) AS rn2
                       FROM latest)
        WHERE rn2 = 1
    )
    SELECT user_id, event_type, event_id, value
    FROM last_app WHERE NOT is_del
    ORDER BY user_id, event_type
    """,
)
def sink_upsert_endstate(spark, sf_dir):
    """UpsertSink end-state (exactly-once upsert materialization,
    TwoPhaseCommitSinkFunction.java:77 / StreamExecSink.scala:111): after
    the 3-batch stream drains, the keyed parquet table holds exactly one
    row per live key — the newest version from the key's last batch, with
    deleted keys absent."""
    from flink_1_12_0_spark.streaming.sinks import UpsertSink

    sdf = _chunked_events(spark, sf_dir)
    sink = UpsertSink(
        spark, tempfile.mkdtemp(prefix="sg_upsert_"),
        keys=["user_id", "event_type"], seq_col="event_id",
        delete_col="is_del",
    )
    sink.write_stream(sdf)
    return (
        sink.table()
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    )


@query(
    "sink_print_blackhole",
    oracle="""
    SELECT count(*) AS blackhole_rows,
           5 AS print_rows
    FROM events
    """,
)
def sink_print_blackhole(spark, sf_dir):
    """Print + Blackhole sinks (PrintTableSinkFactory.java /
    BlackHoleTableSinkFactory.java): drain the events stream into the
    noop (blackhole) sink and a 5-row sample into the console (print)
    sink, then report how many rows each sink consumed from the
    StreamingQuery progress — the blackhole must have swallowed exactly
    count(*) rows, proving the full stream executed end-to-end with no
    materialization."""
    import shutil

    from flink_1_12_0_spark.streaming.core import (
        events_stream,
        to_console,
        to_noop,
    )

    def drain(writer) -> int:
        ckpt = tempfile.mkdtemp(prefix="sg_ckpt_")
        try:
            q = (
                writer.option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            q.stop()
            # sink-side row count (numInputRows would count SOURCE rows,
            # which under a limit() exceed what the sink receives)
            return int(
                sum(p["sink"].get("numOutputRows", 0) for p in q.recentProgress)
            )
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    sdf = events_stream(spark, sf_dir, watermark=None)
    blackhole_rows = drain(to_noop(sdf))
    # print sink: bounded 5-row sample so the console stays readable
    print_rows = drain(to_console(sdf.limit(5), numRows=5, truncate=False))
    return spark.createDataFrame(
        [(blackhole_rows, print_rows)],
        "blackhole_rows bigint, print_rows int",
    )
