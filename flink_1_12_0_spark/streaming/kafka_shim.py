"""Kafka-shaped connector surface over a file-backed topic double.

Reference: flink-connectors/flink-connector-kafka —
KafkaDynamicSource.java / KafkaDynamicSink.java (record = key bytes,
value bytes, topic, partition, offset, timestamp; keyed partitioning;
per-partition monotonic offsets) and the upsert-kafka factory
(UpsertKafkaDynamicTableFactory.java: keyed changelog, NULL value =
tombstone, latest-offset-per-key materialization).

The container has no broker, so the transport is a parquet directory that
preserves EXACTLY the Kafka record shape and ordering contract:

- records: ``key string, value string, topic string, partition int,
  offset bigint, timestamp timestamp`` — the Kafka consumer record
  metadata columns Flink exposes;
- a key is hashed to one partition (murmur-style ``hash(key) % n``), and
  offsets are monotonic within a partition across appends — so
  "latest offset per key" is well-defined, as on a real broker;
- value is a JSON document (the 'format' = 'json' path), NULL for
  tombstones.

On a cluster with a real broker the same call sites swap to
``spark.readStream.format("kafka")`` + ``from_json(value)`` — the record
schema and the upsert materialization below are unchanged; only the
transport differs.  Offset assignment reads only the per-partition max
offsets (n rows) to the driver — metadata, not data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RECORD_SCHEMA = (
    "key string, value string, topic string, partition int, "
    "offset bigint, timestamp timestamp"
)


def topic_write(
    df: DataFrame,
    topic_dir: str,
    key_col,
    value_col,
    ts_col: str,
    topic: str = "topic",
    n_partitions: int = 4,
    order_by=None,
) -> None:
    """Produce rows to the topic: key-hash partitioning + per-partition
    monotonic offsets continuing from the current high-water mark (the
    KafkaDynamicSink contract).  ``key_col``/``value_col`` are Columns (use
    ``to_json(struct(...))`` for the value); ``order_by`` fixes the
    within-partition append order (default: the timestamp column)."""
    spark = df.sparkSession
    rec = df.select(
        key_col.cast("string").alias("key"),
        value_col.cast("string").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.hash(key_col.cast("string")), F.lit(n_partitions))
        .cast("int")
        .alias("partition"),
        F.col(ts_col).alias("timestamp"),
        *([c.alias("_ord") for c in [order_by]] if order_by is not None else []),
    )
    ord_col = "_ord" if order_by is not None else "timestamp"
    bases = {int(p): 0 for p in range(n_partitions)}
    if os.path.exists(topic_dir):
        for r in (
            spark.read.parquet(topic_dir)
            .groupBy("partition")
            .agg(F.max("offset").alias("m"))
            .collect()
        ):
            bases[int(r["partition"])] = int(r["m"]) + 1
    from flink_1_12_0_spark.streaming.core import local_table

    base_df = local_table(
        spark, [(p, b) for p, b in bases.items()],
        "partition int, _base bigint"
    )
    w = Window.partitionBy("partition").orderBy(ord_col, "key")
    out = (
        rec.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(base_df), "partition")
        .withColumn("offset", (F.col("_base") + F.col("_rn") - 1).cast("bigint"))
        .drop("_rn", "_base", *(["_ord"] if order_by is not None else []))
        .select("key", "value", "topic", "partition", "offset", "timestamp")
    )
    out.write.mode("append").parquet(topic_dir)


def topic_read_batch(spark: SparkSession, topic_dir: str) -> DataFrame:
    """Consume the whole topic as a batch table (bounded scan mode)."""
    return spark.read.parquet(topic_dir)


def startup_filter(records: DataFrame, options: dict | None) -> DataFrame:
    """KafkaDynamicSource startup modes (flink-connector-kafka
    KafkaOptions SCAN_STARTUP_MODE / KafkaDynamicSource startup config):

    - ``earliest-offset`` (default): the whole topic;
    - ``timestamp`` + ``scan.startup.timestamp-millis``: records whose
      broker timestamp is at or after the given epoch millis;
    - ``specific-offsets`` + ``scan.startup.specific-offsets``
      (``partition:0,offset:42;partition:1,offset:300``): per-partition
      start offsets, inclusive; partitions not listed start at earliest;
    - ``latest-offset``: on this BOUNDED batch read nothing arrives after
      the high-water mark, so the scan is empty (on a real broker this
      mode only matters for unbounded consumption).

    A pure filter over the record metadata columns — predicate pushdown
    prunes at the scan, no extra pass."""
    opts = options or {}
    mode = opts.get("scan.startup.mode", "earliest-offset")
    if mode == "earliest-offset":
        return records
    if mode == "latest-offset":
        return records.where(F.lit(False))
    if mode == "timestamp":
        ms = int(opts["scan.startup.timestamp-millis"])
        return records.where(F.col("timestamp") >= F.timestamp_millis(F.lit(ms)))
    if mode == "specific-offsets":
        cond = None
        listed = []
        for part in opts["scan.startup.specific-offsets"].split(";"):
            d = dict(kv.split(":", 1) for kv in part.strip().split(","))
            p, o = int(d["partition"]), int(d["offset"])
            listed.append(p)
            term = (F.col("partition") == p) & (F.col("offset") >= o)
            cond = term if cond is None else (cond | term)
        return records.where(~F.col("partition").isin(listed) | cond)
    raise NotImplementedError(f"scan.startup.mode {mode!r}")


def topic_read_stream(spark: SparkSession, topic_dir: str) -> DataFrame:
    """Consume the topic as a stream — new files are new records, the file
    source's analog of partition tailing."""
    return spark.readStream.schema(RECORD_SCHEMA).parquet(topic_dir)


def json_table_source(
    records: DataFrame, value_schema: str, keep_meta: bool = False
) -> DataFrame:
    """'format' = 'json' decode: expand the value document into columns
    (JsonRowDataDeserializationSchema).  ``keep_meta`` retains the Kafka
    metadata columns (the reference's metadata virtual columns)."""
    parsed = records.withColumn("_v", F.from_json("value", value_schema))
    cols = [F.col("_v." + f) for f in parsed.select("_v.*").columns]
    if keep_meta:
        cols = [F.col(c) for c in records.columns if c != "value"] + cols
    return parsed.select(*cols)


def _validate_raw_options(options: dict | None) -> None:
    """RawFormatFactory option contract (flink-table-runtime-blink/.../
    formats/raw/RawFormatFactory.java:55: IDENTIFIER='raw', CHARSET
    default UTF-8, ENDIANNESS default big-endian).  The topic double
    transports a TEXTUAL rendering in its string value column, so only
    the defaults are honest here; a real broker deployment swaps in true
    byte arrays where both options take effect."""
    opts = options or {}
    charset = opts.get("raw.charset", opts.get("charset", "UTF-8"))
    if charset.upper().replace("_", "").replace("-", "") != "UTF8":
        raise NotImplementedError(f"raw format charset {charset!r} (UTF-8 only)")
    endian = opts.get("raw.endianness", opts.get("endianness", "big-endian"))
    if endian != "big-endian":
        raise NotImplementedError(
            "raw format little-endian needs a byte-array transport "
            "(the file-backed double renders values textually)"
        )


def raw_value_encode(col, col_type: str):
    """'format' = 'raw' serialize (RawFormatSerializationSchema): the
    single physical column becomes the record value — STRING verbatim,
    BYTES as base64 text, numerics/boolean as their canonical decimal
    rendering (textual stand-ins for the byte encodings; lossless and
    order-preserving round trips)."""
    c = F.col(col) if isinstance(col, str) else col
    ty = col_type.strip().upper()
    if ty in ("BYTES", "BINARY", "VARBINARY"):
        return F.base64(c)
    return c if ty in ("STRING", "VARCHAR", "CHAR") else c.cast("string")


def raw_table_source(
    records: DataFrame, column: str, col_type: str,
    keep_meta: bool = False, options: dict | None = None,
) -> DataFrame:
    """'format' = 'raw' decode (RawFormatDeserializationSchema): the record
    value deserializes into the table's SINGLE physical column."""
    _validate_raw_options(options)
    ty = col_type.strip().upper()
    if ty in ("BYTES", "BINARY", "VARBINARY"):
        val = F.unbase64("value")
    else:
        val = F.col("value").cast(col_type)
    cols = ([F.col(c) for c in records.columns if c != "value"] if keep_meta else [])
    return records.select(*cols, val.alias(column))


def upsert_topic_view(records: DataFrame, value_schema: str) -> DataFrame:
    """upsert-kafka source materialization: latest-offset record per key
    wins; a NULL value is a tombstone that deletes the key
    (UpsertKafkaDynamicTableFactory + ChangelogNormalize).  Fully
    declarative — one window over (partition, offset); a key lives in one
    partition, so offset order IS the key's history order."""
    w = Window.partitionBy("key").orderBy(
        F.col("offset").desc(), F.col("partition").desc()
    )
    latest = (
        records.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    live = latest.where(F.col("value").isNotNull())
    return json_table_source(live, value_schema, keep_meta=True)


def topic_write_stream(
    sdf: DataFrame,
    topic_dir: str,
    key_col,
    value_col,
    ts_col: str,
    topic: str = "topic",
    n_partitions: int = 4,
    timeout_s: int = 300,
) -> None:
    """Streaming producer: each micro-batch appends to the topic with
    offsets continuing from the high-water mark — the KafkaDynamicSink
    write path over foreachBatch (exactly-once per batch id comes from
    the checkpointed source offsets, as with the real sink's
    transactional producer)."""
    from flink_1_12_0_spark.streaming.core import run_foreach_batch

    def sink(batch_df, _batch_id):
        topic_write(
            batch_df, topic_dir, key_col=key_col, value_col=value_col,
            ts_col=ts_col, topic=topic, n_partitions=n_partitions,
        )

    run_foreach_batch(sdf, sink, output_mode="append", timeout_s=timeout_s)
