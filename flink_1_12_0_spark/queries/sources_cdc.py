"""Source/format queries: CSV/JSON roundtrips and CDC envelope pipelines.

The CDC queries simulate a Kafka topic of change envelopes (built
deterministically from ``orders`` with ``to_json``), decode them with the
engine's debezium/canal/maxwell decoders, normalize the changelog
(ChangelogNormalize analog), and aggregate the materialized state.  The
oracle computes the same final state directly from ``orders`` — so the
whole decode → retract/upsert → normalize path is value-checked.

Reference: flink-formats/flink-json {debezium,canal,maxwell},
StreamExecChangelogNormalize.scala:46, FileSystemTableSource.java:72.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.sources.cdc import (
    changelog_apply,
    decode_canal,
    decode_debezium,
    decode_maxwell,
)
from flink_1_12_0_spark.operators.joins import temporal_join
from flink_1_12_0_spark.sources.formats import enforce_not_null, read_table, write_table
from flink_1_12_0_spark.tables import load_tables

_VAL = "o_orderkey: bigint, o_orderstatus: string, o_totalprice: double"
_VAL_STRUCT = f"struct<{_VAL}>"


def _order_struct(price_col):
    return F.struct(
        F.col("o_orderkey"), F.col("o_orderstatus"), price_col.alias("o_totalprice")
    )


@query(
    "cdc_debezium_apply",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS cnt,
           CAST(sum(CAST(round((CASE WHEN o_orderstatus = 'O'
                                     THEN o_totalprice * 1.1
                                     ELSE o_totalprice END) * 10000)
                         AS BIGINT)) AS BIGINT) AS total_e4
    FROM orders WHERE o_orderkey % 10 <> 0
    GROUP BY 1 ORDER BY 1
    """,
)
def cdc_debezium_apply(spark, sf_dir):
    """Debezium: insert all orders, update (price×1.1) open orders with a
    -U/+U pair, delete every 10th order; decode + normalize + aggregate."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    null_row = F.lit(None).cast(_VAL_STRUCT)
    inserts = o.select(
        F.to_json(
            F.struct(
                null_row.alias("before"),
                _order_struct(F.col("o_totalprice")).alias("after"),
                F.lit("c").alias("op"),
                F.lit(1).cast("bigint").alias("ts_ms"),
            )
        ).alias("value")
    )
    updates = o.where(F.col("o_orderstatus") == "O").select(
        F.to_json(
            F.struct(
                _order_struct(F.col("o_totalprice")).alias("before"),
                _order_struct(F.col("o_totalprice") * 1.1).alias("after"),
                F.lit("u").alias("op"),
                F.lit(2).cast("bigint").alias("ts_ms"),
            )
        ).alias("value")
    )
    deletes = o.where(F.col("o_orderkey") % 10 == 0).select(
        F.to_json(
            F.struct(
                _order_struct(F.col("o_totalprice")).alias("before"),
                null_row.alias("after"),
                F.lit("d").alias("op"),
                F.lit(3).cast("bigint").alias("ts_ms"),
            )
        ).alias("value")
    )
    topic = inserts.unionAll(updates).unionAll(deletes)
    state = changelog_apply(decode_debezium(topic, "value", _VAL), ["o_orderkey"])
    return (
        state.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            # fixed-point 1e-4 units: the updated price (2dp * 1.1) is an
            # exact 3dp decimal, so per-row rounding is deterministic and
            # the BIGINT sum is accumulation-order-free
            F.sum(F.round(F.col("o_totalprice") * 10000).cast("bigint"))
            .cast("bigint")
            .alias("total_e4"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "cdc_canal_apply",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(sum(CAST(round((CASE WHEN o_orderstatus = 'F'
                                     THEN o_totalprice * 1.2
                                     ELSE o_totalprice END) * 10000)
                         AS BIGINT)) AS BIGINT) AS total_e4
    FROM orders WHERE o_orderkey % 7 <> 0
    """,
)
def cdc_canal_apply(spark, sf_dir):
    """Canal: INSERT all (batched data arrays), UPDATE (price×1.2) filled
    orders with old-image arrays, DELETE every 7th order."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    inserts = o.select(
        F.to_json(
            F.struct(
                F.array(_order_struct(F.col("o_totalprice"))).alias("data"),
                F.lit(None).cast(f"array<{_VAL_STRUCT}>").alias("old"),
                F.lit("INSERT").alias("type"),
                F.lit(1).cast("bigint").alias("ts"),
            )
        ).alias("value")
    )
    updates = o.where(F.col("o_orderstatus") == "F").select(
        F.to_json(
            F.struct(
                F.array(_order_struct(F.col("o_totalprice") * 1.2)).alias("data"),
                F.array(_order_struct(F.col("o_totalprice"))).alias("old"),
                F.lit("UPDATE").alias("type"),
                F.lit(2).cast("bigint").alias("ts"),
            )
        ).alias("value")
    )
    deletes = o.where(F.col("o_orderkey") % 7 == 0).select(
        F.to_json(
            F.struct(
                F.array(_order_struct(F.col("o_totalprice") * 1.2)).alias("data"),
                F.lit(None).cast(f"array<{_VAL_STRUCT}>").alias("old"),
                F.lit("DELETE").alias("type"),
                F.lit(3).cast("bigint").alias("ts"),
            )
        ).alias("value")
    )
    topic = inserts.unionAll(updates).unionAll(deletes)
    state = changelog_apply(decode_canal(topic, "value", _VAL), ["o_orderkey"])
    return state.agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.col("o_totalprice") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("total_e4"),
    )


@query(
    "cdc_maxwell_apply",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(sum(CAST(round((CASE WHEN o_orderstatus = 'P'
                                     THEN o_totalprice + 5
                                     ELSE o_totalprice END) * 10000)
                         AS BIGINT)) AS BIGINT) AS total_e4
    FROM orders WHERE o_orderkey % 5 <> 0
    """,
)
def cdc_maxwell_apply(spark, sf_dir):
    """Maxwell: insert all, update (price+5) pending orders, delete every
    5th order."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    null_row = F.lit(None).cast(_VAL_STRUCT)
    inserts = o.select(
        F.to_json(
            F.struct(
                _order_struct(F.col("o_totalprice")).alias("data"),
                null_row.alias("old"),
                F.lit("insert").alias("type"),
                F.lit(1).cast("bigint").alias("ts"),
            )
        ).alias("value")
    )
    updates = o.where(F.col("o_orderstatus") == "P").select(
        F.to_json(
            F.struct(
                _order_struct(F.col("o_totalprice") + 5).alias("data"),
                _order_struct(F.col("o_totalprice")).alias("old"),
                F.lit("update").alias("type"),
                F.lit(2).cast("bigint").alias("ts"),
            )
        ).alias("value")
    )
    deletes = o.where(F.col("o_orderkey") % 5 == 0).select(
        F.to_json(
            F.struct(
                _order_struct(F.col("o_totalprice") + 5).alias("data"),
                null_row.alias("old"),
                F.lit("delete").alias("type"),
                F.lit(3).cast("bigint").alias("ts"),
            )
        ).alias("value")
    )
    topic = inserts.unionAll(updates).unionAll(deletes)
    state = changelog_apply(decode_maxwell(topic, "value", _VAL), ["o_orderkey"])
    return state.agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.col("o_totalprice") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("total_e4"),
    )


@query(
    "src_csv_roundtrip",
    oracle="""
    SELECT r_name, count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1 ORDER BY 1
    """,
)
def src_csv_roundtrip(spark, sf_dir):
    """CSV format roundtrip: write nation+region as headered CSV, read
    back with explicit schemas, join and aggregate."""
    t = load_tables(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="sg_csv_")
    write_table(t["nation"], os.path.join(d, "nation"), "csv")
    write_table(t["region"], os.path.join(d, "region"), "csv")
    n = read_table(spark, os.path.join(d, "nation"), "csv", schema=t["nation"].schema)
    r = read_table(spark, os.path.join(d, "region"), "csv", schema=t["region"].schema)
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
        .orderBy("r_name")
    )


@query(
    "src_json_partitioned",
    oracle="""
    SELECT c_nationkey, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    GROUP BY 1 ORDER BY 1
    """,
)
def src_json_partitioned(spark, sf_dir):
    """JSON-lines sink partitioned by segment + partition-pruned read:
    only the BUILDING partition directory is scanned (the reference's
    filesystem partition pruning; Spark PartitionFilters)."""
    t = load_tables(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="sg_json_")
    write_table(t["customer"], d, "json", partition_by=["c_mktsegment"])
    back = read_table(spark, d, "json", schema=t["customer"].schema)
    return (
        back.where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
        .orderBy("c_nationkey")
    )


@query(
    "src_kafka_upsert_roundtrip",
    oracle="""
    SELECT user_id, last_event_id, round(last_value, 4) AS last_value
    FROM (SELECT user_id, event_id AS last_event_id, value AS last_value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE event_type = 'purchase')
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def src_kafka_upsert_roundtrip(spark, sf_dir):
    """The kafka / upsert-kafka connector surface end to end over the
    file-backed topic double: purchases are PRODUCED keyed by user (key-
    hash partitioning, per-partition monotonic offsets, JSON values), then
    the upsert source materializes latest-offset-per-key — the reference's
    KafkaDynamicSink → UpsertKafkaDynamicTableFactory round trip."""
    from flink_1_12_0_spark.streaming.kafka_shim import (
        topic_read_batch,
        topic_write,
        upsert_topic_view,
    )

    t = load_tables(spark, sf_dir)
    purchases = t["events"].where(F.col("event_type") == "purchase")
    topic_dir = os.path.join(tempfile.mkdtemp(prefix="sg_topic_"), "purchases")
    topic_write(
        purchases,
        topic_dir,
        key_col=F.col("user_id"),
        value_col=F.to_json(F.struct("event_id", "value")),
        ts_col="ts",
        order_by=F.struct("ts", "event_id"),
    )
    view = upsert_topic_view(
        topic_read_batch(spark, topic_dir), "event_id bigint, value double"
    )
    return view.select(
        F.col("key").cast("bigint").alias("user_id"),
        F.col("event_id").alias("last_event_id"),
        F.round("value", 4).alias("last_value"),
    ).orderBy("user_id")


@query(
    "src_orc_roundtrip",
    oracle="""
    SELECT n_regionkey, count(*) AS cnt,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY 1 ORDER BY 1
    """,
)
def src_orc_roundtrip(spark, sf_dir):
    """ORC format roundtrip (reference flink-orc): write nation as ORC,
    read it back, aggregate — proves the format path end to end (the
    oracle runs on the original parquet, so any roundtrip corruption
    hash-mismatches)."""
    t = load_tables(spark, sf_dir)
    d = os.path.join(tempfile.mkdtemp(prefix="sg_orc_"), "nation_orc")
    write_table(t["nation"], d, fmt="orc")
    back = read_table(spark, d, fmt="orc")
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "src_jdbc_roundtrip",
    oracle="""
    SELECT n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0
    GROUP BY 1 ORDER BY 1
    """,
)
def src_jdbc_roundtrip(spark, sf_dir):
    """JDBC connector end to end against embedded Derby: customer is
    written through the JDBC sink (parallel batched INSERTs), read back
    through the JDBC source as a 4-way parallel range-partitioned scan
    on c_custkey with the acctbal filter pushed into the remote SQL
    (PushedFilters in the plan), then joined to nation and aggregated.
    Reference: flink-connector-jdbc JdbcDynamicTableSource/Sink."""
    from flink_1_12_0_spark.sources.jdbc import derby_url, read_jdbc, write_jdbc

    t = load_tables(spark, sf_dir)
    url = derby_url()
    write_jdbc(t["customer"], url, "customer")
    hi = t["customer"].agg(F.max("c_custkey")).first()[0] + 1
    back = read_jdbc(
        spark,
        url,
        "customer",
        partition_column="c_custkey",
        lower_bound=0,
        upper_bound=hi,
        num_partitions=4,
    )
    return (
        back.where(F.col("c_acctbal") > 0)
        .join(F.broadcast(t["nation"]), back.c_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
        .orderBy("n_name")
    )


@query(
    "src_partitioned_pruning",
    oracle="""
    SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS total
    FROM events WHERE event_type IN ('purchase', 'error')
    GROUP BY 1 ORDER BY 1
    """,
)
def src_partitioned_pruning(spark, sf_dir):
    """Hive-partitioned filesystem layout: events written partitioned by
    event_type, re-read with a partition filter — the scan must prune to
    the two matching directories (PartitionFilters — asserted in
    tests/test_dialect_and_plans.py), the reference's partitioned
    filesystem source (FileSystemTableSource partition pruning)."""
    t = load_tables(spark, sf_dir)
    d = os.path.join(tempfile.mkdtemp(prefix="sg_part_"), "events_part")
    write_table(t["events"], d, partition_by=["event_type"])
    back = read_table(spark, d)
    return (
        back.where(F.col("event_type").isin("purchase", "error"))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy("event_type")
    )


@query(
    "cdc_temporal_pipeline",
    oracle="""
    WITH v AS (
        SELECT c_custkey, c_acctbal AS bal, 1 AS vts FROM customer
        UNION ALL
        SELECT c_custkey, c_acctbal + 100, 2 FROM customer WHERE c_custkey % 3 = 0),
    f AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS ots
        FROM orders WHERE o_orderkey < 2000),
    j AS (
        SELECT f.o_orderkey, f.o_custkey, v.bal,
               row_number() OVER (PARTITION BY f.o_orderkey
                                  ORDER BY v.vts DESC) AS rn
        FROM f JOIN v ON v.c_custkey = f.o_custkey AND v.vts <= f.ots)
    SELECT o_orderkey, o_custkey, round(bal, 2) AS bal_at_order
    FROM j WHERE rn = 1 ORDER BY o_orderkey
    """,
)
def cdc_temporal_pipeline(spark, sf_dir):
    """The flagship reference composition: a CDC changelog source feeding a
    versioned table consumed by a temporal join (debezium-cdc connector +
    FOR SYSTEM_TIME AS OF — the documented Flink CDC pattern).  Customer
    balances arrive as a debezium stream (insert at version-ts 1, update
    +100 at version-ts 2 for every third customer); order facts probe the
    version valid at their own timestamp.  The decode is from_json+explode
    (JVM-side), version history keeps the +I/+U after-images with their
    ts_ms as the version time, and the join is the union-tag as-of engine
    — one shuffle, one sort, no per-row state."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    val = "c_custkey bigint, bal double"
    struct = lambda bal: F.struct(  # noqa: E731
        F.col("c_custkey").cast("long").alias("c_custkey"), bal.alias("bal")
    )
    null_row = F.lit(None).cast(f"struct<{val}>")
    inserts = c.select(F.to_json(F.struct(
        null_row.alias("before"), struct(F.col("c_acctbal")).alias("after"),
        F.lit("c").alias("op"), F.lit(1).cast("bigint").alias("ts_ms"))).alias("value"))
    updates = c.where(F.col("c_custkey") % 3 == 0).select(F.to_json(F.struct(
        struct(F.col("c_acctbal")).alias("before"),
        struct(F.col("c_acctbal") + 100).alias("after"),
        F.lit("u").alias("op"), F.lit(2).cast("bigint").alias("ts_ms"))).alias("value"))
    changelog = decode_debezium(inserts.unionAll(updates), "value", val)
    versions = changelog.where(F.col("row_kind").isin("+I", "+U")).select(
        "c_custkey", "bal", F.col("seq").alias("vts")
    )
    facts = t["orders"].where(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        (F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(2))
        .cast("bigint").alias("ots"),
    )
    j = temporal_join(facts, versions, ["c_custkey"], "ots", "vts", ["bal"])
    return j.select(
        "o_orderkey",
        F.col("c_custkey").alias("o_custkey"),
        F.round("r_bal", 2).alias("bal_at_order"),
    ).orderBy("o_orderkey")


@query(
    "src_kafka_raw_roundtrip",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def src_kafka_raw_roundtrip(spark, sf_dir):
    """'format' = 'raw' over the kafka-shaped transport
    (RawFormatFactory.java:55: single-column byte/value payload): document
    texts are produced as raw record values keyed by doc, read back
    through a raw-format DDL table, and re-aggregated — any payload
    corruption or row loss hash-mismatches against the original table.
    The source string rides in the record KEY (raw tables carry exactly
    one physical column)."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment
    from flink_1_12_0_spark.streaming.kafka_shim import raw_value_encode, topic_write

    t = load_tables(spark, sf_dir)
    topic_dir = os.path.join(tempfile.mkdtemp(prefix="sg_topic_"), "raw_docs")
    docs = t["documents"].withColumn(
        "_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    topic_write(
        docs,
        topic_dir,
        key_col=F.concat_ws("|", "source", "doc_id"),
        value_col=raw_value_encode("text", "STRING"),
        ts_col="_ts",
        order_by=F.col("doc_id"),
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE raw_docs (text STRING) WITH (
            'connector' = 'kafka', 'topic' = 'raw_docs',
            'path' = '{topic_dir}', 'format' = 'raw')""")
    return spark.sql("""
        SELECT split_part(key, '|', 1) AS source,
               count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_chars
        FROM raw_docs
        GROUP BY source ORDER BY source
    """)


@query(
    "src_datagen_sequence",
    oracle="""
    SELECT CAST(k % 7 AS BIGINT) AS bucket, count(*) AS n,
           CAST(sum(k) AS BIGINT) AS ksum
    FROM (SELECT unnest(range(0, 1000)) AS k)
    GROUP BY 1 ORDER BY 1
    """,
)
def src_datagen_sequence(spark, sf_dir):
    """DataGen DDL connector (DataGenTableSourceFactory.java: fields.<f>.
    kind = sequence with start/end, source bounded by sequence
    exhaustion): a 1000-row sequence table generated engine-side,
    aggregated modulo 7 — the oracle regenerates the same sequence with
    DuckDB range(), so generator drift (off-by-one bounds, wrong
    cardinality) hash-mismatches."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE seq_gen (k BIGINT) WITH (
            'connector' = 'datagen',
            'fields.k.kind' = 'sequence',
            'fields.k.start' = '0', 'fields.k.end' = '999')""")
    return spark.sql("""
        SELECT CAST(k % 7 AS BIGINT) AS bucket, count(*) AS n,
               CAST(sum(k) AS BIGINT) AS ksum
        FROM seq_gen GROUP BY 1 ORDER BY 1
    """)


@query(
    "src_kafka_tombstones",
    oracle="""
    SELECT user_id, last_event_id
    FROM (SELECT user_id, event_id AS last_event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE event_type = 'purchase')
    WHERE rn = 1 AND user_id % 5 <> 0
    ORDER BY user_id
    """,
)
def src_kafka_tombstones(spark, sf_dir):
    """upsert-kafka NULL-value tombstones (UpsertKafkaDynamicTableFactory:
    a NULL record value DELETES the key): purchases are produced keyed by
    user, then a second produce round appends a tombstone for every 5th
    user; the materialized view must drop exactly those keys.  The oracle
    recomputes latest-per-user minus the tombstoned users."""
    from flink_1_12_0_spark.streaming.kafka_shim import (
        topic_read_batch,
        topic_write,
        upsert_topic_view,
    )

    t = load_tables(spark, sf_dir)
    purchases = t["events"].where(F.col("event_type") == "purchase")
    topic_dir = os.path.join(tempfile.mkdtemp(prefix="sg_topic_"), "tombs")
    topic_write(
        purchases, topic_dir,
        key_col=F.col("user_id"),
        value_col=F.to_json(F.struct("event_id")),
        ts_col="ts",
        order_by=F.struct("ts", "event_id"),
    )
    # tombstone round: NULL values for every 5th user (later offsets win)
    tombs = (
        purchases.where(F.col("user_id") % 5 == 0)
        .select("user_id").distinct()
        .withColumn("_ts", F.to_timestamp(F.lit("2030-01-01 00:00:00")))
    )
    topic_write(
        tombs, topic_dir,
        key_col=F.col("user_id"),
        value_col=F.lit(None).cast("string"),
        ts_col="_ts",
        order_by=F.col("user_id"),
    )
    view = upsert_topic_view(topic_read_batch(spark, topic_dir), "event_id bigint")
    return view.select(
        F.col("key").cast("bigint").alias("user_id"),
        F.col("event_id").alias("last_event_id"),
    ).orderBy("user_id")


@query(
    "src_sink_not_null_drop",
    oracle="""
    SELECT o_orderpriority, count(*) AS cnt,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_e2
    FROM orders WHERE o_orderkey % 7 <> 0
    GROUP BY 1 ORDER BY 1
    """,
)
def src_sink_not_null_drop(spark, sf_dir):
    """Sink NOT NULL enforcement, drop mode (SinkNotNullEnforcer.java /
    table.exec.sink.not-null-enforcer=drop): a deterministically
    NULLed-out column (every 7th order) is dropped at the sink boundary;
    the readback aggregate equals the oracle's filter.  The write goes
    through the filesystem sink path end to end."""
    t = load_tables(spark, sf_dir)
    nulled = t["orders"].withColumn(
        "clerk_nn",
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderstatus")),
    )
    enforced = enforce_not_null(nulled, ["clerk_nn"], mode="drop")
    out_dir = os.path.join(tempfile.mkdtemp(prefix="sg_nn_"), "orders_nn")
    enforced.write.mode("overwrite").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("total_e2"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "src_kafka_startup_timestamp",
    oracle="""
    SELECT user_id, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events
    WHERE event_type = 'purchase' AND ts >= TIMESTAMP '1998-07-01'
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def src_kafka_startup_timestamp(spark, sf_dir):
    """Kafka startup modes + FLIP-113 dynamic options end to end: purchases
    are produced to the topic double, the table is registered with the
    DEFAULT earliest-offset scan, and the query reads it through a
    ``/*+ OPTIONS('scan.startup.mode'='timestamp', ...) */`` hint — the
    per-query override re-resolves the source so only records with broker
    timestamp >= the cutoff are consumed (KafkaDynamicSource startup
    config via FlinkHintStrategies).  The oracle filters the original
    events identically."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment
    from flink_1_12_0_spark.streaming.kafka_shim import topic_write

    t = load_tables(spark, sf_dir)
    purchases = t["events"].where(F.col("event_type") == "purchase")
    topic_dir = os.path.join(tempfile.mkdtemp(prefix="sg_topic_"), "purchases")
    topic_write(
        purchases,
        topic_dir,
        key_col=F.col("user_id"),
        value_col=F.to_json(F.struct("event_id", "value")),
        ts_col="ts",
        order_by=F.struct("ts", "event_id"),
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE k_startup_src (event_id BIGINT, value DOUBLE)
        WITH ('connector' = 'kafka', 'path' = '{topic_dir}',
              'format' = 'json')
    """)
    # 1998-07-01T00:00:00Z
    return env.execute_sql("""
        SELECT CAST(key AS BIGINT) AS user_id,
               count(*) AS n,
               CAST(sum(event_id) AS BIGINT) AS id_sum
        FROM k_startup_src /*+ OPTIONS(
            'scan.startup.mode' = 'timestamp',
            'scan.startup.timestamp-millis' = '899251200000') */
        GROUP BY CAST(key AS BIGINT)
        ORDER BY user_id
    """)
