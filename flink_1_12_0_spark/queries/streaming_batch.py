"""Streaming operators executed through Structured Streaming, oracle-checked.

Each query here builds a real ``readStream`` pipeline over the events
parquet, runs it bounded (``availableNow`` → memory sink via
``streaming.core.run_to_memory``), and returns the materialized result —
so the driver's DuckDB oracle validates true streaming execution paths:

- streaming tumble / session window aggregation
  (StreamExecGroupWindowAggregateBase.scala:54, WindowOperator.java:98)
- streaming deduplication keep-first
  (StreamExecDeduplicate.scala:58, deduplicate/*.java)
- stream-stream interval join
  (StreamExecIntervalJoin.scala:54, TimeIntervalJoin.java:54)
- stream-static (lookup-style) dimension join
  (CommonLookupJoinRule.scala — Spark re-reads the static side per batch)

Output modes: aggregations run in ``complete`` so the bounded run emits
every window (append would withhold windows past the final watermark —
the same early/late-fire semantics gap WindowEmitStrategy.scala handles);
joins and dedup run in ``append``.

Scale notes: all state lives in the Spark state store (RocksDB-capable);
source parallelism = file/Kafka partition count; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.operators.joins import interval_join
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.streaming.core import events_stream, run_to_memory
from flink_1_12_0_spark.tables import load_tables

_FMT_S = "yyyy-MM-dd HH:mm:ss"
_FMT_D = "%Y-%m-%d %H:%M:%S"


@query(
    "stream_tumble_agg",
    oracle=f"""
    SELECT strftime(epoch_ms(CAST(floor(epoch(ts)/3600)*3600000 AS BIGINT)), '{_FMT_D}') AS w_start,
           event_type,
           count(*) AS cnt,
           round(sum(value), 4) AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY w_start, event_type
    """,
)
def stream_tumble_agg(spark, sf_dir):
    """Streaming TUMBLE(1h) per event_type, complete mode."""
    sdf = events_stream(spark, sf_dir)
    agg = (
        sdf.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.date_format(F.col("window.start"), _FMT_S).alias("w_start"),
            "event_type",
            "cnt",
            "total",
        )
    )
    return run_to_memory(agg, output_mode="complete").orderBy("w_start", "event_type")


@query(
    "stream_session_agg",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 20 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '{_FMT_D}') AS s_start,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, s_start
    """,
)
def stream_session_agg(spark, sf_dir):
    """Streaming SESSION(gap 20 min) per user, complete mode — Spark's
    session_window state-merging path (reference SessionWindowAssigner +
    merging window state)."""
    sdf = events_stream(spark, sf_dir)
    agg = (
        sdf.groupBy(F.session_window("ts", "20 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _FMT_S).alias("s_start"),
            "n_events",
        )
    )
    return run_to_memory(agg, output_mode="complete").orderBy("user_id", "s_start")


@query(
    "stream_dedup_first",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
    """,
)
def stream_dedup_first(spark, sf_dir):
    """Streaming keep-first deduplication on (user_id, event_type) —
    ``dropDuplicates`` over an unbounded stream (state-store backed),
    projecting the key so the result is order-independent."""
    sdf = events_stream(spark, sf_dir, watermark=None)
    dedup = sdf.dropDuplicates(["user_id", "event_type"]).select("user_id", "event_type")
    return run_to_memory(dedup, output_mode="append").orderBy("user_id", "event_type")


@query(
    "stream_interval_join",
    oracle="""
    SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    ORDER BY p_id, c_id
    """,
)
def stream_interval_join(spark, sf_dir):
    """Stream-stream interval join: clicks within 10 min before each
    purchase.  Watermarks on both sides + the time-range condition give
    Spark the state-cleanup bound (Flink holds state by watermark -
    relativeWindow, TimeIntervalJoin.java:54 — same contract)."""
    purchases = events_stream(spark, sf_dir).where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = events_stream(spark, sf_dir).where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = interval_join(
        purchases, clicks, [("user_id", "c_user")], "p_ts", "c_ts",
        lower="10 minutes", upper="0 seconds",
    ).select("p_id", "c_id", "user_id")
    return run_to_memory(j, output_mode="append").orderBy("p_id", "c_id")


@query(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS cnt, round(sum(value), 4) AS total
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream-static join: streaming events against the static customer
    dim (re-read per micro-batch — Spark's lookup-join analog), then a
    streaming aggregation in complete mode."""
    t = load_tables(spark, sf_dir)
    sdf = events_stream(spark, sf_dir, watermark=None)
    joined = sdf.join(t["customer"], sdf.user_id == t["customer"].c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total")
    )
    return run_to_memory(agg, output_mode="complete").orderBy("c_mktsegment")


@query(
    "stream_hop_agg",
    oracle=f"""
    SELECT strftime(epoch_ms(CAST((floor(epoch(ts)/1800) - j) * 1800000 AS BIGINT)), '{_FMT_D}') AS w_start,
           count(*) AS cnt
    FROM events CROSS JOIN range(2) r(j)
    WHERE (floor(epoch(ts)/1800) - j) * 1800 > epoch(ts) - 3600
    GROUP BY 1
    ORDER BY w_start
    """,
)
def stream_hop_agg(spark, sf_dir):
    """Streaming HOP (slide 30 min, size 1 h), complete mode — every event
    lands in 2 overlapping windows."""
    sdf = events_stream(spark, sf_dir)
    agg = (
        sdf.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("cnt"))
        .select(F.date_format(F.col("window.start"), _FMT_S).alias("w_start"), "cnt")
    )
    return run_to_memory(agg, output_mode="complete").orderBy("w_start")


@query(
    "stream_cumulate_agg",
    oracle=f"""
    SELECT strftime(epoch_ms(CAST(floor(epoch(ts)/86400)*86400000 AS BIGINT)), '{_FMT_D}') AS w_start,
           strftime(epoch_ms(CAST((floor(epoch(ts)/86400)*86400 + k*43200)*1000 AS BIGINT)), '{_FMT_D}') AS w_end,
           count(*) AS cnt
    FROM events CROSS JOIN range(1, 3) r(k)
    WHERE epoch(ts) < floor(epoch(ts)/86400)*86400 + k*43200
    GROUP BY 1, 2
    ORDER BY w_start, w_end
    """,
)
def stream_cumulate_agg(spark, sf_dir):
    """Streaming CUMULATE (step 12 h, max 1 day) — the custom exploded
    window assignment running on a stream, complete mode."""
    from flink_1_12_0_spark.operators.windows import cumulate

    sdf = events_stream(spark, sf_dir)
    agg = (
        cumulate(sdf, "ts", "12 hours", "1 day")
        .groupBy("window_start", "window_end")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("window_start", _FMT_S).alias("w_start"),
            F.date_format("window_end", _FMT_S).alias("w_end"),
            "cnt",
        )
    )
    return run_to_memory(agg, output_mode="complete").orderBy("w_start", "w_end")


@query(
    "stream_window_join",
    oracle="""
    SELECT v.user_id,
           strftime(date_trunc('hour', v.ts), '%Y-%m-%d %H:%M:%S') AS w_start,
           v.event_id AS v_id, p.event_id AS p_id
    FROM events v JOIN events p
      ON p.user_id = v.user_id
     AND date_trunc('hour', p.ts) = date_trunc('hour', v.ts)
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    ORDER BY v.user_id, w_start, v_id, p_id
    """,
)
def stream_window_join(spark, sf_dir):
    """DataStream windowed join (JoinedStreams — window both sides, join
    per key within each window, DataStream.java:777): views paired with
    purchases of the same user inside the same 1-hour tumbling window.
    Spark form: assign ``window()`` on each stream and stream-stream join
    on (key, window) equality — watermarks on both sides bound the join
    state to the window horizon (the WindowOperator state-cleanup analog)."""
    views = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select("user_id", F.window("ts", "1 hour").alias("w"),
                F.col("event_id").alias("v_id"))
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"),
                F.window("ts", "1 hour").alias("pw"),
                F.col("event_id").alias("p_id"))
    )
    j = views.join(
        purchases, (views.user_id == purchases.p_user) & (views.w == purchases.pw)
    ).select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "v_id",
        "p_id",
    )
    return run_to_memory(j, output_mode="append").orderBy(
        "user_id", "w_start", "v_id", "p_id"
    )


@query(
    "stream_interval_join_outer",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         wm AS (SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM c))
                       - INTERVAL 10 MINUTE AS w)
    SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    WHERE c.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm)
    ORDER BY p_id, c_id
    """,
)
def stream_interval_join_outer(spark, sf_dir):
    """LEFT OUTER stream-stream interval join — the reference's
    TimeIntervalJoin.java:54 emits padded null rows for left entries whose
    time range closes unmatched; Spark does the same once the watermark
    passes the left row's last possible match time (p_ts, the range's
    upper bound here).  Rows younger than the FINAL watermark
    (min over both streams of max-ts minus the 10-minute delay) are still
    in state when the bounded input ends and are withheld — the oracle
    encodes exactly that as-of-watermark contract, which is also how the
    reference behaves on a bounded run (state never flushes nulls early)."""
    purchases = events_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    ).select(F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts"))
    clicks = events_stream(spark, sf_dir).where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = interval_join(
        purchases, clicks, [("user_id", "c_user")], "p_ts", "c_ts",
        lower="10 minutes", upper="0 seconds", how="left_outer",
    ).select("p_id", "c_id", "user_id")
    return run_to_memory(j, output_mode="append").orderBy("p_id", "c_id")


@query(
    "datastream_max_by",
    oracle="""
    SELECT user_id,
           arg_max(event_type, event_id) AS event_type,
           arg_max(value, event_id)      AS value,
           max(event_id)                 AS event_id
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def datastream_max_by(spark, sf_dir):
    """KeyedStream.maxBy (KeyedStream.java minBy/maxBy): the WHOLE element
    holding the per-key maximum — one struct-valued map-side-combinable
    aggregation, no per-key sort.  Keyed on the unique event_id so the
    extreme is deterministic; the oracle re-derives the same element via
    arg_max."""
    from flink_1_12_0_spark.api.datastream import DataStream

    t = load_tables(spark, sf_dir)
    ks = DataStream(
        t["events"].select("user_id", "event_type", "value", "event_id")
    ).key_by("user_id")
    return ks.max_by("event_id").select(
        "user_id", "event_type", F.col("value"), "event_id"
    ).orderBy("user_id")


@query(
    "async_enrich_nations",
    oracle="""
    SELECT n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1 ORDER BY 1
    """,
)
def async_enrich_nations(spark, sf_dir):
    """Async I/O enrichment (AsyncWaitOperator.java:78 orderedWait):
    customers enriched against an async 'service' (the nation map keyed
    in-process) with bounded in-flight requests, then aggregated — must
    equal the plain broadcast-join oracle."""
    from flink_1_12_0_spark.streaming.async_io import async_enrich

    t = load_tables(spark, sf_dir)
    nations = {
        int(r["n_nationkey"]): r["n_name"] for r in t["nation"].collect()
    }

    async def fetch(key):
        return {"n_name": nations.get(int(key))}

    enriched = async_enrich(
        t["customer"].select("c_custkey", "c_nationkey", "c_acctbal"),
        key="c_nationkey",
        fetch_async=fetch,
        out_fields=[("n_name", "string")],
        capacity=64,
    )
    return (
        enriched.groupBy(F.col("r_n_name").alias("n_name"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
        .orderBy("n_name")
    )


@query(
    "stream_side_outputs",
    oracle="""
    SELECT route, count(*) AS cnt
    FROM (SELECT CASE WHEN event_type = 'error' THEN 'errors'
                      WHEN event_type = 'purchase' THEN 'purchases'
                      ELSE 'rest' END AS route
          FROM events)
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_side_outputs(spark, sf_dir):
    """Side outputs (OutputTag + ctx.output): one upstream plan routed to
    three filtered views (errors / purchases / catch-all), each counted
    and unioned back — the Spark expression of per-tag side channels."""
    from flink_1_12_0_spark.streaming.core import split_stream

    t = load_tables(spark, sf_dir)
    routes = split_stream(
        t["events"],
        {
            "errors": "event_type = 'error'",
            "purchases": "event_type = 'purchase'",
            "rest": "event_type NOT IN ('error', 'purchase')",
        },
    )
    parts = [
        df.agg(F.lit(name).alias("route"), F.count("*").alias("cnt"))
        for name, df in sorted(routes.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("route")


@query(
    "datastream_coflatmap",
    oracle="""
    SELECT id, tag, v FROM (
        SELECT o_orderkey AS id, 'order' AS tag, o_totalprice AS v
        FROM orders
        UNION ALL
        SELECT o_orderkey AS id, 'big_order' AS tag, o_totalprice AS v
        FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT c_custkey AS id, 'customer' AS tag, c_acctbal AS v
        FROM customer WHERE c_acctbal > 0
    ) t ORDER BY tag, id
    """,
)
def datastream_coflatmap(spark, sf_dir):
    """ConnectedStreams.flatMap — CoFlatMapFunction
    (flink-streaming-java .../datastream/ConnectedStreams.java:275): two
    typed inputs flow through ONE operator whose per-side functions each
    emit ZERO OR MORE rows into a shared output type.  f1 fans orders out
    to 1-or-2 rows (every order + a 'big_order' echo above the
    threshold); f2 drops non-positive-balance customers (0-or-1 rows) —
    the asymmetric fan-out the row-contract exists for."""
    from flink_1_12_0_spark.api.datastream import DataStream

    t = load_tables(spark, sf_dir)

    def f1(r):
        yield {"id": r["o_orderkey"], "tag": "order", "v": r["o_totalprice"]}
        if r["o_totalprice"] > 400000:
            yield {"id": r["o_orderkey"], "tag": "big_order", "v": r["o_totalprice"]}

    def f2(r):
        if r["c_acctbal"] > 0:
            yield {"id": r["c_custkey"], "tag": "customer", "v": r["c_acctbal"]}

    left = DataStream(t["orders"].select("o_orderkey", "o_totalprice"))
    right = DataStream(t["customer"].select("c_custkey", "c_acctbal"))
    out = left.connect(right).flat_map(f1, f2, "id bigint, tag string, v double")
    return out.to_table().orderBy("tag", "id")
