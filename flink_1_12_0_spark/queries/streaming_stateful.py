"""Stateful streaming operator queries: keep-last dedup, streaming Top-N,
streaming OVER, count windows — all custom state ops executed through
``applyInPandasWithState`` and validated against batch SQL oracles.

Reference: StreamExecDeduplicate.scala:58 (keep-last),
StreamExecRank.scala:52 / UpdatableTopNFunction.java (Top-N),
StreamExecOverAggregate.scala:52 / RowTimeRangeBoundedPrecedingFunction.java:61
(time-range OVER), CountTumblingWindowAssigner (count windows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.streaming.core import events_stream, run_to_memory
from flink_1_12_0_spark.streaming.stateful import (
    count_tumble_window,
    dedup_keep_last,
    streaming_over_time_range,
    streaming_topn,
)

_FMT_D = "%Y-%m-%d %H:%M:%S"


@query(
    "stream_dedup_keep_last",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM (SELECT user_id, event_type, event_id, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_keep_last(spark, sf_dir):
    """Keep-LAST dedup per (user_id, event_type) by (ts, event_id)."""
    sdf = events_stream(spark, sf_dir, watermark=None).select(
        "user_id", "event_type", "event_id", "value", "ts"
    )
    out = dedup_keep_last(sdf, ["user_id", "event_type"], "ts", "event_id")
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    )


@query(
    "stream_topn_per_user",
    oracle="""
    SELECT user_id, CAST(rn AS INT) AS rank, event_id, value
    FROM (SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events WHERE event_type = 'purchase')
    WHERE rn <= 3
    ORDER BY user_id, rank
    """,
)
def stream_topn_per_user(spark, sf_dir):
    """Streaming Top-3 purchases by value per user (state = top-k buffer)."""
    sdf = events_stream(spark, sf_dir, watermark=None).where(
        F.col("event_type") == "purchase"
    ).select("user_id", "event_id", "value")
    out = streaming_topn(
        sdf, ["user_id"], order_col="value", n=3, tiebreak="event_id",
        payload=["event_id", "value"],
    )
    return run_to_memory(out, output_mode="update").orderBy("user_id", "rank")


@query(
    "stream_over_time_range",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS over_cnt,
           round(sum(value) OVER w, 4) AS over_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def stream_over_time_range(spark, sf_dir):
    """Streaming OVER: per-event 1-hour trailing count/sum per user."""
    sdf = events_stream(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    out = streaming_over_time_range(sdf, ["user_id"], "ts", "value", range_seconds=3600)
    return (
        run_to_memory(out, output_mode="update")
        .select("event_id", "user_id", "over_cnt", F.round("over_sum", 4).alias("over_sum"))
        .orderBy("event_id")
    )


@query(
    "stream_count_windows",
    oracle="""
    SELECT user_id,
           CAST(floor((rn - 1) / 20) AS BIGINT) AS win_seq,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM (SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
    GROUP BY 1, 2
    HAVING count(*) = 20
    ORDER BY user_id, win_seq
    """,
)
def stream_count_windows(spark, sf_dir):
    """Tumbling count windows (size 20) per user — only full windows fire."""
    sdf = events_stream(spark, sf_dir, watermark=None).select(
        "user_id", "ts", "event_id", "value"
    )
    out = count_tumble_window(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", size=20, value_col="value"
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "win_seq", "n", F.round("sum_value", 4).alias("sum_value"))
        .orderBy("user_id", "win_seq")
    )


@query(
    "stream_over_rows",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS over_cnt,
           round(sum(value) OVER w, 4) AS over_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def stream_over_rows(spark, sf_dir):
    """Streaming OVER with a ROWS frame: trailing 5-row count/sum per user
    (RowTimeRowsBoundedPrecedingFunction analog)."""
    from flink_1_12_0_spark.streaming.stateful import streaming_over_rows

    sdf = events_stream(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    out = streaming_over_rows(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", value_col="value", n_preceding=4
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("event_id", "user_id", "over_cnt", F.round("over_sum", 4).alias("over_sum"))
        .orderBy("event_id")
    )


@query(
    "stream_sort_limit",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_type = 'purchase'
    ORDER BY value DESC, event_id LIMIT 20
    """,
)
def stream_sort_limit(spark, sf_dir):
    """Streaming ORDER BY ... LIMIT in complete mode — the retractable
    sort-limit (StreamExecSortLimit.scala:50): the sink always holds the
    current global top-20."""
    sdf = events_stream(spark, sf_dir, watermark=None).where(
        F.col("event_type") == "purchase"
    )
    # complete mode requires an aggregation; the global top-N formulation
    # uses the same Rank rewrite as the reference (row_number <= N is not
    # supported over raw streams, so aggregate per key first is the normal
    # path — here the stream is globally sorted post-aggregation).
    agg = sdf.groupBy("event_id", "user_id").agg(F.max("value").alias("value"))
    ranked = agg.orderBy(F.col("value").desc(), "event_id").limit(20)
    return run_to_memory(ranked, output_mode="complete").select(
        "event_id", "user_id", "value"
    )


@query(
    "stream_continuous_fire",
    oracle="""
    WITH e AS (
        SELECT user_id, value, epoch(ts) AS es,
               CAST(floor(epoch(ts)/14400)*14400 AS BIGINT) AS w_start
        FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT user_id, max(es) AS wm FROM e GROUP BY 1),
    ks AS (SELECT unnest(range(1, 3)) AS k),
    fires AS (
        SELECT w.user_id, w.w_start,
               CAST(w.w_start + ks.k*7200 AS BIGINT) AS fire_ts,
               (ks.k = 2) AS is_final
        FROM (SELECT DISTINCT user_id, w_start FROM e) w
        CROSS JOIN ks
        JOIN wm ON wm.user_id = w.user_id AND wm.wm >= w.w_start + ks.k*7200)
    SELECT f.user_id, f.w_start, f.fire_ts, f.is_final,
           count(*) AS n, round(sum(e.value), 4) AS sum_value
    FROM fires f JOIN e ON e.user_id = f.user_id AND e.w_start = f.w_start
                       AND e.es <= f.fire_ts
    GROUP BY 1, 2, 3, 4
    ORDER BY f.user_id, f.w_start, f.fire_ts
    """,
)
def stream_continuous_fire(spark, sf_dir):
    """ContinuousEventTimeTrigger: 4-hour tumbling windows over purchases
    that fire a partial aggregate every 2 event-time hours (then finally
    at window end), per user.  A window fires once its key's max event
    time reaches the aligned fire point — ContinuousEventTimeTrigger.java's
    timer chain.  The purchase filter pushes to the stream scan."""
    from flink_1_12_0_spark.streaming.stateful import tumble_event_windows

    sdf = events_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id", "value")
    out = tumble_event_windows(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", value_col="value",
        size_s=14400, fire_interval_s=7200,
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "w_start", "fire_ts", "is_final", "n",
                F.round("sum_value", 4).alias("sum_value"))
        .orderBy("user_id", "w_start", "fire_ts")
    )


@query(
    "stream_count_evictor",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, value, epoch(ts) AS es,
               CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS w_start
        FROM events),
    wm AS (SELECT user_id, max(es) AS wm FROM e GROUP BY 1),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, w_start
                                     ORDER BY es DESC, event_id DESC) AS rn
        FROM e)
    SELECT r.user_id, r.w_start, count(*) AS n, round(sum(r.value), 4) AS sum_value
    FROM ranked r JOIN wm ON wm.user_id = r.user_id AND wm.wm >= r.w_start + 3600
    WHERE r.rn <= 5
    GROUP BY 1, 2
    ORDER BY r.user_id, r.w_start
    """,
)
def stream_count_evictor(spark, sf_dir):
    """CountEvictor(5) on 1-hour tumbling event-time windows: at the
    end-of-window fire only the LAST 5 elements (event-time order) are
    aggregated — CountEvictor.java's keep-latest-n before the window
    function.  Windows whose end the key's watermark never reaches stay
    unfired, like the reference."""
    from flink_1_12_0_spark.streaming.stateful import tumble_event_windows

    sdf = events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    out = tumble_event_windows(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", value_col="value",
        size_s=3600, evictor=("count", 5),
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "w_start", "n", F.round("sum_value", 4).alias("sum_value"))
        .orderBy("user_id", "w_start")
    )


@query(
    "stream_hop_trigger_windows",
    oracle="""
    WITH e AS (
        SELECT user_id, value, epoch(ts) AS es
        FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT user_id, max(es) AS wm FROM e GROUP BY 1),
    wins AS (
        SELECT DISTINCT e.user_id,
               CAST(floor(es/7200)*7200 - j.j*7200 AS BIGINT) AS w_start
        FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS j) j),
    fired AS (
        SELECT w.user_id, w.w_start
        FROM wins w JOIN wm ON wm.user_id = w.user_id
                           AND wm.wm >= w.w_start + 14400)
    SELECT f.user_id, f.w_start,
           CAST(f.w_start + 14400 AS BIGINT) AS fire_ts,
           count(*) AS n, round(sum(e.value), 4) AS sum_value
    FROM fired f JOIN e ON e.user_id = f.user_id
                       AND e.es >= f.w_start AND e.es < f.w_start + 14400
    GROUP BY 1, 2, 3
    ORDER BY f.user_id, f.w_start
    """,
)
def stream_hop_trigger_windows(spark, sf_dir):
    """SlidingEventTimeWindows (4h size / 2h slide) through the stateful
    window operator: each purchase lands in two overlapping windows, each
    firing once at its end when the key's watermark passes it — the
    sliding assigner + EventTimeTrigger path of WindowOperator."""
    from flink_1_12_0_spark.streaming.stateful import tumble_event_windows

    sdf = events_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id", "value")
    out = tumble_event_windows(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", value_col="value",
        size_s=14400, slide_s=7200,
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "w_start", "fire_ts", "n",
                F.round("sum_value", 4).alias("sum_value"))
        .orderBy("user_id", "w_start")
    )


@query(
    "stream_count_slide_windows",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    f AS (SELECT user_id, rn AS fire_rn FROM s
          WHERE rn % 10 = 0 AND rn >= 30)
    SELECT f.user_id, f.fire_rn, count(*) AS n, round(sum(s.value), 4) AS sum_value
    FROM f JOIN s ON s.user_id = f.user_id
                 AND s.rn > f.fire_rn - 30 AND s.rn <= f.fire_rn
    GROUP BY 1, 2
    ORDER BY f.user_id, f.fire_rn
    """,
)
def stream_count_slide_windows(spark, sf_dir):
    """Sliding count windows (size 30, slide 10) per user: an aggregate
    over the trailing 30 rows fires every 10th row —
    CountSlidingWindowAssigner semantics; only full windows fire."""
    from flink_1_12_0_spark.streaming.stateful import count_slide_window

    sdf = events_stream(spark, sf_dir, watermark=None).select(
        "user_id", "ts", "event_id", "value"
    )
    out = count_slide_window(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", size=30, slide=10,
        value_col="value",
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "fire_rn", "n", F.round("sum_value", 4).alias("sum_value"))
        .orderBy("user_id", "fire_rn")
    )


@query(
    "stream_coprocess_control",
    oracle="""
    WITH allr AS (
        SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id,
               value AS lvalue, CAST(NULL AS DOUBLE) AS pvalue, 0 AS is_p
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, event_id, NULL, value, 1
        FROM events WHERE event_type = 'purchase'),
    w AS (
        SELECT *, last_value(lvalue IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS thr
        FROM allr)
    SELECT user_id, event_id, round(pvalue, 4) AS value, round(thr, 4) AS threshold
    FROM w
    WHERE is_p = 1 AND pvalue > thr
    ORDER BY user_id, event_id
    """,
)
def stream_coprocess_control(spark, sf_dir):
    """CoProcessFunction / connected-streams control pattern
    (DataStream.connect + CoProcessFunction.java): a control stream (each
    user's logins carry their current threshold) and a main stream
    (purchases) are tagged, unioned, and processed by ONE keyed stateful
    operator in event-time order — a purchase is emitted when it exceeds
    the user's latest threshold (the 'click' stream carries per-user
    thresholds; the fixture has no 'login' events, which made the old
    predicate vacuously empty).  The running threshold is typed state
    (one DOUBLE), not a JSON blob."""
    from flink_1_12_0_spark.streaming.sinks import connect_with_control
    from flink_1_12_0_spark.streaming.stateful import keyed_process

    ev = events_stream(spark, sf_dir, watermark=None)
    main = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    control = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    both = connect_with_control(
        main, control, ["user_id", "ts", "event_id", "value"]
    )
    out_schema = "user_id bigint, event_id bigint, value double, threshold double"

    def fn(key, pdfs, state):
        import pandas as pd

        thr = state.get[0] if state.exists else None
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        pdf = (
            pd.concat(frames)
            .sort_values(["ts", "_stream", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        out = []
        for stream, eid, val in zip(pdf["_stream"], pdf["event_id"], pdf["value"]):
            if stream == "control":
                thr = float(val)
            elif thr is not None and float(val) > thr:
                out.append(
                    {"user_id": key[0], "event_id": int(eid),
                     "value": round(float(val), 4),
                     "threshold": round(thr, 4)}
                )
        state.update((thr,))
        if out:
            yield pd.DataFrame(out)

    res = keyed_process(both, ["user_id"], fn, out_schema, "thr double")
    return run_to_memory(res, output_mode="update").orderBy("user_id", "event_id")


@query(
    "stream_delta_evictor",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, value, epoch(ts) AS es,
               CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS w_start
        FROM events),
    wm AS (SELECT user_id, max(es) AS wm FROM e GROUP BY 1),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, w_start
                                     ORDER BY es DESC, event_id DESC) AS rn
        FROM e),
    lastv AS (SELECT user_id, w_start, value AS last_v FROM ranked WHERE rn = 1)
    SELECT e.user_id, e.w_start, count(*) AS n, round(sum(e.value), 4) AS sum_value
    FROM e
    JOIN lastv l ON l.user_id = e.user_id AND l.w_start = e.w_start
    JOIN wm ON wm.user_id = e.user_id AND wm.wm >= e.w_start + 3600
    WHERE abs(e.value - l.last_v) < 2.0
    GROUP BY 1, 2
    ORDER BY e.user_id, e.w_start
    """,
)
def stream_delta_evictor(spark, sf_dir):
    """DeltaEvictor(2.0) on 1-hour tumbling event-time windows: at the
    end-of-window fire, elements whose |value - last element's value|
    reaches the threshold are evicted before aggregation —
    DeltaEvictor.java's DeltaFunction contract (delta against the LAST
    buffered element).  Completes the reference's evictor set
    (Count/Time/Delta)."""
    from flink_1_12_0_spark.streaming.stateful import tumble_event_windows

    sdf = events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    out = tumble_event_windows(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", value_col="value",
        size_s=3600, evictor=("delta", 2.0),
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "w_start", "n", F.round("sum_value", 4).alias("sum_value"))
        .orderBy("user_id", "w_start")
    )


@query(
    "stream_session_trigger_windows",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value, epoch(ts) AS es FROM events),
    wm AS (SELECT user_id, max(es) AS wm FROM e GROUP BY 1),
    flagged AS (
        SELECT *, CASE WHEN lag(es) OVER w IS NULL
                       OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    numbered AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY es, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                     ORDER BY es DESC, event_id DESC) AS rn
        FROM numbered),
    agg AS (
        SELECT user_id, sid,
               CAST(floor(min(es)) AS BIGINT) AS w_start,
               CAST(floor(max(es) + 1800) AS BIGINT) AS w_end,
               max(es) AS last_es,
               CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n,
               round(sum(CASE WHEN rn <= 3 THEN value ELSE 0 END), 4) AS sum_value
        FROM ranked GROUP BY user_id, sid)
    SELECT a.user_id, a.w_start, a.w_end, a.n, a.sum_value
    FROM agg a JOIN wm ON wm.user_id = a.user_id AND a.last_es + 1800 <= wm.wm
    ORDER BY a.user_id, a.w_start
    """,
)
def stream_session_trigger_windows(spark, sf_dir):
    """Merging session windows (gap 30 min) on the custom stateful path
    with a CountEvictor(3) — EventTimeSessionWindows + MergingWindowSet +
    CountEvictor on a MERGING window, the combination Spark's native
    session_window cannot express (no evictors).  A session fires once
    the key's watermark passes its last element + gap; the session
    holding each key's newest event stays open (never fires), exactly
    like the oracle's watermark join."""
    from flink_1_12_0_spark.streaming.stateful import session_event_windows

    sdf = events_stream(spark, sf_dir, watermark=None).select(
        "user_id", "ts", "event_id", "value"
    )
    out = session_event_windows(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", value_col="value",
        gap_s=1800, evictor=("count", 3),
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "w_start", "w_end", "n",
                F.round("sum_value", 4).alias("sum_value"))
        .orderBy("user_id", "w_start")
    )


@query(
    "stream_temporal_sort",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value, epoch(ts) AS es FROM events
               WHERE event_type = 'purchase'),
    wm AS (SELECT user_id, max(es) - 600 AS wm FROM e GROUP BY 1)
    SELECT e.user_id,
           row_number() OVER (PARTITION BY e.user_id
                              ORDER BY e.es, e.event_id) - 1 AS emit_seq,
           CAST(e.event_id AS BIGINT) AS event_id,
           round(e.value, 4) AS value
    FROM e JOIN wm ON wm.user_id = e.user_id AND e.es <= wm.wm
    ORDER BY e.user_id, emit_seq
    """,
)
def stream_temporal_sort(spark, sf_dir):
    """Rowtime TemporalSort (StreamExecTemporalSort.scala:50 /
    RowTimeSortOperator.java): purchases emit per user in event-time
    order as the key's watermark (max ts - 10 min) advances; rows inside
    the final 10-minute horizon stay buffered (never emit), rows behind
    the watermark would drop.  ``emit_seq`` makes the emission ORDER part
    of the value-checked output — the oracle recomputes it as the
    event-time row_number over the watermark-safe prefix."""
    from flink_1_12_0_spark.streaming.stateful import temporal_sort_stream

    sdf = events_stream(spark, sf_dir, watermark=None).where(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id", "value")
    out = temporal_sort_stream(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", value_col="value",
        delay_s=600,
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("user_id", "emit_seq",
                F.col("tie").cast("bigint").alias("event_id"),
                F.round("value", 4).alias("value"))
        .orderBy("user_id", "emit_seq")
    )


@query(
    "stream_broadcast_rules",
    oracle="""
    WITH allr AS (
        SELECT ts, event_id, 0 AS is_p, value AS cval,
               CAST(NULL AS DOUBLE) AS pval, CAST(NULL AS BIGINT) AS user_id
        FROM events WHERE event_type = 'signup'
        UNION ALL
        SELECT ts, event_id, 1, NULL, value, user_id
        FROM events WHERE event_type = 'purchase'),
    w AS (
        SELECT *, last_value(cval IGNORE NULLS)
                      OVER (ORDER BY ts, is_p, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS thr
        FROM allr)
    SELECT user_id, event_id, round(pval, 4) AS value, round(thr, 4) AS threshold
    FROM w
    WHERE is_p = 1 AND pval > thr
    ORDER BY event_id
    """,
)
def stream_broadcast_rules(spark, sf_dir):
    """KeyedBroadcastProcessFunction pattern (DataStream.broadcast +
    BroadcastConnectedStream.process): an UNKEYED rule stream (each
    signup sets the GLOBAL minimum-value threshold) must reach every
    parallel task while purchases partition normally — the broadcast-state
    memory model.  ``broadcast_connect`` replicates each rule row to all
    64 shards in-row (no driver, no single-key funnel); each shard's
    typed state is the one latest threshold.  A purchase is emitted when
    it exceeds the threshold in force at its event time."""
    from flink_1_12_0_spark.streaming.sinks import broadcast_connect
    from flink_1_12_0_spark.streaming.stateful import keyed_process

    ev = events_stream(spark, sf_dir, watermark=None)
    main = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    control = ev.where(F.col("event_type") == "signup").select(
        "ts", "event_id", "value"
    )
    both = broadcast_connect(
        main, control, ["user_id", "ts", "event_id", "value"],
        shard_key="user_id", n_shards=64,
    )
    out_schema = "user_id bigint, event_id bigint, value double, threshold double"

    def fn(key, pdfs, state):
        import pandas as pd

        thr = state.get[0] if state.exists else None
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        pdf = (
            pd.concat(frames)
            .sort_values(["ts", "_stream", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        out = []
        for stream, uid, eid, val in zip(
            pdf["_stream"], pdf["user_id"], pdf["event_id"], pdf["value"]
        ):
            if stream == "control":
                thr = float(val)
            elif thr is not None and float(val) > thr:
                out.append(
                    {"user_id": int(uid), "event_id": int(eid),
                     "value": round(float(val), 4),
                     "threshold": round(thr, 4)}
                )
        state.update((thr,))
        if out:
            yield pd.DataFrame(out)

    res = keyed_process(both, ["_shard"], fn, out_schema, "thr double")
    return run_to_memory(res, output_mode="update").orderBy("event_id")


@query(
    "stream_dedup_ttl",
    oracle="""
    SELECT event_id,
           (prev_ts IS NOT NULL AND ts - prev_ts <= INTERVAL 6 HOUR) AS is_dup
    FROM (
        SELECT event_id, ts,
               lag(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events)
    ORDER BY event_id
    """,
)
def stream_dedup_ttl(spark, sf_dir):
    """Deduplication with state TTL (StateTtlConfig — flink-core .../state/
    StateTtlConfig.java + the dedup operators' configured retention): an
    event is a duplicate only if the SAME key (user, event_type) was seen
    within the last 6 hours of event time; state older than the TTL
    expires, so the key is admitted fresh again — the bounded-state dedup
    a 100 TB stream needs (unbounded first-seen maps grow forever).
    State per key = one last-seen epoch in integer NANOSECONDS (bigint):
    the TTL boundary test stays exact — at 1998-epoch magnitude (~9e17 ns)
    an int64→float64 seconds conversion loses up to ~64 ns per value,
    enough to flip a pair exactly 6 h apart against the oracle's exact
    `ts - prev_ts <= INTERVAL 6 HOUR`.  Oracle: lag(ts) per key within
    the horizon."""
    from flink_1_12_0_spark.streaming.stateful import keyed_process

    ttl_ns = 6 * 3600 * 10**9
    sdf = events_stream(spark, sf_dir, watermark=None).select(
        "user_id", "event_type", "ts", "event_id"
    )
    out_schema = "event_id bigint, is_dup boolean"

    def fn(key, pdfs, state):
        import pandas as pd

        last = state.get[0] if state.exists else None
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        pdf = (
            pd.concat(frames)
            .sort_values(["ts", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        es = pdf["ts"].astype("int64").to_numpy()
        out_dup = []
        for t in es:
            out_dup.append(last is not None and t - last <= ttl_ns)
            last = int(t)
        state.update((last,))
        yield pd.DataFrame(
            {"event_id": pdf["event_id"].to_numpy(), "is_dup": out_dup}
        )

    res = keyed_process(sdf, ["user_id", "event_type"], fn, out_schema, "last bigint")
    return run_to_memory(res, output_mode="update").orderBy("event_id")


@query(
    "stream_over_unbounded",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS over_cnt,
           round(sum(value) OVER w, 4) AS over_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def stream_over_unbounded(spark, sf_dir):
    """Streaming OVER with an UNBOUNDED PRECEDING frame: per-event
    running count/sum per user over the key's whole history
    (RowTimeUnboundedPrecedingFunction — the constant-state member of
    the streaming OVER family; only one (cnt, sum) accumulator per key
    survives between batches)."""
    from flink_1_12_0_spark.streaming.stateful import streaming_over_unbounded

    sdf = events_stream(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    out = streaming_over_unbounded(
        sdf, ["user_id"], ts="ts", tiebreak="event_id", value_col="value"
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("event_id", "user_id", "over_cnt",
                F.round("over_sum", 4).alias("over_sum"))
        .orderBy("event_id")
    )


_FMT_S = "yyyy-MM-dd HH:mm:ss"


@query(
    "stream_window_all",
    oracle=f"""
    SELECT strftime(epoch_ms(CAST(floor(epoch(ts)/21600)*21600000 AS BIGINT)), '{_FMT_D}') AS w_start,
           count(*) AS cnt,
           round(sum(value), 4) AS total
    FROM events
    GROUP BY 1
    ORDER BY w_start
    """,
)
def stream_window_all(spark, sf_dir):
    """Non-keyed tumbling 6h window over the WHOLE stream —
    DataStream.windowAll/timeWindowAll (DataStream.java:842,878).  The
    reference keys by NullByteKeySelector into one parallel-1 task
    (AllWindowedStream.java:114); here the single-group groupBy(window)
    still gets map-side partial aggregation, so the global aggregate
    scales with cores instead of serializing on one subtask."""
    from flink_1_12_0_spark.api.datastream import DataStream

    sdf = events_stream(spark, sf_dir)
    agg = (
        DataStream(sdf)
        .window_all("ts", "6 hours")
        .aggregate(F.count("*").alias("cnt"),
                   F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.date_format(F.col("window.start"), _FMT_S).alias("w_start"),
            "cnt", "total",
        )
    )
    return run_to_memory(agg, output_mode="complete").orderBy("w_start")


@query(
    "stream_count_window_all",
    oracle="""
    SELECT CAST(floor((rn - 1) / 50) AS BIGINT) AS win_seq,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM (SELECT value,
                 row_number() OVER (ORDER BY ts, event_id) AS rn
          FROM events)
    GROUP BY 1
    HAVING count(*) = 50
    ORDER BY win_seq
    """,
)
def stream_count_window_all(spark, sf_dir):
    """Non-keyed tumbling COUNT windows (size 50) over the whole stream —
    DataStream.countWindowAll (DataStream.java:855): ONE global row
    counter in event-time order; only full windows fire, the trailing
    partial stays in state (count-trigger semantics).  Global count
    windows are inherently serial (the counter is a total order), exactly
    as in the reference — keyed count windows are the scale path."""
    from flink_1_12_0_spark.api.datastream import DataStream

    sdf = events_stream(spark, sf_dir, watermark=None).select(
        "ts", "event_id", "value"
    )
    out = DataStream(sdf).count_window_all(50).sum_count(
        ts="ts", tiebreak="event_id", value_col="value"
    )
    return (
        run_to_memory(out, output_mode="update")
        .select("win_seq", "n", F.round("sum_value", 4).alias("sum_value"))
        .orderBy("win_seq")
    )
