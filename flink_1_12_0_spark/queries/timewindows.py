"""Group-window aggregations over the events stream table (batch form).

Reference: TUMBLE/HOP/SESSION/CUMULATE group windows
(StreamExecGroupWindowAggregateBase.scala:54; assigners under
.../operators/window/assigners/ — TumblingWindowAssigner,
SlidingWindowAssigner, SessionWindowAssigner, CumulativeWindowAssigner;
batch variants BatchExecHashWindowAggregate.scala:1).

Spark-first: F.window / F.session_window — native, streaming-capable, and
identical in batch mode (these queries run on the batch events table; the
same expressions run under readStream + withWatermark, see streaming/).

DuckDB oracles rebuild window assignment from epoch arithmetic
(epoch_ms() keeps everything timezone-naive), sessions via
gaps-and-islands, hops/cumulates via a CROSS JOIN range() expansion.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.operators.windows import cumulate, hop, tumble
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables

_FMT_S = "yyyy-MM-dd HH:mm:ss"
_FMT_D = "%Y-%m-%d %H:%M:%S"


@query(
    "window_tumble",
    oracle=f"""
    SELECT strftime(epoch_ms(CAST(floor(epoch(ts)/3600)*3600000 AS BIGINT)), '{_FMT_D}') AS w_start,
           event_type,
           count(*) AS cnt,
           sum(value) AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY w_start, event_type
    """,
)
def window_tumble(spark, sf_dir):
    """TUMBLE(ts, 1 hour) per event_type."""
    t = load_tables(spark, sf_dir)
    return (
        tumble(t["events"], "ts", "1 hour")
        .groupBy(
            F.date_format("window_start", _FMT_S).alias("w_start"), "event_type"
        )
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total"))
        .orderBy("w_start", "event_type")
    )


@query(
    "window_hop",
    oracle=f"""
    SELECT strftime(epoch_ms(CAST((floor(epoch(ts)/900) - j) * 900000 AS BIGINT)), '{_FMT_D}') AS w_start,
           count(*) AS cnt,
           round(avg(CAST(round(value * 100) AS BIGINT)) / 100.0, 6) AS avg_value
    FROM events CROSS JOIN range(4) r(j)
    WHERE (floor(epoch(ts)/900) - j) * 900 > epoch(ts) - 3600
    GROUP BY 1
    ORDER BY w_start
    """,
)
def window_hop(spark, sf_dir):
    """HOP(ts, slide 15 min, size 1 hour): each event lands in 4 windows."""
    t = load_tables(spark, sf_dir)
    return (
        hop(t["events"], "ts", "1 hour", "15 minutes")
        .groupBy(F.date_format("window_start", _FMT_S).alias("w_start"))
        .agg(
            F.count("*").alias("cnt"),
            # avg over exact integer cents (sum < 2^53): deterministic
            F.round(
                F.avg(F.round(F.col("value") * 100).cast("bigint")) / 100.0, 6
            ).alias("avg_value"),
        )
        .orderBy("w_start")
    )


@query(
    "window_session",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
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
           strftime(max(ts) + INTERVAL 30 MINUTE, '{_FMT_D}') AS s_end,
           count(*) AS n_events,
           sum(value) AS total
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, s_start
    """,
)
def window_session(spark, sf_dir):
    """SESSION(ts, gap 30 min) per user — F.session_window merges events
    closer than the gap; window end = last event + gap (same as the
    reference's SessionWindowAssigner + merging trigger)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _FMT_S).alias("s_start"),
            F.date_format(F.col("w.end"), _FMT_S).alias("s_end"),
            "n_events",
            "total",
        )
        .orderBy("user_id", "s_start")
    )


@query(
    "window_cumulate",
    oracle=f"""
    SELECT strftime(epoch_ms(CAST(floor(epoch(ts)/86400)*86400000 AS BIGINT)), '{_FMT_D}') AS w_start,
           strftime(epoch_ms(CAST((floor(epoch(ts)/86400)*86400 + k*21600)*1000 AS BIGINT)), '{_FMT_D}') AS w_end,
           count(*) AS cnt
    FROM events CROSS JOIN range(1, 5) r(k)
    WHERE epoch(ts) < floor(epoch(ts)/86400)*86400 + k*21600
    GROUP BY 1, 2
    ORDER BY w_start, w_end
    """,
)
def window_cumulate(spark, sf_dir):
    """CUMULATE(ts, step 6 hours, max 1 day): growing windows sharing a
    day-aligned start (reference CumulativeWindowAssigner — no Spark
    primitive; implemented via sequence+explode, JVM-side only)."""
    t = load_tables(spark, sf_dir)
    return (
        cumulate(t["events"], "ts", "6 hours", "1 day")
        .groupBy(
            F.date_format("window_start", _FMT_S).alias("w_start"),
            F.date_format("window_end", _FMT_S).alias("w_end"),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("w_start", "w_end")
    )


@query(
    "window_tumble_grouped_topn",
    oracle=f"""
    WITH agg AS (
        SELECT epoch_ms(CAST(floor(epoch(ts)/21600)*21600000 AS BIGINT)) AS w_start,
               user_id, sum(value) AS total
        FROM events GROUP BY 1, 2
    )
    SELECT strftime(w_start, '{_FMT_D}') AS w_start, user_id, total
    FROM (SELECT *, row_number() OVER (PARTITION BY w_start
                                       ORDER BY total DESC, user_id) AS rn
          FROM agg)
    WHERE rn <= 5
    ORDER BY w_start, total DESC, user_id
    """,
)
def window_tumble_grouped_topn(spark, sf_dir):
    """Windowed Top-N: top 5 users by value per 6-hour tumble — the
    canonical reference pattern combining WindowAggregate + Rank."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    agg = (
        tumble(t["events"], "ts", "6 hours")
        .groupBy("window_start", "user_id")
        .agg(F.sum("value").alias("total"))
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("total").desc(), F.col("user_id")
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select(
            F.date_format("window_start", _FMT_S).alias("w_start"),
            "user_id",
            "total",
        )
        .orderBy("w_start", F.col("total").desc(), "user_id")
    )


@query(
    "window_session_dynamic_gap",
    oracle=f"""
    WITH e AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN event_type = 'purchase' THEN 3600 ELSE 900 END AS gap
        FROM events),
    r AS (
        SELECT *, max(ts + INTERVAL (gap) SECOND)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS prev_end
        FROM e),
    f AS (
        SELECT *, CASE WHEN prev_end IS NULL OR ts >= prev_end
                       THEN 1 ELSE 0 END AS ns
        FROM r),
    n AS (
        SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM f)
    SELECT user_id,
           strftime(min(ts), '{{fmt}}') AS s_start,
           strftime(max(ts + INTERVAL (gap) SECOND), '{{fmt}}') AS s_end,
           count(*) AS n_events,
           round(sum(value), 4) AS total
    FROM n
    GROUP BY user_id, sid
    ORDER BY user_id, s_start
    """.format(fmt="%Y-%m-%d %H:%M:%S"),
)
def window_session_dynamic_gap(spark, sf_dir):
    """Dynamic-gap session windows (reference: SessionWindowTimeGapExtractor
    + EventTimeSessionWindows.withDynamicGap): each event extends its
    session by a gap chosen from the row (purchases keep sessions alive
    60 min, everything else 15 min).  Spark's session_window accepts a gap
    expression; the oracle reproduces interval-union merging with a
    running-max-end gaps-and-islands."""
    t = load_tables(spark, sf_dir)
    gap = F.when(F.col("event_type") == "purchase", F.lit("3600 seconds")).otherwise(
        F.lit("900 seconds")
    )
    return (
        t["events"]
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _FMT_S).alias("s_start"),
            F.date_format(F.col("w.end"), _FMT_S).alias("s_end"),
            "n_events",
            "total",
        )
        .orderBy("user_id", "s_start")
    )
