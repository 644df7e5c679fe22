"""Interval, as-of/temporal, and lookup join queries over events/lineitem.

Reference operators:
- StreamExecIntervalJoin.scala:54 / TimeIntervalJoin.java:54 (interval)
- StreamExecTemporalJoin.scala:56 / TemporalRowTimeJoinOperator.java:77
  (FOR SYSTEM_TIME AS OF)
- StreamExecLookupJoin.scala:38 / LookupJoinRunner.java:36 (lookup + cache)

Oracles: DuckDB native ``ASOF LEFT JOIN`` for the as-of pair — a genuinely
independent implementation of the same semantics — and plain SQL for the
interval/lookup cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.operators.joins import asof_join, interval_join, lookup_join, temporal_join
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables

_FMT_S = "yyyy-MM-dd HH:mm:ss"
_FMT_D = "%Y-%m-%d %H:%M:%S"


@query(
    "join_interval_events",
    oracle="""
    SELECT p.event_id AS p_id,
           p.user_id,
           count(c.event_id) AS n_clicks,
           round(coalesce(sum(c.value), 0), 4) AS click_value
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY 1, 2
    ORDER BY p_id
    """,
)
def join_interval_events(spark, sf_dir):
    """Interval join: clicks within [purchase.ts - 30min, purchase.ts] per
    user, aggregated per purchase.  One shuffle on user_id; the range is a
    join post-filter (no state, no cross product)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    j = interval_join(
        purchases, clicks, [("user_id", "c_user")], "p_ts", "c_ts",
        lower="30 minutes", upper="0 seconds", how="left",
    )
    return (
        j.groupBy("p_id", "user_id")
        .agg(
            F.count("c_id").alias("n_clicks"),
            F.round(F.coalesce(F.sum("c_value"), F.lit(0.0)), 4).alias("click_value"),
        )
        .orderBy("p_id")
    )


@query(
    "join_asof_latest_view",
    oracle=f"""
    SELECT p.event_id AS p_id,
           p.user_id,
           strftime(p.ts, '{_FMT_D}') AS p_ts,
           v.value    AS r_value,
           v.event_id AS r_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    ORDER BY p_id
    """,
)
def join_asof_latest_view(spark, sf_dir):
    """As-of join: each purchase sees the user's latest prior view.  Spark
    has no ASOF primitive — union-tag + last-value window (one shuffle,
    one sort, linear); oracle is DuckDB's native ASOF JOIN."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view")
    j = asof_join(
        purchases, views, ["user_id"], "ts", "ts",
        right_cols=["value", "event_id"], right_tiebreak="event_id",
    )
    return j.select(
        "p_id",
        "user_id",
        F.date_format("ts", _FMT_S).alias("p_ts"),
        "r_value",
        "r_event_id",
    ).orderBy("p_id")


@query(
    "join_temporal_versioned",
    oracle="""
    SELECT p.event_id AS p_id,
           p.user_id,
           CASE WHEN e.ts < p.ts - INTERVAL 1 DAY THEN NULL
                ELSE e.value END AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND e.ts <= p.ts
    ORDER BY p_id
    """,
)
def join_temporal_versioned(spark, sf_dir):
    """Temporal (FOR SYSTEM_TIME AS OF) join with a freshness tolerance:
    the error-state version valid at purchase time, NULL if older than a
    day — mirrors TemporalRowTimeJoinOperator's versioned-state semantics
    plus idle-state TTL, expressed as a sort instead of state."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    versions = ev.where(F.col("event_type") == "error")
    j = asof_join(
        purchases, versions, ["user_id"], "ts", "ts",
        right_cols=["value"], right_tiebreak="event_id", tolerance="1 day",
    )
    return j.select("p_id", "user_id", "r_value").orderBy("p_id")


@query(
    "join_lookup_cached",
    oracle="""
    SELECT s_name AS r_s_name,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def join_lookup_cached(spark, sf_dir):
    """Lookup join: per-row probe of an 'external system' (simulated by a
    collected supplier map) through mapInPandas with a per-task LRU cache
    — Flink's LookupJoinRunner pattern.  Distinct keys per Arrow batch are
    fetched once; repeated keys hit the cache."""
    t = load_tables(spark, sf_dir)
    sup = {
        r["s_suppkey"]: {"s_name": r["s_name"]}
        for r in t["supplier"].select("s_suppkey", "s_name").collect()
    }

    def fetch(keys):
        return {k: sup.get(k, {}) for k in keys}

    enriched = lookup_join(
        t["lineitem"].select("l_suppkey", "l_quantity"),
        "l_suppkey",
        fetch,
        out_fields=[("s_name", "string")],
    )
    return (
        enriched.groupBy("r_s_name")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy("r_s_name")
    )
