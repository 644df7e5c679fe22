"""OVER-window (analytic) operator coverage.

Reference: batch over-aggregate with RANGE/ROWS frames
(BatchExecOverAggregate.scala:59; frames .../operators/over/frame/*.java),
ranking functions RANK / DENSE_RANK / ROW_NUMBER / LEAD / LAG
(planner/functions/aggfunctions/RankAggFunction.java, LeadLagAggFunction.java
— NTILE/PERCENT_RANK/CUME_DIST absent from FlinkSqlOperatorTable and hence
not exposed), and the Top-N rewrite (FlinkLogicalRankRule.scala:
row_number() <= N -> Rank node).

Spark-first: pyspark.sql.Window covers every reference frame natively
(WindowExec, codegen'd). Top-N is the same row_number()+filter rewrite,
which Catalyst optimizes to a per-partition rank limit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


@query(
    "over_rank_fns",
    oracle="""
    SELECT n_nationkey,
           c_custkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           row_number() OVER (PARTITION BY n_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_nationkey < 5
    WINDOW w AS (PARTITION BY n_nationkey ORDER BY c_acctbal DESC)
    ORDER BY n_nationkey, rn
    """,
)
def over_rank_fns(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    j = t["customer"].join(
        F.broadcast(t["nation"].where(F.col("n_nationkey") < 5)),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    w = Window.partitionBy("n_nationkey").orderBy(F.col("c_acctbal").desc())
    wdet = Window.partitionBy("n_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return j.select(
        "n_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(wdet).alias("rn"),
    ).orderBy("n_nationkey", "rn")


@query(
    "over_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)     OVER w AS prev_price,
           lead(o_totalprice)    OVER w AS next_price,
           lag(o_totalprice, 2, -1.0) OVER w AS prev2_price
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def over_lead_lag(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .where(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "over_rows_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS moving_sum_e2,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS running_sum_e2
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
)
def over_rows_frame(spark, sf_dir):
    """ROWS frames: sliding (2 PRECEDING) + running total
    (reference .../over/frame/RowSlidingOverFrame.java etc.)."""
    t = load_tables(spark, sf_dir)
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .where(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .over(base.rowsBetween(-2, 0))
            .cast("bigint")
            .alias("moving_sum_e2"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .over(base.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint")
            .alias("running_sum_e2"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "over_range_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                OVER (PARTITION BY l_orderkey ORDER BY l_quantity
                      RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT)
               AS near_qty_price_e2
    FROM lineitem WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def over_range_frame(spark, sf_dir):
    """RANGE frame over a numeric ordering attribute
    (reference .../over/frame/RangeSlidingOverFrame.java)."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_quantity")
        .rangeBetween(-5, 5)
    )
    return (
        t["lineitem"]
        .where(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .over(w)
            .cast("bigint")
            .alias("near_qty_price_e2"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "topn_per_group",
    oracle="""
    SELECT n_nationkey, c_custkey, c_acctbal
    FROM (
        SELECT n_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY n_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn <= 3
    ORDER BY n_nationkey, c_acctbal DESC, c_custkey
    """,
)
def topn_per_group(spark, sf_dir):
    """Top-N per group — the reference's Rank node specialization
    (StreamExecRank.scala:52 / FlinkLogicalRankRule). Catalyst pushes the
    rn<=3 filter into the window sort (per-partition top-k at scale)."""
    t = load_tables(spark, sf_dir)
    j = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("n_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("n_nationkey", "c_custkey", "c_acctbal")
        .orderBy("n_nationkey", F.col("c_acctbal").desc(), "c_custkey")
    )


@query(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_id, ts_s
    FROM (
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def dedup_keep_first(spark, sf_dir):
    """Deduplicate keep-first — the reference's Deduplicate node
    (StreamExecDeduplicate.scala:58, row_number=1 over time attribute).
    Batch form of the same rewrite; streaming form uses dropDuplicates."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
        .orderBy("user_id")
    )


@query(
    "dedup_keep_last",
    oracle="""
    SELECT user_id, event_id, value
    FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def dedup_keep_last(spark, sf_dir):
    """Deduplicate keep-last (reference keep-last variants under
    .../operators/deduplicate/)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
        .orderBy("user_id")
    )
