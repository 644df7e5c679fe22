"""Partitioning/bucketing/salting: correctness plus the plan-level
guarantees the 100 TB strategy depends on (bucketed join has no exchange;
reused hash distribution is not re-shuffled)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_12_0_spark.operators.partitioning import (
    bucketize_write,
    read_bucketed,
    repartition_hash,
    salted_join,
    sort_partition,
)
from flink_1_12_0_spark.plans.inspect import count_op, plan_string
from flink_1_12_0_spark.tables import load_tables
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    t = load_tables(spark, SF_DIR)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_quantity")
    sup = t["supplier"].select("s_suppkey", "s_name")
    salted = salted_join(li, sup, "l_suppkey", "s_suppkey", salt=4)
    got = {
        (r["s_name"], r["cnt"], round(r["qty"], 2))
        for r in salted.groupBy("s_name")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    want = {
        (r["s_name"], r["cnt"], round(r["qty"], 2))
        for r in li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    assert got == want


def test_reused_hash_distribution_not_reshuffled(spark):
    """groupBy on the same key after repartition(key) must not add a
    second hash exchange — the amortized-shuffle contract."""
    t = load_tables(spark, SF_DIR)
    df = repartition_hash(t["lineitem"], ["l_suppkey"], 8)
    agg = df.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("q"))
    agg.collect()
    s = plan_string(agg)
    assert s.count("Exchange hashpartitioning") <= 1


def test_sort_partition_no_exchange(spark):
    t = load_tables(spark, SF_DIR)
    df = sort_partition(t["orders"], ["o_orderdate"])
    df.collect()
    assert count_op(df, "Exchange") == 0


@pytest.mark.slow
def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed by the join key: the join plan contains no
    Exchange — the persisted co-location path (SURVEY: Flink's
    batch ship-strategy 'FORWARD' analog)."""
    t = load_tables(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_supplier")
    bucketize_write(
        t["lineitem"].select("l_suppkey", "l_quantity"),
        "b_lineitem", ["l_suppkey"], 8, path=str(tmp_path / "b_li"),
    )
    bucketize_write(
        t["supplier"].select("s_suppkey", "s_name"),
        "b_supplier", ["s_suppkey"], 8, path=str(tmp_path / "b_sup"),
    )
    li, sup = read_bucketed(spark, "b_lineitem"), read_bucketed(spark, "b_supplier")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        j = li.join(sup, li.l_suppkey == sup.s_suppkey)
        j.collect()
        assert count_op(j, "Exchange") == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_split_distinct_agg_exact_and_two_level(spark):
    """The SplitAggregateRule rewrite: exact vs plain COUNT(DISTINCT),
    and the plan really has the extra (g, bucket) aggregation level —
    two distinct hash-key sets in the aggregate chain."""
    from flink_1_12_0_spark.operators.partitioning import split_distinct_agg

    t = load_tables(spark, SF_DIR)
    li = t["lineitem"]
    got = split_distinct_agg(
        li, ["l_returnflag"], "l_partkey", n_buckets=8,
        extra_aggs=[("sum", "l_quantity", "qty"), ("max", "l_discount", "max_disc")],
    )
    want = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_distinct_l_partkey"),
        F.sum("l_quantity").alias("qty"),
        F.max("l_discount").alias("max_disc"),
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
    s = plan_string(got)
    assert s.count("HashAggregate") >= 4  # partial+final x 2 levels


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join receipt (the runtime complement of the manual
    salting operator above): a join with one pathologically hot key,
    run under tightened skew thresholds, must come back with the
    SortMergeJoin marked skew=true and an 'AQEShuffleRead ... skewed'
    read — i.e. the engine SPLIT the hot partition at runtime instead
    of one task dragging the stage.  This is the receipt that the
    skew story does not rely on hand-salting alone at 100 TB."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(500_000).selectExpr(
            "0 AS k", "id AS payload", "repeat('x', 32) AS pad"
        ).unionAll(spark.range(9_900).selectExpr(
            "CAST(id % 99 + 1 AS BIGINT) AS k", "id AS payload",
            "repeat('y', 32) AS pad"))
        right = spark.range(100).selectExpr("id AS k", "id * 10 AS rv")
        j = left.join(right, "k")
        rows = j.collect()  # finalize THIS df's adaptive plan
        assert len(rows) == 509_900
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:800]
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan[:800]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_result_equality_and_bucket_pruning(spark, tmp_path):
    """Extends the no-Exchange receipt above: the bucketed join's RESULT
    must equal the plain shuffled join's, and a key equality filter must
    prune the scan to a single bucket (SelectedBucketsCount — pin
    autoBucketedScan on, since the planner skips bucketed reading for
    scan-only plans)."""
    t = load_tables(spark, SF_DIR)
    li = t["lineitem"].select("l_orderkey", "l_partkey", "l_extendedprice")
    od = t["orders"].select("o_orderkey", "o_custkey")
    spark.sql("DROP TABLE IF EXISTS bp_lineitem")
    spark.sql("DROP TABLE IF EXISTS bp_orders")
    bucketize_write(li, "bp_lineitem", ["l_orderkey"], 8,
                    path=str(tmp_path / "bp_li"))
    bucketize_write(od, "bp_orders", ["o_orderkey"], 8,
                    path=str(tmp_path / "bp_od"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_bucketed(spark, "bp_lineitem").join(
            read_bucketed(spark, "bp_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        ref = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, ref.collect()))
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
            "false")
        f = read_bucketed(spark, "bp_lineitem").where("l_orderkey = 7")
        fplan = f._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in fplan, fplan
    finally:
        spark.conf.unset(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bp_lineitem")
        spark.sql("DROP TABLE IF EXISTS bp_orders")
