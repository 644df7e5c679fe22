"""Join operator coverage — DataFrame API, one query per join strategy.

Reference nodes: batch hash join (BatchExecHashJoin.scala:53 /
HashJoinOperator.java:58), sort-merge join (BatchExecSortMergeJoin.scala:52),
nested-loop join for theta joins (BatchExecNestedLoopJoin.scala:45),
semi/anti variants, and DataSet cross (CrossOperator.java).

Spark-first: ``df.join`` declares the logical join; Catalyst picks
broadcast-hash / shuffled-hash / sort-merge / broadcast-nested-loop.  We
``broadcast()`` dimension tables explicitly (the analog of the reference's
``isBroadcast`` flag in BatchExecHashJoinRule.scala) so the big fact side
never shuffles for small-dim joins — the decisive pattern at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


@query(
    "join_inner_broadcast",
    oracle="""
    SELECT n_name, count(*) AS num_customers, sum(c_acctbal) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_inner_broadcast(spark, sf_dir):
    """Inner equi-join, dim side broadcast -> BroadcastHashJoin, no shuffle
    of the probe side."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("num_customers"),
            F.sum("c_acctbal").alias("total_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_urgent
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER with a join-side predicate (kept in the ON clause — a
    WHERE would defeat the outer)."""
    t = load_tables(spark, sf_dir)
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        t["customer"]
        .join(t["orders"], cond, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_urgent"))
        .orderBy("c_custkey")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, c_name
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) big
    RIGHT OUTER JOIN orders ON c_custkey = o_custkey
    WHERE o_totalprice > 300000
    ORDER BY o_orderkey
    """,
)
def join_right_outer(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    big = t["customer"].where(F.col("c_acctbal") > 9000)
    return (
        big.join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "right_outer")
        .where(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT
      coalesce(c.k, o.k) AS nation_bucket,
      c.n_cust, o.n_ord
    FROM (SELECT c_nationkey % 10 AS k, count(*) AS n_cust
          FROM customer WHERE c_acctbal > 9500 GROUP BY c_nationkey % 10) c
    FULL OUTER JOIN
         (SELECT CAST(o_custkey % 10 AS INT) AS k, count(*) AS n_ord
          FROM orders WHERE o_totalprice > 350000 GROUP BY CAST(o_custkey % 10 AS INT)) o
      ON c.k = o.k
    ORDER BY nation_bucket
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER (sort-merge; broadcast is invalid for full outer —
    mirrors the reference supporting full outer only in its SMJ)."""
    t = load_tables(spark, sf_dir)
    c = (
        t["customer"]
        .where(F.col("c_acctbal") > 9500)
        .groupBy((F.col("c_nationkey") % 10).alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    o = (
        t["orders"]
        .where(F.col("o_totalprice") > 350000)
        .groupBy((F.col("o_custkey") % 10).cast("int").alias("k"))
        .agg(F.count("*").alias("n_ord"))
    )
    return (
        c.join(o, c["k"] == o["k"], "full_outer")
        .select(
            F.coalesce(c["k"], o["k"]).alias("nation_bucket"),
            "n_cust",
            "n_ord",
        )
        .orderBy("nation_bucket")
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def join_left_semi(spark, sf_dir):
    """LEFT SEMI — the reference's semi join (HashJoinOperator semi mode)."""
    t = load_tables(spark, sf_dir)
    big_orders = t["orders"].where(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def join_left_anti(spark, sf_dir):
    """LEFT ANTI — NOT EXISTS (StreamingSemiAntiJoinOperator batch analog).
    Customers with no urgent order: every fixture customer has at least
    one order, so the bare "no orders" anti join was vacuously empty."""
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    ORDER BY from_region, to_region
    """,
)
def join_cross(spark, sf_dir):
    """CROSS join (DataSet CrossOperator) — only sane for tiny sides."""
    t = load_tables(spark, sf_dir)
    r1 = t["region"].select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("k1"))
    r2 = t["region"].select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("k2"))
    return (
        r1.crossJoin(r2)
        .where(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@query(
    "join_theta_band",
    oracle="""
    SELECT s_suppkey, count(*) AS n_close
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey
     AND c_acctbal BETWEEN s_acctbal - 200 AND s_acctbal + 200
    GROUP BY s_suppkey ORDER BY s_suppkey
    """,
)
def join_theta_band(spark, sf_dir):
    """Theta/band join: equi part hashes, band predicate evaluated post-match
    (reference: non-equi conditions on HashJoin / NestedLoopJoin)."""
    t = load_tables(spark, sf_dir)
    cond = (
        (F.col("s_nationkey") == F.col("c_nationkey"))
        & (F.col("c_acctbal") >= F.col("s_acctbal") - 200)
        & (F.col("c_acctbal") <= F.col("s_acctbal") + 200)
    )
    return (
        t["supplier"]
        .join(t["customer"], cond)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close"))
        .orderBy("s_suppkey")
    )


@query(
    "join_multiway_star",
    oracle="""
    SELECT r_name, o_orderstatus, count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS gross_e2
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, o_orderstatus
    ORDER BY r_name, o_orderstatus
    """,
)
def join_multiway_star(spark, sf_dir):
    """Star join: fact -> orders -> dims, all dims broadcast; the single
    shuffle is the final aggregation."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("gross_e2"),
        )
        .orderBy("r_name", "o_orderstatus")
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS cnt,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS total_e2
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def join_skew_salted(spark, sf_dir):
    """Skew-safe salted join must be RESULT-IDENTICAL to the plain join:
    lineitem salted into 8 sub-keys, orders replicated per salt value,
    joined on (key, salt) — the hot-key decomposition from
    operators/partitioning (the manual fallback when AQE's skew split
    still leaves a straggler).  The oracle is the unsalted join."""
    from flink_1_12_0_spark.operators.partitioning import salted_join

    t = load_tables(spark, sf_dir)
    joined = salted_join(
        t["lineitem"], t["orders"], key="l_orderkey", small_key="o_orderkey",
        salt=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("total_e2"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_bloom_runtime_filter",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS rev_e4
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 450000 AND o_orderpriority = '1-URGENT'
    GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
    ORDER BY yr
    """,
)
def join_bloom_runtime_filter(spark, sf_dir):
    """Bloom runtime-filter join must be RESULT-IDENTICAL to the plain
    join: the selective dim side (urgent orders over 450k — ~2% of
    orders) is compressed into a
    Bloom filter (operators/sketches — constant <=1024 rows at ANY dim
    size), the fact side is pre-pruned by a ZERO-SHUFFLE broadcast
    bit-test probe (no false negatives, so nothing is lost), and the
    exact join above it removes the deterministic false positives.  The
    oracle is the plain join — proving the filter is semantically
    transparent, exactly the reference's join runtime-filter contract
    (flink-table-planner-blink uses Bloom filters the same way).  100 TB:
    this is the pattern for a fact-dim join whose dim side is too big to
    broadcast raw but whose FILTERED keys compress into a shippable
    bit array — the probe prunes fact rows before the join shuffle."""
    from flink_1_12_0_spark.operators import sketches

    t = load_tables(spark, sf_dir)
    dim = t["orders"].where(
        "o_totalprice > 450000 AND o_orderpriority = '1-URGENT'"
    )
    # the filter is <=1024 rows; checkpoint it so the probe's three
    # broadcast joins reuse ONE build instead of recomputing the dim
    # scan + bit_or per join side (measured 3x the build cost without it).
    # Hash family: xxhash_positions — the filter never leaves the engine
    # (the oracle is the plain join), so the cross-engine md5 primitive
    # would buy nothing and costs ~16x more per probe row (measured).
    bloom = sketches.bloom_build(
        dim.selectExpr("o_orderkey AS k"), "k",
        positions=sketches.xxhash_positions,
    ).localCheckpoint(eager=True)
    pruned = (
        sketches.bloom_probe(t["lineitem"], "l_orderkey", bloom,
                             positions=sketches.xxhash_positions)
        .where("maybe_member = 1")
        .drop("maybe_member")
    )
    return (
        pruned.join(dim, pruned["l_orderkey"] == dim["o_orderkey"])
        .groupBy(F.expr("CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)").alias("yr"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000)"
                       " AS BIGINT)")
            ).cast("bigint").alias("rev_e4"),
        )
        .orderBy("yr")
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_e2,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY o_orderkey, o_custkey
    ORDER BY o_orderkey
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Persisted co-located join through bucketed CATALOG tables: both
    sides are written ``bucketBy(8, orderkey)`` (operators/partitioning.
    bucketize_write) and read back via the catalog, so the equi-join
    consumes the pre-shuffled on-disk layout — at 100 TB this is THE way
    to pay a fact-fact join's shuffle once at write time and amortize it
    over every downstream join on the same key.  The zero-Exchange and
    SelectedBucketsCount plan receipts live in tests/test_partitioning.py
    (plans aren't driver-checkable); THIS row grades result equality of
    the bucketed path against the plain-scan oracle.  Revenue is summed
    in e2 integer cents so the rollup is order-exact.  Reference: the
    batch planner's required-distribution exchanges
    (BatchExecExchange.scala:52) — Spark's bucketing satisfies the
    distribution from the layout instead of re-shuffling."""
    import tempfile

    from flink_1_12_0_spark.operators.partitioning import (
        bucketize_write,
        read_bucketed,
    )

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where("l_shipdate >= DATE '1995-01-01'").select(
        "l_orderkey", "l_extendedprice")
    od = t["orders"].select("o_orderkey", "o_custkey")
    base = tempfile.mkdtemp(prefix="sg_bucketed_")
    spark.sql("DROP TABLE IF EXISTS graded_bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS graded_bkt_orders")
    bucketize_write(li, "graded_bkt_lineitem", ["l_orderkey"], 8,
                    path=f"{base}/li")
    bucketize_write(od, "graded_bkt_orders", ["o_orderkey"], 8,
                    path=f"{base}/od")
    return (
        read_bucketed(spark, "graded_bkt_lineitem")
        .join(read_bucketed(spark, "graded_bkt_orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("bigint").alias("revenue_e2"),
            F.count("*").cast("bigint").alias("n_items"))
        .orderBy("o_orderkey")
    )
