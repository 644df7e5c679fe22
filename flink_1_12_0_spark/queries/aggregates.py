"""Aggregation operator coverage.

Reference: hash/sort aggregates (BatchExecHashAggregate.scala:44,
BatchExecSortAggregate.scala:44), built-in agg functions
(planner/functions/aggfunctions/*.java — SUM/SUM0/COUNT/AVG/MIN/MAX/
STDDEV/VAR/COLLECT/LISTAGG/FIRST_VALUE/LAST_VALUE), grouping sets
(DecomposeGroupingSetsRule.scala), distinct aggregates
(FlinkAggregateExpandDistinctAggregatesRule.java).

Spark-first: groupBy().agg() -> HashAggregateExec with partial/final split
(map-side combine) — the two-phase plan the reference implements manually
with Local/Global agg nodes. Order-sensitive aggs (FIRST_VALUE/LAST_VALUE/
LISTAGG) are made deterministic via min_by/max_by/array_sort since input
order after a shuffle is undefined — same caveat the reference documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.functions.dialect import listagg, sum0
from flink_1_12_0_spark.queries import register_sql
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


@query(
    "agg_basic",
    oracle="""
    SELECT l_returnflag,
           count(*) AS cnt,
           count(DISTINCT l_suppkey) AS suppliers,
           sum(l_quantity) AS qty,
           avg(l_extendedprice) AS avg_price,
           min(l_discount) AS min_disc,
           max(l_tax) AS max_tax
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_basic(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("l_suppkey").alias("suppliers"),
            F.sum("l_quantity").alias("qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.min("l_discount").alias("min_disc"),
            F.max("l_tax").alias("max_tax"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           stddev_pop(l_quantity)  AS sd_pop,
           stddev_samp(l_quantity) AS sd_samp,
           var_pop(l_discount)     AS v_pop,
           var_samp(l_discount)    AS v_samp
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def agg_stats(spark, sf_dir):
    """STDDEV_POP/SAMP, VAR_POP/SAMP (reference aggfunctions/*Stddev*)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_linestatus")
        .agg(
            F.stddev_pop("l_quantity").alias("sd_pop"),
            F.stddev_samp("l_quantity").alias("sd_samp"),
            F.var_pop("l_discount").alias("v_pop"),
            F.var_samp("l_discount").alias("v_samp"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "agg_collect_listagg",
    oracle="""
    SELECT r_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           string_agg(n_name, ',' ORDER BY n_name)       AS nations_csv
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey ORDER BY r_regionkey
    """,
)
def agg_collect_listagg(spark, sf_dir):
    """COLLECT + LISTAGG (sorted for cross-engine determinism).

    The COLLECT result is emitted stringified (array_join) because the
    driver's canonicalizer can't hash raw array cells — the array-valued
    aggregation still runs, only the output representation is flattened.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
            listagg("n_name").alias("nations_csv"),
        )
        .orderBy("r_regionkey")
    )


@query(
    "agg_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           min(o_orderdate)        OVER (PARTITION BY o_custkey) AS first_date
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    """,
)
def agg_first_last_value(spark, sf_dir):
    """FIRST_VALUE/LAST_VALUE by event order — expressed as min_by/max_by
    on a composite (ts, key) ordering struct: deterministic under
    shuffles, unlike Flink's input-order FIRST_VALUE (documented)."""
    t = load_tables(spark, sf_dir)
    order = F.struct("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .where(F.col("o_custkey") < 100)
        .groupBy("o_custkey")
        .agg(
            F.min_by("o_orderkey", order).alias("first_order"),
            F.max_by("o_orderkey", order).alias("last_order"),
            F.min("o_orderdate").alias("first_date"),
        )
        .orderBy("o_custkey")
    )


@query(
    "agg_sum0_empty",
    oracle="""
    SELECT coalesce(sum(l_quantity), 0) AS sum0_qty, count(*) AS cnt
    FROM lineitem WHERE l_quantity > 1e9
    """,
)
def agg_sum0_empty(spark, sf_dir):
    """SUM0 on empty input -> 0 (reference Sum0AggFunction)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].where(F.col("l_quantity") > 1e9).agg(
        sum0("l_quantity").alias("sum0_qty"), F.count("*").alias("cnt")
    )


# GROUPING SETS / ROLLUP / CUBE — Catalyst expands via the same Expand node
# the reference builds (StreamExecExpand / DecomposeGroupingSetsRule).
register_sql(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS qty, count(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)

register_sql(
    "agg_rollup",
    """
    SELECT r_name, n_name, count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)

register_sql(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_e2,
           count(*) AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)

# Multiple DISTINCT aggregates in one query — Catalyst's
# RewriteDistinctAggregates (reference: FlinkAggregateExpandDistinctAggregatesRule).
register_sql(
    "agg_multi_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)       AS n_cust,
           count(DISTINCT o_orderpriority) AS n_prio,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                                           AS total_e2
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)

# Conditional aggregation (FILTER / CASE pushdown into agg).
register_sql(
    "agg_filtered",
    """
    SELECT n_name,
           count(*) FILTER (WHERE c_acctbal > 5000)  AS rich,
           count(*) FILTER (WHERE c_acctbal <= 5000) AS modest
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)


@query(
    "agg_distinct_split",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_distinct_l_partkey,
           sum(l_quantity)           AS qty,
           count(l_orderkey)         AS cnt
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_distinct_split(spark, sf_dir):
    """Distinct-split (skew) aggregation: COUNT(DISTINCT) rewritten into
    the two-level bucket plan of the reference's SplitAggregateRule.scala
    (see operators/partitioning.split_distinct_agg).  The oracle is the
    plain single-level COUNT(DISTINCT) — proving the rewrite is exact."""
    from flink_1_12_0_spark.operators.partitioning import split_distinct_agg

    t = load_tables(spark, sf_dir)
    out = split_distinct_agg(
        t["lineitem"],
        ["l_returnflag"],
        "l_partkey",
        n_buckets=32,
        extra_aggs=[("sum", "l_quantity", "qty"), ("count", "l_orderkey", "cnt")],
    )
    return out.orderBy("l_returnflag")


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(list_sort(list(l_extendedprice))[CAST(ceil(0.5*count(*)) AS BIGINT)], 2)
               AS median_price,
           round(list_sort(list(l_extendedprice))[CAST(ceil(0.9*count(*)) AS BIGINT)], 2)
               AS p90_price,
           round(list_sort(list(l_quantity))[CAST(ceil(0.25*count(*)) AS BIGINT)], 2)
               AS q1_qty
    FROM lineitem
    GROUP BY 1 ORDER BY 1
    """,
)
def agg_percentiles(spark, sf_dir):
    """Discrete percentiles (PERCENTILE_DISC semantics: the actual data
    element at rank ceil(p*n)) per return flag — interpolated quantiles
    differ in the last ulp between engines, which flips 2dp rounding at
    .005 boundaries; selecting real elements is engine-exact."""
    t = load_tables(spark, sf_dir)

    def disc(col, p):
        arr = F.array_sort(F.collect_list(col))
        idx = F.ceil(F.lit(p) * F.count(F.lit(1))).cast("int")
        return F.round(F.element_at(arr, idx), 2)

    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            disc("l_extendedprice", 0.5).alias("median_price"),
            disc("l_extendedprice", 0.9).alias("p90_price"),
            disc("l_quantity", 0.25).alias("q1_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)  AS exact_parts,
           count(DISTINCT l_suppkey)  AS exact_supps,
           true AS approx_ok
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """APPROX_COUNT_DISTINCT extension (HLL++). Flink 1.12 has no approx
    distinct aggregate (absent from FlinkSqlOperatorTable.java) — SURVEY
    §2.4 flags Spark's as a deliberate extension: at 100 TB an exact
    COUNT(DISTINCT) is a full shuffle of the distinct keys, while HLL
    sketches merge map-side in constant space.  The oracle checks accuracy
    hash-stably: the estimate (rsd=1%) must land within 5% of the exact
    count — HLL++ is hash-deterministic, so the flag is reproducible."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    exact_p = F.count_distinct("l_partkey")
    exact_s = F.count_distinct("l_suppkey")
    ok = (
        (F.abs(F.approx_count_distinct("l_partkey", 0.01) - exact_p)
         <= 0.05 * exact_p)
        & (F.abs(F.approx_count_distinct("l_suppkey", 0.01) - exact_s)
           <= 0.05 * exact_s)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            exact_p.alias("exact_parts"),
            exact_s.alias("exact_supps"),
            ok.alias("approx_ok"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           round(list_sort(list(l_extendedprice))[CAST(ceil(0.5*count(*)) AS BIGINT)], 2)
               AS median_disc,
           true AS approx_ok
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def agg_approx_percentile(spark, sf_dir):
    """APPROX_PERCENTILE extension (Greenwald-Khanna sketch) — absent from
    Flink 1.12's FlinkSqlOperatorTable like approx distinct.  At 100 TB an
    exact percentile needs a full sort or collect of the group; the sketch
    merges map-side in bounded space.  Accuracy is asserted hash-stably:
    the estimate (accuracy=10000, rank error <= 0.01%) must land between
    the exact 40th and 60th percentiles; the hashed output columns are the
    engine-exact discrete median and the flag."""
    t = load_tables(spark, sf_dir)
    arr = F.array_sort(F.collect_list("l_extendedprice"))
    disc = lambda p: F.element_at(arr, F.ceil(F.lit(p) * F.count(F.lit(1))).cast("int"))  # noqa: E731
    approx = F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(disc(0.5), 2).alias("median_disc"),
            ((approx >= disc(0.4)) & (approx <= disc(0.6))).alias("approx_ok"),
        )
        .orderBy("l_returnflag")
    )
