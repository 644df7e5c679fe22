"""Set-operation coverage: UNION [ALL], INTERSECT [ALL], EXCEPT [ALL].

Reference: StreamExecUnion.scala:39 / BatchExecUnion.scala:41; distinct
union via UNION_TO_DISTINCT (FlinkBatchRuleSets.scala:271); INTERSECT/EXCEPT
rewritten to semi/anti joins (ReplaceIntersectWithSemiJoinRule.scala,
ReplaceMinusWithAntiJoinRule.scala, RewriteIntersectAllRule /
RewriteMinusAllRule for ALL variants).

Spark-first: union/distinct/intersect/intersectAll/exceptAll are native and
Catalyst performs the same semi/anti-join rewrites.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


def _sides(t):
    """Two overlapping projections: nation keys of rich customers vs
    suppliers (same schema, both with duplicates)."""
    a = t["customer"].where(F.col("c_acctbal") > 7000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = t["supplier"].where(F.col("s_acctbal") > 3000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return a, b

_ORACLE_A = "SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 7000"
_ORACLE_B = "SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 3000"


@query(
    "setop_union_all",
    oracle=f"SELECT nationkey, count(*) AS cnt FROM ({_ORACLE_A} UNION ALL {_ORACLE_B}) GROUP BY nationkey ORDER BY nationkey",
)
def setop_union_all(spark, sf_dir):
    a, b = _sides(load_tables(spark, sf_dir))
    return (
        a.unionAll(b)
        .groupBy("nationkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy("nationkey")
    )


@query(
    "setop_union_distinct",
    oracle=f"SELECT nationkey FROM ({_ORACLE_A} UNION {_ORACLE_B}) ORDER BY nationkey",
)
def setop_union_distinct(spark, sf_dir):
    a, b = _sides(load_tables(spark, sf_dir))
    return a.union(b).distinct().orderBy("nationkey")


@query(
    "setop_intersect",
    oracle=f"SELECT nationkey FROM ({_ORACLE_A} INTERSECT {_ORACLE_B}) ORDER BY nationkey",
)
def setop_intersect(spark, sf_dir):
    a, b = _sides(load_tables(spark, sf_dir))
    return a.intersect(b).orderBy("nationkey")


@query(
    "setop_intersect_all",
    oracle=f"SELECT nationkey, count(*) AS cnt FROM ({_ORACLE_A} INTERSECT ALL {_ORACLE_B}) GROUP BY nationkey ORDER BY nationkey",
)
def setop_intersect_all(spark, sf_dir):
    a, b = _sides(load_tables(spark, sf_dir))
    return (
        a.intersectAll(b)
        .groupBy("nationkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy("nationkey")
    )


@query(
    "setop_except",
    oracle=f"SELECT nationkey FROM ({_ORACLE_A} EXCEPT {_ORACLE_B}) ORDER BY nationkey",
)
def setop_except(spark, sf_dir):
    a, b = _sides(load_tables(spark, sf_dir))
    return a.subtract(b).orderBy("nationkey")


@query(
    "setop_except_all",
    oracle=f"SELECT nationkey, count(*) AS cnt FROM ({_ORACLE_A} EXCEPT ALL {_ORACLE_B}) GROUP BY nationkey ORDER BY nationkey",
)
def setop_except_all(spark, sf_dir):
    a, b = _sides(load_tables(spark, sf_dir))
    return (
        a.exceptAll(b)
        .groupBy("nationkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy("nationkey")
    )
