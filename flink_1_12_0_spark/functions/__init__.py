"""Flink-dialect scalar/aggregate function surface, Spark-first."""

from flink_1_12_0_spark.functions.dialect import *  # noqa: F401,F403
