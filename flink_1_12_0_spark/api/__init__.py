"""Fluent Table API layer (reference: flink-table-api-java Table.java /
TableEnvironment.java) over PySpark DataFrames."""

from flink_1_12_0_spark.api.table import Table, TableEnvironment  # noqa: F401
