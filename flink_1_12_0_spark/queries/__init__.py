"""Query modules — each registers named queries + DuckDB oracles.

``register_sql`` is the shared-SQL fast path: one ANSI SQL string that both
Spark and DuckDB execute identically (Spark side goes through
``spark.sql`` — fully declarative, Catalyst-optimized). Operator-focused
entries use the DataFrame API directly and supply a separate oracle.
"""

from __future__ import annotations

from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


def register_sql(name: str, sql: str, oracle: str | None = None) -> None:
    """Register a query whose Spark side is ``spark.sql(sql)``.

    ``oracle`` defaults to the same string (ANSI subset both engines run).
    """

    @query(name, oracle=oracle or sql)
    def _fn(spark, sf_dir, _sql=sql):  # noqa: ANN001
        load_tables(spark, sf_dir)
        return spark.sql(_sql)
