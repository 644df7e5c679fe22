"""Queries written in the FLINK 1.12 SQL dialect and executed through the
dialect shim (plans/dialect_shim.translate) — what a reference user's
existing SQL runs as, unchanged.

Reference grammar: group-window functions TUMBLE/HOP + accessors
(FlinkSqlOperatorTable.java), SPLIT_INDEX (SqlFunctionUtils).
"""

from __future__ import annotations

from flink_1_12_0_spark.plans.dialect_shim import translate
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables

_FMT_D = "%Y-%m-%d %H:%M:%S"


@query(
    "flinksql_tumble_dialect",
    oracle=f"""
    SELECT strftime(epoch_ms(CAST(floor(epoch(ts)/3600)*3600000 AS BIGINT)), '{_FMT_D}') AS w_start,
           event_type, count(*) AS cnt
    FROM events GROUP BY 1, 2 ORDER BY w_start, event_type
    """,
)
def flinksql_tumble_dialect(spark, sf_dir):
    """Verbatim Flink 1.12 group-window SQL through the shim."""
    load_tables(spark, sf_dir)
    flink_sql = """
        SELECT date_format(TUMBLE_START(ts, INTERVAL '1' HOUR), 'yyyy-MM-dd HH:mm:ss') AS w_start,
               event_type, count(*) AS cnt
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
        ORDER BY w_start, event_type
    """
    return spark.sql(translate(flink_sql))


@query(
    "flinksql_split_index_dialect",
    oracle="""
    SELECT string_split(n_name, '_')[2] AS suffix, count(*) AS cnt
    FROM nation GROUP BY 1 ORDER BY suffix
    """,
)
def flinksql_split_index_dialect(spark, sf_dir):
    """SPLIT_INDEX + CHAR_LENGTH dialect functions through the shim."""
    load_tables(spark, sf_dir)
    flink_sql = """
        SELECT SPLIT_INDEX(n_name, '_', 1) AS suffix, count(*) AS cnt
        FROM nation
        WHERE CHAR_LENGTH(n_name) > 0
        GROUP BY SPLIT_INDEX(n_name, '_', 1)
        ORDER BY suffix
    """
    return spark.sql(translate(flink_sql))
