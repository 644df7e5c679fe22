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


_MR_ERR_ORACLE = """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    runs AS (
        SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY rn) AS grp
        FROM seq),
    eruns AS (
        SELECT user_id, grp, count(*) AS n_errors,
               arg_min(event_id, rn) AS first_error_id, max(rn) AS end_rn
        FROM runs WHERE event_type = 'error' GROUP BY 1, 2)
    SELECT e.user_id, e.n_errors, e.first_error_id, s.event_id AS purchase_id
    FROM eruns e
    JOIN seq s ON s.user_id = e.user_id AND s.rn = e.end_rn + 1
              AND s.event_type = 'purchase'
    {extra_where}
    ORDER BY e.user_id, purchase_id
"""


@query("flinksql_match_recognize", oracle=_MR_ERR_ORACLE.format(extra_where=""))
def flinksql_match_recognize(spark, sf_dir):
    """Verbatim SQL MATCH_RECOGNIZE (PATTERN (E+ P), COUNT/FIRST measures,
    AFTER MATCH SKIP PAST LAST ROW) parsed by plans/match_recognize_sql and
    executed on the CEP NFA operator — the reference's StreamExecMatch
    surface (MatchRecognizeITCase)."""
    from flink_1_12_0_spark.plans.match_recognize_sql import run_match_recognize

    load_tables(spark, sf_dir)
    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(E.*) AS n_errors,
                     FIRST(E.event_id) AS first_error_id,
                     FIRST(P.event_id) AS purchase_id
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (E+ P)
            DEFINE E AS E.event_type = 'error',
                   P AS P.event_type = 'purchase'
        )
    """
    return run_match_recognize(spark, sql).orderBy("user_id", "purchase_id")


@query(
    "flinksql_match_recognize_quantified",
    oracle=_MR_ERR_ORACLE.format(extra_where="WHERE e.n_errors >= 2"),
)
def flinksql_match_recognize_quantified(spark, sf_dir):
    """MATCH_RECOGNIZE with a bounded quantifier ({2,}) and IN-list DEFINE
    predicate through the SQL parser."""
    from flink_1_12_0_spark.plans.match_recognize_sql import run_match_recognize

    load_tables(spark, sf_dir)
    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(E.*) AS n_errors,
                     FIRST(E.event_id) AS first_error_id,
                     FIRST(P.event_id) AS purchase_id
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (E{2,} P)
            DEFINE E AS E.event_type = 'error',
                   P AS P.event_type IN ('purchase')
        )
    """
    return run_match_recognize(spark, sql).orderBy("user_id", "purchase_id")
