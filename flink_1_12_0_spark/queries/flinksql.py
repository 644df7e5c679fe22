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


_MR_ALL_ROWS_ORACLE = """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type, value, props,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    m AS (
        SELECT a.user_id, a.rn AS arn, b.rn AS brn
        FROM seq a JOIN seq b ON b.user_id = a.user_id AND b.rn = a.rn + 1
        WHERE a.event_type = 'error' AND b.event_type = 'purchase'),
    nm AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY arn) AS mno
           FROM m)
    SELECT s.user_id, s.event_id, s.ts, s.event_type, s.value, s.props,
           nm.mno, 'A' AS cls
    FROM nm JOIN seq s ON s.user_id = nm.user_id AND s.rn = nm.arn
    UNION ALL
    SELECT s.user_id, s.event_id, s.ts, s.event_type, s.value, s.props,
           nm.mno, 'B' AS cls
    FROM nm JOIN seq s ON s.user_id = nm.user_id AND s.rn = nm.brn
    ORDER BY user_id, mno, cls
"""


@query("flinksql_match_recognize_all_rows", oracle=_MR_ALL_ROWS_ORACLE)
def flinksql_match_recognize_all_rows(spark, sf_dir):
    """ALL ROWS PER MATCH + MATCH_NUMBER()/CLASSIFIER() measures: every
    matched input row is emitted with its pattern variable.  With disjoint
    single-row steps (A=error, B=purchase) the match set is exactly the
    adjacent error→purchase pairs, which the island-free SQL oracle mirrors.
    Reference: StreamExecMatch.scala:68 (ALL ROWS output mode),
    MatchRecognizeITCase."""
    from flink_1_12_0_spark.plans.match_recognize_sql import run_match_recognize

    load_tables(spark, sf_dir)
    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES MATCH_NUMBER() AS mno, CLASSIFIER() AS cls
            ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS A.event_type = 'error',
                   B AS B.event_type = 'purchase'
        )
    """
    return run_match_recognize(spark, sql).orderBy("user_id", "mno", "cls")


_MR_VSHAPE_ORACLE = """
    WITH seq AS (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
        FROM events),
    dirs AS (
        SELECT *, CASE WHEN pv IS NULL THEN 'x'
                       WHEN value < pv THEN 'd'
                       WHEN value > pv THEN 'u'
                       ELSE 'x' END AS dir
        FROM seq),
    isl AS (
        SELECT *, rn - row_number() OVER (PARTITION BY user_id, dir ORDER BY rn) AS grp
        FROM dirs),
    downs AS (
        SELECT user_id, grp, min(rn) AS dstart, max(rn) AS dend,
               count(*) AS n_down, arg_min(event_id, rn) AS first_down_id
        FROM isl WHERE dir = 'd' GROUP BY 1, 2),
    ups AS (
        SELECT user_id, grp, min(rn) AS ustart, count(*) AS n_up,
               arg_max(value, rn) AS top_value
        FROM isl WHERE dir = 'u' GROUP BY 1, 2),
    v AS (
        SELECT dn.user_id, dn.dstart, dn.n_down, dn.first_down_id,
               up.n_up, up.top_value
        FROM downs dn JOIN ups up
          ON up.user_id = dn.user_id AND up.ustart = dn.dend + 1)
    SELECT v.user_id, s.event_id AS strt_id, v.n_down, v.first_down_id,
           v.n_up, v.top_value
    FROM v JOIN seq s ON s.user_id = v.user_id AND s.rn = v.dstart - 1
    ORDER BY v.user_id, strt_id
"""


@query("flinksql_match_recognize_skip_nav", oracle=_MR_VSHAPE_ORACLE)
def flinksql_match_recognize_skip_nav(spark, sf_dir):
    """The reference's canonical V-shape pattern: PREV() navigation inside
    DEFINE plus AFTER MATCH SKIP TO LAST UP (the last up-row can anchor the
    next V).  Matches are exactly the adjacent down-island/up-island pairs,
    which the gaps-and-islands oracle computes.  Reference:
    MatchRecognizeITCase (price V patterns), MatchCodeGenerator PREV."""
    from flink_1_12_0_spark.plans.match_recognize_sql import run_match_recognize

    load_tables(spark, sf_dir)
    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(STRT.event_id) AS strt_id,
                     COUNT(DOWN.*) AS n_down,
                     FIRST(DOWN.event_id) AS first_down_id,
                     COUNT(UP.*) AS n_up,
                     LAST(UP.value) AS top_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO LAST UP
            PATTERN (STRT DOWN+ UP+)
            DEFINE DOWN AS DOWN.value < PREV(value),
                   UP AS UP.value > PREV(value)
        )
    """
    return run_match_recognize(spark, sql).orderBy("user_id", "strt_id")


_MR_RELUCTANT_ORACLE = """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(CASE WHEN event_type = 'purchase' THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pseg
        FROM events),
    errs AS (
        SELECT user_id, pseg, arg_min(event_id, rn) AS first_error_id,
               min(rn) AS ern
        FROM seq WHERE event_type = 'error' GROUP BY 1, 2),
    purch AS (
        SELECT user_id, event_id AS purchase_id, rn,
               row_number() OVER (PARTITION BY user_id ORDER BY rn) AS pno
        FROM seq WHERE event_type = 'purchase')
    SELECT e.user_id, e.first_error_id, p.rn - e.ern - 1 AS n_between,
           p.purchase_id
    FROM errs e JOIN purch p
      ON p.user_id = e.user_id AND p.pno = e.pseg + 1
    ORDER BY e.user_id, first_error_id
"""


@query("flinksql_match_recognize_reluctant", oracle=_MR_RELUCTANT_ORACLE)
def flinksql_match_recognize_reluctant(spark, sf_dir):
    """Reluctant quantifier B*?: the filler takes the SHORTEST span, so C
    binds the FIRST purchase after each anchoring error (greedy would bind
    the last).  With SKIP PAST LAST ROW each purchase-gap segment yields at
    most one match — its first error — which the segment-id oracle mirrors.
    Reference: reluctant quantifiers in CEP Pattern.oneOrMore().consecutive()
    /greedy flags, MatchRecognizeITCase."""
    from flink_1_12_0_spark.plans.match_recognize_sql import run_match_recognize

    load_tables(spark, sf_dir)
    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.event_id) AS first_error_id,
                     COUNT(B.*) AS n_between,
                     FIRST(C.event_id) AS purchase_id
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B*? C)
            DEFINE A AS A.event_type = 'error',
                   C AS C.event_type = 'purchase'
        )
    """
    return run_match_recognize(spark, sql).orderBy("user_id", "first_error_id")


@query(
    "flinksql_ddl_roundtrip",
    oracle="""
    SELECT r_name, count(*) AS n_nations, CAST(max(length(n_name)) AS BIGINT) AS max_len
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def flinksql_ddl_roundtrip(spark, sf_dir):
    """A DDL script through TableEnvironment.execute_sql: CREATE TABLE with
    filesystem connector, CREATE VIEW over a dialect query (CHAR_LENGTH),
    ALTER TABLE RENAME, then a SELECT joining the renamed view — the
    SqlToOperationConverter statement-routing surface end to end."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE nation_ddl (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{sf_dir}/nation.parquet',
              'format' = 'parquet')
    """)
    env.execute_sql(f"""
        CREATE TABLE region_ddl (r_regionkey BIGINT, r_name STRING)
        WITH ('connector' = 'filesystem', 'path' = '{sf_dir}/region.parquet',
              'format' = 'parquet')
    """)
    env.execute_sql("""
        CREATE VIEW nation_stats_ddl AS
        SELECT n_regionkey, n_name, CHAR_LENGTH(n_name) AS name_len FROM nation_ddl
    """)
    env.execute_sql("ALTER TABLE nation_stats_ddl RENAME TO nation_stats2_ddl")
    return env.execute_sql("""
        SELECT r_name, count(*) AS n_nations, CAST(max(name_len) AS BIGINT) AS max_len
        FROM nation_stats2_ddl JOIN region_ddl ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """)


@query(
    "flinksql_lateral_udtf",
    oracle="""
    SELECT doc_id, word, CAST(length(word) AS BIGINT) AS wlen
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 50)
    WHERE length(word) > 3
    ORDER BY doc_id, word
    """,
)
def flinksql_lateral_udtf(spark, sf_dir):
    """UDTF join dialect: FROM t, LATERAL TABLE(f(x)) AS T(c) — Flink's
    StreamExecCorrelate / LogicalUnnestRule surface — translated to
    Spark's LATERAL VIEW explode.  Any array-producing expression works
    where Flink would require a registered TableFunction; the whole plan
    stays JVM-side (Generate node, no Python)."""
    from flink_1_12_0_spark.plans.dialect_shim import translate

    load_tables(spark, sf_dir)
    sql = """
        SELECT doc_id, word, CAST(CHAR_LENGTH(word) AS BIGINT) AS wlen
        FROM documents, LATERAL TABLE(split(text, ' ')) AS T(word)
        WHERE doc_id < 50 AND CHAR_LENGTH(word) > 3
        ORDER BY doc_id, word
    """
    return spark.sql(translate(sql))


@query(
    "flinksql_temporal_asof",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, max_by(value, event_id) AS state_value
          FROM events WHERE event_type = 'error' GROUP BY 1, 2)
    SELECT p.p_id, p.user_id, round(v.state_value, 4) AS r_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    ORDER BY p_id
    """,
)
def flinksql_temporal_asof(spark, sf_dir):
    """Verbatim Flink-SQL event-time temporal join through the dialect
    router: ``JOIN v FOR SYSTEM_TIME AS OF p.ts`` — parsed by
    plans/temporal_sql.py (StreamExecTemporalJoin.scala:56 semantics) and
    executed as the one-shuffle-one-sort as-of plan.  The versioned side
    is deduped to one state row per (key, ts) so tie order is
    deterministic for the oracle comparison."""
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    ).createOrReplaceTempView("tmp_temporal_probe")
    (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("state_value"))
    ).createOrReplaceTempView("tmp_temporal_versions")

    env = TableEnvironment(spark)
    return env.execute_sql("""
        SELECT p.p_id, p.user_id, round(v.state_value, 4) AS r_value
        FROM tmp_temporal_probe AS p
        LEFT JOIN tmp_temporal_versions FOR SYSTEM_TIME AS OF p.ts AS v
        ON p.user_id = v.user_id
        ORDER BY p_id
    """)


@query(
    "flinksql_statement_set",
    oracle="""
    SELECT 'c_high' AS sink, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
    FROM customer WHERE c_acctbal > 5000
    UNION ALL
    SELECT 'c_low' AS sink, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
    FROM customer WHERE c_acctbal <= 5000
    ORDER BY sink
    """,
)
def flinksql_statement_set(spark, sf_dir):
    """StatementSet multi-INSERT pipeline (StatementSet.java:32): one
    source feeding two filesystem sinks in a single execute(), read back
    and aggregated — the oracle computes the same split directly from
    the source table, so the round-trip must be lossless."""
    import tempfile

    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    load_tables(spark, sf_dir)
    env = TableEnvironment(spark)
    d = tempfile.mkdtemp(prefix="stmtset_")
    for name, sub in (("tmp_ss_high", "high"), ("tmp_ss_low", "low")):
        env.execute_sql(f"""
            CREATE TABLE {name} (c_custkey BIGINT, c_acctbal DOUBLE)
            WITH ('connector'='filesystem', 'path'='{d}/{sub}',
                  'format'='parquet')""")
    (
        env.create_statement_set()
        .add_insert_sql("""INSERT OVERWRITE tmp_ss_high
            SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000""")
        .add_insert_sql("""INSERT OVERWRITE tmp_ss_low
            SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal <= 5000""")
        .execute()
    )
    return spark.sql("""
        SELECT 'c_high' AS sink, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
        FROM tmp_ss_high
        UNION ALL
        SELECT 'c_low' AS sink, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
        FROM tmp_ss_low
        ORDER BY sink""")


@query(
    "flinksql_create_table_like",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS cnt,
           CAST(sum(CAST(round(o_totalprice * 0.9 * 10000) AS BIGINT))
                AS BIGINT) AS net_total_e4
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def flinksql_create_table_like(spark, sf_dir):
    """FLIP-110 CREATE TABLE ... LIKE through the DDL router (reference
    grammar flink-sql-parser parserImpls.ftl SqlTableLike; merge logic
    SqlCreateTableConverter/MergeTableLikeUtil): a derived table inherits
    the base's schema and connector options, overrides an option via
    OVERWRITING OPTIONS, and adds a computed column on top."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    load_tables(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE orders_base (
            o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
            o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING)
        WITH ('connector' = 'filesystem', 'path' = '{sf_dir}/orders.parquet',
              'format' = 'parquet')
    """)
    env.execute_sql(f"""
        CREATE TABLE orders_derived (
            net_price AS o_totalprice * 0.9
        ) WITH ('path' = '{sf_dir}/orders.parquet')
        LIKE orders_base (OVERWRITING OPTIONS)
    """)
    return env.execute_sql("""
        SELECT o_orderpriority,
               count(*) AS cnt,
               CAST(sum(CAST(round(net_price * 10000) AS BIGINT)) AS BIGINT)
                   AS net_total_e4
        FROM orders_derived
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


@query(
    "flinksql_computed_column",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS gross_rev_e4,
           count(*) AS cnt
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def flinksql_computed_column(spark, sf_dir):
    """Computed (generated) columns in CREATE TABLE DDL — derived at read
    time, excluded from the physical schema (reference: computed-column
    rows in parserImpls.ftl / CatalogTableSchemaResolver)."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    load_tables(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE lineitem_cc (
            l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
            l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,
            l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,
            l_linestatus STRING, l_shipdate TIMESTAMP,
            gross AS l_extendedprice * (1 - l_discount)
        ) WITH ('connector' = 'filesystem',
                'path' = '{sf_dir}/lineitem.parquet', 'format' = 'parquet')
    """)
    return env.execute_sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(gross * 10000) AS BIGINT)) AS BIGINT)
                   AS gross_rev_e4,
               count(*) AS cnt
        FROM lineitem_cc
        WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """)


@query(
    "flinksql_temporal_function",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, max_by(value, event_id) AS state_value
          FROM events WHERE event_type = 'error' GROUP BY 1, 2)
    SELECT p.p_id, p.user_id, round(v.state_value, 4) AS state_value
    FROM p ASOF JOIN v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    ORDER BY p_id
    """,
)
def flinksql_temporal_function(spark, sf_dir):
    """Temporal table FUNCTION correlate — the pre-FLIP-132 SQL spelling
    (TemporalTableFunction.java; LogicalCorrelateToJoinFromTemporalTable
    rules): ``FROM p, LATERAL TABLE (state_at(p.ts)) v WHERE v.user_id =
    p.user_id`` over a function registered from the versions table.
    Inner semantics (probe rows with no valid version drop), executed on
    the same one-shuffle-one-sort as-of plan as FOR SYSTEM_TIME AS OF."""
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.api.table import Table
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    ).createOrReplaceTempView("tmp_ttf_probe")
    versions = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("state_value"))
    )

    env = TableEnvironment(spark)
    env.register_function(
        "state_at", Table(versions).create_temporal_table_function("ts", "user_id")
    )
    return env.execute_sql("""
        SELECT p.p_id, p.user_id, round(v.state_value, 4) AS state_value
        FROM tmp_ttf_probe AS p,
             LATERAL TABLE (state_at(p.ts)) AS v
        WHERE v.user_id = p.user_id
        ORDER BY p_id
    """)


@query(
    "flinksql_dialect_extras",
    oracle="""
    SELECT n_nationkey,
           sha256(n_name) AS name_sha,
           sign(n_nationkey - 11.5) * floor(abs(n_nationkey - 11.5) * power(10, 1))
               / power(10, 1) AS trunc1,
           n_nationkey BETWEEN least(20, 5) AND greatest(20, 5) AS in_band
    FROM nation
    ORDER BY n_nationkey
    """,
)
def flinksql_dialect_extras(spark, sf_dir):
    """Round-3 dialect additions exercised through the executeSql router
    end to end: SHA256(expr) -> sha2(expr, 256), numeric TRUNCATE(x, d)
    (toward-zero floor expansion), and BETWEEN SYMMETRIC with reversed
    bounds (least/greatest normalization) — all Flink-SQL spellings Spark
    does not accept natively."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment

    load_tables(spark, sf_dir)
    env = TableEnvironment(spark)
    return env.execute_sql("""
        SELECT n_nationkey,
               SHA256(n_name) AS name_sha,
               TRUNCATE(n_nationkey - 11.5, 1) AS trunc1,
               n_nationkey BETWEEN SYMMETRIC 20 AND 5 AS in_band
        FROM nation
        ORDER BY n_nationkey
    """)
