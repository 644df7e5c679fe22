"""executeSql statement-kind coverage (SqlToOperationConverter routing,
SURVEY §3.1): one assertion per statement family."""

from __future__ import annotations

import pytest

from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment
from flink_1_12_0_spark.tables import load_tables
from tests.conftest import SF_DIR


@pytest.fixture()
def env(spark):
    load_tables(spark, SF_DIR)
    return TableEnvironment(spark)


def test_create_table_and_show_tables(env):
    env.execute_sql(f"""
        CREATE TABLE t_ddl_nation (n_nationkey BIGINT, n_name STRING)
        WITH ('connector'='filesystem', 'path'='{SF_DIR}/nation.parquet',
              'format'='parquet')""")
    names = [r.tableName for r in env.execute_sql("SHOW TABLES").collect()]
    assert "t_ddl_nation" in names
    assert env.execute_sql("SELECT count(*) AS c FROM t_ddl_nation").collect()[0].c == 25


def test_create_drop_view(env):
    env.execute_sql(
        "CREATE VIEW v_ddl AS SELECT n_regionkey, CHAR_LENGTH(n_name) AS l FROM nation"
    )
    assert env.execute_sql("SELECT max(l) AS m FROM v_ddl").collect()[0].m == 9
    env.execute_sql("DROP VIEW v_ddl")
    assert "v_ddl" not in [r.tableName for r in env.execute_sql("SHOW TABLES").collect()]
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP VIEW v_ddl")
    env.execute_sql("DROP VIEW IF EXISTS v_ddl")  # no raise


def test_alter_table_rename(env):
    env.execute_sql("CREATE VIEW v_ren_a AS SELECT 1 AS x")
    env.execute_sql("ALTER TABLE v_ren_a RENAME TO v_ren_b")
    assert env.execute_sql("SELECT x FROM v_ren_b").collect()[0].x == 1
    names = [r.tableName for r in env.execute_sql("SHOW TABLES").collect()]
    assert "v_ren_a" not in names and "v_ren_b" in names


def test_database_use_and_show(env):
    env.execute_sql("CREATE DATABASE IF NOT EXISTS ddl_db")
    dbs = [r.namespace for r in env.execute_sql("SHOW DATABASES").collect()]
    assert "ddl_db" in dbs
    env.execute_sql("USE ddl_db")
    env.execute_sql("USE default")
    env.execute_sql("DROP DATABASE ddl_db")


def test_describe_and_explain(env):
    rows = env.execute_sql("DESCRIBE nation").collect()
    assert {"n_name", "n_nationkey"} <= {r.col_name for r in rows}
    # Flink EXPLAIN PLAN FOR syntax, dialect function inside
    plan = env.execute_sql(
        "EXPLAIN PLAN FOR SELECT CHAR_LENGTH(n_name) FROM nation"
    ).collect()[0][0]
    assert "length" in plan


def test_create_function_python(env):
    env.execute_sql("CREATE TEMPORARY FUNCTION py_basename AS 'posixpath.basename' LANGUAGE PYTHON")
    got = env.execute_sql("SELECT py_basename('/a/b/c.txt') AS b").collect()[0].b
    assert got == "c.txt"
    env.execute_sql("DROP FUNCTION py_basename")  # replayable no-op


def test_insert_into_filesystem_table(env, tmp_path):
    p = str(tmp_path / "sink")
    env.execute_sql("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 3").write.parquet(p)
    env.execute_sql(f"""
        CREATE TABLE ins_tbl (n_nationkey BIGINT, n_name STRING)
        WITH ('connector'='filesystem', 'path'='{p}', 'format'='parquet')""")
    env.execute_sql(
        "INSERT INTO ins_tbl SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 3"
    )
    assert env.execute_sql("SELECT count(*) AS c FROM ins_tbl").collect()[0].c == 25
    env.execute_sql(
        "INSERT OVERWRITE ins_tbl SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5"
    )
    assert env.execute_sql("SELECT count(*) AS c FROM ins_tbl").collect()[0].c == 5


def test_match_recognize_through_env(env):
    out = env.execute_sql("""
        SELECT * FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY ts, event_id
            MEASURES COUNT(E.*) AS n FIRST? -- placeholder
            PATTERN (E P)
            DEFINE E AS E.event_type = 'error', P AS P.event_type = 'purchase'
        )""".replace("MEASURES COUNT(E.*) AS n FIRST? -- placeholder",
                     "MEASURES COUNT(E.*) AS n"))
    assert out.count() >= 0


def test_partitioned_table_insert_and_show_partitions(env, tmp_path):
    """PARTITIONED BY: INSERT writes the directory layout
    (FileSystemTableSink), SHOW PARTITIONS lists 'col=value' spec rows."""
    d = str(tmp_path / "part_tbl")
    env.execute_sql(f"""
        CREATE TABLE t_ddl_part (n_name STRING, n_nationkey BIGINT, n_regionkey BIGINT)
        PARTITIONED BY (n_regionkey)
        WITH ('connector'='filesystem', 'path'='{d}', 'format'='parquet')""")
    env.execute_sql(
        "INSERT OVERWRITE t_ddl_part "
        "SELECT n_name, n_nationkey, n_regionkey FROM nation"
    )
    import os

    assert any(e.startswith("n_regionkey=") for e in os.listdir(d))
    parts = [r.partition for r in
             env.execute_sql("SHOW PARTITIONS t_ddl_part").collect()]
    assert parts == [f"n_regionkey={i}" for i in range(5)]
    assert env.execute_sql("SELECT count(*) AS c FROM t_ddl_part").collect()[0].c == 25


def test_alter_view_rename(env):
    env.execute_sql("CREATE VIEW v_ddl_r AS SELECT 1 AS one")
    env.execute_sql("ALTER VIEW v_ddl_r RENAME TO v_ddl_r2")
    assert env.execute_sql("SELECT * FROM v_ddl_r2").collect()[0].one == 1


def test_catalog_and_module_statements(env):
    assert [r.catalog_name for r in env.execute_sql("SHOW CATALOGS").collect()] == [
        "default_catalog"
    ]
    assert env.execute_sql("SHOW CURRENT CATALOG").collect()[0][0] == "default_catalog"
    assert env.execute_sql("SHOW CURRENT DATABASE").collect()[0][0]
    assert [r.module_name for r in env.execute_sql("SHOW MODULES").collect()] == ["core"]
    assert env.execute_sql("USE CATALOG default_catalog") is None
    with pytest.raises(ValueError):
        env.execute_sql("USE CATALOG nope")


# ------------------------------------------------- FOR SYSTEM_TIME AS OF


def _temporal_fixture(spark):
    probe = spark.createDataFrame(
        [(1, "EUR", "2024-01-01 10:00:00"), (2, "EUR", "2024-01-01 12:00:00"),
         (3, "USD", "2024-01-01 09:00:00"), (4, "JPY", "2024-01-01 10:00:00")],
        "order_id bigint, currency string, order_time string",
    ).selectExpr("order_id", "currency", "CAST(order_time AS TIMESTAMP) AS order_time")
    rates = spark.createDataFrame(
        [("EUR", 1.0, "2024-01-01 09:00:00"), ("EUR", 1.1, "2024-01-01 11:00:00"),
         ("USD", 0.9, "2024-01-01 08:00:00")],
        "ccy string, rate double, update_time string",
    ).selectExpr("ccy", "rate", "CAST(update_time AS TIMESTAMP) AS update_time")
    probe.createOrReplaceTempView("t_orders")
    rates.createOrReplaceTempView("t_rates")


def test_temporal_join_inner_drops_unversioned(env, spark):
    """INNER FOR SYSTEM_TIME AS OF: each probe row sees the version valid
    at its time; rows with no version yet (JPY) are dropped — and the ON
    clause may rename keys (currency = ccy)."""
    _temporal_fixture(spark)
    got = env.execute_sql("""
        SELECT o.order_id, r.rate
        FROM t_orders AS o
        JOIN t_rates FOR SYSTEM_TIME AS OF o.order_time AS r
        ON o.currency = r.ccy
        ORDER BY o.order_id
    """).collect()
    assert [(r.order_id, r.rate) for r in got] == [(1, 1.0), (2, 1.1), (3, 0.9)]


def test_temporal_join_left_keeps_unversioned(env, spark):
    _temporal_fixture(spark)
    got = env.execute_sql("""
        SELECT o.order_id, r.rate
        FROM t_orders AS o
        LEFT JOIN t_rates FOR SYSTEM_TIME AS OF o.order_time AS r
        ON o.currency = r.ccy
        ORDER BY o.order_id
    """).collect()
    assert [(r.order_id, r.rate) for r in got] == [
        (1, 1.0), (2, 1.1), (3, 0.9), (4, None)]


def test_temporal_join_rowtime_from_watermark_ddl(env, spark, tmp_path):
    """The versioned side's rowtime comes from its CREATE TABLE watermark
    column when the AS OF column name differs (Flink derives it from the
    table's rowtime attribute)."""
    _temporal_fixture(spark)
    d = str(tmp_path / "rates_tbl")
    spark.table("t_rates").selectExpr(
        "ccy", "rate", "update_time AS valid_from"
    ).write.parquet(d)
    env.execute_sql(f"""
        CREATE TABLE rates_versioned (
            ccy STRING, rate DOUBLE, valid_from TIMESTAMP(3),
            WATERMARK FOR valid_from AS valid_from - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem', 'path'='{d}', 'format'='parquet')""")
    got = env.execute_sql("""
        SELECT o.order_id, r.rate
        FROM t_orders AS o
        JOIN rates_versioned FOR SYSTEM_TIME AS OF o.order_time AS r
        ON o.currency = r.ccy
        ORDER BY o.order_id
    """).collect()
    assert [(r.order_id, r.rate) for r in got] == [(1, 1.0), (2, 1.1), (3, 0.9)]


def test_temporal_join_bad_shapes_raise(env, spark):
    _temporal_fixture(spark)
    with pytest.raises(ValueError, match="AS OF must reference the probe"):
        env.execute_sql("""
            SELECT o.order_id FROM t_orders AS o
            JOIN t_rates FOR SYSTEM_TIME AS OF r.update_time AS r
            ON o.currency = r.ccy""")
    with pytest.raises(ValueError, match="equi-condition"):
        env.execute_sql("""
            SELECT o.order_id FROM t_orders AS o
            JOIN t_rates FOR SYSTEM_TIME AS OF o.order_time AS r
            ON o.order_id > 0""")


# ------------------------------------------------------------ StatementSet


def test_statement_set_multi_insert(env, tmp_path):
    """createStatementSet: inserts accumulate, nothing writes until
    execute(), then every sink is written in declaration order."""
    import os

    for n in ("ss_a", "ss_b"):
        env.execute_sql(f"""
            CREATE TABLE {n} (n_name STRING, n_nationkey BIGINT)
            WITH ('connector'='filesystem', 'path'='{tmp_path / n}',
                  'format'='parquet')""")
    ss = (
        env.create_statement_set()
        .add_insert_sql("INSERT INTO ss_a SELECT n_name, n_nationkey FROM nation WHERE n_nationkey < 5")
        .add_insert_sql("INSERT INTO ss_b SELECT n_name, n_nationkey FROM nation WHERE n_nationkey >= 5")
    )
    assert not os.path.exists(tmp_path / "ss_a")  # deferred until execute
    res = ss.execute()
    assert [r.table_name for r in res.collect()] == ["ss_a", "ss_b"]
    assert env.execute_sql("SELECT count(*) AS c FROM ss_a").collect()[0].c == 5
    assert env.execute_sql("SELECT count(*) AS c FROM ss_b").collect()[0].c == 20


def test_statement_set_add_insert_dataframe(env, spark, tmp_path):
    """addInsert(target, table): a Table-API DataFrame as the source."""
    env.execute_sql(f"""
        CREATE TABLE ss_df (r_name STRING)
        WITH ('connector'='filesystem', 'path'='{tmp_path / "ss_df"}',
              'format'='parquet')""")
    df = spark.table("region").selectExpr("r_name")
    env.create_statement_set().add_insert("ss_df", df).execute()
    assert env.execute_sql("SELECT count(*) AS c FROM ss_df").collect()[0].c == 5


def test_statement_set_rejects_non_insert(env):
    with pytest.raises(ValueError, match="not an INSERT"):
        env.create_statement_set().add_insert_sql("SELECT 1")
    with pytest.raises(ValueError, match="empty"):
        env.create_statement_set().execute()


def test_alter_table_set_properties(env, tmp_path):
    """SqlAlterTableProperties: SET merges/overwrites WITH options on the
    catalog table."""
    env.execute_sql(f"""
        CREATE TABLE props_t (a INT) WITH (
            'connector' = 'filesystem', 'path' = '{tmp_path}/pt',
            'format' = 'json', 'custom' = 'x')""")
    env.execute_sql("ALTER TABLE props_t SET ('custom' = 'y', 'added' = 'z')")
    t = env.connector_tables["props_t"]
    assert t.options["custom"] == "y" and t.options["added"] == "z"
    assert t.options["format"] == "json"  # untouched keys survive


def test_alter_view_as(env, spark):
    env.execute_sql("CREATE TEMPORARY VIEW av AS SELECT 1 AS x")
    env.execute_sql("ALTER VIEW av AS SELECT 2 AS x")
    assert spark.table("av").collect()[0]["x"] == 2


def test_catalog_lifecycle(env):
    """CREATE/USE/SHOW/DROP CATALOG (GenericInMemoryCatalog analog)."""
    import pytest

    env.execute_sql("CREATE CATALOG mem WITH ('type' = 'generic_in_memory')")
    names = [r["catalog_name"] for r in env.execute_sql("SHOW CATALOGS").collect()]
    assert names == ["default_catalog", "mem"]
    env.execute_sql("USE CATALOG mem")
    cur = env.execute_sql("SHOW CURRENT CATALOG").collect()
    assert cur[0]["current_catalog_name"] == "mem"
    with pytest.raises(ValueError, match="current catalog"):
        env.execute_sql("DROP CATALOG mem")
    env.execute_sql("USE CATALOG default_catalog")
    env.execute_sql("DROP CATALOG mem")
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP CATALOG mem")
    env.execute_sql("DROP CATALOG IF EXISTS mem")  # no error
    with pytest.raises(NotImplementedError, match="in-memory"):
        env.execute_sql("CREATE CATALOG h WITH ('type' = 'hive')")


def test_alter_database_properties(env):
    env.execute_sql("ALTER DATABASE default SET ('retention' = '30d')")


def test_lateral_temporal_function_sql(env, spark):
    """LATERAL TABLE (f(p.ts)) with a registered TemporalTableFunction
    routes to the as-of join; an unregistered name still falls through to
    the UDTF LATERAL VIEW translation."""
    import pandas as pd

    from flink_1_12_0_spark.api.table import Table

    probe = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [1, 2, 3],
                "cur": ["E", "E", "Y"],
                "pts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 12:00", "2024-01-01 12:00"]
                ),
            }
        )
    )
    rates = spark.createDataFrame(
        pd.DataFrame(
            {
                "currency": ["E", "E", "Y"],
                "rate": [1.0, 2.0, 5.0],
                "rts": pd.to_datetime(
                    ["2024-01-01 09:00", "2024-01-01 11:00", "2024-01-01 13:00"]
                ),
            }
        )
    )
    probe.createOrReplaceTempView("ttf_orders")
    env.register_function(
        "rates_at", Table(rates).create_temporal_table_function("rts", "currency")
    )
    out = env.execute_sql("""
        SELECT p.pid, v.rate
        FROM ttf_orders AS p, LATERAL TABLE (rates_at(p.pts)) AS v
        WHERE v.currency = p.cur
        ORDER BY p.pid
    """).collect()
    # pid 1: E@10:00 -> rate 1.0; pid 2: E@12:00 -> rate 2.0;
    # pid 3: Y@12:00 -> no version yet (13:00 is later) -> dropped (inner)
    assert [(r["pid"], r["rate"]) for r in out] == [(1, 1.0), (2, 2.0)]


def test_options_hint_applied_on_kafka_double(env, spark, tmp_path):
    """FLIP-113: an OPTIONS hint on a kafka connector table takes effect
    (scan.startup.mode override changes what the read returns), while the
    registered table's own read is unchanged."""
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.streaming.kafka_shim import topic_write

    d = str(tmp_path / "t_hint")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(100)
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    topic_write(ev, d, key_col=F.col("user_id"),
                value_col=F.to_json(F.struct("event_id")), ts_col="ts")
    env.execute_sql(f"""
        CREATE TABLE k_hint (event_id BIGINT)
        WITH ('connector' = 'kafka', 'path' = '{d}', 'format' = 'json')
    """)
    base = env.execute_sql("SELECT count(*) AS c FROM k_hint").collect()[0].c
    assert base == 100
    spec = ";".join(f"partition:{p},offset:1" for p in range(4))
    hinted = env.execute_sql(f"""
        SELECT count(*) AS c
        FROM k_hint /*+ OPTIONS('scan.startup.mode' = 'specific-offsets',
                                'scan.startup.specific-offsets' = '{spec}') */
    """).collect()[0].c
    # each of the 4 partitions skips its offset-0 record
    n_parts = spark.read.parquet(d).select("partition").distinct().count()
    assert hinted == base - n_parts
    # latest-offset on a bounded read is empty; timestamp mode filters
    assert env.execute_sql(
        "SELECT count(*) AS c FROM k_hint"
        " /*+ OPTIONS('scan.startup.mode' = 'latest-offset') */"
    ).collect()[0].c == 0
    # the registered table itself is untouched
    assert env.execute_sql("SELECT count(*) AS c FROM k_hint").collect()[0].c == 100


def test_options_hint_applied_on_datagen(env):
    """An OPTIONS hint overriding datagen bounds changes the row count."""
    env.execute_sql("""
        CREATE TABLE g_hint (id BIGINT)
        WITH ('connector' = 'datagen',
              'fields.id.kind' = 'sequence',
              'fields.id.start' = '0', 'fields.id.end' = '99')
    """)
    assert env.execute_sql("SELECT count(*) AS c FROM g_hint").collect()[0].c == 100
    assert env.execute_sql(
        "SELECT count(*) AS c FROM g_hint"
        " /*+ OPTIONS('fields.id.end' = '9') */"
    ).collect()[0].c == 10


def test_options_hint_views_are_reused_not_accumulated(env, spark):
    """Repeated executions of the same hinted query must reuse one
    `_opts_*` temp view instead of registering (and re-resolving the
    source for) a fresh one each time (advisor finding: the `_hint_seq`
    scheme leaked a view per execution); an ALTER TABLE ... SET drops the
    cache so hinted reads see the updated base options."""
    env.execute_sql("""
        CREATE TABLE g_reuse (id BIGINT)
        WITH ('connector' = 'datagen',
              'fields.id.kind' = 'sequence',
              'fields.id.start' = '0', 'fields.id.end' = '99')
    """)
    q = ("SELECT count(*) AS c FROM g_reuse"
         " /*+ OPTIONS('fields.id.end' = '19') */")
    before = {v.name for v in spark.catalog.listTables() if v.name.startswith("_opts_g_reuse")}
    for _ in range(3):
        assert env.execute_sql(q).collect()[0].c == 20
    after = {v.name for v in spark.catalog.listTables() if v.name.startswith("_opts_g_reuse")}
    assert len(after - before) == 1
    # ALTER invalidates: the same hinted text now merges the NEW start
    env.execute_sql("ALTER TABLE g_reuse SET ('fields.id.start' = '10')")
    assert env.execute_sql(q).collect()[0].c == 10


def test_options_hint_invalidated_on_drop_create_and_rename(env):
    """ADVICE r5 (a): the hint-view cache was keyed on (name, overrides)
    only and invalidated just on ALTER TABLE SET — DROP+CREATE of the same
    name (or a RENAME landing a different table under it) silently reused
    the stale `_opts_*` view.  The digest now covers the FULL base-table
    definition, so any catalog change re-resolves the hinted source."""
    env.execute_sql("""
        CREATE TABLE g_inval (id BIGINT)
        WITH ('connector' = 'datagen',
              'fields.id.kind' = 'sequence',
              'fields.id.start' = '0', 'fields.id.end' = '99')
    """)
    q = ("SELECT count(*) AS c FROM g_inval"
         " /*+ OPTIONS('fields.id.start' = '90') */")
    assert env.execute_sql(q).collect()[0].c == 10  # 90..99
    # DROP + CREATE the same name with a different end bound
    env.execute_sql("DROP TABLE g_inval")
    env.execute_sql("""
        CREATE TABLE g_inval (id BIGINT)
        WITH ('connector' = 'datagen',
              'fields.id.kind' = 'sequence',
              'fields.id.start' = '0', 'fields.id.end' = '199')
    """)
    assert env.execute_sql(q).collect()[0].c == 110  # 90..199, not stale 10
    # RENAME a different table onto the hinted name
    env.execute_sql("DROP TABLE g_inval")
    env.execute_sql("""
        CREATE TABLE g_other (id BIGINT)
        WITH ('connector' = 'datagen',
              'fields.id.kind' = 'sequence',
              'fields.id.start' = '0', 'fields.id.end' = '299')
    """)
    env.execute_sql("ALTER TABLE g_other RENAME TO g_inval")
    assert env.execute_sql(q).collect()[0].c == 210  # 90..299


def test_options_hint_stripped_on_plain_view(env):
    """Hints on non-connector tables keep the old strip-and-run behavior."""
    env.execute_sql(f"""
        CREATE TABLE t_strip (n_nationkey BIGINT, n_name STRING,
                              n_regionkey BIGINT, n_comment STRING)
        WITH ('connector' = 'filesystem', 'path' = '{SF_DIR}/nation.parquet',
              'format' = 'parquet')
    """)
    assert env.execute_sql(
        "SELECT count(*) AS c FROM t_strip /*+ OPTIONS('k' = 'v') */"
    ).collect()[0].c == 25


def test_alter_table_set_rereads_options(env):
    """ALTER TABLE ... SET must take effect on subsequent reads of an
    option-reading connector (the reference plans the next query against
    the updated catalog entry)."""
    env.execute_sql("""
        CREATE TABLE g_alter (id BIGINT)
        WITH ('connector' = 'datagen',
              'fields.id.kind' = 'sequence',
              'fields.id.start' = '0', 'fields.id.end' = '49')
    """)
    assert env.execute_sql("SELECT count(*) AS c FROM g_alter").collect()[0].c == 50
    env.execute_sql("ALTER TABLE g_alter SET ('fields.id.end' = '19')")
    assert env.execute_sql("SELECT count(*) AS c FROM g_alter").collect()[0].c == 20
