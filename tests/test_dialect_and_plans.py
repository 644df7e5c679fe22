"""Flink-SQL dialect shim translation + plan-shape invariants (the
reference's plan-test analog, SURVEY §5.1)."""

from __future__ import annotations

import pytest

from flink_1_12_0_spark import registry
from flink_1_12_0_spark.plans.dialect_shim import apply_ddl, parse_create_table, translate
from flink_1_12_0_spark.plans import inspect
from flink_1_12_0_spark.tables import load_tables
from tests.conftest import SF_DIR


# --- dialect translation -----------------------------------------------------


def test_translate_tumble_query(spark):
    load_tables(spark, SF_DIR)
    flink_sql = """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start,
               event_type, count(*) AS cnt
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
    """
    got = spark.sql(translate(flink_sql))
    want = spark.sql(
        """SELECT window.start AS w_start, event_type, count(*) AS cnt
           FROM events GROUP BY window(ts, '1 hour'), event_type"""
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_translate_hop_swaps_slide_and_size(spark):
    load_tables(spark, SF_DIR)
    flink_sql = """
        SELECT HOP_END(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR) AS w_end,
               count(*) AS cnt
        FROM events GROUP BY HOP(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR)
    """
    got = spark.sql(translate(flink_sql))
    want = spark.sql(
        """SELECT window.end AS w_end, count(*) AS cnt
           FROM events GROUP BY window(ts, '1 hour', '15 minutes')"""
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_translate_session_and_functions(spark):
    load_tables(spark, SF_DIR)
    assert "session_window(ts, '30 minutes')" in translate(
        "GROUP BY SESSION(ts, INTERVAL '30' MINUTE)"
    )
    out = translate("SELECT SPLIT_INDEX(n_name, 'A', 0), CHAR_LENGTH(n_name), PROCTIME()")
    assert "element_at(split(n_name, 'A'), 1)" in out
    assert "length(n_name)" in out and "current_timestamp()" in out
    row = spark.sql(
        translate("SELECT SPLIT_INDEX(n_name, '_', 1) AS p, CHAR_LENGTH(n_name) AS l "
                  "FROM nation WHERE n_name = 'NATION_11'")
    ).collect()[0]
    assert row["l"] == 9 and row["p"] == "11"


def test_create_table_ddl_watermark(spark):
    ddl = f"""
        CREATE TABLE ev_src (
            event_id BIGINT,
            ts TIMESTAMP(3),
            user_id BIGINT,
            WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{SF_DIR}/orders.parquet',
            'format' = 'parquet'
        )
    """
    t = parse_create_table(ddl)
    assert t.name == "ev_src"
    assert t.watermark_col == "ts" and t.watermark_delay == "10 seconds"
    assert t.options["format"] == "parquet"
    # apply with explicit df (watermark needs a timestamp col)
    ev = load_tables(spark, SF_DIR)["events"]
    df = apply_ddl(spark, "CREATE TABLE ev_wm (event_id BIGINT, "
                          "WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)", df=ev)
    assert spark.table("ev_wm").count() == ev.count()


# --- plan shapes -------------------------------------------------------------


@pytest.fixture(scope="module")
def _loaded(spark):
    registry.load_all()
    load_tables(spark, SF_DIR)
    return spark


def test_q9_joins_broadcast(_loaded, spark):
    df = registry.QUERIES["tpch_q9"](spark, SF_DIR)
    df.collect()
    assert inspect.count_op(df, "BroadcastHashJoin") >= 3
    assert inspect.count_op(df, "SortMergeJoin") == 0


def test_q6_pushdown_and_pruning(_loaded, spark):
    df = registry.QUERIES["tpch_q6"](spark, SF_DIR)
    df.collect()
    assert "l_shipdate" in inspect.pushed_filters(df)
    # column pruning: the 11-column lineitem scan reads only what q6 needs
    cols = set(inspect.read_schema(df))
    assert cols <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_relational_plans_have_no_python(_loaded, spark):
    for name in ("tpch_q1", "tpch_q3", "window_tumble", "dedup_minhash_lsh"):
        df = registry.QUERIES[name](spark, SF_DIR)
        df.collect()
        assert not inspect.has_python_stage(df), f"{name} has a Python stage"


def test_codegen_spans_exist(_loaded, spark):
    df = registry.QUERIES["tpch_q1"](spark, SF_DIR)
    df.collect()
    assert inspect.codegen_spans(df) >= 1
