"""Fluent Table API + UDF decorators: every fluent pipeline must produce
the identical result to its SQL formulation (one Catalyst lifecycle —
SURVEY §3.2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_1_12_0_spark.api import TableEnvironment
from flink_1_12_0_spark.functions.udf import udaf, udf, udtf
from tests.conftest import SF_DIR


def _env(spark) -> TableEnvironment:
    env = TableEnvironment.create(spark)
    env.register_fixture_tables(SF_DIR)
    return env


def _same(t, sql, spark):
    got = sorted(map(tuple, t.execute().collect()))
    want = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want and len(got) > 0


def test_select_filter_groupby(spark):
    env = _env(spark)
    t = (
        env.from_path("lineitem")
        .filter("l_quantity > 25")
        .group_by("l_returnflag")
        .select("l_returnflag", "count(*) AS cnt", "round(sum(l_extendedprice), 2) AS rev")
    )
    _same(
        t,
        """SELECT l_returnflag, count(*) AS cnt, round(sum(l_extendedprice), 2) AS rev
           FROM lineitem WHERE l_quantity > 25 GROUP BY l_returnflag""",
        spark,
    )


def test_join_rename_orderby_fetch(spark):
    env = _env(spark)
    t = (
        env.from_path("nation")
        .join(env.from_path("region"), "n_regionkey = r_regionkey")
        .rename_columns(n_name="nation_name")
        .select("nation_name", "r_name")
        .order_by("nation_name")
        .fetch(5)
    )
    _same(
        t,
        """SELECT n_name AS nation_name, r_name
           FROM nation JOIN region ON n_regionkey = r_regionkey
           ORDER BY nation_name LIMIT 5""",
        spark,
    )


def test_set_ops_and_columns(spark):
    env = _env(spark)
    a = env.from_path("orders").filter("o_orderstatus = 'O'").select("o_custkey")
    b = env.from_path("orders").filter("o_totalprice > 100").select("o_custkey")
    t = a.intersect(b).add_columns(tag="'both'")
    _same(
        t,
        """SELECT o_custkey, 'both' AS tag FROM
           (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_totalprice > 100)""",
        spark,
    )


def test_window_tumble_fluent(spark):
    env = _env(spark)
    t = (
        env.from_path("events")
        .window_tumble("ts", "1 day")
        .group_by("window_start")
        .select("window_start", "count(*) AS cnt")
    )
    _same(
        t,
        """SELECT window.start AS window_start, count(*) AS cnt
           FROM (SELECT *, window(ts, '1 day') AS window FROM events)
           GROUP BY 1""",
        spark,
    )


def test_scalar_udf_general_and_pandas(spark):
    env = _env(spark)

    @udf(result_type="bigint")
    def plus_one(x):
        return x + 1

    @udf(result_type="double", func_type="pandas")
    def times_two(s: pd.Series) -> pd.Series:
        return s * 2.0

    df = env.from_path("region").df.select(
        plus_one(F.col("r_regionkey")).alias("k1"),
        times_two(F.col("r_regionkey").cast("double")).alias("k2"),
    )
    rows = {(r["k1"], r["k2"]) for r in df.collect()}
    assert rows == {(k + 1, 2.0 * k) for k in range(5)}


def test_udtf_explode(spark):
    env = _env(spark)

    @udtf(result_type="string")
    def split_words(s):
        return s.split(" ")

    df = env.from_path("region").df.select(
        "r_name", F.explode(split_words(F.col("r_name"))).alias("w")
    )
    assert df.count() >= env.from_path("region").df.count()


def test_udaf_grouped(spark):
    env = _env(spark)

    @udaf(result_type="double")
    def value_range(s: pd.Series) -> float:
        return float(s.max() - s.min())

    got = {
        (r["o_orderstatus"], round(r["rng"], 2))
        for r in env.from_path("orders")
        .df.groupBy("o_orderstatus")
        .agg(value_range(F.col("o_totalprice")).alias("rng"))
        .collect()
    }
    want = {
        (r["o_orderstatus"], round(r["rng"], 2))
        for r in spark.sql(
            """SELECT o_orderstatus, max(o_totalprice) - min(o_totalprice) AS rng
               FROM orders GROUP BY 1"""
        ).collect()
    }
    assert got == want


def test_over_window_and_having(spark):
    env = _env(spark)
    t = (
        env.from_path("orders")
        .over(["o_custkey"], [F.col("o_totalprice").desc(), "o_orderkey"],
              rn=lambda w: F.row_number().over(w))
        .filter("rn <= 2")
        .select("o_custkey", "o_orderkey", "rn")
    )
    _same(
        t,
        """SELECT o_custkey, o_orderkey, rn FROM (
             SELECT o_custkey, o_orderkey,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             FROM orders) WHERE rn <= 2""",
        spark,
    )
    h = (
        env.from_path("orders")
        .group_by("o_custkey")
        .having("cnt >= 10")
        .select("o_custkey", "count(*) AS cnt")
    )
    _same(
        h,
        "SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1 HAVING count(*) >= 10",
        spark,
    )


def test_env_catalog_and_views(spark):
    env = _env(spark)
    env.create_temporary_view("big_orders", env.from_path("orders").filter("o_totalprice > 200"))
    assert "big_orders" in env.list_tables()
    n = env.sql_query("SELECT count(*) AS n FROM big_orders").execute().collect()[0]["n"]
    assert n == spark.sql("SELECT count(*) FROM orders WHERE o_totalprice > 200").collect()[0][0]


def test_window_descriptors_tumble_slide_session(spark):
    """pyflink-style Tumble/Slide/Session descriptors through
    Table.window(...).group_by(...).select(...) match the SQL forms."""
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.api.table import Session, Slide, Table, Tumble
    from flink_1_12_0_spark.tables import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    t = Table(ev)

    got = (
        t.window(Tumble.over("1 hour").on("ts").alias("w"))
        .group_by("w", "user_id")
        .select("w", "user_id", F.count(F.lit(1)).alias("n"))
        .df.select(F.col("w.start").alias("ws"), "user_id", "n")
    )
    want = spark.sql(
        "SELECT window(ts, '1 hour').start AS ws, user_id, count(*) AS n "
        "FROM events GROUP BY window(ts, '1 hour'), user_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    slide = (
        t.window(Slide.over("1 hour").every("30 minutes").on("ts").alias("w"))
        .group_by("w", "user_id")
        .select("w", "user_id", F.count(F.lit(1)).alias("n"))
        .df.count()
    )
    want_slide = spark.sql(
        "SELECT window(ts, '1 hour', '30 minutes'), user_id, count(*) "
        "FROM events GROUP BY 1, 2"
    ).count()
    assert slide == want_slide

    sess = (
        t.window(Session.with_gap("30 minutes").on("ts").alias("w"))
        .group_by("w", "user_id")
        .select("w", "user_id", F.count(F.lit(1)).alias("n"))
        .df.count()
    )
    want_sess = spark.sql(
        "SELECT session_window(ts, '30 minutes'), user_id, count(*) "
        "FROM events GROUP BY session_window(ts, '30 minutes'), user_id"
    ).count()
    assert sess == want_sess


def test_over_window_descriptor(spark):
    """Over descriptor (pyflink Table.over_window): bounded ROWS frame
    matches the SQL OVER equivalent."""
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.api.table import Over, Table
    from flink_1_12_0_spark.tables import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    w = Over.partition_by("user_id").order_by("ts", "event_id").preceding("rows", 2).alias("w")
    got = (
        Table(ev).over_window(
            w,
            run_sum=lambda s: F.round(F.sum("value").over(s), 4),
            rn=lambda s: F.count(F.lit(1)).over(s),
        ).df.select("event_id", "run_sum", "rn")
    )
    want = spark.sql(
        """SELECT event_id,
                  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS run_sum,
                  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rn
           FROM events"""
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_join_lateral_udtf(spark):
    """Table.joinLateral / leftOuterJoinLateral (reference Table.java
    joinLateral; pyflink table.py join_lateral): CROSS vs LEFT OUTER
    correlate against an array-returning table function."""
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.api.table import Table
    from flink_1_12_0_spark.functions.udf import udtf

    @udtf(result_type="string")
    def split_words(s):
        return s.split() if s else []

    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "c")], "id int, txt string"
    )
    inner = Table(df).join_lateral(split_words(F.col("txt")), "w").df
    assert sorted((r["id"], r["w"]) for r in inner.collect()) == [
        (1, "a"), (1, "b"), (3, "c")
    ]
    outer = Table(df).left_outer_join_lateral(split_words(F.col("txt")), "w").df
    assert sorted((r["id"], r["w"]) for r in outer.collect()) == [
        (1, "a"), (1, "b"), (2, None), (3, "c")
    ]


def test_table_map_flat_map(spark):
    """Table.map / Table.flatMap (reference Table.java map/flatMap):
    row-to-row and row-to-many transforms, Arrow-batched."""
    import pandas as pd

    from flink_1_12_0_spark.api.table import Table

    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, v double")

    mapped = Table(df).map(
        lambda pdf: pd.DataFrame({"id": pdf["id"], "v2": pdf["v"] * 2}),
        "id int, v2 double",
    ).df
    assert sorted(map(tuple, mapped.collect())) == [(1, 20.0), (2, 40.0)]

    def dup(pdf):
        for _, row in pdf.iterrows():
            yield pd.DataFrame({"id": [row["id"]] * int(row["id"])})

    flat = Table(df).flat_map(dup, "id int").df
    assert sorted(r["id"] for r in flat.collect()) == [1, 2, 2]


def test_table_config_surface(spark):
    """TableConfig (reference TableConfig.java / pyflink table_config.py):
    parallelism maps onto spark.sql.shuffle.partitions; idle-state
    retention round-trips as seconds from int or timedelta."""
    import datetime

    from flink_1_12_0_spark.api.table import TableEnvironment

    env = TableEnvironment.create(spark)
    cfg = env.get_config()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        cfg.set("table.exec.resource.default-parallelism", 16)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
        assert cfg.get("table.exec.resource.default-parallelism") == "16"
        cfg.set_idle_state_retention(datetime.timedelta(minutes=5))
        assert cfg.get_idle_state_retention() == 300.0
        cfg.set_idle_state_retention(42)
        assert cfg.get_idle_state_retention() == 42.0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_table_alias_and_aggregate(spark):
    """Table.as(fields) renames positionally; GroupedTable.aggregate
    (Table.java aggregate) emits exactly one row per group and rejects a
    multi-row emitter."""
    import pandas as pd
    import pytest as _pt

    from flink_1_12_0_spark.api.table import Table
    from pyspark.sql.utils import PythonException

    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], "k int, v double")
    t = Table(df).alias("key", "val")
    assert t.df.columns == ["key", "val"]
    with _pt.raises(ValueError):
        Table(df).alias("only_one")

    got = (
        t.group_by("key")
        .aggregate(
            lambda key, pdf: pd.DataFrame(
                {"key": [key[0]], "mean_v": [pdf["val"].mean()]}
            ),
            "key int, mean_v double",
        )
        .df.collect()
    )
    assert sorted((r["key"], r["mean_v"]) for r in got) == [(1, 3.0), (2, 6.0)]

    bad = t.group_by("key").aggregate(
        lambda key, pdf: pd.DataFrame({"key": [key[0]] * 2, "mean_v": [0.0, 1.0]}),
        "key int, mean_v double",
    )
    with _pt.raises(PythonException, match="exactly 1 row"):
        bad.df.collect()


def test_from_elements_and_execute_insert(spark, tmp_path):
    """pyflink surface: from_elements builds a Table from local rows;
    execute_insert writes through a registered connector sink."""
    from flink_1_12_0_spark.api.table import TableEnvironment as ApiEnv
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment as Router

    env = ApiEnv.create(spark)
    t = env.from_elements([(1, "a"), (2, "b")], "id BIGINT, tag STRING")
    assert sorted((r["id"], r["tag"]) for r in t.execute().collect()) == [
        (1, "a"), (2, "b")]

    router = Router(spark)
    router.execute_sql(f"""
        CREATE TABLE ins_sink (id BIGINT, tag STRING) WITH (
            'connector' = 'filesystem', 'path' = '{tmp_path}/sink',
            'format' = 'parquet')""")
    t.execute_insert("ins_sink", env=router)
    back = spark.read.parquet(f"{tmp_path}/sink")
    assert sorted((r["id"], r["tag"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_fluent_env_routes_full_statement_surface(spark, tmp_path):
    """The fluent TableEnvironment shares ONE statement router: DDL state
    persists across execute_sql calls and sql_query accepts the Flink
    dialect (reference: a single TableEnvironment for both surfaces)."""
    from flink_1_12_0_spark.api.table import TableEnvironment as ApiEnv

    env = ApiEnv.create(spark)
    env.execute_sql(f"""
        CREATE TABLE fluent_t (a BIGINT, b STRING) WITH (
            'connector' = 'filesystem', 'path' = '{tmp_path}/ft',
            'format' = 'parquet')""")
    env.execute_sql("INSERT INTO fluent_t SELECT 1 AS a, 'x' AS b")
    assert env.execute_sql("SELECT count(*) AS n FROM fluent_t").collect()[0]["n"] == 1
    # dialect query through sql_query (CHAR_LENGTH is Flink-dialect)
    t = env.sql_query("SELECT CHAR_LENGTH(b) AS lb FROM fluent_t")
    assert t.execute().collect()[0]["lb"] == 1


def test_from_pandas_variants(spark):
    """pyflink from_pandas: bare, custom field names, DDL schema, and
    splits_num partitioning."""
    import pandas as pd

    from flink_1_12_0_spark.api.table import TableEnvironment

    env = TableEnvironment.create(spark)
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    t = env.from_pandas(pdf)
    assert sorted(t.df.columns) == ["a", "b"] and t.df.count() == 2
    t2 = env.from_pandas(pdf, ["x", "y"])
    assert sorted(t2.df.columns) == ["x", "y"]
    t3 = env.from_pandas(pdf, "a double, b double", splits_num=2)
    assert t3.df.rdd.getNumPartitions() == 2
    assert t3.df.schema["a"].dataType.simpleString() == "double"
