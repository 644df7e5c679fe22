"""Queries expressed through the fluent Table API and UDF decorators —
proving the API surface produces oracle-identical plans (one Catalyst
lifecycle for SQL and Table API, SURVEY §3.2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_1_12_0_spark.api import TableEnvironment
from flink_1_12_0_spark.functions.udf import udaf, udf
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


@query(
    "tableapi_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS revenue_e4,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE l_quantity > 10
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tableapi_revenue_by_nation(spark, sf_dir):
    """Fluent pipeline: filter → join → join → group_by → order_by."""
    load_tables(spark, sf_dir)
    env = TableEnvironment.create(spark)
    return (
        env.from_path("lineitem")
        .filter("l_quantity > 10")
        .join(env.from_path("supplier"), "l_suppkey = s_suppkey")
        .join(env.from_path("nation"), "s_nationkey = n_nationkey")
        .group_by("n_name")
        .select(
            "n_name",
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)"
            " AS BIGINT)) AS BIGINT) AS revenue_e4",
            "count(*) AS n_items",
        )
        .order_by("n_name")
        .execute()
    )


@query(
    "udf_price_bands",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100 THEN 'low'
                WHEN o_totalprice < 300 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS cnt,
           round(max(o_totalprice) - min(o_totalprice), 2) AS rng
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def udf_price_bands(spark, sf_dir):
    """Pandas scalar UDF (Arrow path) + pandas UDAF (grouped agg) — the
    PyFlink udf/udaf decorator surface (pyflink/table/udf.py:515)."""
    t = load_tables(spark, sf_dir)

    @udf(result_type="string", func_type="pandas")
    def band(s: pd.Series) -> pd.Series:
        return pd.cut(
            s, [float("-inf"), 100, 300, float("inf")], labels=["low", "mid", "high"]
        ).astype(str)

    @udaf(result_type="double")
    def value_range(s: pd.Series) -> float:
        return float(s.max() - s.min())

    @udaf(result_type="bigint")
    def n_rows(s: pd.Series) -> int:
        # Spark refuses mixing pandas grouped-agg UDFs with JVM aggregates
        # in one agg() — so the count is a pandas UDAF too.
        return int(s.size)

    return (
        t["orders"]
        .withColumn("band", band(F.col("o_totalprice")))
        .groupBy("band")
        .agg(
            n_rows(F.col("o_totalprice")).alias("cnt"),
            F.round(value_range(F.col("o_totalprice")), 2).alias("rng"),
        )
        .orderBy("band")
    )


@query(
    "tableapi_flat_aggregate",
    oracle="""
    SELECT user_id, CAST(rn AS INT) AS rank, value
    FROM (SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events WHERE event_type = 'purchase')
    WHERE rn <= 2
    ORDER BY user_id, rank
    """,
)
def tableapi_flat_aggregate(spark, sf_dir):
    """UDTAF (flatAggregate): the reference's canonical Top2 table
    aggregate (TableAggregateFunction.java:162) — multiple rows emitted
    per group through the fluent API."""
    t = load_tables(spark, sf_dir)
    env = TableEnvironment.create(spark)

    def top2(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(["value", "event_id"], ascending=[False, True]).head(2)
        return pd.DataFrame(
            {
                "user_id": key[0],
                "rank": range(1, len(pdf) + 1),
                "value": pdf["value"].tolist(),
            }
        )

    return (
        env.from_dataframe(
            t["events"].where(F.col("event_type") == "purchase").select(
                "user_id", "event_id", "value"
            )
        )
        .group_by("user_id")
        .flat_aggregate(top2, "user_id bigint, rank int, value double")
        .order_by("user_id", "rank")
        .execute()
    )
