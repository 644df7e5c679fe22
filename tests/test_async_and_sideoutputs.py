"""Async I/O enrichment and side-output routing."""

from __future__ import annotations

from flink_1_12_0_spark.streaming.async_io import async_enrich
from flink_1_12_0_spark.streaming.core import split_stream
from flink_1_12_0_spark.tables import load_tables
from tests.conftest import SF_DIR


def test_async_enrich_matches_join(spark):
    t = load_tables(spark, SF_DIR)
    sup = {r["s_suppkey"]: r["s_name"] for r in t["supplier"].collect()}

    async def fetch(k):
        import asyncio

        await asyncio.sleep(0)  # yield — stands in for network latency
        return {"s_name": sup.get(k)}

    out = async_enrich(
        t["lineitem"].select("l_orderkey", "l_suppkey").limit(500),
        "l_suppkey",
        fetch,
        out_fields=[("s_name", "string")],
        capacity=32,
    )
    rows = out.collect()
    assert len(rows) == 500
    assert all(r["r_s_name"] == sup[r["l_suppkey"]] for r in rows)


def test_split_stream_routes(spark):
    t = load_tables(spark, SF_DIR)
    ev = t["events"]
    routes = split_stream(
        ev,
        {
            "purchases": "event_type = 'purchase'",
            "errors": "event_type = 'error'",
            "rest": "event_type NOT IN ('purchase', 'error')",
        },
    )
    total = sum(df.count() for df in routes.values())
    assert total == ev.count()
    assert set(routes) == {"purchases", "errors", "rest"}
    assert routes["purchases"].select("event_type").distinct().collect()[0][0] == "purchase"


def test_async_enrich_timeout_fallback(spark):
    """Per-request timeout (AsyncWaitOperator timer): slow keys emit NULL
    enrichment after retries under on_timeout='empty'; fast keys enrich."""
    import asyncio

    async def fetch(k):
        if k % 2 == 0:
            await asyncio.sleep(5)  # will time out
        return {"label": f"v{k}"}

    from flink_1_12_0_spark.streaming.async_io import async_enrich

    df = spark.range(4).withColumnRenamed("id", "k")
    out = async_enrich(
        df, "k", fetch, [("label", "string")], timeout_s=0.2, retries=1
    )
    got = {r.k: r.r_label for r in out.collect()}
    assert got == {0: None, 1: "v1", 2: None, 3: "v3"}
