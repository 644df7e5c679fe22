"""Catalog: register the test-data star schema as temp views.

Mirrors the reference's in-memory catalog registration
(flink-table-api-java .../catalog/GenericInMemoryCatalog.java:52) — here a
table is a parquet-backed DataFrame temp view; Catalyst handles predicate
pushdown / column pruning / partition pruning into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_12_0_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (session id, sf_dir) -> registered DataFrames. Every query calls
# load_tables, so without memoization each of the ~134 registry queries
# re-lists files and re-infers parquet schemas for all 10 tables — pure
# driver-side overhead repeated per query.
_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Read every star-schema parquet under ``sf_dir`` and register temp views.

    Returns {table_name: DataFrame}. Idempotent; cheap (lazy scans),
    memoized per (session, sf_dir).
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    key = (id(spark), sf_dir)
    cached = _CACHE.get(key)
    if cached is not None:
        # re-register views in case another sf_dir's load replaced them
        for name, df in cached.items():
            df.createOrReplaceTempView(name)
        return dict(cached)
    apply_runtime_confs(spark)
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        # events.ts normalization: the generator has shipped the column as
        # parquet TIMESTAMP(NANOS) (read as long nanos via
        # legacy.parquet.nanosAsLong -> truncate to micros, matching DuckDB's
        # ns->us handling) and as TIMESTAMP(MICROS) without UTC adjustment
        # (reads as TIMESTAMP_NTZ).  Either way normalize to TIMESTAMP (LTZ,
        # session tz = UTC so wall-clock values are unchanged) — streaming
        # watermarks require LTZ and every query/oracle assumes one type.
        if name == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_type == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    _CACHE[key] = dfs
    return dict(dfs)
