"""JDBC source / sink over Spark's native JDBC data source.

Reference: flink-connectors/flink-connector-jdbc —
JdbcDynamicTableSource.java (parallel scan via
``scan.partition.column/num/lower-bound/upper-bound``, filter/limit
pushdown), JdbcDynamicTableSink.java (batched upsert writes),
JdbcRowDataLookupFunction.java (the lookup path lives in
operators/joins.lookup_join).

Spark-first: ``spark.read.jdbc`` already implements the reference's
parallel partitioned scan (partitionColumn/lowerBound/upperBound/
numPartitions → one WHERE-range query per task) and pushes filters into
the remote SQL (``PushedFilters`` in the plan), and ``df.write.jdbc``
does batched parallel inserts — so the connector here is a thin option
mapper, not a re-implementation.

The test double is Apache Derby embedded (derby-*.jar ships inside
pyspark's jars/ for the Hive metastore), so the whole path — DDL, typed
round-trip, partitioned parallel read, predicate pushdown — runs for
real with zero external services; a production deployment only swaps
the URL/driver for postgres/mysql.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str | None = None) -> str:
    """An embedded-Derby JDBC URL (fresh temp database by default)."""
    if db_path is None:
        db_path = os.path.join(tempfile.mkdtemp(prefix="sg_jdbc_"), "db")
    return f"jdbc:derby:{db_path};create=true"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str = DERBY_DRIVER,
    batch_size: int = 1000,
) -> None:
    """JDBC sink: parallel batched INSERTs, one connection per task
    (reference JdbcBatchingOutputFormat's flush-interval batching maps to
    Spark's ``batchsize`` option)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 4,
    driver: str = DERBY_DRIVER,
) -> DataFrame:
    """JDBC source.  With a numeric ``partition_column`` + bounds this is
    the reference's parallel scan: ``num_partitions`` range-disjoint
    remote queries run concurrently; filters on the result still push
    down into each query's WHERE."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        assert lower_bound is not None and upper_bound is not None
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
