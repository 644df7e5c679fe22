"""File formats: CSV / JSON / Parquet / ORC (Avro gated on the spark-avro
package being present).

Reference: flink-formats/flink-{csv,json,parquet,orc,avro} and the
filesystem connector (FileSystemTableSource.java:72, FileSystemTableSink.java:94
— partitioned dir scan w/ partition pruning; rolling streaming sink).

Spark-first: every format maps to a native DataFrameReader/Writer; the
partitioned layout is ``partitionBy`` on write and automatic partition
pruning on read (PruneFileSourcePartitions — visible as PartitionFilters
in ``explain``).  Nothing custom on the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("csv", "json", "parquet", "orc", "avro")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Write a table in any supported format, optionally hive-partitioned
    (the reference's filesystem sink partition layout)."""
    assert fmt in _FORMATS, f"unsupported format {fmt}"
    if fmt == "csv":
        options.setdefault("header", "true")
    w = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options
) -> DataFrame:
    """Read a table; pass an explicit schema to skip inference (mandatory
    for production streams — inference reads data twice)."""
    assert fmt in _FORMATS, f"unsupported format {fmt}"
    if fmt == "csv":
        options.setdefault("header", "true")
    r = spark.read.format(fmt).options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def avro_available(spark: SparkSession) -> bool:
    """spark-avro is a separate artifact; probe once instead of failing."""
    try:
        spark.range(1).write.format("avro").mode("overwrite").save(
            "/tmp/sg_avro_probe"
        )
        return True
    except Exception:
        return False


def enforce_not_null(df, not_null_cols, mode: str = "error"):
    """Sink NOT NULL enforcement (reference: operators/sink/
    SinkNotNullEnforcer.java, config table.exec.sink.not-null-enforcer):
    ``mode='error'`` fails the write when a NOT NULL column holds NULL
    (raise_error inside a filter — JVM-side, no collect); ``mode='drop'``
    silently filters violating rows.  Apply immediately before a sink
    write."""
    from pyspark.sql import functions as F

    cond = None
    for c in not_null_cols:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    if cond is None:
        return df
    if mode == "drop":
        return df.where(cond)
    if mode != "error":
        raise ValueError(f"unknown not-null mode: {mode}")
    msg = F.concat(
        F.lit("NOT NULL constraint violated in columns "),
        F.lit(",".join(not_null_cols)),
    )
    return df.where(F.when(cond, F.lit(True)).otherwise(F.raise_error(msg)))
