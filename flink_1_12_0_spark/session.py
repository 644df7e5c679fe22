"""SparkSession construction and scale-oriented configuration.

The reference engine tunes managed memory, network buffers and operator
chaining per job (flink-runtime); on Spark all of that is Catalyst/Tungsten
configuration.  We centralize the knobs that matter at 100 TB:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- auto broadcast threshold (dimension tables broadcast, like the reference's
  `isBroadcast` flag on its hash-join rule)
- Arrow for every pandas-UDF exchange
- UTC session timezone so timestamp semantics are deterministic and match
  the DuckDB oracle
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to *any* session handed to us (the
#: correctness driver builds its own session; these are safe to set late).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS); read as long and convert in
    # load_tables (DuckDB likewise truncates ns -> us).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # dimension tables (region/nation/customer/supplier/part at test SF) are
    # broadcast; at 100 TB only genuinely small sides pass this threshold.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}

#: Static confs that must be set before the JVM starts.
STATIC_CONFS = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.ui.enabled": "false",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the hosting driver — keep going
    return spark


def get_spark(app_name: str = "flink_1_12_0_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Designed for
    local[N] testing; on a real cluster the same confs apply and the
    master/deploy-mode come from spark-submit.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = SparkSession.builder.appName(app_name).master(f"local[{n}]")
    for k, v in STATIC_CONFS.items():
        builder = builder.config(k, v)
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
