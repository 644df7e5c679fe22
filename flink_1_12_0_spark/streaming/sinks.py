"""Upsert & two-phase-commit-style sinks over ``foreachBatch``.

Reference:
- upsert-kafka / JDBC upsert sink — KafkaDynamicSink (upsert mode),
  flink-connector-jdbc upsert writer: keyed changelog applied to an
  external table.
- TwoPhaseCommitSinkFunction.java:77 — transactional sinks; Spark's
  ``foreachBatch`` + idempotent MERGE achieves the same exactly-once
  effect: the batch id is stable across retries, so replays overwrite
  rather than duplicate.

``UpsertSink`` maintains a keyed parquet table: each micro-batch's rows
are reduced to one row per key (latest by ``seq_col``), merged against the
current table, deletes applied — the ChangelogNormalize write path.  On a
cluster the same code targets Delta/Iceberg MERGE INTO; here the table is
a poor-man's lakehouse: each merge writes a NEW versioned snapshot dir
(fully distributed — the executors never ship rows through the driver)
and then atomically repoints a manifest file at it.  Retries of the same
batch id rewrite the same version dir, so replays are idempotent
(exactly-once effect, mirroring the stable-batch-id contract above).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class UpsertSink:
    """Keyed upsert target backed by a parquet dir.

    Rows need: key columns, a monotonically-increasing ``seq_col`` (event
    time / offset) and optionally a ``delete_col`` boolean marking -D rows.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        seq_col: str,
        delete_col: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.seq_col = seq_col
        self.delete_col = delete_col

    def _manifest(self) -> str:
        return os.path.join(self.path, "_MANIFEST")

    def _current_version_dir(self) -> str | None:
        try:
            with open(self._manifest()) as fh:
                name = fh.read().strip()
        except OSError:
            return None
        return os.path.join(self.path, name) if name else None

    def _current(self) -> DataFrame | None:
        vdir = self._current_version_dir()
        if vdir is None or not os.path.exists(vdir):
            return None
        return self.spark.read.parquet(vdir)

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: reduce batch to latest-per-key, merge.

        The merge reads the previous snapshot dir and writes a new one, so
        the whole anti-join + union runs on executors; only the tiny
        manifest pointer touches the driver.

        Already-committed replays are a NO-OP (code-review r17, the
        TwoPhaseCommitSinkFunction.recoverAndCommit contract: a replayed
        transaction whose commit already landed must not re-execute):
        foreachBatch can retry a batch whose merge finished but whose
        checkpoint offset commit did not — the manifest then already
        points at THIS batch's version, and re-merging would read the
        snapshot dir while overwrite-deleting it underneath the scan
        (observed FAILED_READ_FILE.FILE_NOT_EXIST at 2M rows; at toy
        sizes it only survives by timing).  The manifest is repointed
        strictly AFTER the snapshot write completes, so manifest >=
        this version proves the batch's effect is durable — skip.
        """
        vdir = self._current_version_dir()
        if vdir is not None and os.path.basename(vdir) >= f"v{batch_id:012d}":
            return
        w = Window.partitionBy(*self.keys).orderBy(F.col(self.seq_col).desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        cur = self._current()
        if cur is not None:
            merged = (
                cur.alias("t")
                .join(latest.select(*self.keys).alias("u"), self.keys, "left_anti")
                .unionByName(latest)
            )
        else:
            merged = latest
        if self.delete_col:
            merged = merged.where(~F.coalesce(F.col(self.delete_col), F.lit(False)))
        version = f"v{batch_id:012d}"
        merged.write.mode("overwrite").parquet(os.path.join(self.path, version))
        tmp = self._manifest() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, self._manifest())

    def write_stream(self, sdf: DataFrame, timeout_s: int = 300) -> None:
        from flink_1_12_0_spark.streaming.core import run_foreach_batch

        run_foreach_batch(sdf, self.merge_batch, output_mode="update", timeout_s=timeout_s)

    def table(self) -> DataFrame:
        cur = self._current()
        if cur is None:
            raise FileNotFoundError(self.path)
        return cur


def connect_with_control(
    main: DataFrame,
    control: DataFrame,
    common_cols: Sequence[str],
) -> DataFrame:
    """CoProcess / broadcast-state pattern (DataStream.connect +
    BroadcastConnectedStream): tag and union the two streams so ONE
    stateful operator (keyed_process) sees both, control rows first at
    equal timestamps.  ``common_cols`` are the columns shared after
    projection; missing columns are null-padded."""
    m = main.withColumn("_stream", F.lit("main"))
    c = control.withColumn("_stream", F.lit("control"))
    all_cols = list(dict.fromkeys([*common_cols, "_stream"]))

    def pad(df: DataFrame) -> DataFrame:
        cols = []
        for col in all_cols:
            if col in df.columns:
                cols.append(F.col(col))
            else:
                cols.append(F.lit(None).alias(col))
        return df.select(*cols)

    return pad(m).unionByName(pad(c))


def broadcast_connect(
    main: DataFrame,
    control: DataFrame,
    common_cols: Sequence[str],
    shard_key: str,
    n_shards: int = 64,
) -> DataFrame:
    """TRUE broadcast-state pattern (DataStream.broadcast(descriptor) +
    BroadcastConnectedStream.process, flink-streaming-java .../datastream/
    BroadcastConnectedStream.java / KeyedBroadcastProcessFunction): the
    control stream is UNKEYED and its rows must reach EVERY parallel task,
    while the main stream partitions normally.

    Spark shape: the main stream routes to ``n_shards`` shards by
    ``hash(shard_key) % n_shards`` (the parallelism analog); each control
    row is replicated to ALL shards via an in-row shard-array explode
    (replication factor = n_shards × |control| — tiny for rule streams,
    exactly the reference's broadcast-state memory model where every task
    holds the full rule map).  Downstream, ONE keyed_process over
    ``_shard`` sees its partition of main rows plus every control row, in
    event-time order (control first at equal timestamps).  Scale: shard
    count plays the role of operator parallelism; no driver participation,
    no single-key funnel."""
    # coalesce pins _shard provably NON-NULL (hash/pmod are total here,
    # but Catalyst types them nullable): the state key schema must be
    # identical in EVERY micro-batch plan, and a batch whose main side
    # is empty gets the union pruned to the control side alone — a
    # nullability that depends on which side survives pruning breaks
    # checkpoint restarts with STATE_STORE_KEY_SCHEMA_NOT_COMPATIBLE
    # (found by tests/test_kafka_adversarial.py's two-phase drives).
    m = main.withColumn("_stream", F.lit("main")).withColumn(
        "_shard",
        F.coalesce(F.pmod(F.hash(F.col(shard_key)), F.lit(n_shards)),
                   F.lit(0)),
    )
    c = (
        control.withColumn("_stream", F.lit("control"))
        .withColumn(
            "_shard",
            F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))),
        )
    )
    all_cols = list(dict.fromkeys([*common_cols, "_stream", "_shard"]))

    def pad(df: DataFrame) -> DataFrame:
        return df.select(
            *[
                F.col(col) if col in df.columns else F.lit(None).alias(col)
                for col in all_cols
            ]
        )

    return pad(m).unionByName(pad(c))


class ChangelogUpsertSink(UpsertSink):
    """UpsertSink that ALSO emits a retraction changelog — the reference's
    RowKind parity (flink-core .../types/RowKind.java:35-58: +I, -U, +U,
    -D).  The base engine models state as upsert-only; this sink closes
    the gap for CDC consumers by diffing each batch against the previous
    snapshot and appending the row-kind stream:

    - key new to the table                  → +I new row
    - key present, new version arrives      → -U old row, +U new row
    - key present, delete marker arrives    → -D old row

    The changelog is written to ``<path>/_changelog/batch=<id>`` with
    overwrite per batch id, so retries are idempotent like the snapshot;
    everything is a distributed join + write (no driver data path).
    """

    def _changelog_dir(self) -> str:
        return os.path.join(self.path, "_changelog")

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(*self.keys).orderBy(F.col(self.seq_col).desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        is_del = (
            F.coalesce(F.col(self.delete_col), F.lit(False))
            if self.delete_col
            else F.lit(False)
        )
        cur = self._current()
        if cur is None:
            log = latest.where(~is_del).withColumn("op", F.lit("+I"))
        else:
            upd_keys = latest.where(~is_del).select(*self.keys)
            del_keys = latest.where(is_del).select(*self.keys)
            minus_u = cur.join(upd_keys, self.keys, "left_semi").withColumn(
                "op", F.lit("-U")
            )
            plus_u = (
                latest.where(~is_del)
                .join(cur.select(*self.keys), self.keys, "left_semi")
                .withColumn("op", F.lit("+U"))
            )
            plus_i = (
                latest.where(~is_del)
                .join(cur.select(*self.keys), self.keys, "left_anti")
                .withColumn("op", F.lit("+I"))
            )
            minus_d = cur.join(del_keys, self.keys, "left_semi").withColumn(
                "op", F.lit("-D")
            )
            log = minus_u.unionByName(plus_u).unionByName(plus_i).unionByName(minus_d)
        log.write.mode("overwrite").parquet(
            os.path.join(self._changelog_dir(), f"batch={batch_id}")
        )
        super().merge_batch(batch_df, batch_id)

    def changelog(self) -> DataFrame:
        """The accumulated row-kind stream (partition-discovered ``batch``
        column orders it; -U precedes +U within a batch by op ordering)."""
        return self.spark.read.parquet(self._changelog_dir())


def to_retract_stream(
    sdf: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    delete_col: str | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """StreamTableEnvironment.toRetractStream (reference
    flink-table-api-java-bridge .../StreamTableEnvironment.java;
    pyflink table_environment.py to_retract_stream): convert an updating
    result into a stream of ``(accumulate BOOLEAN, row)`` records —
    True for +I/+U, False for -U/-D, the Tuple2<Boolean, Row> shape.

    Runs the stream through a ChangelogUpsertSink (snapshot-diff per
    micro-batch) and returns the accumulated changelog as a batch
    DataFrame ordered by (batch, op); ``op`` is kept alongside the
    boolean for RowKind-level consumers."""
    import tempfile

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="sg_retract_")
    sink = ChangelogUpsertSink(sdf.sparkSession, d, keys, seq_col, delete_col)
    sink.write_stream(sdf, timeout_s=timeout_s)
    log = sink.changelog()
    return log.withColumn("accumulate", F.col("op").isin("+I", "+U"))


def to_append_stream(sdf: DataFrame) -> DataFrame:
    """StreamTableEnvironment.toAppendStream: valid only for insert-only
    results — Spark enforces exactly this in append output mode, so the
    DataFrame passes through; an updating query fails downstream at
    writeStream time with Spark's own analysis error, mirroring the
    reference's TableException for updating tables."""
    return sdf
