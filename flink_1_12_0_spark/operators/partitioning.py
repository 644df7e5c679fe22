"""Partitioning, bucketing, and skew tools — the DataSet partition
operators and the runtime distribution machinery, Spark-first.

Reference:
- DataSet partitionByHash / partitionByRange / partitionCustom /
  sortPartition (flink-java .../operators/PartitionOperator.java,
  SortPartitionOperator.java)
- required-distribution exchanges (BatchExecExchange.scala:52) and the
  batch optimizer's ship strategies (flink-optimizer)
- data-skew handling: Flink 1.12 has none built in — Spark AQE skew-join
  splitting covers the common case, and explicit salting covers
  pathological hot keys.

100 TB playbook encoded here:
- ``repartition_hash``/``repartition_range`` — explicit distributions when
  a downstream chain reuses the same key (one shuffle amortized over many
  stages; Catalyst will NOT re-shuffle an already-satisfying distribution).
- ``bucketize_write``/``read_bucketed`` — persisted co-location: two tables
  bucketed by the join key join WITHOUT a shuffle (the plan test asserts
  zero Exchange nodes).
- ``salted_join`` — hot-key decomposition: replicate the small side R
  times, spread the big side's hot keys across R sub-keys; turns one
  straggler partition into R even ones.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def repartition_hash(df: DataFrame, keys: Sequence[str], n: int | None = None) -> DataFrame:
    """Hash-distribute by keys (DataSet partitionByHash; Exchange hash)."""
    cols = [F.col(k) for k in keys]
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def repartition_range(df: DataFrame, keys: Sequence[str], n: int | None = None) -> DataFrame:
    """Range-distribute (partitionByRange; enables global sort merges)."""
    cols = [F.col(k) for k in keys]
    return df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)


def sort_partition(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Partition-local sort (DataSet sortPartition) — no shuffle."""
    return df.sortWithinPartitions(*[F.col(k) for k in keys])


def bucketize_write(
    df: DataFrame, table_name: str, keys: Sequence[str], n_buckets: int, path: str | None = None
) -> None:
    """Persist hash-bucketed by join key: subsequent equi-joins between
    tables bucketed the same way need NO exchange (pre-shuffled layout on
    disk — the canonical 100 TB co-located join)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys).sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key into ``salt`` sub-keys,
    replicate the small side per salt value, join on (key, salt).

    Use when one key holds an outsized share of rows and even AQE's
    skew-split leaves a straggler.  Cost: small side × salt replication —
    keep the small side genuinely small (dimension-sized)."""
    b = big.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = b.join(s, (b[key] == s[small_key]) & (b["_salt"] == s["_salt"]), how)
    return out.drop("_salt")


def split_distinct_agg(
    df: DataFrame,
    group_keys: Sequence[str],
    distinct_col: str,
    n_buckets: int = 32,
    extra_aggs: Sequence[tuple[str, str, str]] = (),
) -> DataFrame:
    """Skewed COUNT(DISTINCT) decomposed into a two-level aggregation —
    the reference's SplitAggregateRule.scala rewrite (enabled by
    ``table.optimizer.distinct-agg.split.enabled``), Spark-first.

    A plain ``groupBy(g).agg(countDistinct(x))`` shuffles EVERY (g, x)
    pair to g's single reducer — a hot group becomes one straggler task.
    The split plan:

      level 1:  groupBy(g, pmod(hash(x), N))  -> count(DISTINCT x) AS pc
                [+ partial sums/counts for the non-distinct aggs]
      level 2:  groupBy(g)                    -> sum(pc)

    Distinct values of x land in exactly one bucket, so the per-bucket
    distinct counts are disjoint and their sum is the exact global
    distinct count; the hot group's work spreads over N reducer slots.
    Catalyst still performs map-side partial aggregation within each
    level, so the extra pass costs one additional (narrow) shuffle of
    at most ``groups x N`` rows.

    ``extra_aggs``: (fn, col, alias) decomposable aggregates carried
    through both levels — fn in {sum, count, min, max} (the same set the
    reference's rule splits; AVG needs sum+count reassembly, compose it
    from those).
    """
    gcols = list(group_keys)
    bucket = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_buckets))
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refine_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    level1 = (
        df.withColumn("_bkt", bucket)
        .groupBy(*gcols, "_bkt")
        .agg(
            F.countDistinct(distinct_col).alias("_pc"),
            *[partial_fns[fn](c).alias(f"_p_{alias}") for fn, c, alias in extra_aggs],
        )
    )
    return level1.groupBy(*gcols).agg(
        F.sum("_pc").alias(f"n_distinct_{distinct_col}"),
        *[refine_fns[fn](f"_p_{alias}").alias(alias) for fn, c, alias in extra_aggs],
    )
