"""Time-oriented and lookup joins: interval join, as-of/temporal join, lookup join.

Reference semantics:
- Interval join — equi-join plus a relative time-range predicate
  (flink-table-planner-blink .../stream/StreamExecIntervalJoin.scala:54;
  runtime .../operators/join/interval/TimeIntervalJoin.java:54).
- Temporal / as-of join — ``FOR SYSTEM_TIME AS OF l.rowtime`` against a
  versioned table (stream/StreamExecTemporalJoin.scala:56; runtime
  .../operators/join/temporal/TemporalRowTimeJoinOperator.java:77).
- Lookup join — per-row probe of an external system with an optional cache
  (stream/StreamExecLookupJoin.scala:38; runtime
  .../operators/join/lookup/LookupJoinRunner.java:36).

Spark-first design:
- ``interval_join`` is a plain DataFrame join whose condition carries the
  time range — Catalyst plans it as a ShuffledHashJoin/SortMergeJoin on the
  equi-keys with the range as a post-filter; at 100 TB this is one shuffle
  on the join key, no state, no custom code.
- ``asof_join`` has NO native Spark primitive.  The scalable formulation is
  the union-tag + last-value-window trick: union both sides tagged, sort
  per key by (ts, side), and carry the latest right-side payload forward
  with ``last(..., ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING.
  Cost: ONE shuffle + ONE sort, linear in rows — never a cross product,
  no per-key driver state, so it survives a 1000-executor 100 TB run
  (contrast a naive ``l JOIN r ON r.ts <= l.ts`` + max() which is
  quadratic per key).
- ``lookup_join`` probes an external fetch function per *distinct* key per
  Arrow batch via ``mapInPandas`` with an LRU cache — mirroring Flink's
  sync lookup runner + cache.  For dimension data that fits in memory,
  prefer a broadcast join (``broadcast_lookup_join``) — the planner's
  equivalent of Flink's broadcast hash join on the build side.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """``r.ts BETWEEN l.ts - lower AND l.ts + upper`` join.

    ``lower``/``upper`` are SQL interval strings like ``'30 minutes'``
    (lower reaches back, upper reaches forward, both inclusive).
    """
    cond = None
    for lk, rk in keys:
        c = left[lk] == right[rk]
        cond = c if cond is None else cond & c
    rng = (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lower}")) & (
        right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}")
    )
    cond = rng if cond is None else cond & rng
    return left.join(right, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    strict: bool = False,
    tolerance: str | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of (backward) join: for every left row, the latest right row with
    ``right.ts <= left.ts`` (``<`` when ``strict``) per key.

    ``right_cols`` are the right-side payload columns carried to the output
    (as ``r_<name>``, NULL when no version exists yet).  ``tolerance``
    (interval string) null-matches versions older than ``left.ts - tol``.
    ``right_tiebreak``: right column ordering ties on equal ts (larger wins).

    Implementation: union-tag + last-value window — one shuffle, one sort,
    linear; the standard scalable as-of plan.
    """
    keys = list(keys)
    # 0 sorts before 1 => right rows at equal ts come first => inclusive
    # (<=) semantics; strict flips the tag order.
    left_tag, right_tag = (0, 1) if strict else (1, 0)

    l_pruned = left.withColumn("_ts", F.col(left_ts).cast("timestamp")).withColumn(
        "_side", F.lit(left_tag)
    )
    r_proj = [F.col(k) for k in keys] + [
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(right_tag).alias("_side"),
    ]
    tie = (
        F.col(right_tiebreak).cast("double")
        if right_tiebreak
        else F.lit(0.0)
    )
    r_proj.append(tie.alias("_tie"))
    r_proj += [F.col(c).alias(f"_r_{c}") for c in right_cols]
    r_proj.append(F.col(right_ts).cast("timestamp").alias("_r_matched_ts"))
    r_pruned = right.select(*r_proj)

    l_cols = [c for c in l_pruned.columns]
    unioned = l_pruned.select(
        *l_cols,
        F.lit(0.0).alias("_tie"),
        *[F.lit(None).cast(dict(r_pruned.dtypes)[f"_r_{c}"]).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast("timestamp").alias("_r_matched_ts"),
    ).unionByName(
        r_pruned.select(
            *[
                F.lit(None).cast(dict(l_pruned.dtypes)[c]).alias(c)
                if c not in keys and c not in ("_ts", "_side")
                else F.col(c)
                for c in l_cols
            ],
            "_tie",
            *[F.col(f"_r_{c}") for c in right_cols],
            "_r_matched_ts",
        )
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *l_cols,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"r_{c}") for c in right_cols],
        F.last("_r_matched_ts", ignorenulls=True).over(w).alias("_matched_ts"),
    )
    out = carried.where(F.col("_side") == left_tag)
    if tolerance is not None:
        too_old = F.col("_matched_ts") < F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(f"r_{c}")).alias(f"r_{c}")
                for c in right_cols
            ],
        )
    else:
        out = out.select(*[c for c in left.columns], *[f"r_{c}" for c in right_cols])
    return out


def temporal_join(
    probe: DataFrame,
    versions: DataFrame,
    keys: Sequence[str],
    probe_ts: str,
    version_ts: str,
    attrs: Sequence[str],
) -> DataFrame:
    """``probe FOR SYSTEM_TIME AS OF probe.ts JOIN versions`` — each probe
    row sees the version row valid at its timestamp (the latest version
    with ``version_ts <= probe_ts``).  Same engine as :func:`asof_join`;
    the reference implements this as TemporalRowTimeJoinOperator keeping a
    versioned state map per key — here it is a sort, not state.
    """
    return asof_join(probe, versions, keys, probe_ts, version_ts, attrs)


def lookup_join(
    df: DataFrame,
    key: str,
    fetch: Callable[[Sequence[object]], dict[object, dict[str, object]]],
    out_fields: Sequence[tuple[str, str]],
    cache_size: int = 10_000,
) -> DataFrame:
    """Enrich ``df`` by probing ``fetch(keys) -> {key: {field: value}}``
    per distinct key per Arrow batch, with a per-task LRU cache —
    Flink's LookupJoinRunner + LRU cache, Spark-side as ``mapInPandas``
    (Arrow-batched; amortizes the probe like Flink's async lookup).

    ``out_fields``: (name, spark_type_ddl) appended as ``r_<name>``.
    NOTE: for dim tables that fit in executor memory use
    :func:`broadcast_lookup_join` instead — no Python on the data path.
    """
    import pandas as pd  # local import: worker-side

    schema = ", ".join(
        [f"`{n}` {t}" for n, t in df.dtypes]
        + [f"`r_{n}` {t}" for n, t in out_fields]
    )
    names = [n for n, _ in out_fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[object, dict[str, object]] = {}
        for pdf in batches:
            batch_keys = set(pdf[key].dropna().unique().tolist())
            need = [k for k in batch_keys if k not in cache]
            if need:
                fetched = fetch(need)
                for k in need:
                    cache[k] = fetched.get(k, {})
            for n in names:
                pdf[f"r_{n}"] = pdf[key].map(lambda k: cache.get(k, {}).get(n))
            # evict AFTER applying to this batch, and never a key the
            # current batch just fetched — otherwise a batch with more
            # distinct keys than cache_size silently enriches with NULLs
            if len(cache) > cache_size:
                for k in [k for k in cache if k not in batch_keys]:
                    if len(cache) <= cache_size:
                        break
                    cache.pop(k)
            yield pdf

    return df.mapInPandas(run, schema)


def broadcast_lookup_join(
    df: DataFrame, dim: DataFrame, keys: Sequence[tuple[str, str]], how: str = "left"
) -> DataFrame:
    """Lookup join against a dim table small enough to broadcast — the plan
    Flink's BatchExecHashJoinRule picks with its isBroadcast flag; in Spark
    an explicit ``broadcast()`` hint pins BroadcastHashJoin regardless of
    stats staleness at 100 TB."""
    cond = None
    for lk, rk in keys:
        c = df[lk] == dim[rk]
        cond = c if cond is None else cond & c
    return df.join(F.broadcast(dim), cond, how)
