"""Group-window operators: TUMBLE / HOP / SESSION / CUMULATE.

Reference: group window aggregates
(flink-table-planner-blink .../stream/StreamExecGroupWindowAggregateBase.scala:54;
assigners flink-table-runtime-blink .../operators/window/assigners/ —
Tumbling, Sliding, Session, Cumulative, CountTumbling, CountSliding).

Spark-first mapping: TUMBLE/HOP -> ``F.window``; SESSION ->
``F.session_window`` — all native, streaming-capable, whole-stage-codegen'd.
CUMULATE (growing windows sharing a start) has no Spark primitive: we
assign each row to every cumulative window it belongs to via an exploded
``sequence`` — pure built-in functions, no Python on the data path, so the
expansion stays JVM-side and scales linearly with (max_size/step).

Count windows (CountTumbling/CountSliding) are ordering-dependent and live
in streaming/stateful.py.

All helpers accept batch or streaming DataFrames (event-time col + optional
watermark upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_window(df: DataFrame, w: Column) -> DataFrame:
    """Project the window struct ONCE, then extract start/end. Referencing
    `w.start` and `w.end` as independent expressions would make a sliding
    window explode per reference (cartesian row duplication)."""
    return (
        df.withColumn("_w", w)
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def tumble(df: DataFrame, ts: str, size: str) -> DataFrame:
    """Assign each row to a tumbling window; adds window_start/window_end."""
    return _with_window(df, F.window(F.col(ts), size))


def hop(df: DataFrame, ts: str, size: str, slide: str) -> DataFrame:
    """Sliding (hopping) windows — a row lands in size/slide windows."""
    return _with_window(df, F.window(F.col(ts), size, slide))


def session(df: DataFrame, ts: str, gap: str) -> Column:
    """Session window column (merge rows closer than ``gap``); use inside
    ``df.groupBy(session(df, "ts", "30 minutes"), ...)``."""
    return F.session_window(F.col(ts), gap)


def cumulate(df: DataFrame, ts: str, step: str, max_size: str) -> DataFrame:
    """CUMULATE windows: for fixed start S = floor(ts / max_size), emit the
    row into windows [S, S+step), [S, S+2*step) ... [S, S+max_size).

    Implemented with built-ins only: window start from a tumble of
    ``max_size``, window ends exploded from ``sequence``.
    """
    step_i = F.expr(f"INTERVAL {step}")
    base = F.window(F.col(ts), max_size)
    out = df.withColumn("window_start", base.start).withColumn("_max_end", base.end)
    out = out.withColumn(
        "window_end",
        F.explode(
            F.sequence(
                F.col("window_start") + step_i, F.col("_max_end"), step_i
            )
        ),
    )
    # a row belongs only to cumulative windows that end after it
    return out.where(F.col(ts) < F.col("window_end")).drop("_max_end")
