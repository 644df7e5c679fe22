"""PyFlink-shaped UDF decorators: udf / udtf / udaf.

Reference: flink-python/pyflink/table/udf.py:515 (``udf``), :570 (``udtf``),
``udaf`` — with ``func_type`` "general" (row-at-a-time) or "pandas"
(Arrow-vectorized).  Flink bridges these into the JVM via a Python worker
process (PythonCalcSplitRule.scala splits plans around them); Spark does
exactly the same internally (ExtractPythonUDFs), so the decorators map
1:1:

- udf general → ``F.udf``              (row-at-a-time, slow path)
- udf pandas  → ``F.pandas_udf``       (Arrow batches — the fast path)
- udtf        → ``F.udf`` returning array<result>; apply with
  ``explode`` / ``explode_outer`` (correlate semantics, SURVEY §2.2)
- udaf pandas → ``F.pandas_udf`` used inside ``groupBy().agg`` (GROUPED_AGG)

A UDAF with retraction (Flink's AggregateFunction.retract for update-mode
streams) has no Spark equivalent — streaming aggs recompute per window /
use the state-store path instead (documented divergence, SURVEY §2.10).
"""

from __future__ import annotations

import functools

from pyspark.sql import functions as F


def udf(f=None, *, result_type: str = "string", func_type: str = "general"):
    """Scalar UDF decorator.

    ``@udf(result_type="bigint")`` → row-at-a-time;
    ``@udf(result_type="double", func_type="pandas")`` → Arrow-vectorized
    (series → series).  Use pandas whenever the function is vectorizable —
    10-100× less overhead (SURVEY §2.10).
    """

    def deco(fn):
        if func_type == "pandas":
            return F.pandas_udf(result_type)(fn)
        return F.udf(fn, result_type)

    return deco(f) if f is not None else deco


def udtf(f=None, *, result_type: str):
    """Table function (UDTF): ``f(row_args) -> iterable of results``.

    Returns a scalar UDF producing ``array<result_type>``; compose with
    ``F.explode(...)`` (CROSS JOIN LATERAL) or ``F.explode_outer`` (LEFT
    JOIN LATERAL) — the two correlate modes of StreamExecCorrelate.
    """

    def deco(fn):
        @functools.wraps(fn)
        def collect(*args):
            return list(fn(*args))

        return F.udf(collect, f"array<{result_type}>")

    return deco(f) if f is not None else deco


def udaf(f=None, *, result_type: str):
    """Aggregate UDF (pandas GROUPED_AGG): ``f(series, ...) -> scalar``;
    use inside ``groupBy().agg(...)`` or as a window function."""

    def deco(fn):
        return F.pandas_udf(result_type)(fn)

    return deco(f) if f is not None else deco
