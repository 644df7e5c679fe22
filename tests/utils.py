"""Oracle-comparison harness mirroring the driver's correctness gate.

The driver canonicalizes both result frames with pandas ``sort_values``
over ALL columns (columns sorted by name), rounds numerics to 2 decimals,
then value-hashes — and its hash is DTYPE-SENSITIVE: an int64 ``2`` and a
float64 ``2.0`` hash differently, and an ndarray cell (ARRAY-typed output
column) crashes ``sort_values`` with ``TypeError: unhashable type``.

Round 1 shipped 5 driver-red rows while the local gate was green because
the old local normalizer coerced ndarray→tuple and compared ``2 == 2.0``
as equal.  This version reproduces the driver's strictness:

* raw array/map cells in the OUTPUT raise (queries must stringify them);
* int-typed and float-typed cells never compare equal;
* floats round to 2 decimals, NaN == NULL;
* dates/timestamps normalize to ISO strings (both engines produce
  comparable types here — verified by round-1 green rows).
"""

from __future__ import annotations

import decimal
import math
from datetime import date, datetime

import numpy as np
import pandas as pd


class ArrayCellError(TypeError):
    """An output column holds raw array/map cells — the driver's
    canonicalizer would crash on these (CORRECTNESS r01: agg_collect_listagg,
    fn_array_lambda).  Stringify with array_join / array_to_string."""


class DecimalCellError(TypeError):
    """An output column holds decimal.Decimal cells — Spark produced a
    DecimalType column (typically BIGINT * decimal-literal arithmetic)
    while DuckDB's matching expression types as DOUBLE; the driver's
    canonicalizer reprs Decimals UNROUNDED, so every row hash-mismatches
    (round 6: tpcds_item_class_share shipped red this way).  Keep share /
    ratio expressions in DOUBLE: use a DOUBLE literal (100e0) or
    CAST(... AS DOUBLE)."""


def _render(v) -> str:
    """Dtype-sensitive canonical rendering of one cell."""
    if isinstance(v, np.ndarray) or isinstance(v, (list, tuple, dict, set)):
        raise ArrayCellError(
            f"raw collection cell in output ({type(v).__name__}): "
            "stringify array/map output columns (array_join / array_to_string)"
        )
    if v is None:
        return "<NULL>"
    if isinstance(v, decimal.Decimal):
        raise DecimalCellError(
            "decimal.Decimal cell in output: Spark typed this column as "
            "DecimalType (BIGINT x decimal-literal arithmetic?) — the driver "
            "canonicalizer reprs it unrounded and every row mismatches; use "
            "a DOUBLE literal (100e0) or CAST(... AS DOUBLE)"
        )
    if isinstance(v, (float, np.floating)):
        f = round(float(v), 2)
        if math.isnan(f):
            return "<NULL>"
        if f == 0.0:
            f = 0.0  # collapse -0.0
        return repr(f)  # float stays float: '2.0', never '2'
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "<NULL>"
        return v.isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    if v is pd.NaT:
        return "<NULL>"
    return f"str:{v}" if isinstance(v, str) else repr(v)


def canonicalize(pdf: pd.DataFrame) -> list[str]:
    """Columns lower-cased and sorted by name; each row rendered to one
    canonical string; rows sorted — a dtype-sensitive multiset."""
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    rows = [
        "\x1f".join(_render(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str, name: str = "?"):
    got = spark_df.toPandas()
    want = duck_con.execute(oracle_sql).df()
    assert len(got) == len(want), (
        f"[{name}] row count: spark={len(got)} oracle={len(want)}"
    )
    assert sorted(c.lower() for c in got.columns) == sorted(c.lower() for c in want.columns), (
        f"[{name}] columns: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    g, w = canonicalize(got), canonicalize(want)
    mism = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mism, (
        f"[{name}] {len(mism)} mismatched canonical rows; first:\n"
        f"  spark : {mism[0][0]!r}\n  oracle: {mism[0][1]!r}"
    )


# Back-compat for tests that normalize standalone frames (non-oracle
# comparisons, e.g. comparing two Spark results): the lenient cell
# normalizer, kept ONLY for spark-vs-spark / spark-vs-pandas checks where
# the driver's canonicalizer never runs.
def _norm_cell(v):
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 2)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    """Lenient multiset form — for spark-vs-spark comparisons only; the
    oracle gate uses :func:`canonicalize`."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)
