"""Oracle-comparison harness mimicking the driver's correctness gate:

run the Spark query and the DuckDB oracle on the same parquet tables, then
compare row count + column names + order-insensitive values with numerics
rounded to 2 decimals (the reference's TPC-H comparator tolerance,
TpchResultComparator.java:71-121).
"""

from __future__ import annotations

import math
from datetime import date, datetime

import numpy as np
import pandas as pd


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
    """Columns sorted by name; rows as normalized tuples, sorted."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str, name: str = "?"):
    got = spark_df.toPandas()
    want = duck_con.execute(oracle_sql).df()
    assert len(got) == len(want), (
        f"[{name}] row count: spark={len(got)} oracle={len(want)}"
    )
    assert sorted(c.lower() for c in got.columns) == sorted(c.lower() for c in want.columns), (
        f"[{name}] columns: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    got.columns = [c.lower() for c in got.columns]
    want.columns = [c.lower() for c in want.columns]
    g, w = normalize(got), normalize(want)
    mism = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mism, f"[{name}] {len(mism)} mismatched rows; first: {mism[0]}"
