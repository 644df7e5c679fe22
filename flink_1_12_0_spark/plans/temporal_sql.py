"""Flink-SQL temporal join front-end: ``FOR SYSTEM_TIME AS OF``.

Reference: the event-time temporal join (flink-table-planner-blink
.../physical/stream/StreamExecTemporalJoin.scala:56, grammar in
flink-sql-parser src/main/codegen/includes/parserImpls.ftl) — every probe
row joins the version row valid at its timestamp (latest ``version_ts <=
probe_ts`` per key), the construct Flink users write constantly against
versioned dim tables::

    SELECT o.id, r.rate
    FROM orders AS o
    [LEFT] JOIN rates FOR SYSTEM_TIME AS OF o.order_time AS r
    ON o.currency = r.currency
    [WHERE ...] [GROUP BY ...] [ORDER BY ...]

Spark has no temporal-join syntax, so the statement is parsed here and
routed to :func:`operators.joins.asof_join` (union-tag + last-value
window — one shuffle, one sort, the scalable as-of plan); the surrounding
SELECT/WHERE/GROUP/ORDER run as plain Spark SQL over the joined view with
``v.col`` references rewritten to the join's ``r_col`` outputs.

Version-time resolution (Flink derives it from the versioned table's
rowtime attribute): (1) a watermark column recorded by CREATE TABLE DDL
for that table, else (2) a column with the same name as the probe's
AS OF column.  INNER drops probe rows with no valid version (matched
version ts IS NULL); LEFT keeps them with NULL version columns —
TemporalRowTimeJoinOperator's two modes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TEMPORAL_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<probe>[\w.]+)(?:\s+AS)?\s+(?P<palias>\w+)\s+"
    r"(?P<left>LEFT\s+)?JOIN\s+(?P<ver>[\w.]+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?P<asof>[\w.]+)(?:(?:\s+AS)?\s+(?P<valias>\w+))?\s+ON\s+(?P<on>.*?)"
    r"(?P<rest>\s+(?:WHERE|GROUP\s+BY|ORDER\s+BY|LIMIT)\s+.*)?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_EQ_RE = re.compile(r"(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)")


#: temporal table FUNCTION join (the pre-FLIP-132 spelling — reference
#: TemporalTableFunction.java + LogicalCorrelateToJoinFromTemporalTable
#: rules): ``FROM Orders o, LATERAL TABLE (Rates(o.rowtime)) r WHERE
#: r.currency = o.currency``
_LATERAL_TTF_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<probe>[\w.]+)(?:\s+AS)?\s+(?P<palias>\w+)\s*,\s*"
    r"LATERAL\s+TABLE\s*\(\s*(?P<fn>\w+)\s*\(\s*(?P<asof>[\w.]+)\s*\)\s*\)"
    r"(?:(?:\s+AS)?\s+(?P<valias>\w+))?"
    r"(?P<rest>\s+(?:WHERE|GROUP\s+BY|ORDER\s+BY|LIMIT)\s+.*)?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def is_temporal_join(sql: str) -> bool:
    return re.search(r"\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b", sql, re.IGNORECASE) is not None


def lateral_temporal_function(sql: str) -> str | None:
    """The function name of a ``LATERAL TABLE (f(ts))`` correlate, or None
    (the router checks it against registered TemporalTableFunctions — an
    unregistered name falls through to the UDTF LATERAL VIEW translation)."""
    m = re.search(r"LATERAL\s+TABLE\s*\(\s*(\w+)\s*\(", sql, re.IGNORECASE)
    return m.group(1) if m else None


def _split_items(sel: str) -> list[str]:
    items, depth, cur = [], 0, []
    for ch in sel:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))
    return items


def _rewriters(palias: str, valias: str):
    """(fragment rewriter, select-list rewriter): ``v.col`` references →
    the join's ``r_col`` outputs; ``p.col`` → bare ``col``."""

    def _rewrite(fragment: str) -> str:
        fragment = re.sub(rf"\b{re.escape(valias)}\.(\w+)", r"r_\1", fragment)
        return re.sub(rf"\b{re.escape(palias)}\.(\w+)", r"\1", fragment)

    def _rewrite_select(sel: str) -> str:
        # a bare qualified reference keeps its unqualified output name
        # (Flink: SELECT r.rate yields column `rate`, not `r_rate`)
        out = []
        for item in _split_items(sel):
            s = item.strip()
            if mv := re.fullmatch(rf"{re.escape(valias)}\.(\w+)", s):
                out.append(f"r_{mv.group(1)} AS {mv.group(1)}")
            elif mp := re.fullmatch(rf"{re.escape(palias)}\.(\w+)", s):
                out.append(mp.group(1))
            else:
                out.append(_rewrite(s))
        return ", ".join(out)

    return _rewrite, _rewrite_select


def run_temporal_function_join(spark: SparkSession, sql: str, ttfs: dict) -> DataFrame:
    """Execute a temporal table FUNCTION correlate: each probe row joins
    the version of the function's backing table valid at the passed time
    attribute — inner semantics (unmatched probe rows drop), the
    TemporalProcessTimeJoinOperator/TemporalRowTimeJoinOperator contract.
    The version key comes from the function's declared primary key; the
    probe-side key column is matched from the WHERE equi-condition
    (LogicalCorrelateToJoinFromTemporalTableFunctionRule extracts it the
    same way), defaulting to a probe column of the same name."""
    from flink_1_12_0_spark.operators.joins import asof_join

    m = _LATERAL_TTF_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError(
            "unsupported LATERAL TABLE temporal shape — expected SELECT ... "
            "FROM probe [AS] p, LATERAL TABLE (f(p.ts)) [AS] v [WHERE ...]"
        )
    ttf = ttfs[m.group("fn")]
    palias = m.group("palias")
    valias = m.group("valias") or m.group("fn")
    asof_alias, _, asof_col = m.group("asof").rpartition(".")
    if asof_alias and asof_alias != palias:
        raise ValueError(f"the time argument must be a probe attribute: {m.group('asof')}")

    probe = spark.table(m.group("probe"))
    versions = ttf.table.df
    pk, vts = ttf.primary_key, ttf.time_attr

    probe_key = pk if pk in probe.columns else None
    rest = m.group("rest") or ""
    for qa, ca, qb, cb in _EQ_RE.findall(rest):
        if qa == palias and qb == valias and cb == pk:
            probe_key = ca
        elif qa == valias and qb == palias and ca == pk:
            probe_key = cb
    if probe_key is None:
        raise ValueError(
            f"cannot match the probe key for primary key {pk!r}: add "
            f"WHERE {palias}.<col> = {valias}.{pk}"
        )

    renamed, vts_r = versions, vts
    if pk != probe_key:
        renamed = renamed.withColumnRenamed(pk, probe_key)
        if pk == vts:
            vts_r = probe_key
    joined = asof_join(
        probe, renamed, [probe_key], asof_col, vts_r,
        right_cols=list(renamed.columns),
    ).where(F.col(f"r_{vts_r}").isNotNull())

    view = "_temporal_fn_joined"
    joined.createOrReplaceTempView(view)
    _rewrite, _rewrite_select = _rewriters(palias, valias)

    def _align_pk(fragment: str) -> str:
        # the version pk column was renamed to the probe key's name before
        # the join, so v.<pk> references resolve to r_<probe_key>
        if pk != probe_key:
            fragment = re.sub(
                rf"\b{re.escape(valias)}\.{re.escape(pk)}\b",
                f"{valias}.{probe_key}", fragment,
            )
        return fragment

    # the WHERE pk equality becomes r_pk = pk — a tautology on the inner
    # join's matched rows, harmless to re-apply with the rest of the filter
    final = f"SELECT {_rewrite_select(_align_pk(m.group('sel')))} FROM {view}"
    if rest.strip():
        final += " " + _rewrite(_align_pk(rest.strip()))
    return spark.sql(final)



def run_temporal_join(
    spark: SparkSession,
    sql: str,
    version_ts_by_table: dict[str, str] | None = None,
) -> DataFrame:
    """Execute a single-temporal-join SELECT of the canonical shape above.

    ``version_ts_by_table``: rowtime attribute per versioned table
    (populated from CREATE TABLE watermark DDL by TableEnvironment).
    """
    from flink_1_12_0_spark.operators.joins import asof_join

    m = _TEMPORAL_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError(
            "unsupported FOR SYSTEM_TIME AS OF shape — expected "
            "SELECT ... FROM probe [AS] p [LEFT] JOIN versions "
            "FOR SYSTEM_TIME AS OF p.ts [AS] v ON p.k = v.k [...]"
        )
    palias, valias = m.group("palias"), m.group("valias") or m.group("ver")
    asof_alias, _, asof_col = m.group("asof").rpartition(".")
    if asof_alias and asof_alias != palias:
        raise ValueError(f"AS OF must reference the probe side, got {m.group('asof')}")

    # join keys from the ON conjunction (equi-conds only, Flink's
    # TEMPORAL_JOIN_CONDITION requires at least one)
    keys: list[tuple[str, str]] = []  # (probe_col, version_col)
    on = m.group("on")
    for qa, ca, qb, cb in _EQ_RE.findall(on):
        if qa == palias and qb == valias:
            keys.append((ca, cb))
        elif qa == valias and qb == palias:
            keys.append((cb, ca))
        else:
            raise ValueError(f"ON condition must join {palias} to {valias}: {on}")
    if not keys:
        raise ValueError("temporal join requires at least one equi-condition")

    probe = spark.table(m.group("probe"))
    versions = spark.table(m.group("ver"))
    vts = (version_ts_by_table or {}).get(m.group("ver"))
    if vts is None:
        # no watermark DDL: the rowtime is the versioned side's sole
        # timestamp-typed column (a version table has exactly one time
        # attribute), preferring a name match with the AS OF column
        ts_cols = [c for c, t in versions.dtypes if t.startswith("timestamp")]
        if asof_col in ts_cols:
            vts = asof_col
        elif len(ts_cols) == 1:
            vts = ts_cols[0]
        else:
            raise ValueError(
                f"cannot resolve the version rowtime of {m.group('ver')}: no "
                f"watermark DDL and {len(ts_cols)} timestamp columns {ts_cols}"
            )

    # align version key names with probe key names for asof_join
    renamed, vts_r = versions, vts
    for pk, vk in keys:
        if vk != pk:
            renamed = renamed.withColumnRenamed(vk, pk)
            if vk == vts:
                vts_r = pk
    right_cols = list(renamed.columns)

    joined = asof_join(
        probe,
        renamed,
        [pk for pk, _ in keys],
        asof_col,
        vts_r,
        right_cols=right_cols,
    )
    if not m.group("left"):
        # INNER: a probe row with no valid version has a NULL matched
        # version rowtime
        joined = joined.where(joined[f"r_{vts_r}"].isNotNull())

    view = "_temporal_joined"
    joined.createOrReplaceTempView(view)
    _rewrite, _rewrite_select = _rewriters(palias, valias)
    final = f"SELECT {_rewrite_select(m.group('sel'))} FROM {view}"
    if m.group("rest"):
        final += " " + _rewrite(m.group("rest").strip())
    return spark.sql(final)
