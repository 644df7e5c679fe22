"""Flink 1.12 SQL dialect → Spark SQL translation.

Reference grammar: flink-sql-parser
src/main/codegen/includes/parserImpls.ftl (WATERMARK FOR clause :504,
CREATE TABLE ... WITH) and the group-window functions
TUMBLE/HOP/SESSION + *_START/_END/_ROWTIME accessors registered in
FlinkSqlOperatorTable.java (TUMBLE_OLD lineage).

Covered subset (the constructs TPC-style and windowed streaming queries
actually use — each with a value-checked query or unit test):

- ``GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)``  → ``GROUP BY window(ts, '1 hour')``
- ``GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '1' HOUR)``
  (slide, size)                               → ``window(ts, '1 hour', '5 minutes')``
- ``GROUP BY SESSION(ts, INTERVAL '30' MINUTE)`` → ``session_window(ts, '30 minutes')``
- ``TUMBLE_START/TUMBLE_END/HOP_START/HOP_END/SESSION_START/SESSION_END(...)``
  → ``window.start`` / ``window.end``
- ``PROCTIME()``                              → ``current_timestamp()``
- function renames: SPLIT_INDEX→split+element, CHAR_LENGTH→length,
  TO_BASE64/FROM_BASE64→base64/unbase64, RAND_INTEGER(n)→floor(rand()*n),
  LOCALTIMESTAMP2... (1:1 list below)
- ``WATERMARK FOR c AS c - INTERVAL 'd' <unit>`` inside CREATE TABLE DDL
  → recorded and applied as ``withWatermark`` (parse_create_table).

Translation is token-level (regex over a comment/string-stripped view) —
the constructs are syntactically regular; a full parser is not needed for
this dialect distance.  Untranslated SQL passes through unchanged, so
plain ANSI queries are unaffected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_UNIT = {
    "SECOND": "seconds",
    "MINUTE": "minutes",
    "HOUR": "hours",
    "DAY": "days",
}

#: simple 1:1 (or expression-template) function renames
_FN_RENAMES = [
    (r"\bCHAR_LENGTH\s*\(", "length("),
    (r"\bTO_BASE64\s*\(", "base64("),
    (r"\bFROM_BASE64\s*\(", "unbase64("),
    (r"\bPROCTIME\s*\(\s*\)", "current_timestamp()"),
    (r"\bLOCALTIMESTAMP\b(?!\s*\()", "localtimestamp()"),
]


def _interval_to_str(ival: str, unit: str) -> str:
    n = ival.strip("'\" ")
    return f"{n} {_UNIT[unit.upper()]}"


_WIN_RE = re.compile(
    r"\b(TUMBLE|HOP|SESSION)\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*"
    r"INTERVAL\s+('[^']+'|\d+)\s+(\w+)"
    r"(?:\s*,\s*INTERVAL\s+('[^']+'|\d+)\s+(\w+))?\s*\)",
    re.IGNORECASE,
)

_ACC_RE = re.compile(
    r"\b(TUMBLE|HOP|SESSION)_(START|END|ROWTIME|PROCTIME)\s*\([^)]*\)", re.IGNORECASE
)


def translate(sql: str) -> str:
    """Translate a Flink-dialect query string to Spark SQL."""

    def win_repl(m: re.Match) -> str:
        kind = m.group(1).upper()
        ts = m.group(2)
        i1 = _interval_to_str(m.group(3), m.group(4))
        if kind == "SESSION":
            return f"session_window({ts}, '{i1}')"
        if kind == "TUMBLE":
            return f"window({ts}, '{i1}')"
        # HOP(ts, slide, size) -> window(ts, size, slide)
        i2 = _interval_to_str(m.group(5), m.group(6))
        return f"window({ts}, '{i2}', '{i1}')"

    def acc_repl(m: re.Match) -> str:
        kind = m.group(2).upper()
        if kind == "START":
            return "window.start"
        if kind in ("ROWTIME",):
            # Flink's window rowtime attribute is END - 1ms (the max
            # timestamp still inside the window) — GroupWindowAssigner
            # maxTimestamp(); PROCTIME accessor materializes to END.
            return "(window.end - INTERVAL 1 MILLISECOND)"
        return "window.end"

    out = _WIN_RE.sub(win_repl, sql)
    out = _ACC_RE.sub(acc_repl, out)
    for pat, repl in _FN_RENAMES:
        out = re.sub(pat, repl, out, flags=re.IGNORECASE)
    # SPLIT_INDEX(s, d, i) -> element_at(split(s, d), i + 1) [0-based -> 1-based]
    out = re.sub(
        r"\bSPLIT_INDEX\s*\(([^,]+),\s*([^,]+),\s*(\d+)\s*\)",
        lambda m: f"element_at(split({m.group(1)}, {m.group(2)}), {int(m.group(3)) + 1})",
        out,
        flags=re.IGNORECASE,
    )
    # RAND_INTEGER(n) -> floor(rand() * n)
    out = re.sub(
        r"\bRAND_INTEGER\s*\(([^)]+)\)",
        lambda m: f"CAST(floor(rand() * ({m.group(1)})) AS INT)",
        out,
        flags=re.IGNORECASE,
    )
    # BETWEEN SYMMETRIC (Calcite/Flink standard; Spark lacks SYMMETRIC):
    # bounds may arrive in either order -> least/greatest normalization.
    # Operands may be spaced expressions: the first binds lazily to the
    # nearest top-level AND, the second extends to the next boolean /
    # clause keyword and may contain one paren-nesting level of calls
    # like the TRUNCATE/SHA templates (a top-level AND inside the FIRST
    # operand, or deeper nesting, would need a real parser —
    # parenthesize in that case).
    out = re.sub(
        r"\bBETWEEN\s+SYMMETRIC\s+(.+?)\s+AND\s+"
        r"((?:(?!\s+(?:AND|OR|AS|FROM|WHERE|THEN|ELSE|END|ON|JOIN|"
        r"ORDER\s+BY|GROUP\s+BY|HAVING|LIMIT|WINDOW)\b)"
        r"(?:\([^()]*\)|[^,()]))+)",
        lambda m: (
            f"BETWEEN least({m.group(1)}, {m.group(2)}) "
            f"AND greatest({m.group(1)}, {m.group(2)})"
        ),
        out,
        flags=re.IGNORECASE | re.DOTALL,
    )
    # Numeric TRUNCATE(x [, d]) (FlinkSqlOperatorTable TRUNCATE;
    # SqlFunctionUtils.java truncate): truncation TOWARD ZERO at scale d —
    # Spark has no numeric truncate builtin, so expand to the
    # sign-preserving floor form
    def _truncate_repl(m: re.Match) -> str:
        x, d = m.group(1).strip(), (m.group(2) or "0").strip()
        return (
            f"(sign({x}) * floor(abs({x}) * power(10, {d})) / power(10, {d}))"
        )

    out = re.sub(
        r"\bTRUNCATE\s*\(((?:[^(),]|\([^()]*\))+)(?:,\s*((?:[^(),]|\([^()]*\))+))?\)",
        _truncate_repl,
        out,
        flags=re.IGNORECASE,
    )
    # SHA-2 named variants (FlinkSqlOperatorTable SHA224/SHA256/SHA384/
    # SHA512) -> Spark sha2(expr, bits); one nesting level of parentheses
    # in the argument is supported (consistent with the other templates)
    out = re.sub(
        r"\bSHA(224|256|384|512)\s*\(((?:[^()]|\([^()]*\))*)\)",
        lambda m: f"sha2({m.group(2)}, {m.group(1)})",
        out,
        flags=re.IGNORECASE,
    )
    # CONVERT_TZ(ts_string, tzFrom, tzTo) (FlinkSqlOperatorTable
    # CONVERT_TZ; SqlDateTimeUtils.convertTz): reinterpret a
    # 'yyyy-MM-dd HH:mm:ss' string from tzFrom as tzTo, returning a
    # string — Spark spells it to_utc_timestamp + from_utc_timestamp
    out = re.sub(
        r"\bCONVERT_TZ\s*\(((?:[^(),]|\([^()]*\))+),"
        r"\s*((?:[^(),]|\([^()]*\))+),\s*((?:[^(),]|\([^()]*\))+)\)",
        lambda m: (
            f"date_format(from_utc_timestamp(to_utc_timestamp({m.group(1)}, "
            f"{m.group(2)}), {m.group(3)}), 'yyyy-MM-dd HH:mm:ss')"
        ),
        out,
        flags=re.IGNORECASE,
    )
    # (s1, e1) OVERLAPS (s2, e2) (SQL-standard period predicate,
    # FlinkSqlOperatorTable OVERLAPS): Calcite normalizes each period
    # (swap if end < start) then tests inclusive intersection — Spark has
    # no OVERLAPS, so expand to least/greatest.  One paren-nesting level
    # per operand, consistent with the other templates.  A period's second
    # element may be an INTERVAL duration instead of an end point
    # (reference CustomizedConvertRule.convertTemporalOverlaps rewrites it
    # to start + interval); translate that BEFORE the least/greatest
    # expansion — the old form emitted invalid `least(ts, INTERVAL ...)`.
    _op = r"((?:[^(),]|\([^()]*\))+)"

    def _overlaps(m: re.Match) -> str:
        s1, e1, s2, e2 = (m.group(i).strip() for i in range(1, 5))
        if re.match(r"INTERVAL\b", e1, re.IGNORECASE):
            e1 = f"({s1} + {e1})"
        if re.match(r"INTERVAL\b", e2, re.IGNORECASE):
            e2 = f"({s2} + {e2})"
        return (
            f"(least({s1}, {e1}) <= greatest({s2}, {e2}) AND "
            f"least({s2}, {e2}) <= greatest({s1}, {e1}))"
        )

    out = re.sub(
        rf"\(\s*{_op},\s*{_op}\)\s+OVERLAPS\s+\(\s*{_op},\s*{_op}\)",
        _overlaps,
        out,
        flags=re.IGNORECASE,
    )
    # Dynamic table options hints (FLIP-113, `t /*+ OPTIONS('k'='v') */`):
    # per-query source-config overrides.  Connector tables that DO read
    # options (kafka / upsert-kafka / datagen doubles) get their hints
    # APPLIED before translation by TableEnvironment._query (catalog_ddl
    # re-resolves the source with merged options); what reaches here are
    # hints on plain registered views, which have no reader to configure —
    # strip those so the query runs (Spark's own query hints like
    # /*+ BROADCAST */ pass through untouched).
    # quoted option values may contain ')' (paths, regex properties), so
    # consume quoted strings atomically instead of stopping at any ')'
    out = re.sub(
        r"/\*\+\s*OPTIONS\s*\((?:'[^']*'|[^)'])*\)\s*\*/", "", out, flags=re.IGNORECASE
    )
    # UDTF joins (LogicalUnnestRule / StreamExecCorrelate):
    #   FROM t, LATERAL TABLE(f(x)) AS T(c)            -> LATERAL VIEW
    #   FROM t LEFT JOIN LATERAL TABLE(f(x)) AS T(c) ON TRUE
    #                                                  -> LATERAL VIEW OUTER
    # single output column; f is any array-producing expression (a
    # registered UDTF or an array builtin — Spark explodes either).
    out = re.sub(
        r"LEFT\s+JOIN\s+LATERAL\s+TABLE\s*\(\s*([\w.]+\s*\([^()]*\))\s*\)\s*"
        r"(?:AS\s+)?(\w+)\s*\(\s*(\w+)\s*\)\s*ON\s+TRUE",
        r"LATERAL VIEW OUTER explode(\1) \2 AS \3",
        out,
        flags=re.IGNORECASE,
    )
    out = re.sub(
        r",\s*LATERAL\s+TABLE\s*\(\s*([\w.]+\s*\([^()]*\))\s*\)\s*"
        r"(?:AS\s+)?(\w+)\s*\(\s*(\w+)\s*\)",
        r" LATERAL VIEW explode(\1) \2 AS \3",
        out,
        flags=re.IGNORECASE,
    )
    return out


@dataclass
class TableDDL:
    """Parsed CREATE TABLE: schema + computed columns + watermark +
    connector options + FLIP-110 LIKE clause."""

    name: str
    columns: list[tuple[str, str]] = field(default_factory=list)
    #: virtual columns ``name AS expr`` (Flink computed columns — derived
    #: at read time, excluded from the physical sink schema)
    computed: list[tuple[str, str]] = field(default_factory=list)
    watermark_col: str | None = None
    watermark_delay: str | None = None  # e.g. "10 seconds"
    options: dict[str, str] = field(default_factory=dict)
    partitioned_by: list[str] = field(default_factory=list)
    #: CREATE TABLE ... LIKE base (FLIP-110): base table name + the merge
    #: directives from the parenthesized feature list
    like_base: str | None = None
    like_directives: list[str] = field(default_factory=list)


_CREATE_WITH_RE = re.compile(
    r"CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WM_RE = re.compile(
    r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*INTERVAL\s+'([^']+)'\s+(\w+)",
    re.IGNORECASE,
)


_LIKE_RE = re.compile(
    r"\s+LIKE\s+(\w+)\s*(?:\(([^)]*)\))?\s*$", re.IGNORECASE
)
_CREATE_BARE_RE = re.compile(
    r"CREATE\s+TABLE\s+(\w+)\s*$", re.IGNORECASE
)
_CREATE_BARE_WITH_RE = re.compile(
    r"CREATE\s+TABLE\s+(\w+)\s+WITH\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL
)
_COMPUTED_RE = re.compile(r"^(\w+)\s+AS\s+(.+)$", re.IGNORECASE | re.DOTALL)


def parse_create_table(ddl: str) -> TableDDL:
    """Parse the Flink CREATE TABLE subset: column list, computed columns
    (``name AS expr``), WATERMARK FOR bounded-delay clause, WITH-options
    (connector config), and the FLIP-110 ``LIKE base (directives)``
    clause (reference grammar: flink-sql-parser parserImpls.ftl
    SqlTableLike)."""
    text = ddl.strip().rstrip(";")
    like_base, like_directives = None, []
    lm = _LIKE_RE.search(text)
    if lm:
        like_base = lm.group(1)
        like_directives = [
            d.strip().upper()
            for d in re.split(r",|\n", lm.group(2) or "")
            if d.strip()
        ]
        text = text[: lm.start()]
    # PARTITIONED BY (cols) sits between the column list and WITH — strip
    # it first so the greedy column-body regexes can't swallow it
    part_cols: list[str] = []
    pm = re.search(r"\)\s*PARTITIONED\s+BY\s*\(([^)]*)\)", text, re.IGNORECASE)
    if pm:
        part_cols = [c.strip() for c in pm.group(1).split(",") if c.strip()]
        text = text[: pm.start()] + ")" + text[pm.end() :]
    m = (
        _CREATE_WITH_RE.search(text)
        or _CREATE_RE.search(text)
        or (like_base and (_CREATE_BARE_WITH_RE.search(text) or _CREATE_BARE_RE.search(text)))
    )
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    t = TableDDL(
        name=m.group(1),
        partitioned_by=part_cols,
        like_base=like_base,
        like_directives=like_directives,
    )
    body = m.group(2) if m.re in (_CREATE_WITH_RE, _CREATE_RE) else ""
    wm = _WM_RE.search(body)
    if wm:
        t.watermark_col = wm.group(1)
        t.watermark_delay = _interval_to_str(wm.group(2), wm.group(3))
        body = _WM_RE.sub("", body)
    for raw in re.split(r",(?![^(<]*[)>])", body):
        raw = raw.strip().rstrip(",")
        if not raw:
            continue
        if raw.upper().startswith(("PRIMARY", "WATERMARK")):
            continue
        cm = _COMPUTED_RE.match(raw)
        # "c AS expr" is a computed column — but don't mistake a type
        # that merely starts with A (none do); require the 2nd token to
        # be the literal AS
        if cm and raw.split(None, 2)[1].upper() == "AS":
            t.computed.append((cm.group(1), cm.group(2).strip()))
            continue
        parts = raw.split(None, 1)
        if len(parts) == 2:
            t.columns.append((parts[0], parts[1].strip()))
    opts_group = None
    if m.re is _CREATE_WITH_RE:
        opts_group = m.group(3)
    elif m.re is _CREATE_BARE_WITH_RE:
        opts_group = m.group(2)
    if opts_group is not None:
        for kv in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", opts_group):
            t.options[kv.group(1)] = kv.group(2)
    return t


def merge_like(t: TableDDL, base: TableDDL) -> TableDDL:
    """FLIP-110 schema/options merge: the new table inherits the base's
    columns, computed columns, watermark, partitioning, and options,
    modified by the directives (SqlTableLikeOption in the reference
    parser). Supported: INCLUDING ALL (default), EXCLUDING OPTIONS,
    OVERWRITING OPTIONS, EXCLUDING WATERMARKS, EXCLUDING PARTITIONS,
    INCLUDING/OVERWRITING GENERATED (computed columns)."""
    d = set(t.like_directives)
    out = TableDDL(name=t.name)
    out.columns = list(base.columns) + [c for c in t.columns if c[0] not in dict(base.columns)]
    if "EXCLUDING GENERATED" in d:
        out.computed = list(t.computed)
    else:
        names = {c[0] for c in t.computed}
        out.computed = [c for c in base.computed if c[0] not in names] + list(t.computed)
    if "EXCLUDING WATERMARKS" in d:
        out.watermark_col, out.watermark_delay = t.watermark_col, t.watermark_delay
    else:
        out.watermark_col = t.watermark_col or base.watermark_col
        out.watermark_delay = t.watermark_delay or base.watermark_delay
    if "EXCLUDING PARTITIONS" in d:
        out.partitioned_by = list(t.partitioned_by)
    else:
        out.partitioned_by = list(t.partitioned_by or base.partitioned_by)
    if "EXCLUDING OPTIONS" in d:
        out.options = dict(t.options)
    else:
        # INCLUDING OPTIONS (the INCLUDING ALL default): a duplicate key
        # is an error in the reference; OVERWRITING OPTIONS lets the new
        # table's value win
        dup = set(base.options) & set(t.options)
        if dup and "OVERWRITING OPTIONS" not in d:
            raise ValueError(
                f"LIKE: duplicate options {sorted(dup)} — use OVERWRITING OPTIONS"
            )
        out.options = {**base.options, **t.options}
    return out


def apply_ddl(spark, ddl: str, df=None):
    """Execute a Flink CREATE TABLE against the session: the source is the
    connector in WITH (filesystem path+format supported natively;
    kafka/upsert-kafka resolve to the file-backed topic double when a
    'path' option names the topic dir; else caller passes ``df``); the
    WATERMARK clause becomes ``withWatermark``; ``name AS expr`` computed
    columns become read-time ``withColumn`` projections (dialect-translated)."""
    t = parse_create_table(ddl)
    return apply_table_ddl(spark, t, df=df)


def apply_table_ddl(spark, t: TableDDL, df=None):
    """apply_ddl over an already-parsed (possibly LIKE-merged) TableDDL."""
    if df is None:
        conn = t.options.get("connector", "filesystem")
        if conn in ("kafka", "upsert-kafka") and "path" in t.options:
            from flink_1_12_0_spark.streaming.kafka_shim import (
                json_table_source,
                startup_filter,
                topic_read_batch,
                upsert_topic_view,
            )

            if t.options.get("format", "json") == "raw" and len(t.columns) != 1:
                # raw format (RawFormatFactory.java:55): single-column
                # byte/value payload — only valid on a record transport
                raise ValueError("raw format requires exactly one physical column")
            rec = startup_filter(
                topic_read_batch(spark, t.options["path"]), t.options
            )
            if t.options.get("format", "json") == "raw":
                from flink_1_12_0_spark.streaming.kafka_shim import raw_table_source

                df = raw_table_source(
                    rec, t.columns[0][0], t.columns[0][1],
                    keep_meta=True, options=t.options,
                )
            else:
                value_schema = ", ".join(f"{c} {ty}" for c, ty in t.columns)
                df = (
                    upsert_topic_view(rec, value_schema)
                    if conn == "upsert-kafka"
                    else json_table_source(rec, value_schema, keep_meta=True)
                )
        elif conn == "datagen":
            from flink_1_12_0_spark.streaming.core import datagen_table

            df = datagen_table(spark, t.columns, t.options)
        elif conn != "filesystem":
            raise NotImplementedError(f"connector '{conn}' needs an explicit df")
        else:
            import os

            path = t.options["path"]
            if os.path.exists(path) and (
                not os.path.isdir(path) or os.listdir(path)
            ):
                df = spark.read.format(t.options.get("format", "parquet")).load(path)
            else:
                # sink-style table: nothing written yet — register an empty
                # view with the DECLARED schema (the filesystem sink creates
                # the directory on first INSERT)
                schema = ", ".join(f"{c} {ty}" for c, ty in t.columns)
                df = spark.createDataFrame([], schema)
    if t.computed:
        from pyspark.sql import functions as F

        for cname, cexpr in t.computed:
            df = df.withColumn(cname, F.expr(translate(cexpr)))
    if t.watermark_col:
        df = df.withWatermark(t.watermark_col, t.watermark_delay)
    df.createOrReplaceTempView(t.name)
    return df
