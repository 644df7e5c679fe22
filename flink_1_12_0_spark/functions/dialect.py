"""Flink-SQL dialect functions re-expressed as Spark Column helpers.

Reference surface: 195 SQL operators in
flink-table-planner-blink .../functions/sql/FlinkSqlOperatorTable.java with
runtime impls in flink-table-runtime-blink .../runtime/functions/
SqlFunctionUtils.java:62 and SqlDateTimeUtils.java:66.

Nearly everything maps 1:1 onto ``pyspark.sql.functions`` (JVM-side,
codegen'd — the fast path). Only predicates with no Spark builtin
(IS_DECIMAL / IS_DIGIT / IS_ALPHA) fall back to regex `rlike`, still
JVM-side. Nothing here uses a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "split_index",
    "is_decimal",
    "is_digit",
    "is_alpha",
    "sum0",
    "listagg",
    "to_base64",
    "from_base64",
    "regexp",
    "chr_",
    "log2",
    "hash_code",
    "proctime",
    "to_time",
    "time_lit",
    "time_hour",
    "time_minute",
    "time_second",
    "time_format",
]


def split_index(s: Column | str, delim: str, idx: int) -> Column:
    """SPLIT_INDEX(s, delim, idx) — idx is 0-based, NULL when out of range.

    Flink runtime: SqlFunctionUtils.splitIndex. Spark: split + element_at
    (element_at is 1-based; out-of-range yields NULL with ANSI off, so
    guard with size()).
    """
    col = F.col(s) if isinstance(s, str) else s
    parts = F.split(col, F.lit(delim), -1)
    return F.when(F.size(parts) > idx, parts[idx])


_DECIMAL_RE = r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"


def is_decimal(s: Column | str) -> Column:
    """IS_DECIMAL(s) — can the string be parsed as a number."""
    col = F.col(s) if isinstance(s, str) else s
    return F.coalesce(col.rlike(_DECIMAL_RE), F.lit(False))


def is_digit(s: Column | str) -> Column:
    """IS_DIGIT(s) — every char a digit (empty/NULL -> false)."""
    col = F.col(s) if isinstance(s, str) else s
    return F.coalesce(col.rlike(r"^[0-9]+$"), F.lit(False))


def is_alpha(s: Column | str) -> Column:
    """IS_ALPHA(s) — every char a letter (empty/NULL -> false)."""
    col = F.col(s) if isinstance(s, str) else s
    return F.coalesce(col.rlike(r"^[A-Za-z]+$"), F.lit(False))


def sum0(col: Column | str) -> Column:
    """SUM0 — like SUM but 0 (not NULL) on empty/all-null input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.sum(c), F.lit(0))


def listagg(col: Column | str, sep: str = ",") -> Column:
    """LISTAGG — string concatenation of group values, sorted for
    determinism (Flink's order is input order, undefined after shuffles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_list(c)), sep)


def to_base64(col: Column | str) -> Column:
    return F.base64(F.col(col) if isinstance(col, str) else col)


def from_base64(col: Column | str) -> Column:
    return F.unbase64(F.col(col) if isinstance(col, str) else col)


def regexp(col: Column | str, pattern: str) -> Column:
    """REGEXP(s, pat) — partial-match predicate (Flink: find anywhere)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(pattern)


def chr_(col: Column | str) -> Column:
    return F.chr(F.col(col) if isinstance(col, str) else col)


def log2(col: Column | str) -> Column:
    return F.log2(F.col(col) if isinstance(col, str) else col)


def hash_code(col: Column | str) -> Column:
    """HASH_CODE(s) — Java String.hashCode. Spark's hash() is Murmur3, not
    the same function; we expose Spark's hash as the engine's HASH_CODE
    (documented divergence — stable within the engine)."""
    return F.hash(F.col(col) if isinstance(col, str) else col)


def proctime() -> Column:
    """PROCTIME() — processing-time attribute. Micro-batch semantics:
    constant per batch (Flink: per-record wall clock; documented)."""
    return F.current_timestamp()


# --- TIME(p) type shim (SURVEY §1.3) ----------------------------------------
# Flink's TIME(p) (LogicalTypeRoot.java:52, TIME_WITHOUT_TIME_ZONE) has no
# Spark equivalent; the shim represents a time-of-day as BIGINT
# milliseconds since midnight (the reference's own internal representation
# for TIME — millis-of-day int).  All helpers stay JVM-side.


def to_time(ts: Column | str) -> Column:
    """CAST(ts AS TIME) — millis-of-day of a timestamp (session TZ is UTC)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return (F.unix_millis(col) % F.lit(86400000)).cast("bigint")


def time_lit(s: str) -> Column:
    """TIME 'HH:mm:ss[.SSS]' literal → millis-of-day."""
    parts = s.split(":")
    h, m = int(parts[0]), int(parts[1])
    sec = float(parts[2]) if len(parts) > 2 else 0.0
    return F.lit(int(round(((h * 60 + m) * 60 + sec) * 1000)))


def time_hour(t: Column | str) -> Column:
    """HOUR(time) over the millis-of-day representation."""
    col = F.col(t) if isinstance(t, str) else t
    return (col / 3600000).cast("bigint")


def time_minute(t: Column | str) -> Column:
    col = F.col(t) if isinstance(t, str) else t
    return ((col % 3600000) / 60000).cast("bigint")


def time_second(t: Column | str) -> Column:
    col = F.col(t) if isinstance(t, str) else t
    return ((col % 60000) / 1000).cast("bigint")


def time_format(t: Column | str) -> Column:
    """TIME → 'HH:mm:ss' string (DATE_FORMAT on TIME in the dialect)."""
    col = F.col(t) if isinstance(t, str) else t
    return F.concat_ws(
        ":",
        F.lpad(time_hour(col).cast("string"), 2, "0"),
        F.lpad(time_minute(col).cast("string"), 2, "0"),
        F.lpad(time_second(col).cast("string"), 2, "0"),
    )


def similar_to(s: Column | str, pattern: str) -> Column:
    """SQL ``SIMILAR TO`` (FlinkSqlOperatorTable SIMILAR_TO; Calcite
    SqlSimilarOperator): SQL wildcards ``%``/``_`` within an (otherwise
    regex-like) pattern, anchored full-string match.  Spark has no SIMILAR
    TO, so the pattern is rewritten to an anchored Java regex for rlike."""
    col = F.col(s) if isinstance(s, str) else s
    regex = pattern.replace("%", ".*").replace("_", ".")
    return col.rlike(f"^(?:{regex})$")
