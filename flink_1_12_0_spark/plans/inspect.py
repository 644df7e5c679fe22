"""Plan-shape inspection: the engine's analog of the reference's golden
plan tests (TableTestBase.verifyPlan diffing optimized plans against 183
XML files, SURVEY §5.1).

Instead of golden files we assert structural invariants on the executed
plan — the properties that matter at 100 TB:

- dimension joins broadcast (BroadcastHashJoin, no stray SortMergeJoin)
- predicate pushdown reaches the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema)
- partition pruning on partitioned layouts (PartitionFilters)
- no Python (BatchEvalPython/ArrowEvalPython) inside relational-only plans
- whole-stage codegen spans exist
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Physical plan as text, de-duplicated for AQE.

    Executed AQE plans print a Final and an Initial section; counting the
    whole string doubles every node.  The Initial section is the complete
    static plan (the Final section elides materialized stages and may
    collapse to EmptyRelation when a fragment yields no rows), so shape
    assertions run against it; plans without AQE sections pass through."""
    s = df._jdf.queryExecution().executedPlan().toString()
    if "+- == Initial Plan ==" in s:
        return s.split("+- == Initial Plan ==", 1)[1]
    return s


def count_op(df: DataFrame, op: str) -> int:
    return plan_string(df).count(op)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters: [...] section(s) of the scan nodes."""
    s = plan_string(df)
    return "; ".join(
        part.split("]", 1)[0] + "]" for part in s.split("PushedFilters: [")[1:]
    )


def read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (ReadSchema)."""
    s = plan_string(df)
    out = []
    for part in s.split("ReadSchema: struct<")[1:]:
        cols = part.split(">", 1)[0]
        out.extend(c.split(":")[0] for c in cols.split(",") if c)
    return out


def has_python_stage(df: DataFrame) -> bool:
    s = plan_string(df)
    return any(op in s for op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"))


def codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans: plan text marks fused operators
    with a ``*(n)`` prefix.  The markers are added when stages execute, so
    look at the raw (final-section-bearing) string; distinct ids dedupe."""
    import re

    s = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", s)))
