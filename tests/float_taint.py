"""Static order-dependence analysis over oracle SQL.

The driver's correctness gate rounds float outputs to 2 decimals before
hashing.  A float produced by an order-dependent aggregation (``sum`` /
``avg`` / ``stddev`` over doubles) differs between Spark and DuckDB — and
between two Spark runs with different partial-agg schedules — by a few
ULPs times the term count.  When such a value lands near a 2dp
half-boundary the rounded rendering flips and the gate goes red even
though both engines are "right" (this killed tpch_q7/q9 in round 4 and
tpcds_frequent_items_spenders in round 5; the round-5 driver flip happened
at a value our boundary-DISTANCE heuristic considered safe, so distance
checking is not a defense — only determinism is).

This module parses each oracle with DuckDB's ``json_serialize_sql`` and
taints every alias whose definition contains an order-dependent aggregate
over a non-integer argument, propagating taint through CTE / subquery
alias references.  A float output column whose name is tainted must be
rewritten in fixed-point (per-row ``CAST(round(x * 10^k) AS BIGINT)``,
then an integer SUM — exact and order-free) or hand-vetted with a reason.
"""

from __future__ import annotations

import json
from typing import Any

# Aggregates whose float result depends on accumulation order.  min/max
# are order-free; count/rank family are integers.  avg over an INTEGER
# argument is deterministic (exact integer sum, one division) — over a
# float argument it inherits the float sum's order dependence.
ORDER_DEP_AGGS = {
    "sum", "avg", "mean", "product",
    "stddev", "stddev_samp", "stddev_pop",
    "var_samp", "var_pop", "variance",
    "covar_pop", "covar_samp", "corr",
    "regr_slope", "regr_intercept", "regr_r2",
}

# stddev/var family is order-dependent even over integer input (the
# running-moments update is float); sum/avg/product over exact integers
# are order-free.
INT_SAFE_AGGS = {"sum", "avg", "mean", "product"}

INTEGER_TYPE_IDS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
    "INT", "BOOLEAN",
}

INT_RESULT_FUNCS = {
    "count", "count_star", "row_number", "rank", "dense_rank", "ntile",
    "bit_and", "bit_or", "bit_xor", "length", "strlen", "instr",
    "len", "array_length", "list_count", "cardinality",
    "datediff", "date_diff", "datepart", "date_part", "year", "month",
    "day", "hour", "minute", "second", "quarter", "week", "dayofweek",
    "floor", "ceil", "ceiling", "sign",
}

# Base fixture columns that are integers (so ``sum(col)`` over them is
# exact).  Everything else — prices, balances, discounts, event values,
# embeddings — is float and therefore taints.  l_quantity is a DOUBLE in
# the fixture but integer-VALUED (TPC-H spec: 1..50), asserted by
# tests/test_registry_oracle.py::test_fixture_fixed_point_assumptions —
# float sums of integers below 2**53 are exact and order-free.
_INT_BASE_COLS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "p_size", "o_orderkey",
    "o_custkey", "o_shippriority", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "event_id", "user_id", "doc_id", "emb_id",
}


def _iter_nodes(obj: Any):
    """Yield every dict node in the serialized AST."""
    stack = [obj]
    while stack:
        cur = stack.pop()
        if isinstance(cur, dict):
            yield cur
            stack.extend(cur.values())
        elif isinstance(cur, list):
            stack.extend(cur)


def _is_int_safe(node: Any, int_aliases: set[str]) -> bool:
    """True if the expression subtree provably produces exact integers."""
    if not isinstance(node, dict):
        return False
    cls = node.get("class")
    if cls == "CAST":
        tid = (((node.get("cast_type") or {}).get("id")) or "").upper()
        return tid in INTEGER_TYPE_IDS
    if cls == "CONSTANT":
        tid = ((((node.get("value") or {}).get("type") or {}).get("id")) or "").upper()
        return tid in INTEGER_TYPE_IDS
    if cls == "COLUMN_REF":
        names = node.get("column_names") or []
        leaf = names[-1].lower() if names else ""
        return leaf in _INT_BASE_COLS or leaf in int_aliases
    if cls == "CASE":
        checks = node.get("case_checks") or []
        results = [c.get("then_expr") for c in checks]
        results.append(node.get("else_expr"))
        return all(_is_int_safe(r, int_aliases) for r in results if r is not None)
    if cls in ("FUNCTION", "WINDOW"):
        fname = (node.get("function_name") or "").lower()
        if fname in INT_RESULT_FUNCS:
            return True
        # "//" is integer (floor) division: over exact-integer children it
        # yields exact integers — the fixed-point discipline's own
        # operator (classifier training exposed the gap: every e6 DIV
        # stage read as tainted without it)
        if fname in ("+", "-", "*", "abs", "greatest", "least", "coalesce",
                     "if", "ifnull", "min", "max", "mod", "%", "//"):
            return all(_is_int_safe(c, int_aliases)
                       for c in (node.get("children") or []))
        if fname in INT_SAFE_AGGS:
            return all(_is_int_safe(c, int_aliases)
                       for c in (node.get("children") or []))
        return False
    if cls == "OPERATOR" and node.get("type") == "OPERATOR_COALESCE":
        return all(_is_int_safe(c, int_aliases)
                   for c in (node.get("children") or []))
    if cls == "SUBQUERY" and node.get("subquery_type") == "SCALAR":
        # a scalar subquery is as safe as its single select-list
        # expression (classifier training's (SELECT b FROM b_i) exposed
        # the gap: every bias reference read as tainted without this)
        sel = (((node.get("subquery") or {}).get("node")) or {}).get(
            "select_list") or []
        return len(sel) == 1 and _is_int_safe(sel[0], int_aliases)
    return False


def _contains_unsafe_agg(node: Any, int_aliases: set[str],
                         tainted: set[str]) -> bool:
    """True if subtree holds an order-dependent agg over non-integer input
    or references an already-tainted alias."""
    for n in _iter_nodes(node):
        cls = n.get("class")
        if cls == "COLUMN_REF":
            names = n.get("column_names") or []
            if names and names[-1].lower() in tainted:
                return True
        if cls in ("FUNCTION", "WINDOW"):
            fname = (n.get("function_name") or "").lower()
            if fname in ORDER_DEP_AGGS:
                kids = n.get("children") or []
                if fname not in INT_SAFE_AGGS:
                    return True  # stddev/var/corr: order-dep even over ints
                if not all(_is_int_safe(c, int_aliases) for c in kids):
                    return True
    return False


def _alias_defs(ast: Any) -> dict[str, list[Any]]:
    """alias name -> every select-list expression defining it, anywhere
    in the statement (CTEs, subqueries, the outer select)."""
    defs: dict[str, list[Any]] = {}
    for n in _iter_nodes(ast):
        if n.get("type") == "SELECT_NODE":
            for item in n.get("select_list") or []:
                alias = (item.get("alias") or "").lower()
                if not alias and item.get("class") == "COLUMN_REF":
                    names = item.get("column_names") or []
                    alias = names[-1].lower() if names else ""
                if alias:
                    defs.setdefault(alias, []).append(item)
    return defs


def _parse(duck, sql: str) -> Any | None:
    try:
        # json_serialize_sql requires a VARCHAR literal (a parameter
        # marker is rejected), so inline with quote doubling.
        lit = sql.replace("'", "''")
        raw = duck.execute(
            f"SELECT json_serialize_sql('{lit}')"
        ).fetchone()[0]
        ast = json.loads(raw)
    except Exception:
        return None
    if ast.get("error"):
        return None
    return ast


def _taint_fixpoint(ast: Any) -> tuple[set[str], set[str], dict]:
    """(int_aliases, tainted, alias_defs) for a parsed statement."""
    defs = _alias_defs(ast)
    # fixpoint: integer-safe aliases first (they can exonerate refs).
    # A CTE pass-through records an identity def (SELECT rev_c FROM m ->
    # rev_c: COLUMN_REF(rev_c)); evaluate each alias with itself assumed
    # safe so identity defs are neutral and the real definition decides.
    int_aliases: set[str] = set()
    changed = True
    while changed:
        changed = False
        for alias, exprs in defs.items():
            if alias not in int_aliases and all(
                _is_int_safe(e, int_aliases | {alias}) for e in exprs
            ):
                int_aliases.add(alias)
                changed = True
    # … then taint propagation through alias references.
    tainted: set[str] = set()
    changed = True
    while changed:
        changed = False
        for alias, exprs in defs.items():
            if alias in tainted or alias in int_aliases:
                continue
            if any(_contains_unsafe_agg(e, int_aliases, tainted)
                   for e in exprs):
                tainted.add(alias)
                changed = True
    return int_aliases, tainted, defs


def analyze(duck, sql: str) -> dict | None:
    """One-parse bundle for the guard test: tainted aliases, known output
    names, and base tables actually referenced by the statement.

    ``tables`` comes from BASE_TABLE nodes in the serialized AST, not from
    substring-matching table names against the SQL text (round-6 advice:
    a column like ``l_partkey`` substring-matches 'part', and a table
    reached only through a view alias would be missed entirely).
    ``known_names`` is every select-list alias / column-ref leaf anywhere
    in the statement — a float output column NOT in this set was emitted
    without an explicit alias, so taint propagation cannot see it and the
    caller must fail it rather than silently skip the bound check.
    Returns None when DuckDB cannot serialize the statement.
    """
    ast = _parse(duck, sql)
    if ast is None:
        return None
    int_aliases, tainted, defs = _taint_fixpoint(ast)
    tables = {
        (n.get("table_name") or "").lower()
        for n in _iter_nodes(ast)
        if n.get("type") == "BASE_TABLE"
    } - {""}
    return {
        "tainted": tainted,
        "int_aliases": int_aliases,
        "known_names": set(defs),
        "tables": tables,
        # True when ANY node holds an order-dep agg over non-integer input
        # — catches statements where the offending expression never got an
        # alias (SELECT sum(price) FROM t) so ``tainted`` stays empty.
        "any_unsafe": _contains_unsafe_agg(ast, int_aliases, tainted),
    }


def tainted_aliases(duck, sql: str) -> set[str] | None:
    """All alias names whose value is an order-dependent float.

    Returns None when DuckDB cannot serialize the statement (caller must
    hand-vet the whole query).
    """
    ast = _parse(duck, sql)
    if ast is None:
        return None
    return _taint_fixpoint(ast)[1]


def tainted_predicates(duck, sql: str) -> list[str] | None:
    """Comparison predicates whose outcome can flip with summation order.

    A WHERE / HAVING / JOIN comparison with an order-dependent float on
    either side makes ROW MEMBERSHIP order-dependent — worse than a
    flipped rendering, because the gate's row-count check trips too.
    Returns short descriptions ('COMPARE_GREATERTHAN@loc'), or None when
    the statement cannot be serialized.
    """
    ast = _parse(duck, sql)
    if ast is None:
        return None
    int_aliases, tainted, _ = _taint_fixpoint(ast)

    def unsafe(side: Any) -> bool:
        return not _is_int_safe(side, int_aliases) and _contains_unsafe_agg(
            side, int_aliases, tainted
        )

    out = []
    for n in _iter_nodes(ast):
        cls = n.get("class")
        if cls == "COMPARISON":
            sides = [n.get("left"), n.get("right")]
        elif cls == "BETWEEN":
            sides = [n.get("input"), n.get("lower"), n.get("upper")]
        else:
            continue
        if any(unsafe(s) for s in sides if s is not None):
            out.append(f"{n.get('type')}@{n.get('query_location')}")
    return out
