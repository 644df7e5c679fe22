"""Registry-contract guards: the grading window the driver sees."""

from __future__ import annotations

from flink_1_12_0_spark import registry


def setup_module():
    registry.load_all()


def test_priority_names_all_registered():
    """A typo in QUERY_PRIORITY silently drops the query from the grading
    window (unregistered names are skipped by design for planning) — now
    that every planned query exists, the lists must agree exactly."""
    missing = [n for n in registry.QUERY_PRIORITY if n not in registry.QUERIES]
    assert not missing, f"QUERY_PRIORITY names not registered: {missing}"


#: already-green names ALLOWED in the round-5 window: queries whose text
#: was rewritten AFTER their green grade (round-4 de-trivialization) —
#: their existing green rows grade superseded text, so regrading them is
#: the point, not a wasted slot.  Must stay a subset of SUPERSEDED_GREENS.
INTENTIONAL_REGRADES = {"tpch_q9", "tpch_q21", "tpch_q7"}


def test_grading_window_is_never_graded_first():
    """The driver grades queries()[:50]; every one of those slots must go
    to a query never graded green before — except the explicitly
    intentional regrades."""
    ordered = list(registry.ordered_queries())
    window = ordered[:50]
    graded = (
        registry.GRADED_ROUNDS_1_2 | registry.GRADED_ROUND_3 | registry.GRADED_ROUND_4
    )
    regraded = [
        n for n in window if n in graded and n not in INTENTIONAL_REGRADES
    ]
    assert not regraded, f"grading window wastes slots on already-green: {regraded}"
    # and everything in the registry appears exactly once
    assert sorted(ordered) == sorted(registry.QUERIES)


def test_intentional_regrades_are_tracked_superseded():
    assert INTENTIONAL_REGRADES <= registry.SUPERSEDED_GREENS


def test_superseded_greens_sort_ahead_of_graded_tail():
    """A green row that grades rewritten text must not hide in the graded
    tail: superseded names not already in the window must come before any
    genuinely-graded query, so they head the NEXT round's window."""
    ordered = list(registry.ordered_queries())
    window = set(ordered[:50])
    pending = [n for n in registry.SUPERSEDED_GREENS if n not in window]
    tail = ordered[50:]
    assert tail[: len(pending)] == sorted(
        pending, key=tail.index
    ) and set(tail[: len(pending)]) == set(pending), (
        f"superseded greens not at the head of the post-window tail: {tail[:8]}"
    )


def test_every_query_has_oracle_or_is_documented():
    """Every queries() entry should carry a DuckDB oracle — rows-only
    checks are reserved for genuinely non-SQL-expressible operators, of
    which we currently have none."""
    no_oracle = [n for n in registry.QUERIES if n not in registry.ORACLES]
    assert not no_oracle, f"queries without oracle: {no_oracle}"
