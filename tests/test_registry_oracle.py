"""Master correctness suite: every registered query with an oracle is run on
Spark and DuckDB at sf0.001 and compared — the local mirror of the driver's
t2 gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from flink_1_12_0_spark import registry
from tests.conftest import SF_DIR
from tests.utils import assert_matches_oracle


def _cases():
    registry.load_all()
    return sorted(registry.QUERIES)


@pytest.mark.parametrize("name", _cases())
def test_query_matches_oracle(name, spark, duck):
    fn = registry.QUERIES[name]
    df = fn(spark, SF_DIR)
    assert df is not None
    if name in registry.ORACLES:
        assert_matches_oracle(df, duck, registry.ORACLES[name], name)
    else:
        # rows-only check (non-SQL-expressible operators)
        assert df.count() >= 0


def test_every_oracle_nonempty(duck):
    """Vacuous-green guard: an engine/oracle pair that agree on an EMPTY
    result verify nothing about the operator's logic (round-3 verdict
    found stream_coprocess_control green with 0-vs-0 rows — plus nine
    more: six TPC-H queries whose spec constants matched nothing in the
    fixture, join_left_anti, and the two whole-payload dedups).  Every
    oracle must return at least one row at sf0.001 so no future fixture
    drifts back to a trivially-true match.  DuckDB-only: cheap enough to
    sweep all oracles in one test."""
    registry.load_all()
    empty = []
    for name, sql in sorted(registry.ORACLES.items()):
        n = duck.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        if n == 0:
            empty.append(name)
    assert not empty, f"oracles with vacuously-empty results at sf0.001: {empty}"
