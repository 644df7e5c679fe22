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
