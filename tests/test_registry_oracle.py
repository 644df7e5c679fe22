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


#: (query, column) float outputs that sit exactly on 2dp half-boundaries
#: at sf0.001 but are DETERMINISTIC (per-row expressions, integer ratios,
#: in-row folds, or sums snapped by an intermediate round() far coarser
#: than the float error) — audited by hand; see the round-4 commit
#: "Audit all oracles for 2dp half-boundary floats".
_BOUNDARY_SAFE: frozenset = frozenset({
    ("calc_project_filter", "net_price"), ("calc_project_filter", "tax_amt"),
    ("fn_math", "sq"), ("mm_feature_pipeline", "f_sum"),
    ("text_ngram_novelty", "dup_gram_frac"),
    ("text_quality_gopher", "avg_word_len"),
    ("text_quality_gopher", "dup_word_frac"),
    ("text_quality_gopher", "top_2gram_frac"),
    ("text_stats", "avg_word_len"), ("text_stats", "stopword_ratio"),
    ("text_stats", "ttr"), ("text_stats", "quality"),
    ("text_token_count", "chars_per_token"),
    ("tpcds_dual_rank_returns", "return_rate"),
    ("tpcds_hour_ratio", "am_pm_ratio"),
    ("tpcds_repeat_buyers", "retention_ratio"),
    ("window_hop", "avg_value"),
})


def test_no_unvetted_half_boundary_floats(duck):
    """Order-dependence guard: a float output sitting exactly on a 2dp
    half-boundary flips under the gate's rounding when the value comes
    from an order-dependent float aggregation (Spark's partial-agg order
    varies run to run — tpch_q7/q9 flipped this way).  Any new boundary
    cell must be either made deterministic (fixed-point integers, an
    intermediate round() coarser than the float noise) or hand-vetted
    into _BOUNDARY_SAFE."""
    import numpy as np

    registry.load_all()
    unvetted = []
    for name, sql in sorted(registry.ORACLES.items()):
        df = duck.execute(sql).df()
        for col in df.columns:
            if df[col].dtype.kind != "f" or (name, col) in _BOUNDARY_SAFE:
                continue
            v = df[col].dropna().to_numpy()
            if len(v) and (np.abs((v * 100) % 1 - 0.5) < 1e-9).any():
                unvetted.append((name, col))
    assert not unvetted, (
        f"float outputs on 2dp half-boundaries, not vetted: {unvetted} — "
        "make them deterministic or add to _BOUNDARY_SAFE with a reason"
    )


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
