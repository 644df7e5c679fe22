"""Query registry: the single source for ``queries()`` / ``oracle_sql()``.

Every operator we implement registers a named query (Spark side) plus an
equivalent DuckDB oracle SQL string.  The driver's correctness gate runs
both at sf=0.01 and hash-compares (columns sorted by name, numerics rounded
to 2 decimals) — so Spark aliases and oracle aliases MUST agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: extra query names bench.py should time beyond its core TPC-H set —
#: the LLM-pipeline and custom-operator tiers (dedup, similarity, as-of
#: join, CEP), so the bench tracks the scale paths, not just TPC-H.
BENCH_EXTRA: list[str] = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "text_token_count",
    "join_asof_latest_view",
    "cep_errors_then_purchase",
    "flinksql_match_recognize",
    "sim_ann_ivf_kmeans",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle SQL.

    Queries with no oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from flink_1_12_0_spark.queries import (  # noqa: F401
        aggregates,
        cep,
        flinksql,
        functions_dialect,
        joins,
        llm_similarity,
        llm_text,
        multimodal,
        relational,
        setops,
        sources_cdc,
        streaming_batch,
        streaming_stateful,
        tableapi,
        temporal_joins,
        timewindows,
        tpcds_shape,
        tpch,
        windows,
    )
