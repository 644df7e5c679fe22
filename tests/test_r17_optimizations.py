"""Focused pins for the round-17 optimization internals.

Each r17 change claims exact result-equality with the form it replaced;
these tests pin those claims directly (beyond the oracle gate, which
would also catch them but less diagnostically):

- ``run_to_stage`` == ``run_to_memory`` emitted-row semantics, append
  AND update mode, including the zero-batch edge (empty stage dir);
- the conditional-aggregation ``_route_artifact_rows`` == the tf-table
  form it replaced, bit-exact on idf/avgdl doubles;
- ``streaming_first_seen_flag`` flags are shard-count-invariant (the
  parallelism-derived default changes only the sharding, never a flag).
"""

from __future__ import annotations

import tempfile

import pytest

from flink_1_12_0_spark.streaming.core import (local_table, run_to_memory,
                                               run_to_stage)
from tests.conftest import SF_DIR


def _file_stream(spark, rows, schema):
    d = tempfile.mkdtemp(prefix="sg_t17_src_")
    local_table(spark, rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(d)
    return spark.readStream.schema(schema).parquet(d)


def test_run_to_stage_matches_memory_append(spark):
    rows = [(i, f"u{i % 3}") for i in range(50)]
    a = run_to_memory(
        _file_stream(spark, rows, "id long, u string"), "append").collect()
    b = run_to_stage(
        _file_stream(spark, rows, "id long, u string"), "append").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(b) == 50


def test_run_to_stage_matches_memory_update_agg(spark):
    """Update mode: both drains append each batch's emitted (update)
    rows — the stateful agg's per-batch emissions must round-trip the
    parquet stage exactly, including the bigint dtype."""
    rows = [(i, f"u{i % 3}") for i in range(60)]
    agg_a = (_file_stream(spark, rows, "id long, u string")
             .groupBy("u").count())
    agg_b = (_file_stream(spark, rows, "id long, u string")
             .groupBy("u").count())
    a = run_to_memory(agg_a, "update").collect()
    b = run_to_stage(agg_b, "update").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert dict(run_to_stage(
        _file_stream(spark, rows, "id long, u string").groupBy("u").count(),
        "update").dtypes)["count"] == "bigint"


def test_run_to_stage_zero_batch_returns_empty_with_schema(spark):
    """A stream whose batches emit nothing leaves the stage dir empty —
    the read-back must not fall over schema inference."""
    sdf = _file_stream(spark, [(1,)], "id long").where("id > 99")
    out = run_to_stage(sdf, "append")
    assert out.collect() == []
    assert dict(out.dtypes) == {"id": "bigint"}


def test_route_artifact_conditional_agg_equals_tf_form(spark):
    """The r17 one-scan artifact build must reproduce the tf-table form
    bit-exactly: same (query_id, term) set, same idf/avgdl doubles
    (same SQL arithmetic over identical df/n/sum(dl) inputs)."""
    from flink_1_12_0_spark.queries.llm_corpus import (SPARK_WORDS,
                                                       _bm25_tf_sql,
                                                       _route_artifact_rows,
                                                       _route_pairs)
    from flink_1_12_0_spark.tables import load_tables

    load_tables(spark, SF_DIR)
    got = _route_artifact_rows(spark, _route_pairs(64))
    tf = spark.sql(_bm25_tf_sql(SPARK_WORDS, "explode(w)", "size(w)"))
    tf.createOrReplaceTempView("t17_art_tf")
    vals = ",\n".join("(%d, '%s')" % p for p in _route_pairs(64))
    want = spark.sql(f"""
        WITH qs AS (SELECT * FROM (VALUES {vals}) AS q(query_id, qtext)),
        qt AS (SELECT query_id, explode(split(qtext, ' ')) AS term FROM qs),
        stats AS (SELECT count(*) AS n,
                         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                  FROM (SELECT DISTINCT doc_id, dl FROM t17_art_tf)),
        dft AS (SELECT word, count(*) AS df FROM t17_art_tf GROUP BY word)
        SELECT qt.query_id, qt.term,
               ln((stats.n - dft.df + 0.5e0) / (dft.df + 0.5e0) + 1e0)
                   AS idf,
               stats.avgdl AS avgdl
        FROM qt JOIN dft ON dft.word = qt.term CROSS JOIN stats
    """).collect()
    key = lambda r: (r["query_id"], r["term"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    wm = {key(r): (r["idf"], r["avgdl"]) for r in want}
    for r in got:
        assert (r["idf"], r["avgdl"]) == wm[key(r)], key(r)


@pytest.mark.parametrize("shards_a, shards_b", [(1024, None), (7, 64)])
def test_first_seen_flag_shard_count_invariant(spark, shards_a, shards_b):
    """All first-seen logic is bucket-local; sharding only partitions
    buckets, so any shard count (including the r17 parallelism-derived
    default, shards=None) must emit identical flags."""
    from flink_1_12_0_spark.streaming.stateful import \
        streaming_first_seen_flag

    rows = [(i, f"b{i % 17}") for i in range(200)]

    def run(shards):
        sdf = _file_stream(spark, rows, "doc_id long, bucket string")
        return sorted(map(tuple, run_to_memory(
            streaming_first_seen_flag(sdf, ["bucket"], "doc_id",
                                      shards=shards),
            "update").collect()))

    assert run(shards_a) == run(shards_b)
