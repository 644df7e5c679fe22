"""Regression tests for round-1 advisor findings: MINUS multiset semantics,
lookup-join cache eviction, MATCH_RECOGNIZE keyword-in-identifier parsing,
k-means seeding on non-contiguous ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.api.table import TableEnvironment
from flink_1_12_0_spark.operators.joins import lookup_join
from flink_1_12_0_spark.operators.kmeans import kmeans_cosine_fit
from flink_1_12_0_spark.plans.match_recognize_sql import parse_match_recognize


def test_minus_is_except_distinct(spark):
    """Flink Table.minus = EXCEPT DISTINCT: {x,x,x} minus {x} = {} — a row
    present in the right side disappears entirely."""
    env = TableEnvironment.create(spark)
    left = env.from_dataframe(spark.createDataFrame([(1,), (1,), (1,), (2,)], "x int"))
    right = env.from_dataframe(spark.createDataFrame([(1,)], "x int"))
    assert [r["x"] for r in left.minus(right).df.collect()] == [2]
    # minus_all stays multiset: {1,1,1,2} minusAll {1} = {1,1,2}
    vals = sorted(r["x"] for r in left.minus_all(right).df.collect())
    assert vals == [1, 1, 2]


def test_lookup_join_batch_wider_than_cache(spark):
    """A single Arrow batch with more distinct keys than cache_size must
    still enrich every row (keys fetched for the current batch may not be
    evicted before use)."""
    df = spark.range(0, 50).select(F.col("id").cast("int").alias("k")).coalesce(1)
    fetched_log = []

    def fetch(keys):
        fetched_log.append(list(keys))
        return {k: {"name": f"v{k}"} for k in keys}

    out = lookup_join(df, "k", fetch, [("name", "string")], cache_size=5)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["r_name"] == f"v{r['k']}" for r in rows), "NULL enrichment leaked"


def test_match_recognize_keyword_inside_identifier():
    """Aliases/identifiers embedding section keywords (undefined_x contains
    DEFINE, pattern_id contains PATTERN) must not corrupt section splits."""
    spec = parse_match_recognize(
        """
        SELECT * FROM t MATCH_RECOGNIZE (
            PARTITION BY pattern_id
            ORDER BY ts
            MEASURES FIRST(A.v) AS undefined_x, LAST(B.v) AS redefined_y
            PATTERN (A B)
            DEFINE A AS v > 0, B AS v > 1
        )
        """
    )
    assert spec.partition_by == ["pattern_id"]
    assert [m[0] for m in spec.measures] == ["undefined_x", "redefined_y"]
    assert [p[0] for p in spec.pattern] == ["A", "B"]
    assert set(spec.define) == {"A", "B"}


def test_kmeans_seeds_on_offset_ids(spark):
    """Seeding must pick the k lowest ids even when ids don't start at 0 —
    vec_id < k would select zero seeds here."""
    rows = [(100 + 10 * i, [float(i + 1), float((i * 7) % 5 + 1)]) for i in range(12)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_cosine_fit(vecs, k=3, iters=1)
    got = cents.collect()
    assert sorted(r["cent_id"] for r in got) == [0, 1, 2]
    assert all(len(r["cvec"]) == 2 for r in got)
