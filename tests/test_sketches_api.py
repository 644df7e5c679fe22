"""The operators/sketches.py library surface: each sketch built through
the API must agree with the graded-query math (same hash, same geometry)
and uphold its merge law on real fixture data.

The graded queries prove the SQL templates against DuckDB oracles; these
tests prove the DataFrame API is the same math — build-vs-query equality
where a graded twin exists, merge-losslessness through the API functions,
and the defining guarantee of each sketch (no Bloom false negatives,
CMS est >= truth, HLL estimate sane, quantile rank error bounded).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_1_12_0_spark.operators import sketches as sk
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where("length(text) > 0")
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def words(docs):
    return docs.selectExpr("doc_id", "explode(split(text, ' ')) AS word")


# ---- Bloom --------------------------------------------------------------------


def test_bloom_build_probe_no_false_negatives(spark, docs, words):
    bench_words = words.where("doc_id % 20 = 0").select("word").distinct()
    corpus_words = (
        words.where("doc_id % 20 <> 0").select("word").distinct()
    )
    bloom = sk.bloom_build(bench_words, "word")
    assert bloom.count() <= 1024
    probed = sk.bloom_probe(corpus_words, "word", bloom)
    truly = {
        r.word for r in corpus_words.join(bench_words, "word").collect()
    }
    flagged = {r.word for r in probed.where("maybe_member = 1").collect()}
    assert truly <= flagged, "Bloom false negatives through the API"
    # false positives bounded at this geometry
    n = corpus_words.count()
    assert len(flagged - truly) <= max(5, n // 20)


def test_bloom_merge_equals_whole(spark, words):
    keys = words.select("word").distinct()
    whole = sk.bloom_build(keys, "word")
    parts = [
        sk.bloom_build(keys.where(f"pmod(hash(word), 3) = {p}"), "word")
        for p in range(3)
    ]
    merged = sk.bloom_merge(*parts)
    diff = (
        whole.alias("a").join(merged.alias("b"), "word_idx", "full_outer")
        .where("a.mask IS NULL OR b.mask IS NULL OR a.mask <> b.mask")
    )
    assert diff.count() == 0


def test_bloom_as_map_rejects_empty(spark):
    empty = spark.range(0).selectExpr(
        "CAST(id AS INT) AS word_idx", "id AS mask"
    )
    with pytest.raises(ValueError):
        sk.bloom_as_map(empty)


# ---- count-min ----------------------------------------------------------------


def test_cms_build_matches_graded_query(spark, docs, words):
    """API build over the same tokens == the graded query's counter CTE
    (same hash seeds via _cms_hashes, same w)."""
    api = sk.cms_build(words.select("word"), "word").collect()
    from flink_1_12_0_spark.queries.llm_corpus import _CMS_SPARK_PP, _cms_hashes
    from flink_1_12_0_spark.queries.llm_text import SPARK_BH

    hs = _cms_hashes(SPARK_BH)
    ref = (
        words.selectExpr(
            "word", _CMS_SPARK_PP.format(h0=hs[0], h1=hs[1], h2=hs[2])
        )
        .groupBy("row_idx", "col_idx")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    assert sorted(map(tuple, api)) == sorted(map(tuple, ref))


def test_cms_estimate_never_undercounts(spark, words):
    cms = sk.cms_build(words.select("word"), "word")
    truth = words.groupBy("word").agg(F.count("*").alias("true_cnt"))
    top = truth.orderBy(F.desc("true_cnt"), "word").limit(20)
    est = sk.cms_estimate(top, "word", cms)
    j = top.join(est, "word").collect()
    assert len(j) == 20
    assert all(r.cms_est >= r.true_cnt for r in j)


def test_cms_merge_is_exact(spark, words):
    whole = sk.cms_build(words.select("word"), "word")
    parts = [
        sk.cms_build(words.where(f"doc_id % 3 = {p}").select("word"), "word")
        for p in range(3)
    ]
    merged = sk.cms_merge(*parts)
    diff = (
        whole.alias("a").join(merged.alias("b"), ["row_idx", "col_idx"],
                              "full_outer")
        .where("a.c IS NULL OR b.c IS NULL OR a.c <> b.c")
    )
    assert diff.count() == 0


# ---- HyperLogLog --------------------------------------------------------------


def test_hll_build_estimate_matches_graded_query(spark, docs):
    """API registers + estimate over the graded query's key stream must
    reproduce the graded query's hll_est exactly (same hash, same shared
    estimate tail)."""
    from flink_1_12_0_spark.queries.llm_corpus import _SPARK_HLL_G4, SPARK_WORDS
    from flink_1_12_0_spark import registry

    grams = (
        docs.selectExpr("source", f"{SPARK_WORDS} AS w")
        .selectExpr("source", f"explode({_SPARK_HLL_G4}) AS gram")
    )
    regs = sk.hll_build(grams, "gram", "source")
    est = {r.source: r.hll_est for r in sk.hll_estimate(regs).collect()}
    graded = {
        r.source: r.hll_est
        for r in registry.QUERIES["sketch_hll_cardinality"](
            spark, SF_DIR
        ).collect()
    }
    assert est == graded


def test_hll_merge_lossless(spark, docs):
    from flink_1_12_0_spark.queries.llm_corpus import _SPARK_HLL_G4, SPARK_WORDS

    grams = (
        docs.selectExpr("doc_id", "source", f"{SPARK_WORDS} AS w")
        .selectExpr("doc_id", "source", f"explode({_SPARK_HLL_G4}) AS gram")
    )
    whole = sk.hll_build(grams.select("source", "gram"), "gram", "source")
    parts = [
        sk.hll_build(
            grams.where(f"doc_id % 2 = {p}").select("source", "gram"),
            "gram", "source",
        )
        for p in range(2)
    ]
    merged = sk.hll_merge(*parts)
    diff = (
        whole.alias("a").join(merged.alias("b"), ["source", "bucket"],
                              "full_outer")
        .where("a.m_j IS NULL OR b.m_j IS NULL OR a.m_j <> b.m_j")
    )
    assert diff.count() == 0


# ---- bottom-k quantiles -------------------------------------------------------


def test_bottomk_merge_lossless(spark, docs):
    whole = sk.bottomk_build(docs, "n_chars", "doc_id")
    parts = [
        sk.bottomk_build(docs.where(f"doc_id % 4 = {p}"), "n_chars", "doc_id")
        for p in range(4)
    ]
    merged = sk.bottomk_merge(*parts)
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_bottomk_quantiles_rank_error(spark, docs):
    sketch = sk.bottomk_build(docs.where("n_chars > 0"), "n_chars", "doc_id")
    est = sk.bottomk_quantiles(sketch, [10, 25, 50, 75, 90]).collect()
    assert [r.q_pct for r in est] == [10, 25, 50, 75, 90]
    base = docs.where("n_chars > 0")
    n = base.count()
    for r in est:
        true_rank = base.where(f"n_chars <= {r.est_val}").count()
        assert abs(true_rank / n * 100 - r.q_pct) <= 3.0 / math.sqrt(256) * 100


def test_bloom_probe_map_matches_join_probe(spark, words):
    """The join-free map probe and the broadcast-join probe are the same
    filter — bit-identical flags on the same keys."""
    bench = words.where("doc_id % 20 = 0").select("word").distinct()
    probe = words.where("doc_id % 20 <> 0").select("word").distinct()
    bloom = sk.bloom_build(bench, "word")
    via_join = {
        (r.word, r.maybe_member)
        for r in sk.bloom_probe(probe, "word", bloom).collect()
    }
    bmap = sk.bloom_as_map(bloom)
    via_map = {
        (r.word, r.maybe_member)
        for r in sk.bloom_probe_map(probe, "word", bmap).collect()
    }
    assert via_join == via_map


def test_bloom_probe_is_shuffle_free(spark, words):
    """The probe must add NO exchange on the probe side — broadcast joins
    and scalar bit tests only (the runtime-filter contract)."""
    # checkpoint both inputs so the plan below contains ONLY what the
    # probe itself adds
    probe = words.select("word").distinct().localCheckpoint(eager=True)
    bloom = (
        sk.bloom_build(
            words.where("doc_id % 20 = 0").select("word").distinct(), "word"
        ).localCheckpoint(eager=True)
    )
    plan = (
        sk.bloom_probe(probe, "word", bloom)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") == 3


# ---- Misra-Gries --------------------------------------------------------------


def test_mg_build_merge_matches_graded_query(spark, words):
    """API per-shard build + merge over the same shard assignment must
    reproduce the graded query's (word, mg_est) survivors exactly."""
    from flink_1_12_0_spark import registry

    sharded = words.selectExpr("doc_id % 8 AS shard", "word")
    summ = sk.mg_build(sharded, "word", "shard")
    merged = sk.mg_merge(summ, key_col="word")
    api = {(r.word, r.cnt) for r in merged.collect()}
    graded = {
        (r.word, r.mg_est)
        for r in registry.QUERIES["sketch_heavy_hitters_mg"](
            spark, SF_DIR
        ).collect()
    }
    assert api == graded


def test_mg_never_overcounts(spark, words):
    sharded = words.selectExpr("doc_id % 8 AS shard", "word")
    merged = sk.mg_merge(sk.mg_build(sharded, "word", "shard"),
                         key_col="word")
    truth = words.groupBy("word").agg(F.count("*").alias("true_cnt"))
    j = merged.join(truth, "word").collect()
    assert len(j) > 0
    assert all(r.cnt <= r.true_cnt for r in j)


# ---- KMV (bucketed-min) quantile sample ---------------------------------------


def test_kmv_build_merge_lossless(spark, docs):
    base = docs.where("n_chars > 0")
    whole = sk.kmv_build(base, "n_chars", "doc_id")
    parts = [
        sk.kmv_build(base.where(f"doc_id % 3 = {p}"), "n_chars", "doc_id")
        for p in range(3)
    ]
    merged = sk.kmv_merge(*parts)
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_kmv_build_matches_streaming_oracle_state(spark, docs):
    """The API build is the same state the streaming query maintains:
    reproduce the oracle's kmv CTE on the fixture and compare."""
    import duckdb

    c = duckdb.connect()
    from tests.conftest import SF_DIR as _sf

    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{_sf}/documents.parquet')")
    oracle = c.execute("""
        SELECT h % 256 AS bucket, min(h) AS min_h, arg_min(n_chars, h) AS value
        FROM (SELECT n_chars,
                     CAST('0x' || substr(md5('q#' || CAST(doc_id AS VARCHAR)),
                                         1, 15) AS BIGINT) AS h
              FROM documents WHERE n_chars > 0)
        GROUP BY h % 256
    """).fetchall()
    api = sk.kmv_build(docs.where("n_chars > 0"), "n_chars", "doc_id")
    assert sorted(map(tuple, api.collect())) == sorted(map(tuple, oracle))


def test_bloom_build_matches_graded_query(spark, docs):
    """The missing Bloom parity link (the other sketch families have
    one): API bloom_build over the graded build's key stream must equal
    the _bloom_build_sql output exactly — same K, seeds, M, and 62-bit
    word packing, so the two modules cannot silently diverge."""
    from flink_1_12_0_spark.queries.llm_text import (
        _SPARK_G4, _bloom_build_sql, SPARK_BH, SPARK_WORDS,
    )

    docs.createOrReplaceTempView("documents")
    ref = spark.sql(_bloom_build_sql(
        SPARK_BH, SPARK_WORDS, f"explode({_SPARK_G4})",
        "explode(array({xs}))", "DIV",
    )).collect()
    bench_grams = (
        docs.where("doc_id % 20 = 0")
        .selectExpr(f"{SPARK_WORDS} AS w")
        .selectExpr(f"explode({_SPARK_G4}) AS gram")
    )
    api = sk.bloom_build(bench_grams, "gram").collect()
    assert sorted(map(tuple, api)) == sorted(map(tuple, ref))


def test_cms_estimate_zero_for_unseen_keys(spark, words):
    """A probe key whose counter cells were never touched must estimate
    0 and must NOT vanish from the output (left join + coalesce)."""
    cms = sk.cms_build(words.select("word"), "word")
    probe = spark.createDataFrame(
        [("zz-never-in-corpus-1",), ("zz-never-in-corpus-2",)], ["word"]
    )
    est = {r.word: r.cms_est for r in sk.cms_estimate(probe, "word", cms).collect()}
    assert len(est) == 2
    # cells may collide with real words (overcount >= 0 allowed), but an
    # all-empty-cell key must be exactly 0 — and with w=64 over a real
    # vocabulary most cells are occupied, so just pin presence + >=0
    assert all(v >= 0 for v in est.values())


def test_bloom_build_ignores_null_keys(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], ["k"])
    bloom = sk.bloom_build(df, "k")
    assert bloom.where("word_idx IS NULL OR mask IS NULL").count() == 0
    # and the map form works (no NULL map key)
    m = sk.bloom_as_map(bloom)
    probed = sk.bloom_probe_map(df.where("k IS NOT NULL"), "k", m)
    assert {r.maybe_member for r in probed.collect()} == {1}


def test_bottomk_merge_idempotent(spark, docs):
    s = sk.bottomk_build(docs.where("n_chars > 0"), "n_chars", "doc_id")
    twice = sk.bottomk_merge(s, s)
    assert sorted(map(tuple, twice.collect())) == sorted(
        map(tuple, s.collect())
    )


# ---- ADVICE r9 regressions: geometry tag, NULL keys, view races ---------------


def test_bloom_geometry_mismatch_raises(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["k"])
    bloom = sk.bloom_build(df, "k", words=64)
    # wrong words
    with pytest.raises(ValueError, match="geometry mismatch"):
        sk.bloom_probe(df, "k", bloom, words=128)
    # wrong hash family
    with pytest.raises(ValueError, match="geometry mismatch"):
        sk.bloom_probe(df, "k", bloom, words=64,
                       positions=sk.xxhash_positions)
    # agreeing geometry still probes (and keeps zero false negatives)
    ok = sk.bloom_probe(df, "k", bloom, words=64)
    assert {r.maybe_member for r in ok.collect()} == {1}


def test_bloom_geometry_tag_survives_checkpoint_and_merge(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["k"])
    b1 = sk.bloom_build(df.where("k <> 'c'"), "k", words=64)
    b2 = sk.bloom_build(df.where("k = 'c'"), "k", words=64)
    # the runtime-filter join localCheckpoints its filter — the tag must
    # ride through (schema metadata, not a Python-side attribute)
    merged = sk.bloom_merge(b1.localCheckpoint(eager=True), b2)
    with pytest.raises(ValueError, match="geometry mismatch"):
        sk.bloom_probe(df, "k", merged, words=128)
    # and merging disagreeing geometries is rejected outright
    odd = sk.bloom_build(df, "k", words=128)
    with pytest.raises(ValueError, match="mixed filter geometries"):
        sk.bloom_merge(b1, odd)


def test_sketch_builds_ignore_null_keys(spark):
    rows = [("a", 3), (None, 5), ("b", 7), (None, 11)]
    df = spark.createDataFrame(rows, ["k", "v"])
    # CMS: state stays exactly d rows per distinct live key-cell, no NULL cells
    cms = sk.cms_build(df, "k")
    assert cms.where("col_idx IS NULL").count() == 0
    assert cms.agg(F.sum("c")).first()[0] == 2 * sk.CMS_D
    # HLL: no NULL-bucket register row
    hll = sk.hll_build(df.selectExpr("'s' AS source", "k"), "k")
    assert hll.where("bucket IS NULL OR m_j IS NULL").count() == 0
    # bottom-k / KMV: NULL ids never enter the sample
    ints = spark.createDataFrame(
        [(1, 10), (None, 20), (2, 30)], "id_raw INT, val INT")
    bk = sk.bottomk_build(ints, "val", "id_raw")
    assert bk.where("id IS NULL").count() == 0 and bk.count() == 2
    kmv = sk.kmv_build(ints, "val", "id_raw")
    assert kmv.where("bucket IS NULL").count() == 0
    assert kmv.agg(F.sum(F.lit(1))).first()[0] == 2


def test_estimate_views_do_not_collide(spark, docs):
    """Two estimates prepared back-to-back must each resolve against their
    OWN registers/sketch (per-call unique view names — a fixed name made
    this order-dependent)."""
    grams = docs.selectExpr("source", "explode(split(text, ' ')) AS g")
    r_all = sk.hll_build(grams, "g", "source")
    r_half = sk.hll_build(grams.where("length(g) > 4"), "g", "source")
    e_all = sk.hll_estimate(r_all)      # prepared first ...
    e_half = sk.hll_estimate(r_half)    # ... second view created before collect
    a = {r.source: r.hll_est for r in e_all.collect()}
    h = {r.source: r.hll_est for r in e_half.collect()}
    assert a and h and any(a[s] != h.get(s) for s in a)
    assert all(a[s] >= h.get(s, 0) * 0.5 for s in a)  # sanity, not equality
    # bottomk_quantiles: interleave two sketches the same way
    s_lo = sk.bottomk_build(docs.where("n_chars > 0"), "n_chars", "doc_id")
    s_hi = sk.bottomk_build(
        docs.where("n_chars > 200"), "n_chars", "doc_id")
    q_lo = sk.bottomk_quantiles(s_lo, [50])
    q_hi = sk.bottomk_quantiles(s_hi, [50])
    assert q_hi.first().est_val >= q_lo.first().est_val
