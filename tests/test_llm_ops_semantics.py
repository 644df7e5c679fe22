"""Semantic invariants of the round-8 operators, checked oracle-side
(pure DuckDB — the Spark/oracle EQUALITY is covered by the per-query
oracle gate; these tests pin properties the hash-compare can't see).

- Bloom decontamination: ZERO false negatives vs the exact inverted-index
  overlap (Bloom's defining guarantee), and a bounded false-positive set.
- BFS iteration: hop counts over the binary-heap tree equal the analytic
  depth floor(log2(id)), and the frontier really needs >= 8 rounds at the
  grading SF (the termination criterion does work).
- BM25: ranked lists are complete, strictly rank-ordered, and every hit
  actually contains a query term (no phantom scores).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    from flink_1_12_0_spark import registry

    registry.load_all()
    return c


def test_bloom_no_false_negatives(con):
    from flink_1_12_0_spark import registry

    bloom = con.execute(registry.ORACLES["decontam_bloom_filter"]).df()
    exact = con.execute(
        """
        WITH g AS (SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 3, 0)),
                       i -> array_to_string(w[i:i+3], ' ')))) AS gram
                   FROM (SELECT doc_id, string_split(text, ' ') AS w
                         FROM documents)),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0)
        SELECT DISTINCT g.doc_id FROM g JOIN bench b USING (gram)
        WHERE g.doc_id % 20 <> 0
        """
    ).df()
    flagged = set(bloom[bloom.contaminated == 1].doc_id)
    truly = set(exact.doc_id)
    missed = truly - flagged
    assert not missed, f"Bloom false negatives (impossible by design): {missed}"
    # false positives exist but must stay a small fraction at this M/K
    fp = len(flagged - truly)
    assert fp <= max(5, len(bloom) // 20), f"Bloom FP rate too high: {fp}"


def test_bfs_hops_match_heap_depth(con):
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["iterate_bfs_hops"]).df()
    assert len(df) > 0
    for row in df.itertuples():
        assert row.hops == int(math.floor(math.log2(row.id))), row
    # the termination loop must have real depth at grading SF
    assert df.hops.max() >= 8


def test_bm25_ranking_properties(con):
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["text_bm25_topk"]).df()
    assert sorted(df.query_id.unique()) == [1, 2, 3, 4]
    terms = {
        1: "spark join window", 2: "customer order data",
        3: "stream agg fast", 4: "hash filter scan",
    }
    for qid, grp in df.groupby("query_id"):
        assert list(grp["rank"]) == [1, 2, 3, 4, 5]
        scores = list(grp.score_e6)
        assert scores == sorted(scores, reverse=True)
        # every ranked doc contains at least one query term
        ids = tuple(int(x) for x in grp.doc_id)
        n_ok = con.execute(
            f"""
            SELECT count(*) FROM documents
            WHERE doc_id IN {ids}
              AND len(list_filter(string_split(text, ' '),
                      x -> list_contains({terms[qid].split()!r}, x))) > 0
            """
        ).fetchone()[0]
        assert n_ok == len(ids)


def test_cms_never_undercounts(con):
    """Count-min's defining guarantee: est >= truth for every probed word,
    and at w=64 the sketch must show REAL collisions (some overcount > 0 —
    otherwise the fixture stopped exercising the min-of-rows logic)."""
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["sketch_count_min_words"]).df()
    assert len(df) == 20
    assert (df.cms_est >= df.true_cnt).all()
    assert (df.overcount == df.cms_est - df.true_cnt).all()
    # the docstring's collision claim, enforced (ADVICE r8): widening w
    # until the sketch degenerates to exact counts must FAIL this test
    assert (df.overcount > 0).any(), (
        "no collisions at w=64 — sketch degenerated to exact counts"
    )


def test_weighted_sample_es_properties(con):
    """E-S weighted sampling: exactly min(K, source size) picks per source,
    and the size-weighted sample must over-represent heavy docs (mean
    n_chars of picks > corpus mean — deterministic on the fixed fixture)."""
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["text_weighted_sample_es"]).df()
    sizes = con.execute(
        "SELECT source, count(*) AS n FROM documents WHERE n_chars > 0 "
        "GROUP BY source"
    ).df().set_index("source").n
    for src, grp in df.groupby("source"):
        assert len(grp) == min(20, int(sizes[src]))
        assert list(grp.picked_rank) == list(range(1, len(grp) + 1))
    corpus_mean = con.execute(
        "SELECT avg(n_chars) FROM documents WHERE n_chars > 0"
    ).fetchone()[0]
    assert df.n_chars.mean() > corpus_mean


def test_pagerank_fixed_point_bounds(con):
    """Integer fixed-point PageRank: every node keeps at least the
    teleport mass (0.15e9), no node exceeds the total-mass bound, and the
    output covers exactly the id>=1 node set."""
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["iterate_pagerank"]).df()
    n = con.execute(
        "SELECT count(*) FROM documents WHERE doc_id >= 1"
    ).fetchone()[0]
    assert len(df) == n
    assert (df.rank_e9 >= 150_000_000).all()
    # truncating integer division only loses mass, so the sum can never
    # exceed the ideal closed system's total of n * 1e9
    assert df.rank_e9.sum() <= n * 1_000_000_000


# ---- property-based: the sketch templates hold on ARBITRARY corpora ---------
# The fixture tests above pin behavior on the shipped data; these drive the
# same oracle SQL over hypothesis-generated corpora so a template edit that
# breaks the math (hash split, bit packing, min-of-rows) fails on corpora
# we never shipped.  DuckDB-only: template correctness, not engine parity
# (parity is the per-query oracle gate's job).

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=4, max_size=40
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_words, min_size=2, max_size=30))
def test_bloom_no_false_negatives_random_corpus(corpora):
    import duckdb

    from flink_1_12_0_spark import registry

    registry.load_all()
    c = duckdb.connect()
    c.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
              "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    for i, ws in enumerate(corpora):
        t = " ".join(ws)
        c.execute("INSERT INTO documents VALUES (?, ?, 'en', 'src', ?)",
                  [i, t, len(t)])
    bloom = c.execute(registry.ORACLES["decontam_bloom_filter"]).df()
    exact = c.execute("""
        WITH g AS (SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 3, 0)),
                       i -> array_to_string(w[i:i+3], ' ')))) AS gram
                   FROM (SELECT doc_id, string_split(text, ' ') AS w
                         FROM documents)),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0)
        SELECT DISTINCT g.doc_id FROM g JOIN bench b USING (gram)
        WHERE g.doc_id % 20 <> 0
    """).df()
    flagged = set(bloom[bloom.contaminated == 1].doc_id)
    assert set(exact.doc_id) <= flagged


@settings(max_examples=25, deadline=None)
@given(st.lists(_words, min_size=1, max_size=20))
def test_cms_never_undercounts_random_corpus(corpora):
    import duckdb

    from flink_1_12_0_spark import registry

    registry.load_all()
    c = duckdb.connect()
    c.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
              "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    for i, ws in enumerate(corpora):
        t = " ".join(ws)
        c.execute("INSERT INTO documents VALUES (?, ?, 'en', 'src', ?)",
                  [i, t, len(t)])
    df = c.execute(registry.ORACLES["sketch_count_min_words"]).df()
    assert (df.cms_est >= df.true_cnt).all()


def test_hll_error_within_theoretical_band(con):
    """Explicit-register HLL at m=64: relative error must stay within a
    few standard errors of the theoretical 1.04/sqrt(64) ~= 13%, and the
    raw/linear-counting branches must both be exercised or the estimate
    column must at least be positive everywhere."""
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["sketch_hll_cardinality"]).df()
    assert len(df) >= 5
    assert (df.hll_est > 0).all()
    rel = (df.hll_est - df.true_distinct).abs() / df.true_distinct
    # 4 sigma of 1.04/sqrt(64) = 52%; the fixed fixture lands ~11% median
    assert float(rel.median()) < 0.3
    assert float(rel.max()) < 0.52


def test_hll_registers_merge_exactly(con):
    """The distributed-sketch property the COVERAGE row claims: HLL
    registers built on two disjoint halves of the corpus and merged by
    per-bucket max are IDENTICAL to registers built on the whole corpus —
    so partition-local sketches union losslessly at any parallelism."""
    reg_sql = """
    SELECT source, bucket,
           max(CASE WHEN h2 = 0 THEN 55 ELSE 54 - length(bin(h2)) + 1 END) AS m_j
    FROM (SELECT source,
                 h %% 64 AS bucket, h // 64 AS h2
          FROM (SELECT source,
                       CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) AS h
                FROM (SELECT source, unnest(list_distinct(list_transform(
                          generate_series(1, greatest(len(w) - 3, 0)),
                          i -> array_to_string(w[i:i+3], ' ')))) AS gram
                      FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                            FROM documents WHERE length(text) > 0 AND (%s)))))
    GROUP BY source, bucket
    """
    full = con.execute(reg_sql % "TRUE").df()
    even = con.execute(reg_sql % "doc_id % 2 = 0").df()
    odd = con.execute(reg_sql % "doc_id % 2 = 1").df()
    import pandas as pd

    merged = (
        pd.concat([even, odd])
        .groupby(["source", "bucket"], as_index=False).m_j.max()
    )
    f = full.sort_values(["source", "bucket"]).reset_index(drop=True)
    m = merged.sort_values(["source", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, m, check_dtype=False)


def test_multiprobe_dominates_single_probe(con):
    """Multi-probe IVF searches a candidate SUPERSET of single-probe, so
    per-query hits must be >= single-probe's — the recall knob can only
    help (and on the fixture it strictly helps in aggregate)."""
    from flink_1_12_0_spark import registry

    con.execute(
        "CREATE VIEW IF NOT EXISTS embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    sp = con.execute(registry.ORACLES["sim_ann_recall_ivf"]).df()
    mp = con.execute(registry.ORACLES["sim_ann_recall_ivf_multiprobe"]).df()
    j = sp.merge(mp, on="query_id", suffixes=("_sp", "_mp"))
    assert (j.ann_hits_mp >= j.ann_hits_sp).all()
    assert j.ann_hits_mp.sum() > j.ann_hits_sp.sum()


_QSK_BOTTOMK = """
SELECT doc_id, n_chars,
       CAST('0x' || substr(md5('q#' || CAST(doc_id AS VARCHAR)), 1, 15)
            AS BIGINT) AS h
FROM documents WHERE n_chars > 0 AND ({part})
ORDER BY h, doc_id LIMIT 256
"""


def test_quantile_bottomk_merge_lossless(con):
    """The mergeable-summary property the sketch's 100 TB story rests on:
    bottom-k over the union of per-partition bottom-k sketches is
    IDENTICAL to bottom-k over the whole corpus — so partition-local
    sketches union losslessly at any parallelism (Agarwal et al. SODA'12,
    random-sample summary)."""
    import pandas as pd

    full = con.execute(_QSK_BOTTOMK.format(part="TRUE")).df()
    parts = [
        con.execute(_QSK_BOTTOMK.format(part=f"doc_id % 8 = {p}")).df()
        for p in range(8)
    ]
    merged = (
        pd.concat(parts)
        .sort_values(["h", "doc_id"])
        .head(256)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), merged, check_dtype=False
    )


def test_quantile_bottomk_error_band(con):
    """Sample-quantile accuracy: for every probed q, the estimated value's
    TRUE cumulative rank must sit within q +/- 3/sqrt(K) (K = 256 -> 18.75
    rank points; the fixture lands well inside).  This is the O(1/sqrt(K))
    guarantee of a uniform K-sample's order statistics — and it fails if
    the hash ever correlates with the value."""
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["sketch_quantiles_bottomk"]).df()
    assert list(df.q_pct) == [10, 25, 50, 75, 90]
    n = con.execute(
        "SELECT count(*) FROM documents WHERE n_chars > 0"
    ).fetchone()[0]
    for _, row in df.iterrows():
        true_rank = con.execute(
            "SELECT count(*) FROM documents "
            f"WHERE n_chars > 0 AND n_chars <= {int(row.est_val)}"
        ).fetchone()[0]
        band = 3.0 / math.sqrt(256) * 100
        assert abs(true_rank / n * 100 - row.q_pct) <= band, (
            f"q={row.q_pct}: est rank {true_rank / n * 100:.1f} "
            f"outside +/-{band:.1f}"
        )


def test_cms_counters_batching_invariant(con):
    """The property stream_cms_words rests on: CMS counters are plain
    SUMs, so counters built on disjoint chunks and sum-merged equal the
    global build EXACTLY — any micro-batch split streams to the same
    sketch."""
    import pandas as pd

    cnt_sql = """
    SELECT row_idx, col_idx, count(*) AS c
    FROM (SELECT word,
                 unnest([0, 1, 2]) AS row_idx,
                 unnest([
                   CAST('0x' || substr(md5(word || '#0'), 1, 15) AS BIGINT) % 64,
                   CAST('0x' || substr(md5(word || '#1'), 1, 15) AS BIGINT) % 64,
                   CAST('0x' || substr(md5(word || '#2'), 1, 15) AS BIGINT) % 64
                 ]) AS col_idx
          FROM (SELECT unnest(string_split(text, ' ')) AS word
                FROM documents WHERE length(text) > 0 AND ({part})))
    GROUP BY row_idx, col_idx
    """
    full = con.execute(cnt_sql.format(part="TRUE")).df()
    parts = [
        con.execute(cnt_sql.format(part=f"doc_id % 3 = {p}")).df()
        for p in range(3)
    ]
    merged = (
        pd.concat(parts)
        .groupby(["row_idx", "col_idx"], as_index=False).c.sum()
    )
    f = full.sort_values(["row_idx", "col_idx"]).reset_index(drop=True)
    m = merged.sort_values(["row_idx", "col_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, m, check_dtype=False)


def test_mg_heavy_hitters_bounds(con):
    """Misra-Gries' defining DETERMINISTIC guarantee (contrast CMS's
    probabilistic one): mg_est <= true_cnt <= mg_est + err_bound for
    every surviving word, with a nonempty survivor set and a positive
    error bound at this corpus (offsets really subtract)."""
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["sketch_heavy_hitters_mg"]).df()
    assert 0 < len(df) <= 16
    assert (df.mg_est > 0).all()
    assert (df.mg_est <= df.true_cnt).all()
    assert (df.true_cnt <= df.mg_est + df.err_bound).all()
    assert (df.err_bound > 0).all()
    # the summary must actually surface the corpus's top word
    top_word = con.execute(
        "SELECT word FROM (SELECT unnest(string_split(text, ' ')) AS word "
        "FROM documents WHERE length(text) > 0) GROUP BY word "
        "ORDER BY count(*) DESC, word LIMIT 1"
    ).fetchone()[0]
    assert top_word in set(df.word)


_KMV_SQL = """
SELECT h % 256 AS bucket, min(h) AS min_h, arg_min(n_chars, h) AS value
FROM (SELECT n_chars,
             CAST('0x' || substr(md5('q#' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM documents WHERE n_chars > 0 AND ({part}))
GROUP BY h % 256
"""


def test_kmv_sample_batching_invariant(con):
    """The property stream_quantiles_kmv rests on: per-bucket min (and its
    argmin value) commutes with any chunking, so the sample built from
    disjoint chunks and min-merged equals the global build EXACTLY."""
    import pandas as pd

    full = con.execute(_KMV_SQL.format(part="TRUE")).df()
    parts = pd.concat(
        con.execute(_KMV_SQL.format(part=f"doc_id % 3 = {p}")).df()
        for p in range(3)
    )
    merged = (
        parts.sort_values(["bucket", "min_h"])
        .groupby("bucket", as_index=False).first()
    )
    f = full.sort_values("bucket").reset_index(drop=True)
    m = merged.sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(f, m, check_dtype=False)


def test_kmv_quantiles_error_band(con):
    """Same O(1/sqrt(K)) rank-error contract as the bottom-k sketch, for
    the bucketed-min sample the streaming path maintains."""
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["stream_quantiles_kmv"]).df()
    assert list(df.q_pct) == [10, 25, 50, 75, 90]
    n = con.execute(
        "SELECT count(*) FROM documents WHERE n_chars > 0"
    ).fetchone()[0]
    for _, row in df.iterrows():
        true_rank = con.execute(
            "SELECT count(*) FROM documents "
            f"WHERE n_chars > 0 AND n_chars <= {int(row.est_val)}"
        ).fetchone()[0]
        band = 3.0 / math.sqrt(256) * 100
        assert abs(true_rank / n * 100 - row.q_pct) <= band


def _random_docs_con(corpora):
    import duckdb

    from flink_1_12_0_spark import registry

    registry.load_all()
    c = duckdb.connect()
    c.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
              "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    for i, ws in enumerate(corpora):
        t = " ".join(ws)
        c.execute("INSERT INTO documents VALUES (?, ?, 'en', 'src', ?)",
                  [i, t, len(t)])
    return c


@settings(max_examples=25, deadline=None)
@given(st.lists(_words, min_size=1, max_size=20))
def test_mg_bounds_random_corpus(corpora):
    """MG's deterministic sandwich holds on corpora we never shipped:
    mg_est <= true <= mg_est + err_bound for every survivor."""
    from flink_1_12_0_spark import registry

    c = _random_docs_con(corpora)
    df = c.execute(registry.ORACLES["sketch_heavy_hitters_mg"]).df()
    assert (df.mg_est <= df.true_cnt).all()
    assert (df.true_cnt <= df.mg_est + df.err_bound).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(_words, min_size=1, max_size=30))
def test_quantile_bottomk_random_corpus(corpora):
    """On any corpus: estimates come from real values, are monotone in q,
    and with <= K docs the sketch IS the data so est == truth exactly."""
    from flink_1_12_0_spark import registry

    c = _random_docs_con(corpora)
    df = c.execute(registry.ORACLES["sketch_quantiles_bottomk"]).df()
    if len(df) == 0:
        return  # all docs empty -> no rows with n_chars > 0
    assert list(df.q_pct) == [10, 25, 50, 75, 90]
    assert list(df.est_val) == sorted(df.est_val)
    vals = {
        r[0] for r in c.execute(
            "SELECT n_chars FROM documents WHERE n_chars > 0"
        ).fetchall()
    }
    assert set(df.est_val) <= vals
    # n <= 256 here, so the "sketch" holds every row: exact quantiles
    assert (df.est_val == df.true_val).all()


def test_hll_set_algebra_laws(con):
    """Sketch set algebra: union registers = per-bucket max, so the union
    estimate is MONOTONE (>= each side's estimate — registers only grow
    under max), and the inclusion-exclusion intersection estimate
    (est_a + est_b - est_union) lands within the summed single-sketch
    error bands of the true intersection."""
    from flink_1_12_0_spark import registry

    df = con.execute(registry.ORACLES["sketch_hll_set_algebra"]).df()
    singles = {r.source: r for _, r in df.iterrows() if "|" not in r.source}
    pairs = [r for _, r in df.iterrows() if "|" in r.source]
    assert len(pairs) == len(singles) - 1
    for p in pairs:
        a, b = p.source.split("|")
        ra, rb = singles[a], singles[b]
        assert p.hll_est >= max(ra.hll_est, rb.hll_est), p.source
        true_int = ra.true_distinct + rb.true_distinct - p.true_distinct
        est_int = ra.hll_est + rb.hll_est - p.hll_est
        # each estimate is within 0.52x of its truth (4 sigma at m=64,
        # test_hll_error_within_theoretical_band), so I-E error is bounded
        # by the sum of the three bands
        band = 0.52 * (ra.true_distinct + rb.true_distinct
                       + p.true_distinct)
        assert abs(est_int - true_int) <= band, (p.source, est_int, true_int)


@settings(max_examples=25, deadline=None)
@given(st.lists(_words, min_size=1, max_size=30))
def test_kmv_batching_invariant_random_corpus(corpora):
    """KMV min-merge equals the global build on corpora we never shipped
    (the streaming-parity property, beyond the fixed fixture)."""
    import pandas as pd

    c = _random_docs_con(corpora)
    full = c.execute(_KMV_SQL.format(part="TRUE")).df()
    if len(full) == 0:
        return
    parts = pd.concat(
        c.execute(_KMV_SQL.format(part=f"doc_id % 2 = {p}")).df()
        for p in range(2)
    )
    merged = (
        parts.sort_values(["bucket", "min_h"])
        .groupby("bucket", as_index=False).first()
    )
    pd.testing.assert_frame_equal(
        full.sort_values("bucket").reset_index(drop=True),
        merged.sort_values("bucket").reset_index(drop=True),
        check_dtype=False,
    )


def test_no_returns_anti_join_equivalence(con):
    """The q78-shape's LEFT-JOIN-IS-NULL idiom must be EXACTLY the
    anti-join it claims to be: recomputing the kept channel grains with
    NOT IN over the returned-order key set yields identical rows."""
    from flink_1_12_0_spark import registry

    con.execute(
        "CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    con.execute(
        "CREATE VIEW IF NOT EXISTS lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    via_idiom = con.execute(
        registry.ORACLES["tpcds_no_returns_channel_ratio"]
    ).df()
    via_not_in = con.execute("""
        WITH chan AS (
            SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 'urgent' ELSE 'other' END AS channel,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
                   l_partkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                                     WHERE l_returnflag = 'R')
            GROUP BY 1, 2, 3)
        SELECT u.yr, u.l_partkey AS part_sk, u.qty AS clean_urgent_qty,
               o.qty AS clean_other_qty
        FROM (SELECT * FROM chan WHERE channel = 'urgent') u
        JOIN (SELECT * FROM chan WHERE channel = 'other') o
          ON u.yr = o.yr AND u.l_partkey = o.l_partkey
        ORDER BY u.yr, part_sk
    """).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        via_idiom[["yr", "part_sk", "clean_urgent_qty",
                   "clean_other_qty"]].reset_index(drop=True),
        via_not_in.reset_index(drop=True),
        check_dtype=False,
    )
