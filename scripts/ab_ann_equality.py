#!/usr/bin/env python
"""Exact-equality A/B of the r18 ANN-tier Spark rewrites
(sim_ann_recall_ivfadc: max_by aggregations + hoisted norms;
sim_hybrid_rrf3[w]: matched-term sliver instead of the corpus tf build)
against the r17 forms.

Every rewrite claims VALUE-IDENTICAL output (same fold order, same
division, same argmax convention) — this script proves it empirically on
real data: each pair of plans is collected and compared value-by-value
with == (no tolerance).  ``old_ivfadc_sql`` / ``old_hybrid3_tail``
reconstruct the r17 Spark texts verbatim; scripts/ab_ann_timing.py
reuses them as the before arm, and scripts/ab_kmeans_literal.py covers
the kmeans/IVF operator the same way.

Usage: PYTHONPATH=/root/repo python scripts/ab_ann_equality.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rows_equal(a, b) -> bool:
    if len(a) != len(b):
        print(f"  row count {len(a)} != {len(b)}")
        return False
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            print(f"  row {i}: {ra} != {rb}")
            return False
    return True


def old_ivfadc_sql() -> str:
    """The r17 interpreted-HOF Spark text of sim_ann_recall_ivfadc,
    reconstructed verbatim."""
    from flink_1_12_0_spark.queries.llm_similarity import (
        _PQ_K, _PQ_TOPK, SPARK_DOT, SPARK_NORM)
    subsrc = "SELECT explode(sequence(0, 7)) AS sub"
    sl = "slice(v.embedding, s.sub * 8 + 1, 8)"
    cos_cv = (SPARK_DOT.format(a="v.embedding", b="c.embedding")
              + " / (" + SPARK_NORM.format(a="v.embedding") + " * "
              + SPARK_NORM.format(a="c.embedding") + ")")
    cos_sub = (SPARK_DOT.format(a="v.subvec", b="c.subvec")
               + " / (" + SPARK_NORM.format(a="v.subvec") + " * "
               + SPARK_NORM.format(a="c.subvec") + ")")
    dot_qc = SPARK_DOT.format(a="q.subvec", b="c.subvec")
    dot_cc = SPARK_DOT.format(a="c.subvec", b="c.subvec")
    cos_full = (SPARK_DOT.format(a="q.embedding", b="c.embedding")
                + " / (" + SPARK_NORM.format(a="q.embedding") + " * "
                + SPARK_NORM.format(a="c.embedding") + ")")
    return f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding FROM embeddings WHERE vec_id < 16),
    cellrk AS (
      SELECT v.vec_id, cent_id,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY round({cos_cv}, 6) DESC, cent_id) AS rk
      FROM embeddings v CROSS JOIN cents c),
    cells AS (SELECT vec_id, cent_id FROM cellrk WHERE rk = 1),
    probed AS (SELECT vec_id, cent_id FROM cellrk
               WHERE rk <= 2 AND vec_id < 10),
    subsrc AS ({subsrc}),
    vsub AS (
      SELECT v.vec_id, s.sub, {sl} AS subvec
      FROM embeddings v CROSS JOIN subsrc s),
    csub AS (
      SELECT vec_id AS cid, sub, subvec FROM vsub WHERE vec_id < {_PQ_K}),
    assigned AS (
      SELECT vec_id, sub, cid AS code FROM (
        SELECT v.vec_id, v.sub, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.sub
                 ORDER BY round({cos_sub}, 6) DESC, c.cid) AS rk
        FROM vsub v JOIN csub c ON v.sub = c.sub)
      WHERE rk = 1),
    qtbl AS (
      SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
             CAST(round(({dot_qc}) * 1000000) AS BIGINT) AS dq_e6,
             CAST(round(({dot_cc}) * 1000000) AS BIGINT) AS cn2_e6
      FROM vsub q JOIN csub c ON q.sub = c.sub
      WHERE q.vec_id < 10),
    cand AS (
      SELECT p.vec_id AS query_id, l.vec_id AS cand_id
      FROM probed p JOIN cells l
        ON p.cent_id = l.cent_id AND l.vec_id <> p.vec_id),
    ann AS (
      SELECT query_id, cand_id FROM (
        SELECT cd.query_id, cd.cand_id,
               row_number() OVER (PARTITION BY cd.query_id
                 ORDER BY round(CAST(sum(t.dq_e6) AS DOUBLE)
                          / sqrt(CAST(sum(t.cn2_e6) AS DOUBLE)), 6) DESC,
                          cd.cand_id) AS rn
        FROM cand cd
        JOIN assigned a ON a.vec_id = cd.cand_id
        JOIN qtbl t ON t.query_id = cd.query_id
                   AND t.sub = a.sub AND t.code = a.code
        GROUP BY cd.query_id, cd.cand_id)
      WHERE rn <= {_PQ_TOPK}),
    exact AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round({cos_full}, 6) DESC, c.vec_id) AS rn
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 10)
      WHERE rn <= {_PQ_TOPK})
    SELECT e.query_id,
           CAST(count(a.cand_id) AS BIGINT) AS ann_hits,
           round(CAST(count(a.cand_id) AS DOUBLE) / {_PQ_TOPK}.0, 4)
               AS recall_at_3
    FROM exact e LEFT JOIN ann a
      ON a.query_id = e.query_id AND a.cand_id = e.cand_id
    GROUP BY e.query_id ORDER BY e.query_id
    """


def old_hybrid3_tail(tf: str, proj_ref: str, weights) -> str:
    """The r17 interpreted-HOF Spark tail of sim_hybrid_rrf3[w],
    reconstructed verbatim over caller-provided tf/projection views."""
    from flink_1_12_0_spark.queries.llm_similarity import (
        _SPARK_COS_AB, SPARK_DOT, SPARK_NORM)
    cos_full = _SPARK_COS_AB
    cos_proj = (SPARK_DOT.format(a="q.p", b="c.p")
                + " / (" + SPARK_NORM.format(a="q.p") + " * "
                + SPARK_NORM.format(a="c.p") + ")")
    explode_q = "explode(split(qtext, ' '))"
    wb, wc, wp = weights
    contrib = "CAST(round(1e6 / (60e0 + {r})) AS BIGINT)"
    cb = contrib if wb == 1 else f"{wb} * {contrib}"
    cc = contrib if wc == 1 else f"{wc} * {contrib}"
    cp = contrib if wp == 1 else f"{wp} * {contrib}"
    return f"""
    WITH qs AS (SELECT * FROM (VALUES
        (1, 'spark join window', 0), (2, 'customer order data', 1),
        (3, 'stream agg fast', 2),   (4, 'hash filter scan', 3))
        AS q(query_id, qtext, qvec)),
    qt AS (SELECT query_id, qvec, {explode_q} AS term FROM qs),
    stats AS (SELECT count(*) AS n,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
              FROM (SELECT DISTINCT doc_id, dl FROM {tf})),
    dft AS (SELECT word, count(*) AS df FROM {tf} GROUP BY word),
    bscored AS (
        SELECT qt.query_id, t.doc_id,
               CAST(round(
                   ln((stats.n - dft.df + 0.5e0) / (dft.df + 0.5e0) + 1e0)
                   * (t.cnt * (1.2e0 + 1e0))
                   / (t.cnt + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 * t.dl / stats.avgdl))
                   * 1e6) AS BIGINT) AS s_e6
        FROM {tf} t JOIN qt ON t.word = qt.term AND t.doc_id <> qt.qvec
        JOIN dft ON dft.word = t.word
        CROSS JOIN stats),
    bagg AS (SELECT query_id, doc_id, CAST(sum(s_e6) AS BIGINT) AS score_e6
             FROM bscored GROUP BY query_id, doc_id),
    brank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score_e6 DESC, doc_id) AS brn
              FROM bagg),
    qv AS (SELECT qs.query_id, qs.qvec, e.embedding
           FROM qs JOIN embeddings e ON e.vec_id = qs.qvec),
    cscored AS (
        SELECT q.query_id, c.vec_id AS doc_id, round({cos_full}, 6) AS cos_sim
        FROM qv q JOIN embeddings c ON c.vec_id <> q.qvec),
    crank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, doc_id) AS crn
              FROM cscored),
    pqv AS (SELECT qs.query_id, qs.qvec, p.p
            FROM qs JOIN {proj_ref} p ON p.vec_id = qs.qvec),
    pscored AS (
        SELECT q.query_id, c.vec_id AS doc_id, round({cos_proj}, 6) AS psim
        FROM pqv q JOIN {proj_ref} c ON c.vec_id <> q.qvec),
    prank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY psim DESC, doc_id) AS prn
              FROM pscored),
    fused2 AS (
        SELECT coalesce(b.query_id, c.query_id) AS query_id,
               coalesce(b.doc_id, c.doc_id) AS doc_id,
               b.brn, c.crn
        FROM (SELECT * FROM brank WHERE brn <= 20) b
        FULL OUTER JOIN (SELECT * FROM crank WHERE crn <= 20) c
          ON b.query_id = c.query_id AND b.doc_id = c.doc_id),
    fused AS (
        SELECT coalesce(f.query_id, p.query_id) AS query_id,
               coalesce(f.doc_id, p.doc_id) AS doc_id,
               coalesce({cb.format(r="f.brn")}, 0)
               + coalesce({cc.format(r="f.crn")}, 0)
               + coalesce({cp.format(r="p.prn")}, 0) AS rrf_e6,
               CAST(f.brn AS BIGINT) AS bm25_rank,
               CAST(f.crn AS BIGINT) AS cos_rank,
               CAST(p.prn AS BIGINT) AS jl_rank
        FROM fused2 f
        FULL OUTER JOIN (SELECT * FROM prank WHERE prn <= 20) p
          ON f.query_id = p.query_id AND f.doc_id = p.doc_id)
    SELECT query_id, rn AS rank, doc_id,
           CAST(rrf_e6 AS BIGINT) AS rrf_e6, bm25_rank, cos_rank, jl_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_e6 DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= 5
    ORDER BY query_id, rank
    """


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from flink_1_12_0_spark import registry
    from flink_1_12_0_spark.session import get_spark
    from flink_1_12_0_spark.tables import load_tables

    registry.load_all()
    spark = get_spark("ab-ann-equality")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    ok = True

    # kmeans old-vs-new equality + timing lives in
    # scripts/ab_kmeans_literal.py (the r17 form is reconstructed there).

    # ---- 2. ivfadc: old HOF SQL (reconstructed) vs new unrolled SQL
    from flink_1_12_0_spark.queries.llm_similarity import _ivfadc_recall_sql
    o = spark.sql(old_ivfadc_sql()).collect()
    n = spark.sql(_ivfadc_recall_sql(True)).collect()
    same = rows_equal(o, n)
    print(f"sim_ann_recall_ivfadc old vs new spark SQL: "
          f"{'EQUAL' if same else 'DIFFER'}")
    ok = ok and same

    # ---- 3. hybrid3 / hybrid3w tails: old HOF text vs new unrolled text
    from flink_1_12_0_spark.operators.retrieval import jl_project
    from flink_1_12_0_spark.queries.llm_corpus import SPARK_WORDS, _bm25_tf_sql
    from flink_1_12_0_spark.queries.llm_similarity import (
        _JL_IN_DIMS, _JL_OUT_DIMS, _RRF3W_WEIGHTS, _hybrid3_tail)

    tf = spark.sql(
        _bm25_tf_sql(SPARK_WORDS, "explode(w)", "size(w)")
    ).localCheckpoint(eager=True)
    tf.createOrReplaceTempView("ab_tf")
    proj = jl_project(t["embeddings"], _JL_IN_DIMS, _JL_OUT_DIMS).select(
        "vec_id", "p").localCheckpoint(eager=True)
    proj.createOrReplaceTempView("ab_proj")

    for label, weights in (("sim_hybrid_rrf3", (1, 1, 1)),
                           ("sim_hybrid_rrf3w", _RRF3W_WEIGHTS)):
        o = spark.sql(old_hybrid3_tail("ab_tf", "ab_proj", weights)).collect()
        n = spark.sql(_hybrid3_tail(
            "ab_tf", "explode(split(qtext, ' '))", True, "ab_proj",
            weights=weights)).collect()
        same = rows_equal(o, n)
        print(f"{label} old vs new spark tail: "
              f"{'EQUAL' if same else 'DIFFER'}")
        ok = ok and same

    print("ALL EQUAL" if ok else "MISMATCH FOUND")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
