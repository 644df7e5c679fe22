#!/usr/bin/env python3
"""Empirical scale-curve receipt: how do the headline plans scale with
data volume?

Builds an N-fold copy of the sf0.1 fixture under /tmp by unioning N
key-offset replicas (join keys offset per replica so every join's
selectivity and per-key cardinality are preserved — the result sets scale
exactly N-fold), then times a representative query subset at 1x and Nx
and prints the wall-clock ratio per query.  A shuffle-lean, scan-bound
plan should land near the data ratio (fixed overheads amortize, so often
below it); anything super-linear is a scale smell the bench at one SF
cannot see.

Caveat — CONTENT columns are replicated verbatim (only keys shift), so
content-keyed queries see a duplicate structure real growth would not
have: at Nx every document exists as N byte-identical copies, so MinHash
band buckets hold exact-duplicate clusters of size N.  Ratios for
content-keyed queries (dedup_minhash_lsh) therefore measure shuffle and
bucket-join VOLUME scaling, not natural bucket-size distribution;
join-key and aggregation queries are unaffected.

Usage: PYTHONPATH=/root/repo python3 scripts/scale_curve.py [N (default 4)]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_1_12_0_spark import registry
from flink_1_12_0_spark.session import get_spark

BASE = "/root/testdata/sf0.1"

#: table.column -> key DOMAIN.  Offsets are computed ONCE per domain
#: (max over every member column, any table) so that a foreign key and
#: the primary key it references shift by the SAME width — per-table
#: independent offsets would mis-align replicas wherever a referencing
#: column's max differs from the referenced key's max (true already for
#: embeddings.vec_id vs documents.doc_id in this fixture).
DOMAINS = {
    "customer.c_custkey": "custkey",
    "orders.o_custkey": "custkey",
    "orders.o_orderkey": "orderkey",
    "lineitem.l_orderkey": "orderkey",
    "lineitem.l_partkey": "partkey",
    "part.p_partkey": "partkey",
    "lineitem.l_suppkey": "suppkey",
    "supplier.s_suppkey": "suppkey",
    "events.event_id": "eventid",
    "events.user_id": "userid",
    "documents.doc_id": "docid",
    "embeddings.vec_id": "docid",  # vec ids index into the doc id space
}
KEYED = {}
for _tc in DOMAINS:
    _t, _c = _tc.split(".")
    KEYED.setdefault(_t, []).append(_c)
#: tiny dims replicated as-is (nation/region keys are referenced by the
#: offset tables' non-offset columns, so they must keep their key space)
VERBATIM = ["nation", "region"]

#: queries to time: scan+agg, join-heavy, window, dedup, corpus-stat
QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q9", "tpch_q18",
    "over_rank_fns", "dedup_minhash_lsh", "text_tfidf_topk",
    "tpcds_market_basket",
    # round-8 additions: constant-state bloom probe and the single-scan
    # BM25 pipeline (both should track the data ratio; bloom's build side
    # stays <=1024 rows at ANY N)
    "decontam_bloom_filter", "text_bm25_topk",
    # round-9 additions: the bottom-k quantile sketch (TakeOrdered build —
    # constant K out of every partition, should track the scan ratio),
    # and the two new heavy TPC-DS shapes (checkpointed fact grains —
    # should track the lineitem-orders join ratio, not a CTE-inlined
    # multiple of it)
    "sketch_quantiles_bottomk", "tpcds_cross_channel_intersect",
    "tpcds_return_chain_yoy",
    # late round-9 additions: MG heavy hitters (WindowGroupLimit-bounded
    # shard summaries), the q78/q4 checkpointed-grain shapes, and the
    # xxhash Bloom runtime-filter join (constant filter state)
    "sketch_heavy_hitters_mg", "tpcds_no_returns_channel_ratio",
    "tpcds_triple_channel_growth", "join_bloom_runtime_filter",
    # round-10 additions: the broadcast-weight classifier (one explode +
    # broadcast join + per-doc sum — should track the token-scan ratio),
    # the q95 grouped-HAVING semi-join chain, and the q72 (part, week)
    # co-partitioned inventory join
    "text_quality_classifier", "tpcds_multi_warehouse_ship",
    "tpcds_inventory_week_offset",
    # late round-10 additions: classifier training (driver-loop GD over
    # the long-form feature table) and the learned train-then-apply
    # pipeline; the streaming twin needs the directory-input _stream_dir
    # fix to see the Nx fixture at all
    "text_classifier_train_gd", "pipeline_classifier_train_apply",
    "stream_quality_classifier",
    # q39 shape: exact-integer variance grain + same-grain self-join
    "tpcds_inventory_variance_pair",
    # round-11 additions: IVFADC recall (cell-restricted ADC join — the
    # candidate stage should track cell-size growth; the exact arm is
    # 10 fixed queries so it tracks the corpus scan), the q51 cumulative
    # full-outer shape (item-hash partitioning reused end to end) and the
    # q23a double-CTE filter chain (checkpointed mined key sets feeding
    # two semi-join arms)
    "sim_ann_recall_ivfadc",
    "tpcds_cumulative_channel_fullouter",
    "tpcds_freq_best_basket",
    # stateless streaming ingest assignment (availableNow startup floor
    # dominates at small N; the map-only compute tracks the scan)
    "stream_ivf_ingest_assign",
    # BPE merge training: iterations run on the word-frequency table,
    # not the corpus — expect near-flat past the initial token scan
    "text_bpe_merges",
    # round-12 additions: the composed ANN pipeline (IVFADC shortlist ->
    # exact re-rank; the exact stage is shortlist-sized so the curve
    # should track the IVFADC candidate stage), BPE apply (vocab-grain
    # merges + ONE corpus join + symbol explode — should track the token
    # scan), and the bucketed catalog join (write cost scales with the
    # fact, the join consumes the pre-shuffled layout)
    "sim_ann_rerank_recall",
    "text_bpe_encode",
    "join_bucketed_colocated",
    # late round-12 additions: hybrid RRF (both arms are top-k machinery
    # over one corpus explode + one broadcast-queries embedding scan —
    # the fusion itself is constant-size), JL projection recall (a
    # stateless row-local map feeding the same brute-force top-k shape
    # as sim_cosine_topk — expect the N^2-ish candidate term of the
    # 5-query exact arm to dominate), and streaming BPE encode (map-only
    # ingest segmentation — the availableNow floor plus a token scan)
    "sim_hybrid_rrf",
    "sim_random_projection_recall",
    "stream_bpe_encode",
    # trained-PQ recall: training shuffles only (sub, cent, pos) partial
    # means under a broadcast codebook; the ADC stage is the pq_topk
    # all-candidate join (the documented unbucketed baseline — IVFADC is
    # the scale path), so expect the curve to track candidate volume
    "sim_ann_recall_pq_trained",
    # MMR diversification: one brute-force shortlist stage (tracks the
    # 4-query x N candidate scan), then every greedy step is
    # rank-list-sized — expect the curve to track the candidate stage
    "sim_mmr_diversify",
    # two-round PRF: both BM25 rounds + expansion mining derive from the
    # ONE checkpointed tf table — expect the token-scan ratio, not 2x it
    "text_bm25_prf",
    # the composed retrieval stack: after the two top-20 arms everything
    # is 4x10-row work — expect the curve to track the arms
    "sim_hybrid_mmr_pipeline",
    # standing-query routing at ingest: stateless row-local scoring
    # under a frozen dozen-row artifact — availableNow floor + token scan
    "stream_bm25_standing_queries",
    # round-13 additions: 3-arm RRF (adds the 16-dim projected arm — a
    # second broadcast-queries scan over the checkpointed projection —
    # on top of the hybrid shape; the double fuse stays rank-list-sized)
    # and the inverted standing-query route (Q=64: the artifact grows to
    # ~90 entries but scoring stays row-local — expect the
    # stream_bm25_standing_queries shape: availableNow floor + token
    # scan + the larger matched fan-out of the memory-sink drain)
    "sim_hybrid_rrf3",
    "stream_bm25_route_inverted",
    # the composed alerting row: routing + typed-Arrow Top-N state —
    # state stays Q x 3 at ANY corpus size, so the curve should track
    # the ingest token scan, not the state tier
    "stream_route_topn_standing",
    # semantic standing queries: stateless cell assign + watcher cosines
    # per row — expect the stream_ivf_ingest_assign shape (availableNow
    # floor + embedding scan)
    "stream_semantic_route_cells",
    # round-15 additions: the retention-safe broadcast route (foreachBatch
    # per-batch re-agg, ZERO streaming state — the curve should track the
    # token scan + parquet stage append, unlike the update-mode row's
    # 29.5 ratio from its corpus-proportional state store) and the
    # runtime-add tier (artifact build + control drain are corpus-
    # independent; the doc-side per-batch broadcast join tracks the scan)
    "stream_bm25_route_retained",
    "stream_route_runtime_add",
    # artifact-interval updatable routing: control drain + interval fold
    # are corpus-independent; the doc path is the retained-twin shape
    "stream_route_updatable_artifact",
    # semantic runtime adds: registration probes the 16-row codebook
    # (corpus-independent); the doc path is argmax + cell-join + cosine
    "stream_semantic_route_runtime_add",
    # composed runtime-add alerting product: the zero-state route stage
    # + Q x k Top-N — state stays Q x 3 at any corpus size, so the
    # curve should track the route stage's scan
    "stream_route_topn_runtime",
    # round-16 addition: semantic interval-artifact updatable routing —
    # control drain (probe vs the 16-row codebook + interval fold) is
    # corpus-independent; the doc path is argmax + broadcast cell-join
    # + interval gate, the stream_semantic_route_runtime_add shape
    "stream_semantic_route_updatable_artifact",
    # kafka-transport control: the topic produce/consume is rule-count-
    # bounded (corpus-independent); the doc path is the updatable gate's
    # — expect the stream_route_updatable curve
    "stream_route_updatable_kafka",
]


def build(spark, n: int, out: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for t in VERBATIM:
        shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    # one offset width per key DOMAIN = max over all member columns + 1
    width: dict[str, int] = {}
    frames = {t: spark.read.parquet(f"{BASE}/{t}.parquet") for t in KEYED}
    for tc, dom in DOMAINS.items():
        t, c = tc.split(".")
        mx = frames[t].agg(F.max(c)).collect()[0][0]
        width[dom] = max(width.get(dom, 0), int(mx) + 1)
    for t, keys in KEYED.items():
        df = frames[t]
        parts = []
        for i in range(n):
            p = df
            for k in keys:
                w = width[DOMAINS[f"{t}.{k}"]]
                p = p.withColumn(k, (F.col(k) + i * w).cast(df.schema[k].dataType))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def time_query(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or QUERIES  # optional subset: N name1 name2 ...
    out = f"/tmp/sg_scale_{n}x"
    registry.load_all()
    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    # rebuild unless EVERY table is present — a check on one file would
    # silently reuse a partial fixture from an interrupted build
    expected = [f"{out}/{t}.parquet" for t in list(KEYED) + VERBATIM]
    if not all(os.path.exists(p) for p in expected):
        print(f"building {n}x fixture at {out} ...", flush=True)
        build(spark, n, out)
    results = {}
    for q in names:
        # warm both catalogs (footer caches, codegen), then time
        t1 = time_query(spark, q, BASE)
        tn = time_query(spark, q, out)
        results[q] = {"t_1x": round(t1, 3), f"t_{n}x": round(tn, 3),
                      "ratio": round(tn / t1, 2)}
        print(f"{q:28s} 1x {t1:6.2f}s  {n}x {tn:6.2f}s  ratio {tn/t1:5.2f}",
              flush=True)
    print(json.dumps({"n": n, "results": results}))


if __name__ == "__main__":
    main()
