#!/usr/bin/env python
"""Interleaved same-session perf A/B of the r18 ANN rewrites (r17 form
vs shipped form), min-of-N alternating arms so window noise hits both
sides equally.  Timing = full query build + collect, the bench's
methodology.  kmeans/IVF has its own script (ab_kmeans_literal.py).
Prints one JSON line.

Usage: PYTHONPATH=/root/repo python scripts/ab_ann_timing.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.ab_ann_equality import old_hybrid3_tail, old_ivfadc_sql

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("AB_PASSES", "3"))


def main() -> None:
    from flink_1_12_0_spark import registry
    from flink_1_12_0_spark.session import get_spark
    from flink_1_12_0_spark.tables import load_tables

    registry.load_all()
    spark = get_spark("ab-ann-timing")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)
    registry.QUERIES["tpch_q1"](spark, SF_DIR).collect()
    for tb in t.values():
        tb.count()

    from flink_1_12_0_spark.operators.retrieval import jl_project
    from flink_1_12_0_spark.queries.llm_corpus import SPARK_WORDS, _bm25_tf_sql
    from flink_1_12_0_spark.queries.llm_similarity import (
        _JL_IN_DIMS, _JL_OUT_DIMS, _RRF3W_WEIGHTS, _hybrid3_tail,
        _ivfadc_recall_sql)

    emb = t["embeddings"]

    def mk_proj():
        proj = jl_project(emb, _JL_IN_DIMS, _JL_OUT_DIMS).select(
            "vec_id", "p").localCheckpoint(eager=True)
        proj.createOrReplaceTempView("abt_proj")

    def run_h3_old(weights):
        tf = spark.sql(
            _bm25_tf_sql(SPARK_WORDS, "explode(w)", "size(w)")
        ).localCheckpoint(eager=True)
        tf.createOrReplaceTempView("abt_tf")
        mk_proj()
        spark.sql(old_hybrid3_tail("abt_tf", "abt_proj", weights)).collect()

    def run_h3_new(weights):
        mk_proj()
        spark.sql(_hybrid3_tail(
            "mt", "explode(split(qtext, ' '))", True, "abt_proj",
            weights=weights)).collect()

    arms = {
        "sim_ann_recall_ivfadc": (
            lambda: spark.sql(old_ivfadc_sql()).collect(),
            lambda: spark.sql(_ivfadc_recall_sql(True)).collect()),
        "sim_hybrid_rrf3": (
            lambda: run_h3_old((1, 1, 1)),
            lambda: run_h3_new((1, 1, 1))),
        "sim_hybrid_rrf3w": (
            lambda: run_h3_old(_RRF3W_WEIGHTS),
            lambda: run_h3_new(_RRF3W_WEIGHTS)),
    }

    out = {}
    for name, (old_fn, new_fn) in arms.items():
        t_old, t_new = 9e9, 9e9
        for _ in range(PASSES):
            spark.sparkContext.setJobDescription(f"ab-old:{name}")
            t0 = time.perf_counter(); old_fn()
            t_old = min(t_old, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"ab-new:{name}")
            t0 = time.perf_counter(); new_fn()
            t_new = min(t_new, time.perf_counter() - t0)
        out[name] = {"old": round(t_old, 3), "new": round(t_new, 3),
                     "speedup": round(t_old / t_new, 3)}
        print(name, out[name])
    t0 = time.perf_counter()
    registry.QUERIES["tpch_q6"](spark, SF_DIR).collect()
    out["q6_canary"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
