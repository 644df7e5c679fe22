#!/usr/bin/env python
"""Dump plans/r18/<name>_{before,after}.txt for every query the r18
optimization round touched: the before arm is the r17 Spark text/shape
reconstructed verbatim (scripts/ab_ann_equality.py builders + the r17
kmeans form from scripts/ab_kmeans_literal.py), the after arm is the
shipped query.  Run: PYTHONPATH=/root/repo python scripts/dump_r18_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.ab_ann_equality import old_hybrid3_tail, old_ivfadc_sql
from scripts.ab_kmeans_literal import old_fit, old_topk

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r18")


def fmt(df) -> str:  # noqa: ANN001
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from flink_1_12_0_spark import registry
    from flink_1_12_0_spark.operators.retrieval import jl_project
    from flink_1_12_0_spark.queries.llm_corpus import SPARK_WORDS, _bm25_tf_sql
    from flink_1_12_0_spark.queries.llm_similarity import (
        _JL_IN_DIMS, _JL_OUT_DIMS, _RRF3W_WEIGHTS)
    from flink_1_12_0_spark.session import get_spark
    from flink_1_12_0_spark.tables import load_tables

    registry.load_all()
    spark = get_spark("dump-r18-plans")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)
    os.makedirs(OUT, exist_ok=True)

    def dump(name: str, arm: str, df) -> None:  # noqa: ANN001
        path = os.path.join(OUT, f"{name}_{arm}.txt")
        with open(path, "w") as f:
            f.write(fmt(df))
        print("wrote", path)

    emb = t["embeddings"]

    # sim_ann_ivf_kmeans — r17: broadcast-join assign + max_by agg +
    # posexplode means + localCheckpoint/iter; r18: literal-codebook
    # row-local argmax, one job per iteration
    dump("sim_ann_ivf_kmeans", "before",
         old_topk(emb, old_fit(emb), "vec_id < 10", 5).orderBy(
             "query_id", F.desc("cos_sim"), "cand_id"))
    dump("sim_ann_ivf_kmeans", "after",
         registry.QUERIES["sim_ann_ivf_kmeans"](spark, SF_DIR))

    # sim_ann_recall_ivfadc — r17: two rank-1 windows (512k-row shuffle);
    # r18: max_by partial aggregations + hoisted norms
    dump("sim_ann_recall_ivfadc", "before", spark.sql(old_ivfadc_sql()))
    dump("sim_ann_recall_ivfadc", "after",
         registry.QUERIES["sim_ann_recall_ivfadc"](spark, SF_DIR))

    # sim_hybrid_rrf3 / rrf3w — r17: corpus-wide tf GROUP BY +
    # localCheckpoint; r18: matched-term sliver CTEs inside the tail
    tf = spark.sql(
        _bm25_tf_sql(SPARK_WORDS, "explode(w)", "size(w)")
    ).localCheckpoint(eager=True)
    tf.createOrReplaceTempView("pl_tf")
    proj = jl_project(emb, _JL_IN_DIMS, _JL_OUT_DIMS).select(
        "vec_id", "p").localCheckpoint(eager=True)
    proj.createOrReplaceTempView("pl_proj")
    dump("sim_hybrid_rrf3", "before",
         spark.sql(old_hybrid3_tail("pl_tf", "pl_proj", (1, 1, 1))))
    dump("sim_hybrid_rrf3", "after",
         registry.QUERIES["sim_hybrid_rrf3"](spark, SF_DIR))
    dump("sim_hybrid_rrf3w", "before",
         spark.sql(old_hybrid3_tail("pl_tf", "pl_proj", _RRF3W_WEIGHTS)))
    dump("sim_hybrid_rrf3w", "after",
         registry.QUERIES["sim_hybrid_rrf3w"](spark, SF_DIR))


if __name__ == "__main__":
    main()
