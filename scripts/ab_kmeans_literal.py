#!/usr/bin/env python
"""Equality + interleaved timing A/B of the r18 literal-codebook kmeans
(row-local argmax assign, collect-per-iteration means, zero
localCheckpoints) against the r17 form (broadcast-join assign + max_by
re-aggregation + per-iteration localCheckpoint), on the full
sim_ann_ivf_kmeans row shape.

Usage: PYTHONPATH=/root/repo python scripts/ab_kmeans_literal.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("AB_PASSES", "3"))


# ---- the r17 implementation, verbatim --------------------------------------
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = "sqrt(" + _DOT.format(a="{a}", b="{a}") + ")"
_COS = _DOT.format(a="{a}", b="{b}") + " / (" + _NORM.format(a="{a}") + " * " + _NORM.format(a="{b}") + ")"


def old_assign(vectors, cents, id_col, vec_col):
    cos = F.round(F.expr(_COS.format(a=vec_col, b="cvec")), 6)
    return (
        vectors.crossJoin(F.broadcast(cents))
        .select(id_col, vec_col, F.col("cent_id"), cos.alias("cos"))
        .groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.expr("max_by(cent_id, struct(cos, -cent_id))").alias("cent_id"),
        )
    )


def old_fit(vectors, k=8, iters=2, id_col="vec_id", vec_col="embedding"):
    seeds = vectors.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k)
    cents = seeds.select(
        (F.row_number().over(Window.orderBy(F.col(id_col))) - 1)
        .cast("int").alias("cent_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    for _ in range(iters):
        assigned = old_assign(vectors, cents, id_col, vec_col)
        cents = (
            assigned.select("cent_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("val"))
            .groupBy("cent_id")
            .agg(F.expr(
                "transform(array_sort(collect_list(struct(pos, val))), s -> s.val)"
            ).alias("cvec"))
        )
        cents = cents.localCheckpoint(eager=True)
    return cents


def old_topk(vectors, cents, query_pred, topk, id_col="vec_id",
             vec_col="embedding"):
    cells = old_assign(vectors, cents, id_col, vec_col)
    q = cells.where(query_pred).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        "cent_id")
    cos = F.round(F.expr(_COS.format(a="qvec", b=vec_col)), 6)
    scored = (
        q.join(cells, "cent_id")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("cand_id"),
                cos.alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "cand_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select("query_id", "cand_id", "cos_sim"))
# -----------------------------------------------------------------------------


def main() -> None:
    from flink_1_12_0_spark import registry
    from flink_1_12_0_spark.operators.kmeans import (ann_ivf_topk,
                                                     kmeans_cosine_fit)
    from flink_1_12_0_spark.session import get_spark
    from flink_1_12_0_spark.tables import load_tables

    registry.load_all()
    spark = get_spark("ab-kmeans-literal")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)
    registry.QUERIES["tpch_q1"](spark, SF_DIR).collect()
    for tb in t.values():
        tb.count()
    emb = t["embeddings"]

    def run_old():
        return old_topk(emb, old_fit(emb), "vec_id < 10", 5).orderBy(
            "query_id", F.desc("cos_sim"), "cand_id").collect()

    def run_new():
        return ann_ivf_topk(emb, kmeans_cosine_fit(emb, k=8, iters=2),
                            "vec_id < 10", 5).orderBy(
            "query_id", F.desc("cos_sim"), "cand_id").collect()

    # exact equality, value by value
    a, b = run_old(), run_new()
    same = len(a) == len(b) and all(ra == rb for ra, rb in zip(a, b))
    print("sim_ann_ivf_kmeans old vs new:", "EQUAL" if same else "DIFFER")
    if not same:
        for ra, rb in zip(a, b):
            if ra != rb:
                print("  ", ra, "!=", rb)
        sys.exit(1)
    co = sorted(old_fit(emb).collect(), key=lambda r: r["cent_id"])
    cn = sorted(kmeans_cosine_fit(emb).collect(), key=lambda r: r["cent_id"])
    same = all(ra == rb for ra, rb in zip(co, cn)) and len(co) == len(cn)
    print("centroids old vs new:", "EQUAL" if same else "DIFFER")

    # interleaved timing
    t_old, t_new = 9e9, 9e9
    for _ in range(PASSES):
        spark.sparkContext.setJobDescription("ab-old:kmeans")
        t0 = time.perf_counter(); run_old()
        t_old = min(t_old, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription("ab-new:kmeans")
        t0 = time.perf_counter(); run_new()
        t_new = min(t_new, time.perf_counter() - t0)
    t0 = time.perf_counter()
    registry.QUERIES["tpch_q6"](spark, SF_DIR).collect()
    q6 = round(time.perf_counter() - t0, 3)
    print(json.dumps({"old": round(t_old, 3), "new": round(t_new, 3),
                      "speedup": round(t_old / t_new, 3), "q6": q6}))


if __name__ == "__main__":
    main()
