"""Retrieval-composition operators: rank fusion + random projection.

The graded queries (``sim_hybrid_rrf``, ``sim_random_projection_recall``)
prove the math against DuckDB oracles; THIS module is the library surface
over ANY ranked lists / vector table — the sketches.py-style promotion
applied to the retrieval tier (same discipline as operators/text.py and
operators/ann.py).  Each function is the same math as its graded twin
(equality-tested in tests/test_dedup_ann_api.py) but generic over column
names, arm count, and dimensions.

Design rules shared with the graded tier:

- fusion contributions are ``round(1e6 / (k0 + rank))`` INTEGERS, so the
  fused score is an exact integer SUM (order-free across engines and
  partitionings); ties break on the item id,
- the projection matrix is deterministic (md5 parity -> +-1) and each
  projected coordinate is one FIXED left-to-right +- expression chain —
  no aggregation anywhere in the projection, so the doubles are
  bit-identical across engines and partitionings,
- fusion inputs are per-arm top-k lists: the expensive work stays inside
  each arm's own top-k machinery, and the fuse joins rank-list-sized
  frames (at 100 TB: per-query lists of 10-100 rows, not corpora).

Papers: Cormack, Clarke, Buettcher SIGIR'09 (RRF); Achlioptas 2003
(database-friendly random projections).
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def jl_sign(d: int, j: int, prefix: str = "jl") -> int:
    """The deterministic +-1 projection entry for input dim ``d``, output
    dim ``j`` — md5 parity, the cross-engine-safe stand-in for an RNG
    (the MinHash/Bloom/CMS seeding discipline)."""
    h = hashlib.md5(f"{prefix}:{d}:{j}".encode()).digest()[0]
    return 1 if h % 2 == 0 else -1


def jl_project_exprs(in_dims: int, out_dims: int, vec_col: str = "embedding",
                     one_based: bool = False,
                     prefix: str = "jl") -> list[str]:
    """The ``out_dims`` projected-coordinate SQL expressions: each a
    fixed-order +- chain over ``CAST(vec[d] AS DOUBLE)`` starting from an
    exact ``0e0``, so evaluation order (hence the float result) is pinned
    by the expression tree itself.  ``one_based`` emits 1-based indexing
    (DuckDB) instead of Spark's 0-based."""
    out = []
    for j in range(out_dims):
        terms = []
        for d in range(in_dims):
            idx = d + 1 if one_based else d
            sgn = "+" if jl_sign(d, j, prefix) > 0 else "-"
            terms.append(f"{sgn} CAST({vec_col}[{idx}] AS DOUBLE)")
        out.append("(0e0 " + " ".join(terms) + ")")
    return out


def jl_project(df: DataFrame, in_dims: int, out_dims: int,
               vec_col: str = "embedding", out_col: str = "p",
               prefix: str = "jl") -> DataFrame:
    """Johnson-Lindenstrauss +-1 projection as a stateless row-local map:
    appends ``out_col`` = the ``out_dims``-dim projected array<double>.
    The matrix lives in the plan (the moral of a broadcast) — no join, no
    shuffle, no Python; compose the output with any of the ann.py paths
    (cosine_topk for the recall receipt, sign-LSH/IVF for candidates)."""
    exprs = jl_project_exprs(in_dims, out_dims, vec_col, prefix=prefix)
    return df.withColumn(out_col, F.expr("array(" + ", ".join(exprs) + ")"))


def mmr_diversify(shortlist: DataFrame, vectors: DataFrame, k: int = 3,
                  lam: tuple[int, int] = (7, 3),
                  query_col: str = "query_id", id_col: str = "cand_id",
                  rel_col: str = "rel_e6", vec_id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Greedy Maximal Marginal Relevance over a relevance-scored
    shortlist (query, id, rel_e6): ``k`` sequential integer-argmax picks
    with mmr = lam[0]*rel_e6 - lam[1]*max(sim_e6 to already picked) —
    the graded sim_mmr_diversify math generalized to any k / lambda /
    columns (lam=(7,3) is lambda=0.7 scaled x10; pick 1 is pure
    relevance).  The pairwise-sim table is built ONCE (shortlist-sized
    join through the vectors) and each greedy step touches only
    rank-list-sized frames — the loop is driver-side but every iteration
    is O(shortlist) rows regardless of corpus size.  Every shortlist id
    must resolve in ``vectors`` (checked — a missing vector would
    otherwise silently drop candidates from picks 2..k through the
    inner psim joins).  Returns (query, pick, id, mmr_e6)."""
    if k < 1:
        raise ValueError(f"mmr_diversify: k must be >= 1, got {k}")
    sl = shortlist.select(
        F.col(query_col).alias("q"), F.col(id_col).alias("c"),
        F.col(rel_col).alias("rel")).localCheckpoint(eager=True)
    missing = (
        sl.select("c").distinct()
        .join(vectors.select(F.col(vec_id_col).alias("c")), "c",
              "left_anti").limit(1).count()
    )
    if missing:
        raise ValueError(
            "mmr_diversify: shortlist contains ids with no vector row — "
            "the similarity joins would silently drop them")
    # the repo-wide cosine fragment (one definition outside the pinned
    # graded texts — ann.py re-exports kmeans._COS)
    from flink_1_12_0_spark.operators.ann import COS
    cos = COS.format(a="e1", b="e2")
    # one triangle (pc < po) of the symmetric pair matrix is scored, then
    # mirrored — cosine is symmetric, so this halves the expensive
    # zip_with/aggregate evaluations and the checkpointed psim size
    tri = (
        sl.select("q", F.col("c").alias("pc"))
        .join(sl.select(F.col("q").alias("q2"), F.col("c").alias("po")),
              (F.col("q") == F.col("q2")) & (F.col("pc") < F.col("po")))
        .join(vectors.select(F.col(vec_id_col).alias("v1"),
                             F.col(vec_col).alias("e1")),
              F.col("pc") == F.col("v1"))
        .join(vectors.select(F.col(vec_id_col).alias("v2"),
                             F.col(vec_col).alias("e2")),
              F.col("po") == F.col("v2"))
        .select(F.col("q"), F.col("pc").alias("c"), F.col("po").alias("o"),
                F.expr(f"CAST(round(({cos}) * 1000000) AS BIGINT)")
                .alias("sim_e6"))
    )
    psim = tri.unionByName(
        tri.select("q", F.col("o").alias("c"), F.col("c").alias("o"),
                   "sim_e6")).localCheckpoint(eager=True)
    w = Window.partitionBy("q").orderBy(F.desc("mmr"), "c")
    first = (
        sl.select("q", "c",
                  (F.lit(lam[0]) * F.col("rel")).cast("bigint").alias("mmr"))
        .withColumn("rk", F.row_number().over(w)).where("rk = 1")
        .select("q", "c", "mmr", F.lit(1).alias("pick"))
    )
    picked = first
    for t in range(2, k + 1):
        pk = picked.select("q", F.col("c").alias("o"))
        pen = (psim.join(pk, ["q", "o"])
               .groupBy("q", "c").agg(F.max("sim_e6").alias("pen")))
        rem = sl.join(picked.select("q", "c"), ["q", "c"], "left_anti")
        step = (
            rem.join(pen, ["q", "c"])
            .select("q", "c",
                    (F.lit(lam[0]) * F.col("rel")
                     - F.lit(lam[1]) * F.col("pen")).cast("bigint")
                    .alias("mmr"))
            .withColumn("rk", F.row_number().over(w)).where("rk = 1")
            .select("q", "c", "mmr", F.lit(t).alias("pick"))
        )
        picked = picked.unionByName(step).localCheckpoint(eager=True)
    return picked.select(
        F.col("q").alias(query_col), "pick", F.col("c").alias(id_col),
        F.col("mmr").alias("mmr_e6"))


def rrf_fuse(arms: Sequence[DataFrame], names: Sequence[str] | None = None,
             topk: int = 5, k0: int = 60, max_rank: int | None = 20,
             query_col: str = "query_id", id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists, each (query, id, rank):
    fused score = sum over arms of ``round(1e6 / (k0 + rank))`` (integer
    — exact, order-free), items present in any arm's top-``max_rank``
    compete, ties break on ``id_col``.  Returns (query, rank, id, rrf_e6,
    <name>_rank per arm) — the graded sim_hybrid_rrf shape generalized to
    N arms.  The join chain is FULL OUTER on (query, id): every side is a
    per-query top-``max_rank`` list, so at any corpus scale the fuse
    itself touches only rank-list-sized data."""
    if names is None:
        names = [f"arm{i}" for i in range(len(arms))]
    if len(names) != len(arms) or len(arms) == 0:
        raise ValueError("rrf_fuse needs >=1 arm and one name per arm")
    if len(set(names)) != len(names):
        # a duplicate name would surface later as an opaque
        # AMBIGUOUS_REFERENCE inside the join chain
        raise ValueError(f"rrf_fuse: arm names must be unique, got {names}")
    fused = None
    for name, arm in zip(names, arms):
        a = arm if max_rank is None else arm.where(
            F.col(rank_col) <= max_rank)
        a = a.select(
            query_col, id_col,
            F.expr(f"CAST(round(1e6 / ({k0}e0 + {rank_col})) AS BIGINT)")
            .alias(f"__c_{name}"),
            F.col(rank_col).cast("bigint").alias(f"{name}_rank"))
        fused = a if fused is None else fused.join(
            a, [query_col, id_col], "full_outer")
    score = reduce(
        lambda x, y: x + y,
        [F.coalesce(F.col(f"__c_{n}"), F.lit(0).cast("bigint"))
         for n in names]).alias("rrf_e6")
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf_e6"), id_col)
    return (
        fused.select(query_col, id_col, score,
                     *[f"{n}_rank" for n in names])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(query_col, "rank", id_col, "rrf_e6",
                *[f"{n}_rank" for n in names])
    )
