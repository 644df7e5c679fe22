"""K-means training for IVF ANN — iterative algorithm as a driver loop.

The reference has no ML library in scope, but its DataSet API models
iterative algorithms via driver-side loops over bounded data
(flink-java BulkIteration lineage, SURVEY §2.11 Iterate — we follow the
documented Spark equivalent: a driver loop over DataFrame ops).  This
module trains spherical k-means (cosine assignment, per-dimension mean
update) to supply *learned* IVF centroids for the ANN tier — replacing
`sim_ann_ivf`'s fixed seed cells with a real Lloyd fit.

Determinism (oracle contract): seeds are the k lowest-id vectors; cosine
scores and centroid components are rounded to 6dp each iteration; ties
break to the lower centroid id — so Spark and the DuckDB oracle (same
iterations unrolled in SQL) converge to identical cells.

Scale notes (100 TB): centroids are k x dim doubles — bounded, so they
ride IN the plan as a literal codebook (the stream_ivf_ingest_assign /
semantic_route_cells broadcast-artifact pattern; optimization r18):
assignment is a stateless ROW-LOCAL argmax — no join, no exchange, no
per-iteration localCheckpoint job — and each Lloyd iteration runs exactly
ONE distributed job (the per-dimension mean aggregation, whose exchange
carries k x dim partial aggregates after map-side partial aggregation).
The r17 shape (broadcast-join assign + max_by re-aggregation + posexplode
means + localCheckpoint per iteration) paid 4 exchanges and 2 extra jobs
per iteration for the same bounded artifact; measured r18 on the full
graded row (fit + cell top-k, interleaved min-of-3 A/B at sf0.1):
2.49 s -> 1.81 s (1.38x), outputs bit-identical
(scripts/ab_kmeans_literal.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: cosine( a, b ) over array columns, JVM-side (zip_with + aggregate)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = "sqrt(" + _DOT.format(a="{a}", b="{a}") + ")"
_COS = _DOT.format(a="{a}", b="{b}") + " / (" + _NORM.format(a="{a}") + " * " + _NORM.format(a="{b}") + ")"


def _collect_cents(cents: DataFrame) -> list[tuple[int, list[float]]]:
    """A centroid TABLE collected to its bounded [(cent_id, cvec)] form —
    k x dim doubles, the documented broadcast-artifact size (module
    docstring).  float() widens float32 exactly, so the literal re-inline
    is value-exact."""
    return sorted(
        (int(r["cent_id"]), [float(v) for v in r["cvec"]])
        for r in cents.select("cent_id", "cvec").collect())


def _py_norm(cv: Sequence[float]) -> float:
    """``_NORM`` of a driver-resident vector, replicating Spark's fold
    exactly: left-to-right double multiply-adds from 0.0, then the
    correctly-rounded IEEE sqrt both engines share — the literal
    re-inline is therefore BIT-identical to evaluating ``_NORM`` on the
    executor (the probe_cells precedent, minus any rounding step)."""
    import math

    acc = 0.0
    for v in cv:
        acc = acc + float(v) * float(v)
    return math.sqrt(acc)


def _argmax_cell_expr(cent_rows: Sequence[tuple[int, Sequence[float]]],
                      vec_col: str) -> str:
    """Row-local nearest-centroid argmax over an inlined codebook:
    ``greatest`` over per-centroid struct(6dp cosine, -cent_id) — ties to
    the LOWER cent_id, exactly the max_by(cent_id, struct(cos, -cent_id))
    convention the r17 broadcast join used (and the
    stream_ivf_ingest_assign graded pattern; greatest and array_max share
    the same lexicographic struct comparison, and -cent_id is distinct so
    no two structs compare equal).

    Each centroid's NORM is precomputed driver-side (:func:`_py_norm`,
    bit-identical) and inlined as one double literal, so a row pays one
    dot fold per centroid plus its own norm instead of three folds per
    (row, centroid) pair.  Two losing r18 prototypes bound this design:
    the Column-API form (`F.lit(list)` per centroid) paid ~1 s of py4j
    per-element literal construction per plan, and an `array_max(
    transform(...))` codebook re-derived every centroid norm per row —
    measured 0.388 s vs 0.70 s vs 0.287-warm/2.8-fresh for the full
    assign noop at sf0.1."""
    nv = "sqrt(" + _DOT.format(a=vec_col, b=vec_col) + ")"
    structs = []
    for cid, cv in cent_rows:
        arr = "array(" + ",".join(
            f"CAST({float(v)!r} AS DOUBLE)" for v in cv) + ")"
        dot = _DOT.format(a=vec_col, b=arr)
        cn = f"CAST({_py_norm(cv)!r} AS DOUBLE)"
        structs.append(
            f"named_struct('cos', round({dot} / ({nv} * {cn}), 6), "
            f"'ncid', {-int(cid)})")
    if len(structs) == 1:
        best = structs[0]
    else:
        best = "greatest(" + ", ".join(structs) + ")"
    return f"CAST(-(({best}).ncid) AS INT)"


def _assign_rows(vectors: DataFrame,
                 cent_rows: Sequence[tuple[int, Sequence[float]]],
                 id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid (max cosine) per vector against an already-
    collected codebook; ties → lower cent_id.  Stateless row-local select:
    no join, no shuffle (guide §2.4 — the r17 form shuffled one row per
    vector through a max_by re-aggregation to pick the same argmax)."""
    return vectors.selectExpr(
        id_col, vec_col,
        _argmax_cell_expr(cent_rows, vec_col) + " AS cent_id")


def _assign(vectors: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment against a centroid TABLE: collects the
    bounded codebook (k x dim — every caller's contract) and assigns
    row-locally.  Output columns/types and the (6dp cosine, lower-id
    tiebreak) selection are identical to the r17 broadcast-join +
    max_by form — pinned by tests/test_dedup_ann_api.py."""
    return _assign_rows(vectors, _collect_cents(cents), id_col, vec_col)


def kmeans_cosine_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's algorithm, spherical variant: returns (cent_id int,
    cvec array<double>).  Seeds = the k lowest-id vectors (by ORDER BY,
    not ``id < k`` — ids need not be contiguous from 0); cent_id is the
    seed's rank so the labeling is stable for any id distribution.

    Per iteration: ONE distributed job — the row-local cell argmax feeds
    the per-dimension mean aggregation (posexplode grain, round(avg, 6)
    per (cent_id, pos) — byte-identical arithmetic to the r17 form), and
    the k x dim result is collected straight into the next iteration's
    codebook literal instead of a localCheckpoint + re-broadcast."""
    # orderBy().limit(k) compiles to TakeOrderedAndProject — a distributed
    # partial top-k, not a global single-task sort.
    seeds = vectors.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k).collect()
    seeds = sorted(seeds, key=lambda r: r[id_col])
    # float() widens float32 exactly — same doubles as CAST(... AS DOUBLE)
    cent_rows: list[tuple[int, list[float]]] = [
        (i, [float(v) for v in r[vec_col]]) for i, r in enumerate(seeds)]
    for _ in range(iters):
        assigned = _assign_rows(vectors, cent_rows, id_col, vec_col)
        means = (
            assigned.select("cent_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("val"))
            .groupBy("cent_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, val))), s -> s.val)"
                ).alias("cvec")
            )
        ).collect()
        cent_rows = sorted(
            (int(r["cent_id"]), [float(v) for v in r["cvec"]]) for r in means)
    from flink_1_12_0_spark.streaming.core import local_table

    return local_table(
        vectors.sparkSession,
        cent_rows, "cent_id int, cvec array<double>")


def ivf_cells(
    vectors: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final inverted-file assignment: (id, vec, cent_id) — downstream ANN
    search shuffles once on cent_id and stays cell-local."""
    return _assign(vectors, cents, id_col, vec_col)


def ann_ivf_topk(
    vectors: DataFrame,
    cents: DataFrame,
    query_pred: str,
    topk: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cell-local cosine top-k: queries (rows matching ``query_pred``)
    search only their own IVF cell."""
    cells = ivf_cells(vectors, cents, id_col, vec_col)
    q = cells.where(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "cent_id",
    )
    cos = F.round(F.expr(_COS.format(a="qvec", b=vec_col)), 6)
    scored = (
        q.join(cells, "cent_id")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("cand_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "cand_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select("query_id", "cand_id", "cos_sim")
    )
