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

Scale notes (100 TB): centroids are k x dim doubles — always broadcast;
assignment is map-side (`max_by` partial aggregation collapses the k
candidate rows per vector before the shuffle, so the exchange carries one
row per vector); the update shuffles only (k x dim) partial means.  Each
iteration is checkpointed (`localCheckpoint`) to cut lineage growth —
without it Catalyst re-derives every previous iteration per pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: cosine( a, b ) over array columns, JVM-side (zip_with + aggregate)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = "sqrt(" + _DOT.format(a="{a}", b="{a}") + ")"
_COS = _DOT.format(a="{a}", b="{b}") + " / (" + _NORM.format(a="{a}") + " * " + _NORM.format(a="{b}") + ")"


def unrolled_dot(a: str, b: str, dims: int) -> str:
    """``_DOT`` for arrays of exactly ``dims`` elements, written as a flat
    codegen-able expression (optimization r18, guide §4.1: higher-order
    ``aggregate``/``zip_with`` lambdas are interpreted per element —
    whole-stage codegen never compiles them).  Bit-identical to ``_DOT``
    on ``dims``-element inputs: the fold is the SAME left-to-right
    addition chain starting from an exact 0.0 (``((0.0 + p0) + p1) + …``),
    so every intermediate double matches the HOF fold's."""
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(dims))
    return f"(CAST(0.0 AS DOUBLE) + {terms})"


def unrolled_norm(a: str, dims: int) -> str:
    """``_NORM`` over a fixed-width array — sqrt of the unrolled dot."""
    return "sqrt(" + unrolled_dot(a, a, dims) + ")"


def unrolled_cos(a: str, b: str, dims: int, *,
                 norm_a: str | None = None, norm_b: str | None = None) -> str:
    """``_COS`` over fixed-width arrays.  ``norm_a``/``norm_b`` name
    PRE-PROJECTED norm columns (each computed once per row upstream via
    :func:`unrolled_norm`) so an N x k scoring join pays one dot per pair
    instead of three — the division ``dot / (na * nb)`` is arithmetic-
    identical to ``_COS`` because the hoisted norm is the same expression
    over the same row, just evaluated once."""
    na = norm_a if norm_a is not None else unrolled_norm(a, dims)
    nb = norm_b if norm_b is not None else unrolled_norm(b, dims)
    return f"{unrolled_dot(a, b, dims)} / ({na} * {nb})"


def _assign(vectors: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid (max cosine) per vector; ties → lower cent_id.
    Broadcast join + map-side max_by: the shuffle sees one row per vector."""
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
    seed's rank so the labeling is stable for any id distribution."""
    # orderBy().limit(k) compiles to TakeOrderedAndProject — a distributed
    # partial top-k, not a global single-task sort; the rank window then
    # runs over only k rows.
    from pyspark.sql.window import Window

    seeds = vectors.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k)
    cents = seeds.select(
        (F.row_number().over(Window.orderBy(F.col(id_col))) - 1)
        .cast("int")
        .alias("cent_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    for _ in range(iters):
        assigned = _assign(vectors, cents, id_col, vec_col)
        cents = (
            assigned.select("cent_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("val"))
            .groupBy("cent_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, val))), s -> s.val)"
                ).alias("cvec")
            )
        )
        # truncate lineage: k x dim rows, trivially cheap to materialize
        cents = cents.localCheckpoint(eager=True)
    return cents


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
