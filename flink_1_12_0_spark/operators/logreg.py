"""Linear text-classifier TRAINING as a driver-loop DataFrame algorithm.

``text_quality_classifier`` proves the INFERENCE path (broadcast weights,
one per-doc sum); this module trains the weights — full-batch gradient
descent for a logistic model, the fastText-style linear classifier's
learning rule (Joulin et al. 2016; classic logistic regression).

The reference has no ML library, but its DataSet API models iterative
algorithms as bounded driver-side loops (flink-java BulkIteration —
the same contract operators/kmeans.py and iterate_pagerank follow).
Each iteration here is two joins + two aggregations over the feature
table; the model (V weights + bias — constant size) is the only
driver-side state, exactly like kmeans centroids.

Determinism (oracle contract): ALL arithmetic is e6 integer fixed point —
features x_e6 = tf*1e6 DIV n_tokens, the sigmoid is the HARD sigmoid
sigma(z) = clamp(0.5 + z/4, 0, 1) (the standard piecewise-linear
surrogate used by quantized/embedded trainers), gradients truncate with
DIV — so Spark's driver loop and a DuckDB oracle that unrolls the same
iterations as CTEs produce BIT-IDENTICAL weights.  A float softmax would
train marginally better and be impossible to pin cross-engine; this is
the iterate_pagerank trade, applied to learning.

Update rule per iteration (full batch, N docs, learning rate LR_NUM/LR_DEN):

    z_d   = (sum_t w_t * x_dt) DIV 1e6 + b
    p_d   = clamp(500000 + z_d DIV 4, 0, 1e6)        -- hard sigmoid, e6
    r_d   = y_d * 1e6 - p_d                          -- residual, e6
    g_t   = ((sum_d r_d * x_dt) DIV 1e6) DIV N       -- weight gradient
    g_b   = (sum_d r_d) DIV N                        -- bias gradient
    w_t  += (g_t * LR_NUM) DIV LR_DEN ;  b += (g_b * LR_NUM) DIV LR_DEN

Scale notes (100 TB): the feature table is (doc, term, x) long form —
every iteration is a broadcast join of V weights plus term- and
doc-keyed aggregations; nothing driver-side grows with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

E6 = 1_000_000


def hard_sigmoid_e6(z_sql: str) -> str:
    """SQL fragment: hard-sigmoid probability in e6 fixed point."""
    return f"greatest(CAST(0 AS BIGINT), least(CAST({E6} AS BIGINT), " \
           f"500000 + ({z_sql}) DIV 4))"


def logreg_fit_e6(
    features: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    lr_num: int = 4,
    lr_den: int = 1,
    id_col: str = "doc_id",
    feat_col: str = "term",
    x_col: str = "x_e6",
    y_col: str = "y",
) -> list[tuple[str, int]]:
    """Train; return ``[(term, w_e6), ...]`` sorted by term plus a final
    ``("__bias__", b_e6)`` entry — the (term, weight) table
    ``text_quality_classifier``-style inference consumes.

    ``features``: long form (id, feat, x_e6) — absent (id, feat) pairs
    mean x = 0, so docs with no vocabulary hit still contribute to the
    bias gradient through ``labels``.

    SCALE BOUNDARY: the vocabulary list, the per-iteration weight
    DataFrame, and the gradient ``collect()`` are all DRIVER-side at
    O(V) — the right trade for a gating vocabulary (tens of terms, a
    constant-size model like kmeans centroids), and the bit-exact twin
    of the DuckDB unrolled-CTE oracle.  For a real fastText vocabulary
    (millions of hashed n-gram buckets) use :func:`logreg_fit_e6_df`,
    which keeps the model AS a DataFrame joined by key across
    iterations — O(1) driver state, identical math (equality-tested).
    """
    spark = features.sparkSession
    terms = [r[0] for r in
             features.select(feat_col).distinct().orderBy(feat_col).collect()]
    n = labels.count()
    if not terms or n == 0:
        raise ValueError("logreg_fit_e6: empty features or labels")
    if "__bias__" in terms:
        # the bias rides as a synthetic '__bias__' feature; a literal
        # feature of that name would silently merge its gradient with
        # the bias gradient and mis-train both
        raise ValueError("logreg_fit_e6: '__bias__' is a reserved "
                         "feature name")
    w = {t: 0 for t in terms}
    b = 0
    feats = features.select(
        F.col(id_col).alias("id"), F.col(feat_col).alias("feat"),
        F.col(x_col).cast("bigint").alias("x"),
    ).localCheckpoint(eager=True)
    labs = labels.select(
        F.col(id_col).alias("id"), F.col(y_col).cast("bigint").alias("y")
    ).localCheckpoint(eager=True)
    # bias folded in as a constant feature x = 1e6 on EVERY labeled doc:
    # its gradient (sum(r * 1e6) DIV 1e6) DIV n == (sum r) DIV n exactly
    # (the multiply/divide cancel in integers), so ONE aggregation pass
    # yields every weight gradient AND the bias gradient — without this
    # the residual pipeline executed twice per iteration
    aug = feats.unionByName(
        labs.selectExpr("id", "'__bias__' AS feat",
                        f"CAST({E6} AS BIGINT) AS x")
    ).localCheckpoint(eager=True)
    from flink_1_12_0_spark.streaming.core import local_table

    for _ in range(iters):
        # Arrow LocalRelation: a python-list createDataFrame costs
        # ~0.3-0.5 s of Python-RDD evaluation per broadcast — per GD
        # ITERATION here (round-15 local_table rationale)
        wdf = local_table(
            spark, [(t, w[t]) for t in terms], "feat string, w bigint")
        resid = (
            labs.alias("l")
            .join(
                feats.join(F.broadcast(wdf), "feat")
                .groupBy("id")
                .agg(F.expr(f"sum(w * x) DIV {E6}").alias("z0"))
                .alias("s"),
                F.expr("l.id = s.id"), "left")
            .selectExpr(
                "l.id AS id",
                f"l.y * {E6} - ({hard_sigmoid_e6(f'coalesce(s.z0, 0) + {b}')})"
                " AS r",
            )
        )
        grads = {
            r["feat"]: r["g"]
            for r in aug.join(resid, "id")
            .groupBy("feat")
            .agg(F.expr(f"(sum(r * x) DIV {E6}) DIV {n}").alias("g"))
            .collect()
        }
        for t in terms:
            w[t] += _trunc_div(grads.get(t, 0) * lr_num, lr_den)
        b += _trunc_div(grads.get("__bias__", 0) * lr_num, lr_den)
    return [(t, w[t]) for t in terms] + [("__bias__", b)]


def logreg_fit_e6_df(
    features: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    lr_num: int = 4,
    lr_den: int = 1,
    id_col: str = "doc_id",
    feat_col: str = "term",
    x_col: str = "x_e6",
    y_col: str = "y",
) -> DataFrame:
    """:func:`logreg_fit_e6` with the model kept AS a DataFrame across
    iterations — the train-at-scale variant: weights live as a (feat, w)
    table joined by key, the bias as its ``__bias__`` row, and nothing
    driver-side grows with the vocabulary (the only driver state is the
    loop counter; each iteration localCheckpoints the new weight table —
    V rows, the kmeans-centroid discipline without the collect).

    Bit-identical to the driver-loop variant (tested): z keeps the
    two-step truncation ``(sum w*x) DIV 1e6 + b`` — folding the bias
    into the feature sum BEFORE the DIV would truncate differently —
    and the weight update uses SQL DIV (truncating, the engines'
    convention).  Returns the final (feat, w) DataFrame including the
    ``__bias__`` row.
    """
    n = labels.count()
    if n == 0:
        raise ValueError("logreg_fit_e6_df: empty labels")
    feats = features.select(
        F.col(id_col).alias("id"), F.col(feat_col).alias("feat"),
        F.col(x_col).cast("bigint").alias("x"),
    ).localCheckpoint(eager=True)
    labs = labels.select(
        F.col(id_col).alias("id"), F.col(y_col).cast("bigint").alias("y")
    ).localCheckpoint(eager=True)
    if feats.limit(1).count() == 0:
        raise ValueError("logreg_fit_e6_df: empty features")
    if feats.where("feat = '__bias__'").limit(1).count() > 0:
        # a literal '__bias__' feature would put TWO rows behind the
        # bias lookup — the broadcast crossJoin would then duplicate
        # every residual and silently double every gradient
        raise ValueError("logreg_fit_e6_df: '__bias__' is a reserved "
                         "feature name")
    aug = feats.unionByName(
        labs.selectExpr("id", "'__bias__' AS feat",
                        f"CAST({E6} AS BIGINT) AS x")
    ).localCheckpoint(eager=True)
    sc = features.sparkSession.sparkContext
    w, w_ids = _ckpt_replace(
        feats.select("feat").distinct()
        .unionByName(feats.sparkSession.createDataFrame(
            [("__bias__",)], "feat string"))
        .selectExpr("feat", "CAST(0 AS BIGINT) AS w"),
        sc, prev_ids=frozenset())
    for _ in range(iters):
        bias = w.where("feat = '__bias__'").selectExpr("w AS b")
        z0 = (
            feats.join(w.where("feat <> '__bias__'"), "feat")
            .groupBy("id")
            .agg(F.expr(f"sum(w * x) DIV {E6}").alias("z0"))
        )
        resid = (
            labs.alias("l")
            .join(z0.alias("s"), F.expr("l.id = s.id"), "left")
            .crossJoin(F.broadcast(bias))
            .selectExpr(
                "l.id AS id",
                f"l.y * {E6} - ({hard_sigmoid_e6('coalesce(s.z0, 0) + b')})"
                " AS r",
            )
        )
        grads = (
            aug.join(resid, "id")
            .groupBy("feat")
            .agg(F.expr(f"(sum(r * x) DIV {E6}) DIV {n}").alias("g"))
        )
        w, w_ids = _ckpt_replace(
            w.join(grads, "feat", "left")
            .selectExpr(
                "feat",
                f"w + ((coalesce(g, CAST(0 AS BIGINT)) * {lr_num})"
                f" DIV {lr_den}) AS w",
            ),
            sc, prev_ids=w_ids)
    return w


def _persisted_rdd_ids(sc) -> frozenset[int]:
    # Reaches through py4j private internals (sc._jsc.sc()
    # .getPersistentRDDs() -> Scala Map) — behavior pinned against
    # pyspark 4.1.2 (tested in tests/test_logreg.py).  On a Spark
    # upgrade that removes these accessors, degrade to a bounded leak
    # (superseded checkpoints stay pinned for the session) rather than
    # failing the trainer: return an empty set so _ckpt_replace's
    # unpersist loop becomes a no-op.
    try:
        m = sc._jsc.sc().getPersistentRDDs()
        it = m.keysIterator()
    except Exception:  # AttributeError or py4j's Py4JError
        return frozenset()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return frozenset(out)


def _ckpt_replace(df: DataFrame, sc, prev_ids: frozenset[int]):
    """Eagerly localCheckpoint ``df`` and FREE the superseded
    iteration's checkpoint blocks (identified by ``prev_ids``, the RDD
    ids the previous call pinned).  Without this every iteration's V-row
    weight table stays pinned in executor storage for the session —
    only the latest is ever read again.  DataFrame.unpersist() is a
    no-op for localCheckpoint blocks (the cache belongs to the internal
    RDD, not the Dataset), so the release goes through the
    SparkContext's persistent-RDD registry.  Single-threaded trainer
    context: no concurrent persist can race into the before/after id
    diff.  Returns (checkpointed df, its RDD ids)."""
    before = _persisted_rdd_ids(sc)
    out = df.localCheckpoint(eager=True)
    new_ids = _persisted_rdd_ids(sc) - before
    try:
        registry = sc._jsc.sc().getPersistentRDDs()
        for rid in prev_ids:
            if registry.contains(rid):
                registry.apply(rid).unpersist(False)
    except Exception:  # private accessors gone: leak, don't fail (see
        pass           # _persisted_rdd_ids — pinned to pyspark 4.1.2)
    return out, new_ids


def _trunc_div(a: int, d: int) -> int:
    """Truncating integer division (toward zero) — Python's // floors,
    but Spark DIV and DuckDB // truncate; the driver-side model update
    must use the ENGINES' convention or negative gradients diverge."""
    q = abs(a) // abs(d)
    return q if (a >= 0) == (d >= 0) else -q
