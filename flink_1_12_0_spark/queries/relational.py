"""Core relational shapes: Calc (project+filter), Values, Correlate/UNNEST,
sort/limit, distinct.

Reference: Calc (StreamExecCalc.scala:39 / BatchExecCalc.scala — fused
project+filter, codegen'd), Values (BatchExecValues.scala:88), Correlate /
UNNEST (BatchExecCorrelate.scala, LogicalUnnestRule.scala:37), Sort
(BatchExecSort.scala:50 over BinaryExternalSorter.java:70), SortLimit
(BatchExecSortLimit.scala:52), Distinct (DataSet DistinctOperator).

Spark-first: Catalyst fuses select+where into one WholeStageCodegen span
exactly like the reference's Calc; UNNEST -> explode/posexplode; sort+limit
-> TakeOrderedAndProject (per-partition top-k, no global sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.queries import register_sql
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


@query(
    "calc_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)           AS net_price,
           l_extendedprice * l_tax                      AS tax_amt,
           upper(l_returnflag)                          AS flag,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'large' END                        AS qty_band
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount > 0.08
    ORDER BY l_orderkey, l_linenumber
    """,
)
def calc_project_filter(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_discount") > 0.08)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            (F.col("l_extendedprice") * F.col("l_tax")).alias("tax_amt"),
            F.upper("l_returnflag").alias("flag"),
            F.when(F.col("l_quantity") < 10, "small")
            .when(F.col("l_quantity") < 30, "mid")
            .otherwise("large")
            .alias("qty_band"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "values_inline",
    oracle="""
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, NULL)) AS t(id, tag)
    ORDER BY id
    """,
)
def values_inline(spark, sf_dir):
    """Inline VALUES relation (BatchExecValues) — createDataFrame."""
    load_tables(spark, sf_dir)
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id int, tag string"
    ).orderBy("id")


@query(
    "unnest_explode",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part WHERE p_partkey < 100
    ORDER BY p_partkey, word
    """,
)
def unnest_explode(spark, sf_dir):
    """UNNEST -> explode (reference LogicalUnnestRule -> Correlate)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .where(F.col("p_partkey") < 100)
        .select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))
        .orderBy("p_partkey", "word")
    )


@query(
    "unnest_posexplode",
    oracle="""
    SELECT p_partkey,
           CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INT) AS pos,
           unnest(string_split(p_name, ' ')) AS word
    FROM part WHERE p_partkey < 100
    ORDER BY p_partkey, pos
    """,
)
def unnest_posexplode(spark, sf_dir):
    """UNNEST WITH ORDINALITY -> posexplode."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .where(F.col("p_partkey") < 100)
        .select(
            "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
        )
        .orderBy("p_partkey", "pos")
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 10
    """,
)
def sort_limit_offset(spark, sf_dir):
    """ORDER BY + LIMIT/OFFSET -> TakeOrderedAndProject (per-partition
    top-k then merge: no global sort — reference SortLimitOperator does
    the same local/global split)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(25)
    )


@query(
    "distinct_project",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def distinct_project(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "scalar_subquery_filter",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (
        -- exact integer cent sum, then DOUBLE-literal arithmetic (1.8e0 /
        -- 100e0): both engines run the IDENTICAL IEEE double ops on the
        -- identical exact integers, so the membership threshold is
        -- bit-identical.  Decimal literals (1.8/100.0) would make Spark
        -- evaluate in DecimalType (fixed-scale rounding) while DuckDB
        -- divides to DOUBLE — thresholds ~1e-6 apart can flip a 2dp
        -- c_acctbal's membership (ADVICE r6).
        SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) * 1.8e0
               / (count(*) * 100e0)
        FROM customer)
    ORDER BY c_custkey
    """,
)
def scalar_subquery_filter(spark, sf_dir):
    """Uncorrelated scalar subquery in a filter (reference subquery_rewrite
    program phase; Catalyst RewritePredicateSubquery)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (
            SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) * 1.8e0
                   / (count(*) * 100e0)
            FROM customer)
        ORDER BY c_custkey
        """
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (SELECT doc_id,
                      CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS k
               FROM documents WHERE doc_id < 120),
         b AS (SELECT doc_id AS b_id,
                      CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS k
               FROM documents WHERE doc_id < 120)
    SELECT a.doc_id, b.b_id
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k AND a.doc_id < b.b_id
    ORDER BY a.doc_id, b.b_id
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join — Flink's IS NOT DISTINCT FROM comparison
    (FlinkSqlOperatorTable) maps to Spark's <=> operator: NULL keys match
    each other, unlike plain equality.  Plans as a regular hash join on
    the null-safe key (no null-row fallback to nested loop)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH a AS (SELECT doc_id,
                          CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS k
                   FROM documents WHERE doc_id < 120),
             b AS (SELECT doc_id AS b_id,
                          CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS k
                   FROM documents WHERE doc_id < 120)
        SELECT a.doc_id, b.b_id
        FROM a JOIN b ON a.k <=> b.k AND a.doc_id < b.b_id
        ORDER BY a.doc_id, b.b_id
        """
    )


register_sql(
    "sort_nulls_ordering",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN NULL ELSE n_chars END AS v
    FROM documents WHERE doc_id < 60
    ORDER BY v DESC NULLS LAST, doc_id
    """,
)


# ---- bounded iteration with a termination criterion --------------------------
# Driver-proof of the DataSet bulk-iteration surface (reference:
# DataSet.iterateWithTermination, flink-java
# .../api/java/operators/IterativeDataSet.java — the loop ends when the
# termination set is EMPTY, not after a fixed budget).  The workload is
# breadth-first shortest hops over a deterministic binary-tree edge set on
# the documents id domain (child edges id -> 2id / 2id+1): BFS depth =
# floor(log2(max_id)) (~9 levels at the grading SF, ~12 at bench SF), so
# the convergence probe does real work.  Each round is one equi-join +
# one anti-join, lineage-truncated; the oracle is an independent DuckDB
# recursive-CTE BFS.  Scale: the frontier/visited sets are DataFrames —
# every round is fully distributed, the driver sees only an emptiness
# boolean per round (same posture as operators/graph.connected_components).
_BFS_ORACLE = """
WITH RECURSIVE mx AS (SELECT max(doc_id) AS m FROM documents),
edges AS (
    SELECT doc_id AS src, doc_id * 2 AS dst FROM documents, mx
    WHERE doc_id >= 1 AND doc_id * 2 <= m
    UNION ALL
    SELECT doc_id, doc_id * 2 + 1 FROM documents, mx
    WHERE doc_id >= 1 AND doc_id * 2 + 1 <= m),
bfs(id, hops) AS (
    SELECT CAST(1 AS BIGINT), 0
    UNION
    SELECT e.dst, b.hops + 1 FROM bfs b JOIN edges e ON e.src = b.id)
SELECT id, min(hops) AS hops FROM bfs GROUP BY id ORDER BY id
"""


@query("iterate_bfs_hops", oracle=_BFS_ORACLE)
def iterate_bfs_hops(spark, sf_dir):
    """BFS hop counts via iterate_with_termination: frontier expansion
    joins per round until the new-vertex set is empty (Flink's
    empty-termination-set contract, IterativeDataSet.java)."""
    from flink_1_12_0_spark.api.datastream import (
        iterate_with_termination,
        truncate_lineage,
    )

    load_tables(spark, sf_dir)
    edges = truncate_lineage(spark.sql(
        """
        WITH mx AS (SELECT max(doc_id) AS m FROM documents)
        SELECT doc_id AS src, doc_id * 2 AS dst FROM documents, mx
        WHERE doc_id >= 1 AND doc_id * 2 <= m
        UNION ALL
        SELECT doc_id, doc_id * 2 + 1 FROM documents, mx
        WHERE doc_id >= 1 AND doc_id * 2 + 1 <= m
        """
    ))
    init = spark.range(1, 2).select(
        F.col("id").cast("bigint").alias("id"),
        F.lit(0).alias("hops"),
        F.lit(1).alias("f"),
    )

    def body(cur, i):
        frontier = cur.filter(F.col("f") == 1).select("id")
        nxt = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new = truncate_lineage(
            nxt.join(cur.select("id"), "id", "left_anti")
            .select("id", F.lit(i + 1).alias("hops"), F.lit(1).alias("f"))
        )  # materialized once: both the state union AND the isEmpty
        #    termination probe read it, instead of re-running the
        #    join/anti-join a second time per round
        state = cur.select("id", "hops", F.lit(0).alias("f")).unionByName(new)
        return state, new

    final = iterate_with_termination(init, body, max_iterations=64)
    return final.select("id", "hops").orderBy("id")


# ---- bounded iteration, fixed budget (PageRank) -------------------------------
# Driver-proof of the fixed-budget bulk iteration (reference:
# DataSet.iterate(n), IterativeDataSet.java — the companion to
# iterate_bfs_hops' termination-criterion variant above): 5 PageRank
# rounds (damping 0.85) over the undirected binary-heap tree on the
# documents id domain.  ALL arithmetic is e9 fixed point on BIGINTs —
# contribution = (r*85) DIV (deg*100), integer truncation identical in
# Spark and DuckDB — so every round is exact integer math: order-free,
# engine-stable, no float taint.  Oracle = the same 5 rounds unrolled as
# DuckDB CTEs (r0..r5).  Scale: edges/deg are localCheckpointed once;
# each round is one join + one aggregate, lineage-truncated by
# iterate_bounded; the driver holds no data.
_PR_EDGES_SQL = """
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    e0 AS (
        SELECT doc_id AS src, doc_id * 2 AS dst FROM documents, mx
        WHERE doc_id >= 1 AND doc_id * 2 <= m
        UNION ALL
        SELECT doc_id, doc_id * 2 + 1 FROM documents, mx
        WHERE doc_id >= 1 AND doc_id * 2 + 1 <= m)
    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
    """


def _pr_oracle() -> str:
    def rnd(prev: str, cur: str) -> str:
        return f"""
    {cur} AS (SELECT n.id,
                     CAST(150000000 + coalesce(SUM((r.r * 85) // (d.d * 100)), 0)
                          AS BIGINT) AS r
              FROM nodes n
              LEFT JOIN edges e ON e.dst = n.id
              LEFT JOIN {prev} r ON r.id = e.src
              LEFT JOIN deg d ON d.id = e.src
              GROUP BY n.id)"""

    rounds = ", ".join(rnd(f"r{i}", f"r{i + 1}") for i in range(5))
    return f"""
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id >= 1),
    e0 AS (
        SELECT doc_id AS src, doc_id * 2 AS dst FROM documents, mx
        WHERE doc_id >= 1 AND doc_id * 2 <= m
        UNION ALL
        SELECT doc_id, doc_id * 2 + 1 FROM documents, mx
        WHERE doc_id >= 1 AND doc_id * 2 + 1 <= m),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
    {rounds}
    SELECT id, r AS rank_e9 FROM r5 ORDER BY id
    """


@query("iterate_pagerank", oracle=_pr_oracle())
def iterate_pagerank(spark, sf_dir):
    """5 fixed-budget PageRank rounds via iterate_bounded, e9 integer
    fixed point throughout (IterativeDataSet.java's iterate(n))."""
    from flink_1_12_0_spark.api.datastream import iterate_bounded, truncate_lineage

    load_tables(spark, sf_dir)
    edges = truncate_lineage(spark.sql(_PR_EDGES_SQL))
    deg = truncate_lineage(
        edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    )
    nodes = truncate_lineage(
        spark.sql("SELECT doc_id AS id FROM documents WHERE doc_id >= 1")
    )  # every round's left join reads the checkpointed id set, not a
    #    fresh documents scan
    init = nodes.select("id", F.lit(1000000000).cast("bigint").alias("r"))

    def body(cur, _i):
        contrib = (
            edges.join(cur.withColumnRenamed("id", "cid"),
                       edges["src"] == F.col("cid"))
            .join(deg.withColumnRenamed("id", "did"),
                  edges["src"] == F.col("did"))
            .select(F.col("dst").alias("id"),
                    F.expr("(r * 85) DIV (d * 100)").alias("c"))
            .groupBy("id").agg(F.sum("c").alias("s"))
        )
        return (
            nodes.join(contrib, "id", "left")
            .select("id",
                    (F.lit(150000000) + F.coalesce(F.col("s"), F.lit(0)))
                    .cast("bigint").alias("r"))
        )

    final = iterate_bounded(init, body, n_iterations=5)
    return final.select("id", F.col("r").alias("rank_e9")).orderBy("id")
