"""Regression tests for round-1 advisor findings: MINUS multiset semantics,
lookup-join cache eviction, MATCH_RECOGNIZE keyword-in-identifier parsing,
k-means seeding on non-contiguous ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.api.table import TableEnvironment
from flink_1_12_0_spark.operators.joins import lookup_join
from flink_1_12_0_spark.operators.kmeans import kmeans_cosine_fit
from flink_1_12_0_spark.plans.match_recognize_sql import parse_match_recognize


def test_minus_is_except_distinct(spark):
    """Flink Table.minus = EXCEPT DISTINCT: {x,x,x} minus {x} = {} — a row
    present in the right side disappears entirely."""
    env = TableEnvironment.create(spark)
    left = env.from_dataframe(spark.createDataFrame([(1,), (1,), (1,), (2,)], "x int"))
    right = env.from_dataframe(spark.createDataFrame([(1,)], "x int"))
    assert [r["x"] for r in left.minus(right).df.collect()] == [2]
    # minus_all stays multiset: {1,1,1,2} minusAll {1} = {1,1,2}
    vals = sorted(r["x"] for r in left.minus_all(right).df.collect())
    assert vals == [1, 1, 2]


def test_lookup_join_batch_wider_than_cache(spark):
    """A single Arrow batch with more distinct keys than cache_size must
    still enrich every row (keys fetched for the current batch may not be
    evicted before use)."""
    df = spark.range(0, 50).select(F.col("id").cast("int").alias("k")).coalesce(1)
    fetched_log = []

    def fetch(keys):
        fetched_log.append(list(keys))
        return {k: {"name": f"v{k}"} for k in keys}

    out = lookup_join(df, "k", fetch, [("name", "string")], cache_size=5)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["r_name"] == f"v{r['k']}" for r in rows), "NULL enrichment leaked"


def test_match_recognize_keyword_inside_identifier():
    """Aliases/identifiers embedding section keywords (undefined_x contains
    DEFINE, pattern_id contains PATTERN) must not corrupt section splits."""
    spec = parse_match_recognize(
        """
        SELECT * FROM t MATCH_RECOGNIZE (
            PARTITION BY pattern_id
            ORDER BY ts
            MEASURES FIRST(A.v) AS undefined_x, LAST(B.v) AS redefined_y
            PATTERN (A B)
            DEFINE A AS v > 0, B AS v > 1
        )
        """
    )
    assert spec.partition_by == ["pattern_id"]
    assert [m[0] for m in spec.measures] == ["undefined_x", "redefined_y"]
    assert [p[0] for p in spec.pattern] == ["A", "B"]
    assert set(spec.define) == {"A", "B"}


def test_kmeans_seeds_on_offset_ids(spark):
    """Seeding must pick the k lowest ids even when ids don't start at 0 —
    vec_id < k would select zero seeds here."""
    rows = [(100 + 10 * i, [float(i + 1), float((i * 7) % 5 + 1)]) for i in range(12)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_cosine_fit(vecs, k=3, iters=1)
    got = cents.collect()
    assert sorted(r["cent_id"] for r in got) == [0, 1, 2]
    assert all(len(r["cvec"]) == 2 for r in got)


# ---------------------------------------------- round-2 advisor findings


def test_cep_null_partition_keys_both_paths_agree(spark):
    """NULL-keyed groups must match identically whether the DEFINE chain
    takes the compiled-regex path or the NFA fallback (pandas groupby
    drops NaN groups by default — dropna=False keeps them)."""
    import pandas as pd

    from flink_1_12_0_spark.operators.cep import Step, match_recognize

    pdf = pd.DataFrame(
        {
            "k": [1.0, 1.0, None, None],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:01"] * 2
            ),
            "typ": ["e", "p", "e", "p"],
        }
    )
    df = spark.createDataFrame(pdf)
    vec_steps = [
        Step("E", lambda r: r["typ"] == "e",
             where_vec=lambda p: p["typ"].eq("e")),
        Step("P", lambda r: r["typ"] == "p",
             where_vec=lambda p: p["typ"].eq("p")),
    ]
    plain_steps = [  # no where_vec -> NFA fallback path
        Step("E", lambda r: r["typ"] == "e"),
        Step("P", lambda r: r["typ"] == "p"),
    ]
    measures = [("n", lambda m: m.count("E"))]
    fast = match_recognize(df, ["k"], ["ts"], vec_steps, measures,
                           "k double, n bigint").collect()
    slow = match_recognize(df, ["k"], ["ts"], plain_steps, measures,
                           "k double, n bigint").collect()
    key = lambda r: (r["k"] if r["k"] is not None else float("nan"),)  # noqa: E731
    assert len(fast) == len(slow) == 2
    assert sorted([r["n"] for r in fast]) == sorted([r["n"] for r in slow])
    assert any(r["k"] is None for r in fast) and any(r["k"] is None for r in slow)


def test_partitioned_insert_keeps_declared_schema(spark, tmp_path):
    """After a PARTITIONED BY insert the refreshed view keeps the DECLARED
    column order and partition-column types (no inference drift)."""
    from flink_1_12_0_spark.plans.catalog_ddl import TableEnvironment
    from flink_1_12_0_spark.tables import load_tables
    import os

    load_tables(spark, os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"))
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE t_adv_part (n_name STRING, n_nationkey BIGINT, n_regionkey BIGINT)
        PARTITIONED BY (n_regionkey)
        WITH ('connector'='filesystem', 'path'='{tmp_path / "p"}', 'format'='parquet')""")
    env.execute_sql(
        "INSERT OVERWRITE t_adv_part SELECT n_name, n_nationkey, n_regionkey FROM nation"
    )
    got = spark.table("t_adv_part").dtypes
    assert got == [("n_name", "string"), ("n_nationkey", "bigint"),
                   ("n_regionkey", "bigint")]


def test_window_descriptor_validation(spark):
    import pytest

    from flink_1_12_0_spark.api.table import Session, Slide, Table, Tumble

    t = Table(spark.range(1).selectExpr(
        "CAST('2024-01-01' AS TIMESTAMP) AS ts", "id AS v"))
    with pytest.raises(ValueError, match=r"requires \.on"):
        t.window(Tumble.over("1 hour").alias("w"))
    with pytest.raises(ValueError, match=r"requires \.every"):
        t.window(Slide.over("1 hour").on("ts").alias("w"))
    with pytest.raises(ValueError, match="Session window"):
        t.window(Session.with_gap("10 minutes").alias("w"))


def test_options_hint_with_paren_in_value(spark):
    from flink_1_12_0_spark.plans.dialect_shim import translate

    sql = ("SELECT 1 AS one FROM nation "
           "/*+ OPTIONS('path'='/tmp/a(b)c', 'regex'='x)y') */ LIMIT 1")
    out = translate(sql)
    assert "*/" not in out and "OPTIONS" not in out
    from flink_1_12_0_spark.tables import load_tables
    import os

    load_tables(spark, os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"))
    assert spark.sql(out).collect()[0]["one"] == 1


def test_timeout_scan_optional_first_step(spark):
    """A partial match that begins at the SECOND variable (the first is
    optional) still emits a timeout row."""
    import pandas as pd

    from flink_1_12_0_spark.operators.cep import Step, match_timeouts

    pdf = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:01"]),
            "typ": ["b", "x"],  # no 'a' prefix, no completing 'c'
        }
    )
    df = spark.createDataFrame(pdf)
    steps = [
        Step("A", lambda r: r["typ"] == "a", 0, 1,
             where_vec=lambda p: p["typ"].eq("a")),
        Step("B", lambda r: r["typ"] == "b", 1, None,
             where_vec=lambda p: p["typ"].eq("b")),
        Step("C", lambda r: r["typ"] == "c",
             where_vec=lambda p: p["typ"].eq("c")),
    ]
    out = match_timeouts(
        df, ["k"], ["ts"], steps,
        [("n_b", lambda m: m.count("B"))],
        "k bigint, n_b bigint",
    ).collect()
    assert [(r["k"], r["n_b"]) for r in out] == [(1, 1)]


def test_windowed_join_apply_fn_runs_join_function(spark):
    """Round-3 advisor: join(...).window(...).apply(my_fn) silently
    returned the raw joined frame.  The JoinFunction must run per pair."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream

    base = pd.Timestamp("2024-01-01 00:00:00")
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 2], "ts": [base, base], "lv": [10, 20]}))
    right = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 2], "ts": [base, base], "rv": [100, 200]}))

    def fn(l, r):
        return {"k": int(l["k"]), "total": int(l["lv"]) + int(r["rv"])}

    out = (
        DataStream(left).join(DataStream(right))
        .where("k").equal_to("k")
        .window("ts", "1 hour")
        .apply(fn, "k bigint, total bigint")
    )
    got = sorted((r["k"], r["total"]) for r in out.collect())
    assert got == [(1, 110), (2, 220)]


def test_windowed_join_default_dedupes_columns(spark):
    """fn=None join path: the duplicated _w struct and same-named
    equal-keys are deduped so the result is selectable without ambiguity."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream

    base = pd.Timestamp("2024-01-01 00:00:00")
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1], "ts": [base], "lv": [10]}))
    right = spark.createDataFrame(pd.DataFrame(
        {"k": [1], "ts": [base + pd.Timedelta(minutes=1)], "rv": [100]}))
    out = (
        DataStream(left).join(DataStream(right))
        .where("k").equal_to("k")
        .window("ts", "1 hour")
        .apply()
    )
    assert out.columns.count("_w") == 1
    assert out.columns.count("k") == 1
    assert out.select("k", "lv", "rv").collect()[0]["rv"] == 100


def test_cogroup_empty_side_keeps_declared_columns(spark):
    """Round-3 advisor: an empty or all-null coGroup side must still carry
    the declared columns (KeyError before), and timestamp columns must
    arrive as datetimes, not ISO strings."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream

    base = pd.Timestamp("2024-01-01 00:00:00")
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1], "ts": [base], "lv": [10]}))
    right = spark.createDataFrame(pd.DataFrame(
        {"k": [2], "ts": [base], "rv": [100]}))

    def fn(key, w_start, lpdf, rpdf):
        # touching columns on the empty side must not KeyError
        assert list(lpdf.columns) == ["k", "ts", "lv"]
        assert list(rpdf.columns) == ["k", "ts", "rv"]
        n_ts = int(lpdf["ts"].notna().sum() + rpdf["ts"].notna().sum())
        is_dt = bool(
            (lpdf.empty or str(lpdf["ts"].dtype).startswith("datetime"))
            and (rpdf.empty or str(rpdf["ts"].dtype).startswith("datetime"))
        )
        yield {"k": int(key[0]), "n_ts": n_ts, "ts_typed": is_dt}

    out = (
        DataStream(left).co_group(DataStream(right))
        .where("k").equal_to("k")
        .window("ts", "1 hour")
        .apply(fn, "k bigint, n_ts bigint, ts_typed boolean")
    )
    got = sorted((r["k"], r["n_ts"], r["ts_typed"]) for r in out.collect())
    assert got == [(1, 1, True), (2, 1, True)]


def test_between_symmetric_paren_operands(spark):
    """Round-3 advisor: BETWEEN SYMMETRIC with function-call operands
    produced broken SQL (second operand stopped at '(')."""
    from flink_1_12_0_spark.plans.dialect_shim import translate

    sql = translate(
        "SELECT * FROM t WHERE x BETWEEN SYMMETRIC abs(a) AND greatest(b, c)"
    )
    assert "least(abs(a), greatest(b, c))" in sql
    assert "greatest(abs(a), greatest(b, c))" in sql
    got = spark.sql(translate(
        "SELECT x FROM VALUES (1, 5, 2), (4, 5, 2), (6, 5, 2) AS t(x, a, b)"
        " WHERE x BETWEEN SYMMETRIC abs(a) AND least(b, 3)"
    )).collect()
    assert sorted(r["x"] for r in got) == [4]


def test_group_pattern_unbounded_quantifiers_raise():
    """Round-3 advisor: timesOrMore (and the other unbounded quantifiers)
    after begin_group silently quantified only the last sub-step."""
    import pytest

    from flink_1_12_0_spark.operators.cep import Pattern

    def grp():
        return Pattern.begin_group(
            Pattern.begin("V", lambda r: r["t"] == "v")
            .next("C", lambda r: r["t"] == "c")
        )

    with pytest.raises(ValueError, match="timesOrMore"):
        grp().times_or_more(2)
    with pytest.raises(ValueError, match="oneOrMore"):
        grp().one_or_more()
    with pytest.raises(ValueError, match="optional"):
        grp().optional()
    # exact-count group repetition still expands
    assert len(grp().times(2)._steps) == 4


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """ADVICE r5 (d): connected_components baked in
    localCheckpoint(eager=True) — executor-local unreplicated blocks fail
    the whole job on executor loss in cluster settings.  truncate_lineage
    now auto-selects a RELIABLE checkpoint when the context has a
    checkpoint dir (the cluster posture), with a caller override knob."""
    import os

    from flink_1_12_0_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "a bigint, b bigint"
    )
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}

    # explicit local path (the pre-fix behavior) still works
    got = {
        r["v"]: r["label"]
        for r in connected_components(edges, reliable_checkpoint=False).collect()
    }
    assert got == want

    # reliable path: configure a checkpoint dir, auto-detect kicks in and
    # replicated checkpoint files land under it.  RESTORE the unset state
    # afterwards — setCheckpointDir is permanent on the shared session
    # context and would silently flip every later test's truncate_lineage
    # auto-selection to reliable (order-dependent behavior + checkpoint
    # files written into this test's pruned tmp dir).
    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        got = {r["v"]: r["label"] for r in connected_components(edges).collect()}
        assert got == want
        assert any(files for _, _, files in os.walk(ckpt)), "no reliable checkpoint written"
    finally:
        # the JVM setter accepts null -> Option(null) = None (no public
        # pyspark unset API)
        spark._jsc.sc().setCheckpointDir(None)
    assert spark.sparkContext.getCheckpointDir() is None


def test_bpe_chain_survives_exhausted_merge_rounds(spark):
    """A merge round that finds ZERO adjacent pairs (corpus reduced to
    single-symbol words before n_merges) must leave encodings unchanged
    and emit fewer merges — the bare scalar subqueries would replace(enc,
    NULL, NULL) and NULL every encoding (ADVICE r11).  Load-bearing for
    text_bpe_encode, whose corpus join consumes the final w{n}."""
    import duckdb

    from flink_1_12_0_spark.queries.llm_corpus import (
        _bpe_encode_sql,
        _bpe_sql,
    )

    # 'ab' merges once into a single symbol; 'x' is born single-symbol.
    # Rounds 2 and 3 of the 3-merge chain find no pairs at all.
    spark.createDataFrame([(1, "ab ab x")], "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    try:
        enc = sorted(map(tuple, spark.sql(_bpe_encode_sql(True)).collect()))
        # doc 1: 3 clean words; 'ab'->(ab) is 1 token, 'x'->(x) is 1
        assert enc == [(1, 3, 3, 2)], enc
        merges = spark.sql(_bpe_sql(True)).collect()
        assert [(r["merge_rank"], r["p1"], r["p2"], r["cnt"])
                for r in merges] == [(1, "a", "b", 2)]
    finally:
        spark.catalog.dropTempView("documents")
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS "
                "SELECT 1 AS doc_id, 'ab ab x' AS text")
    assert con.execute(_bpe_encode_sql(False)).fetchall() == [(1, 3, 3, 2)]
    assert con.execute(_bpe_sql(False)).fetchall() == [(1, "a", "b", 2)]


def test_rule_gate_rejects_missing_rule_or_ord_column(spark):
    """ADVICE r15: broadcast_rule_gate's >2**53 exactness depends on
    rule_col/ord_col staying integral through the union, which is only
    exact while both streams populate them — a stream that omits either
    column would get it null-padded (Arrow null -> pandas float64,
    silent precision loss).  The gate must refuse the shape loudly at
    build time instead."""
    import pytest as _pytest

    from flink_1_12_0_spark.streaming.stateful import broadcast_rule_gate

    rate = spark.readStream.format("rate").load()
    main_no_ord = rate.selectExpr(
        "CAST(NULL AS STRING) AS op", "value AS query_id",
        "value AS doc_id")
    ctrl = rate.selectExpr("'+' AS op", "value AS query_id",
                           "CAST(NULL AS BIGINT) AS doc_id",
                           "value AS ord")
    with _pytest.raises(ValueError, match="mandatory non-null"):
        broadcast_rule_gate(main_no_ord, ctrl, ["doc_id"],
                            rule_col="query_id", shard_key="doc_id")
    # missing rule_col must hit the SAME guard, not a bare KeyError
    # from the out_schema lookup (code-review r16: the guard must run
    # before any schema access)
    main_no_rule = rate.selectExpr(
        "CAST(NULL AS STRING) AS op", "value AS doc_id", "value AS ord")
    with _pytest.raises(ValueError, match="mandatory non-null"):
        broadcast_rule_gate(main_no_rule, ctrl, ["doc_id"],
                            rule_col="query_id", shard_key="doc_id")


def test_rule_gate_rejects_null_rule_or_ord_values(spark):
    """code-review r16: presence alone is not the invariant — a present
    column with NULL values still reaches pandas as float64 (corrupting
    integral positions above 2**53), so the per-batch core must refuse
    a null rule/ord value loudly."""
    import pandas as pd
    import pytest as _pytest

    from flink_1_12_0_spark.streaming.stateful import _gate_batch

    pdf = pd.DataFrame({
        "_stream": ["control", "main"],
        "op": ["+", None],
        "rule": [1.0, 1.0],
        "v": ["10", "10"],
        "ord": [0.0, float("nan")],  # null ord -> float64 column
    })
    with _pytest.raises(ValueError, match="non-null"):
        _gate_batch(pdf, set(), ord_col="ord", op_col="op",
                    rule_col="rule", out_cols=["rule", "v"],
                    casts={"rule": "int64", "v": "int64"})
