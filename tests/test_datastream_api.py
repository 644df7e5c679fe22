"""DataStream API shim: program-shaped pipelines must equal their SQL
formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.api.datastream import DataStream
from flink_1_12_0_spark.tables import load_tables
from tests.conftest import SF_DIR


def _events(spark):
    return DataStream(load_tables(spark, SF_DIR)["events"])


def test_map_flatmap_filter(spark):
    ds = _events(spark)
    out = (
        ds.filter("event_type = 'purchase'")
        .map(
            lambda r: {"event_id": r["event_id"], "cents": int(round(r["value"] * 100))},
            "event_id bigint, cents bigint",
        )
        .flat_map(
            lambda r: (
                [{"event_id": r["event_id"]}] * 2 if r["cents"] > 10000 else []
            ),
            "event_id bigint",
        )
        .to_table()
    )
    want = spark.sql(
        "SELECT count(*) * 2 FROM events WHERE event_type = 'purchase' AND round(value * 100) > 10000"
    ).collect()[0][0]
    assert out.count() == want


def test_keyby_reduce_and_window(spark):
    ds = _events(spark)
    got = {
        (r["user_id"], round(r["sum_value"], 4))
        for r in ds.key_by("user_id").sum("value").collect()
    }
    want = {
        (r["user_id"], round(r["s"], 4))
        for r in spark.sql("SELECT user_id, sum(value) AS s FROM events GROUP BY 1").collect()
    }
    assert got == want

    win = (
        ds.key_by("event_type")
        .window("ts", "1 day")
        .aggregate(F.count("*").alias("cnt"))
    )
    got_w = {(r["event_type"], str(r["window"]["start"]), r["cnt"]) for r in win.collect()}
    want_w = {
        (r["event_type"], str(r["ws"]), r["cnt"])
        for r in spark.sql(
            """SELECT event_type, window.start AS ws, count(*) AS cnt
               FROM (SELECT *, window(ts, '1 day') AS window FROM events) GROUP BY 1, 2"""
        ).collect()
    }
    assert got_w == want_w


def test_interval_join_parity_with_operator(spark):
    ds = _events(spark)
    purchases = DataStream(
        ds.df.where("event_type = 'purchase'").select(
            F.col("event_id").alias("p_id"), F.col("user_id").alias("pu"), F.col("ts").alias("p_ts")
        )
    ).key_by("pu")
    clicks = DataStream(
        ds.df.where("event_type = 'click'").select(
            F.col("event_id").alias("c_id"), F.col("user_id").alias("cu"), F.col("ts").alias("c_ts")
        )
    ).key_by("cu")
    j = purchases.interval_join(clicks, "p_ts", "c_ts", "10 minutes", "0 seconds")
    want = spark.sql(
        """SELECT count(*) FROM events p JOIN events c
           ON c.user_id = p.user_id AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
           WHERE p.event_type = 'purchase' AND c.event_type = 'click'"""
    ).collect()[0][0]
    assert j.count() == want


def test_window_apply_full_access(spark):
    ds = _events(spark)

    def spread(key, pdf):
        import pandas as pd

        return pd.DataFrame(
            [{
                "event_type": key[1],
                "spread": float(pdf["value"].max() - pdf["value"].min()),
            }]
        )

    out = (
        ds.key_by("event_type")
        .window("ts", "7 days")
        .apply(spread, "event_type string, spread double")
    )
    assert out.count() > 0 and set(out.columns) == {"event_type", "spread"}


def test_windowed_stream_trigger_evictor_path(spark):
    """WindowedStream.trigger_continuous/evictor_count fluent surface
    executes the same stateful op as tumble_event_windows directly."""
    from flink_1_12_0_spark.api.datastream import WindowedStream
    from flink_1_12_0_spark.streaming.core import events_stream, run_to_memory
    from flink_1_12_0_spark.streaming.stateful import tumble_event_windows
    from tests.conftest import SF_DIR

    def build(sdf):
        return (
            WindowedStream(sdf, ["user_id"], "ts", "1 hour", None)
            .trigger_continuous("30 minutes")
            .evictor_count(5)
            .sum_count("value", "event_id")
        )

    sdf = events_stream(spark, SF_DIR).select("user_id", "ts", "event_id", "value")
    got = run_to_memory(build(sdf), output_mode="update")
    sdf2 = events_stream(spark, SF_DIR).select("user_id", "ts", "event_id", "value")
    want = run_to_memory(
        tumble_event_windows(
            sdf2, ["user_id"], ts="ts", tiebreak="event_id", value_col="value",
            size_s=3600, fire_interval_s=1800, evictor=("count", 5),
        ),
        output_mode="update",
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_iterate_bounded_label_propagation(spark):
    """DataSet.iterate analog: min-label propagation over an undirected
    edge list converges to connected components."""
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.api.datastream import iterate_bounded

    # two components: {1,2,3,4} and {10,11}; 20 isolated
    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    sym = edges + [(b, a) for a, b in edges]
    e = spark.createDataFrame(sym, "src bigint, dst bigint")
    verts = (e.select(F.col("src").alias("v"))
             .union(spark.createDataFrame([(20,)], "v bigint"))
             .distinct().withColumn("label", F.col("v")))

    def step(labels, _i):
        cand = (e.join(labels, e.src == labels.v)
                .select(F.col("dst").alias("v"), "label"))
        return (labels.unionByName(cand)
                .groupBy("v").agg(F.min("label").alias("label")))

    out = iterate_bounded(verts, step, n_iterations=4)
    got = {r["v"]: r["label"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain_converges(spark):
    """Fixed-point termination (DataSet.iterateWithTermination analog):
    a 17-hop duplicate chain — diameter far beyond the old fixed-8-round
    budget — must still collapse to ONE component, and the loop must stop
    on its own once no label changes."""
    from flink_1_12_0_spark.operators.graph import connected_components

    # one 18-vertex path (diameter 17) + one separate triangle
    chain = [(i, i + 1) for i in range(100, 117)]
    tri = [(1, 2), (2, 3), (1, 3)]
    e = spark.createDataFrame(chain + tri, "a bigint, b bigint")
    got = {r["v"]: r["label"] for r in connected_components(e).collect()}
    assert {got[v] for v in range(100, 118)} == {100}
    assert {got[v] for v in (1, 2, 3)} == {1}


def test_iterate_with_termination_backstop(spark):
    """A body that never converges hits the max_iterations backstop and
    raises instead of looping forever."""
    import pytest
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.api.datastream import iterate_with_termination

    df = spark.range(3)

    def body(cur, i):
        nxt = cur.withColumn("id", F.col("id") + 1)
        return nxt, nxt  # termination set never empties
    with pytest.raises(RuntimeError, match="no convergence"):
        iterate_with_termination(df, body, max_iterations=3)


def test_min_by_max_by_whole_element(spark):
    """minBy/maxBy (KeyedStream.java): the whole element with the extreme
    field — ties broken toward the earliest arrival by default, latest
    with first=False."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream

    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "v": [3, 1, 1, 7, 7],
            "tag": ["x", "y", "z", "p", "q"],
        }
    )
    ks = DataStream(spark.createDataFrame(pdf)).key_by("k")
    got = {r["k"]: r["tag"] for r in ks.min_by("v").collect()}
    assert got == {"a": "y", "b": "p"}  # first of the tied v=1 / v=7
    got_last = {r["k"]: r["tag"] for r in ks.min_by("v", first=False).collect()}
    assert got_last == {"a": "z", "b": "q"}
    got_max = {r["k"]: r["tag"] for r in ks.max_by("v").collect()}
    assert got_max == {"a": "x", "b": "p"}
    got_max_last = {r["k"]: r["tag"] for r in ks.max_by("v", first=False).collect()}
    assert got_max_last == {"a": "x", "b": "q"}


def test_min_by_with_non_orderable_payload(spark):
    """Payload columns stay OUT of the comparator, so non-orderable types
    (maps) ride along without breaking the aggregation."""
    from flink_1_12_0_spark.api.datastream import DataStream

    df = spark.sql("""
        SELECT * FROM VALUES
          ('a', 3, map('x', 1)), ('a', 1, map('y', 2)), ('b', 5, map('z', 3))
        AS t(k, v, m)""")
    got = {r["k"]: dict(r["m"]) for r in DataStream(df).key_by("k").min_by("v").collect()}
    assert got == {"a": {"y": 2}, "b": {"z": 3}}


def test_joined_streams_fluent_window_join(spark):
    """a.join(b).where(k).equal_to(k).window(ts, size): pairs sharing
    (key, hour window) — equals the direct windowed equi-join."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream

    base = pd.Timestamp("2024-01-01 00:00:00")
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 2],
        "ts": [base, base + pd.Timedelta(minutes=10), base],
        "lv": [10, 11, 20],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 2, 2],
        "ts": [base + pd.Timedelta(minutes=20), base + pd.Timedelta(minutes=5),
               base + pd.Timedelta(hours=2)],
        "rv": [100, 200, 201],
    }))
    out = (
        DataStream(left).join(DataStream(right))
        .where("k").equal_to("k")
        .window("ts", "1 hour")
        .apply()
    )
    pairs = sorted((r["lv"], r["rv"]) for r in out.collect())
    # k=1: two left rows x one right row in hour 0; k=2: one pair in hour
    # 0; the right row at hour 2 matches nothing
    assert pairs == [(10, 100), (11, 100), (20, 200)]


def test_co_grouped_streams_sees_one_sided_groups(spark):
    """coGroup's apply receives FULL groups, including windows where one
    side is empty — inexpressible with an inner join."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream

    base = pd.Timestamp("2024-01-01 00:00:00")
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1, 2],
        "ts": [base, base],
        "lv": [10, 20],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 3],
        "ts": [base, base],
        "rv": [100, 300],
    }))

    def fn(key, w_start, lpdf, rpdf):
        yield {"k": int(key[0]), "n_left": len(lpdf), "n_right": len(rpdf)}

    out = (
        DataStream(left).co_group(DataStream(right))
        .where("k").equal_to("k")
        .window("ts", "1 hour")
        .apply(fn, "k bigint, n_left bigint, n_right bigint")
    )
    got = sorted((r["k"], r["n_left"], r["n_right"]) for r in out.collect())
    assert got == [(1, 1, 1), (2, 1, 0), (3, 0, 1)]


def test_connect_co_map(spark):
    """ConnectedStreams.map(f1, f2): each input mapped by its own
    CoMapFunction into one output type (ConnectedStreams.java map)."""
    from flink_1_12_0_spark.api.datastream import DataStream

    a = DataStream(spark.createDataFrame([(1,), (2,)], "x int"))
    b = DataStream(spark.createDataFrame([("3",), ("4",)], "s string"))
    out = a.connect(b).map(
        lambda r: {"v": r["x"] * 10},
        lambda r: {"v": int(r["s"])},
        "v int",
    )
    assert sorted(r["v"] for r in out.df.collect()) == [3, 4, 10, 20]


def test_connect_keyed_process_shares_state(spark):
    """Keyed connect + CoProcessFunction: one state per key across BOTH
    inputs; right-side keys rename onto the left's."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream
    from flink_1_12_0_spark.streaming.core import run_to_memory

    base = pd.Timestamp("2024-01-01")
    ldf = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 1, 2], "ts": [base] * 3, "v": [1.0, 2.0, 5.0]}))
    rdf = spark.createDataFrame(pd.DataFrame(
        {"rk": [1, 2], "ts": [base] * 2, "v": [10.0, 20.0]}))

    def make_stream(df, tmp):
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        return DataStream(spark.readStream.schema(df.schema).parquet(tmp))

    import tempfile

    l = make_stream(ldf, tempfile.mkdtemp(prefix="sg_cl_"))
    r = make_stream(rdf, tempfile.mkdtemp(prefix="sg_cr_"))

    def fn(key, pdfs, state):
        import pandas as pd

        total = state.get[0] if state.exists else 0.0
        for p in pdfs:
            if not p.empty:
                total += float(p["v"].sum())
        state.update((total,))
        yield pd.DataFrame([{"k": int(key[0]), "total": total}])

    out = run_to_memory(
        l.connect(r).key_by("k", "rk").process(
            fn, "k bigint, total double", "acc double", ["k", "ts", "v"]
        ),
        output_mode="update",
    )
    got = {r["k"]: r["total"] for r in out.collect()}
    assert got == {1: 13.0, 2: 25.0}


def test_broadcast_connect_fluent(spark):
    """main.connect(rules.broadcast()).key_by(shard_key).process(...):
    the fluent broadcast-state path — every rule reaches every shard."""
    import tempfile

    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream
    from flink_1_12_0_spark.streaming.core import run_to_memory

    base = pd.Timestamp("2024-01-01")
    main = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 2, 3], "ts": [base + pd.Timedelta(minutes=1)] * 3,
         "v": [5.0, 50.0, 7.0]}))
    rules = spark.createDataFrame(pd.DataFrame(
        {"ts": [base], "v": [10.0]}))  # unkeyed global threshold

    def make_stream(df, tmp):
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        return DataStream(spark.readStream.schema(df.schema).parquet(tmp))

    m = make_stream(main, tempfile.mkdtemp(prefix="sg_bm_"))
    r = make_stream(rules, tempfile.mkdtemp(prefix="sg_br_"))

    def fn(key, pdfs, state):
        import pandas as pd

        thr = state.get[0] if state.exists else None
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(["ts", "_stream"], kind="mergesort")
        out = []
        for stream, k, v in zip(pdf["_stream"], pdf["k"], pdf["v"]):
            if stream == "control":
                thr = float(v)
            elif thr is not None and float(v) > thr:
                out.append({"k": int(k)})
        state.update((thr,))
        if out:
            yield pd.DataFrame(out)

    out = run_to_memory(
        m.connect(r.broadcast()).key_by("k").process(
            fn, "k bigint", "thr double", ["k", "ts", "v"], n_shards=4
        ),
        output_mode="update",
    )
    assert sorted(r["k"] for r in out.collect()) == [2]


def test_physical_partitioning_ops(spark):
    from flink_1_12_0_spark.api.datastream import DataStream

    ds = DataStream(spark.range(100).selectExpr("id", "id * 2 AS d", "id % 3 AS m"))
    assert ds.project(2, 0).df.columns == ["m", "id"]
    assert ds.shuffle().df.count() == 100
    assert ds.rebalance().df.count() == 100
    assert ds.rescale().df.count() == 100
    assert ds.forward() is ds


def test_stream_execution_environment_sources(spark, tmp_path):
    """StreamExecutionEnvironment entry point: from_collection,
    generate_sequence (inclusive bounds), read_text_file, parallelism."""
    from flink_1_12_0_spark.api.datastream import StreamExecutionEnvironment

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ds = env.from_collection([(1, "a"), (2, "b")], "x int, s string")
    assert sorted(r["x"] for r in ds.df.collect()) == [1, 2]
    seq = env.generate_sequence(3, 6)
    assert sorted(r["id"] for r in seq.df.collect()) == [3, 4, 5, 6]
    p = str(tmp_path / "t.txt")
    open(p, "w").write("hello\nworld\n")
    txt = env.read_text_file(p)
    assert sorted(r["value"] for r in txt.df.collect()) == ["hello", "world"]
    old = env.get_parallelism()
    try:
        env.set_parallelism(7)
        assert env.get_parallelism() == 7
    finally:
        env.set_parallelism(old)
    assert env.execute("j")["state"] == "FINISHED"


def test_keyed_stream_transforms_preserve_keying(spark):
    """pyflink KeyedStream keeps map/filter/flat_map; the result remains
    keyed so reduce() still works downstream."""
    from flink_1_12_0_spark.api.datastream import DataStream

    ds = DataStream(spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 10.0)], "k int, v double"))
    got = (
        ds.key_by("k")
        .map(lambda r: {"k": r["k"], "v": r["v"] * 2}, "k int, v double")
        .filter("v > 5")
        .reduce("v", "sum")
        .collect()
    )
    assert sorted((r["k"], r["sum_v"]) for r in got) == [(1, 6.0), (2, 20.0)]


def test_datastream_print_batch(spark, capsys):
    from flink_1_12_0_spark.api.datastream import DataStream

    DataStream(spark.createDataFrame([(1,)], "x int")).print()


def test_connect_co_flat_map(spark):
    """ConnectedStreams.flat_map(f1, f2): CoFlatMapFunction
    (ConnectedStreams.java:275) — each side's function yields ZERO OR
    MORE rows; asymmetric fan-out (left duplicates, right may drop)."""
    from flink_1_12_0_spark.api.datastream import DataStream

    a = DataStream(spark.createDataFrame([(1,), (2,)], "x int"))
    b = DataStream(spark.createDataFrame([("3",), ("40",)], "s string"))
    out = a.connect(b).flat_map(
        lambda r: ({"v": r["x"] * 10}, {"v": r["x"] * 100}),
        lambda r: [{"v": int(r["s"])}] if len(r["s"]) == 1 else [],
        "v int",
    )
    assert sorted(r["v"] for r in out.df.collect()) == [3, 10, 20, 100, 200]


def test_count_window_all_full_windows_only(spark, tmp_path):
    """countWindowAll(size): only FULL windows fire; the trailing partial
    stays in state — across micro-batches (one global counter)."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream
    from flink_1_12_0_spark.streaming.core import run_to_memory

    base = pd.Timestamp("2024-01-01", tz="UTC")
    # 11 rows in 2 files -> with size 4: windows [0..3],[4..7] fire,
    # rows 8..10 stay pending
    rows = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=i) for i in range(11)],
        "event_id": list(range(11)),
        "value": [float(i) for i in range(11)],
    })
    d = str(tmp_path / "cwa")
    spark.createDataFrame(rows.iloc[:6]).coalesce(1).write.parquet(f"{d}/f0")
    spark.createDataFrame(rows.iloc[6:]).coalesce(1).write.parquet(f"{d}/f1")
    sdf = (
        spark.readStream.schema("ts timestamp, event_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    out = DataStream(sdf).count_window_all(4).sum_count(
        ts="ts", tiebreak="event_id", value_col="value"
    )
    got = sorted(
        (r["win_seq"], r["n"], r["sum_value"])
        for r in run_to_memory(out, output_mode="update").collect()
    )
    assert got == [(0, 4, 0.0 + 1 + 2 + 3), (1, 4, 4.0 + 5 + 6 + 7)]


def test_window_all_aggregate_batch_plan_is_partial_agg(spark):
    """windowAll's declarative aggregate must keep map-side partial
    aggregation (HashAggregate before and after the exchange) — the
    reason the Spark translation scales where the reference's
    parallelism-1 windowAll task does not."""
    from flink_1_12_0_spark.api.datastream import DataStream
    from tests.conftest import SF_DIR

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    from pyspark.sql import functions as F

    agg = DataStream(ev).window_all("ts", "6 hours").aggregate(
        F.count("*").alias("cnt"), F.sum("value").alias("total")
    )
    assert agg.count() > 0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan


def test_window_all_sum_count_stateful_matches_truth(spark, tmp_path):
    """windowAll's trigger/evictor terminal (stateful path, literal key)
    across micro-batches: global tumbling 1h count/sum equals the batch
    ground truth, and the literal key is dropped from the output."""
    import pandas as pd

    from flink_1_12_0_spark.api.datastream import DataStream
    from flink_1_12_0_spark.streaming.core import run_to_memory

    base = pd.Timestamp("2024-01-01", tz="UTC")
    rows = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=17 * i) for i in range(12)],
        "event_id": list(range(12)),
        "value": [float(i) for i in range(12)],
    })
    d = str(tmp_path / "wa")
    spark.createDataFrame(rows.iloc[:7]).coalesce(1).write.parquet(f"{d}/f0")
    spark.createDataFrame(rows.iloc[7:]).coalesce(1).write.parquet(f"{d}/f1")
    sdf = (
        spark.readStream.schema("ts timestamp, event_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
        .withWatermark("ts", "10 minutes")
    )
    out = DataStream(sdf).window_all("ts", "1 hour").sum_count(
        value_col="value", tiebreak="event_id"
    )
    res = run_to_memory(out, output_mode="update")
    assert "_all" not in res.columns
    got = {}
    # w_start is epoch-seconds BIGINT; final (end-of-window) fire wins
    for r in sorted(res.collect(), key=lambda r: r["fire_ts"]):
        got[r["w_start"]] = (r["n"], r["sum_value"])
    truth = {}
    # a window fires when the watermark (max event time) reaches its END
    # (EventTimeTrigger): the trailing partial window stays in state
    wm = rows["ts"].max()
    for h, grp in rows.groupby(rows["ts"].dt.floor("h")):
        if h + pd.Timedelta(hours=1) <= wm:
            truth[int(h.timestamp())] = (len(grp), float(grp["value"].sum()))
    assert got == truth and len(truth) >= 3


def test_session_window_all_aggregate(spark):
    """session_window_all: non-keyed merging session windows via the
    declarative session_window groupBy (single group, no key column)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from flink_1_12_0_spark.api.datastream import DataStream

    base = pd.Timestamp("2024-01-01")
    # two sessions separated by a 30-min silence (gap 10 min)
    offs = [0, 5, 9, 60, 66]
    df = spark.createDataFrame(pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=o) for o in offs],
        "value": [1.0] * len(offs),
    }))
    out = (
        DataStream(df).session_window_all("ts", "10 minutes")
        .aggregate(F.count("*").alias("n"))
        .orderBy("window.start")
        .collect()
    )
    assert [r["n"] for r in out] == [3, 2]
