"""DataStream API shim: map / flatMap / keyBy / reduce / window / process.

Reference: flink-streaming-java .../api/datastream/DataStream.java (map
:592, union :253, flatMap, filter), KeyedStream.java (:289 keyBy, :370
process, :423 intervalJoin), WindowedStream; programs build an unplanned
Transformation DAG (SURVEY §3.3 — no optimizer on this path).

Spark-first: a DataStream wraps a (batch or streaming) DataFrame.  Row
functions run through ``mapInPandas`` (Arrow batches — Flink 1.12 runs
Python UDFs through the same Arrow bridge, pyflink/table/udf.py), while
``key_by().reduce()`` and windows compile to ``groupBy().agg`` — i.e. we
hand the "unplanned" dataflow to Catalyst anyway, which is strictly better
than the reference's no-optimizer behavior, while preserving the
program-shaped API.

Scale: every hop stays a DataFrame op; Python appears only in map/flatMap/
process bodies where the user asked for imperative logic.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DataStream:
    """Typed record stream = DataFrame of rows (DataStream.java)."""

    def __init__(self, df: DataFrame):
        self.df = df

    # --- per-record transforms (mapInPandas: Arrow-batched Python) ----------
    def map(self, fn: Callable[[dict], dict], out_schema: str) -> "DataStream":
        """One output row per input row; ``fn(row_dict) -> row_dict``."""

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame([fn(r) for r in pdf.to_dict("records")])

        return DataStream(self.df.mapInPandas(run, out_schema))

    def flat_map(self, fn: Callable[[dict], Iterator[dict]], out_schema: str) -> "DataStream":
        """Zero-or-more output rows per input row (FlatMapFunction)."""

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                rows = [o for r in pdf.to_dict("records") for o in fn(r)]
                if rows:
                    yield pd.DataFrame(rows)

        return DataStream(self.df.mapInPandas(run, out_schema))

    def map_partition(self, fn, out_schema: str) -> "DataStream":
        """MapPartitionFunction — raw Arrow-batch iterator access
        (DataSet MapPartition / AsyncDataStream batching both land here:
        an async client amortizes calls across the whole batch)."""
        return DataStream(self.df.mapInPandas(fn, out_schema))

    def filter(self, predicate) -> "DataStream":
        p = predicate if isinstance(predicate, Column) else F.expr(predicate)
        return DataStream(self.df.where(p))

    def union(self, *others: "DataStream") -> "DataStream":
        df = self.df
        for o in others:
            df = df.unionByName(o.df)
        return DataStream(df)

    def window_all(self, ts: str, size: str, slide: str | None = None) -> "AllWindowedStream":
        """DataStream.windowAll / timeWindowAll (DataStream.java:842,878):
        non-keyed event-time windows.  The reference keys the stream by a
        NullByteKeySelector — one constant key — and runs the keyed window
        machinery (AllWindowedStream.java:114); here the declarative path
        is a single-group ``groupBy(window)`` (which Spark still computes
        with map-side partial aggregation, so it scales), and the
        trigger/evictor path keys by a literal."""
        return AllWindowedStream(self.df, ts, size, slide)

    def session_window_all(self, ts: str, gap: str) -> "AllWindowedStream":
        """windowAll with EventTimeSessionWindows (merging, non-keyed)."""
        return AllWindowedStream(self.df, ts, None, None, gap=gap)

    def count_window_all(self, size: int, slide: int | None = None) -> "AllCountWindowedStream":
        """DataStream.countWindowAll (DataStream.java:855): non-keyed
        count windows — one global row counter; only FULL windows fire
        (count trigger semantics), the trailing partial stays in state."""
        return AllCountWindowedStream(self.df, size, slide)

    def key_by(self, *keys: str) -> "KeyedStream":
        return KeyedStream(self.df, list(keys))

    def join(self, other: "DataStream") -> "JoinedStreams":
        """DataStream.join (DataStream.java:777): fluent windowed
        equi-join builder."""
        return JoinedStreams(self, other)

    def co_group(self, other: "DataStream") -> "JoinedStreams":
        """DataStream.coGroup (DataStream.java:769): like join but the
        apply function sees the FULL left/right groups per (key, window),
        including one-sided ones."""
        return JoinedStreams(self, other, cogroup=True)

    def assign_timestamps_and_watermarks(self, ts_col: str, delay: str) -> "DataStream":
        """BoundedOutOfOrdernessWatermarks (WatermarkStrategy.java)."""
        return DataStream(self.df.withWatermark(ts_col, delay))

    def project(self, *field_indexes: int) -> "DataStream":
        """DataStream.project (DataStream.java projections by position)."""
        cols = self.df.columns
        return DataStream(self.df.select(*[cols[i] for i in field_indexes]))

    # --- physical partitioning (DataStream.java shuffle/rebalance/rescale/
    # forward) — Spark analogs; the record semantics are unchanged --------
    def shuffle(self) -> "DataStream":
        """Random repartition (ShufflePartitioner) — Spark round-robin
        ``repartition()`` at the session's shuffle parallelism."""
        n = int(self.df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        return DataStream(self.df.repartition(n))

    def rebalance(self) -> "DataStream":
        """Round-robin redistribution (RebalancePartitioner) — same Spark
        primitive as shuffle(); both map to a full repartition."""
        return self.shuffle()

    def rescale(self, num_partitions: int | None = None) -> "DataStream":
        """RescalePartitioner: local fan-out to a subset of downstream
        tasks.  Spark has no locality-preserving rescale on DataFrames —
        ``coalesce`` (narrow, no shuffle) is the closest analog.  The
        target count defaults to half the session's shuffle parallelism:
        derived WITHOUT touching ``.rdd``, which raises on streaming
        DataFrames and forces plan materialization on batch ones (this
        wrapper holds both kinds)."""
        if num_partitions is None:
            n = int(self.df.sparkSession.conf.get(
                "spark.sql.shuffle.partitions", "200"))
            num_partitions = max(1, n // 2)
        return DataStream(self.df.coalesce(num_partitions))

    def forward(self) -> "DataStream":
        """ForwardPartitioner: keep records in their current partition —
        a no-op on an unchanged DataFrame lineage."""
        return self

    def broadcast(self) -> "BroadcastStream":
        """DataStream.broadcast (DataStream.java:440 / broadcast state,
        BroadcastConnectedStream): mark this stream for replication to
        every parallel task of the stream it is connected to."""
        return BroadcastStream(self)

    def connect(self, other) -> "ConnectedStreams":
        """DataStream.connect (DataStream.java:363): two streams, possibly
        differently typed, into one two-input operator.  Connecting a
        ``BroadcastStream`` gives the broadcast-state pattern."""
        return ConnectedStreams(self, other)

    def to_table(self) -> DataFrame:
        return self.df

    def print(self, sink_identifier: str | None = None):
        """DataStream.print (DataStream.java:600 PrintSinkFunction):
        batch frames show() eagerly; streaming frames attach the console
        sink (streaming/core.to_console)."""
        if self.df.isStreaming:
            from flink_1_12_0_spark.streaming.core import to_console

            return to_console(self.df)
        self.df.show(truncate=False)
        return None


class BroadcastStream:
    """Marker for a broadcast side (DataStream.broadcast result)."""

    def __init__(self, ds: "DataStream"):
        self.ds = ds


class ConnectedStreams:
    """Two-input operator surface (ConnectedStreams.java /
    BroadcastConnectedStream.java): ``map(f1, f2)`` is CoMapFunction —
    each side mapped by its own function into ONE output type;
    ``key_by(...).process(...)`` is the keyed co-process (state shared
    across both inputs).  When the second stream is a
    :class:`BroadcastStream`, process() replicates it to every shard —
    KeyedBroadcastProcessFunction."""

    def __init__(self, left: "DataStream", right):
        self._left = left
        self._broadcast = isinstance(right, BroadcastStream)
        self._right = right.ds if self._broadcast else right
        self._lkeys: list[str] | None = None
        self._rkeys: list[str] | None = None

    def map(self, f1: Callable, f2: Callable, out_schema: str) -> "DataStream":
        """CoMapFunction (ConnectedStreams.java map): ``f1`` maps rows of
        the first stream, ``f2`` rows of the second, into one schema."""
        if self._broadcast:
            raise ValueError("map() is not defined on a broadcast connect")
        return DataStream(self._left.df.mapInPandas(
            _co_map_runner(f1, out_schema), out_schema
        ).unionByName(self._right.df.mapInPandas(
            _co_map_runner(f2, out_schema), out_schema
        )))

    def flat_map(self, f1: Callable, f2: Callable, out_schema: str) -> "DataStream":
        """CoFlatMapFunction (ConnectedStreams.java:275 flatMap): like
        :meth:`map` but each per-row function returns ZERO OR MORE output
        rows (an iterable of dicts) — asymmetric fan-out per side."""
        if self._broadcast:
            raise ValueError("flat_map() is not defined on a broadcast connect")
        return DataStream(self._left.df.mapInPandas(
            _co_flat_map_runner(f1, out_schema), out_schema
        ).unionByName(self._right.df.mapInPandas(
            _co_flat_map_runner(f2, out_schema), out_schema
        )))

    def key_by(self, left_keys, right_keys=None) -> "ConnectedStreams":
        self._lkeys = [left_keys] if isinstance(left_keys, str) else list(left_keys)
        rk = right_keys if right_keys is not None else left_keys
        self._rkeys = [rk] if isinstance(rk, str) else list(rk)
        return self

    def process(
        self,
        fn,
        out_schema: str,
        state_schema: str,
        common_cols: Sequence[str],
        n_shards: int = 64,
    ) -> DataFrame:
        """CoProcessFunction / KeyedBroadcastProcessFunction: ``fn(key,
        pdfs, state)`` sees both inputs union-tagged (`_stream` =
        'main'/'control', control-first at equal sort keys — the caller
        orders inside fn).  Keyed connect requires key_by(); a broadcast
        connect shards the main stream and replicates the broadcast side
        to every shard."""
        from flink_1_12_0_spark.streaming.stateful import keyed_process

        if self._broadcast:
            from flink_1_12_0_spark.streaming.sinks import broadcast_connect

            if not self._lkeys or len(self._lkeys) != 1:
                raise ValueError("broadcast connect needs key_by(one main-side key)")
            both = broadcast_connect(
                self._left.df, self._right.df, common_cols,
                shard_key=self._lkeys[0], n_shards=n_shards,
            )
            return keyed_process(both, ["_shard"], fn, out_schema, state_schema)
        from flink_1_12_0_spark.streaming.sinks import connect_with_control

        if not self._lkeys:
            raise ValueError("call key_by(...) before process(...)")
        right = self._right.df
        for a, b in zip(self._lkeys, self._rkeys):
            if a != b:
                right = right.withColumnRenamed(b, a)
        both = connect_with_control(self._left.df, right, common_cols)
        return keyed_process(both, self._lkeys, fn, out_schema, state_schema)


def _co_map_runner(fn: Callable, out_schema: str):
    out_names = [c.split()[0].strip("`") for c in out_schema.split(",")]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [fn(r) for r in pdf.to_dict("records")]
            yield pd.DataFrame(rows) if rows else pd.DataFrame([], columns=out_names)

    return run


def _co_flat_map_runner(fn: Callable, out_schema: str):
    """Same runner shape as :func:`_co_map_runner` with an iterator
    contract: ``fn(row)`` yields zero or more output dicts."""
    out_names = [c.split()[0].strip("`") for c in out_schema.split(",")]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [o for r in pdf.to_dict("records") for o in fn(r)]
            yield pd.DataFrame(rows) if rows else pd.DataFrame([], columns=out_names)

    return run


class KeyedStream:
    """Stream partitioned by key — unlocks state and timers
    (KeyedStream.java:289)."""

    def __init__(self, df: DataFrame, keys: Sequence[str]):
        self.df = df
        self.keys = list(keys)

    # --- key-preserving transforms (pyflink KeyedStream inherits the
    # DataStream row transforms; the result stays keyed) -----------------
    def map(self, fn: Callable[[dict], dict], out_schema: str) -> "KeyedStream":
        return KeyedStream(DataStream(self.df).map(fn, out_schema).df, self.keys)

    def flat_map(self, fn, out_schema: str) -> "KeyedStream":
        return KeyedStream(DataStream(self.df).flat_map(fn, out_schema).df, self.keys)

    def filter(self, predicate) -> "KeyedStream":
        return KeyedStream(DataStream(self.df).filter(predicate).df, self.keys)

    def reduce(self, col: str, how: str = "sum") -> DataFrame:
        """Running per-key reduce; bounded analog = the final reduction
        (sum/min/max — ReduceFunction over keyed state)."""
        agg = {"sum": F.sum, "min": F.min, "max": F.max}[how]
        return self.df.groupBy(*self.keys).agg(agg(col).alias(f"{how}_{col}"))

    def sum(self, col: str) -> DataFrame:
        return self.reduce(col, "sum")

    def min(self, col: str) -> DataFrame:
        return self.reduce(col, "min")

    def max(self, col: str) -> DataFrame:
        return self.reduce(col, "max")

    def min_by(self, col: str, first: bool = True) -> DataFrame:
        """KeyedStream.minBy (KeyedStream.java minBy/maxBy): the WHOLE
        element holding the per-key minimum of ``col`` — vs ``min`` which
        tracks only the field.  ``first`` keeps the earliest such element
        on ties (the reference's default); map-side-combinable min_by over
        a struct tiebreaker, no per-key sort."""
        return self._extreme_by(col, first, minimum=True)

    def max_by(self, col: str, first: bool = True) -> DataFrame:
        """KeyedStream.maxBy — see :meth:`min_by`."""
        return self._extreme_by(col, first, minimum=False)

    def _extreme_by(self, col: str, first: bool, minimum: bool) -> DataFrame:
        # arrival-order proxy for tie-breaking: monotonically_increasing_id
        # ascends in arrival order within and across input partitions
        ordered = self.df.withColumn("_arrival", F.monotonically_increasing_id())
        payload = list(self.df.columns)
        # min_by/max_by over an ORDERABLE (value, ±arrival) key with the
        # payload carried OUTSIDE the comparator — payload columns may be
        # non-orderable types (maps) without breaking the aggregation; one
        # map-side-combinable partial/final pass, no per-key sort.
        # Comparator sign: min+first / max+last want the tie to follow the
        # aggregate's own direction (+arrival); the other two oppose it.
        tie = F.col("_arrival") if first == minimum else -F.col("_arrival")
        ordk = F.struct(F.col(col).alias("_v"), tie.alias("_t"))
        elem = F.struct(*[F.col(c) for c in payload])
        agg = (F.min_by if minimum else F.max_by)(elem, ordk)
        out = ordered.groupBy(*self.keys).agg(agg.alias("_e"))
        return out.select(*self.keys, *[F.col(f"_e.{c}").alias(c)
                                        for c in payload if c not in self.keys])

    def window(self, ts: str, size: str, slide: str | None = None) -> "WindowedStream":
        """Tumbling (slide=None) or sliding event-time window."""
        return WindowedStream(self.df, self.keys, ts, size, slide)

    def session_window(self, ts: str, gap: str) -> "WindowedStream":
        return WindowedStream(self.df, self.keys, ts, None, None, gap=gap)

    def count_window(self, size: int, slide: int | None = None) -> "CountWindowedStream":
        """KeyedStream.countWindow (KeyedStream.java:437): tumbling
        (slide=None) or sliding count windows per key; only FULL windows
        fire (count-trigger semantics)."""
        return CountWindowedStream(self.df, self.keys, size, slide)

    def process(self, fn, out_schema: str, state_schema: str, **kw) -> DataFrame:
        """KeyedProcessFunction with state + timers
        (KeyedProcessFunction.java:52) → applyInPandasWithState."""
        from flink_1_12_0_spark.streaming.stateful import keyed_process

        return keyed_process(self.df, self.keys, fn, out_schema, state_schema, **kw)

    def interval_join(
        self, other: "KeyedStream", left_ts: str, right_ts: str, lower: str, upper: str
    ) -> DataFrame:
        """KeyedStream.intervalJoin (IntervalJoinOperator.java:87)."""
        from flink_1_12_0_spark.operators.joins import interval_join

        keys = list(zip(self.keys, other.keys))
        return interval_join(self.df, other.df, keys, left_ts, right_ts, lower, upper)


def _interval_s(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(n) * mult


class JoinedStreams:
    """``a.join(b).where(k).equal_to(k).window(ts, size).apply(...)`` —
    the fluent per-window equi-join surface (DataStream.java:777,
    JoinedStreams.java): pairs of left/right elements sharing (key,
    window) emit one row each.  Compiles to window() both sides + an
    equi-join on (key, window) — fully declarative, two hash shuffles."""

    def __init__(self, left: "DataStream", right: "DataStream", cogroup: bool = False):
        self._left, self._right = left, right
        self._cogroup = cogroup
        self._lkeys: list[str] | None = None
        self._rkeys: list[str] | None = None

    def where(self, *keys: str) -> "JoinedStreams":
        self._lkeys = list(keys)
        return self

    def equal_to(self, *keys: str) -> "JoinedStreams":
        self._rkeys = list(keys)
        return self

    def window(self, ts: str, size: str) -> "WindowedJoin":
        if not self._lkeys or not self._rkeys:
            raise ValueError("call where(...) and equal_to(...) before window()")
        return WindowedJoin(
            self._left.df, self._right.df, self._lkeys, self._rkeys,
            ts, size, self._cogroup,
        )


class WindowedJoin:
    def __init__(self, ldf, rdf, lkeys, rkeys, ts, size, cogroup):
        self._ldf, self._rdf = ldf, rdf
        self._lkeys, self._rkeys = lkeys, rkeys
        self._ts, self._size = ts, size
        self._cogroup = cogroup

    def _windowed(self):
        lw = self._ldf.withColumn("_w", F.window(self._ts, self._size))
        rw = self._rdf.withColumn("_w", F.window(self._ts, self._size))
        return lw, rw

    def apply(self, fn=None, out_schema: str | None = None) -> DataFrame:
        """JoinFunction per pair — ``fn(left_row_dict, right_row_dict) ->
        row dict`` (default: the joined row with the duplicated window /
        equal-key columns deduped), or — under coGroup —
        ``fn(key_tuple, window_start, left_pdf, right_pdf) -> row dicts``
        over the FULL per-(key, window) groups, including one-sided groups
        (CoGroupFunction semantics, JoinedStreams.apply /
        CoGroupedStreams.apply)."""
        lw, rw = self._windowed()
        lcols = [c for c in self._ldf.columns]
        rcols = [c for c in self._rdf.columns]
        if not self._cogroup:
            cond = [lw["_w"] == rw["_w"]] + [
                lw[a] == rw[b] for a, b in zip(self._lkeys, self._rkeys)
            ]
            joined = lw.join(rw, cond, "inner")
            if fn is None:
                # dedupe the columns the equi-condition makes redundant:
                # the right window struct and any right equal-key whose
                # name collides with its left partner
                joined = joined.drop(rw["_w"])
                for a, b in zip(self._lkeys, self._rkeys):
                    if a == b:
                        joined = joined.drop(rw[b])
                return joined
            if out_schema is None:
                raise ValueError("join apply(fn) needs out_schema")
            # JoinFunction path (JoinedStreams WithWindow.apply): the
            # user fn maps each joined PAIR; sides arrive as dicts via
            # struct packing so same-named columns stay separable
            pairs = joined.select(
                F.struct(*[lw[c] for c in lcols]).alias("_l"),
                F.struct(*[rw[c] for c in rcols]).alias("_r"),
            )
            out_names = [c.split()[0].strip("`") for c in out_schema.split(",")]

            def run_pairs(it):
                import pandas as pd

                for pdf in it:
                    rows = [fn(l, r) for l, r in zip(pdf["_l"], pdf["_r"])]
                    yield (
                        pd.DataFrame(rows)
                        if rows
                        else pd.DataFrame([], columns=out_names)
                    )

            return pairs.mapInPandas(run_pairs, out_schema)
        if fn is None or out_schema is None:
            raise ValueError("coGroup apply() needs fn and out_schema")
        # union-tag, then one applyInPandas per (key, window) — one-sided
        # groups reach fn with an empty opposite frame, the coGroup
        # contract a plain join cannot express (CoGroupedStreams.java)
        lt = lw.select(
            *[F.col(k).alias(f"_k{i}") for i, k in enumerate(self._lkeys)],
            F.col("_w.start").alias("_ws"),
            F.lit(0).alias("_side"),
            F.to_json(F.struct(*lcols)).alias("_payload"),
        )
        rt = rw.select(
            *[F.col(k).alias(f"_k{i}") for i, k in enumerate(self._rkeys)],
            F.col("_w.start").alias("_ws"),
            F.lit(1).alias("_side"),
            F.to_json(F.struct(*rcols)).alias("_payload"),
        )
        both = lt.unionByName(rt)
        kcols = [f"_k{i}" for i in range(len(self._lkeys))] + ["_ws"]
        # the JSON transport omits null fields and an empty side parses to
        # a frame with NO columns — rebuild each side against its declared
        # column list and parse timestamp columns back to datetimes so the
        # CoGroupFunction always sees the full, typed schema
        lts = [c for c, t in self._ldf.dtypes if t.startswith("timestamp")]
        rts = [c for c, t in self._rdf.dtypes if t.startswith("timestamp")]

        def run(key, pdf):
            import json

            import pandas as pd

            def side(flag, cols, ts_cols):
                f = pd.DataFrame(
                    [json.loads(p) for p in pdf.loc[pdf["_side"] == flag, "_payload"]]
                ).reindex(columns=cols)
                for c in ts_cols:
                    f[c] = pd.to_datetime(f[c])
                return f

            left = side(0, lcols, lts)
            right = side(1, rcols, rts)
            rows = list(fn(key[:-1], key[-1], left, right))
            return pd.DataFrame(rows) if rows else pd.DataFrame(
                [], columns=[c.split()[0].strip("`") for c in out_schema.split(",")]
            )

        return both.groupBy(*kcols).applyInPandas(run, out_schema)


class WindowedStream:
    def __init__(self, df, keys, ts, size, slide, gap: str | None = None):
        self._df, self._keys, self._ts = df, keys, ts
        self._size, self._slide, self._gap = size, slide, gap
        self._trigger_interval: str | None = None
        self._purging = False
        self._evictor: tuple | None = None

    # -- trigger/evictor configuration (reference WindowedStream.trigger /
    # .evictor, flink-streaming-java .../datastream/WindowedStream.java) --
    def trigger_continuous(self, fire_interval: str) -> "WindowedStream":
        """ContinuousEventTimeTrigger(fire_interval)."""
        self._trigger_interval = fire_interval
        return self

    def trigger_purging(self) -> "WindowedStream":
        """Wrap the trigger in PurgingTrigger (fires consume the buffer)."""
        self._purging = True
        return self

    def evictor_count(self, n: int) -> "WindowedStream":
        self._evictor = ("count", n)
        return self

    def evictor_time(self, duration: str) -> "WindowedStream":
        self._evictor = ("time", _interval_s(duration))
        return self

    def evictor_delta(self, threshold: float) -> "WindowedStream":
        """DeltaEvictor.java: evict elements whose DeltaFunction value
        against the window's last element reaches ``threshold``
        (delta = |value - last value| on the aggregated column)."""
        self._evictor = ("delta", threshold)
        return self

    def sum_count(self, value_col: str, tiebreak: str):
        """Terminal op for the trigger/evictor path: per-window count+sum
        fired per the configured trigger (streaming input required) —
        executes on streaming/stateful.tumble_event_windows."""
        from flink_1_12_0_spark.streaming.stateful import tumble_event_windows

        if self._gap is not None:
            raise NotImplementedError(
                "trigger/evictor path supports tumbling/sliding windows"
            )
        return tumble_event_windows(
            self._df, self._keys, ts=self._ts, tiebreak=tiebreak,
            value_col=value_col, size_s=_interval_s(self._size),
            fire_interval_s=(
                _interval_s(self._trigger_interval) if self._trigger_interval else None
            ),
            evictor=self._evictor, purging=self._purging,
            slide_s=_interval_s(self._slide) if self._slide else None,
        )

    def aggregate(self, *aggs: Column) -> DataFrame:
        """WindowedStream.aggregate — per (key, window) aggregation."""
        if self._gap is not None:
            w = F.session_window(F.col(self._ts), self._gap)
        elif self._slide is not None:
            w = F.window(F.col(self._ts), self._size, self._slide)
        else:
            w = F.window(F.col(self._ts), self._size)
        return self._df.groupBy(w.alias("window"), *self._keys).agg(*aggs)

    def apply(self, fn, out_schema: str) -> DataFrame:
        """WindowFunction — full access to the window's rows via
        applyInPandas per (key, window)."""
        w = (
            F.session_window(F.col(self._ts), self._gap)
            if self._gap is not None
            else F.window(F.col(self._ts), self._size, self._slide or self._size)
        )
        tagged = self._df.withColumn("window", w)
        return tagged.groupBy("window", *self._keys).applyInPandas(fn, out_schema)


class CountWindowedStream:
    """Keyed count-window surface (CountTumblingWindowAssigner /
    CountSlidingWindowAssigner + count trigger).  Terminal
    :meth:`sum_count` runs the stateful operator — streaming input
    required (the counter is keyed state crossing micro-batches)."""

    def __init__(self, df, keys: Sequence[str], size: int, slide: int | None):
        self._df, self._keys = df, list(keys)
        self._size, self._slide = size, slide

    def sum_count(self, ts: str, tiebreak: str, value_col: str) -> DataFrame:
        from flink_1_12_0_spark.streaming.stateful import (
            count_slide_window,
            count_tumble_window,
        )

        if self._slide is None:
            return count_tumble_window(
                self._df, self._keys, ts=ts, tiebreak=tiebreak,
                size=self._size, value_col=value_col,
            )
        return count_slide_window(
            self._df, self._keys, ts=ts, tiebreak=tiebreak,
            size=self._size, slide=self._slide, value_col=value_col,
        )


class AllWindowedStream:
    """Non-keyed windows (AllWindowedStream.java:114): the reference keys
    by NullByteKeySelector — one constant key.  The declarative terminals
    (aggregate/apply) group by the window alone, which Spark computes
    with map-side partial aggregation (scales with cores, unlike the
    reference's single parallel-1 task); the stateful trigger/evictor
    terminal keys by a literal, mirroring the reference exactly."""

    _ALL = "_all"

    def __init__(self, df, ts, size, slide, gap: str | None = None):
        self._ws = WindowedStream(df, [], ts, size, slide, gap=gap)

    # trigger/evictor configuration delegates (fluent, like the keyed one)
    def trigger_continuous(self, fire_interval: str) -> "AllWindowedStream":
        self._ws.trigger_continuous(fire_interval)
        return self

    def trigger_purging(self) -> "AllWindowedStream":
        self._ws.trigger_purging()
        return self

    def evictor_count(self, n: int) -> "AllWindowedStream":
        self._ws.evictor_count(n)
        return self

    def evictor_time(self, duration: str) -> "AllWindowedStream":
        self._ws.evictor_time(duration)
        return self

    def evictor_delta(self, threshold: float) -> "AllWindowedStream":
        self._ws.evictor_delta(threshold)
        return self

    def aggregate(self, *aggs: Column) -> DataFrame:
        return self._ws.aggregate(*aggs)

    def apply(self, fn, out_schema: str) -> DataFrame:
        return self._ws.apply(fn, out_schema)

    def sum_count(self, value_col: str, tiebreak: str) -> DataFrame:
        keyed = WindowedStream(
            self._ws._df.withColumn(self._ALL, F.lit(0)), [self._ALL],
            self._ws._ts, self._ws._size, self._ws._slide, gap=self._ws._gap,
        )
        keyed._trigger_interval = self._ws._trigger_interval
        keyed._purging = self._ws._purging
        keyed._evictor = self._ws._evictor
        return keyed.sum_count(value_col, tiebreak).drop(self._ALL)


class AllCountWindowedStream(CountWindowedStream):
    """countWindowAll (DataStream.java:855): count windows over ONE
    global counter — keyed count windows on a literal key (the
    NullByteKeySelector translation), key dropped from the output."""

    _ALL = "_all"

    def __init__(self, df, size: int, slide: int | None):
        super().__init__(df.withColumn(self._ALL, F.lit(0)), [self._ALL], size, slide)

    def sum_count(self, ts: str, tiebreak: str, value_col: str) -> DataFrame:
        return super().sum_count(ts, tiebreak, value_col).drop(self._ALL)


def truncate_lineage(df, reliable: bool | None = None):
    """Materialize ``df`` and cut its Catalyst lineage.

    ``reliable=None`` auto-selects: a RELIABLE checkpoint (written to the
    configured checkpoint dir with replicated storage — survives executor
    loss, the right choice on a multi-executor cluster) when
    ``sc.setCheckpointDir`` has been called, else ``localCheckpoint``
    (executor-local blocks: cheap and fine on local[*], but an executor
    loss mid-job fails the whole job because the blocks are unreplicated
    — ADVICE r5 (d)).  Pass ``reliable=True/False`` to force either."""
    sc = df.sparkSession.sparkContext
    if reliable is None:
        reliable = sc.getCheckpointDir() is not None
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)


def iterate_bounded(df, body, n_iterations: int, checkpoint_every: int = 1,
                    reliable_checkpoint: bool | None = None):
    """Bounded iteration (reference: DataSet.iterate / IterativeDataSet,
    flink-java .../operators/IterativeDataSet.java): apply ``body(df, i)``
    ``n_iterations`` times with lineage truncation every
    ``checkpoint_every`` rounds (see :func:`truncate_lineage` for the
    local-vs-reliable choice) — without truncation the Catalyst plan
    doubles per round and planning time explodes long before data size
    matters.

    This is the driver-loop pattern every iterative operator here uses
    (operators/kmeans.py Lloyd iterations): the loop control is driver-
    side (tiny), the per-round work is fully distributed.  Flink's bulk
    iterations with convergence criteria map to a caller-side loop over
    this with an explicit check between rounds.
    """
    cur = df
    for i in range(n_iterations):
        cur = body(cur, i)
        if (i + 1) % checkpoint_every == 0:
            cur = truncate_lineage(cur, reliable_checkpoint)
    return cur


def iterate_with_termination(
    df, body, max_iterations: int = 1000, checkpoint_every: int = 1,
    reliable_checkpoint: bool | None = None,
):
    """Bounded iteration with a convergence criterion (reference:
    DataSet.iterateWithTermination, flink-java
    .../api/java/operators/IterativeDataSet.java): ``body(df, i)`` returns
    ``(next_df, termination_df)`` and the loop stops as soon as
    ``termination_df`` is empty — Flink's empty-termination-set contract.

    The emptiness probe is a driver-side boolean per round (one count-ish
    action, no data collected), so convergence-dependent algorithms
    (label propagation, shortest paths) terminate by *reaching a fixed
    point* rather than by guessing an iteration budget.  ``max_iterations``
    is only a runaway backstop; hitting it raises."""
    cur = df
    for i in range(max_iterations):
        cur, term = body(cur, i)
        if (i + 1) % checkpoint_every == 0:
            cur = truncate_lineage(cur, reliable_checkpoint)
        if term.isEmpty():
            return cur
    raise RuntimeError(
        f"iterate_with_termination: no convergence in {max_iterations} rounds"
    )


class StreamExecutionEnvironment:
    """The DataStream entry point (pyflink
    pyflink/datastream/stream_execution_environment.py /
    flink-streaming-java StreamExecutionEnvironment.java): program setup +
    bounded sources.  Spark-first: the environment wraps a SparkSession;
    parallelism maps to the session's shuffle parallelism, and execute()
    is a no-op returning a result handle — Spark jobs run eagerly at each
    action instead of on a final env.execute() (documented divergence:
    there is no deferred job graph to submit)."""

    def __init__(self, spark):
        self.spark = spark
        self._job_name = None

    @staticmethod
    def get_execution_environment(spark=None) -> "StreamExecutionEnvironment":
        if spark is None:
            from flink_1_12_0_spark.session import get_spark

            spark = get_spark()
        return StreamExecutionEnvironment(spark)

    def set_parallelism(self, parallelism: int) -> "StreamExecutionEnvironment":
        self.spark.conf.set("spark.sql.shuffle.partitions", str(parallelism))
        return self

    def get_parallelism(self) -> int:
        return int(self.spark.conf.get("spark.sql.shuffle.partitions"))

    def from_collection(self, collection, schema: str | None = None) -> DataStream:
        """env.from_collection (pyflink :706): a bounded stream from local
        elements, with an optional DDL schema."""
        df = (
            self.spark.createDataFrame(collection, schema)
            if schema is not None
            else self.spark.createDataFrame(collection)
        )
        return DataStream(df)

    def generate_sequence(self, start: int, end: int) -> DataStream:
        """env.generate_sequence: the numeric range source (inclusive
        bounds, column ``id`` — StatefulSequenceSource)."""
        return DataStream(self.spark.range(start, end + 1))

    def read_text_file(self, file_path: str, charset_name: str = "UTF-8") -> DataStream:
        """env.read_text_file (pyflink :691): one row per line, column
        ``value`` (TextInputFormat)."""
        if charset_name.upper().replace("-", "").replace("_", "") != "UTF8":
            raise NotImplementedError("text source charset: UTF-8 only")
        return DataStream(self.spark.read.text(file_path))

    def execute(self, job_name: str | None = None):
        """env.execute (pyflink :609): Spark actions already ran eagerly;
        returns a minimal JobExecutionResult-shaped handle."""
        self._job_name = job_name
        return {"job_name": job_name or "spark-graft-job", "state": "FINISHED"}
