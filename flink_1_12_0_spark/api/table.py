"""Fluent Table API: TableEnvironment + Table.

Reference surface: flink-table/flink-table-api-java
.../api/TableEnvironment.java (catalog + sqlQuery/executeSql) and
.../api/Table.java (select/filter/groupBy/join/orderBy/fetch/union/...,
built client-side as QueryOperation trees, planned via PlannerBase
.../delegation/PlannerBase.scala:188).

Spark-first: a Table wraps a DataFrame; every fluent call builds the SAME
Catalyst logical plan the SQL path produces (SURVEY §3.2 — one lifecycle),
so the optimizer treats API and SQL queries identically.  Expressions are
either pyspark Columns or SQL strings (parsed with ``F.expr`` — the
analog of the reference's expression DSL parser).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_12_0_spark.tables import load_tables


def _c(e) -> Column:
    return e if isinstance(e, Column) else F.expr(e)


class TableConfig:
    """TableConfig (flink-table-api-java .../api/TableConfig.java;
    pyflink table_config.py): execution-tuning knobs.  Spark-meaningful
    keys map onto session confs; the rest are held for operators that
    read them (idle-state retention feeds the sharded streaming-dedup
    state TTL — streaming/stateful.streaming_first_seen_flag)."""

    #: Flink config key -> Spark session conf
    _SPARK_KEYS = {
        "table.exec.resource.default-parallelism": "spark.sql.shuffle.partitions",
    }

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._conf: dict[str, str] = {}

    def set(self, key: str, value) -> "TableConfig":
        value = str(value)
        if key in self._SPARK_KEYS:
            self._spark.conf.set(self._SPARK_KEYS[key], value)
        self._conf[key] = value
        return self

    def get(self, key: str, default=None):
        if key in self._SPARK_KEYS:
            return self._spark.conf.get(self._SPARK_KEYS[key], default)
        return self._conf.get(key, default)

    def set_idle_state_retention(self, retention) -> "TableConfig":
        """setIdleStateRetention(Duration): seconds (int/float) or
        datetime.timedelta.  Consumed by stateful operators that support
        lazy state expiry."""
        import datetime

        s = (
            retention.total_seconds()
            if isinstance(retention, datetime.timedelta)
            else float(retention)
        )
        self._conf["table.exec.state.ttl"] = str(s)
        return self

    def get_idle_state_retention(self) -> float | None:
        v = self._conf.get("table.exec.state.ttl")
        return float(v) if v is not None else None


class TableEnvironment:
    """Catalog + SQL entry point (TableEnvironmentImpl.java:638 sqlQuery)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._config = TableConfig(spark)

    @classmethod
    def create(cls, spark: SparkSession) -> "TableEnvironment":
        return cls(spark)

    def get_config(self) -> TableConfig:
        return self._config

    def register_fixture_tables(self, sf_dir: str | None = None) -> None:
        load_tables(self.spark, sf_dir)

    def from_path(self, name: str) -> "Table":
        return Table(self.spark.table(name))

    def from_dataframe(self, df: DataFrame) -> "Table":
        return Table(df)

    def from_elements(self, elements, schema: str | None = None) -> "Table":
        """TableEnvironment.fromElements / pyflink from_elements
        (flink-python pyflink/table/table_environment.py): build a Table
        from local rows — tuples/dicts — with an optional DDL schema."""
        if schema is not None:
            return Table(self.spark.createDataFrame(elements, schema))
        return Table(self.spark.createDataFrame(elements))

    def from_pandas(self, pdf, schema=None, splits_num: int = 1) -> "Table":
        """pyflink from_pandas (flink-python
        pyflink/table/table_environment.py:1423): a Table from a pandas
        DataFrame.  ``schema`` may be a DDL string or a list of field
        names (the pyflink custom-field-names form); ``splits_num`` maps
        to the partition count (Arrow-batched in both engines)."""
        if isinstance(schema, (list, tuple)):
            pdf = pdf.copy()
            pdf.columns = list(schema)
            schema = None
        df = (
            self.spark.createDataFrame(pdf, schema)
            if schema is not None
            else self.spark.createDataFrame(pdf)
        )
        if splits_num and splits_num > 1:
            df = df.repartition(splits_num)
        return Table(df)

    @property
    def _router(self):
        """The executeSql statement router (plans/catalog_ddl) — one per
        fluent environment, so DDL state (connector tables, catalogs,
        temporal functions) persists across calls, like the reference's
        single TableEnvironment."""
        if getattr(self, "_router_inst", None) is None:
            from flink_1_12_0_spark.plans.catalog_ddl import (
                TableEnvironment as Router,
            )

            self._router_inst = Router(self.spark)
        return self._router_inst

    def sql_query(self, sql: str) -> "Table":
        """TableEnvironment.sqlQuery: a Flink-dialect SELECT (incl.
        MATCH_RECOGNIZE, temporal joins, group-window syntax) as a Table."""
        return Table(self._router._query(sql))

    def execute_sql(self, sql: str) -> DataFrame:
        """TableEnvironment.executeSql: full statement surface (DDL,
        catalog ops, INSERT, queries) via the statement router."""
        return self._router.execute_sql(sql)

    def register_function(self, name: str, fn) -> None:
        """TableEnvironment.registerFunction — see the router's method."""
        self._router.register_function(name, fn)

    def create_statement_set(self):
        return self._router.create_statement_set()

    def create_temporary_view(self, name: str, table: "Table") -> None:
        table.df.createOrReplaceTempView(name)

    def list_tables(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]


class GroupedTable:
    def __init__(self, df: DataFrame, keys: Sequence):
        self._df = df
        self._raw_keys = list(keys)
        self._keys = [_c(k) for k in keys]

    def select(self, *exprs) -> "Table":
        """Grouping keys and aggregate expressions, in output order.  A
        string expression equal to a grouping key is the key itself (not
        re-aggregated) — mirrors the reference's grouped ``select``."""
        key_names = {k for k in self._raw_keys if isinstance(k, str)}
        aggs = [
            _c(e) for e in exprs if not (isinstance(e, str) and e.strip() in key_names)
        ]
        return Table(self._df.groupBy(*self._keys).agg(*aggs))

    def having(self, predicate) -> "GroupedHaving":
        """Defer a post-aggregation filter: ``group_by(k).having(p).select(...)``."""
        return GroupedHaving(self, predicate)

    def flat_aggregate(self, fn, out_schema: str) -> "Table":
        """Table aggregate (UDTAF / ``flatAggregate``): emit MULTIPLE rows
        per group (reference TableAggregateFunction.java:162, e.g. the
        Top2 example; StreamExecGroupTableAggregate.scala) —
        ``fn(key_tuple, pdf) -> pdf`` via ``applyInPandas``."""
        return Table(self._df.groupBy(*self._keys).applyInPandas(fn, out_schema))

    def aggregate(self, fn, out_schema: str) -> "Table":
        """Table.aggregate with a user AggregateFunction (reference
        Table.java aggregate(String)): ONE output row per group —
        ``fn(key_tuple, pdf) -> single-row pdf``.  The single-row
        contract distinguishes it from :meth:`flat_aggregate` and is
        enforced, like the reference's SingleValue check."""

        def wrapped(key, pdf):
            out = fn(key, pdf)
            if len(out) != 1:
                raise ValueError(
                    f"aggregate fn must emit exactly 1 row per group, got {len(out)}"
                )
            return out

        return Table(self._df.groupBy(*self._keys).applyInPandas(wrapped, out_schema))


class GroupedHaving:
    def __init__(self, grouped: "GroupedTable", predicate):
        self._grouped = grouped
        self._pred = predicate

    def select(self, *exprs) -> "Table":
        return self._grouped.select(*exprs).filter(self._pred)


class Table:
    """Fluent relational table (reference Table.java)."""

    def __init__(self, df: DataFrame):
        self.df = df

    # --- projection / filter -------------------------------------------------
    def select(self, *exprs) -> "Table":
        return Table(self.df.select(*[_c(e) for e in exprs]))

    def alias(self, *names: str) -> "Table":
        """Table.as(fields...) (reference Table.java as): rename ALL
        columns positionally."""
        if len(names) != len(self.df.columns):
            raise ValueError(
                f"alias needs {len(self.df.columns)} names, got {len(names)}"
            )
        return Table(self.df.toDF(*names))

    as_ = alias

    def filter(self, predicate) -> "Table":
        return Table(self.df.where(_c(predicate)))

    where = filter

    def distinct(self) -> "Table":
        return Table(self.df.distinct())

    def add_columns(self, **named_exprs) -> "Table":
        df = self.df
        for name, e in named_exprs.items():
            if name in df.columns:
                raise ValueError(f"column exists: {name} (use add_or_replace_columns)")
            df = df.withColumn(name, _c(e))
        return Table(df)

    def add_or_replace_columns(self, **named_exprs) -> "Table":
        df = self.df
        for name, e in named_exprs.items():
            df = df.withColumn(name, _c(e))
        return Table(df)

    def rename_columns(self, **renames) -> "Table":
        df = self.df
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return Table(df)

    def drop_columns(self, *names: str) -> "Table":
        return Table(self.df.drop(*names))

    # --- grouping / sorting --------------------------------------------------
    def group_by(self, *keys) -> GroupedTable:
        pw = getattr(self, "_pending_window", None)
        if pw is not None:
            from pyspark.sql import functions as F

            keys = [
                F.session_window(F.col(pw.ts), pw.gap).alias(pw.name)
                if isinstance(k, str) and k.strip() == pw.name
                else k
                for k in keys
            ]
        return GroupedTable(self.df, keys)

    def over_window(self, w: "OverWindow", **named_exprs) -> "Table":
        """pyflink descriptor form: ``t.over_window(Over.partition_by("k")
        .order_by("ts").preceding("rows", 3).alias("w"))`` with each kwarg
        ``name=fn(WindowSpec)`` — the reference's Table.over_window."""
        spec = w.spec()
        df = self.df
        for name, fn in named_exprs.items():
            df = df.withColumn(name, fn(spec))
        return Table(df)

    def over(self, partition_by: Sequence, order_by: Sequence, **named_windows) -> "Table":
        """OVER-window select (Table API ``window(Over...)``): each kwarg
        is ``name=window_fn`` where window_fn takes the WindowSpec, e.g.
        ``rn=lambda w: F.row_number().over(w)``."""
        from pyspark.sql.window import Window

        w = Window.partitionBy(*[_c(k) for k in partition_by]).orderBy(
            *[_c(k) for k in order_by]
        )
        df = self.df
        for name, fn in named_windows.items():
            df = df.withColumn(name, fn(w))
        return Table(df)

    def order_by(self, *exprs) -> "Table":
        return Table(self.df.orderBy(*[_c(e) for e in exprs]))

    def offset(self, n: int) -> "Table":
        return Table(self.df.offset(n))

    def fetch(self, n: int) -> "Table":
        return Table(self.df.limit(n))

    limit = fetch

    # --- joins ---------------------------------------------------------------
    def join(self, other: "Table", on=None, how: str = "inner") -> "Table":
        cond = _c(on) if on is not None else None
        return Table(self.df.join(other.df, cond, how))

    def left_outer_join(self, other: "Table", on) -> "Table":
        return self.join(other, on, "left")

    def right_outer_join(self, other: "Table", on) -> "Table":
        return self.join(other, on, "right")

    def full_outer_join(self, other: "Table", on) -> "Table":
        return self.join(other, on, "full")

    def cross_join(self, other: "Table") -> "Table":
        return Table(self.df.crossJoin(other.df))

    def join_lateral(self, udtf_expr, alias: str) -> "Table":
        """``table.joinLateral(split(col).alias('w'))`` — CROSS JOIN
        LATERAL against a table function (reference Table.joinLateral,
        pyflink table.py join_lateral; planner StreamExecCorrelate).
        ``udtf_expr`` is a Column produced by a ``functions.udf.udtf``
        (array-returning); rows with an empty/NULL result are dropped."""
        from pyspark.sql import functions as F

        return Table(self.df.withColumn(alias, F.explode(udtf_expr)))

    def left_outer_join_lateral(self, udtf_expr, alias: str) -> "Table":
        """LEFT OUTER JOIN LATERAL: like :meth:`join_lateral` but a probe
        row with no UDTF results survives with NULL (explode_outer)."""
        from pyspark.sql import functions as F

        return Table(self.df.withColumn(alias, F.explode_outer(udtf_expr)))

    def map(self, fn, out_schema: str) -> "Table":
        """Table.map (reference flink-table-api Table.map, 1.9+): apply a
        row-to-row function over the full table.  ``fn`` is a pandas
        DataFrame -> DataFrame transform (Arrow-batched, the PyFlink
        pandas ScalarFunction analog); the result schema is declared."""
        return Table(self.df.mapInPandas(lambda it: (fn(pdf) for pdf in it), out_schema))

    def flat_map(self, fn, out_schema: str) -> "Table":
        """Table.flatMap: row -> many rows via a TableFunction.  ``fn``
        maps one pandas DataFrame batch to an iterable of output frames
        (may yield zero or multiple rows per input row)."""

        def gen(it):
            for pdf in it:
                yield from fn(pdf)

        return Table(self.df.mapInPandas(gen, out_schema))

    def create_temporal_table_function(
        self, time_attr: str, primary_key: str
    ) -> "TemporalTableFunction":
        """Table.createTemporalTableFunction (reference:
        flink-table-common .../functions/TemporalTableFunction.java,
        table.py createTemporalTableFunction): wraps THIS table as a
        versioned history keyed by ``primary_key`` with version time
        ``time_attr``; use via :meth:`join_lateral_temporal`."""
        return TemporalTableFunction(self, time_attr, primary_key)

    def join_lateral_temporal(
        self, ttf: "TemporalTableFunction", probe_time_attr: str,
        attrs: Sequence[str] | None = None,
    ) -> "Table":
        """``probe.joinLateral(rates(probe_ts))`` — each probe row joins the
        version valid at its own timestamp.  Executes on the union-tag
        as-of join (operators/joins.temporal_join), the scalable plan for
        TemporalRowTimeJoinOperator semantics."""
        from flink_1_12_0_spark.operators.joins import temporal_join

        versions = ttf.table.df
        if attrs is None:
            attrs = [
                c for c in versions.columns
                if c not in (ttf.primary_key, ttf.time_attr)
            ]
        return Table(
            temporal_join(
                self.df, versions, [ttf.primary_key], probe_time_attr,
                ttf.time_attr, list(attrs),
            )
        )

    # --- set ops -------------------------------------------------------------
    def union(self, other: "Table") -> "Table":
        return Table(self.df.union(other.df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self.df.unionAll(other.df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self.df.intersect(other.df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self.df.intersectAll(other.df))

    def minus(self, other: "Table") -> "Table":
        # EXCEPT DISTINCT: a row present in `other` is removed entirely,
        # regardless of left-side multiplicity ({x,x,x} minus {x} = {}).
        # exceptAll().distinct() would wrongly keep surviving duplicates.
        return Table(self.df.subtract(other.df))

    def minus_all(self, other: "Table") -> "Table":
        return Table(self.df.exceptAll(other.df))

    # --- group windows (TUMBLE/HOP/SESSION/CUMULATE, Table API `window()`) ---
    def window(self, w: "GroupWindow") -> "Table":
        """pyflink descriptor form: ``t.window(Tumble.over("1 hour")
        .on("ts").alias("w"))`` (reference pyflink/table/window.py Tumble/
        Slide/Session descriptors).  Tumble/Slide assign the window struct
        per row as column ``w.name``; Session defers to ``group_by`` —
        session windows only exist after merge, so the descriptor is
        resolved to ``F.session_window`` inside the grouping clause."""
        from pyspark.sql import functions as F

        from flink_1_12_0_spark.operators.windows import hop, tumble

        # descriptor validation up front — a missing .on()/.every()/gap
        # otherwise surfaces as an opaque Spark error far from the misuse
        if w.kind == "session":
            if w.ts is None or w.gap is None:
                raise ValueError(
                    "Session window requires .with_gap(...) and .on(ts)"
                )
            t = Table(self.df)
            t._pending_window = w
            return t
        if w.ts is None:
            raise ValueError(f"{w.kind.title()} window requires .on(ts)")
        if w.size is None:
            raise ValueError(f"{w.kind.title()} window requires .over(size)")
        if w.kind == "slide" and w.slide is None:
            raise ValueError("Slide window requires .every(slide)")
        out = tumble(self.df, w.ts, w.size) if w.kind == "tumble" else hop(
            self.df, w.ts, w.size, w.slide
        )
        # the assigners flatten to window_start/window_end; the descriptor
        # API also exposes the struct under the alias (w.start / w.end)
        out = out.withColumn(
            w.name,
            F.struct(
                F.col("window_start").alias("start"),
                F.col("window_end").alias("end"),
            ),
        )
        return Table(out)

    def window_tumble(self, ts: str, size: str) -> "Table":
        from flink_1_12_0_spark.operators.windows import tumble

        return Table(tumble(self.df, ts, size))

    def window_hop(self, ts: str, size: str, slide: str) -> "Table":
        from flink_1_12_0_spark.operators.windows import hop

        return Table(hop(self.df, ts, size, slide))

    def window_cumulate(self, ts: str, step: str, max_size: str) -> "Table":
        from flink_1_12_0_spark.operators.windows import cumulate

        return Table(cumulate(self.df, ts, step, max_size))

    # --- materialization (reference table.py:785 to_pandas) ------------------
    def to_pandas(self):
        return self.df.toPandas()

    def execute(self) -> DataFrame:
        return self.df

    def execute_insert(self, table_path: str, env=None, overwrite: bool = False):
        """Table.executeInsert (reference table.py execute_insert /
        TableEnvironment.insertInto): write this table into a registered
        connector table.  ``env`` is the executeSql router
        (plans/catalog_ddl.TableEnvironment) holding the sink's DDL; the
        write is the same distributed path INSERT INTO uses."""
        import re as _re

        if env is None:
            raise ValueError("execute_insert needs the TableEnvironment router")
        # temp view names cannot contain dots — sanitize qualified paths
        view = f"_exec_insert_src_{_re.sub(r'[^A-Za-z0-9_]', '_', table_path)}"
        self.df.createOrReplaceTempView(view)
        mode = "OVERWRITE" if overwrite else "INTO"
        return env.execute_sql(
            f"INSERT {mode} {table_path} SELECT * FROM {view}"
        )

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    def get_schema(self):
        return self.df.schema


class GroupWindow:
    """A group-window descriptor under construction (reference
    pyflink/table/window.py GroupWindow).  Built by the ``Tumble`` /
    ``Slide`` / ``Session`` factories, consumed by ``Table.window``."""

    def __init__(self, kind: str):
        self.kind = kind
        self.name = "window"
        self.ts: str | None = None
        self.size: str | None = None
        self.slide: str | None = None
        self.gap: str | None = None

    def on(self, ts: str) -> "GroupWindow":
        self.ts = ts
        return self

    def alias(self, name: str) -> "GroupWindow":
        self.name = name
        return self

    def every(self, slide: str) -> "GroupWindow":
        self.slide = slide
        return self


class OverWindow:
    """An OVER-window descriptor (reference pyflink/table/window.py Over):
    ``Over.partition_by("k").order_by("ts").preceding(ROWS, 3).alias("w")``.
    ``preceding``/``following`` take ("rows"|"range", n|"unbounded")."""

    def __init__(self):
        self.partition: list = []
        self.order: list = []
        self.frame: tuple | None = None  # (kind, lo, hi)
        self.name = "w"

    def order_by(self, *cols) -> "OverWindow":
        self.order = list(cols)
        return self

    def preceding(self, kind: str, n) -> "OverWindow":
        self.frame = (kind, n, 0)
        return self

    def following(self, n) -> "OverWindow":
        k, lo, _ = self.frame or ("rows", "unbounded", 0)
        self.frame = (k, lo, n)
        return self

    def alias(self, name: str) -> "OverWindow":
        self.name = name
        return self

    def spec(self):
        from pyspark.sql.window import Window

        w = Window.partitionBy(*[_c(k) for k in self.partition]).orderBy(
            *[_c(k) for k in self.order]
        )
        if self.frame is not None:
            kind, lo, hi = self.frame
            lo_v = Window.unboundedPreceding if lo == "unbounded" else -int(lo)
            hi_v = Window.unboundedFollowing if hi == "unbounded" else int(hi)
            w = w.rowsBetween(lo_v, hi_v) if kind == "rows" else w.rangeBetween(lo_v, hi_v)
        return w


class Over:
    """``Over.partition_by("k").order_by("ts")...`` factory."""

    @classmethod
    def partition_by(cls, *cols) -> OverWindow:
        w = OverWindow()
        w.partition = list(cols)
        return w

    @classmethod
    def order_by(cls, *cols) -> OverWindow:
        return OverWindow().order_by(*cols)


class Tumble:
    """``Tumble.over("1 hour").on("ts").alias("w")`` — pyflink
    table/window.py Tumble descriptor."""

    @classmethod
    def over(cls, size: str) -> GroupWindow:
        w = GroupWindow("tumble")
        w.size = size
        return w


class Slide:
    """``Slide.over("1 hour").every("15 minutes").on("ts").alias("w")``."""

    @classmethod
    def over(cls, size: str) -> GroupWindow:
        w = GroupWindow("slide")
        w.size = size
        return w


class Session:
    """``Session.with_gap("30 minutes").on("ts").alias("w")`` — resolved
    to ``F.session_window`` at group_by time (sessions exist only after
    merging)."""

    @classmethod
    def with_gap(cls, gap: str) -> GroupWindow:
        w = GroupWindow("session")
        w.gap = gap
        return w


class TemporalTableFunction:
    """A versioned-history handle produced by
    ``Table.create_temporal_table_function`` (reference:
    TemporalTableFunction.java — a TableFunction whose apply(time) returns
    the version valid at that time).  Consumed by
    ``Table.join_lateral_temporal``."""

    def __init__(self, table: Table, time_attr: str, primary_key: str):
        self.table = table
        self.time_attr = time_attr
        self.primary_key = primary_key
