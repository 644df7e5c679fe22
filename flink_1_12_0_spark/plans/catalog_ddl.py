"""executeSql statement router: the Flink TableEnvironment.executeSql surface.

Reference: SqlToOperationConverter.java (flink-table-planner-blink/src/main/
java/org/apache/flink/table/planner/operations/) routes ~30 parsed statement
kinds — CREATE/DROP/ALTER TABLE/VIEW/DATABASE/FUNCTION, SHOW, USE, DESCRIBE,
EXPLAIN, INSERT, and queries — to catalog operations or plans.

Spark already has a catalog and an ANSI SQL front-end, so most statements
pass through ``spark.sql`` after dialect translation; the router adds the
Flink-specific pieces on top:

- CREATE TABLE ... WITH ('connector'=..., WATERMARK FOR ...) → parsed by
  :mod:`dialect_shim`, registered as a temp view over the connector source
  (filesystem supported natively), watermark applied;
- CREATE [TEMPORARY] VIEW v AS <flink-dialect query> → translated query;
- EXPLAIN PLAN FOR <q> (Flink syntax) → Spark EXPLAIN;
- ALTER TABLE a RENAME TO b on temp views (Spark SQL can't);
- INSERT INTO <connector table> → distributed append to the table's path;
- CREATE FUNCTION name AS 'module.attr' LANGUAGE PYTHON → imported and
  registered as a session UDF (the analog of class-reference registration);
- PARTITIONED BY on filesystem tables → directory-layout writes on INSERT
  and SHOW PARTITIONS ('col=value' spec rows, ShowPartitionsOperation);
- ALTER VIEW RENAME / AS, ALTER TABLE SET (option merge), ALTER DATABASE
  SET (-> Spark DBPROPERTIES), SHOW CATALOGS / CURRENT CATALOG / CURRENT
  DATABASE / MODULES, CREATE/DROP/USE CATALOG (GenericInMemoryCatalog
  names; objects share the single Spark session catalog);
- queries containing MATCH_RECOGNIZE → the CEP front-end.

Statements return a DataFrame when they produce rows (queries, SHOW,
DESCRIBE, EXPLAIN) and None for pure DDL — mirroring TableResult.
"""

from __future__ import annotations

import importlib
import re

from pyspark.sql import DataFrame, SparkSession

from flink_1_12_0_spark.plans.dialect_shim import (
    TableDDL,
    apply_ddl,
    apply_table_ddl,
    merge_like,
    parse_create_table,
    translate,
)

_VIEW_RE = re.compile(
    r"CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"([\w.]+)\s+AS\s+(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"DROP\s+(?:TEMPORARY\s+)?(TABLE|VIEW)\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$",
    re.IGNORECASE,
)
_RENAME_RE = re.compile(
    r"ALTER\s+(?:TABLE|VIEW)\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*$", re.IGNORECASE
)
_SHOW_PARTS_RE = re.compile(r"SHOW\s+PARTITIONS\s+([\w.]+)\s*$", re.IGNORECASE)
_USE_CATALOG_RE = re.compile(r"USE\s+CATALOG\s+([\w.]+)\s*$", re.IGNORECASE)
_ALTER_PROPS_RE = re.compile(
    r"ALTER\s+TABLE\s+([\w.]+)\s+SET\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL
)
_ALTER_VIEW_AS_RE = re.compile(
    r"ALTER\s+VIEW\s+([\w.]+)\s+AS\s+(.*)$", re.IGNORECASE | re.DOTALL
)
_CREATE_CATALOG_RE = re.compile(
    r"CREATE\s+CATALOG\s+([\w.]+)(?:\s+WITH\s*\((.*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CATALOG_RE = re.compile(
    r"DROP\s+CATALOG\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", re.IGNORECASE
)
_ALTER_DB_RE = re.compile(
    r"ALTER\s+DATABASE\s+([\w.]+)\s+SET\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL
)
_OPT_PAIR_RE = re.compile(r"'([^']*)'\s*=\s*'([^']*)'")
#: FLIP-113 dynamic table options hint on a table reference, with an
#: optional AS alias after the hint: ``t /*+ OPTIONS('k'='v') */ [AS a]``
_OPTIONS_HINT_RE = re.compile(
    r"([\w.]+)\s*/\*\+\s*OPTIONS\s*\(((?:'[^']*'|[^)'])*)\)\s*\*/"
    r"(?:\s+AS\s+(\w+))?",
    re.IGNORECASE,
)
_EXPLAIN_RE = re.compile(r"EXPLAIN\s+(?:PLAN\s+FOR\s+)?(.*)$", re.IGNORECASE | re.DOTALL)
_INSERT_RE = re.compile(
    r"INSERT\s+(INTO|OVERWRITE)\s+([\w.]+)\s+(.*)$", re.IGNORECASE | re.DOTALL
)
_FN_RE = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"([\w.]+)\s+AS\s+'([^']+)'(?:\s+LANGUAGE\s+(\w+))?\s*$",
    re.IGNORECASE,
)
_DROP_FN_RE = re.compile(
    r"DROP\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*$",
    re.IGNORECASE,
)
#: statements Spark SQL handles verbatim (catalog ops share the grammar)
_PASSTHROUGH_RE = re.compile(
    r"(SHOW\s+(TABLES|DATABASES|VIEWS|FUNCTIONS|CREATE\s+TABLE)|"
    r"CREATE\s+DATABASE|DROP\s+DATABASE|USE\s+|DESCRIBE\s+|DESC\s+)",
    re.IGNORECASE,
)


class StatementSet:
    """Multi-INSERT pipeline (reference: flink-table-api-java
    .../api/StatementSet.java:32, TableEnvironment.createStatementSet):
    several INSERT statements accepted first, executed together on
    ``execute()`` — Flink compiles them into ONE job graph with multiple
    sinks; here each INSERT runs as its own distributed write action in
    declaration order (Spark's analog of a multi-sink DAG; a source
    shared by several sinks can be ``.persist()``-ed by the caller to
    avoid re-scanning).

    ``execute()`` returns one row per statement with the target table —
    the shape of the reference's TableResult (affected row counts are
    unknown at plan time there too, hence -1)."""

    def __init__(self, env: "TableEnvironment"):
        self._env = env
        self._stmts: list[str] = []

    def add_insert_sql(self, stmt: str) -> "StatementSet":
        text = stmt.strip().rstrip(";").strip()
        if not _INSERT_RE.match(text):
            raise ValueError(f"not an INSERT statement: {stmt!r}")
        self._stmts.append(text)
        return self

    def add_insert(self, target: str, df: DataFrame, overwrite: bool = False) -> "StatementSet":
        """StatementSet.addInsert(targetPath, table): stage a Table-API
        DataFrame for insertion into a connector table."""
        view = f"_stmtset_src_{len(self._stmts)}_{target}"
        df.createOrReplaceTempView(view)
        mode = "OVERWRITE" if overwrite else "INTO"
        self._stmts.append(f"INSERT {mode} {target} SELECT * FROM {view}")
        return self

    def execute(self) -> DataFrame:
        if not self._stmts:
            raise ValueError("statement set is empty (StatementSet.execute)")
        results = []
        for text in self._stmts:
            m = _INSERT_RE.match(text)
            self._env._insert(m.group(1).upper(), m.group(2), m.group(3))
            results.append((m.group(2), -1))
        self._stmts = []
        return self._env.spark.createDataFrame(
            results, "table_name string, affected_rows bigint"
        )


class TableEnvironment:
    """Session-scoped statement router (TableEnvironment.executeSql)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        #: connector tables registered via CREATE TABLE ... WITH — kept so
        #: INSERT INTO can target their storage (the catalog's sink side)
        self.connector_tables: dict[str, TableDDL] = {}
        #: registered catalogs (GenericInMemoryCatalog.java:52 analog):
        #: catalog NAMES are first-class (CREATE/DROP/USE/SHOW CATALOG);
        #: objects live in the single Spark session catalog — per-catalog
        #: object isolation is not modeled (documented simplification)
        self.catalogs: list[str] = ["default_catalog"]
        self.current_catalog: str = "default_catalog"
        #: TemporalTableFunctions addressable from SQL via
        #: LATERAL TABLE (name(ts)) — TableEnvironment.registerFunction
        self.temporal_functions: dict[str, object] = {}
        #: OPTIONS-hint views already materialized, keyed on
        #: (table, sorted overrides) — reused across repeated queries so
        #: hinted executions neither accumulate temp views nor re-resolve
        #: the source every time
        self._hint_views: set[str] = set()

    def register_function(self, name: str, fn) -> None:
        """TableEnvironment.registerFunction: a TemporalTableFunction
        becomes SQL-addressable as ``LATERAL TABLE (name(p.ts))``
        (reference: Table.createTemporalTableFunction + registerFunction,
        flink-table-common .../functions/TemporalTableFunction.java);
        any other callable registers as a session scalar UDF."""
        from flink_1_12_0_spark.api.table import TemporalTableFunction

        if isinstance(fn, TemporalTableFunction):
            self.temporal_functions[name] = fn
        else:
            self.spark.udf.register(name, fn)

    def create_statement_set(self) -> StatementSet:
        """TableEnvironment.createStatementSet (reference:
        .../api/TableEnvironment.java)."""
        return StatementSet(self)

    # -- statement router --------------------------------------------------

    def execute_sql(self, stmt: str, df: DataFrame | None = None):
        """Route one SQL statement.  ``df`` optionally backs a CREATE TABLE
        whose connector has no filesystem path (e.g. kafka/datagen doubles)."""
        text = stmt.strip().rstrip(";").strip()
        upper = text.upper()

        if upper.startswith("CREATE TABLE"):
            t = parse_create_table(text)
            if t.like_base:
                # FLIP-110 CREATE TABLE ... LIKE: merge schema/options
                # from the registered base table (SqlTableLike)
                base = self.connector_tables.get(t.like_base)
                if base is None:
                    raise ValueError(f"LIKE base table not found: {t.like_base}")
                t = merge_like(t, base)
            apply_table_ddl(self.spark, t, df=df)
            self.connector_tables[t.name] = t
            return None
        if m := _VIEW_RE.match(text):
            self._query(m.group(2)).createOrReplaceTempView(m.group(1))
            return None
        if m := _DROP_RE.match(text):
            name = m.group(3)
            dropped = self.spark.catalog.dropTempView(name)
            if not dropped and not m.group(2):
                raise ValueError(f"{m.group(1).lower()} {name} does not exist")
            self.connector_tables.pop(name, None)
            return None
        if m := _ALTER_PROPS_RE.match(text):
            # SqlAlterTableProperties: merge the new option pairs into the
            # catalog table's WITH options (reference semantics: SET adds /
            # overwrites, never removes).  Re-resolve the registered view
            # when the connector reads options (kafka/datagen doubles,
            # filesystem path/format) so subsequent queries see the new
            # config — in the reference the next query plans against the
            # updated catalog entry.
            t = self.connector_tables.get(m.group(1))
            if t is None:
                raise ValueError(f"table not found: {m.group(1)}")
            t.options.update(dict(_OPT_PAIR_RE.findall(m.group(2))))
            # hinted views merged the OLD base options — drop the cache so
            # the next hinted query re-resolves against the updated entry
            self._hint_views.clear()
            try:
                apply_table_ddl(self.spark, t)
            except Exception:
                # sink-style tables whose storage does not exist yet keep
                # their declared-schema empty view
                pass
            return None
        if m := _ALTER_VIEW_AS_RE.match(text):
            # SqlAlterViewAs: redefine the view's query
            self._query(m.group(2)).createOrReplaceTempView(m.group(1))
            return None
        if m := _CREATE_CATALOG_RE.match(text):
            opts = dict(_OPT_PAIR_RE.findall(m.group(2) or ""))
            ctype = opts.get("type", "generic_in_memory")
            if ctype != "generic_in_memory":
                raise NotImplementedError(f"catalog type {ctype!r} (in-memory only)")
            if m.group(1) not in self.catalogs:
                self.catalogs.append(m.group(1))
            return None
        if m := _DROP_CATALOG_RE.match(text):
            name = m.group(2)
            if name == self.current_catalog:
                raise ValueError(f"cannot drop the current catalog: {name}")
            if name in self.catalogs:
                self.catalogs.remove(name)
            elif not m.group(1):
                raise ValueError(f"catalog does not exist: {name}")
            return None
        if m := _ALTER_DB_RE.match(text):
            # Flink ALTER DATABASE db SET ('k'='v') → Spark DBPROPERTIES
            props = ", ".join(
                f"'{k}'='{v}'" for k, v in _OPT_PAIR_RE.findall(m.group(2))
            )
            self.spark.sql(
                f"ALTER DATABASE {m.group(1)} SET DBPROPERTIES ({props})"
            )
            return None
        if m := _RENAME_RE.match(text):
            old, new = m.group(1), m.group(2)
            self.spark.table(old).createOrReplaceTempView(new)
            self.spark.catalog.dropTempView(old)
            if old in self.connector_tables:
                self.connector_tables[new] = self.connector_tables.pop(old)
            return None
        if m := _FN_RE.match(text):
            name, ref, lang = m.group(1), m.group(2), (m.group(3) or "PYTHON").upper()
            if lang != "PYTHON":
                raise NotImplementedError(f"CREATE FUNCTION LANGUAGE {lang}")
            mod, _, attr = ref.rpartition(".")
            fn = getattr(importlib.import_module(mod), attr)
            self.spark.udf.register(name, fn)
            return None
        if _DROP_FN_RE.match(text) and upper.startswith("DROP"):
            # Spark has no unregister; a re-register overwrites.  No-op drop
            # keeps DDL scripts replayable (Flink: DropTempSystemFunction).
            return None
        if m := _INSERT_RE.match(text):
            return self._insert(m.group(1).upper(), m.group(2), m.group(3))
        if m := _SHOW_PARTS_RE.match(text):
            return self._show_partitions(m.group(1))
        if upper == "SHOW CATALOGS":
            return self.spark.createDataFrame(
                [(c,) for c in self.catalogs], "catalog_name string"
            )
        if upper == "SHOW CURRENT CATALOG":
            return self.spark.createDataFrame(
                [(self.current_catalog,)], "current_catalog_name string"
            )
        if upper == "SHOW CURRENT DATABASE":
            return self.spark.createDataFrame(
                [(self.spark.catalog.currentDatabase(),)],
                "current_database_name string",
            )
        if upper == "SHOW MODULES":
            return self.spark.createDataFrame([("core",)], "module_name string")
        if m := _USE_CATALOG_RE.match(text):
            if m.group(1) not in self.catalogs:
                raise ValueError(f"unknown catalog: {m.group(1)}")
            self.current_catalog = m.group(1)
            return None
        if upper.startswith("EXPLAIN"):
            q = _EXPLAIN_RE.match(text).group(1)
            return self.spark.sql("EXPLAIN " + translate(q))
        if m := re.match(r"(?:DESCRIBE|DESC)\s+([\w.]+)\s*$", text, re.IGNORECASE):
            t = self.connector_tables.get(m.group(1))
            if t is not None:
                # Flink-style DESCRIBE for catalog tables: declared
                # physical columns, computed columns with their
                # expressions, and the WATERMARK spec (reference
                # DescribeTableOperation / TableSchema printout)
                rows = [(c, ty, True, None, None, None) for c, ty in t.columns]
                rows += [
                    (c, "", True, None, f"AS {expr}", None) for c, expr in t.computed
                ]
                if t.watermark_col:
                    rows.append(
                        (
                            t.watermark_col,
                            "",
                            True,
                            None,
                            None,
                            f"`{t.watermark_col}` - INTERVAL '{t.watermark_delay}'",
                        )
                    )
                return self.spark.createDataFrame(
                    rows,
                    "name string, type string, null boolean, key string, "
                    "computed_column string, watermark string",
                )
        if _PASSTHROUGH_RE.match(text):
            return self.spark.sql(text)
        # plain query (SELECT / WITH / VALUES / MATCH_RECOGNIZE)
        return self._query(text)

    # -- helpers -----------------------------------------------------------

    #: connectors whose readers consume options — an OPTIONS hint on these
    #: must take effect (FLIP-113 / FlinkHintStrategies); hints on plain
    #: registered views are stripped by translate() instead
    _OPTION_AWARE_CONNECTORS = frozenset({"kafka", "upsert-kafka", "datagen"})

    def _apply_options_hints(self, q: str) -> str:
        """FLIP-113 dynamic table options
        (flink-table-planner-blink/.../hint/FlinkHintStrategies): a
        ``t /*+ OPTIONS('k'='v') */`` reference to a registered connector
        table re-resolves the SOURCE with the merged options under a
        one-off view, and the reference is rewritten to it (aliased back
        to the original name so the rest of the query is untouched).
        References to non-connector tables pass through — translate()
        strips those hints as before."""
        import dataclasses

        def repl(m: re.Match) -> str:
            name, raw, user_alias = m.group(1), m.group(2), m.group(3)
            t = self.connector_tables.get(name)
            if (
                t is None
                or t.options.get("connector") not in self._OPTION_AWARE_CONNECTORS
            ):
                return m.group(0)
            overrides = dict(_OPT_PAIR_RE.findall(raw))
            # deterministic view name keyed on (FULL base-table definition,
            # overrides): the same hinted reference over the same catalog
            # entry reuses one temp view instead of re-resolving the source
            # every execution, while ANY change to the base definition —
            # CREATE-over, DROP+CREATE with new options, RENAME landing a
            # different table under this name, ALTER ... SET — changes the
            # digest and resolves a fresh view (ADVICE r5 (a): a
            # name-keyed digest silently reused the stale view after
            # non-ALTER DDL).  Only the LAST segment of a qualified name is
            # legal in a view name or alias (`db.t` would otherwise produce
            # `... AS db.t`).
            import hashlib

            digest = hashlib.sha1(
                repr((name, dataclasses.astuple(t), sorted(overrides.items()))).encode()
            ).hexdigest()[:10]
            base = name.split(".")[-1]
            view = f"_opts_{base}_{digest}"
            if view not in self._hint_views:
                t2 = dataclasses.replace(
                    t, name=view, options={**t.options, **overrides}
                )
                apply_table_ddl(self.spark, t2)
                self._hint_views.add(view)
            return f"{view} AS {user_alias or base}"

        return _OPTIONS_HINT_RE.sub(repl, q)

    def _query(self, q: str) -> DataFrame:
        if "OPTIONS" in q.upper():
            q = self._apply_options_hints(q)
        if re.search(r"\bMATCH_RECOGNIZE\b", q, re.IGNORECASE):
            from flink_1_12_0_spark.plans.match_recognize_sql import run_match_recognize

            return run_match_recognize(self.spark, q)
        from flink_1_12_0_spark.plans.temporal_sql import (
            is_temporal_join,
            lateral_temporal_function,
            run_temporal_function_join,
            run_temporal_join,
        )

        fn = lateral_temporal_function(q)
        if fn is not None and fn in self.temporal_functions:
            return run_temporal_function_join(self.spark, q, self.temporal_functions)
        if is_temporal_join(q):
            version_ts = {
                name: t.watermark_col
                for name, t in self.connector_tables.items()
                if t.watermark_col
            }
            return run_temporal_join(self.spark, q, version_ts)
        return self.spark.sql(translate(q))

    def _show_partitions(self, name: str) -> DataFrame:
        """SHOW PARTITIONS on a partitioned connector table — rows of
        Flink-style 'col=value[/col2=value2]' partition spec strings
        (SqlToOperationConverter's ShowPartitionsOperation)."""
        from pyspark.sql import functions as F

        t = self.connector_tables.get(name)
        if t is None or not t.partitioned_by:
            raise ValueError(f"table '{name}' is not partitioned")
        spec = F.concat_ws(
            "/",
            *[
                F.concat_ws("=", F.lit(c), F.col(c).cast("string"))
                for c in t.partitioned_by
            ],
        ).alias("partition")
        return (
            self.spark.table(name)
            .select(*t.partitioned_by)
            .distinct()
            .select(spec)
            .orderBy("partition")
        )

    def _insert(self, mode: str, target: str, query: str):
        """INSERT INTO/OVERWRITE a connector table: a fully distributed
        append/overwrite to the table's storage path (``PARTITIONED BY``
        columns become the directory layout), then the temp view is
        refreshed — the filesystem sink (FileSystemTableSink.java)."""
        t = self.connector_tables.get(target)
        if t is None or "path" not in t.options:
            raise NotImplementedError(
                f"INSERT target '{target}' is not a filesystem connector table"
            )
        out = self._query(query)
        if t.columns:
            # sink schema enforcement (Flink inserts cast the query result
            # to the DECLARED sink schema): positional mapping, declared
            # names and types win
            from pyspark.sql import functions as F

            if len(out.columns) != len(t.columns):
                raise ValueError(
                    f"INSERT into {target}: query has {len(out.columns)} "
                    f"columns, table declares {len(t.columns)}"
                )
            out = out.select(
                *[
                    F.col(src).cast(ty).alias(name)
                    for src, (name, ty) in zip(out.columns, t.columns)
                ]
            )
        fmt = t.options.get("format", "parquet")
        w = out.write.mode("append" if mode == "INTO" else "overwrite").format(fmt)
        if t.partitioned_by:
            w = w.partitionBy(*t.partitioned_by)
        w.save(t.options["path"])
        refreshed = self.spark.read.format(fmt).load(t.options["path"])
        if t.partitioned_by and t.columns:
            # partition-column inference moves them to the end and re-infers
            # their types (BIGINT comes back INT): restore the DECLARED
            # order and types so the view's schema never drifts from DDL
            from pyspark.sql import functions as F

            declared = dict(t.columns)
            refreshed = refreshed.select(
                *[
                    F.col(c).cast(declared[c]).alias(c)
                    if c in t.partitioned_by
                    else F.col(c)
                    for c, _ in t.columns
                ]
            )
        refreshed.createOrReplaceTempView(target)
        return None
