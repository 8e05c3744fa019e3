"""AstroSession — the engine's user-facing entry point.

Parity target: ``HBaseSQLContext`` + the Python wrapper
(HBaseSQLContext.scala:28-56, python/pyspark_hbase/sql/context.py:26-48).
`sql()` routes Astro DDL/DML to eager commands (like the reference's
RunnableCommands) and everything else to Spark SQL with every Astro table
registered as a temp view — so joins between Astro tables, parquet temp
views and any other Spark source just work, exactly as the reference
inherits the whole relational surface above the scan.

Usage::

    astro = AstroSession(spark, warehouse_dir="/tmp/astro")
    astro.sql("CREATE TABLE t (k INT, v STRING, PRIMARY KEY(k)) MAPPED BY (ht)")
    astro.sql("LOAD DATA INPATH '/data/t.csv' INTO TABLE t")
    astro.sql("SELECT v, count(*) FROM t GROUP BY v").show()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_sql_on_hbase_spark import codec as C
from spark_sql_on_hbase_spark import ddl
from spark_sql_on_hbase_spark.catalog import (
    AstroCatalog,
    KeyColumn,
    NonKeyColumn,
    TableMeta,
)
from spark_sql_on_hbase_spark.relation import AstroRelation, table_schema


class AstroSession:
    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.catalog = AstroCatalog(warehouse_dir)

    # -- helpers ------------------------------------------------------------
    def relation(self, table: str, namespace: str = "default") -> AstroRelation:
        meta = self.catalog.get_table(table, namespace)
        return AstroRelation(self.catalog, meta, self.spark)

    def table(self, table: str, namespace: str = "default") -> DataFrame:
        return self.relation(table, namespace).scan()

    def _register_all(self) -> None:
        import os

        for ns, name in self.catalog.list_tables():
            meta = self.catalog.get_table(name, ns)
            # schema-on-read: another logical table may have populated the
            # shared physical store (many-to-one mapping, doc §16.1.1)
            if meta.regions or os.path.isdir(self.catalog.data_dir(meta)):
                AstroRelation(self.catalog, meta, self.spark).register_view(name)
            else:  # empty table → empty view with right schema
                self.spark.createDataFrame([], table_schema(meta)).createOrReplaceTempView(name)

    # -- entry point --------------------------------------------------------
    def sql(self, text: str) -> DataFrame:
        cmd = ddl.parse(text)
        handler = getattr(self, f"_exec_{type(cmd).__name__}", None)
        if handler is None:
            raise NotImplementedError(type(cmd).__name__)
        return handler(cmd)

    hql = sql  # reference CLI ergonomics (astro> prompt, HBaseSQLCliDriver.scala)

    # -- command executors ---------------------------------------------------
    def _exec_CreateTable(self, c: ddl.CreateTable) -> DataFrame:
        declared = [n for n, _ in c.columns]
        types = dict(c.columns)
        meta = TableMeta(
            name=c.table,
            namespace=c.namespace,
            physical_table=c.physical_table,
            key_columns=[
                KeyColumn(name=k, dtype=C.normalize_type(types[k]), order=i)
                for i, k in enumerate(c.key_columns)
            ],
            nonkey_columns=[
                NonKeyColumn(
                    name=n,
                    dtype=C.normalize_type(types[n]),
                    family=c.mappings[n][0],
                    qualifier=c.mappings[n][1],
                )
                for n in declared
                if n not in set(c.key_columns)
            ],
            encoding=c.encoding,
            num_regions=c.num_regions,
            declared_columns=declared,
            align_prefix=c.align_prefix,
            zorder=c.zorder,
        )
        if c.align_prefix and c.align_prefix > len(c.key_columns):
            raise ValueError("align= exceeds the number of key columns")
        if c.zorder:
            if c.align_prefix:
                raise ValueError("layout=zorder and align= are exclusive")
            from spark_sql_on_hbase_spark.relation import _Z_WIDTHS

            bad = [
                k.name
                for k in meta.key_columns
                if k.dtype not in _Z_WIDTHS
            ]
            if len(meta.key_columns) < 2 or bad:
                raise ValueError(
                    "layout=zorder needs a composite key of integer columns"
                    + (f"; unsupported: {bad}" if bad else "")
                )
        self.catalog.create_table(meta, if_not_exists=c.if_not_exists)
        import os

        # many-to-one mapping (doc §16.1.1): another logical table may
        # already have populated the shared physical store — surface it
        # immediately (schema-on-read)
        stored = self.catalog.get_table(c.table, c.namespace)
        rel = AstroRelation(self.catalog, stored, self.spark)
        if os.path.isdir(self.catalog.data_dir(stored)):
            rel._ensure_fresh_regions()
            rel.register_view(c.table)
        else:
            self.spark.createDataFrame([], table_schema(stored)).createOrReplaceTempView(c.table)
        return self._ok(f"created {c.namespace}.{c.table}")

    def _exec_DropTable(self, c: ddl.DropTable) -> DataFrame:
        self.catalog.drop_table(c.table, c.namespace)
        self.spark.catalog.dropTempView(c.table)
        return self._ok(f"dropped {c.namespace}.{c.table}")

    def _exec_ShowTables(self, c: ddl.ShowTables) -> DataFrame:
        rows = [(ns, t) for ns, t in self.catalog.list_tables()]
        return self.spark.createDataFrame(rows or [], "namespace string, tableName string")

    def _exec_DescribeTable(self, c: ddl.DescribeTable) -> DataFrame:
        """Reference DESCRIBE output: col name, type, KEY COLUMN/NON KEY
        COLUMN + family.qualifier (hbaseCommands.scala:95-124)."""
        meta = self.catalog.get_table(c.table, c.namespace)
        key_order = {k.name: k.order for k in meta.key_columns}
        fq = {nk.name: f"{nk.family}.{nk.qualifier}" for nk in meta.nonkey_columns}
        rows = []
        for name, dtype in meta.all_columns:
            if name in key_order:
                rows.append((name, dtype, f"KEY COLUMN ({key_order[name]})"))
            else:
                rows.append((name, dtype, f"NON KEY COLUMN ({fq[name]})"))
        if c.extended:
            # physical-layout section (beyond-reference; Spark's own
            # DESCRIBE EXTENDED analog): lets an operator see from SQL
            # whether one-phase aggregation is currently eligible
            # (layout=bucketed + align_prefix + no pending merge) and how
            # the table is physically organized
            rel = self.relation(c.table, c.namespace)
            rows += [
                ("", "", ""),
                ("# Physical Layout", "", ""),
                ("physical_table", meta.physical_table, ""),
                ("encoding", meta.encoding, ""),
                ("layout", meta.layout or "range", "bucketed = one-phase-agg eligible; zorder = all-dim file pruning"),
                ("align_prefix", str(meta.align_prefix or 0), "region-aligned leading key columns"),
                ("num_regions", str(meta.num_regions), "declared region count"),
                ("region_files", str(len(meta.regions)), "current fragment/region files"),
                (
                    "pending_merge",
                    str(rel.needs_merge()).lower(),
                    "upserts unresolved until COMPACT",
                ),
            ]
        return self.spark.createDataFrame(rows, "col_name string, data_type string, comment string")

    def _exec_AlterAddCol(self, c: ddl.AlterAddCol) -> DataFrame:
        self.catalog.alter_add_column(
            c.table,
            NonKeyColumn(name=c.col, dtype=C.normalize_type(c.dtype), family=c.family, qualifier=c.qualifier),
            c.namespace,
        )
        self._register_all()
        return self._ok(f"added column {c.col}")

    def _exec_AlterDropCol(self, c: ddl.AlterDropCol) -> DataFrame:
        self.catalog.alter_drop_column(c.table, c.col, c.namespace)
        self._register_all()
        return self._ok(f"dropped column {c.col}")

    def _exec_BulkLoad(self, c: ddl.BulkLoad) -> DataFrame:
        rel = self.relation(c.table, c.namespace)
        rel.load_csv(c.path, delimiter=c.delimiter)
        rel.register_view()
        return self._ok(f"loaded {c.path} into {c.table}")

    def _exec_InsertValues(self, c: ddl.InsertValues) -> DataFrame:
        rel = self.relation(c.table, c.namespace)
        schema = table_schema(rel.meta)
        coerced = []
        for row in c.values:
            coerced.append(
                [self._coerce(v, dt) for v, (_, dt) in zip(row, rel.meta.all_columns)]
            )
        df = self.spark.createDataFrame(coerced, schema)
        if c.overwrite:
            rel.overwrite(df)
        elif rel.meta.regions:
            rel.append(df)
        else:
            rel.write(df)
        rel.register_view()
        return self._ok("overwrote 1 row" if c.overwrite else "inserted 1 row")

    @staticmethod
    def _coerce(v, dtype: str):
        if v is None:
            return None
        t = C.normalize_type(dtype)
        if t in (C.BYTE, C.SHORT, C.INT, C.LONG):
            return int(v)
        if t in (C.FLOAT, C.DOUBLE):
            return float(v)
        if t == C.BOOLEAN:
            return bool(v)
        return v

    def _exec_InsertSelect(self, c: ddl.InsertSelect) -> DataFrame:
        self._register_all()
        src = self.spark.sql(c.select_sql)
        rel = self.relation(c.table, c.namespace)
        named = src.toDF(*[n for n, _ in rel.meta.all_columns])
        cast = named.select(
            *[named[n].cast(table_schema(rel.meta)[n].dataType) for n, _ in rel.meta.all_columns]
        )
        if c.overwrite:
            rel.overwrite(cast)
        elif rel.meta.regions:
            rel.append(cast)
        else:
            rel.write(cast)
        rel.register_view()
        return self._ok(f"{'overwrote' if c.overwrite else 'inserted into'} {c.table}")

    @staticmethod
    def _update_projection(rel: AstroRelation, update_set: dict[str, str], cur_prefix: str) -> str:
        """Validated full-row SELECT list for an UPDATE-style write: SET
        expressions where assigned, the current value (``cur_prefix`` =
        alias qualifier or '') elsewhere.  One definition for UPDATE and
        MERGE so their semantics can't drift (r6 review)."""
        cols = [n for n, _ in rel.meta.all_columns]
        keyset = {k.name for k in rel.meta.key_columns}
        bad = set(update_set) - set(cols)
        if bad:
            raise ValueError(f"UPDATE SET on undeclared columns {sorted(bad)}")
        if set(update_set) & keyset:
            raise ValueError("UPDATE SET may not assign key columns")
        return ", ".join(
            f"{update_set.get(col, f'{cur_prefix}`{col}`')} AS `{col}`" for col in cols
        )

    def _exec_UpdateTable(self, c: ddl.UpdateTable) -> DataFrame:
        """UPDATE … SET … [WHERE]: matched rows re-land as full rows
        through the upsert append (newest-generation-wins), exactly the
        MERGE matched-UPDATE path — no table rewrite.  Non-astro tables
        fall through to Spark SQL VERBATIM (DSv2 sources may support it;
        a reconstruction would drop the namespace qualifier and
        re-normalize SET targets — r6 review)."""
        if not self.catalog.table_exists(c.table, c.namespace):
            return self.spark.sql(c.raw)
        self._register_all()
        rel = self.relation(c.table, c.namespace)
        cols = [n for n, _ in rel.meta.all_columns]
        schema = table_schema(rel.meta)
        proj = self._update_projection(rel, c.update_set, "")
        df = self.spark.sql(
            f"SELECT {proj} FROM {c.table}" + (f" WHERE {c.where}" if c.where else "")
        )
        cast = df.select(*[df[n].cast(schema[n].dataType) for n in cols])
        rel.append(cast)
        rel.register_view()
        return self._ok(f"updated {c.table}")

    def _exec_DeleteFrom(self, c: ddl.DeleteFrom) -> DataFrame:
        """DELETE FROM … [AS a] [WHERE]: survivors rewritten atomically
        (no tombstones in the LSM layout — MERGE's matched-DELETE path).
        Non-astro tables fall through to Spark SQL verbatim."""
        if not self.catalog.table_exists(c.table, c.namespace):
            return self.spark.sql(c.raw)
        self._register_all()
        rel = self.relation(c.table, c.namespace)
        a = c.alias or c.table
        cols = ", ".join(f"{a}.`{n}`" for n, _ in rel.meta.all_columns)
        survivors = self.spark.sql(
            f"SELECT {cols} FROM {c.table} {a}"
            + (f" WHERE NOT coalesce({c.where}, false)" if c.where else " WHERE false")
        )
        rel.overwrite(survivors)
        rel.register_view()
        return self._ok(f"deleted from {c.table}")

    def _exec_MergeInto(self, c: ddl.MergeInto) -> DataFrame:
        """MERGE INTO over the LSM layout (beyond-reference; the reference
        appends only, HBaseRelation.scala:660-663).

        UPDATE compiles to full target rows with the SET expressions
        applied (unassigned columns carry the target's current values),
        and INSERT to anti-joined source rows — both land through the
        append/upsert path, where newest-generation-wins resolution gives
        exact MERGE semantics with NO table rewrite.  DELETE has no
        tombstone in the layout, so matched-delete merges rewrite the
        survivors atomically via :meth:`AstroRelation.overwrite`.

        Multiple source rows matching one target key resolve like any
        upsert burst: one winner per key per column (deterministic only
        if the source is key-unique — the standard MERGE cardinality
        caveat, which ANSI engines raise an error for and we document)."""
        self._register_all()
        rel = self.relation(c.table, c.namespace)
        cols = [n for n, _ in rel.meta.all_columns]
        keyset = {k.name for k in rel.meta.key_columns}
        t, s = c.target_alias, c.source_alias
        schema = table_schema(rel.meta)
        parts: list[DataFrame] = []

        def _cast(df: DataFrame) -> DataFrame:
            return df.select(*[df[n].cast(schema[n].dataType) for n in cols])

        if c.update_set is not None:
            proj = self._update_projection(rel, c.update_set, f"{t}.")
            parts.append(
                _cast(self.spark.sql(
                    f"SELECT {proj} FROM {c.table} {t} JOIN {c.source_from} ON {c.on}"
                ))
            )
        if c.has_insert:
            if c.insert_star:
                proj = ", ".join(f"{s}.`{col}` AS `{col}`" for col in cols)
            else:
                assign = dict(zip(c.insert_cols or [], c.insert_exprs or []))
                missing = keyset - set(assign)
                if missing:
                    raise ValueError(f"INSERT must assign key columns {sorted(missing)}")
                proj = ", ".join(
                    f"{assign.get(col, 'NULL')} AS `{col}`" for col in cols
                )
            parts.append(
                _cast(self.spark.sql(
                    f"SELECT {proj} FROM {c.source_from} "
                    f"LEFT ANTI JOIN {c.table} {t} ON {c.on}"
                ))
            )
        if c.delete_matched:
            # survivors = target rows with NO source match; atomic rewrite
            survivors = self.spark.sql(
                f"SELECT {', '.join(f'{t}.`{col}`' for col in cols)} "
                f"FROM {c.table} {t} LEFT ANTI JOIN {c.source_from} ON {c.on}"
            )
            out = _cast(survivors)
            for p in parts:
                out = out.unionByName(p)
            rel.overwrite(out)
        else:
            merged = parts[0]
            for p in parts[1:]:
                merged = merged.unionByName(p)
            if rel.meta.regions:
                rel.append(merged)
            else:
                rel.write(merged)
        rel.register_view()
        return self._ok(f"merged into {c.table}")

    def _exec_CompactTable(self, c: ddl.CompactTable) -> DataFrame:
        rel = self.relation(c.table, c.namespace)
        n_before = len(rel.meta.regions)
        rel.compact()
        rel.register_view()
        return self._ok(
            f"compacted {c.table}: {n_before} fragments -> {len(rel.meta.regions)} regions"
        )

    def _exec_PassThrough(self, c: ddl.PassThrough) -> DataFrame:
        self._register_all()
        return self.spark.sql(c.sql)

    def _ok(self, msg: str) -> DataFrame:
        return self.spark.createDataFrame([(msg,)], "result string")
