"""Astro tables as a PySpark Python DataSource (Spark 4 API).

Parity target: the reference's data-source entry point
``sqlContext.read.format("org.apache.spark.sql.hbase.HBaseSource")
.options(...).load`` (HBaseRelation.scala:40-78; doc §18) — re-expressed
through ``pyspark.sql.datasource``:

- one input partition per region file (the reference's partition-per-
  region, HBasePartition.scala:26-35), so parallelism tracks regions;
- key predicates reach ``pushFilters`` and drive the same critical-
  point file pruning as the native path; every filter is returned as
  "unsupported" so Spark re-applies it after the scan — pruning stays a
  pure optimization, never a correctness dependency;
- reads stream Arrow record batches straight from the region parquet
  files (column-pruned via Arrow), with stringformat schema-on-read
  casts applied batch-wise.

Scale note: this source is for interop; the engine's primary scan path
(AstroRelation.scan → Catalyst parquet) keeps vectorized reading and
whole-stage codegen and should be preferred in hot paths.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from spark_sql_on_hbase_spark.catalog import STRING_FORMAT, AstroCatalog, TableMeta


def _sql_lit(v) -> str | None:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return None


class _RegionPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AstroReader(DataSourceReader):
    def __init__(self, meta: TableMeta, schema: StructType):
        self.meta = meta
        self.schema_ = schema
        self.files = [r.path for r in meta.regions]

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Prune region files from key-column comparison filters; return
        EVERY filter as unsupported so Spark re-applies them."""
        key_set = set(self.meta.key_names)
        clauses = []
        for f in filters:
            attr = ".".join(f.attribute) if isinstance(f.attribute, tuple) else str(f.attribute)
            if attr not in key_set:
                continue
            if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
                lit = _sql_lit(f.value)
                if lit is None:
                    continue
                op = {
                    EqualTo: "=",
                    GreaterThan: ">",
                    GreaterThanOrEqual: ">=",
                    LessThan: "<",
                    LessThanOrEqual: "<=",
                }[type(f)]
                clauses.append(f"{attr} {op} {lit}")
            elif isinstance(f, In):
                lits = [_sql_lit(v) for v in f.values]
                if all(x is not None for x in lits):
                    clauses.append(f"{attr} IN ({', '.join(lits)})")
        if clauses:
            try:
                from spark_sql_on_hbase_spark.pruning import prune_files

                res = prune_files(self.meta, " AND ".join(clauses))
                self.files = [r.path for r in res.files]
            except ValueError:
                pass  # non-sargable → keep all files (graceful full scan)
        return filters  # all re-applied by Spark → correctness preserved

    def partitions(self):
        return [_RegionPartition(p) for p in self.files]

    def read(self, partition: _RegionPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema_)
        cols = [f.name for f in self.schema_.fields]
        table = pq.read_table(
            partition.path.replace("file://", ""),
            columns=[c for c in cols if c in pq.read_schema(partition.path.replace("file://", "")).names],
        )
        out_arrays = []
        for field in arrow_schema:
            if field.name in table.column_names:
                col = table.column(field.name)
                if col.type != field.type:  # stringformat schema-on-read cast
                    col = pa.compute.cast(col, field.type)
                out_arrays.append(col.combine_chunks())
            else:  # ALTER ADD-ed column: absent cells → nulls
                out_arrays.append(pa.nulls(len(table), type=field.type))
        yield from pa.Table.from_arrays(out_arrays, schema=arrow_schema).to_batches()


class _FragmentCommit(WriterCommitMessage):
    """Per-task fragment stats, computed where the data is written —
    commit() folds them into the catalog without any re-scan (the
    distributed-stats pattern; at 100 TB a metadata refresh job over
    fresh fragments would be pure waste)."""

    def __init__(self, path: str, num_rows: int, num_keys: int, min_rk: bytes, max_rk: bytes):
        self.path = path
        self.num_rows = num_rows
        self.num_keys = num_keys
        self.min_rk = min_rk
        self.max_rk = max_rk


class AstroWriter(DataSourceWriter):
    """Append path: each task writes its rows as one LSM fragment file at
    the next sequence number (HBase memstore-flush analog); commit()
    records the shipped per-fragment stats in the catalog."""

    def __init__(self, meta: TableMeta, warehouse: str):
        self.meta = meta
        self.warehouse = warehouse
        self.data_dir = AstroCatalog(warehouse).data_dir(meta)
        self.seq = max((r.seq for r in meta.regions), default=-1) + 1

    def write(self, rows) -> WriterCommitMessage:
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        from spark_sql_on_hbase_spark import codec as C
        from spark_sql_on_hbase_spark.relation import ROWKEY_COL, SEQ_COL

        meta = self.meta
        names = [c for c, _ in meta.all_columns]
        key_idx = [names.index(k) for k in meta.key_names]
        key_dtypes = meta.key_dtypes
        data: dict[str, list] = {n: [] for n in names}
        rowkeys: list[bytes] = []
        n = 0
        for row in rows:
            vals = tuple(row)
            for name, v in zip(names, vals):
                data[name].append(v)
            rowkeys.append(C.encode_key([vals[i] for i in key_idx], key_dtypes))
            n += 1
        if n == 0:
            return WriterCommitMessage()
        from pyspark.sql.pandas.types import to_arrow_schema

        from spark_sql_on_hbase_spark.relation import table_schema

        if meta.encoding == STRING_FORMAT:
            # stringformat stores every value as its decimal string
            arrays = [pa.array([None if v is None else str(v) for v in data[c]], type=pa.string()) for c in names]
        else:
            # explicit arrow types: inference would widen SHORT/INT to
            # int64 and break schema merge with existing region files
            arrow_fields = to_arrow_schema(table_schema(meta))
            arrays = [pa.array(data[c], type=arrow_fields.field(c).type) for c in names]
        arrays.append(pa.array(rowkeys, type=pa.binary()))
        arrays.append(pa.array([self.seq] * n, type=pa.int32()))
        table = pa.Table.from_arrays(arrays, names=names + [ROWKEY_COL, SEQ_COL])
        # sort by rowkey so the fragment is a well-formed sorted run
        table = table.sort_by(ROWKEY_COL)
        os.makedirs(self.data_dir, exist_ok=True)
        path = os.path.join(self.data_dir, f"astro-ds-{self.seq}-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, path)
        sorted_keys = table.column(ROWKEY_COL).to_pylist()
        return _FragmentCommit(
            path=path,
            num_rows=n,
            num_keys=len(set(rowkeys)),
            min_rk=sorted_keys[0],
            max_rk=sorted_keys[-1],
        )

    def commit(self, messages) -> None:
        from spark_sql_on_hbase_spark import codec as C
        from spark_sql_on_hbase_spark.catalog import (
            ConcurrentWriteError,
            RegionFile,
            _json_key_value,
        )

        catalog = AstroCatalog(self.warehouse)
        meta = catalog.get_table(self.meta.name, self.meta.namespace)
        key_dtypes = meta.key_dtypes
        shipped = []
        for m in messages:
            if not isinstance(m, _FragmentCommit):
                continue
            min_t = C.decode_key(bytes(m.min_rk), key_dtypes)
            max_t = C.decode_key(bytes(m.max_rk), key_dtypes)
            shipped.append(
                RegionFile(
                    path=m.path,
                    num_rows=m.num_rows,
                    min_key=[_json_key_value(v, d) for v, d in zip(min_t, key_dtypes)],
                    max_key=[_json_key_value(v, d) for v, d in zip(max_t, key_dtypes)],
                    min_rowkey_hex=bytes(m.min_rk).hex(),
                    max_rowkey_hex=bytes(m.max_rk).hex(),
                    seq=self.seq,
                    num_keys=m.num_keys,
                )
            )
        # appends are commutative: on an optimistic-concurrency conflict
        # (r12 CAS) reload the sibling's commit and re-merge our shipped
        # fragments on top of the fresh base
        for attempt in range(8):
            try:
                catalog.update_regions(meta, list(meta.regions) + shipped)
                return
            except ConcurrentWriteError:
                if attempt == 7:
                    raise
                catalog.reload_into(meta)

    def abort(self, messages) -> None:
        """Best-effort cleanup: directory scans would otherwise see the
        orphan fragments (the reference's bulk load has the same
        non-transactionality — partially-loaded HFiles persist)."""
        import os

        for m in messages:
            if isinstance(m, _FragmentCommit):
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class AstroDataSource(DataSource):
    """Usage:
        spark.dataSource.register(AstroDataSource)
        spark.read.format("astro").option("warehouse", wh).option("table", t).load()
        df.write.format("astro").mode("append").option(...).save()
    """

    @classmethod
    def name(cls) -> str:
        return "astro"

    def _meta(self) -> tuple[TableMeta, AstroCatalog]:
        wh = self.options.get("warehouse")
        table = self.options.get("table")
        ns = self.options.get("namespace", "default")
        if not wh or not table:
            raise ValueError("astro source requires options: warehouse, table")
        catalog = AstroCatalog(wh)
        return catalog.get_table(table, ns), catalog

    def schema(self) -> StructType:
        from spark_sql_on_hbase_spark.relation import table_schema

        meta, _ = self._meta()
        return table_schema(meta)

    def reader(self, schema: StructType) -> AstroReader:
        meta, _ = self._meta()
        # unresolved upserts need the merge path — refuse rather than
        # silently return duplicate keys (AstroRelation.scan handles it)
        from spark_sql_on_hbase_spark.relation import AstroRelation

        dummy = AstroRelation.__new__(AstroRelation)
        dummy.meta = meta
        if dummy.needs_merge():
            raise ValueError(
                "table has unresolved upserts; run AstroRelation.compact() "
                "or read via AstroSession (merge-on-read)"
            )
        return AstroReader(meta, schema)

    def writer(self, schema: StructType, overwrite: bool) -> AstroWriter:
        if overwrite:
            raise ValueError("astro writer is append-only (reference has no INSERT OVERWRITE, "
                             "HBaseRelation.scala:660-663)")
        meta, _ = self._meta()
        return AstroWriter(meta, self.options.get("warehouse"))


def register(spark) -> None:
    """Register the 'astro' format on a SparkSession (and enable Python
    data-source filter pushdown, which gates pushFilters)."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static conf on some builds; reader then sees no filters
    spark.dataSource.register(AstroDataSource)
