"""Custom Python DataSource: chunked, projected, filter-pushed Parquet.

This reimplements the reference's ``ChunkedParquetReader``
(/root/reference/columnflow/columnar_util.py:3276: row-group-aligned
chunked reads with column projection under a fixed ``chunk_size``) as a
Spark 4 Python DataSource — and doubles as the integration blueprint for
any columnar Python reader the JVM cannot host (the reference's
uproot/ROOT scan, columnar_util.py:3672, would plug into exactly this
shape: one ``InputPartition`` per file chunk, Arrow batches out).

Scale design:

- planning is metadata-only: partitions come from parquet footers
  (row-group row counts), never data pages;
- one ``InputPartition`` per ~``chunk_size`` rows of consecutive row
  groups (the reference's law.cfg:66 constant, default 100k) — Spark
  schedules chunks independently, so a single huge file still fans out;
- ``read`` yields pyarrow ``RecordBatch`` directly (zero-copy Arrow path
  into the JVM, no per-row Python objects);
- column projection via the ``columns`` option and simple comparison
  filters via ``pushFilters`` are applied INSIDE the pyarrow scan, so
  pruned columns and filtered row groups never cross the Python-JVM
  boundary.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

DEFAULT_CHUNK_SIZE = 100_000  # reference law.cfg:66


@dataclass(frozen=True)
class RowGroupChunk(InputPartition):
    path: str
    row_groups: tuple[int, ...]


def source_files(path: str) -> list[str]:
    """A single parquet file, or the sorted ``part-*.parquet`` members of a
    directory written by :class:`ChunkedParquetWriter`.  Directory reads
    require the writer's ``_SUCCESS`` marker — a directory from a commit
    that never finished must fail loudly, not return a partial subset."""
    import glob  # noqa: PLC0415
    import os  # noqa: PLC0415

    if os.path.isdir(path):
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise ValueError(
                f"chunked_parquet directory {path!r} has no _SUCCESS marker: "
                "the write that produced it did not commit"
            )
        files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
        if not files:
            raise ValueError(
                f"chunked_parquet directory {path!r} committed no part files "
                "(empty write); there is no schema to infer"
            )
        return files
    return [path]


class ChunkedParquetReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        cols = options.get("columns")
        self.columns = [c.strip() for c in cols.split(",")] if cols else None
        self.chunk_size = int(options.get("chunk_size", DEFAULT_CHUNK_SIZE))
        self._filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept simple single-column comparisons: row groups whose
        footer min/max statistics exclude the predicate are skipped
        without decoding any pages (``_prune_row_groups``), and surviving
        rows are filtered in the Arrow table before crossing into the
        JVM; everything else stays with Spark."""
        supported = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
        for f in filters:
            if isinstance(f, supported) and len(f.attribute) == 1:
                self._filters.append(f)
            else:
                yield f

    def _arrow_filter(self):
        if not self._filters:
            return None
        import pyarrow.compute as pc  # noqa: PLC0415

        expr = None
        ops = {
            EqualTo: lambda fld, v: fld == v,
            GreaterThan: lambda fld, v: fld > v,
            GreaterThanOrEqual: lambda fld, v: fld >= v,
            LessThan: lambda fld, v: fld < v,
            LessThanOrEqual: lambda fld, v: fld <= v,
        }
        for f in self._filters:
            e = ops[type(f)](pc.field(f.attribute[0]), f.value)
            expr = e if expr is None else expr & e
        return expr

    def partitions(self) -> Sequence[RowGroupChunk]:
        import pyarrow.parquet as pq  # noqa: PLC0415

        chunks: list[RowGroupChunk] = []
        for path in source_files(self.path):
            pf = pq.ParquetFile(path)
            meta = pf.metadata
            # statistics pruning happens HERE, at planning time (pushFilters
            # runs before partitions), so fully-excluded chunks never become
            # Spark tasks at all — metadata-only, one footer read
            surviving = self._prune_row_groups(pf, list(range(meta.num_row_groups)))
            current: list[int] = []
            rows = 0
            for rg in surviving:
                current.append(rg)
                rows += meta.row_group(rg).num_rows
                if rows >= self.chunk_size:
                    chunks.append(RowGroupChunk(path, tuple(current)))
                    current, rows = [], 0
            if current:
                chunks.append(RowGroupChunk(path, tuple(current)))
        return chunks or [RowGroupChunk(self.path, ())]

    def _prune_row_groups(self, pf, row_groups: list[int]) -> list[int]:
        """Drop row groups whose footer min/max statistics prove the
        pushed predicate matches nothing — metadata-only, no page reads."""
        if not self._filters:
            return row_groups
        meta = pf.metadata
        name_to_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        kept = []
        for rg in row_groups:
            rg_meta = meta.row_group(rg)
            excluded = False
            for f in self._filters:
                ci = name_to_idx.get(f.attribute[0])
                if ci is None:
                    continue
                stats = rg_meta.column(ci).statistics
                if stats is None or not stats.has_min_max:
                    continue
                lo, hi = stats.min, stats.max
                v = f.value
                try:
                    if (
                        (isinstance(f, EqualTo) and (v < lo or v > hi))
                        or (isinstance(f, GreaterThan) and hi <= v)
                        or (isinstance(f, GreaterThanOrEqual) and hi < v)
                        or (isinstance(f, LessThan) and lo >= v)
                        or (isinstance(f, LessThanOrEqual) and lo > v)
                    ):
                        excluded = True
                        break
                except TypeError:  # incomparable stats type: keep the group
                    continue
            if not excluded:
                kept.append(rg)
        return kept

    def read(self, partition: RowGroupChunk):
        import pyarrow.parquet as pq  # noqa: PLC0415

        if not partition.row_groups:
            return
        pf = pq.ParquetFile(partition.path)
        flt = self._arrow_filter()
        table = pf.read_row_groups(list(partition.row_groups), columns=self.columns)
        if flt is not None:
            table = table.filter(flt)
        yield from table.to_batches()


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


class ChunkedParquetWriter(DataSourceArrowWriter):
    """Two-phase-commit parquet writer (the other half of the custom
    connector): every task streams its Arrow batches to a uniquely-named
    file in a per-job staging directory and returns a commit message;
    only the driver's ``commit`` publishes the staged files and then
    writes the ``_SUCCESS`` marker, and ``abort`` discards the staging
    area — failed or speculative TASKS can never surface partial data.
    This is the Hadoop v1 committer protocol expressed in the Python
    DataSource API, with the same residual window (a driver crash mid-
    publish); the chunked reader closes that window by refusing any
    directory without ``_SUCCESS`` (see :func:`source_files`).  Row
    groups are sized by the same ``chunk_size`` the reader plans by, so
    a roundtrip preserves the chunking contract.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        import uuid  # noqa: PLC0415

        self.path = options["path"]
        self.chunk_size = int(options.get("chunk_size", DEFAULT_CHUNK_SIZE))
        self.overwrite = overwrite
        # per-JOB unique staging dir (the writer instance is built once on
        # the driver and pickled to every task): concurrent writes to the
        # same destination can never clobber each other's staged files
        self.staging = f"{self.path.rstrip('/')}__staging_{uuid.uuid4().hex}"

    def write(self, iterator):  # executor-side, once per task
        import os  # noqa: PLC0415
        import uuid  # noqa: PLC0415

        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.parquet as pq  # noqa: PLC0415

        # stream batches through a bounded buffer (~chunk_size rows per
        # row group): task memory does not grow with partition size
        writer, rows, buf, buf_rows = None, 0, [], 0
        fname = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.parquet")

        def flush():
            nonlocal writer, buf, buf_rows
            if not buf:
                return
            table = pa.Table.from_batches(buf)
            if writer is None:
                os.makedirs(self.staging, exist_ok=True)
                writer = pq.ParquetWriter(fname, table.schema)
            writer.write_table(table, row_group_size=self.chunk_size)
            buf, buf_rows = [], 0

        for batch in iterator:
            buf.append(batch)
            buf_rows += batch.num_rows
            rows += batch.num_rows
            if buf_rows >= self.chunk_size:
                flush()
        flush()
        if writer is None:
            return _StagedFile("", 0)
        writer.close()
        return _StagedFile(fname, rows)

    def commit(self, messages) -> None:  # driver-side, all tasks succeeded
        import glob  # noqa: PLC0415
        import os  # noqa: PLC0415
        import shutil  # noqa: PLC0415

        os.makedirs(self.path, exist_ok=True)
        # invalidate BEFORE touching data: a crash mid-publish leaves a
        # marker-less directory the chunked reader refuses, never a
        # readable partial mix of old and new files
        marker = os.path.join(self.path, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        if self.overwrite:
            for f in glob.glob(os.path.join(self.path, "part-*.parquet")):
                os.remove(f)
        for m in messages:
            if m is not None and m.path:
                shutil.move(m.path, os.path.join(self.path, os.path.basename(m.path)))
        shutil.rmtree(self.staging, ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:  # driver-side, some task failed
        import shutil  # noqa: PLC0415

        shutil.rmtree(self.staging, ignore_errors=True)


class ChunkedParquetDataSource(DataSource):
    """``spark.read.format("chunked_parquet").option("path", …)`` and
    ``df.write.format("chunked_parquet").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "chunked_parquet"

    def schema(self):
        import pyarrow.parquet as pq  # noqa: PLC0415
        from pyspark.sql.pandas.types import from_arrow_schema  # noqa: PLC0415

        arrow_schema = pq.ParquetFile(source_files(self.options["path"])[0]).schema_arrow
        cols = self.options.get("columns")
        if cols:
            names = [c.strip() for c in cols.split(",")]
            import pyarrow as pa  # noqa: PLC0415

            arrow_schema = pa.schema([arrow_schema.field(n) for n in names])
        return from_arrow_schema(arrow_schema)

    def reader(self, schema) -> ChunkedParquetReader:
        return ChunkedParquetReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> ChunkedParquetWriter:
        return ChunkedParquetWriter(dict(self.options), overwrite)


def register(spark) -> None:
    """Idempotent registration of the custom sources on a session.

    Also enables Python-source filter pushdown for the REST of the
    session (a runtime SQL conf, off by default) — deliberately NOT
    scoped-and-restored: planning of the registered sources happens
    lazily at action time, after any scope would have closed, and the
    conf only affects sources that implement ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChunkedParquetDataSource)
    spark.dataSource.register(EventsReplaySource)


class _EventsReplayReader(SimpleDataSourceStreamReader):
    """Deterministic replay of a parquet table as a stream, ``batch_rows``
    per micro-batch in ``order_col`` order.

    A driver-side *simple* reader by design: this is the reproducible
    test/backfill harness for the streaming operators (same events, same
    batch boundaries, every run).  A firehose-scale source would use the
    partitioned ``DataSourceStreamReader`` API instead — same offset
    model, reads on executors."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.batch_rows = int(options.get("batch_rows", 2500))
        self.order_col = options.get("order_col", "event_id")
        self._table = None

    def _load(self):
        if self._table is None:
            import pyarrow.parquet as pq  # noqa: PLC0415

            self._table = pq.read_table(self.path).sort_by(self.order_col)
        return self._table

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        t = self._load()
        return [tuple(r.values()) for r in t.slice(lo, hi - lo).to_pylist()]

    def read(self, start: dict):
        t = self._load()
        lo = start["row"]
        hi = min(lo + self.batch_rows, t.num_rows)
        if lo >= hi:
            return iter([]), {"row": lo}
        # a list_iterator, not a generator: the runtime pickles the batch
        # for its prefetch cache
        return iter(self._rows(lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["row"], end["row"]))


class EventsReplaySource(DataSource):
    """``spark.readStream.format("events_replay").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self):
        import pyarrow.parquet as pq  # noqa: PLC0415
        from pyspark.sql.pandas.types import from_arrow_schema  # noqa: PLC0415

        return from_arrow_schema(pq.ParquetFile(self.options["path"]).schema_arrow)

    def simpleStreamReader(self, schema) -> _EventsReplayReader:
        return _EventsReplayReader(dict(self.options))
