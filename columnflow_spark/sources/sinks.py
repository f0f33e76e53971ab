"""Parquet sinks: sorted-field writes, row-group targeting, partitioned
layout, and size-targeted compaction.

Reference semantics:

- ``sorted_ak_to_parquet`` (reference columnflow/columnar_util.py:1061)
  recursively sorts fields before writing so every stage emits a
  deterministic column layout; ``sort_ak_fields`` (:1027) is the recursive
  sort.  Spark form: a recursive ``select``/``struct`` re-projection.
- per-chunk files merged with row groups of 50k rows
  (``merging_row_group_size``, reference law.cfg:71) — Spark form:
  ``maxRecordsPerFile`` (row groups are per-file here; one file = one
  write task output).
- ``MergeReductionStats`` / ``MergeReducedEvents`` (reference
  tasks/reduction.py:296-469) size merged outputs to ~512 MB — Spark
  form: measure the source bytes and ``repartition`` to
  ``ceil(bytes / target)`` output files (on a real cluster AQE's
  ``coalescePartitions`` does this continuously; the explicit helper is
  for final, stable layouts).
- partition pruning by dataset/shift (reference content-addressed store
  paths, tasks/framework/base.py:926) — Spark form: a
  ``dataset=…/shift=…`` hive layout via ``partitionBy``, which Catalyst
  prunes at scan time.
"""

from __future__ import annotations

import math
import os
import shutil
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_ROWS_PER_FILE = 50_000
DEFAULT_TARGET_FILE_BYTES = 512 * 1024 * 1024


def _sorted_field_expr(field: T.StructField, prefix: str) -> Column:
    """Recursively re-project a field with struct members in sorted order
    (arrays of structs included)."""
    dt = field.dataType
    path = f"{prefix}`{field.name}`"
    if isinstance(dt, T.StructType):
        members = sorted(dt.fields, key=lambda f: f.name)
        return F.struct(*[_sorted_field_expr(m, f"{path}.") for m in members]).alias(field.name)
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        members = sorted(dt.elementType.fields, key=lambda f: f.name)

        def rebuild(x: Column) -> Column:
            return F.struct(*[_rebuild_nested(x[m.name], m).alias(m.name) for m in members])

        return F.transform(F.expr(path), rebuild).alias(field.name)
    return F.expr(path).alias(field.name)


def _rebuild_nested(col: Column, field: T.StructField) -> Column:
    dt = field.dataType
    if isinstance(dt, T.StructType):
        members = sorted(dt.fields, key=lambda f: f.name)
        return F.struct(*[_rebuild_nested(col[m.name], m).alias(m.name) for m in members])
    return col


def sort_fields(df: DataFrame) -> DataFrame:
    """Recursively sort all (nested) field names — the reference's
    ``sort_ak_fields`` (columnar_util.py:1027) giving deterministic
    layouts independent of operator insertion order."""
    top = sorted(df.schema.fields, key=lambda f: f.name)
    return df.select(*[_sorted_field_expr(f, "") for f in top])


def write_events(
    df: DataFrame,
    path: str,
    *,
    partition_by: Iterable[str] = (),
    rows_per_file: int = DEFAULT_ROWS_PER_FILE,
    mode: str = "overwrite",
) -> None:
    """Sorted-field, row-group-targeted event write; ``partition_by``
    produces the prunable ``dataset=…/shift=…`` hive layout.

    Partitioned writes cluster rows by the partition columns first (an
    AQE ``REBALANCE`` exchange — guide §6: without it every write task
    emits one file per hive-partition value it holds, so a store write
    from a 32-partition frame into 31 cells committed ~1000 near-empty
    files; measured 78 s -> 24 s and 992 -> 31 files at sf0.1, and at
    cluster scale tasks x partition-values is the small-files
    catastrophe).  REBALANCE rather than a plain repartition: AQE both
    coalesces small partition groups and SPLITS an oversized hive
    partition across tasks (advisory size), so one hot ``batch=0`` slice
    still writes in parallel; ``maxRecordsPerFile`` bounds row groups
    either way."""
    out = sort_fields(df)
    partition_by = list(partition_by)
    if partition_by:
        out = out.hint("rebalance", *partition_by)
    writer = out.write.mode(mode).option("maxRecordsPerFile", rows_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_to_target_size(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    rows_per_file: int | None = None,
) -> int:
    """Merge small files into ~``target_file_bytes`` outputs (the
    reference's MergeReductionStats sizing, tasks/reduction.py:309-327):
    measure source bytes, repartition to ``ceil(bytes / target)`` files.
    Returns the output file count."""
    df = spark.read.parquet(src_path)
    # on-disk bytes of the source (driver-side listing; cheap — metadata only)
    hadoop_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hadoop_path).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    writer = df.repartition(n_files).write.mode("overwrite")
    if rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    writer.parquet(dst_path)
    return n_files


def replace_store(
    df: DataFrame,
    path: str,
    *,
    partition_by: Iterable[str],
    marker_name: str = "_BUILT",
    marker_text: str = "",
    rows_per_file: int = DEFAULT_ROWS_PER_FILE,
) -> None:
    """Rewrite an incremental store IN PLACE with a new layout (the
    compaction primitive for the ``batch=``-grained stores: the IVF+PQ
    index and the dedup fingerprint store grow one directory per ingest
    batch forever; compaction folds them back into one slice).

    ``df`` may read FROM ``path`` itself: the rewrite lands in a sibling
    ``<path>.compact-tmp`` first (fully materialized — the source is
    still intact while the write runs), gets its completeness marker, and
    only then swaps directories.  Crash between the two renames leaves no
    marker at ``path``, so the store-reuse check fails closed and the
    next session rebuilds — never a half-compacted store read as
    complete."""
    tmp, old = path + ".compact-tmp", path + ".compact-old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    write_events(df, tmp, partition_by=partition_by, rows_per_file=rows_per_file)
    # sidecar artifacts (underscore-prefixed: the semdedup store's
    # _centroids, the postings store's _stats) live INSIDE the store dir
    # but are not part of the rewritten data — carry them into the new
    # layout before the swap, or the rewrite silently destroys them
    # (found by bm25_postings_delete: the stats slices vanished and every
    # score went NaN off a negative doc count).  FILE sidecars (store
    # metadata like the graph store's _BUCKETS modulus) are COPIED, not
    # moved: a crash between this loop and the swap must leave the
    # still-live source store metadata-complete — a marker-complete
    # store missing its bucket-modulus record would serve wrongly-pruned
    # reads, which is worse than the rebuild a missing marker forces
    # (r13; directory sidecars keep the move — their loss fails safe via
    # the serve-path fallbacks).
    for entry in os.listdir(path):
        if entry.startswith("_") and entry != marker_name:
            src, dst = os.path.join(path, entry), os.path.join(tmp, entry)
            if os.path.isfile(src):
                shutil.copy2(src, dst)
            else:
                os.rename(src, dst)
    with open(os.path.join(tmp, marker_name), "w") as f:
        f.write(marker_text)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def ensure_store(path: str, build_fn, marker: str = "_BUILT") -> str:
    """Cross-session-safe check-then-build (VERDICT r11 next #7): when
    the ``_BUILT`` marker is absent, build into a UNIQUE staging sibling
    and publish with one atomic ``rename``.  Two concurrent sessions may
    both pay the build (content-addressed paths make the bytes
    identical), but they can never interleave writes inside one
    directory: exactly one rename wins, the loser discards its staging
    copy and serves the winner's store.

    ``build_fn(staging_path)`` must write the complete store INCLUDING
    its completeness ``marker`` at ``staging_path`` (``_BUILT`` for
    single-step builds, ``_SEQ_COMPLETE`` for multi-step fixtures) — the
    marker therefore exists before publication, and a crash at any point
    leaves either nothing at ``path`` (next session rebuilds) or a
    fully-marked store.
    """
    import uuid

    if os.path.exists(os.path.join(path, marker)):
        return path
    staging = f"{path}.staging-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        build_fn(staging)
        if not os.path.exists(os.path.join(staging, marker)):
            raise RuntimeError(f"store build left no {marker} marker: {staging}")
    except BaseException:
        # a failed build must not leak its staging tree (ADVICE r12):
        # orphaned .staging-* siblings otherwise accumulate forever
        shutil.rmtree(staging, ignore_errors=True)
        raise
    # opportunistic sweep of stale staging siblings from crashed builds
    # (a LIVE concurrent build uses a different pid-uuid name and wins or
    # discards via the rename race below; anything older than a day here
    # is dead weight)
    import time as _time

    parent, base = os.path.split(path)
    try:
        for entry in os.listdir(parent or "."):
            if entry.startswith(f"{base}.staging-") and entry != os.path.basename(staging):
                full = os.path.join(parent, entry)
                try:
                    if _time.time() - os.path.getmtime(full) > 86400:
                        shutil.rmtree(full, ignore_errors=True)
                except OSError:
                    pass
    except OSError:
        pass
    # a marker-less remnant at path (crashed legacy in-place build) must
    # not block publication
    if os.path.exists(path) and not os.path.exists(os.path.join(path, marker)):
        shutil.rmtree(path, ignore_errors=True)
    try:
        os.rename(staging, path)
    except OSError:
        if os.path.exists(os.path.join(path, marker)):
            # another session published first — deterministic content,
            # use theirs
            shutil.rmtree(staging, ignore_errors=True)
        else:
            raise
    return path


# --- tombstone primitives for DOC-GRAIN incremental stores (phash block
# postings, semantic vectors, the IVF+PQ index — queries/dedupstore.py,
# queries/annindex.py): rows carry their doc/vec id, so a deletion is a
# bounded id slice under ``_deleted/batch=<n>`` (idempotent per batch id)
# anti-joined at serve time.  Tombstone sets are compliance-batch sized —
# broadcast by construction; the periodic compaction rewrites the store
# minus tombstones and clears them (logical delete -> physical purge,
# the vacuum).  Content-grain stores (exact fingerprints, substring
# grams) use negative count slices instead — see queries/dedupstore.py. ---
def upsert_tombstones(
    ids: DataFrame, path: str, *, batch: int, id_col: str = "doc_id"
) -> None:
    """Record a deleted-id set as the store's ``_deleted/batch=<n>``
    slice (distinct ids only — re-running a delete batch overwrites
    exactly its own slice)."""
    rows = ids.select(F.col(id_col)).distinct().withColumn("batch", F.lit(int(batch)))
    upsert_partitions(rows, os.path.join(path, "_deleted"), partition_by=["batch"])


def read_tombstones(
    spark: SparkSession, path: str, *, id_col: str = "doc_id"
) -> DataFrame | None:
    p = os.path.join(path, "_deleted")
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p).select(id_col).distinct()


def anti_tombstones(store: DataFrame, path: str, *, id_col: str = "doc_id") -> DataFrame:
    """Serve-time delete mask: store rows minus the tombstoned ids (a
    broadcast anti-join — the id list is compliance-batch sized, never
    corpus-grain; unbounded tombstone growth is what the purging
    compaction bounds)."""
    t = read_tombstones(store.sparkSession, path, id_col=id_col)
    if t is None:
        return store
    return store.join(F.broadcast(t), id_col, "left_anti")


def clear_tombstones(path: str) -> None:
    shutil.rmtree(os.path.join(path, "_deleted"), ignore_errors=True)


def write_json_lines(
    df: DataFrame,
    path: str,
    *,
    partition_by: Iterable[str] = (),
    mode: str = "overwrite",
) -> None:
    """Distributed JSON-lines sink (sorted fields, one object per line) —
    the export twin of :func:`columnflow_spark.sources.load_json`; the
    reference's json side outputs for interchange with non-parquet tooling
    (e.g. tasks/selection.py stats targets)."""
    out = sort_fields(df)
    partition_by = list(partition_by)
    if partition_by:
        # REBALANCE by the partition columns, exactly like write_events
        # (guide §6): without it every task emits one file per
        # hive-partition value it holds — the small-files bug the r13
        # parquet-writer fix closed was still reachable via this path
        out = out.hint("rebalance", *partition_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def tiny_rows_df(spark, rows, schema: str):
    """One-partition DataFrame from a driver-side row list — for tiny
    sidecar writes (codebooks, rotation matrices, slice bounds, trained
    vocabs).  ``createDataFrame(list)`` parallelizes into
    ``defaultParallelism`` PYTHON partitions; a following ``coalesce(1)``
    then evaluates all of them SEQUENTIALLY inside one task — one
    Python-worker round trip per empty-ish partition, measured 4-6 s per
    40-row sidecar write at local[32] (r14).  One partition up front
    keeps the driver row order byte-identically and costs one worker
    call (~0.3 s)."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def write_side_output(obj: object, path: str) -> str:
    """Driver-side JSON side sink for small summary objects — selection
    stats, cutflow dictionaries, normalization sums (the reference persists
    these as pickle/json law targets next to the event data,
    tasks/selection.py:260 stats output).  Atomic write (tmp + rename);
    keys are sorted so re-runs are byte-identical."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, sort_keys=True, indent=2, default=str)
        fh.write("\n")
    os.replace(tmp, path)
    return path


def read_side_output(path: str) -> object:
    import json

    with open(path) as fh:
        return json.load(fh)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Iterable[str],
    n_buckets: int = 32,
    *,
    sort_cols: Iterable[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table write — the storage layout that
    makes repeated fact-fact joins and groupBys on the bucket key
    exchange-free (SURVEY §4: pre-shuffled storage; the production answer
    to re-shuffling 100 TB per query).  Buckets require the table catalog
    (``saveAsTable``); ``sort_cols`` additionally orders within buckets so
    sort-merge joins skip their sorts."""
    writer = df.write.mode(mode).bucketBy(int(n_buckets), *list(bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*list(sort_cols))
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def upsert_partitions(
    df: DataFrame,
    path: str,
    *,
    partition_by: Iterable[str],
    rows_per_file: int = DEFAULT_ROWS_PER_FILE,
) -> None:
    """Idempotent per-partition replace into the ``dataset=…/shift=…``
    store: only the partitions PRESENT in ``df`` are overwritten, sibling
    partitions are untouched (dynamic partition overwrite).

    This is the incremental form of :func:`write_events` — re-running one
    dataset/shift (the reference's per-task idempotent output semantics,
    task outputs short-circuit on existence) must not clobber the rest of
    a store that took cluster-days to build.  The conf flip is scoped and
    restored."""
    partition_by = list(partition_by)
    if not partition_by:
        raise ValueError("upsert_partitions requires partition columns")
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        write_events(df, path, partition_by=partition_by, rows_per_file=rows_per_file)
    finally:
        spark.conf.set(key, before)
