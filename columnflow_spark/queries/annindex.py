"""Materialized IVF+PQ index: persist, prune, incrementally upsert.

``ann_ivfpq_topk`` (queries/mmdata.py) rebuilds the cell assignment and
PQ codes every session; at 100 TB the index IS the expensive artifact —
the corpus scan, assignment and encoding happen once, and every later
query batch should touch only the probed cells' files.  This module
closes that gap with the engine's own partitioned store
(sources/sinks.py: ``upsert_partitions``):

- **layout** ``cid=<cell>/batch=<n>/part-*.parquet`` rows
  ``(vec_id, codes)``.  ``cid`` is the probe/prune axis (planning-time
  ``PartitionFilters``, asserted in tests/test_plan_quality.py);
  ``batch`` is the upsert unit, so re-running an ingest batch replaces
  exactly its own files (idempotent, the reference's per-task output
  semantics — reference columnflow/tasks/framework/base.py task outputs
  short-circuit on existence) and a NEW batch lands without touching
  sibling batches in the same cell.
- **build** is the same zero-shuffle pass as the in-session query: the
  coarse quantizer (every-64th-vector centroids, frozen — incremental
  batches reuse it) assigns map-side
  (functions/similarity.py:nearest_centroid_assign) and the trained PQ
  encoder (queries/mmdata.py:pq_encode_udf) emits codes in the same
  projection; the only added cost is the partitioned write.
- **search** collects the probed (query, cell) pairs — bounded: a query
  batch times ``n_probe`` — turns the cell set into a static ``IN``
  filter on the partition column, and ADC-scores just those files with
  the broadcast per-query LUT.  Results are bit-identical to
  ``ann_ivfpq_topk`` (same oracle SQL registered for both).

Mirrors the reference's columnar-store round-trip (reference
columnflow/tasks/reduction.py merged outputs re-read by downstream
tasks) re-expressed as a Spark partitioned table.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from columnflow_spark.queries import query
from columnflow_spark.queries.mmdata import (
    IVFPQ_ORACLE,
    _PQ_GRID,
    _ivf_cents,
    _ivf_probes,
    _pq_query_lut,
    pq_encode_udf,
)
from columnflow_spark.functions.similarity import nearest_centroid_assign
from columnflow_spark.sources import load_table
from columnflow_spark.sources.sinks import replace_store, upsert_partitions
from columnflow_spark.sources.tables import table_path
from columnflow_spark.sources import spread


def scratch_root() -> str:
    """Writable artifact root (env-overridable; never under the read-only
    testdata tree)."""
    return os.environ.get(
        "SPARK_GRAFT_SCRATCH",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "scratch"),
    )


#: bump when the trained-codebook/encoding math changes: persisted codes
#: from an older encoder must not be reused
_INDEX_FORMAT = 2


def content_tag(src: str, prefix: str) -> str:
    """Shared content-addressing scheme for every scratch artifact store
    (IVF+PQ index, dedup fingerprint store, format roundtrips): hash the
    source file identity (abspath + size + mtime) plus a caller prefix
    (format/version), so a rebuilt source or a bumped format gets a fresh
    tag and an unchanged one is reused across sessions."""
    try:
        st = os.stat(src)
        ident = f"{prefix}|{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        ident = f"{prefix}|{os.path.abspath(src)}"
    return hashlib.sha1(ident.encode()).hexdigest()[:12]


def ivfpq_index_path(sf_dir: str) -> str:
    """Content-addressed index location (see :func:`content_tag`)."""
    tag = content_tag(table_path(sf_dir, "embeddings"), f"v{_INDEX_FORMAT}")
    return os.path.join(scratch_root(), "ivfpq_index", tag)


def upsert_index_frame(
    spark: SparkSession, sf_dir: str, rows: DataFrame, path: str, *, batch: int
) -> str:
    """Encode a ``(vec_id, embedding)`` frame against the FROZEN coarse
    quantizer + trained PQ codebook (both derive from the static corpus —
    the IVF contract; incremental and streaming ingest reuse them) and
    upsert it as the index's ``batch=<n>`` slice."""
    emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    cents = _ivf_cents(emb).select("cid", "ce")
    encode = pq_encode_udf(spark, sf_dir)
    idx = nearest_centroid_assign(rows, cents).select(
        "vec_id",
        encode("embedding").alias("codes"),
        "cid",
        F.lit(int(batch)).alias("batch"),
    )
    upsert_partitions(idx, path, partition_by=["cid", "batch"])
    # completeness marker: dynamic partition overwrite does NOT emit a
    # root _SUCCESS (it commits per partition), so without an explicit
    # marker the reuse check can never pass and every session silently
    # pays a full rebuild — the store-level equivalent of a task output
    # existence check
    with open(os.path.join(path, "_BUILT"), "w") as f:
        f.write(f"format={_INDEX_FORMAT}\n")
    return path


def build_ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    path: str | None = None,
    *,
    batch: int = 0,
    batch_pred=None,
) -> str:
    """Encode (a batch of) the corpus and upsert it into the partitioned
    index store.  The coarse quantizer always derives from the FULL
    corpus (frozen cell geometry — the IVF contract), while ``batch_pred``
    selects which vectors this batch (re-)encodes."""
    path = path or ivfpq_index_path(sf_dir)
    emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    rows = emb.filter(batch_pred) if batch_pred is not None else emb
    return upsert_index_frame(spark, sf_dir, rows, path, batch=batch)


def compact_ivfpq_index(spark: SparkSession, path: str) -> None:
    """Fold the ``cid=/batch=`` index back into one ``batch=0`` slice per
    cell (VERDICT r5 next #5: the store otherwise grows one directory per
    ingest batch forever).  A vector re-encoded by several batches keeps
    its LATEST encoding (max-batch wins — the same row the batch-grained
    store would shadow by upsert recency), so probe reads over the
    compacted store return exactly what the full batch history returns
    (tests/test_ann_index.py re-proves search equality after compaction).
    Marker-preserving, fails closed on a crash
    (sources/sinks.py:replace_store)."""
    rows = spark.read.parquet(path)
    win = W.partitionBy("vec_id").orderBy(F.desc("batch"))
    rows = (
        rows.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            "vec_id",
            "codes",
            F.col("cid").cast("long").alias("cid"),
            F.lit(0).alias("batch"),
        )
    )
    replace_store(
        rows,
        path,
        partition_by=["cid", "batch"],
        marker_text=f"format={_INDEX_FORMAT}\n",
    )


def _ensure_index(spark: SparkSession, sf_dir: str) -> str:
    path = ivfpq_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_BUILT")):
        build_ivfpq_index(spark, sf_dir, path)
    return path


def search_ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    query_pred=None,
    topk: int = 5,
) -> DataFrame:
    """Probe-pruned ADC top-``topk`` over the persisted index
    (bit-identical to ``ann_ivfpq_topk`` for the default workload): only
    the probed ``cid=`` partitions are read — the scan's PartitionFilters
    carry the ``IN`` list, so at scale the IO is (query batch x n_probe /
    n_cells) of the index, not the index.  ``query_pred`` selects the
    probe batch (default: the fixed ``vec_id % 100 == 7`` workload) —
    composite consumers (``hybrid_search_rrf_indexed``) pass their own."""
    if query_pred is None:
        query_pred = F.col("vec_id") % 100 == 7
    emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    cents = _ivf_cents(emb)
    # bounded collect: |query batch| x n_probe rows — the probe plan is
    # the driver-side artifact here, exactly like a broadcast hint list
    probe_rows = (
        _ivf_probes(emb, cents, query_pred=query_pred)
        .select("query_id", "cid")
        .collect()
    )
    probe_cids = sorted({int(r.cid) for r in probe_rows})
    probes = spark.createDataFrame(
        [(int(r.query_id), int(r.cid)) for r in probe_rows], "query_id long, cid long"
    )
    idx = (
        spark.read.parquet(path)
        .filter(F.col("cid").isin(probe_cids))
        .select("vec_id", "codes", F.col("cid").cast("long").alias("cid"))
    )
    exploded = idx.select(
        "vec_id", "cid", F.posexplode(F.split("codes", "-").cast("array<int>")).alias("sub", "code")
    )
    lut = _pq_query_lut(spark, sf_dir, query_pred)
    cand = exploded.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    adc = (
        cand.join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("sum_d"))
    )
    # integer-scaled distance: round(x*1e4) shares the fp multiply with
    # the oracle, so there is no BigDecimal-vs-float knife edge at any sf
    # (sf1 sweep caught round(x, 4) ties diverging)
    # ONE division before the round: sum_d is an exact integer-valued
    # double, sum_d/100 is the identical double on every engine, and
    # .5 ties round half-up on both — no compound-fp-op divergence
    adc_scaled = F.round(F.col("sum_d") / F.lit(100.0), 0).cast("long")
    win = W.partitionBy("query_id").orderBy(adc_scaled, F.asc("neighbor_id"))
    return (
        adc.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= topk)
        .select("query_id", "neighbor_id", adc_scaled.alias("adc_dist"), "rk")
        .orderBy("query_id", "rk")
    )


@query("ann_ivfpq_materialized_topk", oracle=IVFPQ_ORACLE)
def ann_ivfpq_materialized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ search against the PERSISTED index: build-once (content
    addressed, reused across sessions), then partition-pruned probe reads."""
    path = _ensure_index(spark, sf_dir)
    return search_ivfpq_index(spark, sf_dir, path)
