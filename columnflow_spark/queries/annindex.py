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
    ivf_probe_route,
    pq_encode_udf,
    pq_query_lut_cached,
)
from columnflow_spark.functions.similarity import nearest_centroid_assign
from columnflow_spark.sources import load_table
from columnflow_spark.sources.sinks import (
    anti_tombstones,
    clear_tombstones,
    ensure_store,
    replace_store,
    upsert_partitions,
    upsert_tombstones,
)
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
    Also the VACUUM step of deletion propagation: tombstoned vectors
    (``_deleted/`` slices written by :func:`delete_vectors_from_index`)
    are dropped from the rewrite and the tombstones cleared — a crash
    between swap and clear is harmless (surviving tombstones anti-join
    already-purged rows).  Marker-preserving, fails closed on a crash
    (sources/sinks.py:replace_store)."""
    rows = anti_tombstones(spark.read.parquet(path), path, id_col="vec_id")
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
    clear_tombstones(path)


def delete_vectors_from_index(
    spark: SparkSession, ids: DataFrame, path: str, *, batch: int
) -> str:
    """Propagate a vector deletion into the persisted index: one bounded
    ``_deleted/batch=<n>`` tombstone slice (idempotent per batch id);
    probe reads anti-join it, compaction purges it physically."""
    upsert_tombstones(ids, path, batch=batch, id_col="vec_id")
    return path


def _ensure_index(spark: SparkSession, sf_dir: str) -> str:
    return ensure_store(
        ivfpq_index_path(sf_dir), lambda p: build_ivfpq_index(spark, sf_dir, p)
    )


def search_ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    query_pred=None,
    topk: int = 5,
    route_key=None,
) -> DataFrame:
    """Probe-pruned ADC top-``topk`` over the persisted index
    (bit-identical to ``ann_ivfpq_topk`` for the default workload): only
    the probed ``cid=`` partitions are read — the scan's PartitionFilters
    carry the ``IN`` list, so at scale the IO is (query batch x n_probe /
    n_cells) of the index, not the index.  ``query_pred`` selects the
    probe batch (default: the fixed ``vec_id % 100 == 7`` workload) —
    composite consumers (``hybrid_search_rrf_indexed``) pass their own,
    with ``route_key`` naming the batch so the routing collect is the
    shared per-session artifact (mmdata.ivf_probe_route)."""
    if query_pred is None:
        query_pred = F.col("vec_id") % 100 == 7
        route_key = route_key or ("mod100", 7)
    # bounded collect: |query batch| x n_probe rows — the probe plan is
    # the driver-side artifact here, exactly like a broadcast hint list
    probe_rows = ivf_probe_route(
        spark, sf_dir, query_pred=query_pred, route_key=route_key
    )
    probe_cids = sorted({cid for _, cid in probe_rows})
    probes = spark.createDataFrame(probe_rows, "query_id long, cid long")
    # deletion propagation: tombstoned vectors drop out of the probed
    # read (broadcast anti-join AFTER the partition prune, so the IO
    # stays probe-bounded); physically purged at compaction
    idx = anti_tombstones(
        spark.read.parquet(path).filter(F.col("cid").isin(probe_cids)),
        path,
        id_col="vec_id",
    ).select("vec_id", "codes", F.col("cid").cast("long").alias("cid"))
    exploded = idx.select(
        "vec_id", "cid", F.posexplode(F.split("codes", "-").cast("array<int>")).alias("sub", "code")
    )
    # the served path reuses the batch's precomputed LUT rows (bounded:
    # |batch| x M x K quantized integers) — the in-session compute twins
    # (ann_pq_adc_topk / ann_ivfpq_topk) keep the LUT in-plan
    lut = (
        pq_query_lut_cached(spark, sf_dir, query_pred, lut_key=route_key)
        if route_key is not None
        else _pq_query_lut(spark, sf_dir, query_pred)
    )
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


# --- index drift audit (VERDICT r6 next #5, the ANN-index arm): the
# coarse quantizer and PQ codebook are FROZEN at index creation; under
# continuous ingest, distribution drift inflates cell skew and PQ
# reconstruction error unboundedly.  The audit reconstructs each stored
# vector's exact PQ quantization error (grid sub-vector vs its assigned
# codebook entry — integer-exact on both engines) per ingest batch, in
# one doc-keyed join + a two-level aggregation over the store's existing
# ``cid=/batch=`` partitions; the trigger compares newest-vs-first batch
# and invalidates through the same marker contract the ensure helpers
# gate on. ---
_DRIFT_ERR_RATIO = 1.5
_DRIFT_SKEW_RATIO = 2.0


def drift_trips(rows, *, err_ratio: float, skew_ratio: float) -> bool:
    """Shared trend predicate over audit rows ``(batch, n_vecs, n_cells,
    max_cell_n, mean_err_q)`` sorted by batch: True when any later
    batch's mean quantization error exceeds ``err_ratio`` x the first
    batch's (or is nonzero at all when the seed batch quantized
    perfectly — a ratio against 0 would be inert for ANY growth), or
    when any later batch's max-cell occupancy share exceeds
    ``skew_ratio`` x the first batch's (cell collapse).  Comparing the
    worst later batch rather than only the newest catches a collapsed
    intermediate batch that a subsequent healthy batch would mask."""
    if len(rows) < 2:
        return False
    first, later = rows[0], rows[1:]
    worst_err = max(r.mean_err_q for r in later)
    if first.mean_err_q > 0:
        if worst_err > err_ratio * first.mean_err_q:
            return True
    elif worst_err > 0:
        return True
    share0 = first.max_cell_n / first.n_vecs
    worst_share = max(r.max_cell_n / r.n_vecs for r in later)
    return share0 > 0 and worst_share > skew_ratio * share0


def index_drift_audit_frame(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Per-batch drift metrics over a persisted IVF+PQ index: ``(batch,
    n_vecs, n_cells, max_cell_n, mean_err_q)`` where ``mean_err_q`` is
    the mean exact PQ reconstruction error (squared L2 between each
    stored vector's grid sub-vectors and its assigned codebook entries —
    exact integer arithmetic end-to-end).  One doc-keyed join against the
    embeddings table fetches the true vectors; the codebook broadcasts
    (K x M rows); both aggregation levels are map-side combinable."""
    from columnflow_spark.queries.mmdata import _PQ_DIM, _PQ_GRID, pq_trained_codebook

    idx = spark.read.parquet(path)
    ex = idx.select(
        "vec_id",
        F.col("cid").cast("long").alias("cid"),
        F.col("batch").cast("int").alias("batch"),
        F.posexplode(F.split("codes", "-").cast("array<int>")).alias("sub", "code"),
    )
    emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    cb = pq_trained_codebook(spark, sf_dir)
    # quantize with the ENCODER's exact half-away form sign(y)*floor(|y|+.5)
    # — F.round's BigDecimal HALF_UP diverges from it (and from DuckDB's
    # round) at fp knife edges like y = 0.49999999999999994, where
    # |y| + 0.5 rounds up in double but the decimal expansion is < .5
    def _grid(x):
        y = x.cast("double") * _PQ_GRID
        return F.when(y >= 0, F.floor(y + 0.5)).otherwise(-F.floor(-y + 0.5)).cast(
            "double"
        )

    tsub = F.transform(F.slice("embedding", F.col("sub") * _PQ_DIM + 1, _PQ_DIM), _grid)
    suberr = F.aggregate(
        F.zip_with(tsub, F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    # codebook entries are integer-sum/count rationals, so raw sub-errors
    # are fractional doubles: quantize each (vec, sub) term to an integer
    # FIRST (the ADC-LUT round(,0) pattern — one rounding op shared with
    # the oracle), then every downstream sum is exact integer arithmetic
    # in any order on any engine
    per_vec = (
        ex.join(emb, "vec_id")
        .join(F.broadcast(cb), ["sub", "code"])
        .select("batch", "cid", "vec_id", F.round(suberr, 0).cast("long").alias("e"))
        .groupBy("batch", "cid", "vec_id")
        .agg(F.sum("e").alias("err"))
    )
    cell = per_vec.groupBy("batch", "cid").agg(
        F.count(F.lit(1)).alias("n"), F.sum("err").alias("eq")
    )
    return (
        cell.groupBy("batch")
        .agg(
            F.sum("n").cast("long").alias("n_vecs"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.max("n").cast("long").alias("max_cell_n"),
            F.expr("sum(eq) div sum(n)").cast("long").alias("mean_err_q"),
        )
        .orderBy("batch")
    )


def ann_index_needs_rebuild(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    *,
    err_ratio: float = _DRIFT_ERR_RATIO,
    skew_ratio: float = _DRIFT_SKEW_RATIO,
) -> bool:
    """Rebuild trigger for a persisted index (see :func:`drift_trips`)."""
    rows = index_drift_audit_frame(spark, sf_dir, path).collect()
    return drift_trips(rows, err_ratio=err_ratio, skew_ratio=skew_ratio)


def invalidate_index(path: str) -> None:
    """Trip the index's reuse contract (``_BUILT`` + sequence markers) so
    the next ensure pays a fresh build with re-trained quantizers."""
    for marker in ("_BUILT", "_SEQ_COMPLETE"):
        p = os.path.join(path, marker)
        if os.path.exists(p):
            os.remove(p)


def _trend_index_path(sf_dir: str) -> str:
    tag = content_tag(table_path(sf_dir, "embeddings"), f"trend-v{_INDEX_FORMAT}")
    return os.path.join(scratch_root(), "ivfpq_index_trend", tag)


def _ensure_trend_index(spark: SparkSession, sf_dir: str) -> str:
    """Two-batch index (first and second half of vec_ids) so the audit
    has a per-batch trend to report; sequence-marker gated (a crash
    between the two builds must not leave a half-index that passes the
    reuse check)."""
    def build(p: str) -> None:
        n = load_table(spark, sf_dir, "embeddings", columns=["vec_id"]).count()
        build_ivfpq_index(spark, sf_dir, p, batch=0, batch_pred=F.col("vec_id") < n // 2)
        build_ivfpq_index(spark, sf_dir, p, batch=1, batch_pred=F.col("vec_id") >= n // 2)
        with open(os.path.join(p, "_SEQ_COMPLETE"), "w") as f:
            f.write("2-batch trend build complete\n")

    return ensure_store(_trend_index_path(sf_dir), build, marker="_SEQ_COMPLETE")


def _index_drift_oracle() -> str:
    from columnflow_spark.queries.mmdata import (
        _PQ_DIM,
        _PQ_ITERS,
        _PQ_GRID,
        _PQ_M,
        _pq_assign_sql,
        _pq_train_ctes,
    )

    return f"""
    WITH {_pq_train_ctes()},
    best AS MATERIALIZED ({_pq_assign_sql('t', f'cb{_PQ_ITERS}')}
    ),
    nn AS (SELECT count(*) // 2 AS a FROM embeddings),
    cents AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings
        WHERE vec_id % 64 = 0
    ),
    assign AS MATERIALIZED (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
                                DESC, c.cid
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    t2 AS MATERIALIZED (
        -- the ENCODER's exact grid sign(y)*floor(|y|+0.5): the train
        -- CTE's round(y) differs at fp-carry knife edges (e.g.
        -- 0.49999999999999994 + 0.5 == 1.0 in double while round() of
        -- the same double is 0), which showed up as per-vector errors
        -- off by exactly 1 — assignment is tie-stable under that ulp,
        -- the raw integer error sum is not
        SELECT vec_id, list_transform(range(1, {_PQ_M * _PQ_DIM + 1}), j ->
                   CASE WHEN embedding[j] >= 0
                        THEN floor(embedding[j]::DOUBLE * {_PQ_GRID} + 0.5)
                        ELSE -floor(-(embedding[j]::DOUBLE) * {_PQ_GRID} + 0.5) END) AS q
        FROM embeddings
    ),
    errs AS MATERIALIZED (
        -- per-(vec, sub) error quantized to an integer FIRST (the ADC
        -- LUT round pattern): codebook entries are fractional rationals,
        -- so only the post-round sums are order-independent integers
        SELECT b.vec_id,
               CAST(sum(CAST(round(list_aggregate(list_transform(
                   range(1, {_PQ_DIM + 1}),
                   j -> (t2.q[b.sub * {_PQ_DIM} + j] - cb.c[j])
                        * (t2.q[b.sub * {_PQ_DIM} + j] - cb.c[j])), 'sum'))
                   AS BIGINT)) AS BIGINT) AS err
        FROM best b
        JOIN t2 ON t2.vec_id = b.vec_id
        JOIN cb{_PQ_ITERS} cb ON cb.sub = b.sub AND cb.code = b.code
        GROUP BY b.vec_id
    ),
    vecs AS (
        SELECT a.vec_id, a.cid, e.err,
               CASE WHEN a.vec_id < nn.a THEN 0 ELSE 1 END AS batch
        FROM assign a JOIN errs e USING (vec_id) CROSS JOIN nn
    ),
    cellstats AS (
        SELECT batch, cid, count(*) AS cn, CAST(sum(err) AS BIGINT) AS eq
        FROM vecs GROUP BY batch, cid
    )
    SELECT CAST(batch AS INT) AS batch,
           CAST(sum(cn) AS BIGINT) AS n_vecs,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(max(cn) AS BIGINT) AS max_cell_n,
           CAST(sum(eq) // sum(cn) AS BIGINT) AS mean_err_q
    FROM cellstats GROUP BY batch ORDER BY batch
    """


@query("ann_index_drift_audit", oracle=_index_drift_oracle())
def ann_index_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift audit over a two-batch persisted IVF+PQ index: per-batch
    cell occupancy and exact PQ reconstruction-error trend, replayed by
    the oracle from raw embeddings (frozen %64 coarse cells + the Lloyd
    codebook chain; batches = first/second half of vec_ids)."""
    path = _ensure_trend_index(spark, sf_dir)
    return index_drift_audit_frame(spark, sf_dir, path)


# --- index deletion propagation (VERDICT r8 next #1, the ANN arm): a
# forgotten document's codes must stop being served WITHOUT a full
# index rebuild.  The delete is a bounded tombstone slice; the probed
# search anti-joins it after the partition prune (IO stays
# probe-bounded), and compaction purges it physically.  The oracle is
# the full IVF+PQ replay with the deleted ids excluded from the
# CANDIDATE side only — the query batch is external serve-time input
# and keeps its fixed workload. ---
def _deleted_index_path(sf_dir: str, *, vacuum: bool) -> str:
    kind = "vacuumed" if vacuum else "deleted"
    tag = content_tag(table_path(sf_dir, "embeddings"), f"{kind}-v{_INDEX_FORMAT}")
    return os.path.join(scratch_root(), f"ivfpq_index_{kind}", tag)


def _ensure_deleted_index(spark: SparkSession, sf_dir: str, *, vacuum: bool) -> str:
    def build(p: str) -> None:
        build_ivfpq_index(spark, sf_dir, p)
        deleted = load_table(spark, sf_dir, "embeddings", columns=["vec_id"]).filter(
            F.col("vec_id") % 7 == 3
        )
        delete_vectors_from_index(spark, deleted, p, batch=0)
        if vacuum:
            compact_ivfpq_index(spark, p)
        with open(os.path.join(p, "_SEQ_COMPLETE"), "w") as f:
            f.write("build + delete%s complete\n" % (" + vacuum" if vacuum else ""))

    return ensure_store(
        _deleted_index_path(sf_dir, vacuum=vacuum), build, marker="_SEQ_COMPLETE"
    )


def _ivfpq_delete_oracle() -> str:
    from columnflow_spark.queries.mmdata import ivfpq_adc_ctes

    return f"""
    WITH {ivfpq_adc_ctes(cand_filter_sql="AND NOT (a.vec_id % 7 = 3)")}
    SELECT query_id, neighbor_id, adc_dist, rk
    FROM ivf_rank
    ORDER BY query_id, rk
    """


@query("ann_index_delete_topk", oracle=_ivfpq_delete_oracle())
def ann_index_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ search AFTER deletion propagation: full corpus indexed,
    ``vec_id % 7 == 3`` tombstoned, default workload served.  Oracle =
    the full replay with deleted ids excluded from candidates — hash
    equality proves forgotten vectors are never served and surviving
    ranks shift exactly as a from-scratch reduced index would."""
    path = _ensure_deleted_index(spark, sf_dir, vacuum=False)
    return search_ivfpq_index(spark, sf_dir, path)


@query("ann_index_delete_vacuum_topk", oracle=_ivfpq_delete_oracle())
def ann_index_delete_vacuum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same deletion physically PURGED through compaction (rewrite
    minus tombstones, max-batch encoding wins, tombstones cleared).
    Shares ``ann_index_delete_topk``'s oracle — logical ≡ physical."""
    path = _ensure_deleted_index(spark, sf_dir, vacuum=True)
    return search_ivfpq_index(spark, sf_dir, path)


# --- materialized OPQ index (round 9): the learned-rotation PQ family
# deployed as a persisted, probe-pruned store — the serving shape of
# ann_opq_adc_topk.  The rotation + codebooks train once per corpus
# (driver-side, bounded sample — queries/mmdata.py:opq_train_np) and
# PERSIST as sidecars (``_rotation``, ``_codebook``) next to the
# ``cid=/batch=`` OPQ-code partitions, so a fresh session serves from
# the artifacts without retraining (the unigram-vocab contract); cells
# come from the same frozen raw-space coarse quantizer the IVF+PQ index
# uses, so probe routing is SHARED with every other index-served path
# (ivf_probe_route's session cache).  Rows-only registration (the
# rotation's SVD has no SQL twin); store ≡ in-session-math equality and
# tombstone-delete behavior are pinned in tests/test_ann_index.py. ---
_OPQ_INDEX_FORMAT = 1


def opq_index_path(sf_dir: str) -> str:
    tag = content_tag(table_path(sf_dir, "embeddings"), f"opq-v{_OPQ_INDEX_FORMAT}")
    return os.path.join(scratch_root(), "opq_index", tag)


def build_opq_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, *, batch: int = 0,
    batch_pred=None,
) -> str:
    """Train (or reuse) the OPQ artifacts, persist them as sidecars, and
    encode (a batch of) the corpus into ``cid=/batch=`` code partitions
    — one rotate+encode projection per vector, zero shuffle beyond the
    partitioned write."""
    from columnflow_spark.queries.mmdata import (
        _PQ_K,
        _PQ_M,
        opq_encode_udf,
        opq_train_np,
    )

    path = path or opq_index_path(sf_dir)
    R, cms = opq_train_np(spark, sf_dir)
    from columnflow_spark.sources.sinks import tiny_rows_df

    # one-partition sidecar frames (r14): createDataFrame(list).coalesce(1)
    # paid one sequential Python-worker round trip per empty parallelize
    # partition inside a single task — see sinks.tiny_rows_df
    tiny_rows_df(
        spark,
        [(i, [float(x) for x in R[i]]) for i in range(R.shape[0])],
        "i int, row array<double>",
    ).write.mode("overwrite").parquet(os.path.join(path, "_rotation"))
    tiny_rows_df(
        spark,
        [
            (s, ci, [float(x) for x in cms[s][ci]])
            for s in range(_PQ_M)
            for ci in range(_PQ_K)
        ],
        "sub int, code int, c array<double>",
    ).write.mode("overwrite").parquet(os.path.join(path, "_codebook"))
    emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    rows = emb.filter(batch_pred) if batch_pred is not None else emb
    cents = _ivf_cents(emb).select("cid", "ce")
    encode = opq_encode_udf(spark, sf_dir)
    idx = nearest_centroid_assign(rows, cents).select(
        "vec_id",
        encode("embedding").alias("codes"),
        "cid",
        F.lit(int(batch)).alias("batch"),
    )
    upsert_partitions(idx, path, partition_by=["cid", "batch"])
    with open(os.path.join(path, "_BUILT"), "w") as f:
        f.write(f"format={_OPQ_INDEX_FORMAT}\n")
    return path


def load_opq_artifacts(spark: SparkSession, path: str):
    """``(R, cms)`` read back from the persisted sidecars — serving NEVER
    retrains (a fresh session must produce bit-identical search results
    from the store alone)."""
    import numpy as np  # noqa: PLC0415

    from columnflow_spark.queries.mmdata import _PQ_K, _PQ_M

    rot = sorted(
        spark.read.parquet(os.path.join(path, "_rotation")).collect(),
        key=lambda r: r.i,
    )
    R = np.array([list(r.row) for r in rot], dtype=np.float64)
    cb = spark.read.parquet(os.path.join(path, "_codebook")).collect()
    cms = [np.zeros((_PQ_K, len(cb[0].c)), dtype=np.float64) for _ in range(_PQ_M)]
    for r in cb:
        cms[r.sub][r.code] = np.array(r.c, dtype=np.float64)
    return R, cms


def _ensure_opq_index(spark: SparkSession, sf_dir: str) -> str:
    return ensure_store(
        opq_index_path(sf_dir), lambda p: build_opq_index(spark, sf_dir, p)
    )


def search_opq_index(
    spark: SparkSession, sf_dir: str, path: str, query_pred=None, topk: int = 5,
    route_key=None,
) -> DataFrame:
    """Probe-pruned ADC top-k over the persisted OPQ index: probe routes
    come from the SHARED raw-space coarse quantizer (so the routing
    collect is reused across every index-served path); queries rotate +
    grid-quantize through the PERSISTED artifacts and the per-query LUT
    builds against the persisted codebook."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from columnflow_spark.queries.mmdata import _PQ_DIM, _PQ_GRID, _PQ_M, ivf_probe_route

    if query_pred is None:
        query_pred = F.col("vec_id") % 100 == 7
        route_key = route_key or ("mod100", 7)
    probe_rows = ivf_probe_route(
        spark, sf_dir, query_pred=query_pred, route_key=route_key
    )
    probe_cids = sorted({cid for _, cid in probe_rows})
    probes = spark.createDataFrame(probe_rows, "query_id long, cid long")
    idx = anti_tombstones(
        spark.read.parquet(path).filter(F.col("cid").isin(probe_cids)),
        path,
        id_col="vec_id",
    ).select("vec_id", "codes", F.col("cid").cast("long").alias("cid"))
    exploded = idx.select(
        "vec_id", "cid",
        F.posexplode(F.split("codes", "-").cast("array<int>")).alias("sub", "code"),
    )
    R, _ = load_opq_artifacts(spark, path)

    @F.pandas_udf("array<long>")
    def _rot(batch):
        x = np.vstack(batch.to_numpy()).astype(np.float64) @ R
        y = x * _PQ_GRID
        return pd.Series(list((np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)))

    emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    qsubs = (
        emb.filter(query_pred)
        .select(F.col("vec_id").alias("query_id"), _rot("embedding").alias("tq"))
        .select(
            "query_id",
            F.posexplode(
                F.array(*[F.slice("tq", s * _PQ_DIM + 1, _PQ_DIM) for s in range(_PQ_M)])
            ).alias("sub", "qs"),
        )
    )
    cbdf = spark.read.parquet(os.path.join(path, "_codebook"))
    subd = F.aggregate(
        F.zip_with("qs", "c", lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = qsubs.join(F.broadcast(cbdf), "sub").select(
        "query_id", "sub", "code", F.round(subd, 0).alias("d")
    )
    cand = exploded.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    adc = (
        cand.join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("sum_d"))
    )
    adc_scaled = F.round(F.col("sum_d") / F.lit(100.0), 0).cast("long")
    win = W.partitionBy("query_id").orderBy(adc_scaled, F.asc("neighbor_id"))
    return (
        adc.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= topk)
        .select("query_id", "neighbor_id", adc_scaled.alias("adc_dist"), "rk")
        .orderBy("query_id", "rk")
    )


@query("ann_opq_materialized_topk")
def ann_opq_materialized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ADC search over the PERSISTED OPQ index (build-once
    rotation/codebook/code artifacts, partition-pruned probe reads) —
    the serving deployment of the learned-rotation quantizer.  Rows-only
    (no SQL twin for the rotation); store-serving ≡ in-session-math and
    probe pruning are pinned in tests/test_ann_index.py."""
    path = _ensure_opq_index(spark, sf_dir)
    return search_opq_index(spark, sf_dir, path)
