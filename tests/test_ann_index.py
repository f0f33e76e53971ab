"""Materialized IVF+PQ index store: pruning, incremental upsert, parity."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from columnflow_spark.queries.annindex import (
    build_ivfpq_index,
    search_ivfpq_index,
)
from columnflow_spark.queries.mmdata import ann_ivfpq_topk


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.adc_dist, r.rk) for r in df.collect()
    )


@pytest.fixture(scope="module")
def fresh_index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    build_ivfpq_index(spark, sf_dir, path)
    return path


def test_materialized_search_matches_in_session(spark, sf_dir, fresh_index):
    # the persisted index must answer bit-identically to the per-session
    # rebuild (same codebook, same cells, same ADC ranking)
    live = _rows(ann_ivfpq_topk.__wrapped__(spark, sf_dir))
    stored = _rows(search_ivfpq_index(spark, sf_dir, fresh_index))
    assert stored == live
    assert len(stored) > 0


def test_probe_read_prunes_partitions(spark, sf_dir, fresh_index):
    # a probe read must skip non-probed cells at PLANNING time:
    # the cid IN-list lands in PartitionFilters, not a post-scan filter,
    # and the scan schema excludes the partition/batch columns
    df = (
        spark.read.parquet(fresh_index)
        .filter(F.col("cid").isin([0, 64]))
        .select("vec_id", "codes")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("cid" in l and "IN (0,64)" in l for l in pf), pf
    assert any("ReadSchema: struct<codes:string,vec_id:bigint>" in l for l in pf), pf


def test_incremental_batches_equal_full_build(spark, sf_dir, tmp_path):
    # building in two upserted batches (frozen coarse quantizer) must
    # produce the same search results as one full build — and re-running
    # a batch (idempotent per-partition replace) must not duplicate rows
    path = str(tmp_path / "index")
    mid = 250
    build_ivfpq_index(
        spark, sf_dir, path, batch=0, batch_pred=F.col("vec_id") < mid
    )
    build_ivfpq_index(
        spark, sf_dir, path, batch=1, batch_pred=F.col("vec_id") >= mid
    )
    live = _rows(ann_ivfpq_topk.__wrapped__(spark, sf_dir))
    assert _rows(search_ivfpq_index(spark, sf_dir, path)) == live

    n_rows = spark.read.parquet(path).count()
    # idempotent re-run of batch 1: same rows, not appended
    build_ivfpq_index(
        spark, sf_dir, path, batch=1, batch_pred=F.col("vec_id") >= mid
    )
    assert spark.read.parquet(path).count() == n_rows
    assert _rows(search_ivfpq_index(spark, sf_dir, path)) == live


def test_index_store_layout(spark, sf_dir, fresh_index):
    # hive layout: cid=<cell>/batch=<n>/ — cid is the prune axis, batch
    # the upsert unit
    cids = [d for d in os.listdir(fresh_index) if d.startswith("cid=")]
    assert cids
    inner = os.listdir(os.path.join(fresh_index, cids[0]))
    assert any(d.startswith("batch=") for d in inner), inner
