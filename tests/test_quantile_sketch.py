"""Mergeable quantile sketch: accuracy vs exact quantiles, store
mergeability, sketch-grain serve."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from columnflow_spark.queries import all_queries
from columnflow_spark.queries.timeseries import _QSK_K, _QSK_PCTS, _QSK_VSCALE
from columnflow_spark.sources import load_table


def _exact_pct_ranks(spark, sf_dir):
    """Exact per-type value ranks: (event_type, v_q, frac_rank)."""
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "value"])
    hist = ev.groupBy(
        "event_type", F.round(F.col("value") * _QSK_VSCALE, 0).cast("long").alias("v_q")
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = W.partitionBy("event_type").orderBy("v_q")
    return hist.select(
        "event_type",
        "v_q",
        (F.sum("c").over(wcum) / F.sum("c").over(W.partitionBy("event_type"))).alias("fr"),
    ).collect()


def _assert_quantiles_within_sampling_error(spark, sf_dir):
    est = {r.event_type: r for r in all_queries()["quantile_sketch_values"](spark, sf_dir).collect()}
    assert est
    # exact fractional rank of each estimate value
    ranks = _exact_pct_ranks(spark, sf_dir)
    by_type: dict = {}
    for r in ranks:
        by_type.setdefault(r.event_type, []).append((r.v_q, r.fr))
    for etype, row in est.items():
        vals = sorted(by_type[etype])
        for p in _QSK_PCTS:
            v = getattr(row, f"p{p}_q")
            assert v is not None, (etype, p)
            # fractional rank of v = highest fr with v_q <= v
            fr = max((f for vq, f in vals if vq <= v), default=0.0)
            se = (p / 100 * (1 - p / 100) / min(row.k_used, _QSK_K)) ** 0.5
            tol = 3 * se + 0.02
            assert abs(fr - p / 100) <= tol, (etype, p, v, fr, tol)


def test_sketch_quantiles_within_sampling_error(spark, sf_dir):
    """Each p-estimate's EXACT rank in the corpus must sit within the
    bottom-k sample's rank error (3 standard errors + grid slack):
    se = sqrt(p(1-p)/k) ~ 0.031 at the median for k=256."""
    _assert_quantiles_within_sampling_error(spark, sf_dir)


def test_sketch_quantiles_within_sampling_error_sf01(spark):
    """The same O(1/sqrt(k)) rank-error pin at the sf0.1 tier (VERDICT
    r10 next #8): the bound is scale-free — k is fixed, so the estimate
    error must NOT grow with the corpus; a 100x corpus only shrinks the
    grid slack's relative weight."""
    import os

    import pytest

    tier = "/root/testdata/sf0.1"
    if not os.path.isdir(tier):
        pytest.skip("sf0.1 testdata not present")
    _assert_quantiles_within_sampling_error(spark, tier)


def test_incremental_store_matches_one_shot(spark, sf_dir):
    one = sorted(map(tuple, all_queries()["quantile_sketch_values"](spark, sf_dir).collect()))
    inc = sorted(map(tuple, all_queries()["quantile_sketch_incremental"](spark, sf_dir).collect()))
    assert one == inc
    assert one


def test_serve_runs_at_sketch_grain(spark, sf_dir):
    """The store serve's rank windows must sit over the sketch store
    read (batches x types x k rows), never a raw events scan."""
    import contextlib
    import io

    df = all_queries()["quantile_sketch_incremental"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert "events.parquet" not in buf.getvalue()
    # store scan only
    assert tree.count("Scan parquet") <= 1, tree


def test_delete_rebuilds_only_affected_slices(spark, sf_dir, tmp_path):
    """The delete contract is a BOUNDED per-slice rebuild: a delete set
    confined to one ingest slice's id range must rebuild exactly that
    slice (the _slices sidecar proves the routing), leave the others'
    files untouched, and the settled serve must equal the from-scratch
    sketch over the reduced corpus."""
    import glob
    import os

    from columnflow_spark.queries.timeseries import (
        _build_qsk_store,
        _qsk_batch_sample,
        qsk_apply_deletes,
        qsk_request_delete,
        qsk_store_serve,
        qsk_summarize,
    )
    from columnflow_spark.sources import load_table
    from pyspark.sql import functions as F

    path = str(tmp_path / "qsk")
    _build_qsk_store(spark, sf_dir, path)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "batch=*", "*.parquet"))
    }
    # a delete set inside slice 0's range only
    sl = {r.batch: (r.lo, r.hi) for r in spark.read.parquet(os.path.join(path, "_slices")).collect()}
    lo0, hi0 = sl[0]
    ids = (
        load_table(spark, sf_dir, "events", columns=["event_id"])
        .filter((F.col("event_id") >= lo0) & (F.col("event_id") < hi0))
        .filter(F.col("event_id") % 5 == 0)
        .distinct()
    )
    qsk_request_delete(ids, path, batch=0)
    assert qsk_apply_deletes(spark, sf_dir, path) == [0]
    assert not os.path.exists(os.path.join(path, "_deleted"))
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "batch=*", "*.parquet"))
    }
    untouched = {f: t for f, t in before.items() if "batch=0" not in f}
    assert all(after.get(f) == t for f, t in untouched.items())
    # settled serve == from-scratch sketch of the reduced corpus
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    fresh = qsk_summarize(
        _qsk_batch_sample(ev.join(F.broadcast(ids), "event_id", "left_anti"))
    )
    assert sorted(map(tuple, qsk_store_serve(spark, path).collect())) == sorted(
        map(tuple, fresh.collect())
    )
    # idempotent re-delete: requesting the same set again changes nothing
    qsk_request_delete(ids, path, batch=1)
    assert qsk_apply_deletes(spark, sf_dir, path) == [0]
    assert sorted(map(tuple, qsk_store_serve(spark, path).collect())) == sorted(
        map(tuple, fresh.collect())
    )
    # no pending deletes -> no-op
    assert qsk_apply_deletes(spark, sf_dir, path) == []


def test_store_delete_whole_slice_drops_partition(spark, sf_dir, tmp_path):
    """ADVICE r12: a delete set covering an ENTIRE ingest slice rebuilds
    to an empty sample — dynamic partition overwrite writes nothing for
    it, so the stale slice files must be dropped explicitly, or deleted
    rows keep being served after the tombstones clear."""
    import os

    from columnflow_spark.queries.timeseries import (
        _build_qsk_store,
        _qsk_batch_sample,
        qsk_apply_deletes,
        qsk_request_delete,
        qsk_store_serve,
        qsk_summarize,
    )
    from columnflow_spark.sources import load_table
    from pyspark.sql import functions as F

    path = str(tmp_path / "qsk_full")
    _build_qsk_store(spark, sf_dir, path)
    sl = {
        r.batch: (r.lo, r.hi)
        for r in spark.read.parquet(os.path.join(path, "_slices")).collect()
    }
    lo0, hi0 = sl[0]
    ids = (
        load_table(spark, sf_dir, "events", columns=["event_id"])
        .filter((F.col("event_id") >= lo0) & (F.col("event_id") < hi0))
        .distinct()
    )
    qsk_request_delete(ids, path, batch=0)
    assert qsk_apply_deletes(spark, sf_dir, path) == [0]
    # the whole slice was deleted: its partition directory must be gone
    assert not os.path.exists(os.path.join(path, "batch=0"))
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    fresh = qsk_summarize(
        _qsk_batch_sample(ev.join(F.broadcast(ids), "event_id", "left_anti"))
    )
    assert sorted(map(tuple, qsk_store_serve(spark, path).collect())) == sorted(
        map(tuple, fresh.collect())
    )
