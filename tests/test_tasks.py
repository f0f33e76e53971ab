"""Task-graph orchestration semantics (SURVEY §3.1): content-addressed
store paths, completed-target short-circuit, shift-aware planning
(unaffected stages reuse nominal outputs)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from columnflow_spark.plans.shifts import Shift
from columnflow_spark.tasks import (
    BuildEvents,
    CreateHistograms,
    TaskContext,
    run_pipeline,
)


def _hist_total(spark, path):
    return spark.read.parquet(path).agg(F.sum("sum_w")).first()[0]


def _hist_cells(spark, path):
    return {
        (r["category"], r["bin__ht"]): r["sum_w"] for r in spark.read.parquet(path).collect()
    }


def test_pipeline_end_to_end_and_idempotent(spark, sf_dir, tmp_path):
    ctx = TaskContext(spark=spark, sf_dir=sf_dir, store=str(tmp_path))
    out = run_pipeline(CreateHistograms(), ctx)
    # every stage materialized under its store-parts path
    for stage in ("events", "calib", "select", "reduce", "produce", "hist"):
        assert os.path.exists(os.path.join(str(tmp_path), stage, "shift_nominal", "v1", "_SUCCESS"))
    assert _hist_total(spark, out) > 0
    # re-run: completed targets short-circuit (no rewrite -> mtimes stable)
    marker = os.path.join(str(tmp_path), "events", "shift_nominal", "v1", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    out2 = run_pipeline(CreateHistograms(), ctx)
    assert out2 == out
    assert os.path.getmtime(marker) == mtime


def test_shift_planning_reuses_unaffected_stages(spark, sf_dir, tmp_path):
    store = str(tmp_path)
    nominal_ctx = TaskContext(spark=spark, sf_dir=sf_dir, store=store)
    nominal_out = run_pipeline(CreateHistograms(), nominal_ctx)

    shifted_ctx = TaskContext(spark=spark, sf_dir=sf_dir, store=store, shift=Shift("price_up"))
    shifted_out = run_pipeline(CreateHistograms(), shifted_ctx)
    assert shifted_out != nominal_out

    # the source stage is not affected by the shift -> single materialization
    assert not BuildEvents().affected_by(Shift("price_up"))
    assert os.listdir(os.path.join(store, "events")) == ["shift_nominal"]
    # calibration onward fork per shift
    assert sorted(os.listdir(os.path.join(store, "calib"))) == ["shift_nominal", "shift_price_up"]
    # and the systematic actually moves events across bins (totals are
    # shift-invariant, the per-bin contents are not)
    assert _hist_cells(spark, shifted_out) != _hist_cells(spark, nominal_out)

    # an unknown shift collapses everything onto nominal (shift dedup)
    other_ctx = TaskContext(spark=spark, sf_dir=sf_dir, store=store, shift=Shift("unrelated"))
    assert run_pipeline(CreateHistograms(), other_ctx) == nominal_out
