"""Plan-quality regression tests: the engine's value at 100 TB is that
filters and projections reach the parquet scan and small dimensions
broadcast — assert it on the compiled plans so a refactor that silently
breaks pushdown fails CI, not the cluster bill."""

from __future__ import annotations

import contextlib
import io
import os

from columnflow_spark.queries import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    # inspect the raw compiled plan, not the in-session nested-events cache
    os.environ["SPARK_GRAFT_CACHE_NESTED"] = "0"
    try:
        df = all_queries()[name](spark, sf_dir)
    finally:
        os.environ.pop("SPARK_GRAFT_CACHE_NESTED", None)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "PushedFilters: [" in plan
    # the date filter must be in the scan, not a post-scan Filter only
    assert "GreaterThan(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # lineitem has 16 columns; the scan must read only the used ones
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas
    assert all("l_comment" not in l and "l_shipinstruct" not in l for l in read_schemas)


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_staged_chain_prunes_nested_schema(spark, sf_dir):
    # the stage planner's used-column union must keep the lineitem scan
    # narrow even through the collection build + operator chain
    plan = _plan(spark, sf_dir, "pipeline_reduced_features")
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas
    assert all("l_comment" not in l for l in read_schemas)


def test_no_cartesian_products(spark, sf_dir):
    for name in ("dedup_minhash_lsh", "ann_ivf_topk", "delta_r_match_relational"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
