"""Accuracy characterization for approximate operators (no SQL twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnflow_spark.queries import all_queries
from columnflow_spark.sources import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, sf_dir, "events", columns=["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(2, 0.05 * e), (k, approx[k], e)


def test_connected_components_paths_agree(spark, sf_dir):
    """The driver union-find fast path and the distributed min-label
    propagation loop must produce identical components."""
    import os

    from columnflow_spark.queries import all_queries

    fn = all_queries()["dedup_connected_components"]
    driver = {(r.doc_id, r.component) for r in fn(spark, sf_dir).collect()}
    os.environ["SPARK_GRAFT_CC_DISTRIBUTED"] = "1"
    try:
        loop = {(r.doc_id, r.component) for r in fn(spark, sf_dir).collect()}
    finally:
        os.environ.pop("SPARK_GRAFT_CC_DISTRIBUTED", None)
    assert driver == loop
    assert len(driver) > 0
