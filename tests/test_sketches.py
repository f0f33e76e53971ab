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
