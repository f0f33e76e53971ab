"""Accuracy characterization for approximate operators (no SQL twin)."""

from __future__ import annotations

import pytest
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


def test_translate_intcat_to_strcat(spark):
    from columnflow_spark.hist.fill import translate_intcat_to_strcat

    h = spark.createDataFrame(
        [(1, 0, 5, 5.0, 5.0), (2, 0, 3, 3.0, 3.0), (9, 1, 1, 1.0, 1.0)],
        "category int, bin__x int, n bigint, sum_w double, sum_w2 double",
    )
    out = translate_intcat_to_strcat(h, "category", {1: "signal", 2: "background"})
    got = {r.category: r.n for r in out.collect()}
    assert got == {"signal": 5, "background": 3, "9": 1}
    out2 = translate_intcat_to_strcat(h, "category", {1: "signal"}, default="other")
    assert {r.category for r in out2.collect()} == {"signal", "other"}


@pytest.mark.slow
def test_add_missing_shifts(spark):
    from columnflow_spark.hist.fill import add_missing_shifts

    h = spark.createDataFrame(
        [("nominal", 0, 10, 10.0, 10.0), ("price_up", 0, 12, 12.0, 12.0)],
        "shift string, bin__x int, n bigint, sum_w double, sum_w2 double",
    )
    out = add_missing_shifts(h, ["nominal", "price_up", "price_down"])
    rows = {(r.shift, r.bin__x): r.n for r in out.collect()}
    # the absent shift got nominal's contents; present shifts untouched
    assert rows[("price_down", 0)] == 10 and rows[("price_up", 0)] == 12
    assert add_missing_shifts(out, ["nominal", "price_up", "price_down"]).count() == 3


def test_approx_percentiles_accuracy(spark, sf_dir):
    # the sketch must track the exact per-group percentiles closely at the
    # configured accuracy (10k): compare to percentile() exact
    from columnflow_spark.queries import all_queries
    from columnflow_spark.sources import load_table
    from pyspark.sql import functions as F

    approx = {r.event_type: (r.p50, r.p90, r.p99)
              for r in all_queries()["approx_value_percentiles"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "value"])
    # ground truth of the SAME definition (discrete order statistic):
    # percentile_approx at max accuracy is exact; interpolating
    # percentile() answers a different question on thin-tailed groups
    exact = {
        r.event_type: [round(v, 4) for v in r.pcts]
        for r in ev.groupBy("event_type").agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], 2147483647).alias("pcts")
        ).collect()
    }
    assert set(approx) == set(exact)
    for et, got in approx.items():
        spread = max(abs(exact[et][2]), 1.0)
        for a, e in zip(got, exact[et]):
            assert abs(a - e) <= 0.02 * spread, (et, a, e)


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """A Bloom filter may over-approximate but NEVER under-approximate:
    every incoming doc whose exact fingerprint exists in the index side
    must be flagged maybe_dup."""
    from pyspark.sql import functions as F

    from columnflow_spark.functions.text import fingerprint
    from columnflow_spark.queries import all_queries
    from columnflow_spark.sources import load_table

    flagged = {
        r.doc_id: r.maybe_dup
        for r in all_queries()["dedup_bloom_prefilter"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"]).select(
        "doc_id", "source", fingerprint(F.col("text")).alias("f")
    )
    idx = {r.f for r in docs.filter(F.col("source") != "src0").collect()}
    true_dups = [r.doc_id for r in docs.filter(F.col("source") == "src0").collect() if r.f in idx]
    missed = [d for d in true_dups if not flagged.get(d)]
    assert not missed, f"bloom false negatives: {missed[:5]}"
    # and the filter is selective: flagged set should not be everything
    assert sum(flagged.values()) < len(flagged)


def test_cms_overestimates_only_and_finds_heavy_hitters(spark, sf_dir):
    """Count-Min property: every estimate >= the true count (min over d
    counters can only overestimate via collisions, never under); and the
    top estimated tokens are the true heavy hitters."""
    from pyspark.sql import functions as F

    from columnflow_spark.functions.text import tokens
    from columnflow_spark.queries import all_queries
    from columnflow_spark.sources import load_table

    est = {r.tok: r.est_count for r in all_queries()["cms_heavy_hitters"](spark, sf_dir).collect()}
    true_counts = {
        r.tok: r.n
        for r in load_table(spark, sf_dir, "documents", columns=["text"])
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert est, "empty CMS output"
    assert all(est[t] >= true_counts[t] for t in est), {
        t: (est[t], true_counts[t]) for t in est if est[t] < true_counts[t]
    }
    # the true top-5 tokens must all appear in the estimated top-15
    top5_true = sorted(true_counts, key=lambda t: (-true_counts[t], t))[:5]
    assert set(top5_true) <= set(est)


def test_kmeans_fit_converges_and_is_deterministic(spark, sf_dir):
    """Full k-means training loop (the IVF index builder): centroid
    movement shrinks across iterations, clusters stay populated, and two
    runs produce bit-identical centroids (no RNG, no partition order)."""
    from columnflow_spark.functions.similarity import kmeans_fit
    from columnflow_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    c1, info1 = kmeans_fit(emb, k=8, iters=4)
    c2, info2 = kmeans_fit(emb, k=8, iters=4)
    assert info1["iters"] >= 1
    assert len(c1) == 8
    # every cluster keeps members on this corpus
    assert all(n > 0 for n in info1["n_per_cluster"])
    # shift after several iterations is small (converging, not bouncing)
    assert info1["shift"] < 0.5
    assert c1 == c2 and info1 == info2


def test_kmv_estimate_accuracy_and_merge(spark, sf_dir):
    """KMV contract: the estimate lands within the sketch's standard
    error envelope (~1/sqrt(k-1) ~ 12.7% at k=64; assert 4 sigma), and
    the incremental store's merged sketch is IDENTICAL to the one-pass
    sketch (mergeability is exact, not approximate)."""
    from columnflow_spark.queries import all_queries

    qs = all_queries()
    est = {r.event_type: r for r in qs["kmv_distinct_sketch"](spark, sf_dir).collect()}
    truth = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events", columns=["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(truth)
    for t, r in est.items():
        if r.k_used < 64:
            assert r.est_q == truth[t], (t, r.est_q, truth[t])
        else:
            rel = abs(r.est_q - truth[t]) / truth[t]
            assert rel < 4 / (64 - 1) ** 0.5, (t, r.est_q, truth[t], rel)
    inc = sorted(map(tuple, qs["kmv_incremental_sketch"](spark, sf_dir).collect()))
    one = sorted(map(tuple, qs["kmv_distinct_sketch"](spark, sf_dir).collect()))
    assert inc == one


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    """The 5-95% Poisson-bootstrap interval must bracket the full-data
    mean for every group (32 replicas of a large group concentrate
    tightly around it), and be non-degenerate (lo < hi)."""
    from columnflow_spark.queries import all_queries

    rows = all_queries()["bootstrap_mean_ci"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lo_q <= r.mean_q <= r.hi_q, tuple(r)
        assert r.lo_q < r.hi_q, tuple(r)
