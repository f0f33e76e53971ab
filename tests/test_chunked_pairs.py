"""Exact chunk-pair self-join (VERDICT r5 next #2): SemDeDup's
within-cluster pair join must survive a degenerate giant cluster
(boilerplate-heavy corpus — the exact case SemDeDup exists for) WITHOUT
dropping pairs, because its oracle contract is exact.

functions.similarity.chunked_self_pairs splits an oversized key into
m = ceil(size/cap) hash chunks and meets pair (x, y) at exactly the
chunk-pair task (c(x), c(y)) — per-task candidate volume is bounded by
cap² while EVERY pair is still emitted (unlike salt_oversized_buckets,
which trades cross-chunk pairs for LSH recall-by-other-bands).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnflow_spark.functions.similarity import chunked_self_pairs


def _frame(spark, n_giant=500, n_tail=60):
    # one degenerate cluster (cid 0) + a healthy tail of small clusters
    giant = spark.range(n_giant).select(
        F.lit(0).cast("long").alias("cid"),
        F.col("id").alias("vec_id"),
        (F.col("id") * 3 % 17).cast("long").alias("payload"),
    )
    tail = spark.range(n_giant, n_giant + n_tail).select(
        (1 + F.col("id") % 7).cast("long").alias("cid"),
        F.col("id").alias("vec_id"),
        (F.col("id") * 3 % 17).cast("long").alias("payload"),
    )
    return giant.unionAll(tail)


def _plain_pairs(df):
    a, b = df.alias("a"), df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.cid").alias("cid"),
            F.col("a.vec_id").alias("vec_id"),
            F.col("a.payload").alias("payload"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.col("b.payload").alias("payload_b"),
        )
    )


def test_exactness_every_pair_emitted_once(spark):
    df = _frame(spark)
    plain = _plain_pairs(df)
    for cap in (8, 50, 10**9):
        chunked = chunked_self_pairs(df, "cid", "vec_id", cap=cap).select(plain.columns)
        assert chunked.exceptAll(plain).count() == 0, cap
        assert plain.exceptAll(chunked).count() == 0, cap


def test_cap_invariance(spark):
    # the n-chunk choice must never show in the result: two different
    # caps over the same frame produce the identical pair set
    df = _frame(spark)
    p1 = chunked_self_pairs(df, "cid", "vec_id", cap=7)
    p2 = chunked_self_pairs(df, "cid", "vec_id", cap=33)
    assert p1.exceptAll(p2).count() == 0
    assert p2.exceptAll(p1).count() == 0


def test_degenerate_cluster_task_volume_bounded(spark):
    # the guard's whole point: no chunk-pair task generates more than
    # ~cap² candidates even when one cluster holds every row.  This FAILS
    # on the unguarded cid-keyed self-join (one task carries all
    # n*(n-1)/2 pairs).
    n, cap = 500, 32
    df = _frame(spark, n_giant=n, n_tail=0)
    per_task = (
        chunked_self_pairs(df, "cid", "vec_id", cap=cap, keep_chunks=True)
        .groupBy("cid", "_ca", "_cb")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .agg(F.max("n_pairs").alias("mx"), F.count(F.lit(1)).alias("n_tasks"))
        .collect()[0]
    )
    # hash chunking is ~uniform: allow 4x slack over the ideal cap² bound
    assert per_task.mx <= 4 * cap * cap
    assert per_task.n_tasks > 1  # the join IS split, not one straggler
    # total volume is still every pair exactly once
    assert (
        chunked_self_pairs(df, "cid", "vec_id", cap=cap).count() == n * (n - 1) // 2
    )


def test_healthy_clusters_zero_replication(spark):
    # keys at or under the cap keep m = 1: no replicated rows enter the
    # join (the left side row count equals the input row count)
    df = _frame(spark, n_giant=0, n_tail=60)
    pairs = chunked_self_pairs(df, "cid", "vec_id", cap=64, keep_chunks=True)
    assert pairs.filter((F.col("_ca") != 0) | (F.col("_cb") != 0)).count() == 0


def test_deterministic_under_repartition(spark):
    df = _frame(spark)
    p1 = chunked_self_pairs(df, "cid", "vec_id", cap=16)
    p2 = chunked_self_pairs(df.repartition(13), "cid", "vec_id", cap=16)
    assert p1.exceptAll(p2).count() == 0
    assert p2.exceptAll(p1).count() == 0


@pytest.mark.slow
def test_randomized_equivalence_to_brute_force(spark):
    # seeded randomized sweep: random key skew patterns x random caps
    # must always reproduce the brute-force pair set exactly
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(50, 300)
        n_keys = rng.choice([1, 3, 10])
        rows = [
            (rng.randrange(n_keys), i, rng.randrange(1000)) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "cid long, vec_id long, payload long")
        plain = _plain_pairs(df)
        cap = rng.choice([2, 17, 64])
        chunked = chunked_self_pairs(df, "cid", "vec_id", cap=cap).select(plain.columns)
        assert chunked.exceptAll(plain).count() == 0, (trial, n, n_keys, cap)
        assert plain.exceptAll(chunked).count() == 0, (trial, n, n_keys, cap)
