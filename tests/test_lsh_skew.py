"""Bucket-skew guard for LSH-family self-joins (VERDICT r2 "What's wrong"
#3): a degenerate band key — boilerplate-heavy corpus, thousands of
identical docs — must not turn one bucket into an O(n²) straggler task.

The guard (functions.similarity.salt_oversized_buckets) salt-chunks
buckets above the cap, bounding candidates to O(n·cap) while keeping
every member of a degenerate cluster connected; buckets at or under the
cap pair exactly, so non-degenerate corpora (all test SFs) are
bit-identical with the unguarded plan — the DuckDB oracles for
dedup_minhash_lsh / dedup_simhash pin that side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from columnflow_spark.functions.similarity import (
    bucketed_candidate_pairs,
    salt_oversized_buckets,
    simhash64,
)


def _adversarial_banded(spark, n_dup=1000, n_normal=10):
    # one boilerplate cluster sharing a single band key + a healthy tail
    dup = spark.range(n_dup).select(F.col("id").alias("doc_id"), F.lit(42).cast("long").alias("bk"))
    tail = spark.range(n_dup, n_dup + n_normal).select(
        F.col("id").alias("doc_id"), (F.col("id") * 1000).cast("long").alias("bk")
    )
    return dup.unionAll(tail)


def test_degenerate_bucket_candidates_bounded(spark):
    n_dup, cap = 1000, 32
    banded = _adversarial_banded(spark, n_dup=n_dup)
    pairs = bucketed_candidate_pairs(banded, ["bk"], cap=cap)
    n_pairs = pairs.count()
    # uncapped would be n_dup*(n_dup-1)/2 = 499500; capped is chunk-local:
    # ceil(n/cap) chunks of at most cap*(cap-1)/2 pairs each = O(n*cap)
    assert 0 < n_pairs <= n_dup * cap
    assert n_pairs < n_dup * (n_dup - 1) // 2 / 10


def test_degenerate_bucket_recall_holds(spark):
    # every member of the boilerplate cluster must still meet at least one
    # chunk-mate — the cluster stays connected for the component solve
    n_dup = 1000
    banded = _adversarial_banded(spark, n_dup=n_dup)
    pairs = bucketed_candidate_pairs(banded, ["bk"], cap=32)
    touched = (
        pairs.select(F.col("d1").alias("doc_id"))
        .unionAll(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    assert touched.filter(F.col("doc_id") < n_dup).count() == n_dup


def test_healthy_buckets_unchanged(spark):
    # buckets at or under the cap pair exactly: guard output == plain
    # self-join output
    banded = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).cast("long").alias("bk")
    )
    guarded = bucketed_candidate_pairs(banded, ["bk"], cap=32)
    a, b = banded.alias("a"), banded.alias("b")
    plain = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
    )
    assert guarded.exceptAll(plain).count() == 0
    assert plain.exceptAll(guarded).count() == 0


def test_salt_is_deterministic_under_repartition(spark):
    banded = _adversarial_banded(spark)
    s1 = salt_oversized_buckets(banded, ["bk"], "doc_id", 32)
    s2 = salt_oversized_buckets(banded.repartition(16), ["bk"], "doc_id", 32)
    assert s1.exceptAll(s2).count() == 0


def test_simhash_bit63_safe(spark):
    # ADVICE r2: a token hash with bit 63 set (e.g. raw xxhash64 negatives)
    # must pack the sign bit, not saturate pow(2,63) and smear all lower
    # bits.  A single all-ones hash (-1) votes +1 on every bit -> the
    # fingerprint must be exactly -1 (all 64 bits), and a single 1 -> 1.
    df = spark.createDataFrame([(-1,), (1,)], "h: long").select(
        F.col("h"), simhash64(F.array(F.col("h"))).alias("sh")
    )
    got = {r.h: r.sh for r in df.collect()}
    assert got[-1] == -1
    assert got[1] == 1
