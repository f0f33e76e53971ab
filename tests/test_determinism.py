"""Partition-invariance: the engine's sampling / ordering / dedup ops
derive every decision from content hashes, never from partitioning or
RNG state — so results must be IDENTICAL under different shuffle
parallelism.  This is the reproducibility contract a training-data
pipeline needs (the same corpus on 1 core or 1000 executors)."""

from __future__ import annotations

import pytest

from columnflow_spark.queries import all_queries

_INVARIANT_QUERIES = [
    "stratified_sample",
    "weighted_sample_aes",
    "sample_k_per_group",
    "training_shuffle_shards",
    "dedup_minhash_lsh",
    "dedup_bloom_prefilter",
    "cms_heavy_hitters",
    "ann_pq_codes",
    "dsir_resample",
    "bpe_train_merges",
    "skew_salted_topk_values",
    "embedding_pca_project",
]


@pytest.mark.parametrize("name", _INVARIANT_QUERIES)
def test_partition_invariance(name, spark, sf_dir):
    q = all_queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(tuple, q(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = sorted(map(tuple, q(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name} changed under different shuffle parallelism"


def test_logreg_training_partition_invariance(spark, sf_dir):
    # training sums are partial-aggregated, so the trained weights differ
    # at ulp level across parallelism — the round-4 published model must
    # not.  The per-corpus weight memo is cleared so training re-runs.
    from columnflow_spark.queries import mmdata

    q = all_queries()["ml_logreg_fit"]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        mmdata._LOGREG_W_CACHE.clear()
        a = sorted(map(tuple, q(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        mmdata._LOGREG_W_CACHE.clear()
        b = sorted(map(tuple, q(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        mmdata._LOGREG_W_CACHE.clear()
    assert a == b, "published logreg model changed under different shuffle parallelism"
