"""Salted hot-key helpers must be semantics-neutral: identical results to
the unsalted forms on a deliberately skewed input."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from columnflow_spark.functions.skew import salted_join, salted_topk


def _skewed(spark):
    # 2000 rows, 90% on key 0 (the hot key), deterministic values
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") * 37 % 1001).alias("v"),
    )


def test_salted_topk_matches_plain_window(spark):
    df = _skewed(spark)
    plain = (
        df.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("k").orderBy(F.desc("v"), F.asc("rid"))),
        )
        .filter(F.col("rk") <= 5)
        .select("k", "rk", "rid", "v")
    )
    salted = salted_topk(
        df, keys=["k"], order_cols=[F.desc("v"), F.asc("rid")], k=5,
        salt_src=F.col("rid"), n_salt=8,
    ).select("k", "rk", "rid", "v")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_topk_small_groups_survive(spark):
    # a key with fewer than k rows must keep all of them
    df = _skewed(spark).filter((F.col("k") == 0) | (F.col("rid") == 9))
    out = salted_topk(
        df, keys=["k"], order_cols=[F.desc("v")], k=5, salt_src=F.col("rid"), n_salt=8
    )
    ks = {r.k: r for r in out.collect() if r.k != 0}
    assert len(ks) == 1  # the singleton key survived with rank 1


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    dim = spark.range(7).select(F.col("id").alias("k"), (F.col("id") * 100).alias("label"))
    plain = big.join(dim, "k").select("k", "rid", "v", "label")
    salted = salted_join(big, dim, on=["k"], salt_src=F.col("rid"), n_salt=8).select(
        "k", "rid", "v", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = _skewed(spark).withColumn("k", F.col("k") + 100)  # no matches
    dim = spark.range(7).select(F.col("id").alias("k"), F.lit("x").alias("label"))
    out = salted_join(big, dim, on=["k"], salt_src=F.col("rid"), n_salt=4, how="left")
    assert out.count() == 2000
    assert out.filter(F.col("label").isNotNull()).count() == 0


def test_salted_topk_invariant_in_n_salt(spark):
    # the salt factor is a physical knob: any n_salt must give the same rows
    df = _skewed(spark)
    results = []
    for n_salt in (1, 3, 16):
        out = salted_topk(
            df, keys=["k"], order_cols=[F.desc("v"), F.asc("rid")], k=4,
            salt_src=F.col("rid"), n_salt=n_salt,
        ).select("k", "rk", "rid", "v")
        results.append(sorted(map(tuple, out.collect())))
    assert results[0] == results[1] == results[2]


def test_salted_join_invariant_in_n_salt(spark):
    big = _skewed(spark)
    dim = spark.range(7).select(F.col("id").alias("k"), (F.col("id") + 7).alias("lab"))
    results = []
    for n_salt in (1, 5, 32):
        out = salted_join(big, dim, on=["k"], salt_src=F.col("rid"), n_salt=n_salt)
        results.append(sorted(map(tuple, out.select("k", "rid", "v", "lab").collect())))
    assert results[0] == results[1] == results[2]
