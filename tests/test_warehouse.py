"""Warehouse ops: deletion-neighborhood completeness edge cases and SCD2
chaining invariants.  Full-data correctness is pinned by the registered
DuckDB oracles (fuzzy_join_names brute-forces the cross join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnflow_spark.queries import all_queries
from columnflow_spark.queries.warehouse import fuzzy_pairs_ed1


def test_fuzzy_pairs_edge_cases(spark):
    rows = [
        (1, "abc"),   # base
        (2, "abd"),   # substitution of 1
        (3, "abcd"),  # insertion into 1
        (4, "ab"),    # deletion from 1
        (5, "ba"),    # transposition of 4: lev 2, must NOT match 4
        (6, "x"),     # single char
        (7, ""),      # empty: lev 1 from any single char
        (8, "zzz"),   # isolated
    ]
    names = spark.createDataFrame(rows, "k LONG, n STRING")
    got = {
        (r.k1, r.k2) for r in fuzzy_pairs_ed1(names, "k", "n").collect()
    }
    want = {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (6, 7)}
    # (2,3): abd vs abcd IS lev 1 (insert c); (2,4): abd vs ab IS lev 1
    # (delete d); (4,5) excluded (transposition = lev 2)
    assert got == want, got


def test_fuzzy_pairs_equals_bruteforce_random(spark):
    """Seeded random corpus vs a pure-python Levenshtein brute force: the
    neighborhood join must return EXACTLY the lev<=1 pairs."""
    import itertools
    import random

    rng = random.Random(20260814)
    strings = list(
        {
            "".join(rng.choice("abc") for _ in range(rng.randint(0, 5)))
            for _ in range(80)
        }
    )
    rows = list(enumerate(sorted(strings)))

    def lev(s, t):
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= 1
    }
    names = spark.createDataFrame(rows, "k LONG, n STRING")
    got = {(r.k1, r.k2) for r in fuzzy_pairs_ed1(names, "k", "n").collect()}
    assert got == want


def test_streaming_scd2_matches_batch_current(spark, sf_dir):
    """The incremental CDC fold's at-rest state must equal the is_current
    rows of the one-shot SCD2 build — the same batch≡stream equality
    contract as the dedup store ingest."""
    batch_cur = sorted(
        (r.c_custkey, r.version, r.bal_c, r.valid_from)
        for r in all_queries()["scd2_customer_history"](spark, sf_dir)
        .filter("is_current")
        .collect()
    )
    stream_cur = sorted(
        (r.c_custkey, r.version, r.bal_c, r.valid_from)
        for r in all_queries()["streaming_scd2_apply"](spark, sf_dir).collect()
    )
    assert stream_cur == batch_cur


def test_scd2_chaining_invariants(spark, sf_dir):
    df = all_queries()["scd2_customer_history"](spark, sf_dir)
    # exactly one current row per customer
    cur = df.groupBy("c_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    bad = cur.filter(F.col("n_cur") != 1).count()
    assert bad == 0
    # valid_to of version v equals valid_from of version v+1, and only the
    # last version has a null valid_to
    a = df.select("c_custkey", "version", "valid_to")
    b = df.select(
        "c_custkey", (F.col("version") - 1).alias("version"),
        F.col("valid_from").alias("next_from"),
    )
    joined = a.join(b, ["c_custkey", "version"], "left")
    mismatched = joined.filter(
        (F.col("next_from").isNull() & F.col("valid_to").isNotNull())
        | (F.col("next_from").isNotNull() & (F.col("valid_to") != F.col("next_from")))
    ).count()
    assert mismatched == 0
