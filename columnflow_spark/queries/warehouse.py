"""Warehouse data-integration ops: record-linkage fuzzy join and SCD2
(slowly-changing-dimension type 2) history building.

Record linkage (same entity, slightly different spellings) is the join
nobody can run naively at scale: levenshtein is not an equi-join key, and
a cross join is |R|×|S|.  The scalable shape is filter-verify: generate
each string's DELETION NEIGHBORHOOD (the string plus every
one-character-deleted variant — ~|s|+1 rows), equi-join on the variant
(two strings within edit distance 1 always share a neighborhood entry),
then verify candidates with the exact levenshtein.  Candidate volume is
data-sized × name length, never quadratic; the oracle brute-forces the
same bounded subset to prove the neighborhood join loses nothing.

SCD2 turns a change stream into versioned dimension rows
(valid_from / valid_to / is_current) — the CDC-apply shape every
warehouse maintains.  Pure window arithmetic on integer cents: one
shuffle on the dimension key, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from columnflow_spark.queries import query
from columnflow_spark.sources import load_table

#: linkage subset bound: keeps the ORACLE's brute-force cross join
#: tractable at sf1 (5000² comparisons); the engine-side neighborhood
#: join needs no such bound — it is the 100 TB path
_FUZZY_MAX_KEY = 5000


@query(
    "fuzzy_join_names",
    oracle=f"""
    WITH sub AS MATERIALIZED (
        SELECT c_custkey, c_name FROM customer WHERE c_custkey < {_FUZZY_MAX_KEY}
    )
    SELECT a.c_custkey AS k1, b.c_custkey AS k2,
           a.c_name AS n1, b.c_name AS n2
    FROM sub a JOIN sub b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY k1, k2
    """,
)
def fuzzy_join_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs whose names are within edit distance 1, via the
    deletion-neighborhood candidate join + exact levenshtein verify.

    Plan shape: one explode (|s|+1 variants per name), one equi-join on
    the variant string (shuffle sized by candidate volume, AQE-managed),
    a distinct to collapse multi-variant matches, and an in-row
    levenshtein verify — no cross join anywhere (the oracle IS the cross
    join, on the bounded subset, proving the neighborhood loses no pair).
    """
    names = (
        load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
        .filter(F.col("c_custkey") < _FUZZY_MAX_KEY)
    )
    return fuzzy_pairs_ed1(names, "c_custkey", "c_name").orderBy("k1", "k2")


def fuzzy_pairs_ed1(names: DataFrame, key: str, name: str) -> DataFrame:
    """All pairs ``(k1, k2, n1, n2)`` with ``levenshtein(n1, n2) <= 1`` and
    k1 < k2, via the deletion-neighborhood candidate join + exact verify."""
    # s itself + every one-char-deleted variant: any two strings with
    # lev <= 1 share at least one entry
    variants = names.select(
        key,
        name,
        F.explode(
            F.concat(
                F.array(F.col(name)),
                # guard: sequence(1, 0) DESCENDS in Spark, so an empty
                # string must contribute no deletion variants explicitly
                F.when(
                    F.length(name) > 0,
                    F.transform(
                        F.sequence(F.lit(1), F.length(name)),
                        lambda i: F.concat(
                            F.substring(F.col(name), F.lit(1), i - 1),
                            F.col(name).substr(i + 1, F.length(name)),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("v"),
    )
    a = variants.select(F.col(key).alias("k1"), F.col(name).alias("n1"), "v")
    b = variants.select(F.col(key).alias("k2"), F.col(name).alias("n2"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("k1") < F.col("k2"))
        .select("k1", "k2", "n1", "n2")
        .distinct()
    )
    return cand.filter(F.levenshtein("n1", "n2") <= 1).select("k1", "k2", "n1", "n2")


@query(
    "scd2_customer_history",
    oracle="""
    WITH deltas AS MATERIALIZED (
        SELECT o_custkey AS c_custkey, o_orderdate AS valid_from,
               CAST(round(o_totalprice * 100) AS BIGINT) AS delta_c,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS version
        FROM orders
    ),
    seeded AS MATERIALIZED (
        SELECT c.c_custkey, CAST(0 AS INT) AS version,
               TIMESTAMP '1990-01-01' AS valid_from,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS delta_c
        FROM customer c
        UNION ALL
        SELECT c_custkey, CAST(version AS INT), valid_from, delta_c FROM deltas
    )
    SELECT c_custkey, version,
           CAST(sum(delta_c) OVER (
               PARTITION BY c_custkey ORDER BY version
           ) AS BIGINT) AS bal_c,
           valid_from,
           lead(valid_from) OVER (
               PARTITION BY c_custkey ORDER BY version
           ) AS valid_to,
           lead(valid_from) OVER (
               PARTITION BY c_custkey ORDER BY version
           ) IS NULL AS is_current
    FROM seeded
    ORDER BY c_custkey, version
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 balance history per customer: the seed dimension row plus one
    version per order (each order's price applied as an integer-cent
    delta), with valid_from/valid_to chaining and an is_current flag.

    One shuffle on the dimension key serves the version numbering, the
    running balance, and the validity chaining (three window functions
    over the same partitioning — Spark evaluates them in one exchange);
    deltas are exact BIGINT cents so the running sum is engine-order-proof.
    """
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    vwin = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    deltas = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").alias("valid_from"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("delta_c"),
        F.row_number().over(vwin).cast("int").alias("version"),
    )
    seed = cust.select(
        "c_custkey",
        F.lit(0).cast("int").alias("version"),
        F.lit("1990-01-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("delta_c"),
    )
    hist = seed.unionByName(deltas.select("c_custkey", "version", "valid_from", "delta_c"))
    hwin = W.partitionBy("c_custkey").orderBy("version")
    return (
        hist.select(
            "c_custkey",
            "version",
            F.sum("delta_c").over(hwin).cast("long").alias("bal_c"),
            "valid_from",
            F.lead("valid_from").over(hwin).alias("valid_to"),
            F.lead("valid_from").over(hwin).isNull().alias("is_current"),
        )
        .orderBy("c_custkey", "version")
    )


# --- incremental materialized-aggregate maintenance: the append-only
# warehouse pattern where a per-key aggregate table is maintained by
# MERGING the standing partial state with a delta batch's partials
# instead of recomputing over all history.  Correct exactly when every
# measure is a commutative monoid (count/sum/min/max here; avg derived
# after the merge, never merged itself).  The engine computes
# merge(partial(base), partial(delta)); the ORACLE is the full recompute
# over the union — hash equality IS the maintenance-correctness proof.
_INC_SPLIT_DATE = "1997-06-01"


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT o_custkey AS c_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order,
           CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                // count(*) AS BIGINT) AS avg_c
    FROM orders
    GROUP BY o_custkey
    ORDER BY c_custkey
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order aggregates maintained incrementally: monoid
    partials over the BASE slice (orders before the split date — the
    standing materialized state) merged with partials over the DELTA
    slice (the new batch), then derived measures (integer-cent average)
    computed from the merged monoid state.

    Scale notes: this is the shape that makes a 100 TB aggregate table
    maintainable — the base partials are a persisted key-grain table read
    back (narrow rows, never re-scanning history), and each ingest batch
    contributes its own partial aggregation (map-side combined) before a
    key-grain merge shuffle bounded by |keys touched|, not |history|.
    Min/max/count/sum all merge associatively; the average is derived
    AFTER the merge with exact integer division, so maintenance can never
    drift from the recompute (the oracle proves it: full recompute over
    the union, hash-equal).  Both slices here prune on the split
    predicate at the parquet scan (date filter pushdown).
    """
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    split = F.lit(_INC_SPLIT_DATE).cast("timestamp_ntz")

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("total_c"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    base = _partial(orders.filter(F.col("o_orderdate") < split))
    delta = _partial(orders.filter(F.col("o_orderdate") >= split))
    merged = (
        base.unionByName(delta)
        .groupBy("c_custkey")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("total_c").cast("long").alias("total_c"),
            F.min("first_order").alias("first_order"),
            F.max("last_order").alias("last_order"),
        )
    )
    return merged.select(
        "c_custkey",
        "n_orders",
        "total_c",
        "first_order",
        "last_order",
        F.expr("CAST(total_c div n_orders AS BIGINT)").alias("avg_c"),
    ).orderBy("c_custkey")
