"""Hot-key (skew) mitigation helpers for big-big shapes AQE cannot split.

AQE's skew-join handling only re-plans sort-merge join partitions; two
shapes still serialize on a hot key at 100 TB and need explicit salting:

- per-key windows (top-k per key): ``Window.partitionBy(key)`` puts every
  row of a hot key into ONE task.  :func:`salted_topk` runs the window
  twice — first over (key, salt) so the hot key spreads across ``n_salt``
  tasks, then over the <= n_salt * k survivors — top-k is reduction-safe,
  so the result is identical to the unsalted window.
- broadcast-ineligible equi-joins against a replicable side:
  :func:`salted_join` salts the big side with a deterministic row hash
  and explodes the other side times ``n_salt``, so the hot key's rows
  land on ``n_salt`` reducers instead of one.

Both salts are pure projections of existing columns (no rand()): results
are deterministic and partition-invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_src: Column, n_salt: int) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, n_salt) from ``salt_src``
    (pick a high-cardinality column uncorrelated with the hot key)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salt)))


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    k: int,
    salt_src: Column,
    n_salt: int = 32,
) -> DataFrame:
    """Top-k rows per key via two windows: (keys + salt) then keys.

    Phase 1 keeps k rows per (key, salt) — a superset of the global
    top-k, since dropping below rank k within any salt cannot evict a
    global top-k row.  Phase 2 ranks the <= n_salt * k survivors per key.
    Returns the input columns plus ``rk`` (1-based final rank)."""
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order_cols)
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    p1 = (
        with_salt(df, salt_src, n_salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_rk1", "_salt")
    )
    return p1.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= k)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_src: Column,
    n_salt: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``n_salt`` times, so a hot join key spreads over ``n_salt`` reducers.

    ``small`` here means "replicable" (a dimension too big to broadcast
    but fine to shuffle x n_salt), the standard skew-join shape.

    Only join types that preserve each small-side row at most once per
    match are allowed: right/full-outer would emit one null-padded copy
    of an unmatched small row PER SALT."""
    canonical = how.lower().replace("_", "")
    if canonical not in ("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    b = with_salt(big, salt_src, n_salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return b.join(s, [*on, "_salt"], how).drop("_salt")
