"""Snapshot delta detection for incremental corpus maintenance.

Given two snapshots of a keyed table and a content fingerprint column,
classify every key as added / removed / changed / unchanged — the
decision input for incremental re-processing (only added+changed rows
re-enter dedup/tokenize/index stages; removed keys tombstone their index
entries).  One full-outer join on the key: at 100 TB both sides shuffle
once on the key (or co-located bucketed snapshots skip even that)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str], fingerprint: str
) -> DataFrame:
    """Returns ``key_cols + change_type`` with change_type in
    added | removed | changed | unchanged."""
    o = old.select(*key_cols, F.col(fingerprint).alias("_fp_old"))
    n = new.select(*key_cols, F.col(fingerprint).alias("_fp_new"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, change.alias("change_type"))
