"""Sink semantics: recursive field sorting (reference sort_ak_fields,
columnar_util.py:1027), row-group/file targeting (law.cfg:71), partitioned
layout, and size-targeted compaction (tasks/reduction.py:309-327)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from columnflow_spark.sources import load_table
from columnflow_spark.sources.sinks import compact_to_target_size, sort_fields, write_events


def test_sort_fields_recursive(spark):
    df = spark.createDataFrame(
        [(1, {"b": 2, "a": 1}, [{"z": 1.0, "y": 2.0}])],
        "zz int, rec struct<b:int,a:int>, arr array<struct<z:double,y:double>>",
    )
    out = sort_fields(df)
    assert out.columns == ["arr", "rec", "zz"]
    assert [f.name for f in out.schema["rec"].dataType.fields] == ["a", "b"]
    assert [f.name for f in out.schema["arr"].dataType.elementType.fields] == ["y", "z"]
    row = out.collect()[0]
    assert row["rec"]["a"] == 1 and row["rec"]["b"] == 2
    assert row["arr"][0]["y"] == 2.0 and row["arr"][0]["z"] == 1.0


def test_write_events_rows_per_file_and_partitioning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "dataset", F.when(F.col("o_orderkey") % 2 == 0, "even").otherwise("odd")
    )
    path = str(tmp_path / "out")
    write_events(orders, path, partition_by=["dataset"], rows_per_file=500)
    # hive layout exists and is prunable
    assert os.path.isdir(os.path.join(path, "dataset=even"))
    files = glob.glob(os.path.join(path, "dataset=*", "*.parquet"))
    assert files, "no parquet files written"
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # rows_per_file honored: no file exceeds the cap
    for f in files:
        assert spark.read.parquet(f).count() <= 500
    # field order sorted in the written schema
    data_cols = [c for c in back.columns if c != "dataset"]
    assert data_cols == sorted(data_cols)


def test_compact_to_target_size(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(16).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) >= 16
    n = compact_to_target_size(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(os.path.join(dst, "*.parquet"))) == 1
    assert spark.read.parquet(dst).count() == li.count()
