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


def test_file_branch_map(spark, sf_dir, tmp_path):
    """LFN-resolution analog (reference tasks/external.py:31): a dataset is
    a list of files; partition = file, per-file branches via
    input_file_name — no custom listing layer needed on Spark."""
    from pyspark.sql import functions as F

    from columnflow_spark.sources import load_table

    out = str(tmp_path / "branched")
    load_table(spark, sf_dir, "orders").repartition(4).write.mode("overwrite").parquet(out)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("lfn"))
        .count()
    )
    rows = per_file.collect()
    assert len(rows) == 4
    assert sum(r["count"] for r in rows) == load_table(spark, sf_dir, "orders").count()


def test_ratio_plot_data(spark, sf_dir):
    from pyspark.sql import functions as F

    from columnflow_spark.hist.axes import Variable
    from columnflow_spark.hist.fill import fill_hist
    from columnflow_spark.plotting import ratio_plot_data
    from columnflow_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    var = Variable("price", "l_extendedprice", (10, 0.0, 110000.0))
    mc = fill_hist(li.filter(F.col("l_returnflag") != "N"), [var])
    data = fill_hist(li.filter(F.col("l_returnflag") == "N"), [var])
    out = {r["bin__price"]: r for r in ratio_plot_data(mc, data, "bin__price").collect()}
    assert out and all(r["rel_unc"] > 0 for r in out.values())
    # a bin's ratio is data/mc for that bin
    some = next(iter(out.values()))
    assert some["ratio"] >= 0.0


def test_csv_json_sources_round_trip(spark, sf_dir, tmp_path):
    # text-format sources carry the same relations: write orders out as
    # CSV and JSON-lines, read back with explicit DDL schemas, and match
    # the parquet original exactly (schema declared -> no inference scan)
    from columnflow_spark.sources import load_csv, load_json

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    ddl = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"

    csv_path = str(tmp_path / "orders_csv")
    orders.write.option("header", "true").csv(csv_path)
    back_csv = load_csv(spark, csv_path, schema=ddl)
    assert back_csv.schema.simpleString() == orders.schema.simpleString()
    assert back_csv.count() == orders.count()
    assert back_csv.agg(F.sum("o_totalprice")).first()[0] == orders.agg(F.sum("o_totalprice")).first()[0]

    json_path = str(tmp_path / "orders_json")
    orders.write.json(json_path)
    back_json = load_json(spark, json_path, schema=ddl)
    assert back_json.schema.simpleString() == orders.schema.simpleString()
    assert back_json.count() == orders.count()
    assert back_json.agg(F.sum("o_orderkey")).first()[0] == orders.agg(F.sum("o_orderkey")).first()[0]


def test_json_lines_sink_round_trip(spark, sf_dir, tmp_path):
    from columnflow_spark.sources import load_json, load_table
    from columnflow_spark.sources.sinks import write_json_lines

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    out = str(tmp_path / "orders_json")
    write_json_lines(orders, out)
    back = load_json(spark, out, "o_orderkey bigint, o_orderstatus string, o_totalprice double")
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_totalprice").alias("s")).first().s
    b = back.agg(F.sum("o_totalprice").alias("s")).first().s
    # each double round-trips JSON text exactly (shortest-repr write);
    # only the SUM's partition order differs after re-read, so compare
    # with a relative tolerance that scales with the corpus
    assert abs(a - b) <= 1e-9 * abs(a)


def test_partitioned_writers_rebalance_file_counts(spark, sf_dir, tmp_path):
    """The two partitioned writers that bypassed write_events in r13 —
    write_json_lines and the datacard shapes export — must cluster rows
    by the partition columns before the write (REBALANCE hint): a
    many-task frame written into few hive partitions must NOT commit one
    near-empty file per (task, partition-value) pair (guide §6)."""
    from columnflow_spark.inference.datacard import export_shapes
    from columnflow_spark.sources.sinks import write_json_lines

    df = (
        spark.range(2000)
        .repartition(32)
        .select(
            F.col("id"),
            F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("category"),
            (F.col("id") % 7).cast("double").alias("sum_w"),
        )
    )
    jpath = str(tmp_path / "json_part")
    write_json_lines(df, jpath, partition_by=["category"])
    jfiles = glob.glob(os.path.join(jpath, "category=*", "part-*"))
    assert jfiles, "no json files written"
    # without the hint this layout commits ~32 files per category (96+)
    assert len(jfiles) <= 3 * 4
    back = spark.read.json(jpath)
    assert back.count() == 2000

    ppath = str(tmp_path / "shapes_part")
    export_shapes(df, ppath)
    pfiles = glob.glob(os.path.join(ppath, "category=*", "*.parquet"))
    assert pfiles, "no parquet files written"
    assert len(pfiles) <= 3 * 4
    assert spark.read.parquet(ppath).count() == 2000


def test_side_output_round_trip(tmp_path):
    from columnflow_spark.sources.sinks import read_side_output, write_side_output

    stats = {"n_events": 1000, "sum_weights": 123.5, "steps": {"met": 900, "jet": 800}}
    p = write_side_output(stats, str(tmp_path / "stats" / "selection_stats.json"))
    assert read_side_output(p) == stats
    # deterministic bytes across re-runs (sorted keys)
    c1 = open(p, "rb").read()
    write_side_output(dict(reversed(list(stats.items()))), p)
    assert open(p, "rb").read() == c1


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    # the dataset=/shift= hive layout is only worth its write cost if a
    # dataset filter prunes partitions at PLANNING time — assert the scan
    # node carries the partition filter and reads one partition's rows
    import contextlib, io

    from columnflow_spark.sources.sinks import write_events

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "dataset", F.when(F.col("o_orderkey") % 2 == 0, "even").otherwise("odd")
    )
    path = str(tmp_path / "store")
    write_events(orders, path, partition_by=["dataset"])
    pruned = spark.read.parquet(path).filter(F.col("dataset") == "even")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "dataset" in plan.split("PartitionFilters")[1].split("]")[0]
    assert pruned.count() == orders.filter(F.col("o_orderkey") % 2 == 0).count()


def test_load_evolving_merges_drifted_schemas(spark, tmp_path):
    # v1 files lack the later-added column; the merged relation exposes
    # the union schema, nulls for old files, sentinel fill on request
    from pyspark.sql import functions as F

    from columnflow_spark.core.routes import EMPTY_FLOAT
    from columnflow_spark.sources.tables import load_evolving

    v1 = spark.range(5).select(F.col("id"), F.lit("a").alias("tag"))
    v2 = spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("tag"), (F.col("id") * 1.5).alias("score")
    )
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    v1.write.parquet(p1)
    v2.write.parquet(p2)
    df = load_evolving(spark, p1, p2, fill={"score": EMPTY_FLOAT})
    assert set(df.columns) == {"id", "tag", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[0].score == EMPTY_FLOAT  # old file: sentinel-filled
    assert rows[6].score == 9.0
    # a column absent everywhere still materializes when required
    df2 = load_evolving(spark, p1, required=["not_yet_written"])
    assert "not_yet_written" in df2.columns
    assert df2.filter(F.col("not_yet_written").isNull()).count() == 5


def test_upsert_partitions_preserves_siblings(spark, sf_dir, tmp_path):
    from columnflow_spark.sources.sinks import upsert_partitions, write_events

    out = str(tmp_path / "store")
    base = spark.range(10).selectExpr(
        "id", "CASE WHEN id < 5 THEN 'ds_a' ELSE 'ds_b' END AS dataset"
    )
    write_events(base, out, partition_by=["dataset"])
    # re-run only ds_a with different content; ds_b must survive intact
    redo = spark.range(100, 103).selectExpr("id", "'ds_a' AS dataset")
    upsert_partitions(redo, out, partition_by=["dataset"])
    got = spark.read.parquet(out)
    a = sorted(r.id for r in got.filter("dataset = 'ds_a'").collect())
    b = sorted(r.id for r in got.filter("dataset = 'ds_b'").collect())
    assert a == [100, 101, 102]
    assert b == [5, 6, 7, 8, 9]
    # conf restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_ensure_store_builds_staged_and_publishes(tmp_path):
    from columnflow_spark.sources.sinks import ensure_store

    path = str(tmp_path / "store")
    calls = []

    def build(p):
        calls.append(p)
        assert p != path and p.startswith(path + ".staging-")
        os.makedirs(p)
        with open(os.path.join(p, "data.txt"), "w") as f:
            f.write("x")
        with open(os.path.join(p, "_BUILT"), "w") as f:
            f.write("ok")

    assert ensure_store(path, build) == path
    assert os.path.exists(os.path.join(path, "_BUILT"))
    assert not any(e.startswith("store.staging-") for e in os.listdir(tmp_path))
    # second call short-circuits: no rebuild
    assert ensure_store(path, build) == path
    assert len(calls) == 1


def test_ensure_store_requires_marker_and_clears_remnants(tmp_path):
    import pytest

    from columnflow_spark.sources.sinks import ensure_store

    path = str(tmp_path / "store")

    def bad_build(p):
        os.makedirs(p)  # no marker -> must fail loudly, never publish

    with pytest.raises(RuntimeError):
        ensure_store(path, bad_build)
    assert not os.path.exists(path)
    # a marker-less remnant (crashed legacy in-place build) is replaced
    os.makedirs(path)
    with open(os.path.join(path, "junk"), "w") as f:
        f.write("partial")

    def build(p):
        os.makedirs(p)
        with open(os.path.join(p, "_BUILT"), "w") as f:
            f.write("ok")

    assert ensure_store(path, build) == path
    assert not os.path.exists(os.path.join(path, "junk"))


def test_ensure_store_loser_adopts_winner(tmp_path):
    """Concurrent-session shape: a second builder whose rename loses must
    adopt the published store and discard its staging copy."""
    from columnflow_spark.sources.sinks import ensure_store

    path = str(tmp_path / "store")

    def racing_build(p):
        os.makedirs(p)
        with open(os.path.join(p, "_BUILT"), "w") as f:
            f.write("mine")
        # simulate the other session publishing first
        os.makedirs(path)
        with open(os.path.join(path, "_BUILT"), "w") as f:
            f.write("theirs")

    assert ensure_store(path, racing_build) == path
    with open(os.path.join(path, "_BUILT")) as f:
        assert f.read() == "theirs"
    assert not any(e.startswith("store.staging-") for e in os.listdir(tmp_path))


def test_ensure_store_cleans_staging_on_failure(tmp_path):
    """ADVICE r12: a failed build must not leak its .staging-* tree."""
    import os

    import pytest as _pytest

    from columnflow_spark.sources.sinks import ensure_store

    path = str(tmp_path / "store")

    def boom(p):
        os.makedirs(p, exist_ok=True)
        with open(os.path.join(p, "partial"), "w") as f:
            f.write("x")
        raise RuntimeError("build failed")

    with _pytest.raises(RuntimeError, match="build failed"):
        ensure_store(path, boom)
    leftovers = [e for e in os.listdir(tmp_path) if ".staging-" in e]
    assert leftovers == []
    # and a markerless build (no exception, no marker) also cleans up
    with _pytest.raises(RuntimeError, match="no _BUILT marker"):
        ensure_store(path, lambda p: os.makedirs(p, exist_ok=True))
    leftovers = [e for e in os.listdir(tmp_path) if ".staging-" in e]
    assert leftovers == []
