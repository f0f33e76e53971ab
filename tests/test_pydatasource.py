"""Custom chunked-parquet Python DataSource: transparency vs the native
reader, chunk planning from footers, and filter pushdown classification."""

from __future__ import annotations

from pyspark.sql.datasource import EqualTo, GreaterThan, StringContains

from columnflow_spark.sources.pydatasource import ChunkedParquetReader, register


def _read(spark, sf_dir, table, **opts):
    register(spark)
    r = spark.read.format("chunked_parquet").option("path", f"{sf_dir}/{table}.parquet")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_matches_native_reader(spark, sf_dir):
    custom = _read(spark, sf_dir, "documents").collect()
    native = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert sorted(map(tuple, custom)) == sorted(map(tuple, native))


def test_column_projection(spark, sf_dir):
    df = _read(spark, sf_dir, "documents", columns="doc_id,lang")
    assert df.columns == ["doc_id", "lang"]
    assert df.count() == spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def test_filtered_matches_native(spark, sf_dir):
    custom = _read(spark, sf_dir, "orders").filter("o_totalprice > 100000.0").count()
    native = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_totalprice > 100000.0")
        .count()
    )
    assert custom == native


def test_push_filters_classification():
    r = ChunkedParquetReader({"path": "unused"})
    unsupported = list(
        r.pushFilters(
            [
                EqualTo(("lang",), "en"),
                GreaterThan(("n_chars",), 10),
                StringContains(("text",), "x"),
                EqualTo(("a", "b"), 1),  # nested: not supported
            ]
        )
    )
    assert len(r._filters) == 2
    assert len(unsupported) == 2


def test_chunk_planning_from_footers(spark, sf_dir):
    r = ChunkedParquetReader(
        {"path": f"{sf_dir}/lineitem.parquet", "chunk_size": "1000"}
    )
    parts = r.partitions()
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata
    covered = [rg for p in parts for rg in p.row_groups]
    assert sorted(covered) == list(range(meta.num_row_groups))


def test_replay_offsets_deterministic(sf_dir):
    from columnflow_spark.sources.pydatasource import _EventsReplayReader

    r = _EventsReplayReader({"path": f"{sf_dir}/events.parquet", "batch_rows": "100"})
    it, off1 = r.read({"row": 0})
    batch1 = list(it)
    assert off1 == {"row": 100} and len(batch1) == 100
    # replay between offsets returns the identical batch (checkpoint recovery)
    assert list(r.readBetweenOffsets({"row": 0}, {"row": 100})) == batch1
    # exhausted source holds its offset
    total = r._load().num_rows
    it, off = r.read({"row": total})
    assert off == {"row": total} and list(it) == []


def test_row_group_stats_pruning(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.datasource import GreaterThan

    # 4 row groups of 100 rows, v strictly increasing -> clean min/max stats
    path = str(tmp_path / "rg.parquet")
    t = pa.table({"k": list(range(400)), "v": [float(i) for i in range(400)]})
    pq.write_table(t, path, row_group_size=100)

    r = ChunkedParquetReader({"path": path, "chunk_size": "1000"})
    list(r.pushFilters([GreaterThan(("v",), 250.0)]))
    pf = pq.ParquetFile(path)
    kept = r._prune_row_groups(pf, [0, 1, 2, 3])
    # groups 0-1 (v <= 199) are provably excluded; 2 (200-299) straddles
    assert kept == [2, 3]
    # pruning happens at PLANNING time: excluded groups never enter a task
    parts = r.partitions()
    assert [rg for p in parts for rg in p.row_groups] == [2, 3]
    rows = [row for p in parts for row in r.read(p)]
    total = sum(b.num_rows for b in rows)
    assert total == 149  # v in (250, 399]


def test_writer_roundtrip_and_overwrite(spark, sf_dir, tmp_path):
    """Custom Arrow writer: two-phase commit publishes part files + a
    _SUCCESS marker; re-reads match through BOTH the native parquet
    reader and the chunked reader's directory mode; overwrite replaces."""
    import os

    register(spark)
    out = str(tmp_path / "cpw")
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")

    src.write.format("chunked_parquet").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    import glob

    assert not glob.glob(out + "__staging*")

    native = spark.read.parquet(out)
    assert native.count() == src.count()
    chunked = (
        spark.read.format("chunked_parquet").option("path", out).load()
    )
    assert chunked.count() == src.count()
    assert sorted(chunked.columns) == sorted(src.columns)
    # value-level spot check: total exact cents match the source
    from pyspark.sql import functions as F

    cents = lambda df: df.select(  # noqa: E731
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    ).collect()[0][0]
    assert cents(chunked) == cents(src)

    # overwrite with a filtered subset: old files must not survive
    sub = src.filter(F.col("o_orderstatus") == "F")
    sub.write.format("chunked_parquet").option("path", out).mode("overwrite").save()
    assert spark.read.parquet(out).count() == sub.count()


def test_writer_row_group_sizing(spark, sf_dir, tmp_path):
    """row groups in written files respect the chunk_size the reader
    plans by — the roundtrip preserves the chunking contract."""
    import glob

    import pyarrow.parquet as pq

    register(spark)
    out = str(tmp_path / "cpw_rg")
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").coalesce(1)
    src.write.format("chunked_parquet").option("path", out).option(
        "chunk_size", "40"
    ).mode("append").save()
    files = glob.glob(f"{out}/part-*.parquet")
    assert files
    for f in files:
        meta = pq.ParquetFile(f).metadata
        assert all(
            meta.row_group(i).num_rows <= 40 for i in range(meta.num_row_groups)
        )
