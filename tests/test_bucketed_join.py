"""Bucketed (co-located) joins: the 100 TB path for repeated fact-fact
joins on the same key.  Writing both sides bucketed by the join key lets
the join run with ZERO exchanges — each task reads matching buckets —
which is what a production deployment would do for the orders-lineitem
event stream instead of re-shuffling 100 TB per query (SURVEY §4,
README "Shuffles" design note)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from columnflow_spark.sources import load_table

N_BUCKETS = 8


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    try:
        (
            orders.write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / "bt_orders"))
            .mode("overwrite")
            .saveAsTable("bt_orders")
        )
        (
            li.write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "bt_lineitem"))
            .mode("overwrite")
            .saveAsTable("bt_lineitem")
        )
        with _no_broadcast(spark):
            joined = spark.table("bt_lineitem").join(
                spark.table("bt_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            ).select("o_orderkey", "o_orderstatus", "l_quantity")
            plan = _formatted(joined)
            # co-located: the join consumes bucketed scans directly
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # contrast: the same join on raw parquet must shuffle both sides
            raw = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
                "o_orderkey", "o_orderstatus", "l_quantity"
            )
            assert "Exchange" in _formatted(raw)
            # and the result matches the raw join
            assert joined.count() == raw.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_bucketed_aggregation_reuses_layout(spark, sf_dir, tmp_path):
    # a groupBy on the bucket key also needs no exchange before the agg
    orders = load_table(spark, sf_dir, "orders")
    try:
        (
            orders.write.bucketBy(N_BUCKETS, "o_custkey")
            .option("path", str(tmp_path / "bt_orders_cust"))
            .mode("overwrite")
            .saveAsTable("bt_orders_cust")
        )
        agg = spark.table("bt_orders_cust").groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("total")
        )
        plan = _formatted(agg)
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders_cust")


def test_write_bucketed_sink_api(spark, sf_dir, tmp_path):
    from columnflow_spark.sources.sinks import write_bucketed

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(orders, "orders_bkt_api", ["o_orderkey"], 4,
                   sort_cols=["o_orderkey"], path=str(tmp_path / "orders_bkt"))
    try:
        back = spark.table("orders_bkt_api")
        assert back.count() == orders.count()
        # a groupBy on the bucket key plans without an Exchange
        plan = _formatted(back.groupBy("o_orderkey").count())
        assert "Exchange" not in plan.split("==")[1]
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt_api")
