"""Flagship staged pipeline (SURVEY.md §7.2 minimum end-to-end slice).

Re-expresses the reference's CalibrateEvents -> SelectEvents ->
ReduceEvents -> ProduceColumns -> CreateHistograms chain (reference
columnflow/tasks/{calibration,selection,reduction,production,histograms}.py)
on a nested event table built from the driver's orders+lineitem tables:

- event        = one order row
- object array = its lineitems (array<struct> column ``items``), the
                 analog of the reference's per-event ``Jet`` collection
- calibrator   = price scale correction (withField over the array)
- selector     = object mask (qty cut) + event mask (>=1 selected item)
- reducer      = drop failing events, rebuild ``items`` from the mask
- producer     = ht (sum of selected prices), n_items, category id
- hist         = weighted 1-D histogram of ht per category

Everything is built-in higher-order array functions (transform / filter /
aggregate) — no UDFs, the whole plan stays in WholeStageCodegen, and the
only shuffle is the initial groupBy building the collections plus the final
hist aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnflow_spark.sources import load_table


def build_nested_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested event table: one row per order with an ``items``
    array<struct> collection (the reference's event/Jet shape,
    SURVEY §1.1)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    items = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("linenumber"),
                        F.col("l_quantity").alias("qty"),
                        F.col("l_extendedprice").alias("price"),
                        F.col("l_discount").alias("discount"),
                        F.col("l_returnflag").alias("returnflag"),
                    )
                )
            ).alias("items")
        )
    )
    return orders.join(items, F.col("o_orderkey") == F.col("l_orderkey"), "left").drop("l_orderkey").withColumn(
        "items", F.coalesce(F.col("items"), F.array().cast(items.schema["items"].dataType))
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)

    # calibrator: scale item prices by +2% (reference jec analog,
    # calibration/cms/jets.py:337 — mutate a column of every object)
    events = events.withColumn(
        "items", F.transform("items", lambda x: x.withField("price", x["price"] * F.lit(1.02)))
    )

    # selector: object mask (qty >= 5) + event mask (>= 2 selected items);
    # masks are *stored*, not applied (reference SelectionResult semantics,
    # selection/__init__.py:129)
    events = events.withColumn("item_mask", F.transform("items", lambda x: x["qty"] >= 5))
    events = events.withColumn(
        "n_selected", F.size(F.filter("item_mask", lambda m: m))
    ).withColumn("event_mask", F.col("n_selected") >= 2)

    # reducer: apply event mask, rebuild collection from object mask
    # (reference reduction/default.py:48 cf_default)
    reduced = events.filter(F.col("event_mask")).withColumn(
        "items", F.filter(F.zip_with("items", "item_mask", lambda x, m: F.when(m, x)), lambda x: x.isNotNull())
    )

    # producer: ht (sum price of selected items), n_items, category id
    # (reference production/example.py:35, categories production/categories.py:31)
    produced = (
        reduced.withColumn(
            "ht", F.aggregate("items", F.lit(0.0), lambda acc, x: acc + x["price"])
        )
        .withColumn("n_items", F.size("items"))
        .withColumn(
            "category",
            F.when(F.col("n_items") >= 6, F.lit("cat_6plus")).otherwise(F.lit("cat_lt6")),
        )
    )

    # hist producer: weighted 1-D histogram of ht, regular binning
    # [0, 500000) x 25 bins, weight = o_totalprice-normalized unit weight
    n_bins, lo, hi = 25, 0.0, 500000.0
    width = (hi - lo) / n_bins
    bin_idx = F.when(F.col("ht") < lo, F.lit(-1)).when(
        F.col("ht") >= hi, F.lit(n_bins)
    ).otherwise(F.floor((F.col("ht") - lo) / F.lit(width)).cast("int"))
    hist = (
        produced.withColumn("bin", bin_idx)
        .groupBy("category", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.lit(1.0)), 4).alias("sum_w"),
            F.round(F.sum(F.lit(1.0)), 4).alias("sum_w2"),
        )
    )
    return hist
