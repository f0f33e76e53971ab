"""Staged-pipeline operators (SURVEY §2.10 / §3): the registry-driven
calibrate -> select -> reduce -> produce chain, shift aliasing, selection
statistics, normalization weights, deterministic seeds, and runtime
validation checks — each with a flat-SQL oracle proving the staged nested
execution matches relational semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnflow_spark.functions import arrays as A
from columnflow_spark.functions.hashing import seed_hex, seed_long
from columnflow_spark.pipeline_demo import (
    MIN_SELECTED,
    PRICE_SCALE,
    QTY_CUT,
    build_nested_events,
    cf_default_reduce,
    features,
    price_scale,
    qty_selector,
)
from columnflow_spark.plans.shifts import Shift, apply_shift_aliases
from columnflow_spark.plans.stage import StageChain
from columnflow_spark.queries import query
from columnflow_spark.sources import load_table


# --- the full staged chain, flat output (reference task chain
# tasks/calibration.py -> selection.py -> reduction.py -> production.py) ---
@query(
    "pipeline_reduced_features",
    oracle=f"""
    WITH items AS (
        SELECT l_orderkey, l_quantity AS qty, l_extendedprice * {PRICE_SCALE} AS price
        FROM lineitem
    ),
    sel AS (
        SELECT
            l_orderkey,
            count(*) FILTER (WHERE qty >= {QTY_CUT}) AS n_items,
            sum(price) FILTER (WHERE qty >= {QTY_CUT}) AS ht
        FROM items
        GROUP BY l_orderkey
    )
    SELECT
        l_orderkey AS okey,
        n_items,
        round(ht, 4) AS ht,
        CASE WHEN n_items >= 6 THEN 'cat_6plus' ELSE 'cat_lt6' END AS category
    FROM sel
    WHERE n_items >= {MIN_SELECTED}
    """,
)
def pipeline_reduced_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)
    chain = StageChain(
        [price_scale(), qty_selector(), cf_default_reduce(), features()],
        keep=["o_orderkey"],
    )
    out = chain.run(events)
    return out.select(
        F.col("o_orderkey").alias("okey"),
        F.col("n_items"),
        F.round("ht", 4).alias("ht"),
        F.col("category"),
    )


# --- selection statistics side-output (reference increment_stats,
# selection/stats.py:28: num_* counts + sum_* weight sums per group) ---
@query(
    "selection_stats",
    oracle=f"""
    SELECT
        l_returnflag AS process,
        count(*) AS num_events,
        count(*) FILTER (WHERE l_quantity >= {QTY_CUT}) AS num_events_selected,
        round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_mc_weight,
        round(coalesce(sum(l_extendedprice * (1 - l_discount))
              FILTER (WHERE l_quantity >= {QTY_CUT}), 0.0), 4) AS sum_mc_weight_selected
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def selection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    mask = F.col("l_quantity") >= QTY_CUT
    return li.groupBy(F.col("l_returnflag").alias("process")).agg(
        F.count(F.lit(1)).alias("num_events"),
        F.count_if(mask).alias("num_events_selected"),
        F.round(F.sum(w), 4).alias("sum_mc_weight"),
        F.round(F.coalesce(F.sum(F.when(mask, w)), F.lit(0.0)), 4).alias("sum_mc_weight_selected"),
    )


# --- normalization weights: two-phase stats + broadcast-join-back
# (reference production/normalization.py:300: w = xsec * lumi / sum_weights) ---
@query(
    "normalization_weights",
    oracle="""
    WITH stats AS (
        SELECT o_orderstatus, sum(o_totalprice) AS sum_w
        FROM orders
        GROUP BY o_orderstatus
    )
    SELECT
        o.o_orderstatus AS process,
        count(*) AS n,
        round(sum(o.o_totalprice * (1000000.0 / s.sum_w)), 4) AS norm_yield
    FROM orders o
    JOIN stats s ON s.o_orderstatus = o.o_orderstatus
    GROUP BY o.o_orderstatus
    """,
)
def normalization_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    # phase 1: small per-process stats aggregate (the MergeSelectionStats table)
    stats = orders.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("sum_w"))
    # phase 2: broadcast the tiny stats table back onto the event stream
    xsec_times_lumi = F.lit(1000000.0)
    return (
        orders.join(F.broadcast(stats), "o_orderstatus")
        .withColumn("norm_weight", F.col("o_totalprice") * (xsec_times_lumi / F.col("sum_w")))
        .groupBy(F.col("o_orderstatus").alias("process"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("norm_weight"), 4).alias("norm_yield"),
        )
    )


# --- shift aliasing (reference add_ak_aliases columnar_util.py:803 +
# shift column_aliases config_util.py:285): the shifted column is read
# under the nominal name, downstream code unchanged ---
@query(
    "shift_aliased_yield",
    oracle="""
    SELECT
        l_returnflag,
        round(sum(l_extendedprice), 4) AS nominal_sum,
        round(sum(l_extendedprice * 1.05), 4) AS shifted_sum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def shift_aliased_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    # upstream producer materialized the shifted column next to the nominal
    li = li.withColumn("l_extendedprice_price_up", F.col("l_extendedprice") * 1.05)
    shifted = apply_shift_aliases(
        li, Shift("price_up", {"l_extendedprice": "l_extendedprice_price_up"})
    )
    nominal_agg = li.groupBy("l_returnflag").agg(F.round(F.sum("l_extendedprice"), 4).alias("nominal_sum"))
    shifted_agg = shifted.groupBy("l_returnflag").agg(F.round(F.sum("l_extendedprice"), 4).alias("shifted_sum"))
    return nominal_agg.join(shifted_agg, "l_returnflag")


# --- deterministic seeds (reference production/cms/seeds.py:26: sha256 of
# event ids -> stable per-event seed) ---
@query(
    "deterministic_seeds",
    oracle="""
    SELECT
        event_id,
        substring(sha256(concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR))), 1, 15) AS seed
    FROM events
    WHERE event_id < 100
    """,
)
def deterministic_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id"])
    return ev.filter(F.col("event_id") < 100).select(
        "event_id",
        seed_hex(F.col("event_id"), F.col("user_id")).alias("seed"),
    )


# --- ML k-fold split: fold = deterministic_seed % k, per-fold stats
# (reference tasks/ml.py:221 fold split, :187-294 MLStats/MergeMLStats) ---
@query(
    "ml_fold_split",
    oracle="""
    WITH folds AS (
        SELECT
            CAST(('0x' || substring(sha256(concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 5 AS fold,
            value
        FROM events
    )
    SELECT fold, count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM folds
    GROUP BY fold
    """,
)
def ml_fold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment: events land in the same fold on
    every run and every cluster size (seed is content-derived, never
    partition-derived), so train/test splits are reproducible at 100 TB."""
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "value"])
    fold = (seed_long(F.col("event_id"), F.col("user_id")) % 5).alias("fold")
    return ev.groupBy(fold).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# --- finite/validity runtime check (reference raise_if_not_finite,
# tasks/framework/mixins.py:2611) as a data-quality aggregate ---
@query(
    "finite_check",
    oracle="""
    SELECT
        count(*) FILTER (WHERE isnan(l_quantity) OR isinf(l_quantity)) AS bad_qty,
        count(*) FILTER (WHERE isnan(l_extendedprice) OR isinf(l_extendedprice)) AS bad_price,
        count(*) FILTER (WHERE l_quantity IS NULL) AS null_qty
    FROM lineitem
    """,
)
def finite_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])
    inf = float("inf")

    def bad(c: str):
        col = F.col(c)
        return F.count_if(F.isnan(col) | (F.abs(col) == inf))

    return li.agg(
        bad("l_quantity").alias("bad_qty"),
        bad("l_extendedprice").alias("bad_price"),
        F.count_if(F.col("l_quantity").isNull()).alias("null_qty"),
    )


# --- categorization: leaf-category ids per event + intersection filter
# (reference category_ids production/categories.py:31 +
# get_events_from_categories config_util.py:31) ---
@query(
    "category_ids",
    oracle="""
    WITH ev AS (
        SELECT
            o_orderkey,
            CASE WHEN o_totalprice >= 200000 THEN 1 ELSE 2 END AS price_cat,
            CASE o_orderstatus WHEN 'O' THEN 10 WHEN 'F' THEN 20 ELSE 30 END AS status_cat
        FROM orders
    )
    SELECT price_cat, status_cat, count(*) AS n
    FROM ev
    WHERE price_cat = 1 OR status_cat = 20
    GROUP BY price_cat, status_cat
    """,
)
def category_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # categories come from the metadata catalog (reference od.Config tree;
    # catalog.py): selections are SQL strings on the config, compiled by
    # leaf_category_ids_column into one codegen'd when-array — the demo of
    # config-driven categorization end-to-end
    from columnflow_spark.catalog import (
        Category, Config, category_filter_column, leaf_category_ids_column,
    )

    cfg = Config("tpch_demo", 1)
    price = cfg.add_category(Category("price", 100, selection="true"))
    price.add_category(Category("high_price", 1, selection="o_totalprice >= 200000"))
    price.add_category(Category("low_price", 2, selection="o_totalprice < 200000"))
    status = cfg.add_category(Category("status", 200, selection="true"))
    status.add_category(Category("open", 10, selection="o_orderstatus = 'O'"))
    status.add_category(Category("finished", 20, selection="o_orderstatus = 'F'"))
    status.add_category(Category("other", 30, selection="o_orderstatus NOT IN ('O', 'F')"))

    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    cats = orders.withColumn("category_ids", leaf_category_ids_column(cfg))
    # intersection filter: keep events in high_price or finished
    kept = cats.filter(category_filter_column(cfg, ["high_price", "finished"]))
    return (
        kept.select(
            F.element_at(F.filter("category_ids", lambda i: i < 10), 1).alias("price_cat"),
            F.element_at(F.filter("category_ids", lambda i: i >= 10), 1).alias("status_cat"),
        )
        .groupBy("price_cat", "status_cat")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- calibrator with deterministic random smearing (reference jer
# calibration/cms/jets.py:917 + ak_random gauss calibration/util.py:18 +
# seeds production/cms/seeds.py:26): Box-Muller over sha256-derived
# uniforms, reproducible per event on any cluster layout; the oracle
# replicates the exact arithmetic in SQL. ---
@query(
    "jer_smearing",
    oracle="""
    WITH seeded AS (
        SELECT event_id, value,
               ('0x' || substring(sha256(concat_ws('|', CAST(event_id AS VARCHAR))), 1, 15))::BIGINT AS seed
        FROM events
        WHERE event_id < 2000
    ),
    uniforms AS (
        SELECT event_id, value,
               (('0x' || substring(sha256(CAST(seed AS VARCHAR)), 1, 13))::BIGINT + 1.0)
                   / 4503599627370498.0 AS u1,
               (('0x' || substring(sha256(CAST(seed + 1 AS VARCHAR)), 1, 13))::BIGINT + 1.0)
                   / 4503599627370498.0 AS u2
        FROM seeded
    )
    SELECT event_id,
           round(value + (0.05 * value) * (sqrt(-2.0 * ln(u1)) * cos(6.283185307179586 * u2)), 4) AS smeared
    FROM uniforms
    """,
)
def jer_smearing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.functions.hashing import seeded_gauss

    ev = load_table(spark, sf_dir, "events", columns=["event_id", "value"]).filter(
        F.col("event_id") < 2000
    )
    seed = seed_long(F.col("event_id"))
    smeared = seeded_gauss(seed, F.col("value"), 0.05 * F.col("value"))
    return ev.select("event_id", F.round(smeared, 4).alias("smeared"))


# --- flat union export (reference UniteColumns tasks/union.py:184: flatten
# nested columns to nano names + optional event filter at export) ---
@query(
    "unite_columns_export",
    oracle="""
    WITH ranked AS (
        SELECT l_orderkey, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag
               ) AS rk,
               count(*) OVER (PARTITION BY l_orderkey) AS n_items
        FROM lineitem
    )
    SELECT o.o_orderkey, round(o.o_totalprice, 4) AS total, r.n_items,
           round(r.l_extendedprice, 4) AS lead_price
    FROM orders o JOIN ranked r ON r.l_orderkey = o.o_orderkey AND r.rk = 1
    WHERE o.o_totalprice >= 400000
    """,
)
def unite_columns_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.core.columns import flatten_table

    events = build_nested_events(spark, sf_dir).filter(
        (F.col("o_totalprice") >= 400000) & (F.size("items") >= 1)
    )
    flat = flatten_table(events.select("o_orderkey", "o_totalprice", "items"), fmt="nano")
    return flat.select(
        "o_orderkey",
        F.round("o_totalprice", 4).alias("total"),
        F.size("items_price").alias("n_items"),
        F.round(F.element_at("items_price", 1), 4).alias("lead_price"),
    )
