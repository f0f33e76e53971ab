"""Core relational operators (SURVEY.md §2.1/2.3/2.4/2.5/2.6/2.7).

The reference has no multi-table relational layer (SURVEY §2.4: its only
join-like ops are positional merges and broadcast lookups), but a complete
engine needs scans, filters, joins, aggregations, windows, and set ops —
these queries exercise each against the DuckDB oracle and are written so
Catalyst produces the plan we want at 100 TB: filters/projections pushed to
the parquet scan, small dimensions broadcast, aggregations partial+final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from columnflow_spark.queries import query
from columnflow_spark.sources import load_table


# --- TPC-H Q1: scan + pushdown filter + grouped aggregation (partial+final) ---
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_quantity), 4)                                          AS sum_qty,
        round(sum(l_extendedprice), 4)                                     AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 4)                  AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)    AS sum_charge,
        round(avg(l_quantity), 4)                                          AS avg_qty,
        round(avg(l_extendedprice), 4)                                     AS avg_price,
        round(avg(l_discount), 4)                                          AS avg_disc,
        count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3-style: 3-way join with broadcast dim + top-k (deterministic) ---
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT
        l_orderkey,
        round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        o_orderdate,
        o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .join(orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- TPC-H Q5-style: 5-way join, all dims broadcast ---
@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
        n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = load_table(spark, sf_dir, "region", columns=["r_regionkey"])
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


# --- top-k per group: Window.partitionBy + row_number (SURVEY §2.6) ---
@query(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
        SELECT
            o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# --- grouping-set combinations: the increment_stats group_combinations analog
# (reference columnflow/selection/stats.py:28) maps to CUBE ---
@query(
    "grouped_stats_cube",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        count(*)                     AS num_events,
        round(sum(l_quantity), 4)    AS sum_qty,
        round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_weight
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def grouped_stats_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("num_events"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_weight"),
    )


# --- multi-dataset union with process tagging (SURVEY §2.7, wrapper_factory) ---
@query(
    "dataset_union",
    oracle="""
    SELECT dataset, count(*) AS n, round(sum(o_totalprice), 4) AS total
    FROM (
        SELECT 'open'     AS dataset, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT 'finished' AS dataset, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY dataset
    """,
)
def dataset_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    open_ds = orders.filter(F.col("o_orderstatus") == "O").withColumn("dataset", F.lit("open"))
    fin_ds = orders.filter(F.col("o_orderstatus") == "F").withColumn("dataset", F.lit("finished"))
    return (
        open_ds.unionByName(fin_ds)
        .groupBy("dataset")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


# --- semi join (EXISTS): customers with at least one open order ---
@query(
    "semi_join_open_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY c_mktsegment
    """,
)
def semi_join_open_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    return (
        cust.join(
            orders.filter(F.col("o_orderstatus") == "O"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- anti join (NOT EXISTS): parts never ordered ---
@query(
    "anti_join_unsold_parts",
    oracle="""
    SELECT count(*) AS n_unsold, coalesce(round(sum(p_retailprice), 4), 0.0) AS locked_value
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def anti_join_unsold_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey"])
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_unsold"),
            F.coalesce(F.round(F.sum("p_retailprice"), 4), F.lit(0.0)).alias("locked_value"),
        )
    )


# --- positional diff-merge: update_ak_array analog (reference
# columnflow/columnar_util.py:905).  Two column-subset "files" of the same
# event stream are re-merged on the natural key (the robust Spark form of the
# reference's by-position chunk zip, per SURVEY §2.4/§7.4). ---
@query(
    "positional_column_merge",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def positional_column_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # simulate two per-stage "diff" files carrying disjoint produced columns,
    # re-aligned on the unique natural key (the reference aligns by row
    # position inside lockstep chunk reads; a key join is the scalable form)
    base = load_table(spark, sf_dir, "events", columns=["event_id", "value"])
    diff = load_table(spark, sf_dir, "events", columns=["event_id", "event_type"])
    merged = base.join(diff, ["event_id"])
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# --- interval/range join: golden-JSON run/lumi filter analog (reference
# columnflow/selection/cms/json_filter.py:43): equi-join + range predicate ---
@query(
    "range_join_ship_window",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_in_window
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate <  o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderstatus
    """,
)
def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"])
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_in_window"))
    )


# --- veto semi-join: jet_veto_map analog (reference
# columnflow/selection/cms/jets.py:30): drop events containing any object in a
# broadcast veto region ---
@query(
    "veto_map_filter",
    oracle="""
    SELECT count(*) AS n_kept, round(sum(o_totalprice), 4) AS kept_value
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_orderkey = o.o_orderkey AND p.p_size >= 48
    )
    """,
)
def veto_map_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    veto_parts = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_size"]).filter(F.col("p_size") >= 48)
    vetoed = li.join(F.broadcast(veto_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    return (
        orders.join(vetoed, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.round(F.sum("o_totalprice"), 4).alias("kept_value"))
    )


# --- TPC-H Q6: pure scan-side predicate conjunction + single aggregate.
# The plan must show every filter in PushedFilters and no shuffle beyond
# the final partial+final agg — the canonical "is pushdown working" probe. ---
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- TPC-H Q4 (adapted to available columns): EXISTS semi-join — count
# orders per priority having at least one late-shipping line.  The semi
# join deduplicates on the join side, never materializing the multiplicity. ---
@query(
    "q4_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# --- TPC-H Q14: conditional aggregation over a fact->dim join (promo
# revenue share).  part is broadcast; the CASE folds into the partial agg. ---
@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT
        round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
              / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
        count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- TPC-H Q18: large-volume orders — aggregate-then-join with a HAVING
# threshold.  The heavy groupBy runs FIRST so only qualifying orderkeys
# (rare) reach the join; at scale this is agg-pushdown-through-join done
# by hand. ---
@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 210
    )
    SELECT c_name, o_orderkey, o_orderdate, round(o_totalprice, 4) AS o_totalprice,
           round(total_qty, 4) AS total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 210)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            F.round("tq", 4).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --- TPC-H Q19: disjunctive multi-clause join predicate.  Catalyst
# extracts the common l_partkey = p_partkey equi-condition so this stays a
# broadcast hash join with a residual OR filter — not a cartesian. ---
@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    clause = (
        ((brand == "Brand#1") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#2") & size.between(1, 25) & qty.between(10, 20))
        | ((brand == "Brand#3") & size.between(1, 35) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
