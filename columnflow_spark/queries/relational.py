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

from columnflow_spark.core.state import checkpoint_df, checkpoint_df_lazy

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


# ---------------------------------------------------------------------------
# TPC-H completion pack.  The test schema is a reduced TPC-H (no partsupp,
# no l_commitdate/l_receiptdate/l_shipmode, no comment/phone columns), so
# the queries below keep each TPC-H query's OPERATOR SHAPE — correlated
# scalar subqueries, exists/not-exists pairs, outer-join distributions,
# scalar-aggregate thresholds — re-targeted at the columns that exist.
# Shapes Catalyst must get right at 100 TB: scalar subqueries as one-row
# broadcast cross joins, correlated aggregates as broadcast joins of a
# pre-agg, NOT IN as left_anti, and every dimension side broadcast.
# ---------------------------------------------------------------------------


# --- TPC-H Q7: bidirectional nation-pair trade volume by ship year.  Two
# broadcast copies of nation; the symmetric pair predicate is a residual
# OR on top of the equi-joins. ---
@query(
    "q7_nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
            OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    ns = nation.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = nation.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
        )
    )


# --- TPC-H Q8: national market share — conditional-sum ratio per order
# year over a 7-table join (every dimension broadcast). ---
@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               ns.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"]).filter(
        F.col("p_type") == "ECONOMY"
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"],
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = load_table(spark, sf_dir, "region", columns=["r_regionkey", "r_name"]).filter(
        F.col("r_name") == "EUROPE"
    )
    nc = nation.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region"))
    ns = nation.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))) / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


# --- TPC-H Q9 (adapted: no partsupp, so supply cost is proxied by
# 0.1 * p_retailprice * l_quantity): profit by supplier nation and year. ---
@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
        SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]).filter(
        F.col("p_name").like("%widget%")
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"],
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
    )


# --- TPC-H Q10: returned-item revenue per customer in a quarter, top 20. ---
@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 4) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    )
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 4).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- TPC-H Q11 (adapted: value per part from lineitem instead of
# partsupp): parts whose shipped value exceeds a fraction of the total —
# the fraction is a scalar-aggregate subquery, realized in Spark as a
# one-row broadcast cross join over the SAME pre-aggregated table so the
# heavy per-part agg runs once. ---
@query(
    "q11_part_value_concentration",
    oracle="""
    WITH pv AS (
        SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 4) AS part_value
    FROM pv, (SELECT sum(value) * 0.0008 AS threshold FROM pv) t
    WHERE value > t.threshold
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"]).filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    pv = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    # one aggregation, reused for both the rows and the scalar threshold
    pv = pv.transform(checkpoint_df_lazy)
    thr = pv.agg((F.sum("value") * 0.0008).alias("threshold"))
    return (
        pv.join(F.broadcast(thr))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 4).alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


# --- TPC-H Q12 (adapted: ship lag bucket instead of l_shipmode):
# high/low-priority line counts per lateness bucket — the classic
# conditional aggregation after a fact-fact join. ---
@query(
    "q12_ship_lag_priority",
    oracle="""
    SELECT lag_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT o_orderpriority,
               CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
                    THEN 'late' ELSE 'on_time' END AS lag_bucket
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY lag_bucket
    """,
)
def q12_ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn(
            "lag_bucket",
            F.when(
                F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"), "late"
            ).otherwise("on_time"),
        )
        .groupBy("lag_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- TPC-H Q13: customer order-count distribution — LEFT OUTER join with
# a join-side predicate (so zero-order customers survive), double
# aggregation. ---
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderpriority"])
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- TPC-H Q15: top supplier by quarterly revenue — the revenue "view"
# feeds both the rows and the scalar max (same one-row broadcast pattern
# as q11; ties broken by suppkey would surface as extra rows, exactly as
# in the spec). ---
@query(
    "q15_top_supplier",
    oracle="""
    -- MATERIALIZED is load-bearing: inlined, the CTE is computed once
    -- per reference and DuckDB's parallel double-sums can differ in the
    -- last ulp between the two evaluations, so the max-equality below
    -- intermittently matches nothing (seen at sf1)
    WITH revenue AS MATERIALIZED (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
        .transform(checkpoint_df_lazy)
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --- TPC-H Q16 (adapted: supplier variety per part attribute from
# lineitem instead of partsupp): COUNT DISTINCT per group with a NOT IN
# exclusion realized as left_anti. ---
@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    bad_supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]).filter(
        F.col("s_acctbal") < 0
    )
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


# --- TPC-H Q17: small-quantity revenue — correlated scalar AVG per part,
# realized as a broadcast join of the per-part pre-aggregate (Catalyst's
# own de-correlation strategy, written explicitly). ---
@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly, count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand"]).filter(
        F.col("p_brand") == "Brand#3"
    )
    # per-part avg over ALL lineitems (the correlated subquery scans the
    # full table, not the brand-filtered slice)
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(per_part), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- TPC-H Q20 (adapted: shipped quantity from lineitem instead of
# partsupp availqty): suppliers in a nation set who moved more than a
# threshold of PROMO parts — a semi-join chain ending in a broadcast
# EXISTS. ---
@query(
    "q20_promo_part_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, sum(l_quantity) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
    )
    SELECT s_name, round(s_acctbal, 4) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
      AND EXISTS (SELECT 1 FROM shipped WHERE shipped.l_suppkey = s_suppkey AND qty > 300)
    ORDER BY s_name
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"]).filter(
        F.col("p_type") == "PROMO"
    )
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"]).filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5")
    )
    movers = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 4).alias("s_acctbal"))
        .orderBy("s_name")
    )


# --- TPC-H Q21 (adapted: "blocking supplier" = strictly-latest ship date
# in a multi-supplier finished order, since there is no receipt/commit
# date): the EXISTS + NOT EXISTS correlated pair on a self-joined fact. ---
@query(
    "q21_blocking_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5',
                     'NATION_6', 'NATION_7', 'NATION_8', 'NATION_9', 'NATION_10')
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate >= l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]).filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"]).filter(
        F.col("n_name").isin(*[f"NATION_{i}" for i in range(1, 11)])
    )
    other = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    l1 = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    has_other = l1.join(
        other,
        (F.col("x_orderkey") == F.col("l_orderkey")) & (F.col("x_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    blocking = has_other.join(
        other,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey"))
        & (F.col("x_shipdate") >= F.col("l_shipdate")),
        "left_anti",
    )
    return (
        blocking.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --- TPC-H Q22 (adapted: nationkey set instead of phone prefixes, and
# "dormant" = no order in the final year since every customer has some
# order): scalar-subquery threshold + anti join, grouped. ---
@query(
    "q22_dormant_customers",
    oracle="""
    WITH pos AS (
        SELECT avg(c_acctbal) AS ab
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
    )
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
    FROM customer, pos
    WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
      AND c_acctbal > ab
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]).filter(
        F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7)
    )
    recent = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), F.round(F.sum("c_acctbal"), 4).alias("totacctbal"))
    )


# --- TPC-H Q2 (adapted: no partsupp, so "cost" is the min unit price a
# supplier ever charged for the part): per-part argmin over region
# suppliers with a deterministic tie-break — the correlated-min shape as
# a rank-1 window over a pre-aggregate. ---
@query(
    "q2_min_price_supplier",
    oracle="""
    WITH unit AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_price
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_brand, s_name,
           CAST(round(unit_price * 10000) AS BIGINT) AS unit_price_e4
    FROM (
        SELECT l_partkey, l_suppkey, unit_price,
               row_number() OVER (
                   PARTITION BY l_partkey ORDER BY unit_price, l_suppkey
               ) AS rn
        FROM unit
    ) best
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1 AND p_size <= 3
    ORDER BY p_partkey
    """,
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = load_table(spark, sf_dir, "region", columns=["r_regionkey", "r_name"]).filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).filter(
        F.col("p_size") <= 3
    )
    eu_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    unit = (
        li.join(F.broadcast(eu_supp.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    # argmin with (unit_price, suppkey) tie-break, collapsed map-side
    best = unit.groupBy("l_partkey").agg(
        F.min_by(F.struct("l_suppkey", "unit_price"), F.struct("unit_price", "l_suppkey")).alias("b")
    ).select("l_partkey", F.col("b.l_suppkey").alias("l_suppkey"), F.col("b.unit_price").alias("unit_price"))
    return (
        best.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        # integer-scaled price: both engines round the SAME exact double
        # (price/qty of integer-valued doubles) to the nearest integer --
        # immune to the engines' differing round(x, 4) tie handling, which
        # flipped 3 knife-edge rows at sf0.1 (DuckDB rounds in floating
        # point, Spark via BigDecimal)
        .select(
            "p_partkey", "p_brand", "s_name",
            F.round(F.col("unit_price") * 10000).cast("long").alias("unit_price_e4"),
        )
        .orderBy("p_partkey")
    )


# --- bivariate statistics (corr/covar/stddev/var): the sufficient-stats
# aggregates Spark and DuckDB define identically (sample forms), all
# computed in ONE partial+final pass over the fact table. ---
@query(
    "stat_correlations",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(stddev_samp(l_discount), 4)                 AS std_discount,
           round(var_samp(l_tax), 4)                         AS var_tax,
           count(*) AS n
    FROM lineitem
    """,
)
def stat_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_discount"), 4).alias("std_discount"),
        F.round(F.var_samp("l_tax"), 4).alias("var_tax"),
        F.count(F.lit(1)).alias("n"),
    )


# --- explicit GROUPING SETS + grouping_id (the general form of the
# increment_stats group_combinations facility; cube/rollup are the
# specializations).  grouping_id disambiguates the NULL-as-total rows. ---
@query(
    "grouping_sets_stats",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


# --- pivot (long -> wide): order counts per priority pivoted over status.
# With explicit pivot values this is ONE pass of conditional partial
# aggregation — no extra shuffle versus a plain groupBy. ---
@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus"])
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


# --- unpivot (wide -> long): per-flag measure columns melted to
# (measure, value) rows — the export shape plotting and datacard writers
# consume. ---
@query(
    "unpivot_price_measures",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 4)      AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_price,
               round(avg(l_discount), 4)      AS avg_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value FROM (
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM wide
        UNION ALL
        SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
    )
    """,
)
def unpivot_price_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"])
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "avg_disc"], "measure", "value"
    )


# --- ntile / percent_rank / cume_dist window family, aggregated to
# per-quartile stats so the comparison is exact.  Partitioned by status
# (bounded partitions); at 100 TB unbounded rank-by-value would instead go
# through value_percentiles' distributed quantile path. ---
@query(
    "window_rank_family",
    oracle="""
    SELECT o_orderstatus, q,
           count(*) AS n,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price,
           round(avg(pr), 4) AS avg_pct_rank,
           round(avg(cd), 4) AS avg_cume_dist
    FROM (
        SELECT o_orderstatus, o_totalprice,
               ntile(4)       OVER w AS q,
               percent_rank() OVER w AS pr,
               cume_dist()    OVER w AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    )
    GROUP BY o_orderstatus, q
    ORDER BY o_orderstatus, q
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderstatus", "o_totalprice",
            F.ntile(4).over(w).alias("q"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .groupBy("o_orderstatus", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
            F.round(F.avg("pr"), 4).alias("avg_pct_rank"),
            F.round(F.avg("cd"), 4).alias("avg_cume_dist"),
        )
        .orderBy("o_orderstatus", "q")
    )


# --- q21 rewritten as windows (same result set as
# q21_blocking_supplier): a line "blocks" iff its ship date beats every
# other supplier's line in the order, i.e. l_shipdate > max-over-other-
# suppliers.  That bound is computable with window functions over ONE
# hash partitioning of the fact (order key): supplier-level max, order
# max, the set of suppliers at the max, and the second supplier-level
# max.  One exchange + in-partition sorts replaces the two fact
# self-joins — the form to run at 100 TB. ---
@query(
    "q21_blocking_supplier_agg",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5',
                     'NATION_6', 'NATION_7', 'NATION_8', 'NATION_9', 'NATION_10')
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate >= l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_blocking_supplier_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]).filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"]).filter(
        F.col("n_name").isin(*[f"NATION_{i}" for i in range(1, 11)])
    )
    lf = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    w_o = W.partitionBy("l_orderkey")
    w_os = W.partitionBy("l_orderkey", "l_suppkey")
    smax = F.max("l_shipdate").over(w_os)          # my supplier's best
    m1 = F.max("l_shipdate").over(w_o)             # order max
    at_max = F.collect_set(F.when(F.col("l_shipdate") == m1, F.col("l_suppkey"))).over(w_o)
    n_supp = F.size(F.collect_set("l_suppkey").over(w_o))
    m2 = F.max(F.when(smax < m1, F.col("l_shipdate"))).over(w_o)  # best of the others
    blocking = (
        lf.withColumn("at_max", at_max)
        .withColumn("n_supp", n_supp)
        .withColumn("m2", m2)
        .filter(
            (F.col("n_supp") >= 2)
            & (F.size("at_max") == 1)
            & (F.col("l_suppkey") == F.col("at_max")[0])
            & (F.col("l_shipdate") > F.col("m2"))
        )
    )
    return (
        blocking.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
