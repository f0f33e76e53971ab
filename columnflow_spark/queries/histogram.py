"""Histogramming operators (SURVEY §2.5/2.6: weighted N-dim hist fill,
variable binning, jagged-axis fills, partial-hist merging, cutflow, yields).

The hist engine (:mod:`columnflow_spark.hist`) compiles od.Variable-style
binnings to bin-index expressions and fills via one groupBy aggregation;
oracles reproduce the exact bin arithmetic (incl. the last-edge-inclusive
correction, reference hist_util.py:30) in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnflow_spark.hist import (
    Variable,
    bin_expr,
    ensure_bins,
    fill_hist,
    fold_flow_bins,
    merge_hists,
    rebin_axis,
)
from columnflow_spark.queries import query
from columnflow_spark.sources import load_table


def _regular_bin_sql(x: str, n: int, lo: float, hi: float) -> str:
    """SQL twin of hist.axes.bin_expr for a regular binning."""
    w = (hi - lo) / n
    return f"""
        CASE
            WHEN {x} IS NULL THEN -2
            WHEN {x} < {lo} THEN -1
            WHEN {x} > {hi} THEN {n}
            WHEN {x} = {hi} THEN {n - 1}
            ELSE least(CAST(floor(({x} - {lo}) / {w}) AS INT), {n})
        END
    """


# --- 1-D weighted hist, regular binning, under/overflow ---
@query(
    "hist_1d_price",
    oracle=f"""
    SELECT
        {_regular_bin_sql("l_extendedprice", 30, 0.0, 105000.0)} AS bin__price,
        count(*) AS n,
        round(sum(l_quantity), 4) AS sum_w,
        round(sum(l_quantity * l_quantity), 4) AS sum_w2
    FROM lineitem
    GROUP BY 1
    """,
)
def hist_1d_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"])
    var = Variable("price", "l_extendedprice", (30, 0.0, 105000.0))
    return fill_hist(li, [var], weight=F.col("l_quantity"))


# --- N-dim: categorical axes x regular axis (category/process/shift axes
# of the reference, tasks/histograms.py:270-323) ---
@query(
    "hist_2d_flag_price",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        {_regular_bin_sql("l_extendedprice", 20, 0.0, 110000.0)} AS bin__price,
        count(*) AS n,
        round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_w,
        round(sum(pow(l_extendedprice * (1 - l_discount), 2)), 4) AS sum_w2
    FROM lineitem
    GROUP BY 1, 2, 3
    """,
)
def hist_2d_flag_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    var = Variable("price", "l_extendedprice", (20, 0.0, 110000.0))
    w = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return fill_hist(li, [var], categorical=["l_returnflag", "l_linestatus"], weight=w)


# --- variable (explicit-edge) binning, last-edge-inclusive ---
@query(
    "hist_variable_edges",
    oracle="""
    SELECT
        CASE
            WHEN l_quantity IS NULL THEN -2
            WHEN l_quantity < 1.0 THEN -1
            WHEN l_quantity < 5.0 THEN 0
            WHEN l_quantity < 15.0 THEN 1
            WHEN l_quantity < 30.0 THEN 2
            WHEN l_quantity < 50.0 THEN 3
            WHEN l_quantity = 50.0 THEN 3
            ELSE 4
        END AS bin__qty,
        count(*) AS n,
        round(sum(1.0), 4) AS sum_w,
        round(sum(1.0), 4) AS sum_w2
    FROM lineitem
    GROUP BY 1
    """,
)
def hist_variable_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_quantity"])
    var = Variable("qty", "l_quantity", [1.0, 5.0, 15.0, 30.0, 50.0])
    return fill_hist(li, [var])


# --- jagged (object-level) fill: explode the collection then fill
# (reference broadcast of event-level vs object-level fill data,
# hist_util.py:30-140) ---
@query(
    "hist_jagged_object_axis",
    oracle=f"""
    SELECT
        CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END AS category,
        {_regular_bin_sql("l_extendedprice", 15, 0.0, 105000.0)} AS bin__item_price,
        count(*) AS n,
        round(sum(1.0), 4) AS sum_w,
        round(sum(1.0), 4) AS sum_w2
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
)
def hist_jagged_object_axis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.pipeline_demo import build_nested_events

    events = build_nested_events(spark, sf_dir)
    events = events.withColumn(
        "category", F.when(F.col("o_orderstatus") == "O", F.lit("open")).otherwise(F.lit("closed"))
    )
    # object-level variable -> explode the jagged axis first
    exploded = events.select("category", F.explode("items").alias("item"))
    var = Variable("item_price", F.col("item.price"), (15, 0.0, 105000.0))
    return fill_hist(exploded, [var], categorical=["category"])


# --- partial-hist merge across "files" (reference MergeHistograms,
# tasks/histograms.py:449): fill two halves, merge, equals one full fill ---
@query(
    "hist_merged_partials",
    oracle=f"""
    SELECT
        {_regular_bin_sql("o_totalprice", 25, 0.0, 500000.0)} AS bin__total,
        count(*) AS n,
        round(sum(1.0), 4) AS sum_w,
        round(sum(1.0), 4) AS sum_w2
    FROM orders
    GROUP BY 1
    """,
)
def hist_merged_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    var = Variable("total", "o_totalprice", (25, 0.0, 500000.0))
    h1 = fill_hist(orders.filter(F.col("o_orderkey") % 2 == 0), [var], round_to=None)
    h2 = fill_hist(orders.filter(F.col("o_orderkey") % 2 == 1), [var], round_to=None)
    return merge_hists([h1, h2])


# --- shift-axis union merge (reference MergeShiftedHistograms,
# tasks/histograms.py:515): nominal + shifted hists in one table ---
@query(
    "hist_shift_union",
    oracle=f"""
    SELECT 'nominal' AS shift,
        {_regular_bin_sql("l_extendedprice", 10, 0.0, 110000.0)} AS bin__price,
        count(*) AS n, round(sum(1.0), 4) AS sum_w, round(sum(1.0), 4) AS sum_w2
    FROM lineitem GROUP BY 2
    UNION ALL
    SELECT 'price_up' AS shift,
        {_regular_bin_sql("l_extendedprice * 1.05", 10, 0.0, 110000.0)} AS bin__price,
        count(*) AS n, round(sum(1.0), 4) AS sum_w, round(sum(1.0), 4) AS sum_w2
    FROM lineitem GROUP BY 2
    """,
)
def hist_shift_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_extendedprice"])
    li = li.withColumn("l_extendedprice_price_up", F.col("l_extendedprice") * 1.05)
    binning = (10, 0.0, 110000.0)
    nominal = fill_hist(li, [Variable("price", "l_extendedprice", binning)]).withColumn(
        "shift", F.lit("nominal")
    )
    from columnflow_spark.plans.shifts import Shift, apply_shift_aliases

    shifted_df = apply_shift_aliases(li, Shift("price_up", {"l_extendedprice": "l_extendedprice_price_up"}))
    shifted = fill_hist(shifted_df, [Variable("price", "l_extendedprice", binning)]).withColumn(
        "shift", F.lit("price_up")
    )
    return nominal.unionByName(shifted)


# --- shifted-variable overlay plot table (reference plot_shifted_variable,
# plotting/plot_functions_1d.py:232): per (shift, bin) the value, ratio to
# nominal (the ratio panel) and the shift's total offset percent (the
# "(+x.xx%)" legend annotation).  The draw step is
# plotting.render_shifted_variable; this registers the COMPUTE side on the
# driver-checked surface.  sum_w here is count-valued, so every ratio is
# an exact integer quotient — no fp-order sensitivity. ---
@query(
    "plot_shifted_overlay",
    oracle=f"""
    WITH h AS (
        SELECT 'nominal' AS shift,
            {_regular_bin_sql("l_extendedprice", 10, 0.0, 110000.0)} AS bin__price,
            sum(1.0) AS sum_w
        FROM lineitem GROUP BY 2
        UNION ALL
        SELECT 'price_up' AS shift,
            {_regular_bin_sql("l_extendedprice * 1.05", 10, 0.0, 110000.0)} AS bin__price,
            sum(1.0) AS sum_w
        FROM lineitem GROUP BY 2
    ),
    nom AS (SELECT bin__price, sum_w AS nom_w FROM h WHERE shift = 'nominal')
    SELECT h.shift, h.bin__price,
           round(h.sum_w, 4) AS w,
           round(h.sum_w / nom.nom_w, 4) AS ratio,
           round((sum(h.sum_w) OVER (PARTITION BY h.shift)
                  / sum(nom.nom_w) OVER (PARTITION BY h.shift) - 1) * 100, 2)
               AS total_diff_pct
    FROM h LEFT JOIN nom ON nom.bin__price = h.bin__price
    ORDER BY 1, 2
    """,
)
def plot_shifted_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.plotting import shifted_plot_data

    hist = hist_shift_union.__wrapped__(spark, sf_dir)
    return shifted_plot_data(hist, "bin__price").orderBy("shift", "bin__price")


# --- axis-bin manipulation: merge adjacent bins by re-aggregation
# (reference hist_util.py:563 merge_axis_bins) ---
@query(
    "hist_rebin_merge",
    oracle=f"""
    WITH fine AS (
        SELECT {_regular_bin_sql("o_totalprice", 20, 0.0, 500000.0)} AS b, o_totalprice AS w
        FROM orders
    )
    SELECT
        CASE WHEN b < 0 THEN b WHEN b >= 20 THEN 10 ELSE b // 2 END AS bin__total,
        count(*) AS n,
        round(sum(w), 4) AS sum_w,
        round(sum(w * w), 4) AS sum_w2
    FROM fine
    GROUP BY 1
    """,
)
def hist_rebin_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_totalprice"])
    var = Variable("total", "o_totalprice", (20, 0.0, 500000.0))
    fine = fill_hist(orders, [var], weight=F.col("o_totalprice"), round_to=None)
    return rebin_axis(fine, "bin__total", factor=2, n_bins=20)


# --- flow-bin folding: under/overflow folded into edge bins (reference
# plotting/plot_util.py:331 use_flow_bins) ---
@query(
    "hist_flow_folded",
    oracle=f"""
    WITH fine AS (
        SELECT {_regular_bin_sql("l_extendedprice", 12, 20000.0, 80000.0)} AS b
        FROM lineitem
    )
    SELECT
        CASE WHEN b = -1 THEN 0 WHEN b >= 12 THEN 11 ELSE b END AS bin__price,
        count(*) AS n,
        round(sum(1.0), 4) AS sum_w,
        round(sum(1.0), 4) AS sum_w2
    FROM fine
    WHERE b <> -2
    GROUP BY 1
    """,
)
def hist_flow_folded(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_extendedprice"])
    fine = fill_hist(li, [Variable("price", "l_extendedprice", (12, 20000.0, 80000.0))], round_to=None)
    return fold_flow_bins(fine, "bin__price", n_bins=12)


# --- cutflow: per-step cumulative selection counts (reference
# CreateCutflowHistograms, tasks/cutflow.py:46) ---
@query(
    "cutflow_steps",
    oracle="""
    SELECT 'initial' AS step, count(*) AS n FROM lineitem
    UNION ALL
    SELECT 'qty' AS step, count(*) AS n FROM lineitem WHERE l_quantity >= 5
    UNION ALL
    SELECT 'price' AS step, count(*) AS n FROM lineitem WHERE l_quantity >= 5 AND l_extendedprice >= 10000
    UNION ALL
    SELECT 'discount' AS step, count(*) AS n FROM lineitem
    WHERE l_quantity >= 5 AND l_extendedprice >= 10000 AND l_discount <= 0.05
    """,
)
def cutflow_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice", "l_discount"])
    steps = {
        "qty": F.col("l_quantity") >= 5,
        "price": F.col("l_extendedprice") >= 10000,
        "discount": F.col("l_discount") <= 0.05,
    }
    # one aggregation computes every cumulative step count (no per-step scans)
    aggs = [F.count(F.lit(1)).alias("initial")]
    cum = F.lit(True)
    for name, cond in steps.items():
        cum = cum & cond
        aggs.append(F.count_if(cum).alias(name))
    wide = li.agg(*aggs)
    names = ["initial", *steps]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return wide.selectExpr(f"stack({len(names)}, {stack}) AS (step, n)")


# --- yield table: per-process/category yields with sum_w / sum_w2
# (reference CreateYieldTable, tasks/yields.py:44) ---
@query(
    "yield_table",
    oracle="""
    SELECT
        o_orderstatus AS process,
        o_orderpriority AS category,
        count(*) AS n,
        round(sum(o_totalprice), 4) AS sum_w,
        round(sum(o_totalprice * o_totalprice), 4) AS sum_w2
    FROM orders
    GROUP BY 1, 2
    """,
)
def yield_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = F.col("o_totalprice")
    return orders.groupBy(
        F.col("o_orderstatus").alias("process"),
        F.col("o_orderpriority").alias("category"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(w), 4).alias("sum_w"),
        F.round(F.sum(w * w), 4).alias("sum_w2"),
    )


# --- dense-axis completion: missing in-range bins materialized with zero
# content (reference hist_util.py:482 ensure_bin_exists — plotting and
# datacard writers need dense axes) ---
@query(
    "hist_ensure_bins",
    oracle=f"""
    WITH h AS (
        SELECT {_regular_bin_sql("l_extendedprice", 10, 0.0, 105000.0)} AS b,
               count(*) AS n, sum(l_quantity) AS sum_w, sum(l_quantity * l_quantity) AS sum_w2
        FROM lineitem WHERE l_extendedprice < 30000
        GROUP BY 1
    ),
    bins AS (SELECT unnest(generate_series(0, 9)) AS b)
    SELECT bins.b AS bin__price,
           coalesce(h.n, 0) AS n,
           round(coalesce(h.sum_w, 0.0), 4) AS sum_w,
           round(coalesce(h.sum_w2, 0.0), 4) AS sum_w2
    FROM bins LEFT JOIN h ON h.b = bins.b
    """,
)
def hist_ensure_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"]).filter(
        F.col("l_extendedprice") < 30000
    )
    var = Variable("price", "l_extendedprice", (10, 0.0, 105000.0))
    sparse = fill_hist(li, [var], weight=F.col("l_quantity"), round_to=None)
    dense = ensure_bins(sparse, "bin__price", n_bins=10)
    return dense.select(
        "bin__price", "n", F.round("sum_w", 4).alias("sum_w"), F.round("sum_w2", 4).alias("sum_w2")
    )


# --- dijet-mass analog: invariant mass of the 4-vector sum of the two
# leading objects (reference production/example.py:44-49), synthetic
# (pt, eta, phi, m) derived from item columns; exp-based cosh/sinh keep
# the arithmetic engine-portable ---
@query(
    "leading_pair_mass",
    oracle="""
    WITH ranked AS (
        SELECT l_orderkey,
               l_extendedprice / 1000.0 AS pt,
               l_quantity / 10.0 AS eta,
               l_discount * 50.0 AS phi,
               l_extendedprice / 10000.0 AS m,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_extendedprice DESC, l_linenumber, l_quantity, l_discount
               ) AS rk
        FROM lineitem
    ),
    pairs AS (
        SELECT a.l_orderkey,
               a.pt AS pt1, a.eta AS eta1, a.phi AS phi1, a.m AS m1,
               b.pt AS pt2, b.eta AS eta2, b.phi AS phi2, b.m AS m2
        FROM ranked a JOIN ranked b ON a.l_orderkey = b.l_orderkey AND a.rk = 1 AND b.rk = 2
    )
    SELECT l_orderkey AS okey,
           -- integer-scaled CENTI-mass: the exp/cos libm implementations
           -- differ by ~1 ulp between engines and the E^2 - p^2
           -- cancellation amplifies that to ~4e-9 absolute (measured at
           -- sf1, 1.4M pairs) — a 0.01 grid makes a boundary flip
           -- ~2e-3-probable per full dataset, and the sf0.01/0.1/1
           -- datasets are verified hit-free
           CAST(round(100 * sqrt(greatest(
               pow(sqrt(pow(pt1 * (exp(eta1) + exp(-eta1)) / 2.0, 2) + m1 * m1)
                   + sqrt(pow(pt2 * (exp(eta2) + exp(-eta2)) / 2.0, 2) + m2 * m2), 2)
               - (pow(pt1 * cos(phi1) + pt2 * cos(phi2), 2)
                  + pow(pt1 * sin(phi1) + pt2 * sin(phi2), 2)
                  + pow(pt1 * (exp(eta1) - exp(-eta1)) / 2.0
                        + pt2 * (exp(eta2) - exp(-eta2)) / 2.0, 2)),
               0.0))) AS BIGINT) AS pair_mass
    FROM pairs
    """,
)
def leading_pair_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.functions.math import four_vector_sum_mass
    from columnflow_spark.pipeline_demo import build_nested_events

    events = build_nested_events(spark, sf_dir).filter(F.size("items") >= 2)
    # leading two by price desc with a total tie-break order
    ranked = F.array_sort(
        "items",
        lambda a, b: F.when(a["price"] > b["price"], -1)
        .when(a["price"] < b["price"], 1)
        .when(a["linenumber"] < b["linenumber"], -1)
        .when(a["linenumber"] > b["linenumber"], 1)
        .when(a["qty"] < b["qty"], -1)
        .when(a["qty"] > b["qty"], 1)
        .when(a["discount"] < b["discount"], -1)
        .when(a["discount"] > b["discount"], 1)
        .otherwise(0),
    )
    j1, j2 = F.element_at(ranked, 1), F.element_at(ranked, 2)

    def kin(j):
        return (j["price"] / 1000.0, j["qty"] / 10.0, j["discount"] * 50.0, j["price"] / 10000.0)

    mass = four_vector_sum_mass(*kin(j1), *kin(j2))
    return events.select(
        F.col("o_orderkey").alias("okey"),
        F.round(F.lit(100) * mass, 0).cast("long").alias("pair_mass"),
    )


# --- pattern-based category-bin selection + reduce (reference
# hist_util.py:418 select_category_bins: plotting/datacards merge category
# groups by regex over the categorical axis, then sum it away).  Pure
# re-aggregation over the tiny hist table. ---
@query(
    "hist_select_category_bins",
    oracle=f"""
    SELECT
        {_regular_bin_sql("l_extendedprice", 15, 0.0, 105000.0)} AS bin__price,
        count(*) AS n,
        round(sum(l_quantity), 4) AS sum_w,
        round(sum(l_quantity * l_quantity), 4) AS sum_w2
    FROM lineitem
    WHERE l_returnflag IN ('A', 'N')
    GROUP BY 1
    """,
)
def hist_select_category_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.hist import select_category_bins

    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity", "l_returnflag"]
    )
    var = Variable("price", "l_extendedprice", (15, 0.0, 105000.0))
    hist = fill_hist(li, [var], categorical=["l_returnflag"], weight=F.col("l_quantity"), round_to=None)
    out = select_category_bins(hist, "l_returnflag", "^[AN]$")
    return out.select(
        "bin__price", "n", F.round("sum_w", 4).alias("sum_w"), F.round("sum_w2", 4).alias("sum_w2")
    )


# --- categorical-axis densification: expected-but-unfilled category
# values inserted with zero content (reference hist_util.py:618
# insert_axis_values — shift union and datacard writers need every
# expected category present) ---
@query(
    "hist_insert_axis_values",
    oracle="""
    WITH h AS (
        SELECT o_orderstatus, count(*) AS n,
               round(sum(o_totalprice / 1000.0), 4) AS sum_w,
               round(sum(pow(o_totalprice / 1000.0, 2)), 4) AS sum_w2
        FROM orders GROUP BY 1
    ),
    wanted(o_orderstatus) AS (VALUES ('O'), ('F'), ('P'), ('X'), ('Z'))
    SELECT w.o_orderstatus AS o_orderstatus,
           coalesce(h.n, 0) AS n,
           coalesce(h.sum_w, 0.0) AS sum_w,
           coalesce(h.sum_w2, 0.0) AS sum_w2
    FROM wanted w LEFT JOIN h USING (o_orderstatus)
    UNION ALL
    SELECT h.o_orderstatus, h.n, h.sum_w, h.sum_w2
    FROM h WHERE h.o_orderstatus NOT IN (SELECT o_orderstatus FROM wanted)
    """,
)
def hist_insert_axis_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.hist import insert_axis_values

    orders = load_table(spark, sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    w = F.col("o_totalprice") / 1000.0
    hist = fill_hist(orders, [], categorical=["o_orderstatus"], weight=w)
    return insert_axis_values(hist, "o_orderstatus", ["O", "F", "P", "X", "Z"])


# --- plot-ready stacked histogram (reference PlotVariables1D,
# tasks/plotting.py:118 + plot_functions_1d.py:37): the stack/band/ratio
# COMPUTATION runs as DataFrame windows over the hist table (cluster-side
# at scale); the matplotlib draw is a thin gated consumer
# (columnflow_spark/plotting.py). ---
@query(
    "plot_ready_stack",
    oracle=f"""
    WITH h AS (
        SELECT l_returnflag,
               {_regular_bin_sql("l_extendedprice", 20, 0.0, 110000.0)} AS bin__price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_w,
               round(sum(pow(l_extendedprice * (1 - l_discount), 2)), 4) AS sum_w2
        FROM lineitem
        GROUP BY 1, 2
    ),
    r AS (
        SELECT *, CASE l_returnflag WHEN 'N' THEN 1 WHEN 'R' THEN 2 WHEN 'A' THEN 3 END AS rk
        FROM h
    )
    SELECT bin__price, l_returnflag,
           round(sum(sum_w) OVER cum - sum_w, 4) AS y_low,
           round(sum(sum_w) OVER cum, 4) AS y_high,
           round(sum(sum_w) OVER tot, 4) AS mc_total,
           round(sqrt(sum(sum_w2) OVER tot), 4) AS mc_err
    FROM r
    WINDOW cum AS (PARTITION BY bin__price ORDER BY rk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           tot AS (PARTITION BY bin__price)
    """,
)
def plot_ready_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.plotting import stack_plot_data

    li = load_table(spark, sf_dir, "lineitem")
    var = Variable("price", "l_extendedprice", (20, 0.0, 110000.0))
    w = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    hist = fill_hist(li, [var], categorical=["l_returnflag"], weight=w)
    return stack_plot_data(hist, "l_returnflag", "bin__price", ["N", "R", "A"])


# --- profile histogram: per-x-bin mean and width of a second variable
# (reference plot_util.py:933 get_profile_width / :955
# get_profile_variations — the TProfile shape).  Moments via the same
# closed-form expression on both engines (Spark's incremental stddev
# would differ in summation order).  First-order sums of the
# integer-valued y are IEEE-exact; sum(y*y) can pass 2^53 at large scale
# and become order-dependent — the round-4 compare absorbs that at test
# SFs; aggregate s2 as DECIMAL for bit-exactness beyond. ---
@query(
    "hist_profile_qty_price",
    oracle=f"""
    WITH binned AS (
        SELECT {_regular_bin_sql("l_quantity", 10, 0.0, 50.0)} AS bin__qty,
               round(l_extendedprice * 100, 0) AS y
        FROM lineitem
    ),
    m AS (
        SELECT bin__qty, CAST(count(*) AS DOUBLE) AS n, sum(y) AS s, sum(y * y) AS s2
        FROM binned GROUP BY bin__qty
    )
    SELECT bin__qty,
           CAST(n AS BIGINT) AS n,
           round(s / n / 100, 4) AS mean_price,
           round(sqrt((s2 - s * s / n) / (n - 1)) / 100, 4) AS width_price
    FROM m
    WHERE n > 1
    ORDER BY bin__qty
    """,
)
def hist_profile_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])
    var = Variable("qty", "l_quantity", (10, 0.0, 50.0))
    binned = li.select(
        bin_expr(var).alias("bin__qty"),
        F.round(F.col("l_extendedprice") * 100, 0).alias("y"),
    )
    m = binned.groupBy("bin__qty").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    n, s, s2 = F.col("n"), F.col("s"), F.col("s2")
    return (
        m.filter(n > 1)
        .select(
            "bin__qty",
            n.cast("long").alias("n"),
            F.round(s / n / 100, 4).alias("mean_price"),
            F.round(F.sqrt((s2 - s * s / n) / (n - 1)) / 100, 4).alias("width_price"),
        )
        .orderBy("bin__qty")
    )


# --- systematic-uncertainty band: the quadrature envelope over shift
# PAIRS that a stack plot's hatched band and a datacard's shape column
# consume (reference plot_util.py systematic band assembly; the
# per-shift inputs are the hist_shift_union table shape).  Per bin:
# err_up² = Σ_s max(up_s − nom, down_s − nom, 0)², err_dn mirrored —
# the standard asymmetric combination.  Compute is a conditional pivot
# over the (bins x shifts) table: one groupBy, no joins.  Counts are
# integer-valued so every deviation is exact; only the final sqrt is
# rounded. ---
_BAND_SHIFTS = {"price_a": (1.05, 0.95), "price_b": (1.10, 0.90)}


def _band_hist_sql() -> str:
    sels = [
        f"""
        SELECT 'nominal' AS shift,
            {_regular_bin_sql("l_extendedprice", 10, 0.0, 110000.0)} AS bin__price,
            sum(1.0) AS sum_w
        FROM lineitem GROUP BY 2"""
    ]
    for name, (up, dn) in _BAND_SHIFTS.items():
        for d, scale in (("up", up), ("down", dn)):
            sels.append(
                f"""
        SELECT '{name}_{d}' AS shift,
            {_regular_bin_sql(f"l_extendedprice * {scale}", 10, 0.0, 110000.0)} AS bin__price,
            sum(1.0) AS sum_w
        FROM lineitem GROUP BY 2"""
            )
    return "\n        UNION ALL".join(sels)


@query(
    "hist_systematic_band",
    oracle=f"""
    WITH h AS ({_band_hist_sql()}),
    p AS (
        SELECT bin__price,
            sum(CASE WHEN shift = 'nominal' THEN sum_w ELSE 0 END) AS nom,
            {", ".join(
                f"sum(CASE WHEN shift = '{n}_up' THEN sum_w ELSE 0 END) AS {n}_up, "
                f"sum(CASE WHEN shift = '{n}_down' THEN sum_w ELSE 0 END) AS {n}_down"
                for n in _BAND_SHIFTS
            )}
        FROM h GROUP BY bin__price
    )
    SELECT bin__price, round(nom, 4) AS nominal,
        round(sqrt({" + ".join(
            f"pow(greatest({n}_up - nom, {n}_down - nom, 0), 2)" for n in _BAND_SHIFTS
        )}), 4) AS err_up,
        round(sqrt({" + ".join(
            f"pow(greatest(nom - {n}_up, nom - {n}_down, 0), 2)" for n in _BAND_SHIFTS
        )}), 4) AS err_dn
    FROM p ORDER BY bin__price
    """,
)
def hist_systematic_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_extendedprice"])
    binning = (10, 0.0, 110000.0)
    hists = [
        fill_hist(li, [Variable("price", "l_extendedprice", binning)]).withColumn(
            "shift", F.lit("nominal")
        )
    ]
    for name, (up, dn) in _BAND_SHIFTS.items():
        for d, scale in (("up", up), ("down", dn)):
            shifted = li.withColumn("l_extendedprice", F.col("l_extendedprice") * scale)
            hists.append(
                fill_hist(shifted, [Variable("price", "l_extendedprice", binning)]).withColumn(
                    "shift", F.lit(f"{name}_{d}")
                )
            )
    h = hists[0]
    for x in hists[1:]:
        h = h.unionByName(x)
    # conditional pivot: one grouped pass collapses the shift axis
    aggs = [F.sum(F.when(F.col("shift") == "nominal", F.col("sum_w")).otherwise(0.0)).alias("nom")]
    for n in _BAND_SHIFTS:
        for d in ("up", "down"):
            aggs.append(
                F.sum(
                    F.when(F.col("shift") == f"{n}_{d}", F.col("sum_w")).otherwise(0.0)
                ).alias(f"{n}_{d}")
            )
    p = h.groupBy("bin__price").agg(*aggs)
    up_terms = [
        F.pow(F.greatest(F.col(f"{n}_up") - F.col("nom"), F.col(f"{n}_down") - F.col("nom"), F.lit(0.0)), 2)
        for n in _BAND_SHIFTS
    ]
    dn_terms = [
        F.pow(F.greatest(F.col("nom") - F.col(f"{n}_up"), F.col("nom") - F.col(f"{n}_down"), F.lit(0.0)), 2)
        for n in _BAND_SHIFTS
    ]
    sum_up = up_terms[0]
    for t in up_terms[1:]:
        sum_up = sum_up + t
    sum_dn = dn_terms[0]
    for t in dn_terms[1:]:
        sum_dn = sum_dn + t
    return p.select(
        "bin__price",
        F.round("nom", 4).alias("nominal"),
        F.round(F.sqrt(sum_up), 4).alias("err_up"),
        F.round(F.sqrt(sum_dn), 4).alias("err_dn"),
    ).orderBy("bin__price")


# --- equal-frequency (quantile) binning: bin edges from exact quartiles
# of the data rather than a fixed grid (the adaptive-binning variant of
# plot_util's binning helpers).  Edges come from percentile/quantile_cont
# — identical linear-interpolation definition on both engines, and EXACT
# here because l_quantity is integer-valued and quartile fractions are
# dyadic (k * 0.25 / 0.75 products are exact doubles), so the edge
# literals match bit-for-bit and no value sits on a rounding knife-edge.
# Compute: one tiny percentile agg (3 doubles to the driver — the same
# bounded footprint as a broadcast), then a literal when-chain bin pass. ---
@query(
    "hist_quantile_binned",
    oracle="""
    WITH e AS (
        SELECT quantile_cont(l_quantity, [0.25, 0.5, 0.75]) AS q FROM lineitem
    )
    SELECT
        CASE
            WHEN l_quantity < q[1] THEN 0
            WHEN l_quantity < q[2] THEN 1
            WHEN l_quantity < q[3] THEN 2
            ELSE 3
        END AS bin__qty_quartile,
        count(*) AS n,
        round(sum(l_extendedprice), 4) AS sum_w
    FROM lineitem CROSS JOIN e
    GROUP BY 1
    ORDER BY 1
    """,
)
def hist_quantile_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])
    q1, q2, q3 = li.agg(
        F.percentile("l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    ).first()[0]
    b = (
        F.when(F.col("l_quantity") < q1, 0)
        .when(F.col("l_quantity") < q2, 1)
        .when(F.col("l_quantity") < q3, 2)
        .otherwise(3)
    )
    return (
        li.groupBy(b.alias("bin__qty_quartile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_w"),
        )
        .orderBy("bin__qty_quartile")
    )


# --- cut-efficiency curve (reference plot_variable_efficiency,
# plotting/plot_functions_1d.py:121): per process, each bin shows the
# efficiency of requiring value >= that bin's edge — a reverse cumulative
# sum over the (tiny) per-process hist table divided by the process
# total.  The corpus is aggregated ONCE into bins; the cumsum window runs
# over bins-per-process rows only. ---
@query(
    "efficiency_curve",
    oracle=f"""
    WITH h AS (
        SELECT l_returnflag AS process,
               {_regular_bin_sql("l_extendedprice", 20, 0.0, 110000.0)} AS bin__price,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2
    )
    SELECT process, bin__price,
           round(sum(n) OVER (PARTITION BY process ORDER BY bin__price DESC)
                 * 1.0 / sum(n) OVER (PARTITION BY process), 4) AS efficiency
    FROM h
    ORDER BY process, bin__price
    """,
)
def efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    h = fill_hist(
        li.withColumnRenamed("l_returnflag", "process"),
        [Variable("price", "l_extendedprice", (20, 0.0, 110000.0))],
        categorical=["process"],
        round_to=None,
    )
    from pyspark.sql import Window as W

    wc = (
        W.partitionBy("process")
        .orderBy(F.desc("bin__price"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wt = W.partitionBy("process")
    return h.select(
        "process",
        "bin__price",
        F.round(F.sum("n").over(wc) * 1.0 / F.sum("n").over(wt), 4).alias("efficiency"),
    ).orderBy("process", "bin__price")
