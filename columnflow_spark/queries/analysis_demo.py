"""Config-driven analysis template, end-to-end (reference
analysis_templates/cms_minimal/.../config/analysis___cf_short_name_lc__.py:
an analysis is *declared* — processes with cross-sections, datasets,
hierarchical categories, shifts with column aliases, variables — and the
task graph executes the declaration; no literals in the execution path).

This module is the engine's equivalent: one metadata catalog instance
drives categorization (leaf-selection compilation), normalization (process
xsec weights), systematic variation (shift column aliases) and the final
per-(shift, category) yield table.  The DuckDB oracle is *generated from
the same catalog objects* at registration time, so the config → plan
compilation itself is what the hash-compare verifies.

Execution shape at 100 TB: codegen'd case-whens (categories, process
weights), a per-shift branch union and one groupBy — no joins, no Python.
The union mirrors the reference's task model (each shift is its own task
over the store), which costs one scan per shift; when all shifts live in
the same stage, the single-scan alternative is an ``explode`` over a
literal array<struct<shift,scale>> — used by ``hist_shift_union``'s merge
stage — at the price of bypassing the column-alias mechanism this query
exists to demonstrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnflow_spark.catalog import (
    Analysis,
    Category,
    CategoryGroup,
    Config,
    Dataset,
    Process,
    add_shift_aliases,
    create_category_combinations,
    leaf_category_ids_column,
)
from columnflow_spark.queries import query
from columnflow_spark.sources import load_table

ECM = 13.6


def build_demo_analysis() -> Analysis:
    """The demo declaration (reference analysis template shape)."""
    ana = Analysis("demo_analysis", 1)
    cfg = ana.add_config(Config("tpch_campaign", 1))

    # process tree with cross-sections: priorities roll up into urgent /
    # relaxed parents (xsec of a parent = sum of leaves)
    urgent = cfg.add_process(Process("urgent", 100))
    urgent.add_process(Process("p_1_urgent", 110, xsecs={ECM: 30.0}))
    urgent.add_process(Process("p_2_high", 120, xsecs={ECM: 20.0}))
    relaxed = cfg.add_process(Process("relaxed", 200))
    relaxed.add_process(Process("p_3_medium", 130, xsecs={ECM: 15.0}))
    relaxed.add_process(Process("p_4_not_specified", 140, xsecs={ECM: 10.0}))
    relaxed.add_process(Process("p_5_low", 150, xsecs={ECM: 5.0}))

    cfg.add_dataset(Dataset("orders_mc", 1, is_mc=True, n_files=1))

    # category axes -> full combination layer
    status = [
        Category("open", 10, selection="o_orderstatus = 'O'"),
        Category("finished", 20, selection="o_orderstatus = 'F'"),
        Category("partial", 30, selection="o_orderstatus NOT IN ('O', 'F')"),
    ]
    size = [
        Category("small", 1, selection="o_totalprice < 150000"),
        Category("big", 2, selection="o_totalprice >= 150000"),
    ]
    for c in status + size:
        cfg.add_category(c)
    create_category_combinations(
        cfg,
        {
            "status": CategoryGroup(categories=status, is_complete=True, has_overlap=False),
            "size": CategoryGroup(categories=size, is_complete=True, has_overlap=False),
        },
        lambda cats: "__".join(c.name for c in cats.values()),
    )

    # systematic: price scale up/down as column aliases
    cfg.add_shift("nominal", 0)
    cfg.add_shift("price_up", 1)
    cfg.add_shift("price_down", 2)
    add_shift_aliases(cfg, "price", {"o_totalprice": "o_totalprice_{direction}"})

    cfg.add_variable(
        "totalprice", 1, expression="o_totalprice", binning=(10, 0.0, 500000.0),
        aux={"x_title": "order total price"},
    )
    return ana


_ANALYSIS = build_demo_analysis()
_CFG = _ANALYSIS.get_config("tpch_campaign")
_PRIORITY_TO_PROCESS = {
    "1-URGENT": "p_1_urgent",
    "2-HIGH": "p_2_high",
    "3-MEDIUM": "p_3_medium",
    "4-NOT SPECIFIED": "p_4_not_specified",
    "5-LOW": "p_5_low",
}
_SHIFT_SCALE = {"nominal": 1.0, "price_up": 1.05, "price_down": 0.95}


def _combo_leaves() -> list:
    return [c for c in _CFG.iter_unique_categories() if c.is_leaf and "__" in c.name]


def _oracle_sql() -> str:
    """Generated from the SAME catalog objects the Spark path compiles —
    the oracle checks the config→plan translation, not hand-kept literals."""
    cat_case = " ".join(
        f"WHEN {c.selection_expr()} THEN '{c.name}'" for c in _combo_leaves()
    )
    weight_case = " ".join(
        f"WHEN o_orderpriority = '{prio}' THEN {_CFG.get_process(pname).get_xsec(ECM)!r}"
        for prio, pname in _PRIORITY_TO_PROCESS.items()
    )
    shifted = " UNION ALL ".join(
        f"SELECT '{name}' AS shift, o_orderpriority, o_orderstatus, "
        f"o_totalprice * {scale!r} AS o_totalprice FROM orders"
        for name, scale in _SHIFT_SCALE.items()
    )
    return f"""
    WITH shifted AS ({shifted}),
    tagged AS (
        SELECT shift,
               CASE {cat_case} END AS category,
               CASE {weight_case} ELSE 0.0 END AS w
        FROM shifted
    )
    SELECT shift, category,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(w), 4) AS sum_w
    FROM tagged
    GROUP BY shift, category
    """


@query("analysis_template_yields", oracle=_oracle_sql())
def analysis_template_yields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declaration-driven execution: the catalog compiles to (a) the
    category when-array (leaf_category_ids_column), (b) the process-xsec
    weight case, (c) per-shift scaled columns aliased onto the nominal
    name (plans/shifts apply step) — then one union + one groupBy."""
    from columnflow_spark.plans.shifts import apply_shift_aliases

    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    )

    # weight: priority -> leaf process -> xsec (codegen'd case)
    weight = F.lit(0.0)
    for prio, pname in _PRIORITY_TO_PROCESS.items():
        weight = (
            F.when(F.col("o_orderpriority") == prio, F.lit(_CFG.get_process(pname).get_xsec(ECM)))
            .otherwise(weight)
        )

    leaves = _combo_leaves()
    branches = []
    for shift_name, scale in _SHIFT_SCALE.items():
        shift = _CFG.get_shift(shift_name)
        # produce the shifted source column, then alias it onto the nominal
        # name exactly the way the shift planner does after a scan
        branch = orders.withColumns(
            {f"o_totalprice_{d}": F.col("o_totalprice") * s
             for d, s in (("up", 1.05), ("down", 0.95))}
        )
        branch = apply_shift_aliases(branch, shift.to_plan_shift())
        branch = branch.withColumn("category_ids", leaf_category_ids_column(_CFG, roots=leaves))
        branches.append(
            branch.select(
                F.lit(shift_name).alias("shift"),
                F.element_at("category_ids", 1).alias("cat_id"),
                weight.alias("w"),
            )
        )
    unioned = branches[0]
    for b in branches[1:]:
        unioned = unioned.unionByName(b)
    id_to_name = F.create_map(
        *[x for c in leaves for x in (F.lit(c.id), F.lit(c.name))]
    )
    return (
        unioned.withColumn("category", id_to_name[F.col("cat_id")])
        .groupBy("shift", "category")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("w"), 4).alias("sum_w"))
    )


def _stack_oracle_sql() -> str:
    """SQL twin of the catalog-driven stack: same bin arithmetic as the
    config's VariableDef, same leaf→parent process rollup, same mc/data
    split and xsec weights — all generated from the one catalog."""
    from columnflow_spark.queries.histogram import _regular_bin_sql

    var = _CFG.get_variable("totalprice")
    n, lo, hi = var.binning
    bin_sql = _regular_bin_sql(var.expression, n, lo, hi)
    parent_case = " ".join(
        f"WHEN o_orderpriority = '{prio}' THEN '{_CFG.get_process(pname).parent.name}'"
        for prio, pname in _PRIORITY_TO_PROCESS.items()
    )
    weight_case = " ".join(
        f"WHEN o_orderpriority = '{prio}' THEN {_CFG.get_process(pname).get_xsec(ECM)!r}"
        for prio, pname in _PRIORITY_TO_PROCESS.items()
    )
    return f"""
    WITH tagged AS (
        SELECT {bin_sql} AS bin__totalprice,
               CASE {parent_case} END AS process,
               CASE {weight_case} ELSE 0.0 END AS w,
               o_orderkey % 5 = 0 AS is_data
        FROM orders
    ),
    mc AS (
        SELECT bin__totalprice, process, sum(w) AS sum_w, sum(w * w) AS sum_w2
        FROM tagged WHERE NOT is_data
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, CASE process WHEN 'urgent' THEN 1 WHEN 'relaxed' THEN 2 END AS rk FROM mc
    ),
    stacked AS (
        SELECT bin__totalprice, process,
               round(sum(sum_w) OVER cum - sum_w, 4) AS y_low,
               round(sum(sum_w) OVER cum, 4) AS y_high,
               round(sum(sum_w) OVER tot, 4) AS mc_total,
               round(sqrt(sum(sum_w2) OVER tot), 4) AS mc_err
        FROM ranked
        WINDOW cum AS (PARTITION BY bin__totalprice ORDER BY rk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               tot AS (PARTITION BY bin__totalprice)
    ),
    data AS (
        SELECT bin__totalprice, CAST(count(*) AS DOUBLE) AS n_data
        FROM tagged WHERE is_data GROUP BY 1
    )
    SELECT s.bin__totalprice, s.process, s.y_low, s.y_high, s.mc_total, s.mc_err,
           round(coalesce(d.n_data, 0.0) / s.mc_total, 4) AS data_over_mc
    FROM stacked s LEFT JOIN data d USING (bin__totalprice)
    ORDER BY s.bin__totalprice, s.process
    """


@query("analysis_template_stack", oracle=_stack_oracle_sql())
def analysis_template_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-driven plot production end-to-end (reference
    PlotVariables1D, tasks/plotting.py:118): the config's VariableDef
    supplies the binning, the process tree supplies the leaf→parent rollup
    and xsec weights, the dataset split supplies mc vs data, and the stack
    envelope + ratio come from the plotting layer's window forms — one
    scan, one hist aggregation per side, windows over the tiny hist table."""
    from columnflow_spark.hist.axes import bin_expr
    from columnflow_spark.plotting import stack_plot_data

    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderpriority"]
    )
    var = _CFG.get_variable("totalprice").to_hist_variable()
    parent = F.lit(None).cast("string")
    weight = F.lit(0.0)
    for prio, pname in _PRIORITY_TO_PROCESS.items():
        proc = _CFG.get_process(pname)
        parent = F.when(F.col("o_orderpriority") == prio, proc.parent.name).otherwise(parent)
        weight = F.when(F.col("o_orderpriority") == prio, F.lit(proc.get_xsec(ECM))).otherwise(weight)
    tagged = orders.select(
        bin_expr(var).alias("bin__totalprice"),
        parent.alias("process"),
        weight.alias("w"),
        (F.col("o_orderkey") % 5 == 0).alias("is_data"),
    )
    mc = (
        tagged.filter(~F.col("is_data"))
        .groupBy("bin__totalprice", "process")
        .agg(F.sum("w").alias("sum_w"), F.sum(F.col("w") * F.col("w")).alias("sum_w2"))
    )
    stacked = stack_plot_data(mc, "process", "bin__totalprice", ["urgent", "relaxed"])
    data = (
        tagged.filter("is_data")
        .groupBy("bin__totalprice")
        .agg(F.count(F.lit(1)).cast("double").alias("n_data"))
    )
    return (
        stacked.join(data, "bin__totalprice", "left")
        .select(
            "bin__totalprice", "process", "y_low", "y_high", "mc_total", "mc_err",
            F.round(F.coalesce("n_data", F.lit(0.0)) / F.col("mc_total"), 4).alias("data_over_mc"),
        )
        .orderBy("bin__totalprice", "process")
    )
