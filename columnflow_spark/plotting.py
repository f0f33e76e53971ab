"""Plot-data layer: the reference's 1-D plot tasks (stacked process
histograms with statistical error bands and a data/MC ratio panel —
reference columnflow/plotting/plot_functions_1d.py:37 ``plot_variable_per_process``
and columnflow/tasks/plotting.py:118 ``PlotVariables1D``) re-expressed as
DataFrame computations over the canonical long-format hist table.

The reference couples "compute the stack" and "draw it" inside one
matplotlib function; at scale the compute side belongs on the cluster
(hist tables can be wide: many categories x shifts x bins), so this module
returns plot-ready DataFrames — cumulative stack envelopes, total-MC
error bands, ratio-panel series — and keeps the draw step (`render_stack_1d`)
a thin driver-side consumer, gated on matplotlib availability (not
installed in this environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def stack_plot_data(
    hist: DataFrame,
    process_col: str,
    bin_col: str,
    process_order: list[str],
    round_to: int = 4,
) -> DataFrame:
    """Per (bin, process) stacking envelope: ``y_low``/``y_high`` are the
    cumulative stacked weight below/including the process (in the given
    draw order), plus per-bin totals and the statistical band
    ``mc_err = sqrt(sum of sum_w2)`` (the reference's ``poisson_unc``
    default, plot_util.py).  One window cumsum per bin — partitioned by
    the bin, ordered by the fixed process rank, so no global sort."""
    rank = F.array_position(F.array(*[F.lit(p) for p in process_order]), F.col(process_col))
    h = hist.withColumn("_rank", rank).filter(F.col("_rank") > 0)
    wc = (
        W.partitionBy(bin_col)
        .orderBy("_rank")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wt = W.partitionBy(bin_col)
    y_high = F.sum("sum_w").over(wc)
    mc_total = F.sum("sum_w").over(wt)
    mc_err = F.sqrt(F.sum("sum_w2").over(wt))
    return h.select(
        F.col(bin_col),
        F.col(process_col),
        F.round(y_high - F.col("sum_w"), round_to).alias("y_low"),
        F.round(y_high, round_to).alias("y_high"),
        F.round(mc_total, round_to).alias("mc_total"),
        F.round(mc_err, round_to).alias("mc_err"),
    )


def ratio_plot_data(
    mc_hist: DataFrame,
    data_hist: DataFrame,
    bin_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Ratio-panel series (reference plot_functions_1d.py ratio axis):
    data/MC per bin with the relative MC uncertainty band."""
    mc = mc_hist.groupBy(bin_col).agg(
        F.sum("sum_w").alias("mc"), F.sqrt(F.sum("sum_w2")).alias("mc_err")
    )
    data = data_hist.groupBy(bin_col).agg(F.sum("sum_w").alias("data"))
    return mc.join(data, bin_col, "left").select(
        F.col(bin_col),
        F.round(F.coalesce(F.col("data"), F.lit(0.0)) / F.col("mc"), round_to).alias("ratio"),
        F.round(F.col("mc_err") / F.col("mc"), round_to).alias("rel_unc"),
    )


def render_stack_1d(stack_rows, ratio_rows=None, title: str = ""):  # pragma: no cover
    """Driver-side draw step over collected plot-ready rows.  Requires
    matplotlib (not available in this container) — the compute path above
    is the engine's job; this is deliberately a thin consumer."""
    try:
        import matplotlib.pyplot as plt  # noqa: PLC0415
    except ImportError as exc:  # matplotlib absent here by design
        raise NotImplementedError(
            "matplotlib is not installed in this environment; "
            "stack_plot_data/ratio_plot_data outputs are render-ready"
        ) from exc
    fig, ax = plt.subplots()
    for row in stack_rows:
        ax.bar(row["bin"], row["y_high"] - row["y_low"], bottom=row["y_low"])
    ax.set_title(title)
    return fig
