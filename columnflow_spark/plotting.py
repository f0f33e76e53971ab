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


def heatmap_plot_data(
    hist: DataFrame,
    bin_x: str,
    bin_y: str,
    round_to: int = 4,
) -> DataFrame:
    """2-D plot table (reference plotting/plot_functions_2d.py:36
    ``plot_2d``): per-cell weight plus the row-normalized share, computed
    with one grouped pass + a broadcast-size per-row total."""
    cells = hist.groupBy(bin_x, bin_y).agg(F.sum("sum_w").alias("w"))
    w_row = W.partitionBy(bin_x)
    return cells.select(
        F.col(bin_x),
        F.col(bin_y),
        F.round("w", round_to).alias("w"),
        F.round(F.col("w") / F.sum("w").over(w_row), round_to).alias("row_share"),
    )


def render_heatmap_2d(
    rows,
    title: str = "",
    out_path: str | None = None,
    width: int = 640,
    height: int = 480,
    value_col: str = "w",
    log_z: bool = False,
    zlabel: str = "",
    xlabel: str = "",
    ylabel: str = "",
    vmin: float | None = None,
    vmax: float | None = None,
) -> str:
    """Draw a 2-D cell map from :func:`heatmap_plot_data` rows with the
    reference ``plot_2d`` controls (plotting/plot_functions_2d.py:36):
    ``log_z`` for a log color scale, ``zlabel`` for the colorbar label,
    axis labels, and ``vmin``/``vmax`` clamps for the color range.
    Matplotlib ``pcolormesh`` when importable, else the SVG fallback
    (white→blue ramp, per-cell tooltips, inline colorbar legend)."""
    import math  # noqa: PLC0415

    data = _normalize_rows(rows)
    if not data:
        raise ValueError("no heatmap rows to render")
    cols = list(data[0])
    bx, by = cols[0], cols[1]
    xs = sorted({r[bx] for r in data})
    ys = sorted({r[by] for r in data})
    values = [r[value_col] for r in data]
    v_hi = vmax if vmax is not None else (max(values) or 1.0)
    if log_z:
        pos = [v for v in values if v > 0]
        v_lo = vmin if vmin is not None and vmin > 0 else (min(pos) if pos else 1.0)
    else:
        v_lo = vmin if vmin is not None else 0.0

    def frac(v: float) -> float:
        """Clamped color fraction (linear or log scale)."""
        if log_z:
            if v <= 0 or v_hi <= v_lo:
                return 0.0
            f = (math.log(v) - math.log(v_lo)) / (math.log(v_hi) - math.log(v_lo))
        else:
            f = (v - v_lo) / ((v_hi - v_lo) or 1.0)
        return min(max(f, 0.0), 1.0)

    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.colors as mcolors  # noqa: PLC0415
        import matplotlib.pyplot as plt  # noqa: PLC0415

        grid = [[0.0] * len(xs) for _ in ys]
        for r in data:
            grid[ys.index(r[by])][xs.index(r[bx])] = r[value_col]
        fig, ax = plt.subplots(figsize=(width / 96, height / 96))
        norm = (
            mcolors.LogNorm(vmin=v_lo, vmax=v_hi)
            if log_z
            else mcolors.Normalize(vmin=v_lo, vmax=v_hi)
        )
        mesh = ax.pcolormesh(grid, cmap="Blues", norm=norm)
        fig.colorbar(mesh, ax=ax, label=zlabel)
        ax.set_title(title)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        if out_path:
            fig.savefig(out_path)
            plt.close(fig)
            return out_path
        return fig  # pragma: no cover - interactive use
    except ImportError:
        pass

    pad = 40
    cw = (width - 2 * pad) / len(xs)
    ch = (height - 2 * pad) / len(ys)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<text x="{width / 2}" y="14" text-anchor="middle" font-size="12">{title}</text>',
    ]
    if xlabel:
        parts.append(
            f'<text x="{width / 2}" y="{height - 4}" text-anchor="middle" font-size="11">{xlabel}</text>'
        )
    if ylabel:
        parts.append(
            f'<text x="12" y="{height / 2}" text-anchor="middle" font-size="11" '
            f'transform="rotate(-90 12 {height / 2})">{ylabel}</text>'
        )
    for r in data:
        i, j = xs.index(r[bx]), ys.index(r[by])
        f = frac(r[value_col])
        # white -> steel blue ramp
        red = int(255 - 200 * f)
        green = int(255 - 140 * f)
        parts.append(
            f'<rect x="{pad + i * cw:.1f}" y="{pad + j * ch:.1f}" width="{cw:.1f}" '
            f'height="{ch:.1f}" fill="rgb({red},{green},255)">'
            f"<title>{r[bx]},{r[by]}: {r[value_col]}</title></rect>"
        )
    # inline colorbar: 5 swatches from v_lo to v_hi (the SVG stand-in for
    # fig.colorbar), labelled with zlabel and the scale type
    bar_x = width - pad + 6
    for k in range(5):
        fk = k / 4
        v = (
            math.exp(math.log(v_lo) + fk * (math.log(v_hi) - math.log(v_lo)))
            if log_z and v_lo > 0
            else v_lo + fk * (v_hi - v_lo)
        )
        f = frac(v)
        red = int(255 - 200 * f)
        green = int(255 - 140 * f)
        y = height - pad - (k + 1) * 16
        parts.append(
            f'<rect x="{bar_x}" y="{y}" width="10" height="16" fill="rgb({red},{green},255)">'
            f"<title>{v:.3g}</title></rect>"
        )
    if zlabel:
        parts.append(
            f'<text x="{bar_x + 5}" y="{height - pad + 12}" font-size="9" '
            f'text-anchor="middle">{zlabel}{" (log)" if log_z else ""}</text>'
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(svg)
        return out_path
    return svg


# deterministic process palette (okabe-ito-ish, colorblind-safe)
_PALETTE = ("#0072b2", "#e69f00", "#009e73", "#cc79a7", "#d55e00", "#56b4e9", "#f0e442", "#999999")


def _normalize_rows(rows) -> list[dict]:
    out = []
    for r in rows:
        out.append(r if isinstance(r, dict) else r.asDict())
    return out


def render_stack_1d(
    stack_rows,
    ratio_rows=None,
    title: str = "",
    out_path: str | None = None,
    width: int = 640,
    height: int = 480,
) -> str:
    """Driver-side draw step over collected plot-ready rows (reference
    ``plot_variable_per_process``, plotting/plot_functions_1d.py:42: stacked
    process bars + hatched MC stat band + data/MC ratio panel).

    The compute side (:func:`stack_plot_data` / :func:`ratio_plot_data`)
    runs on the cluster; this consumes the collected (small: bins x
    processes) rows.  Uses matplotlib when importable, else falls back to a
    dependency-free SVG writer — both draw the same figure: stacked fills
    per process in stack order, the sqrt(sum_w2) band on the total, and the
    ratio panel underneath.  Returns the output path (written when
    *out_path* is given, else the SVG text)."""
    rows = _normalize_rows(stack_rows)
    if not rows:
        raise ValueError("no stack rows to render")
    ratio = _normalize_rows(ratio_rows) if ratio_rows is not None else []

    bin_col = next(c for c in rows[0] if c.startswith("bin"))
    proc_col = next(
        c for c in rows[0] if c not in ("y_low", "y_high", "mc_total", "mc_err", bin_col)
    )
    bins = sorted({r[bin_col] for r in rows})
    procs = list(dict.fromkeys(r[proc_col] for r in sorted(rows, key=lambda r: r["y_high"])))
    colors = {p: _PALETTE[i % len(_PALETTE)] for i, p in enumerate(procs)}

    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415

        fig, (ax, axr) = plt.subplots(
            2, 1, sharex=True, height_ratios=[3, 1], figsize=(width / 96, height / 96)
        )
        for r in rows:
            ax.bar(
                bins.index(r[bin_col]), r["y_high"] - r["y_low"], bottom=r["y_low"],
                width=1.0, color=colors[r[proc_col]],
                label=r[proc_col] if r[bin_col] == bins[0] else None,
            )
        for i, b in enumerate(bins):
            tot = next(r for r in rows if r[bin_col] == b)
            ax.bar(i, 2 * tot["mc_err"], bottom=tot["mc_total"] - tot["mc_err"],
                   width=1.0, fill=False, hatch="///", edgecolor="#444444", linewidth=0)
        for r in ratio:
            i = bins.index(r[bin_col])
            axr.errorbar(i, r["ratio"], fmt="ko", markersize=3)
            axr.bar(i, 2 * r["rel_unc"], bottom=1 - r["rel_unc"], width=1.0,
                    color="#cccccc", zorder=0)
        axr.axhline(1.0, color="#444444", linewidth=0.8)
        ax.set_title(title)
        ax.legend(fontsize=7)
        if out_path:
            fig.savefig(out_path)
            plt.close(fig)
            return out_path
        return fig  # pragma: no cover - interactive use
    except ImportError:
        pass

    # ---- SVG fallback (no dependencies) -----------------------------------
    y_max = max(r["mc_total"] + r["mc_err"] for r in rows) or 1.0
    mh = int(height * 0.68)
    rh = int(height * 0.22)
    pad, r_top = 40, int(height * 0.74)
    bw = (width - 2 * pad) / max(len(bins), 1)

    def sx(i: float) -> float:
        return pad + i * bw

    def sy(v: float) -> float:
        return 20 + mh - (v / y_max) * mh

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<text x="{width / 2}" y="14" text-anchor="middle" font-size="12">{title}</text>',
    ]
    for r in rows:
        i = bins.index(r[bin_col])
        y1, y0 = sy(r["y_high"]), sy(r["y_low"])
        parts.append(
            f'<rect x="{sx(i):.1f}" y="{y1:.1f}" width="{bw:.1f}" height="{max(y0 - y1, 0):.1f}" '
            f'fill="{colors[r[proc_col]]}"><title>{r[proc_col]}</title></rect>'
        )
    for i, b in enumerate(bins):
        tot = next(r for r in rows if r[bin_col] == b)
        y1, y0 = sy(tot["mc_total"] + tot["mc_err"]), sy(tot["mc_total"] - tot["mc_err"])
        parts.append(
            f'<rect x="{sx(i):.1f}" y="{y1:.1f}" width="{bw:.1f}" height="{max(y0 - y1, 0):.1f}" '
            f'fill="#444444" fill-opacity="0.35"/>'
        )
    # ratio panel: grey band = relative MC uncertainty around 1, dots = data/MC
    if ratio:
        lo = min(min(r["ratio"] for r in ratio), 1) - 0.2
        hi = max(max(r["ratio"] for r in ratio), 1) + 0.2

        def ry(v: float) -> float:
            return r_top + rh - (v - lo) / (hi - lo) * rh

        parts.append(
            f'<line x1="{pad}" y1="{ry(1.0):.1f}" x2="{width - pad}" y2="{ry(1.0):.1f}" '
            f'stroke="#444444" stroke-width="0.8"/>'
        )
        for r in ratio:
            i = bins.index(r[bin_col])
            y1, y0 = ry(1 + r["rel_unc"]), ry(1 - r["rel_unc"])
            parts.append(
                f'<rect x="{sx(i):.1f}" y="{y1:.1f}" width="{bw:.1f}" '
                f'height="{max(y0 - y1, 0):.1f}" fill="#cccccc"/>'
            )
            parts.append(
                f'<circle cx="{sx(i) + bw / 2:.1f}" cy="{ry(r["ratio"]):.1f}" r="2.5" fill="black"/>'
            )
    # legend
    for j, p in enumerate(procs):
        y = 24 + j * 14
        parts.append(f'<rect x="{width - 150}" y="{y}" width="10" height="10" fill="{colors[p]}"/>')
        parts.append(f'<text x="{width - 136}" y="{y + 9}" font-size="10">{p}</text>')
    parts.append("</svg>")
    svg = "\n".join(parts)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(svg)
        return out_path
    return svg


def shifted_plot_data(
    hist: DataFrame,
    bin_col: str,
    shift_col: str = "shift",
    value_col: str = "sum_w",
    nominal: str = "nominal",
    round_to: int = 4,
) -> DataFrame:
    """Plot table for the nominal-vs-shifts overlay (reference
    ``plot_shifted_variable``, plotting/plot_functions_1d.py:232): per
    (shift, bin) the value, the per-bin ratio to nominal (the ratio-panel
    series) and the shift's total relative offset in percent (the
    reference's "(+x.xx%)" legend annotation).  One broadcast join of the
    nominal slice + per-shift window totals — the hist table is already
    tiny (bins x shifts) by the time it reaches plotting."""
    nom = hist.filter(F.col(shift_col) == nominal).select(
        F.col(bin_col), F.col(value_col).alias("_nom")
    )
    ws = W.partitionBy(shift_col)
    joined = hist.join(F.broadcast(nom), bin_col, "left")
    diff_pct = (F.sum(value_col).over(ws) / F.sum("_nom").over(ws) - 1) * 100
    return joined.select(
        F.col(shift_col),
        F.col(bin_col),
        F.round(F.col(value_col), round_to).alias("w"),
        F.round(F.col(value_col) / F.col("_nom"), round_to).alias("ratio"),
        F.round(diff_pct, 2).alias("total_diff_pct"),
    )


def _shift_color(name: str, nominal: str = "nominal") -> str:
    """Reference color convention (plot_functions_1d.py:276): nominal
    black, up-shifts red, down-shifts blue."""
    if name == nominal:
        return "black"
    if name.endswith("_up") or name == "up":
        return "#d62728"
    if name.endswith("_down") or name == "down":
        return "#1f77b4"
    return "#888888"


def render_shifted_variable(
    rows,
    title: str = "",
    out_path: str | None = None,
    width: int = 640,
    height: int = 480,
    nominal: str = "nominal",
    ratio_ylim: tuple[float, float] = (0.25, 1.75),
) -> str:
    """Draw the nominal/up/down overlay with a ratio panel from
    :func:`shifted_plot_data` rows (reference ``plot_shifted_variable``):
    step lines per shift in the black/red/blue convention, shift legend
    annotated with the total offset percent, ratio panel (shift/nominal)
    fixed to the reference's (0.25, 1.75) window.  Matplotlib when
    importable, else the dependency-free SVG writer."""
    data = _normalize_rows(rows)
    if not data:
        raise ValueError("no shifted-variable rows to render")
    shift_col = next(c for c in data[0] if c not in ("w", "ratio", "total_diff_pct") and not c.startswith("bin"))
    bin_col = next(c for c in data[0] if c.startswith("bin"))
    bins = sorted({r[bin_col] for r in data})
    by_shift: dict[str, dict] = {}
    for r in data:
        by_shift.setdefault(r[shift_col], {})[r[bin_col]] = r
    # nominal first, then alphabetical: a stable draw/legend order
    shifts = sorted(by_shift, key=lambda s: (s != nominal, s))

    def label(s: str) -> str:
        if s == nominal:
            return s
        d = next(iter(by_shift[s].values()))["total_diff_pct"]
        # d is null when no shifted bin overlaps nominal (total offset
        # undefined) — label without the percent rather than crash
        return s if d is None else f"{s} ({d:+.2f}%)"

    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415

        fig, (ax, axr) = plt.subplots(
            2, 1, sharex=True, height_ratios=[3, 1], figsize=(width / 96, height / 96)
        )
        xs = range(len(bins))
        for s in shifts:
            ys = [by_shift[s].get(b, {}).get("w", 0.0) for b in bins]
            ax.step(xs, ys, where="mid", color=_shift_color(s, nominal), label=label(s))
            if s != nominal:
                # shift-only bins have no nominal partner -> draw at 1.0
                rr = [by_shift[s].get(b, {}).get("ratio") or 1.0 for b in bins]
                axr.step(xs, rr, where="mid", color=_shift_color(s, nominal))
        axr.axhline(1.0, color="#444444", linewidth=0.8)
        axr.set_ylim(*ratio_ylim)
        axr.set_ylabel("Ratio")
        ax.set_title(title)
        ax.legend(fontsize=7)
        if out_path:
            fig.savefig(out_path)
            plt.close(fig)
            return out_path
        return fig  # pragma: no cover - interactive use
    except ImportError:
        pass

    # ---- SVG fallback -----------------------------------------------------
    y_max = max(r["w"] for r in data) or 1.0
    mh, rh = int(height * 0.62), int(height * 0.22)
    pad, r_top = 40, int(height * 0.72)
    bw = (width - 2 * pad) / max(len(bins), 1)
    lo, hi = ratio_ylim

    def sx(i: float) -> float:
        return pad + i * bw

    def sy(v: float) -> float:
        return 20 + mh - (v / y_max) * mh

    def ry(v: float) -> float:
        v = min(max(v, lo), hi)
        return r_top + rh - (v - lo) / (hi - lo) * rh

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<text x="{width / 2}" y="14" text-anchor="middle" font-size="12">{title}</text>',
        f'<line x1="{pad}" y1="{ry(1.0):.1f}" x2="{width - pad}" y2="{ry(1.0):.1f}" '
        f'stroke="#444444" stroke-width="0.8"/>',
    ]
    for s in shifts:
        color = _shift_color(s, nominal)
        pts = " ".join(
            f"{sx(i) + bw / 2:.1f},{sy(by_shift[s].get(b, {}).get('w') or 0.0):.1f}"
            for i, b in enumerate(bins)
        )
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" stroke-width="1.5">'
            f"<title>{label(s)}</title></polyline>"
        )
        if s != nominal:
            rpts = " ".join(
                f"{sx(i) + bw / 2:.1f},{ry(by_shift[s].get(b, {}).get('ratio') or 1.0):.1f}"
                for i, b in enumerate(bins)
            )
            parts.append(
                f'<polyline points="{rpts}" fill="none" stroke="{color}" stroke-width="1.2"/>'
            )
    for j, s in enumerate(shifts):
        y = 24 + j * 14
        parts.append(
            f'<rect x="{width - 190}" y="{y}" width="10" height="10" fill="{_shift_color(s, nominal)}"/>'
        )
        parts.append(f'<text x="{width - 176}" y="{y + 9}" font-size="10">{label(s)}</text>')
    parts.append("</svg>")
    svg = "\n".join(parts)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(svg)
        return out_path
    return svg


def render_cutflow(
    rows,
    step_order: list[str] | None = None,
    title: str = "",
    out_path: str | None = None,
    width: int = 640,
    height: int = 480,
    shape_norm: bool = False,
) -> str:
    """Draw the per-step selection-yield curve from ``cutflow_steps`` rows
    (reference ``plot_cutflow``, plotting/plot_functions_1d.py:342): one
    marker-line per process (single anonymous series when the rows carry
    no process column), step names as rotated x-tick labels, optional
    ``shape_norm`` dividing every step by the first ("Selection
    efficiency" mode).  Matplotlib when importable, else SVG."""
    data = _normalize_rows(rows)
    if not data:
        raise ValueError("no cutflow rows to render")
    val_col = "n" if "n" in data[0] else next(c for c in data[0] if c not in ("step", "process"))
    has_proc = "process" in data[0]
    series: dict[str, dict] = {}
    for r in data:
        series.setdefault(r["process"] if has_proc else "all", {})[r["step"]] = float(r[val_col])
    steps = step_order or list(dict.fromkeys(r["step"] for r in data))
    if shape_norm:
        for vals in series.values():
            first = vals.get(steps[0]) or 1.0
            for k in vals:
                vals[k] = vals[k] / first
    colors = {p: _PALETTE[i % len(_PALETTE)] for i, p in enumerate(series)}

    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415

        fig, ax = plt.subplots(figsize=(width / 96, height / 96))
        xs = range(len(steps))
        for p, vals in series.items():
            ax.plot(xs, [vals.get(s, 0.0) for s in steps], marker="o", color=colors[p], label=p)
        ax.set_xticks(list(xs))
        ax.set_xticklabels(steps, rotation=45, ha="right")
        ax.set_ylabel("Selection efficiency" if shape_norm else "Selection yield")
        ax.set_xlabel("Selection step")
        ax.set_title(title)
        if has_proc:
            ax.legend(fontsize=7, loc="upper right")
        if out_path:
            fig.savefig(out_path, bbox_inches="tight")
            plt.close(fig)
            return out_path
        return fig  # pragma: no cover - interactive use
    except ImportError:
        pass

    # ---- SVG fallback -----------------------------------------------------
    y_max = max(max(v.values()) for v in series.values()) or 1.0
    pad = 50
    mh = height - 2 * pad
    bw = (width - 2 * pad) / max(len(steps), 1)

    def sx(i: float) -> float:
        return pad + (i + 0.5) * bw

    def sy(v: float) -> float:
        return pad + mh - (v / y_max) * mh

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<text x="{width / 2}" y="14" text-anchor="middle" font-size="12">{title}</text>',
    ]
    for p, vals in series.items():
        pts = " ".join(f"{sx(i):.1f},{sy(vals.get(s, 0.0)):.1f}" for i, s in enumerate(steps))
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="{colors[p]}" stroke-width="1.5">'
            f"<title>{p}</title></polyline>"
        )
        for i, s in enumerate(steps):
            parts.append(
                f'<circle cx="{sx(i):.1f}" cy="{sy(vals.get(s, 0.0)):.1f}" r="3" '
                f'fill="{colors[p]}"><title>{p}/{s}: {vals.get(s, 0.0)}</title></circle>'
            )
    for i, s in enumerate(steps):
        parts.append(
            f'<text x="{sx(i):.1f}" y="{height - 18}" font-size="10" text-anchor="end" '
            f'transform="rotate(-45 {sx(i):.1f} {height - 18})">{s}</text>'
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(svg)
        return out_path
    return svg


def apply_density(hist: DataFrame, bin_col: str, edges: list[float], round_to: int = 4) -> DataFrame:
    """Density normalization: cell weight divided by its bin width
    (reference plot_util.py:383 ``apply_density``).  Flow/null bins get
    width 1 (the reference divides by the in-range widths only)."""
    width = None
    for i in range(len(edges) - 1):
        w = edges[i + 1] - edges[i]
        width = F.when(F.col(bin_col) == i, w) if width is None else width.when(F.col(bin_col) == i, w)
    width = width.otherwise(F.lit(1.0))
    return hist.withColumn("sum_w", F.round(F.col("sum_w") / width, round_to)).withColumn(
        "sum_w2", F.round(F.col("sum_w2") / (width * width), round_to)
    )


def remove_negative_contributions(hist: DataFrame) -> DataFrame:
    """Clamp negative cell weights to zero (reference plot_util.py:322 —
    negative MC weights can push a stacked cell below zero; plotting and
    datacard rates require non-negative yields)."""
    neg = F.col("sum_w") < 0
    return hist.withColumn("sum_w2", F.when(neg, 0.0).otherwise(F.col("sum_w2"))).withColumn(
        "sum_w", F.when(neg, 0.0).otherwise(F.col("sum_w"))
    )


def blind_sensitive_bins(
    data_hist: DataFrame,
    signal_hist: DataFrame,
    background_hist: DataFrame,
    bin_col: str,
    threshold: float,
) -> DataFrame:
    """Remove data cells where the per-bin S/sqrt(B) exceeds *threshold*
    (reference plot_util.py:984 ``blind_sensitive_bins``): the analyst
    never sees data in signal-sensitive regions until unblinding.  One
    broadcast join of the (tiny) per-bin significance table."""
    sig = signal_hist.groupBy(bin_col).agg(F.sum("sum_w").alias("s"))
    bkg = background_hist.groupBy(bin_col).agg(F.sum("sum_w").alias("b"))
    sensitive = (
        sig.join(bkg, bin_col)
        .filter(F.col("s") / F.sqrt(F.greatest(F.col("b"), F.lit(1e-9))) > threshold)
        .select(bin_col)
    )
    return data_hist.join(F.broadcast(sensitive), bin_col, "left_anti")


def render_roc(
    rows,
    title: str = "",
    out_path: str | None = None,
    width: int = 480,
    height: int = 480,
) -> str:
    """Draw a ROC curve from ``ml_roc_curve`` rows (reference ``plot_roc``,
    plotting/plot_ml_evaluation.py:319): the (fpr, tpr) sweep with the
    random-classifier diagonal and the trapezoid AUC in the title area.
    Matplotlib when importable, else SVG."""
    data = sorted(_normalize_rows(rows), key=lambda r: (r["fpr"], r["tpr"]))
    if not data:
        raise ValueError("no ROC rows to render")
    pts = [(0.0, 0.0)] + [(r["fpr"], r["tpr"]) for r in data] + [(1.0, 1.0)]
    pts = sorted(set(pts))
    auc = sum(
        (x2 - x1) * (y1 + y2) / 2 for (x1, y1), (x2, y2) in zip(pts, pts[1:])
    )
    label = f"{title} (AUC = {auc:.3f})".strip()

    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415

        fig, ax = plt.subplots(figsize=(width / 96, height / 96))
        ax.plot([p[0] for p in pts], [p[1] for p in pts], color="#0072b2")
        ax.plot([0, 1], [0, 1], linestyle="--", color="#999999")
        ax.set_xlabel("False positive rate")
        ax.set_ylabel("True positive rate")
        ax.set_title(label)
        if out_path:
            fig.savefig(out_path)
            plt.close(fig)
            return out_path
        return fig  # pragma: no cover - interactive use
    except ImportError:
        pass

    pad = 40
    s = min(width, height) - 2 * pad

    def sx(v: float) -> float:
        return pad + v * s

    def sy(v: float) -> float:
        return pad + s - v * s

    curve = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in pts)
    svg = "\n".join(
        [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
            f'viewBox="0 0 {width} {height}">',
            f'<text x="{width / 2}" y="16" text-anchor="middle" font-size="12">{label}</text>',
            f'<line x1="{sx(0):.1f}" y1="{sy(0):.1f}" x2="{sx(1):.1f}" y2="{sy(1):.1f}" '
            f'stroke="#999999" stroke-dasharray="4 3"/>',
            f'<polyline points="{curve}" fill="none" stroke="#0072b2" stroke-width="1.8"/>',
            f'<text x="{width / 2}" y="{height - 8}" text-anchor="middle" font-size="10">FPR</text>',
            f'<text x="12" y="{height / 2}" font-size="10" '
            f'transform="rotate(-90 12 {height / 2})">TPR</text>',
            "</svg>",
        ]
    )
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(svg)
        return out_path
    return svg


def render_profile(
    rows,
    title: str = "",
    out_path: str | None = None,
    width: int = 640,
    height: int = 480,
) -> str:
    """Draw a profile histogram from ``hist_profile_qty_price``-shaped rows
    (reference ``plot_profile``, plotting/plot_functions_1d.py:421): per
    x-bin the mean of the profiled variable as a point with the width
    (stddev) as an error bar.  Matplotlib when importable, else SVG."""
    data = _normalize_rows(rows)
    if not data:
        raise ValueError("no profile rows to render")
    bin_col = next(c for c in data[0] if c.startswith("bin"))
    mean_col = next(c for c in data[0] if c.startswith("mean"))
    width_col = next(c for c in data[0] if c.startswith("width"))
    data = sorted(data, key=lambda r: r[bin_col])
    bins = [r[bin_col] for r in data]
    y_hi = max(r[mean_col] + r[width_col] for r in data)
    y_lo = min(r[mean_col] - r[width_col] for r in data)

    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415

        fig, ax = plt.subplots(figsize=(width / 96, height / 96))
        ax.errorbar(
            range(len(bins)),
            [r[mean_col] for r in data],
            yerr=[r[width_col] for r in data],
            fmt="ko",
            capsize=3,
        )
        ax.set_xticks(range(len(bins)))
        ax.set_xticklabels([str(b) for b in bins])
        ax.set_title(title)
        if out_path:
            fig.savefig(out_path)
            plt.close(fig)
            return out_path
        return fig  # pragma: no cover - interactive use
    except ImportError:
        pass

    pad = 40
    bw = (width - 2 * pad) / max(len(bins), 1)
    span = (y_hi - y_lo) or 1.0

    def sx(i: float) -> float:
        return pad + (i + 0.5) * bw

    def sy(v: float) -> float:
        return 24 + (height - 2 * pad) * (1 - (v - y_lo) / span)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<text x="{width / 2}" y="14" text-anchor="middle" font-size="12">{title}</text>',
    ]
    for i, r in enumerate(data):
        lo, hi = r[mean_col] - r[width_col], r[mean_col] + r[width_col]
        parts.append(
            f'<line x1="{sx(i):.1f}" y1="{sy(lo):.1f}" x2="{sx(i):.1f}" y2="{sy(hi):.1f}" '
            f'stroke="#333333"/>'
        )
        parts.append(
            f'<circle cx="{sx(i):.1f}" cy="{sy(r[mean_col]):.1f}" r="3" fill="black">'
            f"<title>{r[bin_col]}: {r[mean_col]} ± {r[width_col]}</title></circle>"
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(svg)
        return out_path
    return svg
