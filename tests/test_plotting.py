"""Plot render layer smoke tests (reference plotting/plot_functions_1d.py:42
``plot_variable_per_process`` shape): the cluster computes the plot-ready
stack/band/ratio tables, the renderer draws them — matplotlib when
available, dependency-free SVG otherwise; both must produce a real image
file."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnflow_spark.hist.axes import Variable
from columnflow_spark.hist.fill import fill_hist
from columnflow_spark.plotting import ratio_plot_data, render_stack_1d, stack_plot_data
from columnflow_spark.sources import load_table


def _stack_and_ratio(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    var = Variable("price", "l_extendedprice", (10, 0.0, 110000.0))
    mc = fill_hist(
        li.filter(F.col("l_returnflag") != "N").withColumn("process", F.col("l_returnflag")),
        [var],
        categorical=["process"],
    )
    data = fill_hist(li.filter(F.col("l_returnflag") == "N"), [var])
    stack = stack_plot_data(mc, "process", "bin__price", ["R", "A"])
    ratio = ratio_plot_data(mc, data, "bin__price")
    return stack.collect(), ratio.collect()


def test_render_stack_produces_image(spark, sf_dir, tmp_path):
    stack_rows, ratio_rows = _stack_and_ratio(spark, sf_dir)
    out = str(tmp_path / "stack.svg")
    path = render_stack_1d(stack_rows, ratio_rows, title="price stack", out_path=out)
    content = open(path).read()
    # a real figure: stacked fills for both processes, the stat band, the
    # ratio reference line, and the legend labels
    assert content.lstrip().startswith(("<svg", "%PDF", "\x89PNG")) or "<svg" in content[:200]
    if "<svg" in content[:200]:
        assert content.count("<rect") >= 20
        assert "circle" in content  # ratio dots
        assert ">R<" in content and ">A<" in content  # legend
        assert "price stack" in content


def test_render_from_query_output(spark, sf_dir, tmp_path):
    # the registered plot_ready_stack query output renders directly
    from columnflow_spark.queries import all_queries

    rows = all_queries()["plot_ready_stack"](spark, sf_dir).collect()
    out = render_stack_1d(rows, out_path=str(tmp_path / "q.svg"))
    content = open(out).read()
    assert "<rect" in content and "</svg>" in content


def test_render_rejects_empty():
    import pytest

    with pytest.raises(ValueError):
        render_stack_1d([])


def test_heatmap_2d_from_query(spark, sf_dir, tmp_path):
    from columnflow_spark.plotting import heatmap_plot_data, render_heatmap_2d
    from columnflow_spark.queries import all_queries

    hist2d = all_queries()["hist_2d_flag_price"](spark, sf_dir)
    cols = hist2d.columns
    bx = next(c for c in cols if not c.startswith(("n", "sum")))
    by = next(c for c in cols if c.startswith("bin"))
    cells = heatmap_plot_data(hist2d, bx, by)
    rows = cells.collect()
    # row shares sum to ~1 per x
    import collections
    acc = collections.defaultdict(float)
    for r in rows:
        acc[r[bx]] += r["row_share"]
    assert all(abs(v - 1.0) < 0.01 for v in acc.values())
    out = render_heatmap_2d(rows, title="flag x price", out_path=str(tmp_path / "h.svg"))
    content = open(out).read()
    # one rect per cell plus the 5-swatch inline colorbar
    assert content.count("<rect") == len(rows) + 5 and "</svg>" in content


def test_catalog_variable_drives_hist(spark, sf_dir):
    from columnflow_spark.catalog import Config
    from columnflow_spark.hist.fill import fill_hist
    from columnflow_spark.sources import load_table

    cfg = Config("c", 1)
    cfg.add_variable(
        "price", 1, expression="l_extendedprice", binning=(10, 0.0, 110000.0),
        aux={"selection": "l_quantity >= 25", "log_x": True, "x_title": "price"},
    )
    v = cfg.get_variable("price")
    assert v.log_x and v.selection == "l_quantity >= 25"
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F
    h = fill_hist(li.filter(F.expr(v.selection)), [v.to_hist_variable()])
    total = h.agg(F.sum("n").alias("n")).first().n
    direct = li.filter("l_quantity >= 25").count()
    assert total == direct


def test_density_negative_blinding_helpers(spark):
    from columnflow_spark.plotting import (
        apply_density,
        blind_sensitive_bins,
        remove_negative_contributions,
    )

    h = spark.createDataFrame(
        [(0, 4, 10.0, 2.0), (1, 2, -3.0, 1.0), (-1, 1, 5.0, 5.0)],
        "bin__x int, n bigint, sum_w double, sum_w2 double",
    )
    dens = {r.bin__x: r.sum_w for r in apply_density(h, "bin__x", [0.0, 2.0, 6.0]).collect()}
    assert dens[0] == 5.0 and dens[1] == -0.75 and dens[-1] == 5.0  # flow keeps width 1
    clamped = {r.bin__x: (r.sum_w, r.sum_w2) for r in remove_negative_contributions(h).collect()}
    assert clamped[1] == (0.0, 0.0) and clamped[0] == (10.0, 2.0)

    sig = spark.createDataFrame([(0, 100.0), (1, 1.0)], "bin__x int, sum_w double")
    bkg = spark.createDataFrame([(0, 4.0), (1, 100.0)], "bin__x int, sum_w double")
    data = spark.createDataFrame([(0, 60.0), (1, 55.0)], "bin__x int, sum_w double")
    kept = blind_sensitive_bins(data, sig, bkg, "bin__x", threshold=3.0)
    # bin 0: s/sqrt(b) = 50 -> blinded; bin 1: 0.1 -> kept
    assert [r.bin__x for r in kept.collect()] == [1]


def test_render_shifted_variable_from_query(spark, sf_dir, tmp_path):
    # reference plot_shifted_variable (plot_functions_1d.py:232): the
    # shift-union hist table drives a nominal/up overlay + ratio panel
    from columnflow_spark.plotting import render_shifted_variable, shifted_plot_data
    from columnflow_spark.queries import all_queries

    hist = all_queries()["hist_shift_union"](spark, sf_dir)
    rows = shifted_plot_data(hist, "bin__price").collect()
    # every shifted row carries a ratio to nominal and the total offset
    shifted = [r for r in rows if r["shift"] == "price_up"]
    # bins present in the nominal slice get a ratio; shift-only bins
    # (e.g. overflow migration) have no nominal partner -> null
    nominal_bins = {r["bin__price"] for r in rows if r["shift"] == "nominal"}
    assert shifted and all(
        r["ratio"] is not None for r in shifted if r["bin__price"] in nominal_bins
    )
    assert len({r["total_diff_pct"] for r in shifted}) == 1
    nominal = [r for r in rows if r["shift"] == "nominal"]
    assert all(r["total_diff_pct"] == 0.0 for r in nominal)
    out = render_shifted_variable(rows, title="price shifts", out_path=str(tmp_path / "s.svg"))
    content = open(out).read()
    assert "<svg" in content[:200] or content.lstrip().startswith(("%PDF", "\x89PNG"))
    if "<svg" in content[:200]:
        assert content.count("<polyline") >= 3  # nominal + up + its ratio
        assert "price shifts" in content
        assert "%)" in content  # the (+x.xx%) legend annotation


def test_render_cutflow_from_query(spark, sf_dir, tmp_path):
    # reference plot_cutflow (plot_functions_1d.py:342): step curve
    from columnflow_spark.plotting import render_cutflow
    from columnflow_spark.queries import all_queries

    rows = all_queries()["cutflow_steps"](spark, sf_dir).collect()
    out = render_cutflow(
        rows, step_order=["initial", "qty", "price", "discount"],
        title="cutflow", out_path=str(tmp_path / "c.svg"),
    )
    content = open(out).read()
    if "<svg" in content[:200]:
        assert content.count("<circle") == 4  # one marker per step
        assert "initial" in content and "discount" in content
    # shape_norm divides by the initial step
    out2 = render_cutflow(rows, shape_norm=True, out_path=str(tmp_path / "c2.svg"))
    assert open(out2).read()


def test_render_cutflow_multi_process(tmp_path):
    from columnflow_spark.plotting import render_cutflow

    rows = [
        {"process": p, "step": s, "n": n}
        for p, counts in {"tt": [100, 60, 30], "dy": [80, 70, 10]}.items()
        for s, n in zip(["initial", "sel", "tight"], counts)
    ]
    out = render_cutflow(rows, out_path=str(tmp_path / "m.svg"))
    content = open(out).read()
    if "<svg" in content[:200]:
        assert content.count("<polyline") == 2


def test_heatmap_2d_controls(spark, sf_dir, tmp_path):
    # reference plot_2d controls: log-z, colorbar/axis labels, clamps
    import pytest

    from columnflow_spark.plotting import heatmap_plot_data, render_heatmap_2d
    from columnflow_spark.queries import all_queries

    hist2d = all_queries()["hist_2d_flag_price"](spark, sf_dir)
    cols = hist2d.columns
    bx = next(c for c in cols if not c.startswith(("n", "sum")))
    by = next(c for c in cols if c.startswith("bin"))
    rows = heatmap_plot_data(hist2d, bx, by).collect()
    for log_z in (False, True):
        out = render_heatmap_2d(
            rows, title="2d", log_z=log_z, zlabel="weight",
            xlabel="flag", ylabel="price bin", vmin=None, vmax=None,
            out_path=str(tmp_path / f"h_{log_z}.svg"),
        )
        content = open(out).read()
        if "<svg" in content[:200]:
            assert "weight" in content and "flag" in content and "price bin" in content
            if log_z:
                assert "(log)" in content
    # vmax clamp: cells above vmax saturate instead of rescaling the ramp
    out = render_heatmap_2d(rows, vmax=1e-9, out_path=str(tmp_path / "clamp.svg"))
    assert open(out).read()
    with pytest.raises(ValueError):
        render_heatmap_2d([])


def test_render_roc_and_confusion_matrix(spark, sf_dir, tmp_path):
    # reference plot_roc / plot_cm (plot_ml_evaluation.py): ROC sweep
    # renders with AUC, the confusion matrix renders via the generic 2-D
    # cell renderer
    from columnflow_spark.plotting import render_heatmap_2d, render_roc
    from columnflow_spark.queries import all_queries

    roc = all_queries()["ml_roc_curve"](spark, sf_dir).collect()
    out = render_roc(roc, title="kfold model", out_path=str(tmp_path / "roc.svg"))
    content = open(out).read()
    if "<svg" in content[:200]:
        assert "AUC = " in content and "<polyline" in content
    cm = all_queries()["ml_confusion_matrix"](spark, sf_dir).collect()
    rows = [
        {"y_true": r.y_true, "y_pred": r.y_pred, "w": r.row_share} for r in cm
    ]
    out2 = render_heatmap_2d(rows, title="confusion", zlabel="row share",
                             out_path=str(tmp_path / "cm.svg"))
    assert "</svg>" in open(out2).read() or open(out2).read()


def test_render_profile_from_query(spark, sf_dir, tmp_path):
    # reference plot_profile (plot_functions_1d.py:421)
    from columnflow_spark.plotting import render_profile
    from columnflow_spark.queries import all_queries

    rows = all_queries()["hist_profile_qty_price"](spark, sf_dir).collect()
    out = render_profile(rows, title="qty profile", out_path=str(tmp_path / "p.svg"))
    content = open(out).read()
    if "<svg" in content[:200]:
        assert content.count("<circle") == len(rows)
        assert content.count("<line") == len(rows)
