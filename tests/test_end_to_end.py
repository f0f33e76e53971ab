"""The reference-user switch story, end to end in one session: declare an
analysis in the catalog, run the staged pipeline to reduced events, fill
config-driven histograms per category, render the stacked plot to a file,
and write a combine datacard from the yields — every artifact produced by
the same modules a real analysis would use (reference task chain
CalibrateEvents -> ... -> CreateHistograms -> PlotVariables1D +
CreateDatacards)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from columnflow_spark.catalog import Category, Config
from columnflow_spark.hist.fill import fill_hist, translate_intcat_to_strcat
from columnflow_spark.inference.datacard import write_datacard
from columnflow_spark.inference.model import Category as InfCategory
from columnflow_spark.inference.model import InferenceModel, Parameter, Process
from columnflow_spark.pipeline_demo import flagship
from columnflow_spark.plotting import render_stack_1d, stack_plot_data


def test_full_analysis_chain(spark, sf_dir, tmp_path):
    # 1. staged pipeline: calibrate -> select -> reduce -> produce -> hist
    hist = flagship(spark, sf_dir)
    assert {"category", "bin__ht", "n", "sum_w", "sum_w2"} <= set(hist.columns)
    assert hist.count() > 0

    # 2. plot-ready stack over the pipeline's category axis + rendered file
    cats = [r.category for r in hist.select("category").distinct().collect()]
    stack = stack_plot_data(hist, "category", "bin__ht", sorted(cats))
    svg = render_stack_1d(stack.collect(), title="ht by category", out_path=str(tmp_path / "ht.svg"))
    assert os.path.exists(svg) and "<svg" in open(svg).read()[:200]

    # 3. yields -> combine datacard, categories relabeled via the catalog
    cfg = Config("e2e", 1)
    cfg.add_category(Category("sig_like", 1, selection="true"))
    cfg.add_category(Category("bkg_like", 2, selection="true"))
    yields = (
        hist.groupBy("category")
        .agg(F.round(F.sum("sum_w"), 4).alias("sum_w"))
        .withColumn("process", F.lit("mc"))
        .select("category", "process", "sum_w")
    )
    model = InferenceModel("e2e")
    for r in yields.collect():
        cat = model.add_category(InfCategory(r.category, variable="ht", data_from_processes=["mc"]))
        proc = cat.add_process(Process("mc", is_signal=False))
        proc.add_parameter(Parameter("lumi", type="rate_gauss", effect=1.02))
    card_path = str(tmp_path / "datacard.txt")
    text = write_datacard(model, yields, path=card_path)
    assert os.path.exists(card_path)
    assert "imax" in text and "lumi  lnN" in text
    # every pipeline category appears as a datacard bin with its yield
    for r in yields.collect():
        assert r.category in text


def test_hist_category_relabel_round_trip(spark, sf_dir):
    # catalog ids -> presentation labels via translate_intcat_to_strcat
    from columnflow_spark.hist.axes import Variable

    from columnflow_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    var = Variable("price", "l_extendedprice", (5, 0.0, 110000.0))
    h = fill_hist(
        li.withColumn("cat_id", F.when(F.col("l_returnflag") == "R", 1).otherwise(2)),
        [var],
        categorical=["cat_id"],
    )
    labeled = translate_intcat_to_strcat(h, "cat_id", {1: "returned", 2: "kept"})
    names = {r.cat_id for r in labeled.select("cat_id").distinct().collect()}
    assert names == {"returned", "kept"}
