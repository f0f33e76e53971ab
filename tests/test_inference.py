"""InferenceModel spec + datacard writer (reference
columnflow/inference/__init__.py:212, inference/cms/datacard.py:35;
reference tests: tests/test_inference.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnflow_spark.inference import Category, InferenceModel, Parameter, Process, render_datacard
from columnflow_spark.sources import load_table


def _model() -> InferenceModel:
    m = InferenceModel("test_model")
    cat = m.add_category(Category("cat1", variable="ht", data_from_processes=["bkg"]))
    sig = cat.add_process(Process("sig", is_signal=True))
    bkg = cat.add_process(Process("bkg"))
    sig.add_parameter(Parameter("lumi", "rate_gauss", 1.02))
    bkg.add_parameter(Parameter("lumi", "rate_gauss", 1.02))
    bkg.add_parameter(Parameter("bkg_norm", "rate_gauss", (0.9, 1.1)))
    return m


def test_spec_validation():
    m = _model()
    with pytest.raises(ValueError):
        m.add_category(Category("cat1"))
    with pytest.raises(ValueError):
        m.get_category("cat1").add_process(Process("sig"))
    assert m.parameter_names == ["lumi", "bkg_norm"]


def test_render_datacard_from_mapping():
    text = render_datacard(
        _model(),
        {("cat1", "sig"): 12.3456789, ("cat1", "bkg"): 100.5},
    )
    lines = text.splitlines()
    assert "imax 1" in lines
    assert "kmax 2" in lines
    # signal id 0, background id 1
    assert any(l.startswith("process  0  1") for l in lines)
    assert any(l.startswith("rate     12.3457  100.5") for l in lines)
    # data_from_processes -> observation = rounded bkg sum
    assert any(l.startswith("observation  100") for l in lines)
    assert "lumi  lnN  1.02  1.02" in lines
    assert "bkg_norm  lnN  -  0.9/1.1" in lines


def test_render_datacard_from_yield_table(spark, sf_dir):
    # rates straight from a Spark yield aggregation (the engine path)
    orders = load_table(spark, sf_dir, "orders")
    ytab = (
        orders.groupBy(
            F.lit("cat1").alias("category"),
            F.when(F.col("o_orderstatus") == "O", "sig").otherwise("bkg").alias("process"),
        )
        .agg(F.sum("o_totalprice").alias("sum_w"))
    )
    text = render_datacard(_model(), ytab)
    assert text.startswith("# datacard: test_model")
    rate_line = next(l for l in text.splitlines() if l.startswith("rate"))
    vals = [float(v) for v in rate_line.split()[1:]]
    assert len(vals) == 2 and all(v > 0 for v in vals)


def test_shape_datacard_with_exported_templates(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from columnflow_spark.inference.datacard import export_shapes, render_datacard
    from columnflow_spark.inference.model import Category, InferenceModel, Parameter, Process

    model = InferenceModel("shape_demo")
    cat = model.add_category(Category("cat_price", variable="price"))
    sig = cat.add_process(Process("sig", is_signal=True))
    bkg = cat.add_process(Process("bkg"))
    sig.add_parameter(Parameter("price_scale", type="shape", effect=1.0))
    bkg.add_parameter(Parameter("lumi", type="rate_gauss", effect=1.02))

    # per-(category, process, shift) hist table — the shapes store content
    rows = [
        ("cat_price", p, s, b, float(10 * (b + 1)), 1.0)
        for p in ("sig", "bkg")
        for s in ("nominal", "price_scaleUp", "price_scaleDown")
        for b in range(3)
    ]
    hists = spark.createDataFrame(
        rows, "category string, process string, shift string, bin__price int, sum_w double, sum_w2 double"
    )
    shapes_path = export_shapes(hists, str(tmp_path / "shapes"))
    back = spark.read.parquet(shapes_path)
    assert back.count() == len(rows)
    combos = {(r.category, r.process, r.shift) for r in back.select("category", "process", "shift").distinct().collect()}
    assert ("cat_price", "sig", "price_scaleUp") in combos and len(combos) == 6

    card = render_datacard(
        model,
        {("cat_price", "sig"): 5.0, ("cat_price", "bkg"): 50.0},
        shapes_file=shapes_path,
    )
    assert f"shapes * * {shapes_path} $CHANNEL/$PROCESS $CHANNEL/$PROCESS_$SYSTEMATIC" in card
    assert "price_scale  shape  1.0  -" in card
    assert "lumi  lnN  -  1.02" in card


def test_from_shape_missing_templates_falls_back_flat(spark):
    # a parameter using effect_from_shape on a (category, process) whose
    # Up/Down templates are absent from the shapes table must fall back
    # to a flat (1, 1) effect (reference fallback_key='nominal'), not
    # raise a KeyError from the integral-effects map
    from columnflow_spark.inference.model import (
        Category,
        InferenceModel,
        Parameter,
        Process,
    )

    model = InferenceModel("missing_tmpl")
    cat = model.add_category(Category("c1", variable="v"))
    sig = cat.add_process(Process("sig", is_signal=True))
    bkg = cat.add_process(Process("bkg"))
    sig.add_parameter(
        Parameter("jes", type="rate_gauss", effect=1.0, transformations=("effect_from_shape",))
    )
    bkg.add_parameter(
        Parameter("jes", type="rate_gauss", effect=1.0, transformations=("effect_from_shape",))
    )
    # shapes carry Up/Down ONLY for sig; bkg has just a nominal template
    rows = [("c1", "sig", s, 0, 10.0, 1.0) for s in ("nominal", "jesUp", "jesDown")]
    rows += [("c1", "bkg", "nominal", 0, 20.0, 1.0)]
    hists = spark.createDataFrame(
        rows,
        "category string, process string, shift string, bin__v int, sum_w double, sum_w2 double",
    )
    card = render_datacard(
        model, {("c1", "sig"): 10.0, ("c1", "bkg"): 20.0}, shapes=hists
    )
    jes_line = next(l for l in card.splitlines() if l.startswith("jes"))
    # bkg column renders the flat fallback (1.0), never a crash
    assert jes_line.split()[-1] in ("1.0", "-", "1.0/1.0")


def test_incompatible_type_mix_raises():
    # lnU + shape has no valid combine rendering: raise, don't emit
    # an invalid 'lnU/shape' type token (reference misconfiguration check)
    from columnflow_spark.inference.model import (
        Category,
        InferenceModel,
        Parameter,
        Process,
    )

    model = InferenceModel("bad_mix")
    cat = model.add_category(Category("c1", variable="v"))
    sig = cat.add_process(Process("sig", is_signal=True))
    bkg = cat.add_process(Process("bkg"))
    sig.add_parameter(Parameter("p1", type="shape", effect=1.0))
    bkg.add_parameter(Parameter("p1", type="rate_uniform", effect=1.5))
    with pytest.raises(ValueError, match="incompatible"):
        render_datacard(model, {("c1", "sig"): 1.0, ("c1", "bkg"): 2.0})
