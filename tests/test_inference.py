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
