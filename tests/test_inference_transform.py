"""Datacard parameter transformations (reference
columnflow/inference/cms/datacard.py:35 docstring semantics, :376 rate
branch, :811 shape branch)."""

from __future__ import annotations

import pytest

from columnflow_spark.inference import (
    Category,
    InferenceModel,
    Parameter,
    Process,
    render_datacard,
    shape_integral_effects,
    transform_rate_effect,
    transform_shapes,
)


# ---------- rate-side scalar math ----------

def test_symmetrize_rate():
    # (0.92, 1.10): center 1.01 -> shift both down by 0.01
    eff, became = transform_rate_effect((0.92, 1.10), ["symmetrize"])
    assert not became
    assert eff == pytest.approx((0.91, 1.09))
    # one-sided pairs skip
    assert transform_rate_effect((1.02, 1.10), ["symmetrize"])[0] == (1.02, 1.10)
    # single values skip (no conversion to two-valued)
    assert transform_rate_effect(1.05, ["symmetrize"])[0] == 1.05


def test_asymmetrize_rate():
    assert transform_rate_effect(1.05, ["asymmetrize"])[0] == pytest.approx((0.95, 1.05))
    # already two-valued: skip
    assert transform_rate_effect((0.9, 1.1), ["asymmetrize"])[0] == (0.9, 1.1)


def test_asymmetrize_if_large_threshold():
    # default threshold 0.2: |1.05-1| < 0.2 -> unchanged
    assert transform_rate_effect(1.05, ["asymmetrize_if_large"])[0] == 1.05
    assert transform_rate_effect(1.25, ["asymmetrize_if_large"])[0] == pytest.approx(
        (0.75, 1.25)
    )
    eff, _ = transform_rate_effect(
        1.05, ["asymmetrize_if_large"], asymmetrize_if_large_threshold=0.01
    )
    assert eff == pytest.approx((0.95, 1.05))


def test_flip_one_sided_rates():
    # exact reference index selection (datacard.py:405-431): for
    # (0.8, 0.9) — both below nominal — flip_smaller mirrors index 0
    # (the smaller VALUE) and flip_larger mirrors index 1
    eff, _ = transform_rate_effect((0.8, 0.9), ["flip_smaller_if_one_sided"])
    assert eff == pytest.approx((1.2, 0.9))
    eff, _ = transform_rate_effect((0.8, 0.9), ["flip_larger_if_one_sided"])
    assert eff == pytest.approx((0.8, 1.1))
    # both above nominal, descending pair: index 0 flips
    eff, _ = transform_rate_effect((1.2, 1.1), ["flip_smaller_if_one_sided"])
    assert eff == pytest.approx((0.8, 1.1))
    # two-sided: untouched
    assert transform_rate_effect((0.9, 1.1), ["flip_smaller_if_one_sided"])[0] == (0.9, 1.1)


def test_effect_from_shape_chain():
    # integral effects feed the rate chain, then symmetrize applies
    eff, became = transform_rate_effect(
        1.0,
        ["effect_from_shape", "symmetrize"],
        shape_effect=(0.92, 1.10),
        shape_is_flat=True,
    )
    assert not became
    assert eff == pytest.approx((0.91, 1.09))


def test_effect_from_shape_if_flat_converts_to_shape():
    eff, became = transform_rate_effect(
        1.0,
        ["effect_from_shape_if_flat", "symmetrize"],
        shape_effect=(0.9, 1.1),
        shape_is_flat=False,
    )
    assert became and eff == 1.0
    # flat: behaves exactly like effect_from_shape
    eff, became = transform_rate_effect(
        1.0, ["effect_from_shape_if_flat"], shape_effect=(0.9, 1.1), shape_is_flat=True
    )
    assert not became and eff == pytest.approx((0.9, 1.1))


def test_from_shape_must_be_first():
    with pytest.raises(ValueError, match="first"):
        transform_rate_effect(
            1.0, ["symmetrize", "effect_from_shape"], shape_effect=(0.9, 1.1)
        )


# ---------- shape-side DataFrame transforms ----------

def _hists(spark, rows):
    return spark.createDataFrame(
        rows,
        "category string, process string, shift string, bin__x int, sum_w double, sum_w2 double",
    )


def _tmpl(df, shift):
    return {
        r.bin__x: (r.sum_w, r.sum_w2)
        for r in df.filter(df.shift == shift).collect()
    }


def test_shape_normalize(spark):
    rows = [
        ("c", "p", "nominal", 0, 10.0, 1.0), ("c", "p", "nominal", 1, 30.0, 1.0),
        ("c", "p", "sUp", 0, 20.0, 1.0), ("c", "p", "sUp", 1, 60.0, 1.0),
        ("c", "p", "sDown", 0, 5.0, 1.0), ("c", "p", "sDown", 1, 15.0, 1.0),
    ]
    out = transform_shapes(_hists(spark, rows), "s", ["normalize"])
    up, down = _tmpl(out, "sUp"), _tmpl(out, "sDown")
    # scaled to nominal integral 40: up (80 -> x0.5), down (20 -> x2)
    assert up[0][0] == pytest.approx(10.0) and up[1][0] == pytest.approx(30.0)
    assert down[0][0] == pytest.approx(10.0) and down[1][0] == pytest.approx(30.0)
    # nominal untouched
    assert _tmpl(out, "nominal")[0][0] == 10.0


def test_shape_symmetrize(spark):
    # integrals: n=40, d=36, u=48 -> diff = 0.5*(36+48) - 40 = 2
    # down *= 34/36, up *= 46/48
    rows = [
        ("c", "p", "nominal", 0, 10.0, 1.0), ("c", "p", "nominal", 1, 30.0, 1.0),
        ("c", "p", "sUp", 0, 12.0, 1.0), ("c", "p", "sUp", 1, 36.0, 1.0),
        ("c", "p", "sDown", 0, 9.0, 1.0), ("c", "p", "sDown", 1, 27.0, 1.0),
    ]
    out = transform_shapes(_hists(spark, rows), "s", ["symmetrize"])
    up, down = _tmpl(out, "sUp"), _tmpl(out, "sDown")
    assert up[0][0] == pytest.approx(12.0 * 46 / 48)
    assert down[1][0] == pytest.approx(27.0 * 34 / 36)


def test_shape_symmetrize_skips_one_sided(spark):
    # both variations above nominal -> untouched
    rows = [
        ("c", "p", "nominal", 0, 10.0, 1.0),
        ("c", "p", "sUp", 0, 12.0, 1.0),
        ("c", "p", "sDown", 0, 11.0, 1.0),
    ]
    out = transform_shapes(_hists(spark, rows), "s", ["symmetrize"])
    assert _tmpl(out, "sUp")[0][0] == 12.0
    assert _tmpl(out, "sDown")[0][0] == 11.0


def test_shape_envelope(spark):
    # bin 0: |up-nom|=4 > |down-nom|=1 -> down mirrored to nom - 4 = 6,
    #        down takes up's variance
    # bin 1: |down-nom|=6 > |up-nom|=2 -> up mirrored to nom + 6 = 36
    rows = [
        ("c", "p", "nominal", 0, 10.0, 1.0), ("c", "p", "nominal", 1, 30.0, 2.0),
        ("c", "p", "sUp", 0, 14.0, 3.0), ("c", "p", "sUp", 1, 32.0, 4.0),
        ("c", "p", "sDown", 0, 9.0, 5.0), ("c", "p", "sDown", 1, 24.0, 6.0),
    ]
    out = transform_shapes(_hists(spark, rows), "s", ["envelope"])
    up, down = _tmpl(out, "sUp"), _tmpl(out, "sDown")
    assert down[0] == (pytest.approx(6.0), pytest.approx(3.0))
    assert up[0] == (pytest.approx(14.0), pytest.approx(3.0))
    assert up[1] == (pytest.approx(36.0), pytest.approx(6.0))
    assert down[1] == (pytest.approx(24.0), pytest.approx(6.0))


def test_shape_envelope_if_one_sided(spark):
    # bin 0 two-sided (up above, down below): untouched even though |up| > |down|
    # bin 1 one-sided (both above): larger (down) mirrored onto up side
    rows = [
        ("c", "p", "nominal", 0, 10.0, 1.0), ("c", "p", "nominal", 1, 30.0, 1.0),
        ("c", "p", "sUp", 0, 14.0, 1.0), ("c", "p", "sUp", 1, 31.0, 1.0),
        ("c", "p", "sDown", 0, 9.0, 1.0), ("c", "p", "sDown", 1, 35.0, 1.0),
    ]
    out = transform_shapes(_hists(spark, rows), "s", ["envelope_if_one_sided"])
    up, down = _tmpl(out, "sUp"), _tmpl(out, "sDown")
    assert up[0][0] == 14.0 and down[0][0] == 9.0
    # down deviates more (+5): up takes the MIRROR of down (nom - 5),
    # down keeps its value — the reference mirrors the larger variation
    # onto the opposite template regardless of direction labels
    assert up[1][0] == pytest.approx(25.0)
    assert down[1][0] == pytest.approx(35.0)


def test_shape_envelope_enforce_two_sided(spark):
    # up = nom + max(|du|, |dd|), down = nom - it, regardless of sides
    rows = [
        ("c", "p", "nominal", 0, 10.0, 1.0),
        ("c", "p", "sUp", 0, 11.0, 3.0),
        ("c", "p", "sDown", 0, 16.0, 5.0),
    ]
    out = transform_shapes(_hists(spark, rows), "s", ["envelope_enforce_two_sided"])
    assert _tmpl(out, "sUp")[0] == (pytest.approx(16.0), pytest.approx(5.0))
    assert _tmpl(out, "sDown")[0] == (pytest.approx(4.0), pytest.approx(5.0))


def test_shape_effect_from_rate(spark):
    rows = [
        ("c", "p", "nominal", 0, 10.0, 4.0), ("c", "p", "nominal", 1, 30.0, 4.0),
    ]
    out = transform_shapes(
        _hists(spark, rows), "s", ["effect_from_rate"], effect=1.05
    )
    up, down = _tmpl(out, "sUp"), _tmpl(out, "sDown")
    assert up[0][0] == pytest.approx(10.5) and down[0][0] == pytest.approx(9.5)
    # variances scale by f^2
    assert up[0][1] == pytest.approx(4.0 * 1.05**2)


def test_shape_integral_effects_flatness(spark):
    # flat variation: bins equal -> std 0, outlier 0
    # non-flat: one bin deviates 50% from the mean
    rows = [
        ("c", "p", "nominal", 0, 10.0, 1.0), ("c", "p", "nominal", 1, 10.0, 1.0),
        ("c", "p", "sUp", 0, 12.0, 1.0), ("c", "p", "sUp", 1, 12.0, 1.0),
        ("c", "p", "sDown", 0, 6.0, 1.0), ("c", "p", "sDown", 1, 12.0, 1.0),
    ]
    r = shape_integral_effects(_hists(spark, rows), "s").collect()[0]
    assert r.eff_up == pytest.approx(24.0 / 20.0)
    assert r.eff_down == pytest.approx(18.0 / 20.0)
    assert not r.is_flat  # down variation: std/mean = 3/9 > 0.1
    flat_rows = [x for x in rows if x[2] != "sDown"] + [
        ("c", "p", "sDown", 0, 9.0, 1.0), ("c", "p", "sDown", 1, 9.0, 1.0),
    ]
    r = shape_integral_effects(_hists(spark, flat_rows), "s").collect()[0]
    assert r.is_flat


# ---------- end-to-end through render_datacard ----------

def _one_cat_model(params_by_proc):
    m = InferenceModel("t")
    cat = m.add_category(Category("c"))
    for pname, (is_sig, params) in params_by_proc.items():
        p = cat.add_process(Process(pname, is_signal=is_sig))
        for par in params:
            p.add_parameter(par)
    return m


def test_datacard_applies_rate_transformations():
    m = _one_cat_model({
        "sig": (True, [Parameter("jes", effect=1.25, transformations=("asymmetrize_if_large",))]),
        "bkg": (False, [Parameter("jes", effect=1.05, transformations=("asymmetrize_if_large",))]),
    })
    card = render_datacard(m, {("c", "sig"): 1.0, ("c", "bkg"): 2.0})
    assert "jes  lnN  0.75/1.25  1.05" in card


def test_datacard_effect_from_shape(spark):
    hists = spark.createDataFrame(
        [
            ("c", "sig", "nominal", 0, 10.0, 1.0), ("c", "sig", "nominal", 1, 10.0, 1.0),
            ("c", "sig", "jesUp", 0, 11.0, 1.0), ("c", "sig", "jesUp", 1, 11.0, 1.0),
            ("c", "sig", "jesDown", 0, 9.5, 1.0), ("c", "sig", "jesDown", 1, 9.5, 1.0),
        ],
        "category string, process string, shift string, bin__x int, sum_w double, sum_w2 double",
    )
    m = _one_cat_model({
        "sig": (True, [Parameter("jes", effect=1.0, transformations=("effect_from_shape",))]),
    })
    card = render_datacard(m, {("c", "sig"): 20.0}, shapes=hists)
    assert "jes  lnN  0.95/1.1" in card


def test_datacard_if_flat_converts_to_shape(spark):
    # sig's variations are flat -> stays lnN; bkg's down variation is
    # lumpy -> parameter becomes shape-type for that column, and the
    # mixed line renders as combine's "shape?"
    hists = spark.createDataFrame(
        [
            ("c", "sig", "nominal", 0, 10.0, 1.0), ("c", "sig", "nominal", 1, 10.0, 1.0),
            ("c", "sig", "jesUp", 0, 11.0, 1.0), ("c", "sig", "jesUp", 1, 11.0, 1.0),
            ("c", "sig", "jesDown", 0, 9.0, 1.0), ("c", "sig", "jesDown", 1, 9.0, 1.0),
            ("c", "bkg", "nominal", 0, 10.0, 1.0), ("c", "bkg", "nominal", 1, 10.0, 1.0),
            ("c", "bkg", "jesUp", 0, 11.0, 1.0), ("c", "bkg", "jesUp", 1, 11.0, 1.0),
            ("c", "bkg", "jesDown", 0, 4.0, 1.0), ("c", "bkg", "jesDown", 1, 16.0, 1.0),
        ],
        "category string, process string, shift string, bin__x int, sum_w double, sum_w2 double",
    )
    m = _one_cat_model({
        "sig": (True, [Parameter("jes", effect=1.0, transformations=("effect_from_shape_if_flat",))]),
        "bkg": (False, [Parameter("jes", effect=1.0, transformations=("effect_from_shape_if_flat",))]),
    })
    card = render_datacard(m, {("c", "sig"): 20.0, ("c", "bkg"): 20.0}, shapes=hists)
    assert "jes  shape?  0.9/1.1  1" in card
