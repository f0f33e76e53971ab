"""Property-based tests (hypothesis) for the pure-Python core: Route
algebra invariants, brace expansion, and the inference model — the
reference's test style (tiny algebraic fixtures) generalized to generated
inputs.  No Spark session needed; these run in milliseconds."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from columnflow_spark.core.routes import Route, brace_expand
from columnflow_spark.inference import Category, InferenceModel, Parameter, Process

_field = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=8,
).filter(lambda s: not s[0].isdigit())


@given(st.lists(_field, min_size=1, max_size=4))
def test_route_join_split_roundtrip(fields):
    r = Route(tuple(fields))
    assert Route(str(r)).fields == tuple(fields)
    assert Route.split(Route.join(fields)) == tuple(fields)
    # nano format round-trips only when fields are underscore-free, but
    # parsing its own serialization is always stable
    assert Route(str(Route(str(r)))) == r


@given(st.lists(_field, min_size=1, max_size=4), st.lists(_field, min_size=1, max_size=3))
def test_route_add_is_concatenation(a, b):
    assert (Route(tuple(a)) + Route(tuple(b))).fields == tuple(a) + tuple(b)
    assert Route(tuple(a) + tuple(b)).startswith(Route(tuple(a)))


@given(
    st.lists(st.lists(_field, min_size=1, max_size=4), min_size=1, max_size=3),
    _field,
)
def test_brace_expand_product(groups, head):
    # pattern head.{g1a,g1b}.{g2a,...}... expands to the full cross product
    pattern = head + "".join("." + "{" + ",".join(g) + "}" for g in groups)
    out = brace_expand(pattern)
    expected = 1
    for g in groups:
        expected *= len(g)
    assert len(out) == expected
    assert len(set(out)) == len(set(tuple(o) for o in out))
    for o in out:
        assert o.startswith(head + ".")
        assert "{" not in o and "}" not in o


@given(st.data())
def test_inference_model_parameter_order(data):
    names = data.draw(st.lists(_field, min_size=1, max_size=6, unique=True))
    m = InferenceModel("m")
    cat = m.add_category(Category("c"))
    p = cat.add_process(Process("p"))
    for n in names:
        p.add_parameter(Parameter(n, "rate_gauss", 1.1))
    # kmax axis preserves first-appearance order and dedupes
    assert m.parameter_names == names


@given(st.floats(min_value=0.5, max_value=2.0, allow_nan=False))
def test_parameter_effect_str(x):
    p = Parameter("p", "rate_gauss", x)
    assert float(p.effect_str()) == round(x, 4)
    pair = Parameter("p", "rate_uniform", (x, x + 0.1))
    assert pair.combine_type == "lnU"
    assert "/" in pair.effect_str()
