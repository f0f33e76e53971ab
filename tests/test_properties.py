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


_group_sizes = st.lists(st.integers(min_value=1, max_value=3), min_size=2, max_size=4)
_partition_flags = st.lists(st.booleans(), min_size=2, max_size=4)


@given(st.data())
def test_category_combination_counts_match_formula(data):
    # the number of created categories equals the subset-product formula
    # for each parent_mode (reference config_util.py:549 iteration order)
    import itertools

    from columnflow_spark.catalog import Category, CategoryGroup, Config, create_category_combinations

    sizes = data.draw(_group_sizes)
    flags = data.draw(st.lists(st.booleans(), min_size=len(sizes), max_size=len(sizes)))
    mode = data.draw(st.sampled_from(["all", "none", "safe"]))

    cfg = Config("prop", 1)
    groups = {}
    next_id = 1
    for gi, (sz, is_part) in enumerate(zip(sizes, flags)):
        cats = []
        for ci in range(sz):
            c = cfg.add_category(Category(f"g{gi}c{ci}", next_id, selection=f"x = {next_id}"))
            next_id += 1
            cats.append(c)
        groups[f"g{gi}"] = CategoryGroup(categories=cats, is_complete=is_part, has_overlap=False)

    n = create_category_combinations(
        cfg, groups, lambda cats: "__".join(c.name for c in cats.values()), parent_mode=mode
    )

    names = list(groups)
    unsafe = {nm for nm, g in groups.items() if not g.is_partition}
    expected = 0
    subset_sizes = [len(names)] if mode == "none" else range(2, len(names) + 1)
    for size in subset_sizes:
        for combo in itertools.combinations(names, size):
            if mode == "safe" and (set(names) - set(combo)) & unsafe:
                continue
            prod = 1
            for nm in combo:
                prod *= len(groups[nm].categories)
            expected += prod
    assert n == expected


@given(st.lists(st.text(alphabet="abcd.", min_size=1, max_size=6), min_size=1, max_size=4))
def test_route_tags_never_affect_identity(tags):
    from columnflow_spark.core.routes import Route

    r = Route("a.b").add_tag(set(tags))
    assert r == Route("a.b")
    assert hash(r) == hash(Route("a.b"))
    assert Route(r).tags == r.tags
