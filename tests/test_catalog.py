"""Catalog layer tests, mirroring reference tests/test_config_util.py
semantics (leaf-expansion of get_events_from_categories) plus
create_category_combinations behavior (reference config_util.py:549)."""

from __future__ import annotations

import pytest

from columnflow_spark.catalog import (
    Analysis,
    Category,
    CategoryGroup,
    Config,
    Dataset,
    Process,
    add_category,
    category_filter_column,
    create_category_combinations,
    create_category_id,
    leaf_category_ids_column,
)


def make_config() -> Config:
    cfg = Config("run3", 1)
    return cfg


def test_analysis_config_dataset_process_tree():
    ana = Analysis("demo", 1)
    cfg = ana.add_config(make_config())
    tt = cfg.add_process(Process("tt", 100, xsecs={13.6: 0.0}))
    sl = tt.add_process(Process("tt_sl", 101, xsecs={13.6: 400.0}))
    dl = tt.add_process(Process("tt_dl", 102, xsecs={13.6: 100.0}))
    assert not tt.is_leaf and sl.is_leaf and dl.is_leaf
    assert [p.name for p in tt.get_leaf_processes()] == ["tt_sl", "tt_dl"]
    # non-leaf xsec = sum of leaves unless explicitly set at that energy
    tt.xsecs.clear()
    assert tt.get_xsec(13.6) == 500.0

    ds = cfg.add_dataset(Dataset("tt_sl_powheg", 1, is_mc=True, n_files=3, n_events=3000, processes=[sl]))
    assert ds.is_mc and not ds.is_data
    assert cfg.get_dataset("tt_sl_powheg").processes.get("tt_sl") is sl
    data = cfg.add_dataset(Dataset("data_mu_a", 2, is_mc=False))
    assert data.is_data

    # duplicate ids / names rejected
    with pytest.raises(ValueError):
        cfg.add_dataset(Dataset("tt_sl_powheg", 9))
    with pytest.raises(ValueError):
        cfg.add_dataset(Dataset("other", 1))


def test_category_hierarchy_and_leaf_expansion():
    # reference tests/test_config_util.py fixture: main_1; main_2 > leaf_21,
    # leaf_22 > leaf_221
    cfg = make_config()
    cfg.add_category(Category("main_1", 1, selection="x = 1"))
    main_2 = cfg.add_category(Category("main_2", 2, selection="x = 2"))
    main_2.add_category(Category("leaf_21", 21, selection="y = 1"))
    leaf_22 = main_2.add_category(Category("leaf_22", 22, selection="y = 2"))
    leaf_22.add_category(Category("leaf_221", 221, selection="z = 1"))

    assert cfg.get_category("leaf_221").id == 221
    assert cfg.get_category(21).name == "leaf_21"
    with pytest.raises(ValueError):
        cfg.get_category("nope")
    # main_1 is itself a leaf; main_2 expands to its leaf descendants only
    assert [c.id for c in cfg.get_category("main_1").get_leaf_categories()] == [1]
    assert [c.id for c in cfg.get_category("main_2").get_leaf_categories()] == [21, 221]


def test_category_filter_matches_reference_semantics(spark):
    cfg = make_config()
    cfg.add_category(Category("main_1", 1, selection="true"))
    main_2 = cfg.add_category(Category("main_2", 2, selection="true"))
    main_2.add_category(Category("leaf_21", 21, selection="true"))
    leaf_22 = main_2.add_category(Category("leaf_22", 22, selection="true"))
    leaf_22.add_category(Category("leaf_221", 221, selection="true"))

    df = spark.createDataFrame(
        [(1, [1]), (2, [21, 221]), (3, [21]), (4, [221])],
        "dummy_field int, category_ids array<int>",
    )

    def picked(cats):
        rows = df.filter(category_filter_column(cfg, cats)).select("dummy_field").collect()
        return sorted(r.dummy_field for r in rows)

    assert picked(["main_1"]) == [1]
    assert picked(["main_2"]) == [2, 3, 4]
    assert picked(["leaf_221"]) == [2, 4]
    assert picked(["main_1", "main_2"]) == [1, 2, 3, 4]
    # non-leaf ids in the data never match (reference: only leaf ids select)
    df2 = spark.createDataFrame([(1, [2]), (2, [-1]), (3, [99])], "dummy_field int, category_ids array<int>")
    assert df2.filter(category_filter_column(cfg, ["main_2"])).count() == 0
    with pytest.raises(ValueError):
        picked(["nonexisting"])


def _combo_config() -> Config:
    cfg = make_config()
    for name, id_, sel in [
        ("e", 10, "channel = 'e'"),
        ("mu", 11, "channel = 'mu'"),
        ("eq0j", 20, "n_jets = 0"),
        ("eq1j", 21, "n_jets = 1"),
        ("ge2j", 22, "n_jets >= 2"),
        ("0t", 30, "n_tags = 0"),
        ("1t", 31, "n_tags = 1"),
    ]:
        cfg.add_category(Category(name, id_, selection=sel))
    return cfg


def _name_fn(cats: dict) -> str:
    return "__".join(c.name for c in cats.values() if c)


def test_create_category_combinations_counts_and_parents():
    cfg = _combo_config()
    groups = {
        "lepton": CategoryGroup(categories=["e", "mu"], is_complete=False, has_overlap=False),
        "n_jets": CategoryGroup(categories=["eq0j", "eq1j", "ge2j"], is_complete=True, has_overlap=False),
        "n_tags": CategoryGroup(categories=["0t", "1t"], is_complete=False, has_overlap=False),
    }
    n = create_category_combinations(cfg, dict(groups), _name_fn, parent_mode="safe")
    # safe mode: lepton and n_tags are not partitions, so any subset
    # omitting either is skipped; surviving layers: (lepton, n_tags)=4
    # and the full (lepton, n_jets, n_tags)=12
    assert n == 16
    leaf = cfg.get_category("e__eq0j__0t")
    assert leaf.selection == ["channel = 'e'", "n_jets = 0", "n_tags = 0"]
    assert leaf.selection_expr() == "(channel = 'e') AND (n_jets = 0) AND (n_tags = 0)"
    # full-depth combos hang below the existing 2-group layer
    assert any(p.name == "e__0t" for p in leaf.parents)

    # "all": every subset layer: 2*3 + 2*2 + 3*2 + 2*3*2 = 28
    cfg2 = _combo_config()
    assert create_category_combinations(cfg2, dict(groups), _name_fn, parent_mode="all") == 28
    # "none": only full-depth leaves
    cfg3 = _combo_config()
    assert create_category_combinations(cfg3, dict(groups), _name_fn, parent_mode="none") == 12
    # re-running with skip_existing leaves everything in place
    assert create_category_combinations(cfg3, dict(groups), _name_fn, parent_mode="none") == 0
    # skip_fn vetoes combos
    cfg4 = _combo_config()
    n4 = create_category_combinations(
        cfg4, dict(groups), _name_fn, parent_mode="none",
        skip_fn=lambda cats: cats["lepton"].name == "e",
    )
    assert n4 == 6


def test_create_category_id_deterministic_and_offset():
    cfg = make_config()
    i1 = create_category_id(cfg, "e__eq0j")
    assert i1 == create_category_id(cfg, "e__eq0j")
    assert i1 != create_category_id(cfg, "e__eq1j")
    assert i1 != create_category_id(Config("other", 2), "e__eq0j")
    # offset keeps generated ids clear of small hand-assigned ones
    assert i1 >= 10 ** len(str(int("F" * 7, 16)))
    c = add_category(cfg, name="auto", selection="true")
    assert c.id == create_category_id(cfg, "auto")


def test_leaf_category_ids_column(spark):
    cfg = _combo_config()
    groups = {
        "lepton": CategoryGroup(categories=["e", "mu"], is_complete=True, has_overlap=False),
        "n_jets": CategoryGroup(categories=["eq0j", "eq1j", "ge2j"], is_complete=True, has_overlap=False),
    }
    create_category_combinations(cfg, groups, _name_fn)
    df = spark.createDataFrame(
        [("e", 0), ("e", 2), ("mu", 1)], "channel string, n_jets int"
    ).withColumn("category_ids", leaf_category_ids_column(cfg, roots=["e", "mu"]))
    rows = {(r.channel, r.n_jets): set(r.category_ids) for r in df.collect()}
    assert rows[("e", 0)] == {cfg.get_category("e__eq0j").id}
    assert rows[("e", 2)] == {cfg.get_category("e__ge2j").id}
    assert rows[("mu", 1)] == {cfg.get_category("mu__eq1j").id}


def test_shift_aliases_and_plan_bridge(spark):
    from columnflow_spark.catalog import Shift, add_shift_aliases, get_shifts_from_sources
    from columnflow_spark.plans.shifts import apply_shift_aliases

    cfg = make_config()
    cfg.add_shift("price_up", 1)
    cfg.add_shift("price_down", 2)
    add_shift_aliases(cfg, "price", {"price": "price_{direction}"})
    up = cfg.get_shift("price_up")
    assert up.source == "price" and up.is_up and not up.is_down
    assert up.column_aliases == {"price": "price_up"}
    assert cfg.get_shift("price_down").column_aliases == {"price": "price_down"}
    assert [s.name for s in get_shifts_from_sources(cfg, "price")] == ["price_up", "price_down"]
    with pytest.raises(ValueError):
        Shift("bogus", 9)

    # the alias map applies right after the scan: downstream reads the
    # shifted values under the nominal name
    df = spark.createDataFrame([(1.0, 1.1, 0.9)], "price double, price_up double, price_down double")
    shifted = apply_shift_aliases(df, up.to_plan_shift())
    assert shifted.select("price").first().price == 1.1
