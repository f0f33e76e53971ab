"""ArrayFunction registry tests (model: reference tests/test_columnar_util.py:305-430)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnflow_spark.core.registry import ArrayFunction
from columnflow_spark.operators import (
    SelectionResult,
    calibrator,
    producer,
    selector,
)
from columnflow_spark.operators.selection import apply_event_mask, rebuild_collection
from columnflow_spark.plans.stage import StageChain


@producer(uses={"a"}, produces={"b"})
def prod_b(self, df):
    return df.withColumn("b", F.col("a") * 2)


@producer(uses={prod_b, "c"}, produces={prod_b, "d"})
def prod_d(self, df):
    df = self[prod_b](df)
    return df.withColumn("d", F.col("b") + F.col("c"))


def test_registry_lookup():
    assert type(prod_b) is type and issubclass(prod_b, ArrayFunction)
    from columnflow_spark.operators import Producer

    assert Producer.get_cls("prod_b") is prod_b
    assert Producer.has_cls("prod_d")


def test_column_resolution():
    inst = prod_d()
    assert {str(r) for r in inst.used_columns} == {"a", "c"}
    assert {str(r) for r in inst.produced_columns} == {"b", "d"}


def test_dependency_access_and_call(spark):
    df = spark.createDataFrame([(1, 10)], "a: int, c: int")
    inst = prod_d()
    out = inst(df).select("a", "b", "c", "d").collect()[0]
    assert (out["b"], out["d"]) == (2, 12)


def test_skip_mc_only(spark):
    @calibrator(mc_only=True, produces={"w"})
    def mc_cal(self, df):
        return df.withColumn("w", F.lit(1.0))

    assert not mc_cal(is_mc=True).skipped
    assert mc_cal(is_mc=False).skipped


def test_init_hook_mutates_columns():
    def init(self):
        self.uses.add("dyn_col")

    @producer(uses={"a"}, produces={"x"}, init_func=init)
    def dyn_prod(self, df):
        return df

    inst = dyn_prod()
    assert {str(r) for r in inst.used_columns} == {"a", "dyn_col"}


def test_selection_result_merge(spark):
    r1 = SelectionResult(steps={"s1": F.lit(True)})
    r2 = SelectionResult(steps={"s2": F.col("flag")})
    merged = r1 + r2
    assert set(merged.steps) == {"s1", "s2"}
    with pytest.raises(ValueError):
        merged + SelectionResult(steps={"s1": F.lit(False)})


def test_selection_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [(10.0,), (3.0,)]), (2, [(1.0,)])],
        "event: int, jets: array<struct<pt: double>>",
    )
    res = SelectionResult(
        steps={"has_hard_jet": F.exists("jets", lambda j: j["pt"] > 5.0)},
        objects={"jets": {"GoodJet": F.transform("jets", lambda j: j["pt"] > 5.0)}},
    )
    out = rebuild_collection(apply_event_mask(res.attach(df)), "jets", "GoodJet")
    rows = out.select("event", "GoodJet").collect()
    assert len(rows) == 1 and rows[0]["event"] == 1
    assert [j["pt"] for j in rows[0]["GoodJet"]] == [10.0]


def test_stage_chain_prunes(spark):
    df = spark.createDataFrame([(1, 10, 99)], "a: int, c: int, unused: int")
    chain = StageChain([prod_d()])
    out = chain.run(df)
    assert "unused" not in out.columns
    assert out.select("d").collect()[0]["d"] == 12


def test_stage_chain_missing_column(spark):
    df = spark.createDataFrame([(1,)], "a: int")
    with pytest.raises(ValueError, match="missing"):
        StageChain([prod_d()]).run(df)


# --- route tags / conditional columns (reference columnar_util.py:2448-2514) ---

def test_tagged_optional_skip_columns():
    from columnflow_spark.core.routes import Route, optional_column, skip_column, tagged_column

    r = optional_column("gen_weight")
    assert isinstance(r, Route) and r.has_tag("optional")
    many = optional_column("items.{pt,eta}")
    assert {str(m) for m in many} == {"items.pt", "items.eta"}
    assert all(m.has_tag("optional") for m in many)
    s = skip_column("tmp_col")
    assert s.has_tag("skip")
    both = tagged_column({"optional", "skip"}, "x")
    assert both.has_tag("optional") and both.has_tag("skip")
    assert both.has_tag({"optional", "nope"}) and not both.has_tag({"optional", "nope"}, mode=all)
    # tags never affect identity
    assert Route("x") == both and hash(Route("x")) == hash(both)
    # tags survive copy-construction
    assert Route(both).has_tag("skip")


def test_conditional_columns_mc_data():
    from columnflow_spark.core.registry import IF_DATA, IF_DATASET_HAS_TAG, IF_MC
    from columnflow_spark.catalog import Dataset

    prod = ArrayFunction.derive(
        "cond_prod",
        {
            "uses": {"pt", IF_MC("gen_pt")},
            "produces": {"pt_corr", IF_MC("gen_match"), IF_DATA("lumi_mask"),
                         IF_DATASET_HAS_TAG("signal")("signal_flag")},
        },
    )
    mc = prod(dataset_inst=Dataset("tt", 1, is_mc=True, tags={"signal"}))
    assert {str(r) for r in mc.used_columns} == {"pt", "gen_pt"}
    assert {str(r) for r in mc.produced_columns} == {"pt_corr", "gen_match", "signal_flag"}
    data = prod(dataset_inst=Dataset("data_mu", 2, is_mc=False))
    assert {str(r) for r in data.used_columns} == {"pt"}
    assert {str(r) for r in data.produced_columns} == {"pt_corr", "lumi_mask"}
    # negation
    bkg_only = ArrayFunction.derive(
        "cond_neg", {"uses": set(), "produces": {(~IF_DATASET_HAS_TAG("signal")("bkg_flag"))}}
    )
    assert {str(r) for r in bkg_only(dataset_inst=Dataset("qcd", 3)).produced_columns} == {"bkg_flag"}
    assert not bkg_only(dataset_inst=Dataset("sig", 4, tags={"signal"})).produced_columns


def test_skip_tag_excluded_from_produced():
    from columnflow_spark.core.routes import skip_column

    prod = ArrayFunction.derive(
        "skip_prod", {"uses": {"a"}, "produces": {"kept", skip_column("scratch")}}
    )
    assert {str(r) for r in prod().produced_columns} == {"kept"}


def test_stage_chain_optional_columns(spark):
    from columnflow_spark.core.routes import optional_column
    from columnflow_spark.catalog import Dataset
    from columnflow_spark.core.registry import IF_MC

    def call(self, df):
        cols = {"out": F.col("a") * 2}
        if "gen_w" in df.columns:
            cols["out_w"] = F.col("a") * F.col("gen_w")
        return df.withColumns(cols)

    prod = ArrayFunction.derive(
        "opt_prod",
        {"uses": {"a", optional_column("gen_w"), IF_MC("mc_x")}, "produces": {"out"},
         "call_func": call},
    )
    # data df without gen_w/mc_x: optional + condition-false columns are
    # dropped from the prune set, the chain runs without error
    df = spark.createDataFrame([(3, 1)], "a: int, unused: int")
    out = StageChain([prod(dataset_inst=Dataset("d", 1, is_mc=False))]).run(df)
    assert out.select("out").first().out == 6
    assert "unused" not in out.columns
    # mc df missing the REQUIRED conditional column still raises
    with pytest.raises(ValueError, match="missing"):
        StageChain([prod(dataset_inst=Dataset("m", 2, is_mc=True))]).run(df)
    # present optional column flows through
    df2 = spark.createDataFrame([(3, 5.0, 7.0)], "a: int, gen_w: double, mc_x: double")
    out2 = StageChain([prod(dataset_inst=Dataset("m2", 3, is_mc=True))]).run(df2)
    assert out2.select("out_w").first().out_w == 15.0


def test_column_collection_output_filter(spark):
    from columnflow_spark.operators import producer
    from columnflow_spark.plans.stage import ColumnCollection, StageChain

    @producer(uses={"a"}, produces={"derived"})
    def my_prod(self, df):
        return df.withColumn("derived", F.col("a") * 2)

    chain = StageChain([my_prod()], keep=("a",))
    df = spark.createDataFrame([(3, 9)], "a: int, scratch: int")
    out = chain.run(df.withColumn("other", F.lit(1)), prune=False)
    # keep everything the producers made, plus an explicit pattern
    final = chain.filter_output(out, keep=[ColumnCollection.ALL_FROM_PRODUCER, "a"])
    assert set(final.columns) == {"a", "derived"}
