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
