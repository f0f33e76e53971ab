"""Column-op semantics (SURVEY §2.2; reference tests
tests/test_columnar_util.py:432-826 against tiny inline nested fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnflow_spark.core.columns import (
    add_aliases,
    flatten_table,
    remove_column,
    route_filter,
    set_column,
    update_table,
)


@pytest.fixture(scope="module")
def events(spark):
    # reference fixture shape: event scalars + a jagged Jet-like collection
    return spark.createDataFrame(
        [
            (1, 10.0, {"a": 1, "b": 2.0}, [{"pt": 45.0, "eta": 2.5}, {"pt": 20.0, "eta": -1.0}]),
            (2, 20.0, {"a": 3, "b": 4.0}, []),
        ],
        "event bigint, met double, rec struct<a:int,b:double>, Jet array<struct<pt:double,eta:double>>",
    )


def test_set_column_event_level(events):
    out = set_column(events, "met2", F.col("met") * 2)
    assert [r["met2"] for r in out.orderBy("event").collect()] == [20.0, 40.0]
    # cast + overwrite
    out = set_column(events, "met", F.col("met"), cast="float")
    assert dict(out.dtypes)["met"] == "float"


def test_set_column_nested_struct(events):
    out = set_column(events, "rec.c", F.col("rec.a") + 10)
    assert out.schema["rec"].dataType.fieldNames() == ["a", "b", "c"]
    assert [r["rec"]["c"] for r in out.orderBy("event").collect()] == [11, 13]
    # new root struct
    out = set_column(events, "new.x", F.lit(1))
    assert [r["new"]["x"] for r in out.collect()] == [1, 1]


def test_set_column_object_level(events):
    out = set_column(events, "Jet.pt2", lambda x: x["pt"] * x["pt"])
    rows = out.orderBy("event").collect()
    assert [j["pt2"] for j in rows[0]["Jet"]] == [45.0 * 45.0, 20.0 * 20.0]
    assert rows[1]["Jet"] == []
    with pytest.raises(TypeError):
        set_column(events, "Jet.pt2", F.lit(1.0))


def test_remove_column(events):
    assert "met" not in remove_column(events, "met").columns
    out = remove_column(events, "rec.a")
    assert out.schema["rec"].dataType.fieldNames() == ["b"]
    out = remove_column(events, "Jet.eta")
    assert out.schema["Jet"].dataType.elementType.fieldNames() == ["pt"]


def test_add_aliases_strategies(events):
    out = add_aliases(events, {"met_up": "met"})
    assert [r["met_up"] for r in out.orderBy("event").collect()] == [10.0, 20.0]
    out = add_aliases(events, {"met2": "met"}, remove_src=True)
    assert "met" not in out.columns and "met2" in out.columns
    with pytest.raises(ValueError):
        add_aliases(events, {"x": "nope"})
    # original: silently keep; remove: drop the dst
    assert "met" in add_aliases(events, {"met": "nope"}, missing="original").columns
    assert "met" not in add_aliases(events, {"met": "nope"}, missing="remove").columns


def test_update_table(spark, events):
    diff = spark.createDataFrame([(1, 99.0, "x"), (2, 88.0, "y")], "event bigint, met double, tag string")
    out = update_table(events, diff, key=["event"])
    rows = {r["event"]: r for r in out.collect()}
    # later table wins on clash, new columns appended
    assert rows[1]["met"] == 99.0 and rows[1]["tag"] == "x"
    assert rows[2]["met"] == 88.0
    with pytest.raises(ValueError):
        update_table(events, diff, key=["event"], policy="raise")


def test_flatten_table(events):
    dot = flatten_table(events, "dot")
    assert set(dot.columns) == {"event", "met", "rec.a", "rec.b", "Jet.pt", "Jet.eta"}
    nano = flatten_table(events, "nano")
    assert "Jet_pt" in nano.columns and "rec_a" in nano.columns
    row = nano.orderBy("event").collect()[0]
    assert row["Jet_pt"] == [45.0, 20.0]


def test_route_filter(events):
    # keep with brace pattern; collection rebuilt with surviving members
    out = route_filter(events, keep=["event", "Jet.{pt}"])
    assert out.columns == ["event", "Jet"]
    assert out.schema["Jet"].dataType.elementType.fieldNames() == ["pt"]
    # remove patterns; partial struct rebuild
    out = route_filter(events, remove=["rec.b", "Jet.*"])
    assert out.columns == ["event", "met", "rec"]
    assert out.schema["rec"].dataType.fieldNames() == ["a"]
    # keep everything is a no-op projection
    assert route_filter(events).columns == events.columns


def test_has_column(spark):
    from columnflow_spark.core.columns import has_column

    df = spark.createDataFrame(
        [(1, [(2.0, 3.0)])], "a: int, items: array<struct<pt: double, eta: double>>"
    )
    assert has_column(df, "a")
    assert has_column(df, "items.pt")
    assert not has_column(df, "items.phi")
    assert not has_column(df, "b")
    assert not has_column(df, "a.b")


def test_nest_nano_columns_round_trip(spark):
    from columnflow_spark.core.columns import flatten_table, nest_nano_columns

    df = spark.createDataFrame(
        [(1, [10.0, 20.0], [0.1, 0.2], 42.5)],
        "event: bigint, Jet_pt: array<double>, Jet_eta: array<double>, MET_pt: double",
    )
    nested = nest_nano_columns(df)
    assert dict(nested.dtypes)["Jet"].startswith("array<struct")
    row = nested.first()
    assert [j["pt"] for j in row.Jet] == [10.0, 20.0]
    assert [j["eta"] for j in row.Jet] == [0.1, 0.2]
    # single-member groups and plain columns pass through unchanged
    # (nesting them would mangle ordinary snake_case names)
    assert row.MET_pt == 42.5 and row.event == 1
    # flatten(nano) is the inverse on the array collection
    flat = flatten_table(nested, fmt="nano")
    assert set(flat.columns) >= {"Jet_pt", "Jet_eta", "MET_pt", "event"}
    assert flat.first()["Jet_pt"] == [10.0, 20.0]
