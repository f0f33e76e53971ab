"""Route algebra tests (model: reference tests/test_columnar_util.py:22-302)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnflow_spark.core.routes import (
    EMPTY_FLOAT,
    ObjIndex,
    ObjSlice,
    Route,
    brace_expand,
    get_routes,
    match_routes,
)


def test_parse_dot():
    r = Route("items.price")
    assert r.fields == ("items", "price")
    assert r.selection is None
    assert str(r) == "items.price"
    assert r.nano_column == "items_price"


def test_parse_index():
    r = Route("items.price[:, 0]")
    assert r.fields == ("items", "price")
    assert r.selection == ObjIndex(0)
    assert str(r) == "items.price[:, 0]"


def test_parse_negative_index():
    assert Route("items.price[:, -1]").selection == ObjIndex(-1)


def test_parse_slice():
    r = Route("items.price[:, 1:3]")
    assert r.selection == ObjSlice(1, 3)
    r = Route("items.price[:, :2]")
    assert r.selection == ObjSlice(0, 2)


def test_equality_and_hash():
    assert Route("a.b") == Route(("a", "b"))
    assert Route("a.b") == "a.b"
    assert len({Route("a.b"), Route("a.b"), Route("a.c")}) == 2


def test_add():
    assert Route("a") + "b.c" == Route("a.b.c")
    with pytest.raises(ValueError):
        Route("a[:, 0]") + "b"


def test_startswith():
    assert Route("a.b.c").startswith("a.b")
    assert not Route("a.b").startswith("a.b.c")


def test_brace_expand():
    assert brace_expand("items.{pt,eta}") == ["items.pt", "items.eta"]
    assert brace_expand("a.{b,c}.{d,e}") == ["a.b.d", "a.b.e", "a.c.d", "a.c.e"]
    assert brace_expand("plain") == ["plain"]


def test_apply_index_null_fill(spark):
    df = spark.createDataFrame(
        [([10.0, 20.0],), ([],)],
        "items_price: array<double>",
    )
    out = df.select(
        Route("items_price[:, 0]").apply(null_value=EMPTY_FLOAT).alias("first"),
        Route("items_price[:, -1]").apply(null_value=EMPTY_FLOAT).alias("last"),
        Route("items_price[:, :1]").apply().alias("sliced"),
    ).collect()
    assert out[0]["first"] == 10.0 and out[0]["last"] == 20.0 and out[0]["sliced"] == [10.0]
    assert out[1]["first"] == EMPTY_FLOAT and out[1]["last"] == EMPTY_FLOAT and out[1]["sliced"] == []


def test_apply_nested_array_struct(spark):
    df = spark.createDataFrame(
        [(1, [(1.0, 2.0), (3.0, 4.0)]), (2, [])],
        "event: int, items: array<struct<pt: double, eta: double>>",
    )
    rows = df.select(
        Route("items.pt").apply().alias("pts"),
        Route("items.pt[:, 0]").apply(null_value=EMPTY_FLOAT).alias("pt1"),
    ).orderBy("pts", ascending=False).collect()
    assert rows[0]["pts"] == [1.0, 3.0] and rows[0]["pt1"] == 1.0
    assert rows[1]["pts"] == [] and rows[1]["pt1"] == EMPTY_FLOAT


def test_get_routes(spark):
    df = spark.createDataFrame(
        [(1, (2.0, 3), [(1.0,)], [5])],
        "a: int, s: struct<x: double, y: int>, items: array<struct<pt: double>>, tags: array<int>",
    )
    routes = {str(r) for r in get_routes(df.schema)}
    assert routes == {"a", "s.x", "s.y", "items.pt", "tags"}


def test_match_routes():
    routes = [Route("items.pt"), Route("items.eta"), Route("met.pt")]
    assert {str(r) for r in match_routes(routes, ["items.{pt,eta}"])} == {"items.pt", "items.eta"}
    assert {str(r) for r in match_routes(routes, ["*.pt"])} == {"items.pt", "met.pt"}


def test_route_tag_glob_patterns():
    # reference tests/test_columnar_util.py test_tags: pattern-matched tags
    from columnflow_spark.core.routes import Route

    r = Route("i.like.trains").add_tag({"optional", "foo.bar"})
    assert r.has_tag("optional")
    assert r.has_tag("opt*")
    assert r.has_tag("foo.bar")
    assert r.has_tag("foo.*")
    assert not r.has_tag("bar")
    assert Route(r).has_tag("optional") and not Route(r).has_tag("bar")
    assert r.has_tag({"opt*", "nope"}) and not r.has_tag({"opt*", "nope"}, mode=all)
