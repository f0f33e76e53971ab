"""Exact-integer PageRank: ranking structure, dangling-mass liveness,
and run-to-run determinism (the integer grid's whole point)."""

from __future__ import annotations

from columnflow_spark.queries import all_queries
from columnflow_spark.queries.graph import _PR_SCALE, _PR_D_NUM, _PR_D_DEN


def _rows(spark, sf_dir):
    return [
        (r.node, r.rank_q, r.rk)
        for r in all_queries()["pagerank_trade_graph"](spark, sf_dir).collect()
    ]


def test_pagerank_structure_and_determinism(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    assert [r[2] for r in rows] == list(range(1, len(rows) + 1))
    key = [(-r[1], r[0]) for r in rows]
    assert key == sorted(key)
    # suppliers (odd ids) aggregate the flow of many customers: the whole
    # head of the ranking is suppliers
    assert all(r[0] % 2 == 1 for r in rows[:5]), rows[:5]
    # every head rank exceeds the no-inflow fixed point ((1-d) plus the
    # damped dangling share keeps sources near base; sinks sit well above)
    base = (100 - _PR_D_NUM) * _PR_SCALE // _PR_D_DEN
    assert all(r[1] > base for r in rows), (rows[0], base)
    # exact integer arithmetic end-to-end => bit-identical reruns
    assert _rows(spark, sf_dir) == rows
