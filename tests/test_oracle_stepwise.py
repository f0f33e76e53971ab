"""Stepwise oracle execution (VERDICT r10 next #7): the WITH-chain →
temp-table transform must be result-identical to verbatim execution,
reuse unchanged steps across oracles, and rebuild a step whose
UPSTREAM changed even when its own text did not."""

from __future__ import annotations

import pytest
import pandas as pd

from columnflow_spark.oracle import (
    duckdb_connection,
    run_oracle_stepwise,
    split_materialized_ctes,
)

SF = "/root/testdata/sf0.001"


def test_splitter_parses_graph_oracle():
    from columnflow_spark.queries.anngraph import GRAPH_BEAM_ORACLE

    parsed = split_materialized_ctes(GRAPH_BEAM_ORACLE)
    assert parsed is not None
    ctes, final = parsed
    names = [n for n, _ in ctes]
    assert names[0] == "ge" and "adj" in names
    assert final.upper().startswith("SELECT")
    # string literals with parens inside must not break paren counting
    assert all("list_aggregate" not in n for n in names)


def test_splitter_rejects_non_materialized():
    assert split_materialized_ctes("WITH a AS (SELECT 1) SELECT * FROM a") is None
    assert split_materialized_ctes("SELECT 1") is None


@pytest.mark.slow
def test_stepwise_matches_verbatim_and_reuses_steps():
    from columnflow_spark.queries import all_oracles

    oracles = all_oracles()
    con = duckdb_connection(SF)
    created: set[str] = set()
    for name in ["ann_graph_adjacency_stats", "ann_graph_beam_topk", "ann_graph_delete_topk"]:
        verbatim = con.sql(oracles[name]).df()
        step = run_oracle_stepwise(con, oracles[name], created)
        pd.testing.assert_frame_equal(
            step.reset_index(drop=True), verbatim.reset_index(drop=True)
        )
    # reuse happened: a second pass over the beam oracle creates nothing
    before = set(created)
    run_oracle_stepwise(con, oracles["ann_graph_beam_topk"], created)
    assert created == before
    # and the three shared-chain oracles built the build CTEs only once
    assert sum(1 for t in created if t.startswith("adj__")) == 1


@pytest.mark.slow
def test_stepwise_rebuilds_on_upstream_change():
    """`cand`'s TEXT is identical between the full and predicated
    builds, but its upstream `bk` differs — the versioned-name hash
    chain must produce a second cand variant (a text-only key would
    silently reuse the wrong candidates), and both variants coexist
    (no name thrash: re-running the full build creates nothing)."""
    from columnflow_spark.queries.anngraph import _g_build_ctes

    con = duckdb_connection(SF)
    created: set[str] = set()
    full = f"WITH {_g_build_ctes()} SELECT count(*) AS n FROM adj"
    pred = (
        f"WITH {_g_build_ctes(where='WHERE vec_id % 20 <> 11')} "
        "SELECT count(*) AS n FROM adj"
    )
    n_full = run_oracle_stepwise(con, full, created)["n"][0]
    n_pred = run_oracle_stepwise(con, pred, created)["n"][0]
    assert sum(1 for t in created if t.startswith("cand__")) == 2
    assert n_pred < n_full
    # variants coexist: switching back re-creates NOTHING
    before = set(created)
    n_full2 = run_oracle_stepwise(con, full, created)["n"][0]
    assert created == before
    assert n_full2 == n_full


def test_comma_join_chain_falls_back_to_verbatim():
    """ADVICE r11: comma-separated relation lists sit outside the
    relation-position rewrite grammar — a chain containing one must run
    verbatim (correct result) instead of failing loudly per row."""
    con = duckdb_connection(SF)

    sql = """
    WITH a AS MATERIALIZED (SELECT 1 AS x),
    b AS MATERIALIZED (SELECT 2 AS y),
    c AS MATERIALIZED (SELECT x, y FROM a t1, b t2)
    SELECT x + y AS s FROM c
    """
    created: set = set()
    out = run_oracle_stepwise(con, sql, created)
    assert out["s"].tolist() == [3]
    assert created == set()  # verbatim path: no temp tables created


def test_subquery_comma_relation_stays_stepwise():
    """The beam chain's `FROM qv q, (SELECT ...) c` shape (second
    relation a SUBQUERY) is fully handled by the rewrite — it must NOT
    trip the bare-name comma-join guard (r12 regression: flagging it
    re-ran the 6-minute build replay per graph oracle at sf1)."""
    from columnflow_spark.oracle import run_oracle_stepwise

    con = duckdb_connection(SF)
    sql = """
    WITH a AS MATERIALIZED (SELECT 1 AS x),
    c AS MATERIALIZED (SELECT x, y FROM a t1, (SELECT 2 AS y FROM a) t2)
    SELECT x + y AS s FROM c
    """
    created: set = set()
    out = run_oracle_stepwise(con, sql, created)
    assert out["s"].tolist() == [3]
    assert any(t.startswith("a__") for t in created), created  # stepwise ran
