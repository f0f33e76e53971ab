"""Graph-based ANN (DiskANN/HNSW shape): store parity, degree bounds,
pruned serve IO, recall vs the IVF+PQ family at comparable budget."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window as W

from columnflow_spark.functions.similarity import cosine
from columnflow_spark.queries.anngraph import (
    _G_DEG_CAP,
    _G_DELETE_MOD,
    _G_DELETE_REM,
    build_graph_adjacency,
    build_graph_index,
    store_page_fetcher,
    _final_topk,
    _graph_beam,
    _query_vectors,
    _session_pages,
)
from columnflow_spark.queries import all_queries
from columnflow_spark.sources import load_table


def _rows(df):
    return sorted((r.query_id, r.neighbor_id, r.d, r.rk) for r in df.collect())


@pytest.fixture(scope="module")
def fresh_graph(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gann") / "index")
    build_graph_index(spark, sf_dir, path)
    return path


def test_store_serve_matches_in_session(spark, sf_dir, fresh_graph):
    qv = _query_vectors(spark, sf_dir)
    live = _rows(_final_topk(_graph_beam(spark, qv, _session_pages(spark, sf_dir))))
    stored = _rows(
        _final_topk(_graph_beam(spark, qv, store_page_fetcher(spark, fresh_graph)))
    )
    assert stored == live
    assert len(stored) > 0


def test_degree_cap_and_symmetry_superset(spark, sf_dir):
    adj = build_graph_adjacency(spark, sf_dir).collect()
    deg: dict = {}
    edges = set()
    for r in adj:
        deg[r.src] = deg.get(r.src, 0) + 1
        edges.add((r.src, r.dst))
        assert r.src != r.dst
    assert deg and max(deg.values()) <= _G_DEG_CAP
    # the symmetrize step ran: a meaningful fraction of edges have their
    # reverse present (the cap may trim some back off)
    rev = sum(1 for (s, d) in edges if (d, s) in edges)
    assert rev / len(edges) > 0.5, rev / len(edges)


def test_page_fetch_prunes_partitions(spark, sf_dir, fresh_graph):
    # a beam-round fetch must skip non-entrant buckets at PLANNING time
    df = (
        spark.read.parquet(fresh_graph)
        .filter(F.col("gb").isin([0, 3]))
        .select("vec_id", "g", "nbrs")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("gb" in l and "IN (0,3)" in l for l in pf), pf


def _brute_force_top5(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    sims = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q"), F.col("embedding")).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rk", F.row_number().over(w)).filter("rk <= 5")


def test_beam_recall_not_worse_than_ivfpq(spark, sf_dir):
    """The point of the graph index: at a comparable vectors-read budget
    (seeds + W x DEG_CAP x ROUNDS exact-grid scores vs 2-cell ADC probe)
    the beam's recall@5 vs exact cosine must match or beat IVF+PQ's
    (measured at sf0.001: 1.0 vs 0.6; sf0.01: 0.88 vs 0.28)."""
    bf = {(r.query_id, r.neighbor_id) for r in _brute_force_top5(spark, sf_dir).collect()}
    assert bf
    graph = {
        (r.query_id, r.neighbor_id)
        for r in all_queries()["ann_graph_beam_topk"](spark, sf_dir).collect()
    }
    ivfpq = {
        (r.query_id, r.neighbor_id)
        for r in all_queries()["ann_ivfpq_topk"](spark, sf_dir).collect()
    }
    r_graph = len(graph & bf) / len(bf)
    r_ivfpq = len(ivfpq & bf) / len(bf)
    assert r_graph >= r_ivfpq, (r_graph, r_ivfpq)
    assert r_graph >= 0.2, r_graph


def test_delete_excludes_tombstoned_and_preserves_rest(spark, sf_dir):
    full = all_queries()["ann_graph_beam_topk"](spark, sf_dir).collect()
    deleted = all_queries()["ann_graph_delete_topk"](spark, sf_dir).collect()
    assert all(r.neighbor_id % _G_DELETE_MOD != _G_DELETE_REM for r in deleted)
    # every surviving (query, neighbor) of the full serve keeps its
    # relative order in the deleted serve (same walk, final filter only)
    full_seq: dict = {}
    for r in sorted(full, key=lambda r: (r.query_id, r.rk)):
        if r.neighbor_id % _G_DELETE_MOD != _G_DELETE_REM:
            full_seq.setdefault(r.query_id, []).append(r.neighbor_id)
    del_seq: dict = {}
    for r in sorted(deleted, key=lambda r: (r.query_id, r.rk)):
        del_seq.setdefault(r.query_id, []).append(r.neighbor_id)
    for qid, seq in full_seq.items():
        # the surviving prefix of the full ranking must lead the deleted
        # ranking (the walk is identical; only the final filter differs)
        assert del_seq.get(qid, [])[: len(seq)] == seq, (qid, seq, del_seq.get(qid))


def test_insert_store_update_matches_in_session(spark, sf_dir, tmp_path):
    from columnflow_spark.queries.anngraph import (
        _insert_pred,
        build_graph_index,
        update_graph_index,
    )

    path = str(tmp_path / "gbase")
    build_graph_index(spark, sf_dir, path, node_pred=~_insert_pred(), tag="base")
    update_graph_index(spark, sf_dir, path)
    qv = _query_vectors(spark, sf_dir)
    stored = _rows(_final_topk(_graph_beam(spark, qv, store_page_fetcher(spark, path))))
    live = _rows(all_queries()["ann_graph_insert_topk"](spark, sf_dir))
    assert stored == live
    assert stored


def test_insert_repair_links_new_nodes(spark, sf_dir):
    from columnflow_spark.queries.anngraph import (
        _G_DEG_CAP,
        _grid_emb,
        _insert_pred,
        updated_graph_adjacency,
    )
    import pyspark.sql.functions as F

    upd = updated_graph_adjacency(spark, sf_dir).collect()
    new = {
        r.vec_id
        for r in _grid_emb(spark, sf_dir).filter(_insert_pred()).select("vec_id").collect()
    }
    assert new
    srcs = {}
    for r in upd:
        srcs[r.src] = srcs.get(r.src, 0) + 1
    # every inserted node got out-edges (its beam found the base graph)
    # and the degree cap still holds everywhere after the repair
    assert new <= set(srcs)
    assert max(srcs.values()) <= _G_DEG_CAP
    # most inserted nodes keep at least one in-edge after re-capping
    # (a crowded neighborhood may evict a few — the DiskANN trade)
    dsts = {r.dst for r in upd}
    assert len(new & dsts) >= 0.5 * len(new), (len(new & dsts), len(new))
