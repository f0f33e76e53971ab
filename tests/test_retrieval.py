"""BM25 retrieval: ranking semantics + the query-driven plan shape."""

from __future__ import annotations

import contextlib
import io

import pytest

from columnflow_spark.queries import all_queries
from columnflow_spark.queries.retrieval import _BM25_QUERIES, _BM25_TOPK


@pytest.fixture(scope="module")
def bm25_rows(spark, sf_dir):
    return all_queries()["bm25_topk"](spark, sf_dir).collect()


def test_bm25_shape_and_rank_order(bm25_rows):
    by_q: dict[int, list] = {}
    for r in bm25_rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {qid for qid, _ in _BM25_QUERIES}
    for qid, rows in by_q.items():
        assert len(rows) <= _BM25_TOPK
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        # rank follows (score desc, doc_id asc) — the total tie-break order
        key = [(-r.score_q, r.doc_id) for r in rows]
        assert key == sorted(key)
        assert all(r.score_q > 0 for r in rows)


def test_bm25_top_docs_contain_query_terms(spark, sf_dir, bm25_rows):
    """Every retrieved doc must contain at least one query term, and the
    rank-1 doc must not be beaten by a doc matching MORE distinct terms
    with higher frequencies of the rarest term (sanity, not a re-scoring)."""
    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    queries = dict(_BM25_QUERIES)
    for r in bm25_rows:
        terms = set(queries[r.query_id].split(" "))
        assert terms & docs[r.doc_id], (r.query_id, r.doc_id)


def test_bm25_plan_is_query_driven(spark, sf_dir):
    """The corpus explosion must join the (broadcast) query-term table
    BEFORE the term-frequency aggregation — posting volume, not corpus
    volume, enters the shuffle — and the corpus parquet is scanned at
    most twice (postings + collection stats)."""
    # r13: the totals are a session-checkpointed artifact — the
    # query-driven property is pinned on the BUILD pipeline (what the
    # checkpoint materializes), not the serve plan over the checkpoint
    from columnflow_spark.queries.retrieval import _bm25_totals_frame

    df = _bm25_totals_frame(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") <= 2, tree
    gen = next(i for i, ln in enumerate(tree.splitlines()) if "Generate" in ln)
    above = tree.splitlines()[:gen]
    # the first plan node above the explosion on its branch is the
    # broadcast join with the query terms, then the partial aggregate
    assert any("BroadcastHashJoin" in ln for ln in above), tree
    # and the serve over the checkpoint must never rescan the corpus
    sdf = all_queries()["bm25_topk"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sdf.explain("formatted")
    stree = buf.getvalue().split("\n\n")[0]
    assert "Scan parquet" not in stree, stree


def test_hybrid_rrf_fusion_invariants(spark, sf_dir):
    """Fused score must equal the integer RRF recomputed from the reported
    arm ranks (0 = absent from that arm's pool), and each query's list must
    follow the (rrf desc, doc_id) total order with contiguous ranks."""
    from columnflow_spark.queries.retrieval import _RRF_K, _RRF_POOL, _RRF_SCALE, _RRF_TOPK

    rows = all_queries()["hybrid_search_rrf"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {qid for qid, _ in _BM25_QUERIES}
    for rows_q in by_q.values():
        assert len(rows_q) <= _RRF_TOPK
        assert [r.rk for r in rows_q] == list(range(1, len(rows_q) + 1))
        key = [(-r.rrf_q, r.doc_id) for r in rows_q]
        assert key == sorted(key)
        for r in rows_q:
            assert 0 <= r.lex_rk <= _RRF_POOL and 0 <= r.dense_rk <= _RRF_POOL
            assert r.lex_rk or r.dense_rk  # at least one arm proposed it
            want = sum(
                _RRF_SCALE // (_RRF_K + rk) for rk in (r.lex_rk, r.dense_rk) if rk
            )
            assert r.rrf_q == want, r


def test_hybrid_rrf_dense_arm_hits_probe(spark, sf_dir):
    """The dense probe for query q is embedding vec_id == q itself, so the
    probe doc's dense rank must be 1 (cosine(self, self) maximal)."""
    rows = all_queries()["hybrid_search_rrf"](spark, sf_dir).collect()
    self_rows = [r for r in rows if r.doc_id == r.query_id]
    assert {r.query_id for r in self_rows} == {qid for qid, _ in _BM25_QUERIES}
    assert all(r.dense_rk == 1 for r in self_rows), self_rows


def test_hybrid_indexed_fusion_invariants(spark, sf_dir):
    """The index-served hybrid obeys the same fusion arithmetic: fused
    score recomputable from the reported arm ranks, total order, bounded
    contiguous ranks."""
    from columnflow_spark.queries.retrieval import _RRF_K, _RRF_POOL, _RRF_SCALE, _RRF_TOPK

    rows = all_queries()["hybrid_search_rrf_indexed"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {qid for qid, _ in _BM25_QUERIES}
    for rows_q in by_q.values():
        assert len(rows_q) <= _RRF_TOPK
        assert [r.rk for r in rows_q] == list(range(1, len(rows_q) + 1))
        key = [(-r.rrf_q, r.doc_id) for r in rows_q]
        assert key == sorted(key)
        for r in rows_q:
            assert 0 <= r.lex_rk <= _RRF_POOL and 0 <= r.dense_rk <= _RRF_POOL
            assert r.lex_rk or r.dense_rk
            want = sum(
                _RRF_SCALE // (_RRF_K + rk) for rk in (r.lex_rk, r.dense_rk) if rk
            )
            assert r.rrf_q == want, r


def test_hybrid_indexed_recall_vs_brute_force(spark, sf_dir):
    """Pin the IVF+PQ approximation inside the fused result: the
    index-served top-k must overlap the brute-force hybrid top-k well
    above the random floor, and the LEXICAL contribution must be
    identical between the two (only the dense arm is approximate)."""
    brute = all_queries()["hybrid_search_rrf"](spark, sf_dir).collect()
    idx = all_queries()["hybrid_search_rrf_indexed"](spark, sf_dir).collect()
    b_set = {(r.query_id, r.doc_id) for r in brute}
    i_set = {(r.query_id, r.doc_id) for r in idx}
    assert b_set and i_set
    # lexical arm parity: every doc ranked by BM25 carries the SAME
    # lex_rk in both variants
    b_lex = {(r.query_id, r.doc_id): r.lex_rk for r in brute if r.lex_rk}
    i_lex = {(r.query_id, r.doc_id): r.lex_rk for r in idx if r.lex_rk}
    shared = b_lex.keys() & i_lex.keys()
    assert shared and all(b_lex[k] == i_lex[k] for k in shared)
    # fused-list overlap: BM25-anchored docs dominate the fusion, so the
    # floor is well above the IVF probed-volume floor; measured ~0.8+ at
    # test SFs
    overlap = len(b_set & i_set) / len(b_set)
    assert overlap >= 0.5, f"index-served hybrid diverged from brute force: {overlap}"


def test_maxsim_routed_recall_vs_brute(spark, sf_dir):
    """Routing recall: the routed top-k must overlap the exhaustive
    MaxSim top-k well above the probed-volume floor, and every routed
    score must equal the brute score for the same (query, doc) — the
    re-rank kernel is shared, only the candidate set shrinks."""
    brute = all_queries()["colbert_maxsim_topk"](spark, sf_dir).collect()
    routed = all_queries()["colbert_maxsim_routed_topk"](spark, sf_dir).collect()
    b_scores = {(r.query_id, r.doc_id): r.maxsim_q for r in brute}
    r_scores = {(r.query_id, r.doc_id): r.maxsim_q for r in routed}
    assert b_scores and r_scores
    shared = b_scores.keys() & r_scores.keys()
    assert shared and all(b_scores[k] == r_scores[k] for k in shared)
    recall = len(shared) / len(b_scores)
    # the structural floor is scale-free: each query's own vector sits in
    # a probed cell (its nearest) and tops both lists, so >= 1 of 10 per
    # query is guaranteed; the rest tracks the probed-volume fraction
    # (2 / n_cells, which SHRINKS as the corpus grows cells at n/64 —
    # measured 1.0 at sf0.001/0.01, 0.2 at sf0.1)
    assert recall >= 0.1, f"routing recall collapsed: {recall}"


def test_postings_store_incremental_equals_from_scratch(spark, sf_dir, tmp_path):
    # the lexical index-maintenance contract: two upserted batches must
    # serve the identical ranked result as one full-corpus batch — every
    # scoring input (tf, dl, df, n_docs, avgdl) is reproduced exactly
    import pyspark.sql.functions as F

    from columnflow_spark.queries.retrieval import (
        _BM25_TOPK,
        bm25_totals_from_store,
        upsert_postings_batch,
    )
    from columnflow_spark.sources import load_table

    n = load_table(spark, sf_dir, "documents", columns=["doc_id"]).count()

    def ranked(path):
        from pyspark.sql import Window as W

        totals = bm25_totals_from_store(spark, path)
        win = W.partitionBy("query_id").orderBy(F.desc("score_q"), F.asc("doc_id"))
        df = (
            totals.withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") <= _BM25_TOPK)
        )
        return sorted((r.query_id, r.doc_id, r.score_q, r.rk) for r in df.collect())

    two = str(tmp_path / "two")
    upsert_postings_batch(spark, sf_dir, two, batch=0, batch_pred=F.col("doc_id") < n // 3)
    upsert_postings_batch(spark, sf_dir, two, batch=1, batch_pred=F.col("doc_id") >= n // 3)
    one = str(tmp_path / "one")
    upsert_postings_batch(spark, sf_dir, one, batch=0, batch_pred=F.lit(True))
    r_two, r_one = ranked(two), ranked(one)
    assert r_two == r_one and len(r_two) > 0
    # idempotent re-upsert: re-running batch 1 must not duplicate postings
    upsert_postings_batch(spark, sf_dir, two, batch=1, batch_pred=F.col("doc_id") >= n // 3)
    assert ranked(two) == r_one


def test_postings_delete_equals_reduced_rebuild(spark, sf_dir, tmp_path):
    # right-to-be-forgotten propagation: full build + delete must serve
    # the identical ranked result as a from-scratch build over the
    # reduced corpus — and the rewrite must NOT destroy the _stats
    # sidecar (the replace_store bug this test pinned: stats vanished and
    # every score went NaN off a negative doc count)
    import os

    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from columnflow_spark.queries.retrieval import (
        _BM25_TOPK,
        bm25_totals_from_store,
        delete_docs_from_postings,
        upsert_postings_batch,
    )

    def ranked(path):
        totals = bm25_totals_from_store(spark, path)
        win = W.partitionBy("query_id").orderBy(F.desc("score_q"), F.asc("doc_id"))
        df = (
            totals.withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") <= _BM25_TOPK)
        )
        return sorted((r.query_id, r.doc_id, r.score_q, r.rk) for r in df.collect())

    deleted_pred = F.col("doc_id") % 5 == 2
    full = str(tmp_path / "full")
    upsert_postings_batch(spark, sf_dir, full, batch=0, batch_pred=F.lit(True))
    delete_docs_from_postings(spark, sf_dir, full, delete_pred=deleted_pred, batch=1)
    reduced = str(tmp_path / "reduced")
    upsert_postings_batch(spark, sf_dir, reduced, batch=0, batch_pred=~deleted_pred)
    assert ranked(full) == ranked(reduced) and len(ranked(full)) > 0
    # the stats sidecar survived the posting rewrite: original + negative
    assert os.path.exists(os.path.join(full, "_stats"))
    stats = spark.read.parquet(os.path.join(full, "_stats")).collect()
    assert len(stats) == 2 and any(r.n_docs < 0 for r in stats)
    # no deleted doc's postings remain
    assert spark.read.parquet(full).filter(deleted_pred).count() == 0


def test_rm3_expansion_semantics(spark, sf_dir):
    """RM3 contract: expansion terms never repeat original query terms,
    every query gets exactly M ranked terms, and the expanded ranking
    actually moves at least one query's top-10 (the point of feedback)."""
    from columnflow_spark.queries import all_queries
    from columnflow_spark.queries.retrieval import _BM25_QUERIES, _RM3_EXP_TERMS

    qs = all_queries()
    terms = qs["bm25_rm3_terms"](spark, sf_dir).collect()
    orig = {qid: set(text.split(" ")) for qid, text in _BM25_QUERIES}
    per_q: dict = {}
    for r in terms:
        assert r.w not in orig[r.query_id], (r.query_id, r.w)
        per_q.setdefault(r.query_id, []).append(r.trk)
    assert set(per_q) == set(orig)
    assert all(sorted(v) == list(range(1, _RM3_EXP_TERMS + 1)) for v in per_q.values())

    plain = {(r.query_id, r.rk): r.doc_id for r in qs["bm25_topk"](spark, sf_dir).collect()}
    rm3 = {(r.query_id, r.rk): r.doc_id for r in qs["bm25_rm3_topk"](spark, sf_dir).collect()}
    assert rm3 != plain, "expansion changed nothing — feedback is dead"


def test_hybrid_filtered_predicate_and_pool_integrity(spark, sf_dir):
    """Every filtered-hybrid result satisfies the lang predicate, and
    ranks are WITHIN the filtered universe (pre-filter): any doc ranked
    by an arm is eligible, so a rank-1 result exists per query."""
    from columnflow_spark.queries.retrieval import _HYB_FILTER_LANG
    from columnflow_spark.sources import load_table

    rows = all_queries()["hybrid_search_rrf_filtered"](spark, sf_dir).collect()
    assert rows
    langs = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_dir, "documents", columns=["doc_id", "lang"]).collect()
    }
    assert all(langs[r.doc_id] == _HYB_FILTER_LANG for r in rows)
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rk)
    for q, rks in by_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), (q, rks)
