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
    df = all_queries()["bm25_topk"](spark, sf_dir)
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
