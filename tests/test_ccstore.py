"""Delete-capable CC store (VERDICT r11 missing #1): retraction splits,
label REBIRTH safety, and the idempotent re-delete every other
incremental store family has."""

from __future__ import annotations

import pytest

from columnflow_spark.queries.ccstore import (
    cc_apply_edges,
    cc_current_labels,
    cc_retract_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "a long, b long")


def _labels(spark, store):
    return {(r.node, r.label) for r in cc_current_labels(spark, store).collect()}


def test_retraction_splits_component(spark, tmp_path):
    store = str(tmp_path / "cc")
    cc_apply_edges(spark, _edges(spark, [(1, 101), (2, 101), (3, 102)]), store, 0)
    assert _labels(spark, store) == {(1, 1), (101, 1), (2, 1), (3, 3), (102, 3)}
    # retract (2,101): 2 splits off as a singleton
    cc_retract_edges(spark, _edges(spark, [(2, 101)]), store, 1)
    assert _labels(spark, store) == {(1, 1), (101, 1), (2, 2), (3, 3), (102, 3)}


def test_label_rebirth_is_safe(spark, tmp_path):
    """The hard case: {1,101} (label 1) merges into label 0, then a
    retraction splits it back out — label 1 is REBORN.  Stale pre-merge
    rows under label 1's partition must never surface: the dual-bucket
    write discipline + latest-wins-then-filter reads guarantee it."""
    store = str(tmp_path / "cc")
    cc_apply_edges(spark, _edges(spark, [(1, 101)]), store, 0)
    assert _labels(spark, store) == {(1, 1), (101, 1)}
    cc_apply_edges(spark, _edges(spark, [(0, 101)]), store, 1)  # merge -> label 0
    assert _labels(spark, store) == {(0, 0), (1, 0), (101, 0)}
    cc_retract_edges(spark, _edges(spark, [(0, 101)]), store, 2)  # split: 1 reborn
    assert _labels(spark, store) == {(0, 0), (1, 1), (101, 1)}
    # a later merge INTO the reborn label must pick up exactly its
    # current members (never stale node 0 from the pre-merge rows)
    cc_apply_edges(spark, _edges(spark, [(2, 101)]), store, 3)
    assert _labels(spark, store) == {(0, 0), (1, 1), (101, 1), (2, 1)}
    # and retracting inside the reborn component splits it correctly
    cc_retract_edges(spark, _edges(spark, [(1, 101)]), store, 4)
    assert _labels(spark, store) == {(0, 0), (1, 1), (101, 2), (2, 2)}


def test_redelete_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "cc")
    cc_apply_edges(spark, _edges(spark, [(1, 101), (2, 101), (2, 102)]), store, 0)
    cc_retract_edges(spark, _edges(spark, [(2, 101)]), store, 1)
    after_first = _labels(spark, store)
    # same retraction again (crash-resume shape), plus a never-seen edge
    cc_retract_edges(spark, _edges(spark, [(2, 101), (7, 700)]), store, 2)
    assert _labels(spark, store) == after_first
    # and a third time at a later batch id
    cc_retract_edges(spark, _edges(spark, [(2, 101)]), store, 3)
    assert _labels(spark, store) == after_first


def test_reinsert_after_retract_rejoins(spark, tmp_path):
    store = str(tmp_path / "cc")
    cc_apply_edges(spark, _edges(spark, [(1, 101), (2, 101)]), store, 0)
    cc_retract_edges(spark, _edges(spark, [(2, 101)]), store, 1)
    assert _labels(spark, store) == {(1, 1), (101, 1), (2, 2)}
    # CDC re-insert: the tombstoned edge comes back as a live row
    cc_apply_edges(spark, _edges(spark, [(2, 101)]), store, 2)
    assert _labels(spark, store) == {(1, 1), (101, 1), (2, 1)}
    # ...and can be retracted again
    cc_retract_edges(spark, _edges(spark, [(2, 101)]), store, 3)
    assert _labels(spark, store) == {(1, 1), (101, 1), (2, 2)}


@pytest.mark.slow
def test_batch_and_streaming_delete_twins_agree(spark, sf_dir):
    from columnflow_spark.queries import all_queries

    q = all_queries()
    batch = {
        (r.order_id, r.component)
        for r in q["order_part_components_delete"](spark, sf_dir).collect()
    }
    stream = {
        (r.order_id, r.component)
        for r in q["streaming_cc_cdc"](spark, sf_dir).collect()
    }
    assert batch == stream
    assert len(batch) > 0
    # deletions actually changed the graph at this scale
    base = {
        (r.order_id, r.component)
        for r in q["order_part_components"](spark, sf_dir).collect()
    }
    assert base != batch


def test_compaction_folds_and_contract_continues(spark, tmp_path):
    """The vacuum: compaction folds both sidecars to one batch=0 layout
    (tombstones and stale dual-bucket history physically gone), the
    at-rest labels are unchanged, and the apply/retract contract —
    including a post-compaction rebirth — continues off the folded
    base."""
    import os

    from columnflow_spark.queries.ccstore import (
        _edges_path,
        cc_compact_store,
    )

    store = str(tmp_path / "cc")
    cc_apply_edges(spark, _edges(spark, [(1, 101)]), store, 0)
    cc_apply_edges(spark, _edges(spark, [(0, 101), (2, 102)]), store, 1)
    cc_retract_edges(spark, _edges(spark, [(0, 101)]), store, 2)
    before = _labels(spark, store)
    cc_compact_store(spark, store)
    assert _labels(spark, store) == before
    # physically folded: single batch=0 slice, no tombstones, no stale rows
    edges_raw = spark.read.parquet(_edges_path(store)).collect()
    assert all(r.batch == 0 and r.live for r in edges_raw)
    assert {(r.a, r.b) for r in edges_raw} == {(1, 101), (2, 102)}
    # idempotent re-compaction
    cc_compact_store(spark, store)
    assert _labels(spark, store) == before
    # contract continues: merge into a label, then a rebirth-shaped split
    cc_apply_edges(spark, _edges(spark, [(0, 101)]), store, 3)
    assert _labels(spark, store) == {(0, 0), (1, 0), (101, 0), (2, 2), (102, 2)}
    cc_retract_edges(spark, _edges(spark, [(0, 101)]), store, 4)
    assert _labels(spark, store) == {(0, 0), (1, 1), (101, 1), (2, 2), (102, 2)}


@pytest.mark.slow
def test_cdc_vacuum_twin_matches_cdc(spark, sf_dir):
    from columnflow_spark.queries import all_queries

    q = all_queries()
    cdc = {(r.order_id, r.component) for r in q["streaming_cc_cdc"](spark, sf_dir).collect()}
    vac = {
        (r.order_id, r.component)
        for r in q["streaming_cc_cdc_vacuum"](spark, sf_dir).collect()
    }
    assert vac == cdc
    assert len(vac) > 0


def test_gb_modulus_invariance(spark, tmp_path):
    """r13 scale-adaptive gb= modulus: the full CDC lifecycle lands
    identical labels at ANY recorded modulus (4 vs 64) — bucket layout
    is pure IO partitioning, read back from the _GB metadata file."""
    from columnflow_spark.queries.streaming import _read_scc_gb, _write_scc_gb

    results = {}
    for gb in (4, 64):
        store = str(tmp_path / f"cc_gb{gb}")
        _write_scc_gb(store, gb)
        assert _read_scc_gb(store) == gb
        cc_apply_edges(spark, _edges(spark, [(1, 101), (2, 101), (3, 102)]), store, 0)
        cc_apply_edges(spark, _edges(spark, [(3, 101), (4, 103)]), store, 1)
        cc_retract_edges(spark, _edges(spark, [(2, 101)]), store, 2)
        results[gb] = _labels(spark, store)
    assert results[4] == results[64] and len(results[4]) > 0


def test_derived_gb_scales_with_corpus(spark):
    from columnflow_spark.queries.streaming import _SCC_GB, _derive_scc_gb

    assert _derive_scc_gb(1_000) == _SCC_GB  # small corpus keeps the floor
    assert _derive_scc_gb(10_000_000) > _SCC_GB
    assert _derive_scc_gb(10_000_000) * 65536 >= 10_000_000
    # power of two, capped
    b = _derive_scc_gb(1 << 62)
    assert b == (1 << 20) and (b & (b - 1)) == 0
