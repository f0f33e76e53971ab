"""Deterministic synthetic-data generator matching TESTDATA.md's schema.

The driver ships read-only parquet at sf0.001/0.01/0.1; the only
correctness escape ever found in this repo surfaced at a LARGER scale
factor than the one the tests ran at (a float knife edge at sf0.1, see
BASELINE.md round table).  This module regenerates the same ten tables —
identical column names, physical types (timestamp[us] WITHOUT timezone,
list<float32> embeddings) and value domains — at any sf, so the full
oracle sweep and bench can run at sf1 (~6M lineitem) and beyond.

This is *schema/domain*-faithful, not byte-identical to the driver's
generator (its RNG stream is unknown).  That is sufficient: the oracle
gate compares Spark vs DuckDB on the SAME files, so any deterministic
dataset in the right domains exercises the same code paths.

Mirrors the reference's synthetic-fixture approach (reference
columnflow/tasks/framework/base.py dataset bootstrapping + its test
fixtures): generate once, content-addressed by (sf, seed), reuse.

Usage::

    python -m columnflow_spark.testgen --sf 1 --out scratch/sf1

Row counts scale linearly (lineitem ~ 6M * sf) with small-table floors so
tiny sf still exercise joins.  Seed is fixed (42) so reruns are
byte-stable for a given pyarrow version.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGION_NAMES = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKT_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDER_STATUS = ["F", "P", "O"]
ORDER_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PART_ADJ = ["small", "red", "blue", "green", "large", "shiny", "plain", "dark"]
PART_NOUN = ["ring", "widget", "bolt", "gear", "cog", "pin", "nut", "spring"]
RETURN_FLAGS = ["A", "N", "R"]
LINE_STATUS = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_LANGS = ["en", "de", "es", "fr", "zh"]
DOC_LANG_P = [0.44, 0.14, 0.14, 0.14, 0.14]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

EPOCH_1995 = np.datetime64("1995-01-01")
ORDER_DAYS = 2404  # 1995-01-01 .. 2001-08-01
EVENTS_T0 = np.datetime64("2024-01-01T00:00:00.000000")
EVENTS_SPAN_US = 30 * 86_400 * 1_000_000  # 30 days

EMB_DIM = 64
EMB_CLUSTERS = 10


def _counts(sf: float) -> dict[str, int]:
    """Linear-in-sf row counts matching the driver's observed tables."""
    return {
        "customer": max(150, int(150_000 * sf)),
        "supplier": max(10, int(10_000 * sf)),
        "part": max(200, int(200_000 * sf)),
        "orders": max(1_500, int(1_500_000 * sf)),
        "events": max(1_000, int(1_000_000 * sf)),
        "documents": max(500, int(50_000 * sf)),
        "embeddings": max(500, int(20_000 * sf)),
    }


def _write(out_dir: str, name: str, table: pa.Table, row_group_size: int = 262_144) -> None:
    pq.write_table(
        table,
        os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=row_group_size,
        compression="snappy",
    )


def _days_to_us(days: np.ndarray) -> pa.Array:
    """Midnight timestamps as timestamp[us] without timezone."""
    ts = (EPOCH_1995 + days.astype("timedelta64[D]")).astype("datetime64[us]")
    return pa.array(ts, type=pa.timestamp("us"))


def generate(out_dir: str, sf: float, seed: int = SEED) -> dict[str, int]:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = _counts(sf)

    # region / nation: fixed small dims
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGION_NAMES),
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
    }))

    # customer
    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(nc)]),
        "c_nationkey": pa.array(rng.integers(0, 25, nc).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1_000, 10_000, nc), 2)),
        "c_mktsegment": pa.array(np.array(MKT_SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    # supplier
    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(ns)]),
        "s_nationkey": pa.array(rng.integers(0, 25, ns).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1_000, 10_000, ns), 2)),
    }))

    # part
    np_ = n["part"]
    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), np_)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), np_)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(np_, dtype=np.int64)),
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, np_)]),
        "p_type": pa.array(np.array(PART_TYPES)[rng.integers(0, 6, np_)]),
        "p_size": pa.array(rng.integers(1, 51, np_).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + (np.arange(np_) % 1000) / 10.0, 2)),
    }))

    # orders
    no = n["orders"]
    order_days = rng.integers(0, ORDER_DAYS + 1, no)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, nc, no).astype(np.int64)),
        "o_orderstatus": pa.array(np.array(ORDER_STATUS)[rng.integers(0, 3, no)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1_000, 500_000, no), 2)),
        "o_orderdate": _days_to_us(order_days),
        "o_orderpriority": pa.array(np.array(ORDER_PRIORITIES)[rng.integers(0, 5, no)]),
    }))

    # lineitem: ~4.07 lines/order (1 + Poisson(3.07), capped at 12 extra)
    per_order = 1 + np.minimum(rng.poisson(3.07, no), 12)
    nl = int(per_order.sum())
    l_orderkey = np.repeat(np.arange(no, dtype=np.int64), per_order)
    l_orderdays = np.repeat(order_days, per_order)
    qty = rng.integers(1, 51, nl).astype(np.float64)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.integers(0, np_, nl).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, ns, nl).astype(np.int64)),
        # NOT unique within an order, matching the driver data (verify
        # cookbook: positional row_number identities, never l_linenumber)
        "l_linenumber": pa.array(rng.integers(1, 8, nl).astype(np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(np.round(qty * rng.uniform(500, 3_600, nl), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, nl) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, nl) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(RETURN_FLAGS)[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(LINE_STATUS)[rng.integers(0, 2, nl)]),
        "l_shipdate": _days_to_us(l_orderdays + rng.integers(1, 96, nl)),
    }))

    # events: increasing timestamps over a 30-day window
    ne = n["events"]
    gaps = rng.exponential(1.0, ne)
    ts_us = EVENTS_T0 + (np.cumsum(gaps) / gaps.sum() * EVENTS_SPAN_US).astype(
        "timedelta64[us]"
    )
    n_users = max(150, int(15_000 * sf))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": pa.array(ts_us.astype("datetime64[us]"), type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, ne).astype(np.int64)),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": pa.array(
            np.round(np.clip(np.exp(rng.normal(3.5, 1.3, ne)), 0.01, 500.0), 2)
        ),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, ne)]),
    }))

    # documents: 10..99 words drawn from the 31-word vocab
    nd = n["documents"]
    n_words = rng.integers(10, 100, nd)
    vocab = np.array(DOC_VOCAB)
    word_idx = rng.integers(0, len(vocab), int(n_words.sum()))
    texts: list[str] = []
    off = 0
    for w in n_words:
        texts.append(" ".join(vocab[word_idx[off:off + w]]))
        off += w
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(np.array(DOC_LANGS)[rng.choice(5, nd, p=DOC_LANG_P)]),
        "source": pa.array([f"src{i % 20}" for i in range(nd)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    # embeddings: unit-norm float32[64] around 10 cluster centers
    nv = n["embeddings"]
    centers = rng.normal(0, 1, (EMB_CLUSTERS, EMB_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, EMB_CLUSTERS, nv)
    vecs = centers[label] * 2.0 + rng.normal(0, 1, (nv, EMB_DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(
            list(vecs.astype(np.float32)), type=pa.list_(pa.float32())
        ),
        "label": pa.array(label.astype(np.int32)),
    }))

    n["lineitem"] = nl
    return n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()
    counts = generate(args.out, args.sf, args.seed)
    print({"sf": args.sf, "out": args.out, **counts})


if __name__ == "__main__":
    main()
