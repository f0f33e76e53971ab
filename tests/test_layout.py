"""Z-order layout: the locality contract and the file-skipping payoff.

Correctness of the code/bucket arithmetic is pinned by the registered
DuckDB oracle (zorder_bucket_stats); these tests pin the two properties
that make Z-ordering WORTH doing at 100 TB:

1. every code bucket is an axis-aligned square in quantized key space —
   so per-bucket min/max statistics are tight on BOTH keys, and
2. a rectangle predicate served from only the intersecting buckets of a
   bucket-partitioned store returns exactly the full-scan answer, with
   partition pruning visible in the plan.
"""

from __future__ import annotations

import contextlib
import io

from columnflow_spark.queries import all_queries
from columnflow_spark.queries.layout import _Z_BITS, _Z_BUCKET_BITS, zorder_codes
from columnflow_spark.sources import load_table

#: per-bucket block edge in quantized space: fixing the top
#: _Z_BUCKET_BITS/2 bits of each key leaves this many values free
_EDGE = 1 << (_Z_BITS - _Z_BUCKET_BITS // 2)


def test_zbuckets_are_aligned_squares(spark, sf_dir):
    rows = all_queries()["zorder_bucket_stats"](spark, sf_dir).collect()
    assert rows, "no buckets"
    total = 0
    for r in rows:
        total += r.n_rows
        assert 0 <= r.px_min <= r.px_max < (1 << _Z_BITS)
        assert 0 <= r.py_min <= r.py_max < (1 << _Z_BITS)
        # the box never crosses an aligned _EDGE boundary on either axis
        assert r.px_max - r.px_min < _EDGE and r.px_min // _EDGE == r.px_max // _EDGE, r
        assert r.py_max - r.py_min < _EDGE and r.py_min // _EDGE == r.py_max // _EDGE, r
    n_lineitem = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey"]).count()
    assert total == n_lineitem


def test_zorder_store_prunes_rectangle_queries(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    coded = zorder_codes(li, "l_partkey", "l_suppkey")
    shift = 2 * _Z_BITS - _Z_BUCKET_BITS
    store = str(tmp_path / "zstore")
    from pyspark.sql import functions as F

    coded.withColumn("zbucket", F.expr(f"zcode >> {shift}").cast("long")).write.partitionBy(
        "zbucket"
    ).parquet(store)

    # rectangle predicate in quantized space: one aligned block + a bit
    lo, hi = _EDGE, 2 * _EDGE + 3
    pred = (
        (F.col("px") >= lo) & (F.col("px") <= hi) & (F.col("py") >= lo) & (F.col("py") <= hi)
    )
    # buckets whose aligned square intersects the rectangle, enumerated the
    # same way a scan planner would from the bucket metadata
    y_half = _Z_BUCKET_BITS // 2
    want_buckets = set()
    for bx in range(lo // _EDGE, hi // _EDGE + 1):
        for by in range(lo // _EDGE, hi // _EDGE + 1):
            code = 0
            for i in range(y_half):
                code += ((bx >> i) & 1) << (2 * i)
                code += ((by >> i) & 1) << (2 * i + 1)
            want_buckets.add(code)

    full = spark.read.parquet(store).filter(pred)
    pruned = spark.read.parquet(store).filter(
        F.col("zbucket").isin(sorted(want_buckets)) & pred
    )
    assert pruned.count() == full.count() > 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan and "zbucket" in plan.split("PartitionFilters")[1][:200]
