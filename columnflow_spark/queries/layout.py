"""Data-layout optimization: Z-order (Morton) clustering of a two-key
scan dimension — the ``OPTIMIZE ZORDER BY`` shape from Delta/Iceberg.

At 100 TB the single biggest scan lever after partition pruning is
row-group skipping: parquet min/max statistics only prune when rows that
are close in KEY space are close in FILE space.  A lexicographic sort
clusters only the leading key; interleaving the bits of both keys
(the Morton / Z-order curve) bounds BOTH key ranges inside every
contiguous code range, so a selective predicate on either key skips most
row groups.  The registered query computes the codes and proves the
locality contract (every code bucket is an axis-aligned square in
quantized key space — exact integers, replayed bit-for-bit in SQL); the
layout writer + pruning proof live in tests/test_layout.py.

Scale notes:

- Code assignment is a pure projection (bit arithmetic in-row, no
  shuffle); the layout write is one ``repartitionByRange(code)`` +
  ``sortWithinPartitions(code)`` — a single range shuffle, identical
  cost to the plain sort it replaces.
- Key normalization uses the scalar min/max aggregate (one row,
  broadcast) — at scale these are catalog statistics, not a pass.
- Bucket stats are one map-side-combinable aggregate over the codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnflow_spark.queries import query
from columnflow_spark.sources import load_table

#: quantization bits per dimension (16-bit Morton code total)
_Z_BITS = 8
#: buckets = top _Z_BUCKET_BITS code bits -> each bucket is an aligned
#: 2^(_Z_BITS - _Z_BUCKET_BITS/2) square in quantized key space
_Z_BUCKET_BITS = 6


def _morton_sql(px: str, py: str) -> str:
    """Bit-interleave expression (x even bits, y odd) valid in BOTH Spark
    SQL and DuckDB: only >>, &, * and + on BIGINTs."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({px}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({py}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _quant_sql(col: str, mn: str, mx: str) -> str:
    """Normalize a key to the [0, 2^_Z_BITS) integer grid via its global
    min/max — identical floor-division arithmetic in both engines."""
    return f"(({col} - {mn}) * {1 << _Z_BITS}) // ({mx} - {mn} + 1)"


def zorder_codes(df: DataFrame, xcol: str, ycol: str) -> DataFrame:
    """Append quantized keys ``px``/``py`` and the Morton ``zcode`` for two
    BIGINT columns; normalization bounds ride along as a broadcast row."""
    bounds = df.agg(
        F.min(xcol).alias("xmn"),
        F.max(xcol).alias("xmx"),
        F.min(ycol).alias("ymn"),
        F.max(ycol).alias("ymx"),
    )
    qx = f"(({xcol} - xmn) * {1 << _Z_BITS}) div (xmx - xmn + 1)"
    qy = f"(({ycol} - ymn) * {1 << _Z_BITS}) div (ymx - ymn + 1)"
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("px", F.expr(qx).cast("long"))
        .withColumn("py", F.expr(qy).cast("long"))
        .withColumn("zcode", F.expr(_morton_sql("px", "py")).cast("long"))
    )


@query(
    "zorder_bucket_stats",
    oracle=f"""
    WITH b AS (
        SELECT min(l_partkey) AS xmn, max(l_partkey) AS xmx,
               min(l_suppkey) AS ymn, max(l_suppkey) AS ymx
        FROM lineitem
    ),
    coded AS (
        SELECT {_quant_sql("l_partkey", "xmn", "xmx")} AS px,
               {_quant_sql("l_suppkey", "ymn", "ymx")} AS py
        FROM lineitem, b
    ),
    zc AS (
        SELECT px, py, {_morton_sql("px", "py")} AS zcode FROM coded
    )
    SELECT CAST(zcode >> {2 * _Z_BITS - _Z_BUCKET_BITS} AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(px) AS BIGINT) AS px_min, CAST(max(px) AS BIGINT) AS px_max,
           CAST(min(py) AS BIGINT) AS py_min, CAST(max(py) AS BIGINT) AS py_max
    FROM zc
    GROUP BY zbucket
    ORDER BY zbucket
    """,
)
def zorder_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-Z-bucket row counts and key bounding boxes over lineitem's
    (l_partkey, l_suppkey) — the min/max spans ARE the row-group skipping
    statistics a Z-ordered layout would publish, and every bucket's box is
    an aligned square (tests/test_layout.py pins the locality bound)."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    coded = zorder_codes(li, "l_partkey", "l_suppkey")
    shift = 2 * _Z_BITS - _Z_BUCKET_BITS
    return (
        coded.withColumn("zbucket", F.expr(f"zcode >> {shift}").cast("long"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("px").cast("long").alias("px_min"),
            F.max("px").cast("long").alias("px_max"),
            F.min("py").cast("long").alias("py_min"),
            F.max("py").cast("long").alias("py_max"),
        )
        .orderBy("zbucket")
    )
