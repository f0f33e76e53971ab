"""Self-check harness replicating the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL side-by-side on the
same parquet tables and compares row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted).  Used by
``tests/test_queries_vs_duckdb.py`` so regressions surface locally before
the driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from columnflow_spark.sources import TABLES, table_path


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for issue in self.issues:
            msg += f"\n    - {issue}"
        return msg


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            import numpy as np

            df[c] = s.map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                else tuple(v) if isinstance(v, (list, tuple)) else v
            )
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, na_position="first").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df, oracle_sql: str, con: duckdb.DuckDBPyConnection) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = con.sql(oracle_sql).df()
    return compare_frames(name, spark_pdf, oracle_pdf)


def compare_frames(name: str, spark_pdf, oracle_pdf) -> CompareResult:
    """Frame-level comparison — split out of :func:`compare` so callers
    that need to TIME the engine and oracle sides separately (the sf1
    sweep's engine/oracle cost split, VERDICT r9 next #6) can
    materialize each side themselves."""
    issues: list[str] = []

    if set(spark_pdf.columns) != set(oracle_pdf.columns):
        issues.append(f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
    if len(spark_pdf) != len(oracle_pdf):
        issues.append("row count mismatch")

    if not issues:
        a, b = _canon(spark_pdf), _canon(oracle_pdf)
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            bad = [i for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)]
            if bad:
                i = bad[0]
                issues.append(f"value mismatch in '{col}' at {len(bad)} rows, first: {av[i]!r} vs {bv[i]!r}")

    return CompareResult(name, not issues, len(spark_pdf), len(oracle_pdf), issues)


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from columnflow_spark.queries import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    con = duckdb_connection(sf_dir)
    results = []
    for name, fn in queries.items():
        if names and name not in names:
            continue
        if name not in oracles:
            df = fn(spark, sf_dir)
            n = df.count()
            results.append(CompareResult(name, n >= 0, n, -1, []))
            continue
        results.append(compare(name, fn(spark, sf_dir), oracles[name], con))
    return results
