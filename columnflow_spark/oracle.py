"""Self-check harness replicating the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL side-by-side on the
same parquet tables and compares row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted).  Used by
``tests/test_queries_vs_duckdb.py`` so regressions surface locally before
the driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math
import re
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


# --- stepwise oracle execution for the ITERATIVE oracle families
# (VERDICT r10 next #7 — harness velocity, not engine semantics).
#
# The graph-ANN oracles replay the whole banded build + beam walk as one
# WITH chain of materialized CTEs; DuckDB evaluates every materialized
# CTE per query, so the 8 graph oracles each re-derive the identical
# build CTEs (ge/bk/cand/.../adj) — 6-8 min EACH at sf1, 57% of the
# full sweep.  Executing the chain STEPWISE as temp tables lets a
# sweep connection reuse an unchanged step across queries: each step is
# keyed by a DEPENDENCY-AWARE content hash (its SQL text plus the
# hashes of every earlier step it references), so a step whose text is
# unchanged but whose upstream differs (the insert oracle's `cand` over
# a predicated `bk`) is correctly rebuilt, never stale-reused.
#
# This path is used by scripts/sweep_sf.py only — run_all (the mirror
# of the driver's gate) executes oracles verbatim. ---

#: oracle names eligible for stepwise execution (iterative CTE replays)
STEPWISE_PREFIXES = ("ann_graph_", "streaming_graph_ann_ingest")


def split_materialized_ctes(sql: str):
    """Parse ``WITH a AS MATERIALIZED (...), ... SELECT ...`` into
    ``([(name, body), ...], final_select)`` — or None when the shape is
    anything else (the caller falls back to verbatim execution)."""
    import re

    s = sql.strip()
    if not s[:4].upper() == "WITH":
        return None
    i, n = 4, len(s)
    ctes: list[tuple[str, str]] = []
    while True:
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+MATERIALIZED\s*\(", s[i:], re.S)
        if not m:
            return None
        j = i + m.end()
        depth, k = 1, j
        while depth and k < n:
            c = s[k]
            if c == "'":  # skip string literals (parens inside must not count)
                k += 1
                while k < n and s[k] != "'":
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth:
            return None
        ctes.append((m.group(1).lower(), s[j : k - 1]))
        m2 = re.match(r"\s*,", s[k:])
        if m2:
            i = k + m2.end()
            continue
        final = s[k:].strip()
        if not final[:6].upper() == "SELECT":
            return None
        return ctes, final


def _rewrite_refs(sql: str, mapping: dict[str, str]) -> str:
    """Rewrite relation-position references (``FROM x`` / ``JOIN x``)
    to their versioned temp-table names.  Only relation position — a
    bare word-boundary substitution would false-match column aliases
    against step names (the beam chain's ``v1``/``v2`` aliases vs the
    ``v1``/``v2`` round CTEs).  A reference this regex could miss
    fails LOUDLY (no unversioned temp table ever exists), never reads
    a stale relation."""
    import re

    def sub(m):
        return f"{m.group(1)} {mapping.get(m.group(2).lower(), m.group(2))}"

    return re.sub(
        r"\b(FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9_]*)\b", sub, sql, flags=re.IGNORECASE
    )


#: BARE-NAME comma relations (``FROM a x, b y`` — the second name never
#: hits the FROM/JOIN rewrite) send a chain to verbatim execution.
#: The guard must stay narrow: a comma followed by ``(`` is fine (the
#: subquery's own FROM is rewritten — the beam-chain ``FROM qv q,
#: (SELECT ...) c`` shape, which stepwise has always handled; flagging
#: it re-ran the 6-min build replay per graph oracle), and matching
#: bare commas generally would false-match function arguments.
_COMMA_JOIN = re.compile(
    r"\b(?:FROM|JOIN)\s+[A-Za-z_][A-Za-z0-9_]*"
    r"(?:\s+(?:AS\s+)?[A-Za-z_][A-Za-z0-9_]*)?\s*,\s*[A-Za-z_]",
    re.IGNORECASE,
)


def run_oracle_stepwise(
    con: duckdb.DuckDBPyConnection, sql: str, created: set[str]
) -> "pd.DataFrame":
    """Execute an oracle WITH-chain as CREATE-TEMP-TABLE steps with
    HASH-VERSIONED names (``ge__a1b2c3...``): each step's references
    are rewritten to its upstreams' versioned names first, so the
    content hash transitively covers the whole subtree — an unchanged
    step is reused across oracles on this connection regardless of
    execution order, and variant chains (the insert oracle's predicated
    build next to the full build) coexist instead of thrashing one
    name.  ``created`` is the caller's cross-query cache of versioned
    names; falls back to verbatim execution when the chain shape is
    unsupported or a CTE name would shadow a base table view."""
    import hashlib

    parsed = split_materialized_ctes(sql)
    if parsed is None:
        return con.sql(sql).df()
    ctes, final = parsed
    if any(name in TABLES for name, _ in ctes):
        return con.sql(sql).df()
    if any(_COMMA_JOIN.search(body) for _, body in ctes) or _COMMA_JOIN.search(final):
        # a comma join would dodge the reference rewrite (ADVICE r11):
        # run the chain verbatim rather than risk a per-row loud failure
        return con.sql(sql).df()
    mapping: dict[str, str] = {}
    for name, body in ctes:
        body_v = _rewrite_refs(body, mapping)
        h = hashlib.sha256(body_v.encode()).hexdigest()[:12]
        vname = f"{name}__{h}"
        if vname not in created:
            con.execute(f'CREATE OR REPLACE TEMP TABLE "{vname}" AS {body_v}')
            created.add(vname)
        mapping[name] = vname
    return con.sql(_rewrite_refs(final, mapping)).df()


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
