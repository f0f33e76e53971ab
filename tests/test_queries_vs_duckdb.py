"""Every registered query must match its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (see /root/repo/__spark_entry__.py
docstring) so failures surface locally first.
"""

from __future__ import annotations

import pytest

from columnflow_spark.oracle import compare, duckdb_connection
from columnflow_spark.queries import all_oracles, all_queries


def _names():
    return sorted(all_queries().keys())


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, sf_dir, con):
    queries, oracles = all_queries(), all_oracles()
    df = queries[name](spark, sf_dir)
    if name not in oracles:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    result = compare(name, df, oracles[name], con)
    assert result.ok, str(result)
