"""Run every registered query against its DuckDB oracle at sf0.001
(fast) — the same comparison the driver makes at sf0.01."""

from __future__ import annotations

import pytest

from dbitool_spark.plans import registry
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


def _oracle_cases():
    oracles = registry.oracle_sql()
    return [(name, fn, oracles[name]) for name, fn in registry.queries().items() if name in oracles]


@pytest.mark.parametrize("name,fn,sql", _oracle_cases(), ids=[c[0] for c in _oracle_cases()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_SMOKE)
    problems = compare(df, duck, sql)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must execute and be stable."""
    oracles = registry.oracle_sql()
    for name, fn in registry.queries().items():
        if name in oracles:
            continue
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
