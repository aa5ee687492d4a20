"""Run every registered query against its DuckDB oracle at sf0.01 —
the same scale and comparison the driver's correctness gate uses."""

from __future__ import annotations

import pytest

from dbitool_spark.plans import registry
from tests.conftest import SF_ORACLE
from tests.oracle import compare, duck_connection

# Queries whose semantics legitimately may produce an empty result.
# Everything else must return rows — an all-empty "pass" is vacuous
# (it proves the plan compiles, not that it is correct).
MAY_BE_EMPTY: set[str] = set()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


_CASES = [
    (name, fn, registry.oracle_sql().get(name))
    for name, fn in registry.queries().items()
]


@pytest.mark.parametrize(
    "name,fn,sql", [c for c in _CASES if c[2] is not None], ids=[c[0] for c in _CASES if c[2] is not None]
)
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_ORACLE)
    problems = compare(df, duck, sql)
    assert not problems, f"{name}: " + "; ".join(problems)
    if name not in MAY_BE_EMPTY:
        assert df.count() > 0, f"{name}: vacuous — query returned 0 rows at sf0.01"


@pytest.mark.parametrize(
    "name,fn", [(c[0], c[1]) for c in _CASES if c[2] is None], ids=[c[0] for c in _CASES if c[2] is None]
)
def test_rows_only_queries_run(spark, name, fn):
    """Queries without an oracle still must execute, produce a stable
    schema, and (unless whitelisted) be non-empty."""
    df = fn(spark, SF_ORACLE)
    n = df.count()
    assert len(df.columns) > 0, name
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name}: vacuous — 0 rows at sf0.01"
