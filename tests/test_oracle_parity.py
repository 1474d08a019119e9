"""Differential test: every declared query with a SQL oracle must
hash-match DuckDB at sf0.001 and sf0.01 — the local twin of the
driver's CORRECTNESS gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_compare import compare_query, duckdb_connection  # noqa: E402

_ORACLES = entrymod.oracle_sql()
_QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def duck(sf_medium):
    con = duckdb_connection(sf_medium)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, sf_medium, duck):
    res = compare_query(name, _QUERIES[name](spark, sf_medium), duck, _ORACLES[name])
    assert res.ok, f"{name}: {res.detail}"


def test_every_query_has_callable():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_medium):
    """Queries without a SQL oracle still must execute deterministically:
    run twice, same sorted rows."""
    a = sorted(map(str, _QUERIES[name](spark, sf_medium).collect()))
    b = sorted(map(str, _QUERIES[name](spark, sf_medium).collect()))
    assert a == b
    assert len(a) >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
