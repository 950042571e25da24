"""Driver-contract gate: every ``queries()`` entry runs, and every
oracle-paired entry matches its DuckDB oracle (row count + columns +
order-insensitive exact values) — at sf0.001 for speed; the grading driver
repeats this at sf0.01."""

import pytest

import __spark_entry__ as entrymod
from driver_sim import compare_query, duckdb_conn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {
        "source", "n_docs", "null_rows", "avg_output_len", "bytes_in",
    }


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_contract(spark, con, name):
    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    if name in oracles:
        ok, msg = compare_query(spark, con, fn, oracles[name], SF)
        assert ok, f"{name}: {msg}"
    else:
        # rows-only check (kernel-backed / non-SQL-expressible)
        df = fn(spark, SF)
        assert df.count() >= 0
        assert df.columns


def test_oracle_keys_subset_of_queries():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
