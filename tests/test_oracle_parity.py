"""Oracle parity: every queries() entry with an oracle_sql() must match
DuckDB on row count, column names, and order-insensitive value hash at
sf0.001 (the driver runs the same comparison at sf0.01 — SURVEY.md §5.2.2)."""

from __future__ import annotations

import duckdb
import pytest

from gmall_flink_yb_spark.queries import ORACLES, QUERIES
from gmall_flink_yb_spark.schemas import TESTDATA_TABLES

from tools.check_oracle import table_hash

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(ORACLES[name])
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(res.columns), "column names differ"
    assert len(srows) == len(orows), "row counts differ"
    assert table_hash(sdf.columns, srows) == table_hash(res.columns, orows)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    assert QUERIES[name](spark, SF_DIR).count() >= 0
