"""Run every ORACLE-backed query against DuckDB at the small SF — the
local twin of the driver's CORRECTNESS gate."""

import pytest

from gcf_corima_parquet_converter_spark import queries as Q
from tests.oracle_harness import compare, duck_connect


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(Q.ORACLE))
def test_oracle_parity(name, spark, sf_dir, con):
    n = compare(Q.QUERIES[name](spark, sf_dir), con, Q.ORACLE[name], name)
    print(f"{name}: {n} rows OK")


def test_all_queries_run(spark, sf_dir):
    for name, fn in Q.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
