"""Driver-contract smoke + oracle-differential test for every registered
query (mirrors what the driver runs at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_util import compare, duck_connect


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["c_custkey", "c_name", "order_cnt", "total_spent"]


def test_queries_oracle_keys_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_ORACLE)
    yield con
    con.close()


def _oracle_cases():
    oracles = entrymod.oracle_sql()
    return sorted(oracles)


@pytest.mark.parametrize("name", _oracle_cases())
def test_oracle_match(spark, duck, name):
    qs = entrymod.queries()
    df = qs[name](spark, SF_ORACLE)
    compare(df, duck, entrymod.oracle_sql()[name])
