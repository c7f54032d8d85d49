"""Mirror of the driver's t2 gate: every registered query with an oracle must
hash-match DuckDB at sf0.01; oracle-less queries must at least run."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tools.oracle_check import compare


def _query_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = fn(spark, SF_ORACLE)
    if name not in oracles:
        assert df.count() >= 0
        return
    ok, msg = compare(df, duck.sql(oracles[name]).df())
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 1
