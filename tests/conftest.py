from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from kinesiscat_spark.session import get_spark

    spark = get_spark("kinesiscat-tests")
    yield spark


@pytest.fixture(scope="session")
def duck(request):
    from tools.oracle_check import duckdb_con

    con = duckdb_con(SF_ORACLE)
    yield con
    con.close()
