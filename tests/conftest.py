from __future__ import annotations

import pytest

from simplemapreduceframework_spark import get_spark
from simplemapreduceframework_spark.testing import duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("smrf-tests", cpus=8, shuffle_partitions=16)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()
