from __future__ import annotations

import os
import sys

import pytest

# Repo root on sys.path ONCE (guarded), so tests importing repo-root
# modules (bench, scripts helpers) don't each insert their own copy —
# r15 ADVICE: an unguarded collection-time insert accumulated
# duplicate path entries under repeated collection.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

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
