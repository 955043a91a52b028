"""End-to-end correctness: every registered query vs its DuckDB oracle
at sf0.001 — the same compare the driver's gate runs at sf0.01
(industrialized form of the reference's inline-oracle tests,
reference counting_words.py:15-36)."""

from __future__ import annotations

import pytest

from simplemapreduceframework_spark import registry
from simplemapreduceframework_spark.testing import compare_query

registry.load_all()
ALL = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn = registry.QUERIES[name]
    oracle = registry.ORACLES.get(name)
    problems = compare_query(spark, duck, fn, oracle, sf_dir)
    assert not problems, f"{name}: {problems}"


def test_every_query_has_oracle_or_is_declared_rows_only():
    undeclared = set(registry.QUERIES) - set(registry.ORACLES) - registry.ROWS_ONLY
    assert not undeclared
