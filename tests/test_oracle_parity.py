"""Every queries() entry vs its DuckDB oracle — the driver's check, locally.

Runs at sf0.001 for speed (the driver itself runs sf0.01; semantics are
scale-free).
"""

from __future__ import annotations

import pytest

from cfht2caom2_spark.plans.driver_queries import ORACLES, QUERIES

from .oracle_harness import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, con):
    problems = compare(name, QUERIES[name](spark, SF), ORACLES[name], con)
    assert problems == []


def test_all_queries_have_oracles_or_are_declared():
    from cfht2caom2_spark.plans.driver_queries import NO_ORACLE_QUERIES
    assert set(ORACLES) == set(QUERIES)
    assert not (set(NO_ORACLE_QUERIES) & set(QUERIES))
