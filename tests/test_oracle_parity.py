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


def test_repeated_spans_flat_builder_parity_k13(spark):
    """Round-4 self-review: the production-k window builder (the flat
    transform path, chosen for k>12) gets its own DuckDB parity check —
    the registry query runs k=8 and would never exercise it."""
    import duckdb

    from cfht2caom2_spark.operators.spans import repeated_spans
    from cfht2caom2_spark.plans.driver_queries import _repeated_spans_sql

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    con = duck_con(sf)
    problems = compare("spans_k13", repeated_spans(docs, k=13, min_count=2),
                       _repeated_spans_sql(13, 2), con)
    assert problems == [], problems
