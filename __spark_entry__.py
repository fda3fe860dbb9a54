"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship quality-filter pipeline (SURVEY.md §3.1) on the
sf0.001 documents table.  ``queries``/``oracle_sql`` expose one entry per
implemented operator family from SURVEY.md §2, checked by the driver against
DuckDB at sf0.01 (row count + schema + order-insensitive value hash).
Implementations live in cfht2caom2_spark/plans/driver_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cfht2caom2_spark.plans.driver_queries import (NO_ORACLE_QUERIES, ORACLES,
                                                   QUERIES,
                                                   q_pipeline_flagship)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pipeline_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(QUERIES)
    out.update(NO_ORACLE_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (rows-only checks for the
    model-UDF pipeline entries, which SQL cannot express)."""
    return dict(ORACLES)
