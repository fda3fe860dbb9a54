"""Intra-group backfill windows — the reference's sibling-copy merges.

Reference analogue: the Sitelle p<->z plane copy (instruments.py:1951-2019),
WIRCam p<->y copy (instruments.py:3016-3072) and 'g'-plane release backfill
(instruments.py:3307-3315): when one record of a group lacks a value, take it
from a sibling — deterministically, regardless of arrival order (the W1/W3
order-of-arrival headache the reference documents at instruments.py:89-94).

Spark recast: ``first(col, ignorenulls=True)`` over a group window ordered by
a total key, so the result is arrival-order independent by construction.
Before any per-host window at scale, repartition on the salted key
(functions.identity.salted_key) so a hot host cannot pin one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def backfill_from_group(df: DataFrame, group_cols: list[str], order_cols: list[str],
                        fill_cols: list[str], suffix: str = "_filled") -> DataFrame:
    """col is null -> first non-null value within the group (full-frame window,
    deterministic under the total order)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    for c in fill_cols:
        df = df.withColumn(
            c + suffix,
            F.coalesce(F.col(c), F.first(F.col(c), ignorenulls=True).over(w)),
        )
    return df


def first_wins(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Canonical-version selection (W2, cfht_name.py:370-380): one row per key,
    the first under the total order."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def last_wins_merge(old: DataFrame, new: DataFrame, key_cols: list[str],
                    version_col: str) -> DataFrame:
    """MERGE/upsert semantics (J7, instruments.py:914-947 reuse-existing):
    union both sides, keep the highest-version row per key."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    return (
        old.unionByName(new)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
