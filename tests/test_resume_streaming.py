"""Lineage/resume + incremental/state mode + structured streaming.

Mirrors the reference's driver tests: bookmark semantics
(/root/reference/cfht2caom2/tests/test_composable.py:351-388) and the
success/skip accounting (:147-196).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cfht2caom2_spark.plans.pipeline import run_batch
from cfht2caom2_spark.sources.pages import synth_pages
from cfht2caom2_spark.sources.table import SnapshotTable
from cfht2caom2_spark.streaming.incremental import (process_increment,
                                                    read_bookmark,
                                                    stream_pages,
                                                    windowed_metrics,
                                                    write_bookmark)

N = 300


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    table = SnapshotTable(f"{root}/pages")
    sid = table.append(synth_pages(spark, N))
    return table, sid, root


def test_run_and_resume(spark, store):
    table, sid, root = store
    out = f"{root}/out"
    r1 = run_batch(spark, table.read(spark, sid).drop("p_day"), out,
                   snapshot_id=sid)
    assert r1["processed"] == N and r1["partitions"] == 5
    # kill-and-resume: second run over the same snapshot does zero work
    r2 = run_batch(spark, table.read(spark, sid).drop("p_day"), out,
                   snapshot_id=sid)
    assert r2["processed"] == 0
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.count() == 5
    sums = lineage.agg(F.sum("n_in").alias("s")).collect()[0]["s"]
    assert sums == N


def test_partial_lineage_resumes_missing_days_only(spark, store):
    table, sid, root = store
    out = f"{root}/out_partial"
    pages = table.read(spark, sid).drop("p_day")
    # simulate a killed run: only two days completed
    subset = pages.filter(F.date_format("warc_ts", "yyyy-MM-dd")
                          .isin("2025-06-01", "2025-06-02"))
    r1 = run_batch(spark, subset, out, snapshot_id=sid)
    assert r1["partitions"] == 2
    # the restarted full run must process exactly the remaining 3 days
    r2 = run_batch(spark, pages, out, snapshot_id=sid)
    assert r2["partitions"] == 3
    dec = spark.read.parquet(f"{out}/decisions")
    assert dec.count() == N


def test_snapshot_incremental_state_mode(spark, store, tmp_path):
    table, sid, root = store
    s2 = table.append(
        synth_pages(spark, 100).withColumn(
            "warc_ts", F.col("warc_ts") + F.expr("interval 60 days")))
    bm = str(tmp_path / "bookmark.json")
    write_bookmark(bm, sid)
    out = str(tmp_path / "state_out")
    tick = process_increment(spark, table, out, bm)
    assert tick["processed"] == 100 and read_bookmark(bm) == s2
    assert process_increment(spark, table, out, bm)["processed"] == 0


def test_structured_streaming_available_now(spark, store, tmp_path):
    table, sid, root = store
    out = str(tmp_path / "stream_out")
    q = stream_pages(spark, table, out)
    q.awaitTermination(300)
    dec = spark.read.parquet(f"{out}/decisions")
    n_in = table.read(spark).count()
    # dropDuplicatesWithinWatermark collapses SOME re-arrivals (those still
    # inside the 1-day watermark horizon when they arrive); fixtures that
    # re-arrive +2/+60 days later may legitimately pass — so the invariant is
    # 0 < |decisions| <= |input|, with schema intact.
    assert 0 < dec.count() <= n_in
    assert {"url", "keep", "rules", "scrubbed_text"} <= set(dec.columns)
    m = windowed_metrics(dec).collect()
    assert sum(r["n_docs"] for r in m) == dec.count()


def test_snapshot_time_travel(spark, store):
    table, sid, root = store
    n_at_s1 = table.read(spark, sid).count()
    assert n_at_s1 == N  # later snapshots invisible at sid
