"""Snapshot-versioned, day-partitioned page store — the Iceberg stand-in.

Production target is an Iceberg table partitioned by ``days(warc_ts)`` with
``snapshot-id``-ranged incremental reads (north_rule).  This container ships
no Iceberg runtime jar, so this module provides the same *semantics* over
partitioned parquet + JSON snapshot manifests:

  * ``append`` = a new snapshot: data files land under
    ``data/p_day=YYYY-MM-DD/``, and a manifest records exactly which files the
    snapshot added (Iceberg's manifest-list, minus the stats);
  * ``read(snapshot_id)`` = snapshot isolation: only files known to that
    snapshot are scanned (time travel / reproducible runs);
  * ``incremental(a, b)`` = Iceberg's incremental scan: files added in
    (a, b] — the reference's state-mode time-boxed work discovery
    (config/config.yml:86-99; composable.py:116-139) without a bookmark file.

The query layer never sees the difference: swap ``read``/``append`` for
``spark.read.format("iceberg")`` / ``writeTo(...).append()`` and every plan
in this repo is unchanged.  ``p_day`` stays a real partition column so
predicate -> partition pruning works identically.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.snap_dir = os.path.join(root, "snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- manifest bookkeeping -------------------------------------------------
    def snapshots(self) -> list[int]:
        return sorted(
            int(f[:-5]) for f in os.listdir(self.snap_dir) if f.endswith(".json")
        )

    def current_snapshot(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def _manifest(self, snapshot_id: int) -> dict:
        with open(os.path.join(self.snap_dir, f"{snapshot_id}.json")) as fh:
            return json.load(fh)

    def _all_data_files(self) -> set[str]:
        out = set()
        for dirpath, _dirs, files in os.walk(self.data_dir):
            for f in files:
                if f.endswith(".parquet"):
                    out.add(os.path.join(dirpath, f))
        return out

    def files_in(self, snapshot_id: int | None = None) -> list[str]:
        """All data files visible at snapshot_id (cumulative)."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot()
        files: list[str] = []
        for s in self.snapshots():
            if s <= (sid if sid is not None else -1):
                files.extend(self._manifest(s)["added_files"])
        return files

    # -- write path -----------------------------------------------------------
    def append(self, df: DataFrame, ts_col: str = "warc_ts") -> int:
        """Write df as a new snapshot, partitioned by day(ts_col)."""
        before = self._all_data_files()
        (
            df.withColumn("p_day", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
            .write.mode("append")
            .partitionBy("p_day")
            .parquet(self.data_dir)
        )
        added = sorted(self._all_data_files() - before)
        sid = (self.current_snapshot() or 0) + 1
        manifest = {
            "snapshot_id": sid,
            "parent_id": self.current_snapshot(),
            "added_files": added,
            "committed_at": time.time(),
        }
        with open(os.path.join(self.snap_dir, f"{sid}.json"), "w") as fh:
            json.dump(manifest, fh)
        return sid

    # -- read path ------------------------------------------------------------
    def _read_files(self, spark: SparkSession, files: list[str]) -> DataFrame:
        if not files:
            all_files = sorted(self._all_data_files())
            if all_files:
                # schema from any existing file, zero rows
                return spark.read.option("basePath", self.data_dir) \
                    .parquet(all_files[0]).limit(0)
            # brand-new table: fall back to the canonical pages schema
            from .pages import PAGES_SCHEMA

            import pyspark.sql.types as T
            schema = T.StructType(list(PAGES_SCHEMA.fields)
                                  + [T.StructField("p_day", T.StringType())])
            return spark.createDataFrame([], schema)
        return spark.read.option("basePath", self.data_dir).parquet(*files)

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Snapshot-isolated scan (time travel when snapshot_id is given)."""
        return self._read_files(spark, self.files_in(snapshot_id))

    def incremental(self, spark: SparkSession, after: int | None,
                    until: int | None = None) -> DataFrame:
        """Rows appended in snapshots (after, until] — the state-scan S3."""
        until = until if until is not None else (self.current_snapshot() or 0)
        files: list[str] = []
        for s in self.snapshots():
            if (after is None or s > after) and s <= until:
                files.extend(self._manifest(s)["added_files"])
        return self._read_files(spark, files)
