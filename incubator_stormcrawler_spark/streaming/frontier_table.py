"""Versioned frontier table: atomic snapshot commits over parquet.

The frontier is read and rewritten every generation (and concurrently read
by monitors), so overwrite-in-place races readers. This is the minimal
table format that fixes it: each commit writes a new ``v<NNN>`` snapshot
directory, then atomically replaces the ``_VERSION`` pointer file; readers
resolve the pointer first. On a real cluster this maps 1:1 onto Delta/
Iceberg (``MERGE INTO`` + snapshot isolation); the operator code is
identical either way — only this storage shim changes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

FRONTIER_DDL = (
    "url string, status string, next_fetch_date timestamp, "
    "error_count int, key string, bucket int"
)


class FrontierTable:
    """``partition_by="bucket"`` stores each snapshot hive-partitioned by
    the politeness-bucket column (Phase-4 layout, SURVEY.md §7): a
    generation that crawls one shard (``frontier_topk(..., bucket=b)``)
    then scans ONLY that bucket's files — the filter becomes a
    PartitionFilter, not a row filter. At 100 TB this is the difference
    between reading 1/N of the table and reading all of it."""

    def __init__(self, path: str, partition_by: str | None = None):
        self.path = path
        self.partition_by = partition_by
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def current_version(self) -> int:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def exists(self) -> bool:
        return self.current_version() > 0

    def read(self, spark: SparkSession) -> DataFrame:
        v = self.current_version()
        if v == 0:
            return spark.createDataFrame([], FRONTIER_DDL)
        return spark.read.parquet(os.path.join(self.path, f"v{v:06d}"))

    def commit(self, df: DataFrame) -> int:
        """Materialize ``df`` as the next snapshot and flip the pointer
        atomically. The df may read from the current snapshot (the write
        targets a different directory, so no self-overwrite)."""
        v = self.current_version() + 1
        snap = os.path.join(self.path, f"v{v:06d}")
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(self.partition_by)
        writer.parquet(snap)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer)
        self._vacuum(keep=3)
        return v

    def _vacuum(self, keep: int = 3) -> None:
        """Drop snapshots older than the last ``keep`` (readers of very old
        versions are long gone by then)."""
        current = self.current_version()
        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) <= current - keep:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
