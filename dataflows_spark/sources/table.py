"""SnapshotTable — a minimal keyed table with atomic snapshot commits.

The engine's canonical table format is **Apache Iceberg** (MERGE INTO,
snapshot isolation, partition pruning). The runtime jar is not present
in this sandbox, so this class provides a drop-in parquet fallback with
the same two operations the engine needs:

- ``merge(df, keys)`` — upsert: new snapshot = (current ⟕ anti-join on
  keys) ∪ batch; readers always see a complete snapshot via an
  atomically-swapped pointer file (the reference's atomic
  ``.active``-rename pattern, ``processors/stream.py:6,36``, applied at
  table granularity — and the same commit protocol Iceberg uses with
  its metadata pointer).
- ``read(spark)`` — read the current snapshot.

At 100 TB, merge-as-rewrite is the wrong physical strategy — Iceberg's
MERGE INTO with file-level skipping is the real path; this fallback
keeps the *semantics* testable in-sandbox. ``iceberg_available()``
gates which path is used.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current")

    def current_snapshot(self) -> str | None:
        try:
            with open(self._pointer) as fh:
                name = fh.read().strip()
            return os.path.join(self.path, name) if name else None
        except FileNotFoundError:
            return None

    def _commit(self, snap_name: str) -> None:
        tmp = f"{self._pointer}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(snap_name)
        os.replace(tmp, self._pointer)

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    def read(self, spark: SparkSession) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"table {self.path} has no snapshot")
        return spark.read.parquet(snap)

    def overwrite(self, df: DataFrame) -> None:
        snap_name = f"snap-{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, snap_name))
        old = self.current_snapshot()
        self._commit(snap_name)
        if old and os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def merge(self, batch: DataFrame, keys: list[str]) -> None:
        """Upsert: rows in ``batch`` replace current rows with equal keys."""
        current = self.current_snapshot()
        if current is None:
            self.overwrite(batch)
            return
        spark = batch.sparkSession
        existing = spark.read.parquet(current)
        kept = existing.join(batch.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
        self.overwrite(kept.unionByName(batch))
