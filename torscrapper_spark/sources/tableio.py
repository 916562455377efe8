"""Versioned snapshot tables with an atomic manifest commit point.

The north rule requires per-wave checkpoints of frontier + seen-filter
state "to Iceberg snapshots … for resumable restarts" (BASELINE.json:14).
The sandbox image ships no Iceberg runtime jar and has no network
(SURVEY.md §7), so :class:`SnapshotStore` provides the same semantics —
versioned writes, snapshot-at-version reads, atomic multi-table commit,
resume from the last committed version — over plain parquet:

  root/<table>/wave=<w>/ …parquet          one dir per table × version
  root/_manifests/manifest_<w>.json        commit record, written LAST
                                           via tmp-file + atomic rename

A wave's writes are only visible to resume once its manifest exists, so
a crash mid-wave rolls back to the previous wave (the stale partial
dirs are simply overwritten on retry). On a real cluster this class is
swapped for an Iceberg catalog (``df.writeTo(tbl).append()`` +
``VERSION AS OF`` reads, or a WAP branch per wave) — the engine only
talks to this interface.

Delta-table convention: tables registered as *deltas* (e.g. ``seen``)
append one version dir per wave and are read as the union of all
versions ≤ w; state tables (``frontier``, ``bloom``) are read at
exactly version w.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(self._manifest_dir(), exist_ok=True)

    # ---- paths ----
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    def _manifest_path(self, wave: int) -> str:
        return os.path.join(self._manifest_dir(), f"manifest_{wave:06d}.json")

    def table_path(self, table: str, wave: int) -> str:
        return os.path.join(self.root, table, f"wave={wave}")

    # ---- writes ----
    def write(self, df: DataFrame, table: str, wave: int) -> None:
        df.write.mode("overwrite").parquet(self.table_path(table, wave))

    def commit(self, wave: int, info: dict) -> None:
        """Atomically publish version ``wave`` (manifest is the commit point)."""
        payload = dict(info)
        payload["wave"] = wave
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir(), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path(wave))

    # ---- reads ----
    def read(self, spark: SparkSession, table: str, wave: int) -> DataFrame:
        return spark.read.parquet(self.table_path(table, wave))

    def read_upto(self, spark: SparkSession, table: str, wave: int) -> DataFrame:
        """Union of delta versions 0..wave (e.g. the cumulative seen set)."""
        paths = [
            self.table_path(table, w)
            for w in range(wave + 1)
            if os.path.isdir(self.table_path(table, w))
        ]
        return spark.read.parquet(*paths)

    def read_outputs(self, spark: SparkSession, table: str) -> DataFrame:
        """All committed versions of an output table (trace/pages/metrics)."""
        last = self.last_wave()
        if last is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        paths = [
            self.table_path(table, w)
            for w in range(last + 1)
            if os.path.isdir(self.table_path(table, w))
        ]
        return spark.read.parquet(*paths)

    # ---- manifests ----
    def last_wave(self) -> int | None:
        waves = [
            int(n[len("manifest_"):-len(".json")])
            for n in os.listdir(self._manifest_dir())
            if n.startswith("manifest_") and n.endswith(".json")
        ]
        return max(waves) if waves else None

    def manifest(self, wave: int) -> dict:
        with open(self._manifest_path(wave)) as f:
            return json.load(f)
