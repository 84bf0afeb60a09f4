"""CatalogAdapter — Iceberg-shaped table catalog over parquet + JSON manifest.

The north_rule calls for index state in Iceberg with per-partition lineage
and checkpoint manifests. This sandbox's PySpark has no Iceberg runtime jar,
so this adapter provides the same *semantics* on plain parquet:

- a table "exists" only once its manifest entry is committed (writes go to a
  ``_tmp.<table>`` directory, then an atomic rename + manifest commit — a
  killed build never leaves a half-table that resume would trust);
- incremental tables commit one manifest entry per partition batch with row
  counts and wall time (``append_batch``), so a restarted build anti-joins
  the completed batches and recomputes nothing that finished
  (cf. reference's absence of any resume: a killed indexer.py run restarts
  from zero);
- ``snapshots`` records every commit with a monotonically increasing id,
  mirroring Iceberg's snapshot log.

Swapping in real Iceberg is confined to this module (df.writeTo(...) /
spark.table(...)).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CatalogAdapter:
    MANIFEST = "_manifest.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, self.MANIFEST)

    def _load(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"tables": {}, "snapshots": [], "build": None}
        with open(p) as f:
            return json.load(f)

    def _commit(self, manifest: dict, op: str, table: str | None = None,
                extra: dict | None = None) -> None:
        snap = {
            "snapshot_id": len(manifest["snapshots"]) + 1,
            "ts": time.time(),
            "op": op,
            "table": table,
        }
        if extra:
            snap.update(extra)
        manifest["snapshots"].append(snap)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path())

    # -- table ops ---------------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def has_table(self, name: str) -> bool:
        return name in self._load()["tables"]

    def write_table(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        max_records_per_file: int | None = None,
    ) -> None:
        tmp = os.path.join(self.root, f"_tmp.{name}")
        final = self.table_path(name)
        shutil.rmtree(tmp, ignore_errors=True)
        writer = df.write.mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        manifest = self._load()
        manifest["tables"][name] = {
            "path": final,
            "partition_by": partition_by or [],
            "batches": [],
        }
        self._commit(manifest, "create", name)

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        if not self.has_table(name):
            raise FileNotFoundError(f"table {name} not committed in {self.root}")
        return spark.read.parquet(self.table_path(name))

    # -- batch (per-partition lineage) ops ---------------------------------
    def completed_batches(self, name: str) -> list[str]:
        t = self._load()["tables"].get(name)
        return [b["batch_id"] for b in (t or {}).get("batches", [])]

    def append_batch(
        self,
        df: DataFrame,
        name: str,
        batch_id: str,
        partition_by: list[str] | None = None,
        metrics: dict | None = None,
    ) -> None:
        """Append one batch under ``<table>/batch=<batch_id>`` and commit it.

        A batch directory without a manifest entry (crash mid-write) is
        overwritten on retry — exactly-once at batch granularity.
        """
        manifest = self._load()
        t = manifest["tables"].setdefault(
            name,
            {"path": self.table_path(name), "partition_by": partition_by or [],
             "batches": []},
        )
        if any(b["batch_id"] == batch_id for b in t["batches"]):
            return
        t0 = time.time()
        dest = os.path.join(self.table_path(name), f"batch={batch_id}")
        tmp = os.path.join(self.root, f"_tmp.{name}.{batch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        n_rows = 0
        # row count from parquet footers (cheap, no second job over data)
        import pyarrow.parquet as pq

        for dirpath, _dirs, files in os.walk(tmp):
            for fn in files:
                if fn.endswith(".parquet"):
                    n_rows += pq.ParquetFile(os.path.join(dirpath, fn)).metadata.num_rows
        os.makedirs(self.table_path(name), exist_ok=True)
        shutil.rmtree(dest, ignore_errors=True)
        os.replace(tmp, dest)
        entry = {"batch_id": batch_id, "rows": n_rows,
                 "wall_sec": time.time() - t0}
        if metrics:
            entry.update(metrics)
        t["batches"].append(entry)
        self._commit(manifest, "append_batch", name, {"batch_id": batch_id})

    def finalize_batched_table(self, name: str) -> None:
        """Mark a batch-built table complete (resume skips it entirely)."""
        manifest = self._load()
        manifest["tables"].setdefault(name, {"path": self.table_path(name),
                                             "partition_by": [], "batches": []})
        manifest["tables"][name]["complete"] = True
        self._commit(manifest, "finalize", name)

    def is_complete(self, name: str) -> bool:
        t = self._load()["tables"].get(name)
        return bool(t and t.get("complete"))

    # -- table/index properties (Iceberg table-properties analog) ----------
    def set_properties(self, props: dict) -> None:
        manifest = self._load()
        manifest.setdefault("properties", {}).update(props)
        self._commit(manifest, "set_properties")

    def properties(self) -> dict:
        return self._load().get("properties", {})

    # -- build metadata ----------------------------------------------------
    def finish_build(self, metrics: dict) -> None:
        manifest = self._load()
        manifest["build"] = metrics
        self._commit(manifest, "finish_build")

    def build_metrics(self) -> dict | None:
        return self._load()["build"]

    def drop_table(self, name: str) -> None:
        """Remove one table (data + manifest entry); no-op if absent.

        Used by compaction to invalidate derived tables before re-deriving
        them from an appended-to base table.
        """
        manifest = self._load()
        if name not in manifest["tables"]:
            return
        shutil.rmtree(self.table_path(name), ignore_errors=True)
        del manifest["tables"][name]
        self._commit(manifest, "drop", name)

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
