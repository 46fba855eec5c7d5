"""Snapshot catalog: checkpointed stage tables + lineage/metrics manifest.

North-rule requirement: "per-partition lineage and signature/candidate/
cluster metrics written alongside checkpointed Iceberg snapshots so any
stage is resumable".

Design: the API is Iceberg-shaped (snapshot id, parent id, append/overwrite,
time-travelable manifest log) but the sandbox has no Iceberg runtime jar
(verified: empty pyspark jars grep, SURVEY.md §1.4), so the storage layer is
plain Parquet directories plus a JSON manifest log with isomorphic fields —
swapping in Iceberg is a config change (``df.writeTo(table).append()``
instead of ``df.write.parquet``), not a redesign.

Layout:
    root/
      manifest.jsonl         one JSON line per snapshot (append-only log)
      <stage>/<snapshot_id>/ parquet data for that stage snapshot

Each manifest line:
    {snapshot_id, parent_id, stage, created_ms, rows, n_partitions,
     partition_rows: {pid: rows}, metrics: {...}}

``partition_rows`` is the per-partition lineage record (computed with
``spark_partition_id`` — one count agg, no collect of data).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class ConcurrentSnapshotError(RuntimeError):
    """Optimistic-concurrency conflict: another writer appended a snapshot
    for this stage between the caller's read of the manifest and its commit
    (Iceberg analog: a commit conflict on the table's current snapshot id).
    The attempted write left only an orphan data directory — catalog state
    is untouched; the caller may re-read and retry."""


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.jsonl")

    # -- manifest log -----------------------------------------------------

    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _append_manifest(self, entry: dict) -> None:
        with open(self._manifest_path, "a") as f:
            f.write(json.dumps(entry, sort_keys=True) + "\n")

    def snapshots(self, stage: str | None = None) -> list[dict]:
        entries = self._read_manifest()
        if stage is not None:
            entries = [e for e in entries if e["stage"] == stage]
        return entries

    def active_snapshots(self, stage: str) -> list[dict]:
        """Snapshots that constitute the stage's CURRENT state: everything
        from the most recent ``replaces_prior`` snapshot (a full compaction
        rewrite) onward, minus any snapshots superseded by a later entry's
        ``replaces_ids`` (a minor/delta compaction that merged a SUBSET of
        prior deltas without rewriting the base). ``snapshots()`` keeps the
        full append-only history for time travel; readers of delta stages
        use this view so a compaction truncates their union without
        rewriting the manifest (Iceberg analog: a rewrite/compaction commit
        replacing prior data files while old snapshots stay
        time-travelable)."""
        entries = self.snapshots(stage)
        for i in range(len(entries) - 1, -1, -1):
            if entries[i].get("replaces_prior"):
                entries = entries[i:]
                break
        replaced: set[str] = set()
        for e in entries:
            replaced.update(e.get("replaces_ids") or [])
        return [e for e in entries if e["snapshot_id"] not in replaced]

    def latest(self, stage: str) -> dict | None:
        entries = self.snapshots(stage)
        return entries[-1] if entries else None

    def has_stage(self, stage: str) -> bool:
        return self.latest(stage) is not None

    # -- write / read -----------------------------------------------------

    def write_stage(
        self,
        df: DataFrame,
        stage: str,
        metrics: dict | None = None,
        replaces_prior: bool = False,
        replaces_ids: list[str] | None = None,
        expected_latest_id: str | None | bool = False,
    ) -> dict:
        """Persist a stage output as a new snapshot; records per-partition
        lineage (rows per partition) + caller metrics in the manifest.

        ``replaces_prior=True`` marks a full compaction rewrite: the
        snapshot holds the stage's FULL current state and
        ``active_snapshots`` stops unioning anything older.
        ``replaces_ids`` marks a minor (delta) compaction: the snapshot
        supersedes exactly those prior snapshot ids, leaving the base and
        later deltas in place. The parquet write completes before the
        manifest line is appended, so a crash mid-compaction leaves only an
        orphan directory — readers stay consistent on the prior snapshots.

        ``expected_latest_id``: optimistic concurrency for compactions —
        pass the stage's latest snapshot_id (or None for an empty stage) as
        observed when the caller READ the state it is rewriting; if another
        writer appended in between, the commit is refused with
        ``ConcurrentSnapshotError`` *after* the parquet write (orphan dir,
        no manifest entry) so a concurrent batch's delta is never silently
        dropped from the active set. The default (False) skips the check —
        plain delta appends are order-insensitive and need no guard."""
        snapshot_id = uuid.uuid4().hex[:16]
        parent = self.latest(stage)
        path = os.path.join(self.root, stage, snapshot_id)
        df.write.mode("errorifexists").parquet(path)
        if expected_latest_id is not False:
            current = self.latest(stage)
            current_id = current["snapshot_id"] if current else None
            if current_id != expected_latest_id:
                raise ConcurrentSnapshotError(
                    f"stage {stage!r}: expected latest snapshot "
                    f"{expected_latest_id!r} but found {current_id!r} — "
                    "another writer committed since this compaction read its "
                    "input; aborting (orphan data dir only, state untouched)"
                )
        written = self.spark.read.parquet(path)
        part_rows = {
            str(r["_pid"]): r["n"]
            for r in written.groupBy(F.spark_partition_id().alias("_pid"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        entry = {
            "snapshot_id": snapshot_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "stage": stage,
            "created_ms": int(time.time() * 1000),
            "rows": int(sum(part_rows.values())),
            "n_partitions": len(part_rows),
            "partition_rows": part_rows,
            "metrics": metrics or {},
            "path": path,
            "replaces_prior": replaces_prior,
            "replaces_ids": replaces_ids or [],
        }
        self._append_manifest(entry)
        return entry

    def read_stage_union(self, stage: str) -> DataFrame:
        """Union of ALL snapshots of a delta stage (each snapshot holds only
        the rows added by one batch). This is the read path for append-only
        stages like incremental features/docs: at 10^12 docs a batch writes
        its delta and readers union the snapshot list — never a full rewrite.
        (Iceberg analog: reading the table = union of all appended data
        files; here the manifest log plays the manifest-list role.) Unions
        the ACTIVE snapshots only — a compaction rewrite truncates the list
        read-side, bounding read cost by state size instead of batch count."""
        entries = self.active_snapshots(stage)
        if not entries:
            raise FileNotFoundError(f"no snapshot for stage {stage!r}")
        return self.spark.read.parquet(*[e["path"] for e in entries])

    def read_stage(self, stage: str, snapshot_id: str | None = None) -> DataFrame:
        if snapshot_id is None:
            entry = self.latest(stage)
            if entry is None:
                raise FileNotFoundError(f"no snapshot for stage {stage!r}")
        else:
            matches = [e for e in self.snapshots(stage) if e["snapshot_id"] == snapshot_id]
            if not matches:
                raise FileNotFoundError(f"snapshot {snapshot_id!r} not found for {stage!r}")
            entry = matches[0]
        return self.spark.read.parquet(entry["path"])

    def get_or_compute(
        self, stage: str, compute, metrics: dict | None = None, force: bool = False
    ) -> DataFrame:
        """Resume point: return the stage's latest snapshot if present,
        otherwise compute, persist, and return it. ``compute`` is a thunk
        returning a DataFrame."""
        if not force and self.has_stage(stage):
            return self.read_stage(stage)
        self.write_stage(compute(), stage, metrics)
        return self.read_stage(stage)
