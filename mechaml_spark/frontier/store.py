"""Snapshot store: Iceberg-style checkpoints on plain parquet.

The sandbox Spark has no Iceberg jar (SURVEY.md §4), so snapshots
are a manifest-JSON chain over parquet directories implementing the
same contract: atomic commit (write-tmp + rename), parent pointer,
per-partition lineage metrics (frontier-epoch, host-shard,
rows-emitted), resume-from-latest.  The API is deliberately thin so
an Iceberg backend is a config switch on a real cluster
(``spark.write.format("iceberg")`` + snapshot metadata instead of
the manifest file).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    epoch: int
    parent: int | None
    tables: dict[str, str]  # name -> parquet path
    metrics: dict
    wall_time: float


class SnapshotStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _manifest_path(self, epoch: int) -> str:
        return os.path.join(self.root, f"manifest-{epoch:06d}.json")

    def latest_epoch(self) -> int | None:
        epochs = [
            int(f[len("manifest-") : -len(".json")])
            for f in os.listdir(self.root)
            if f.startswith("manifest-") and f.endswith(".json")
        ]
        return max(epochs) if epochs else None

    def commit(
        self,
        epoch: int,
        tables: dict[str, DataFrame],
        metrics: dict | None = None,
        partition_by: dict[str, list[str]] | None = None,
    ) -> Snapshot:
        """Write every table to parquet and atomically publish the
        manifest.  ``metrics`` should include per-partition lineage
        (host_shard -> rows) supplied by the scheduler."""
        t0 = time.time()
        paths: dict[str, str] = {}
        for name, df in tables.items():
            path = os.path.join(self.root, f"epoch={epoch:06d}", name)
            writer = df.write.mode("overwrite")
            for col in (partition_by or {}).get(name, []):
                writer = writer.partitionBy(col)
            writer.parquet(path)
            paths[name] = path
        parent = self.latest_epoch()
        snap = Snapshot(
            epoch=epoch,
            parent=parent,
            tables=paths,
            metrics=metrics or {},
            wall_time=time.time() - t0,
        )
        manifest = {
            "epoch": snap.epoch,
            "parent": snap.parent,
            "tables": snap.tables,
            "metrics": snap.metrics,
            "wall_time_sec": snap.wall_time,
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(epoch))  # atomic publish
        return snap

    def merge_commit(
        self,
        spark: SparkSession,
        epoch: int,
        name: str,
        updates: DataFrame,
        key: list[str],
        delete_updates: DataFrame | None = None,
        metrics: dict | None = None,
    ) -> Snapshot:
        """``MERGE INTO``-shaped commit — the exact surface an Iceberg
        backend swap must implement (Iceberg SQL: ``MERGE INTO t USING
        u ON <key> WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
        INSERT``, plus a keyed delete branch):

        * rows of ``updates`` win on ``key`` (matched -> update,
          unmatched -> insert);
        * rows keyed by ``delete_updates`` are removed;
        * ONLY the merged table gets new data files — every other
          table of the parent snapshot is carried forward BY
          REFERENCE (Iceberg's unchanged-manifest reuse; here the
          manifest points at the parent's parquet paths);
        * the parent snapshot stays readable afterwards (snapshots
          are immutable; time travel by id keeps working).

        On the parquet fallback the merge is computed relationally
        (anti-join + union, the same algebra as
        :func:`mechaml_spark.cookies.jar_upsert`) and written as the
        new table; on Iceberg it becomes one MERGE statement + the
        commit's new snapshot id."""
        parent_snap, dfs = self.load(spark)
        base = dfs[name]
        kept = base.join(updates.select(*key), on=key, how="left_anti")
        merged = kept.unionByName(updates)
        if delete_updates is not None:
            merged = merged.join(
                delete_updates.select(*key), on=key, how="left_anti"
            )
        path = os.path.join(self.root, f"epoch={epoch:06d}", name)
        merged.write.mode("overwrite").parquet(path)
        paths = dict(parent_snap.tables)  # carry-forward by reference
        paths[name] = path
        snap = Snapshot(
            epoch=epoch,
            parent=parent_snap.epoch,
            tables=paths,
            metrics=metrics or {},
            wall_time=0.0,
        )
        manifest = {
            "epoch": snap.epoch,
            "parent": snap.parent,
            "tables": snap.tables,
            "metrics": snap.metrics,
            "wall_time_sec": snap.wall_time,
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(epoch))  # atomic publish
        return snap

    def load(self, spark: SparkSession, epoch: int | None = None
             ) -> tuple[Snapshot, dict[str, DataFrame]]:
        if epoch is None:
            epoch = self.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(f"no snapshots under {self.root}")
        with open(self._manifest_path(epoch)) as f:
            m = json.load(f)
        snap = Snapshot(
            epoch=m["epoch"],
            parent=m["parent"],
            tables=m["tables"],
            metrics=m["metrics"],
            wall_time=m["wall_time_sec"],
        )
        dfs = {name: spark.read.parquet(path) for name, path in snap.tables.items()}
        return snap, dfs

    def lineage(self) -> list[dict]:
        """Manifest chain, oldest first — ends cleanly where history
        has been expired (a parent whose manifest no longer exists)."""
        out = []
        e = self.latest_epoch()
        seen_epochs = set()
        while e is not None and e not in seen_epochs:
            seen_epochs.add(e)
            try:
                with open(self._manifest_path(e)) as f:
                    m = json.load(f)
            except FileNotFoundError:
                break  # expired ancestor: chain ends here
            out.append(m)
            e = m["parent"]
        return list(reversed(out))

    # -- table maintenance (the Iceberg expire_snapshots /
    # -- rewrite_data_files pair, without which a 10^10-row frontier
    # -- accumulates unbounded metadata and small files) ---------------

    def expire_snapshots(self, keep_last: int) -> dict:
        """Drop all but the newest ``keep_last`` snapshots and
        garbage-collect data directories no surviving snapshot
        references — Iceberg's ``expire_snapshots`` contract.  Because
        :meth:`merge_commit` carries unchanged tables forward BY
        REFERENCE, an old epoch's parquet may still back the newest
        snapshot: GC is reference-counted over the survivors' table
        paths, never age-based.  Returns what was removed."""
        import shutil

        epochs = sorted(
            int(f[len("manifest-"):-len(".json")])
            for f in os.listdir(self.root)
            if f.startswith("manifest-") and f.endswith(".json")
        )
        if keep_last < 1:
            raise ValueError("must keep at least the latest snapshot")
        drop, keep = epochs[:-keep_last], epochs[-keep_last:]
        live_paths: set[str] = set()
        for e in keep:
            with open(self._manifest_path(e)) as f:
                live_paths.update(json.load(f)["tables"].values())
        removed_dirs = []
        for e in drop:
            with open(self._manifest_path(e)) as f:
                m = json.load(f)
            for path in m["tables"].values():
                if path not in live_paths and os.path.isdir(path):
                    shutil.rmtree(path)
                    removed_dirs.append(path)
            os.remove(self._manifest_path(e))
        # sweep now-empty epoch dirs
        for d in os.listdir(self.root):
            full = os.path.join(self.root, d)
            if d.startswith("epoch=") and os.path.isdir(full) \
                    and not os.listdir(full):
                os.rmdir(full)
        return {"expired_epochs": drop, "removed_dirs": removed_dirs,
                "kept_epochs": keep}

    def compact(
        self,
        spark: SparkSession,
        epoch: int,
        name: str,
        target_files: int,
        metrics: dict | None = None,
    ) -> Snapshot:
        """Rewrite one table's data files into ``target_files`` files
        and publish the result as a NEW snapshot (Iceberg's
        ``rewrite_data_files`` commits a replace snapshot; the parent
        stays readable).  Row content is untouched — this is the
        small-files maintenance pass a long crawl runs so per-epoch
        incremental commits don't degrade scan parallelism into
        thousands of tiny tasks."""
        parent_snap, dfs = self.load(spark)
        if name not in dfs:
            raise KeyError(name)
        path = os.path.join(self.root, f"epoch={epoch:06d}", name)
        dfs[name].coalesce(target_files).write.mode("overwrite").parquet(
            path
        )
        paths = dict(parent_snap.tables)
        paths[name] = path
        snap = Snapshot(
            epoch=epoch, parent=parent_snap.epoch, tables=paths,
            metrics=(metrics or {}) | {"compacted": name,
                                       "target_files": target_files},
            wall_time=0.0,
        )
        manifest = {
            "epoch": snap.epoch, "parent": snap.parent,
            "tables": snap.tables, "metrics": snap.metrics,
            "wall_time_sec": snap.wall_time,
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(epoch))  # atomic publish
        return snap
