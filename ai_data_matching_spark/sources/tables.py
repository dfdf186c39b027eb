"""Snapshot table layer: commit / resume / lineage / metrics.

The north rule requires every stage to checkpoint with per-partition
lineage + metrics so a killed run resumes from the last committed
snapshot. On a cluster this layer binds to Iceberg
(``df.writeTo(tbl).createOrReplace()`` + snapshot ids); this sandbox has
no Iceberg runtime jar, so ``TableIO`` implements the same contract over
a directory of parquet snapshots with an atomic JSON commit manifest:

    <root>/<stage>/<snapshot_id>/data.parquet      (the stage output)
    <root>/<stage>/<snapshot_id>/lineage.parquet   (per-partition rows)
    <root>/_commits.json                           (atomic rename commit)

A snapshot is visible only once its manifest entry lands (write-temp +
os.replace = atomic on POSIX — same publish-on-commit semantics as an
Iceberg snapshot). Resume = read manifest, match (stage, fingerprint),
skip recompute. The fingerprint covers the stage's config so a changed
threshold invalidates downstream snapshots.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def config_fingerprint(payload: dict) -> str:
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


@dataclass
class CommitRecord:
    stage: str
    snapshot_id: str
    fingerprint: str
    row_count: int
    n_partitions: int
    committed_at: float


class TableIO:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_commits.json")

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)

    def _append_manifest(self, rec: dict) -> None:
        records = self._read_manifest()
        records.append(rec)
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(records, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic publish

    def last_committed(self, stage: str, fingerprint: str) -> dict | None:
        for rec in reversed(self._read_manifest()):
            if rec["stage"] == stage and rec["fingerprint"] == fingerprint:
                return rec
        return None

    # -- commit / read -----------------------------------------------------
    def commit(
        self, df: DataFrame, stage: str, fingerprint: str, extra: dict | None = None
    ) -> DataFrame:
        """Write a stage output as a new snapshot with per-partition lineage,
        then publish it in the manifest. Returns the re-read (committed)
        frame so downstream stages read from stable storage — this also
        cuts lineage like a checkpoint. ``extra`` merges additional fields
        into the manifest record (e.g. ``cfg_fp``, the config fingerprint a
        restarted stream validates before chaining onto this state)."""
        snapshot_id = uuid.uuid4().hex[:12]
        snap_dir = os.path.join(self.root, stage, snapshot_id)
        data_path = os.path.join(snap_dir, "data.parquet")
        df.write.mode("overwrite").parquet(data_path)

        spark = df.sparkSession
        committed = spark.read.parquet(data_path)
        lineage = (
            committed.withColumn("_part", F.spark_partition_id())
            .groupBy("_part")
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("snapshot_id", F.lit(snapshot_id))
        )
        lineage.write.mode("overwrite").parquet(os.path.join(snap_dir, "lineage.parquet"))
        row_count = committed.count()
        n_parts = committed.rdd.getNumPartitions()
        self._append_manifest(
            {
                "stage": stage,
                "snapshot_id": snapshot_id,
                "fingerprint": fingerprint,
                "row_count": row_count,
                "n_partitions": n_parts,
                "committed_at": time.time(),
                "path": data_path,
                **(extra or {}),
            }
        )
        return committed

    def read_snapshot(self, spark: SparkSession, rec: dict) -> DataFrame:
        return spark.read.parquet(rec["path"])

    def read_or_compute(
        self,
        spark: SparkSession,
        stage: str,
        fingerprint: str,
        compute,
        force: bool = False,
        extra: dict | None = None,
    ) -> tuple[DataFrame, bool]:
        """Resume probe: return (df, was_resumed). ``compute`` is a thunk
        producing the stage DataFrame; it is only invoked when no committed
        snapshot matches (stage, fingerprint)."""
        if not force:
            rec = self.last_committed(stage, fingerprint)
            if rec is not None:
                return self.read_snapshot(spark, rec), True
        return self.commit(compute(), stage, fingerprint, extra=extra), False

    def write_metric(self, df: DataFrame, stage: str, name: str) -> None:
        path = os.path.join(self.root, "_metrics", stage, name)
        df.write.mode("overwrite").parquet(path)

    # -- retention ---------------------------------------------------------
    def gc(self, keep_last: int = 3) -> dict:
        """Expire old snapshots: keep the last ``keep_last`` fingerprints
        (by first-commit order) plus the chain head (the fingerprint of
        the newest ``labels`` record — what a restarted stream chains on).

        Without retention a continuous-ER deployment grows storage without
        bound: every epoch commits blocked/edges/labels snapshots forever.
        (``_metrics`` frames are outside retention: they are per-epoch
        kilobyte-scale aggregates — counts and score histograms — whose
        history IS the observability record; prune by age externally if
        a deployment ever cares.)
        Crash-safe ordering: the compacted manifest is PUBLISHED first
        (atomic os.replace), then dropped snapshot directories are
        deleted — a crash in between leaves orphan directories (harmless,
        re-collectable) rather than manifest records pointing at deleted
        data. Same publish-then-expire discipline as Iceberg's
        ``expireSnapshots``.
        """
        import shutil

        records = self._read_manifest()
        fps: list[str] = []
        for rec in records:
            if rec["fingerprint"] not in fps:
                fps.append(rec["fingerprint"])
        head = next(
            (r["fingerprint"] for r in reversed(records) if r["stage"] == "labels"),
            None,
        )
        keep = set(fps[-keep_last:]) if keep_last > 0 else set()
        if head is not None:
            keep.add(head)
        kept = [r for r in records if r["fingerprint"] in keep]
        dropped = [r for r in records if r["fingerprint"] not in keep]

        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(kept, f, indent=1)
        os.replace(tmp, self._manifest_path)  # publish BEFORE deleting data
        for rec in dropped:
            shutil.rmtree(os.path.dirname(rec["path"]), ignore_errors=True)
        return {
            "kept_records": len(kept),
            "dropped_records": len(dropped),
            "kept_fingerprints": sorted(keep),
            "chain_head": head,
        }
