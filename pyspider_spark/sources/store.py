"""Snapshot store: checkpoint-resumable table state.

The design targets Iceberg (`MERGE INTO` + snapshot = checkpoint); this
sandbox has no Iceberg runtime jar, so ``SnapshotStore`` provides the same
contract over parquet: each commit writes a new immutable snapshot
directory and atomically flips a manifest pointer (rename), so a killed run
resumes from the last committed round with frontier + budget state + round
counter intact. Swapping in Iceberg is a one-class change (writes become
MERGE INTO / append, the manifest becomes the Iceberg snapshot id).

Layout:
    root/
      MANIFEST.json             -> {"round_no": k, "snapshot": "round_k", ...}
      frontier/round_k/*.parquet  (partitioned by project, host_bucket)
      results/part-*.parquet      (append-only log)
      metrics/part-*.parquet      (append-only log)
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspider_spark.functions.urlkit import host_bucket

MANIFEST = "MANIFEST.json"


class SnapshotStore:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # -- manifest -----------------------------------------------------------
    def read_manifest(self) -> dict | None:
        path = os.path.join(self.root, MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _commit_manifest(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.root, MANIFEST))  # atomic flip

    # -- frontier snapshots ---------------------------------------------------
    def frontier_path(self, round_no: int) -> str:
        return os.path.join(self.root, "frontier", f"round_{round_no}")

    def write_frontier(self, frontier: DataFrame, round_no: int, n_buckets: int = 16) -> None:
        """Snapshot partitioned by (project, host_bucket): rank-select
        windows and candidate anti-joins then read co-located data, and
        partition pruning serves per-project reads."""
        (
            frontier.withColumn("host_bucket", host_bucket(F.col("host"), n_buckets))
            .repartition("project", "host_bucket")
            .write.mode("overwrite")
            .partitionBy("project", "host_bucket")
            .parquet(self.frontier_path(round_no))
        )

    def read_frontier(self, round_no: int) -> DataFrame:
        return self.spark.read.parquet(self.frontier_path(round_no)).drop("host_bucket")

    # -- append-only logs -----------------------------------------------------
    def append(self, df: DataFrame, name: str, round_no: int | None = None) -> None:
        """Log write. With ``round_no``, the round's rows land in their own
        overwritten directory: a crash between this write and the manifest
        flip leaves orphan rows, but the resumed round OVERWRITES them and
        ``read_log`` only reads committed rounds — exactly-once, not
        at-least-once. (Iceberg analogue: the log append is part of the
        same snapshot commit.) Without ``round_no``: plain append."""
        if round_no is None:
            df.write.mode("append").parquet(os.path.join(self.root, name))
        else:
            df.write.mode("overwrite").parquet(
                os.path.join(self.root, name, f"round_{int(round_no)}")
            )

    def read_log(self, name: str) -> DataFrame:
        path = os.path.join(self.root, name)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        rounds = sorted(
            d for d in os.listdir(path)
            if d.startswith("round_") and os.path.isdir(os.path.join(path, d))
        )
        if not rounds:
            return self.spark.read.parquet(path)
        manifest = self.read_manifest()
        committed = manifest["round_no"] if manifest else -1
        keep = [
            os.path.join(path, d) for d in rounds
            if int(d.removeprefix("round_")) <= committed
        ]
        # a store may have mixed plain append() (top-level part files) with
        # per-round appends (e.g. resumed under newer code) — those legacy
        # rows are committed data and must not silently vanish. But ONLY the
        # legacy files recorded by a commit are committed: a plain append()
        # that crashed before any commit_round must stay invisible, or the
        # exactly-once barrier weakens to at-least-once (ADVICE r03).
        legacy = sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and os.path.isfile(os.path.join(path, f))
        )
        if legacy and manifest is not None and "legacy_files" in manifest:
            committed_legacy = set(manifest["legacy_files"].get(name, []))
            legacy = [f for f in legacy if f in committed_legacy]
        # (manifest predates legacy tracking, or no manifest: keep them all)
        keep += [os.path.join(path, f) for f in legacy]
        if not keep:
            return self.spark.read.parquet(os.path.join(path, rounds[0])).limit(0)
        return self.spark.read.parquet(*keep)

    # -- round commit ---------------------------------------------------------
    def _legacy_inventory(self) -> dict[str, list[str]]:
        """Top-level part files per log dir at commit time: these (and only
        these) plain-append rows become visible to read_log. One local
        listing per commit; at scale this is a per-table LIST bounded by
        the number of pre-round-mode files, which never grows."""
        inv: dict[str, list[str]] = {}
        for name in os.listdir(self.root):
            d = os.path.join(self.root, name)
            if name == "frontier" or not os.path.isdir(d):
                continue
            files = sorted(
                f for f in os.listdir(d)
                if f.endswith(".parquet") and os.path.isfile(os.path.join(d, f))
            )
            if files:
                inv[name] = files
        return inv

    def commit_round(self, round_no: int, budget_state: dict, extra: dict | None = None) -> None:
        manifest = {
            "round_no": round_no,
            "snapshot": f"round_{round_no}",
            "budget_state": budget_state,
            "legacy_files": self._legacy_inventory(),
            **(extra or {}),
        }
        self._commit_manifest(manifest)
