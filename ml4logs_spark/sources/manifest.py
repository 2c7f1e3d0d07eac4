"""Checkpoint manifest: per-stage lineage + metrics, idempotent commits.

The reference's resumability is "skip if the output file exists"
(/root/reference/src/ml4logs/data/utils.py:23-25, __main__.py:47-49).
The distributed analog (north rule): every stage commit appends a
manifest record keyed by (stage, sink, input_fingerprint); a rerun
skips stages whose key already has a committed record AND whose sink is
committed on disk — so a killed run resumes from the last committed
stage, and already-committed sinks are never rewritten.

The manifest is JSONL next to the warehouse (tiny, driver-side — the
analog of an Iceberg snapshot log; with Iceberg present the snapshot id
would be recorded instead of the _COMMITTED marker). Each record also
carries per-partition lineage: row counts per routed partition, wall
time, and the input fingerprint, satisfying "checkpoints per-partition
lineage and metrics to a manifest table".
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ml4logs_spark.sources.tables import Warehouse


def input_fingerprint(paths: list[str]) -> str:
    """Cheap deterministic fingerprint of input state: file names+sizes."""
    import hashlib

    h = hashlib.md5()
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _, files in sorted(os.walk(p)):
                for f in sorted(files):
                    if f.startswith(("_", ".")):
                        continue
                    fp = os.path.join(root, f)
                    h.update(f"{fp}:{os.path.getsize(fp)}".encode())
        elif os.path.exists(p):
            h.update(f"{p}:{os.path.getsize(p)}".encode())
    return h.hexdigest()


@dataclass
class Manifest:
    warehouse: Warehouse
    records: list[dict] = field(default_factory=list)

    @property
    def path(self) -> str:
        return os.path.join(self.warehouse.root, "_manifest.jsonl")

    def load(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _append(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def committed(self, stage: str, sink: str, fingerprint: str) -> bool:
        return any(
            r["stage"] == stage and r["sink"] == sink
            and r["input_fingerprint"] == fingerprint and r["status"] == "committed"
            for r in self.load()
        ) and self.warehouse.committed(sink)

    def run_stage(
        self,
        stage: str,
        sink: str,
        fingerprint: str,
        build: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        lineage_keys: list[str] | None = None,
    ) -> bool:
        """Build+commit one stage; returns False if skipped (resume hit).

        lineage_keys: columns whose per-value row counts are recorded as
        per-partition lineage in the manifest record.
        """
        if self.committed(stage, sink, fingerprint):
            return False
        t0 = time.perf_counter()
        df = build()
        self.warehouse.write(df, sink, partition_by=partition_by)
        out = self.warehouse.read(sink)
        row_count = out.count()
        lineage = None
        if lineage_keys:
            from pyspark.sql import functions as F

            lineage = {
                "/".join(str(v) for v in r[:-1]): r[-1]
                for r in out.groupBy(*lineage_keys)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        self._append({
            "stage": stage,
            "sink": sink,
            "input_fingerprint": fingerprint,
            "status": "committed",
            "row_count": row_count,
            "wall_ms": int((time.perf_counter() - t0) * 1000),
            "partition_lineage": lineage,
        })
        return True
