"""Checkpoint manifest: per-partition lineage + metrics, resumable runs.

The north_rule requires every stage to emit per-partition lineage and
row-count/latency metrics to a checkpoint manifest so an interrupted run
resumes from completed cell partitions.  The reference's closest analogue
is the out-of-core commit of completed windows
(/root/reference/PlaneSweepParallel/include/AllKnnResultStripesParallelExternal.h:376-485)
plus its per-run stats CSV (src/PlaneSweepParallel.cpp:296-306).

Design: write-audit-publish.  Each partition's output is written to its own
parquet directory under ``<out_dir>/parts/bucket=<id>/``; only after the
write succeeds is a record appended to ``<out_dir>/manifest.jsonl`` (the
publish step — an atomic single-line append).  Resume = read the manifest,
skip completed bucket ids.  The manifest line carries the lineage
(input fingerprint, parameters), metrics (rows in/out, wall seconds) and
the output URI.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)

    def completed(self) -> dict[int, dict]:
        """bucket id -> manifest record for every published partition."""
        done: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        done[rec["bucket"]] = rec
        return done

    def part_dir(self, bucket: int) -> str:
        return os.path.join(self.out_dir, "parts", f"bucket={bucket}")

    def publish(self, bucket: int, *, rows_in: int, rows_out: int,
                seconds: float, lineage: dict) -> None:
        rec = {
            "status": "done", "bucket": int(bucket),
            "rows_in": int(rows_in), "rows_out": int(rows_out),
            "seconds": round(float(seconds), 4),
            "uri": self.part_dir(bucket),
            "lineage": lineage,
            "published_at": time.time(),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def write_run_meta(self, meta: dict) -> None:
        with open(os.path.join(self.out_dir, "run_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)

    def read_run_meta(self) -> dict | None:
        p = os.path.join(self.out_dir, "run_meta.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None
