"""Capped-object-store completion record at scale (reference external-mode
headline analogue: bin/Release/run_bindata500M.cmd runs the out-of-core
500M x 500M self-join; here the streaming executor + spill plays the role
of the reference's window/RAM-budget machinery).

Runs the flagship ``aknn_join`` self-join over N synthetic points in a
SUBPROCESS whose Ray object store is capped at GRAFT_OBJ_STORE_GB
(default 2 GiB — orders of magnitude below the routed footprint), and
consumes the result with a DISTRIBUTED order-independent wrap-sum
checksum (same kernel as tools/resume_record.py) — no parquet write, no
driver materialization, so the only disk pressure is Ray's own spill.
Records wall time, rows, docs/sec, the checksum, and the raylet spill
lines as evidence that the run really exceeded the store.

Usage: python tools/membudget_record.py [n_points] [k]
Writes one JSON line to stdout; run it calm-host (no concurrent bench).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
STORE_GB = float(os.environ.get("GRAFT_OBJ_STORE_GB", "2.0"))

_CHILD = r"""
import json, os, sys
import numpy as np, pyarrow as pa
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR",
         object_store_memory=int(float(sys.argv[3]) * (1 << 30)))
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from bench import _build_points
from parallelspatialquery_ray.functions.hashing import splitmix64
from parallelspatialquery_ray.stages.knn import aknn_join

n, k = int(sys.argv[1]), int(sys.argv[2])
ds = _build_points("/root/testdata/sf0.1", n)
res = aknn_join(ds, ds, k, n_training=n, sort_output=False)

def part(b: pa.Table) -> pa.Table:
    iid = b["input_id"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    rk = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    nid = b["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    dd = b["distance_sq"].to_numpy(zero_copy_only=False).view(np.uint64)
    with np.errstate(over="ignore"):
        h = splitmix64(iid * np.uint64(0x9E3779B97F4A7C15)
                       ^ splitmix64(rk ^ splitmix64(nid ^ dd)))
        s = np.sum(h, dtype=np.uint64)
    return pa.table({"s": pa.array([s.view(np.int64)], pa.int64()),
                     "n": pa.array([len(b)], pa.int64())})

agg = res.map_batches(part, batch_format="pyarrow").to_pandas()
total = int(np.sum(agg["s"].to_numpy().view(np.uint64), dtype=np.uint64))
print("RESULT " + json.dumps({"rows": int(agg["n"].sum()),
                              "checksum": total}))
ray.shutdown()
"""


def main() -> None:
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, str(N_POINTS), str(K), str(STORE_GB)],
        capture_output=True, text=True)
    sec = round(time.perf_counter() - t0, 3)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(f"child failed rc={p.returncode}")
    result = None
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is None:
        raise SystemExit("no RESULT line in child output")
    spill = [ln.strip() for ln in (p.stdout + p.stderr).splitlines()
             if re.search(r"Spilled \d+ MiB", ln)]
    rec = {
        "metric": "aknn under capped object store",
        "n_points": N_POINTS, "k": K,
        "object_store_gb": STORE_GB, "num_cpus": 32,
        "sec": sec, "rows_out": result["rows"],
        "checksum": result["checksum"],
        "docs_per_sec": round(N_POINTS / sec, 1),
        "spill": spill[-3:],
        "note": ("reference run_bindata500M.cmd analogue: "
                 f"{N_POINTS // 1_000_000}M x {N_POINTS // 1_000_000}M "
                 f"self kNN k={K} under a {STORE_GB} GiB object store; "
                 "streamed checksum consumer, no output write, spill only."),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
