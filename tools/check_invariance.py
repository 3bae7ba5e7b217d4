"""Parallelism-invariance check (SURVEY.md §5): the all-kNN result must be
bit-identical across ray.init(num_cpus=...) levels, run in FRESH processes.

Usage: python tools/check_invariance.py [n_points] [cpu_levels...]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

CHILD = r'''
import hashlib, json, os, sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import numpy as np, pyarrow as pa
import ray.data as rd
sys.path.insert(0, os.getcwd())  # subprocess cwd = repo root
from parallelspatialquery_ray.sources import synth
from parallelspatialquery_ray.stages.knn import aknn_join

n = int(sys.argv[2])
def to_pts(b):
    pid = b["id"].to_numpy().astype(np.int64)
    x, y = synth.derive_points(pid)
    return pa.table({"doc_id": pa.array(pid), "x": pa.array(x),
                     "y": pa.array(y)})
pts = rd.range(n).map_batches(to_pts, batch_format="pyarrow")
df = aknn_join(pts, pts, 10, n_training=n).to_pandas()
h = hashlib.sha256()
h.update(df["input_id"].to_numpy().tobytes())
h.update(df["rank"].to_numpy().tobytes())
h.update(df["neighbor_id"].to_numpy(dtype=np.int64).tobytes())
h.update(df["distance_sq"].to_numpy().tobytes())
print(json.dumps({"cpus": int(sys.argv[1]), "rows": len(df),
                  "sha256": h.hexdigest()}))
ray.shutdown()
'''


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    levels = [int(c) for c in sys.argv[2:]] or [2, 8]
    child = os.path.join("/tmp", "psq_invariance_child.py")
    with open(child, "w") as f:
        f.write(CHILD)
    results = []
    for c in levels:
        out = subprocess.run([sys.executable, child, str(c), str(n)],
                             capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        print(rec)
        results.append(rec)
    hashes = {r["sha256"] for r in results}
    ok = len(hashes) == 1
    print(json.dumps({"invariant": ok, "n_points": n, "levels": levels}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
