"""Mid-run SIGKILL + resume record at scale (reference external-mode
analogue: the out-of-core commit protocol of
AllKnnResultStripesParallelExternal.h survives interruption; here the
bucket manifest does).

Phase 1 runs the checkpointed all-kNN pipeline (pipelines/aknn_pipeline)
over N synthetic points in a SUBPROCESS and SIGKILLs the whole process
group partway through bucket publication — a real crash, not a test hook.
Phase 2 resumes in a fresh process: published buckets must be skipped
(manifest reuse, verified by file mtimes), and the finished result must
equal a straight ``aknn_join`` run bit-for-bit, compared via an
order-independent wrap-sum checksum over (input_id, rank, neighbor_id,
distance_sq bits) computed distributedly — no driver materialization of
the billion-row result.

Usage: python tools/resume_record.py [n_points] [kill_after_s]
Writes one JSON line to stdout; run it calm-host (no concurrent bench).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
KILL_AFTER = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
OUT_DIR = os.environ.get("GRAFT_RESUME_DIR", "/tmp/psq_resume_record")
K = 10

_CHILD = r"""
import os, sys, time
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR",
         object_store_memory=int(float(os.environ.get(
             "GRAFT_OBJ_STORE_GB", "2.0")) * (1 << 30)))
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from bench import _build_points
from parallelspatialquery_ray.pipelines.aknn_pipeline import run_aknn

n = int(sys.argv[1]); out = sys.argv[2]
ds = _build_points("/root/testdata/sf0.1", n)
summary = run_aknn(ds, ds, 10, out, n_training=n, resume=True)
print("SUMMARY " + repr(summary))
ray.shutdown()
"""


def child_cmd(n: int, out: str) -> list[str]:
    return [sys.executable, "-c", _CHILD, str(n), out]


def manifest_buckets(out_dir: str) -> dict[int, float]:
    """bucket -> publish mtime of its parts dir."""
    path = os.path.join(out_dir, "manifest.jsonl")
    if not os.path.exists(path):
        return {}
    got = {}
    for line in open(path):
        r = json.loads(line)
        b = r.get("bucket")
        if b is None or b < 0:
            continue
        d = os.path.join(out_dir, "parts", f"bucket={b}")
        if os.path.isdir(d):
            got[b] = os.path.getmtime(d)
    return got


def checksum_and_count(load_expr: str) -> dict:
    """Run a fresh process that computes (rows, wrap-sum checksum) of a
    kNN result dataset produced by `load_expr` (python source yielding a
    Dataset named `res`)."""
    code = f"""
import os, sys, json
import numpy as np, pyarrow as pa
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from bench import _build_points
from parallelspatialquery_ray.functions.hashing import splitmix64
{load_expr}

def part(b: pa.Table) -> pa.Table:
    iid = b["input_id"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    rk = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    nid = b["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    dd = b["distance_sq"].to_numpy(zero_copy_only=False).view(np.uint64)
    with np.errstate(over="ignore"):
        h = splitmix64(iid * np.uint64(0x9E3779B97F4A7C15)
                       ^ splitmix64(rk ^ splitmix64(nid ^ dd)))
        s = np.sum(h, dtype=np.uint64)
    return pa.table({{"s": pa.array([s.view(np.int64)], pa.int64()),
                      "n": pa.array([len(b)], pa.int64())}})

agg = res.map_batches(part, batch_format="pyarrow").to_pandas()
total = int(np.sum(agg["s"].to_numpy().view(np.uint64), dtype=np.uint64))
print(json.dumps({{"rows": int(agg["n"].sum()), "checksum": total}}))
ray.shutdown()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    import shutil
    shutil.rmtree(OUT_DIR, ignore_errors=True)

    # phase 1: start, then SIGKILL the process group MID-PUBLICATION —
    # the kill is armed only once the manifest shows >=KILL_MIN_BUCKETS
    # published buckets (plus KILL_AFTER extra seconds), so it always
    # lands with work both behind and ahead of it
    min_buckets = int(os.environ.get("GRAFT_KILL_MIN_BUCKETS", "3"))
    t0 = time.perf_counter()
    p = subprocess.Popen(child_cmd(N_POINTS, OUT_DIR),
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL,
                         start_new_session=True)
    armed_at = None
    while True:
        if p.poll() is not None:
            raise SystemExit(
                "run finished before the kill armed — raise n_points or "
                "lower GRAFT_KILL_MIN_BUCKETS for a mid-run kill")
        if armed_at is None:
            if len(manifest_buckets(OUT_DIR)) >= min_buckets:
                armed_at = time.time()
        elif time.time() - armed_at >= KILL_AFTER:
            break
        time.sleep(1.0)
    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait()
    t_killed = round(time.perf_counter() - t0, 1)
    pre = manifest_buckets(OUT_DIR)
    if not pre:
        raise SystemExit("kill landed before any bucket published — "
                         "raise kill_after")

    # phase 2: resume in a fresh process; published buckets must survive
    # untouched (mtime equality proves no recompute)
    t1 = time.perf_counter()
    out = subprocess.run(child_cmd(N_POINTS, OUT_DIR), capture_output=True,
                         text=True, check=True)
    t_resume = round(time.perf_counter() - t1, 1)
    post = manifest_buckets(OUT_DIR)
    reused = [b for b in pre if b in post and post[b] == pre[b]]

    # phase 3: checksums — resumed result vs straight aknn_join
    ck_res = checksum_and_count(
        "from parallelspatialquery_ray.pipelines.aknn_pipeline import "
        f"load_result\nres = load_result({OUT_DIR!r})")
    t2 = time.perf_counter()
    ck_inline = checksum_and_count(
        f"from parallelspatialquery_ray.stages.knn import aknn_join\n"
        f"ds = _build_points('/root/testdata/sf0.1', {N_POINTS})\n"
        f"res = aknn_join(ds, ds, {K}, n_training={N_POINTS}, "
        f"sort_output=False)")
    t_inline = round(time.perf_counter() - t2, 1)

    rec = {
        "metric": "mid-run SIGKILL + resume equality at scale",
        "n_points": N_POINTS, "k": K,
        "kill_after_s": KILL_AFTER, "sec_until_kill": t_killed,
        "buckets_published_before_kill": len(pre),
        "buckets_total": len(post),
        "buckets_reused_not_recomputed": len(reused),
        "sec_resume_leg": t_resume, "sec_inline_reference": t_inline,
        "rows_resumed": ck_res["rows"], "rows_inline": ck_inline["rows"],
        "checksum_resumed": ck_res["checksum"],
        "checksum_inline": ck_inline["checksum"],
        "equal": (ck_res["rows"] == ck_inline["rows"]
                  and ck_res["checksum"] == ck_inline["checksum"]
                  and len(reused) == len(pre)),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
