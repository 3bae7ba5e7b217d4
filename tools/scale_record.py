"""200M-class external-kNN completion record: compact sink + capped object
store + mid-run SIGKILL + (possibly multi-attempt) resume.

Reference analogue: bin/Release/run_bindata500M.cmd — the out-of-core
500M x 500M self-join whose windows commit to an external result vector.
Here each exchange bucket commits a COMPACT parquet partition
(uint32 id, int8 rank, uint32 neighbor, float32 distance — 13 B/row,
see pipelines/aknn_pipeline._compact_encode) under a write-audit-publish
manifest, so the committed result never transits the object store and the
only spill pressure is the pass-1 exchange itself.  Resume prunes rows
bound for already-published buckets BEFORE the exchange (the resume
ratchet), so even a disk-guard death mid-run converges across attempts.

Phases:
1. start the run in a subprocess (object store capped at
   GRAFT_OBJ_STORE_GB, default 2 GiB), SIGKILL the process group once
   >= GRAFT_KILL_MIN_BUCKETS buckets are published + kill_after_s;
2. resume in fresh subprocesses until the run completes (attempts
   capped), recording per-attempt published-bucket progress and proving
   published partitions are never recomputed (mtime equality);
3. checksum: distributed order-independent wrap-sum over the STORED
   compact encoding (decode=False) + row count + on-disk result bytes.

Disk availability is sampled throughout; the minimum observed is the
headroom evidence for the ceiling analysis in BENCH/.

Usage: python tools/scale_record.py [n_points] [kill_after_s]
Writes one JSON line to stdout; run calm-host (no concurrent bench).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import signal
import subprocess
import sys
import threading
import time

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
KILL_AFTER = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
OUT_DIR = os.environ.get("GRAFT_SCALE_DIR", "/tmp/psq_scale_record")
K = 10
MAX_RESUME_ATTEMPTS = int(os.environ.get("GRAFT_SCALE_ATTEMPTS", "4"))

_CHILD = r"""
import os, sys
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
wave = os.environ.get("GRAFT_WAVE_BUCKETS")
ds = _build_points("/root/testdata/sf0.1", n)
summary = run_aknn(ds, ds, 10, out, n_training=n, resume=True,
                   compact=True,
                   max_wave_buckets=int(wave) if wave else None)
print("SUMMARY " + repr(summary))
ray.shutdown()
"""


class DiskWatch(threading.Thread):
    """Min observed free space across the spill filesystem (/tmp) AND the
    result filesystem (OUT_DIR's mount — may differ via GRAFT_SCALE_DIR);
    the headroom evidence must cover whichever mount is the binding one."""

    def __init__(self):
        super().__init__(daemon=True)
        self.paths = ["/tmp", os.path.dirname(OUT_DIR) or "/"]
        self.min_avail_gb = self._sample()
        self.stop = False

    def _sample(self) -> float:
        return min(shutil.disk_usage(p).free for p in self.paths) / (1 << 30)

    def run(self):
        while not self.stop:
            self.min_avail_gb = min(self.min_avail_gb, self._sample())
            time.sleep(5.0)


def _clean_dead_sessions() -> None:
    """A SIGKILLed leg orphans its spill files (Ray only reclaims them on
    clean shutdown) — tens of GB that would silently shrink the next
    attempt's budget.  Children run serially, so between children every
    session dir is dead and safe to delete."""
    import glob
    roots = [os.path.join(os.environ.get("RAY_TMPDIR", "/tmp/ray"), "ray"),
             os.environ.get("RAY_TMPDIR", "/tmp/ray")]
    for root in roots:
        for d in glob.glob(os.path.join(root, "session_*")):
            if not os.path.islink(d):
                shutil.rmtree(d, ignore_errors=True)


def child(n: int, out: str, log: str) -> subprocess.Popen:
    _clean_dead_sessions()
    return subprocess.Popen(
        [sys.executable, "-c", _CHILD, str(n), out],
        stdout=open(log, "a"), stderr=subprocess.STDOUT,
        start_new_session=True)


def manifest_buckets(out_dir: str) -> dict[int, float]:
    path = os.path.join(out_dir, "manifest.jsonl")
    if not os.path.exists(path):
        return {}
    got = {}
    for line in open(path):
        r = json.loads(line)
        b = r.get("bucket")
        if b is None:
            continue
        d = os.path.join(out_dir, "parts", f"bucket={b}")
        if os.path.isdir(d):
            got[b] = os.path.getmtime(d)
    return got


def manifest_core_seconds(out_dir: str) -> float:
    s = 0.0
    for line in open(os.path.join(out_dir, "manifest.jsonl")):
        s += json.loads(line).get("seconds", 0.0)
    return round(s, 1)


def checksum_compact(out_dir: str) -> dict:
    code = f"""
import json, sys
import numpy as np, pyarrow as pa
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from parallelspatialquery_ray.functions.hashing import splitmix64
from parallelspatialquery_ray.pipelines.aknn_pipeline import load_result
res = load_result({out_dir!r}, decode=False)

def part(b: pa.Table) -> pa.Table:
    iid = b["input_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    rk = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    nid = b["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    dd = b["distance_sq"].to_numpy(zero_copy_only=False).view(np.uint32).astype(np.uint64)
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


def du_gb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return round(total / (1 << 30), 2)


def main() -> None:
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    log = "/tmp/psq_scale_record_child.log"
    open(log, "w").close()
    watch = DiskWatch()
    watch.start()
    min_buckets = int(os.environ.get("GRAFT_KILL_MIN_BUCKETS", "20"))

    t0 = time.perf_counter()
    p = child(N_POINTS, OUT_DIR, log)
    armed_at = None
    finished_without_kill = False
    while True:
        if p.poll() is not None:
            finished_without_kill = True
            break
        if armed_at is None:
            if len(manifest_buckets(OUT_DIR)) >= min_buckets:
                armed_at = time.time()
        elif time.time() - armed_at >= KILL_AFTER:
            break
        time.sleep(2.0)
    if not finished_without_kill:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
    t_killed = round(time.perf_counter() - t0, 1)
    pre = manifest_buckets(OUT_DIR)

    attempts = []
    t1 = time.perf_counter()
    done = finished_without_kill and p.returncode == 0
    while not done and len(attempts) < MAX_RESUME_ATTEMPTS:
        before = len(manifest_buckets(OUT_DIR))
        rc = child(N_POINTS, OUT_DIR, log)
        rc.wait()
        after = len(manifest_buckets(OUT_DIR))
        attempts.append({"rc": rc.returncode, "published_before": before,
                         "published_after": after})
        done = rc.returncode == 0
    t_resume = round(time.perf_counter() - t1, 1)
    if not done:
        tail = open(log).read()[-3000:]
        print(json.dumps({"metric": "scale record FAILED",
                          "n_points": N_POINTS,
                          "attempts": attempts,
                          "min_avail_gb": round(watch.min_avail_gb, 2),
                          "log_tail": tail}))
        raise SystemExit(1)

    post = manifest_buckets(OUT_DIR)
    reused = [b for b in pre if b in post and post[b] == pre[b]]
    ck = checksum_compact(OUT_DIR)
    watch.stop = True
    spill = [ln.strip() for ln in open(log)
             if re.search(r"Spilled \d+ MiB", ln)]

    rec = {
        "metric": ("external aknn completion record — compact sink, "
                   "capped store, SIGKILL + resume"),
        "n_points": N_POINTS, "k": K,
        "object_store_gb": float(os.environ.get("GRAFT_OBJ_STORE_GB",
                                                "2.0")),
        "num_cpus": 32,
        "compact_encoding": "uint32/int8/uint32/float32 (13 B/row)",
        "sec_until_kill": t_killed, "kill_after_s": KILL_AFTER,
        "killed_mid_run": not finished_without_kill,
        "buckets_published_before_kill": len(pre),
        "buckets_total": len(post),
        "buckets_reused_not_recomputed": len(reused),
        "resume_attempts": attempts,
        "sec_resume_to_completion": t_resume,
        "sec_total": round(time.perf_counter() - t0, 1),
        "rows_out": ck["rows"], "checksum_compact": ck["checksum"],
        "result_parquet_gb": du_gb(os.path.join(OUT_DIR, "parts")),
        "manifest_core_seconds": manifest_core_seconds(OUT_DIR),
        "min_disk_avail_gb": round(watch.min_avail_gb, 2),
        "spill": spill[-3:],
        "note": ("reference run_bindata500M.cmd analogue; committed "
                 "result bypasses the object store (parquet sink), "
                 "resume prunes published buckets before the exchange"),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
