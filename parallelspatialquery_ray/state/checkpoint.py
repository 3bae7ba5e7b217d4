"""Generic resumable partitioned parquet sink for ANY Dataset.

The aknn pipeline's write-audit-publish pattern (state/manifest.py,
pipelines/aknn_pipeline.py) generalized to an arbitrary dataset + key
column: rows are hash-bucketed on the key, each bucket is written to its
own parquet directory ATOMICALLY (tmp dir + rename), and published to the
manifest only after the write succeeds.  A re-run skips published buckets
BEFORE the shuffle — completed partitions cost only the (streamed) read.

Never one giant file: at 100 TB the unit of retry is a bucket directory,
and ``num_buckets`` sizes that unit.  The manifest append is a single
O_APPEND line per bucket (atomic for short writes on POSIX local/NFS
filesystems; swap Manifest for an object-store conditional put or a DB
table on a real cluster — the write-audit-publish contract is unchanged).

Reference analogue: the out-of-core commit of completed windows
(/root/reference/PlaneSweepParallel/include/AllKnnResultStripesParallelExternal.h:376-485).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashing import splitmix64
from ..stages.shuffle import sorted_block_reduce
from .manifest import Manifest


def _bucket_of(key: np.ndarray, num_buckets: int) -> np.ndarray:
    return (splitmix64(key.astype(np.uint64))
            % np.uint64(num_buckets)).astype(np.int64)


def checkpointed_write(ds: ray.data.Dataset, out_dir: str, *,
                       key_col: str, num_buckets: int = 64,
                       lineage: dict | None = None) -> pd.DataFrame:
    """Write ``ds`` to ``out_dir/parts/bucket=<b>/`` partitioned by the
    splitmix64 hash of ``key_col``, resumably.  Returns the per-bucket
    manifest records (bucket, rows_out, seconds, skipped) as a small
    DataFrame (≤ num_buckets rows).

    One streaming pass: completed buckets are dropped per batch before
    the shuffle (broadcast set), surviving rows range-shuffle on the
    bucket id, and the reducer — which by the sorted_block_reduce
    contract holds EVERY row of any bucket it sees — writes the bucket
    dir atomically and publishes one manifest line in-task.
    """
    man = Manifest(out_dir)
    done = set(man.completed())
    lineage = lineage or {}
    done_ref = ray.put(np.fromiter(done, np.int64, len(done)))

    def assign(b: pa.Table) -> pa.Table:
        key = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = _bucket_of(key, num_buckets)
        b = b.append_column("__bucket", pa.array(bk, pa.int64()))
        finished = ray.get(done_ref)
        if len(finished):
            b = b.filter(pa.array(~np.isin(bk, finished)))
        return b

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for bk, rows in g.groupby("__bucket", sort=True):
            t0 = time.monotonic()
            part = man.part_dir(int(bk))
            tmp = part + ".tmp"
            import shutil
            if os.path.exists(tmp):          # leftover from a dead task
                shutil.rmtree(tmp)
            if os.path.exists(part):         # renamed but never published
                shutil.rmtree(part)          # (crash window): rewrite
            os.makedirs(tmp, exist_ok=True)
            tbl = pa.Table.from_pandas(rows.drop(columns="__bucket"),
                                       preserve_index=False)
            pq.write_table(tbl, os.path.join(tmp, "data.parquet"))
            os.rename(tmp, part)             # atomic publish of the files
            secs = time.monotonic() - t0
            man.publish(int(bk), rows_in=len(rows), rows_out=len(rows),
                        seconds=secs, lineage=lineage)
            recs.append({"bucket": int(bk), "rows_out": len(rows),
                         "seconds": round(secs, 4), "skipped": False})
        return pd.DataFrame(recs, columns=["bucket", "rows_out",
                                           "seconds", "skipped"])

    written = sorted_block_reduce(
        ds.map_batches(assign, batch_format="pyarrow"),
        "__bucket", write_bucket).to_pandas()
    prior = pd.DataFrame(
        [{"bucket": b, "rows_out": r["rows_out"], "seconds": 0.0,
          "skipped": True} for b, r in man.completed().items()
         if b in done], columns=["bucket", "rows_out", "seconds",
                                 "skipped"])
    out = pd.concat([written, prior], ignore_index=True)
    return out.sort_values("bucket").reset_index(drop=True)


def read_checkpointed(out_dir: str) -> ray.data.Dataset:
    """Read back a checkpointed_write output (published buckets only)."""
    man = Manifest(out_dir)
    files = []
    for _, r in sorted(man.completed().items()):
        files.extend(sorted(
            os.path.join(r["uri"], f) for f in os.listdir(r["uri"])
            if f.endswith(".parquet")))
    # partitioning=None: the bucket=<b> dir name is a retry unit, not a
    # hive partition column of the logical table
    return ray.data.read_parquet(files, partitioning=None)
