"""Shared shuffle pattern: range-partition by high-cardinality key(s), then
reduce whole blocks.

``sort(keys)`` range-partitions the dataset; one key tuple is never split
across output blocks (the invariant Ray's own ``map_groups`` relies on), so
a ``map_batches(batch_size=None)`` reducer sees every row of any group it
sees at all — and can reduce MANY groups per call with vectorized
pandas/numpy instead of paying per-group Python dispatch.  This is the
engine's standard wide-operator shape (SURVEY.md §7.3); the kNN stage uses
it directly, the helpers below give it to the other operators.

Caveat: a single group must stay under ``target_max_block_size`` (else Ray
could split the block mid-group).  All call sites bound group size by
construction (hot-cell sub-stripes, per-query k rows, per-bucket candidate
sets).
"""

from __future__ import annotations

import ray
import ray.data


def default_concurrency(lo: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: ``(lo, #CPUs)``.

    A fixed upper bound (round 1 used ``(1, 8)`` everywhere) leaves a
    32-CPU node 75% idle in actor-pool stages and is a fixed-size
    bottleneck on any larger cluster; the pool still starts at ``lo`` so
    tiny inputs don't pay dozens of actor startups."""
    try:
        hi = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - ray not initialised
        hi = 8
    return (lo, max(8, hi))


def sorted_block_reduce(ds: ray.data.Dataset, keys, fn, *,
                        batch_format: str = "pandas") -> ray.data.Dataset:
    """Shuffle by ``keys`` and apply ``fn`` to whole co-located blocks.

    ``fn`` receives a batch that contains ALL rows of every key group it
    contains (possibly many groups); it must group internally (vectorized
    ``DataFrame.groupby`` / ``np.unique`` slicing)."""
    if isinstance(keys, str):
        keys = [keys]

    def guarded(batch):
        ncols = (batch.num_columns if hasattr(batch, "num_columns")
                 else batch.shape[1])
        if len(batch) == 0 or ncols == 0:
            # empty/columnless range partitions reach the reducer
            return batch
        return fn(batch)

    return ds.sort(keys).map_batches(guarded, batch_format=batch_format,
                                     batch_size=None)
