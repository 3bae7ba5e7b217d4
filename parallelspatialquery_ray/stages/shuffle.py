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

Empty-block caveat (Ray 2.49, measured): ``sort`` materializes EMPTY range
partitions as zero-row blocks with an EMPTY schema, and every downstream
``map_batches`` passes them through untouched (the UDF is never invoked on
an empty input block), so the streaming executor logs "RefBundle with a
different schema" warnings and any raw-block consumer (``to_arrow_refs``)
sees columnless tables.  The engine's own batch fns always return
schema-carrying empties (which are harmless); the columnless ones cannot
be suppressed at the source without an extra repartition pass per shuffle
or a global hash-shuffle strategy switch, so instead every raw-block
consumer filters through :func:`live_tables` and every post-sort reducer
passes dead blocks through (``sorted_block_reduce``'s ``guarded``).
"""

from __future__ import annotations

import ray
import ray.data


def live_tables(tbls, *required_cols):
    """Drop Ray's dead blocks from a raw ``to_arrow_refs`` fetch: zero-row
    blocks and the schema-less empties ``sort`` emits for empty range
    partitions (see module docstring).  ``required_cols`` (optional)
    additionally drops blocks missing the routed columns — use it when a
    mixed union can deliver foreign schemas.  Always check the result for
    emptiness before ``pa.concat_tables`` (it raises on an empty list)."""
    return [t for t in tbls
            if t.num_rows and all(c in t.column_names
                                  for c in required_cols)]


# Re-export: the filter lives ray-free in _logfilter so the package __init__
# can install it without importing ray; it belongs conceptually here (the
# dead blocks it silences are this module's documented sort artifact).
from .._logfilter import install_dead_block_warning_filter  # noqa: F401

_WORKER_STATE: "OrderedDict" = None  # lazy init (collections)
_WORKER_STATE_CAP = 8


def worker_state(key, build):
    """Per-worker-process memo for broadcast-derived stage state.

    Gives actor-pool-style amortization (state built once per worker
    process, reused across that worker's tasks and batches) while keeping
    the stage a plain TASK ``map_batches`` — plain tasks fuse with the
    upstream operator into one pipeline stage and scale elastically with
    block count, where an actor pool breaks fusion and pays scale-up ramp
    (measured on PIP over 4.8M points under load: fused task map 0.8–3.6s
    vs actor pool 4.2–5.8s).  Use for CHEAP state (a plasma ``ray.get`` is
    zero-copy; bbox arrays, compiled regexes); keep true actor pools for
    genuinely expensive per-worker state.  LRU-capped so long sessions
    don't accumulate stale state (cache keys holding ObjectRefs also pin
    their plasma objects until eviction)."""
    global _WORKER_STATE
    if _WORKER_STATE is None:
        from collections import OrderedDict
        _WORKER_STATE = OrderedDict()
    try:
        s = _WORKER_STATE.pop(key)
    except KeyError:
        s = build()
    _WORKER_STATE[key] = s
    while len(_WORKER_STATE) > _WORKER_STATE_CAP:
        _WORKER_STATE.popitem(last=False)
    return s


def stage_task(cls):
    """Task-map wrapper for a broadcast-state stage class: the instance is
    memoized per worker process (:func:`worker_state`), so plain tasks get
    actor-style state reuse AND fuse with the upstream operator.  Use as
    ``ds.map_batches(stage_task(Cls), fn_kwargs=dict(_args=(...)))`` with
    hashable constructor args."""
    def f(b, *, _args):
        fn = worker_state((cls.__name__,) + _args, lambda: cls(*_args))
        return fn(b)
    f.__name__ = f"{cls.__name__}_task"
    return f


def default_concurrency(lo: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster:
    ``(max(lo, #CPUs // 8), max(8, #CPUs))``.

    A fixed upper bound (round 1 used ``(1, 8)`` everywhere) leaves a
    32-CPU node 75% idle in actor-pool stages and is a fixed-size
    bottleneck on any larger cluster.  The floor scales with the cluster
    too: autoscaling up from 1 actor ramps slower than short stages finish
    (measured: PIP over 4.8M points at (1, 32) = 8.4s vs (4, 32) = 4.8s),
    while small clusters keep a floor of ``lo`` so tiny inputs don't pay
    dozens of actor startups."""
    try:
        hi = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - ray not initialised
        hi = 8
    return (max(lo, hi // 8), max(8, hi))


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
