"""parallelspatialquery_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query capabilities of
thcristo/ParallelSpatialQuery (the all-k-nearest-neighbors join of 2-D point
sets, reference: /root/reference/PlaneSweepParallel) re-expressed Ray-Data-first:

- points live in ``ray.data.Dataset``s whose blocks are Arrow tables,
- the reference's y-stripe decomposition becomes a Morton (Z-order) cell index
  (:mod:`~parallelspatialquery_ray.functions.grid`) used as an explicit
  ``groupby`` shuffle key with a one-cell halo,
- the per-stripe plane sweep becomes a vectorized numpy kernel inside
  ``groupby(cell).map_groups`` (:mod:`~parallelspatialquery_ray.stages.sweep`),
- the reference's out-of-core "pending point" carryover
  (AllKnnResultStripesParallelExternal.h:470-475) becomes a second-pass
  broadcast escalation for queries whose kth distance exceeds their halo
  coverage (:mod:`~parallelspatialquery_ray.stages.knn`).

Beyond the reference, the engine carries point-in-polygon joins, raster<->vector
tile assignment, dedup / similarity / text-analysis operators for
training-data pipelines, and a checkpoint manifest for resumable runs.
"""

__version__ = "0.1.0"

# Silence Ray Data's per-dead-bundle empty-schema warning (and ONLY that
# variant — see _logfilter's docstring for the root cause and why the dead
# blocks can't be normalized in user code).  Installed at import so every
# surface (library use, CLI, bench, driver entry) is covered; ray itself is
# NOT imported here.  Opt out for co-hosted non-engine pipelines with
# PSQ_RAY_KEEP_DEAD_BLOCK_WARNINGS=1 or
# _logfilter.uninstall_dead_block_warning_filter().
from ._logfilter import install_dead_block_warning_filter as _install_dbf

_install_dbf()

# Shuffle strategy note: the engine keeps Ray Data's default SORT-based
# shuffle.  Ray's hash-shuffle strategy was evaluated for the kNN cell
# shuffle and rejected: its per-operator aggregator actor pools oversubscribe
# small ray.init(num_cpus=...) sessions and can deadlock behind other actor
# pools (observed: pipelines stalled for minutes at num_cpus=4).  Instead,
# wide stages shuffle via sort on HIGH-cardinality keys — range partitioning
# never splits one key value across output blocks (the same invariant Ray's
# own map_groups relies on), and high cardinality keeps ranges balanced.
# See stages/knn.py for the partition-batched kernel pattern.
