"""Distributed all-k-nearest-neighbors join on Ray Data.

The engine's flagship operator: for every point of an *input* (query) dataset,
the k nearest points of a *training* dataset under squared Euclidean distance
— the computation of the whole reference repo
(/root/reference/PlaneSweepParallel/src/PlaneSweepParallel.cpp), re-expressed
Ray-Data-first:

Pass 1 (cell + halo groupby — replaces the reference's stripe decomposition,
AllKnnResultStripes.h:189-307):

1. Project both sides to ``(id, x, y)`` — heavy payload columns (interleaved
   spans) never enter the shuffle (SURVEY.md §7.4 "wide rows").
2. Assign each query its Morton cell at resolution ``res``; route every training
   row to its own cell *and* every ring-1 neighbor cell whose halo rectangle
   (cell bounds ± ``halo_margin``·cell_width) contains it.  This halo
   duplication replaces the reference's cross-stripe probing in shared memory
   (PlaneSweepStripesParallelAlgorithm.h:103-136), which has no distributed
   analogue.
3. One ``union`` + ``groupby(group_key).map_groups`` — the single explicit
   hash/sort shuffle — runs the vectorized plane-sweep kernel
   (:mod:`.sweep`) per cell group.  Only the owning cell emits rows for its
   resident queries, so halo duplication can never duplicate results.
4. A query is *complete* iff its kth distance is strictly smaller than the
   squared distance to the nearest closed side of the group's covered
   rectangle — the 2-D form of the reference's ``dyBoundary² < kth`` stripe
   termination test (PlaneSweepStripesAlgorithm.h:103-112).  Strictness makes
   exact boundary ties escalate, keeping results partitioning-invariant.

Pass 2 (escalation — replaces the reference's out-of-core *pending point*
carryover, AllKnnResultStripesParallelExternal.h:470-475): the (normally tiny)
set of incomplete queries is broadcast via ``ray.put`` and swept against the
full training stream inside ``map_batches``; pass 1's kth distance is a sound
radius upper bound, so candidates with ``d <= ub`` contain the exact k-set.
A ``groupby(input_id)`` top-k merge finishes them.  No shuffle of the big
side is repeated.

Skew (clustered / Zipf inputs — the reference's equi-depth stripes +
dynamic scheduling, SURVEY.md §4): hot cells are split into equi-depth
y-sub-stripes via a small driver-side plan ``{cell_id: y_cuts}``; group keys
become ``cell_id * 256 + sub`` and halo rectangles shrink to the sub-stripe's
y-range ± margin.

Output schema (FIXTURES.md F6): ``input_id, rank(int32, 0..k-1 nearest
first), neighbor_id (null-padded when fewer than k training points exist —
the reference pads with DBL_MAX sentinels and prints NULL,
AllKnnResult.h:147-154), distance_sq (squared, AbstractAllKnnAlgorithm.h:159-165)``.
Ordering within a query: ascending ``(distance_sq, neighbor_id)`` — a
deterministic refinement of the reference's distance-only order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .shuffle import default_concurrency

from ..functions import grid
from ..functions.hashing import splitmix64 as _splitmix64
from .sweep import knn_topk, _MATRIX_BUDGET

_MAXSUB = 256  # max sub-stripes per hot cell; group_key = cell_id * 256 + sub




# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _id_rank(ids: np.ndarray) -> np.ndarray:
    """Rank of each element in ascending id order (tie-break total order)."""
    order = np.argsort(ids, kind="stable")
    rank = np.empty(len(ids), dtype=np.int64)
    rank[order] = np.arange(len(ids), dtype=np.int64)
    return rank


def _sub_for(cuts_by_cell: dict, cells: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Sub-stripe index per row (0 for non-hot cells)."""
    sub = np.zeros(len(cells), dtype=np.int64)
    if cuts_by_cell:
        for c, cuts in cuts_by_cell.items():
            m = cells == c
            if m.any():
                sub[m] = np.searchsorted(cuts, ys[m], side="right")
    return sub


def _sub_y_range(cell: int, sub: int, res: int, cuts_by_cell: dict
                 ) -> tuple[float, float]:
    _, y0, _, y1 = grid.cell_bounds(np.array([cell]), res)
    y0, y1 = float(y0[0]), float(y1[0])
    cuts = cuts_by_cell.get(cell) if cuts_by_cell else None
    if cuts is None or len(cuts) == 0:
        return y0, y1
    lo = y0 if sub == 0 else float(cuts[sub - 1])
    hi = y1 if sub >= len(cuts) else float(cuts[sub])
    return lo, hi


@ray.remote
def _merge_cell_counts(*tbls: pa.Table) -> pa.Table:
    """Exact-sum merge of (cell, n_) partial tables (tree-reduce node).
    Dead empty-schema blocks (possible in arbitrary upstream pipelines)
    are skipped."""
    tbls = [t for t in tbls if "cell" in t.column_names]
    if not tbls:
        return pa.table({"cell": pa.array([], pa.int64()),
                         "n_": pa.array([], pa.int64())})
    cells = np.concatenate([t["cell"].to_numpy(zero_copy_only=False)
                            for t in tbls])
    counts = np.concatenate([t["n_"].to_numpy(zero_copy_only=False)
                             for t in tbls])
    u, inv = np.unique(cells, return_inverse=True)
    s = np.zeros(len(u), dtype=np.int64)
    np.add.at(s, inv, counts)
    return pa.table({"cell": pa.array(u), "n_": pa.array(s)})


def _tree_merge_counts(refs: list, fanin: int = 16) -> pa.Table:
    while len(refs) > 1:
        refs = [_merge_cell_counts.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    return ray.get(refs[0]) if refs else pa.table(
        {"cell": pa.array([], pa.int64()), "n_": pa.array([], pa.int64())})


def detect_hot_cells(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
                     y_col: str = "y",
                     max_rows_per_group: int = 200_000) -> dict[int, int]:
    """Partition-stats pass: per-cell training counts, keeping only cells
    above the group budget — the skew detector feeding
    :func:`build_hot_plan` (the reference handles skew with equi-depth
    stripes, AllKnnResultStripes.h:189-307; we detect-then-split).

    Two-pass coarse-prefilter + raw-task tree merge, NO Dataset sort:

    1. counts at ``res - 3`` (64x fewer cells) are tree-reduced to the
       driver; a fine cell can only exceed the budget if its coarse
       parent does, so when no coarse cell does (every non-skewed
       workload) detection finishes after this one tiny pass.
    2. only when hot parents exist, a second pass counts fine cells
       INSIDE those parents (parent set broadcast via ray.put), again
       tree-reduced — table sizes stay ∝ skew, never ∝ grid size.

    The earlier implementation shipped every per-batch (cell, count)
    partial through a Dataset sort; under a tightly capped object store
    that sort triggered raylet object-loss/recovery loops (measured:
    5M-point detection hung indefinitely at a 2 GiB cap while this
    version runs in seconds).  Raw-task tree reduction is the same
    pattern the kNN exchange already proved at 100M points under a
    1 GiB store."""
    coarse_steps = min(res, 3)
    coarse_res = res - coarse_steps

    def partial_at(r: int, keep_ref=None):
        def f(b: pa.Table) -> pa.Table:
            c = grid.cell_id(b[x_col].to_numpy(zero_copy_only=False),
                             b[y_col].to_numpy(zero_copy_only=False), r)
            if keep_ref is not None:
                hot_parents = ray.get(keep_ref)
                keep = np.isin(grid.parent(c, coarse_steps), hot_parents)
                c = c[keep]
            cells, counts = np.unique(c, return_counts=True)
            return pa.table({"cell": pa.array(cells),
                             "n_": pa.array(counts.astype(np.int64))})
        return f

    def hot_of(tbl: pa.Table) -> dict[int, int]:
        cells = tbl["cell"].to_numpy(zero_copy_only=False)
        n = tbl["n_"].to_numpy(zero_copy_only=False)
        m = n > max_rows_per_group
        return dict(zip(cells[m].tolist(), n[m].tolist()))

    coarse = _tree_merge_counts(
        ds.map_batches(partial_at(coarse_res),
                       batch_format="pyarrow").to_arrow_refs())
    hot_parents = hot_of(coarse)
    if not hot_parents or coarse_steps == 0:
        return hot_parents if coarse_steps == 0 else {}

    keep_ref = ray.put(np.sort(np.fromiter(hot_parents, dtype=np.int64)))
    fine = _tree_merge_counts(
        ds.map_batches(partial_at(res, keep_ref),
                       batch_format="pyarrow").to_arrow_refs())
    return hot_of(fine)


def build_hot_plan(cell_counts: dict[int, int], res: int, k: int,
                   max_rows_per_group: int = 200_000) -> dict[int, np.ndarray]:
    """Equi-depth y-cuts for cells whose row count exceeds the group budget
    (the reference's equi-depth stripe split, AllKnnResultStripes.h:189-307,
    applied *within* a hot cell).  Cut positions are uniform y-quantile
    guesses refined later by the routing pass; uniform spacing inside the
    cell is sufficient because the plan only bounds group size, not
    correctness."""
    plan: dict[int, np.ndarray] = {}
    for cell, n in cell_counts.items():
        if n > max_rows_per_group:
            nsub = min(_MAXSUB, int(np.ceil(n / max_rows_per_group)))
            _, y0, _, y1 = grid.cell_bounds(np.array([cell]), res)
            cuts = np.linspace(float(y0[0]), float(y1[0]), nsub + 1)[1:-1]
            plan[int(cell)] = cuts
    return plan


# ---------------------------------------------------------------------------
# pass-1 stages
# ---------------------------------------------------------------------------

def _assign_queries(batch: pa.Table, *, res: int, cols: tuple[str, str, str],
                    hot_plan: dict) -> pa.Table:
    idc, xc, yc = cols
    x = batch[xc].to_numpy(zero_copy_only=False)
    y = batch[yc].to_numpy(zero_copy_only=False)
    cell = grid.cell_id(x, y, res)
    sub = _sub_for(hot_plan, cell, y)
    key = cell * _MAXSUB + sub
    return pa.table({
        "pid": batch[idc], "px": batch[xc], "py": batch[yc],
        "gkey": pa.array(key, pa.int64()),
        "role": pa.array(np.zeros(len(x), dtype=np.int8)),
    })


def _route_training(batch: pa.Table, *, res: int, cols: tuple[str, str, str],
                    hot_plan: dict, margin: float) -> pa.Table:
    """Halo duplication: emit one copy of each training row per group whose
    covered rectangle contains it (flat-map as a batch transform)."""
    idc, xc, yc = cols
    x = batch[xc].to_numpy(zero_copy_only=False)
    y = batch[yc].to_numpy(zero_copy_only=False)
    ids = batch[idc].to_numpy(zero_copy_only=False)
    cell = grid.cell_id(x, y, res)
    w = 1.0 / (1 << res)
    h = margin * w

    # enumerate out to ring ceil(margin) so the candidate set always covers
    # the halo rectangle (margin <= 1 keeps the reference-like single ring;
    # a larger margin needs a wider ring or points past ring 1 would be
    # silently dropped while pass 1 assumes they were routed)
    ring = max(1, int(np.ceil(margin)))
    src, ncell = grid.ring_neighbors(cell, res, ring)
    nx0, ny0, nx1, ny1 = grid.cell_bounds(ncell, res)
    px, py = x[src], y[src]
    inside = (px >= nx0 - h) & (px <= nx1 + h) & (py >= ny0 - h) & (py <= ny1 + h)
    src, ncell = src[inside], ncell[inside]
    py = y[src]

    if hot_plan:
        # Expand hot destination cells into their sub-stripes with a y check.
        out_src, out_key = [], []
        hot_cells = set(hot_plan)
        is_hot = np.isin(ncell, np.fromiter(hot_cells, dtype=np.int64))
        out_src.append(src[~is_hot])
        out_key.append(ncell[~is_hot] * _MAXSUB)
        hsrc, hcell, hy = src[is_hot], ncell[is_hot], py[is_hot]
        for c in np.unique(hcell):
            cuts = hot_plan[int(c)]
            m = hcell == c
            ms, my = hsrc[m], hy[m]
            _, y0, _, y1 = grid.cell_bounds(np.array([c]), res)
            edges = np.concatenate([[float(y0[0])], cuts, [float(y1[0])]])
            for s in range(len(edges) - 1):
                keep = (my >= edges[s] - h) & (my <= edges[s + 1] + h)
                out_src.append(ms[keep])
                out_key.append(np.full(int(keep.sum()), int(c) * _MAXSUB + s,
                                       dtype=np.int64))
        src = np.concatenate(out_src)
        key = np.concatenate(out_key)
    else:
        key = ncell * _MAXSUB

    take = pa.array(src)
    return pa.table({
        "pid": batch[idc].take(take), "px": batch[xc].take(take),
        "py": batch[yc].take(take),
        "gkey": pa.array(key, pa.int64()),
        "role": pa.array(np.ones(len(src), dtype=np.int8)),
    })


def _rect_bd_sq(qx: np.ndarray, qy: np.ndarray, rect, res: int) -> np.ndarray:
    """Squared distance from each query to the nearest *closed* side of the
    covered rectangle; sides at/past the domain boundary are open (nothing
    beyond them can exist) and drop out of the min — the 2-D generalization
    of the reference's stripe-boundary distance (dyLow/dyHigh,
    PlaneSweepStripesAlgorithm.h:84-101)."""
    x0, y0, x1, y1 = rect
    bd = np.full(len(qx), np.inf)
    if x0 > 0.0:
        bd = np.minimum(bd, qx - x0)
    if x1 < 1.0:
        bd = np.minimum(bd, x1 - qx)
    if y0 > 0.0:
        bd = np.minimum(bd, qy - y0)
    if y1 < 1.0:
        bd = np.minimum(bd, y1 - qy)
    bd = np.maximum(bd, 0.0)
    return bd * bd


def _make_partition_fn(k: int, res: int, hot_plan: dict, margin: float,
                       id_type: pa.DataType):
    """Per-PARTITION kernel: one sorted block holds many whole cell groups,
    so the Python/Arrow per-call overhead is amortized over
    dozens-to-hundreds of cells and the inner per-cell loop is numpy slicing
    only.  This mirrors the reference's dynamic scheduling of stripes onto
    threads (PlaneSweepStripesParallelAlgorithm.h:81-82) — a partition is a
    bag of cells, not a spatial region.

    Output is the slim 4-column result schema.  COMPLETE queries emit their
    k result rows; INCOMPLETE (pending) queries emit exactly ONE marker row
    ``rank = -1`` whose distance_sq carries the pass-1 kth upper bound —
    the Ray translation of the reference's pending-point carryover
    (AllKnnResultStripesParallelExternal.h:470-475).  Keeping the shuffled
    result at 4 columns (no qx/qy/kth/complete per row) cuts pass-1
    materialization ~40% and drops the dead rows of pending queries."""
    w = 1.0 / (1 << res)
    h = margin * w

    empty = pa.table({
        "input_id": pa.array([], id_type), "rank": pa.array([], pa.int32()),
        "neighbor_id": pa.array([], id_type),
        "distance_sq": pa.array([], pa.float64()),
    })

    def partition_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "gkey" not in batch.column_names:
            return empty  # dead block (see _dead_block): schema-full empty
        gkey = batch["gkey"].to_numpy(zero_copy_only=False)
        role = batch["role"].to_numpy(zero_copy_only=False)
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        px = batch["px"].to_numpy(zero_copy_only=False)
        py = batch["py"].to_numpy(zero_copy_only=False)

        order = np.argsort(gkey, kind="stable")
        gkey_s, role_s = gkey[order], role[order]
        pid_s, px_s, py_s = pid[order], px[order], py[order]
        keys, starts = np.unique(gkey_s, return_index=True)
        starts = np.append(starts, len(gkey_s))

        o_qid, o_nbr, o_pad, o_dist, o_rank = [], [], [], [], []
        ranks = np.arange(k, dtype=np.int32)

        for gi in range(len(keys)):
            s, e = starts[gi], starts[gi + 1]
            r = role_s[s:e]
            qm = r == 0
            if not qm.any():
                continue
            tm = ~qm
            qid, qx, qy = pid_s[s:e][qm], px_s[s:e][qm], py_s[s:e][qm]
            tid, tx, ty = pid_s[s:e][tm], px_s[s:e][tm], py_s[s:e][tm]

            nbr, dist = knn_topk(qx, qy, tx, ty, k, tid_rank=_id_rank(tid))
            kth = dist[:, k - 1] if k >= 1 else np.zeros(len(qx))

            key = int(keys[gi])
            cell, sub = key // _MAXSUB, key % _MAXSUB
            x0, _, x1, _ = grid.cell_bounds(np.array([cell]), res)
            slo, shi = _sub_y_range(cell, sub, res, hot_plan)
            rect = (float(x0[0]) - h, slo - h, float(x1[0]) + h, shi + h)
            complete = kth < _rect_bd_sq(qx, qy, rect, res)

            if complete.any():
                cq = np.nonzero(complete)[0]
                flat = nbr[cq].ravel()
                pad = flat < 0
                o_qid.append(np.repeat(qid[cq], k))
                if len(tid):
                    o_nbr.append(tid[np.where(pad, 0, flat)])
                elif pa.types.is_string(id_type):  # query-only cell: padded
                    o_nbr.append(np.full(len(flat), "", dtype=object))
                else:
                    o_nbr.append(np.zeros(len(flat), dtype=np.int64))
                o_pad.append(pad)
                o_dist.append(dist[cq].ravel())
                o_rank.append(np.tile(ranks, len(cq)))
            if not complete.all():
                iq = np.nonzero(~complete)[0]
                o_qid.append(qid[iq])
                if len(tid):
                    o_nbr.append(tid[np.zeros(len(iq), dtype=np.int64)])
                elif pa.types.is_string(id_type):
                    o_nbr.append(np.full(len(iq), "", dtype=object))
                else:
                    o_nbr.append(np.zeros(len(iq), dtype=np.int64))
                o_pad.append(np.ones(len(iq), dtype=bool))  # neighbor null
                o_dist.append(kth[iq])  # ub travels in distance_sq
                o_rank.append(np.full(len(iq), -1, dtype=np.int32))

        if not o_qid:
            return empty
        qid_all = np.concatenate(o_qid)
        pad_all = np.concatenate(o_pad)
        nbr_all = np.concatenate(o_nbr)
        rank_all = np.concatenate(o_rank)
        dist_all = np.concatenate(o_dist)
        nbr_col = pc.if_else(pa.array(~pad_all),
                             pa.array(nbr_all, id_type),
                             pa.scalar(None, id_type))
        # marker rows keep their (finite or inf) ub in distance_sq;
        # padded result rows become null
        dist_mask = pad_all & (rank_all >= 0)
        dist_col = pa.array(np.where(dist_mask, np.nan, dist_all),
                            pa.float64(), mask=dist_mask)
        return pa.table({
            "input_id": pa.array(qid_all, id_type),
            "rank": pa.array(rank_all),
            "neighbor_id": nbr_col,
            "distance_sq": dist_col,
        })

    return partition_fn


# ---------------------------------------------------------------------------
# pass-1 exchange: explicit object-store hash shuffle
# ---------------------------------------------------------------------------

def _bucket_of(gkey: np.ndarray, nbuckets: int) -> np.ndarray:
    """Exchange bucket of each FULL gkey (cell*256 + sub).  Hashing the
    full gkey — not the cell id — spreads the sub-stripes of a hot cell
    over bucket tasks; groups are processed independently by the partition
    kernel, so sub-stripes of one cell need not co-locate (hashing the cell
    alone would re-concentrate the very skew sub-striping prevents).

    The hash is a full 64-bit mix (splitmix64) BEFORE the mod: gkey's low
    8 bits are the sub-stripe index (0 for every non-hot cell), so a
    multiply-mod hash keeps those zeros in its low bits and `% nbuckets`
    collapses all non-hot cells onto gcd(256, nbuckets) residues — a
    32x load-imbalance at nbuckets=96 (measured: 2.3x aknn wall)."""
    h = _splitmix64(gkey.astype(np.uint64))
    return (h % np.uint64(nbuckets)).astype(np.int64)


def _split_table(tbl: pa.Table, part: np.ndarray, n: int):
    """Split one table into n tables by the given partition id per row
    (single argsort + zero-copy slicing)."""
    order = np.argsort(part, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    ps = part[order]
    bounds = np.searchsorted(ps, np.arange(n + 1))
    return [sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
            for i in range(n)]


def _empty_splits(n: int):
    """n degenerate split outputs for a dead input (see _dead_block)."""
    e = pa.table({})
    return tuple([e] * n) if n > 1 else e


def _dead_block(tbl: pa.Table) -> bool:
    """True for blocks that contribute nothing to the exchange.  Ray Data
    emits SCHEMA-LESS empty blocks whenever a map task's input block is
    empty: the batch fn is never called, so the output block holds zero
    batches and an EMPTY schema (the 'RefBundle with a different schema
    ... new schema: .' warning).  Any raw-block consumer reached via
    ``to_arrow_refs`` must tolerate them — a ``tbl["gkey"]`` lookup on one
    raises KeyError (the CORRECTNESS_r02 knn_scale_sampled failure)."""
    return tbl.num_rows == 0 or "gkey" not in tbl.column_names


@ray.remote
def _split_by_bucket(tbl: pa.Table, nbuckets: int):
    """Level-0 split: one block into per-bucket tables (flat path)."""
    if _dead_block(tbl):
        return _empty_splits(nbuckets)
    gkey = tbl["gkey"].to_numpy(zero_copy_only=False)
    out = _split_table(tbl, _bucket_of(gkey, nbuckets), nbuckets)
    return tuple(out) if nbuckets > 1 else out[0]


@ray.remote
def _split_coarse(n_groups: int, group_width: int, nbuckets: int, *tbls):
    """Two-level path, level 1: concat a CHUNK of blocks, split by coarse
    bucket group (bucket // group_width)."""
    live = [t for t in tbls if not _dead_block(t)]
    if not live:
        return _empty_splits(n_groups)
    tbl = pa.concat_tables(live)
    gkey = tbl["gkey"].to_numpy(zero_copy_only=False)
    coarse = _bucket_of(gkey, nbuckets) // group_width
    out = _split_table(tbl, coarse, n_groups)
    return tuple(out) if n_groups > 1 else out[0]


@ray.remote
def _split_fine(group: int, group_width: int, n_local: int, nbuckets: int,
                *parts):
    """Two-level path, level 2: concat one coarse group's parts from every
    chunk, split into its local fine buckets."""
    live = [t for t in parts if not _dead_block(t)]
    if not live:
        return _empty_splits(n_local)
    tbl = pa.concat_tables(live)
    gkey = tbl["gkey"].to_numpy(zero_copy_only=False)
    local = _bucket_of(gkey, nbuckets) - group * group_width
    out = _split_table(tbl, local, n_local)
    return tuple(out) if n_local > 1 else out[0]


@ray.remote
def _kernel_on_bucket(partition_fn, *tables):
    live = [t for t in tables if not _dead_block(t)]
    # all-dead bucket: partition_fn guards dead input and returns its
    # (schema-carrying) empty result table
    tbl = pa.concat_tables(live) if live else tables[0]
    return partition_fn(tbl)


# Flat-path envelope: above this many driver-side object refs
# (n_blocks x n_buckets) the exchange switches to the two-level plan.
_EXCHANGE_FLAT_LIMIT = 200_000
_EXCHANGE_CHUNK = 16  # blocks concatenated per level-1 task


def _exchange_plan(refs: list, nbuckets: int) -> list[list]:
    """Bucket -> list of table refs whose concatenation is that bucket.

    Flat path (small jobs): one split task per block with ``nbuckets``
    returns; driver metadata O(n_blocks x n_buckets) — measured fastest on
    a single node, but an O(10^11)-ref driver scale-killer at the
    10^12-row design point (10^5 blocks x 10^6 buckets).

    Two-level path (above ``_EXCHANGE_FLAT_LIMIT``): chunks of
    ``_EXCHANGE_CHUNK`` blocks split into ~sqrt(n_buckets) coarse groups,
    then one task per coarse group re-splits into its fine buckets.
    Driver metadata O(n_blocks/chunk x sqrt(B) + B) — ~10^8 at the design
    point — at the cost of one extra materialization of the routed rows.
    Both paths produce identical bucket contents (same `_bucket_of` hash),
    so checkpoint/resume is path-independent.
    """
    nb = int(nbuckets)
    if nb <= 1:
        return [list(refs)]
    if len(refs) * nb <= _EXCHANGE_FLAT_LIMIT:
        splits = [_split_by_bucket.options(num_returns=nb).remote(r, nb)
                  for r in refs]
        return [[splits[t][b] for t in range(len(splits))]
                for b in range(nb)]
    n_groups = int(np.ceil(np.sqrt(nb)))
    width = int(np.ceil(nb / n_groups))
    n_groups = int(np.ceil(nb / width))
    l1 = []
    for i in range(0, len(refs), _EXCHANGE_CHUNK):
        r = _split_coarse.options(num_returns=n_groups).remote(
            n_groups, width, nb, *refs[i:i + _EXCHANGE_CHUNK])
        l1.append([r] if n_groups == 1 else r)
    plan: list[list] = []
    for g in range(n_groups):
        n_local = min(width, nb - g * width)
        fine = _split_fine.options(num_returns=n_local).remote(
            g, width, n_local, nb, *[c[g] for c in l1])
        if n_local == 1:
            fine = [fine]
        plan.extend([f] for f in fine)
    return plan


def _hash_exchange_map(u: ray.data.Dataset, nbuckets: int,
                       partition_fn) -> ray.data.Dataset:
    """Explicit hash exchange + per-bucket kernel, built on raw Ray tasks.

    Ray Data's sort-based shuffle is a wall-clock Amdahl term here: its
    merge phase does not parallelize with CPUs on a node (measured: the kNN
    exchange of ~23M rows costs ~10s regardless of 8 vs 32 CPUs, capping
    scaling efficiency at ~0.5).  This stage expresses the same exchange as
    wide task layers over object-store blocks (see :func:`_exchange_plan`
    for the flat vs two-level layout and the driver-metadata envelope) —
    every layer embarrassingly parallel.  This is the documented "drop to
    raw Ray tasks where the Dataset API can't express it" exception (the
    Dataset API offers no scalable key-exchange primitive under the default
    strategy; the hash-shuffle strategy's aggregator actor fleets stall
    small sessions, see package __init__).  Results return to the Dataset
    world via from_arrow_refs, so everything downstream stays Ray Data.

    Partitioning assumption: all rows of one gkey land in one bucket
    (:func:`_bucket_of`); per-group size is bounded by the hot-cell
    sub-stripe plan so a bucket fits comfortably in a task's heap.
    """
    refs = u.to_arrow_refs()
    plan = _exchange_plan(refs, nbuckets)
    out = [_kernel_on_bucket.remote(partition_fn, *brefs) for brefs in plan]
    return ray.data.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# pass-2 escalation
#
# Two strategies, picked by demand size:
# - broadcast sweep (below): every training batch scanned against every
#   pending query — O(T x E), only sane for small E;
# - cell-indexed (default for larger E): each pending query is routed to
#   exactly the cells its ub-radius disk touches, training is keyed by its
#   own cell once (no halo), and a per-cell chunked distance scan emits
#   candidates with d <= ub.  Volume ~ the training actually inside the
#   union of pending disks — the geometric escalation SURVEY.md §7.1
#   promises (ring r=2, r=4, ... collapsed into one exact radius pass).
# ---------------------------------------------------------------------------


def _escalation_scan_task(b, *, _args):
    """Task-map wrapper (per-worker memoized state — shuffle.worker_state):
    fuses with the routing stage instead of an actor-pool boundary."""
    from .shuffle import worker_state
    fn = worker_state(("_EscalationScan",) + _args,
                      lambda: _EscalationScan(*_args))
    return fn(b)

def _escalation_demand(qid, qx, qy, ub, res: int):
    """(cell, query-index) demand pairs: all cells within each query's
    ceil(sqrt(ub)/cell_width) Chebyshev ring.  Queries whose radius covers
    the whole grid (ub=inf: global n<k) go to the full-scan list."""
    n = 1 << res
    qix, qiy = grid.grid_coords(qx, qy, res)
    with np.errstate(over="ignore"):
        rc = np.where(np.isfinite(ub),
                      np.floor(np.sqrt(np.maximum(ub, 0.0)) * n) + 1,
                      n).astype(np.int64)
    full = rc >= n
    out_cell, out_q = [], []
    part = np.nonzero(~full)[0]
    for r in np.unique(rc[part]):
        qs = part[rc[part] == r]
        offs = np.arange(-r, r + 1, dtype=np.int64)
        dx, dy = np.meshgrid(offs, offs, indexing="ij")
        dx, dy = dx.ravel(), dy.ravel()
        cx = qix[qs].astype(np.int64)[:, None] + dx[None, :]
        cy = qiy[qs].astype(np.int64)[:, None] + dy[None, :]
        ok = (cx >= 0) & (cx < n) & (cy >= 0) & (cy < n)
        src, off = np.nonzero(ok)
        cells = ((_mpart(cx[src, off]) << np.uint64(1))
                 | _mpart(cy[src, off])).astype(np.int64)
        out_cell.append(cells)
        out_q.append(qs[src])
    if out_cell:
        cells = np.concatenate(out_cell)
        qidx = np.concatenate(out_q)
    else:
        cells = np.empty(0, np.int64)
        qidx = np.empty(0, np.int64)
    return cells, qidx, np.nonzero(full)[0]


def _mpart(v: np.ndarray) -> np.ndarray:
    from ..functions.grid import _part1by1
    return _part1by1(v.astype(np.uint64))


def _sample_upper_bounds(proj_tr, esc: dict, k: int, cols,
                         sample_target: int = 50_000) -> np.ndarray:
    """Finite kth-distance upper bounds for pending queries whose pass-1
    bound is inf (their halo held fewer than k training rows): the kth
    distance to a deterministic coordinate-hashed SAMPLE of training is a
    sound upper bound (sample ⊆ training).  Coordinate-based hashing keeps
    the sample — and therefore the final result — independent of
    partitioning and id type."""
    idc, xc, yc = cols
    inf_mask = ~np.isfinite(esc["ub"])
    if not inf_mask.any():
        return esc["ub"]

    def sample(b: pa.Table) -> pa.Table:
        x = b[xc].to_numpy(zero_copy_only=False)
        h = _splitmix64(x.view(np.uint64))
        keep = (h % np.uint64(1 << 16)).astype(np.int64)
        return pa.table({"x": b[xc], "y": b[yc],
                         "h": pa.array(keep)})

    # two-phase deterministic sample: hash all coords, keep the smallest
    # hash classes until ~sample_target rows (driver-side threshold pick)
    hashed = proj_tr.map_batches(sample, batch_format="pyarrow")
    n_tr = hashed.count()
    frac = min(1.0, sample_target / max(1, n_tr))
    cut = int(frac * (1 << 16)) + 1
    st = hashed.map_batches(
        lambda b: b.filter(pc.less(b["h"], cut)),
        batch_format="pyarrow").take_all()
    sx = np.array([r["x"] for r in st])
    sy = np.array([r["y"] for r in st])
    ub = esc["ub"].copy()
    if len(sx) >= 1:
        qx, qy = esc["qx"][inf_mask], esc["qy"][inf_mask]
        from .sweep import knn_topk_brute
        _, dist = knn_topk_brute(qx, qy, sx, sy, min(k, len(sx)))
        kth = dist[:, min(k, len(sx)) - 1]
        # only a sound bound when the sample has >= k points
        if len(sx) >= k:
            ub[inf_mask] = kth
    return ub




def _escalation_via_cells(proj_tr, esc: dict, res: int, k: int,
                          id_type: pa.DataType, cols):
    """Cell-indexed escalation scan: returns ``(candidates, full_idx)`` —
    candidate rows (input_id, neighbor_id, distance_sq) with d <= that
    query's ub, plus the indices (into ``esc``) of queries whose ub-radius
    covers the whole grid.  Those generate no cell demand here and MUST be
    routed through the broadcast sweep by the caller, or they would be
    silently dropped from the final output (reachable at low resolutions
    where ub is on the order of the cell width)."""
    import pandas as pd

    from .shuffle import sorted_block_reduce
    idc, xc, yc = cols
    cells, qidx, full_idx = _escalation_demand(esc["qid"], esc["qx"],
                                               esc["qy"], esc["ub"], res)
    demand = pa.table({
        "cell": pa.array(cells),
        "pid": pa.array(esc["qid"][qidx], id_type),
        "px": pa.array(esc["qx"][qidx], pa.float64()),
        "py": pa.array(esc["qy"][qidx], pa.float64()),
        "ub": pa.array(esc["ub"][qidx], pa.float64()),
        "role": pa.array(np.zeros(len(cells), dtype=np.int8)),
    })

    def training_cells(b: pa.Table) -> pa.Table:
        c = grid.cell_id(b[xc].to_numpy(zero_copy_only=False),
                         b[yc].to_numpy(zero_copy_only=False), res)
        return pa.table({
            "cell": pa.array(c), "pid": b[idc], "px": b[xc], "py": b[yc],
            "ub": pa.array(np.zeros(len(c)), pa.float64()),
            "role": pa.array(np.ones(len(c), dtype=np.int8)),
        })

    u = ray.data.from_arrow(demand).union(
        proj_tr.map_batches(training_cells, batch_format="pyarrow"))
    return sorted_block_reduce(u, "cell", _cell_scan_fn()), full_idx


def _cell_scan_fn(payload: bool = False):
    """Per-cell chunked distance scan over co-located (visiting-query,
    resident-training) rows: emits (input_id, neighbor_id, distance_sq)
    pairs with d <= that query row's ub.  Shared by the escalation pass and
    radius_join.  ``payload=True``: routed rows carry a ``pl`` int64 column
    and pairs exit with BOTH sides' values (``input_pl``/``neighbor_pl``) —
    lets a caller like Knox attach per-point attributes (timestamps)
    without any post-join on the pair stream."""
    import pandas as pd

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cell", kind="stable")
        cell = g["cell"].to_numpy()
        role = g["role"].to_numpy()
        starts = np.nonzero(np.concatenate([[True],
                                            cell[1:] != cell[:-1]]))[0]
        starts = np.append(starts, len(cell))
        out = []
        pid = g["pid"].to_numpy()
        px = g["px"].to_numpy()
        py = g["py"].to_numpy()
        ubv = g["ub"].to_numpy()
        plv = g["pl"].to_numpy() if payload else None
        for s, e in zip(starts[:-1], starts[1:]):
            r = role[s:e]
            qm = r == 0
            if not qm.any() or qm.all():
                continue
            qI = np.nonzero(qm)[0] + s
            tI = np.nonzero(~qm)[0] + s
            chunk = max(1, _MATRIX_BUDGET // max(1, len(tI)))
            for cs in range(0, len(qI), chunk):
                qs = qI[cs:cs + chunk]
                dx = px[qs, None] - px[tI][None, :]
                dy = py[qs, None] - py[tI][None, :]
                d = dx * dx + dy * dy
                qi, ti = np.nonzero(d <= ubv[qs, None])
                if len(qi):
                    cols = {
                        "input_id": pid[qs[qi]],
                        "neighbor_id": pid[tI[ti]],
                        "distance_sq": d[qi, ti]}
                    if payload:
                        cols["input_pl"] = plv[qs[qi]]
                        cols["neighbor_pl"] = plv[tI[ti]]
                    out.append(pd.DataFrame(cols))
        if not out:
            empty = {"input_id": pd.Series([], dtype=pid.dtype),
                     "neighbor_id": pd.Series([], dtype=pid.dtype),
                     "distance_sq": pd.Series([], dtype=float)}
            if payload:
                empty["input_pl"] = pd.Series([], dtype=np.int64)
                empty["neighbor_pl"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)

    return scan


# ---------------------------------------------------------------------------
# pass-2 escalation (pending points -> broadcast sweep, small-E path)
# ---------------------------------------------------------------------------

class _EscalationScan:
    """Actor-pool stage: holds the broadcast escalated-query arrays
    (fetched once per actor in __init__ via ray.get — never re-shipped per
    batch) and emits candidate (input_id, neighbor_id, distance_sq) rows
    with d <= that query's pass-1 kth upper bound."""

    def __init__(self, esc_ref, id_type_str: str):
        esc = ray.get(esc_ref)
        self.qid = esc["qid"]
        self.qx = esc["qx"]
        self.qy = esc["qy"]
        self.ub = esc["ub"]
        self.id_type = pa.string() if id_type_str == "string" else pa.int64()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tx = batch["px"].to_numpy(zero_copy_only=False)
        ty = batch["py"].to_numpy(zero_copy_only=False)
        tid = batch["pid"].to_numpy(zero_copy_only=False)
        nE, nB = len(self.qx), len(tx)
        out_q, out_n, out_d = [], [], []
        chunk = max(1, _MATRIX_BUDGET // max(1, nB))
        for s in range(0, nE, chunk):
            e = min(nE, s + chunk)
            dx = self.qx[s:e, None] - tx[None, :]
            dy = self.qy[s:e, None] - ty[None, :]
            d = dx * dx + dy * dy
            qi, ti = np.nonzero(d <= self.ub[s:e, None])
            out_q.append(self.qid[s + qi])
            out_n.append(tid[ti])
            out_d.append(d[qi, ti])
        return pa.table({
            "input_id": pa.array(np.concatenate(out_q) if out_q else [], self.id_type),
            "neighbor_id": pa.array(np.concatenate(out_n) if out_n else [], self.id_type),
            "distance_sq": pa.array(np.concatenate(out_d) if out_d else [],
                                    pa.float64()),
        })


def _make_merge_fn(k: int):
    """Partition-batched escalation merge: one call per mpart bucket, all
    queries of the bucket reduced vectorized in pandas (sort by
    (input_id, distance, neighbor), rank by cumcount, null-pad to k)."""
    import pandas as pd

    def merge_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["input_id", "distance_sq", "neighbor_id"],
                          kind="stable")
        g["rank"] = g.groupby("input_id", sort=False).cumcount().astype("int32")
        g = g[g["rank"] < k]
        counts = g.groupby("input_id", sort=False)["rank"].size()
        short = counts[counts < k]
        if len(short):  # fewer than k candidates (global n_training < k)
            pads = []
            for qid, c in short.items():
                pads.append(pd.DataFrame({
                    "input_id": [qid] * (k - c),
                    "neighbor_id": [None] * (k - c),
                    "distance_sq": [None] * (k - c),
                    "rank": np.arange(c, k, dtype=np.int32),
                }))
            g = pd.concat([g[["input_id", "neighbor_id", "distance_sq",
                              "rank"]], *pads], ignore_index=True)
        return g[["input_id", "rank", "neighbor_id", "distance_sq"]]

    return merge_fn


def _fetch_pending_coords(proj_in, esc_tbl: pa.Table, id_col, x_col, y_col,
                          id_type) -> dict:
    """Pending markers carry only (input_id, ub); re-fetch the queries'
    coordinates from the projected input with a broadcast id set.  All
    array-native (arrow/numpy) — the pending set is bounded by
    ``escalation_limit`` but can still be large, so no per-row Python."""
    qid = esc_tbl["input_id"].to_numpy(zero_copy_only=False)
    ub = esc_tbl["distance_sq"].to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    idset_ref = ray.put(pa.array(qid, id_type))

    def coords_of(b: pa.Table) -> pa.Table:
        wanted = ray.get(idset_ref)  # plasma-cached per node, not re-shipped
        keep = pc.is_in(b[id_col].combine_chunks().cast(id_type),
                        value_set=wanted)
        return b.filter(keep)

    coords = pa.concat_tables(
        [t for t in ray.get(proj_in.map_batches(
            coords_of, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows])
    # align fetched coords to marker order via sorted lookup
    cid = coords[id_col].to_numpy(zero_copy_only=False)
    cx = coords[x_col].to_numpy(zero_copy_only=False)
    cy = coords[y_col].to_numpy(zero_copy_only=False)
    order = np.argsort(cid, kind="stable")
    pos = order[np.searchsorted(cid[order], qid)]
    return {"qid": qid, "qx": cx[pos].astype(np.float64),
            "qy": cy[pos].astype(np.float64), "ub": ub}


def radius_join(input_ds: ray.data.Dataset, training_ds: ray.data.Dataset,
                radius: float, *, res: int | None = None,
                id_col: str = "doc_id", x_col: str = "x", y_col: str = "y",
                n_training: int | None = None,
                payload_col: str | None = None) -> ray.data.Dataset:
    """Spatial range join: all (input, training) pairs within ``radius``
    (Euclidean).  Built on the same cell-demand machinery as the kNN
    escalation pass — each input point is routed to the cells its
    radius-disk touches, training is keyed by its own cell once, and a
    per-cell chunked scan emits pairs with d² <= radius².  Output:
    (input_id, neighbor_id, distance_sq).  ``payload_col``: an int64
    attribute routed WITH each point so pairs exit carrying both sides'
    values as ``input_pl``/``neighbor_pl`` — one extra int64 in the
    exchange instead of two post-join shuffles on the (much larger) pair
    stream."""
    cols = (id_col, x_col, y_col)
    sel = list(cols) + ([payload_col] if payload_col else [])
    proj_in = input_ds.select_columns(sel)
    proj_tr = training_ds.select_columns(sel)
    if res is None:
        if n_training is None:
            n_training = proj_tr.count()
        # aim for cell width ~ radius (demand ~ 9 cells per input point)
        res = max(0, min(grid.MAX_RES,
                         int(np.floor(np.log2(1.0 / max(radius, 1e-9))))))
    idc, xc, yc = cols
    rsq = float(radius) * float(radius)  # same IEEE product as the SQL oracle
    rc = int(np.floor(radius * (1 << res))) + 1

    def route_queries(b: pa.Table) -> pa.Table:
        cell = grid.cell_id(b[xc].to_numpy(zero_copy_only=False),
                            b[yc].to_numpy(zero_copy_only=False), res)
        src, ncell = grid.ring_neighbors(cell, res, rc)
        take = pa.array(src)
        n = len(src)
        t = {
            "cell": pa.array(ncell), "pid": b[idc].take(take),
            "px": b[xc].take(take), "py": b[yc].take(take),
            "ub": pa.array(np.full(n, rsq), pa.float64()),
            "role": pa.array(np.zeros(n, dtype=np.int8)),
        }
        if payload_col:
            t["pl"] = b[payload_col].take(take).cast(pa.int64())
        return pa.table(t)

    def training_cells(b: pa.Table) -> pa.Table:
        c = grid.cell_id(b[xc].to_numpy(zero_copy_only=False),
                         b[yc].to_numpy(zero_copy_only=False), res)
        t = {
            "cell": pa.array(c), "pid": b[idc], "px": b[xc], "py": b[yc],
            "ub": pa.array(np.zeros(len(c)), pa.float64()),
            "role": pa.array(np.ones(len(c), dtype=np.int8)),
        }
        if payload_col:
            t["pl"] = b[payload_col].cast(pa.int64())
        return pa.table(t)

    from .shuffle import sorted_block_reduce
    u = proj_in.map_batches(route_queries, batch_format="pyarrow").union(
        proj_tr.map_batches(training_cells, batch_format="pyarrow"))
    return sorted_block_reduce(u, "cell",
                               _cell_scan_fn(payload=bool(payload_col)))


def _run_escalation(proj_tr, esc: dict, res: int, k: int,
                    id_type: pa.DataType, cols,
                    escalation_limit: int) -> "ray.data.Dataset":
    """Pass 2 for pending queries: finite-ub queries go through the
    cell-indexed scan (broadcast only when the set is tiny); inf-ub queries
    first get a sound finite bound from a deterministic training sample,
    and only the residual (global n_training < k) falls back to the full
    broadcast sweep.  Returns the merged, padded, 4-column result."""
    nE = len(esc["qid"])
    if nE > escalation_limit:
        raise RuntimeError(
            f"{nE} escalated queries exceed the limit; raise `res` / lower "
            "points-per-cell or raise halo_margin")
    if not np.isfinite(esc["ub"]).all():
        esc = dict(esc)
        esc["ub"] = _sample_upper_bounds(proj_tr, esc, k, cols)
    finite = np.isfinite(esc["ub"])
    id_type_str = "string" if pa.types.is_string(id_type) else "int"

    def broadcast_cand(sub: dict):
        ref = ray.put(sub)
        return proj_tr.map_batches(
            _assign_queries, batch_format="pyarrow",
            fn_kwargs=dict(res=res, cols=cols, hot_plan={})
        ).map_batches(_escalation_scan_task, batch_format="pyarrow",
                      fn_kwargs=dict(_args=(ref, id_type_str)))

    parts = []
    n_fin = int(finite.sum())
    if n_fin:
        sub = {c: v[finite] for c, v in esc.items()}
        if n_fin <= 1000:
            parts.append(broadcast_cand(sub))
        else:
            cand_cells, full_idx = _escalation_via_cells(
                proj_tr, sub, res, k, id_type, cols)
            # normalize to arrow blocks so a union with the (arrow-block)
            # broadcast stream never mixes block types
            parts.append(cand_cells.map_batches(
                lambda b: b, batch_format="pyarrow"))
            if len(full_idx):
                # finite-ub queries whose radius covers the whole grid
                # generate no cell demand — sweep them broadcast-style so
                # they are not dropped (low-res / large-ub workloads)
                parts.append(broadcast_cand(
                    {c: v[full_idx] for c, v in sub.items()}))
    if (~finite).any():  # residual inf: training smaller than the sample/k
        parts.append(broadcast_cand({c: v[~finite] for c, v in esc.items()}))

    cand = parts[0]
    for p in parts[1:]:
        cand = cand.union(p)
    merged = cand.sort("input_id").map_batches(
        _make_merge_fn(k), batch_format="pandas", batch_size=None)
    return merged.map_batches(
        lambda b: pa.table({
            "input_id": b["input_id"].combine_chunks().cast(id_type),
            "rank": b["rank"].combine_chunks().cast(pa.int32()),
            "neighbor_id": b["neighbor_id"].combine_chunks().cast(id_type),
            "distance_sq": b["distance_sq"].combine_chunks()
            .cast(pa.float64()),
        }), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

OUT_COLS = ["input_id", "rank", "neighbor_id", "distance_sq"]


def aknn_join(input_ds: ray.data.Dataset, training_ds: ray.data.Dataset,
              k: int, *, res: int | None = None,
              id_col: str = "doc_id", x_col: str = "x", y_col: str = "y",
              n_training: int | None = None,
              hot_plan: dict[int, np.ndarray] | None = None,
              auto_skew: bool = False, max_rows_per_group: int = 200_000,
              halo_margin: float = 0.5, num_partitions: int | None = None,
              pad: bool = True, sort_output: bool = True,
              escalation_limit: int = 5_000_000) -> ray.data.Dataset:
    """All-kNN join: for every row of ``input_ds``, the k nearest rows of
    ``training_ds`` (both need columns ``id_col, x_col, y_col`` with
    coordinates in [0,1]²).  Self-join: pass the same dataset twice (a point
    is its own 0-distance neighbor, exactly like the reference's
    run_realdata_self.cmd).

    ``res=None`` picks the resolution from ``n_training`` (or a count) via
    the √(N/k)-per-axis heuristic (AllKnnResultStripes.h:141-151 squared up
    to 2-D).  ``halo_margin`` is the training-duplication radius in cell
    widths (duplication factor ≈ (1+2m)²); smaller margins shuffle less and
    escalate more.  ``num_partitions`` sets the number of shuffle partitions
    (bags of whole cells); default scales with the training size.

    Ids must be unique per dataset (the reference's dense-unique-id
    invariant, AllKnnProblem.h/BruteForceAlgorithm.h:50); duplicate query
    ids would be merged by the escalation pass.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if res is not None and not 0 <= res <= grid.MAX_RES:
        raise ValueError(f"res must be in [0, {grid.MAX_RES}], got {res}")
    cols = (id_col, x_col, y_col)
    proj_in = input_ds.select_columns(list(cols))
    proj_tr = training_ds.select_columns(list(cols))
    if res is None or num_partitions is None:
        if n_training is None:
            n_training = proj_tr.count()
        if res is None:
            res = grid.choose_resolution(n_training, k)
        if num_partitions is None:
            # ~1M shuffled rows per bucket task (incl. halo duplication);
            # floor = 4x cluster CPUs for load balance; cap 1M tasks at
            # the 10^12-row design point.
            try:
                cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:  # pragma: no cover
                cpus = 8
            num_partitions = int(min(1_000_000,
                                     max(3 * cpus, n_training // 250_000)))
    if hot_plan is None and auto_skew:
        # Density stats over BOTH sides (the reference's training-driven
        # split choice, AllKnnResultStripes.h:317-423 / argv -t, generalized:
        # a group's kernel cost is bounded by queries + routed training, so
        # the skew detector must see a hot QUERY cell over uniform training
        # just as it sees a hot training cell).
        stats = proj_tr.select_columns([x_col, y_col]).union(
            proj_in.select_columns([x_col, y_col]))
        counts = detect_hot_cells(stats, res, x_col=x_col, y_col=y_col,
                                  max_rows_per_group=max_rows_per_group)
        hot_plan = build_hot_plan(counts, res, k,
                                  max_rows_per_group=max_rows_per_group)
    hot_plan = hot_plan or {}
    id_type = proj_in.schema().base_schema.field(id_col).type

    q = proj_in.map_batches(
        _assign_queries, batch_format="pyarrow", batch_size=None,
        fn_kwargs=dict(res=res, cols=cols, hot_plan=hot_plan))
    t = proj_tr.map_batches(
        _route_training, batch_format="pyarrow", batch_size=None,
        fn_kwargs=dict(res=res, cols=cols, hot_plan=hot_plan,
                       margin=halo_margin))

    # The explicit shuffle + kernel: see _hash_exchange_map.  The exchange
    # materializes once; both the complete-result stream and the (tiny)
    # escalation set consume the resulting block refs without recompute.
    pass1 = _hash_exchange_map(
        q.union(t), num_partitions,
        _make_partition_fn(k, res, hot_plan, halo_margin, id_type))

    results = pass1.map_batches(
        lambda b: b.filter(pc.greater_equal(b["rank"], 0)),
        batch_format="pyarrow")

    # rank == -1 marker rows: one per pending query, ub in distance_sq
    # (fetched as arrow tables, never per-row Python dicts)
    marker_tbls = [t for t in ray.get(pass1.map_batches(
        lambda b: b.filter(pc.equal(b["rank"], -1))
                   .select(["input_id", "distance_sq"]),
        batch_format="pyarrow").to_arrow_refs()) if t.num_rows]
    esc_tbl = pa.concat_tables(marker_tbls) if marker_tbls else None

    if esc_tbl is not None and esc_tbl.num_rows:
        esc = _fetch_pending_coords(proj_in, esc_tbl, id_col, x_col, y_col,
                                    id_type)
        pass2 = _run_escalation(proj_tr, esc, res, k, id_type, cols,
                                escalation_limit)
        results = results.union(pass2)

    if not pad:
        results = results.map_batches(
            lambda b: b.filter(pc.is_valid(b["neighbor_id"])),
            batch_format="pyarrow")
    if sort_output:
        results = results.sort(["input_id", "rank"])
    return results


class _BroadcastKnn:
    """Brute-force kNN against a broadcast training table — the reference's
    case 0 oracle (BruteForceAlgorithm.h:28-64) as a Ray stage: ``ray.put``
    the small training side once, full vectorized distance matrix per query
    batch.  Exact same (distance, id) order as the sweep path."""

    def __init__(self, train_ref, k: int, cols, id_type_str: str):
        t = ray.get(train_ref)
        self.tx, self.ty, self.tid = t["x"], t["y"], t["id"]
        self.rank = _id_rank(self.tid)
        self.k = k
        self.cols = cols
        self.id_type = pa.string() if id_type_str == "string" else pa.int64()

    def __call__(self, batch: pa.Table) -> pa.Table:
        idc, xc, yc = self.cols
        qx = batch[xc].to_numpy(zero_copy_only=False)
        qy = batch[yc].to_numpy(zero_copy_only=False)
        qid = batch[idc].to_numpy(zero_copy_only=False)
        from .sweep import knn_topk_brute
        nbr, dist = knn_topk_brute(qx, qy, self.tx, self.ty, self.k,
                                   tid_rank=self.rank)
        k, nq = self.k, len(qid)
        flat = nbr.ravel()
        padm = flat < 0
        nbr_col = pc.if_else(pa.array(~padm),
                             pa.array(self.tid[np.where(padm, 0, flat)], self.id_type),
                             pa.scalar(None, self.id_type))
        dist_col = pa.array(np.where(padm, np.nan, dist.ravel()), pa.float64(),
                            mask=padm)
        return pa.table({
            "input_id": pa.array(np.repeat(qid, k), self.id_type),
            "rank": pa.array(np.tile(np.arange(k, dtype=np.int32), nq)),
            "neighbor_id": nbr_col,
            "distance_sq": dist_col,
        })



def _broadcast_knn_task(b, *, _args):
    """Task-map wrapper (per-worker memoized state — shuffle.worker_state)."""
    from .shuffle import worker_state
    fn = worker_state(("_BroadcastKnn",) + _args,
                      lambda: _BroadcastKnn(*_args))
    return fn(b)

def aknn_broadcast(input_ds: ray.data.Dataset, training_ds: ray.data.Dataset,
                   k: int, *, id_col: str = "doc_id", x_col: str = "x",
                   y_col: str = "y", sort_output: bool = True,
                   concurrency=None) -> ray.data.Dataset:
    """kNN join with a SMALL broadcast training side (no shuffle at all).
    Training is materialized on the driver — use only when it fits."""
    cols = (id_col, x_col, y_col)
    # columnar fetch: concat the blocks' arrow refs (no per-row Python);
    # still driver-materialized — contract-bounded to a SMALL side
    refs = training_ds.select_columns(list(cols)).to_arrow_refs()
    tbls = [t for t in ray.get(refs)
            if t.num_rows and id_col in t.column_names]
    t = pa.concat_tables(tbls) if tbls else pa.table(
        {id_col: pa.array([], pa.int64()),
         x_col: pa.array([], pa.float64()),
         y_col: pa.array([], pa.float64())})
    ref = ray.put({
        "x": t[x_col].to_numpy(zero_copy_only=False).astype(np.float64),
        "y": t[y_col].to_numpy(zero_copy_only=False).astype(np.float64),
        "id": t[id_col].to_numpy(zero_copy_only=False),
    })
    id_type = input_ds.schema().base_schema.field(id_col).type
    out = input_ds.select_columns(list(cols)).map_batches(
        _broadcast_knn_task, batch_format="pyarrow",
        fn_kwargs=dict(_args=(ref, k, cols,
                              "string" if pa.types.is_string(id_type)
                              else "int")))
    return out.sort(["input_id", "rank"]) if sort_output else out
