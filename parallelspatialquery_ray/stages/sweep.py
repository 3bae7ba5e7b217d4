"""Vectorized plane-sweep k-nearest-neighbor kernel (pure numpy).

This is the in-partition compute kernel of the engine — the Ray-Data-native
re-expression of the reference's per-stripe plane sweep
(/root/reference/PlaneSweepParallel/include/PlaneSweepAlgorithm.h:76-151 and
PlaneSweepStripesParallelAlgorithm.h:169-234).  Instead of one bounded
max-heap per query point (PointNeighbors.h:125-137) updated in a scalar
left/right scan, we process *batches* of queries against an x-sorted training
array with an expanding index window:

- start positions come from one ``np.searchsorted`` over the whole batch
  (the reference's parallel variants use per-query ``lower_bound``,
  PlaneSweepCopyParallelAlgorithm.h:69-70);
- the dx² pruning bound (``CheckAdd``, PointNeighbors.h:166-184) becomes a
  per-query window-termination test: a query is finished once the training
  x just outside its window differs by (strictly) more than its current kth
  distance — strict, so exact distance ties outside the window are still
  reached and the tie-break below stays partitioning-invariant;
- the k-heap becomes an ``np.partition`` per iteration over the candidate
  window.

Distances are SQUARED Euclidean, computed as the single fused expression
``dx*dx + dy*dy`` in float64 and never re-associated, so results are
bit-identical regardless of partitioning (AbstractAllKnnAlgorithm.h:159-165
— the reference also never square-roots).

Tie-break: the reference tolerates id-ambiguity at equal distances and
compares only distances (AllKnnResult.h:200); we instead fix the total order
``(distance_sq, tie_rank)`` where ``tie_rank`` is a caller-supplied global
rank of each training point (normally the rank of its id), making output
ids deterministic and invariant to num_cpus and resume (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

# Max float64 entries in one candidate distance matrix (chunk_rows * window).
# Sized so the ~5 temporaries stay cache-resident: with 32 concurrent kernel
# tasks per node, multi-MB temporaries saturate DRAM bandwidth and per-task
# time inflates ~3x (measured); 60k entries ~ 0.5 MB keeps the sweep
# compute-bound and scaling.
_MATRIX_BUDGET = 60_000


def _select_topk_full(d: np.ndarray, tie: np.ndarray, k: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Exact (d, tie) lexicographic top-k via two stable full-width argsorts
    (the reference path; used as tie fixup for :func:`_select_topk`)."""
    o1 = np.argsort(tie, axis=1, kind="stable")
    d1 = np.take_along_axis(d, o1, axis=1)
    o2 = np.argsort(d1, axis=1, kind="stable")[:, :k]
    col = np.take_along_axis(o1, o2, axis=1)
    return col, np.take_along_axis(d1, o2, axis=1)


def _select_topk(d: np.ndarray, tie: np.ndarray, k: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Per-row k smallest of ``d`` under the (d, tie) lexicographic order.

    Fast path: ``argpartition`` by distance alone (O(w)) then a width-k
    two-key sort.  That is exact unless a distance TIE spans the partition
    boundary (the excluded twin could win on tie rank) — detected per row
    by counting candidates <= the selected kth distance; such rows (rare:
    exact-equal distances at the boundary, or inf padding) are recomputed
    with the full-width two-key sort.

    Returns (col_idx, d_sel): column indices into d's rows and the selected
    distances, each (rows, min(k, d.shape[1])).
    """
    w = d.shape[1]
    if k >= w or w <= 2 * k:
        return _select_topk_full(d, tie, k)
    part = np.argpartition(d, k - 1, axis=1)[:, :k]
    pd = np.take_along_axis(d, part, axis=1)
    kth = pd.max(axis=1)
    unsafe = (d <= kth[:, None]).sum(axis=1) != k
    # order the selected k by (d, tie): two stable width-k argsorts
    ptie = np.take_along_axis(tie, part, axis=1)
    o1 = np.argsort(ptie, axis=1, kind="stable")
    pd1 = np.take_along_axis(pd, o1, axis=1)
    o2 = np.argsort(pd1, axis=1, kind="stable")
    col = np.take_along_axis(np.take_along_axis(part, o1, axis=1), o2, axis=1)
    d_sel = np.take_along_axis(pd1, o2, axis=1)
    if unsafe.any():
        fcol, fd = _select_topk_full(d[unsafe], tie[unsafe], k)
        col[unsafe] = fcol
        d_sel[unsafe] = fd
    return col, d_sel


def knn_topk(qx: np.ndarray, qy: np.ndarray,
             tx: np.ndarray, ty: np.ndarray,
             k: int, tid_rank: np.ndarray | None = None
             ) -> tuple[np.ndarray, np.ndarray]:
    """Exact k nearest training points for each query point.

    Parameters
    ----------
    qx, qy : float64 arrays of nq query coordinates.
    tx, ty : float64 arrays of nt training coordinates.
    k : neighbors per query.
    tid_rank : int64 array (nt,) — each training point's rank in the global
        tie-break order (normally ``np.argsort(ids)``-derived).  None means
        tie-break by training input position.

    Returns
    -------
    (nbr_idx, dist_sq) : ``(nq, k)`` arrays.  ``nbr_idx`` holds indices into
    the ORIGINAL training arrays, ``-1`` where fewer than k training points
    exist (the reference pads with DBL_MAX sentinels, PointNeighbors.h:51;
    we pad with -1 / +inf).  Column j is the (j+1)-th nearest under the
    ``(distance_sq, tie_rank)`` total order.
    """
    qx = np.ascontiguousarray(qx, dtype=np.float64)
    qy = np.ascontiguousarray(qy, dtype=np.float64)
    tx = np.ascontiguousarray(tx, dtype=np.float64)
    ty = np.ascontiguousarray(ty, dtype=np.float64)
    nq, nt = len(qx), len(tx)
    nbr = np.full((nq, k), -1, dtype=np.int64)
    dist = np.full((nq, k), np.inf, dtype=np.float64)
    if nq == 0 or nt == 0 or k == 0:
        return nbr, dist
    if tid_rank is None:
        tid_rank = np.arange(nt, dtype=np.int64)

    xperm = np.argsort(tx, kind="stable")       # training sorted by x
    txs, tys = tx[xperm], ty[xperm]
    ranks = np.asarray(tid_rank, dtype=np.int64)[xperm]

    pos = np.searchsorted(txs, qx)
    active = np.arange(nq)
    w = max(16, 2 * k)

    while len(active):
        chunk = max(1, _MATRIX_BUDGET // (2 * w))
        still = []
        for s in range(0, len(active), chunk):
            aq = active[s:s + chunk]
            lo = pos[aq] - w
            hi = pos[aq] + w                      # window = [lo, hi)
            offs = np.arange(-w, w, dtype=np.int64)
            idx = pos[aq, None] + offs[None, :]
            valid = (idx >= 0) & (idx < nt)
            idxc = np.clip(idx, 0, nt - 1)
            dx = qx[aq, None] - txs[idxc]
            dy = qy[aq, None] - tys[idxc]
            d = dx * dx + dy * dy
            d[~valid] = np.inf

            wlen = d.shape[1]
            if k < wlen:
                kth = np.partition(d, k - 1, axis=1)[:, k - 1]
            else:
                kth = np.full(len(aq), np.inf)

            # dx² pruning (CheckAdd, PointNeighbors.h:166-184), strict.
            ldx = qx[aq] - txs[np.clip(lo - 1, 0, nt - 1)]
            rdx = txs[np.clip(hi, 0, nt - 1)] - qx[aq]
            done = ((lo <= 0) | (ldx * ldx > kth)) & ((hi >= nt) | (rdx * rdx > kth))

            if np.any(done):
                dq = aq[done]
                dd = d[done]
                tie = np.where(valid[done], ranks[idxc[done]], np.iinfo(np.int64).max)
                col, sel_d = _select_topk(dd, tie, k)
                sel_idx = np.take_along_axis(idxc[done], col, axis=1)
                pad = ~np.isfinite(sel_d)
                kk = sel_d.shape[1]
                nbr[dq, :kk] = np.where(pad, -1, xperm[sel_idx])
                dist[dq, :kk] = np.where(pad, np.inf, sel_d)
            still.append(aq[~done])
        active = np.concatenate(still) if still else np.empty(0, np.int64)
        w *= 2
        if w > 4 * (nt + k + 32):
            raise AssertionError("sweep window failed to converge")

    return nbr, dist


def knn_topk_brute(qx, qy, tx, ty, k, tid_rank=None):
    """Full O(nq·nt) distance-matrix oracle (reference case 0,
    BruteForceAlgorithm.h:28-64).  Chunked to bound memory; same
    (distance, tie_rank) order as :func:`knn_topk`."""
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    nq, nt = len(qx), len(tx)
    nbr = np.full((nq, k), -1, dtype=np.int64)
    dist = np.full((nq, k), np.inf, dtype=np.float64)
    if nq == 0 or nt == 0 or k == 0:
        return nbr, dist
    if tid_rank is None:
        tid_rank = np.arange(nt, dtype=np.int64)
    tie_full = np.asarray(tid_rank, dtype=np.int64)
    chunk = max(1, _MATRIX_BUDGET // max(1, nt))
    kk = min(k, nt)
    for s in range(0, nq, chunk):
        e = min(nq, s + chunk)
        dx = qx[s:e, None] - tx[None, :]
        dy = qy[s:e, None] - ty[None, :]
        d = dx * dx + dy * dy
        tie = np.broadcast_to(tie_full, d.shape)
        col, sel_d = _select_topk(d, tie, kk)
        nbr[s:e, :kk] = col
        dist[s:e, :kk] = sel_d
    return nbr, dist
