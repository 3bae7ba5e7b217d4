"""Capped all-pairs tiling shared by the near-dup verifiers.

Enumerating all unordered pairs of a hot bucket allocates O(n^2)
temporaries; these helpers walk the upper triangle in ``cap``-sized tiles
so no single allocation exceeds cap^2 while the emitted pair set stays
exactly the full triangle (used by :mod:`..stages.ann` similarity tiles
and :mod:`..stages.dedup` simhash buckets).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def capped_slice_tiles(n: int, cap: int) -> Iterator[tuple[slice, slice]]:
    """Yield (slice_a, slice_b) tile pairs covering the strict upper
    triangle of an n x n pair matrix, each tile at most cap x cap,
    with slice_a.start <= slice_b.start."""
    for t0 in range(0, n, cap):
        a_hi = min(n, t0 + cap)
        for t1 in range(t0, n, cap):
            yield slice(t0, a_hi), slice(t1, min(n, t1 + cap))


def tile_pair_indices(sa: slice, sb: slice) -> tuple[np.ndarray, np.ndarray]:
    """LOCAL (row, col) index arrays of the valid pairs inside one tile:
    the strict upper triangle for the diagonal tile, the full grid for an
    off-diagonal tile."""
    if sa.start == sb.start:
        return np.triu_indices(sa.stop - sa.start, 1)
    ia, ib = np.mgrid[0:sa.stop - sa.start, 0:sb.stop - sb.start]
    return ia.ravel(), ib.ravel()
