"""Morton (Z-order) cell index over the unit square [0,1]².

The reference partitions the plane into equi-depth y-stripes
(/root/reference/PlaneSweepParallel/include/AllKnnResultStripes.h:189-307).
Our engine replaces 1-D stripes with a 2-D hierarchical cell scheme — an
H3/S2-equivalent for a planar unit-square domain (the reference's domain is
exactly [0,1]²: DatasetGenerator/main.cpp:38).  A cell at resolution ``res``
is one of ``4**res`` equal squares; its id is the Morton (bit-interleaved)
code of its integer grid coordinates, which gives

- ``parent(cell) == cell >> 2`` (hierarchy, like H3/S2 parent),
- spatial locality under integer order (Z-order curve),
- cheap ring-neighbor enumeration via de-interleaved (ix, iy).

Everything here is pure numpy and fully vectorized; no Python-per-row loops.
The same bit-spreading arithmetic is emitted as ANSI SQL by
:func:`morton_sql` so DuckDB oracles can reproduce cell ids exactly.
"""

from __future__ import annotations

import numpy as np

# Upper edge handling: points with coordinate exactly 1.0 belong to the last
# cell (the reference handles the closed upper edge with a 1.0001 sentinel,
# AllKnnResultStripesParallel.h:103-104; we clip the integer index instead).
MAX_RES = 16  # 2**16 cells per axis -> 4**16 ~ 4.3e9 cells; ids fit in int64.

_S1 = 0x5555555555555555
_S2 = 0x3333333333333333
_S4 = 0x0F0F0F0F0F0F0F0F
_S8 = 0x00FF00FF00FF00FF
_S16 = 0x0000FFFF0000FFFF


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each uint64 so they occupy even positions."""
    v = v & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(_S8)
    v = (v | (v << np.uint64(4))) & np.uint64(_S4)
    v = (v | (v << np.uint64(2))) & np.uint64(_S2)
    v = (v | (v << np.uint64(1))) & np.uint64(_S1)
    return v


def _unpart1by1(v: np.ndarray) -> np.ndarray:
    v = v & np.uint64(_S1)
    v = (v | (v >> np.uint64(1))) & np.uint64(_S2)
    v = (v | (v >> np.uint64(2))) & np.uint64(_S4)
    v = (v | (v >> np.uint64(4))) & np.uint64(_S8)
    v = (v | (v >> np.uint64(8))) & np.uint64(_S16)
    return v


def grid_coords(x: np.ndarray, y: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer grid coordinates (ix, iy) at resolution ``res``, clipped to the
    valid range so x==1.0 / y==1.0 land in the last cell."""
    n = 1 << res
    ix = np.clip(np.floor(np.asarray(x, dtype=np.float64) * n), 0, n - 1).astype(np.uint64)
    iy = np.clip(np.floor(np.asarray(y, dtype=np.float64) * n), 0, n - 1).astype(np.uint64)
    return ix, iy


def cell_id(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Morton cell id of each (x, y) at resolution ``res`` (int64)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    ix, iy = grid_coords(x, y, res)
    return ((_part1by1(ix) << np.uint64(1)) | _part1by1(iy)).astype(np.int64)


def cell_to_coords(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of the interleave: (ix, iy) from Morton ids."""
    c = np.asarray(cell).astype(np.uint64)
    return _unpart1by1(c >> np.uint64(1)), _unpart1by1(c)


def parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Parent cell id ``steps`` resolutions up (H3/S2-style hierarchy)."""
    return np.asarray(cell).astype(np.int64) >> np.int64(2 * steps)


def children(cell: int) -> np.ndarray:
    """The four child ids one resolution down."""
    return (np.int64(cell) << np.int64(2)) + np.arange(4, dtype=np.int64)


def cell_bounds(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x0, y0, x1, y1) bounds of each cell; half-open [x0,x1)×[y0,y1) except
    on the domain's upper edges, which are closed."""
    ix, iy = cell_to_coords(cell)
    w = 1.0 / (1 << res)
    x0 = ix.astype(np.float64) * w
    y0 = iy.astype(np.float64) * w
    return x0, y0, x0 + w, y0 + w


def ring_neighbors(cell: np.ndarray, res: int, r: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """All cells within Chebyshev distance ``r`` of each input cell
    (including the cell itself), clipped at the domain boundary.

    Returns ``(src_index, neighbor_cell)`` flat arrays: ``neighbor_cell[j]``
    is a neighbor of ``cell[src_index[j]]``.  This is the engine's halo-ring
    enumeration — the 2-D analogue of the reference probing stripes above and
    below the home stripe (PlaneSweepStripesAlgorithm.h:71-112).
    """
    cell = np.asarray(cell)
    ix, iy = cell_to_coords(cell)
    n = 1 << res
    offs = np.arange(-r, r + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    dx = dx.ravel()
    dy = dy.ravel()
    nx = ix.astype(np.int64)[:, None] + dx[None, :]
    ny = iy.astype(np.int64)[:, None] + dy[None, :]
    valid = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
    src, off = np.nonzero(valid)
    ncell = ((_part1by1(nx[src, off].astype(np.uint64)) << np.uint64(1))
             | _part1by1(ny[src, off].astype(np.uint64))).astype(np.int64)
    return src, ncell


def choose_resolution(n_training: int, k: int, points_per_cell: float = 256.0) -> int:
    """Pick a resolution so the expected points per cell ≈ max(points_per_cell, 4k).

    2-D generalization of the reference's stripe-count heuristic
    sqrt(N)/sqrt(k) stripes (AllKnnResultStripes.h:141-151): we want enough
    training rows per cell that ring-1 halos usually contain the true kNN,
    but cells small enough to parallelize and prune.
    """
    target = max(points_per_cell, 4.0 * k)
    if n_training <= target:
        return 0
    res = int(round(0.5 * np.log2(n_training / target)))
    return max(0, min(MAX_RES, res))


def morton_sql(x_expr: str, y_expr: str, res: int) -> str:
    """ANSI-SQL (DuckDB) expression computing the SAME Morton cell id as
    :func:`cell_id` for coordinates in [0,1].  Used by oracle queries."""
    n = 1 << res

    def part(e: str) -> str:
        v = f"least(floor(({e}) * {n})::BIGINT, {n - 1})"
        v = f"(({v} | ({v} << 8)) & {_S8})"
        v = f"(({v} | ({v} << 4)) & {_S4})"
        v = f"(({v} | ({v} << 2)) & {_S2})"
        v = f"(({v} | ({v} << 1)) & {_S1})"
        return v

    return f"(({part(x_expr)} << 1) | {part(y_expr)})"


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash6(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Precision-6 geohash strings for unit-square coordinates (x = the
    longitude axis, leading bit, per the standard) — 30 interleaved bits
    (15/axis, inside :func:`_part1by1`'s 16-bit envelope) base32-encoded
    with the canonical geohash alphabet.  Fully vectorized: one Morton
    interleave + one fancy-index into the alphabet byte table; SQL twin
    = :func:`morton_sql` (res 15) + 6 substr() lookups."""
    ix, iy = grid_coords(x, y, 15)
    m = (_part1by1(ix) << np.uint64(1)) | _part1by1(iy)
    alpha = np.frombuffer(GEOHASH_ALPHABET.encode(), dtype=np.uint8)
    chars = np.empty((len(m), 6), dtype=np.uint8)
    for c in range(6):
        chars[:, c] = alpha[((m >> np.uint64(25 - 5 * c))
                             & np.uint64(31)).astype(np.int64)]
    return np.ascontiguousarray(chars).view("S6").ravel().astype(str)


def geohash6_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB expression computing the SAME precision-6 geohash."""
    m = morton_sql(x_expr, y_expr, 15)
    parts = [f"substr('{GEOHASH_ALPHABET}', "
             f"((({m}) >> {25 - 5 * c}) & 31)::INT + 1, 1)"
             for c in range(6)]
    return " || ".join(parts)


def hilbert_key(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Hilbert-curve index d ∈ [0, 4^order) for unit-square coordinates —
    the locality-preserving alternative to the Morton order the cell index
    uses (adjacent d values are ALWAYS adjacent cells, which Morton does
    not guarantee; better range-scan locality for spatial storage keys).

    Vectorized xy2d: per bit level s (high→low), accumulate the quadrant's
    curve offset s²·((3·rx) XOR ry) and rotate/reflect the frame — pure
    int64 masks and wheres, no per-point Python.  Exactly mirrored by
    :func:`hilbert_sql` (the same loop unrolled as a chained-CTE twin)."""
    ix, iy = grid_coords(x, y, order)
    X = ix.astype(np.int64)
    Y = iy.astype(np.int64)
    d = np.zeros(len(X), np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((X & s) > 0).astype(np.int64)
        ry = ((Y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        r0 = ry == 0
        flip = r0 & (rx == 1)
        X = np.where(flip, s - 1 - X, X)
        Y = np.where(flip, s - 1 - Y, Y)
        X, Y = np.where(r0, Y, X), np.where(r0, X, Y)
        s >>= 1
    return d


def hilbert_sql(x_expr: str, y_expr: str, order: int, *,
                carry: str = "doc_id", relation: str = "pts") -> str:
    """Chained-CTE fragment computing the SAME Hilbert index as
    :func:`hilbert_key` — one CTE per bit level (the rotation makes each
    level's x/y depend on the previous level's, so a single expression
    would grow 3^order; the CTE chain stays linear).  Appends to an
    existing WITH chain (leading comma); the input CTE/table named by
    ``relation`` (default ``pts``) must provide ``carry``, ``x``, ``y``
    in [0,1]².  The final CTE is ``hfin (carry, hkey)``."""
    n = 1 << order
    ctes = [f""", h{order} AS (
  SELECT {carry},
         least(floor(x * {n})::BIGINT, {n - 1}) AS hx,
         least(floor(y * {n})::BIGINT, {n - 1}) AS hy,
         0::BIGINT AS d
  FROM {relation})"""]
    lvl = order
    s = n >> 1
    while s > 0:
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        ctes.append(f""", h{lvl - 1} AS (
  SELECT {carry},
         d + {s * s} * xor(3 * {rx}, {ry})::BIGINT AS d,
         CASE WHEN (hy & {s}) = 0 THEN
              CASE WHEN (hx & {s}) > 0 THEN {s - 1} - hy ELSE hy END
              ELSE hx END AS hx,
         CASE WHEN (hy & {s}) = 0 THEN
              CASE WHEN (hx & {s}) > 0 THEN {s - 1} - hx ELSE hx END
              ELSE hy END AS hy
  FROM h{lvl})""")
        lvl -= 1
        s >>= 1
    ctes.append(f", hfin AS (SELECT {carry}, d AS hkey FROM h0)")
    return "".join(ctes)
