"""Hexagonal cell index (the H3/S2-style alternative to the Morton grid).

The north star names an "H3/S2 cell-indexed partitioning scheme"; the
engine's primary index is the Morton square grid (functions/grid.py — the
2-D generalization of the reference's stripes, AllKnnResultStripes.h), and
this module supplies the hexagonal variant: pointy-top hexes addressed by
axial coordinates ``(hq, hr)``, the public H3-style addressing (axial/cube
coordinates and cube rounding are standard public hex-grid math).

Hexes beat squares for spatial partitioning in one concrete way: all 6
neighbors are edge-neighbors at the SAME center distance, so a halo ring is
isotropic (a square cell's 8-ring mixes edge and corner neighbors at two
distances).  :func:`ring1` exposes that uniform 6-neighborhood.

Every function is vectorized numpy AND emits the identical IEEE expression
sequence in DuckDB SQL (:func:`hex_sql_cte`) so hex assignment sits under
the driver's bit-exact value-hash gate: same multiply/divide order, ties
rounded with ``floor(v + 0.5)`` on both sides (SQL ``round()`` is
half-away-from-zero, numpy's is half-even — neither is used).
"""

from __future__ import annotations

import numpy as np

SQRT3 = np.sqrt(3.0)


def axial_fractional(x: np.ndarray, y: np.ndarray, size: float):
    """Fractional axial coords of points (pointy-top, hex circumradius
    ``size``).  Same expression order as the SQL twin."""
    cq = (SQRT3 / 3.0 * x - y / 3.0) / size
    cr = (2.0 / 3.0 * y) / size
    return cq, cr


def cube_round(cq: np.ndarray, cr: np.ndarray):
    """Standard cube rounding: round each cube coord, then fix the one with
    the largest rounding error so x+y+z == 0 holds.  Branches are mutually
    exclusive, so each output reads only UNFIXED rounded values — the SQL
    twin relies on that to stay a pair of independent CASE expressions."""
    cx, cz = cq, cr
    cy = -cq - cr
    rx = np.floor(cx + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(cz + 0.5)
    dx = np.abs(rx - cx)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    hq = np.where(fix_x, -ry - rz, rx).astype(np.int64)
    hr = np.where(fix_z, -rx - ry, rz).astype(np.int64)
    return hq, hr


def hex_assign(x: np.ndarray, y: np.ndarray, size: float):
    """(hq, hr) int64 axial hex ids for points — the hex ``cell_id``."""
    return cube_round(*axial_fractional(np.asarray(x, np.float64),
                                        np.asarray(y, np.float64), size))


def hex_center(hq: np.ndarray, hr: np.ndarray, size: float):
    """Center point of axial hex (hq, hr) — the inverse map (raster->vector
    side of the hex grid)."""
    cx = size * (SQRT3 * hq + SQRT3 / 2.0 * hr)
    cy = size * (1.5 * hr)
    return cx, cy


def ring1(hq: np.ndarray, hr: np.ndarray):
    """The 6 edge-neighbors of each hex — the isotropic halo ring.
    Returns (6n,) arrays tiled in axial direction order."""
    dq = np.array([1, 1, 0, -1, -1, 0], dtype=np.int64)
    dr = np.array([0, -1, -1, 0, 1, 1], dtype=np.int64)
    q = np.repeat(np.asarray(hq, np.int64), 6) + np.tile(dq, len(hq))
    r = np.repeat(np.asarray(hr, np.int64), 6) + np.tile(dr, len(hr))
    return q, r


def hex_sql_cte(src: str, size: float, *, x_col: str = "x",
                y_col: str = "y") -> str:
    """CTE chain computing ``hq``/``hr`` for every row of ``src`` with the
    SAME IEEE operation sequence as :func:`hex_assign`.  Appends CTEs named
    ``hex0..hex`` — select from ``hex``."""
    s = repr(float(size))
    return f"""
, hex0 AS (
  SELECT *, (sqrt(3)/3 * {x_col} - {y_col}/3) / {s} AS cq,
            (2.0/3 * {y_col}) / {s} AS cr
  FROM {src}
), hex1 AS (
  SELECT *, floor(cq + 0.5) AS rx, floor(-cq - cr + 0.5) AS ry,
            floor(cr + 0.5) AS rz
  FROM hex0
), hex2 AS (
  SELECT *, abs(rx - cq) AS dx, abs(ry - (-cq - cr)) AS dy,
            abs(rz - cr) AS dz
  FROM hex1
), hex AS (
  SELECT *,
    (CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END)::BIGINT AS hq,
    (CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
          THEN -rx - ry ELSE rz END)::BIGINT AS hr
  FROM hex2
)
"""
