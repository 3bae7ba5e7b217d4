"""Point-in-polygon join (north_rule query type #2).

The reference computes only kNN joins; the north_rule adds PIP over the same
point tables.  Ray-Data-first design (SURVEY.md §7.2.7):

- polygons are the SMALL side: broadcast once with ``ray.put`` and held by an
  actor pool — never re-shipped per batch, never shuffled;
- the per-batch test is numpy-vectorized over all candidate points of a
  polygon after a bounding-box prefilter (and optionally a Morton cell-cover
  prefilter at scale);
- two predicates:
  * ``convex``: CCW cross-product sign test, closed edges
    (``cross >= 0``) — exactly reproducible in ANSI SQL, used by the oracle;
  * ``winding`` (default): even-odd ray casting, handles arbitrary simple
    (incl. concave) polygons with the standard half-open edge convention.

Output: inner-join pairs ``(point id, poly_id)`` — a point inside several
polygons emits several rows, a point inside none emits nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data



def cross_sign_inside(px: np.ndarray, py: np.ndarray, ring: list) -> np.ndarray:
    """Closed convex CCW test: inside iff every edge cross product >= 0.
    The SQL twin is emitted by :func:`convex_pip_sql_predicate` — identical
    float expression ``(x2-x1)*(py-y1) - (y2-y1)*(px-x1)``."""
    inside = np.ones(len(px), dtype=bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        inside &= (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= 0.0
    return inside


def ray_cast_inside(px: np.ndarray, py: np.ndarray, ring: list) -> np.ndarray:
    """Even-odd ray casting for arbitrary simple polygons (concave OK)."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        crosses = (y1 > py) != (y2 > py)
        if y2 != y1:
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            inside ^= crosses & (px < xint)
    return inside


_CELL_INDEX_MIN_POLYS = 16  # below this the flat bbox loop is cheapest


class _PipBatch:
    """Actor-pool stage: polygon index (rings + bboxes + grid cell cover)
    built once per actor in __init__ from the broadcast ref (SURVEY.md §2.6
    stateful stages).

    With many polygons, a per-batch loop over ALL of them degrades even
    with bbox prefilters; the cell-cover index maps each grid cell to the
    polygons whose bbox intersects it, so a point only tests the polygons
    covering its own cell (resolution picked from the median bbox width)."""

    def __init__(self, polys_ref, cols, method: str, id_type_str: str,
                 anti: bool = False):
        self.anti = anti
        polys = ray.get(polys_ref)
        self.polys = []
        for p in polys:
            ring = np.asarray(p["ring"], dtype=np.float64)
            bbox = (ring[:, 0].min(), ring[:, 1].min(),
                    ring[:, 0].max(), ring[:, 1].max())
            self.polys.append((p["poly_id"], [tuple(v) for v in ring], bbox))
        self.cols = cols
        self.test = cross_sign_inside if method == "convex" else ray_cast_inside
        self.id_type = pa.string() if id_type_str == "string" else pa.int64()
        self.cell_index = None
        if len(self.polys) >= _CELL_INDEX_MIN_POLYS:
            widths = [max(b[2] - b[0], b[3] - b[1], 1e-9)
                      for _, _, b in self.polys]
            res = int(np.clip(-np.log2(np.median(widths)), 1, 10))
            n = 1 << res
            index: dict[int, list[int]] = {}
            for pi, (_, _, (bx0, by0, bx1, by1)) in enumerate(self.polys):
                ix0 = max(0, min(n - 1, int(bx0 * n)))
                ix1 = max(0, min(n - 1, int(bx1 * n)))
                iy0 = max(0, min(n - 1, int(by0 * n)))
                iy1 = max(0, min(n - 1, int(by1 * n)))
                for ix in range(ix0, ix1 + 1):
                    for iy in range(iy0, iy1 + 1):
                        index.setdefault(ix * n + iy, []).append(pi)
            self.cell_index = {c: np.asarray(v, dtype=np.int64)
                               for c, v in index.items()}
            self.res = res

    def _pairs_flat(self, px, py):
        """(point_idx, poly_idx) hit pairs — flat loop over all polygons."""
        out_pt, out_pl = [], []
        for pli, (_, ring, (bx0, by0, bx1, by1)) in enumerate(self.polys):
            cand = np.nonzero((px >= bx0) & (px <= bx1)
                              & (py >= by0) & (py <= by1))[0]
            if len(cand) == 0:
                continue
            hit = cand[self.test(px[cand], py[cand], ring)]
            if len(hit):
                out_pt.append(hit)
                out_pl.append(np.full(len(hit), pli, dtype=np.int64))
        return out_pt, out_pl

    def _pairs_indexed(self, px, py):
        """Hit pairs via the cell-cover index: group the batch's points by
        grid cell, test each occupied cell's points only against the
        polygons covering that cell."""
        n = 1 << self.res
        ix = np.clip((px * n).astype(np.int64), 0, n - 1)
        iy = np.clip((py * n).astype(np.int64), 0, n - 1)
        cell = ix * n + iy
        order = np.argsort(cell, kind="stable")
        cs = cell[order]
        cells, starts = np.unique(cs, return_index=True)
        starts = np.append(starts, len(cs))
        out_pt, out_pl = [], []
        for ci, c in enumerate(cells):
            plist = self.cell_index.get(int(c))
            if plist is None:
                continue
            pts = order[starts[ci]:starts[ci + 1]]
            cx, cy = px[pts], py[pts]
            for pli in plist:
                _, ring, (bx0, by0, bx1, by1) = self.polys[pli]
                cand = np.nonzero((cx >= bx0) & (cx <= bx1)
                                  & (cy >= by0) & (cy <= by1))[0]
                if len(cand) == 0:
                    continue
                hit = cand[self.test(cx[cand], cy[cand], ring)]
                if len(hit):
                    out_pt.append(pts[hit])
                    out_pl.append(np.full(len(hit), pli, dtype=np.int64))
        return out_pt, out_pl

    def __call__(self, batch: pa.Table) -> pa.Table:
        idc, xc, yc = self.cols
        px = batch[xc].to_numpy(zero_copy_only=False)
        py = batch[yc].to_numpy(zero_copy_only=False)
        pid = batch[idc].to_numpy(zero_copy_only=False)
        if self.cell_index is not None:
            out_pt, out_pl = self._pairs_indexed(px, py)
        else:
            out_pt, out_pl = self._pairs_flat(px, py)
        if self.anti:
            # spatial anti-join: points contained by NO polygon
            inside = np.zeros(len(px), dtype=bool)
            if out_pt:
                inside[np.concatenate(out_pt)] = True
            return pa.table({"point_id": pa.array(pid[~inside],
                                                  self.id_type)})
        if not out_pt:
            return pa.table({"point_id": pa.array([], self.id_type),
                             "poly_id": pa.array([], pa.string())})
        pts = np.concatenate(out_pt)
        pls = np.concatenate(out_pl)
        poly_ids = np.array([p[0] for p in self.polys], dtype=object)
        return pa.table({
            "point_id": pa.array(pid[pts], self.id_type),
            "poly_id": pa.array(poly_ids[pls], pa.string()),
        })


def _pip_task(b: pa.Table, *, polys_ref, cols, method: str,
              id_type_str: str, anti: bool) -> pa.Table:
    """Task-map wrapper around :class:`_PipBatch` with per-worker state
    memoization (shuffle.worker_state)."""
    from .shuffle import worker_state
    fn = worker_state(("pip", polys_ref, cols, method, id_type_str, anti),
                      lambda: _PipBatch(polys_ref, cols, method,
                                        id_type_str, anti))
    return fn(b)


def point_in_polygon_join(points_ds: ray.data.Dataset, polygons: list[dict],
                          *, id_col: str = "doc_id", x_col: str = "x",
                          y_col: str = "y", method: str = "winding",
                          anti: bool = False,
                          concurrency=None) -> ray.data.Dataset:
    """Join points to the polygons containing them.

    ``polygons``: list of {"poly_id": str, "ring": [(x, y), ...]} dicts
    (CCW, simple).  ``method``: "winding" (any simple polygon) or "convex"
    (closed-edge cross test, SQL-reproducible).  ``anti=True`` inverts the
    join: emit the ids of points contained by NO polygon (spatial
    anti-join) — same broadcast index, no extra pass.
    """
    cols = (id_col, x_col, y_col)
    ref = ray.put(polygons)
    id_type = points_ds.schema().base_schema.field(id_col).type
    ts = "string" if pa.types.is_string(id_type) else "int"
    # plain task map (fuses with the upstream read); the polygon index is
    # memoized per worker process — see shuffle.worker_state
    return points_ds.select_columns(list(cols)).map_batches(
        _pip_task, batch_format="pyarrow",
        fn_kwargs=dict(polys_ref=ref, cols=cols, method=method,
                       id_type_str=ts, anti=anti))


def convex_pip_sql_predicate(polys: list[dict], px: str, py: str) -> str:
    """One SQL boolean expression per point: inside WHICH convex polygon —
    emitted as a chain usable in a lateral-style UNION.  Returns a SQL
    fragment ``(SELECT ... )`` producing (poly_id) rows; see
    __ray_entry__.oracle_sql for usage.  Float literals are repr()-exact so
    DuckDB evaluates the identical IEEE expression as the numpy path."""
    selects = []
    for p in polys:
        ring = p["ring"]
        n = len(ring)
        conds = []
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            conds.append(
                f"(({x2!r} - {x1!r}) * (({py}) - {y1!r}) - "
                f"({y2!r} - {y1!r}) * (({px}) - {x1!r}) >= 0.0)")
        selects.append(f"SELECT '{p['poly_id']}' AS poly_id WHERE "
                       + " AND ".join(conds))
    return " UNION ALL ".join(selects)
