"""Raster <-> vector tile assignment and zonal statistics (north_rule #3).

A "tile" is a Morton cell at a chosen tile resolution — the raster grid IS
the cell hierarchy (SURVEY.md §7.2.8), so tile math reuses
:mod:`..functions.grid` and every tile id is SQL-reproducible via
``grid.morton_sql``.

Operators:
- :func:`assign_tiles` — vector->raster assignment: add a ``tile_id`` column
  (stateless, embarrassingly parallel map_batches; the Ray analogue of the
  reference's parallel stripe split, AllKnnResultStripesParallel.h:36-142).
- :func:`tile_aggregate` — zonal statistics per tile with a *partial
  aggregation combiner*: per-batch numpy groupby first, then a small
  ``groupby(tile_id)`` over partials — the shuffle moves one row per
  (batch, tile), not per point.
- :func:`raster_to_vector` — raster->vector: tile table -> cell-bounds
  rectangles (vector features) filtered by a value predicate.
- :func:`synthetic_raster` — deterministic raster fixture: value = seeded
  f(tile center), same arithmetic emitted by :func:`synthetic_raster_sql`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import grid

_MV = 2862933555777941757  # splitmix-style odd multiplier for raster values
_MOD = 4294967296

# Grids with at most this many cells score hotspots on a dense array in
# one remote task (int64 grid + padded copy = ~256 MiB at the gate);
# larger grids keep the sharded fan-out + sorted-join path.
_DENSE_GRID_CELLS = 1 << 24


def assign_tiles(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
                 y_col: str = "y", out_col: str = "tile_id") -> ray.data.Dataset:
    def add_tile(b: pa.Table) -> pa.Table:
        t = grid.cell_id(b[x_col].to_numpy(zero_copy_only=False),
                         b[y_col].to_numpy(zero_copy_only=False), res)
        return b.append_column(out_col, pa.array(t, pa.int64()))
    return ds.map_batches(add_tile, batch_format="pyarrow")


def _partial_tile_agg(b: pa.Table, *, res: int, x_col: str, y_col: str,
                      value_col: str | None) -> pa.Table:
    """Per-batch combiner: one output row per distinct tile in the batch."""
    t = grid.cell_id(b[x_col].to_numpy(zero_copy_only=False),
                     b[y_col].to_numpy(zero_copy_only=False), res)
    tiles, inv, cnt = np.unique(t, return_inverse=True, return_counts=True)
    cols = {"tile_id": pa.array(tiles, pa.int64()),
            "n_": pa.array(cnt, pa.int64())}
    if value_col is not None:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cols["sum_"] = pa.array(np.bincount(inv, weights=v,
                                            minlength=len(tiles)))
        vmin = np.full(len(tiles), np.inf)
        np.minimum.at(vmin, inv, v)
        vmax = np.full(len(tiles), -np.inf)
        np.maximum.at(vmax, inv, v)
        cols["min_"] = pa.array(vmin)
        cols["max_"] = pa.array(vmax)
    return pa.table(cols)


def tile_aggregate(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
                   y_col: str = "y", value_col: str | None = None
                   ) -> ray.data.Dataset:
    """Zonal stats: per-tile count (and sum/min/max/mean of ``value_col``).

    Pre-aggregates inside map_batches so the groupby shuffle is tiny
    (ray_guide: partial aggregation pattern).
    """
    import pandas as pd

    from .shuffle import sorted_block_reduce
    partial = ds.map_batches(
        _partial_tile_agg, batch_format="pyarrow", batch_size=None,
        fn_kwargs=dict(res=res, x_col=x_col, y_col=y_col, value_col=value_col))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if value_col is None:
            out = g.groupby("tile_id", sort=False).agg(
                n=("n_", "sum")).reset_index()
        else:
            out = g.groupby("tile_id", sort=False).agg(
                n=("n_", "sum"), value_sum=("sum_", "sum"),
                value_min=("min_", "min"),
                value_max=("max_", "max")).reset_index()
            out["value_mean"] = out["value_sum"] / out["n"]
        out["n"] = out["n"].astype(np.int64)
        return out

    return sorted_block_reduce(partial, "tile_id", combine)


def tile_pyramid(ds: ray.data.Dataset, res_fine: int, res_coarse: int, *,
                 x_col: str = "x", y_col: str = "y") -> ray.data.Dataset:
    """Tile-pyramid rollup: per-tile counts for EVERY level in
    ``[res_coarse, res_fine]`` — the map-tiling zoom stack.

    One pass builds the finest level (partial-agg combiner), then ONE
    shuffle keyed by each fine tile's ``res_coarse`` ancestor co-locates
    whole subtrees, and all coarser levels are rolled up vectorized inside
    the block (a parent at Morton resolution r-1 is ``tile >> 2``).
    Output: (level:int32, tile_id:int64, n:int64)."""
    assert 0 <= res_coarse <= res_fine
    import pandas as pd

    from ..functions import grid
    from .shuffle import sorted_block_reduce
    base = tile_aggregate(ds, res_fine, x_col=x_col, y_col=y_col)

    def add_root(b: pa.Table) -> pa.Table:
        t = b["tile_id"].to_numpy(zero_copy_only=False)
        root = grid.parent(t, res_fine - res_coarse)
        return pa.table({"root__": pa.array(root, pa.int64()),
                         "tile_id": b["tile_id"],
                         "n": b["n"].combine_chunks().cast(pa.int64())})

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        cur = g[["tile_id", "n"]].copy()
        for level in range(res_fine, res_coarse - 1, -1):
            out = cur.groupby("tile_id", sort=False)["n"].sum().reset_index()
            frames.append(pd.DataFrame({
                "level": np.full(len(out), level, dtype=np.int32),
                "tile_id": out["tile_id"].astype(np.int64),
                "n": out["n"].astype(np.int64)}))
            cur = pd.DataFrame({"tile_id": out["tile_id"].to_numpy() >> 2,
                                "n": out["n"]})
        return pd.concat(frames, ignore_index=True)

    return sorted_block_reduce(base.map_batches(add_root,
                                                batch_format="pyarrow"),
                               "root__", rollup)


def raster_to_vector(tiles_ds: ray.data.Dataset, res: int,
                     *, tile_col: str = "tile_id") -> ray.data.Dataset:
    """Raster -> vector: emit each tile as a rectangle feature
    (tile_id, x0, y0, x1, y1) plus all original columns."""
    def to_rect(b: pa.Table) -> pa.Table:
        x0, y0, x1, y1 = grid.cell_bounds(
            b[tile_col].to_numpy(zero_copy_only=False), res)
        return (b.append_column("x0", pa.array(x0))
                 .append_column("y0", pa.array(y0))
                 .append_column("x1", pa.array(x1))
                 .append_column("y1", pa.array(y1)))
    return tiles_ds.map_batches(to_rect, batch_format="pyarrow")


def raster_value(tile_id: np.ndarray) -> np.ndarray:
    """Deterministic synthetic raster value per tile in [0,1) — pure modular
    arithmetic, reproducible in SQL by :func:`raster_value_sql`."""
    t = np.asarray(tile_id, dtype=np.uint64)
    return (((t + np.uint64(1)) * np.uint64(_MV)) % np.uint64(_MOD)
            ).astype(np.float64) / _MOD


def raster_value_sql(tile_expr: str) -> str:
    # Reduce mod 2^32 before multiplying (exact for modular math) and go
    # through HUGEINT: the product can exceed BIGINT and DuckDB errors on
    # integer overflow rather than wrapping.
    m32 = _MV % _MOD
    return (f"((((({tile_expr}) % {_MOD} + 1)::HUGEINT * {m32}) % {_MOD})"
            f" / {_MOD}.0)")


def synthetic_raster(res: int) -> pa.Table:
    """Full raster at resolution ``res`` (use small res): every tile with its
    deterministic value — the raster-side fixture (FIXTURES.md F5)."""
    n = 1 << res
    ix, iy = np.meshgrid(np.arange(n, dtype=np.float64),
                         np.arange(n, dtype=np.float64), indexing="ij")
    w = 1.0 / n
    tid = grid.cell_id(ix.ravel() * w, iy.ravel() * w, res)
    tid = np.sort(tid)
    return pa.table({
        "tile_id": pa.array(tid, pa.int64()),
        "res": pa.array(np.full(len(tid), res, dtype=np.int32)),
        "value": pa.array(raster_value(tid)),
    })


# ---------------------------------------------------------------------------
# Hexagonal (H3-style) tiling — functions/hexgrid.py
# ---------------------------------------------------------------------------

def assign_hexes(ds: ray.data.Dataset, size: float, *, x_col: str = "x",
                 y_col: str = "y") -> ray.data.Dataset:
    """Vector->hex assignment: add axial ``(hq, hr)`` columns (stateless
    map_batches; the hex twin of :func:`assign_tiles`)."""
    from ..functions import hexgrid

    def add_hex(b: pa.Table) -> pa.Table:
        hq, hr = hexgrid.hex_assign(
            b[x_col].to_numpy(zero_copy_only=False),
            b[y_col].to_numpy(zero_copy_only=False), size)
        return b.append_column("hq", pa.array(hq, pa.int64())) \
                .append_column("hr", pa.array(hr, pa.int64()))
    return ds.map_batches(add_hex, batch_format="pyarrow")


def hex_aggregate(ds: ray.data.Dataset, size: float, *, x_col: str = "x",
                  y_col: str = "y") -> ray.data.Dataset:
    """Per-hex zonal stats with the partial-aggregation combiner: per-batch
    numpy groupby on the packed axial key, then a tiny shuffle — one row
    per (batch, hex) moves, never raw points.  Extrema (min/max) are
    order-independent in IEEE f64, so the output is bit-exact against SQL
    regardless of batch boundaries."""
    import pandas as pd

    from ..functions import hexgrid
    from .shuffle import sorted_block_reduce

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False)
        y = b[y_col].to_numpy(zero_copy_only=False)
        hq, hr = hexgrid.hex_assign(x, y, size)
        key = hq * np.int64(1 << 32) + hr  # |axial| << 2^31 at any size
        ks, first, inv, cnt = np.unique(key, return_index=True,
                                        return_inverse=True,
                                        return_counts=True)
        xmin = np.full(len(ks), np.inf)
        np.minimum.at(xmin, inv, x)
        xmax = np.full(len(ks), -np.inf)
        np.maximum.at(xmax, inv, x)
        return pa.table({
            "key__": pa.array(ks, pa.int64()),
            "hq": pa.array(hq[first], pa.int64()),
            "hr": pa.array(hr[first], pa.int64()),
            "n_": pa.array(cnt, pa.int64()),
            "xmin_": pa.array(xmin), "xmax_": pa.array(xmax)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["hq", "hr"], sort=False).agg(
            n=("n_", "sum"), min_x=("xmin_", "min"),
            max_x=("xmax_", "max")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return sorted_block_reduce(partials, "key__", combine)


def kde_heatmap(ds: ray.data.Dataset, res: int, bandwidth: float, *,
                x_col: str = "x", y_col: str = "y") -> ray.data.Dataset:
    """Kernel-density heatmap rasterization: every point splats a biweight
    (quartic) kernel ``(1 - d²/R²)²`` onto the ``res×res`` tile grid within
    center-distance ``R = bandwidth``; per-tile densities come back as a
    raster.  The vector->raster "heatmap" operator.

    Bit-exactness strategy (the float-sum-order problem): the kernel value
    is QUANTIZED to an integer weight ``floor(w * 2^20)`` computed with a
    fixed IEEE op sequence (pure arithmetic, no libm), per-tile weights are
    summed as int64 (order-independent, exact), and the final density is an
    exact power-of-two scaling — so any batch/shuffle order produces the
    identical bit pattern the SQL oracle computes.

    Fully vectorized: each batch expands points × the (2m+1)² candidate
    offset window (m = ceil(R·res)+1), filters by the true circular
    support, and partial-aggregates per tile before the shuffle — the
    exchange moves one row per (batch, touched tile)."""
    import pandas as pd

    from .shuffle import sorted_block_reduce
    R = float(bandwidth)
    m = int(np.ceil(R * res)) + 1
    offs = np.arange(-m, m + 1, dtype=np.int64)
    di = np.repeat(offs, len(offs))
    dj = np.tile(offs, len(offs))
    # prune offsets that can never reach the support: the closest a point
    # in cell (0,0) can be to the center of cell (di,dj) is
    # max(|d|-0.5, 0)/res per axis (conservative, result-identical —
    # drops ~60% of the candidate window at typical R·res)
    near = ((np.maximum(np.abs(di) - 0.5, 0.0) ** 2
             + np.maximum(np.abs(dj) - 0.5, 0.0) ** 2) / (res * res)
            <= R * R)
    di, dj = di[near], dj[near]

    def splat(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False)
        y = b[y_col].to_numpy(zero_copy_only=False)
        bi = np.floor(x * res).astype(np.int64)
        bj = np.floor(y * res).astype(np.int64)
        # one vectorized pass per candidate offset into a dense float64
        # accumulator (bincount): same flops as the flat n×offsets
        # expansion but no 80M-row intermediates, cache-resident masks.
        # Exact: weights are integer-valued and every partial sum stays
        # far below 2^53, so float64 accumulation is lossless.
        wsum = np.zeros(res * res)
        for o in range(len(di)):
            ti = bi + di[o]
            tj = bj + dj[o]
            ok = (ti >= 0) & (ti < res) & (tj >= 0) & (tj < res)
            tio, tjo, px, py = ti[ok], tj[ok], x[ok], y[ok]
            cx = (tio + 0.5) / res
            cy = (tjo + 0.5) / res
            d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
            near_ok = d2 <= R * R
            u = d2[near_ok] / (R * R)
            w = np.floor((1.0 - u) * (1.0 - u) * 1048576.0)
            key = tio[near_ok] * res + tjo[near_ok]
            wsum += np.bincount(key, weights=w, minlength=res * res)
        nz = np.nonzero(wsum)[0]
        return pa.table({"tile_key": pa.array(nz.astype(np.int64)),
                         "w_": pa.array(wsum[nz].astype(np.int64))})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tile_key", sort=False)["w_"].sum().reset_index()
        out["ti"] = (out["tile_key"] // res).astype(np.int64)
        out["tj"] = (out["tile_key"] % res).astype(np.int64)
        out["density"] = out["w_"] / 1048576.0
        out = out.rename(columns={"w_": "w_sum"})
        return out[["ti", "tj", "w_sum", "density"]]

    partials = ds.map_batches(splat, batch_format="pyarrow",
                              batch_size=None)
    return sorted_block_reduce(partials, "tile_key", combine)


def hotspot_cells(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
                  y_col: str = "y") -> ray.data.Dataset:
    """Getis-Ord Gi* hotspot detection over the ``res×res`` cell grid
    (public spatial-statistics method): for every NONEMPTY cell, the
    z-score of its 3×3-neighborhood count sum against the global count
    distribution (all ``n = res²`` cells, empties included as zeros).

    Everything derives from integer per-cell counts — neighborhood sums
    are int64 (order-independent), the mean/variance/z expressions use one
    fixed IEEE op sequence, and sqrt is correctly rounded by IEEE 754 —
    so z-scores are bit-exact against the SQL twin.

    Distribution: per-batch partial counts; each cell's count is
    flat-mapped to its ≤9 in-grid neighborhood targets; one small shuffle
    per stage (rows ∝ nonempty cells, never points).  Global scalars
    (T, ΣX²) ride a tiny driver-side aggregate of the cell partials —
    O(nonempty cells), the broadcast-small-side pattern."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    # grid-cell counts (row-major key i*res+j), partial-agg per batch
    def count_partial(b: pa.Table) -> pa.Table:
        i = np.floor(b[x_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        j = np.floor(b[y_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        np.clip(i, 0, res - 1, out=i)
        np.clip(j, 0, res - 1, out=j)
        cnt = np.bincount(i * res + j, minlength=res * res)
        nz = np.nonzero(cnt)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n_": pa.array(cnt[nz].astype(np.int64))})

    def count_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cell", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = ds.map_batches(count_partial, batch_format="pyarrow",
                              batch_size=None)
    counts = sorted_block_reduce(partials, "cell", count_combine) \
        .materialize()

    N = res * res
    if N <= _DENSE_GRID_CELLS:
        # dense path: the whole cell grid fits one task's heap (int64
        # grid + padded copy; 128 MiB at the 16M-cell gate), so the
        # neighborhood sum is 9 shifted adds on a dense (res, res) array
        # and scoring happens in the SAME task — replaces a fan-out
        # shuffle + a sorted join with one remote task.  All integer
        # arithmetic and the IEEE score sequence are identical to the
        # sharded path, so z-scores stay bit-exact.
        @ray.remote
        def _score_dense(*tbls):
            grid = np.zeros(N, dtype=np.int64)
            for t in tbls:
                if t.num_rows and "cell" in t.column_names:
                    np.add.at(grid,
                              t["cell"].to_numpy(zero_copy_only=False),
                              t["n"].to_numpy(zero_copy_only=False))
            nzc = np.nonzero(grid)[0]
            if len(nzc) == 0:
                return pa.table({"cell": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "g": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.int64()),
                                 "z": pa.array([], pa.float64())})
            nz = grid[nzc]
            T = int(nz.sum())
            SSQ = int((nz.astype(object) ** 2).sum())
            P = np.zeros((res + 2, res + 2), dtype=np.int64)
            P[1:-1, 1:-1] = grid.reshape(res, res)
            G = np.zeros((res, res), dtype=np.int64)
            for di in (0, 1, 2):
                for dj in (0, 1, 2):
                    G += P[di:di + res, dj:dj + res]
            g = G.reshape(-1)[nzc]
            ci, cj = nzc // res, nzc % res
            wi = 3 - (ci == 0) - (ci == res - 1)
            wj = 3 - (cj == 0) - (cj == res - 1)
            w = (wi * wj).astype(np.int64)
            xbar = T / N
            s = np.sqrt(SSQ / N - xbar * xbar)
            z = (g - xbar * w) / (s * np.sqrt((N * w - w * w) / (N - 1.0)))
            return pa.table({"cell": pa.array(nzc, pa.int64()),
                             "n": pa.array(nz, pa.int64()),
                             "g": pa.array(g, pa.int64()),
                             "w": pa.array(w, pa.int64()),
                             "z": pa.array(z, pa.float64())})

        return ray.data.from_arrow_refs(
            [_score_dense.remote(*counts.to_arrow_refs())])

    # global scalars from the (small) per-cell count table
    tot = counts.to_pandas()
    T = int(tot["n"].sum())
    SSQ = int((tot["n"].astype(object) ** 2).sum())
    N = res * res

    # neighborhood fan-out: each cell contributes its count to every
    # in-grid cell of its 3x3 window (incl. itself)
    def fanout(b: pa.Table) -> pa.Table:
        cell = b["cell"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        ci, cj = cell // res, cell % res
        outs = []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                ti, tj = ci + di, cj + dj
                ok = (ti >= 0) & (ti < res) & (tj >= 0) & (tj < res)
                outs.append((ti[ok] * res + tj[ok], n[ok]))
        tgt = np.concatenate([o[0] for o in outs])
        val = np.concatenate([o[1] for o in outs])
        ks, inv = np.unique(tgt, return_inverse=True)
        s = np.zeros(len(ks), dtype=np.int64)
        np.add.at(s, inv, val)
        return pa.table({"cell": pa.array(ks, pa.int64()),
                         "g_": pa.array(s, pa.int64())})

    def nb_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cell", sort=False)["g_"].sum().reset_index(name="g")
        out["g"] = out["g"].astype(np.int64)
        return out

    nbsum = sorted_block_reduce(counts.map_batches(
        fanout, batch_format="pyarrow"), "cell", nb_combine)

    # join neighborhood sums back to the nonempty cells and score.
    # Fixed IEEE sequence (mirrored in SQL): xbar = T/N;
    # s = sqrt(SSQ/N - xbar*xbar); w = in-grid window size;
    # z = (g - xbar*w) / (s * sqrt((N*w - w*w) / (N - 1.0)))
    from .join import sorted_join
    joined = sorted_join(
        counts, nbsum, left_on="cell", right_on="cell",
        left_fields={"cell": pa.int64(), "n": pa.int64()},
        right_fields={"cell": pa.int64(), "g": pa.int64()},
        coalesce=4)

    def score(b: pa.Table) -> pa.Table:
        cell = b["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = b["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci, cj = cell // res, cell % res
        wi = 3 - (ci == 0) - (ci == res - 1)
        wj = 3 - (cj == 0) - (cj == res - 1)
        w = (wi * wj).astype(np.int64)
        xbar = T / N
        s = np.sqrt(SSQ / N - xbar * xbar)
        z = (g - xbar * w) / (s * np.sqrt((N * w - w * w) / (N - 1.0)))
        return pa.table({
            "cell": pa.array(cell, pa.int64()),
            "n": b["n"].combine_chunks().cast(pa.int64()),
            "g": pa.array(g, pa.int64()),
            "w": pa.array(w, pa.int64()),
            "z": pa.array(z, pa.float64())})

    return joined.map_batches(score, batch_format="pyarrow")


def idw_surface(data: ray.data.Dataset, res: int, k: int, *,
                value_col: str = "value", id_col: str = "doc_id",
                x_col: str = "x", y_col: str = "y",
                eps: float = 1e-06) -> ray.data.Dataset:
    """Inverse-distance-weighted surface interpolation: for every center of
    the ``res×res`` grid, the IDW average of its ``k`` nearest data values
    (vector -> continuous raster; the classic public IDW estimator).

    Rides the flagship all-kNN join with the grid centers as the query
    side, then re-attaches data values by neighbor id (the knn_payload
    pattern — values never enter the spatial shuffle).  Weights are
    floor-quantized ``floor(2^20 / (eps + d²))`` int64 and the weighted
    sums are integer (order-independent, exact), so the surface is
    bit-exact against the SQL twin for integer-valued ``value_col``."""
    import pandas as pd

    from .join import sorted_join
    from .knn import aknn_join
    from .shuffle import sorted_block_reduce

    ij = np.arange(res, dtype=np.int64)
    gi = np.repeat(ij, res)
    gj = np.tile(ij, res)
    grid_tbl = pa.table({
        id_col: pa.array(gi * res + gj, pa.int64()),
        x_col: pa.array((gi + 0.5) / res),
        y_col: pa.array((gj + 0.5) / res)})
    grid_ds = ray.data.from_arrow(grid_tbl)

    nn = aknn_join(grid_ds, data.select_columns([id_col, x_col, y_col]),
                   k, id_col=id_col, x_col=x_col, y_col=y_col,
                   pad=False, sort_output=False)
    vals = data.select_columns([id_col, value_col])
    joined = sorted_join(
        nn, vals, left_on="neighbor_id", right_on=id_col,
        left_fields={"input_id": pa.int64(), "rank": pa.int32(),
                     "neighbor_id": pa.int64(),
                     "distance_sq": pa.float64()},
        right_fields={id_col: pa.int64(), value_col: pa.int64()},
        coalesce_left=8)

    def partial(b: pa.Table) -> pa.Table:
        gid = b["input_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = b["distance_sq"].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.floor(1048576.0 / (eps + d2)).astype(np.int64)
        ks, inv = np.unique(gid, return_inverse=True)
        ws = np.zeros(len(ks), dtype=np.int64)
        wvs = np.zeros(len(ks), dtype=np.int64)
        ns = np.zeros(len(ks), dtype=np.int64)
        np.add.at(ws, inv, w)
        np.add.at(wvs, inv, w * v)
        np.add.at(ns, inv, 1)
        return pa.table({"gid": pa.array(ks, pa.int64()),
                         "w_": pa.array(ws, pa.int64()),
                         "wv_": pa.array(wvs, pa.int64()),
                         "n_": pa.array(ns, pa.int64())})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("gid", sort=False).agg(
            w_sum=("w_", "sum"), wv_sum=("wv_", "sum"),
            n_used=("n_", "sum")).reset_index()
        out["gx"] = ((out["gid"] // res) + 0.5) / res
        out["gy"] = ((out["gid"] % res) + 0.5) / res
        out["idw"] = out["wv_sum"] / out["w_sum"]
        for c in ("gid", "w_sum", "wv_sum", "n_used"):
            out[c] = out[c].astype(np.int64)
        return out[["gid", "gx", "gy", "n_used", "idw"]]

    return sorted_block_reduce(joined.map_batches(
        partial, batch_format="pyarrow", batch_size=None), "gid", combine)


def raster_algebra(a: ray.data.Dataset, b: ray.data.Dataset, *,
                   tile_col: str = "tile_id") -> ray.data.Dataset:
    """Raster map algebra: align two rasters on ``tile_id`` (partitioned
    equi-join) and emit combined bands — sum, product and a reclassified
    discrete class (quartile of the product).  The classic two-layer
    overlay; any per-tile expression slots into the same join."""
    from .join import sorted_join

    joined = sorted_join(
        a.select_columns([tile_col, "value"]),
        b.select_columns([tile_col, "value"]).map_batches(
            lambda t: t.rename_columns([tile_col + "_b", "value_b"]),
            batch_format="pyarrow"),
        left_on=tile_col, right_on=tile_col + "_b",
        left_fields={tile_col: pa.int64(), "value": pa.float64()},
        right_fields={tile_col + "_b": pa.int64(),
                      "value_b": pa.float64()},
        coalesce=4)

    def algebra(t: pa.Table) -> pa.Table:
        va = t["value"].to_numpy(zero_copy_only=False)
        vb = t["value_b"].to_numpy(zero_copy_only=False)
        prod = va * vb
        cls = np.floor(prod * 4.0).astype(np.int32)
        return pa.table({
            tile_col: t[tile_col].combine_chunks().cast(pa.int64()),
            "v_sum": pa.array(va + vb),
            "v_prod": pa.array(prod),
            "v_class": pa.array(np.clip(cls, 0, 3), pa.int32())})

    return joined.map_batches(algebra, batch_format="pyarrow")


def zonal_majority(ds: ray.data.Dataset, res_fine: int, res_coarse: int, *,
                   x_col: str = "x", y_col: str = "y") -> ray.data.Dataset:
    """Zonal majority (modal class): classify each point by its fine tile's
    synthetic raster class (value quartile), then per COARSE zone report
    the most frequent class — ties broken by the smaller class id
    (deterministic).  Per-batch partial (zone, class) counts; the final
    argmax runs vectorized on the co-located reduce block."""
    import pandas as pd

    from ..functions import grid as _grid
    from .shuffle import sorted_block_reduce

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False)
        y = b[y_col].to_numpy(zero_copy_only=False)
        fine = _grid.cell_id(x, y, res_fine)
        cls = np.clip(np.floor(raster_value(fine) * 4.0), 0, 3) \
            .astype(np.int64)
        zone = _grid.parent(fine, res_fine - res_coarse)
        key = zone * np.int64(4) + cls
        cnt = np.bincount(key, minlength=0)
        nz = np.nonzero(cnt)[0]
        return pa.table({"zone": pa.array((nz // 4).astype(np.int64)),
                         "cls": pa.array((nz % 4).astype(np.int64)),
                         "n_": pa.array(cnt[nz].astype(np.int64))})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["zone", "cls"], sort=False)["n_"].sum() \
            .reset_index(name="n")
        # majority with deterministic tie-break: max count, then min class
        tot = tot.sort_values(["zone", "n", "cls"],
                              ascending=[True, False, True], kind="stable")
        out = tot.groupby("zone", sort=False).head(1).copy()
        out = out.rename(columns={"cls": "majority_class",
                                  "n": "class_count"})
        for c in ("zone", "majority_class", "class_count"):
            out[c] = out[c].astype(np.int64)
        return out[["zone", "majority_class", "class_count"]]

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return sorted_block_reduce(partials, "zone", combine)


def focal_mean(raster: ray.data.Dataset, res: int, *,
               tile_col: str = "tile_id",
               value_col: str = "value") -> ray.data.Dataset:
    """Focal statistics (moving-window smoothing): each tile's value
    replaced by the mean over its in-grid 3×3 neighborhood — the classic
    raster focal-mean filter.  Same fan-out shuffle as the Gi* stage: each
    tile contributes its value to its ≤9 window targets, a tiny partial-sum
    exchange, then mean = sum / window size.

    Exactness: tile values that are dyadic rationals (the synthetic raster
    emits k/2^32) sum exactly in float64 in ANY order, so the result is
    bit-stable across partitionings and matches the SQL self-join oracle."""
    import pandas as pd

    from ..functions import grid as _grid
    from .shuffle import sorted_block_reduce

    def fanout(b: pa.Table) -> pa.Table:
        t = b[tile_col].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False)
        ci, cj = (a.astype(np.int64) for a in _grid.cell_to_coords(t))
        n = 1 << res
        outs_t, outs_v = [], []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                ti, tj = ci + di, cj + dj
                ok = (ti >= 0) & (ti < n) & (tj >= 0) & (tj < n)
                outs_t.append(_grid.cell_id((ti[ok] + 0.5) / n,
                                            (tj[ok] + 0.5) / n, res))
                outs_v.append(v[ok])
        tgt = np.concatenate(outs_t)
        val = np.concatenate(outs_v)
        ks, inv = np.unique(tgt, return_inverse=True)
        sums = np.zeros(len(ks))
        np.add.at(sums, inv, val)
        cnt = np.bincount(inv, minlength=len(ks))
        return pa.table({tile_col: pa.array(ks.astype(np.int64)),
                         "sum_": pa.array(sums),
                         "w_": pa.array(cnt.astype(np.int64))})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(tile_col, sort=False).agg(
            sum_=("sum_", "sum"), w=("w_", "sum")).reset_index()
        out["focal_mean"] = out["sum_"] / out["w"]
        out[tile_col] = out[tile_col].astype(np.int64)
        out["w"] = out["w"].astype(np.int64)
        return out[[tile_col, "w", "focal_mean"]]

    partials = raster.map_batches(fanout, batch_format="pyarrow",
                                  batch_size=None)
    return sorted_block_reduce(partials, tile_col, combine)


def morans_i(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
             y_col: str = "y") -> ray.data.Dataset:
    """Global Moran's I spatial autocorrelation of the point-density
    surface on the ``res×res`` grid with queen (8-neighbor) contiguity —
    the companion statistic to Getis-Ord Gi* (hotspot_cells): one scalar
    measuring whether dense cells cluster next to dense cells.

    Integer-exact core: with per-cell counts c_i and S = Σc, the centered
    value is expressed as z_i = N·c_i − S (an INTEGER — the usual
    c_i − S/N times N), under which
    I = N·Σ_ij w_ij z_i z_j / (W·Σ z_i²) is a ratio of integer sums,
    order-independent, finished by one fixed-order f64 expression.  Empty
    cells participate (z = −S), so the reduce runs on the DENSE grid —
    bounded by res², computed in ONE remote task over the combined cell
    counts (the same off-driver pattern as DBSCAN's union-find); Python
    ints there, so the pair sums never overflow even at corpus scale.
    Only the per-cell counts are distributed work (partial-agg combiner,
    shuffle rows ∝ nonempty cells)."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def count_partial(b: pa.Table) -> pa.Table:
        i = np.floor(b[x_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        j = np.floor(b[y_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        np.clip(i, 0, res - 1, out=i)
        np.clip(j, 0, res - 1, out=j)
        cnt = np.bincount(i * res + j, minlength=res * res)
        nz = np.nonzero(cnt)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n_": pa.array(cnt[nz].astype(np.int64))})

    def count_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cell", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = sorted_block_reduce(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       batch_size=None),
        "cell", count_combine)

    @ray.remote
    def _moran(*tbls: pa.Table) -> pa.Table:
        c = np.zeros(res * res, dtype=np.int64)
        for t in tbls:
            if t.num_rows:
                c[t["cell"].to_numpy()] = t["n"].to_numpy()
        n_cells = res * res
        s_tot = int(c.sum())
        z = (n_cells * c.astype(object) - s_tot)  # exact Python ints
        zg = z.reshape(res, res)
        nb = np.zeros((res, res), dtype=object)
        nb[:] = 0
        ones = np.ones((res, res), dtype=np.int64)
        w_grid = np.zeros((res, res), dtype=np.int64)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                src = (slice(max(0, -di), res - max(0, di)),
                       slice(max(0, -dj), res - max(0, dj)))
                dst = (slice(max(0, di), res - max(0, -di)),
                       slice(max(0, dj), res - max(0, -dj)))
                nb[dst] = nb[dst] + zg[src]
                w_grid[dst] += ones[src]
        num = int((zg * nb).sum())
        den = int((z * z).sum())
        w_sum = int(w_grid.sum())
        moran = (0.0 if den == 0 else
                 float(num) * float(n_cells) / (float(den) * float(w_sum)))
        return pa.table({
            "n_cells": pa.array([n_cells], pa.int64()),
            "w_sum": pa.array([w_sum], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "den": pa.array([den], pa.int64()),
            "moran_i": pa.array([moran], pa.float64())})

    refs = counts.to_arrow_refs()
    return ray.data.from_arrow(ray.get(_moran.remote(*refs)))


def gearys_c(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
             y_col: str = "y") -> ray.data.Dataset:
    """Global Geary's C spatial autocorrelation of the point-density
    surface on the ``res×res`` grid with queen contiguity — Moran's I's
    companion (C < 1 clustered, > 1 dispersed), sensitive to LOCAL
    differences where I measures global covariance.

    Same integer-exact core as :func:`morans_i`: with z_i = N·c_i − S the
    scale factor N² cancels between numerator and denominator, so
    C = (N−1)·Σ_ij w_ij (z_i − z_j)² / (2W·Σ z_i²) is a ratio of exact
    integer sums (Python ints off-driver; one bounded remote task over
    the dense grid), finished by one fixed-order f64 expression.  Only
    per-cell counts are distributed work."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def count_partial(b: pa.Table) -> pa.Table:
        i = np.floor(b[x_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        j = np.floor(b[y_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        np.clip(i, 0, res - 1, out=i)
        np.clip(j, 0, res - 1, out=j)
        cnt = np.bincount(i * res + j, minlength=res * res)
        nz = np.nonzero(cnt)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n_": pa.array(cnt[nz].astype(np.int64))})

    def count_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cell", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = sorted_block_reduce(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       batch_size=None),
        "cell", count_combine)

    @ray.remote
    def _geary(*tbls: pa.Table) -> pa.Table:
        c = np.zeros(res * res, dtype=np.int64)
        for t in tbls:
            if t.num_rows:
                c[t["cell"].to_numpy()] = t["n"].to_numpy()
        n_cells = res * res
        s_tot = int(c.sum())
        z = (n_cells * c.astype(object) - s_tot)  # exact Python ints
        zg = z.reshape(res, res)
        num = 0
        w_sum = 0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                src = (slice(max(0, -di), res - max(0, di)),
                       slice(max(0, -dj), res - max(0, dj)))
                dst = (slice(max(0, di), res - max(0, -di)),
                       slice(max(0, dj), res - max(0, -dj)))
                d = zg[dst] - zg[src]
                num += int((d * d).sum())
                w_sum += d.size
        den = int((z * z).sum())
        geary = (0.0 if den == 0 else
                 float(num) * float(n_cells - 1)
                 / (2.0 * float(w_sum) * float(den)))
        return pa.table({
            "n_cells": pa.array([n_cells], pa.int64()),
            "w_sum": pa.array([w_sum], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "den": pa.array([den], pa.int64()),
            "geary_c": pa.array([geary], pa.float64())})

    refs = counts.to_arrow_refs()
    return ray.data.from_arrow(ray.get(_geary.remote(*refs)))


def local_morans_i(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
                   y_col: str = "y") -> ray.data.Dataset:
    """Local Moran's I (LISA, Anselin 1995) per grid cell with queen
    contiguity: I_i = N_cells·z_i·lag_i / Σz² — the per-cell attribution
    of the global statistic, the standard hot/cold-spot CLASSIFIER (HH /
    LL / HL / LH by the signs of z_i and lag_i).  Same integer-exact core
    as :func:`morans_i` (z_i = N·c_i − S; z, lag and Σz² exact ints in
    one bounded dense-grid remote task; one float division per cell).
    Emits every cell of the dense grid.

    Engine products use Python ints (never overflow); the SQL twin's
    BIGINT z·lag·N product bounds the ORACLE comparison to point counts
    < ~2^39 per grid — the engine itself has no such envelope."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def count_partial(b: pa.Table) -> pa.Table:
        i = np.floor(b[x_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        j = np.floor(b[y_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        np.clip(i, 0, res - 1, out=i)
        np.clip(j, 0, res - 1, out=j)
        cnt = np.bincount(i * res + j, minlength=res * res)
        nz = np.nonzero(cnt)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n_": pa.array(cnt[nz].astype(np.int64))})

    def count_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cell", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = sorted_block_reduce(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       batch_size=None),
        "cell", count_combine)

    @ray.remote
    def _lisa(*tbls: pa.Table) -> pa.Table:
        c = np.zeros(res * res, dtype=np.int64)
        for t in tbls:
            if t.num_rows:
                c[t["cell"].to_numpy()] = t["n"].to_numpy()
        n_cells = res * res
        s_tot = int(c.sum())
        z = (n_cells * c.astype(object) - s_tot)  # exact Python ints
        zg = z.reshape(res, res)
        lag = np.zeros((res, res), dtype=object)
        lag[:] = 0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                src = (slice(max(0, -di), res - max(0, di)),
                       slice(max(0, -dj), res - max(0, dj)))
                dst = (slice(max(0, di), res - max(0, -di)),
                       slice(max(0, dj), res - max(0, -dj)))
                lag[dst] = lag[dst] + zg[src]
        den = int((z * z).sum())
        lagf = lag.reshape(-1)
        li = np.array([
            0.0 if den == 0 else
            float(int(zi) * int(lg) * n_cells) / float(den)
            for zi, lg in zip(z, lagf)], dtype=np.float64)
        return pa.table({
            "cell": pa.array(np.arange(res * res, dtype=np.int64)),
            "z": pa.array([int(v) for v in z], pa.int64()),
            "lag": pa.array([int(v) for v in lagf], pa.int64()),
            "local_i": pa.array(li, pa.float64())})

    refs = counts.to_arrow_refs()
    return ray.data.from_arrow(ray.get(_lisa.remote(*refs)))


def join_counts(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
                y_col: str = "y") -> ray.data.Dataset:
    """Join-count statistics (BB/BW/WW) for the binary above-mean mark on
    the ``res×res`` density grid with queen contiguity — the categorical
    member of the spatial-autocorrelation family (Moran/Geary are its
    interval-scale siblings).  A cell is Black iff N_cells·c_i > S (above
    the mean, an INTEGER comparison — scale-free and exact).  Counts are
    over undirected adjacent pairs (each pair once); bb_ratio compares
    observed BB joins to the free-sampling expectation W·p_b², with the
    fixed float expression mirrored in SQL."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def count_partial(b: pa.Table) -> pa.Table:
        i = np.floor(b[x_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        j = np.floor(b[y_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        np.clip(i, 0, res - 1, out=i)
        np.clip(j, 0, res - 1, out=j)
        cnt = np.bincount(i * res + j, minlength=res * res)
        nz = np.nonzero(cnt)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n_": pa.array(cnt[nz].astype(np.int64))})

    def count_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cell", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = sorted_block_reduce(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       batch_size=None),
        "cell", count_combine)

    @ray.remote
    def _jc(*tbls: pa.Table) -> pa.Table:
        c = np.zeros(res * res, dtype=np.int64)
        for t in tbls:
            if t.num_rows:
                c[t["cell"].to_numpy()] = t["n"].to_numpy()
        n_cells = res * res
        s_tot = int(c.sum())
        m = (n_cells * c > s_tot).reshape(res, res)  # Black mask
        n_b = int(m.sum())
        n_w = n_cells - n_b
        bb = bw = ww = w_pairs = 0
        # forward offsets only: each undirected queen pair counted once
        for di, dj in ((0, 1), (1, 0), (1, 1), (1, -1)):
            src = (slice(max(0, -di), res - max(0, di)),
                   slice(max(0, -dj), res - max(0, dj)))
            dst = (slice(max(0, di), res - max(0, -di)),
                   slice(max(0, dj), res - max(0, -dj)))
            a = m[src]
            b_ = m[dst]
            bb += int((a & b_).sum())
            ww += int((~a & ~b_).sum())
            bw += int((a ^ b_).sum())
            w_pairs += a.size
        p_b = float(n_b) / float(n_cells)
        exp_bb = float(w_pairs) * (p_b * p_b)
        ratio = 0.0 if exp_bb == 0.0 else float(bb) / exp_bb
        return pa.table({
            "n_black": pa.array([n_b], pa.int64()),
            "n_white": pa.array([n_w], pa.int64()),
            "w_pairs": pa.array([w_pairs], pa.int64()),
            "n_bb": pa.array([bb], pa.int64()),
            "n_bw": pa.array([bw], pa.int64()),
            "n_ww": pa.array([ww], pa.int64()),
            "bb_ratio": pa.array([ratio], pa.float64())})

    refs = counts.to_arrow_refs()
    return ray.data.from_arrow(ray.get(_jc.remote(*refs)))


def general_g(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
              y_col: str = "y") -> ray.data.Dataset:
    """Getis-Ord General G — the GLOBAL high/low-value clustering statistic
    whose per-cell decomposition is :func:`hotspot_cells`' Gi*:
    G = Σ_{i≠j} w_ij c_i c_j / Σ_{i≠j} c_i c_j over queen contiguity on
    the density grid.  Numerator via eight shifted products, denominator
    S² − Σc² — both exact Python-int sums in one bounded dense-grid
    remote task, finished by a single float division."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def count_partial(b: pa.Table) -> pa.Table:
        i = np.floor(b[x_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        j = np.floor(b[y_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        np.clip(i, 0, res - 1, out=i)
        np.clip(j, 0, res - 1, out=j)
        cnt = np.bincount(i * res + j, minlength=res * res)
        nz = np.nonzero(cnt)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n_": pa.array(cnt[nz].astype(np.int64))})

    def count_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cell", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = sorted_block_reduce(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       batch_size=None),
        "cell", count_combine)

    @ray.remote
    def _gg(*tbls: pa.Table) -> pa.Table:
        c = np.zeros(res * res, dtype=np.int64)
        for t in tbls:
            if t.num_rows:
                c[t["cell"].to_numpy()] = t["n"].to_numpy()
        n_cells = res * res
        cg = c.astype(object).reshape(res, res)  # exact Python ints
        num = 0
        w_sum = 0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                src = (slice(max(0, -di), res - max(0, di)),
                       slice(max(0, -dj), res - max(0, dj)))
                dst = (slice(max(0, di), res - max(0, -di)),
                       slice(max(0, dj), res - max(0, -dj)))
                num += int((cg[dst] * cg[src]).sum())
                w_sum += cg[src].size
        s_tot = int(c.sum())
        den = s_tot * s_tot - int((c.astype(object) * c.astype(object)).sum())
        g = 0.0 if den == 0 else float(num) / float(den)
        return pa.table({
            "n_cells": pa.array([n_cells], pa.int64()),
            "w_sum": pa.array([w_sum], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "den": pa.array([den], pa.int64()),
            "general_g": pa.array([g], pa.float64())})

    refs = counts.to_arrow_refs()
    return ray.data.from_arrow(ray.get(_gg.remote(*refs)))


def general_g_sql(res: int, pts_cte: str) -> str:
    n = res * res
    return pts_cte + f"""
, cells AS (SELECT unnest(range(0, {n})) AS cell)
, cnt AS (
  SELECT CAST(floor(x * {res}) AS BIGINT) * {res}
         + CAST(floor(y * {res}) AS BIGINT) AS cell,
         count(*) AS n
  FROM pts GROUP BY 1)
, grid AS (
  SELECT c.cell, coalesce(cnt.n, 0)::BIGINT AS n
  FROM cells c LEFT JOIN cnt USING (cell))
, nb AS (
  SELECT a.n AS na, b.n AS nb_
  FROM grid a JOIN grid b
    ON abs(a.cell // {res} - b.cell // {res}) <= 1
   AND abs(a.cell % {res} - b.cell % {res}) <= 1
   AND a.cell <> b.cell)
, nums AS (
  SELECT sum(na * nb_)::BIGINT AS num, count(*)::BIGINT AS w_sum FROM nb)
, dens AS (
  SELECT (sum(n) * sum(n) - sum(n * n))::BIGINT AS den FROM grid)
SELECT {n}::BIGINT AS n_cells, nums.w_sum, nums.num, dens.den,
       CASE WHEN dens.den = 0 THEN 0.0
            ELSE nums.num::DOUBLE / dens.den::DOUBLE
       END AS general_g
FROM nums, dens
"""


def join_counts_sql(res: int, pts_cte: str) -> str:
    n = res * res
    return pts_cte + f"""
, cells AS (SELECT unnest(range(0, {n})) AS cell)
, cnt AS (
  SELECT CAST(floor(x * {res}) AS BIGINT) * {res}
         + CAST(floor(y * {res}) AS BIGINT) AS cell,
         count(*) AS n
  FROM pts GROUP BY 1)
, grid AS (
  SELECT c.cell, coalesce(cnt.n, 0)::BIGINT AS n
  FROM cells c LEFT JOIN cnt USING (cell))
, mk AS (
  SELECT cell,
         ({n} * n > (SELECT sum(n) FROM grid)) AS black
  FROM grid)
, adj AS (
  SELECT a.black AS ba, b.black AS bb_
  FROM mk a JOIN mk b
    ON abs(a.cell // {res} - b.cell // {res}) <= 1
   AND abs(a.cell % {res} - b.cell % {res}) <= 1
   AND a.cell < b.cell)
, jc AS (
  SELECT count(*)::BIGINT AS w_pairs,
         sum(CASE WHEN ba AND bb_ THEN 1 ELSE 0 END)::BIGINT AS n_bb,
         sum(CASE WHEN ba <> bb_ THEN 1 ELSE 0 END)::BIGINT AS n_bw,
         sum(CASE WHEN NOT ba AND NOT bb_ THEN 1 ELSE 0 END)::BIGINT
           AS n_ww
  FROM adj)
, nb AS (SELECT sum(CASE WHEN black THEN 1 ELSE 0 END)::BIGINT AS n_black
         FROM mk)
SELECT nb.n_black, {n} - nb.n_black AS n_white, jc.w_pairs,
       jc.n_bb, jc.n_bw, jc.n_ww,
       CASE WHEN jc.w_pairs::DOUBLE
                 * ((nb.n_black::DOUBLE / {float(n)})
                    * (nb.n_black::DOUBLE / {float(n)})) = 0.0
            THEN 0.0
            ELSE jc.n_bb::DOUBLE
                 / (jc.w_pairs::DOUBLE
                    * ((nb.n_black::DOUBLE / {float(n)})
                       * (nb.n_black::DOUBLE / {float(n)})))
       END AS bb_ratio
FROM jc, nb
"""


def local_morans_i_sql(res: int, pts_cte: str) -> str:
    n = res * res
    return pts_cte + f"""
, cells AS (SELECT unnest(range(0, {n})) AS cell)
, cnt AS (
  SELECT CAST(floor(x * {res}) AS BIGINT) * {res}
         + CAST(floor(y * {res}) AS BIGINT) AS cell,
         count(*) AS n
  FROM pts GROUP BY 1)
, grid AS (
  SELECT c.cell, coalesce(cnt.n, 0)::BIGINT AS n
  FROM cells c LEFT JOIN cnt USING (cell))
, zt AS (
  SELECT cell, ({n} * n - (SELECT sum(n) FROM grid))::BIGINT AS z FROM grid)
, lagt AS (
  SELECT a.cell, coalesce(sum(b.z), 0)::BIGINT AS lag
  FROM zt a LEFT JOIN zt b
    ON abs(a.cell // {res} - b.cell // {res}) <= 1
   AND abs(a.cell % {res} - b.cell % {res}) <= 1
   AND a.cell <> b.cell
  GROUP BY a.cell)
, dens AS (SELECT sum(z * z)::BIGINT AS den FROM zt)
SELECT zt.cell, zt.z, lagt.lag,
       CASE WHEN dens.den = 0 THEN 0.0
            ELSE CAST(zt.z * lagt.lag * {n} AS DOUBLE)
                 / CAST(dens.den AS DOUBLE)
       END AS local_i
FROM zt JOIN lagt USING (cell), dens
"""


def gearys_c_sql(res: int, pts_cte: str) -> str:
    n = res * res
    return pts_cte + f"""
, cells AS (SELECT unnest(range(0, {n})) AS cell)
, cnt AS (
  SELECT CAST(floor(x * {res}) AS BIGINT) * {res}
         + CAST(floor(y * {res}) AS BIGINT) AS cell,
         count(*) AS n
  FROM pts GROUP BY 1)
, grid AS (
  SELECT c.cell, coalesce(cnt.n, 0)::BIGINT AS n
  FROM cells c LEFT JOIN cnt USING (cell))
, zt AS (
  SELECT cell, ({n} * n - (SELECT sum(n) FROM grid))::BIGINT AS z FROM grid)
, nb AS (
  SELECT a.cell AS i, b.cell AS j
  FROM zt a JOIN zt b
    ON abs(a.cell // {res} - b.cell // {res}) <= 1
   AND abs(a.cell % {res} - b.cell % {res}) <= 1
   AND a.cell <> b.cell)
, nums AS (
  SELECT sum((za.z - zb.z) * (za.z - zb.z))::BIGINT AS num,
         count(*)::BIGINT AS w_sum
  FROM nb JOIN zt za ON za.cell = nb.i JOIN zt zb ON zb.cell = nb.j)
, dens AS (SELECT sum(z * z)::BIGINT AS den FROM zt)
SELECT {n}::BIGINT AS n_cells, w_sum, num, den,
       CASE WHEN den = 0 THEN 0.0
            ELSE CAST(num AS DOUBLE) * CAST({n - 1} AS DOUBLE)
                 / (2.0 * CAST(w_sum AS DOUBLE) * CAST(den AS DOUBLE))
       END AS geary_c
FROM nums, dens
"""


def morans_i_sql(res: int, pts_cte: str) -> str:
    n = res * res
    return pts_cte + f"""
, cells AS (SELECT unnest(range(0, {n})) AS cell)
, cnt AS (
  SELECT CAST(floor(x * {res}) AS BIGINT) * {res}
         + CAST(floor(y * {res}) AS BIGINT) AS cell,
         count(*) AS n
  FROM pts GROUP BY 1)
, grid AS (
  SELECT c.cell, coalesce(cnt.n, 0)::BIGINT AS n
  FROM cells c LEFT JOIN cnt USING (cell))
, zt AS (
  SELECT cell, ({n} * n - (SELECT sum(n) FROM grid))::BIGINT AS z FROM grid)
, nb AS (
  SELECT a.cell AS i, b.cell AS j
  FROM zt a JOIN zt b
    ON abs(a.cell // {res} - b.cell // {res}) <= 1
   AND abs(a.cell % {res} - b.cell % {res}) <= 1
   AND a.cell <> b.cell)
, nums AS (
  SELECT sum(za.z * zb.z)::BIGINT AS num, count(*)::BIGINT AS w_sum
  FROM nb JOIN zt za ON za.cell = nb.i JOIN zt zb ON zb.cell = nb.j)
, dens AS (SELECT sum(z * z)::BIGINT AS den FROM zt)
SELECT {n}::BIGINT AS n_cells, w_sum, num, den,
       CASE WHEN den = 0 THEN 0.0
            ELSE CAST(num AS DOUBLE) * CAST({n} AS DOUBLE)
                 / (CAST(den AS DOUBLE) * CAST(w_sum AS DOUBLE))
       END AS moran_i
FROM nums, dens
"""


def sen_slope_cells(ds: ray.data.Dataset, res: int, *, ts_col: str = "ts",
                    x_col: str = "x", y_col: str = "y") -> ray.data.Dataset:
    """Sen's slope estimator per grid cell — the magnitude companion to
    :func:`trend_cells`' Mann-Kendall S (together they are the standard
    emerging-hotspot trend pair): the LOWER median of all pairwise slopes
    (c_j − c_i)/(j − i) of the dense daily count series.  Each slope is
    one exact float division of two integers (bit-identical in SQL), the
    median is a fixed-index selection after a value sort, so ties cannot
    diverge.  Same (cell, day) shuffle as trend_cells; per-cell slope
    matrix is (cells_in_block × T(T−1)/2), bounded by the day span."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def partial(b: pa.Table) -> pa.Table:
        c = grid.cell_id(b[x_col].to_numpy(), b[y_col].to_numpy(), res)
        days = b[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"cell_id": c, "bin": days})
        out = df.groupby(["cell_id", "bin"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = sorted_block_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cell_id", "bin"],
        lambda g: g.groupby(["cell_id", "bin"], as_index=False)["n"]
        .sum()).materialize()
    bounds = counts.aggregate(Min("bin"), Max("bin"))
    b0, b1 = int(bounds["min(bin)"]), int(bounds["max(bin)"])
    T = b1 - b0 + 1
    n_slopes = T * (T - 1) // 2

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        cells, inv = np.unique(g["cell_id"].to_numpy(),
                               return_inverse=True)
        M = np.zeros((len(cells), T), np.int64)
        M[inv, g["bin"].to_numpy() - b0] = g["n"].to_numpy()
        cols = []
        for i in range(T):
            for j in range(i + 1, T):
                cols.append((M[:, j] - M[:, i]).astype(np.float64)
                            / float(j - i))
        S = np.stack(cols, axis=1)
        S.sort(axis=1)
        return pd.DataFrame({
            "cell_id": cells,
            "n_slopes": np.full(len(cells), n_slopes, np.int64),
            "sen_slope": S[:, (n_slopes - 1) // 2]})

    return sorted_block_reduce(counts, "cell_id", per_cell)


def hex_focal_mean(ds: ray.data.Dataset, size: float, *, x_col: str = "x",
                   y_col: str = "y") -> ray.data.Dataset:
    """Hex focal mean — the 6-neighbor (isotropic) analogue of the square
    :func:`focal_mean`: per-hex point counts smoothed over the 7-hex
    window (self + axial ring-1), absent neighbors counting 0, emitted for
    every OCCUPIED hex.  Two tiny shuffles on integer counts: per-batch
    hex-count partials, then the 7-way fan-out partial-sum exchange (a
    presence marker rides the self-contribution so absent hexes are
    dropped without a join).  smoothed = window_sum / 7.0 — one float
    division on an exact int64 sum, bit-equal to the SQL offsets-join
    twin."""
    import pandas as pd

    from ..functions import hexgrid
    from .shuffle import sorted_block_reduce

    def count_partial(b: pa.Table) -> pa.Table:
        hq, hr = hexgrid.hex_assign(b[x_col].to_numpy(zero_copy_only=False),
                                    b[y_col].to_numpy(zero_copy_only=False),
                                    size)
        df = pd.DataFrame({"hq": hq, "hr": hr})             .groupby(["hq", "hr"], as_index=False).size()             .rename(columns={"size": "n"})
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def combine_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["hq", "hr"], as_index=False)["n"].sum()

    counts = sorted_block_reduce(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       batch_size=None), ["hq", "hr"], combine_counts)

    def fanout(g: pd.DataFrame) -> pd.DataFrame:
        hq = g["hq"].to_numpy()
        hr = g["hr"].to_numpy()
        n = g["n"].to_numpy()
        nq, nr = hexgrid.ring1(hq, hr)
        return pd.DataFrame({
            "hq": np.concatenate([hq, nq]),
            "hr": np.concatenate([hr, nr]),
            "s": np.concatenate([n, np.repeat(n, 6)]),
            "present": np.concatenate([
                np.ones(len(hq), np.int8),
                np.zeros(6 * len(hq), np.int8)])})

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["hq", "hr"], as_index=False).agg(
            s=("s", "sum"), present=("present", "max"))
        t = t[t["present"] == 1]
        return pd.DataFrame({
            "hq": t["hq"].astype(np.int64),
            "hr": t["hr"].astype(np.int64),
            "smoothed": t["s"].to_numpy().astype(np.float64) / 7.0})

    fanned = counts.map_batches(fanout, batch_format="pandas",
                                batch_size=None)
    return sorted_block_reduce(fanned, ["hq", "hr"], smooth)


def raster_slope(raster: ray.data.Dataset, res: int, *,
                 tile_col: str = "tile_id",
                 value_col: str = "value") -> ray.data.Dataset:
    """Central-difference raster gradient: for every INTERIOR tile,
    dzdx = v(i+1,j) - v(i-1,j), dzdy = v(i,j+1) - v(i,j-1) and
    slope_sq = dzdx² + dzdy² — the slope/aspect building block, kept
    polynomial (no trig) so the SQL self-join twin is bit-equal.  Same
    neighbor fan-out shuffle as :func:`focal_mean`: each tile ships its
    value to the 4 tiles whose stencil needs it (tagged by which stencil
    slot it fills); tiles that received all 4 are interior and emit."""
    import pandas as pd

    from ..functions import grid as _grid
    from .shuffle import sorted_block_reduce

    n = 1 << res

    def fanout(b: pa.Table) -> pa.Table:
        t = b[tile_col].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False)
        ci, cj = (a.astype(np.int64) for a in _grid.cell_to_coords(t))
        outs = []
        # (di, dj, slot): the tile at (ci+di, cj+dj) uses OUR value in slot
        for di, dj, slot in ((-1, 0, 0),   # we are its east: slot e
                             (1, 0, 1),    # west
                             (0, -1, 2),   # north (j+1 side)
                             (0, 1, 3)):   # south
            ti, tj = ci + di, cj + dj
            ok = (ti >= 0) & (ti < n) & (tj >= 0) & (tj < n)
            w = 1.0 / n
            tid = _grid.cell_id(ti[ok] * w, tj[ok] * w, res)
            outs.append(pd.DataFrame({
                "tile_id": tid, "slot": np.int8(slot), "v": v[ok]}))
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    def stencil(g: pd.DataFrame) -> pd.DataFrame:
        by = [g[g["slot"] == s].set_index("tile_id")["v"].rename(f"s{s}")
              for s in range(4)]
        m = pd.concat(by, axis=1, join="inner").reset_index()
        dzdx = m["s0"].to_numpy() - m["s1"].to_numpy()
        dzdy = m["s2"].to_numpy() - m["s3"].to_numpy()
        return pd.DataFrame({
            "tile_id": m["tile_id"].astype(np.int64),
            "dzdx": dzdx, "dzdy": dzdy,
            "slope_sq": dzdx * dzdx + dzdy * dzdy})

    fanned = raster.map_batches(fanout, batch_format="pyarrow",
                                batch_size=None)
    return sorted_block_reduce(fanned, "tile_id", stencil)


def cell_gini(ds: ray.data.Dataset, res: int, *, x_col: str = "x",
              y_col: str = "y"):
    """Spatial concentration: the Gini coefficient of per-cell point
    counts over the FULL 4^res grid (empty cells count as 0 — they carry
    the inequality signal).  Distributed part = the per-cell count
    partial-agg; the closed-form rank formula then runs in one tiny task:
    with counts x sorted ascending (ties by cell id) and 1-based overall
    rank i, gini = (2·Σ i·xᵢ − (N+1)·Σ xᵢ) / (N·Σ xᵢ).  Zeros contribute
    nothing to Σ i·xᵢ, so only occupied cells need ranks — offset by the
    number of empty cells.  All-integer numerator/denominator (< 2^53),
    ONE float division — bit-equal to the SQL window twin.  Returns a
    1-row pandas frame (n_cells, total_points, gini)."""
    import pandas as pd

    from ..functions import grid as _grid
    from .shuffle import sorted_block_reduce

    def partial(b: pa.Table) -> pa.Table:
        c = _grid.cell_id(b[x_col].to_numpy(zero_copy_only=False),
                          b[y_col].to_numpy(zero_copy_only=False), res)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "n": pa.array(n.astype(np.int64))})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("cell", as_index=False)["n"].sum()

    counts = sorted_block_reduce(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "cell", combine).to_pandas()
    N = np.int64(1) << np.int64(2 * res)
    k = np.int64(len(counts))
    counts = counts.sort_values(["n", "cell"], kind="stable")
    n = counts["n"].to_numpy()
    ranks = (N - k) + np.arange(1, k + 1, dtype=np.int64)
    tot = np.int64(n.sum())
    wsum = np.int64((ranks * n).sum())
    num = np.int64(2) * wsum - (N + np.int64(1)) * tot
    den = N * tot
    return pd.DataFrame({"n_cells": [N], "total_points": [tot],
                         "gini": [np.float64(num) / np.float64(den)]})


def covisit_pairs(ds: ray.data.Dataset, *, grid_n: int,
                  user_col: str = "user_id", x_col: str = "x",
                  y_col: str = "y", min_cells: int = 2
                  ) -> ray.data.Dataset:
    """User co-visitation graph: every pair of users sharing at least
    ``min_cells`` DISTINCT grid cells (grid_n × grid_n over the unit
    square) — the co-occurrence edge builder behind "people who move
    together" / audience-affinity analyses, transposed from basket_lift
    (items per basket → users per place).

    Fully vectorized at unbounded cell occupancy (where basket_lift's
    small-alphabet per-basket loop would not fly): per-batch DISTINCT
    (cell, user) partials collapse repeat visits before the shuffle; one
    cell-keyed sorted reduce expands each cell's user list into ordered
    pairs with the ragged cumsum expansion (the triangle_counts wedge
    kernel); pair-keyed count reduce + threshold.  Pair volume per cell
    is occupancy² — pick ``grid_n`` so typical occupancy is bounded
    (skew-cap via sub-sampling hot cells would bias counts, so skew here
    is handled by resolution choice, documented)."""
    import pandas as pd

    from .shuffle import sorted_block_reduce
    g = np.int64(grid_n)

    def distinct_partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False)
        y = b[y_col].to_numpy(zero_copy_only=False)
        cell = (np.minimum((x * grid_n).astype(np.int64), g - 1) * g
                + np.minimum((y * grid_n).astype(np.int64), g - 1))
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) and (u.min() < 0 or u.max() >= (1 << 32)):
            # pair keys pack (user_a, user_b) into one int64 as
            # a*(2**32)+b; out-of-range ids would silently collide
            raise ValueError(
                "covisit_pairs requires user ids in [0, 2**32): got "
                f"range [{u.min()}, {u.max()}]")
        df = pd.DataFrame({"cell": cell, "u": u})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    uc = ds.map_batches(distinct_partial, batch_format="pyarrow")

    def cell_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["cell", "u"])
        c = df["cell"].to_numpy()
        u = df["u"].to_numpy()
        order = np.lexsort((u, c))
        c_s, u_s = c[order], u[order]
        _, starts, d = np.unique(c_s, return_index=True,
                                 return_counts=True)
        r = np.arange(len(c_s)) - np.repeat(starts, d)
        rem = np.repeat(d, d) - r - 1
        total = int(rem.sum())
        if total == 0:
            return pd.DataFrame({"pk": np.empty(0, np.int64),
                                 "n": np.empty(0, np.int64)})
        first = np.repeat(np.arange(len(c_s)), rem)
        run_starts = np.cumsum(rem) - rem
        offs = np.arange(total) - np.repeat(run_starts, rem)
        second = first + 1 + offs
        # users sorted ascending within a cell: u_s[first] < u_s[second]
        pk = u_s[first] * (np.int64(1) << 32) + u_s[second]
        return pd.DataFrame({"pk": pk,
                             "n": np.ones(total, np.int64)})

    pairs = sorted_block_reduce(uc, "cell", cell_pairs)

    def reduce_counts(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("pk", as_index=False)["n"].sum()
        s = s[s["n"] >= min_cells]
        pk = s["pk"].to_numpy()
        return pd.DataFrame({
            "user_a": pk >> np.int64(32),
            "user_b": pk & np.int64((1 << 32) - 1),
            "n_cells": s["n"].to_numpy().astype(np.int64)})

    return sorted_block_reduce(pairs, "pk", reduce_counts)


def trend_cells(ds: ray.data.Dataset, res: int, *, ts_col: str = "ts",
                x_col: str = "x", y_col: str = "y") -> ray.data.Dataset:
    """Emerging-hotspot trend: the exact Mann–Kendall S statistic of the
    DAILY event-count series of every grid cell — S = Σ_{i<j}
    sign(c_j − c_i) over the global [first, last] day range with missing
    days counted as 0 (the space-time-cube "emerging hot spot" test's
    trend component, integer-exact end to end).

    Distributed shape: one (cell, day) count shuffle (rows ∝ occupied
    cell-days, never events), a scalar min/max for the global day
    bounds, then a cell-keyed reduce computes each cell's dense series
    and its pairwise sign sum vectorized across the cells of the block
    (T² vector ops over an (n_cells × T) matrix — T is the day span).
    Output: (cell_id, n_days, n_events, s_stat), all int64."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def partial(b: pa.Table) -> pa.Table:
        c = grid.cell_id(b[x_col].to_numpy(), b[y_col].to_numpy(), res)
        days = b[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"cell_id": c, "bin": days})
        out = df.groupby(["cell_id", "bin"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = sorted_block_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cell_id", "bin"],
        lambda g: g.groupby(["cell_id", "bin"], as_index=False)["n"]
        .sum()).materialize()
    bounds = counts.aggregate(Min("bin"), Max("bin"))
    b0, b1 = int(bounds["min(bin)"]), int(bounds["max(bin)"])
    T = b1 - b0 + 1

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        cells, inv = np.unique(g["cell_id"].to_numpy(),
                               return_inverse=True)
        M = np.zeros((len(cells), T), np.int64)
        M[inv, g["bin"].to_numpy() - b0] = g["n"].to_numpy()
        s = np.zeros(len(cells), np.int64)
        for i in range(T):
            d = np.sign(M[:, i + 1:] - M[:, i:i + 1])
            s += d.sum(axis=1)
        return pd.DataFrame({
            "cell_id": cells,
            "n_days": np.full(len(cells), T, np.int64),
            "n_events": M.sum(axis=1),
            "s_stat": s})

    return sorted_block_reduce(counts, "cell_id", per_cell)
