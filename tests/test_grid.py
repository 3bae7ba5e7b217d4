"""Cell-index math: Morton ids, hierarchy, rings, bounds, SQL parity."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from parallelspatialquery_ray.functions import grid


def test_roundtrip_coords():
    rng = np.random.default_rng(0)
    x, y = rng.random(5000), rng.random(5000)
    for res in (0, 1, 4, 9, 16):
        c = grid.cell_id(x, y, res)
        ix, iy = grid.cell_to_coords(c)
        n = 1 << res
        assert np.array_equal(ix, np.minimum(np.floor(x * n), n - 1).astype(np.uint64))
        assert np.array_equal(iy, np.minimum(np.floor(y * n), n - 1).astype(np.uint64))


def test_domain_edges_closed():
    # x==1.0 / y==1.0 must land in the last cell, not overflow
    # (the reference handles the closed upper edge with a 1.0001 sentinel,
    # AllKnnResultStripesParallel.h:103-104).
    c = grid.cell_id(np.array([1.0, 0.0, 1.0]), np.array([1.0, 0.0, 0.0]), 3)
    ix, iy = grid.cell_to_coords(c)
    assert ix.tolist() == [7, 0, 7]
    assert iy.tolist() == [7, 0, 0]


def test_parent_children():
    rng = np.random.default_rng(1)
    x, y = rng.random(100), rng.random(100)
    c5 = grid.cell_id(x, y, 5)
    assert np.array_equal(grid.parent(c5), grid.cell_id(x, y, 4))
    assert np.array_equal(grid.parent(c5, 3), grid.cell_id(x, y, 2))
    for cell in grid.cell_id(x[:5], y[:5], 3):
        kids = grid.children(int(cell))
        assert np.array_equal(grid.parent(kids), np.full(4, cell))


def test_ring_neighbors_interior_and_corner():
    c = grid.cell_id(np.array([0.5]), np.array([0.5]), 4)
    _, ring = grid.ring_neighbors(c, 4, 1)
    assert len(ring) == 9 and len(np.unique(ring)) == 9
    corner = grid.cell_id(np.array([0.0]), np.array([0.0]), 4)
    _, ring = grid.ring_neighbors(corner, 4, 1)
    assert len(ring) == 4  # clipped at the domain boundary
    _, ring2 = grid.ring_neighbors(c, 4, 2)
    assert len(ring2) == 25


def test_ring_neighbors_are_adjacent():
    c = grid.cell_id(np.array([0.37]), np.array([0.81]), 6)
    ix, iy = grid.cell_to_coords(c)
    _, ring = grid.ring_neighbors(c, 6, 1)
    nx, ny = grid.cell_to_coords(ring)
    assert (np.abs(nx.astype(int) - int(ix[0])) <= 1).all()
    assert (np.abs(ny.astype(int) - int(iy[0])) <= 1).all()


def test_cell_bounds():
    c = grid.cell_id(np.array([0.30]), np.array([0.70]), 2)
    x0, y0, x1, y1 = grid.cell_bounds(c, 2)
    assert (x0[0], y0[0], x1[0], y1[0]) == (0.25, 0.5, 0.5, 0.75)


def test_choose_resolution():
    assert grid.choose_resolution(100, 10) == 0
    r = grid.choose_resolution(10_000_000, 10)
    # ~ N/4**r points per cell should be near the target band
    per_cell = 10_000_000 / 4 ** r
    assert 16 <= per_cell <= 1024
    assert grid.choose_resolution(10**12, 10) <= grid.MAX_RES


@pytest.mark.parametrize("res", [1, 4, 7])
def test_morton_sql_matches_numpy(res):
    rng = np.random.default_rng(res)
    x, y = rng.random(2000), rng.random(2000)
    x[:3] = [0.0, 1.0, 0.5]
    y[:3] = [1.0, 0.0, 0.5]
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"x": x, "y": y}))
    got = con.sql(
        f"select {grid.morton_sql('x', 'y', res)} as c from pts"
    ).fetchnumpy()["c"]
    assert np.array_equal(got, grid.cell_id(x, y, res))


def test_raster_slope_and_cell_gini(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages import tiles
    # slope: numpy central-difference oracle over the full synthetic grid
    res = 3
    n = 1 << res
    raster = tiles.synthetic_raster(res)
    got = tiles.raster_slope(rd.from_arrow(raster), res).to_pandas() \
        .sort_values("tile_id").reset_index(drop=True)
    assert len(got) == (n - 2) * (n - 2)      # interior only
    from parallelspatialquery_ray.functions import grid
    v = {int(t): float(x) for t, x in zip(raster["tile_id"].to_pylist(),
                                          raster["value"].to_pylist())}
    w = 1.0 / n
    for _, r in got.head(10).iterrows():
        ci, cj = (int(a[0]) for a in grid.cell_to_coords(
            np.array([r.tile_id], dtype=np.int64)))
        e = v[int(grid.cell_id(np.array([(ci + 1) * w]),
                               np.array([cj * w]), res)[0])]
        wv = v[int(grid.cell_id(np.array([(ci - 1) * w]),
                                np.array([cj * w]), res)[0])]
        nn = v[int(grid.cell_id(np.array([ci * w]),
                                np.array([(cj + 1) * w]), res)[0])]
        s = v[int(grid.cell_id(np.array([ci * w]),
                               np.array([(cj - 1) * w]), res)[0])]
        assert r.dzdx == e - wv and r.dzdy == nn - s
        assert r.slope_sq == r.dzdx * r.dzdx + r.dzdy * r.dzdy
    # gini: all mass in one cell -> (N-1)/N; uniform over all cells -> 0
    one = pa.table({"x": np.full(100, 0.51), "y": np.full(100, 0.51)})
    g1 = tiles.cell_gini(rd.from_arrow(one), 2)
    assert abs(g1["gini"][0] - 15 / 16) < 1e-12
    xs, ys = np.meshgrid((np.arange(4) + 0.5) / 4, (np.arange(4) + 0.5) / 4)
    flat = pa.table({"x": xs.ravel(), "y": ys.ravel()})
    g0 = tiles.cell_gini(rd.from_arrow(flat), 2)
    assert g0["gini"][0] == 0.0


def test_geohash6_prefix_property_and_roundtrip():
    import numpy as np

    from parallelspatialquery_ray.functions.grid import geohash6
    # nearby points share prefixes; distant ones don't
    x = np.array([0.3001, 0.300100001, 0.9])
    y = np.array([0.7001, 0.700100001, 0.1])
    gh = geohash6(x, y)
    assert gh[0][:5] == gh[1][:5]          # ~3e-9 apart -> same prefix
    assert gh[0][0] != gh[2][0]
    # determinism + shape
    assert (geohash6(x, y) == gh).all() and all(len(g) == 6 for g in gh)


def test_hilbert_key_bijection_adjacency_and_locality():
    import numpy as np

    from parallelspatialquery_ray.functions.grid import hilbert_key
    order = 4
    n = 1 << order
    ix, iy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    x = (ix.ravel() + 0.5) / n
    y = (iy.ravel() + 0.5) / n
    d = hilbert_key(x, y, order)
    # bijection onto [0, 4^order)
    assert sorted(d.tolist()) == list(range(n * n))
    # consecutive curve positions are always 4-adjacent cells (the
    # property Morton does NOT have)
    pos = np.empty((n * n, 2), np.int64)
    pos[d] = np.stack([ix.ravel(), iy.ravel()], axis=1)
    steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert (steps == 1).all()
    # determinism + clamping at the 1.0 edge
    assert (hilbert_key(x, y, order) == d).all()
    assert hilbert_key(np.array([1.0]), np.array([1.0]), order)[0] in d
