"""Point-in-polygon join and raster<->vector tiling vs numpy/duckdb oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallelspatialquery_ray.functions import grid
from parallelspatialquery_ray.sources import synth
from parallelspatialquery_ray.stages import tiles
from parallelspatialquery_ray.stages.pip import (
    convex_pip_sql_predicate, cross_sign_inside, point_in_polygon_join,
    ray_cast_inside)


def test_convex_test_matches_ray_casting_off_boundary():
    polys = synth.convex_polygons(8, seed=5)
    rng = np.random.default_rng(6)
    px, py = rng.random(5000), rng.random(5000)
    for p in polys:
        a = cross_sign_inside(px, py, p["ring"])
        b = ray_cast_inside(px, py, p["ring"])
        # random points never hit edges exactly -> predicates agree
        assert np.array_equal(a, b), p["poly_id"]


def test_concave_l_shape():
    p = synth.l_shape_polygon()
    px = np.array([0.2, 0.5, 0.5, 0.2, 0.9])
    py = np.array([0.2, 0.2, 0.5, 0.5, 0.9])
    got = ray_cast_inside(px, py, p["ring"])
    assert got.tolist() == [True, True, False, True, False]


def test_pip_join_matches_numpy_oracle():
    tbl = synth.geo_doc_table(1000, seed=13)
    polys = synth.convex_polygons(6, seed=14) + [synth.l_shape_polygon()]
    out = point_in_polygon_join(rd.from_arrow(tbl), polys).to_pandas()
    px, py = tbl["x"].to_numpy(), tbl["y"].to_numpy()
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    want = set()
    for p in polys:
        m = ray_cast_inside(px, py, p["ring"])
        want |= {(i, p["poly_id"]) for i in ids[m]}
    got = set(zip(out["point_id"], out["poly_id"]))
    assert got == want and len(out) == len(want)


def test_pip_convex_sql_oracle_parity():
    # engine convex method vs the generated DuckDB LATERAL predicate —
    # identical IEEE expressions -> identical membership.
    tbl = synth.geo_doc_table(800, seed=15)
    polys = synth.convex_polygons(5, seed=16)
    out = point_in_polygon_join(rd.from_arrow(tbl), polys,
                                method="convex").to_pandas()
    con = duckdb.connect()
    con.register("pts", tbl.select(["doc_id", "x", "y"]).to_pandas())
    frag = convex_pip_sql_predicate(polys, "p.x", "p.y")
    sql = (f"SELECT p.doc_id AS point_id, l.poly_id "
           f"FROM pts p, LATERAL ({frag}) l")
    want = con.sql(sql).df()
    assert set(zip(out["point_id"], out["poly_id"])) == \
        set(zip(want["point_id"], want["poly_id"]))


def test_assign_tiles_and_histogram_oracle():
    tbl = synth.geo_doc_table(3000, seed=17, family="clustered")
    ds = rd.from_arrow(tbl)
    res = 3
    hist = tiles.tile_aggregate(ds, res).to_pandas()
    x, y = tbl["x"].to_numpy(), tbl["y"].to_numpy()
    # numpy histogram2d oracle (FIXTURES.md F5)
    n = 1 << res
    h, _, _ = np.histogram2d(x, y, bins=n, range=[[0, 1], [0, 1]])
    want = {int(grid.cell_id(np.array([(i + .5) / n]), np.array([(j + .5) / n]), res)[0]):
            int(h[i, j]) for i in range(n) for j in range(n) if h[i, j] > 0}
    got = dict(zip(hist["tile_id"].astype(int), hist["n"].astype(int)))
    assert got == want


def test_zonal_stats():
    tbl = synth.geo_doc_table(2000, seed=18)
    val = np.arange(2000, dtype=np.float64)
    tbl = tbl.append_column("v", pa.array(val))
    out = tiles.tile_aggregate(rd.from_arrow(tbl), 2, value_col="v").to_pandas()
    t = grid.cell_id(tbl["x"].to_numpy(), tbl["y"].to_numpy(), 2)
    df = pd.DataFrame({"t": t, "v": val})
    want = df.groupby("t")["v"].agg(["count", "sum", "min", "max", "mean"])
    for _, row in out.iterrows():
        w = want.loc[int(row["tile_id"])]
        assert row["n"] == w["count"]
        assert row["value_sum"] == w["sum"]
        assert row["value_min"] == w["min"] and row["value_max"] == w["max"]
        assert np.isclose(row["value_mean"], w["mean"], rtol=1e-12)


def test_raster_roundtrip_and_sql_value():
    res = 4
    raster = tiles.synthetic_raster(res)
    assert len(raster) == 4 ** res
    vec = tiles.raster_to_vector(rd.from_arrow(raster), res).to_pandas()
    assert len(vec) == 4 ** res
    w = 1.0 / (1 << res)
    assert np.allclose(vec["x1"] - vec["x0"], w)
    # SQL parity of the deterministic raster value
    con = duckdb.connect()
    con.register("r", raster.to_pandas())
    got = con.sql(
        f"select {tiles.raster_value_sql('tile_id')} as v from r order by tile_id"
    ).fetchnumpy()["v"]
    want = tiles.raster_value(np.sort(raster["tile_id"].to_numpy()))
    assert np.array_equal(got, want)


def test_pip_cell_index_matches_oracle():
    # Many polygons (>= the cell-index threshold, so the actor uses the
    # cell-cover index): pair set must equal a direct numpy oracle that
    # tests EVERY point against EVERY polygon with no prefilter.
    import numpy as np
    import ray.data as rd

    from parallelspatialquery_ray.sources import synth
    from parallelspatialquery_ray.stages import pip as pip_mod
    from parallelspatialquery_ray.stages.pip import (point_in_polygon_join,
                                                     ray_cast_inside)
    polys = synth.convex_polygons(40, seed=9)
    assert len(polys) >= pip_mod._CELL_INDEX_MIN_POLYS
    tbl = synth.geo_doc_table(2000, seed=8)
    out_idx = point_in_polygon_join(rd.from_arrow(tbl), polys).to_pandas()
    px, py = tbl["x"].to_numpy(), tbl["y"].to_numpy()
    pid = tbl["doc_id"].to_numpy(zero_copy_only=False)
    want = set()
    for p in polys:
        inside = ray_cast_inside(px, py, p["ring"])
        want |= {(i, p["poly_id"]) for i in pid[inside]}
    got = set(zip(out_idx["point_id"], out_idx["poly_id"]))
    assert got == want and len(out_idx) == len(got)


def test_tile_pyramid_levels_consistent():
    import numpy as np
    import ray.data as rd

    from parallelspatialquery_ray.sources import synth
    from parallelspatialquery_ray.stages import tiles
    tbl = synth.geo_doc_table(3000, seed=12, family="clustered")
    out = tiles.tile_pyramid(rd.from_arrow(tbl), 5, 1).to_pandas()
    n = len(tbl)
    for level, grp in out.groupby("level"):
        assert grp["n"].sum() == n, level            # every level partitions
        assert grp["tile_id"].is_unique
        assert (grp["tile_id"] < 4 ** level).all()
    # each parent's count equals the sum of its children
    for level in range(5, 1, -1):
        fine = out[out["level"] == level]
        coarse = out[out["level"] == level - 1].set_index("tile_id")["n"]
        roll = fine.groupby(fine["tile_id"] // 4)["n"].sum()
        assert roll.to_dict() == coarse.to_dict()


def test_kde_heatmap_mass_and_symmetry(ray_session):
    """Total splat mass equals the per-point numpy sum; a point in the
    middle of a tile contributes the full kernel to its own tile."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages import tiles as T

    res, bw = 8, 0.2
    rng = np.random.default_rng(11)
    x, y = rng.random(2000), rng.random(2000)
    out = T.kde_heatmap(rd.from_arrow(pa.table({"x": x, "y": y})),
                        res, bw).to_pandas()
    # independent numpy oracle: full cross product, same quantization
    ti = np.arange(res)
    cx = (ti + 0.5) / res
    gx, gy = np.meshgrid(cx, cx, indexing="ij")
    d2 = ((x[:, None, None] - gx[None]) ** 2
          + (y[:, None, None] - gy[None]) ** 2)
    u = d2 / (bw * bw)
    w = np.floor((1.0 - u) * (1.0 - u) * 1048576.0).astype(np.int64)
    w[d2 > bw * bw] = 0
    want = w.sum(axis=0)
    got = np.zeros((res, res), dtype=np.int64)
    got[out["ti"].to_numpy(), out["tj"].to_numpy()] = \
        out["w_sum"].to_numpy()
    assert (got == want).all()
    assert np.allclose(out["density"], out["w_sum"] / 1048576.0)


def test_hotspot_cells_gi_star(ray_session):
    """Gi* z-scores match a dense numpy implementation over the full grid."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages import tiles as T

    res = 8
    rng = np.random.default_rng(3)
    # clustered points -> a real hotspot
    x = np.concatenate([rng.random(500), 0.1 + 0.05 * rng.random(500)])
    y = np.concatenate([rng.random(500), 0.7 + 0.05 * rng.random(500)])
    out = T.hotspot_cells(rd.from_arrow(pa.table({"x": x, "y": y})),
                          res).to_pandas().set_index("cell")
    grid_counts = np.zeros((res, res), dtype=np.int64)
    np.add.at(grid_counts,
              (np.floor(x * res).astype(int), np.floor(y * res).astype(int)),
              1)
    N = res * res
    T_ = grid_counts.sum()
    xbar = T_ / N
    s = np.sqrt((grid_counts.astype(np.int64) ** 2).sum() / N - xbar * xbar)
    padded = np.pad(grid_counts, 1)
    for cell, row in out.iterrows():
        ci, cj = divmod(int(cell), res)
        g = padded[ci:ci + 3, cj:cj + 3].sum()
        w = (3 - (ci == 0) - (ci == res - 1)) * (3 - (cj == 0) - (cj == res - 1))
        z = (g - xbar * w) / (s * np.sqrt((N * w - w * w) / (N - 1.0)))
        assert row["g"] == g and row["w"] == w
        assert row["z"] == z  # bit-exact
    # the planted cluster really is the hottest region
    top = out.sort_values("z").index[-1]
    ti, tj = divmod(int(top), res)
    assert abs(ti - int(0.125 * res)) <= 1 and abs(tj - int(0.725 * res)) <= 1


def test_idw_surface_exact(ray_session):
    """IDW grid values equal a dense numpy implementation."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages import tiles as T

    rng = np.random.default_rng(21)
    n, res, k = 400, 4, 5
    x, y = rng.random(n), rng.random(n)
    v = rng.integers(0, 1000, n)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "x": x, "y": y, "value": pa.array(v, pa.int64())}))
    out = T.idw_surface(ds, res, k).to_pandas() \
        .sort_values("gid").reset_index(drop=True)
    assert len(out) == res * res and (out["n_used"] == k).all()
    for _, row in out.iterrows():
        gx, gy = row["gx"], row["gy"]
        d2 = (x - gx) ** 2 + (y - gy) ** 2
        order = np.lexsort((np.arange(n), d2))[:k]
        w = np.floor(1048576.0 / (1e-06 + d2[order])).astype(np.int64)
        want = (w * v[order]).sum() / w.sum()
        assert row["idw"] == want  # bit-exact


def test_morans_i_sign_and_reference():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.tiles import morans_i

    res = 4

    def run(xs, ys):
        tbl = pa.table({"doc_id": pa.array(np.arange(len(xs)), pa.int64()),
                        "x": pa.array(xs), "y": pa.array(ys)})
        return morans_i(rd.from_arrow(tbl), res).to_pandas().iloc[0]

    # half-plane gradient: dense left half, empty right -> positive
    # autocorrelation (dense cells adjoin dense cells)
    rng = np.random.default_rng(5)
    n = 200
    row = run(rng.uniform(0, 0.49, n), rng.uniform(0, 0.99, n))
    assert row["moran_i"] > 0
    # checkerboard occupancy -> negative autocorrelation
    cells = [(i, j) for i in range(res) for j in range(res)
             if (i + j) % 2 == 0]
    xs = np.concatenate([rng.uniform(i / res, (i + .99) / res, 25)
                         for i, j in cells])
    ys = np.concatenate([rng.uniform(j / res, (j + .99) / res, 25)
                         for i, j in cells])
    row2 = run(xs, ys)
    assert row2["moran_i"] < 0

    # reference formula on the dense grid (float, independent path)
    c = np.zeros((res, res))
    i = np.clip((xs * res).astype(int), 0, res - 1)
    j = np.clip((ys * res).astype(int), 0, res - 1)
    np.add.at(c, (i, j), 1)
    zf = c - c.mean()
    num = 0.0
    w = 0
    for a in range(res):
        for b in range(res):
            for da in (-1, 0, 1):
                for db in (-1, 0, 1):
                    if (da or db) and 0 <= a + da < res and 0 <= b + db < res:
                        num += zf[a, b] * zf[a + da, b + db]
                        w += 1
    want = (res * res) * num / (w * (zf ** 2).sum())
    assert abs(row2["moran_i"] - want) < 1e-9


def test_covisit_pairs_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.tiles import covisit_pairs
    rng = np.random.default_rng(11)
    n = 2000
    t = pa.table({"user_id": pa.array(rng.integers(0, 25, n)),
                  "x": rng.random(n), "y": rng.random(n)})
    out = covisit_pairs(rd.from_arrow(t).repartition(5), grid_n=8,
                        min_cells=3).to_pandas()
    got = {(a, b): c for a, b, c in
           zip(out["user_a"], out["user_b"], out["n_cells"])}
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    cell = (np.minimum((x * 8).astype(np.int64), 7) * 8
            + np.minimum((y * 8).astype(np.int64), 7))
    u = t["user_id"].to_numpy()
    cells_of = {}
    for uu, cc in zip(u, cell):
        cells_of.setdefault(int(uu), set()).add(int(cc))
    want = {}
    users = sorted(cells_of)
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            c = len(cells_of[a] & cells_of[b])
            if c >= 3:
                want[(a, b)] = c
    assert got == want and len(want) > 5


def test_pip_concave_parity_hand_points(ray_session):
    # The notched polygon: centers of the notches are OUTSIDE (that's the
    # concavity the convex test can't express), deep interior is inside.
    import numpy as np

    from parallelspatialquery_ray.pipelines.queries import (_CONCAVE_RING,
                                                            q_pip_concave)

    def inside_ref(px, py):
        # float ray casting reference
        acc = False
        n = len(_CONCAVE_RING)
        for i in range(n):
            x1, y1 = _CONCAVE_RING[i]
            x2, y2 = _CONCAVE_RING[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                acc ^= px < xint
        return acc

    # deep interior / notch centers / outside corners
    assert inside_ref(500000, 300000)
    assert not inside_ref(575000, 650000)     # inside notch 1 cut
    assert not inside_ref(100000, 100000)
    rng = np.random.default_rng(2)
    pts = rng.integers(0, 1 << 20, (300, 2))
    want = {(int(x), int(y)) for x, y in pts if inside_ref(x, y)}
    # engine parity (exact ints) must agree with float ref on these
    from parallelspatialquery_ray.pipelines import queries as Q
    import pyarrow as pa
    px = pts[:, 0].astype(np.int64)
    py = pts[:, 1].astype(np.int64)
    acc = np.zeros(len(px), dtype=bool)
    n = len(_CONCAVE_RING)
    for i in range(n):
        x1, y1 = _CONCAVE_RING[i]
        x2, y2 = _CONCAVE_RING[(i + 1) % n]
        dy = y2 - y1
        if dy == 0:
            continue
        crosses = (y1 > py) != (y2 > py)
        lhs = (x2 - x1) * (py - y1) - (px - x1) * dy
        acc ^= crosses & ((lhs > 0) if dy > 0 else (lhs < 0))
    got = {(int(x), int(y)) for (x, y), a in zip(pts, acc) if a}
    assert got == want
