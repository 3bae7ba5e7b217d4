"""Hex (H3-style) cell index: numpy<->SQL bit-exactness and hex invariants."""

import duckdb
import numpy as np
import ray.data as rd

from parallelspatialquery_ray.functions import hexgrid
from parallelspatialquery_ray.sources import synth
from parallelspatialquery_ray.stages import tiles

SIZE = 0.07


def test_hex_assign_sql_bit_exact():
    ids = np.arange(1, 50001)
    x, y = synth.derive_points(ids)
    hq, hr = hexgrid.hex_assign(x, y, SIZE)
    xs, ys = synth.derive_points_sql("i")
    cte = (f"WITH pts AS (SELECT i, {xs} AS x, {ys} AS y "
           f"FROM (SELECT unnest(range(1, 50001))::BIGINT AS i))"
           + hexgrid.hex_sql_cte("pts", SIZE))
    df = duckdb.sql(cte + "SELECT i, hq, hr FROM hex ORDER BY i").df()
    assert (df["hq"].to_numpy() == hq).all()
    assert (df["hr"].to_numpy() == hr).all()


def test_hex_center_roundtrip_and_nearest():
    rng = np.random.default_rng(5)
    x, y = rng.random(5000), rng.random(5000)
    hq, hr = hexgrid.hex_assign(x, y, SIZE)
    cx, cy = hexgrid.hex_center(hq, hr, SIZE)
    q2, r2 = hexgrid.hex_assign(cx, cy, SIZE)
    assert (q2 == hq).all() and (r2 == hr).all()
    # assignment is nearest-center: own center no farther than any ring-1
    # neighbor's center (strict hexagonal Voronoi property)
    nq, nr = hexgrid.ring1(hq, hr)
    ncx, ncy = hexgrid.hex_center(nq, nr, SIZE)
    own = (x - cx) ** 2 + (y - cy) ** 2
    nbr = (np.repeat(x, 6) - ncx) ** 2 + (np.repeat(y, 6) - ncy) ** 2
    assert (own <= nbr.reshape(-1, 6).min(axis=1) + 1e-12).all()


def test_ring1_is_symmetric_distance():
    """All 6 neighbors sit at the same center distance (isotropic halo)."""
    cq, cr = hexgrid.ring1(np.array([3]), np.array([-2]))
    cx, cy = hexgrid.hex_center(cq, cr, SIZE)
    ox, oy = hexgrid.hex_center(np.array([3]), np.array([-2]), SIZE)
    d = np.hypot(cx - ox[0], cy - oy[0])
    assert np.allclose(d, d[0])
    assert len(np.unique(cq * 100 + cr)) == 6


def test_hex_aggregate_counts(ray_session):
    ids = np.arange(1, 20001)
    x, y = synth.derive_points(ids)
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({"x": x, "y": y}))
    out = tiles.hex_aggregate(ds, SIZE).to_pandas()
    assert out["n"].sum() == 20000
    hq, hr = hexgrid.hex_assign(x, y, SIZE)
    key = hq * (1 << 32) + hr
    assert len(out) == len(np.unique(key))
    # spot check one hex's count and x-extrema
    row = out.sort_values(["hq", "hr"]).iloc[0]
    m = (hq == row["hq"]) & (hr == row["hr"])
    assert m.sum() == row["n"]
    assert x[m].min() == row["min_x"] and x[m].max() == row["max_x"]


def test_hex_focal_mean_window(ray_session):
    # 7-hex window smoothing: numpy oracle over the same hex assignment,
    # absent neighbors contribute 0; only occupied hexes are emitted.
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.functions import hexgrid
    from parallelspatialquery_ray.stages.tiles import hex_focal_mean
    rng = np.random.default_rng(8)
    n = 5000
    x = rng.uniform(0, 1, n)
    y = rng.uniform(0, 1, n)
    got = hex_focal_mean(
        rd.from_arrow(pa.table({"x": x, "y": y})).repartition(5),
        0.07).to_pandas().sort_values(["hq", "hr"]).reset_index(drop=True)
    hq, hr = hexgrid.hex_assign(x, y, 0.07)
    cnt = pd.DataFrame({"hq": hq, "hr": hr}).groupby(
        ["hq", "hr"]).size().to_dict()
    dq = [0, 1, 1, 0, -1, -1, 0]
    dr = [0, 0, -1, -1, 0, 1, 1]
    want = {k: sum(cnt.get((k[0] + a, k[1] + b), 0)
                   for a, b in zip(dq, dr)) / 7.0 for k in cnt}
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(r.hq, r.hr)] == r.smoothed
