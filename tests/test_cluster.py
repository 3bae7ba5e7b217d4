"""Grid DBSCAN: planted-cluster recovery and exactness invariants."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallelspatialquery_ray.stages import cluster


def _run(x, y, res, min_pts):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(x)), pa.int64()),
        "x": x, "y": y}))
    return cluster.grid_dbscan(ds, res, min_pts).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_two_planted_clusters_and_noise(ray_session):
    rng = np.random.default_rng(9)
    a = 0.10 + 0.08 * rng.random((300, 2))      # dense blob A
    b = 0.70 + 0.08 * rng.random((300, 2))      # dense blob B
    noise = rng.random((20, 2))                 # sparse background
    pts = np.vstack([a, b, noise])
    out = _run(pts[:, 0], pts[:, 1], 16, 5)
    la = out.iloc[:300]["cluster"].unique()
    lb = out.iloc[300:600]["cluster"].unique()
    # each blob maps to exactly one cluster, and they differ
    assert len(la) == 1 and len(lb) == 1 and la[0] != lb[0] >= 0
    # most noise points are noise (some may fall into blob cells)
    assert (out.iloc[600:]["cluster"] == -1).mean() > 0.5


def test_connectivity_exact_vs_numpy(ray_session):
    """Cluster labels equal a dense flood-fill reference."""
    rng = np.random.default_rng(4)
    x, y = rng.random(3000), rng.random(3000)
    res, mp = 8, 30
    out = _run(x, y, res, mp)
    grid = np.zeros((res, res), dtype=int)
    np.add.at(grid, (np.floor(x * res).astype(int),
                     np.floor(y * res).astype(int)), 1)
    dense = grid >= mp
    # flood fill (8-connectivity), label = min cell id
    lab = -np.ones((res, res), dtype=int)
    for i in range(res):
        for j in range(res):
            if dense[i, j] and lab[i, j] < 0:
                stack, comp = [(i, j)], []
                seen = {(i, j)}
                while stack:
                    ci, cj = stack.pop()
                    comp.append((ci, cj))
                    for di in (-1, 0, 1):
                        for dj in (-1, 0, 1):
                            ti, tj = ci + di, cj + dj
                            if 0 <= ti < res and 0 <= tj < res and \
                                    dense[ti, tj] and (ti, tj) not in seen:
                                seen.add((ti, tj))
                                stack.append((ti, tj))
                m = min(ci * res + cj for ci, cj in comp)
                for ci, cj in comp:
                    lab[ci, cj] = m
    want = lab[np.floor(x * res).astype(int), np.floor(y * res).astype(int)]
    assert (out["cluster"].to_numpy() == want).all()
