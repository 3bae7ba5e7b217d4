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


def _kmeans_ref(x, y, cent0, iters, quant=1 << 20):
    import numpy as np
    cent = np.asarray(cent0, float).copy()
    for _ in range(iters):
        dx = x[:, None] - cent[None, :, 0]
        dy = y[:, None] - cent[None, :, 1]
        cid = np.argmin(dx * dx + dy * dy, axis=1)
        for c in range(len(cent)):
            m = cid == c
            if m.any():
                sx = int(np.floor(x[m] * float(quant)).astype("int64").sum())
                sy = int(np.floor(y[m] * float(quant)).astype("int64").sum())
                cent[c] = (sx / (float(m.sum()) * float(quant)),
                           sy / (float(m.sum()) * float(quant)))
    dx = x[:, None] - cent[None, :, 0]
    dy = y[:, None] - cent[None, :, 1]
    return np.argmin(dx * dx + dy * dy, axis=1)


def test_kmeans_matches_reference_and_handles_empty_cluster():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.sources import synth
    from parallelspatialquery_ray.stages.cluster import kmeans_fixed

    tbl = synth.geo_doc_table(3000, seed=21, family="clustered")
    x = tbl["x"].to_numpy()
    y = tbl["y"].to_numpy()
    # one seed far outside the unit square -> stays empty across iterations
    init = [(0.2, 0.2), (0.8, 0.2), (0.2, 0.8), (0.8, 0.8), (5.0, 5.0)]
    want = _kmeans_ref(x, y, init, 3)
    assert (want == 4).sum() == 0  # the far seed captured nothing

    ds = rd.from_arrow(tbl)
    got = kmeans_fixed(ds, init, 3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ids = tbl["doc_id"].to_numpy()
    order = np.argsort(ids)
    assert (got["doc_id"].to_numpy() == ids[order]).all()
    assert (got["cluster"].to_numpy() == want[order]).all()

    # parallelism invariance: different block structure, identical labels
    got2 = kmeans_fixed(ds.repartition(7), init, 3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got2["cluster"].to_numpy() == got["cluster"].to_numpy()).all()


def test_graph_propagation_integer_fixpoint(ray_session):
    # tiny directed graph with constant out-degree 2; hand-computed ranks
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import graph_propagation
    # edges: 0->{1,2}, 1->{0,2}, 2->{2,2} (self twice)
    e = pa.table({"input_id": pa.array([0, 0, 1, 1, 2, 2], pa.int64()),
                  "neighbor_id": pa.array([1, 2, 0, 2, 2, 2], pa.int64())})
    out = graph_propagation(rd.from_arrow(e), out_deg=2, iters=1,
                            init=100, base=10, damp_num=85, damp_den=100)
    r = dict(zip(out["id"], out["rank_fp"]))
    # contributions: each edge carries 100 // 2 = 50
    assert r[0] == 10 + (85 * 50) // 100          # one in-edge (1->0)
    assert r[1] == 10 + (85 * 50) // 100          # one in-edge (0->1)
    assert r[2] == 10 + (85 * 200) // 100         # four in-edges


def test_graph_propagation_joined_path_bit_equal(ray_session):
    # broadcast vs joined path must be bit-identical (integer fixed-point);
    # a 200-node random-regular graph with multi-edges and sinks
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import graph_propagation

    rng = np.random.default_rng(7)
    k = 4
    src = np.repeat(np.arange(200, dtype=np.int64), k)
    dst = rng.integers(0, 200, size=200 * k).astype(np.int64)
    e = pa.table({"input_id": pa.array(src), "neighbor_id": pa.array(dst)})
    small = graph_propagation(rd.from_arrow(e), out_deg=k, iters=3)
    big = graph_propagation(rd.from_arrow(e).repartition(5), out_deg=k,
                            iters=3, broadcast_limit=0)
    big_df = big.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(small["id"]) == list(big_df["id"])
    assert (small["rank_fp"].to_numpy()
            == big_df["rank_fp"].to_numpy()).all()


def test_triangle_counts_hand_graph(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import triangle_counts
    # K4 on {0,1,2,3} (4 triangles, each node in 3) plus a pendant 3-4
    # and a directed duplicate + self-loop that must be ignored
    src = [0, 0, 0, 1, 1, 2, 3, 1, 5, 4]
    dst = [1, 2, 3, 2, 3, 3, 4, 0, 5, 3]   # 1->0 dup of 0->1; 5->5 loop
    e = pa.table({"input_id": pa.array(src, pa.int64()),
                  "neighbor_id": pa.array(dst, pa.int64())})
    out = triangle_counts(rd.from_arrow(e).repartition(3)).to_pandas()
    got = dict(zip(out["id"], out["n_tri"]))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}   # nodes 4, 5 in none


def test_clustering_coefficient_hand_graph(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import clustering_coefficient
    # triangle 0-1-2 plus pendant 2-3
    e = pa.table({"input_id": pa.array([0, 1, 2, 2], pa.int64()),
                  "neighbor_id": pa.array([1, 2, 0, 3], pa.int64())})
    out = clustering_coefficient(rd.from_arrow(e).repartition(2)) \
        .to_pandas().set_index("id")
    assert out.loc[0, "coeff"] == 1.0 and out.loc[0, "deg"] == 2
    assert out.loc[2, "deg"] == 3 and out.loc[2, "n_tri"] == 1
    assert out.loc[2, "coeff"] == 2.0 * 1 / (3 * 2)
    assert out.loc[3, "coeff"] == 0.0 and out.loc[3, "n_tri"] == 0


def test_common_neighbors_hand_graph(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import common_neighbors
    # path 0-1-2-3 plus 0-4, 2-4:
    #   adj: 0={1,4} 1={0,2} 2={1,3,4} 3={2} 4={0,2}
    #   non-edges with shared neighbors: (0,2) via {1,4} -> 2;
    #   (1,3) via {2} -> 1; (1,4) via {0,2} -> 2; (3,4) via {2} -> 1;
    #   (1,2) IS an edge (excluded)
    e = pa.table({"input_id": pa.array([0, 1, 2, 0, 2], pa.int64()),
                  "neighbor_id": pa.array([1, 2, 3, 4, 4], pa.int64())})
    out = common_neighbors(rd.from_arrow(e).repartition(3), top_n=10) \
        .to_pandas()
    got = {(a, b): n for a, b, n in
           zip(out["a_id"], out["b_id"], out["n_common"])}
    assert got == {(0, 2): 2, (1, 3): 1, (1, 4): 2, (3, 4): 1}
    # ties on count -> (a_id, b_id) ascending: (0,2) before (1,4)
    assert tuple(out.iloc[0][["a_id", "b_id", "n_common"]]) == (0, 2, 2)
    # top_n truncation is deterministic
    out1 = common_neighbors(rd.from_arrow(e).repartition(2), top_n=1) \
        .to_pandas()
    assert len(out1) == 1 and tuple(out1.iloc[0][["a_id", "b_id"]]) == (0, 2)


def test_common_neighbors_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import common_neighbors
    rng = np.random.default_rng(31)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    e = pa.table({"input_id": pa.array(src), "neighbor_id": pa.array(dst)})
    out = common_neighbors(rd.from_arrow(e).repartition(5), top_n=15) \
        .to_pandas()

    adj = {}
    for s, t in zip(src, dst):
        if s != t:
            adj.setdefault(int(s), set()).add(int(t))
            adj.setdefault(int(t), set()).add(int(s))
    want = []
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            c = len(adj[u] & adj[v])
            if c:
                want.append((-c, u, v))
    want = [(u, v, -negc) for negc, u, v in sorted(want)[:15]]
    got = list(zip(out["a_id"], out["b_id"], out["n_common"]))
    assert got == want


def test_connected_components_both_paths(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import connected_components
    rng = np.random.default_rng(7)
    # sparse random graph with isolated-ish fragments + dups + self-loops
    src = rng.integers(0, 120, 150)
    dst = rng.integers(0, 120, 150)
    e = pa.table({"input_id": pa.array(src), "neighbor_id": pa.array(dst)})
    ds = rd.from_arrow(e).repartition(4)
    fast = connected_components(ds).to_pandas()
    dist = connected_components(ds, edge_gate=0).to_pandas()  # force loop
    assert fast.sort_values("id").values.tolist() == \
        dist.sort_values("id").values.tolist()

    # brute force: min reachable id per node
    adj = {}
    for s, t in zip(src, dst):
        if s != t:
            adj.setdefault(int(s), set()).add(int(t))
            adj.setdefault(int(t), set()).add(int(s))
    want = {}
    seen = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        m = min(comp)
        for u in comp:
            want[u] = m
        seen |= comp
    got = dict(zip(fast["id"], fast["component"]))
    assert got == want


def test_bfs_depths_matches_bruteforce(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import bfs_depths
    rng = np.random.default_rng(13)
    src = rng.integers(0, 80, 160)
    dst = rng.integers(0, 80, 160)
    e = pa.table({"input_id": pa.array(src), "neighbor_id": pa.array(dst)})
    seeds = rd.from_arrow(pa.table({"id": pa.array([0, 41, 999],
                                                   pa.int64())}))
    out = bfs_depths(rd.from_arrow(e).repartition(3), seeds,
                     max_depth=3).to_pandas()

    adj = collections.defaultdict(set)
    for s, t in zip(src, dst):
        if s != t:
            adj[int(s)].add(int(t))
            adj[int(t)].add(int(s))
    want = {0: 0, 41: 0, 999: 0}      # seed 999 absent from graph: depth 0
    frontier = {0, 41}
    for d in range(1, 4):
        frontier = {v for u in frontier for v in adj[u]} - set(want)
        for v in frontier:
            want[v] = d
    assert dict(zip(out["id"], out["depth"])) == want


def test_weighted_shortest_paths_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import \
        weighted_shortest_paths
    rng = np.random.default_rng(43)
    src = rng.integers(0, 50, 140)
    dst = rng.integers(0, 50, 140)
    w = rng.integers(1, 100, 140)
    e = pa.table({"input_id": pa.array(src), "neighbor_id": pa.array(dst),
                  "w": pa.array(w)})
    seeds = rd.from_arrow(pa.table({"id": pa.array([0, 7], pa.int64())}))
    H = 3
    out = weighted_shortest_paths(rd.from_arrow(e).repartition(4), seeds,
                                  max_hops=H).to_pandas()

    # brute force: min-weight per undirected pair, Bellman-Ford H rounds
    best = {}
    for s, t, ww in zip(src, dst, w):
        if s == t:
            continue
        k = (min(s, t), max(s, t))
        best[k] = min(best.get(k, 1 << 60), int(ww))
    dist = {0: 0, 7: 0}
    for _ in range(H):
        nd = dict(dist)
        for (a, b), ww in best.items():
            if a in dist:
                nd[b] = min(nd.get(b, 1 << 60), dist[a] + ww)
            if b in dist:
                nd[a] = min(nd.get(a, 1 << 60), dist[b] + ww)
        dist = nd
    assert dict(zip(out["id"], out["dist"])) == dist


def test_seed_dedup_spans_blocks(ray_session):
    """Duplicate seed ids split ACROSS blocks (per-block drop_duplicates
    can't see them) must not violate _relax_neighbors' one-row-per-id
    labels contract — bfs_depths and weighted_shortest_paths dedupe
    globally before the first relaxation."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.cluster import (
        bfs_depths, weighted_shortest_paths)

    e = pa.table({"input_id": pa.array([0, 1, 2], pa.int64()),
                  "neighbor_id": pa.array([1, 2, 3], pa.int64()),
                  "w": pa.array([5, 5, 5], pa.int64())})
    # seed id 0 appears in two separate one-row blocks
    seeds = rd.from_arrow(
        pa.table({"id": pa.array([0], pa.int64())})).union(
        rd.from_arrow(pa.table({"id": pa.array([0], pa.int64())})))

    bfs = bfs_depths(rd.from_arrow(e).repartition(2), seeds,
                     max_depth=3).to_pandas()
    assert dict(zip(bfs["id"], bfs["depth"])) == {0: 0, 1: 1, 2: 2, 3: 3}

    wsp = weighted_shortest_paths(rd.from_arrow(e).repartition(2), seeds,
                                  max_hops=3).to_pandas()
    assert dict(zip(wsp["id"], wsp["dist"])) == {0: 0, 1: 5, 2: 10, 3: 15}


def test_k_core_peels_tail_keeps_triangle():
    # triangle {1,2,3} (a true 2-core) with a pendant chain 3-4-5: the
    # 2-core peel removes 5 (degree 1), then 4, and keeps the triangle
    # with within-core degree 2 everywhere.
    e = pa.table({"id_a": pa.array([1, 2, 1, 3, 4], pa.int64()),
                  "id_b": pa.array([2, 3, 3, 4, 5], pa.int64())})
    out = cluster.k_core(rd.from_arrow(e).repartition(3), 2, 3).to_pandas()
    assert dict(zip(out["id"], out["degree"])) == {1: 2, 2: 2, 3: 2}

    # k=3 empties this graph entirely (no node reaches degree 3 after the
    # first removal round): result has zero rows
    out3 = cluster.k_core(rd.from_arrow(e).repartition(3), 3, 2).to_pandas()
    assert len(out3) == 0
