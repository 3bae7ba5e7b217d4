"""Density-based spatial clustering (grid DBSCAN).

The classic DBSCAN recipe adapted to the engine's cell grid (public
algorithm; the grid variant is the standard scalable formulation): points
are binned at cell width ``1/res``; a cell with ``>= min_pts`` points is
DENSE; clusters are the 8-connected components of dense cells; every point
in a dense cell carries its component's label (the component's minimum
cell id — deterministic), points in sparse cells are noise (label -1).

Distribution shape (the 100-TB story):
- per-cell counts: partial-agg combiner, shuffle rows ∝ nonempty cells;
- the dense-cell set is bounded by ``res²`` (grid geometry, independent of
  the point count), so connected components run as ONE remote union-find
  task over that bounded set — the same off-driver pattern as
  dedup.neardup_clusters; at 10^12 points the dense-cell table for any
  practical eps is millions of rows, seconds of union-find;
- labels return to the corpus as a broadcast map (``ray.put`` once, read
  per batch) — no point-level shuffle at all.

The whole operator is exact and deterministic, verified against a DuckDB
WITH RECURSIVE transitive-closure oracle (pipelines/queries.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .shuffle import sorted_block_reduce


def _cell_counts(ds: ray.data.Dataset, res: int, x_col: str, y_col: str
                 ) -> ray.data.Dataset:
    """Row-major per-cell point counts, partial-aggregated per batch."""

    def partial(b: pa.Table) -> pa.Table:
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

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cell", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    return sorted_block_reduce(ds.map_batches(partial,
                                              batch_format="pyarrow",
                                              batch_size=None),
                               "cell", combine)


@ray.remote
def _components(res: int, min_pts: int, *tbls: pa.Table) -> pa.Table:
    """Union-find over the dense-cell 8-adjacency graph — one task, input
    bounded by the dense-cell count (<= res²).  Labels = min cell id per
    component."""
    live = [t for t in tbls if t.num_rows and "cell" in t.column_names]
    if not live:
        return pa.table({"cell": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    df = pa.concat_tables(live).to_pandas().groupby("cell")["n"].sum()
    dense = np.sort(df[df >= min_pts].index.to_numpy().astype(np.int64))
    pos = {c: i for i, c in enumerate(dense)}
    parent = np.arange(len(dense), dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ci, cj = dense // res, dense % res
    # only 4 of the 8 directions needed (symmetry)
    for di, dj in ((0, 1), (1, -1), (1, 0), (1, 1)):
        ti, tj = ci + di, cj + dj
        ok = (ti >= 0) & (ti < res) & (tj >= 0) & (tj < res)
        for a, t in zip(dense[ok], ti[ok] * res + tj[ok]):
            b = pos.get(int(t))
            if b is not None:
                ra, rb = find(pos[int(a)]), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(dense))], dtype=np.int64)
    return pa.table({"cell": pa.array(dense, pa.int64()),
                     "cluster": pa.array(dense[roots], pa.int64())})


def grid_dbscan(ds: ray.data.Dataset, res: int, min_pts: int, *,
                x_col: str = "x", y_col: str = "y",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-point cluster labels: ``(id, cell, cluster)`` with ``cluster``
    the min dense-cell id of the point's 8-connected dense component, or
    -1 (noise) for points in sparse cells."""
    counts = _cell_counts(ds, res, x_col, y_col).materialize()
    labels_ref = _components.remote(res, min_pts, *counts.to_arrow_refs())
    lbl_tbl = ray.get(labels_ref)
    lut_ref = ray.put((lbl_tbl["cell"].to_numpy(),       # sorted by build
                       lbl_tbl["cluster"].to_numpy()))

    # plain task map (fuses with the upstream read): the label lookup is
    # a zero-copy plasma get per batch
    def assign(b: pa.Table) -> pa.Table:
        cells, labels = ray.get(lut_ref)
        i = np.floor(b[x_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        j = np.floor(b[y_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        np.clip(i, 0, res - 1, out=i)
        np.clip(j, 0, res - 1, out=j)
        cell = i * res + j
        # vectorized sorted-array lookup (no per-row Python)
        if len(cells) == 0:
            lab = np.full(len(cell), -1, dtype=np.int64)
        else:
            idx = np.minimum(np.searchsorted(cells, cell),
                             len(cells) - 1)
            lab = np.where(cells[idx] == cell,
                           labels[idx], np.int64(-1))
        return pa.table({id_col: b[id_col],
                         "cell": pa.array(cell, pa.int64()),
                         "cluster": pa.array(lab, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# k-means (Lloyd's algorithm, fixed iteration count, deterministic)
# ---------------------------------------------------------------------------

def kmeans_fixed(ds: ray.data.Dataset, centroids0, iters: int = 3, *,
                 x_col: str = "x", y_col: str = "y", id_col: str = "doc_id",
                 quant: int = 1 << 20) -> ray.data.Dataset:
    """Distributed Lloyd's k-means with a FIXED iteration count and fully
    deterministic, order-independent arithmetic (bit-reproducible across
    partitionings and parallelism — DuckDB-oracle-gated):

    - assignment: vectorized argmin over the K broadcast centroids, ties
      to the smaller centroid id (numpy argmin == SQL ``ORDER BY d, cid``);
    - update: coordinates quantized to integers (``floor(x * quant)``) so
      per-batch partial sums are EXACT int64 — the mean is one f64 division
      ``sum / (n * quant)`` with identical operands everywhere (float
      partial sums would make the result depend on reduction order);
    - model state (K centroids) lives on the driver between passes — the
      standard iterative-ML shape: tiny state moves, the data never does.
      Each iteration is one streaming pass; per-batch partials are K rows.

    An empty cluster keeps its previous centroid (COALESCE in the oracle).
    """
    cent = np.asarray(centroids0, dtype=np.float64).copy()
    k = len(cent)

    def _quantize(b: pa.Table):
        x = b[x_col].to_numpy(zero_copy_only=False)
        y = b[y_col].to_numpy(zero_copy_only=False)
        qx = np.floor(x * float(quant)).astype(np.int64)
        qy = np.floor(y * float(quant)).astype(np.int64)
        return x, y, qx, qy

    def _nearest(x: np.ndarray, y: np.ndarray, c: np.ndarray) -> np.ndarray:
        # (n, k) distance matrix; same IEEE expression as the SQL oracle:
        # (x-cx)*(x-cx) + (y-cy)*(y-cy).  argmin -> first (smallest cid).
        dx = x[:, None] - c[None, :, 0]
        dy = y[:, None] - c[None, :, 1]
        return np.argmin(dx * dx + dy * dy, axis=1).astype(np.int64)

    for _ in range(iters):
        c_now = cent.copy()

        def partial(b: pa.Table, c_now=c_now) -> pa.Table:
            x, y, qx, qy = _quantize(b)
            cid = _nearest(x, y, c_now)
            sx = np.bincount(cid, weights=None, minlength=k)  # counts
            sqx = np.zeros(k, np.int64); np.add.at(sqx, cid, qx)
            sqy = np.zeros(k, np.int64); np.add.at(sqy, cid, qy)
            return pa.table({"cid": pa.array(np.arange(k, dtype=np.int64)),
                             "sqx": pa.array(sqx),
                             "sqy": pa.array(sqy),
                             "n_": pa.array(sx.astype(np.int64))})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None).take_all()
        sqx = np.zeros(k, np.int64)
        sqy = np.zeros(k, np.int64)
        n = np.zeros(k, np.int64)
        for r in parts:
            sqx[r["cid"]] += r["sqx"]
            sqy[r["cid"]] += r["sqy"]
            n[r["cid"]] += r["n_"]
        nz = n > 0
        cent[nz, 0] = sqx[nz].astype(np.float64) / (n[nz].astype(np.float64)
                                                    * float(quant))
        cent[nz, 1] = sqy[nz].astype(np.float64) / (n[nz].astype(np.float64)
                                                    * float(quant))

    c_fin = cent.copy()

    def assign(b: pa.Table, c_fin=c_fin) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False)
        y = b[y_col].to_numpy(zero_copy_only=False)
        cid = _nearest(x, y, c_fin)
        return pa.table({id_col: b[id_col],
                         "cluster": pa.array(cid, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def graph_propagation(edges: ray.data.Dataset, *, src_col: str = "input_id",
                      dst_col: str = "neighbor_id", out_deg: int,
                      iters: int = 3, init: int = 1_000_000,
                      base: int = 150_000, damp_num: int = 85,
                      damp_den: int = 100,
                      broadcast_limit: int = 4_000_000):
    """Fixed-iteration PageRank-style propagation over a CONSTANT-out-degree
    edge list (e.g. the kNN graph, where out_deg = k including the rank-0
    self edge) — in INTEGER FIXED-POINT so the result is order-independent
    and bit-reproducible in SQL: float PageRank's neighbor sums depend on
    reduction order, integer sums don't.

    r_0(v) = init;  r_{t+1}(v) = base + damp_num·(Σ_{u→v} r_t(u) // out_deg)
    // damp_den  (all int64; nodes with no in-edges get just ``base``).

    Two value-identical execution paths, gated on node count (integer
    arithmetic makes them bit-equal, tested):

    - ``n_nodes <= broadcast_limit``: ranks live in one ``ray.put`` object
      read per edge batch (the standard iterative-algorithm shape — big
      static edges, small mutating state; 4M nodes ≈ 64 MB of plasma).
    - larger graphs: ranks stay a Dataset; each iteration is two sorted
      shuffles — (1) join ranks to edges on src (tagged union, whole key
      groups co-located) emitting per-batch pre-aggregated (dst, contrib)
      partials, (2) grouped sum keyed by dst over contributions unioned
      with zero rows for every node, so no-in-edge nodes still get
      ``base``.  Driver state is O(1); shuffle rows ∝ edges + nodes.

    Returns (id, rank_fp) sorted by id — a pandas DataFrame on the
    broadcast path, a Dataset on the joined path (big results should not
    land on the driver).
    """
    e = edges.select_columns([src_col, dst_col]).materialize()
    nodes_ds = sorted_block_reduce(
        e.map_batches(lambda b: pa.table(
            {"id": pa.concat_arrays([b[src_col].combine_chunks().cast(pa.int64()),
                                     b[dst_col].combine_chunks().cast(pa.int64())])}),
            batch_format="pyarrow"),
        "id", lambda g: g.drop_duplicates()).materialize()
    if nodes_ds.count() <= broadcast_limit:
        return _propagate_broadcast(e, nodes_ds, src_col, dst_col, out_deg,
                                    iters, init, base, damp_num, damp_den)
    return _propagate_joined(e, nodes_ds, src_col, dst_col, out_deg,
                             iters, init, base, damp_num, damp_den)


def _propagate_broadcast(e, nodes_ds, src_col, dst_col, out_deg, iters,
                         init, base, damp_num, damp_den) -> pd.DataFrame:
    """Small-state path: rank table broadcast once per iteration."""
    nodes = nodes_ds.to_pandas()
    ranks = pd.Series(np.int64(init), index=nodes["id"].to_numpy())
    for _ in range(iters):
        ref = ray.put(ranks)

        def contrib(b: pa.Table) -> pa.Table:
            r = ray.get(ref)
            src = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            c = r.loc[src].to_numpy() // np.int64(out_deg)
            df = pd.DataFrame({"id": dst, "c": c}) \
                .groupby("id", as_index=False)["c"].sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        def total(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("id", as_index=False)["c"].sum()

        sums = sorted_block_reduce(
            e.map_batches(contrib, batch_format="pyarrow",
                          batch_size=None), "id", total).to_pandas()
        incoming = pd.Series(np.int64(0), index=ranks.index)
        incoming.loc[sums["id"].to_numpy()] = sums["c"].to_numpy()
        ranks = (np.int64(base)
                 + np.int64(damp_num) * incoming // np.int64(damp_den))
    out = pd.DataFrame({"id": ranks.index.to_numpy().astype(np.int64),
                        "rank_fp": ranks.to_numpy().astype(np.int64)})
    return out.sort_values("id").reset_index(drop=True)


def _propagate_joined(e, nodes_ds, src_col, dst_col, out_deg, iters,
                      init, base, damp_num, damp_den) -> pd.DataFrame:
    """Large-state path: ranks stay a Dataset, two sorted shuffles per
    iteration (join-on-src, then sum-by-dst).  Bit-identical to the
    broadcast path because every reduction is an int64 sum."""
    od = np.int64(out_deg)

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "id": b[src_col].combine_chunks().cast(pa.int64()),
            "dst": b[dst_col].combine_chunks().cast(pa.int64()),
            "val": pa.array(np.zeros(len(b), np.int64)),
            "role": pa.array(np.ones(len(b), np.int8))})

    e_tag = e.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def zero_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({"id": b["id"].combine_chunks().cast(pa.int64()),
                         "c": pa.array(np.zeros(n, np.int64))})

    node_zeros = nodes_ds.map_batches(
        zero_rows, batch_format="pyarrow").materialize()

    def rank_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({"id": b["id"].combine_chunks().cast(pa.int64()),
                         "dst": pa.array(np.full(n, -1, np.int64)),
                         "val": b["r"].combine_chunks().cast(pa.int64()),
                         "role": pa.array(np.zeros(n, np.int8))})

    def fwd(g: pd.DataFrame) -> pa.Table:
        # whole src-key groups: exactly one role-0 (rank) row per id
        rmap = g.loc[g["role"] == 0].set_index("id")["val"]
        eg = g[g["role"] == 1]
        if not len(eg):
            return pa.table({"id": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        c = rmap.loc[eg["id"].to_numpy()].to_numpy() // od
        s = pd.DataFrame({"id": eg["dst"].to_numpy(), "c": c}) \
            .groupby("id", as_index=False)["c"].sum()
        return pa.table({"id": pa.array(s["id"].to_numpy(), pa.int64()),
                         "c": pa.array(s["c"].to_numpy(), pa.int64())})

    def upd(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("id", as_index=False)["c"].sum()
        r = (np.int64(base) + np.int64(damp_num) * s["c"].to_numpy()
             // np.int64(damp_den))
        return pa.table({"id": pa.array(s["id"].to_numpy(), pa.int64()),
                         "r": pa.array(r, pa.int64())})

    ranks = nodes_ds.map_batches(
        lambda b: pa.table({"id": b["id"].combine_chunks().cast(pa.int64()),
                            "r": pa.array(np.full(len(b), init, np.int64))}),
        batch_format="pyarrow").materialize()
    for _ in range(iters):
        tagged = ranks.map_batches(rank_rows, batch_format="pyarrow") \
            .union(e_tag)
        contribs = sorted_block_reduce(tagged, "id", fwd)
        ranks = sorted_block_reduce(
            contribs.union(node_zeros), "id", upd).materialize()
    return ranks.map_batches(
        lambda b: pa.table({"id": b["id"].combine_chunks().cast(pa.int64()),
                            "rank_fp": b["r"].combine_chunks()
                            .cast(pa.int64())}),
        batch_format="pyarrow").sort("id")


def canonical_edges(edges: ray.data.Dataset, *, src_col: str = "input_id",
                    dst_col: str = "neighbor_id") -> ray.data.Dataset:
    """Directed edge list → distinct undirected simple edges (lo < hi,
    self-loops dropped), materialized: one dedup shuffle."""
    def canon(b: pa.Table) -> pa.Table:
        s = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"lo": pa.array(np.minimum(s, d)),
                         "hi": pa.array(np.maximum(s, d))})

    return sorted_block_reduce(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"],
        lambda g: pa.Table.from_pandas(g.drop_duplicates(),
                                       preserve_index=False)).materialize()


def _wedge_edge_union(e: ray.data.Dataset) -> ray.data.Dataset:
    """Shared wedge/closure plumbing for :func:`triangle_counts` and
    :func:`common_neighbors`: canonical edges → incident lists (both
    directions, node-keyed shuffle) → per-node vectorized ragged wedge
    expansion (all neighbor pairs u < v, no per-node Python; wedges per
    node ≤ deg², O(k²) on a symmetrized kNN graph) → wedge rows (role=1,
    carrying their center) unioned with edge rows (role=0), both keyed on
    the packed (lo, hi) pair — ready for a pair-key shuffle where wedges
    meet the edge set."""
    def both_dirs(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(np.concatenate([lo, hi])),
                         "o": pa.array(np.concatenate([hi, lo]))})

    def wedges(g: pd.DataFrame) -> pa.Table:
        n = g["n"].to_numpy()
        o = g["o"].to_numpy()
        order = np.lexsort((o, n))
        n_s, o_s = n[order], o[order]
        _, starts, d = np.unique(n_s, return_index=True, return_counts=True)
        r = np.arange(len(n_s)) - np.repeat(starts, d)
        rem = np.repeat(d, d) - r - 1        # pairs led by each element
        total = int(rem.sum())
        if total == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "center": pa.array([], pa.int64())})
        first = np.repeat(np.arange(len(n_s)), rem)
        run_starts = np.cumsum(rem) - rem
        offs = np.arange(total) - np.repeat(run_starts, rem)
        second = first + 1 + offs
        return pa.table({"lo": pa.array(o_s[first]),
                         "hi": pa.array(o_s[second]),
                         "center": pa.array(n_s[first])})

    w = sorted_block_reduce(
        e.map_batches(both_dirs, batch_format="pyarrow"), "n", wedges)

    def pack(role):
        def f(b: pa.Table) -> pa.Table:
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            if len(hi) and (lo.min() < 0 or hi.max() >= (1 << 32)):
                # pk packs (lo, hi) into one int64 as lo*(2**32)+hi;
                # out-of-range node ids would silently collide
                raise ValueError(
                    "wedge/closure pair keys require node ids in "
                    f"[0, 2**32): got range [{lo.min()}, {hi.max()}]")
            pk = lo * (np.int64(1) << 32) + hi
            ctr = (b["center"].to_numpy(zero_copy_only=False)
                   if role else np.full(len(lo), -1, np.int64))
            return pa.table({"pk": pa.array(pk), "center": pa.array(ctr),
                             "role": pa.array(
                                 np.full(len(lo), role, np.int8))})
        return f

    return w.map_batches(pack(1), batch_format="pyarrow") \
        .union(e.map_batches(pack(0), batch_format="pyarrow"))


def triangle_counts(edges: ray.data.Dataset, *, src_col: str = "input_id",
                    dst_col: str = "neighbor_id",
                    _canon: ray.data.Dataset | None = None
                    ) -> ray.data.Dataset:
    """Per-node triangle participation count over the UNDIRECTED simple
    graph induced by a directed edge list (e.g. the kNN graph) — the
    classic clustering-coefficient numerator.

    Distributed node-iterator shape, every stage group-bounded:

    1. canonicalize (lo < hi, self-loops dropped) + distinct — one shuffle;
    2. incident lists: each edge emitted in both directions, shuffled by
       node; per-node WEDGE enumeration (all neighbor pairs u < v) with a
       fully vectorized ragged pair expansion — no per-node Python loop;
       wedges per node ≤ deg², and a kNN graph's symmetrized degree is
       O(k) by construction;
    3. closure: wedges (u, v, center) unioned with the edge set keyed on
       the packed (u, v) pair — a wedge whose pair key holds an edge row
       is a triangle, counted ONCE per vertex via its center;
    4. center-count partials → final sum keyed by node.

    Returns (id, n_tri) for nodes in ≥1 triangle, sorted by id.  Exact;
    the DuckDB twin is the textbook e1⋈e2⋈e3 join.
    """
    e = (_canon if _canon is not None
         else canonical_edges(edges, src_col=src_col, dst_col=dst_col))
    tagged = _wedge_edge_union(e)

    def close(g: pd.DataFrame) -> pa.Table:
        pk = g["pk"].to_numpy()
        role = g["role"].to_numpy()
        _, inv = np.unique(pk, return_inverse=True)
        has_edge = np.zeros(inv.max() + 1 if len(inv) else 0, bool)
        np.logical_or.at(has_edge, inv[role == 0], True)
        hit = g["center"].to_numpy()[(role == 1) & has_edge[inv]]
        u, c = np.unique(hit, return_counts=True)
        return pa.table({"id": pa.array(u.astype(np.int64)),
                         "t_": pa.array(c.astype(np.int64))})

    parts = sorted_block_reduce(tagged, "pk", close)

    def total(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("id", as_index=False)["t_"].sum()
        return pa.table({"id": pa.array(s["id"].to_numpy(), pa.int64()),
                         "n_tri": pa.array(s["t_"].to_numpy(), pa.int64())})

    return sorted_block_reduce(parts, "id", total).sort("id")


def common_neighbors(edges: ray.data.Dataset, *, top_n: int = 20,
                     src_col: str = "input_id",
                     dst_col: str = "neighbor_id",
                     _canon: ray.data.Dataset | None = None
                     ) -> ray.data.Dataset:
    """Link prediction by common-neighbor count: for every NON-adjacent
    node pair sharing ≥1 neighbor, how many neighbors they share — the
    classic "who should be connected next" score — returning the top
    ``top_n`` pairs by ``(n_common DESC, a_id, b_id)`` (deterministic
    under ties).

    Same distributed shape as :func:`triangle_counts` (shared
    :func:`_wedge_edge_union` stage): a wedge (u, v, center) is one shared
    neighbor of the pair (u, v); after the pair-key shuffle each group
    holds ALL wedges of its pair plus the edge row if the pair is
    adjacent — pairs WITH an edge row are triangles (dropped here), pairs
    without one score n_common = their wedge count.  Per-block top-n
    partials keep the final merge O(blocks · top_n)."""
    e = (_canon if _canon is not None
         else canonical_edges(edges, src_col=src_col, dst_col=dst_col))
    tagged = _wedge_edge_union(e)

    def score(g: pd.DataFrame) -> pa.Table:
        pk = g["pk"].to_numpy()
        role = g["role"].to_numpy()
        uniq, inv = np.unique(pk, return_inverse=True)
        has_edge = np.zeros(len(uniq), bool)
        has_edge[inv[role == 0]] = True
        cnt = np.bincount(inv[role == 1], minlength=len(uniq))
        keep = (~has_edge) & (cnt > 0)
        pks, ns = uniq[keep], cnt[keep].astype(np.int64)
        return pa.table({"a_id": pa.array(pks >> np.int64(32)),
                         "b_id": pa.array(pks & np.int64((1 << 32) - 1)),
                         "n_common": pa.array(ns)})

    parts = sorted_block_reduce(tagged, "pk", score)

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n_common", "a_id", "b_id"],
                              ascending=[False, True, True]).head(top_n)

    local = parts.map_batches(topn, batch_format="pandas", batch_size=None)
    return local.repartition(1).map_batches(topn, batch_format="pandas",
                                            batch_size=None)


def clustering_coefficient(edges: ray.data.Dataset, *,
                           src_col: str = "input_id",
                           dst_col: str = "neighbor_id"
                           ) -> ray.data.Dataset:
    """Local clustering coefficient per node: ``2·n_tri / (deg·(deg−1))``
    over the undirected simple graph — triangle_counts composed with a
    degree count and one id-keyed merge, the canonical-edge stage shared
    (computed once).  The division is one f64 op on exact int64 operands,
    so it is bit-reproducible and matches the SQL twin exactly.  Returns
    (id, deg, n_tri, coeff) for every node, sorted by id."""
    e = canonical_edges(edges, src_col=src_col, dst_col=dst_col)
    tri = triangle_counts(edges, _canon=e)

    def incident(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        ids = np.concatenate([lo, hi])
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"id": pa.array(u.astype(np.int64)),
                         "d_": pa.array(c.astype(np.int64))})

    deg = sorted_block_reduce(
        e.map_batches(incident, batch_format="pyarrow", batch_size=None),
        "id",
        lambda g: pa.Table.from_pandas(
            g.groupby("id", as_index=False)["d_"].sum(),
            preserve_index=False))

    def tag(role, col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "id": b["id"].combine_chunks().cast(pa.int64()),
                "v": b[col].combine_chunks().cast(pa.int64()),
                "role": pa.array(np.full(len(b), role, np.int8))})
        return f

    u = deg.map_batches(tag(0, "d_"), batch_format="pyarrow") \
        .union(tri.map_batches(tag(1, "n_tri"), batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pa.Table:
        dd = g[g["role"] == 0].set_index("id")["v"]
        tt = g[g["role"] == 1].set_index("id")["v"]
        ids = dd.index.to_numpy()              # every node has a degree
        d = dd.to_numpy()
        t = tt.reindex(ids).fillna(0).to_numpy().astype(np.int64)
        denom = d * (d - 1)
        coeff = np.where(denom > 0,
                         (2.0 * t.astype(np.float64))
                         / np.maximum(denom, 1).astype(np.float64), 0.0)
        return pa.table({"id": pa.array(ids.astype(np.int64)),
                         "deg": pa.array(d.astype(np.int64)),
                         "n_tri": pa.array(t),
                         "coeff": pa.array(coeff, pa.float64())})

    return sorted_block_reduce(u, "id", merge).sort("id")


def _adjacency(edges: ray.data.Dataset, *, src_col: str, dst_col: str,
               _canon: ray.data.Dataset | None = None
               ) -> ray.data.Dataset:
    """Distinct canonical edges → (n, o) incidence rows, both directions,
    materialized once (iterative callers rescan it every round)."""
    e = (_canon if _canon is not None
         else canonical_edges(edges, src_col=src_col, dst_col=dst_col))

    def both_dirs(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(np.concatenate([lo, hi])),
                         "o": pa.array(np.concatenate([hi, lo]))})

    return e.map_batches(both_dirs, batch_format="pyarrow").materialize()


def _relax_neighbors(adj: ray.data.Dataset, labels: ray.data.Dataset,
                     agg: str) -> ray.data.Dataset:
    """One distributed relaxation round: for every labeled node, push its
    value along incident edges, then reduce each node's own value with the
    incoming ones (``agg``: "min" label / "min_plus1" depth /
    "min_plus_w" weighted distance via the adjacency ``w`` column).
    Two sorted
    shuffles; every reduction is an int64 min, so the result is
    partitioning-independent.  ``labels``: (id, val) with ONE row per id."""
    def lab_rows(b: pa.Table) -> pa.Table:
        return pa.table({"n": b["id"].combine_chunks().cast(pa.int64()),
                         "o": pa.array(np.full(len(b), -1, np.int64)),
                         "val": b["val"].combine_chunks().cast(pa.int64()),
                         "role": pa.array(np.zeros(len(b), np.int8))})

    def adj_rows(b: pa.Table) -> pa.Table:
        w = (b["w"].combine_chunks().cast(pa.int64())
             if "w" in b.column_names
             else pa.array(np.zeros(len(b), np.int64)))
        return pa.table({"n": b["n"].combine_chunks().cast(pa.int64()),
                         "o": b["o"].combine_chunks().cast(pa.int64()),
                         "val": w,
                         "role": pa.array(np.ones(len(b), np.int8))})

    u = labels.map_batches(lab_rows, batch_format="pyarrow").union(
        adj.map_batches(adj_rows, batch_format="pyarrow"))

    def push(g: pd.DataFrame) -> pd.DataFrame:
        # whole n-key groups: ≤1 label row per id + its incident edges
        lab = g[g["role"] == 0]
        ed = g[g["role"] == 1]
        own = pd.DataFrame({"id": lab["n"].to_numpy(),
                            "val": lab["val"].to_numpy()})
        if not len(ed) or not len(lab):
            return own
        lmap = lab.set_index("n")["val"]
        src_val = lmap.reindex(ed["n"].to_numpy()).to_numpy()
        has = ~np.isnan(src_val)
        sent = src_val[has].astype(np.int64)
        if agg == "min_plus1":
            sent = sent + 1
        elif agg == "min_plus_w":
            sent = sent + ed["val"].to_numpy()[has]
        return pd.concat([own, pd.DataFrame(
            {"id": ed["o"].to_numpy()[has], "val": sent})],
            ignore_index=True)

    cand = sorted_block_reduce(u, "n", push)

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("id", sort=False, as_index=False)["val"].min()

    return sorted_block_reduce(cand, "id", reduce_min)


def _edge_components(*tbls: pa.Table) -> pa.Table:
    """Union-find over an explicit (lo, hi) edge list — one remote task,
    input bounded by the DISTINCT edge count (not the corpus).  Labels =
    min node id per component.  Same off-driver shape as
    :func:`_components` / dedup.neardup_clusters."""
    live = [t for t in tbls if t.num_rows]
    if not live:
        return pa.table({"id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    e = pa.concat_tables(live)
    lo = e["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = e["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([lo, hi]))      # sorted
    pos = {int(c): i for i, c in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in zip(lo, hi):
        ra, rb = find(pos[int(a)]), find(pos[int(b)])
        if ra != rb:
            # nodes is sorted, so min index == min id: root stays min
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    return pa.table({"id": pa.array(nodes, pa.int64()),
                     "component": pa.array(nodes[roots], pa.int64())})


def connected_components(edges: ray.data.Dataset, *,
                         src_col: str = "input_id",
                         dst_col: str = "neighbor_id",
                         max_rounds: int = 64,
                         edge_gate: int = 5_000_000) -> ray.data.Dataset:
    """Connected components of the undirected simple graph: every node
    labeled with the MINIMUM node id reachable from it (the canonical
    deterministic component id).

    Size-gated like :func:`graph_propagation`: a distinct canonical edge
    set ≤ ``edge_gate`` runs as ONE remote union-find task over the edge
    blocks (:func:`_edge_components` — off-driver, the pattern dbscan and
    neardup_clusters use; 5M edges is seconds of DSU).  Above the gate —
    where no single task can hold the edges — the fully distributed
    iterative path takes over: each round is one neighbor-min relaxation
    (:func:`_relax_neighbors`, two sorted shuffles, labels and edges both
    stay Datasets) plus one POINTER-JUMPING contraction (lbl ← lbl(lbl),
    a label-to-label sorted join), so rounds are O(log n) instead of
    O(diameter); labels only decrease and an exact int64 label-sum per
    round detects the fixpoint with one driver scalar.  Both paths are
    exact and produce identical labels (tested)."""
    e = canonical_edges(edges, src_col=src_col, dst_col=dst_col)
    if e.count() <= edge_gate:
        refs = e.to_arrow_refs()
        fn = ray.remote(num_cpus=1)(_edge_components)
        out = ray.get(fn.remote(*refs))
        return ray.data.from_arrow(out)

    adj = _adjacency(edges, src_col=src_col, dst_col=dst_col, _canon=e)
    n_blocks = max(1, adj.num_blocks())

    def self_lab(b: pa.Table) -> pd.DataFrame:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({"id": n, "val": n}).drop_duplicates()

    labels = sorted_block_reduce(
        adj.map_batches(self_lab, batch_format="pyarrow"), "id",
        lambda g: g.drop_duplicates()).repartition(n_blocks).materialize()

    def jump(labels: ray.data.Dataset) -> ray.data.Dataset:
        # lbl'(v) = lbl(lbl(v)): rows (key=lbl(v), v) meet rows (key=id,
        # lbl) — every key IS a node id (labels are min ids), so each key
        # group holds exactly one role-0 row
        def ptr(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": b["val"].combine_chunks().cast(pa.int64()),
                "v": b["id"].combine_chunks().cast(pa.int64()),
                "role": pa.array(np.ones(len(b), np.int8))})

        def anchor(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": b["id"].combine_chunks().cast(pa.int64()),
                "v": b["val"].combine_chunks().cast(pa.int64()),
                "role": pa.array(np.zeros(len(b), np.int8))})

        u = labels.map_batches(anchor, batch_format="pyarrow").union(
            labels.map_batches(ptr, batch_format="pyarrow"))

        def chase(g: pd.DataFrame) -> pd.DataFrame:
            a = g[g["role"] == 0].set_index("k")["v"]
            p = g[g["role"] == 1]
            return pd.DataFrame({
                "id": p["v"].to_numpy(),
                "val": a.reindex(p["k"].to_numpy()).to_numpy()
                        .astype(np.int64)})

        return sorted_block_reduce(u, "k", chase)

    from ray.data.aggregate import Sum
    prev_sum = None
    for _ in range(max_rounds):
        # repartition bounds the per-round block-count growth (each sort
        # would otherwise inflate the next round's task fan-out)
        labels = jump(_relax_neighbors(adj, labels, "min")) \
            .repartition(n_blocks).materialize()
        s = labels.aggregate(Sum("val", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"id": b["id"].combine_chunks().cast(pa.int64()),
                         "component": b["val"].combine_chunks()
                         .cast(pa.int64())})

    return labels.map_batches(out, batch_format="pyarrow").sort("id")


def bfs_depths(edges: ray.data.Dataset, seeds: ray.data.Dataset, *,
               max_depth: int, src_col: str = "input_id",
               dst_col: str = "neighbor_id") -> ray.data.Dataset:
    """Multi-source BFS: the hop distance (≤ ``max_depth``) from the seed
    set to every reachable node of the undirected simple graph — exact
    frontier expansion with labels/frontier as Datasets (two sorted
    shuffles per level via :func:`_relax_neighbors`'s plumbing), min
    depth per node, partitioning-independent.  ``seeds``: a Dataset with
    an ``id`` column (depth 0; seeds absent from the graph are still
    reported at 0)."""
    adj = _adjacency(edges, src_col=src_col, dst_col=dst_col)

    def seed_rows(b: pa.Table) -> pd.DataFrame:
        i = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"id": i,
                             "val": np.zeros(len(i), np.int64)}) \
            .drop_duplicates()

    n_blocks = max(1, adj.num_blocks())
    # global seed dedup (drop_duplicates above is per-block only): a seed
    # id repeated across blocks would violate _relax_neighbors' one-row-
    # per-id labels contract and crash its reindex
    labels = sorted_block_reduce(
        seeds.map_batches(seed_rows, batch_format="pyarrow"), "id",
        lambda g: g.drop_duplicates("id")).materialize()
    for _ in range(max_depth):
        nxt = _relax_neighbors(adj, labels, "min_plus1") \
            .repartition(n_blocks).materialize()
        # fixpoint: relaxation can only add nodes or keep depths (depths
        # never increase; a node's depth is final the round it appears)
        if nxt.count() == labels.count():
            labels = nxt
            break
        labels = nxt

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"id": b["id"].combine_chunks().cast(pa.int64()),
                         "depth": b["val"].combine_chunks()
                         .cast(pa.int64())})

    return labels.map_batches(out, batch_format="pyarrow").sort("id")


def weighted_shortest_paths(edges: ray.data.Dataset,
                            seeds: ray.data.Dataset, *, max_hops: int,
                            weight_col: str = "w",
                            src_col: str = "input_id",
                            dst_col: str = "neighbor_id"
                            ) -> ray.data.Dataset:
    """Bounded-hop Bellman–Ford over the undirected weighted graph: the
    minimum total int64 edge weight over paths of ≤ ``max_hops`` hops
    from the seed set — the weighted generalization of
    :func:`bfs_depths` (same distributed relaxation plumbing, now with
    ``min_plus_w``).  Parallel edges collapse to their MIN weight per
    unordered pair; exactly ``max_hops`` relaxation rounds (with a
    fixpoint early-exit that cannot change the result) make the output
    the exact ≤-max_hops-hop distance, matching a hop-bounded recursive
    SQL twin.  Returns ``(id, dist)`` for reached nodes; labels only
    decrease, so everything is int64-min partitioning-independent."""
    import pandas as pd

    def canon(b: pa.Table) -> pd.DataFrame:
        s = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        df = pd.DataFrame({"lo": np.minimum(s[m], d[m]),
                           "hi": np.maximum(s[m], d[m]), "w": w[m]})
        return df.groupby(["lo", "hi"], as_index=False)["w"].min()

    e = sorted_block_reduce(
        edges.map_batches(canon, batch_format="pyarrow"), ["lo", "hi"],
        lambda grp: grp.groupby(["lo", "hi"], as_index=False)["w"].min())

    def both_dirs(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(np.concatenate([lo, hi])),
                         "o": pa.array(np.concatenate([hi, lo])),
                         "w": pa.array(np.concatenate([w, w]))})

    adj = e.map_batches(both_dirs, batch_format="pyarrow").materialize()
    n_blocks = max(1, adj.num_blocks())

    def seed_rows(b: pa.Table) -> pd.DataFrame:
        i = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"id": i,
                             "val": np.zeros(len(i), np.int64)}) \
            .drop_duplicates()

    from ray.data.aggregate import Sum
    # global seed dedup — same contract as bfs_depths (per-block
    # drop_duplicates alone misses duplicates that span blocks)
    labels = sorted_block_reduce(
        seeds.map_batches(seed_rows, batch_format="pyarrow"), "id",
        lambda g: g.drop_duplicates("id")).materialize()
    prev = None
    for _ in range(max_hops):
        labels = _relax_neighbors(adj, labels, "min_plus_w") \
            .repartition(n_blocks).materialize()
        state = (labels.count(),
                 labels.aggregate(Sum("val", alias_name="s"))["s"])
        if state == prev:       # fixpoint: further rounds are no-ops
            break
        prev = state

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"id": b["id"].combine_chunks().cast(pa.int64()),
                         "dist": b["val"].combine_chunks()
                         .cast(pa.int64())})

    return labels.map_batches(out, batch_format="pyarrow").sort("id")


def k_core(edges: ray.data.Dataset, k: int, rounds: int, *,
           src_col: str = "id_a", dst_col: str = "id_b") -> ray.data.Dataset:
    """Fixed-round k-core peel over an undirected edge list (each edge once,
    any orientation): every round drops nodes whose degree in the surviving
    subgraph is < ``k``, the textbook distributed peel.  FIXED ``rounds``
    (like :func:`kmeans_fixed`'s fixed iterations) make the result
    deterministic and exactly SQL-mirrorable whether or not the peel has
    converged; enough rounds reach the true k-core (each non-converged
    round removes ≥1 node).  Convergence is detected via the per-round
    surviving-edge count: once a round removes nothing the peel is a true
    k-core and remaining rounds are skipped (no-op rounds cannot change
    the result, so early exit is bit-identical); if the round budget runs
    out still removing edges, a warning logs that the output is a
    fixed-round peel whose surviving degrees may still be < k.

    Per round: one degree shuffle (per-batch ``np.unique`` partials — rows
    ∝ distinct ids per batch, never raw endpoints) and two sorted
    semi-joins to drop edges with a dead endpoint — 3 shuffles/round, all
    keyed by node id, the standard iterative-graph shape at cluster scale.
    Returns (id, degree) over the final surviving subgraph."""
    e = edges.select_columns([src_col, dst_col])
    int_fields = {src_col: pa.int64(), dst_col: pa.int64()}

    def _degrees(ed: ray.data.Dataset) -> ray.data.Dataset:
        def part(b: pa.Table) -> pa.Table:
            ids = np.concatenate([
                b[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)])
            u, c = np.unique(ids, return_counts=True)
            return pa.table({"id": pa.array(u),
                             "n_": pa.array(c.astype(np.int64))})

        def comb(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("id", sort=False)["n_"].sum() \
                .reset_index(name="degree")
            out["id"] = out["id"].astype("int64")
            out["degree"] = out["degree"].astype("int64")
            return out

        return sorted_block_reduce(
            ed.map_batches(part, batch_format="pyarrow"), "id", comb)

    from .join import sorted_join
    prev_edges = None
    converged = False
    for _ in range(rounds):
        deg = _degrees(e)
        alive = deg.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["degree"], k)).select(["id"]),
            batch_format="pyarrow")
        # two semi-joins: alive ids are unique (group keys), so an inner
        # join never duplicates edges
        e = sorted_join(e, alive, left_on=src_col, right_on="id",
                        how="inner", left_fields=int_fields,
                        right_fields={"id": pa.int64()},
                        coalesce_right=8).select_columns([src_col, dst_col])
        e = sorted_join(e, alive, left_on=dst_col, right_on="id",
                        how="inner", left_fields=int_fields,
                        right_fields={"id": pa.int64()},
                        coalesce_right=8).select_columns([src_col, dst_col])
        # checkpoint each round: without it the lazy lineage accumulates
        # ~3 sorts/round and re-plans the whole history every round (the
        # same reason weighted_shortest_paths materializes per hop)
        e = e.materialize()
        cur = e.count()
        if prev_edges is not None and cur == prev_edges:
            converged = True   # nothing removed: true k-core reached
            break
        prev_edges = cur
    if not converged and prev_edges:
        import logging
        logging.getLogger(__name__).warning(
            "k_core: round budget (%d) exhausted while still peeling — "
            "result is a fixed-round peel; surviving degrees may be < %d",
            rounds, k)
    return _degrees(e)
