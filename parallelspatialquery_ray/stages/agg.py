"""Grouped order-statistics operators: per-group top-k and exact median.

Both use PER-BATCH PARTIAL reduction ahead of the range shuffle, so the
data that moves — and the per-group row count a reducer block must hold —
is bounded even when the group key has very low cardinality (a raw
sorted-block reduce on e.g. 5 language groups would need one group's every
row in one block, violating the shuffle module's block-size precondition
at scale):

- top-k: each batch ships only its local top-k per group (vectorized
  sort + cumcount); the final reduce sees <= k rows per (group, batch).
- median: each batch ships (group, value, count) VALUE COUNTS; the final
  reduce computes the exact weighted median from combined counts.  Block
  size per group is its number of DISTINCT values — for discrete-valued
  metrics (lengths, counts, scores) that is far below the row count; for
  continuous high-cardinality values it degrades to the row count, which
  is the intrinsic cost of an exact (non-sketch) median.

DuckDB `median()` / `row_number()` reproduce both for the oracle gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .shuffle import sorted_block_reduce


def grouped_topk(ds: ray.data.Dataset, *, group_col: str, order_col: str,
                 k: int, descending: bool = True,
                 tie_col: str | None = None) -> ray.data.Dataset:
    """Top-k rows per group by ``order_col`` (ties broken by ``tie_col``
    ascending — deterministic output).  Adds a 0-based ``rank`` column."""
    by = [group_col, order_col] + ([tie_col] if tie_col else [])
    asc = [True, not descending] + ([True] if tie_col else [])

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=asc, kind="stable")
        keep = g.groupby(group_col, sort=False).cumcount() < k
        return g[keep.to_numpy()]

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=asc, kind="stable").copy()
        g["rank"] = g.groupby(group_col, sort=False).cumcount() \
            .astype(np.int32)
        return g[g["rank"] < k]

    partial = ds.map_batches(local_topk, batch_format="pandas",
                             batch_size=None)
    return sorted_block_reduce(partial, group_col, final_topk)


def stratified_sample(ds: ray.data.Dataset, *, group_col: str,
                      id_col: str, k: int) -> ray.data.Dataset:
    """Deterministic stratified sample: the ``k`` rows of each group with
    the smallest ``splitmix64(id)`` — a distributed reservoir sample where
    hash order replaces RNG state.  Reproducible across runs, machines and
    partitionings (no seed exchange, no coordination), and at scale it
    rides the grouped-top-k partial reduction: each batch ships at most
    ``k`` rows per group it contains, so shuffle volume is bounded by
    ``k × groups × blocks`` regardless of stratum skew.  Output adds the
    0-based ``rank`` (position in hash order within the stratum).  SQL
    twin: :func:`stratified_sample_sql`."""
    from ..functions.hashing import splitmix64

    def key(b: pa.Table) -> pa.Table:
        h = splitmix64(b[id_col].to_numpy().astype(np.uint64))
        return b.append_column("sample_key", pa.array(h))

    keyed = ds.map_batches(key, batch_format="pyarrow", batch_size=None)
    out = grouped_topk(keyed, group_col=group_col, order_col="sample_key",
                       k=k, descending=False, tie_col=id_col)
    return out.drop_columns(["sample_key"])


def stratified_sample_sql(k: int, table: str = "documents",
                          group_col: str = "source",
                          id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`stratified_sample` (splitmix64 SQL emitter)."""
    from ..functions.hashing import splitmix64_sql_cols
    return f"""
WITH h0 AS (SELECT {group_col}, {id_col}, {id_col}::HUGEINT AS u
            FROM {table}),
sm AS (
  SELECT {group_col}, {id_col},
    {splitmix64_sql_cols('u')}
  FROM h0
),
r AS (
  SELECT {group_col}, {id_col},
         (row_number() OVER (PARTITION BY {group_col}
                             ORDER BY h, {id_col}) - 1)::INTEGER AS rank
  FROM sm
)
SELECT {group_col}, {id_col}, rank FROM r WHERE rank < {k}
"""


def grouped_distinct_count(ds: ray.data.Dataset, *, group_col: str,
                           value_col: str) -> ray.data.Dataset:
    """EXACT count(DISTINCT value) per group: per-batch (group, value)
    dedup partials (one row per distinct pair per batch), range-shuffle on
    the compound pair, then a final dedup + per-group count.  Shuffle
    volume ∝ distinct pairs, never raw rows."""

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return g[[group_col, value_col]].drop_duplicates()

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates([group_col, value_col]) \
            .groupby(group_col, sort=False).size().reset_index(name="n_distinct")
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)
    # shuffle on the PAIR (high cardinality — stays block-size safe), then
    # a per-group partial count; a group's counts can span blocks only if
    # the pair sort splits a group, so finish with a tiny groupby sum
    counted = sorted_block_reduce(partials, [group_col, value_col],
                                  count_distinct)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col, sort=False)["n_distinct"].sum() \
            .reset_index()
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out

    return sorted_block_reduce(counted, group_col, combine)


class HllSketch:
    """Mergeable HyperLogLog register arrays — the classic cardinality
    sketch as a Ray combiner: per-batch partial sketches (one ``2^p``-byte
    register row per group per batch), merged by elementwise max, estimated
    with the standard HLL bias-corrected formula (Flajolet et al. 2007
    constants).  Deterministic (splitmix64 value hashing)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        am = {4: 0.673, 5: 0.697, 6: 0.709}
        self.alpha = am.get(p, 0.7213 / (1 + 1.079 / self.m))

    @staticmethod
    def hash_values(col) -> np.ndarray:
        """uint64 hashes for an int or string column/array."""
        from ..functions.hashing import content_hashes, splitmix64
        if isinstance(col, (pa.Array, pa.ChunkedArray)):
            if pa.types.is_string(col.type):
                return content_hashes(col)[0]
            col = col.to_numpy(zero_copy_only=False)
        return splitmix64(np.asarray(col).astype(np.uint64))

    def add_batch(self, h: np.ndarray) -> np.ndarray:
        """Registers (uint8, size m) for one batch of PRE-HASHED uint64
        values (:meth:`hash_values`)."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        nlz = np.zeros(len(h), dtype=np.uint8)
        cur = rest
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            nlz[mask] += shift
            cur = np.where(mask, cur << np.uint64(shift), cur)
        rank = nlz + 1
        regs = np.zeros(self.m, dtype=np.uint8)
        np.maximum.at(regs, idx, rank)
        return regs

    @staticmethod
    def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.maximum(a, b)

    def estimate(self, regs: np.ndarray) -> float:
        m = float(self.m)
        est = self.alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        return float(est)


def grouped_approx_distinct(ds: ray.data.Dataset, *, group_col: str,
                            value_col: str, p: int = 12) -> ray.data.Dataset:
    """Approximate count(DISTINCT value) per group via HyperLogLog:
    per-batch register partials (2^p bytes per group per batch — constant,
    independent of group size), merged by max in the reducer.  Standard
    error ~1.04/sqrt(2^p) (~1.6% at p=12)."""
    hll = HllSketch(p)

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        h = HllSketch.hash_values(b[value_col])
        keys, inv = np.unique(g, return_inverse=True)
        regs = [hll.add_batch(h[inv == i]).tobytes()
                for i in range(len(keys))]
        return pa.table({group_col: pa.array(keys),
                         "regs": pa.array(regs, pa.binary())})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_n = [], []
        for key, grp in g.groupby(group_col, sort=False):
            regs = np.frombuffer(grp["regs"].iloc[0], dtype=np.uint8).copy()
            for r in grp["regs"].iloc[1:]:
                regs = HllSketch.merge(regs, np.frombuffer(r, np.uint8))
            out_k.append(key)
            out_n.append(hll.estimate(regs))
        return pd.DataFrame({group_col: out_k,
                             "approx_distinct": np.array(out_n, np.float64)})

    return sorted_block_reduce(ds.map_batches(partial, batch_size=None,
                                              batch_format="pyarrow"),
                               group_col, combine)


def grouped_median(ds: ray.data.Dataset, *, group_col: str,
                   value_col: str) -> ray.data.Dataset:
    """Exact per-group median (float64; even-sized groups average the two
    middle values, matching DuckDB ``median()`` and numpy) plus the group
    count — via value-count partials (see module docstring)."""

    def partial_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([group_col, value_col], sort=False) \
            .size().reset_index(name="cnt_")
        out["cnt_"] = out["cnt_"].astype(np.int64)
        return out

    def weighted_median(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, value_col], sort=False)["cnt_"] \
            .sum().reset_index()
        g = g.sort_values([group_col, value_col], kind="stable")
        keys = g[group_col].to_numpy()
        vals = g[value_col].to_numpy().astype(np.float64)
        cnts = g["cnt_"].to_numpy()
        new = np.concatenate([[True], keys[1:] != keys[:-1]])
        starts = np.append(np.nonzero(new)[0], len(keys))
        out_k, out_m, out_n = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            cum = np.cumsum(cnts[s:e])
            n = int(cum[-1])
            i0, i1 = (n - 1) // 2, n // 2
            v0 = vals[s + np.searchsorted(cum, i0, side="right")]
            v1 = vals[s + np.searchsorted(cum, i1, side="right")]
            out_k.append(keys[s])
            out_m.append((v0 + v1) / 2.0)
            out_n.append(n)
        return pd.DataFrame({group_col: out_k,
                             "median_value": np.array(out_m, np.float64),
                             "n": np.array(out_n, np.int64)})

    partial = ds.map_batches(partial_counts, batch_format="pandas",
                             batch_size=None)
    return sorted_block_reduce(partial, group_col, weighted_median)


def grouped_percentile(ds: ray.data.Dataset, *, group_col: str,
                       value_col: str, q: float) -> ray.data.Dataset:
    """EXACT per-group discrete percentile: the smallest value whose
    cumulative count reaches ``ceil(q * n)`` (lower discrete quantile —
    reproducible in SQL with a cumulative-sum window, no interpolation).
    Same value-count-partial shuffle shape as :func:`grouped_median`."""
    import math

    def partial_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([group_col, value_col], sort=False) \
            .size().reset_index(name="cnt_")
        out["cnt_"] = out["cnt_"].astype(np.int64)
        return out

    def weighted_pct(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, value_col], sort=False)["cnt_"] \
            .sum().reset_index()
        g = g.sort_values([group_col, value_col], kind="stable")
        keys = g[group_col].to_numpy()
        vals = g[value_col].to_numpy()
        cnts = g["cnt_"].to_numpy()
        new = np.concatenate([[True], keys[1:] != keys[:-1]])
        starts = np.append(np.nonzero(new)[0], len(keys))
        out_k, out_v, out_n = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            cum = np.cumsum(cnts[s:e])
            n = int(cum[-1])
            target = math.ceil(q * n)
            pos = int(np.searchsorted(cum, target, side="left"))
            out_k.append(keys[s])
            out_v.append(vals[s + pos])
            out_n.append(n)
        return pd.DataFrame({group_col: out_k,
                             "p_value": np.array(out_v, np.int64),
                             "n": np.array(out_n, np.int64)})

    partial = ds.map_batches(partial_counts, batch_format="pandas",
                             batch_size=None)
    counted = sorted_block_reduce(partial, [group_col, value_col],
                                  lambda g: g.groupby(
                                      [group_col, value_col],
                                      sort=False)["cnt_"].sum()
                                  .reset_index())
    return sorted_block_reduce(counted, group_col, weighted_pct)


def grouped_zscore(ds: ray.data.Dataset, *, group_col: str,
                   value_col: str, out_col: str = "z") -> ray.data.Dataset:
    """Per-group z-score standardization of an INTEGER-valued column (the
    feature-normalization step of every ML-prep pipeline): mean/variance
    come from exact int64 sums (S, SSQ, n per group — order-independent),
    then one fixed IEEE expression per row:
    ``z = (x - S/n) / sqrt(SSQ/n - (S/n)²)`` — bit-identical to the SQL
    twin.

    Distribution: per-batch partial (group, S, SSQ, n) rows -> a tiny
    driver-side combine (rows ∝ groups × blocks), stats BROADCAST into a
    second streaming pass — the corpus itself never shuffles."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": b[group_col].to_numpy(zero_copy_only=False),
            "v": b[value_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        df["v2"] = df["v"] * df["v"]
        g = df.groupby("g", sort=False).agg(
            s_=("v", "sum"), ssq_=("v2", "sum"), n_=("v", "size")) \
            .reset_index()
        return pa.table({group_col: pa.array(g["g"]),
                         "s_": pa.array(g["s_"].to_numpy(), pa.int64()),
                         "ssq_": pa.array(g["ssq_"].to_numpy(), pa.int64()),
                         "n_": pa.array(g["n_"].to_numpy(), pa.int64())})

    parts = ds.select_columns([group_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .to_pandas()
    stats = parts.groupby(group_col, sort=False).agg(
        s=("s_", "sum"), ssq=("ssq_", "sum"), n=("n_", "sum"))
    keys = pd.Index(stats.index)
    s_arr = stats["s"].to_numpy().astype(np.float64)
    n_arr = stats["n"].to_numpy().astype(np.float64)
    ssq_arr = stats["ssq"].to_numpy().astype(np.float64)
    mean_arr = s_arr / n_arr
    std_arr = np.sqrt(ssq_arr / n_arr - mean_arr * mean_arr)

    def score(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        x = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = keys.get_indexer(g)  # vectorized key lookup, no per-row loop
        z = (x - mean_arr[idx]) / std_arr[idx]
        return b.append_column(out_col, pa.array(z, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def grouped_zscore_sql(table: str, group_col: str, value_col: str,
                       cols: str, out_col: str = "z") -> str:
    m = f"CAST(st.s AS DOUBLE) / st.n"
    return f"""
WITH st AS (
  SELECT {group_col}, sum({value_col})::BIGINT AS s,
         sum({value_col} * {value_col})::BIGINT AS ssq,
         count(*)::BIGINT AS n
  FROM {table} GROUP BY {group_col}
)
SELECT {cols},
       (t.{value_col} - {m}) /
       sqrt(CAST(st.ssq AS DOUBLE) / st.n - ({m}) * ({m})) AS {out_col}
FROM {table} t JOIN st USING ({group_col})
"""


def _local_skyline(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the 2-D min-min skyline (non-dominated points).

    p dominates q iff p.x <= q.x AND p.y <= q.y AND (p.x < q.x OR
    p.y < q.y); exact-duplicate points do not dominate each other, so all
    copies of a skyline point survive.  Fully vectorized: lexsort by
    (x, y), then a point is dominated iff some strictly-smaller-x point
    has y <= its y (exclusive prefix-min over x-groups) or a same-x point
    has strictly smaller y (group-leader comparison)."""
    n = len(x)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    new_x = np.empty(n, dtype=bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    gid = np.cumsum(new_x) - 1                    # x-group index
    # min y within each x-group = its first element (y-sorted within x)
    lead_y = ys[new_x][gid]
    # prefix-min of group-min-y over STRICTLY smaller x groups (exclusive)
    gmin = np.minimum.accumulate(ys[new_x])       # inclusive per group
    prev_min = np.full(len(gmin), np.inf)
    prev_min[1:] = gmin[:-1]
    dominated = (prev_min[gid] <= ys) | (lead_y < ys)
    return order[~dominated]


def skyline(ds: ray.data.Dataset, *, x_col: str, y_col: str,
            id_col: str, group_col: str | None = None) -> ray.data.Dataset:
    """Distributed 2-D skyline (minimize both axes), optionally per group.

    Non-domination is closed under taking supersets of the candidate pool,
    so the union of per-block local skylines contains the global skyline —
    each block ships only its own non-dominated rows (for random data
    that's O(log n) of the block), and ONE tiny final task re-runs the
    same kernel over the union.  The merge input is bounded by
    sum-of-block-skylines, not n; a skew-proof variant would re-reduce
    hierarchically, which Ray Data's repartition(1) path already handles
    at these sizes.  With ``group_col``, dominance is evaluated within
    each group; the per-group slice loop is bounded by the group-key
    cardinality inside a block, not the row count."""
    out_cols = ([group_col] if group_col else []) + [id_col, x_col, y_col]

    def local(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False)
        y = b[y_col].to_numpy(zero_copy_only=False)
        if group_col is None:
            keep = _local_skyline(x, y)
        else:
            g = b[group_col].to_numpy(zero_copy_only=False)
            order = np.argsort(g, kind="stable")
            bounds = np.flatnonzero(np.diff(g[order])) + 1
            keep = np.concatenate([
                seg[_local_skyline(x[seg], y[seg])]
                for seg in np.split(order, bounds)]) if len(g) else \
                np.empty(0, np.int64)
        return b.select(out_cols).take(pa.array(np.sort(keep)))

    cand = ds.map_batches(local, batch_format="pyarrow", batch_size=None)
    return cand.repartition(1).map_batches(local, batch_format="pyarrow",
                                           batch_size=None)


def _strict_hull(P: np.ndarray) -> np.ndarray:
    """Strict convex hull VERTICES (collinear edge points excluded) of a
    lexsorted distinct (m, 2) int64 array, CCW order — Andrew's monotone
    chain.  The only sequential loop in the hull path; callers shrink m
    with the vectorized Akl–Toussaint filter first, so m is the boundary
    candidate count (O(log n) for uniform blocks), not the block size."""
    m = len(P)
    if m <= 2:
        return P
    def chain(idx):
        out: list[int] = []
        for i in idx:
            while len(out) >= 2:
                ox, oy = P[out[-2]]
                axx, ayy = P[out[-1]]
                if ((axx - ox) * (P[i, 1] - oy)
                        - (ayy - oy) * (P[i, 0] - ox)) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out[:-1]
    lower = chain(range(m))
    upper = chain(range(m - 1, -1, -1))
    return P[np.array(lower + upper, np.int64)]


def _hull_boundary(qx: np.ndarray, qy: np.ndarray, *,
                   final: bool) -> tuple[np.ndarray, np.ndarray]:
    """Distinct points ON the convex-hull boundary of an int64 point set:
    p qualifies iff some line through p has every point on one CLOSED
    side (strict vertices AND edge-collinear points — the definition a
    quadratic SQL twin can evaluate exactly).  All predicates are signs
    of int64 cross products: exact, partitioning-independent.

    Vectorized path: Akl–Toussaint discard (points STRICTLY inside the
    extreme-point quadrilateral cannot be on the boundary) -> monotone
    chain on the survivors -> vectorized on-edge classification of the
    survivors against the O(h) hull edges.  ``final=False`` (the
    per-block pass) passes degenerate <2-distinct-point sets through —
    they may still be on the GLOBAL boundary; ``final=True`` applies the
    SQL-facing "exists q != p" rule (a single distinct point has no
    witness line partner and yields an empty result)."""
    pts = np.unique(np.stack([qx, qy], axis=1), axis=0)   # lexsorted
    n = len(pts)
    if n < 2:
        if final or n == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return pts[:, 0].copy(), pts[:, 1].copy()
    x, y = pts[:, 0], pts[:, 1]
    # extreme points: pts is lexsorted by (x, y), so 0 / n-1 are the x
    # extremes; a y-major lexsort gives the y extremes
    ysort = np.lexsort((x, y))
    ext = [0, int(ysort[0]), n - 1, int(ysort[-1])]
    quad = np.unique(pts[ext], axis=0)
    if len(quad) >= 3:
        hq = _strict_hull(quad)
        inside = np.ones(n, dtype=bool)
        for i in range(len(hq)):                      # <= 4 edges
            ox, oy = hq[i]
            dx = hq[(i + 1) % len(hq)][0] - ox
            dy = hq[(i + 1) % len(hq)][1] - oy
            inside &= (dx * (y - oy) - dy * (x - ox)) > 0
        pts = pts[~inside]
    hull = _strict_hull(pts)
    h = len(hull)
    if h <= 2:                                        # all collinear
        on = np.ones(len(pts), dtype=bool)
    else:
        on = np.zeros(len(pts), dtype=bool)
        px, py = pts[:, 0], pts[:, 1]
        for i in range(h):                            # O(h) vectorized rows
            ox, oy = hull[i]
            ex, ey = hull[(i + 1) % h]
            on |= (((ex - ox) * (py - oy) - (ey - oy) * (px - ox) == 0)
                   & (px >= min(ox, ex)) & (px <= max(ox, ex))
                   & (py >= min(oy, ey)) & (py <= max(oy, ey)))
    return pts[on, 0].copy(), pts[on, 1].copy()


def convex_hull(ds: ray.data.Dataset, *, x_col: str = "hx",
                y_col: str = "hy",
                group_col: str | None = None) -> ray.data.Dataset:
    """Distributed convex hull: every DISTINCT int64 point on the hull
    boundary (vertices and edge-collinear points) of the whole dataset.

    Same two-level shape as :func:`skyline` — boundary membership is
    closed under taking subsets' boundaries (a supporting line for the
    full set supports every block's subset), so each block ships only its
    local boundary (O(log n) points for uniform data) and ONE tiny task
    re-runs the kernel over the union; hull(union of local boundaries) =
    hull(all), so the final pass is exact.  Integer cross products
    throughout keep the result bit-reproducible in a quadratic SQL twin
    ("p is on the hull iff exists q != p with all r on one closed side of
    line pq").

    ``group_col``: per-group hulls instead of one global hull — the local
    pass shrinks each group's points inside every block (group count
    bounds the per-block Python loop), then ONE group-keyed shuffle of
    the tiny boundary candidates finishes each group exactly (the same
    subset-closure argument per group)."""
    if group_col is not None:
        from .shuffle import sorted_block_reduce

        def per_group(final: bool):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                outs = []
                for gv, g in df.groupby(group_col, sort=False):
                    hx, hy = _hull_boundary(
                        g[x_col].to_numpy().astype(np.int64),
                        g[y_col].to_numpy().astype(np.int64), final=final)
                    outs.append(pd.DataFrame(
                        {group_col: np.full(len(hx), gv),
                         x_col: hx, y_col: hy}))
                if not outs:
                    return pd.DataFrame({group_col: [], x_col: [],
                                         y_col: []}).astype(np.int64)
                return pd.concat(outs, ignore_index=True)
            return f

        cand = ds.map_batches(per_group(False), batch_format="pandas",
                              batch_size=None)
        return sorted_block_reduce(cand, group_col, per_group(True))

    def pass_of(final: bool):
        def local(b: pa.Table) -> pa.Table:
            hx, hy = _hull_boundary(
                b[x_col].to_numpy(zero_copy_only=False).astype(np.int64),
                b[y_col].to_numpy(zero_copy_only=False).astype(np.int64),
                final=final)
            return pa.table({x_col: pa.array(hx), y_col: pa.array(hy)})
        return local

    cand = ds.map_batches(pass_of(False), batch_format="pyarrow",
                          batch_size=None)
    return cand.repartition(1).map_batches(pass_of(True),
                                           batch_format="pyarrow",
                                           batch_size=None)


def hull_diameter(ds: ray.data.Dataset, *, x_col: str = "hx",
                  y_col: str = "hy") -> ray.data.Dataset:
    """Farthest pair (diameter) of an int64 point set: the maximum squared
    distance over all point pairs, with the achieving pair canonicalized as
    the lexicographically smallest ``(ax, ay, bx, by)`` tuple (endpoints
    ordered ``(ax, ay) < (bx, by)``) among ties — deterministic and
    SQL-reproducible.

    Both endpoints of a farthest pair lie on the convex-hull boundary, so
    this rides :func:`convex_hull` (per-block Akl–Toussaint shrink, one
    tiny merge) and the final all-pairs max runs on the O(hull) survivor
    set only — never on the input.  Exact int64 arithmetic end to end
    (µ-unit coords keep d² < 2^43)."""
    hull = convex_hull(ds, x_col=x_col, y_col=y_col)

    def diam(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({"ax": pa.array([], pa.int64()),
                          "ay": pa.array([], pa.int64()),
                          "bx": pa.array([], pa.int64()),
                          "by": pa.array([], pa.int64()),
                          "d2": pa.array([], pa.int64())})
        if len(x) < 2:
            return empty
        D = ((x[:, None] - x[None, :]) ** 2
             + (y[:, None] - y[None, :]) ** 2)
        mx = int(D.max())
        ii, jj = np.nonzero(D == mx)
        cand = []
        for i, j in zip(ii[ii < jj], jj[ii < jj]):   # ties only: tiny
            a, c = (int(x[i]), int(y[i])), (int(x[j]), int(y[j]))
            if c < a:
                a, c = c, a
            cand.append((a[0], a[1], c[0], c[1]))
        ax, ay, bx, by = min(cand)
        return pa.table({"ax": pa.array([ax], pa.int64()),
                         "ay": pa.array([ay], pa.int64()),
                         "bx": pa.array([bx], pa.int64()),
                         "by": pa.array([by], pa.int64()),
                         "d2": pa.array([mx], pa.int64())})

    # convex_hull already ends in one block; diam is a per-block epilogue
    return hull.map_batches(diam, batch_format="pyarrow", batch_size=None)


def quantile_sketch(ds: ray.data.Dataset, *, value_col: str,
                    ps=(50, 90, 99), n_buckets: int = 65536
                    ) -> pd.DataFrame:
    """Bucketed-histogram quantiles — the SCALE path for percentiles over
    continuous high-cardinality values, where the exact value-count
    shuffle (:func:`grouped_percentile`) degrades to shipping every
    distinct value.  Two streaming passes: (1) exact global min/max/count
    partials, (2) per-batch int64 bucket counts (``n_buckets`` fixed-width
    bins over [lo, hi]) merged by one tiny shuffle; the p-quantile is
    reported as its bucket's [edge_lo, edge_hi) interval — error bounded
    by (hi-lo)/n_buckets, deterministic, order-independent, and
    reproducible bit-for-bit in SQL (the bucket index, target rank
    ceil(p·n/100) and edge arithmetic are the same integer/IEEE
    expressions), unlike rank-interpolating sketches.

    Shuffle volume: <= n_buckets (bucket, count) int rows per batch; the
    final reduce holds <= n_buckets rows.  Output: (quantile, bucket,
    edge_lo, edge_hi) per requested percentile."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def minmax(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([v.min()]),
                         "hi": pa.array([v.max()]),
                         "n": pa.array([np.int64(len(v))])})

    parts = ds.map_batches(minmax, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    lo = float(parts["lo"].min())
    hi = float(parts["hi"].max())
    n = int(parts["n"].sum())
    width = (hi - lo) / float(n_buckets)

    def bucket_counts(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if width > 0:
            k = np.minimum(np.floor((v - lo) / width).astype(np.int64),
                           n_buckets - 1)
        else:                       # degenerate: all values equal
            k = np.zeros(len(v), np.int64)
        u, c = np.unique(k, return_counts=True)
        return pa.table({"bucket": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(bucket_counts, batch_format="pyarrow",
                            batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("bucket", as_index=False)["cnt"].sum()

    hist = sorted_block_reduce(counts, "bucket", merge) \
        .repartition(1).to_pandas().sort_values("bucket")
    bk = hist["bucket"].to_numpy()
    csum = np.cumsum(hist["cnt"].to_numpy())
    rows = []
    for p in ps:
        target = (n * int(p) + 99) // 100          # ceil(p*n/100), integer
        b = int(bk[np.searchsorted(csum, target)])
        rows.append({"quantile": np.int64(p), "bucket": np.int64(b),
                     "edge_lo": lo + b * width,
                     "edge_hi": lo + (b + 1) * width})
    return pd.DataFrame(rows)


def rollup_counts(ds: ray.data.Dataset, *, cols: tuple,
                  value_col: str | None = None,
                  all_label: str = "(all)",
                  mode: str = "rollup") -> ray.data.Dataset:
    """One-pass ``GROUP BY ROLLUP(*cols)``: every prefix level of the
    grouping columns aggregated together — (c1, c2), (c1,), () for two
    columns — the standard OLAP drill-down cube slice.

    Distribution shape: each batch emits PARTIAL rows for ALL levels at
    once (rolled-up columns carry ``all_label``), so one range shuffle
    keyed on the full column tuple carries ≤ levels × distinct-groups
    rows per batch — never the input rows.  At 10^12 rows the shuffle is
    bounded by group cardinality, the same partial-agg contract as
    word_counts/tumbling_window.  Assumes ``all_label`` is not a live
    value of any grouping column (documented sentinel, like SQL's NULL
    rollup marker with COALESCE).

    Output: *cols, n (count), and ``s`` = sum(value_col) if given.

    ``mode="cube"`` aggregates EVERY subset of the grouping columns
    (``GROUP BY CUBE``) instead of only prefixes — 2^|cols| groupings,
    same one-pass partial shape.
    """
    cols = tuple(cols)
    if mode == "rollup":
        keeps = [list(cols[:lvl]) for lvl in range(len(cols), -1, -1)]
    elif mode == "cube":
        from itertools import combinations
        keeps = [list(c) for r in range(len(cols), -1, -1)
                 for c in combinations(cols, r)]
    else:
        raise ValueError(f"unknown mode {mode!r}")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for keep in keeps:
            if keep:
                g = batch.groupby(keep, as_index=False, sort=False)
                agg = g.size().rename(columns={"size": "n_"})
                if value_col is not None:
                    agg["s_"] = g[value_col].sum()[value_col].to_numpy()
            else:
                agg = pd.DataFrame({"n_": [np.int64(len(batch))]})
                if value_col is not None:
                    agg["s_"] = np.int64(batch[value_col].sum()) \
                        if len(batch) else np.int64(0)
            for c in cols:
                if c not in keep:
                    agg[c] = all_label
            outs.append(agg)
        out = pd.concat(outs, ignore_index=True)
        out["n_"] = out["n_"].astype(np.int64)
        if value_col is not None:
            out["s_"] = out["s_"].astype(np.int64)
        return out[list(cols) + (["n_", "s_"] if value_col is not None
                                 else ["n_"])]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = {"n_": "sum"} | ({"s_": "sum"} if value_col is not None else {})
        out = g.groupby(list(cols), as_index=False, sort=False).agg(agg)
        ren = {"n_": "n"} | ({"s_": "s"} if value_col is not None else {})
        out = out.rename(columns=ren)
        out["n"] = out["n"].astype(np.int64)
        if value_col is not None:
            out["s"] = out["s"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)
    return sorted_block_reduce(partials, list(cols), combine)


def pivot_counts(ds: ray.data.Dataset, *, row_col: str, pivot_col: str,
                 domain: tuple) -> ray.data.Dataset:
    """Crosstab / PIVOT: one output row per ``row_col`` value, one count
    column per value of ``pivot_col``'s (static, caller-supplied) domain
    — the conditional-aggregation pivot every BI layer compiles to.

    The domain must be declared up front because a Dataset's schema is
    static; values outside it land in ``n_other``.  Per-batch partials
    are already-wide rows (one per distinct row key per batch), so the
    shuffle is bounded by |row domain| × batches, independent of input
    rows — and the reducer is a plain column sum."""
    domain = tuple(domain)
    ncols = [f"n_{v}" for v in domain]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        r = batch[row_col]
        p = batch[pivot_col]
        out = {}
        base = r.groupby(r, sort=False).size()
        frame = pd.DataFrame({row_col: base.index.to_numpy()})
        for v, c in zip(domain, ncols):
            m = r[p == v]
            vc = m.groupby(m, sort=False).size()
            frame[c] = vc.reindex(frame[row_col]).fillna(0) \
                .to_numpy().astype(np.int64)
        other = (~p.isin(domain))
        mo = r[other]
        vo = mo.groupby(mo, sort=False).size()
        frame["n_other"] = vo.reindex(frame[row_col]).fillna(0) \
            .to_numpy().astype(np.int64)
        return frame

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(row_col, as_index=False, sort=False).sum()
        for c in ncols + ["n_other"]:
            out[c] = out[c].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)
    return sorted_block_reduce(partials, row_col, combine)


def global_cume_dist(ds: ray.data.Dataset, *, value_col: str,
                     keep_cols: tuple = ()) -> ray.data.Dataset:
    """Exact global cumulative distribution (SQL ``cume_dist() OVER
    (ORDER BY value)``): every row annotated with (# rows ≤ its value)/N
    — deterministic under ties, unlike ntile/row_number.

    A naive global window is a full sort of the table; here it is the
    two-pass histogram-broadcast shape: (1) per-batch VALUE COUNTS ride a
    tiny shuffle (rows ∝ distinct values × batches) and the merged
    histogram's cumulative sums are broadcast once (``ray.put``); (2) a
    streaming map annotates rows by lookup.  Assumes the value domain is
    DISCRETE (lengths, counts, scores): the histogram is bounded by
    distinct-value count, not rows.  For continuous high-cardinality
    values use quantile_sketch instead."""
    import ray

    def vc(b: pd.DataFrame) -> pd.DataFrame:
        c = b[value_col].value_counts()
        return pd.DataFrame({"v": c.index.to_numpy(),
                             "c_": c.to_numpy().astype(np.int64)})

    hist = sorted_block_reduce(
        ds.map_batches(vc, batch_format="pandas", batch_size=None),
        "v", lambda g: g.groupby("v", as_index=False)["c_"].sum()) \
        .to_pandas().sort_values("v")
    vals = hist["v"].to_numpy()
    cum = np.cumsum(hist["c_"].to_numpy()).astype(np.int64)
    n = np.int64(cum[-1]) if len(cum) else np.int64(0)
    ref = ray.put((vals, cum))

    def annotate(b: pd.DataFrame) -> pd.DataFrame:
        vv, cc = ray.get(ref)
        idx = np.searchsorted(vv, b[value_col].to_numpy())
        out = b[list(keep_cols) + [value_col]].copy()
        out["cd"] = cc[idx].astype(np.float64) / np.float64(n)
        return out

    return ds.map_batches(annotate, batch_format="pandas")


def balanced_shards(ds: ray.data.Dataset, *, size_col: str, id_col: str,
                    n_shards: int) -> ray.data.Dataset:
    """Size-balanced round-robin sharding for training-data output: rows
    are globally ranked by ``(size DESC, id ASC)`` and dealt
    ``rank % n_shards`` — the classic longest-processing-time-style deal
    that keeps per-shard byte totals within one max-item of each other.
    Returns the per-shard audit ``(shard, n_docs, sum_size)``.

    NO global sort: pass 1 builds the merged size-value histogram (rows ∝
    distinct sizes × batches, the :func:`global_cume_dist` shape) whose
    descending cumulative offsets are broadcast once; pass 2 shuffles rows
    by size value only, computes within-value ranks vectorized (sort by
    id inside each co-located value group), adds the broadcast offset,
    and emits per-shard partials — shuffle volume ∝ rows once, final
    reduce ∝ n_shards."""
    import ray as _ray

    def vc(b: pd.DataFrame) -> pd.DataFrame:
        c = b[size_col].value_counts()
        return pd.DataFrame({"v": c.index.to_numpy(),
                             "c_": c.to_numpy().astype(np.int64)})

    hist = sorted_block_reduce(
        ds.map_batches(vc, batch_format="pandas", batch_size=None),
        "v", lambda g: g.groupby("v", as_index=False)["c_"].sum()) \
        .to_pandas().sort_values("v")
    vals = hist["v"].to_numpy()
    cum = np.cumsum(hist["c_"].to_numpy()).astype(np.int64)
    n = np.int64(cum[-1]) if len(cum) else np.int64(0)
    ref = _ray.put((vals, n - cum))     # offset[v] = rows with size > v

    S = np.int64(n_shards)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        vv, off = _ray.get(ref)
        g = g.sort_values([size_col, id_col], kind="stable")
        v = g[size_col].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], v[1:] != v[:-1])))
        within = (np.arange(len(v))
                  - np.repeat(starts, np.diff(np.append(starts, len(v)))))
        grank = off[np.searchsorted(vv, v)] + within
        shard = grank % S
        out = pd.DataFrame({"shard": shard,
                            "sz": v.astype(np.int64)})
        p = out.groupby("shard", as_index=False).agg(
            n_docs=("sz", "size"), sum_size=("sz", "sum"))
        p["n_docs"] = p["n_docs"].astype(np.int64)
        return p

    parts = sorted_block_reduce(
        ds.select_columns([id_col, size_col]), size_col, assign)

    def total(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("shard", as_index=False)[["n_docs", "sum_size"]].sum()
        return t.astype(np.int64)

    return sorted_block_reduce(parts, "shard", total)


def set_overlap(ds: ray.data.Dataset, *, key_col: str, set_col: str,
                domain: tuple) -> pd.DataFrame:
    """Pairwise audience overlap: for every unordered pair (a < b) of
    ``set_col`` values in the static ``domain``, the number of DISTINCT
    ``key_col`` values seen with BOTH — the segment-intersection matrix
    behind cohort overlap / co-engagement analysis.

    Shape: per-batch (key, OR-of-bits) partials (≤ distinct keys per
    batch rows) → one shuffle keyed on the key → per-key bitmask OR
    (bit-decomposed: |domain| vectorized max ops, no per-group Python)
    → per-block MASK value counts (≤ 2^|domain| rows) → tiny mask-keyed
    reduce → driver expands ≤ 2^|domain| mask counts into pair sums.
    Shuffle volume ∝ distinct keys; the final result is |domain|² rows.
    """
    dom = sorted(domain)      # pair rows come out (a < b) lexically,
    nbits = len(dom)          # matching the SQL twin's a.type < b.type
    assert nbits <= 20, "bitmask domain too wide"

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        code = pd.Categorical(b[set_col], categories=dom).codes
        keep = code >= 0
        df = pd.DataFrame({"k": b[key_col].to_numpy()[keep],
                           "bit": np.int64(1) << code[keep].astype(np.int64)})
        df = df.drop_duplicates()
        m = df.groupby("k", as_index=False, sort=False)["bit"].sum()
        return pd.DataFrame({"k": m["k"].to_numpy(),
                             "m_": m["bit"].to_numpy().astype(np.int64)})

    def or_reduce(g: pd.DataFrame) -> pd.DataFrame:
        ks, inv = np.unique(g["k"].to_numpy(), return_inverse=True)
        mm = g["m_"].to_numpy()
        mask = np.zeros(len(ks), np.int64)
        for bit in range(nbits):
            has = np.zeros(len(ks), np.int64)
            np.maximum.at(has, inv, (mm >> bit) & 1)
            mask |= has << bit
        u, c = np.unique(mask, return_counts=True)
        return pd.DataFrame({"mask": u.astype(np.int64),
                             "c_": c.astype(np.int64)})

    masks = sorted_block_reduce(
        ds.map_batches(partial, batch_format="pandas", batch_size=None),
        "k", or_reduce)
    counts = sorted_block_reduce(
        masks, "mask",
        lambda g: g.groupby("mask", as_index=False)["c_"].sum()) \
        .to_pandas()
    mk = counts["mask"].to_numpy()
    ct = counts["c_"].to_numpy()
    rows = []
    for i in range(nbits):
        for j in range(i + 1, nbits):
            both = np.int64((1 << i) | (1 << j))
            nij = int(ct[(mk & both) == both].sum())
            if nij:
                rows.append((dom[i], dom[j], nij))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_users"])
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def hash_sample_k(ds: ray.data.Dataset, *, k: int,
                  key_col: str) -> ray.data.Dataset:
    """Exactly-k DETERMINISTIC sample of an arbitrarily large stream —
    e.g. a spatial-join output too big to materialize (the
    sample-over-join problem): rank rows by splitmix64 of an int64 key
    and keep the k smallest (ties by key).  A hash order is a fixed
    random permutation of the key space, so this is a uniform sample
    that is order-independent, resumable, and reproducible in SQL
    (``ORDER BY h, key LIMIT k``) — no RNG state, no global sort of the
    stream: each block contributes a local top-k partial (≤ k rows),
    and the k·blocks partials reduce in one tiny ranked merge."""
    from ..functions.hashing import splitmix64

    def local_topk(b: pa.Table) -> pa.Table:
        key = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(key)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
        else:
            idx = np.arange(len(h))
        order = np.lexsort((key[idx], h[idx]))
        out = b.take(pa.array(idx[order]))
        return out.append_column("h", pa.array(h[idx[order]].view(np.int64)))

    partials = ds.map_batches(local_topk, batch_format="pyarrow",
                              batch_size=None)
    # h stored as the int64 bit-view of the uint64 hash: int64 order !=
    # uint64 order, so rank on the sign-flipped value
    def flip(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        rank = (h ^ np.uint64(1 << 63)).view(np.int64)
        return b.set_column(b.schema.get_field_index("h"), "rank",
                            pa.array(rank))

    return partials.map_batches(flip, batch_format="pyarrow") \
        .sort(["rank", key_col]).limit(k)


def spearman_rho(ds: ray.data.Dataset, *, x_col: str,
                 y_col: str) -> pd.DataFrame:
    """Spearman rank correlation between two DISCRETE numeric columns,
    classical formula ``rho = 1 − 6·Σd²/(n(n²−1))`` with average ranks
    for ties — computed EXACTLY and order-independently:

    - ranks come from merged VALUE-COUNT histograms (one shuffle, rows ∝
      distinct values), held in HALF-UNITS (``2·rank`` is always int64,
      so tied average ranks like 3.5 stay integers);
    - Σd² accumulates int64 per batch, arbitrary-precision on the
      driver — no float reduction anywhere;
    - the only float ops are the final two (6/4·Σd² and one division),
      on exact integers, so the SQL twin reproduces rho bit-for-bit.

    (With ties this is the textbook d²-formula variant of Spearman, not
    Pearson-of-ranks; documented, and what the SQL twin computes.)
    Returns a one-row DataFrame (n, sum_d2h, rho) where sum_d2h is Σ of
    squared HALF-UNIT rank differences (= 4·Σd²)."""
    import ray

    def hists(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for tag, col in ((0, x_col), (1, y_col)):
            c = b[col].value_counts()
            outs.append(pd.DataFrame({
                "tag": np.int64(tag),
                "v": c.index.to_numpy().astype(np.int64),
                "c_": c.to_numpy().astype(np.int64)}))
        return pd.concat(outs, ignore_index=True)

    hist = sorted_block_reduce(
        ds.map_batches(hists, batch_format="pandas", batch_size=None),
        ["tag", "v"],
        lambda g: g.groupby(["tag", "v"], as_index=False)["c_"].sum()) \
        .to_pandas()

    def half_ranks(h: pd.DataFrame):
        h = h.sort_values("v")
        c = h["c_"].to_numpy()
        before = np.cumsum(c) - c
        # average rank of a tie group in half-units: 2·min + (c−1)
        return h["v"].to_numpy(), 2 * (before + 1) + (c - 1)

    xv, xr = half_ranks(hist[hist["tag"] == 0])
    yv, yr = half_ranks(hist[hist["tag"] == 1])
    ref = ray.put((xv, xr, yv, yr))

    def partial_d2(b: pd.DataFrame) -> pd.DataFrame:
        xvv, xrr, yvv, yrr = ray.get(ref)
        rx = xrr[np.searchsorted(xvv, b[x_col].to_numpy())]
        ry = yrr[np.searchsorted(yvv, b[y_col].to_numpy())]
        d = rx - ry
        return pd.DataFrame({"k": [np.int64(0)],
                             "n_": [np.int64(len(b))],
                             "s_": [np.int64(np.dot(d, d))]})

    parts = sorted_block_reduce(
        ds.map_batches(partial_d2, batch_format="pandas",
                       batch_size=None),
        "k", lambda g: g).to_pandas()
    n = int(parts["n_"].sum())
    sum_d2h = int(sum(int(v) for v in parts["s_"]))   # exact Python ints
    denom = n * (n * n - 1)
    rho = 1.0 - 1.5 * float(sum_d2h) / float(denom) if denom else 0.0
    return pd.DataFrame({"n": [np.int64(n)],
                         "sum_d2h": [np.int64(sum_d2h)],
                         "rho": [np.float64(rho)]})


def rank_sum_test(ds: ray.data.Dataset, *, value_col: str,
                  group_col: str, group_a) -> pd.DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between rows where
    ``group_col == group_a`` (group A) and everything else — the
    standard nonparametric two-sample test an eval pipeline runs on a
    quality metric.  Tie handling is the textbook average-rank rule,
    computed EXACTLY in integers (the half-unit trick spearman_rho
    uses): the midrank of a tie block of size c starting after
    ``before`` rows is (2·before + c + 1)/2, so

        2·R_A = Σ_v  n_A(v) · (2·before(v) + c(v) + 1)
        2·U_A = 2·R_A − n_A·(n_A + 1)

    stays int64 end-to-end and the DuckDB twin reproduces it
    bit-for-bit.  Distributed shape: per-batch (value, count_A, count)
    partials → one value-keyed reduce (rows ∝ DISTINCT values, not
    input rows) → the ranked scan runs on that small histogram.
    Returns one row (n_a, n_b, u2_a, auc) where u2_a = 2·U_A and
    auc = U_A/(n_A·n_B) is the common-language effect size (one float
    division on exact integers)."""

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy().astype(np.int64)
        a = (b[group_col] == group_a).to_numpy()
        df = pd.DataFrame({"v": v, "ca_": a.astype(np.int64),
                           "c_": np.ones(len(v), np.int64)})
        return df.groupby("v", as_index=False).sum()

    hist = sorted_block_reduce(
        ds.map_batches(hist_partial, batch_format="pandas",
                       batch_size=None),
        "v", lambda g: g.groupby("v", as_index=False)[["ca_", "c_"]]
        .sum()).to_pandas()

    hist = hist.sort_values("v")
    c = hist["c_"].to_numpy().astype(object)      # exact Python ints
    ca = hist["ca_"].to_numpy().astype(object)
    before = np.cumsum(c) - c
    r2_a = int(np.sum(ca * (2 * before + c + 1)))
    n_a = int(np.sum(ca))
    n = int(np.sum(c))
    n_b = n - n_a
    u2_a = r2_a - n_a * (n_a + 1)
    auc = float(u2_a) / (2.0 * n_a * n_b) if n_a and n_b else 0.0
    return pd.DataFrame({"n_a": [np.int64(n_a)], "n_b": [np.int64(n_b)],
                         "u2_a": [np.int64(u2_a)],
                         "auc": [np.float64(auc)]})


def ks_two_sample(ds: ray.data.Dataset, *, value_col: str,
                  group_col: str, group_a) -> pd.DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between rows where
    ``group_col == group_a`` and the rest: D = max_v |F_A(v) − F_B(v)|
    over the discrete value support.  Computed WITHOUT floats until the
    final division: D's numerator max_v |cumA(v)·n_B − cumB(v)·n_A| is
    int64-exact, so the DuckDB twin reproduces (d_num, d) bit-for-bit.
    Same distributed shape as :func:`rank_sum_test` — per-batch
    (value, count_A, count) partials, one value-keyed reduce bounded by
    the DISTINCT value count, ranked scan on the small histogram.
    Returns one row (n_a, n_b, d_num, d) with d = d_num/(n_a·n_b)."""

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy().astype(np.int64)
        a = (b[group_col] == group_a).to_numpy()
        df = pd.DataFrame({"v": v, "ca_": a.astype(np.int64),
                           "c_": np.ones(len(v), np.int64)})
        return df.groupby("v", as_index=False).sum()

    hist = sorted_block_reduce(
        ds.map_batches(hist_partial, batch_format="pandas",
                       batch_size=None),
        "v", lambda g: g.groupby("v", as_index=False)[["ca_", "c_"]]
        .sum()).to_pandas()

    hist = hist.sort_values("v")
    ca = hist["ca_"].to_numpy().astype(object)     # exact Python ints
    cb = (hist["c_"] - hist["ca_"]).to_numpy().astype(object)
    n_a, n_b = int(np.sum(ca)), int(np.sum(cb))
    cum_a, cum_b = np.cumsum(ca), np.cumsum(cb)
    d_num = int(np.max(np.abs(cum_a * n_b - cum_b * n_a))) \
        if len(hist) else 0
    d = float(d_num) / (1.0 * n_a * n_b) if n_a and n_b else 0.0
    return pd.DataFrame({"n_a": [np.int64(n_a)], "n_b": [np.int64(n_b)],
                         "d_num": [np.int64(d_num)],
                         "d": [np.float64(d)]})
