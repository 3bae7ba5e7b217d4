"""Equi-joins.  The reference's only join is the spatial kNN join; these
general joins exist so heavy payload columns (the interleaved ``spans``)
can stay OUT of the spatial shuffle and be re-attached to results by key
afterwards (SURVEY.md §7.4 "wide rows through a shuffle").

- :func:`broadcast_join` — small right side: ``ray.put`` once, pandas merge
  per batch inside ``map_batches``.  No shuffle.
- :func:`sorted_join` — both sides large: tag + union + range-shuffle on
  the key, then a vectorized pandas merge per co-located block (the
  engine's standard sorted-block pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .shuffle import sorted_block_reduce


def broadcast_join(left: ray.data.Dataset, right_df: pd.DataFrame, *,
                   left_on: str, right_on: str, how: str = "inner",
                   concurrency=None) -> ray.data.Dataset:
    """Join a Dataset against a SMALL in-memory right side (broadcast)."""
    ref = ray.put(right_df)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.merge(ray.get(ref), how=how, left_on=left_on,
                       right_on=right_on)

    return left.map_batches(merge, batch_format="pandas")


def _fields_of(ds: ray.data.Dataset) -> dict:
    """Column -> arrow type.  pandas-backed datasets report numpy/python
    types; sample those to recover the true arrow schema."""
    s = ds.schema()
    if all(isinstance(t, pa.DataType) for t in s.types):
        return dict(zip(s.names, s.types))
    tbl = pa.Table.from_pandas(ds.limit(100).to_pandas(),
                               preserve_index=False)
    return {f.name: f.type for f in tbl.schema}


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              on: str, by: str, direction: str = "backward",
              suffix: str = "_r") -> ray.data.Dataset:
    """As-of join: for each left row, the right row of the same ``by`` key
    with the greatest ``on`` value <= the left's (direction="backward";
    "forward" takes the least >=).  Both sides range-shuffle on ``by`` so
    every block holds all rows of its keys; a per-block ``pd.merge_asof``
    over the key-sorted frames finishes locally.  The Dataset-API
    expression of a streaming-system "temporal join"; DuckDB's ASOF JOIN
    reproduces it exactly for the oracle."""
    ltypes = _fields_of(left)
    rtypes = _fields_of(right)
    rcols = [c for c in rtypes if c not in (on, by)]

    def tag(role: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column("jrole__", pa.array(
                np.full(len(b), role, dtype=np.int8)))
        return f

    # widen to the union schema
    all_types = dict(rtypes)
    all_types.update(ltypes)
    for c in rcols:
        if c in ltypes:
            raise ValueError(f"column collision: {c}; rename right columns")

    def widen(b: pa.Table) -> pa.Table:
        cols = {}
        for c, t in all_types.items():
            cols[c] = (b[c].combine_chunks().cast(t) if c in b.column_names
                       else pa.nulls(len(b), t))
        cols["jrole__"] = b["jrole__"]
        return pa.table(cols)

    u = left.map_batches(tag(0), batch_format="pyarrow") \
        .map_batches(widen, batch_format="pyarrow").union(
            right.map_batches(tag(1), batch_format="pyarrow")
                 .map_batches(widen, batch_format="pyarrow"))

    lout = list(ltypes)
    # the widened union frame holds the other role's columns as nulls, so
    # pandas upcasts integer columns to float64; restore integer dtypes on
    # the merged output — left columns are never null (nullable-safe Int64
    # for right columns, which hold real nulls on unmatched left rows) —
    # else the result's dtype drifts from the declared arrow schema
    int_cols = {c: t for c, t in all_types.items()
                if pa.types.is_integer(t)}
    # emit merged blocks as explicit-schema Arrow tables, NOT pandas frames:
    # a pandas Int64Dtype extension column reaches downstream consumers with
    # pandas-extension null semantics (<NA>) and can canonicalize/hash
    # differently than plain arrow int64-with-nulls even when every value is
    # equal (round-3 driver gate on asof_purchase_view)
    out_schema = pa.schema(
        [(c, all_types[c]) for c in lout]
        + [(c, all_types[c]) for c in rcols])

    def merge_block(g: pd.DataFrame) -> pa.Table:
        lb = g[g["jrole__"] == 0][lout].sort_values(on, kind="stable")
        rb = g[g["jrole__"] == 1][[by, on] + rcols] \
            .sort_values(on, kind="stable")
        out = pd.merge_asof(lb, rb, on=on, by=by, direction=direction,
                            suffixes=("", suffix))
        for c in out.columns:
            if c in int_cols and out[c].dtype.kind == "f":
                out[c] = out[c].astype("Int64" if c in rcols else "int64")
        # strip pandas metadata (see sorted_join.merge_block): it records
        # the staging Int64 extension dtype and to_pandas() would
        # reconstruct it downstream
        return pa.Table.from_pandas(
            out, schema=out_schema,
            preserve_index=False).replace_schema_metadata(None)

    return sorted_block_reduce(u, by, merge_block)


def sorted_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                left_on: str, right_on: str, how: str = "inner",
                left_fields: dict | None = None,
                right_fields: dict | None = None,
                coalesce: int | None = None,
                coalesce_left: int | None = None,
                coalesce_right: int | None = None) -> ray.data.Dataset:
    """Partitioned equi-join of two Datasets: both sides are tagged, unioned
    and range-shuffled on the join key; every block then holds ALL rows of
    any key it holds, so a per-block pandas merge is exact.  ``how``:
    "inner", "left" or "outer" (FULL outer: both sides' unmatched rows
    survive with nulls; the output gains a non-null ``join_key`` column —
    SQL's ``COALESCE(l.k, r.k)`` — since either side's own key column is
    null on the other side's orphans).  Column-name collisions (other
    than the key) get
    pandas' _x/_y suffixes.  Pass ``left_fields``/``right_fields``
    (column -> arrow type) when known: schema probing on a lazy input
    otherwise triggers a partial execution of its upstream pipeline.
    ``coalesce`` (or the per-side ``coalesce_left``/``coalesce_right``):
    repartition a side to this many blocks before the shuffle — essential
    when an input arrives as hundreds of near-empty sort partitions
    (per-task scheduling overhead would dominate; measured 20x on
    candidate-sized joins).  Only coalesce sides whose total volume is
    bounded; coalescing a corpus-scale side caps its parallelism."""
    lf = left_fields or _fields_of(left)
    rf = right_fields or _fields_of(right)
    lcols, rcols = list(lf), list(rf)
    types = dict(rf)
    types.update(lf)
    types["jkey__"] = types[left_on]
    types["jrole__"] = pa.int8()

    def tag(role: int, key_col: str):
        def f(b: pa.Table) -> pa.Table:
            b = b.append_column("jrole__", pa.array(
                np.full(len(b), role, dtype=np.int8)))
            if key_col != "jkey__":
                b = b.append_column("jkey__", b[key_col])
            return b
        return f

    l = left.map_batches(tag(0, left_on), batch_format="pyarrow")
    r = right.map_batches(tag(1, right_on), batch_format="pyarrow")
    # align schemas for union: keep all columns, fill the other side's with
    # nulls (arrow promotes on concat inside ray union only for equal
    # schemas, so build the superset explicitly)
    all_cols = ["jkey__", "jrole__"] + lcols + [c for c in rcols
                                               if c not in lcols]

    def widen(side_cols):
        def f(b: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in b.column_names:
                    arrays.append(b[c].combine_chunks().cast(types[c]))
                else:
                    arrays.append(pa.nulls(len(b), types[c]))
            return pa.table(dict(zip(names, arrays)))
        return f

    lw = l.map_batches(widen(lcols), batch_format="pyarrow")
    rw = r.map_batches(widen(rcols), batch_format="pyarrow")
    cl = coalesce_left if coalesce_left is not None else coalesce
    cr = coalesce_right if coalesce_right is not None else coalesce
    if cl is not None:
        lw = lw.repartition(cl)
    if cr is not None:
        rw = rw.repartition(cr)
    u = lw.union(rw)

    # the widened union frame float-widens integer columns (other role's
    # rows are null there); restore nullable int64 on the merged output so
    # dtypes don't drift from the declared arrow schema downstream
    int_cols = {c for c, t in types.items() if pa.types.is_integer(t)}
    if "jkey__" in int_cols:
        int_cols.add("join_key")

    # declare the merged block's arrow schema up front and emit Arrow
    # tables, NOT pandas frames: a pandas Int64Dtype extension column can
    # canonicalize/hash differently than plain arrow int64-with-nulls even
    # when every value is equal (round-4 driver gate on outer_join_users;
    # same fix as asof_join above, round 3).  Columns follow pandas' merge
    # order — key first (kept as join_key on FULL outer, dropped
    # otherwise), then left columns, then right; name collisions get the
    # _x/_y suffixes pandas applies.
    r_out = [c for c in rcols if c != right_on]
    shared = set(lcols) & set(r_out)
    out_fields = []
    if how == "outer":
        out_fields.append(("join_key", types["jkey__"]))
    out_fields += [((c + "_x" if c in shared else c), types[c])
                   for c in lcols]
    out_fields += [((c + "_y" if c in shared else c), types[c])
                   for c in r_out]
    out_schema = pa.schema(out_fields)

    def merge_block(g: pd.DataFrame) -> pa.Table:
        lb = g[g["jrole__"] == 0][["jkey__"] + lcols]
        rb = g[g["jrole__"] == 1][["jkey__"] + [c for c in rcols
                                                if c != right_on]]
        out = lb.merge(rb, how=how, on="jkey__")
        if how == "outer":
            out = out.rename(columns={"jkey__": "join_key"})
        else:
            out = out.drop(columns=["jkey__"])
        for c in out.columns:
            if c in int_cols and out[c].dtype.kind == "f":
                out[c] = out[c].astype("Int64")
        # strip the pandas metadata from_pandas attaches: it records the
        # staging Int64 extension dtype, and a downstream to_pandas()
        # (including the driver's) would faithfully reconstruct it —
        # resurrecting the <NA>-vs-NaN hash divergence the explicit arrow
        # schema exists to kill
        return pa.Table.from_pandas(
            out, schema=out_schema,
            preserve_index=False).replace_schema_metadata(None)

    return sorted_block_reduce(u, "jkey__", merge_block)


def interval_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                  start_col: str, end_col: str, ts_col: str,
                  left_id: str, right_id: str,
                  bucket_us: int = 3_600_000_000) -> ray.data.Dataset:
    """Interval-containment join: every (left, right) pair with
    ``right.ts`` in ``[left.start, left.end]`` (inclusive, int64 epoch-µs —
    exact).  Output: ``(left_id, right_id, lag_us = ts - start)``.

    This is the 1-D temporal analogue of the engine's spatial cell+halo
    exchange (stages/knn.py): LEFT intervals are duplicated into every
    time bucket they overlap — duplication factor 1 + len/bucket, the halo
    cost, so pick ``bucket_us`` ≳ the typical interval length — while
    RIGHT events land in exactly ONE bucket, so no output dedup is ever
    needed.  Each co-located bucket block is finished by one vectorized
    ``searchsorted`` sweep: because an event's timestamp determines its
    bucket, sorting a block by ``t`` globally IS sorting by ``(bucket,
    t)``, and clipping each interval to its bucket's own time range
    ``[b·W, (b+1)·W)`` turns per-bucket containment into a plain range
    search on the block-wide sorted timestamp array — no per-bucket loop.

    Shuffle volume: |left| · (1 + len/W) + |right| rows of 3 int64s —
    payload columns should be re-attached by id afterwards
    (:func:`broadcast_join` / :func:`sorted_join`), never carried through.
    """
    W = np.int64(bucket_us)

    def _epoch(col: pa.ChunkedArray) -> np.ndarray:
        return col.to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)

    def explode_left(b: pa.Table) -> pa.Table:
        s = _epoch(b[start_col])
        e = _epoch(b[end_col])
        ids = b[left_id].to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = s // W
        counts = (e // W - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), counts)
        # segment-local arange; slice AFTER the concat so the starts array
        # stays length-matched to counts when the batch is empty
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        off = np.arange(counts.sum(), dtype=np.int64) \
            - np.repeat(starts, counts)
        return pa.table({
            "bucket": pa.array(b0[idx] + off),
            "a": pa.array(s[idx]), "b": pa.array(e[idx]),
            "rid": pa.array(ids[idx]),
            "role": pa.array(np.zeros(len(idx), np.int8))})

    def tag_right(b: pa.Table) -> pa.Table:
        t = _epoch(b[ts_col])
        ids = b[right_id].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(t // W),
            "a": pa.array(t), "b": pa.array(t),
            "rid": pa.array(ids),
            "role": pa.array(np.ones(len(t), np.int8))})

    u = left.map_batches(explode_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g["role"].to_numpy() == 0
        lb = g[lmask]
        rb = g[~lmask].sort_values("a", kind="stable")
        rt = rb["a"].to_numpy()
        rids = rb["rid"].to_numpy()
        s = lb["a"].to_numpy()
        e = lb["b"].to_numpy()
        bk = lb["bucket"].to_numpy()
        lids = lb["rid"].to_numpy()
        lo = np.searchsorted(rt, np.maximum(s, bk * W), side="left")
        hi = np.searchsorted(rt, np.minimum(e, (bk + 1) * W - 1),
                             side="right")
        counts = np.maximum(hi - lo, 0)
        li = np.repeat(np.arange(len(s)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        ri = (np.arange(counts.sum(), dtype=np.int64)
              - np.repeat(starts, counts)) + np.repeat(lo, counts)
        return pd.DataFrame({left_id: lids[li].astype(np.int64),
                             right_id: rids[ri].astype(np.int64),
                             "lag_us": (rt[ri] - s[li]).astype(np.int64)})

    return sorted_block_reduce(u, "bucket", sweep)


# cell key = kx * 2^32 + (ky + 2^31): injective for ky in [-2^31, 2^31),
# so negative coordinates (floor < 0) cannot collide across columns
_RECT_KY = np.int64(1) << np.int64(32)
_RECT_KOFF = np.int64(1) << np.int64(31)
_RECT_PAIR_BUDGET = 1 << 22                # max all-pairs candidates per cell
_RECT_MAX_DEPTH = 4                        # sub-grid recursion cap


def _rect_cells(x0, y0, x1, y1, W) -> tuple[np.ndarray, np.ndarray]:
    """Explode bboxes onto a W-grid: (rect_idx, cell_key), one row per
    (rect, overlapped cell)."""
    kx0 = np.floor(x0 / W).astype(np.int64)
    kx1 = np.floor(x1 / W).astype(np.int64)
    ky0 = np.floor(y0 / W).astype(np.int64)
    ky1 = np.floor(y1 / W).astype(np.int64)
    nx = kx1 - kx0 + 1
    ny = ky1 - ky0 + 1
    counts = nx * ny
    idx = np.repeat(np.arange(len(x0)), counts)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    off = (np.arange(int(counts.sum()), dtype=np.int64)
           - np.repeat(starts, counts))
    cx = kx0[idx] + off // ny[idx]
    cy = ky0[idx] + off % ny[idx]
    return idx, cx * _RECT_KY + (cy + _RECT_KOFF)


def _seg_allpairs(lstart, nl, rstart, nr):
    """All-pairs (left_pos, right_pos) position pairs for aligned key
    segments, by cumsum arithmetic (no Python loop): segment i contributes
    nl[i] * nr[i] pairs; every left position gets a contiguous block of
    nr[its segment] slots."""
    per_left = np.repeat(nr, nl)
    lpos = np.repeat(lstart, nl) + (
        np.arange(int(nl.sum())) - np.repeat(
            np.concatenate(([0], np.cumsum(nl)))[:-1], nl))
    total = int(per_left.sum())
    slot_start = np.concatenate(([0], np.cumsum(per_left)))[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(slot_start, per_left)
    rpos = np.repeat(np.repeat(rstart, nl), per_left) + pos
    return np.repeat(lpos, per_left), rpos


def _rect_pairs_local(L, R, W: float, budget: int, depth: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Exact rect-overlap pairs between rect arrays L/R (each a tuple
    (x0, y0, x1, y1)), reported exactly once via the reference-point rule
    on a local W-grid.  Cells whose all-pairs candidate count exceeds
    ``budget`` recurse at W/8 (sub-grid skew splitting, the local analogue
    of the kNN hot-cell plan); the recursion's pairs are filtered to the
    parent cell so exactly-once composes across levels."""
    if len(L[0]) == 0 or len(R[0]) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # sub-gridding only helps when rects are SMALL relative to the
    # sub-cell: a rect spanning s sub-cells per axis is copied s² times
    # while shedding no candidates, so recursing on large-rect hot cells
    # multiplies work without bound.  Estimate the duplication the W-grid
    # will cause and fall back to all-pairs when it exceeds the candidate
    # saving (cheap medians; exactness is unaffected either way).
    med_w = max(float(np.median(L[2] - L[0])), float(np.median(R[2] - R[0])))
    med_h = max(float(np.median(L[3] - L[1])), float(np.median(R[3] - R[1])))
    if (1.0 + med_w / W) * (1.0 + med_h / W) > 4.0:
        lp, rp = _seg_allpairs(np.zeros(1, np.int64),
                               np.array([len(L[0])]),
                               np.zeros(1, np.int64),
                               np.array([len(R[0])]))
        ix0 = np.maximum(L[0][lp], R[0][rp])
        iy0 = np.maximum(L[1][lp], R[1][rp])
        keep = ((ix0 <= np.minimum(L[2][lp], R[2][rp]))
                & (iy0 <= np.minimum(L[3][lp], R[3][rp])))
        return lp[keep], rp[keep]
    lidx, lk = _rect_cells(*L, W)
    ridx, rk = _rect_cells(*R, W)
    lo = np.argsort(lk, kind="stable")
    ro = np.argsort(rk, kind="stable")
    lk, lidx = lk[lo], lidx[lo]
    rk, ridx = rk[ro], ridx[ro]
    ucl, lstart = np.unique(lk, return_index=True)
    ucr, rstart = np.unique(rk, return_index=True)
    common, il, ir = np.intersect1d(ucl, ucr, assume_unique=True,
                                    return_indices=True)
    out_l = [np.empty(0, np.int64)]
    out_r = [np.empty(0, np.int64)]
    if len(common) == 0:
        return out_l[0], out_r[0]
    nl = (np.append(lstart, len(lk))[1:] - lstart)[il]
    nr = (np.append(rstart, len(rk))[1:] - rstart)[ir]
    big = (nl * nr > budget) & (depth < _RECT_MAX_DEPTH)
    sm = ~big
    if sm.any():
        lp, rp = _seg_allpairs(lstart[il][sm], nl[sm], rstart[ir][sm], nr[sm])
        li, ri = lidx[lp], ridx[rp]
        ix0 = np.maximum(L[0][li], R[0][ri])
        iy0 = np.maximum(L[1][li], R[1][ri])
        keep = ((ix0 <= np.minimum(L[2][li], R[2][ri]))
                & (iy0 <= np.minimum(L[3][li], R[3][ri]))
                & (np.floor(ix0 / W).astype(np.int64) * _RECT_KY
                   + (np.floor(iy0 / W).astype(np.int64) + _RECT_KOFF) == lk[lp]))
        out_l.append(li[keep])
        out_r.append(ri[keep])
    for j in np.flatnonzero(big):          # rare: only skewed cells
        ls = lidx[lstart[il[j]]:lstart[il[j]] + nl[j]]
        rs = ridx[rstart[ir[j]]:rstart[ir[j]] + nr[j]]
        sli, sri = _rect_pairs_local(
            tuple(a[ls] for a in L), tuple(a[rs] for a in R),
            W / 8.0, budget, depth + 1)
        gl, gr = ls[sli], rs[sri]
        ix0 = np.maximum(L[0][gl], R[0][gr])
        iy0 = np.maximum(L[1][gl], R[1][gr])
        keep = (np.floor(ix0 / W).astype(np.int64) * _RECT_KY
                + (np.floor(iy0 / W).astype(np.int64) + _RECT_KOFF) == common[j])
        out_l.append(gl[keep])
        out_r.append(gr[keep])
    return np.concatenate(out_l), np.concatenate(out_r)


def detect_hot_rect_cells(left: ray.data.Dataset, right: ray.data.Dataset,
                          cell: float, *, row_cap: int = 200_000,
                          coord_cols=("xmin", "ymin", "xmax", "ymax")
                          ) -> frozenset:
    """Coarse cells whose combined exploded row count exceeds ``row_cap`` —
    feed the result to :func:`rect_join`'s ``hot_cells`` so those cells are
    ROUTED at W/8 instead of concentrating in one reducer block (the
    pre-shuffle analogue of the kNN hot-cell plan; the in-kernel sub-grid
    recursion already bounds compute, this bounds block memory).  The
    count pass ships one (cell, n) row per batch per touched cell; the
    reduce output is only the hot keys — tiny by construction."""
    xmin_c, ymin_c, xmax_c, ymax_c = coord_cols
    W = float(cell)

    def cnt(b: pa.Table) -> pa.Table:
        key = _rect_cells(b[xmin_c].to_numpy(zero_copy_only=False),
                          b[ymin_c].to_numpy(zero_copy_only=False),
                          b[xmax_c].to_numpy(zero_copy_only=False),
                          b[ymax_c].to_numpy(zero_copy_only=False), W)[1]
        u, c = np.unique(key, return_counts=True)
        return pa.table({"ck": pa.array(u), "n": pa.array(c)})

    u = left.map_batches(cnt, batch_format="pyarrow", batch_size=None)         .union(right.map_batches(cnt, batch_format="pyarrow",
                                 batch_size=None))

    def hot_only(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("ck", as_index=False)["n"].sum()
        return t[t["n"] > row_cap]

    hot = sorted_block_reduce(u, "ck", hot_only).to_pandas()
    return frozenset(int(k) for k in hot["ck"])


def choose_grid_cell(*sides: ray.data.Dataset,
                     coord_cols=("xmin", "ymin", "xmax", "ymax"),
                     extent_factor: float = 4.0,
                     target_occupancy: float = 64.0) -> float:
    """Deterministic auto cell width for the grid spatial joins
    (:func:`rect_join` / :func:`segment_cross_join` /
    :func:`convex_poly_join`) — the PBSM analogue of the kNN path's
    ``grid.choose_resolution``, so callers need no magic number.

    One cheap pass over each side (per-batch exact partials: Σwidth,
    Σheight, bbox, count — a tiny reduce, no shuffle of the data) picks

        cell = extent_factor · mean_extent        (extent-bearing inputs)
        cell = span · √(target_occupancy / n)     (point-like inputs)

    capped at span/4 so the grid keeps ≥16 cells of parallelism.  The
    extent rule bounds DUPLICATION: a bbox spanning s = extent/cell cells
    per axis ships (1+s)² copies, so factor 4 caps it near
    (1+1/4)² ≈ 1.6× — and it deliberately wins over occupancy (the joins'
    in-kernel pair budget + W/8 sub-grid recursion already bound per-cell
    work, while duplication is unrecoverable once shuffled).  The density
    rule only engages when extents are all zero, targeting
    ~target_occupancy rows/cell.  Deterministic (exact f64 sums of exact
    inputs; no sampling), so plans are reproducible."""
    x0c, y0c, x1c, y1c = coord_cols
    tot_w = tot_h = 0.0
    n = 0
    lo = np.inf
    hi = -np.inf

    for ds in sides:
        def part(b: pa.Table) -> pa.Table:
            x0 = b[x0c].to_numpy(zero_copy_only=False).astype(np.float64)
            y0 = b[y0c].to_numpy(zero_copy_only=False).astype(np.float64)
            x1 = b[x1c].to_numpy(zero_copy_only=False).astype(np.float64)
            y1 = b[y1c].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({
                "sw": pa.array([float((x1 - x0).sum())]),
                "sh": pa.array([float((y1 - y0).sum())]),
                "n": pa.array([np.int64(len(x0))]),
                "lo": pa.array([float(min(x0.min(), y0.min()))
                                if len(x0) else np.inf]),
                "hi": pa.array([float(max(x1.max(), y1.max()))
                                if len(x0) else -np.inf])})

        p = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=None).to_pandas()
        tot_w += float(p["sw"].sum())
        tot_h += float(p["sh"].sum())
        n += int(p["n"].sum())
        if len(p):
            lo = min(lo, float(p["lo"].min()))
            hi = max(hi, float(p["hi"].max()))
    if n == 0:
        return 1.0
    mean_ext = max(tot_w / n, tot_h / n)
    span = max(hi - lo, 1e-12)
    if mean_ext > 0.0:
        cell = extent_factor * mean_ext
    else:
        cell = span * float(np.sqrt(target_occupancy / n))
    return float(min(max(cell, 1e-12), span / 4.0))


def rect_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              cell: float | None = None, left_on: str = "id",
              right_on: str = "id",
              left_id: str = "a_id", right_id: str = "b_id",
              coord_cols=("xmin", "ymin", "xmax", "ymax"),
              pair_budget: int = _RECT_PAIR_BUDGET,
              hot_cells: frozenset | None = None) -> ray.data.Dataset:
    """2-D rectangle-overlap join: every (left, right) pair whose bboxes
    intersect (closed intervals: touching edges count).  Output:
    ``(left_id, right_id, overlap_area)``.

    The 2-D generalization of the engine's cell+halo exchange
    (stages/knn.py — the reference's stripe decomposition,
    AllKnnResultStripes.h, lifted to a grid): each rect is duplicated into
    EVERY ``cell``-sized grid cell its bbox overlaps, cells become shuffle
    keys, and each co-located cell block is finished by one vectorized
    all-pairs-within-cell pass.  A pair of rects can share many cells, so
    each pair is REPORTED exactly once, in the cell that contains the
    intersection's min corner (the "reference point" rule of
    partition-based spatial merge join — Patel & DeWitt, SIGMOD'96): that
    corner lies in exactly one cell, and both rects are present there.

    No per-cell Python loop on the common path: within a block the
    per-cell (n_left × n_right) candidate index pairs are generated with
    segment cumsum arithmetic and masked vectorized.  SKEWED cells — where
    all-pairs would exceed ``_RECT_PAIR_BUDGET`` candidates — are re-joined
    locally on a W/8 sub-grid (recursively, the local analogue of the kNN
    hot-cell sub-stripe plan), so a pathological hot cell costs
    O(m · occupancy') instead of O(m²); exactly-once composes because each
    level filters its children's pairs by its own reference-point rule.
    Duplication factor ≈ (1 + w/cell)·(1 + h/cell) per rect — pick
    ``cell`` ≳ the typical rect size, or pass ``cell=None`` to let
    :func:`choose_grid_cell` derive it from exact extent/density partials
    (one cheap pre-pass).  Shuffle rows carry 5 floats + an
    id — payload columns re-attach by id afterwards
    (:func:`broadcast_join` / :func:`sorted_join`).
    """
    xmin_c, ymin_c, xmax_c, ymax_c = coord_cols
    if cell is None:
        cell = choose_grid_cell(left, right, coord_cols=coord_cols)
    W = float(cell)
    Wf = W / 8.0
    hot_arr = (np.fromiter(hot_cells, dtype=np.int64, count=len(hot_cells))
               if hot_cells else np.empty(0, np.int64))

    def explode(role: int, id_col: str):
        def fn(b: pa.Table) -> pa.Table:
            x0 = b[xmin_c].to_numpy(zero_copy_only=False)
            y0 = b[ymin_c].to_numpy(zero_copy_only=False)
            x1 = b[xmax_c].to_numpy(zero_copy_only=False)
            y1 = b[ymax_c].to_numpy(zero_copy_only=False)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            idx, key = _rect_cells(x0, y0, x1, y1, W)
            lvl = np.zeros(len(idx), np.int8)
            if len(hot_arr):
                # hot routing: drop the copies addressed to hot cells; any
                # rect touching >= 1 hot cell ALSO emits its full bbox at
                # W/8 under lvl=1 (pairs whose reference point lies in a
                # hot cell are resolved there; everything else stays
                # coarse — see the pairs() masks)
                hm = np.isin(key, hot_arr)
                touches = np.unique(idx[hm])
                idx, key = idx[~hm], key[~hm]
                lvl = lvl[: len(idx)]
                fidx, fkey = _rect_cells(x0[touches], y0[touches],
                                         x1[touches], y1[touches], Wf)
                idx = np.concatenate([idx, touches[fidx]])
                key = np.concatenate([key, fkey])
                lvl = np.concatenate([lvl, np.ones(len(fidx), np.int8)])
            return pa.table({
                "lvl": pa.array(lvl), "ck": pa.array(key),
                "x0": pa.array(x0[idx]), "y0": pa.array(y0[idx]),
                "x1": pa.array(x1[idx]), "y1": pa.array(y1[idx]),
                "rid": pa.array(ids[idx]),
                "role": pa.array(np.full(len(idx), role, np.int8))})
        return fn

    u = left.map_batches(explode(0, left_on), batch_format="pyarrow").union(
        right.map_batches(explode(1, right_on), batch_format="pyarrow"))

    def _ref_key(ix0, iy0, width):
        return (np.floor(ix0 / width).astype(np.int64) * _RECT_KY
                + (np.floor(iy0 / width).astype(np.int64) + _RECT_KOFF))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        raw_ck = g["ck"].to_numpy()
        lvl = g["lvl"].to_numpy()
        # factorized (lvl, ck) local key: rank arithmetic never overflows
        _, ci = np.unique(raw_ck, return_inverse=True)
        ck = ci.astype(np.int64) * 2 + lvl
        role = g["role"].to_numpy()
        order = np.argsort(ck, kind="stable")  # cell-segment the block
        ck, role = ck[order], role[order]
        raw_ck, lvl = raw_ck[order], lvl[order]
        cols = {c: g[c].to_numpy()[order] for c in
                ("x0", "y0", "x1", "y1", "rid")}
        lmask = role == 0
        lrows = np.flatnonzero(lmask)
        rrows = np.flatnonzero(~lmask)
        lc, rc = ck[lrows], ck[rrows]
        # per-common-cell segment boundaries on both sides
        ucl, lstart = np.unique(lc, return_index=True)
        ucr, rstart = np.unique(rc, return_index=True)
        common, il, ir = np.intersect1d(ucl, ucr, assume_unique=True,
                                        return_indices=True)
        empty = pd.DataFrame({left_id: np.empty(0, np.int64),
                              right_id: np.empty(0, np.int64),
                              "overlap_area": np.empty(0, np.float64)})
        if len(common) == 0:
            return empty
        nl = (np.append(lstart, len(lc))[1:] - lstart)[il]
        nr = (np.append(rstart, len(rc))[1:] - rstart)[ir]
        big = nl * nr > pair_budget
        sm = ~big
        li_parts = [np.empty(0, np.int64)]
        ri_parts = [np.empty(0, np.int64)]
        def ref_mask(ix0, iy0, grp_rows):
            """Exactly-once: ref point in THIS cell at the group's level;
            lvl-1 groups additionally require the ref's COARSE cell to be
            hot (a hot-touching pair whose ref lies in a normal cell is
            reported by that coarse cell instead)."""
            L1 = lvl[grp_rows] == 1
            width = np.where(L1, Wf, W)
            m = _ref_key(ix0, iy0, width) == raw_ck[grp_rows]
            if len(hot_arr):
                m &= np.where(L1,
                              np.isin(_ref_key(ix0, iy0, W), hot_arr),
                              True)
            return m

        if sm.any():
            # all-pairs within each normal cell, by segment arithmetic
            lp, rp = _seg_allpairs(lstart[il][sm], nl[sm],
                                   rstart[ir][sm], nr[sm])
            li, ri = lrows[lp], rrows[rp]
            ix0 = np.maximum(cols["x0"][li], cols["x0"][ri])
            iy0 = np.maximum(cols["y0"][li], cols["y0"][ri])
            keep = ((ix0 <= np.minimum(cols["x1"][li], cols["x1"][ri]))
                    & (iy0 <= np.minimum(cols["y1"][li], cols["y1"][ri]))
                    & ref_mask(ix0, iy0, li))
            li_parts.append(li[keep])
            ri_parts.append(ri[keep])
        for j in np.flatnonzero(big):      # skewed cells: sub-grid
            ls = lrows[lstart[il[j]]:lstart[il[j]] + nl[j]]
            rs = rrows[rstart[ir[j]]:rstart[ir[j]] + nr[j]]
            L = tuple(cols[c][ls] for c in ("x0", "y0", "x1", "y1"))
            R = tuple(cols[c][rs] for c in ("x0", "y0", "x1", "y1"))
            gw = Wf if lvl[ls[0]] == 1 else W
            sli, sri = _rect_pairs_local(L, R, gw / 8.0, pair_budget, 1)
            gl, gr = ls[sli], rs[sri]
            ix0 = np.maximum(cols["x0"][gl], cols["x0"][gr])
            iy0 = np.maximum(cols["y0"][gl], cols["y0"][gr])
            keep = ref_mask(ix0, iy0, gl)
            li_parts.append(gl[keep])
            ri_parts.append(gr[keep])
        li = np.concatenate(li_parts)
        ri = np.concatenate(ri_parts)
        if len(li) == 0:
            return empty
        ix0 = np.maximum(cols["x0"][li], cols["x0"][ri])
        iy0 = np.maximum(cols["y0"][li], cols["y0"][ri])
        ix1 = np.minimum(cols["x1"][li], cols["x1"][ri])
        iy1 = np.minimum(cols["y1"][li], cols["y1"][ri])
        return pd.DataFrame({
            left_id: cols["rid"][li],
            right_id: cols["rid"][ri],
            "overlap_area": (ix1 - ix0) * (iy1 - iy0)})

    return sorted_block_reduce(u, ["lvl", "ck"], pairs)


def _auto_cell_q(ds: ray.data.Dataset, to_bbox) -> int:
    """Planner hook for the int64-µ-unit grid joins: run
    :func:`choose_grid_cell` over a bbox projection and snap UP to a
    power of two (exact float cell math in ``_rect_cells`` for
    integer-valued inputs needs a binary width)."""
    bb = ds.map_batches(to_bbox, batch_format="pyarrow")
    cell = choose_grid_cell(bb)
    return 1 << max(0, int(np.ceil(np.log2(max(cell, 1.0)))))


def segment_cross_join(segs: ray.data.Dataset, *, cell_q: int | None = None,
                       id_col: str = "id", user_col: str = "user_id",
                       coord_cols=("ax", "ay", "bx", "by"),
                       pair_budget: int = _RECT_PAIR_BUDGET
                       ) -> ray.data.Dataset:
    """Self-join on line segments: every unordered pair of segments (from
    DIFFERENT ``user_col`` owners) whose interiors PROPERLY cross — the
    computational-geometry sibling of :func:`rect_join` (the reference's
    sweep answers "which points are near"; this answers "which movement
    vectors intersect").  Output: ``(a_id, b_id, user_a, user_b)`` with
    ``a_id < b_id``, each crossing pair exactly once.

    Endpoint coordinates must be int64 (caller-quantized, e.g. µ-units):
    every predicate is integer arithmetic — orientation tests are signs of
    int64 cross products (|coord| < 2^21 keeps products < 2^43), so the
    result is bit-reproducible in SQL and independent of partitioning.

    Same skeleton as rect_join (grid explode on the segment BBOX ->
    cell-keyed shuffle -> vectorized within-cell candidates -> exact
    verify), with two self-join twists: one role (each cell does its own
    upper triangle, ``a_id < b_id`` dedupes the ordered pairs), and the
    reference-point rule anchors on the bbox-intersection min corner —
    a proper crossing implies the bboxes overlap, and that corner lies in
    exactly one cell both segments were exploded into.  Oversized cells
    (> ``pair_budget`` candidates) reuse rect_join's recursive W/8
    sub-grid on the bboxes (``_rect_pairs_local``), whose per-level
    reference-point filter composes with the coarse-cell rule.  Pick
    ``cell_q`` ≳ the typical segment extent (a segment spanning s cells
    per axis ships s² copies); powers of two keep the float cell math in
    ``_rect_cells`` exact for integer-valued inputs.  ``cell_q=None``
    derives it from :func:`choose_grid_cell` over the segment bboxes."""
    ax_c, ay_c, bx_c, by_c = coord_cols
    if cell_q is None:
        def seg_bbox(b: pa.Table) -> pa.Table:
            ax = b[ax_c].to_numpy(zero_copy_only=False)
            ay = b[ay_c].to_numpy(zero_copy_only=False)
            bx = b[bx_c].to_numpy(zero_copy_only=False)
            by = b[by_c].to_numpy(zero_copy_only=False)
            return pa.table({"xmin": pa.array(np.minimum(ax, bx)),
                             "ymin": pa.array(np.minimum(ay, by)),
                             "xmax": pa.array(np.maximum(ax, bx)),
                             "ymax": pa.array(np.maximum(ay, by))})
        cell_q = _auto_cell_q(segs, seg_bbox)
    Wq = np.int64(cell_q)
    W = float(cell_q)

    def explode(b: pa.Table) -> pa.Table:
        ax = b[ax_c].to_numpy(zero_copy_only=False).astype(np.int64)
        ay = b[ay_c].to_numpy(zero_copy_only=False).astype(np.int64)
        bx = b[bx_c].to_numpy(zero_copy_only=False).astype(np.int64)
        by = b[by_c].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # int64-valued floats stay exact through _rect_cells (< 2^53)
        idx, key = _rect_cells(
            np.minimum(ax, bx).astype(np.float64),
            np.minimum(ay, by).astype(np.float64),
            np.maximum(ax, bx).astype(np.float64),
            np.maximum(ay, by).astype(np.float64), W)
        return pa.table({
            "ck": pa.array(key),
            "ax": pa.array(ax[idx]), "ay": pa.array(ay[idx]),
            "bx": pa.array(bx[idx]), "by": pa.array(by[idx]),
            "rid": pa.array(ids[idx]), "uid": pa.array(uid[idx])})

    u = segs.map_batches(explode, batch_format="pyarrow")

    def _cross_sign(px, py, qx, qy, rx, ry):
        """sign of cross(q - p, r - p), exact int64."""
        return np.sign((qx - px) * (ry - py) - (qy - py) * (rx - px))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy()
        order = np.argsort(ck, kind="stable")
        ck = ck[order]
        cols = {c: g[c].to_numpy()[order] for c in
                ("ax", "ay", "bx", "by", "rid", "uid")}
        x0 = np.minimum(cols["ax"], cols["bx"])
        y0 = np.minimum(cols["ay"], cols["by"])
        x1 = np.maximum(cols["ax"], cols["bx"])
        y1 = np.maximum(cols["ay"], cols["by"])
        uc, start = np.unique(ck, return_index=True)
        n = np.append(start, len(ck))[1:] - start
        big = n * n > pair_budget
        sm = ~big
        li_parts = [np.empty(0, np.int64)]
        ri_parts = [np.empty(0, np.int64)]
        if sm.any():
            lp, rp = _seg_allpairs(start[sm], n[sm], start[sm], n[sm])
            m = cols["rid"][lp] < cols["rid"][rp]   # unordered, no self
            li_parts.append(lp[m])
            ri_parts.append(rp[m])
        for j in np.flatnonzero(big):               # rare: skewed cells
            rows = np.arange(start[j], start[j] + n[j])
            B = (x0[rows].astype(np.float64), y0[rows].astype(np.float64),
                 x1[rows].astype(np.float64), y1[rows].astype(np.float64))
            sli, sri = _rect_pairs_local(B, B, W / 8.0, pair_budget, 1)
            m = cols["rid"][rows[sli]] < cols["rid"][rows[sri]]
            li_parts.append(rows[sli][m])
            ri_parts.append(rows[sri][m])
        li = np.concatenate(li_parts)
        ri = np.concatenate(ri_parts)
        empty = pd.DataFrame({"a_id": np.empty(0, np.int64),
                              "b_id": np.empty(0, np.int64),
                              "user_a": np.empty(0, np.int64),
                              "user_b": np.empty(0, np.int64)})
        if len(li) == 0:
            return empty
        # exactly-once: bbox-intersection min corner in THIS cell
        ix0 = np.maximum(x0[li], x0[ri])
        iy0 = np.maximum(y0[li], y0[ri])
        keep = ((ix0 <= np.minimum(x1[li], x1[ri]))
                & (iy0 <= np.minimum(y1[li], y1[ri]))
                & ((ix0 // Wq) * _RECT_KY + (iy0 // Wq + _RECT_KOFF)
                   == ck[li])
                & (cols["uid"][li] != cols["uid"][ri]))
        li, ri = li[keep], ri[keep]
        if len(li) == 0:
            return empty
        d1 = _cross_sign(cols["ax"][ri], cols["ay"][ri],
                         cols["bx"][ri], cols["by"][ri],
                         cols["ax"][li], cols["ay"][li])
        d2 = _cross_sign(cols["ax"][ri], cols["ay"][ri],
                         cols["bx"][ri], cols["by"][ri],
                         cols["bx"][li], cols["by"][li])
        d3 = _cross_sign(cols["ax"][li], cols["ay"][li],
                         cols["bx"][li], cols["by"][li],
                         cols["ax"][ri], cols["ay"][ri])
        d4 = _cross_sign(cols["ax"][li], cols["ay"][li],
                         cols["bx"][li], cols["by"][li],
                         cols["bx"][ri], cols["by"][ri])
        m = (d1 * d2 == -1) & (d3 * d4 == -1)       # proper crossing only
        li, ri = li[m], ri[m]
        return pd.DataFrame({
            "a_id": cols["rid"][li], "b_id": cols["rid"][ri],
            "user_a": cols["uid"][li], "user_b": cols["uid"][ri]})

    return sorted_block_reduce(u, "ck", pairs)


def convex_poly_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                     nv: int, cell_q: int | None = None,
                     id_col: str = "id",
                     pair_budget: int = 1 << 18) -> ray.data.Dataset:
    """Polygon-overlay join: every (left, right) pair of CCW CONVEX int64
    polygons that intersect — the classic GIS overlay, completing the
    engine's spatial-join family (point kNN/radius, point-in-polygon,
    rect-rect, segment-segment, interval, spatio-temporal).

    Input schema (both sides): ``id_col`` + ``nv`` vertex columns
    ``x0..x{nv-1}, y0..y{nv-1}`` (counter-clockwise, caller-quantized
    int64 — e.g. µ-units).  Output ``(a_id, b_id)``.

    Predicate (exact int64 signs, SQL-reproducible): a pair intersects
    iff some vertex of one polygon lies inside-or-on the other (closed
    half-plane test against every CCW edge) OR some edge pair PROPERLY
    crosses.  For convex polygons this is the complete intersection
    relation: if A∩B ≠ ∅ but no vertex of either is contained, the
    boundaries must cross transversally.

    Distribution = the rect_join skeleton on the vertex bboxes: grid
    explode at ``cell_q``, cell-keyed shuffle, per-cell role-0 × role-1
    candidates via cumsum arithmetic, bbox-intersection-min-corner
    exactly-once rule, then ONE vectorized verify over all candidates —
    (m, nv, nv) int64 cross-product tensors, no per-pair Python.  Skewed
    cells past ``pair_budget`` bbox-prefilter on a recursive W/8 sub-grid
    (rect_join's hot path) before the exact verify.  Pick ``cell_q`` ≳
    the typical polygon extent, or ``None`` for the
    :func:`choose_grid_cell` planner over the vertex bboxes."""
    xs = [f"x{i}" for i in range(nv)]
    ys = [f"y{i}" for i in range(nv)]
    if cell_q is None:
        def poly_bbox(b: pa.Table) -> pa.Table:
            VX = np.stack([b[c].to_numpy(zero_copy_only=False)
                           for c in xs], axis=1)
            VY = np.stack([b[c].to_numpy(zero_copy_only=False)
                           for c in ys], axis=1)
            return pa.table({"xmin": pa.array(VX.min(axis=1)),
                             "ymin": pa.array(VY.min(axis=1)),
                             "xmax": pa.array(VX.max(axis=1)),
                             "ymax": pa.array(VY.max(axis=1))})
        cell_q = max(_auto_cell_q(left, poly_bbox),
                     _auto_cell_q(right, poly_bbox))
    Wq = np.int64(cell_q)
    W = float(cell_q)

    def explode(role: int):
        def fn(b: pa.Table) -> pa.Table:
            V = np.stack(
                [np.stack([b[c].to_numpy(zero_copy_only=False)
                           .astype(np.int64) for c in xs], axis=1),
                 np.stack([b[c].to_numpy(zero_copy_only=False)
                           .astype(np.int64) for c in ys], axis=1)],
                axis=2)                                   # (n, nv, 2)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            x0 = V[:, :, 0].min(axis=1)
            x1 = V[:, :, 0].max(axis=1)
            y0 = V[:, :, 1].min(axis=1)
            y1 = V[:, :, 1].max(axis=1)
            idx, key = _rect_cells(x0.astype(np.float64),
                                   y0.astype(np.float64),
                                   x1.astype(np.float64),
                                   y1.astype(np.float64), W)
            cols = {"ck": pa.array(key),
                    "rid": pa.array(ids[idx]),
                    "role": pa.array(np.full(len(idx), role, np.int8)),
                    "bx0": pa.array(x0[idx]), "by0": pa.array(y0[idx]),
                    "bx1": pa.array(x1[idx]), "by1": pa.array(y1[idx])}
            for i in range(nv):
                cols[xs[i]] = pa.array(V[idx, i, 0])
                cols[ys[i]] = pa.array(V[idx, i, 1])
            return pa.table(cols)
        return fn

    u = left.map_batches(explode(0), batch_format="pyarrow").union(
        right.map_batches(explode(1), batch_format="pyarrow"))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["role"].to_numpy(), g["ck"].to_numpy()))
        ck = g["ck"].to_numpy()[order]
        role = g["role"].to_numpy()[order]
        rid = g["rid"].to_numpy()[order]
        bb = {c: g[c].to_numpy()[order] for c in
              ("bx0", "by0", "bx1", "by1")}
        V = np.stack(
            [np.stack([g[c].to_numpy()[order] for c in xs], axis=1),
             np.stack([g[c].to_numpy()[order] for c in ys], axis=1)],
            axis=2)
        # per (cell, role) runs: roles sorted within each cell
        uc, start, n = np.unique(ck, return_index=True, return_counts=True)
        # left rows come first inside each cell (role 0 < 1)
        nl = np.add.reduceat((role == 0).astype(np.int64), start)
        nr = n - nl
        # skewed cells (all-pairs > budget): bbox-prefilter their
        # candidates on a recursive W/8 sub-grid (_rect_pairs_local, the
        # rect_join hot path) instead of emitting the full cross product;
        # its per-level reference-point rule composes with the coarse rule
        big = nl * nr > pair_budget
        sm = ~big
        li_parts = [np.empty(0, np.int64)]
        ri_parts = [np.empty(0, np.int64)]
        if sm.any():
            lp, rp = _seg_allpairs(start[sm], nl[sm],
                                   start[sm] + nl[sm], nr[sm])
            li_parts.append(lp)
            ri_parts.append(rp)
        for j in np.flatnonzero(big):                 # rare: skewed cells
            lrows = np.arange(start[j], start[j] + nl[j])
            rrows = np.arange(start[j] + nl[j], start[j] + n[j])
            L = tuple(bb[c][lrows].astype(np.float64)
                      for c in ("bx0", "by0", "bx1", "by1"))
            R = tuple(bb[c][rrows].astype(np.float64)
                      for c in ("bx0", "by0", "bx1", "by1"))
            sli, sri = _rect_pairs_local(L, R, W / 8.0, pair_budget, 1)
            li_parts.append(lrows[sli])
            ri_parts.append(rrows[sri])
        li = np.concatenate(li_parts)
        ri = np.concatenate(ri_parts)
        empty = pd.DataFrame({"a_id": np.empty(0, np.int64),
                              "b_id": np.empty(0, np.int64)})
        if len(li) == 0:
            return empty
        # bbox overlap + exactly-once reference-point rule
        ix0 = np.maximum(bb["bx0"][li], bb["bx0"][ri])
        iy0 = np.maximum(bb["by0"][li], bb["by0"][ri])
        keep = ((ix0 <= np.minimum(bb["bx1"][li], bb["bx1"][ri]))
                & (iy0 <= np.minimum(bb["by1"][li], bb["by1"][ri]))
                & ((ix0 // Wq) * _RECT_KY + (iy0 // Wq + _RECT_KOFF)
                   == ck[li]))
        li, ri = li[keep], ri[keep]
        if len(li) == 0:
            return empty
        A = V[li]                                     # (m, nv, 2)
        B = V[ri]
        An = np.roll(A, -1, axis=1)                   # next vertex (CCW)
        Bn = np.roll(B, -1, axis=1)
        AE = An - A                                   # edge vectors
        BE = Bn - B

        def contained(P, Q, QE):
            # any vertex of P inside-or-on convex Q (closed, CCW):
            # cross(QE[e], P[v] - Q[e]) >= 0 for ALL edges e
            d = P[:, :, None, :] - Q[:, None, :, :]   # (m, nv, nv, 2)
            cr = (QE[:, None, :, 0] * d[:, :, :, 1]
                  - QE[:, None, :, 1] * d[:, :, :, 0])
            return (cr >= 0).all(axis=2).any(axis=1)

        def crossing():
            # proper crossing of any edge pair: both strict sign splits
            def side(P0, E, X):
                d = X[:, :, None, :] - P0[:, None, :, :]
                return np.sign(E[:, None, :, 0] * d[:, :, :, 1]
                               - E[:, None, :, 1] * d[:, :, :, 0])
            # side(Q, QE, X)[m, vx, eq]: X's vertex vx against Q's edge eq;
            # edge ea of A starts at vertex ea (An[ea] is its end), so
            # d1/d2 are already (m, ea, eb); d3/d4 arrive (m, eb, ea)
            d1 = side(B, BE, A)
            d2 = side(B, BE, An)
            d3 = side(A, AE, B).transpose(0, 2, 1)
            d4 = side(A, AE, Bn).transpose(0, 2, 1)
            return ((d1 * d2 == -1) & (d3 * d4 == -1)).any(axis=(1, 2))

        hit = contained(A, B, BE) | contained(B, A, AE) | crossing()
        return pd.DataFrame({"a_id": rid[li][hit], "b_id": rid[ri][hit]})

    return sorted_block_reduce(u, "ck", pairs)


def point_segment_join(points: ray.data.Dataset, segs: ray.data.Dataset, *,
                       radius_q: int, cell_q: int | None = None,
                       point_id: str = "pid", seg_id: str = "sid",
                       pt_cols=("px", "py"),
                       seg_cols=("ax", "ay", "bx", "by")
                       ) -> ray.data.Dataset:
    """Point-to-segment proximity join (the ST_DWithin(point, line)
    analogue): every (point, segment) pair whose exact squared
    point-to-segment distance is ≤ ``radius_q``² — "events near a route".
    Int64 µ-unit inputs; output ``(point_id, seg_id)``.

    Distribution: segments grid-explode on their bbox INFLATED by the
    radius; points land in exactly ONE cell — so a qualifying pair meets
    only there and needs no dedup (the degenerate-rectangle case of the
    reference-point rule).  The verify is one vectorized pass over the
    candidates with the classic clamped-projection predicate expressed in
    pure integer comparisons (SQL-reproducible, no division):

        inside  (0 ≤ (p−a)·(b−a) ≤ |b−a|²):  cross² ≤ r²·|b−a|²
        outside: min(|p−a|², |p−b|²) ≤ r²

    Overflow envelope: cross ≤ |p−a|·|b−a|; candidates keep |p−a| within
    ~2 cells of the segment, so with segment length ≲ 2·cell and
    cell ≲ 2^13 every product stays < 2^63 — assert-checked.  Pick
    ``cell_q`` ≳ max(segment extent, radius); ``None`` uses the planner
    over the inflated bboxes."""
    ax_c, ay_c, bx_c, by_c = seg_cols
    px_c, py_c = pt_cols
    r = np.int64(radius_q)

    def seg_bbox(b: pa.Table) -> pa.Table:
        ax = b[ax_c].to_numpy(zero_copy_only=False)
        ay = b[ay_c].to_numpy(zero_copy_only=False)
        bx = b[bx_c].to_numpy(zero_copy_only=False)
        by = b[by_c].to_numpy(zero_copy_only=False)
        return pa.table({"xmin": pa.array(np.minimum(ax, bx) - r),
                         "ymin": pa.array(np.minimum(ay, by) - r),
                         "xmax": pa.array(np.maximum(ax, bx) + r),
                         "ymax": pa.array(np.maximum(ay, by) + r)})

    if cell_q is None:
        cell_q = _auto_cell_q(segs, seg_bbox)
    Wq = np.int64(cell_q)
    W = float(cell_q)

    def explode_segs(b: pa.Table) -> pa.Table:
        ax = b[ax_c].to_numpy(zero_copy_only=False).astype(np.int64)
        ay = b[ay_c].to_numpy(zero_copy_only=False).astype(np.int64)
        bx = b[bx_c].to_numpy(zero_copy_only=False).astype(np.int64)
        by = b[by_c].to_numpy(zero_copy_only=False).astype(np.int64)
        sid = b[seg_id].to_numpy(zero_copy_only=False).astype(np.int64)
        idx, key = _rect_cells(
            (np.minimum(ax, bx) - r).astype(np.float64),
            (np.minimum(ay, by) - r).astype(np.float64),
            (np.maximum(ax, bx) + r).astype(np.float64),
            (np.maximum(ay, by) + r).astype(np.float64), W)
        return pa.table({
            "ck": pa.array(key), "role": pa.array(
                np.ones(len(idx), np.int8)),
            "ax": pa.array(ax[idx]), "ay": pa.array(ay[idx]),
            "bx": pa.array(bx[idx]), "by": pa.array(by[idx]),
            "rid": pa.array(sid[idx])})

    def tag_points(b: pa.Table) -> pa.Table:
        px = b[px_c].to_numpy(zero_copy_only=False).astype(np.int64)
        py = b[py_c].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = b[point_id].to_numpy(zero_copy_only=False).astype(np.int64)
        key = ((px // Wq) * _RECT_KY + (py // Wq + _RECT_KOFF))
        n = len(px)
        return pa.table({
            "ck": pa.array(key), "role": pa.array(np.zeros(n, np.int8)),
            "ax": pa.array(px), "ay": pa.array(py),
            "bx": pa.array(np.zeros(n, np.int64)),
            "by": pa.array(np.zeros(n, np.int64)),
            "rid": pa.array(pid)})

    u = points.map_batches(tag_points, batch_format="pyarrow").union(
        segs.map_batches(explode_segs, batch_format="pyarrow"))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["role"].to_numpy(), g["ck"].to_numpy()))
        ck = g["ck"].to_numpy()[order]
        role = g["role"].to_numpy()[order]
        cols = {c: g[c].to_numpy()[order]
                for c in ("ax", "ay", "bx", "by", "rid")}
        _, start, n = np.unique(ck, return_index=True, return_counts=True)
        npts = np.add.reduceat((role == 0).astype(np.int64), start)
        li, ri = _seg_allpairs(start, npts, start + npts, n - npts)
        empty = pd.DataFrame({point_id: np.empty(0, np.int64),
                              seg_id: np.empty(0, np.int64)})
        if len(li) == 0:
            return empty
        px, py = cols["ax"][li], cols["ay"][li]
        ax, ay = cols["ax"][ri], cols["ay"][ri]
        bx, by = cols["bx"][ri], cols["by"][ri]
        ex, ey = bx - ax, by - ay
        dax, day = px - ax, py - ay
        # magnitude envelope for exact int64 cross² and r²·len² (see
        # docstring): |cross| ≤ 2·maxd·maxe must stay < 2^31
        if len(ex):
            maxd = max(int(np.abs(dax).max()), int(np.abs(day).max()), 1)
            maxe = max(int(np.abs(ex).max()), int(np.abs(ey).max()), 1)
            if 2 * maxd * maxe >= (1 << 31) or \
                    int(r) * maxe >= (1 << 31):
                raise ValueError(
                    "point_segment_join magnitude envelope exceeded: "
                    f"maxd={maxd} maxe={maxe} r={int(r)}; quantize "
                    "coarser or shrink cell_q/radius")
        len2 = ex * ex + ey * ey
        tnum = dax * ex + day * ey
        cross = ex * day - ey * dax
        r2 = r * r
        d_a = dax * dax + day * day
        dbx, dby = px - bx, py - by
        d_b = dbx * dbx + dby * dby
        inside = (tnum >= 0) & (tnum <= len2) & (len2 > 0)
        hit = np.where(inside, cross * cross <= r2 * len2,
                       np.minimum(d_a, d_b) <= r2)
        li, ri = li[hit], ri[hit]
        return pd.DataFrame({point_id: cols["rid"][li],
                             seg_id: cols["rid"][ri]})

    return sorted_block_reduce(u, "ck", pairs)


def st_radius_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                   radius: float, window_us: int,
                   left_id: str = "a_id", right_id: str = "b_id",
                   cols=("id", "x", "y", "ts")) -> ray.data.Dataset:
    """Spatio-temporal radius join: every (left, right) pair with euclidean
    distance <= radius AND |t_left - t_right| <= window_us (closed bounds,
    int64 epoch-µs).  Output: (left_id, right_id, distance_sq, lag_us).

    The cell+halo exchange extended to a third dimension with an
    asymmetric-halo trick that needs NO output dedup: LEFT rows are
    duplicated over the TIME halo only (every window_us-bucket their
    ±window overlaps — each keeps its own single spatial cell), RIGHT rows
    are duplicated over the SPACE halo only (ring-1 neighbor cells of
    radius <= cell width — each keeps its own single time bucket).  A
    qualifying pair therefore meets at EXACTLY ONE key, (left's cell,
    right's bucket): left's cell is in right's ring because distance <=
    radius <= cell width, and right's bucket is in left's window cover
    because |lag| <= window_us.  Duplication: <=3x left (time), 9x right
    (space) — vs 27x for a symmetric 3-D halo, and no reference-point
    masking in the kernel."""
    id_c, x_c, y_c, t_c = cols
    W = float(radius)              # cell width = radius (ring-1 suffices)
    B = np.int64(window_us)        # bucket width = window (±1 suffices)
    # (cell, bucket) stay two separate shuffle keys: epoch-µs bucket ids
    # are ~2^21 and cell ids ~2^40+, so packing both into one int64 would
    # overflow; the kernel re-factorizes locally instead
    KX = np.int64(1) << np.int64(32)
    KOFF = np.int64(1) << np.int64(31)

    def _epoch(col: pa.ChunkedArray) -> np.ndarray:
        a = col.to_numpy(zero_copy_only=False)
        if a.dtype.kind == "M":
            a = a.astype("datetime64[us]").astype(np.int64)
        return a.astype(np.int64)

    def _cell(x, y):
        return (np.floor(x / W).astype(np.int64) * KX
                + (np.floor(y / W).astype(np.int64) + KOFF))

    def explode_left(b: pa.Table) -> pa.Table:
        x = b[x_c].to_numpy(zero_copy_only=False)
        y = b[y_c].to_numpy(zero_copy_only=False)
        t = _epoch(b[t_c])
        ids = b[id_c].to_numpy(zero_copy_only=False).astype(np.int64)
        c = _cell(x, y)
        b0 = (t - B) // B
        counts = (t + B) // B - b0 + 1
        idx = np.repeat(np.arange(len(t)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        off = (np.arange(int(counts.sum()), dtype=np.int64)
               - np.repeat(starts, counts))
        return pa.table({
            "cell": pa.array(c[idx]), "bucket": pa.array(b0[idx] + off),
            "x": pa.array(x[idx]), "y": pa.array(y[idx]),
            "t": pa.array(t[idx]), "rid": pa.array(ids[idx]),
            "role": pa.array(np.zeros(len(idx), np.int8))})

    def explode_right(b: pa.Table) -> pa.Table:
        x = b[x_c].to_numpy(zero_copy_only=False)
        y = b[y_c].to_numpy(zero_copy_only=False)
        t = _epoch(b[t_c])
        ids = b[id_c].to_numpy(zero_copy_only=False).astype(np.int64)
        kx = np.floor(x / W).astype(np.int64)
        ky = np.floor(y / W).astype(np.int64)
        tb = t // B
        n = len(t)
        idx = np.repeat(np.arange(n), 9)
        ring = np.tile(np.arange(9, dtype=np.int64), n)
        cell = ((kx[idx] + ring // 3 - 1) * KX
                + (ky[idx] + ring % 3 - 1 + KOFF))
        return pa.table({
            "cell": pa.array(cell), "bucket": pa.array(tb[idx]),
            "x": pa.array(x[idx]), "y": pa.array(y[idx]),
            "t": pa.array(t[idx]), "rid": pa.array(ids[idx]),
            "role": pa.array(np.ones(len(idx), np.int8))})

    u = left.map_batches(explode_left, batch_format="pyarrow").union(
        right.map_batches(explode_right, batch_format="pyarrow"))
    r2 = W * W if radius == W else radius * radius

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        # factorize (cell, bucket) into a dense local key: unique ranks
        # multiply without overflow regardless of the raw id magnitudes
        cells = g["cell"].to_numpy()
        buckets = g["bucket"].to_numpy()
        _, ci = np.unique(cells, return_inverse=True)
        ub, bi = np.unique(buckets, return_inverse=True)
        sk = ci.astype(np.int64) * np.int64(len(ub)) + bi
        role = g["role"].to_numpy()
        order = np.argsort(sk, kind="stable")
        sk, role = sk[order], role[order]
        cols_ = {c: g[c].to_numpy()[order] for c in ("x", "y", "t", "rid")}
        lrows = np.flatnonzero(role == 0)
        rrows = np.flatnonzero(role == 1)
        lk, rk = sk[lrows], sk[rrows]
        ucl, lstart = np.unique(lk, return_index=True)
        ucr, rstart = np.unique(rk, return_index=True)
        common, il, ir = np.intersect1d(ucl, ucr, assume_unique=True,
                                        return_indices=True)
        empty = pd.DataFrame({
            left_id: np.empty(0, np.int64),
            right_id: np.empty(0, np.int64),
            "distance_sq": np.empty(0, np.float64),
            "lag_us": np.empty(0, np.int64)})
        if len(common) == 0:
            return empty
        nl = (np.append(lstart, len(lk))[1:] - lstart)[il]
        nr = (np.append(rstart, len(rk))[1:] - rstart)[ir]
        lp, rp = _seg_allpairs(lstart[il], nl, rstart[ir], nr)
        li, ri = lrows[lp], rrows[rp]
        dx = cols_["x"][li] - cols_["x"][ri]
        dy = cols_["y"][li] - cols_["y"][ri]
        d2 = dx * dx + dy * dy
        lag = cols_["t"][ri] - cols_["t"][li]
        keep = (d2 <= r2) & (np.abs(lag) <= B)
        return pd.DataFrame({
            left_id: cols_["rid"][li][keep],
            right_id: cols_["rid"][ri][keep],
            "distance_sq": d2[keep],
            "lag_us": lag[keep].astype(np.int64)})

    return sorted_block_reduce(u, ["cell", "bucket"], sweep)
