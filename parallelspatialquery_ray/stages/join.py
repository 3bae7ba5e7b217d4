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

    def merge_block(g: pd.DataFrame) -> pd.DataFrame:
        lb = g[g["jrole__"] == 0][lout].sort_values(on, kind="stable")
        rb = g[g["jrole__"] == 1][[by, on] + rcols] \
            .sort_values(on, kind="stable")
        out = pd.merge_asof(lb, rb, on=on, by=by, direction=direction,
                            suffixes=("", suffix))
        for c in out.columns:
            if c in int_cols and out[c].dtype.kind == "f":
                out[c] = out[c].astype("Int64" if c in rcols else "int64")
        return out

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
    "inner" or "left".  Column-name collisions (other than the key) get
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

    def merge_block(g: pd.DataFrame) -> pd.DataFrame:
        lb = g[g["jrole__"] == 0][["jkey__"] + lcols]
        rb = g[g["jrole__"] == 1][["jkey__"] + [c for c in rcols
                                                if c != right_on]]
        out = lb.merge(rb, how=how, on="jkey__")
        out = out.drop(columns=["jkey__"])
        for c in out.columns:
            if c in int_cols and out[c].dtype.kind == "f":
                out[c] = out[c].astype("Int64")
        return out

    return sorted_block_reduce(u, "jkey__", merge_block)
