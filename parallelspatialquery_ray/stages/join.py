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
                   concurrency=(1, 8)) -> ray.data.Dataset:
    """Join a Dataset against a SMALL in-memory right side (broadcast)."""
    ref = ray.put(right_df)

    class _Merge:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b.merge(self.right, how=how, left_on=left_on,
                           right_on=right_on)

    return left.map_batches(_Merge, batch_format="pandas",
                            concurrency=concurrency)


def sorted_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                left_on: str, right_on: str,
                how: str = "inner") -> ray.data.Dataset:
    """Partitioned equi-join of two Datasets: both sides are tagged, unioned
    and range-shuffled on the join key; every block then holds ALL rows of
    any key it holds, so a per-block pandas merge is exact.  ``how``:
    "inner" or "left".  Column-name collisions (other than the key) get
    pandas' _x/_y suffixes."""
    def fields_of(ds: ray.data.Dataset) -> dict[str, pa.DataType]:
        s = ds.schema()
        if all(isinstance(t, pa.DataType) for t in s.types):
            return dict(zip(s.names, s.types))
        # pandas-backed datasets report numpy/python types; sample to get
        # the real arrow schema
        tbl = pa.Table.from_pandas(ds.limit(100).to_pandas(),
                                   preserve_index=False)
        return {f.name: f.type for f in tbl.schema}

    lf, rf = fields_of(left), fields_of(right)
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

    u = l.map_batches(widen(lcols), batch_format="pyarrow").union(
        r.map_batches(widen(rcols), batch_format="pyarrow"))

    def merge_block(g: pd.DataFrame) -> pd.DataFrame:
        lb = g[g["jrole__"] == 0][["jkey__"] + lcols]
        rb = g[g["jrole__"] == 1][["jkey__"] + [c for c in rcols
                                                if c != right_on]]
        out = lb.merge(rb, how=how, on="jkey__")
        return out.drop(columns=["jkey__"])

    return sorted_block_reduce(u, "jkey__", merge_block)
