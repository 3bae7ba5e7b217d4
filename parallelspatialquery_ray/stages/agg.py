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

    partial = ds.map_batches(local_topk, batch_format="pandas")
    return sorted_block_reduce(partial, group_col, final_topk)


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

    partial = ds.map_batches(partial_counts, batch_format="pandas")
    return sorted_block_reduce(partial, group_col, weighted_median)
