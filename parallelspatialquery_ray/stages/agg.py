"""Grouped order-statistics operators: per-group top-k and exact median.

Both ride the engine's standard wide shape (`sorted_block_reduce`: range-
shuffle on the group key so a block holds every row of any group it holds,
then one vectorized pandas pass over MANY groups per block).  Top-k is the
grouped analogue of the kNN kernel's k-select; median is the exact
order-statistic (DuckDB `median()` reproduces both for the oracle gate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .shuffle import sorted_block_reduce


def grouped_topk(ds: ray.data.Dataset, *, group_col: str, order_col: str,
                 k: int, descending: bool = True,
                 tie_col: str | None = None) -> ray.data.Dataset:
    """Top-k rows per group by ``order_col`` (ties broken by ``tie_col``
    ascending — deterministic output).  Adds a 0-based ``rank`` column."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        by = [group_col, order_col] + ([tie_col] if tie_col else [])
        asc = [True, not descending] + ([True] if tie_col else [])
        g = g.sort_values(by, ascending=asc, kind="stable")
        g = g.copy()
        g["rank"] = g.groupby(group_col, sort=False).cumcount() \
            .astype(np.int32)
        return g[g["rank"] < k]

    return sorted_block_reduce(ds, group_col, topk)


def grouped_median(ds: ray.data.Dataset, *, group_col: str,
                   value_col: str) -> ray.data.Dataset:
    """Exact per-group median (float64; even-sized groups average the two
    middle values, matching DuckDB ``median()``) plus the group count."""

    def med(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col, sort=False)[value_col].agg(
            ["median", "size"]).reset_index()
        return pd.DataFrame({
            group_col: out[group_col],
            "median_value": out["median"].astype(np.float64),
            "n": out["size"].astype(np.int64),
        })

    return sorted_block_reduce(ds, group_col, med)
