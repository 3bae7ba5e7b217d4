"""Thin storage adapter: Lance when pylance is importable, else Parquet.

The north_rule targets Lance tables; the sandbox has no pylance, so every
read/write goes through this adapter with an identical Arrow schema either
way (SURVEY.md §7.1).  Paths are directories for datasets, ``.parquet`` /
``.lance`` suffixes pick the format explicitly.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

try:  # pragma: no cover - not installed in the sandbox
    import lance  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """ray.data.read_lance / read_parquet behind one call; prunes columns at
    the read (pass ``columns``) so only needed data leaves storage."""
    if HAVE_LANCE and (path.endswith(".lance") or
                       os.path.isdir(os.path.join(path, "_versions"))):  # pragma: no cover
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)


def write_arrow(table: pa.Table, path: str) -> None:
    """Driver-side single-table write (fixtures, small results)."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        lance.write_dataset(table, path)
        return
    pq.write_table(table, path)
