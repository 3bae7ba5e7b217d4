"""Readers/writers for the reference's own point-file formats, so a user of
thcristo/ParallelSpatialQuery can run their existing data files unchanged.

- Text: whitespace-separated ``id x y`` rows
  (/root/reference/PlaneSweepParallel/include/AllKnnProblem.h:54-61).
- Binary (``.bin``): a ``size_t`` (u64 little-endian) count header followed
  by packed 24-byte ``{u64 id; f64 x; f64 y}`` records
  (AllKnnProblem.h:158-177; confirmed by DatasetGenerator/testdata.bin:
  10 points = 8 + 10*24 = 248 bytes).
- Extension dispatch mirrors the reference (".bin" suffix -> binary,
  PlaneSweepParallel.h:55-59).

Also here: the reference's neighbor-list text sink (one line per query
point: ``id\\t(neighborId distanceSq)...`` with NULL for padding,
AllKnnResult.h:114-164) for conformance diffing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def read_points(path: str, *, id_col: str = "doc_id") -> ray.data.Dataset:
    """Read a reference-format point file into a (id, x, y) Dataset."""
    if path.endswith(".bin"):
        raw = np.fromfile(path, dtype=np.uint8)
        n = int(np.frombuffer(raw[:8].tobytes(), dtype=np.uint64)[0])
        rec = np.frombuffer(raw[8:8 + 24 * n].tobytes(),
                            dtype=[("id", "<u8"), ("x", "<f8"), ("y", "<f8")])
        tbl = pa.table({id_col: pa.array(rec["id"].astype(np.int64)),
                        "x": pa.array(rec["x"]), "y": pa.array(rec["y"])})
        return ray.data.from_arrow(tbl)

    ds = ray.data.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        lines = [ln for ln in batch["text"].to_pylist() if ln.strip()]
        ids = np.empty(len(lines), dtype=np.int64)
        xs = np.empty(len(lines))
        ys = np.empty(len(lines))
        for i, ln in enumerate(lines):
            p = ln.split()
            ids[i], xs[i], ys[i] = int(p[0]), float(p[1]), float(p[2])
        return pa.table({id_col: pa.array(ids), "x": pa.array(xs),
                         "y": pa.array(ys)})

    return ds.map_batches(parse, batch_format="pyarrow")


def write_points_bin(ids: np.ndarray, x: np.ndarray, y: np.ndarray,
                     path: str) -> None:
    """Write the reference's binary format (round-trip fixture support)."""
    n = len(ids)
    rec = np.empty(n, dtype=[("id", "<u8"), ("x", "<f8"), ("y", "<f8")])
    rec["id"] = np.asarray(ids, dtype=np.uint64)
    rec["x"] = x
    rec["y"] = y
    with open(path, "wb") as f:
        f.write(np.uint64(n).tobytes())
        f.write(rec.tobytes())


def write_neighbor_text(result_df: pd.DataFrame, path: str,
                        *, descending: bool = True) -> None:
    """The reference's neighbor-list text format: per query point one line
    ``id\\t(neighbor dist)(neighbor dist)...``, padding printed as NULL.
    ``descending=True`` matches the reference's heap-pop order (farthest
    first, sentinels first — AllKnnResult.h:139-155); our native order is
    ascending, so rows are emitted in reversed rank order."""
    df = result_df.sort_values(["input_id", "rank"],
                               ascending=[True, not descending])
    with open(path, "w") as f:
        for qid, g in df.groupby("input_id", sort=True):
            parts = []
            for _, row in g.iterrows():
                nid = row["neighbor_id"]
                if pd.isna(nid):
                    parts.append("(NULL)")
                else:
                    if isinstance(nid, float) and nid.is_integer():
                        nid = int(nid)  # pandas upcasts int cols with NaNs
                    parts.append(f"({nid} {row['distance_sq']:.17g})")
            f.write(f"{qid}\t{''.join(parts)}\n")


def find_differences(a: pd.DataFrame, b: pd.DataFrame,
                     accuracy: float = 1e-15) -> dict:
    """The reference's cross-validation operator (FindDifferences,
    AllKnnResult.h:173-227; driver loop src/PlaneSweepParallel.cpp:354-398):
    per (input_id, rank-by-distance) compare DISTANCES ONLY at the given
    accuracy (ids are deliberately not compared — distance ties make
    neighbor identity scan-order-dependent).  Returns the diff count and
    the first few differing ids, like the reference's report."""
    key = ["input_id", "rank"]
    am = a.sort_values(key).reset_index(drop=True)
    bm = b.sort_values(key).reset_index(drop=True)
    if len(am) != len(bm):
        return {"n_diff": -1, "error": f"row counts differ: "
                                       f"{len(am)} vs {len(bm)}"}
    da = am["distance_sq"].to_numpy(dtype=np.float64)
    db = bm["distance_sq"].to_numpy(dtype=np.float64)
    both_nan = np.isnan(da) & np.isnan(db)
    diff = np.abs(np.nan_to_num(da, nan=0) - np.nan_to_num(db, nan=0))
    bad = (diff > accuracy) & ~both_nan
    bad_ids = am.loc[bad, "input_id"].unique()
    return {"n_diff": int(len(bad_ids)),
            "first_ids": bad_ids[:5].tolist(),
            "max_abs_diff": float(diff[~both_nan].max()) if (~both_nan).any()
            else 0.0}
