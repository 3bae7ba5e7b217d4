"""Local mirror of the driver's correctness gate: runs every queries()[name]
at a given sf_dir and compares against oracle_sql()[name] via DuckDB —
row count, column names, and order-insensitive value equality (exact for
ints/strings, bit-exact for floats).

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def physical_encoding_errors(got: pd.DataFrame,
                             want: pd.DataFrame) -> list[str]:
    """Driver-faithful physical-encoding check.  The driver hashes the
    result's canonical form, which is sensitive to distinctions the value
    compare below erases: a pandas extension dtype (Int64Dtype ``<NA>``)
    hashes differently from the plain float64-with-NaN frame DuckDB
    returns even when every value is equal — this exact class shipped red
    twice (asof_purchase_view r3, outer_join_users r4) while the value
    compare said green.  Flag any column whose got-side physical encoding
    class differs from the oracle's: pandas extension dtypes vs numpy
    dtypes, and ``pd.NA`` sentinels hiding inside object columns."""
    errs = []
    for c in got.columns:
        g_ext = pd.api.types.is_extension_array_dtype(got[c].dtype)
        w_ext = pd.api.types.is_extension_array_dtype(want[c].dtype)
        if g_ext != w_ext:
            errs.append(
                f"col {c}: physical encoding {got[c].dtype} vs oracle "
                f"{want[c].dtype} — extension-dtype nulls (<NA>) hash "
                f"differently than NaN under the driver's gate even when "
                f"values match")
        elif got[c].dtype == object and len(got):
            # full-column scan: a head()-bounded check would go false-green
            # when the first pd.NA appears late — the exact local-green /
            # driver-red pattern this function exists to kill (gate
            # results are small; the scan is cheap)
            if any(v is pd.NA for v in got[c]):
                errs.append(f"col {c}: object column contains pd.NA "
                            f"sentinels (driver-hash divergence vs NaN/None)")
    return errs


def compare(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return errs
    if len(got) != len(want):
        errs.append(f"rows {len(got)} != {len(want)}")
        return errs
    errs += physical_encoding_errors(got, want)
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            gv = gv.astype(np.float64)
            wv = wv.astype(np.float64)
            ok = np.array_equal(np.nan_to_num(gv, nan=-1.5e308),
                                np.nan_to_num(wv, nan=-1.5e308))
        else:
            ok = (pd.isna(gv) == pd.isna(wv)).all() and \
                (gv[~pd.isna(gv)] == wv[~pd.isna(wv)]).all()
        if not ok:
            bad = np.nonzero(~(gv == wv))[0][:3] if len(gv) else []
            errs.append(f"col {c} values differ (e.g. rows {list(bad)}: "
                        f"{[gv[i] for i in bad]} vs {[wv[i] for i in bad]})")
    return errs


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows   ({dt:.1f}s)")
            n_pass += 1
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        errs = compare(got, want)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"ok   {name}: {len(got)} rows match oracle   ({dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
