"""Equi-join operators vs pandas/duckdb oracles."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from parallelspatialquery_ray.sources import synth
from parallelspatialquery_ray.stages.join import broadcast_join, sorted_join


def _fixtures():
    rng = np.random.default_rng(5)
    l = pd.DataFrame({"k": rng.integers(0, 500, 5000),
                      "lv": rng.random(5000)})
    r = pd.DataFrame({"k": np.arange(0, 600, 2),
                      "rv": np.arange(0, 600, 2) * 10})
    return l, r


def test_sorted_join_inner_matches_pandas():
    l, r = _fixtures()
    out = sorted_join(rd.from_pandas(l), rd.from_pandas(r),
                      left_on="k", right_on="k").to_pandas()
    want = l.merge(r, on="k", how="inner")
    assert len(out) == len(want)
    o = out.sort_values(["k", "lv"]).reset_index(drop=True)
    w = want.sort_values(["k", "lv"]).reset_index(drop=True)
    assert np.array_equal(o["rv"].to_numpy(dtype=np.float64),
                          w["rv"].to_numpy(dtype=np.float64))


def test_sorted_join_left_keeps_unmatched():
    l, r = _fixtures()
    out = sorted_join(rd.from_pandas(l), rd.from_pandas(r),
                      left_on="k", right_on="k", how="left").to_pandas()
    assert len(out) == len(l)
    odd = out[out["k"] % 2 == 1]
    assert odd["rv"].isna().all()


def test_broadcast_join_matches_sorted():
    l, r = _fixtures()
    a = broadcast_join(rd.from_pandas(l), r, left_on="k",
                       right_on="k").to_pandas()
    b = sorted_join(rd.from_pandas(l), rd.from_pandas(r),
                    left_on="k", right_on="k").to_pandas()
    assert len(a) == len(b)


def test_join_carries_span_payload():
    # spans survive a join back onto kNN results (the wide-row pattern)
    tbl = synth.geo_doc_table(300, seed=81)
    from parallelspatialquery_ray.stages.knn import aknn_join
    ds = rd.from_arrow(tbl)
    res = aknn_join(ds, ds, 3, res=2, n_training=300, pad=False)
    joined = sorted_join(res, ds.select_columns(["doc_id", "spans"]),
                         left_on="input_id", right_on="doc_id").to_pandas()
    assert len(joined) == 900
    orig = {r["doc_id"]: r["spans"] for r in tbl.to_pylist()}
    for _, row in joined.head(50).iterrows():
        got = [tuple(s.values()) for s in row["spans"]]
        want = [tuple(s.values()) for s in orig[row["input_id"]]]
        assert got == want  # exact (kind, text, media_ref, offset) order


def test_asof_join_restores_int_dtypes():
    # Regression (driver hash gate): the widened union frame float-widens
    # integer columns; the merged output must restore int64 (left cols,
    # never null) / nullable int64 (right cols, null on unmatched rows).
    import pyarrow as pa

    from parallelspatialquery_ray.stages.join import asof_join
    left = pd.DataFrame({"user_id": [1, 1, 2, 3], "ts": [10, 20, 5, 9],
                         "event_id": [100, 101, 102, 103]})
    right = pd.DataFrame({"user_id": [1, 2], "ts": [8, 50],
                          "view_id": [7, 8]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="ts", by="user_id")
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                            batch_size=None))
    sch = {f.name: f.type for f in tbl.schema}
    assert pa.types.is_integer(sch["event_id"]), sch["event_id"]
    assert pa.types.is_integer(sch["view_id"]), sch["view_id"]
    df = out.to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    assert df["view_id"].isna().tolist() == [False, False, True, True]
    assert df.loc[0, "view_id"] == 7
