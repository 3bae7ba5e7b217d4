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
