"""Equi-join operators vs pandas/duckdb oracles."""

import duckdb
import pyarrow as pa
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


def test_pip_anti_join_partition(ray_session):
    """pip matches + anti-join = all points, disjoint."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.sources import synth
    from parallelspatialquery_ray.stages.pip import point_in_polygon_join

    rng = np.random.default_rng(13)
    n = 2000
    tbl = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                    "x": rng.random(n), "y": rng.random(n)})
    polys = synth.convex_polygons(6, seed=101)
    inside = point_in_polygon_join(rd.from_arrow(tbl), polys,
                                   method="convex").to_pandas()
    outside = point_in_polygon_join(rd.from_arrow(tbl), polys,
                                    method="convex", anti=True).to_pandas()
    ins = set(inside["point_id"])
    outs = set(outside["point_id"])
    assert ins.isdisjoint(outs)
    assert ins | outs == set(range(n))


def test_od_flows_lag_semantics(ray_session):
    """OD counts equal a pandas lag-groupby reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages import windows

    rng = np.random.default_rng(17)
    n, res = 5000, 4
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "user_id": rng.integers(0, 50, n).astype(np.int64),
        "x": rng.random(n), "y": rng.random(n)})
    out = windows.od_flows(rd.from_pandas(df), res).to_pandas()
    d = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    cell = (np.floor(d["x"] * res).astype(np.int64) * res
            + np.floor(d["y"] * res).astype(np.int64))
    d["cell_to"] = cell
    d["cell_from"] = d.groupby("user_id")["cell_to"].shift(1)
    want = d.dropna(subset=["cell_from"]).astype({"cell_from": np.int64}) \
        .groupby(["cell_from", "cell_to"]).size().reset_index(name="n_flows")
    got = out.sort_values(["cell_from", "cell_to"]).reset_index(drop=True)
    want = want.sort_values(["cell_from", "cell_to"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.astype({"n_flows": np.int64}), check_dtype=False)
    assert got["n_flows"].sum() == n - d.groupby("user_id").ngroups


def test_interval_join_matches_bruteforce_and_duckdb(sf_dir):
    import duckdb
    import ray.data as rd
    from parallelspatialquery_ray.pipelines.queries import (build_oracle_sql,
                                                            build_queries)
    from parallelspatialquery_ray.stages.join import interval_join

    # adversarial unit case: intervals spanning MANY buckets + boundary hits
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    starts = base + np.array([0, 1_000_000, 5_000_000, 9_999_999],
                             dtype=np.int64)
    ends = starts + np.array([10_000_000, 500_000, 25_000_000, 1],
                             dtype=np.int64)  # 10s, .5s, 25s, 1us
    lt = pa.table({"iid": pa.array(np.arange(4, dtype=np.int64)),
                   "t0": pa.array(starts.astype("datetime64[us]")),
                   "t1": pa.array(ends.astype("datetime64[us]"))})
    rng = np.random.default_rng(3)
    ts = base + rng.integers(0, 40_000_000, 500).astype(np.int64)
    ts[:4] = ends[:4]  # exact end-boundary hits (inclusive)
    rt = pa.table({"eid": pa.array(np.arange(500, dtype=np.int64)),
                   "t": pa.array(ts.astype("datetime64[us]"))})
    out = interval_join(rd.from_arrow(lt).repartition(3),
                        rd.from_arrow(rt).repartition(5),
                        start_col="t0", end_col="t1", ts_col="t",
                        left_id="iid", right_id="eid",
                        bucket_us=2_000_000).to_pandas()  # 2s buckets
    want = {(int(i), int(e)) for i in range(4) for e in range(500)
            if starts[i] <= ts[e] <= ends[i]}
    got = set(zip(out["iid"].astype(int), out["eid"].astype(int)))
    assert got == want and len(out) == len(want)
    lag = dict(zip(zip(out["iid"], out["eid"]), out["lag_us"]))
    for (i, e), v in lag.items():
        assert v == ts[e] - starts[i]

    # catalog query vs its DuckDB oracle on real events
    got2 = build_queries()["interval_join"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.register("events", pd.read_parquet(f"{sf_dir}/events.parquet"))
    want2 = con.sql(build_oracle_sql()["interval_join"]).df()
    key = ["purchase_id", "error_id"]
    pd.testing.assert_frame_equal(
        got2.sort_values(key).reset_index(drop=True),
        want2.sort_values(key).reset_index(drop=True)[got2.columns],
        check_dtype=True)


def test_rect_join_matches_bruteforce(ray_session):
    # Grid-partitioned rect-overlap join: exact pair set (closed intervals),
    # exactly-once reporting (reference-point dedup), bit-exact areas.
    from parallelspatialquery_ray.stages.join import rect_join
    def mk(n, seed, wmax=0.08):
        r = np.random.default_rng(seed)
        x = r.uniform(0, 1, n)
        y = r.uniform(0, 1, n)
        w = r.uniform(0.0, wmax, n)   # includes zero-width (degenerate)
        h = r.uniform(0.0, wmax, n)
        return pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                         "xmin": x, "ymin": y,
                         "xmax": x + w, "ymax": y + h})
    # wmax=0.3 >> cell=0.1 stresses multi-cell duplication + dedup
    for (na, nb, wmax) in [(500, 400, 0.08), (150, 150, 0.3)]:
        A, B = mk(na, 1, wmax), mk(nb, 2, wmax)
        out = rect_join(rd.from_arrow(A), rd.from_arrow(B),
                        cell=0.1).to_pandas()
        ax0, ay0, ax1, ay1 = (A[c].to_numpy()
                              for c in ("xmin", "ymin", "xmax", "ymax"))
        bx0, by0, bx1, by1 = (B[c].to_numpy()
                              for c in ("xmin", "ymin", "xmax", "ymax"))
        m = ((ax0[:, None] <= bx1[None, :]) & (bx0[None, :] <= ax1[:, None])
             & (ay0[:, None] <= by1[None, :])
             & (by0[None, :] <= ay1[:, None]))
        ai, bi = np.nonzero(m)
        want = set(zip(ai.tolist(), bi.tolist()))
        got = list(zip(out["a_id"].tolist(), out["b_id"].tolist()))
        assert len(got) == len(set(got)), "pair reported twice"
        assert set(got) == want
        area = dict(zip(
            zip(ai.tolist(), bi.tolist()),
            (np.minimum(ax1[ai], bx1[bi]) - np.maximum(ax0[ai], bx0[bi]))
            * (np.minimum(ay1[ai], by1[bi]) - np.maximum(ay0[ai], by0[bi]))))
    assert all(area[(r.a_id, r.b_id)] == r.overlap_area
               for _, r in out.iterrows())


def test_rect_join_touching_edges_count(ray_session):
    from parallelspatialquery_ray.stages.join import rect_join
    # rects sharing only an edge / corner — closed-interval semantics, and
    # the shared boundary sits exactly on a cell line (x=0.1)
    A = pa.table({"id": pa.array([0], pa.int64()),
                  "xmin": [0.0], "ymin": [0.0],
                  "xmax": [0.1], "ymax": [0.1]})
    B = pa.table({"id": pa.array([0, 1], pa.int64()),
                  "xmin": [0.1, 0.1], "ymin": [0.0, 0.1],
                  "xmax": [0.2, 0.2], "ymax": [0.1, 0.2]})
    out = rect_join(rd.from_arrow(A), rd.from_arrow(B),
                    cell=0.1).to_pandas().sort_values("b_id")
    assert list(zip(out["a_id"], out["b_id"])) == [(0, 0), (0, 1)]
    assert (out["overlap_area"] == 0.0).all()


def test_rect_join_hot_cell_subgrid(ray_session):
    # A pathological cell (every rect in one grid cell) must route through
    # the W/8 sub-grid recursion and still produce the exact pair set.
    import parallelspatialquery_ray.stages.join as J
    r = np.random.default_rng(4)
    n = 400
    # all inside cell (0,0) of width 0.1; rects small vs sub-cell 0.0125
    x = r.uniform(0.0, 0.09, n)
    y = r.uniform(0.0, 0.09, n)
    w = r.uniform(0.0, 0.004, n)
    h = r.uniform(0.0, 0.004, n)
    A = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "xmin": x, "ymin": y, "xmax": x + w, "ymax": y + h})
    out = J.rect_join(rd.from_arrow(A), rd.from_arrow(A), cell=0.1,
                      pair_budget=50).to_pandas()
    m = ((x[:, None] <= (x + w)[None, :]) & (x[None, :] <= (x + w)[:, None])
         & (y[:, None] <= (y + h)[None, :])
         & (y[None, :] <= (y + h)[:, None]))
    want = set(zip(*[a.tolist() for a in np.nonzero(m)]))
    got = list(zip(out["a_id"].tolist(), out["b_id"].tolist()))
    assert len(got) == len(set(got))
    assert set(got) == want


def test_rect_join_negative_coords(ray_session):
    # keys must stay injective for rects straddling the axes (floor < 0)
    from parallelspatialquery_ray.stages.join import rect_join
    r = np.random.default_rng(6)
    n = 300
    x = r.uniform(-0.5, 0.5, n)
    y = r.uniform(-0.5, 0.5, n)
    w = r.uniform(0, 0.05, n)
    h = r.uniform(0, 0.05, n)
    A = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "xmin": x, "ymin": y, "xmax": x + w, "ymax": y + h})
    out = rect_join(rd.from_arrow(A), rd.from_arrow(A),
                    cell=0.1).to_pandas()
    m = ((x[:, None] <= (x + w)[None, :]) & (x[None, :] <= (x + w)[:, None])
         & (y[:, None] <= (y + h)[None, :])
         & (y[None, :] <= (y + h)[:, None]))
    want = set(zip(*[a.tolist() for a in np.nonzero(m)]))
    got = list(zip(out["a_id"].tolist(), out["b_id"].tolist()))
    assert len(got) == len(set(got))
    assert set(got) == want


def test_st_radius_join_matches_bruteforce(ray_session):
    # 3-D (space x time) join: asymmetric halo means a qualifying pair
    # meets at exactly one (cell, bucket) key — exact set, no duplicates.
    from parallelspatialquery_ray.stages.join import st_radius_join
    def mk(n, seed):
        r = np.random.default_rng(seed)
        return pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "x": r.uniform(0, 1, n), "y": r.uniform(0, 1, n),
            "ts": pa.array(r.integers(1_700_000_000_000_000,
                                      1_700_000_900_000_000, n))})
    A, B = mk(700, 1), mk(600, 2)
    R, TAU = 0.03, 60_000_000
    out = st_radius_join(rd.from_arrow(A), rd.from_arrow(B),
                         radius=R, window_us=TAU).to_pandas()
    ax, ay, at = (A[c].to_numpy() for c in ("x", "y", "ts"))
    bx, by, bt = (B[c].to_numpy() for c in ("x", "y", "ts"))
    d2 = (ax[:, None] - bx[None, :]) ** 2 + (ay[:, None] - by[None, :]) ** 2
    lag = bt[None, :] - at[:, None]
    m = (d2 <= R * R) & (np.abs(lag) <= TAU)
    ai, bi = np.nonzero(m)
    want = set(zip(ai.tolist(), bi.tolist()))
    got = list(zip(out["a_id"].tolist(), out["b_id"].tolist()))
    assert len(got) == len(set(got)), "pair met at more than one key"
    assert set(got) == want
    vals = dict(zip(zip(out["a_id"], out["b_id"]),
                    zip(out["distance_sq"], out["lag_us"])))
    for a, b in list(want)[:50]:
        dd, ll = vals[(a, b)]
        assert dd == (ax[a] - bx[b]) ** 2 + (ay[a] - by[b]) ** 2
        assert ll == bt[b] - at[a]


def test_rect_join_hot_routing_matches_flat(ray_session):
    # Pre-shuffle hot-cell routing (detect -> route hot cells at W/8) must
    # be value-identical to the flat plan, with no duplicate pairs.
    from parallelspatialquery_ray.stages.join import (detect_hot_rect_cells,
                                                      rect_join)
    r = np.random.default_rng(11)
    n_hot, n_bg = 1500, 1200
    x = np.concatenate([r.uniform(0.2, 0.3, n_hot), r.uniform(0, 1, n_bg)])
    y = np.concatenate([r.uniform(0.2, 0.3, n_hot), r.uniform(0, 1, n_bg)])
    w = r.uniform(0, 0.01, n_hot + n_bg)
    h = r.uniform(0, 0.01, n_hot + n_bg)
    A = pa.table({"id": pa.array(np.arange(n_hot + n_bg, dtype=np.int64)),
                  "xmin": x, "ymin": y, "xmax": x + w, "ymax": y + h})
    dsA = rd.from_arrow(A)
    hot = detect_hot_rect_cells(dsA, dsA, 0.1, row_cap=1000)
    assert len(hot) >= 1          # the planted cell is detected
    flat = rect_join(dsA, dsA, cell=0.1).to_pandas()
    routed = rect_join(dsA, dsA, cell=0.1, hot_cells=hot).to_pandas()
    fs = set(zip(flat["a_id"], flat["b_id"]))
    rs = list(zip(routed["a_id"], routed["b_id"]))
    assert len(rs) == len(set(rs))
    assert set(rs) == fs


def test_sorted_join_full_outer(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.join import sorted_join
    l = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]}))
    r = rd.from_pandas(pd.DataFrame({"rk": [2, 3, 4], "rv": [5., 6., 7.]}))
    out = sorted_join(l, r, left_on="k", right_on="rk", how="outer",
                      left_fields={"k": pa.int64(), "lv": pa.int64()},
                      right_fields={"rk": pa.int64(), "rv": pa.float64()}) \
        .to_pandas().sort_values("join_key").reset_index(drop=True)
    assert out["join_key"].tolist() == [1, 2, 3, 4]
    assert out["lv"].tolist()[:3] == [10, 20, 30] and pd.isna(out["lv"][3])
    assert pd.isna(out["rv"][0]) and out["rv"].tolist()[1:] == [5., 6., 7.]


def test_outer_join_physical_encoding_is_plain_numpy(ray_session):
    # Regression (driver hash gate r4, outer_join_users): merge_block's
    # Int64Dtype staging frame must not survive to the consumer — neither
    # as a pandas-block dataset nor resurrected by from_pandas schema
    # METADATA on a later to_pandas().  Values matched the oracle; the
    # physical null encoding (<NA> vs NaN) did not.
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallelspatialquery_ray.stages.join import asof_join, sorted_join
    l = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]}))
    r = rd.from_pandas(pd.DataFrame({"rk": [2, 3, 4], "rv": [5, 6, 7]}))
    out = sorted_join(l, r, left_on="k", right_on="rk", how="outer",
                      left_fields={"k": pa.int64(), "lv": pa.int64()},
                      right_fields={"rk": pa.int64(), "rv": pa.int64()})
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                            batch_size=None))
    assert tbl.schema.metadata is None or \
        b"pandas" not in (tbl.schema.metadata or {}), tbl.schema.metadata
    df = out.to_pandas()
    for c in df.columns:
        assert not pd.api.types.is_extension_array_dtype(df[c].dtype), \
            (c, df[c].dtype)
    # orphan nulls present and encoded as NaN under float64, not <NA>
    assert df["lv"].dtype.kind == "f" and df["lv"].isna().sum() == 1

    left = pd.DataFrame({"user_id": [1, 2], "ts": [10, 5],
                         "event_id": [100, 102]})
    right = pd.DataFrame({"user_id": [1], "ts": [8], "view_id": [7]})
    adf = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="ts", by="user_id").to_pandas()
    for c in adf.columns:
        assert not pd.api.types.is_extension_array_dtype(adf[c].dtype), \
            (c, adf[c].dtype)


def test_gate_flags_extension_dtype_encoding():
    # The local gate must turn red on the exact physical-encoding class
    # the driver's hash catches: pandas Int64Dtype <NA> vs the oracle's
    # float64 NaN, even when every value compares equal.
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from check_contract import compare, physical_encoding_errors
    got = pd.DataFrame({"k": [1, 2], "v": pd.array([5, None],
                                                   dtype="Int64")})
    want = pd.DataFrame({"k": [1, 2], "v": [5.0, float("nan")]})
    assert physical_encoding_errors(got, want)
    assert compare(got, want)          # gate red
    fixed = pd.DataFrame({"k": [1, 2], "v": [5.0, float("nan")]})
    assert not compare(fixed, want)    # gate green on the arrow-clean form


def test_segment_cross_join_matches_bruteforce(ray_session):
    # Cell-partitioned segment-intersection self-join == brute-force
    # proper-crossing scan (int64 orientation signs), exactly-once
    # reporting, different-owner filter, multi-cell spanning segments.
    from parallelspatialquery_ray.stages.join import segment_cross_join
    rng = np.random.default_rng(17)
    n = 400
    ax = rng.integers(0, 1 << 20, n)
    ay = rng.integers(0, 1 << 20, n)
    # lengths up to ~3 cells at cell_q=2^17 stress the explode/dedup path
    bx = ax + rng.integers(-(3 << 17), 3 << 17, n)
    by = ay + rng.integers(-(3 << 17), 3 << 17, n)
    ids = np.arange(n, dtype=np.int64)
    uid = rng.integers(0, 8, n).astype(np.int64)
    t = pa.table({"id": pa.array(ids), "user_id": pa.array(uid),
                  "ax": pa.array(ax), "ay": pa.array(ay),
                  "bx": pa.array(bx), "by": pa.array(by)})
    out = segment_cross_join(rd.from_arrow(t).repartition(5),
                             cell_q=1 << 17).to_pandas()

    def sgn(px, py, qx, qy, rx, ry):
        return np.sign((qx - px) * (ry - py) - (qy - py) * (rx - px))

    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if uid[i] == uid[j]:
                continue
            d1 = sgn(ax[j], ay[j], bx[j], by[j], ax[i], ay[i])
            d2 = sgn(ax[j], ay[j], bx[j], by[j], bx[i], by[i])
            d3 = sgn(ax[i], ay[i], bx[i], by[i], ax[j], ay[j])
            d4 = sgn(ax[i], ay[i], bx[i], by[i], bx[j], by[j])
            if d1 * d2 == -1 and d3 * d4 == -1:
                want.add((i, j))
    got = list(zip(out["a_id"].tolist(), out["b_id"].tolist()))
    assert len(got) == len(set(got)), "pair reported twice"
    assert set(got) == want
    by_pair = dict(zip(got, zip(out["user_a"], out["user_b"])))
    assert all(by_pair[(i, j)] == (uid[i], uid[j]) for (i, j) in want)


def _octagons(pids, scale=1):
    # integer CCW octagon from modular params (the SQL-derivable family)
    cx = (pids * 2654435761 % 1000000).astype(np.int64)
    cy = (pids * 40503 % 1000000).astype(np.int64)
    w = ((pids % 89) + 30) * 256 * scale
    h = ((pids % 97) + 30) * 256 * scale
    c = ((pids % 13) + 4) * 128 * scale
    vx = np.stack([cx - w + c, cx + w - c, cx + w, cx + w,
                   cx + w - c, cx - w + c, cx - w, cx - w], axis=1)
    vy = np.stack([cy - h, cy - h, cy - h + c, cy + h - c,
                   cy + h, cy + h, cy + h - c, cy - h + c], axis=1)
    return vx, vy


def _poly_table(pids, scale=1):
    vx, vy = _octagons(pids, scale)
    cols = {"id": pa.array(pids)}
    for i in range(8):
        cols[f"x{i}"] = pa.array(vx[:, i])
        cols[f"y{i}"] = pa.array(vy[:, i])
    return pa.table(cols)


def _poly_intersects(va, vb):
    # brute-force predicate: closed vertex containment either way or a
    # proper edge crossing (va/vb: (8, 2) CCW int arrays)
    def inside(p, Q):
        Qn = np.roll(Q, -1, axis=0)
        e = Qn - Q
        d = p[None, :] - Q
        return (e[:, 0] * d[:, 1] - e[:, 1] * d[:, 0] >= 0).all()
    if any(inside(p, vb) for p in va) or any(inside(p, va) for p in vb):
        return True
    an, bn = np.roll(va, -1, axis=0), np.roll(vb, -1, axis=0)
    for i in range(8):
        for j in range(8):
            p, pn = va[i], an[i]
            q, qn = vb[j], bn[j]
            def s(o, e, x):
                return np.sign((e[0] - o[0]) * (x[1] - o[1])
                               - (e[1] - o[1]) * (x[0] - o[0]))
            if s(q, qn, p) * s(q, qn, pn) == -1 and \
               s(p, pn, q) * s(p, pn, qn) == -1:
                return True
    return False


def test_convex_poly_join_matches_bruteforce(ray_session):
    from parallelspatialquery_ray.stages.join import convex_poly_join
    pa_ids = np.arange(0, 400, 3, dtype=np.int64)      # family A
    pb_ids = np.arange(1, 400, 3, dtype=np.int64)      # family B
    A = _poly_table(pa_ids, scale=4)                   # big polys: overlaps
    Bt = _poly_table(pb_ids, scale=4)
    out = convex_poly_join(rd.from_arrow(A).repartition(3),
                           rd.from_arrow(Bt).repartition(4),
                           nv=8, cell_q=1 << 17).to_pandas()
    got = set(zip(out["a_id"].tolist(), out["b_id"].tolist()))
    assert len(out) == len(got), "pair reported twice"

    vax, vay = _octagons(pa_ids, 4)
    vbx, vby = _octagons(pb_ids, 4)
    want = set()
    for i, ai in enumerate(pa_ids):
        va = np.stack([vax[i], vay[i]], axis=1)
        for j, bj in enumerate(pb_ids):
            vb = np.stack([vbx[j], vby[j]], axis=1)
            # cheap bbox reject to keep the brute force fast
            if va[:, 0].max() < vb[:, 0].min() or \
               vb[:, 0].max() < va[:, 0].min() or \
               va[:, 1].max() < vb[:, 1].min() or \
               vb[:, 1].max() < va[:, 1].min():
                continue
            if _poly_intersects(va, vb):
                want.add((int(ai), int(bj)))
    assert got == want
    assert len(want) > 20          # the fixture actually exercises overlap


def test_convex_poly_join_budget_path(ray_session):
    # A tiny pair_budget forces every cell through the W/8 sub-grid
    # prefilter; the result must equal the all-pairs path exactly.
    from parallelspatialquery_ray.stages.join import convex_poly_join
    pa_ids = np.arange(0, 300, 3, dtype=np.int64)
    pb_ids = np.arange(1, 300, 3, dtype=np.int64)
    A = rd.from_arrow(_poly_table(pa_ids, scale=4)).repartition(3)
    B = rd.from_arrow(_poly_table(pb_ids, scale=4)).repartition(2)
    flat = convex_poly_join(A, B, nv=8, cell_q=1 << 18).to_pandas()
    tight = convex_poly_join(A, B, nv=8, cell_q=1 << 18,
                             pair_budget=8).to_pandas()
    fs = set(zip(flat["a_id"], flat["b_id"]))
    ts = list(zip(tight["a_id"], tight["b_id"]))
    assert len(fs) > 10
    assert len(ts) == len(set(ts)), "pair reported twice"
    assert set(ts) == fs


def test_segment_cross_join_budget_path(ray_session):
    # Tiny pair_budget -> W/8 sub-grid path; identical pair set.
    from parallelspatialquery_ray.stages.join import segment_cross_join
    rng = np.random.default_rng(19)
    n = 200
    ax = rng.integers(0, 1 << 19, n)
    ay = rng.integers(0, 1 << 19, n)
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "user_id": pa.array(rng.integers(0, 5, n)),
                  "ax": pa.array(ax), "ay": pa.array(ay),
                  "bx": pa.array(ax + rng.integers(-(1 << 17), 1 << 17, n)),
                  "by": pa.array(ay + rng.integers(-(1 << 17), 1 << 17, n))})
    ds = rd.from_arrow(t).repartition(4)
    flat = segment_cross_join(ds, cell_q=1 << 18).to_pandas()
    tight = segment_cross_join(ds, cell_q=1 << 18,
                               pair_budget=16).to_pandas()
    fs = set(zip(flat["a_id"], flat["b_id"]))
    ts = list(zip(tight["a_id"], tight["b_id"]))
    assert len(fs) > 5
    assert len(ts) == len(set(ts))
    assert set(ts) == fs


def test_choose_grid_cell_auto_rect_join(ray_session):
    # cell=None: the planner pre-pass picks a width; results identical to
    # an explicit-cell run, and duplication stays bounded (factor-4 rule).
    from parallelspatialquery_ray.stages.join import (choose_grid_cell,
                                                      rect_join)
    def mk(n, seed, wmax):
        r = np.random.default_rng(seed)
        x, y = r.uniform(0, 1, n), r.uniform(0, 1, n)
        w, h = r.uniform(0, wmax, n), r.uniform(0, wmax, n)
        return pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                         "xmin": x, "ymin": y,
                         "xmax": x + w, "ymax": y + h})
    A = rd.from_arrow(mk(400, 1, 0.06))
    B = rd.from_arrow(mk(300, 2, 0.06))
    cell = choose_grid_cell(A, B)
    # factor 4 x mean extent ~ 4 * 0.03 = 0.12 band (density term smaller)
    assert 0.08 < cell < 0.2
    auto = rect_join(A, B).to_pandas()          # cell=None -> planner
    explicit = rect_join(A, B, cell=0.1).to_pandas()
    assert set(zip(auto["a_id"], auto["b_id"])) == \
        set(zip(explicit["a_id"], explicit["b_id"]))
    # point-like inputs: density term takes over, still positive/finite
    P = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(1000, dtype=np.int64)),
        "xmin": np.random.default_rng(3).uniform(0, 1, 1000),
        "ymin": np.random.default_rng(4).uniform(0, 1, 1000),
        "xmax": np.random.default_rng(3).uniform(0, 1, 1000),
        "ymax": np.random.default_rng(4).uniform(0, 1, 1000)}))
    pc_ = choose_grid_cell(P, P, target_occupancy=64)
    assert 0.05 < pc_ < 0.5


def test_auto_cell_q_segment_and_poly(ray_session):
    # cell_q=None: planner-derived power-of-two width; identical results.
    from parallelspatialquery_ray.stages.join import (convex_poly_join,
                                                      segment_cross_join)
    rng = np.random.default_rng(29)
    n = 150
    ax = rng.integers(0, 1 << 19, n)
    ay = rng.integers(0, 1 << 19, n)
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "user_id": pa.array(rng.integers(0, 4, n)),
                  "ax": pa.array(ax), "ay": pa.array(ay),
                  "bx": pa.array(ax + rng.integers(-(1 << 15), 1 << 15, n)),
                  "by": pa.array(ay + rng.integers(-(1 << 15), 1 << 15, n))})
    ds = rd.from_arrow(t).repartition(3)
    auto = segment_cross_join(ds).to_pandas()
    ref = segment_cross_join(ds, cell_q=1 << 16).to_pandas()
    assert set(zip(auto["a_id"], auto["b_id"])) == \
        set(zip(ref["a_id"], ref["b_id"]))

    pa_ids = np.arange(0, 200, 3, dtype=np.int64)
    pb_ids = np.arange(1, 200, 3, dtype=np.int64)
    A = rd.from_arrow(_poly_table(pa_ids, scale=4))
    B = rd.from_arrow(_poly_table(pb_ids, scale=4))
    auto_p = convex_poly_join(A, B, nv=8).to_pandas()
    ref_p = convex_poly_join(A, B, nv=8, cell_q=1 << 17).to_pandas()
    assert set(zip(auto_p["a_id"], auto_p["b_id"])) == \
        set(zip(ref_p["a_id"], ref_p["b_id"]))


def test_point_segment_join_matches_bruteforce(ray_session):
    # Exact ST_DWithin(point, segment): clamped-projection predicate in
    # pure integers == numpy float reference; exactly-once (point owns
    # one cell); degenerate zero-length segments fall back to endpoints.
    from parallelspatialquery_ray.stages.join import point_segment_join
    rng = np.random.default_rng(37)
    npt, nsg = 400, 120
    px = rng.integers(0, 1 << 16, npt)
    py = rng.integers(0, 1 << 16, npt)
    ax = rng.integers(0, 1 << 16, nsg)
    ay = rng.integers(0, 1 << 16, nsg)
    dx = rng.integers(-2000, 2000, nsg)
    dy = rng.integers(-2000, 2000, nsg)
    dx[:5] = 0
    dy[:5] = 0                      # degenerate point-segments
    P = pa.table({"pid": pa.array(np.arange(npt, dtype=np.int64)),
                  "px": pa.array(px), "py": pa.array(py)})
    S = pa.table({"sid": pa.array(np.arange(nsg, dtype=np.int64)),
                  "ax": pa.array(ax), "ay": pa.array(ay),
                  "bx": pa.array(ax + dx), "by": pa.array(ay + dy)})
    r = 1500
    out = point_segment_join(rd.from_arrow(P).repartition(3),
                             rd.from_arrow(S).repartition(2),
                             radius_q=r, cell_q=1 << 12).to_pandas()
    got = list(zip(out["pid"], out["sid"]))
    assert len(got) == len(set(got)), "pair reported twice"

    want = set()
    for j in range(nsg):
        a = np.array([ax[j], ay[j]], float)
        b = np.array([ax[j] + dx[j], ay[j] + dy[j]], float)
        e = b - a
        l2 = float(e @ e)
        for i in range(npt):
            p = np.array([px[i], py[i]], float)
            if l2 == 0:
                d2 = float((p - a) @ (p - a))
            else:
                t = float((p - a) @ e) / l2
                c = a + min(max(t, 0.0), 1.0) * e
                d2 = float((p - c) @ (p - c))
            if d2 <= r * r:
                want.add((i, j))
    assert set(got) == want and len(want) > 20


def test_point_segment_join_overflow_guard(ray_session):
    # Coordinates past the exact-int64 cross² envelope must raise, not
    # silently return wrong distances.
    import pytest

    from parallelspatialquery_ray.stages.join import point_segment_join
    big = np.int64(1) << 40
    P = pa.table({"pid": pa.array([0], pa.int64()),
                  "px": pa.array([big]), "py": pa.array([big])})
    S = pa.table({"sid": pa.array([0], pa.int64()),
                  "ax": pa.array([big + (1 << 20)]),
                  "ay": pa.array([big]),
                  "bx": pa.array([big + (1 << 21)]),
                  "by": pa.array([big + (1 << 20)])})
    with pytest.raises(Exception, match="envelope"):
        point_segment_join(rd.from_arrow(P), rd.from_arrow(S),
                           radius_q=1 << 20, cell_q=1 << 22).to_pandas()
