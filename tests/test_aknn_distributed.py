"""Distributed all-kNN join vs brute oracle — conformance suite.

Plays the role of the reference's FindDifferences cross-validation
(/root/reference/PlaneSweepParallel/include/AllKnnResult.h:173-227) with the
stronger contract: bit-exact distances AND deterministic neighbor ids under
the (distance_sq, neighbor_id) total order, invariant to partitioning
(resolution, halo margin, skew plan).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from parallelspatialquery_ray.sources import synth
from parallelspatialquery_ray.stages.knn import (
    _id_rank, aknn_broadcast, aknn_join, build_hot_plan)
from parallelspatialquery_ray.stages.sweep import knn_topk_brute


def oracle_frame(q_tbl, t_tbl, k):
    qx, qy = q_tbl["x"].to_numpy(), q_tbl["y"].to_numpy()
    qid = q_tbl["doc_id"].to_numpy(zero_copy_only=False)
    tx, ty = t_tbl["x"].to_numpy(), t_tbl["y"].to_numpy()
    tid = t_tbl["doc_id"].to_numpy(zero_copy_only=False)
    nbr, dist = knn_topk_brute(qx, qy, tx, ty, k, tid_rank=_id_rank(tid))
    pad = nbr.ravel() < 0
    return pd.DataFrame({
        "input_id": np.repeat(qid, k),
        "rank": np.tile(np.arange(k, dtype=np.int32), len(qid)),
        "neighbor_id": np.where(pad, None, tid[np.where(pad, 0, nbr.ravel())]),
        "distance_sq": np.where(pad, np.nan, dist.ravel()),
    }).sort_values(["input_id", "rank"]).reset_index(drop=True)


def assert_result_equal(got_df, want_df):
    got = got_df.sort_values(["input_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want_df)
    assert (got["input_id"].values == want_df["input_id"].values).all()
    gn, wn = got["neighbor_id"].values, want_df["neighbor_id"].values
    gmask, wmask = pd.isna(gn), pd.isna(wn)
    assert np.array_equal(gmask, wmask)
    assert (gn[~gmask] == wn[~wmask]).all()
    gd, wd = got["distance_sq"].values, want_df["distance_sq"].values
    assert np.array_equal(np.nan_to_num(gd, nan=-1), np.nan_to_num(wd, nan=-1))


@pytest.mark.parametrize("family,res,margin", [
    ("uniform", 3, 0.5),
    ("uniform", 5, 0.25),   # aggressive cells -> heavy escalation path
    ("uniform", 4, 1.5),    # margin > 1 cell width -> multi-ring halo routing
    ("clustered", 4, 0.5),
    ("zipf", 4, 0.5),
])
def test_self_join_matches_oracle(family, res, margin):
    tbl = synth.geo_doc_table(1200, seed=11, family=family)
    ds = rd.from_arrow(tbl)
    out = aknn_join(ds, ds, 10, res=res, n_training=1200,
                    halo_margin=margin).to_pandas()
    assert_result_equal(out, oracle_frame(tbl, tbl, 10))


def test_two_distinct_sets():
    q = synth.geo_doc_table(400, seed=21)
    t = synth.geo_doc_table(900, seed=22, id_offset=1_000_000)
    out = aknn_join(rd.from_arrow(q), rd.from_arrow(t), 7, res=3,
                    n_training=900).to_pandas()
    assert_result_equal(out, oracle_frame(q, t, 7))


def test_partitioning_invariance():
    # Same input at three different partitionings -> identical results
    # (the engine's num_cpus/resume invariance contract, SURVEY.md §5).
    tbl = synth.geo_doc_table(800, seed=31, family="clustered")
    ds = rd.from_arrow(tbl)
    frames = []
    for res, margin in [(2, 1.0), (4, 0.5), (6, 0.25)]:
        df = aknn_join(ds, ds, 8, res=res, n_training=800,
                       halo_margin=margin).to_pandas()
        frames.append(df.sort_values(["input_id", "rank"]).reset_index(drop=True))
    for f in frames[1:]:
        assert (f["neighbor_id"].values == frames[0]["neighbor_id"].values).all()
        assert np.array_equal(f["distance_sq"].values,
                              frames[0]["distance_sq"].values)


def test_hot_plan_sub_stripes():
    # Zipf skew with a forced hot-cell split: results unchanged.
    tbl = synth.geo_doc_table(1500, seed=41, family="zipf")
    ds = rd.from_arrow(tbl)
    from parallelspatialquery_ray.functions import grid
    cell = grid.cell_id(tbl["x"].to_numpy(), tbl["y"].to_numpy(), 2)
    cells, counts = np.unique(cell, return_counts=True)
    plan = build_hot_plan(dict(zip(cells.tolist(), counts.tolist())), 2, 10,
                          max_rows_per_group=100)
    assert plan, "fixture should produce at least one hot cell"
    out = aknn_join(ds, ds, 10, res=2, n_training=1500,
                    hot_plan=plan).to_pandas()
    assert_result_equal(out, oracle_frame(tbl, tbl, 10))


def test_fewer_than_k_padded_nulls():
    q = synth.geo_doc_table(60, seed=51)
    t = synth.geo_doc_table(4, seed=52, id_offset=500)
    out = aknn_join(rd.from_arrow(q), rd.from_arrow(t), 10, res=2,
                    n_training=4).to_pandas()
    assert len(out) == 600
    assert_result_equal(out, oracle_frame(q, t, 10))
    assert out[out["rank"] >= 4]["neighbor_id"].isna().all()
    # pad=False drops sentinel rows
    out2 = aknn_join(rd.from_arrow(q), rd.from_arrow(t), 10, res=2,
                     n_training=4, pad=False).to_pandas()
    assert len(out2) == 240 and out2["neighbor_id"].notna().all()


def test_boundary_points_and_ties():
    # Points exactly on cell boundaries incl. 0.0/1.0 plus an exact lattice
    # (FIXTURES.md F3): deterministic ids under ties.
    g = np.arange(9) / 8.0  # includes 0.0 and 1.0, all on res-3 cell edges
    gx, gy = np.meshgrid(g, g)
    x, y = gx.ravel(), gy.ravel()
    n = len(x)
    ids = np.char.add("d", np.char.zfill(np.arange(1, n + 1).astype("U9"), 9))
    tbl = pa.table({"doc_id": pa.array(ids), "x": pa.array(x), "y": pa.array(y)})
    ds = rd.from_arrow(tbl)
    out = aknn_join(ds, ds, 6, res=3, n_training=n).to_pandas()
    assert_result_equal(out, oracle_frame(tbl, tbl, 6))


def test_broadcast_variant_matches():
    q = synth.geo_doc_table(300, seed=61)
    t = synth.geo_doc_table(150, seed=62, id_offset=9000)
    out = aknn_broadcast(rd.from_arrow(q), rd.from_arrow(t), 5).to_pandas()
    assert_result_equal(out, oracle_frame(q, t, 5))


def test_span_sequences_survive_roundtrip(tmp_path):
    # The per-row invariant from the driver input_hint: span sequences ride
    # through an engine pipeline unchanged (kind, text, media_ref, order).
    tbl = synth.geo_doc_table(200, seed=71)
    ds = rd.from_arrow(tbl)
    from parallelspatialquery_ray.functions import grid as g

    def add_cell(b: pa.Table) -> pa.Table:
        c = g.cell_id(b["x"].to_numpy(), b["y"].to_numpy(), 4)
        return b.append_column("cell_id", pa.array(c))

    out_dir = str(tmp_path / "docs")
    ds.map_batches(add_cell, batch_format="pyarrow").write_parquet(out_dir)
    back = rd.read_parquet(out_dir).to_pandas().sort_values("doc_id")
    orig = tbl.to_pandas().sort_values("doc_id")
    assert len(back) == len(orig)
    for a, b in zip(orig["spans"], back["spans"]):
        la = [tuple(s.values()) for s in a]
        lb = [tuple(s.values()) for s in b]
        assert la == lb


def test_auto_skew_detection_matches_oracle():
    # zipf-clustered points with a tiny group budget: auto skew detection
    # must build a plan and keep results exact
    tbl = synth.geo_doc_table(2000, seed=97, family="zipf")
    ds = rd.from_arrow(tbl)
    from parallelspatialquery_ray.stages.knn import detect_hot_cells
    hot = detect_hot_cells(ds, 2, max_rows_per_group=150)
    assert hot, "zipf fixture should trip the skew detector"
    out = aknn_join(ds, ds, 10, res=2, n_training=2000, auto_skew=True,
                    max_rows_per_group=150).to_pandas()
    assert_result_equal(out, oracle_frame(tbl, tbl, 10))


def test_low_res_full_coverage_escalation_not_dropped():
    # Regression: >1000 pending queries at a LOW resolution, where many
    # escalated ub-radii cover the whole grid (rc >= n).  The cell-indexed
    # escalation path generates no demand for those queries; they must be
    # routed through the broadcast sweep, not silently dropped.
    rng = np.random.default_rng(7)
    nq, nt = 1500, 60
    q = pa.table({"doc_id": pa.array(np.arange(nq)),
                  "x": pa.array(rng.random(nq)),
                  "y": pa.array(rng.random(nq))})
    # all training packed in one far corner -> most queries' kth distance
    # is grid-scale -> full-coverage escalation radii
    t = pa.table({"doc_id": pa.array(np.arange(nt) + 100_000),
                  "x": pa.array(0.9 + rng.random(nt) * 0.01),
                  "y": pa.array(0.9 + rng.random(nt) * 0.01)})
    out = aknn_join(rd.from_arrow(q), rd.from_arrow(t), 10, res=1,
                    n_training=nt).to_pandas()
    assert len(out) == nq * 10  # every query present
    assert_result_equal(out, oracle_frame(q, t, 10))


def test_split_by_bucket_spreads_sub_stripes():
    # Regression: bucket hash must use the FULL gkey (cell*256+sub), so
    # sub-stripes of one hot cell spread over bucket tasks instead of
    # re-concentrating in a single task's heap.
    import ray

    from parallelspatialquery_ray.stages.knn import _MAXSUB, _split_by_bucket
    gkey = np.repeat(5 * _MAXSUB + np.arange(16), 10)
    tbl = pa.table({"gkey": pa.array(gkey),
                    "v": pa.array(np.arange(len(gkey)))})
    nb = 8
    parts = ray.get(list(_split_by_bucket.options(
        num_returns=nb).remote(tbl, nb)))
    nonempty = [p for p in parts if p.num_rows]
    assert len(nonempty) > 1, "hot-cell sub-stripes all hashed to one bucket"
    seen = {}
    for i, p in enumerate(parts):  # each gkey still in exactly one bucket
        for g in set(p["gkey"].to_pylist()):
            assert g not in seen
            seen[g] = i
    assert len(seen) == 16


def test_radius_join_matches_brute():
    from parallelspatialquery_ray.stages.knn import radius_join
    tbl = synth.geo_doc_table(800, seed=99, family="clustered")
    ds = rd.from_arrow(tbl)
    r = 0.05
    out = radius_join(ds, ds, r, n_training=800).to_pandas()
    x, y = tbl["x"].to_numpy(), tbl["y"].to_numpy()
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d = dx * dx + dy * dy
    qi, ti = np.nonzero(d <= r * r)
    want = set(zip(ids[qi], ids[ti]))
    got = set(zip(out["input_id"], out["neighbor_id"]))
    assert got == want and len(out) == len(want)


def test_two_level_exchange_matches_flat(monkeypatch):
    # The scale path (driver metadata O(blocks/chunk*sqrt(B) + B)) must
    # produce bit-identical results to the flat exchange.
    from parallelspatialquery_ray.stages import knn as knn_mod
    tbl = synth.geo_doc_table(1500, seed=83, family="clustered")
    ds = rd.from_arrow(tbl)
    want = aknn_join(ds, ds, 10, res=4, n_training=1500,
                     num_partitions=24).to_pandas()
    monkeypatch.setattr(knn_mod, "_EXCHANGE_FLAT_LIMIT", 0)
    monkeypatch.setattr(knn_mod, "_EXCHANGE_CHUNK", 3)
    got = aknn_join(ds, ds, 10, res=4, n_training=1500,
                    num_partitions=24).to_pandas()
    assert_result_equal(got, want)
    assert_result_equal(got, oracle_frame(tbl, tbl, 10))


def test_query_side_skew_split():
    # splitByT parity (reference AllKnnResultStripes.h:317-423): a zipf
    # QUERY set over UNIFORM training must still trip the skew detector
    # (both-side density stats) and produce exact results with bounded
    # group sizes.
    q_tbl = synth.geo_doc_table(2000, seed=13, family="zipf")
    t_tbl = synth.geo_doc_table(1000, seed=14, id_offset=1_000_000,
                                family="uniform")
    q, t = rd.from_arrow(q_tbl), rd.from_arrow(t_tbl)
    from parallelspatialquery_ray.functions import grid
    from parallelspatialquery_ray.stages.knn import detect_hot_cells
    # training alone is uniform -> no hot cells at this budget
    assert not detect_hot_cells(t, 2, max_rows_per_group=400)
    # but the query side is skewed -> the union stats must find them
    stats = t.select_columns(["x", "y"]).union(q.select_columns(["x", "y"]))
    assert detect_hot_cells(stats, 2, max_rows_per_group=400)
    out = aknn_join(q, t, 10, res=2, n_training=1000, auto_skew=True,
                    max_rows_per_group=400).to_pandas()
    assert_result_equal(out, oracle_frame(q_tbl, t_tbl, 10))


def test_rknn_counts_matches_brute(sf_dir):
    # Reverse-kNN in-degree over the flagship self-join equals the
    # neighbor-id histogram of the brute-force oracle result.
    from parallelspatialquery_ray.pipelines.queries import (
        KNN_K, _doc_points, q_rknn_counts)
    pts = _doc_points(sf_dir).to_arrow_refs()
    import ray as _ray
    tbl = pa.concat_tables([_ray.get(r) for r in pts])
    want = oracle_frame(tbl, tbl, KNN_K)
    want_counts = want["neighbor_id"].dropna().astype(np.int64) \
        .value_counts().sort_index()
    got = q_rknn_counts(sf_dir).to_pandas() \
        .sort_values("neighbor_id").reset_index(drop=True)
    assert (got["neighbor_id"].to_numpy() == want_counts.index.to_numpy()).all()
    assert (got["n_rknn"].to_numpy() == want_counts.to_numpy()).all()


def test_splitters_tolerate_schema_less_empty_blocks():
    # Regression (CORRECTNESS_r02 knn_scale_sampled, KeyError: 'gkey'):
    # Ray Data emits SCHEMA-LESS empty blocks when a map task's input
    # block is empty (the batch fn is never called), and those blocks
    # reach the exchange splitters via to_arrow_refs.  Every splitter and
    # the bucket kernel must treat them as contributing nothing.
    import ray

    from parallelspatialquery_ray.stages.knn import (
        _kernel_on_bucket, _make_partition_fn, _split_by_bucket,
        _split_coarse, _split_fine)

    dead = pa.table({})  # the shape Ray hands us: zero rows, zero columns
    live = pa.table({"gkey": pa.array([5 * 256], pa.int64()),
                     "role": pa.array([1], pa.int8()),
                     "pid": pa.array([7], pa.int64()),
                     "px": pa.array([0.5]), "py": pa.array([0.5])})

    parts = ray.get(list(_split_by_bucket.options(
        num_returns=4).remote(dead, 4)))
    assert all(p.num_rows == 0 for p in parts)

    parts = ray.get(list(_split_coarse.options(num_returns=2).remote(
        2, 2, 4, dead, dead)))
    assert all(p.num_rows == 0 for p in parts)

    parts = ray.get(list(_split_fine.options(num_returns=2).remote(
        0, 2, 2, 4, dead, dead)))
    assert all(p.num_rows == 0 for p in parts)

    pf = _make_partition_fn(1, 3, {}, 0.5, pa.int64())
    out = ray.get(_kernel_on_bucket.remote(pf, dead, dead))
    assert out.num_rows == 0
    assert out.column_names == ["input_id", "rank", "neighbor_id",
                                "distance_sq"]
    # mixed dead + live still computes the live rows
    out = ray.get(_kernel_on_bucket.remote(pf, dead, live))
    assert out.num_rows == 0  # training-only cell emits nothing — no crash


def test_aknn_with_empty_query_blocks_end_to_end():
    # End-to-end twin of the driver's knn_scale_sampled failure: a heavily
    # sampled query side leaves most blocks empty, so schema-less blocks
    # flow into the exchange.  Result must still match the brute oracle.
    tbl = synth.geo_doc_table(2000, seed=21, family="uniform")
    pts = rd.from_arrow(tbl).repartition(16)

    def sample(b: pa.Table) -> pa.Table:
        keep = b["x"].to_numpy(zero_copy_only=False) < 0.004
        return b.filter(pa.array(keep))

    q = pts.map_batches(sample, batch_format="pyarrow")
    out = aknn_join(q, pts, 5, res=3, n_training=2000).to_pandas()
    q_tbl = tbl.filter(pa.array(tbl["x"].to_numpy() < 0.004))
    assert 0 < q_tbl.num_rows < 40  # sparse enough to empty most blocks
    assert_result_equal(out, oracle_frame(q_tbl, tbl, 5))


def test_dead_block_warning_filter(caplog):
    # The package installs a filter on Ray Data's streaming-executor logger
    # so the EMPTY-schema RefBundle divergence (sort's dead blocks, handled
    # by design) no longer warns, while genuine schema mismatches still do.
    import logging

    from parallelspatialquery_ray._logfilter import (
        _RAY_DATA_EXECUTOR_LOGGER, _DeadBlockSchemaFilter)

    lg = logging.getLogger(_RAY_DATA_EXECUTOR_LOGGER)
    assert any(isinstance(f, _DeadBlockSchemaFilter) for f in lg.filters)

    flt = _DeadBlockSchemaFilter()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, __file__, 1, msg,
                                 (), None)

    dead = ("Operator produced a RefBundle with a different schema than "
            "the previous one. Previous schema: k: int64\nv: int64, "
            "new schema: . This may lead to unexpected behavior.")
    real = ("Operator produced a RefBundle with a different schema than "
            "the previous one. Previous schema: k: int64, "
            "new schema: k: double. This may lead to unexpected behavior.")
    dead_pd = ("Operator produced a RefBundle with a different schema than "
               "the previous one. Previous schema: PandasBlockSchema("
               "names=['k'], types=[dtype('int64')]), new schema: "
               "PandasBlockSchema(names=[], types=[]). This may lead to "
               "unexpected behavior.")
    assert not flt.filter(rec(dead))
    assert not flt.filter(rec(dead_pd))
    assert flt.filter(rec(real))

    # end-to-end: a sort with more partitions than rows emits dead blocks;
    # with the filter installed nothing reaches the log
    with caplog.at_level(logging.WARNING, logger=_RAY_DATA_EXECUTOR_LOGGER):
        ds = rd.from_items([{"k": i % 3, "v": i}
                            for i in range(6)]).repartition(8)
        ds.sort("k").map_batches(lambda b: b, batch_format="pyarrow",
                                 batch_size=None).count()
    assert not [r for r in caplog.records
                if "different schema" in r.getMessage()]
