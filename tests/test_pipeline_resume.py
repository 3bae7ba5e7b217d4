"""Checkpoint manifest + resume: interrupted runs continue to the exact
same result; completed buckets are not recomputed; reference file formats
round-trip; FindDifferences semantics."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from parallelspatialquery_ray.pipelines.aknn_pipeline import (load_result,
                                                              run_aknn)
from parallelspatialquery_ray.sources import pointfile, synth
from parallelspatialquery_ray.stages.knn import aknn_join


@pytest.fixture(scope="module")
def geo():
    return synth.geo_doc_table(1500, seed=77, family="clustered")


def _run_dirs(tmp_path):
    return str(tmp_path / "full"), str(tmp_path / "resumed")


def test_checkpointed_matches_inline(geo, tmp_path):
    ds = rd.from_arrow(geo)
    out = str(tmp_path / "ck")
    summary = run_aknn(ds, ds, 10, out, res=3, num_partitions=8)
    assert summary["published"] == 9  # 8 buckets + escalation record
    got = load_result(out, sort=True).to_pandas()
    want = aknn_join(ds, ds, 10, res=3, n_training=1500).to_pandas()
    assert len(got) == len(want) == 15000
    assert (got["neighbor_id"].values == want["neighbor_id"].values).all()
    assert np.array_equal(got["distance_sq"].values,
                          want["distance_sq"].values)
    # manifest carries per-partition lineage + metrics
    man = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert all(r["rows_in"] >= 0 and r["seconds"] >= 0 and "uri" in r
               for r in man)


def test_interrupt_and_resume(geo, tmp_path):
    ds = rd.from_arrow(geo)
    full_dir, res_dir = _run_dirs(tmp_path)
    run_aknn(ds, ds, 10, full_dir, res=3, num_partitions=8)
    want = load_result(full_dir, sort=True).to_pandas()

    with pytest.raises(RuntimeError, match="test hook"):
        run_aknn(ds, ds, 10, res_dir, res=3, num_partitions=8,
                 _stop_after_buckets=3)
    man1 = {json.loads(l)["bucket"]
            for l in open(os.path.join(res_dir, "manifest.jsonl"))}
    assert len(man1) >= 3 and -1 not in man1
    stamp = {r: os.path.getmtime(os.path.join(res_dir, "parts",
                                              f"bucket={r}"))
             for r in man1 if r >= 0}

    summary = run_aknn(ds, ds, 10, res_dir, res=3, num_partitions=8)
    assert summary["published"] == 9
    got = load_result(res_dir, sort=True).to_pandas()
    assert (got["neighbor_id"].values == want["neighbor_id"].values).all()
    assert np.array_equal(got["distance_sq"].values,
                          want["distance_sq"].values)
    # published buckets were NOT recomputed (files untouched)
    for b, t in stamp.items():
        assert os.path.getmtime(
            os.path.join(res_dir, "parts", f"bucket={b}")) == t


def test_resume_param_mismatch(geo, tmp_path):
    ds = rd.from_arrow(geo)
    out = str(tmp_path / "mm")
    run_aknn(ds, ds, 5, out, res=3, num_partitions=4)
    with pytest.raises(ValueError, match="mismatch"):
        run_aknn(ds, ds, 7, out, res=3, num_partitions=4)


def test_binary_roundtrip_and_golden_shape(tmp_path):
    # format identical to the reference's checked-in testdata.bin:
    # 8-byte count + n*24-byte records
    x, y = synth.points_uniform(10, seed=1)
    ids = np.arange(1, 11)
    p = str(tmp_path / "pts.bin")
    pointfile.write_points_bin(ids, x, y, p)
    assert os.path.getsize(p) == 8 + 10 * 24
    ds = pointfile.read_points(p)
    df = ds.to_pandas()
    assert df["doc_id"].tolist() == ids.tolist()
    assert np.array_equal(df["x"].values, x)


def test_reference_golden_file():
    # the one data artifact the reference repo ships
    golden = "/root/reference/DatasetGenerator/testdata.bin"
    if not os.path.exists(golden):
        pytest.skip("reference checkout not present")
    df = pointfile.read_points(golden).to_pandas()
    assert len(df) == 10
    assert df["x"].between(0, 1).all() and df["y"].between(0, 1).all()


def test_text_format_roundtrip(tmp_path):
    p = str(tmp_path / "pts.txt")
    with open(p, "w") as f:
        f.write("1 0.5 0.25\n2 0.125 0.75\n\n3 1.0 0.0\n")
    df = pointfile.read_points(p).to_pandas().sort_values("doc_id")
    assert df["doc_id"].tolist() == [1, 2, 3]
    assert df["x"].tolist() == [0.5, 0.125, 1.0]


def test_find_differences_semantics():
    a = pd.DataFrame({"input_id": [1, 1], "rank": [0, 1],
                      "neighbor_id": [7, 8], "distance_sq": [0.1, 0.2]})
    b = a.copy()
    b["neighbor_id"] = [9, 9]  # ids differ -> NOT a difference (ref semantics)
    assert pointfile.find_differences(a, b)["n_diff"] == 0
    c = a.copy()
    c.loc[1, "distance_sq"] += 1e-9
    d = pointfile.find_differences(a, c)
    assert d["n_diff"] == 1 and d["first_ids"] == [1]
    assert pointfile.find_differences(a, c, accuracy=1e-6)["n_diff"] == 0


def test_neighbor_text_sink(tmp_path):
    df = pd.DataFrame({
        "input_id": [1, 1, 2, 2], "rank": [0, 1, 0, 1],
        "neighbor_id": [5, None, 6, 7],
        "distance_sq": [0.25, None, 0.5, 1.0]})
    p = str(tmp_path / "out.txt")
    pointfile.write_neighbor_text(df, p)
    lines = open(p).read().splitlines()
    # descending (heap-pop) order: sentinels/NULL first, then farthest
    assert lines[0] == "1\t(NULL)(5 0.25)"
    assert lines[1] == "2\t(7 1)(6 0.5)"


def test_resume_input_fingerprint_mismatch(geo, tmp_path):
    # Resuming a manifest directory with DIFFERENT input data must refuse
    # rather than mix stale published buckets with fresh ones.
    ds = rd.from_arrow(geo)
    out = str(tmp_path / "fp")
    run_aknn(ds, ds, 5, out, res=3, num_partitions=4)
    other = rd.from_arrow(synth.geo_doc_table(800, seed=5))
    with pytest.raises(ValueError, match="input mismatch"):
        run_aknn(other, other, 5, out, res=3, num_partitions=4)


def test_checkpointed_write_resume_skips_published(ray_session, tmp_path):
    import json
    import os

    import pandas as pd
    import ray.data as rd

    from parallelspatialquery_ray.state.checkpoint import (
        checkpointed_write, read_checkpointed)

    df = pd.DataFrame({"doc_id": range(1000),
                       "v": [i * 7 % 13 for i in range(1000)]})
    out = str(tmp_path / "ckpt")
    recs = checkpointed_write(rd.from_pandas(df).repartition(5), out,
                              key_col="doc_id", num_buckets=8)
    assert len(recs) == 8 and not recs["skipped"].any()
    assert recs["rows_out"].sum() == 1000

    # simulate a crash after 3 published buckets: truncate the manifest
    # to its first 3 lines; delete the now-unpublished dirs (plus leave
    # one orphan dir WITHOUT a manifest line = rename-then-crash window)
    mpath = os.path.join(out, "manifest.jsonl")
    lines = open(mpath).read().strip().split("\n")
    kept = lines[:3]
    kept_buckets = {json.loads(ln)["bucket"] for ln in kept}
    orphan = json.loads(lines[3])["bucket"]
    with open(mpath, "w") as f:
        f.write("\n".join(kept) + "\n")
    import shutil
    for ln in lines[4:]:
        shutil.rmtree(json.loads(ln)["uri"])
    mtimes = {b: os.path.getmtime(os.path.join(out, "parts", f"bucket={b}"))
              for b in kept_buckets}

    recs2 = checkpointed_write(rd.from_pandas(df).repartition(5), out,
                               key_col="doc_id", num_buckets=8)
    assert len(recs2) == 8
    assert set(recs2.loc[recs2["skipped"], "bucket"]) == kept_buckets
    assert not recs2.loc[recs2["bucket"] == orphan, "skipped"].iloc[0]
    for b, m in mtimes.items():   # published parts untouched by resume
        assert os.path.getmtime(
            os.path.join(out, "parts", f"bucket={b}")) == m

    back = read_checkpointed(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_resume_checksum_catches_equal_count_permutation(geo, tmp_path):
    # Same row COUNT but different data (here: coordinates shifted) must
    # be refused by the coordinate checksum, not silently resumed.
    ds = rd.from_arrow(geo)
    out = str(tmp_path / "ck2")
    run_aknn(ds, ds, 5, out, res=3, num_partitions=4)

    import pyarrow as pa

    def shift(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        x = pc.multiply(b["x"], 0.5)
        return b.set_column(b.column_names.index("x"), "x", x)

    other = rd.from_arrow(geo).map_batches(shift, batch_format="pyarrow")
    with pytest.raises(ValueError, match="checksum"):
        run_aknn(other, other, 5, out, res=3, num_partitions=4)


def test_compact_result_encoding(tmp_path):
    # VERDICT r4 item 5: the committed result packs to
    # (uint32, int8, uint32, float32) = 13 B/row when ids fit — the disk
    # lever for the 200M-point external record.  Ranking still happens in
    # float64; only the STORED distance is float32.
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    n = 4000
    import pyarrow as _pa
    ds = rd.from_arrow(_pa.Table.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "x": rng.random(n), "y": rng.random(n)}), preserve_index=False))
    wide, packed = str(tmp_path / "wide"), str(tmp_path / "packed")
    run_aknn(ds, ds, 10, wide, res=3, num_partitions=8)
    run_aknn(ds, ds, 10, packed, res=3, num_partitions=8, compact=True)

    t = pq.read_table(os.path.join(packed, "parts", "bucket=0"))
    import pyarrow as pa
    assert t.schema.field("input_id").type == pa.uint32()
    assert t.schema.field("rank").type == pa.int8()
    assert t.schema.field("neighbor_id").type == pa.uint32()
    assert t.schema.field("distance_sq").type == pa.float32()

    a = load_result(wide, sort=True).to_pandas()
    b = load_result(packed, sort=True).to_pandas()
    # decode restores the wide OUT_COLS schema
    assert [str(d) for d in b.dtypes] == ["int64", "int32", "int64",
                                          "float64"]
    assert np.array_equal(a["input_id"].values, b["input_id"].values)
    assert np.array_equal(a["neighbor_id"].values, b["neighbor_id"].values)
    assert np.array_equal(a["rank"].values, b["rank"].values)
    # stored distances are the float32 rounding of the exact float64
    assert np.array_equal(
        a["distance_sq"].values.astype(np.float32).astype(np.float64),
        b["distance_sq"].values)


def test_compact_resume_and_encoding_mismatch(tmp_path):
    rng = np.random.default_rng(4)
    n = 3000
    import pyarrow as _pa
    ds = rd.from_arrow(_pa.Table.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "x": rng.random(n), "y": rng.random(n)}), preserve_index=False))
    full_dir = str(tmp_path / "cfull")
    res_dir = str(tmp_path / "cres")
    run_aknn(ds, ds, 10, full_dir, res=3, num_partitions=8, compact=True)
    want = load_result(full_dir, sort=True).to_pandas()

    with pytest.raises(RuntimeError, match="test hook"):
        run_aknn(ds, ds, 10, res_dir, res=3, num_partitions=8,
                 compact=True, _stop_after_buckets=3)
    run_aknn(ds, ds, 10, res_dir, res=3, num_partitions=8, compact=True)
    got = load_result(res_dir, sort=True).to_pandas()
    pd.testing.assert_frame_equal(got, want)

    # encoding mismatch on resume is refused (mixed parts are unreadable)
    with pytest.raises(ValueError, match="encoding mismatch"):
        run_aknn(ds, ds, 10, full_dir, res=3, num_partitions=8,
                 compact=False)


def test_wave_execution_matches_single_wave(tmp_path):
    # max_wave_buckets bounds per-exchange spill by running the job as
    # several bounded exchanges; the committed result must be identical
    # to the single-wave run (bucket contents are wave-independent).
    rng = np.random.default_rng(11)
    n = 3000
    import pyarrow as _pa
    ds = rd.from_arrow(_pa.Table.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "x": rng.random(n), "y": rng.random(n)}), preserve_index=False))
    one, waved = str(tmp_path / "one"), str(tmp_path / "waved")
    run_aknn(ds, ds, 10, one, res=3, num_partitions=8)
    s = run_aknn(ds, ds, 10, waved, res=3, num_partitions=8,
                 max_wave_buckets=3)
    assert s["published"] == 9
    a = load_result(one, sort=True).to_pandas()
    b = load_result(waved, sort=True).to_pandas()
    pd.testing.assert_frame_equal(a, b)
