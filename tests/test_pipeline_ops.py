"""Training-data pipeline operators: text analysis, dedup, ANN, windows,
media plumbing — each against an independent (pandas/numpy/duckdb) oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from parallelspatialquery_ray.sources import synth
from parallelspatialquery_ray.stages import ann, dedup, media, text, windows


@pytest.fixture(scope="module")
def docs_ds(sf_dir):
    return rd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def docs_df(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_token_stats_matches_duckdb(docs_ds, docs_df):
    out = docs_ds.map_batches(
        text.TokenStats(), batch_format="pandas").to_pandas()
    con = duckdb.connect()
    con.register("documents", docs_df)
    want = con.sql(text.token_stats_sql()).df()
    got = out.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    for c in ["n_chars", "n_tokens"]:
        assert (got[c].values == want[c].values).all(), c
    for c in ["alpha_ratio", "digit_ratio"]:
        assert np.array_equal(got[c].values, want[c].values), c


def test_quality_and_langid_shapes(docs_ds):
    q = docs_ds.map_batches(text.QualityScore(),
                            batch_format="pandas").to_pandas()
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()
    l = docs_ds.map_batches(text.LangId(), batch_format="pandas").to_pandas()
    assert set(l["pred_lang"]) <= {"en", "de", "fr", "es", "und"}
    assert len(q) == len(l) == docs_ds.count()


def test_fingerprint_deterministic(docs_ds):
    f1 = docs_ds.map_batches(text.Fingerprint(),
                             batch_format="pandas").to_pandas()
    f2 = docs_ds.map_batches(text.Fingerprint(),
                             batch_format="pandas").to_pandas()
    m = f1.merge(f2, on="doc_id")
    assert (m["fingerprint_x"] == m["fingerprint_y"]).all()
    # same text => same fingerprint; different text (usually) different
    assert f1["fingerprint"].nunique() > 1


def _dup_corpus():
    """20 docs: 8 unique, 4 exact-dup pairs (8 docs), 2 near-dup pairs."""
    base = [f"the quick brown fox jumps over the lazy dog number {i} "
            f"padding words making documents long enough for shingles {i}"
            for i in range(8)]
    rows = []
    did = 1
    for t in base:
        rows.append((did, t)); did += 1
    for t in base[:4]:          # exact dups of docs 1-4
        rows.append((did, t)); did += 1
    for t in base[4:6]:         # near dups of docs 5-6 (one word changed)
        rows.append((did, t.replace("lazy", "sleepy"))); did += 1
    rows += [(did, "tiny"), (did + 1, "")]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_dedup_oracle():
    df = _dup_corpus()
    out = dedup.exact_dedup(rd.from_pandas(df)).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql("SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS dup_count "
                   "FROM documents GROUP BY text").df()
    got = set(zip(out["doc_id"].astype(int), out["dup_count"].astype(int)))
    assert got == set(zip(want["doc_id"].astype(int), want["dup_count"].astype(int)))


def test_minhash_lsh_finds_planted_pairs():
    df = _dup_corpus()
    pairs = dedup.ngram_jaccard_pairs(rd.from_pandas(df),
                                      threshold=0.5).to_pandas()
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    # exact dup pairs (jaccard 1.0) must all be found
    for a, b in [(1, 9), (2, 10), (3, 11), (4, 12)]:
        assert (a, b) in got, (a, b)
    # near dups (1 word of ~16 changed) should be found at 0.5
    assert (5, 13) in got and (6, 14) in got
    # all reported pairs really have jaccard >= 0.5 (verified exactly)
    assert (pairs["jaccard"] >= 0.5).all()


def test_simhash_pairs():
    df = _dup_corpus()
    out = dedup.simhash_pairs(rd.from_pandas(df), max_hamming=3).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    for a, b in [(1, 9), (2, 10), (3, 11), (4, 12)]:
        assert (a, b) in got
    ham = dict(zip(zip(out["id_a"].astype(int), out["id_b"].astype(int)),
                   out["hamming"]))
    assert ham[(1, 9)] == 0


def _emb_fixture(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    m = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    return df, m


def test_cosine_topk_exact(sf_dir):
    df, m = _emb_fixture(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qids = df["vec_id"].to_numpy()[:5]
    qm = m[:5]
    out = ann.cosine_topk(ds, qids, qm, 10).to_pandas()
    # numpy oracle
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    sims = qn @ mn.T
    ids = df["vec_id"].to_numpy()
    for qi, qid in enumerate(qids):
        rows = out[out["query_id"] == qid].sort_values("rank")
        order = np.lexsort((ids, -sims[qi]))[:10]
        assert rows["vec_id"].tolist() == ids[order].tolist()
        assert np.allclose(rows["similarity"].values, sims[qi][order],
                           rtol=0, atol=1e-12)


def test_lsh_topk_recall_on_clustered_vectors():
    # LSH only beats brute force when similarity structure exists; random
    # near-orthogonal vectors (like the sf embeddings table) spread top-k
    # uniformly over buckets and recall degenerates to the probed fraction.
    # Clustered fixture: 50 centers x 40 noisy members, query = 10 centers.
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((50, 32))
    members = np.repeat(centers, 40, axis=0) + 0.05 * rng.standard_normal((2000, 32))
    df = pd.DataFrame({"vec_id": np.arange(2000, dtype=np.int64),
                       "embedding": [v.astype(np.float32) for v in members]})
    ds = rd.from_pandas(df)
    qids = np.arange(10, dtype=np.int64)
    qm = centers[:10]
    exact = ann.cosine_topk(ds, qids, qm, 10).to_pandas()
    approx = ann.lsh_cosine_topk(ds, qids, qm, 10, n_bits=10,
                                 probes=10).to_pandas()
    recalls = []
    for qid in qids:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls  # probing ~11/1024 of space


def test_embedding_neardup_finds_self_duplicates(sf_dir):
    df, _ = _emb_fixture(sf_dir)
    dup = df.head(20).copy()
    dup["vec_id"] = dup["vec_id"] + 1_000_000
    both = pd.concat([df.head(100), dup], ignore_index=True)
    out = ann.embedding_neardup_pairs(
        rd.from_pandas(both), threshold=0.999).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    planted = {(int(v), int(v) + 1_000_000) for v in df.head(20)["vec_id"]}
    assert planted <= got
    assert (out["similarity"] >= 0.999).all()


def test_tumbling_window_matches_duckdb(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    out = windows.tumbling_window(ds, width_s=3600).to_pandas()
    con = duckdb.connect()
    con.register("events", pd.read_parquet(f"{sf_dir}/events.parquet"))
    want = con.sql("""
        SELECT user_id, epoch_us(ts) // 3600000000 AS window_id,
               count(*)::BIGINT AS n, sum(value) AS value_sum
        FROM events GROUP BY 1, 2""").df()
    got = out.sort_values(["user_id", "window_id"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "window_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["window_id"].values == want["window_id"].values).all()
    assert (got["n"].values == want["n"].values).all()
    assert np.allclose(got["value_sum"], want["value_sum"], rtol=1e-12)


def test_session_windows_matches_duckdb(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    out = windows.session_windows(ds, gap_s=1800).to_pandas()
    con = duckdb.connect()
    con.register("events", pd.read_parquet(f"{sf_dir}/events.parquet"))
    want = con.sql("""
        WITH t AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                      OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), s AS (
          SELECT user_id, ts_us,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us) - 1 AS session_id
          FROM t
        )
        SELECT user_id, session_id, count(*)::BIGINT AS n_events,
               min(ts_us) AS start_us, max(ts_us) AS end_us
        FROM s GROUP BY 1, 2""").df()
    got = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["user_id", "session_id", "n_events", "start_us", "end_us"]:
        assert (got[c].astype(np.int64).values
                == want[c].astype(np.int64).values).all(), c


def test_fake_decode_sql_parity():
    """The fake decoder's md5-HEX contract: every width/height/n_bytes/
    feature value must be reproducible in DuckDB with md5()/substr()
    (what q_media_features' oracle relies on).  Pure python+duckdb — no
    Ray — so it pins the contract cheaply."""
    refs = [f"ref://image{h}" for h in (7, 123, 99991)] + \
           [f"ref://audio{h}" for h in (5, 4242)]
    con = duckdb.connect()
    for ref in refs:
        w, ht, nb, feats = media.MediaDecode._fake_decode(ref)
        row = con.execute(
            "SELECT 16 + (('0x' || substr(md5(?), 1, 2))::INT % 48),"
            "       16 + (('0x' || substr(md5(?), 3, 2))::INT % 48),"
            "       [(('0x' || substr(md5(md5(?)), 2*i + 1, 2))::INT)"
            "        ::DOUBLE / 255.0 FOR i IN range(8)]",
            [ref, ref, ref]).fetchone()
        assert (w, ht) == (row[0], row[1])
        assert nb == w * ht
        assert list(feats) == row[2]


def test_media_plumbing():
    tbl = synth.geo_doc_table(300, seed=91)
    ds = rd.from_arrow(tbl)
    spans = media.explode_spans(ds).to_pandas()
    # every span survives the explode with order preserved
    total_spans = sum(len(s) for s in tbl["spans"].to_pylist())
    assert len(spans) == total_spans
    feats = media.media_features(ds).to_pandas()
    n_media = (spans["kind"] != "text").sum()
    assert len(feats) == n_media
    assert (feats["width"] >= 16).all()
    assert feats["features"].map(len).eq(media.MEDIA_FEATURE_DIM).all()
    # deterministic: same ref -> same features
    f2 = media.media_features(ds).to_pandas()
    m = feats.merge(f2, on=["doc_id", "media_ref"])
    assert (m["n_bytes_x"] == m["n_bytes_y"]).all()
    # real decoder is an explicit stub
    with pytest.raises(NotImplementedError):
        media.MediaDecode(decoder="real")
    # min_blocks splits a one-block input for decode parallelism without
    # changing the result: compare the FULL frames (every column, sorted
    # on all scalar columns) so repartition-induced corruption anywhere
    # would fail, not just in two spot-checked columns
    f3 = media.media_features(ds, min_blocks=6).to_pandas()
    key = [c for c in feats.columns if c != "features"]
    a = feats.sort_values(key).reset_index(drop=True)
    b = f3.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key])
    assert a["features"].map(tuple).equals(b["features"].map(tuple))
    # min_blocks is a MINIMUM: an input already above it is not coalesced
    big = rd.from_arrow(tbl).repartition(12).materialize()
    f4 = media.media_features(big, min_blocks=6).to_pandas()
    c = f4.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], c[key])


def test_media_resize_and_frame_sample():
    geo = rd.from_arrow(synth.geo_doc_table(100, seed=9))
    feats = media.media_features(geo)
    resized = feats.map_batches(
        media.MediaResize, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs=dict(target=32)).to_pandas()
    assert (np.maximum(resized["resized_w"], resized["resized_h"]) <= 32).all()
    frames = feats.map_batches(
        media.FrameSample, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs=dict(n_frames=3)).to_pandas()
    assert len(frames) == 3 * len(resized)
    assert set(frames["frame_index"]) == {0, 1, 2}
    with pytest.raises(NotImplementedError):
        media.MediaResize(decoder="real")
    with pytest.raises(NotImplementedError):
        media.FrameSample(decoder="real")


def test_embedding_neardup_adversarial_hot_bucket():
    # 10k near-identical vectors that land in ONE LSH bucket and that
    # refinement cannot split: the reducer must stay within cap-sized
    # similarity tiles (no 10k x 10k matrix) and still find planted exact
    # duplicates, without emitting below-threshold pairs.
    rng = np.random.default_rng(17)
    u = rng.standard_normal(32)
    base = u[None, :] + 1e-3 * rng.standard_normal((5000, 32))
    ids = np.arange(5000, dtype=np.int64)
    dup_ids = ids[:20] + 1_000_000
    vecs = np.vstack([base, base[:20]])          # exact dups of first 20
    all_ids = np.concatenate([ids, dup_ids])
    df = pd.DataFrame({"vec_id": all_ids,
                       "embedding": [v.astype(np.float32) for v in vecs]})
    out = ann.embedding_neardup_pairs(
        rd.from_pandas(df), threshold=1.0 - 1e-12,
        bucket_cap=256).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    planted = {(int(v), int(v) + 1_000_000) for v in ids[:20]}
    assert planted <= got
    assert (out["similarity"] >= 1.0 - 1e-12).all()


def test_codecs_roundtrip():
    # Real byte-level codecs: decode(encode(x)) is bit-exact.
    from parallelspatialquery_ray.functions import codecs
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 31, 3), dtype=np.uint8)  # odd width -> row padding
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)
    s = (rng.standard_normal((977, 2)) * 5000).astype(np.int16)
    sr, back = codecs.decode_wav(codecs.encode_wav(s, sample_rate=22050))
    assert sr == 22050 and np.array_equal(back, s)
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"NOPE")
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFxxxxNOPE")


def test_png_codec_all_filters_and_colortypes():
    # Real PNG: chunk walk + CRC + zlib inflate + all 5 scanline filters,
    # for gray / RGB / RGBA — decode(encode(x)) bit-exact under every
    # filter, and gradient images actually compress under Sub/Paeth.
    from parallelspatialquery_ray.functions import codecs
    rng = np.random.default_rng(11)
    for shape in [(9, 14, 3), (7, 7), (4, 6, 4), (1, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for f in range(5):
            data = codecs.encode_png(img, filter_type=f)
            out = codecs.decode_png(data)
            assert out.shape == img.shape and np.array_equal(out, img), \
                (shape, f)
    grad = np.stack([np.tile(np.arange(200, dtype=np.uint8), (40, 1))] * 3,
                    axis=2)
    assert (len(codecs.encode_png(grad, filter_type=1))
            < len(codecs.encode_png(grad, filter_type=0)) / 3)
    # corrupted CRC and non-PNG bytes are rejected
    good = bytearray(codecs.encode_png(grad))
    good[30] ^= 0xFF  # flip a byte inside IHDR body
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(good))
    with pytest.raises(ValueError):
        codecs.decode_png(b"NOPE")
    # decode_image sniffs and normalizes to 3 channels
    gray = rng.integers(0, 256, size=(6, 8), dtype=np.uint8)
    di = codecs.decode_image(codecs.encode_png(gray))
    assert di.shape == (6, 8, 3) and np.array_equal(di[:, :, 1], gray)
    rgba = rng.integers(0, 256, size=(6, 8, 4), dtype=np.uint8)
    di = codecs.decode_image(codecs.encode_png(rgba, filter_type=4))
    assert di.shape == (6, 8, 3) and np.array_equal(di, rgba[:, :, :3])


def test_jpeg_codec_bitstream_matches_reference():
    # Baseline-JPEG entropy layer is exactly invertible: the byte-level
    # decode must equal the byte-FREE mathematical reference
    # (DCT->quant->dequant->IDCT) bit-for-bit, for every size/quality —
    # any Huffman, byte-stuffing or marker bug breaks the equality.
    from parallelspatialquery_ray.functions import codecs
    rng = np.random.default_rng(23)
    for (h, w) in [(8, 8), (16, 24), (13, 21), (1, 1), (40, 33)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for q in (20, 55, 85, 100):
            data = codecs.encode_jpeg(img, q)
            dec = codecs.decode_jpeg(data)
            assert dec.shape == img.shape
            assert np.array_equal(
                dec, codecs.jpeg_reference_pixels(img, q)), (h, w, q)
    # lossy but close on smooth content at high quality
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    smooth = (np.stack([xx, yy, (xx + yy) // 2], axis=2) * 2
              ).clip(0, 255).astype(np.uint8)
    err = np.abs(codecs.decode_jpeg(codecs.encode_jpeg(smooth, 90))
                 .astype(int) - smooth.astype(int)).max()
    assert err <= 4, err
    # decode_image / sniff dispatch on the JPEG magic
    assert codecs.sniff_image_format(codecs.encode_jpeg(smooth)) == "jpeg"
    assert np.array_equal(codecs.decode_image(codecs.encode_jpeg(smooth)),
                          codecs.jpeg_reference_pixels(smooth, 85))
    # progressive (SOF2) and non-JPEG bytes are rejected, not mis-parsed
    prog = bytearray(codecs.encode_jpeg(smooth))
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        codecs.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"NOPE")


def test_media_numpy_decode_pipeline():
    # End-to-end REAL decode: synthetic BMP/WAV store -> broadcast attach ->
    # numpy codec decode in the actor stage; stats match a direct decode.
    from parallelspatialquery_ray.functions import codecs
    geo = synth.geo_doc_table(120, seed=33)
    store = synth.media_store(geo)
    assert len(store) > 0
    out = media.media_features(rd.from_arrow(geo), decoder="numpy",
                               payload_store=store).to_pandas()
    spans = media.explode_spans(rd.from_arrow(geo)).to_pandas()
    n_media = (spans["kind"] != "text").sum()
    assert len(out) == n_media
    payload_of = dict(zip(store["media_ref"].to_pylist(),
                          store["payload"].to_pylist()))
    imgs = out[out["kind"] == "image"]
    fmts = {codecs.sniff_image_format(payload_of[r])
            for r in imgs["media_ref"]}
    assert fmts == {"bmp", "png", "jpeg"}, \
        f"store should mix formats, got {fmts}"
    for _, row in imgs.head(8).iterrows():
        img = codecs.decode_image(payload_of[row["media_ref"]])
        assert (row["height"], row["width"]) == img.shape[:2]
        assert abs(row["features"][0] - img[..., 0].mean() / 255.0) < 1e-12
    arow = out[out["kind"] == "audio"].iloc[0]
    sr, s = codecs.decode_wav(payload_of[arow["media_ref"]])
    assert arow["width"] == len(s) and arow["height"] == s.shape[1]
    # deterministic store: same table regenerated -> same bytes
    store2 = synth.media_store(synth.geo_doc_table(120, seed=33))
    assert store.equals(store2)


def test_media_stats_match_pre_encode_ground_truth():
    # The media-decode oracle: emit="stats" checksums the DECODED raw
    # arrays; synth.media_expected stats the raw arrays BEFORE encoding.
    # Exact multiset equality proves the encode->attach->decode roundtrip.
    geo = synth.geo_doc_table(120, seed=33)
    store = synth.media_store(geo)
    got = media.media_features(rd.from_arrow(geo), decoder="numpy",
                               payload_store=store,
                               emit="stats").to_pandas()
    want = synth.media_expected(geo).to_pandas()
    key = ["doc_id", "span_index"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_media_numpy_resize_real_pixels():
    # REAL nearest-neighbor pixel resize: BMP in -> resized BMP out,
    # bit-exact vs direct index arithmetic.
    from parallelspatialquery_ray.functions import codecs
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 30, 3), dtype=np.uint8)
    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "media_ref": pa.array(["img://1"]),
        "payload": pa.array([codecs.encode_bmp(img)], pa.binary()),
    })
    out = media.MediaResize(target=10, decoder="numpy")(batch)
    assert out["resized_w"][0].as_py() == 10
    assert out["resized_h"][0].as_py() == 4  # floor(12 * 10/30)
    got = codecs.decode_bmp(out["resized_payload"][0].as_py())
    gy = np.minimum(((np.arange(4) + 0.5) * 12 / 4).astype(int), 11)
    gx = np.minimum(((np.arange(10) + 0.5) * 30 / 10).astype(int), 29)
    assert np.array_equal(got, img[gy][:, gx])
    # tall image: height becomes the target side
    img2 = img.transpose(1, 0, 2).copy()
    b2 = pa.table({"doc_id": pa.array(["d2"]),
                   "media_ref": pa.array(["img://2"]),
                   "payload": pa.array([codecs.encode_bmp(img2)],
                                       pa.binary())})
    o2 = media.MediaResize(target=10, decoder="numpy")(b2)
    assert (o2["resized_h"][0].as_py(), o2["resized_w"][0].as_py()) == (10, 4)


def test_media_numpy_frame_sample_real_pcm():
    # REAL PCM segmentation: WAV in -> per-segment offset/len/RMS, exact.
    from parallelspatialquery_ray.functions import codecs
    s = np.arange(10, dtype=np.int16) * 1000  # mono ramp, 10 samples
    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "media_ref": pa.array(["aud://1"]),
        "payload": pa.array([codecs.encode_wav(s, sample_rate=8000)],
                            pa.binary()),
    })
    out = media.FrameSample(n_frames=4, decoder="numpy")(batch)
    assert out["frame_offset"].to_pylist() == [0, 2, 5, 7]
    assert out["frame_len"].to_pylist() == [2, 3, 2, 3]
    x = s.astype(np.float64)[:, None] / 32768.0
    for i, (lo, hi) in enumerate([(0, 2), (2, 5), (5, 7), (7, 10)]):
        want = float(np.sqrt((x[lo:hi] ** 2).mean()))
        assert abs(out["frame_rms"][i].as_py() - want) < 1e-15


def test_sliding_window_matches_duckdb(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    out = windows.sliding_window(ds, width_s=3600, hop_s=900).to_pandas()
    con = duckdb.connect()
    con.register("events", pd.read_parquet(f"{sf_dir}/events.parquet"))
    want = con.sql(windows.sliding_window_sql(3600, 900)).df()
    got = out.sort_values(["user_id", "window_id"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "window_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["user_id", "window_id", "n"]:
        assert (got[c].astype(np.int64).values
                == want[c].astype(np.int64).values).all(), c
    # every event lands in exactly width/hop = 4 windows
    ev_n = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert got["n"].sum() == 4 * ev_n


def test_grouped_topk_and_median(sf_dir):
    from parallelspatialquery_ray.stages.agg import grouped_median, grouped_topk
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source", "doc_id", "n_chars"])
    top = grouped_topk(docs, group_col="lang", order_col="n_chars", k=2,
                       descending=True, tie_col="doc_id").to_pandas()
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for lang, grp in df.groupby("lang"):
        want = grp.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True]).head(2)
        got = top[top["lang"] == lang].sort_values("rank")
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
    med = grouped_median(docs, group_col="source",
                         value_col="n_chars").to_pandas()
    for src, grp in df.groupby("source"):
        row = med[med["source"] == src].iloc[0]
        assert row["median_value"] == np.median(grp["n_chars"])
        assert row["n"] == len(grp)


def test_stratified_sample_matches_duckdb_and_is_partition_invariant(sf_dir):
    from parallelspatialquery_ray.stages.agg import (stratified_sample,
                                                     stratified_sample_sql)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    got = stratified_sample(docs, group_col="source", id_col="doc_id",
                            k=15).to_pandas()
    con = duckdb.connect()
    con.register("documents", pd.read_parquet(f"{sf_dir}/documents.parquet"))
    want = con.sql(stratified_sample_sql(15)).df()
    key = ["source", "rank"]
    g = got.sort_values(key).reset_index(drop=True)[["source", "doc_id",
                                                     "rank"]]
    w = want.sort_values(key).reset_index(drop=True)[["source", "doc_id",
                                                      "rank"]]
    pd.testing.assert_frame_equal(g, w, check_dtype=True)
    # hash order replaces RNG state: a different partitioning must pick the
    # IDENTICAL sample (the reproducibility property the operator exists for)
    got2 = stratified_sample(docs.repartition(7), group_col="source",
                             id_col="doc_id", k=15).to_pandas()
    g2 = got2.sort_values(key).reset_index(drop=True)[["source", "doc_id",
                                                       "rank"]]
    pd.testing.assert_frame_equal(g2, g, check_dtype=True)


def test_ivf_topk_recall_on_clustered_vectors():
    # IVF coarse quantizer on the clustered fixture: k-means centers align
    # with the true clusters, so probing 8/64 lists recovers the exact
    # top-k with high recall.
    rng = np.random.default_rng(4)
    centers = rng.standard_normal((50, 32))
    members = np.repeat(centers, 40, axis=0) \
        + 0.05 * rng.standard_normal((2000, 32))
    df = pd.DataFrame({"vec_id": np.arange(2000, dtype=np.int64),
                       "embedding": [v.astype(np.float32) for v in members]})
    ds = rd.from_pandas(df)
    qids = np.arange(10, dtype=np.int64)
    qm = centers[:10]
    exact = ann.cosine_topk(ds, qids, qm, 10).to_pandas()
    approx = ann.ivf_topk(ds, qids, qm, 10, n_centroids=64,
                          nprobe=8).to_pandas()
    recalls = []
    for qid in qids:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls
    # deterministic: trained twice -> same centroids
    c1 = ann.ivf_train(ds, 16, iters=3)
    c2 = ann.ivf_train(ds, 16, iters=3)
    assert np.array_equal(c1, c2)


def test_simhash_hot_bucket_tiling():
    # A mass-duplicated doc floods one simhash band bucket; the tiled
    # verifier (tiny cap forces multi-tile paths) must emit the exact
    # all-pairs set for the duplicate cluster.
    base = ("the quick brown fox jumps over the lazy dog with plenty of "
            "padding words to make shingles meaningful")
    n_dup = 12
    df = pd.DataFrame({"doc_id": np.arange(n_dup + 3, dtype=np.int64),
                       "text": [base] * n_dup + ["alpha beta gamma delta",
                                                 "epsilon zeta eta theta",
                                                 "completely different words"]})
    out = dedup.simhash_pairs(rd.from_pandas(df), max_hamming=0,
                              bucket_cap=4).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    want = {(a, b) for a in range(n_dup) for b in range(a + 1, n_dup)}
    assert want <= got
    assert (out["hamming"] == 0).all()


def test_distinct_count_exact_and_hll_accuracy(sf_dir):
    from parallelspatialquery_ray.stages.agg import (HllSketch,
                                                     grouped_approx_distinct,
                                                     grouped_distinct_count)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    exact = grouped_distinct_count(ev, group_col="event_type",
                                   value_col="user_id").to_pandas()
    df = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    want = df.groupby("event_type")["user_id"].nunique()
    for _, row in exact.iterrows():
        assert row["n_distinct"] == want[row["event_type"]]
    approx = grouped_approx_distinct(ev, group_col="event_type",
                                     value_col="user_id").to_pandas()
    for _, row in approx.iterrows():
        true = want[row["event_type"]]
        assert abs(row["approx_distinct"] - true) / true < 0.1, row
    # sketch primitives: merge-then-estimate == union cardinality (approx)
    h = HllSketch(12)
    a = h.add_batch(HllSketch.hash_values(np.arange(50_000)))
    b = h.add_batch(HllSketch.hash_values(np.arange(25_000, 75_000)))
    est = h.estimate(HllSketch.merge(a, b))
    assert abs(est - 75_000) / 75_000 < 0.05
    # string hashing path
    s = HllSketch.hash_values(pa.array(["a", "b", "a"]))
    assert s[0] == s[2] and s[0] != s[1]


def test_neardup_clusters_transitive():
    # Chain A~B~C with A!~C must land in ONE cluster (transitive closure),
    # canonical = min id; singletons are their own canonical cluster.
    # Threshold is derived from the fixture's TRUE jaccards so the chain
    # premise (adjacent above, ends below) is asserted, not assumed.
    from parallelspatialquery_ray.stages.dedup import char_shingle_hashes
    w = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
         "kilo lima mike november oscar papa quebec romeo sierra tango").split()
    a = " ".join(w)
    wb = list(w); wb[2] = "replacementone"
    b = " ".join(wb)
    wc = list(wb); wc[12] = "replacementtwo"
    c = " ".join(wc)

    def jac(t1, t2):
        s1 = set(char_shingle_hashes(t1).tolist())
        s2 = set(char_shingle_hashes(t2).tolist())
        return len(s1 & s2) / len(s1 | s2)

    jab, jbc, jac_ = jac(a, b), jac(b, c), jac(a, c)
    thr = (jac_ + min(jab, jbc)) / 2
    assert jac_ < thr < min(jab, jbc)       # fixture premise holds
    df = pd.DataFrame({"doc_id": np.arange(1, 6, dtype=np.int64),
                       "text": [a, b, c, a, "completely different words"]})
    out = dedup.neardup_clusters(rd.from_pandas(df),
                                 threshold=thr).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[1] == cl[2] == cl[3] == cl[4] == 1      # one chain cluster
    assert cl[5] == 5                                  # singleton
    canon = set(out[out["is_canonical"]]["doc_id"])
    assert canon == {1, 5}


def test_word_counts_matches_collections(ray_session):
    import collections
    import re as _re

    import pandas as pd
    import ray.data as rd

    from parallelspatialquery_ray.stages import text as T

    df = pd.DataFrame({"text": [
        "the Quick quick brown-fox", "THE the lazy dog", "", "dog dog dog"]})
    out = T.word_counts(rd.from_pandas(df)).to_pandas() \
        .set_index("word")["n"].to_dict()
    want = collections.Counter(
        w for t in df["text"] for w in _re.findall(r"[A-Za-z0-9_]+", t.lower()))
    assert out == dict(want)


def test_repetition_ratio(ray_session):
    import pandas as pd
    import ray.data as rd

    from parallelspatialquery_ray.stages import text as T

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a a a a", "a b c d", ""]})
    out = rd.from_pandas(df).map_batches(
        T.RepetitionRatio(), batch_format="pandas").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_tokens"].tolist() == [4, 4, 0]
    assert out["n_distinct"].tolist() == [1, 4, 0]
    assert out["dup_ratio"].tolist() == [0.75, 0.0, 0.0]


def test_incremental_dedup_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from parallelspatialquery_ray.stages import dedup as D

    base = pd.DataFrame({"doc_id": [1, 2], "text": ["aa", "bb"]})
    inc = pd.DataFrame({"doc_id": [10, 11, 12, 13, 14],
                        "text": ["aa", "cc", "cc", "dd", "bb"]})
    out = D.incremental_dedup(rd.from_pandas(base), rd.from_pandas(inc)) \
        .to_pandas()
    # "aa"/"bb" exist in base -> dropped; "cc" first at 11; "dd" at 13
    assert sorted(out["doc_id"]) == [11, 13]


def test_funnel_strict_ordering(ray_session):
    import pandas as pd
    import ray.data as rd

    from parallelspatialquery_ray.stages import windows as W

    ev = pd.DataFrame({
        "user_id": [1, 1, 1,  2, 2,  3, 3, 3],
        "ts": pd.to_datetime([10, 20, 30,  40, 35,  50, 52, 55], unit="s"),
        "event_type": ["signup", "view", "purchase",
                       "signup", "view",            # view BEFORE signup
                       "signup", "purchase", "view"],  # purchase before view
    })
    out = W.funnel_counts(rd.from_pandas(ev),
                          ["signup", "view", "purchase"]).to_pandas() \
        .sort_values("stage").reset_index(drop=True)
    # user1 completes all; user2's view precedes signup; user3's purchase
    # precedes the qualifying view
    assert out["n_users"].tolist() == [3, 2, 1]


def test_tfidf_top_terms_matches_duckdb(docs_ds, docs_df):
    from parallelspatialquery_ray.stages.text import (tfidf_top_terms,
                                                      tfidf_top_terms_sql)
    got = tfidf_top_terms(docs_ds.select_columns(["doc_id", "text"]), k=3) \
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs_df)
    want = con.execute(tfidf_top_terms_sql(3)).df() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("doc_id", "rank", "term", "tf", "df"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_bm25_matches_duckdb_and_bruteforce(docs_ds, docs_df):
    import math

    from parallelspatialquery_ray.stages.text import (BM25_QUANT, bm25_sql,
                                                      bm25_topk)
    Q = {0: ("fast", "table"), 1: ("merge", "scan", "query")}
    got = bm25_topk(docs_ds.select_columns(["doc_id", "text"]), Q,
                    top_n=5).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs_df)
    want = con.execute(bm25_sql(Q, 5)).df() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want) == 10
    for c in ("query_id", "rank", "doc_id", "score_q"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    # brute force the winner of query 0 in plain Python
    import re as _re
    toks = {r.doc_id: _re.findall(r"[A-Za-z0-9_]+", r.text.lower())
            for r in docs_df.itertuples()}
    n = len(toks)
    tot = sum(len(t) for t in toks.values())
    df = {w: sum(1 for t in toks.values() if w in t)
          for w in ("fast", "table")}
    best = {}
    for d, t in toks.items():
        s = 0
        for w in ("fast", "table"):
            tf = t.count(w)
            if not tf:
                continue
            idf = (2.0 * (n - df[w]) + 1.0) / (2.0 * df[w] + 1.0)
            satf = (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75
                                             * ((len(t) * n) / tot)))
            s += int(math.floor(idf * satf * BM25_QUANT + 0.5))
        if s:
            best[d] = s
    top = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    g0 = got[got["query_id"] == 0].iloc[0]
    assert (g0["doc_id"], g0["score_q"]) == top


def test_pii_redact_plants_and_scrubs(docs_ds):
    from parallelspatialquery_ray.stages.text import pii_redact, plant_pii
    out = pii_redact(plant_pii(docs_ds.select_columns(["doc_id", "text"]))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ids = out["doc_id"].to_numpy()
    assert (out["n_emails"].to_numpy() == (ids % 7 == 0)).all()
    assert (out["n_phones"].to_numpy() == (ids % 11 == 0)).all()
    assert not out["redacted"].str.contains("@example.com").any()
    assert not out["redacted"].str.contains(r"555-\d{4}", regex=True).any()
    planted = out[ids % 7 == 0]
    assert planted["redacted"].str.startswith("contact <EMAIL> ").all()


def test_traj_length_matches_duckdb(sf_dir):
    from parallelspatialquery_ray.pipelines.queries import (_EV_COORD_CTE,
                                                            q_traj_length)
    from parallelspatialquery_ray.stages.windows import traj_length_sql
    got = q_traj_length(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = con.execute(traj_length_sql(_EV_COORD_CTE)).df() \
        .sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("user_id", "n_steps", "dist_q"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert np.array_equal(got["dist"].to_numpy(), want["dist"].to_numpy())
    # partitioning invariance: quantized sums are order-independent
    got2 = q_traj_length(sf_dir)
    got2 = got2.repartition(5).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert (got2["dist_q"].to_numpy() == got["dist_q"].to_numpy()).all()


def test_grouped_zscore_matches_duckdb(docs_ds, docs_df):
    from parallelspatialquery_ray.stages.agg import (grouped_zscore,
                                                     grouped_zscore_sql)
    got = grouped_zscore(
        docs_ds.select_columns(["doc_id", "source", "n_chars"]),
        group_col="source", value_col="n_chars").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs_df)
    want = con.execute(grouped_zscore_sql(
        "documents", "source", "n_chars",
        "t.doc_id, t.source, t.n_chars")).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(got["z"].to_numpy(), want["z"].to_numpy())
    # per-group z-scores are standardized (population moments)
    for _, grp in got.groupby("source"):
        assert abs(grp["z"].mean()) < 1e-9
        assert abs(grp["z"].std(ddof=0) - 1.0) < 1e-9


def test_contamination_pack_and_planted_overlap(ray_session):
    from parallelspatialquery_ray.stages.dedup import (_pack_shingles_batch,
                                                       benchmark_packs,
                                                       contamination_check)
    # exact bijective packing: distinct shingles of "abcdef" are 2
    idx, packed = _pack_shingles_batch(["abcdef", "", "aaaaa"])
    assert (idx == [0, 0, 2]).sum() == 3 and len(set(packed[:2])) == 2
    # a doc sharing half its shingles with the benchmark is flagged at 1/4
    bench_doc = "the quick brown fox jumps over the lazy dog again"
    clean_doc = "zebra xylophone quartz jigsaw vexing mumble puzzle"
    half_doc = bench_doc[:25] + clean_doc[:25]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": [bench_doc, clean_doc, half_doc]})
    ds = rd.from_arrow(tbl)
    bench = benchmark_packs(
        ds.filter(lambda r: r["doc_id"] == 0))
    out = contamination_check(ds, bench).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "contamination"] == 1.0 and out.loc[0, "contaminated"]
    assert out.loc[1, "n_hit"] == 0 and not out.loc[1, "contaminated"]
    assert 0 < out.loc[2, "contamination"] < 1 and out.loc[2, "contaminated"]


def test_decontaminate_exact_drops_blocklisted(ray_session):
    from parallelspatialquery_ray.stages.dedup import decontaminate_exact
    texts = ["alpha text", "beta text", "alpha text", "gamma text"]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": texts})
    ds = rd.from_arrow(tbl)
    bl = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                 "text": ["alpha text"]}))
    out = decontaminate_exact(ds, bl).to_pandas()
    # both copies of the blocklisted TEXT are dropped, others survive
    assert sorted(out["doc_id"]) == [1, 3]


def test_outlier_filter_bounds(sf_dir):
    from parallelspatialquery_ray.pipelines.queries import q_outlier_filter
    got = q_outlier_filter(sf_dir).to_pandas()
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "source", "n_chars"])
    assert 0 < len(got) < len(raw)
    # every surviving row is inside its group's independent pandas bounds
    for src, grp in raw.groupby("source"):
        import math
        v = np.sort(grp["n_chars"].to_numpy())
        n = len(v)
        lo = v[np.searchsorted(np.arange(1, n + 1),
                               math.ceil(0.10 * n), side="left")]
        hi = v[np.searchsorted(np.arange(1, n + 1),
                               math.ceil(0.90 * n), side="left")]
        sub = got[got["source"] == src]["n_chars"]
        assert sub.between(lo, hi).all()
        # nothing inside the bounds was dropped
        want_n = grp["n_chars"].between(lo, hi).sum()
        assert len(sub) == want_n


def test_minhash_broadcast_and_sharded_paths_agree(monkeypatch):
    """The size-gated broadcast fast path (fused single-task candidates,
    broadcast signature/shingle lookups) and the sharded sorted-join path
    must produce the identical verified pair set."""
    df = _dup_corpus()
    fast = dedup.ngram_jaccard_pairs(rd.from_pandas(df),
                                     threshold=0.5).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_JOIN_BUDGET_BYTES", 0)
    slow = dedup.ngram_jaccard_pairs(rd.from_pandas(df),
                                     threshold=0.5).to_pandas()
    key = ["id_a", "id_b"]
    for f in (fast, slow):      # sorted-join path yields nullable Int64
        f[key] = f[key].astype("int64")
    fast = fast.sort_values(key).reset_index(drop=True)
    slow = slow.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast[key + ["jaccard"]],
                                  slow[key + ["jaccard"]])


def test_pack_sequences_multirange_scan():
    """The two-pass ordered prefix scan must be exact ACROSS coarse
    ranges (driver exclusive scan + within-range cumsum), with ids
    arriving unsorted and sparse (gaps), against a single-process
    reference cumsum."""
    rng = np.random.default_rng(5)
    ids = np.sort(rng.choice(10_000, size=400, replace=False))
    texts = [" ".join(["tok"] * int(n)) for n in rng.integers(0, 40, 400)]
    perm = rng.permutation(400)      # unsorted arrival order
    ds = rd.from_arrow(pa.table({"doc_id": ids[perm],
                                 "text": np.array(texts, object)[perm]}))
    out = (text.pack_sequences(ds, budget=64, range_size=16)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    n = np.array([len(t.split()) for t in texts], dtype=np.int64)
    off = np.cumsum(n) - n
    assert (out["doc_id"].to_numpy() == ids).all()
    assert (out["n_tokens"].to_numpy() == n).all()
    assert (out["token_offset"].to_numpy() == off).all()
    assert (out["seq_first"].to_numpy() == off // 64).all()
    assert (out["seq_last"].to_numpy()
            == np.maximum(off // 64, (off + n - 1) // 64)).all()


def test_split_assign_deterministic_partition_invariant():
    """Split labels depend only on the id — identical across block
    layouts, and fractions near the configured thresholds."""
    ids = pa.table({"doc_id": np.arange(5000, dtype=np.int64)})
    one = text.split_assign(rd.from_arrow(ids)).to_pandas()
    many = text.split_assign(
        rd.from_arrow(ids).repartition(17)).to_pandas()
    m = one.merge(many, on="doc_id", suffixes=("_a", "_b"))
    assert (m["split_a"] == m["split_b"]).all()
    frac = one["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01


def test_bigram_familiarity_matches_duckdb(sf_dir):
    # engine vs SQL twin on real docs PLUS planted edges: an empty doc, a
    # one-token doc (no bigrams), and a mass-duplicated template that must
    # score maximally familiar.
    extra = pd.DataFrame({
        "doc_id": np.arange(10_000, 10_012, dtype=np.int64),
        "text": ["", "word"] + ["the same template text here"] * 10,
    })
    base = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    df = pd.concat([base, extra], ignore_index=True)
    got = text.bigram_familiarity(
        rd.from_pandas(df).repartition(5)).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(text.bigram_familiarity_sql()).df()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)[g.columns]
    pd.testing.assert_frame_equal(g, w, check_dtype=True)
    by_id = g.set_index("doc_id")
    assert by_id.loc[10_000, "n_bigrams"] == 0
    assert by_id.loc[10_001, "n_bigrams"] == 0
    assert by_id.loc[10_002, "n_bigrams"] == 4
    # each of the template's 4 bigrams occurs >= 10 times corpus-wide
    assert by_id.loc[10_002, "familiarity"] >= 4 * 10


def test_skyline_grouped_and_global(ray_session):
    # Distributed skyline == brute-force dominance check, for both the
    # global and the grouped variant, under heavy ties/duplicates and
    # multi-block inputs (local-skyline union must contain the answer).
    from parallelspatialquery_ray.stages.agg import skyline
    rng = np.random.default_rng(9)
    n = 3000
    x = rng.integers(0, 40, n).astype(np.float64)
    y = rng.integers(0, 40, n).astype(np.float64)
    g = rng.integers(0, 5, n)
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "x": x, "y": y, "g": g})
    ds = rd.from_arrow(t).repartition(7)

    def brute(xs, ys):
        keep = []
        for i in range(len(xs)):
            dom = ((xs <= xs[i]) & (ys <= ys[i])
                   & ((xs < xs[i]) | (ys < ys[i]))).any()
            if not dom:
                keep.append(i)
        return set(keep)

    got = set(skyline(ds, x_col="x", y_col="y", id_col="id")
              .to_pandas()["id"])
    assert got == brute(x, y)
    gout = skyline(ds, x_col="x", y_col="y", id_col="id",
                   group_col="g").to_pandas()
    want = set()
    for gv in range(5):
        idx = np.flatnonzero(g == gv)
        want |= {int(idx[i]) for i in brute(x[idx], y[idx])}
    assert set(gout["id"]) == want


def test_geofence_dwell_matches_pandas(ray_session, sf_dir):
    # ordered per-user scan: interval [e_i, e_{i+1}) counts iff e_i inside;
    # pandas oracle recomputes with the identical inside test.
    from parallelspatialquery_ray.pipelines.queries import q_geofence_dwell, GEOFENCE_SEED
    from parallelspatialquery_ray.stages.pip import cross_sign_inside
    got = q_geofence_dwell(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ring = synth.convex_polygons(1, seed=GEOFENCE_SEED)[0]["ring"]
    x, y = synth.derive_points(ev["event_id"].to_numpy())
    ev["t"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev["inside"] = cross_sign_inside(x, y, ring)
    ev = ev.sort_values(["user_id", "t", "event_id"])
    nt = ev.groupby("user_id")["t"].shift(-1)
    ev["contrib"] = np.where(ev["inside"] & nt.notna(),
                             (nt - ev["t"]).fillna(0), 0).astype(np.int64)
    want = ev.groupby("user_id", as_index=False).agg(
        dwell_us=("contrib", "sum"), n_inside=("inside", "sum"))
    want["n_inside"] = want["n_inside"].astype(np.int64)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["dwell_us"].tolist() == want["dwell_us"].tolist()
    assert got["n_inside"].tolist() == want["n_inside"].tolist()
    assert (got["n_inside"] > 0).any() and (got["dwell_us"] > 0).any()


def test_quantile_sketch_bounds_exact_quantile(ray_session, sf_dir):
    # the reported bucket interval must CONTAIN the exact discrete
    # quantile value, with width == (hi-lo)/65536
    from parallelspatialquery_ray.stages.agg import quantile_sketch
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    got = quantile_sketch(rd.from_pandas(ev), value_col="value")
    v = np.sort(ev["value"].to_numpy())
    n = len(v)
    for _, r in got.iterrows():
        target = (n * int(r["quantile"]) + 99) // 100
        exact = v[target - 1]
        assert r["edge_lo"] <= exact <= r["edge_hi"], (exact, dict(r))
        assert abs((r.edge_hi - r.edge_lo) - (v[-1] - v[0]) / 65536) < 1e-12


def test_decontaminate_bloom_equals_exact(ray_session, sf_dir):
    # the Bloom prefilter prunes work but never decides: output must be
    # row-identical to the exact broadcast anti-join, even with a tiny
    # filter (high fp rate forces the verify path to do real work)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def bl_filter(b):
        return b.filter(pa.array(b["doc_id"].to_numpy() % 7 == 0))

    bl = docs.map_batches(bl_filter, batch_format="pyarrow")
    a = dedup.decontaminate_exact(docs, bl).to_pandas()
    for m_bits in (1 << 10, 1 << 23):   # 1 Kbit => fp-heavy; 8 Mbit => clean
        b = dedup.decontaminate_bloom(docs, bl, m_bits=m_bits).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"]), m_bits


def test_dedup_keep_best_picks_highest_quality(ray_session):
    # planted dup group where the longer (higher-quality) copy has the
    # LARGER id: min-id keep would pick the wrong one
    rows = [(1, "short"), (2, "short"),
            (3, "the quick brown fox jumps over the lazy dog and keeps "
                "running through the long meadow for many more words"),
            (4, "the quick brown fox jumps over the lazy dog and keeps "
                "running through the long meadow for many more words")]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = dedup.dedup_keep_best(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 3]       # ties -> min id
    assert out["dup_count"].tolist() == [2, 2]
    assert out["quality"][1] > out["quality"][0]


def test_ttr_and_window_anomaly(ray_session, sf_dir):
    from parallelspatialquery_ray.stages.text import TypeTokenRatio
    out = TypeTokenRatio()(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b c", "x x x", ""]}))
    assert out["n_tokens"].tolist() == [5, 3, 0]
    assert out["n_distinct"].tolist() == [3, 1, 0]
    assert out["ttr"].tolist() == [3 / 5, 1 / 3, 0.0]
    # anomaly: a user with one huge window gets the max z among their rows
    from parallelspatialquery_ray.pipelines.queries import q_window_anomaly
    z = q_window_anomaly(sf_dir).to_pandas()
    g = z[z["user_id"] == z["user_id"].iloc[0]]
    assert np.isfinite(g["z"]).all() or len(g) == 1
    assert g.loc[g["n"].idxmax(), "z"] == g["z"].max()


def test_heavy_hitters_exact_across_block_boundaries(ray_session):
    # words split adversarially across many tiny blocks: a word that is
    # never a LOCAL heavy hitter in some batches must still be found
    # (pigeonhole superset), and a word just under the bar must not.
    import ray.data as rd
    from parallelspatialquery_ray.stages.text import heavy_hitters
    # 100 docs of filler (distinct rare words) + "hot" appearing 26 times
    # out of 126+26... construct: total tokens 252, k=9 -> bar 28 tokens
    docs = [f"w{i}a w{i}b hot" for i in range(50)] \
        + [f"u{i}a u{i}b cold" for i in range(34)]
    # hot: 50, cold: 34, total = 252; k=9: >28 -> hot yes, cold no... bar
    # 252/9 = 28 -> hot(50) in, cold(34) in too; use k=6: >42 -> only hot
    ds = rd.from_items([{"text": t} for t in docs]).repartition(21)
    out = heavy_hitters(ds, k=6)
    assert out["word"].tolist() == ["hot"]
    assert out["n"].tolist() == [50]
    # k=9 admits both
    out2 = heavy_hitters(ds, k=9)
    assert out2["word"].tolist() == ["cold", "hot"]
    assert out2["n"].tolist() == [34, 50]


def test_rollup_counts_levels_sum(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.agg import rollup_counts
    df = pd.DataFrame({
        "source": ["a", "a", "b", "b", "b"],
        "lang": ["en", "de", "en", "en", "fr"],
        "n_chars": [10, 20, 30, 40, 50]})
    out = rollup_counts(rd.from_pandas(df).repartition(3),
                        cols=("source", "lang"), value_col="n_chars") \
        .to_pandas().sort_values(["source", "lang"]).reset_index(drop=True)
    total = out[(out.source == "(all)") & (out.lang == "(all)")]
    assert total["n"].tolist() == [5] and total["s"].tolist() == [150]
    a = out[(out.source == "a") & (out.lang == "(all)")]
    assert a["n"].tolist() == [2] and a["s"].tolist() == [30]
    ben = out[(out.source == "b") & (out.lang == "en")]
    assert ben["n"].tolist() == [2] and ben["s"].tolist() == [70]
    assert len(out) == 1 + 2 + 4          # grand + 2 sources + 4 pairs


def test_pivot_counts_domain_and_other(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.agg import pivot_counts
    df = pd.DataFrame({"h": [0, 0, 1, 1, 1],
                       "t": ["x", "y", "x", "z", "z"]})
    out = pivot_counts(rd.from_pandas(df).repartition(2), row_col="h",
                       pivot_col="t", domain=("x", "y")).to_pandas() \
        .sort_values("h").reset_index(drop=True)
    assert out["n_x"].tolist() == [1, 1]
    assert out["n_y"].tolist() == [1, 0]
    assert out["n_other"].tolist() == [0, 2]      # 'z' outside the domain


def test_global_cume_dist_ties_and_blocks(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.agg import global_cume_dist
    df = pd.DataFrame({"doc_id": range(8),
                       "v": [5, 5, 1, 9, 5, 1, 9, 9]})
    out = global_cume_dist(rd.from_pandas(df).repartition(4),
                           value_col="v", keep_cols=("doc_id",)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # cume_dist: v=1 -> 2/8, v=5 -> 5/8, v=9 -> 8/8; ties share a value
    want = {1: 2 / 8, 5: 5 / 8, 9: 1.0}
    assert all(out.loc[i, "cd"] == want[out.loc[i, "v"]] for i in range(8))


def test_set_overlap_bitmask_or_across_blocks(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.agg import set_overlap
    # user 1 sees a in one block and b in another -> OR must merge;
    # user 2 sees only a; user 3 sees a, b, c
    df = pd.DataFrame({
        "u": [1, 1, 2, 3, 3, 3, 1],
        "t": ["a", "b", "a", "a", "b", "c", "a"]})
    out = set_overlap(rd.from_pandas(df).repartition(4), key_col="u",
                      set_col="t", domain=("c", "a", "b"))  # unsorted dom
    got = {(r.type_a, r.type_b): r.n_users for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_gap_fill_emits_zero_windows(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.windows import gap_fill
    ts = pd.to_datetime([0, 3 * 3600 * 10**6, 3600 * 10**6], unit="us")
    df = pd.DataFrame({"user_id": [7, 7, 9], "ts": ts,
                       "value": [1.0, 1.0, 1.0]})
    out = gap_fill(rd.from_pandas(df).repartition(2), width_s=3600) \
        .to_pandas().sort_values(["user_id", "window_id"]) \
        .reset_index(drop=True)
    # user 7: hours 0..3 -> [1, 0, 0, 1]; user 9: single hour 1 -> [1]
    assert out[out.user_id == 7]["n"].tolist() == [1, 0, 0, 1]
    assert out[out.user_id == 9]["n"].tolist() == [1]
    assert out[out.user_id == 7]["window_id"].tolist() == [0, 1, 2, 3]


def test_fuzzy_decontaminate_catches_near_duplicates(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.dedup import fuzzy_decontaminate
    base = "the quick brown fox jumps over the lazy dog " * 4
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base,                       # exact copy of bench doc
                 base[:-6] + "cat...",       # near-dup (small edit)
                 "completely different content about databases " * 4]})
    bench = pd.DataFrame({"doc_id": [100], "text": [base]})
    out = fuzzy_decontaminate(
        rd.from_pandas(corpus).repartition(2), rd.from_pandas(bench),
        threshold=0.8).to_pandas()
    assert sorted(out["doc_id"]) == [3]      # 1 exact, 2 fuzzy: dropped
    # broadcast_limit=0 forces the distributed anti-join path; same result
    # and same schema (the join marker column must not leak)
    out2 = fuzzy_decontaminate(
        rd.from_pandas(corpus).repartition(2), rd.from_pandas(bench),
        threshold=0.8, broadcast_limit=0).to_pandas()
    assert sorted(out2["doc_id"]) == [3]
    assert sorted(out2.columns) == sorted(out.columns)


def test_rolling_features_frame_semantics(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.windows import rolling_features
    us = 3600 * 10**6
    ts = pd.to_datetime([0, 0, 3 * us, 1 * us], unit="us")
    df = pd.DataFrame({"user_id": [7, 7, 7, 9], "ts": ts,
                       "value": [1.0] * 4})
    out = rolling_features(rd.from_pandas(df).repartition(2),
                           width_s=3600).to_pandas() \
        .sort_values(["user_id", "window_id"]).reset_index(drop=True)
    u7 = out[out.user_id == 7]
    # dense n: [2, 0, 0, 1]; lag1: [0, 2, 0, 0]; roll3: [2, 2, 2, 1]
    assert u7["n"].tolist() == [2, 0, 0, 1]
    assert u7["lag1"].tolist() == [0, 2, 0, 0]
    assert u7["roll3"].tolist() == [2, 2, 2, 1]
    u9 = out[out.user_id == 9]      # single window: lag/roll trivial
    assert u9["lag1"].tolist() == [0] and u9["roll3"].tolist() == [1]


def test_hash_sample_k_deterministic_and_partition_invariant(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.functions.hashing import splitmix64
    from parallelspatialquery_ray.stages.agg import hash_sample_k
    df = pd.DataFrame({"pk": np.arange(1000, dtype=np.int64),
                       "payload": np.arange(1000) * 3})
    a = hash_sample_k(rd.from_pandas(df).repartition(2), k=25,
                      key_col="pk").to_pandas()
    b = hash_sample_k(rd.from_pandas(df).repartition(13), k=25,
                      key_col="pk").to_pandas()
    # exactly k, identical across partitionings, equals the global
    # hash-order ground truth
    want = set(np.argsort(splitmix64(np.arange(1000, dtype=np.uint64)),
                          kind="stable")[:25])
    assert len(a) == len(b) == 25
    assert set(a["pk"]) == set(b["pk"]) == want
    assert (a.sort_values("pk")["payload"].to_numpy()
            == b.sort_values("pk")["payload"].to_numpy()).all()


def test_rollup_cube_mode_all_subsets(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.agg import rollup_counts
    df = pd.DataFrame({"source": ["a", "a", "b"],
                       "lang": ["en", "de", "en"],
                       "n_chars": [1, 2, 4]})
    out = rollup_counts(rd.from_pandas(df).repartition(2),
                        cols=("source", "lang"), value_col="n_chars",
                        mode="cube").to_pandas()
    # cube adds the (lang)-only grouping that rollup lacks
    lang_only = out[(out.source == "(all)") & (out.lang != "(all)")] \
        .set_index("lang")
    assert lang_only.loc["en", "n"] == 2 and lang_only.loc["en", "s"] == 5
    assert lang_only.loc["de", "n"] == 1 and lang_only.loc["de", "s"] == 2
    assert len(out) == 3 + 2 + 2 + 1      # pairs + sources + langs + total


def test_spearman_rho_exact_with_ties(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.agg import spearman_rho
    # perfect monotone -> rho 1; anti-monotone -> rho -1; ties handled
    df = pd.DataFrame({"x": [1, 2, 3, 4], "y": [10, 20, 30, 40]})
    out = spearman_rho(rd.from_pandas(df).repartition(2),
                       x_col="x", y_col="y")
    assert out["rho"].iloc[0] == 1.0 and out["sum_d2h"].iloc[0] == 0
    df2 = pd.DataFrame({"x": [1, 2, 3, 4], "y": [40, 30, 20, 10]})
    out2 = spearman_rho(rd.from_pandas(df2), x_col="x", y_col="y")
    assert out2["rho"].iloc[0] == -1.0
    # ties: x=[1,1,2], half-ranks rx=[3,3,6]; y=[5,7,7] -> ry=[2,5,5]
    df3 = pd.DataFrame({"x": [1, 1, 2], "y": [5, 7, 7]})
    out3 = spearman_rho(rd.from_pandas(df3).repartition(3),
                        x_col="x", y_col="y")
    assert out3["sum_d2h"].iloc[0] == 1 + 4 + 1
    assert out3["rho"].iloc[0] == 1.0 - 1.5 * 6 / (3 * 8)


def test_transition_counts_order_and_block_boundaries(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.windows import transition_counts
    us = 10**6
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([3 * us, 1 * us, 2 * us, 5 * us, 5 * us],
                             unit="us"),
        "event_type": ["c", "a", "b", "x", "y"],
        "event_id": [30, 10, 20, 51, 50]})   # user 2: tie -> id order y,x
    out = transition_counts(rd.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values(["t_from", "t_to"]).reset_index(drop=True)
    got = {(r.t_from, r.t_to): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("y", "x"): 1}


def test_sentence_stats_edge_cases(ray_session):
    from parallelspatialquery_ray.stages.text import SentenceStats
    out = SentenceStats()(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["One. Two! Three?", "...", "", "no terminator here"]}))
    assert out["n_sentences"].tolist() == [3, 0, 0, 1]
    assert out["n_terms"].tolist() == [3, 3, 0, 0]
    assert out["avg_sentence_chars"].tolist() == [16 / 3, 0.0, 0.0, 18.0]


def test_gram_matrix_partition_invariant_exact(ray_session):
    import ray.data as rd
    from parallelspatialquery_ray.stages.ann import gram_matrix
    rng = np.random.default_rng(3)
    v = rng.normal(size=(40, 4)).astype(np.float32)
    tbl = pd.DataFrame({"embedding": [row for row in v]})
    a = gram_matrix(rd.from_pandas(tbl).repartition(7),
                    vec_col="embedding").to_pandas()
    b = gram_matrix(rd.from_pandas(tbl).repartition(2),
                    vec_col="embedding").to_pandas()
    q = np.floor(v.astype(np.float64) * (1 << 20)).astype(np.int64)
    g = q.T @ q
    iu, ju = np.triu_indices(4)
    assert (a["s"].to_numpy() == g[iu, ju]).all()
    assert (a["s"].to_numpy() == b["s"].to_numpy()).all()
    assert len(a) == 10


def test_convex_hull_matches_bruteforce(ray_session):
    # Distributed hull boundary == quadratic closed-halfplane definition:
    # p is on the boundary iff exists q != p with every r on one closed
    # side of line pq.  Includes edge-collinear points and duplicates.
    from parallelspatialquery_ray.stages.agg import convex_hull
    rng = np.random.default_rng(23)
    pts = rng.integers(-50, 50, (600, 2)).astype(np.int64)
    # plant collinear boundary points on the bounding-box top edge
    extra = np.stack([np.arange(-50, 51, 10, dtype=np.int64),
                      np.full(11, 60, dtype=np.int64)], axis=1)
    pts = np.concatenate([pts, extra, extra[:3]])      # + duplicates
    ds = rd.from_arrow(pa.table({"hx": pa.array(pts[:, 0]),
                                 "hy": pa.array(pts[:, 1])})).repartition(7)
    out = convex_hull(ds, x_col="hx", y_col="hy").to_pandas()
    got = set(zip(out["hx"].tolist(), out["hy"].tolist()))
    assert len(out) == len(got), "duplicate boundary point"

    U = np.unique(pts, axis=0)
    want = set()
    for i in range(len(U)):
        for j in range(len(U)):
            if i == j:
                continue
            cr = ((U[j, 0] - U[i, 0]) * (U[:, 1] - U[i, 1])
                  - (U[j, 1] - U[i, 1]) * (U[:, 0] - U[i, 0]))
            if (cr >= 0).all() or (cr <= 0).all():
                want.add((int(U[i, 0]), int(U[i, 1])))
                break
    assert got == want
    assert all((x, 60) in got for x in range(-50, 51, 10))


def test_convex_hull_degenerate(ray_session):
    # All-collinear input: every distinct point is on the boundary.
    # Single-point input: no witness partner -> empty (matches SQL twin).
    from parallelspatialquery_ray.stages.agg import convex_hull
    xs = np.arange(0, 30, dtype=np.int64)
    t = pa.table({"hx": pa.array(xs), "hy": pa.array(xs * 3)})
    out = convex_hull(rd.from_arrow(t).repartition(4), x_col="hx",
                      y_col="hy").to_pandas()
    assert set(zip(out["hx"], out["hy"])) == {(int(x), int(3 * x))
                                              for x in xs}
    one = pa.table({"hx": pa.array([5], type=pa.int64()),
                    "hy": pa.array([7], type=pa.int64())})
    assert convex_hull(rd.from_arrow(one), x_col="hx",
                       y_col="hy").count() == 0


def test_hull_diameter_ties_and_bruteforce(ray_session):
    # Diameter == brute-force max over all pairs; tie pair canonicalized
    # to the lexicographically smallest ordered tuple.
    from parallelspatialquery_ray.stages.agg import hull_diameter
    rng = np.random.default_rng(41)
    pts = rng.integers(-100, 100, (500, 2)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"hx": pa.array(pts[:, 0]),
                                 "hy": pa.array(pts[:, 1])})).repartition(6)
    out = hull_diameter(ds, x_col="hx", y_col="hy").to_pandas()
    D = ((pts[:, 0][:, None] - pts[:, 0]) ** 2
         + (pts[:, 1][:, None] - pts[:, 1]) ** 2)
    assert out["d2"][0] == D.max()
    ii, jj = np.nonzero(D == D.max())
    cands = set()
    for i, j in zip(ii, jj):
        a, b = tuple(pts[i]), tuple(pts[j])
        if a < b:
            cands.add((a[0], a[1], b[0], b[1]))
    assert tuple(out.iloc[0][["ax", "ay", "bx", "by"]]) == min(cands)

    # exact tie: square corners -> two diagonals, canonical pick
    sq = pa.table({"hx": pa.array([0, 0, 9, 9, 4], type=pa.int64()),
                   "hy": pa.array([0, 9, 0, 9, 4], type=pa.int64())})
    o2 = hull_diameter(rd.from_arrow(sq), x_col="hx", y_col="hy") \
        .to_pandas()
    assert tuple(o2.iloc[0]) == (0, 0, 9, 9, 162)


def test_dot_topk_pairs_matches_bruteforce(ray_session):
    # Triangle block-pair fan-out == brute-force all-pairs quantized dot,
    # including tie order and exactly-once pairing across bucket groups.
    from parallelspatialquery_ray.stages import ann
    rng = np.random.default_rng(3)
    n, d = 120, 16
    v = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    v[7] = v[31]            # planted duplicate -> top pair + exact tie
    v[55] = v[31]
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(v.astype(np.float64)))})
    for nb in (1, 3, 8):
        out = ann.dot_topk_pairs(rd.from_arrow(t).repartition(4),
                                 top_n=15, n_buckets=nb).to_pandas()
        q = np.floor(v.astype(np.float64) * float(1 << 20)).astype(np.int64)
        D = q @ q.T
        ii, jj = np.triu_indices(n, k=1)
        order = np.lexsort((jj, ii, -D[ii, jj]))[:15]
        want = list(zip(ii[order], jj[order], D[ii, jj][order]))
        got = list(zip(out["a_id"], out["b_id"], out["dot_q"]))
        assert got == want, f"n_buckets={nb}"


def test_convex_hull_grouped(ray_session):
    # Per-group hulls == per-group brute-force boundary; singleton group
    # yields nothing (no witness partner), two-point group yields both.
    from parallelspatialquery_ray.stages.agg import convex_hull
    rng = np.random.default_rng(47)
    pts = rng.integers(0, 100, (400, 2)).astype(np.int64)
    g = (pts[:, 0] // 50) * 2 + pts[:, 1] // 50        # 4 quadrant groups
    t = pa.table({"g": pa.array(np.concatenate([g, [7, 8, 8]])),
                  "hx": pa.array(np.concatenate([pts[:, 0], [5, 1, 9]])),
                  "hy": pa.array(np.concatenate([pts[:, 1], [5, 1, 9]]))})
    out = convex_hull(rd.from_arrow(t).repartition(6), x_col="hx",
                      y_col="hy", group_col="g").to_pandas()
    got = {gv: set(zip(gg["hx"], gg["hy"]))
           for gv, gg in out.groupby("g")}
    assert 7 not in got                        # singleton group: empty
    assert got[8] == {(1, 1), (9, 9)}          # two points: both

    def brute(P):
        U = np.unique(P, axis=0)
        keep = set()
        for i in range(len(U)):
            for j in range(len(U)):
                if i == j:
                    continue
                cr = ((U[j, 0] - U[i, 0]) * (U[:, 1] - U[i, 1])
                      - (U[j, 1] - U[i, 1]) * (U[:, 0] - U[i, 0]))
                if (cr >= 0).all() or (cr <= 0).all():
                    keep.add((int(U[i, 0]), int(U[i, 1])))
                    break
        return keep

    for gv in range(4):
        assert got[gv] == brute(pts[g == gv]), gv


def test_chunk_texts_semantics(ray_session):
    # ceil(L/stride) chunks, overlap = width - stride, short tail, empty
    # doc yields none; reassembling stride-prefixes restores the text.
    from parallelspatialquery_ray.stages.text import chunk_texts
    texts = ["a" * 500, "xyz", "", "b" * 192, "c" * 193,
             "".join(chr(97 + i % 26) for i in range(1000))]
    t = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                  "text": pa.array(texts)})
    out = chunk_texts(rd.from_arrow(t).repartition(3),
                      width=256, stride=192).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    import math
    for i, s in enumerate(texts):
        rows = out[out["doc_id"] == i]
        want_n = math.ceil(len(s) / 192) if s else 0
        assert len(rows) == want_n, (i, len(rows))
        for _, r in rows.iterrows():
            st = int(r["chunk_idx"]) * 192
            assert r["chunk"] == s[st:st + 256]
            assert r["chunk_len"] == len(s[st:st + 256])
        # overlapping windows reassemble the original text
        if want_n:
            rebuilt = "".join(
                (r["chunk"][:192] if j < want_n - 1 else r["chunk"])
                for j, (_, r) in enumerate(rows.iterrows()))
            assert rebuilt == s


def test_cell_runs_semantics(ray_session):
    # Hand-built trajectory: runs collapse, per-user ordinals restart,
    # ties within a timestamp break by event id, single events = runs.
    import pandas as pd
    from parallelspatialquery_ray.stages.windows import cell_runs
    ts = pd.to_datetime([1, 2, 3, 4, 1, 1, 2],
                        unit="s").astype("datetime64[us]")
    # cells via x: 0.0->cell col 0, 0.9->col 7 at grid_n=8 (y fixed 0)
    t = pa.table({
        "event_id": pa.array(np.arange(7, dtype=np.int64)),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], type=pa.int64()),
        "ts": pa.array(ts),
        "x": pa.array([0.05, 0.06, 0.9, 0.91, 0.5, 0.5, 0.05]),
        "y": pa.array([0.0] * 7)})
    out = cell_runs(rd.from_arrow(t).repartition(3), grid_n=8) \
        .to_pandas().sort_values(["user_id", "run_idx"]) \
        .reset_index(drop=True)
    # user 1: run0 = 2 events in col0, run1 = 2 events in col7
    # user 2: ties at ts=1 order by event_id (4 then 5, same cell) ->
    #         run0 = 2 events col4, run1 = 1 event col0
    assert out[["user_id", "run_idx", "n_events"]].values.tolist() == \
        [[1, 0, 2], [1, 1, 2], [2, 0, 2], [2, 1, 1]]
    assert out["cell"].tolist() == [0, 56, 32, 0]
    r0 = out.iloc[0]
    assert r0["t_start"] == ts[0] and r0["t_end"] == ts[1]


def test_balanced_shards_exact_and_balanced(ray_session):
    # Shard audit == brute-force (size DESC, id) round-robin deal; the
    # deal keeps shard size-sums within one max item of each other.
    from parallelspatialquery_ray.stages.agg import balanced_shards
    rng = np.random.default_rng(5)
    n, S = 1000, 7
    sz = rng.integers(10, 5000, n)
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "n_chars": pa.array(sz)})
    out = balanced_shards(rd.from_arrow(t).repartition(5),
                          size_col="n_chars", id_col="doc_id",
                          n_shards=S).to_pandas().sort_values("shard")
    order = np.lexsort((np.arange(n), -sz))
    shard = np.arange(n) % S
    want_n = np.bincount(shard, minlength=S)
    want_s = np.bincount(shard, weights=sz[order].astype(float),
                         minlength=S).astype(np.int64)
    assert out["n_docs"].tolist() == want_n.tolist()
    assert out["sum_size"].tolist() == want_s.tolist()
    assert out["sum_size"].max() - out["sum_size"].min() <= sz.max()


def test_dot_knn_graph_matches_bruteforce(ray_session):
    # kNN graph over embeddings == brute force, incl. exact-duplicate
    # vectors in the SAME bucket (diagonal-group tie handling) and
    # k > candidates-per-group.
    from parallelspatialquery_ray.stages import ann
    rng = np.random.default_rng(7)
    n, d, k = 90, 12, 4
    v = rng.normal(0, 0.3, (n, d))
    v[8] = v[0]          # ids 0 and 8: same bucket at n_buckets=4
    v[44] = v[0]
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(v))})
    out = ann.dot_knn_graph(rd.from_arrow(t).repartition(4), k=k,
                            n_buckets=4).to_pandas() \
        .sort_values(["vid", "rank"]).reset_index(drop=True)
    q = np.floor(v * float(1 << 20)).astype(np.int64)
    D = q @ q.T
    want = []
    for i in range(n):
        cand = sorted((-int(D[i, j]), j) for j in range(n) if j != i)[:k]
        want += [(i, r, j, -negd) for r, (negd, j) in enumerate(cand)]
    got = list(zip(out["vid"], out["rank"], out["nid"], out["dot_q"]))
    assert got == want


def test_rank_sum_matches_scipy_formula(ray_session):
    import ray.data as rd

    from parallelspatialquery_ray.stages.agg import rank_sum_test
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 30, 300)           # heavy ties
    grp = np.where(rng.random(300) < 0.4, "en", "xx")
    df = pd.DataFrame({"n_chars": vals, "lang": grp})
    out = rank_sum_test(rd.from_pandas(df).repartition(5),
                        value_col="n_chars", group_col="lang",
                        group_a="en")
    # brute force with midranks
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), np.float64)
    sv = vals[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0   # average of i+1 .. j
        i = j
    a = grp == "en"
    r_a = ranks[a].sum()
    n_a, n_b = int(a.sum()), int((~a).sum())
    u_a = r_a - n_a * (n_a + 1) / 2.0
    row = out.iloc[0]
    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert row["u2_a"] == int(round(2 * u_a))
    assert row["auc"] == float(int(round(2 * u_a))) / (2.0 * n_a * n_b)


def test_ngram_dup_coverage_semantics(ray_session):
    import ray.data as rd

    from parallelspatialquery_ray.stages.dedup import ngram_dup_coverage
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "a b c d e f",          # shares "a b c" with doc 2
            "x y z w q",            # unique
            "p q a b c r s",        # shares "a b c" with doc 0
            "a b c d x y z",        # shares "a b c d" (two windows) w/ 0
        ]})
    out = ngram_dup_coverage(rd.from_pandas(docs).repartition(3),
                             n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = {int(r.doc_id): (int(r.dup_windows), int(r.covered))
           for r in out.itertuples()}
    # doc0: windows "a b c","b c d" dup (docs 2/3) -> union covers a..d = 4
    # doc1: "x y z" shared with doc3 -> 3
    # doc2: "a b c" at pos 3 -> 3
    # doc3: "a b c"(1), "b c d"(2), "x y z"(5) -> union 1..4 + 5..7 = 7
    assert got == {0: (2, 4), 1: (1, 3), 2: (1, 3), 3: (3, 7)}
    r0 = out[out["doc_id"] == 0].iloc[0]
    assert r0["n_tokens"] == 6 and r0["dup_ratio"] == 4.0 / 6.0
    r3 = out[out["doc_id"] == 3].iloc[0]
    assert r3["n_tokens"] == 7 and r3["dup_ratio"] == 1.0


def test_ks_two_sample_matches_bruteforce(ray_session):
    import ray.data as rd

    from parallelspatialquery_ray.stages.agg import ks_two_sample
    rng = np.random.default_rng(23)
    va = rng.integers(0, 40, 180)
    vb = rng.integers(5, 45, 240)
    df = pd.DataFrame({
        "n_chars": np.concatenate([va, vb]),
        "lang": ["en"] * len(va) + ["xx"] * len(vb)})
    out = ks_two_sample(rd.from_pandas(df).repartition(4),
                        value_col="n_chars", group_col="lang",
                        group_a="en").iloc[0]
    support = np.unique(np.concatenate([va, vb]))
    fa = np.array([(va <= v).sum() for v in support])
    fb = np.array([(vb <= v).sum() for v in support])
    d_num = int(np.max(np.abs(fa * len(vb) - fb * len(va))))
    assert out["n_a"] == len(va) and out["n_b"] == len(vb)
    assert out["d_num"] == d_num
    assert out["d"] == float(d_num) / (1.0 * len(va) * len(vb))


def test_time_pair_count_matches_brute():
    # 1-D bucket-halo pair counter: exact vs the quadratic definition,
    # including |dt| == tau boundary pairs and duplicate timestamps.
    import itertools
    rng = np.random.default_rng(7)
    t_us = rng.integers(0, 50_000, 300) * 1_000_000
    t_us[10] = t_us[20]                       # duplicates
    t_us[30] = t_us[40] + 3_600_000_000       # exact-boundary pair
    for tau in (3_600_000_000, 7_000_000_000):
        brute = sum(1 for a, b in itertools.combinations(t_us, 2)
                    if abs(int(a) - int(b)) <= tau)
        tbl = pa.table({"ts": pa.array(t_us, pa.int64())
                        .cast(pa.timestamp("us"))})
        got = windows.time_pair_count(
            rd.from_arrow(tbl).repartition(7), tau).to_pandas()
        assert int(got["n_pairs"][0]) == brute


def test_hausdorff_join_exact_small():
    # two L-shaped traces 100 apart (H^2 = 100^2) plus a far-away third
    # user: pair (1,2) keeps its exact integer Hausdorff^2, pairs with
    # user 3 exceed the threshold and drop.
    pts = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2, 3, 3], pa.int64()),
        "xq": pa.array([0, 100, 200, 0, 100, 200, 90000, 90100], pa.int64()),
        "yq": pa.array([0, 0, 100, 100, 100, 200, 0, 0], pa.int64())})
    pairs = pa.table({"user_a": pa.array([1, 1, 2], pa.int64()),
                      "user_b": pa.array([2, 3, 3], pa.int64())})
    out = windows.hausdorff_join(
        rd.from_arrow(pts).repartition(3), rd.from_arrow(pairs),
        max_h_sq=1_000_000).to_pandas().sort_values(
            ["user_a", "user_b"]).reset_index(drop=True)
    assert len(out) == 1
    assert (int(out.loc[0, "user_a"]), int(out.loc[0, "user_b"])) == (1, 2)
    # directed maxima: a->b is 100^2 (each a-point within 100 of a
    # b-point), b->a likewise; symmetric H^2 = 10000
    assert int(out.loc[0, "hausdorff_sq"]) == 10000


def test_curation_broadcast_matches_join_path(ray_session):
    # the size-gated broadcast semi-join and the distributed sorted_join
    # fallback must produce identical curated per-language stats
    from parallelspatialquery_ray.pipelines.queries import q_curation
    sf = "/root/testdata/sf0.001"
    a = q_curation(sf).to_pandas().sort_values("lang").reset_index(drop=True)
    b = q_curation(sf, broadcast_limit=0).to_pandas().sort_values(
        "lang").reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0
