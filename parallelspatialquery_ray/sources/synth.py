"""Deterministic synthetic inputs.

Two families:

1. :func:`geo_doc_table` — the authoritative input shape (driver
   ``input_hint``): a Lance/Parquet-able Arrow table of interleaved
   text+media documents ``(doc_id: string, spans: list<struct<kind, text,
   media_ref, offset>>, x: float64, y: float64)``.  Mirrors the reference's
   dataset generator (uniform points in [0,1]², dense 1-based ids,
   /root/reference/DatasetGenerator/main.cpp:37-44) with the document payload
   riding along.  Bit-reproducible from the seed.

2. :func:`derive_points_sql` / :func:`derive_points` — a *pure-arithmetic*
   mapping from the driver's ``documents.parquet`` table (doc_id:int64) to
   points in [0,1]², computable identically in numpy and DuckDB so the
   correctness oracle can re-derive the exact same coordinates in SQL.

Point-distribution families (uniform / clustered / zipf / quadrupled) mirror
the reference's workload corpus (bin/Release/run_su*.cmd, run_sc*.cmd,
run_syntheticdata1.cmd, DatasetMultiplier factor 4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Knuth/xxhash-style odd multipliers; the derivation below is plain modular
# arithmetic so DuckDB reproduces it bit-exactly (BIGINT products stay far
# below 2**63 for any doc_id the test tables contain).
_MX = 2654435761
_MY = 2246822519
_MOD = 4294967296  # 2**32


def derive_points(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) in [0,1) derived from integer doc ids — numpy side."""
    d = np.asarray(doc_id, dtype=np.uint64)
    x = ((d * np.uint64(_MX)) % np.uint64(_MOD)).astype(np.float64) / _MOD
    y = ((d * np.uint64(_MY)) % np.uint64(_MOD)).astype(np.float64) / _MOD
    return x, y


def derive_points_sql(id_expr: str = "doc_id") -> tuple[str, str]:
    """DuckDB SQL expressions computing the SAME (x, y) as :func:`derive_points`."""
    return (
        f"((({id_expr}) * {_MX}) % {_MOD}) / {_MOD}.0",
        f"((({id_expr}) * {_MY}) % {_MOD}) / {_MOD}.0",
    )


# ---------------------------------------------------------------------------
# Point-distribution families (reference workload corpus)
# ---------------------------------------------------------------------------

def points_uniform(n: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    return rng.random(n), rng.random(n)


def points_clustered(n: int, n_clusters: int = 16, sigma: float = 0.02,
                     seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Equal-size Gaussian clusters, clipped to [0,1] (mirrors sc* fixtures)."""
    rng = np.random.default_rng(seed)
    centers = rng.random((n_clusters, 2))
    idx = np.arange(n) % n_clusters
    pts = centers[idx] + rng.normal(0.0, sigma, (n, 2))
    pts = np.clip(pts, 0.0, 1.0)
    return pts[:, 0], pts[:, 1]


def points_zipf(n: int, n_clusters: int = 64, a: float = 1.6, sigma: float = 0.01,
                seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Zipf-distributed cluster sizes — the skew / hot-cell stressor
    (mirrors run_syntheticdata1.cmd)."""
    rng = np.random.default_rng(seed)
    centers = rng.random((n_clusters, 2))
    weights = 1.0 / np.arange(1, n_clusters + 1) ** a
    weights /= weights.sum()
    idx = rng.choice(n_clusters, size=n, p=weights)
    pts = np.clip(centers[idx] + rng.normal(0.0, sigma, (n, 2)), 0.0, 1.0)
    return pts[:, 0], pts[:, 1]


def points_quadrupled(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """DatasetMultiplier factor 4 (main.cpp:72-88): shrink by half, replicate
    into the four quadrants; preserves local neighbor structure exactly.
    Row order is 4*pos+quadrant like the reference's id assignment."""
    hx, hy = x / 2.0, y / 2.0
    qx = np.stack([hx, hx + 0.5, hx, hx + 0.5], axis=1).ravel()
    qy = np.stack([hy, hy, hy + 0.5, hy + 0.5], axis=1).ravel()
    return qx, qy


FAMILIES = {
    "uniform": points_uniform,
    "clustered": points_clustered,
    "zipf": points_zipf,
}


# ---------------------------------------------------------------------------
# Interleaved-document table (input_hint shape)
# ---------------------------------------------------------------------------

_KINDS = ("text", "image", "audio")
_WORDS = ("spatial", "query", "plane", "sweep", "neighbor", "cell", "halo",
          "tile", "raster", "vector", "index", "stripe", "window", "point")


def _span_fields(doc_idx: np.ndarray, span_idx: np.ndarray):
    """Deterministic (kind, text, media_ref) from (doc index, span index) via
    the same splitmix-ish modular arithmetic as the point derivation."""
    h = (doc_idx.astype(np.uint64) * np.uint64(_MX)
         + span_idx.astype(np.uint64) * np.uint64(_MY)) % np.uint64(_MOD)
    kind_i = (h % np.uint64(3)).astype(np.int64)
    word_i = ((h >> np.uint64(3)) % np.uint64(len(_WORDS))).astype(np.int64)
    kinds = np.array(_KINDS)[kind_i]
    words = np.array(_WORDS)[word_i]
    texts = np.where(kind_i == 0,
                     np.char.add(np.char.add(words, " token "), h.astype("U10")),
                     "")
    media = np.where(kind_i != 0,
                     np.char.add(np.char.add("ref://", kinds), h.astype("U10")),
                     "")
    return kinds, texts, media


def geo_doc_table(n: int, seed: int = 42, family: str = "uniform",
                  id_offset: int = 0, **family_kwargs) -> pa.Table:
    """The authoritative interleaved-document point table (FIXTURES.md F1).

    doc_id is dense 1-based ("d%09d") like the reference's ids
    (BruteForceAlgorithm.h:50 indexes id-1); spans per doc in 1..5 with
    strictly increasing offsets.

    ``family="derived"`` uses the pure-arithmetic coordinate map
    (:func:`derive_points`) instead of an RNG family, making the ENTIRE
    table — coordinates and span payload both — reproducible in DuckDB SQL
    (:func:`interleaved_sql_cte`), so queries over the interleaved shape
    can sit under the driver's value-hash oracle gate.
    """
    ids = np.arange(1 + id_offset, n + 1 + id_offset, dtype=np.int64)
    if family == "derived":
        x, y = derive_points(ids)
    else:
        x, y = FAMILIES[family](n, seed=seed, **family_kwargs)
    doc_id = np.char.add("d", np.char.zfill(ids.astype("U12"), 9))

    n_spans = (ids % 5 + 1).astype(np.int64)          # deterministic 1..5
    doc_idx = np.repeat(ids, n_spans)
    total = int(n_spans.sum())
    # span index within each doc: 0..n_spans-1
    starts = np.concatenate([[0], np.cumsum(n_spans)])[:-1]
    span_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, n_spans)
    kinds, texts, media = _span_fields(doc_idx, span_idx)
    offsets32 = (span_idx * 17 + (doc_idx % 7)).astype(np.int32)  # strictly increasing per doc

    def _arr(vals, typ):
        a = pa.array(vals, typ)
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    span_struct = pa.StructArray.from_arrays(
        [_arr(kinds, pa.string()), _arr(texts, pa.string()),
         _arr(media, pa.string()), _arr(offsets32, pa.int32())],
        names=["kind", "text", "media_ref", "offset"],
    )
    list_offsets = pa.array(np.concatenate([[0], np.cumsum(n_spans)]).astype(np.int32))
    spans = pa.ListArray.from_arrays(list_offsets, span_struct)

    return pa.table({
        "doc_id": pa.array(doc_id, pa.string()),
        "spans": spans,
        "x": pa.array(x, pa.float64()),
        "y": pa.array(y, pa.float64()),
    })


def interleaved_sql_cte(n: int, id_offset: int = 0) -> str:
    """DuckDB CTE regenerating ``geo_doc_table(n, family="derived")``
    bit-exactly in SQL: ``docs(i, doc_id, x, y)`` one row per document and
    ``doc_spans(i, doc_id, span_idx, kind, text, media_ref, span_offset)``
    one row per span.  Every field is the same modular arithmetic as the
    numpy side (``_span_fields`` / :func:`derive_points`), so oracle
    queries can verify span-sequence equality (kind, text, media_ref,
    order) value-by-value."""
    xs, ys = derive_points_sql("i")
    words = ", ".join(f"'{w}'" for w in _WORDS)
    kinds = ", ".join(f"'{k}'" for k in _KINDS)
    lo, hi = 1 + id_offset, n + 1 + id_offset
    return f"""
WITH docs AS (
  SELECT i, 'd' || lpad(i::VARCHAR, 9, '0') AS doc_id,
         {xs} AS x, {ys} AS y
  FROM (SELECT unnest(range({lo}, {hi}))::BIGINT AS i)
), sidx AS (SELECT unnest(range(0, 5))::BIGINT AS span_idx
), rawspans AS (
  SELECT d.i, d.doc_id, s.span_idx,
         (d.i * {_MX} + s.span_idx * {_MY}) % {_MOD} AS h
  FROM docs d CROSS JOIN sidx s
  WHERE s.span_idx < d.i % 5 + 1
), doc_spans AS (
  SELECT i, doc_id, span_idx::INTEGER AS span_idx,
         [{kinds}][(h % 3)::INT + 1] AS kind,
         CASE WHEN h % 3 = 0
              THEN [{words}][((h // 8) % {len(_WORDS)})::INT + 1]
                   || ' token ' || h::VARCHAR
              ELSE '' END AS text,
         CASE WHEN h % 3 <> 0
              THEN 'ref://' || [{kinds}][(h % 3)::INT + 1] || h::VARCHAR
              ELSE '' END AS media_ref,
         (span_idx * 17 + i % 7)::INTEGER AS span_offset
  FROM rawspans
)
"""


# ---------------------------------------------------------------------------
# Polygon fixtures (FIXTURES.md F4)
# ---------------------------------------------------------------------------

def convex_polygons(n: int, seed: int = 42) -> list[dict]:
    """Seeded convex polygons: regular K-gons (K in 3..8), random center /
    radius / rotation, clipped to stay inside [0,1]².  Vertices CCW.

    Returns a list of {"poly_id": str, "ring": [(x, y), ...]} dicts whose
    float coordinates round-trip exactly through repr() so the same literals
    can be embedded into oracle SQL.
    """
    rng = np.random.default_rng(seed)
    polys = []
    for i in range(n):
        k = int(rng.integers(3, 9))
        r = float(rng.uniform(0.05, 0.2))
        cx = float(rng.uniform(r, 1 - r))
        cy = float(rng.uniform(r, 1 - r))
        rot = float(rng.uniform(0, 2 * np.pi))
        ang = rot + 2 * np.pi * np.arange(k) / k
        ring = [(float(cx + r * np.cos(a)), float(cy + r * np.sin(a))) for a in ang]
        polys.append({"poly_id": f"p{i:04d}", "ring": ring})
    return polys


def l_shape_polygon(poly_id: str = "pL") -> dict:
    """One concave L-shape (CCW) for the ray-casting path."""
    ring = [(0.1, 0.1), (0.6, 0.1), (0.6, 0.3), (0.3, 0.3), (0.3, 0.6), (0.1, 0.6)]
    return {"poly_id": poly_id, "ring": ring}


def polygons_table(polys: list[dict]) -> pa.Table:
    ring_type = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))
    rings = pa.array([[{"x": x, "y": y} for x, y in p["ring"]] for p in polys], ring_type)
    return pa.table({"poly_id": pa.array([p["poly_id"] for p in polys]), "ring": rings})


def media_store(doc_tbl: pa.Table, *, spans_col: str = "spans") -> pa.Table:
    """Deterministic payload store for a geo-doc table's media refs:
    ``(media_ref, payload)`` with REAL file bytes — 24-bit BMP, 8-bit
    PNG or baseline-JPEG images for image spans (format, PNG filter type
    and JPEG quality all chosen deterministically from the ref hash, so
    the decode path exercises the BMP parser, the zlib-inflate + unfilter
    PNG path AND the JPEG Huffman entropy decoder), PCM-16 WAV clips
    for audio spans.  Models the object-store side of a media pipeline;
    :func:`..stages.media.media_features` with ``decoder="numpy"`` decodes
    these with the engine's own codecs."""
    refs: set[str] = set()
    for spans in doc_tbl[spans_col].to_pylist():
        for s in spans:
            if s["kind"] != "text":
                refs.add((s["kind"], s["media_ref"]))
    out_ref, out_payload = [], []
    for kind, ref in sorted(refs):
        _raw, payload = _gen_media_asset(kind, ref)
        out_ref.append(ref)
        out_payload.append(payload)
    return pa.table({"media_ref": pa.array(out_ref, pa.string()),
                     "payload": pa.array(out_payload, pa.binary())})


def _gen_media_asset(kind: str, ref: str) -> tuple[np.ndarray, bytes]:
    """Deterministic (raw array, encoded payload) for one media ref.
    Shared by :func:`media_store` (ships the payload) and
    :func:`media_expected` (stats the raw array), so the expected side
    never touches the decode path."""
    from ..functions.codecs import (encode_bmp, encode_jpeg, encode_png,
                                    encode_wav, jpeg_reference_pixels)
    from ..functions.hashing import token_hashes

    # deterministic per-ref seed (process-stable, unlike builtin hash)
    h = int(token_hashes([ref])[0] % np.uint64(2 ** 32))
    rng = np.random.default_rng(h)
    if kind == "image":
        w = int(8 + rng.integers(0, 33))
        ht = int(8 + rng.integers(0, 33))
        img = rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)
        sel = h % 3  # a third each of BMP / PNG / baseline JPEG
        if sel == 1:
            return img, encode_png(img, filter_type=h % 5)
        if sel == 2:
            # JPEG is lossy: the expected "raw" array is the reference
            # reconstruction computed WITHOUT bytes (DCT->quant->IDCT),
            # so comparing the decode stage against it independently
            # verifies the Huffman coder, byte stuffing and marker walk
            quality = 55 + h % 43
            return (jpeg_reference_pixels(img, quality),
                    encode_jpeg(img, quality))
        return img, encode_bmp(img)
    n = int(800 + rng.integers(0, 1600))
    s = (rng.standard_normal(n) * 3000).astype(np.int16)
    return s, encode_wav(s, sample_rate=16000)


def media_expected(doc_tbl: pa.Table, *, spans_col: str = "spans",
                   id_col: str = "doc_id") -> pa.Table:
    """Ground-truth stats table for the media-decode oracle: one row per
    non-text span with the stats of the RAW asset array
    (``functions.codecs.image_stats`` / ``audio_stats`` integer sums +
    crc32): the pre-encode array for the lossless formats (BMP/PNG/WAV),
    and for lossy JPEG the byte-free mathematical reference
    reconstruction (``codecs.jpeg_reference_pixels``).  Neither touches
    the byte-decode path the engine runs, so comparing the decode
    stage's output against this table verifies the whole
    encode->attach->decode pipeline exactly — including the JPEG
    Huffman/byte-stuffing layer, which only matches if every coefficient
    round-trips the bitstream.
    Schema matches ``media_features(emit="stats")``: (doc_id, span_index,
    media_ref, kind, width, height, n_bytes, pix_sum, crc32)."""
    from ..functions.codecs import audio_stats, image_stats

    cache: dict[tuple[str, str], tuple] = {}
    rows = {k: [] for k in ("doc_id", "span_index", "media_ref", "kind",
                            "width", "height", "n_bytes", "pix_sum",
                            "crc32")}
    ids = doc_tbl[id_col].to_pylist()
    for did, spans in zip(ids, doc_tbl[spans_col].to_pylist()):
        for si, s in enumerate(spans):
            if s["kind"] == "text":
                continue
            key = (s["kind"], s["media_ref"])
            if key not in cache:
                raw, payload = _gen_media_asset(*key)
                stats = (image_stats(raw) if s["kind"] == "image"
                         else audio_stats(raw))
                cache[key] = (*stats, len(payload))
            w, h, psum, crc, nb = cache[key]
            rows["doc_id"].append(did)
            rows["span_index"].append(si)
            rows["media_ref"].append(s["media_ref"])
            rows["kind"].append(s["kind"])
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_bytes"].append(nb)
            rows["pix_sum"].append(psum)
            rows["crc32"].append(crc)
    return pa.table({
        "doc_id": pa.array(rows["doc_id"]),
        "span_index": pa.array(rows["span_index"], pa.int32()),
        "media_ref": pa.array(rows["media_ref"], pa.string()),
        "kind": pa.array(rows["kind"], pa.string()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
        "pix_sum": pa.array(rows["pix_sum"], pa.int64()),
        "crc32": pa.array(rows["crc32"], pa.int64()),
    })
