"""Deduplication operators for training-data pipelines.

Five families (each a ``queries()`` entry over the `documents` table):

- :func:`exact_dedup` — content-hash partition + per-group min-id keep.
- :func:`minhash_lsh_pairs` — shingle -> MinHash signature -> banded LSH
  groupby -> candidate pairs (optionally exact-Jaccard verified).
- :func:`simhash_pairs` — 64-bit SimHash + byte-band blocking -> pairs
  within a Hamming radius.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard for a (small)
  candidate set, used both standalone and as the MinHash verifier.
- embedding cosine near-dup lives in :mod:`.ann` (cosine_topk with a
  similarity threshold).

Shuffle shape: every family reduces to "vectorized per-batch feature
extraction -> explode to (bucket, id) rows -> groupby(bucket)"; the wide
exchange only ever moves small fixed-width key rows, never document text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _content_hash(batch: pa.Table, *, text_col: str, id_col: str) -> pa.Table:
    texts = batch[text_col].to_pylist()
    h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return pa.table({id_col: batch[id_col],
                     "content_hash": pa.array(h, pa.string())})


def exact_dedup(ds: ray.data.Dataset, *, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """One row per distinct text: (doc_id = min id of the group, dup_count).
    Hash-partition by content hash, keep-first inside each group —
    deterministic regardless of block order."""
    hashed = ds.select_columns([id_col, text_col]).map_batches(
        _content_hash, batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col, id_col=id_col))

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: [g[id_col].min()],
            "dup_count": np.array([len(g)], dtype=np.int64),
        })

    return hashed.groupby("content_hash").map_groups(
        keep_min, batch_format="pandas").select_columns([id_col, "dup_count"])


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------

def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64) of a document."""
    if len(text) < k:
        src = [text] if text else []
    else:
        src = [text[i:i + k] for i in range(len(text) - k + 1)]
    if not src:
        return np.empty(0, dtype=np.uint64)
    hs = {int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
          for s in src}
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class _MinHashBands:
    """Per-batch: text -> shingles -> MinHash signature -> one row per band
    (band_id, band_hash, doc_id).  Permutation params built once per actor."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int,
                 text_col: str, id_col: str):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        self.k, self.text_col, self.id_col = shingle_k, text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        sh = char_shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # universal hash family (a*x+b) mod Mersenne prime, min per perm
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for did, t in zip(ids, texts):
            sig = self.signature(t or "")
            bs = sig.reshape(self.bands, self.rows)
            bh = [hashlib.md5(bytes_.tobytes()).digest()[:8]
                  for bytes_ in bs]
            out_id.extend([did] * self.bands)
            out_band.extend(range(self.bands))
            out_hash.extend(int.from_bytes(h, "little") for h in bh)
        id_arr = pa.array(out_id, batch[self.id_col].type)
        return pa.table({
            self.id_col: id_arr,
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(np.array(out_hash, dtype=np.uint64).astype(np.int64)),
        })


def minhash_lsh_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      concurrency=(1, 8)) -> ray.data.Dataset:
    """Candidate near-duplicate pairs (id_a < id_b) from banded MinHash LSH.
    Pairs sharing >=1 band bucket are emitted once (deduped by groupby)."""
    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        _MinHashBands, batch_format="pyarrow",
        fn_constructor_args=(num_perm, bands, shingle_k, text_col, id_col),
        concurrency=concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # a pair found in several bands appears several times -> distinct
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def verify_pairs_jaccard(ds: ray.data.Dataset, pairs: pd.DataFrame, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         shingle_k: int = 5,
                         threshold: float = 0.5) -> pd.DataFrame:
    """Exact n-gram Jaccard for a small candidate-pair set: broadcast the
    candidate id set, collect only those docs' shingle sets, score pairs on
    the driver.  Returns pairs with jaccard >= threshold."""
    import ray as _ray
    need = set(pairs["id_a"]) | set(pairs["id_b"])
    need_ref = _ray.put(need)

    def shingles_of(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(need_ref)
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        keep = [(i, t) for i, t in zip(ids, texts) if i in wanted]
        return pa.table({
            id_col: pa.array([i for i, _ in keep], batch[id_col].type),
            "shingles": pa.array(
                [char_shingle_hashes(t or "", shingle_k).tolist()
                 for _, t in keep],
                pa.list_(pa.uint64())),
        })

    rows = ds.select_columns([id_col, text_col]).map_batches(
        shingles_of, batch_format="pyarrow").take_all()
    sets = {r[id_col]: set(r["shingles"]) for r in rows}
    out = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        u = len(sa | sb)
        j = (len(sa & sb) / u) if u else 1.0
        if j >= threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


def ngram_jaccard_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5,
                        threshold: float = 0.5, num_perm: int = 64,
                        bands: int = 16) -> pd.DataFrame:
    """LSH-candidates + exact-Jaccard verification in one call (the full
    near-dup pipeline).  Returns a pandas frame (candidate sets are small
    by construction)."""
    cand = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col,
                             num_perm=num_perm, bands=bands,
                             shingle_k=shingle_k).to_pandas()
    if cand.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    return verify_pairs_jaccard(ds, cand, text_col=text_col, id_col=id_col,
                                shingle_k=shingle_k, threshold=threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class _SimHash:
    """64-bit SimHash over token FNV hashes, vectorized per doc."""

    def __init__(self, text_col: str, id_col: str):
        import re
        self.tok = re.compile(r"[A-Za-z0-9_]+")
        self.text_col, self.id_col = text_col, id_col
        self.bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def simhash(self, text: str) -> np.uint64:
        toks = self.tok.findall(text.lower())
        if not toks:
            return np.uint64(0)
        hs = np.array([int.from_bytes(
            hashlib.md5(t.encode()).digest()[:8], "little") for t in toks],
            dtype=np.uint64)
        votes = ((hs[:, None] & self.bits[None, :]) != 0).sum(axis=0)
        return self.bits[(votes * 2) > len(hs)].sum(dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        sh = np.array([self.simhash(t or "") for t in texts], dtype=np.uint64)
        return pa.table({
            self.id_col: pa.array(ids, batch[self.id_col].type),
            "simhash": pa.array(sh.astype(np.int64)),
        })


def simhash_signatures(ds: ray.data.Dataset, *, text_col: str = "text",
                       id_col: str = "doc_id",
                       concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.select_columns([id_col, text_col]).map_batches(
        _SimHash, batch_format="pyarrow",
        fn_constructor_args=(text_col, id_col), concurrency=concurrency)


def simhash_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3
                  ) -> ray.data.Dataset:
    """Pairs within ``max_hamming`` bits: byte-band blocking (8 bands of 8
    bits; any pair at distance <=7 shares >=1 identical band by pigeonhole
    when distance < 8) then exact popcount verify inside each bucket."""
    sigs = simhash_signatures(ds, text_col=text_col, id_col=id_col)

    def explode_bands(b: pa.Table) -> pa.Table:
        sh = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = b[id_col]
        n = len(sh)
        bands = np.arange(8, dtype=np.int32)
        vals = np.stack([(sh >> np.uint64(8 * i)) & np.uint64(0xFF)
                         for i in range(8)], axis=1)
        return pa.table({
            id_col: ids.take(pa.array(np.repeat(np.arange(n), 8))),
            "simhash": pa.array(np.repeat(sh.astype(np.int64), 8)),
            "band_id": pa.array(np.tile(bands, n)),
            "band_val": pa.array(vals.ravel().astype(np.int32)),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ia, ib = np.triu_indices(len(ids), 1)
        x = sh[ia] ^ sh[ib]
        ham = np.array([bin(int(v)).count("1") for v in x])
        m = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[m]], "id_b": ids[ib[m]],
                             "hamming": ham[m].astype(np.int64)})

    pairs = sigs.map_batches(explode_bands, batch_format="pyarrow") \
        .groupby(["band_id", "band_val"]).map_groups(
            bucket_pairs, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
