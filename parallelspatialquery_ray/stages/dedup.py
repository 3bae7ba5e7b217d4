"""Deduplication operators for training-data pipelines.

Five families (each a ``queries()`` entry over the `documents` table):

- :func:`exact_dedup` — content-hash partition + per-group min-id keep.
- :func:`minhash_lsh_pairs` — shingle -> MinHash signature -> banded LSH
  shuffle -> candidate pairs (optionally exact-Jaccard verified).
- :func:`simhash_pairs` — 64-bit SimHash + byte-band blocking -> pairs
  within a Hamming radius.
- :func:`ngram_jaccard_pairs` — the full near-dup pipeline: one signature
  pass -> LSH candidates -> signature-ESTIMATE prune -> exact shingle-set
  verification of the survivors, all Dataset end to end.
- embedding cosine near-dup lives in :mod:`.ann` (cosine_topk with a
  similarity threshold).

Shuffle shape: vectorized per-batch feature extraction -> explode to
(bucket, id) rows -> :func:`..stages.shuffle.sorted_block_reduce` on the
bucket key; the wide exchange only moves small fixed-width key rows, never
document text.  All hashing is numpy-vectorized over flat byte buffers
(:mod:`..functions.hashing`) — no per-row/per-token Python in hot paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import content_hashes, splitmix64, token_hashes
from .shuffle import default_concurrency, sorted_block_reduce, stage_task

_MERSENNE = (1 << 61) - 1
_splitmix = splitmix64  # kept name: used throughout this module


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _content_hash_partial(batch: pa.Table, *, text_col: str,
                          id_col: str) -> pa.Table:
    """Per-batch PARTIAL aggregate: one row per distinct content hash of the
    batch — (h1, h2, min_id, cnt).  The 128-bit hash is computed directly on
    the arrow utf-8 buffers (:func:`..functions.hashing.content_hashes`, no
    per-row Python), and the partial combine means a million-way-duplicated
    document ships ONE row per batch into the shuffle instead of every row
    into a single reducer block (the tumbling-window combiner shape)."""
    h1, h2 = content_hashes(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"h1": h1.view(np.int64), "h2": h2.view(np.int64),
                       id_col: ids})
    out = df.groupby(["h1", "h2"], sort=False)[id_col] \
        .agg(["min", "size"]).reset_index()
    return pa.table({
        "h1": pa.array(out["h1"].to_numpy()),
        "h2": pa.array(out["h2"].to_numpy()),
        "min_id": pa.array(out["min"].to_numpy()),
        "cnt": pa.array(out["size"].to_numpy().astype(np.int64)),
    })


def exact_dedup(ds: ray.data.Dataset, *, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """One row per distinct text: (doc_id = min id of the group, dup_count).
    Partial-aggregate per batch, range-shuffle the (tiny) partials by the
    128-bit content hash, final combine per group — deterministic
    regardless of block order, and skew-proof: the shuffle moves one row
    per (batch, distinct text), never the duplicate rows themselves."""
    hashed = ds.select_columns([id_col, text_col]).map_batches(
        _content_hash_partial, batch_format="pyarrow", batch_size=None,
        fn_kwargs=dict(text_col=text_col, id_col=id_col))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["h1", "h2"], sort=False).agg(
            min_id=("min_id", "min"), cnt=("cnt", "sum")).reset_index()
        return pd.DataFrame({id_col: out["min_id"],
                             "dup_count": out["cnt"].astype(np.int64)})

    return sorted_block_reduce(hashed, ["h1", "h2"], combine)


# ---------------------------------------------------------------------------
# shingles + MinHash (vectorized)
# ---------------------------------------------------------------------------

def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64) of a document — rolling
    polynomial hash over the utf-8 bytes, numpy-vectorized."""
    data = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    kk = min(k, len(data))
    win = np.lib.stride_tricks.sliding_window_view(data, kk).astype(np.uint64)
    pows = np.uint64(1099511628211) ** np.arange(kk, dtype=np.uint64)
    h = _splitmix((win * pows[None, :]).sum(axis=1, dtype=np.uint64))
    return np.unique(h)


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class _MinHashSigs:
    """Per-batch: text -> shingles -> MinHash signature, one BINARY row per
    doc (num_perm x uint64 bytes).  Permutation params built once per
    actor.  Signatures are the reusable artifact: band rows for LSH are
    derived from them by a cheap map, and candidate verification uses them
    to ESTIMATE jaccard before any shingle payload moves."""

    def __init__(self, num_perm: int, shingle_k: int,
                 text_col: str, id_col: str):
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.k, self.text_col, self.id_col = shingle_k, text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        sh = char_shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # universal hash family (a*x+b) mod Mersenne prime, min per perm
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # whole-batch flat-buffer pass (functions.hashing): all shingle
        # hashes in one vectorized correlation over the concatenated utf-8
        # bytes, then num_perm minimum.reduceat passes — no per-doc Python,
        # bit-identical to signature() (the SQL twins depend on that)
        from ..functions.hashing import (char_shingle_hashes_flat,
                                         minhash_from_flat)
        n = len(batch)
        sh_flat, cnt = char_shingle_hashes_flat(
            batch[self.text_col], self.k)
        sigs = minhash_from_flat(sh_flat, cnt, self.a, self.b,
                                 np.uint64(_MERSENNE))
        # row-major sigs buffer IS the concatenated per-doc binary rows;
        # wrap it as an arrow binary array without per-row slicing
        row_nbytes = self.num_perm * 8
        offs = np.arange(n + 1, dtype=np.int32) * row_nbytes
        sig_arr = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(np.ascontiguousarray(sigs).tobytes())])
        return pa.table({
            self.id_col: batch[self.id_col],
            "sig": sig_arr,
        })


def _sig_matrix(vals) -> np.ndarray:
    """List/array of binary signatures -> (n, num_perm) uint64 matrix."""
    vals = list(vals)
    if len(vals) == 0:
        return np.empty((0, 0), dtype=np.uint64)
    return np.frombuffer(b"".join(vals), dtype=np.uint64).reshape(len(vals),
                                                                  -1)


def _band_hash_matrix(sigm: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) signature matrix -> (n, bands) int64 band hashes.
    Shared by the sharded band-row path and the fused broadcast path so
    both bucket identically."""
    n = len(sigm)
    rows = sigm.shape[1] // bands if n else 0
    bs = sigm.reshape(n, bands, rows) if n else sigm.reshape(0, bands, 0)
    bh = _splitmix(
        (_splitmix(bs) * np.uint64(0xC2B2AE3D27D4EB4F) **
         np.arange(rows, dtype=np.uint64)[None, None, :]
         ).sum(axis=2, dtype=np.uint64))
    return bh.astype(np.int64)


def _bands_from_sigs(bands: int, id_col: str):
    """Signature rows -> one (doc_id, band_id, band_hash) row per band."""

    def f(batch: pa.Table) -> pa.Table:
        sigs = _sig_matrix(batch["sig"].to_pylist())
        n = len(batch)
        bh = _band_hash_matrix(sigs, bands)
        id_idx = pa.array(np.repeat(np.arange(n), bands))
        return pa.table({
            id_col: batch[id_col].take(id_idx),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1)),
        })

    return f


def minhash_signature_rows(ds: ray.data.Dataset, *, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           shingle_k: int = 5,
                           concurrency=None) -> ray.data.Dataset:
    """(id, sig) MinHash signature rows (binary num_perm x uint64)."""
    return ds.select_columns([id_col, text_col]).map_batches(
        stage_task(_MinHashSigs), batch_format="pyarrow",
        fn_kwargs=dict(_args=(num_perm, shingle_k, text_col, id_col)))


def _pairs_in_buckets(g: pd.DataFrame, bucket_cols: list[str], id_col: str,
                      mode: str = "star") -> pd.DataFrame:
    """Candidate id pairs within each bucket of the block.

    ``mode="star"`` (default) pairs every member with the bucket's minimum
    id — LINEAR in bucket size and sufficient for duplicate *clustering*
    (connected components reach every member through the hub), which is what
    LSH dedup consumes.  A 500-member duplicate cluster emits 499 pairs
    instead of 124750.  ``mode="all"`` emits the full quadratic pair set.
    """
    g = g.sort_values(bucket_cols + [id_col], kind="stable")
    ids = g[id_col].to_numpy()
    bucket = pd.MultiIndex.from_frame(g[bucket_cols]).factorize()[0] \
        if len(bucket_cols) > 1 else g[bucket_cols[0]].factorize()[0]
    new = np.concatenate([[True], bucket[1:] != bucket[:-1]])
    if mode == "star":
        starts_idx = np.nonzero(new)[0]
        counts = np.diff(np.append(starts_idx, len(bucket)))
        hub = np.repeat(ids[starts_idx], counts)  # bucket min (ids sorted)
        keep = hub != ids
        return pd.DataFrame({"id_a": hub[keep], "id_b": ids[keep]})
    starts = np.append(np.nonzero(new)[0], len(bucket))
    out_a, out_b = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        if e - s < 2:
            continue
        ia, ib = np.triu_indices(e - s, 1)
        out_a.append(ids[s + ia])
        out_b.append(ids[s + ib])
    if not out_a:
        return pd.DataFrame({"id_a": pd.Series([], dtype=ids.dtype),
                             "id_b": pd.Series([], dtype=ids.dtype)})
    return pd.DataFrame({"id_a": np.concatenate(out_a),
                         "id_b": np.concatenate(out_b)})


def _fused_lsh_pairs(sigs: ray.data.Dataset, *, bands: int, id_col: str,
                     pair_mode: str = "star",
                     min_est: float | None = None) -> ray.data.Dataset:
    """Fused broadcast path for LSH candidates: banding -> bucket pairs ->
    distinct (-> optional signature-estimate prune), all in ONE task over
    the gathered (budget-bounded) signature table.  Replaces two sort
    shuffles + two join stages; bucketing/pairing/estimating reuse the
    sharded path's exact helpers, so both paths emit identical pair sets.
    ``sigs`` must be materialized."""
    from .join import _fields_of

    id_type = _fields_of(sigs)[id_col]

    @ray.remote
    def _task(*tbls):
        live = [t for t in tbls if t.num_rows and id_col in t.column_names]
        empty = pa.table({"id_a": pa.array([], id_type),
                          "id_b": pa.array([], id_type)})
        if not live:
            return empty
        t = pa.concat_tables(live)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sigm = _sig_matrix(t["sig"].to_pylist())
        bh = _band_hash_matrix(sigm, bands)
        rows = pd.DataFrame({
            id_col: np.repeat(ids, bands),
            "band_id": np.tile(np.arange(bands, dtype=np.int32), len(ids)),
            "band_hash": bh.reshape(-1)})
        pairs_df = _pairs_in_buckets(rows, ["band_id", "band_hash"], id_col,
                                     mode=pair_mode) \
            .drop_duplicates(["id_a", "id_b"])
        if not len(pairs_df):
            return empty
        if min_est is not None:
            order = np.argsort(ids, kind="stable")
            sids, ssig = ids[order], sigm[order]
            ia = np.searchsorted(sids, pairs_df["id_a"].to_numpy())
            ib = np.searchsorted(sids, pairs_df["id_b"].to_numpy())
            e = (ssig[ia] == ssig[ib]).mean(axis=1)
            pairs_df = pairs_df[e >= min_est]
        out = pa.Table.from_pandas(pairs_df, preserve_index=False)
        return pa.table({
            "id_a": out["id_a"].combine_chunks().cast(id_type),
            "id_b": out["id_b"].combine_chunks().cast(id_type)})

    return ray.data.from_arrow_refs([_task.remote(*sigs.to_arrow_refs())])


def minhash_lsh_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      pair_mode: str = "star", sig_rows=None,
                      distinct: bool = True,
                      concurrency=None) -> ray.data.Dataset:
    """Candidate near-duplicate pairs (id_a < id_b) from banded MinHash LSH.
    Pairs sharing >=1 band bucket are emitted once (``distinct=False``
    skips that dedup shuffle when the consumer dedupes anyway).
    ``pair_mode``: see :func:`_pairs_in_buckets` (star = linear cluster
    edges, all = quadratic).  ``sig_rows``: precomputed signatures.

    When the signature table fits the broadcast budget, candidates are
    computed by :func:`_fused_lsh_pairs` in one task (always distinct);
    larger tables take the banded sort-shuffle path."""
    assert num_perm % bands == 0
    if sig_rows is None:
        sig_rows = minhash_signature_rows(
            ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
            shingle_k=shingle_k, concurrency=concurrency or default_concurrency())
    sig_rows = sig_rows.materialize()
    if sig_rows.size_bytes() <= _BROADCAST_JOIN_BUDGET_BYTES:
        return _fused_lsh_pairs(sig_rows, bands=bands, id_col=id_col,
                                pair_mode=pair_mode)
    band_rows = sig_rows.map_batches(_bands_from_sigs(bands, id_col),
                                     batch_format="pyarrow")
    pairs = sorted_block_reduce(
        band_rows, ["band_id", "band_hash"],
        lambda g: _pairs_in_buckets(g, ["band_id", "band_hash"], id_col,
                                    mode=pair_mode))
    if not distinct:  # caller dedupes downstream (fused into its reducer)
        return pairs
    # a pair found in several bands appears several times -> distinct
    return sorted_block_reduce(
        pairs, ["id_a", "id_b"],
        lambda g: g.drop_duplicates(["id_a", "id_b"]))


def verify_pairs_jaccard(ds: ray.data.Dataset, pairs, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         shingle_k: int = 5,
                         threshold: float = 0.5) -> ray.data.Dataset:
    """Exact n-gram Jaccard for a candidate-pair set, fully distributed:
    only the candidate ID SET (O(pairs) fixed-width keys, never shingle
    payloads) is broadcast to semi-join-filter the corpus; each needed
    doc's shingle array is computed inside ``map_batches``; two sorted
    equi-joins co-locate both sides' shingle arrays with their pair row;
    scoring is per co-located block.  Returns a Dataset of pairs with
    ``jaccard >= threshold`` — nothing materializes on the driver."""
    import pyarrow.compute as pc
    import ray as _ray

    from .join import _fields_of, sorted_join

    if isinstance(pairs, pd.DataFrame):
        pairs = ray.data.from_pandas(pairs)
    pairs = pairs.materialize()
    id_type = _fields_of(ds)[id_col]
    empty = pa.table({"id_a": pa.array([], id_type),
                      "id_b": pa.array([], id_type),
                      "jaccard": pa.array([], pa.float64())})

    # exact DISTINCT over the candidate pairs + the distinct candidate-id
    # set, in ONE task (one barrier, not two): per-block dedupe upstream is
    # best-effort only (Ray may split a block mid-key-run), and a
    # duplicated pair would come out of the verifier twice.  Bounded by the
    # (pruned) candidate volume, runs off-driver; only the id set (and the
    # deduped pair table ref) return.
    @_ray.remote(num_returns=2)
    def _distinct_and_ids(*tbls):
        live = [t.select(["id_a", "id_b"]) for t in tbls
                if t.num_rows and "id_a" in t.column_names]
        if not live:
            return empty.select(["id_a", "id_b"]), pa.array([], id_type)
        df = pa.concat_tables(live).to_pandas() \
            .drop_duplicates(["id_a", "id_b"])
        t = pa.Table.from_pandas(df, preserve_index=False)
        ids = pc.unique(pa.concat_arrays([
            t["id_a"].combine_chunks().cast(id_type),
            t["id_b"].combine_chunks().cast(id_type)]))
        return t, ids

    pair_ref, ids_ref = _distinct_and_ids.remote(*pairs.to_arrow_refs())
    pairs = ray.data.from_arrow_refs([pair_ref])
    need = _ray.get(ids_ref)
    if len(need) == 0:
        return ray.data.from_arrow(empty)
    need_ref = _ray.put(need)

    def shingles_of(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(need_ref)
        b = batch.filter(pc.is_in(
            batch[id_col].combine_chunks().cast(id_type),
            value_set=wanted))
        # shingle sets travel as raw uint64 BYTES (binary column):
        # fixed-width through arrow<->pandas conversion, no list/tensor
        # extension types in the join's pandas blocks
        sh = [char_shingle_hashes(t or "", shingle_k).tobytes()
              for t in b[text_col].to_pylist()]
        return pa.table({id_col: b[id_col],
                         "sh": pa.array(sh, pa.binary())})

    def rename(to: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({id_col: b[id_col], to: b["sh"]})
        return f

    # ONE shingle pass over the corpus, materialized (bounded by the
    # candidate id set), reused for both join sides; explicit field dicts
    # keep the join chain fully lazy (one streaming execution, no schema
    # probes re-running upstream stages)
    sh = ds.select_columns([id_col, text_col]).map_batches(
        shingles_of, batch_format="pyarrow").materialize()

    if sh.size_bytes() <= _BROADCAST_JOIN_BUDGET_BYTES:
        # broadcast path: gather the (candidate-bounded) shingle table once
        # into the object store as (sorted ids, offsets, flat uint64 buffer)
        # and score pairs in ONE streaming map_batches — no shuffle.
        @_ray.remote
        def _gather_shingles(*tbls):
            live = [t for t in tbls
                    if t.num_rows and id_col in t.column_names]
            if not live:
                return (np.empty(0, dtype=object),
                        np.zeros(1, np.int64), np.empty(0, np.uint64))
            t = pa.concat_tables(live)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            raw = t["sh"].to_pylist()
            order = np.argsort(ids, kind="stable")
            lens = np.array([len(raw[i]) // 8 for i in order], np.int64)
            offs = np.concatenate([[0], np.cumsum(lens)])
            flat = (np.frombuffer(b"".join(raw[i] for i in order),
                                  dtype=np.uint64)
                    if offs[-1] else np.empty(0, np.uint64))
            return ids[order], offs, flat

        lut_ref = _gather_shingles.remote(*sh.to_arrow_refs())

        # plain task (not an actor pool): few pair blocks, zero-copy
        # plasma read of the lookup per task
        def _score(g: pd.DataFrame) -> pd.DataFrame:
            ids, offs, flat = _ray.get(lut_ref)
            if "id_a" not in g.columns or len(g) == 0:
                return empty.to_pandas()
            n = max(len(ids), 1)
            ia = np.minimum(np.searchsorted(
                ids, g["id_a"].to_numpy()), n - 1)
            ib = np.minimum(np.searchsorted(
                ids, g["id_b"].to_numpy()), n - 1)
            ja = np.empty(len(g))
            for i, (a, b) in enumerate(zip(ia, ib)):
                sa = flat[offs[a]:offs[a + 1]]
                sb = flat[offs[b]:offs[b + 1]]
                if len(sa) == 0 and len(sb) == 0:
                    ja[i] = 1.0
                    continue
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                ja[i] = inter / (len(sa) + len(sb) - inter)
            out = g[["id_a", "id_b"]].copy()
            out["jaccard"] = ja
            return out[out["jaccard"] >= threshold]

        return pairs.map_batches(_score, batch_format="pandas")

    pair_fields = {"id_a": id_type, "id_b": id_type}
    j1 = sorted_join(pairs, sh.map_batches(rename("sh_a"),
                                           batch_format="pyarrow"),
                     left_on="id_a", right_on=id_col,
                     left_fields=pair_fields,
                     right_fields={id_col: id_type, "sh_a": pa.binary()},
                     coalesce=16)
    j2 = sorted_join(j1, sh.map_batches(rename("sh_b"),
                                        batch_format="pyarrow"),
                     left_on="id_b", right_on=id_col,
                     left_fields={**pair_fields, "sh_a": pa.binary()},
                     right_fields={id_col: id_type, "sh_b": pa.binary()},
                     coalesce=16)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if "id_a" not in g.columns:  # schema-less empty sort partition
            return empty.to_pandas()
        ja = np.empty(len(g))
        for i, (sa, sb) in enumerate(zip(g["sh_a"].to_numpy(),
                                         g["sh_b"].to_numpy())):
            sa = np.frombuffer(sa, dtype=np.uint64)
            sb = np.frombuffer(sb, dtype=np.uint64)
            if len(sa) == 0 and len(sb) == 0:
                ja[i] = 1.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            ja[i] = inter / (len(sa) + len(sb) - inter)
        out = g[["id_a", "id_b"]].copy()
        out["jaccard"] = ja
        return out[out["jaccard"] >= threshold]

    return j2.map_batches(score, batch_format="pandas")


# Side tables at or under this size ride a broadcast join (one ray.put-able
# lookup read zero-copy by every task) instead of a sorted shuffle join —
# the standard broadcast-vs-shuffle join selection.  1 GiB maps comfortably
# into a worker heap on the design-point nodes; above it, the sorted-join
# path keeps everything sharded.
_BROADCAST_JOIN_BUDGET_BYTES = 1 << 30


def signature_filter_pairs(pairs: ray.data.Dataset,
                           sig_rows: ray.data.Dataset, *,
                           id_col: str = "doc_id",
                           min_est: float = 0.25) -> ray.data.Dataset:
    """Keep candidate pairs whose SIGNATURE-estimated jaccard (fraction of
    matching MinHash components, an unbiased estimator) is >= ``min_est``.
    Signature payloads are num_perm x 8 bytes — two orders of magnitude
    smaller than shingle sets — so this join prunes the candidate flood
    before any shingle payload moves.  Accepts non-distinct candidate
    streams: the per-block drop_duplicates here is a best-effort volume
    reducer (block splits can separate copies of a pair); the EXACT
    distinct happens at verify_pairs_jaccard's entry.

    Join strategy: when the signature table fits the broadcast budget it is
    gathered once into the object store (sorted-id array + signature
    matrix) and pairs stream through ONE map_batches with vectorized
    searchsorted lookups — no shuffle at all.  Larger signature tables take
    the two-sorted-join path (sharded both sides)."""
    from .join import _fields_of, sorted_join

    sig_rows = sig_rows.materialize()
    id_type = _fields_of(sig_rows)[id_col]
    if sig_rows.size_bytes() <= _BROADCAST_JOIN_BUDGET_BYTES:
        @ray.remote
        def _gather_sigs(*tbls):
            live = [t for t in tbls
                    if t.num_rows and id_col in t.column_names]
            if not live:
                return np.empty(0, dtype=object), np.empty((0, 0), np.uint64)
            t = pa.concat_tables(live)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            sigm = _sig_matrix(t["sig"].to_pylist())
            order = np.argsort(ids, kind="stable")
            return ids[order], sigm[order]

        lut_ref = _gather_sigs.remote(*sig_rows.to_arrow_refs())
        id_dtype = object if pa.types.is_string(id_type) else np.int64

        # plain task (not an actor pool): the candidate-pair stream is few
        # blocks, and ray.get of the lookup is a zero-copy plasma read
        def _est(g: pd.DataFrame) -> pd.DataFrame:
            ids, sigm = ray.get(lut_ref)
            if "id_a" not in g.columns or len(g) == 0:
                return pd.DataFrame(
                    {"id_a": pd.Series([], dtype=id_dtype),
                     "id_b": pd.Series([], dtype=id_dtype)})
            g = g.drop_duplicates(["id_a", "id_b"])
            ia = np.searchsorted(ids, g["id_a"].to_numpy())
            ib = np.searchsorted(ids, g["id_b"].to_numpy())
            # candidates originate from these signatures, so every id
            # resolves; clip only guards the empty-lut edge
            n = max(len(ids), 1)
            e = (sigm[np.minimum(ia, n - 1)]
                 == sigm[np.minimum(ib, n - 1)]).mean(axis=1)
            out = g[["id_a", "id_b"]].copy()
            return out[e >= min_est]

        return pairs.map_batches(_est, batch_format="pandas")

    def rename(to: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({id_col: b[id_col], to: b["sig"]})
        return f

    pair_fields = {"id_a": id_type, "id_b": id_type}
    j1 = sorted_join(pairs, sig_rows.map_batches(
        rename("sig_a"), batch_format="pyarrow"),
        left_on="id_a", right_on=id_col,
        left_fields=pair_fields,
        right_fields={id_col: id_type, "sig_a": pa.binary()},
        coalesce_left=16)
    j2 = sorted_join(j1, sig_rows.map_batches(
        rename("sig_b"), batch_format="pyarrow"),
        left_on="id_b", right_on=id_col,
        left_fields={**pair_fields, "sig_a": pa.binary()},
        right_fields={id_col: id_type, "sig_b": pa.binary()},
        coalesce_left=16)

    id_dtype = object if pa.types.is_string(id_type) else np.int64

    def est(g: pd.DataFrame) -> pd.DataFrame:
        if "id_a" not in g.columns:  # schema-less empty sort partition
            return pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                                 "id_b": pd.Series([], dtype=id_dtype)})
        g = g.drop_duplicates(["id_a", "id_b"])
        a = _sig_matrix(g["sig_a"])
        b = _sig_matrix(g["sig_b"])
        e = (a == b).mean(axis=1) if len(g) else np.empty(0)
        out = g[["id_a", "id_b"]].copy()
        return out[e >= min_est]

    return j2.map_batches(est, batch_format="pandas")


def ngram_jaccard_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5,
                        threshold: float = 0.5, num_perm: int = 64,
                        bands: int = 16,
                        est_margin: float = 0.25,
                        pair_mode: str = "star") -> ray.data.Dataset:
    """The full near-dup pipeline, Dataset end to end: one signature pass
    over the corpus -> banded LSH candidates -> SIGNATURE-estimate prune
    (keep est >= threshold - est_margin; for a true-jaccard-``threshold``
    pair the estimate is Binomial(num_perm, threshold)/num_perm, so at the
    defaults the false-negative probability per true pair is ~1e-4) ->
    exact shingle-set verification of the survivors only.  Shingle payloads
    move only for plausible pairs; candidate pairs and signatures stay in
    the object store.

    ``pair_mode``: ``"star"`` (default) emits each bucket's hub-spoke
    pairs — linear in bucket size, sufficient for clustering consumers
    (components through the hub).  ``"all"`` emits the full within-bucket
    pair set, so the result is the complete set of near-dup PAIRS at
    ``threshold`` (what a pair-level report/oracle needs)."""
    from .join import _fields_of

    sigs = minhash_signature_rows(ds, text_col=text_col, id_col=id_col,
                                  num_perm=num_perm,
                                  shingle_k=shingle_k).materialize()
    min_est = max(0.0, threshold - est_margin)
    if sigs.size_bytes() <= _BROADCAST_JOIN_BUDGET_BYTES:
        plausible = _fused_lsh_pairs(sigs, bands=bands, id_col=id_col,
                                     pair_mode=pair_mode, min_est=min_est)
    else:
        cand = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col,
                                 num_perm=num_perm, bands=bands,
                                 shingle_k=shingle_k, sig_rows=sigs,
                                 pair_mode=pair_mode,
                                 distinct=False)
        plausible = signature_filter_pairs(cand, sigs, id_col=id_col,
                                           min_est=min_est)
    return verify_pairs_jaccard(ds, plausible, text_col=text_col,
                                id_col=id_col, shingle_k=shingle_k,
                                threshold=threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class _SimHash:
    """64-bit SimHash over token hashes.  Token hashing is vectorized over
    the batch's UNIQUE tokens (rolling polynomial hash), bit-votes per doc
    via one popcount-style matrix reduction."""

    def __init__(self, text_col: str, id_col: str):
        import re
        self.tok = re.compile(r"[A-Za-z0-9_]+")
        self.text_col, self.id_col = text_col, id_col
        self.bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    @staticmethod
    def _hash_tokens(tokens: list[str]) -> np.ndarray:
        """uint64 hash per token — one vectorized flat-buffer pass
        (:func:`..functions.hashing.token_hashes`), bit-identical to the
        per-token rolling polynomial over bytes."""
        return token_hashes(tokens)

    def simhash_batch(self, texts: list[str]) -> np.ndarray:
        toks = [self.tok.findall((t or "").lower()) for t in texts]
        n = len(texts)
        counts = np.fromiter(map(len, toks), dtype=np.int64, count=n)
        flat = [t for ws in toks for t in ws]
        codes, vocab = pd.factorize(np.asarray(flat, dtype=object))
        if not len(vocab):
            return np.zeros(n, dtype=np.uint64)
        # hash the batch's UNIQUE tokens once, then one segmented bit-vote
        # reduction over all docs (no per-doc Python)
        vh = self._hash_tokens(list(vocab))
        vbits = ((vh[:, None] & self.bits[None, :]) != 0).astype(np.int64)
        starts = np.cumsum(counts) - counts
        votes = np.zeros((n, 64), dtype=np.int64)
        ne = counts > 0
        if ne.any():
            votes[ne] = np.add.reduceat(vbits[codes], starts[ne], axis=0)
        return (((votes * 2) > counts[:, None]) *
                self.bits[None, :]).sum(axis=1, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sh = self.simhash_batch(texts)
        return pa.table({
            self.id_col: batch[self.id_col],
            "simhash": pa.array(sh.astype(np.int64)),
        })


def simhash_signatures(ds: ray.data.Dataset, *, text_col: str = "text",
                       id_col: str = "doc_id",
                       concurrency=None) -> ray.data.Dataset:
    return ds.select_columns([id_col, text_col]).map_batches(
        stage_task(_SimHash), batch_format="pyarrow",
        fn_kwargs=dict(_args=(text_col, id_col)))


def simhash_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  bucket_cap: int = 1024) -> ray.data.Dataset:
    """Pairs within ``max_hamming`` bits: byte-band blocking (8 bands of 8
    bits; any pair at distance < 8 shares >= 1 identical band by
    pigeonhole) then exact popcount verify inside each bucket.  Bucket
    verification is TILED at ``bucket_cap`` rows, so a hot bucket (mass
    duplicates) never allocates more than cap^2 pair temporaries at once
    while still emitting the exact pair set."""
    sigs = simhash_signatures(ds, text_col=text_col, id_col=id_col)

    def explode_bands(b: pa.Table) -> pa.Table:
        sh = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sh)
        vals = np.stack([(sh >> np.uint64(8 * i)) & np.uint64(0xFF)
                         for i in range(8)], axis=1)
        return pa.table({
            id_col: b[id_col].take(pa.array(np.repeat(np.arange(n), 8))),
            "simhash": pa.array(np.repeat(sh.astype(np.int64), 8)),
            "band_id": pa.array(np.tile(np.arange(8, dtype=np.int32), n)),
            "band_val": pa.array(vals.ravel().astype(np.int32)),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_val", id_col], kind="stable")
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        bucket = (g["band_id"].to_numpy().astype(np.int64) << 32) \
            | g["band_val"].to_numpy().astype(np.int64)
        starts = np.nonzero(np.concatenate([[True],
                                            bucket[1:] != bucket[:-1]]))[0]
        starts = np.append(starts, len(bucket))
        out = []

        def emit(ia, ib):
            x = sh[ia] ^ sh[ib]
            # vectorized popcount via byte table
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                                axis=1).sum(axis=1)
            m = ham <= max_hamming
            if m.any():
                out.append(pd.DataFrame({
                    "id_a": ids[ia[m]], "id_b": ids[ib[m]],
                    "hamming": ham[m].astype(np.int64)}))

        from ..functions.pairs import capped_slice_tiles, tile_pair_indices
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s < 2:
                continue
            for a, b in capped_slice_tiles(e - s, bucket_cap):
                ia, ib = tile_pair_indices(a, b)
                emit(s + a.start + ia, s + b.start + ib)
        if not out:
            return pd.DataFrame({"id_a": pd.Series([], dtype=ids.dtype),
                                 "id_b": pd.Series([], dtype=ids.dtype),
                                 "hamming": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    pairs = sorted_block_reduce(
        sigs.map_batches(explode_bands, batch_format="pyarrow"),
        ["band_id", "band_val"], bucket_pairs)
    return sorted_block_reduce(
        pairs, ["id_a", "id_b"],
        lambda g: g.drop_duplicates(["id_a", "id_b"]))


def neardup_clusters(ds: ray.data.Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id", shingle_k: int = 5,
                     threshold: float = 0.8, num_perm: int = 64,
                     bands: int = 16) -> ray.data.Dataset:
    """Near-duplicate CLUSTERING — the consumer of the pair pipeline: run
    :func:`ngram_jaccard_pairs`, take the verified edges' connected
    components (transitive closure: A~B and B~C cluster A,B,C even when
    A!~C), and label every document with its component's min id.

    Output: (id, cluster_id, is_canonical) — dedup keeps the canonical
    row per cluster.  The union-find runs in ONE Ray task over the edge
    tables (edges are verified near-dup pairs — orders of magnitude fewer
    than documents; same bounded envelope as the pair distinct); the
    corpus-wide labeling is a broadcast map, no shuffle."""
    import ray as _ray

    pairs = ngram_jaccard_pairs(ds, text_col=text_col, id_col=id_col,
                                shingle_k=shingle_k, threshold=threshold,
                                num_perm=num_perm,
                                bands=bands).materialize()

    @_ray.remote
    def _components(*tbls):
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for t in tbls:
            if not t.num_rows or "id_a" not in t.column_names:
                continue
            for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
                ra, rb = find(a), find(b)
                if ra != rb:  # attach the LARGER root under the smaller,
                    parent[max(ra, rb)] = min(ra, rb)  # root = min id
        return {x: find(x) for x in list(parent)}

    labels = _ray.get(_components.remote(*pairs.to_arrow_refs()))
    keys = np.array(sorted(labels), dtype=np.int64)
    vals = np.array([labels[k] for k in keys], dtype=np.int64)
    lut_ref = _ray.put((keys, vals))

    def assign(b: pa.Table) -> pa.Table:
        """Vectorized sorted-array label lookup (no per-row Python): ids
        outside the (bounded) candidate set keep their own id.  Plain task
        map — the lookup ray.get is a zero-copy plasma read."""
        keys, vals = _ray.get(lut_ref)
        if not pa.types.is_integer(b[id_col].type):
            # generic (string-id) fallback: pandas vectorized map
            sids = b[id_col].to_pandas()
            lut = dict(zip(keys.tolist(), vals.tolist()))
            cl = sids.map(lambda i: lut.get(i, i))
            return pa.table({
                id_col: b[id_col],
                "cluster_id": pa.array(cl).cast(b[id_col].type),
                "is_canonical": pa.array((cl == sids).to_numpy())})
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) == 0:
            cluster = ids
        else:
            idx = np.minimum(np.searchsorted(keys, ids),
                             len(keys) - 1)
            cluster = np.where(keys[idx] == ids,
                               vals[idx], ids)
        return pa.table({
            id_col: b[id_col],
            "cluster_id": pa.array(cluster).cast(b[id_col].type),
            "is_canonical": pa.array(cluster == ids),
        })

    return ds.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow", batch_size=None)


def incremental_dedup(base: ray.data.Dataset, incoming: ray.data.Dataset, *,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Snapshot-delta dedup for a continuously growing corpus: keep each
    INCOMING document whose content neither appears in the BASE snapshot
    nor earlier (smaller id) within the incoming batch itself.

    Distribution shape: both sides ship only per-batch content-hash
    PARTIALS (one row per distinct text per batch, role-tagged); one
    shuffle on the 128-bit hash co-locates a content's whole history, and
    the reducer keeps the min incoming id of groups with zero base rows.
    Neither corpus's text ever moves — at 10^12 base rows the exchange is
    bounded by distinct content per batch, and the base side can be
    replaced by a precomputed hash table read (same schema)."""

    def tag(role: int):
        def f(b: pa.Table) -> pa.Table:
            p = _content_hash_partial(b, text_col=text_col, id_col=id_col)
            return p.append_column("role__", pa.array(
                np.full(len(p), role, dtype=np.int8)))
        return f

    u = base.select_columns([id_col, text_col]).map_batches(
        tag(0), batch_format="pyarrow", batch_size=None).union(
        incoming.select_columns([id_col, text_col]).map_batches(
            tag(1), batch_format="pyarrow", batch_size=None))

    def keep_new(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["h1", "h2"], sort=False).agg(
            n_base=("role__", lambda r: int((r == 0).sum())),
            min_inc=("min_id", "min")).reset_index()
        # min_id of a mixed group may come from the base side; recompute
        # the incoming-side min explicitly
        inc = g[g["role__"] == 1].groupby(["h1", "h2"], sort=False) \
            .agg(min_inc=("min_id", "min"), n_inc=("role__", "size")) \
            .reset_index()
        merged = inc.merge(agg[["h1", "h2", "n_base"]], on=["h1", "h2"])
        out = merged[merged["n_base"] == 0][["min_inc"]] \
            .rename(columns={"min_inc": id_col})
        out[id_col] = out[id_col].astype("int64")
        return out

    return sorted_block_reduce(u, ["h1", "h2"], keep_new)


# ---------------------------------------------------------------------------
# benchmark-contamination check (exact n-gram overlap vs a broadcast set)
# ---------------------------------------------------------------------------

def _pack_shingles_batch(texts, k: int = 5):
    """Vectorized exact k-gram extraction for a WHOLE batch of ASCII
    texts: one concatenated byte buffer, one sliding-window view, k bytes
    packed bijectively into a uint64 (k <= 8 — no hashing, no collisions).
    Returns (doc_idx, packed) with per-doc DISTINCT shingles."""
    enc = [t.encode() if t else b"" for t in texts]
    lens = np.fromiter(map(len, enc), dtype=np.int64, count=len(enc))
    nsh = np.maximum(lens - (k - 1), 0)
    total = int(nsh.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    data = np.frombuffer(b"".join(enc), dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(data, k)
    starts = np.cumsum(lens) - lens
    local = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(nsh) - nsh, nsh)
    abs_pos = np.repeat(starts, nsh) + local
    pows = (np.uint64(256) ** np.arange(k, dtype=np.uint64))
    packed = (win[abs_pos].astype(np.uint64) * pows[None, :]) \
        .sum(axis=1, dtype=np.uint64)
    doc_idx = np.repeat(np.arange(len(enc), dtype=np.int64), nsh)
    # per-doc distinct: unique on the fused (doc, shingle) key
    key = doc_idx.astype(np.uint64) * (np.uint64(1) << np.uint64(40)) + packed
    uk = np.unique(key)
    return ((uk >> np.uint64(40)).astype(np.int64),
            uk & np.uint64((1 << 40) - 1))


def contamination_check(ds, bench_packs: np.ndarray, *, k: int = 5,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold_num: int = 1, threshold_den: int = 4):
    """Benchmark-contamination scan (the decontamination step of every
    LLM training pipeline): per document, the fraction of its DISTINCT
    k-gram shingles that appear in the benchmark shingle set.  A doc is
    ``contaminated`` when ``n_hit / n_sh >= threshold_num/threshold_den``
    — evaluated as the integer cross-product, no float threshold.

    The benchmark set rides ``ray.put`` ONCE (sorted uint64 array, read
    per actor) — a pure streaming map over the corpus, no shuffle.
    Shingles are exact packed bytes (``_pack_shingles_batch``), so DuckDB
    ``substring``-based SQL reproduces counts exactly (ASCII corpora;
    packing is byte-wise)."""
    import ray
    import ray.data

    bench_ref = ray.put(np.sort(np.asarray(bench_packs, dtype=np.uint64)))
    tn, td = int(threshold_num), int(threshold_den)

    def scan(b: pa.Table) -> pa.Table:
            bench = ray.get(bench_ref)
            texts = b[text_col].to_pylist()
            ids = b[id_col].to_numpy()
            doc_idx, packed = _pack_shingles_batch(texts, k)
            n_sh = np.bincount(doc_idx, minlength=len(texts)) \
                .astype(np.int64)
            hit = np.zeros(len(packed), dtype=bool)
            if len(bench) and len(packed):
                pos = np.searchsorted(bench, packed)
                pos = np.minimum(pos, len(bench) - 1)
                hit = bench[pos] == packed
            n_hit = np.zeros(len(texts), dtype=np.int64)
            np.add.at(n_hit, doc_idx[hit], 1)
            contamination = np.where(
                n_sh == 0, 0.0,
                n_hit.astype(np.float64) / np.maximum(n_sh, 1))
            flag = (n_hit * td >= n_sh * tn) & (n_sh > 0)
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "n_sh": pa.array(n_sh),
                "n_hit": pa.array(n_hit),
                "contamination": pa.array(contamination, pa.float64()),
                "contaminated": pa.array(flag)})

    return ds.map_batches(scan, batch_format="pyarrow")


def benchmark_packs(ds, *, k: int = 5, text_col: str = "text") -> np.ndarray:
    """DISTINCT packed shingles of a (small) benchmark dataset: per-batch
    distinct partials, driver-side union (bounded by the benchmark's
    vocabulary of k-grams, not its row count)."""

    def partial(b: pa.Table) -> pa.Table:
        _, packed = _pack_shingles_batch(b[text_col].to_pylist(), k)
        return pa.table({"p": pa.array(np.unique(packed), pa.uint64())})

    col = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=None).to_pandas()["p"]
    if len(col) == 0:
        return np.empty(0, np.uint64)
    return np.unique(col.to_numpy().astype(np.uint64))


def decontaminate_exact(ds, blocklist, *, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Exact corpus subtraction (the decontamination sibling of the
    n-gram ``contamination_check``): drop every document whose text
    byte-equals some blocklist document's text.  The blocklist's 128-bit
    content hashes (``content_hashes`` — the engine's text-identity
    convention, same as exact_dedup) are collected small and broadcast via
    ``ray.put``; the corpus streams through one anti-semi-join batch map
    (vectorized pandas two-column merge) — no shuffle, no text movement."""
    import ray
    import ray.data

    def bl_partial(b: pa.Table) -> pa.Table:
        h1, h2 = content_hashes(b[text_col])
        t = pa.table({"h1": pa.array(h1, pa.uint64()),
                      "h2": pa.array(h2, pa.uint64())})
        return t

    bl = blocklist.map_batches(bl_partial, batch_format="pyarrow",
                               batch_size=None).to_pandas() \
        .drop_duplicates()
    bl_ref = ray.put(bl)

    def flt(b: pa.Table) -> pa.Table:
        h1, h2 = content_hashes(b[text_col])
        probe = pd.DataFrame({"h1": h1, "h2": h2})
        hit = probe.merge(ray.get(bl_ref), on=["h1", "h2"], how="left",
                          indicator=True)["_merge"] \
            .eq("both").to_numpy()
        return b.filter(pa.array(~hit))

    return ds.map_batches(flt, batch_format="pyarrow")


def decontaminate_bloom(ds, blocklist, *, text_col: str = "text",
                        id_col: str = "doc_id", m_bits: int = 1 << 23,
                        k_hashes: int = 4):
    """Bloom-prefiltered decontamination — the anti-join prefilter
    pattern for 100-TB corpora: a fixed ``m_bits``-bit Bloom filter
    (k splitmix64-derived probes over the 128-bit content hash) is built
    from the blocklist and broadcast ONCE (m_bits/8 bytes — 1 MiB at the
    default — regardless of blocklist cardinality; fp rate ≈
    (1 - e^{-kn/m})^k); the corpus streams through a bitmap membership
    test that clears the overwhelming majority of rows with zero join
    work, and only the Bloom HITS (true matches + false positives,
    ~|blocklist| + n·fp_rate rows) go through the exact (h1, h2) verify
    merge.  Output is therefore EXACTLY equal to
    :func:`decontaminate_exact` — the sketch only prunes work, never
    decides — which is what the oracle gate checks.  The verify side here
    broadcasts the pair table (size-gated, like the near-dup verify);
    past that budget it would become a sharded sorted join of the hits —
    a tiny input by construction."""
    import ray
    import ray.data

    from ..functions.hashing import splitmix64

    def _probes(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(k, n) bit positions: double hashing g_i = h1 + i*h2 (Kirsch &
        Mitzenmacher 2006), each re-mixed through splitmix64."""
        pos = np.empty((k_hashes, len(h1)), dtype=np.int64)
        for i in range(k_hashes):
            g = splitmix64(h1 + np.uint64(i) * h2)
            pos[i] = (g % np.uint64(m_bits)).astype(np.int64)
        return pos

    def bl_partial(b: pa.Table) -> pa.Table:
        h1, h2 = content_hashes(b[text_col])
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = _probes(h1, h2).ravel()
        np.bitwise_or.at(bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary()),
                         "h1": pa.array([h1.tobytes()], pa.binary()),
                         "h2": pa.array([h2.tobytes()], pa.binary())})

    parts = blocklist.map_batches(bl_partial, batch_format="pyarrow",
                                  batch_size=None).to_pandas()
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for buf in parts["bits"]:
        bits |= np.frombuffer(buf, dtype=np.uint8)
    exact = pd.DataFrame({
        "h1": np.frombuffer(b"".join(parts["h1"]), dtype=np.uint64),
        "h2": np.frombuffer(b"".join(parts["h2"]), dtype=np.uint64),
    }).drop_duplicates()
    bits_ref = ray.put(bits)
    exact_ref = ray.put(exact)

    def flt(b: pa.Table) -> pa.Table:
        h1, h2 = content_hashes(b[text_col])
        bm = ray.get(bits_ref)
        pos = _probes(h1, h2)
        maybe = np.ones(len(h1), dtype=bool)
        for i in range(k_hashes):      # all k bits set => Bloom hit
            maybe &= (bm[pos[i] >> 3]
                      & (np.uint8(1) << (pos[i] & 7).astype(np.uint8))) != 0
        hit = np.zeros(len(h1), dtype=bool)
        if maybe.any():                # exact verify ONLY the Bloom hits
            probe = pd.DataFrame({"h1": h1[maybe], "h2": h2[maybe]})
            hit[maybe] = probe.merge(
                ray.get(exact_ref), on=["h1", "h2"], how="left",
                indicator=True)["_merge"].eq("both").to_numpy()
        return b.filter(pa.array(~hit))

    return ds.map_batches(flt, batch_format="pyarrow")


def dedup_keep_best(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup with QUALITY-AWARE canonical selection: one row per
    distinct text, keeping the member with the highest
    :class:`..text.QualityScore` (ties: smallest id) instead of blindly
    the min id — the curation-grade variant of :func:`exact_dedup`.
    Same bounded shuffle shape: each batch ships one (content-hash,
    local-best, local-count) partial per group it contains, so a
    million-way-duplicated document still moves one row per batch.
    Output: (doc_id, quality, dup_count) of the kept member."""
    import pandas as pd

    from ..stages.text import QualityScore
    from .shuffle import sorted_block_reduce

    scorer = QualityScore(text_col=text_col, id_col=id_col)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = scorer(b)["quality"].to_numpy()
        h1, h2 = content_hashes(pa.array(b[text_col].fillna("")))
        df = pd.DataFrame({"h1": h1.view(np.int64), "h2": h2.view(np.int64),
                           "doc_id": b[id_col].to_numpy(),
                           "quality": q})
        df = df.sort_values(["h1", "h2", "quality", "doc_id"],
                            ascending=[True, True, False, True],
                            kind="stable")
        g = df.groupby(["h1", "h2"], sort=False)
        best = g.head(1).copy()
        best["dup_count"] = g.size().to_numpy()
        return best

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h1", "h2", "quality", "doc_id"],
                          ascending=[True, True, False, True],
                          kind="stable")
        gg = g.groupby(["h1", "h2"], sort=False)
        best = gg.head(1).copy()
        best["dup_count"] = gg["dup_count"].sum().to_numpy()
        return best[["doc_id", "quality", "dup_count"]].astype(
            {"doc_id": np.int64, "dup_count": np.int64})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    return sorted_block_reduce(parts, ["h1", "h2"], combine)


def _edit1_verify(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact check d_edit(a[i], b[i]) <= 1 for two equal-length
    object arrays of strings.  Same length => at most one differing
    position; length diff 1 => one-gap subsequence (prefix/suffix match
    around the first mismatch); length diff > 1 => False.  Works on padded
    uint8 byte matrices — no per-pair Python comparisons."""
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=bool)
    la = np.fromiter((len(s) for s in a), np.int64, n)
    lb = np.fromiter((len(s) for s in b), np.int64, n)
    w = int(max(la.max(), lb.max())) + 1
    am = np.zeros((n, w), dtype=np.uint8)
    bm = np.zeros((n, w), dtype=np.uint8)
    for i in range(n):                      # fill loop only; compares are
        ab = a[i].encode()                  # matrix ops below
        bb = b[i].encode()
        am[i, :len(ab)] = np.frombuffer(ab, np.uint8)
        bm[i, :len(bb)] = np.frombuffer(bb, np.uint8)
    same_len = la == lb
    diff = am != bm
    ndiff = diff.sum(axis=1)
    ok_same = same_len & (ndiff <= 1)
    # length difference exactly 1: align the longer's suffix one left of
    # the first mismatch and require equality from there on
    lo = np.where(la < lb, la, lb)
    swap = la > lb                          # make A the shorter row
    sm = np.where(swap[:, None], bm, am)
    lm = np.where(swap[:, None], am, bm)
    first = np.argmax(sm != lm, axis=1)     # first differing column
    idx = np.arange(w)
    # compare shorter[first:] with longer[first+1:]
    sh_tail = np.take_along_axis(sm, np.minimum(idx[None, :] + first[:, None],
                                                w - 1), axis=1)
    lg_tail = np.take_along_axis(lm, np.minimum(idx[None, :] + first[:, None]
                                                + 1, w - 1), axis=1)
    valid = idx[None, :] + first[:, None] < lo[:, None]
    ok_gap = (np.abs(la - lb) == 1) & ((sh_tail == lg_tail) | ~valid).all(axis=1)
    return ok_same | ok_gap


def edit1_join(ds: ray.data.Dataset, *, string_col: str = "s"
               ) -> ray.data.Dataset:
    """Edit-distance-<=1 similarity self-join over DISTINCT strings — the
    character-level sibling of the shingle-Jaccard near-dup join, via
    FastSS deletion-neighborhood blocking (Bocek et al. 2007): every
    string emits itself + its 1-deletion variants as bucket keys; any pair
    within edit distance 1 shares at least one key (equal / insertion /
    deletion via the variant, substitution via deleting the differing
    position from both), so bucket-local pairing is a complete candidate
    generator, then :func:`_edit1_verify` keeps the true pairs.  A pair
    can share several variants — dedup by a canonical (sa < sb) distinct.
    Output: (s_a, s_b) distinct true pairs.  Shuffle moves (variant, s)
    string rows: ~(avg_len+1) x distinct strings."""
    import pandas as pd

    from .shuffle import sorted_block_reduce

    def variants(b: pa.Table) -> pa.Table:
        out_k, out_s = [], []
        for s in b[string_col].to_pylist():
            s = s or ""
            out_k.append(s)
            out_s.append(s)
            for i in range(len(s)):
                out_k.append(s[:i] + s[i + 1:])
                out_s.append(s)
        return pa.table({"variant": pa.array(out_k, pa.string()),
                         "s": pa.array(out_s, pa.string())})

    fan = ds.map_batches(variants, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["variant", "s"], kind="stable")
        v = g["variant"].to_numpy()
        s = g["s"].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))
        ends = np.append(starts[1:], len(v))
        ii, jj = [], []
        for st, en in zip(starts, ends):    # bucket sizes are tiny
            m = en - st
            if m > 1:
                iu, ju = np.triu_indices(m, k=1)
                ii.append(iu + st)
                jj.append(ju + st)
        if not ii:
            return pd.DataFrame({"s_a": [], "s_b": []}).astype(str)
        ii = np.concatenate(ii)
        jj = np.concatenate(jj)
        sa, sb = s[ii], s[jj]
        ne = sa != sb
        sa, sb = sa[ne], sb[ne]
        lo = np.where(sa < sb, sa, sb)
        hi = np.where(sa < sb, sb, sa)
        keep = _edit1_verify(lo, hi)
        return pd.DataFrame({"s_a": lo[keep],
                             "s_b": hi[keep]}).drop_duplicates()

    pairs = sorted_block_reduce(fan, "variant", bucket_pairs)

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return sorted_block_reduce(pairs, ["s_a", "s_b"], dedup_pairs)


def fuzzy_decontaminate(corpus: ray.data.Dataset,
                        bench: ray.data.Dataset, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8, shingle_k: int = 5,
                        num_perm: int = 64, bands: int = 16,
                        broadcast_limit: int = 2_000_000
                        ) -> ray.data.Dataset:
    """FUZZY benchmark decontamination: drop every corpus document whose
    shingle-Jaccard with ANY benchmark document is >= ``threshold`` —
    the near-duplicate sibling of :func:`decontaminate_exact` (exact
    text equality misses paraphrases and light edits; the standard
    eval-set-leakage guard fuzzes the match).

    Composition over the existing near-dup machinery: benchmark ids are
    mapped NEGATIVE (``-(id+1)``) so one union table carries both sides
    through :func:`ngram_jaccard_pairs` (LSH candidates → signature
    prune → exact verify); cross pairs are exactly those with
    ``id_a < 0 <= id_b``.  The final anti-join is size-gated like
    graph_propagation's rank table: flagged ids up to
    ``broadcast_limit`` are collected and broadcast for a zero-shuffle
    streaming filter; above it (a heavily contaminated corpus) the
    corpus left-joins the distributed flagged-id set and keeps the
    unmatched rows — one shuffle, no driver materialization."""
    import ray
    import ray.data

    def tag_bench(b: pa.Table) -> pa.Table:
        i = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pa.array(-(i + 1)),
                         text_col: b[text_col]})

    u = corpus.select_columns([id_col, text_col]).union(
        bench.map_batches(tag_bench, batch_format="pyarrow"))
    pairs = ngram_jaccard_pairs(u, text_col=text_col, id_col=id_col,
                                shingle_k=shingle_k, threshold=threshold,
                                num_perm=num_perm, bands=bands,
                                pair_mode="all")

    def cross_only(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        bb = b["id_b"].to_numpy(zero_copy_only=False)
        keep = (a < 0) & (bb >= 0)       # pairs are emitted id_a < id_b
        return pa.table({"flagged_id__": pa.array(bb[keep].astype(np.int64))})

    flagged_ds = sorted_block_reduce(
        pairs.map_batches(cross_only, batch_format="pyarrow"),
        "flagged_id__", lambda g: g.drop_duplicates()).materialize()

    if flagged_ds.count() <= broadcast_limit:
        flagged = flagged_ds.to_pandas()["flagged_id__"].to_numpy()
        flag_ref = ray.put(np.sort(flagged.astype(np.int64)))

        def flt(b: pa.Table) -> pa.Table:
            bad = ray.get(flag_ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.filter(pa.array(~np.isin(ids, bad)))

        return corpus.map_batches(flt, batch_format="pyarrow")

    # contamination too large to broadcast: distributed anti-join —
    # left-join the corpus to the flagged set (plus an explicit marker
    # column, since sorted_join drops the right key), keep unmatched rows
    from .join import sorted_join
    marked = flagged_ds.map_batches(
        lambda b: b.append_column(
            "hit__", pa.array(np.ones(len(b), dtype=np.int8))),
        batch_format="pyarrow")
    j = sorted_join(corpus, marked, left_on=id_col,
                    right_on="flagged_id__", how="left",
                    right_fields={"flagged_id__": pa.int64(),
                                  "hit__": pa.int8()})

    def keep_unmatched(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out = b.filter(pc.is_null(b["hit__"]))
        return out.drop_columns(["hit__"])

    return j.map_batches(keep_unmatched, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-document duplicate n-gram coverage (ExactSubstr-style dedup metric)
# ---------------------------------------------------------------------------

NGRAM_BASE = np.uint64(0x100000001B3)   # same odd base as the doc fingerprint


def ngram_dup_coverage(ds: ray.data.Dataset, *, n: int = 8,
                       text_col: str = "text", id_col: str = "doc_id"
                       ) -> ray.data.Dataset:
    """Per-document CROSS-document duplicate n-gram coverage — the
    window-hash form of the ExactSubstr dedup statistic (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): a
    token window of length ``n`` is duplicated if the identical window
    appears in ≥2 DISTINCT documents; a document's coverage is the
    token count of the UNION of its duplicated windows.

    Output (docs with ≥1 duplicated window only):
    ``(doc_id, n_tokens, dup_windows, covered, dup_ratio)``.

    Distributed shape & cost: window hashes are a vectorized Horner pass
    over the flat token-hash array (no per-doc Python); the gram-keyed
    shuffle moves one row per window — O(corpus tokens), the inherent
    cost of exact window dedup (the suffix-array approach pays the same
    linear shuffle in its sort) — then one doc-keyed shuffle computes
    the interval union per doc with vectorized gap arithmetic.  All
    hashes are the token-hash + polynomial combine pair that
    functions/hashing.py emits SQL twins for, so the whole statistic is
    value-hash gateable in DuckDB."""
    import re as _re

    from .text import TOKEN_RE, _flat_tokens
    tok = _re.compile(TOKEN_RE)
    B = NGRAM_BASE

    def windows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.findall(tok)
        flat, counts, starts = _flat_tokens(toks)
        total = int(counts.sum())
        empty = pd.DataFrame({
            "gram": np.empty(0, np.int64),
            id_col: np.empty(0, np.int64),
            "pos": np.empty(0, np.int64), "dl": np.empty(0, np.int64)})
        if total < n:
            return empty
        th = token_hashes(flat)
        m = total - n + 1
        with np.errstate(over="ignore"):
            acc = th[:m].copy()
            for i in range(1, n):
                acc = acc * B + th[i:m + i]
        doc_ix = np.repeat(np.arange(len(counts)), counts)[:m]
        local = (np.arange(m) - starts[doc_ix]).astype(np.int64)
        valid = local <= (counts[doc_ix] - n)
        if not valid.any():
            return empty
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "gram": acc[valid].view(np.int64),
            id_col: ids[doc_ix[valid]],
            "pos": local[valid] + 1,                      # 1-based
            "dl": counts[doc_ix[valid]].astype(np.int64)})

    rows = ds.map_batches(windows, batch_format="pandas", batch_size=None)

    def dup_only(g: pd.DataFrame) -> pd.DataFrame:
        if "gram" not in g.columns or not len(g):
            return g
        keep = g.groupby("gram")[id_col].transform("nunique") >= 2
        return g[keep.to_numpy()]

    dup = sorted_block_reduce(rows, "gram", dup_only)

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        if id_col not in g.columns or not len(g):
            return pd.DataFrame({
                id_col: np.empty(0, np.int64),
                "n_tokens": np.empty(0, np.int64),
                "dup_windows": np.empty(0, np.int64),
                "covered": np.empty(0, np.int64),
                "dup_ratio": np.empty(0, np.float64)})
        g = g.drop_duplicates([id_col, "pos"]) \
            .sort_values([id_col, "pos"])
        nxt = g.groupby(id_col)["pos"].shift(-1)
        gap = (nxt - g["pos"]).fillna(n).to_numpy()
        contrib = np.minimum(np.int64(n), gap.astype(np.int64))
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(), "c_": contrib,
            "dl": g["dl"].to_numpy()})
        agg = out.groupby(id_col, as_index=False).agg(
            n_tokens=("dl", "first"), dup_windows=("c_", "size"),
            covered=("c_", "sum"))
        agg["n_tokens"] = agg["n_tokens"].astype(np.int64)
        agg["dup_windows"] = agg["dup_windows"].astype(np.int64)
        agg["covered"] = agg["covered"].astype(np.int64)
        agg["dup_ratio"] = (agg["covered"].to_numpy().astype(np.float64)
                            / agg["n_tokens"].to_numpy()
                            .astype(np.float64))
        return agg

    return sorted_block_reduce(dup, id_col, coverage)
