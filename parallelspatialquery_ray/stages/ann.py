"""Approximate / exact nearest-neighbor search over an embedding column.

Over the `embeddings` table (``vec_id: int64, embedding: list<float>``):

- :func:`cosine_topk` — exact brute-force cosine top-k with the scalable
  shape: the query matrix is broadcast once (``ray.put``), every batch does
  one numpy matmul and emits only its LOCAL top-k per query (a combiner),
  and a tiny ``groupby(query_id)`` merge finds the global top-k.  Shuffle
  volume is O(n_queries * k * n_blocks), independent of dataset size.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH buckets;
  each batch only scores vectors whose bucket falls in the query's
  multi-probe set.  Approximate; recall measured in tests.
- :func:`embedding_neardup_pairs` — embedding-cosine near-duplicate
  detection via the same LSH bucketing (pairs above a similarity
  threshold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .shuffle import stage_task


def _to_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """Embedding column -> (n, d) matrix.  Handles list<float>,
    fixed_size_list<float> and Ray's Arrow tensor extension chunks."""
    arrs = []
    for chunk in col.chunks:
        if isinstance(chunk, (pa.ListArray, pa.LargeListArray)):
            flat = chunk.flatten().to_numpy(zero_copy_only=False)
            offs = chunk.offsets.to_numpy(zero_copy_only=False)
            d = offs[1] - offs[0] if len(offs) > 1 else 0
            arrs.append(flat.reshape(len(chunk), int(d)))
        elif isinstance(chunk, pa.FixedSizeListArray):
            flat = chunk.values.to_numpy(zero_copy_only=False)
            arrs.append(flat.reshape(len(chunk), chunk.type.list_size))
        else:  # e.g. ray.data tensor extension: to_numpy gives (n, d)
            arrs.append(np.asarray(chunk.to_numpy(zero_copy_only=False)))
    return np.vstack(arrs) if arrs else np.empty((0, 0), dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _CosineTopK:
    """Actor-pool stage: normalized query matrix fetched once per actor."""

    def __init__(self, q_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(q_ref)
        self.qids, self.qm = q["ids"], q["matrix"]  # already normalized
        self.round = q.get("round")
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(m) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "similarity": pa.array([], pa.float64())})
        sims = self.qm @ m.T                         # (nq, nb)
        if self.round is not None:
            # oracle mode: rank by ROUNDED similarity (+ vec_id ties) so
            # the ordering is reproducible across numerics stacks — a
            # 1-ulp cross-system difference in a near-tie can no longer
            # flip ranks (SQL twin rounds identically)
            sims = np.round(sims, self.round)
        kk = min(self.k, sims.shape[1])
        # deterministic LOCAL top-k under ties: order columns by vec_id,
        # then a stable descending sort — argpartition would keep an
        # arbitrary subset of vectors tied at the kk-th similarity and
        # could drop the smallest-vec_id member before the global merge
        # (rounded similarities make such boundary ties likely)
        col_order = np.argsort(ids, kind="stable")
        sel = np.argsort(-sims[:, col_order], axis=1,
                         kind="stable")[:, :kk]
        part = col_order[sel]
        ps = np.take_along_axis(sims, part, axis=1)
        nq = len(self.qids)
        return pa.table({
            "query_id": pa.array(np.repeat(self.qids, kk), pa.int64()),
            "vec_id": pa.array(ids[part.ravel()]),
            "similarity": pa.array(ps.ravel(), pa.float64()),
        })


# Partial-result tables at or under this size merge in ONE remote task
# instead of a sort shuffle (the per-block top-k partials are bounded by
# n_queries x k x n_blocks rows, tiny relative to the corpus; only at
# extreme block counts does the sharded merge engage).
_MERGE_BUDGET_BYTES = 1 << 30


def _merge_topk(local: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """Global per-query top-k over the local (per-block) top-k partials.
    Size-gated: single-task merge under the budget, sorted shuffle above."""
    from .shuffle import sorted_block_reduce

    local = local.materialize()
    merge = _merge_topk_factory(k)
    if local.size_bytes() > _MERGE_BUDGET_BYTES:
        return sorted_block_reduce(local, "query_id", merge)

    @ray.remote
    def _task(*tbls):
        live = [t for t in tbls
                if t.num_rows and "query_id" in t.column_names]
        if not live:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int32()),
                             "vec_id": pa.array([], pa.int64()),
                             "similarity": pa.array([], pa.float64())})
        df = pa.concat_tables(live).to_pandas()
        return pa.Table.from_pandas(merge(df), preserve_index=False)

    return ray.data.from_arrow_refs([_task.remote(*local.to_arrow_refs())])


def _merge_topk_factory(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # per-query global top-k by (-similarity, vec_id), every query of
        # the block reduced in one vectorized pass (sorted_block_reduce)
        g = g.sort_values(["query_id", "similarity", "vec_id"],
                          ascending=[True, False, True], kind="stable")
        g["rank"] = g.groupby("query_id", sort=False).cumcount() \
            .astype("int32")
        g = g[g["rank"] < k]
        return g[["query_id", "rank", "vec_id", "similarity"]]
    return merge


def cosine_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
                query_matrix: np.ndarray, k: int, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_decimals: int | None = None,
                concurrency=None) -> ray.data.Dataset:
    """Exact cosine top-k of each query vector against the whole dataset.
    Output: (query_id, rank, vec_id, similarity), rank by descending
    similarity with vec_id tie-break.  ``round_decimals`` rounds
    similarities BEFORE ranking (see _CosineTopK: cross-stack reproducible
    ordering for the SQL oracle)."""
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                   "matrix": _normalize(np.asarray(query_matrix)),
                   "round": round_decimals})
    local = ds.select_columns([id_col, vec_col]).map_batches(
        stage_task(_CosineTopK), batch_format="pyarrow",
        fn_kwargs=dict(_args=(ref, k, id_col, vec_col)))
    return _merge_topk(local, k)


# ---------------------------------------------------------------------------
# LSH variant (scale path)
# ---------------------------------------------------------------------------

def _hyperplanes(d: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, d))


def lsh_bucket(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per row (uint64, n_bits <= 32)."""
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)


def _probe_set(bucket: int, n_bits: int, probes: int) -> list[int]:
    """Multi-probe: the bucket plus all single-bit flips (probes<=n_bits)."""
    out = [bucket]
    for b in range(min(probes, n_bits)):
        out.append(bucket ^ (1 << b))
    return out


class _LshCosineTopK:
    """Actor-pool stage.  Per-actor precompute: the sorted array of all
    probed buckets and a (n_queries, n_probed_buckets) membership matrix —
    so per batch the candidate mask is two vectorized lookups
    (``np.isin`` + ``searchsorted`` gather), no Python membership tests."""

    def __init__(self, q_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(q_ref)
        self.qids, self.qm, self.planes = q["ids"], q["matrix"], q["planes"]
        self.round = q.get("round")
        self.k, self.id_col, self.vec_col = k, id_col, vec_col
        n_bits = self.planes.shape[0]
        qb = lsh_bucket(self.qm, self.planes)
        probe_lists = [_probe_set(int(b), n_bits, q["probes"]) for b in qb]
        self.all_probed = np.unique(np.concatenate(probe_lists).astype(
            np.uint64)) if probe_lists else np.empty(0, np.uint64)
        nq = len(self.qids)
        self.member = np.zeros((nq, len(self.all_probed)), dtype=bool)
        for qi, pl in enumerate(probe_lists):
            self.member[qi, np.searchsorted(
                self.all_probed, np.asarray(pl, dtype=np.uint64))] = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(m) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "similarity": pa.array([], pa.float64())})
        tb = lsh_bucket(m, self.planes)
        keep = np.isin(tb, self.all_probed)
        out_q, out_v, out_s = [], [], []
        if keep.any():
            mk, idk, tbk = m[keep], ids[keep], tb[keep]
            bidx = np.searchsorted(self.all_probed, tbk)
            cand = self.member[:, bidx]              # (nq, n_kept) bool
            sims = self.qm @ mk.T                    # (nq, n_kept)
            if self.round is not None:
                # oracle mode: rank by ROUNDED similarity (see _CosineTopK)
                sims = np.round(sims, self.round)
            masked = np.where(cand, sims, -2.0)      # below cosine range
            kk = min(self.k, masked.shape[1])
            part = np.argpartition(-masked, kk - 1, axis=1)[:, :kk]
            ps = np.take_along_axis(masked, part, axis=1)
            ok = ps > -1.5                           # drop non-candidates
            qi, pj = np.nonzero(ok)
            out_q.append(self.qids[qi])
            out_v.append(idk[part[qi, pj]])
            out_s.append(ps[qi, pj])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else [],
                                 pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v) if out_v else [],
                               pa.int64()),
            "similarity": pa.array(np.concatenate(out_s) if out_s else [],
                                   pa.float64()),
        })


def lsh_cosine_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
                    query_matrix: np.ndarray, k: int, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_bits: int = 12, probes: int = 12, seed: int = 11,
                    round_decimals: int | None = None,
                    concurrency=None) -> ray.data.Dataset:
    """Approximate cosine top-k: only vectors in the query's multi-probe LSH
    buckets are scored.  Candidate fraction ~ (1+probes)/2^n_bits.
    ``round_decimals``: oracle mode — rank by rounded similarity so a SQL
    twin with the same inlined hyperplanes reproduces the ordering."""
    qm = _normalize(np.asarray(query_matrix))
    planes = _hyperplanes(qm.shape[1], n_bits, seed)
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "matrix": qm,
                   "planes": planes, "probes": probes,
                   "round": round_decimals})
    local = ds.select_columns([id_col, vec_col]).map_batches(
        stage_task(_LshCosineTopK), batch_format="pyarrow",
        fn_kwargs=dict(_args=(ref, k, id_col, vec_col)))
    return _merge_topk(local, k)


# ---------------------------------------------------------------------------
# IVF variant (coarse k-means quantizer; the classic ANN scale path)
# ---------------------------------------------------------------------------


def ivf_train(ds: ray.data.Dataset, n_centroids: int = 64, *,
              iters: int = 5, vec_col: str = "embedding",
              seed: int = 11, sample: int = 4096) -> np.ndarray:
    """Distributed Lloyd iterations for the IVF coarse quantizer.

    Init: deterministic sample of the stream (first ``sample`` rows via
    ``limit`` — cheap, no shuffle), k-means++-free but seeded-shuffled.
    Each iteration is ONE ``map_batches`` pass emitting per-centroid
    partial (sum, count) — k x d floats per batch — combined on the driver
    (tiny); vectors never leave their blocks.  Returns L2-normalized
    centroids (n_centroids, d) for cosine search."""
    # one projected read, pinned in the object store for the iteration
    # loop (Ray spills if it outgrows memory) — without this every Lloyd
    # pass re-reads and re-decodes the source files
    vecs = ds.select_columns([vec_col]).materialize()

    if vecs.size_bytes() <= _MERGE_BUDGET_BYTES:
        # small-corpus path: gather the vectors once and run ALL Lloyd
        # iterations inside one remote task — iters driver round-trips
        # collapse to one.  Same init (first `sample` rows in dataset
        # order), same assignment/update math.
        @ray.remote
        def _train_local(*tbls):
            live = [t for t in tbls if t.num_rows]
            if not live:
                return np.empty((0, 0), dtype=np.float64)
            m = _normalize(_to_matrix(pa.concat_tables(live)[vec_col]))
            m0 = m[:sample]
            rng = np.random.default_rng(seed)
            k_eff = min(n_centroids, len(m0))
            cent = m0[rng.permutation(len(m0))[:k_eff]].copy()
            for _ in range(iters):
                a = np.argmax(m @ cent.T, axis=1)
                sums = np.zeros_like(cent)
                np.add.at(sums, a, m)
                counts = np.bincount(a, minlength=len(cent)).astype(float)
                has = counts > 0
                cent[has] = sums[has] / counts[has, None]
                cent = _normalize(cent)
            return cent

        return ray.get(_train_local.remote(*vecs.to_arrow_refs()))

    first = vecs.limit(sample)
    m0 = _normalize(_to_matrix(pa.Table.from_pandas(
        first.to_pandas())[vec_col]))
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(m0))
    cent = m0[rng.permutation(len(m0))[:n_centroids]].copy()

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partials(b: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _normalize(_to_matrix(b[vec_col]))
            if len(m) == 0:
                return pa.table({"cid": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.binary())})
            a = np.argmax(m @ c.T, axis=1)
            cids = np.unique(a)
            sums = np.zeros((len(cids), m.shape[1]))
            np.add.at(sums, np.searchsorted(cids, a), m)
            cnts = np.bincount(np.searchsorted(cids, a),
                               minlength=len(cids))
            return pa.table({
                "cid": pa.array(cids.astype(np.int64)),
                "cnt": pa.array(cnts.astype(np.int64)),
                "vsum": pa.array([sums[i].tobytes()
                                  for i in range(len(cids))], pa.binary()),
            })

        rows = pa.concat_tables(
            [t for t in ray.get(vecs.map_batches(
                partials, batch_format="pyarrow").to_arrow_refs())
             if t.num_rows])
        cid = rows["cid"].to_numpy(zero_copy_only=False)
        cnt = rows["cnt"].to_numpy(zero_copy_only=False)
        vs = np.frombuffer(b"".join(rows["vsum"].to_pylist())) \
            .reshape(len(cid), -1)
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent))
        np.add.at(sums, cid, vs)
        np.add.at(counts, cid, cnt)
        live = counts > 0
        cent[live] = sums[live] / counts[live, None]
        cent = _normalize(cent)
    return cent


class _IvfTopK:
    """Actor-pool IVF search: vectors whose nearest centroid is in a
    query's nprobe set are scored; same membership-matrix trick as the LSH
    stage (centroid ids instead of hash buckets)."""

    def __init__(self, q_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(q_ref)
        self.qids, self.qm, self.cent = q["ids"], q["matrix"], q["centroids"]
        self.round = q.get("round")
        self.k, self.id_col, self.vec_col = k, id_col, vec_col
        nprobe = min(q["nprobe"], len(self.cent))  # degrade to all lists
        pscore = self.qm @ self.cent.T
        if self.round is not None:
            # oracle mode: probe-set choice on ROUNDED scores, stable sort
            # -> ties break to the lowest centroid id, cross-stack stable
            pscore = np.round(pscore, self.round)
        order = np.argsort(-pscore, axis=1, kind="stable")[:, :nprobe]
        self.member = np.zeros((len(self.qids), len(self.cent)), dtype=bool)
        self.member[np.repeat(np.arange(len(self.qids)), nprobe),
                    order.ravel()] = True
        self.any_probed = self.member.any(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(m) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "similarity": pa.array([], pa.float64())})
        ascore = m @ self.cent.T
        if self.round is not None:
            # oracle mode: list assignment on ROUNDED scores (argmax tie
            # -> lowest centroid id, matching the SQL twin's row_number)
            ascore = np.round(ascore, self.round)
        assign = np.argmax(ascore, axis=1)
        keep = self.any_probed[assign]
        out_q, out_v, out_s = [], [], []
        if keep.any():
            mk, idk, ak = m[keep], ids[keep], assign[keep]
            cand = self.member[:, ak]               # (nq, n_kept)
            sims = self.qm @ mk.T
            if self.round is not None:
                sims = np.round(sims, self.round)
            masked = np.where(cand, sims, -2.0)
            kk = min(self.k, masked.shape[1])
            part = np.argpartition(-masked, kk - 1, axis=1)[:, :kk]
            ps = np.take_along_axis(masked, part, axis=1)
            ok = ps > -1.5
            qi, pj = np.nonzero(ok)
            out_q.append(self.qids[qi])
            out_v.append(idk[part[qi, pj]])
            out_s.append(ps[qi, pj])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else [],
                                 pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v) if out_v else [],
                               pa.int64()),
            "similarity": pa.array(np.concatenate(out_s) if out_s else [],
                                   pa.float64()),
        })


def ivf_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
             query_matrix: np.ndarray, k: int, *,
             centroids: np.ndarray | None = None, n_centroids: int = 64,
             nprobe: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", train_iters: int = 5,
             seed: int = 11, round_decimals: int | None = None,
             concurrency=None) -> ray.data.Dataset:
    """Approximate cosine top-k via an IVF coarse quantizer: only vectors
    assigned to one of each query's ``nprobe`` nearest centroids are
    scored (candidate fraction ~ nprobe/n_centroids on balanced lists).
    Pass ``centroids`` to reuse a trained quantizer; else trains one with
    :func:`ivf_train`.  ``round_decimals``: oracle mode — probe choice,
    list assignment and ranking all on rounded scores, so a SQL twin with
    the same inlined centroids reproduces the result exactly."""
    if centroids is None:
        centroids = ivf_train(ds, n_centroids, iters=train_iters,
                              vec_col=vec_col, seed=seed)
    qm = _normalize(np.asarray(query_matrix))
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                   "matrix": qm, "centroids": centroids, "nprobe": nprobe,
                   "round": round_decimals})
    local = ds.select_columns([id_col, vec_col]).map_batches(
        stage_task(_IvfTopK), batch_format="pyarrow",
        fn_kwargs=dict(_args=(ref, k, id_col, vec_col)))
    return _merge_topk(local, k)


# ---------------------------------------------------------------------------
# embedding near-dup pairs
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds: ray.data.Dataset, *, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding", n_bits: int = 10,
                            seed: int = 11, bucket_cap: int = 2048,
                            max_refine_depth: int = 4) -> ray.data.Dataset:
    """Near-duplicate pairs by cosine similarity >= threshold: bucket by
    random-hyperplane LSH (groupby shuffle of (bucket, id, vec) rows), score
    pairs inside each bucket.  High thresholds keep buckets honest; pairs
    split across buckets are missed with probability that shrinks as
    n_bits decreases (recall/efficiency knob).

    Skew guard: a bucket larger than ``bucket_cap`` is recursively REFINED
    with fresh hyperplanes (per-depth seed) before pairing — equivalent to
    locally raising n_bits, so a hot bucket never pays all-pairs on its
    full occupancy.  Crowds that refinement cannot split (near-identical
    vectors, which genuinely have quadratic output) are scored in
    ``bucket_cap``-sized TILES, bounding every similarity matrix to
    cap x cap regardless of bucket size."""

    def add_bucket(b: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(b[vec_col]))
        planes = _hyperplanes(m.shape[1] if m.size else 1, n_bits, seed)
        buckets = lsh_bucket(m, planes) if m.size else np.empty(0, np.uint64)
        return pa.table({
            id_col: b[id_col],
            vec_col: b[vec_col],
            "bucket": pa.array(buckets.astype(np.int64)),
        })

    from ..functions.pairs import capped_slice_tiles, tile_pair_indices

    def _emit_tiled(ids: np.ndarray, m: np.ndarray, out: list) -> None:
        for a, b in capped_slice_tiles(len(ids), bucket_cap):
            sims = m[a] @ m[b].T
            ia, ib = tile_pair_indices(a, b)
            s = sims[ia, ib]
            keep = s >= threshold
            if keep.any():
                x = ids[a][ia[keep]]
                y = ids[b][ib[keep]]
                out.append(pd.DataFrame({
                    "id_a": np.minimum(x, y),
                    "id_b": np.maximum(x, y),
                    "similarity": s[keep]}))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=ids.dtype),
                              "id_b": pd.Series([], dtype=ids.dtype),
                              "similarity": pd.Series([], dtype=float)})
        if len(ids) < 2:
            return empty
        m = _normalize(np.vstack(g[vec_col].to_numpy()))
        out: list = []
        stack = [(np.arange(len(ids)), 0)]
        while stack:
            idx, depth = stack.pop()
            if len(idx) < 2:
                continue
            if len(idx) <= bucket_cap or depth >= max_refine_depth:
                _emit_tiled(ids[idx], m[idx], out)
                continue
            planes = _hyperplanes(m.shape[1], n_bits, seed + 1000 + depth)
            sub = lsh_bucket(m[idx], planes)
            subs = np.unique(sub)
            if len(subs) == 1:  # refinement can't split: tile it
                _emit_tiled(ids[idx], m[idx], out)
                continue
            for sb in subs:
                stack.append((idx[sub == sb], depth + 1))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    from .shuffle import sorted_block_reduce
    return sorted_block_reduce(
        ds.select_columns([id_col, vec_col]).map_batches(
            add_bucket, batch_format="pyarrow"),
        "bucket", bucket_pairs)


def gram_matrix(ds: ray.data.Dataset, *, vec_col: str = "embedding",
                quant: int = 1 << 20) -> ray.data.Dataset:
    """EXACT quantized Gram matrix ``G = Qᵀ·Q`` of the embedding column —
    the PCA / covariance precursor, the textbook map-reduce matrix
    product: each batch contributes one d×d int64 partial (a single
    numpy matmul on ``floor(v·quant)`` integers), so the shuffle moves
    d(d+1)/2 rows per batch regardless of the corpus size, and integer
    accumulation makes the result order-independent and bit-equal to
    the SQL twin (float partials would depend on reduction order).

    Overflow envelope: |v| ≤ 1-ish embeddings → |q| ≤ quant, per-pair
    products ≤ quant², so a batch of B rows stays < 2^63 while
    B·quant² < 2^63 (B ≤ ~8e6 at the default quant).  Returns
    (i, j, s) for i ≤ j (G is symmetric), 0-based, sorted."""
    from .shuffle import sorted_block_reduce

    def partial(b: pa.Table) -> pa.Table:
        v = _to_matrix(b[vec_col]).astype(np.float64)
        q = np.floor(v * float(quant)).astype(np.int64)
        g = q.T @ q
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table({"i": pa.array(iu.astype(np.int64)),
                         "j": pa.array(ju.astype(np.int64)),
                         "s_": pa.array(g[iu, ju])})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["i", "j"], as_index=False)["s_"].sum() \
            .rename(columns={"s_": "s"})
        out["s"] = out["s"].astype(np.int64)
        return out

    return sorted_block_reduce(parts, ["i", "j"], total).sort(["i", "j"])


def dot_topk_pairs(ds: ray.data.Dataset, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", top_n: int = 20,
                   n_buckets: int = 8, quant: int = 1 << 20
                   ) -> ray.data.Dataset:
    """EXACT all-pairs similarity join: the ``top_n`` vector pairs by
    quantized dot product — the corpus×corpus companion to
    :func:`cosine_topk` (query×corpus).  Integer ranking end to end:
    elements are ``floor(v·quant)`` int64, a d-dim dot stays < 2^53
    (d·quant² envelope), so the score is bit-reproducible in SQL
    (``list_dot_product`` of the same quantized lists) and ties break
    deterministically on ``(dot DESC, a_id, b_id)``.

    Distribution: triangle block-pair fan-out — row with bucket
    ``g = id % n_buckets`` is replicated to every unordered bucket pair
    {g, h} (n_buckets copies), so each id pair meets in EXACTLY one
    group; per-group one numpy matmul (A×B off-diagonal, strict upper
    triangle on the diagonal) + local top-n partial; one tiny ranked
    merge.  Shuffle volume n·n_buckets rows vs n² pairs scored; group
    size n/n_buckets per side caps the matmul working set — raise
    ``n_buckets`` with corpus size (cost grows linearly while pairwise
    work is fixed at n²/2 products total)."""
    from .shuffle import sorted_block_reduce
    B = int(n_buckets)

    def explode(b: pa.Table) -> pa.Table:
        v = _to_matrix(b[vec_col]).astype(np.float64)
        q = np.floor(v * float(quant)).astype(np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = ids % B
        keys, rows = [], []
        for h in range(B):
            lo = np.minimum(g, h)
            keys.append(lo * B + np.maximum(g, h))
            rows.append(np.arange(len(ids)))
        keys = np.concatenate(keys)
        rows = np.concatenate(rows)
        return pa.table({
            "gk": pa.array(keys),
            "id": pa.array(ids[rows]),
            "bkt": pa.array(g[rows]),
            "q": pa.array(list(q[rows]))})

    u = ds.map_batches(explode, batch_format="pyarrow")

    def pairs(grp: pd.DataFrame) -> pd.DataFrame:
        out = {"a_id": [], "b_id": [], "dot_q": []}
        for gk, gdf in grp.groupby("gk", sort=False):
            ids = gdf["id"].to_numpy()
            Q = np.stack(gdf["q"].to_numpy()).astype(np.int64)
            lo_b, hi_b = divmod(int(gk), B)
            if lo_b == hi_b:
                D = Q @ Q.T
                ii, jj = np.triu_indices(len(ids), k=1)
                a, c, d = ids[ii], ids[jj], D[ii, jj]
            else:
                am = gdf["bkt"].to_numpy() == lo_b
                A, Cm = Q[am], Q[~am]
                ai, ci = ids[am], ids[~am]
                D = A @ Cm.T
                ii, jj = np.unravel_index(np.arange(D.size), D.shape)
                a, c, d = ai[ii], ci[jj], D.ravel()
            sw = a > c
            a2 = np.where(sw, c, a)
            c2 = np.where(sw, a, c)
            if len(d) > top_n:          # local top-n partial per group
                sel = np.lexsort((c2, a2, -d))[:top_n]
                a2, c2, d = a2[sel], c2[sel], d[sel]
            out["a_id"].append(a2)
            out["b_id"].append(c2)
            out["dot_q"].append(d)
        if not out["a_id"]:
            return pd.DataFrame({"a_id": np.empty(0, np.int64),
                                 "b_id": np.empty(0, np.int64),
                                 "dot_q": np.empty(0, np.int64)})
        return pd.DataFrame({k: np.concatenate(v)
                             for k, v in out.items()})

    parts = sorted_block_reduce(u, "gk", pairs)

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["dot_q", "a_id", "b_id"],
                              ascending=[False, True, True]).head(top_n)

    return parts.map_batches(topn, batch_format="pandas",
                             batch_size=None).repartition(1) \
        .map_batches(topn, batch_format="pandas", batch_size=None)


def dot_knn_graph(ds: ray.data.Dataset, *, k: int, id_col: str = "vec_id",
                  vec_col: str = "embedding", n_buckets: int = 8,
                  quant: int = 1 << 20) -> ray.data.Dataset:
    """EXACT kNN graph over the embedding column: for every vector its k
    most-similar OTHER vectors by quantized int64 dot product — the
    semantic-space analogue of the engine's spatial all-kNN flagship
    (semantic-dedup / clustering precursor).  Output ``(vid, rank, nid,
    dot_q)``, rank 0-based by ``(dot DESC, nid ASC)`` — deterministic.

    Same triangle block-pair fan-out as :func:`dot_topk_pairs` (every
    vector pair meets in exactly one group), but the per-group kernel
    emits PER-VECTOR local top-k partials in both roles (argpartition on
    the matmul rows/columns), so the shuffle moves n·n_buckets·k rows
    while n²/2 dot products stay in the kernels; one vid-keyed reduce
    merges each vector's ≤ n_buckets·k candidates."""
    from .shuffle import sorted_block_reduce
    B = int(n_buckets)

    def explode(b: pa.Table) -> pa.Table:
        v = _to_matrix(b[vec_col]).astype(np.float64)
        q = np.floor(v * float(quant)).astype(np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = ids % B
        keys, rows = [], []
        for h in range(B):
            keys.append(np.minimum(g, h) * B + np.maximum(g, h))
            rows.append(np.arange(len(ids)))
        keys = np.concatenate(keys)
        rows = np.concatenate(rows)
        return pa.table({"gk": pa.array(keys), "id": pa.array(ids[rows]),
                         "bkt": pa.array(g[rows]),
                         "q": pa.array(list(q[rows]))})

    u = ds.map_batches(explode, batch_format="pyarrow")

    def _topk_rows(D, rid, cid):
        """Per-row local top-k of D by (dot DESC, nid ASC) — columns
        arrive cid-ASCENDING, so a STABLE descending argsort preserves
        the nid tie-break exactly (ties at the kth slot stay correct,
        which argpartition would not guarantee)."""
        out_v, out_n, out_d = [], [], []
        kk = min(k, D.shape[1])
        if kk == 0 or D.shape[0] == 0:
            return out_v, out_n, out_d
        part = np.argsort(-D, axis=1, kind="stable")[:, :kk]
        rows = np.arange(D.shape[0])[:, None]
        dv = D[rows, part]
        out_v.append(np.repeat(rid, kk))
        out_n.append(cid[part].ravel())
        out_d.append(dv.ravel())
        return out_v, out_n, out_d

    def partials(grp: pd.DataFrame) -> pd.DataFrame:
        vs, ns, ds_ = [], [], []
        for gk, gdf in grp.groupby("gk", sort=False):
            gdf = gdf.sort_values("id", kind="stable")   # cid ascending
            ids = gdf["id"].to_numpy()
            Q = np.stack(gdf["q"].to_numpy()).astype(np.int64)
            lo_b, hi_b = divmod(int(gk), B)
            if lo_b == hi_b:
                D = Q @ Q.T
                # self sentinel must survive negation in the stable
                # argsort (-int64.min overflows back to itself and
                # would rank self FIRST, displacing a real candidate)
                np.fill_diagonal(D, -(np.int64(1) << 62))
                if len(ids) > 1:
                    a, b_, c = _topk_rows(D, ids, ids)
                    vs += a; ns += b_; ds_ += c
            else:
                am = gdf["bkt"].to_numpy() == lo_b
                A, C = Q[am], Q[~am]
                ai, ci = ids[am], ids[~am]
                if len(ai) and len(ci):
                    D = A @ C.T
                    a, b_, c = _topk_rows(D, ai, ci)
                    vs += a; ns += b_; ds_ += c
                    a, b_, c = _topk_rows(D.T, ci, ai)
                    vs += a; ns += b_; ds_ += c
        if not vs:
            return pd.DataFrame({"vid": np.empty(0, np.int64),
                                 "nid": np.empty(0, np.int64),
                                 "dot_q": np.empty(0, np.int64)})
        out = pd.DataFrame({"vid": np.concatenate(vs),
                            "nid": np.concatenate(ns),
                            "dot_q": np.concatenate(ds_)})
        return out[out["dot_q"] != -(np.int64(1) << 62)]

    parts = sorted_block_reduce(u, "gk", partials)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["vid", "dot_q", "nid"], kind="stable",
                            ascending=[True, False, True])
        rank = df.groupby("vid", sort=False).cumcount()
        df = df.assign(rank=rank.astype(np.int64))
        return df[df["rank"] < k][["vid", "rank", "nid", "dot_q"]]

    return sorted_block_reduce(parts, "vid", merge)
