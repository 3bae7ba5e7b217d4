"""Vectorized string/byte hashing shared by the dedup and text stages.

Everything here is numpy-only on flat byte buffers — no per-row, per-token
or per-character Python in any hot path (the reference's hashing needs are
all in-memory C++; these are the Ray-batch equivalents).  Two primitives:

- :func:`token_hashes` — one uint64 per token (polynomial over bytes,
  splitmix-finalized); bit-identical to summing ``byte * P**position`` per
  token, but computed for ALL tokens of a batch in one numpy pass.
- :func:`content_hashes` — two independent 64-bit lanes per string of an
  Arrow string array, computed directly on the array's utf-8 data buffer
  (zero-copy; no per-row encode/hashlib).  Collision probability for any
  differing pair is ~2^-128 per lane pair (random-weight linear hash), far
  below the 10^12-row design point's birthday bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)
_P = np.uint64(1099511628211)  # FNV prime, used as polynomial base


def splitmix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants, Steele et al.)."""
    v = v + _MIX
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def _segment_starts(lens: np.ndarray) -> np.ndarray:
    ends = np.cumsum(lens)
    return ends - lens


def token_hashes(tokens) -> np.ndarray:
    """uint64 hash per token: ``splitmix64(sum(bytes * P**pos) mod 2^64)``.

    Tokens must be ASCII (the engine's TOKEN_RE ``[A-Za-z0-9_]+``
    guarantees this), so character length == byte length and one ``join``
    +``encode`` yields a flat byte buffer hashed in one vectorized pass.
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter(map(len, tokens), dtype=np.int64, count=n)
    data = np.frombuffer("".join(tokens).encode("ascii"), dtype=np.uint8) \
        .astype(np.uint64)
    starts = _segment_starts(lens)
    # P**pos with uint64 wraparound, looked up from one cumulative table
    max_len = int(lens.max()) if n else 0
    pows = np.ones(max(max_len, 1), dtype=np.uint64)
    if max_len > 1:
        np.multiply.accumulate(
            np.full(max_len - 1, _P, dtype=np.uint64), out=pows[1:])
    pos = np.arange(len(data), dtype=np.int64) - np.repeat(starts, lens)
    vals = data * pows[pos]
    out = np.zeros(n, dtype=np.uint64)
    ne = lens > 0
    if ne.any():
        out[ne] = np.add.reduceat(vals, starts[ne])
    return splitmix64(out)


def segment_reduce_poly(values: np.ndarray, counts: np.ndarray,
                        base: np.uint64) -> np.ndarray:
    """Per-segment polynomial combine: ``sum(v_i * base**(n-1-i)) mod 2^64``
    for each segment of ``counts[j]`` consecutive values — the vectorized
    form of the sequential ``h = h*base + v`` rolling hash."""
    nseg = len(counts)
    out = np.zeros(nseg, dtype=np.uint64)
    total = int(counts.sum())
    if total == 0:
        return out
    starts = _segment_starts(counts)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    exp = np.repeat(counts, counts) - 1 - pos
    max_e = int(exp.max())
    pows = np.ones(max_e + 1, dtype=np.uint64)
    if max_e > 0:
        np.multiply.accumulate(np.full(max_e, base, dtype=np.uint64),
                               out=pows[1:])
    vals = values.astype(np.uint64) * pows[exp]
    ne = counts > 0
    out[ne] = np.add.reduceat(vals, starts[ne])
    return out


def _string_buffers(chunk: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) numpy views over an arrow string chunk's buffers."""
    off_dtype = (np.int64 if pa.types.is_large_string(chunk.type)
                 else np.int32)
    bufs = chunk.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        chunk.offset: chunk.offset + len(chunk) + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None
            else np.empty(0, dtype=np.uint8))
    return offs, data


def content_hashes(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray,
                                                             np.ndarray]:
    """Two independent uint64 content hashes per string, vectorized over
    the arrow utf-8 buffers.  Null strings hash like ``""`` (callers that
    must distinguish should filter nulls first).  Lane j weight for byte at
    local position p is ``splitmix64(p * C + j)`` (odd weights — a random
    linear-combination hash), plus a length term so prefixes differ."""
    if isinstance(col, pa.ChunkedArray):
        chunks = col.chunks
        n = len(col)
    else:
        chunks, n = [col], len(col)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    at = 0
    c_pos = np.uint64(0xD6E8FEB86659FD93)
    for chunk in chunks:
        m = len(chunk)
        if m == 0:
            continue
        offs, data = _string_buffers(chunk)
        lens = offs[1:] - offs[:-1]
        seg = data[offs[0]:offs[-1]].astype(np.uint64)
        starts = offs[:-1] - offs[0]
        pos = (np.arange(len(seg), dtype=np.int64)
               - np.repeat(starts, lens)).astype(np.uint64)
        ne = lens > 0
        s1 = np.zeros(m, dtype=np.uint64)
        s2 = np.zeros(m, dtype=np.uint64)
        if ne.any():
            w = pos * c_pos
            s1[ne] = np.add.reduceat(seg * splitmix64(w | np.uint64(1)),
                                     starts[ne])
            s2[ne] = np.add.reduceat(seg * splitmix64(w ^ _MIX),
                                     starts[ne])
        lu = lens.astype(np.uint64)
        h1[at:at + m] = splitmix64(s1 + lu * np.uint64(0x2545F4914F6CDD1D))
        h2[at:at + m] = splitmix64(s2 ^ splitmix64(lu))
        at += m
    return h1, h2


def char_shingle_hashes_flat(col: "pa.ChunkedArray | pa.Array", k: int
                             ) -> tuple[np.ndarray, np.ndarray]:
    """All k-char shingle hashes of EVERY string in an arrow column in one
    vectorized pass over the flat utf-8 buffer: returns ``(hashes,
    counts)`` where ``hashes`` is the concatenation of each doc's window
    hashes in order and ``counts[i]`` is doc i's window count.

    Bit-identical to per-doc ``stages.dedup.char_shingle_hashes`` WITHOUT
    its trailing ``np.unique`` (duplicate shingles don't change a MinHash
    min, so signature callers need no dedup).  Per-doc semantics: windows
    of size ``min(k, len)`` — one whole-text window when ``0 < len < k``,
    zero windows for empty/null.  Nulls hash like ``""``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null slots are not guaranteed zero-length in the offsets buffer;
    # canonicalize to "" so the buffer walk is uniform
    if col.null_count:
        import pyarrow.compute as pc
        col = pc.fill_null(col, "")
    offs, data = _string_buffers(col)
    n = len(col)
    lens = offs[1:] - offs[:-1]
    doc_starts = offs[:-1]
    d64 = data.astype(np.uint64)
    pows = _P ** np.arange(k, dtype=np.uint64)
    cnt = np.where(lens >= k, lens - k + 1,
                   np.where(lens > 0, 1, 0)).astype(np.int64)
    seg = _segment_starts(cnt)
    out = np.empty(int(cnt.sum()), dtype=np.uint64)

    # long docs (len >= k): one correlation over the whole flat buffer,
    # then gather the window starts that don't cross a doc boundary
    long_m = lens >= k
    if long_m.any():
        N = len(d64)
        acc = np.zeros(N - k + 1, dtype=np.uint64)
        for j in range(k):
            acc += d64[j: N - k + 1 + j] * pows[j]
        h_all = splitmix64(acc)
        cl = cnt * long_m
        tot = int(cl.sum())
        local = np.arange(tot, dtype=np.int64) - np.repeat(
            _segment_starts(cl), cl)
        out[local + np.repeat(seg, cl)] = \
            h_all[local + np.repeat(doc_starts, cl)]

    # short docs (0 < len < k): a single whole-text window each
    short_m = (lens > 0) & ~long_m
    if short_m.any():
        s_starts = doc_starts[short_m]
        s_lens = lens[short_m]
        ss = _segment_starts(s_lens)
        tot = int(s_lens.sum())
        local = np.arange(tot, dtype=np.int64) - np.repeat(ss, s_lens)
        vals = d64[local + np.repeat(s_starts, s_lens)] * pows[local]
        out[seg[short_m]] = splitmix64(np.add.reduceat(vals, ss))
    return out, cnt


def minhash_from_flat(hashes: np.ndarray, counts: np.ndarray,
                      a: np.ndarray, b: np.ndarray, mod: np.uint64
                      ) -> np.ndarray:
    """(flat shingle hashes, per-doc counts) -> (n_docs, num_perm) MinHash
    matrix, zeros for empty docs.  Per permutation: ``min((a*x + b) mod
    mod)`` over each doc's segment via ``np.minimum.reduceat`` — the
    whole batch in ``num_perm`` numpy passes, no per-doc Python."""
    n, num_perm = len(counts), len(a)
    sigs = np.zeros((n, num_perm), dtype=np.uint64)
    total = int(counts.sum())
    if total == 0:
        return sigs
    mersenne = int(mod) == (1 << 61) - 1
    s61 = np.uint64(61)
    cum = np.cumsum(counts)
    # cache-block over shingles: num_perm passes over a DRAM-sized flat
    # array are bandwidth-bound; chunks that fit L2 keep all perm passes
    # on cached data.  Chunk boundaries land on doc boundaries so
    # minimum.reduceat segments stay whole.
    chunk = 1 << 16
    cuts = np.unique(np.searchsorted(cum, np.arange(chunk, total, chunk),
                                     side="left") + 1)
    bounds = np.unique(np.concatenate([[0], cuts[cuts < n], [n]]))
    for d0, d1 in zip(bounds[:-1], bounds[1:]):
        s0 = int(cum[d0 - 1]) if d0 else 0
        s1 = int(cum[d1 - 1])
        if s1 == s0:
            continue
        hs = hashes[s0:s1]
        cnts = counts[d0:d1]
        ne = cnts > 0
        starts = _segment_starts(cnts)[ne]
        y = np.empty(len(hs), dtype=np.uint64)
        hi = np.empty(len(hs), dtype=np.uint64) if mersenne else None
        mins = np.empty((num_perm, int(ne.sum())), dtype=np.uint64)
        for p in range(num_perm):
            np.multiply(hs, a[p], out=y)  # mod 2^64 (wraparound)
            np.add(y, b[p], out=y)
            if mersenne:
                # y % (2^61-1) without the 64-bit divide: y < 2^64 so
                # (y & M) + (y >> 61) < 2M — one conditional subtract
                np.right_shift(y, s61, out=hi)
                np.bitwise_and(y, mod, out=y)
                np.add(y, hi, out=y)
                np.subtract(y, mod, out=y, where=y >= mod)
            else:
                np.mod(y, mod, out=y)
            mins[p] = np.minimum.reduceat(y, starts)
        sigs[d0 + np.nonzero(ne)[0]] = mins.T
    return sigs


# ---------------------------------------------------------------------------
# SQL twins (DuckDB) — emit ANSI-SQL fragments that reproduce the numpy
# hashes above BIT-EXACTLY, so approximate/sketch operators can sit under
# the driver's DuckDB value-hash oracle gate.  All 64-bit wraparound math
# runs in HUGEINT with an explicit mod-2^64 decomposition (DuckDB integer
# arithmetic raises on overflow; HUGEINT holds the <=2^97 partials).
# ---------------------------------------------------------------------------

_MOD64 = 1 << 64
_M32 = 1 << 32


def mulmod_sql(a: str, c: int) -> str:
    """SQL for ``(a * c) mod 2^64`` via 32-bit limb decomposition:
    ``a*c = a_lo*c + ((a_hi*c) mod 2^32)*2^32  (mod 2^64)`` — every
    partial fits HUGEINT for ``a < 2^66``."""
    return (f"(( ({a}) % {_M32})*{c} + "
            f"((( ({a}) // {_M32})*{c}) % {_M32})*{_M32}) % {_MOD64}")


def splitmix64_sql_cols(v: str) -> str:
    """SELECT-list fragment computing ``splitmix64(v)`` into column ``h``
    via lateral column aliases (v0/x1/v1/x2/v2 intermediates).  Paste into
    a SELECT whose FROM provides ``v`` (HUGEINT, < 2^64)."""
    c1 = 0xBF58476D1CE4E5B9
    c2 = 0x94D049BB133111EB
    mix = 0x9E3779B97F4A7C15
    return (f"(({v}) + {mix}) % {_MOD64} AS v0,\n"
            f"    xor(v0, v0 >> 30) AS x1,\n"
            f"    {mulmod_sql('x1', c1)} AS v1,\n"
            f"    xor(v1, v1 >> 27) AS x2,\n"
            f"    {mulmod_sql('x2', c2)} AS v2,\n"
            f"    xor(v2, v2 >> 31) AS h")


def token_hash_cte_sql(table: str, id_col: str, text_expr: str,
                       token_re: str = "[A-Za-z0-9_]+") -> str:
    """CTE chain ``tok -> raw -> sm`` reproducing :func:`token_hashes` for
    every token of ``text_expr`` per row of ``table``: ``sm`` holds
    (``id_col``, ``pos`` 1-based token ordinal, ``th`` uint64-as-HUGEINT
    token hash).  The per-token rolling polynomial (byte * P^position) is
    a ``list_reduce`` Horner pass over the REVERSED token's codepoints
    (ASCII tokens: codepoint == byte)."""
    p = int(_P)
    horner = f"({mulmod_sql('a', p)} + x) % {_MOD64}::HUGEINT"
    return f"""tok AS (
  SELECT {id_col},
         unnest(toks) AS token,
         generate_subscripts(toks, 1) AS pos
  FROM (SELECT {id_col},
               regexp_extract_all({text_expr}, '{token_re}') AS toks
        FROM {table})
), raw AS (
  SELECT {id_col}, pos,
    list_reduce(
      list_prepend(0::HUGEINT,
        list_transform(string_split(reverse(token), ''),
                       c -> unicode(c)::HUGEINT)),
      (a, x) -> {horner}) AS r
  FROM tok
), sm AS (
  SELECT {id_col}, pos,
    {splitmix64_sql_cols('r')}
  FROM raw
)"""


def uint64_to_int64_sql(v: str) -> str:
    """SQL two's-complement reinterpretation of a HUGEINT in [0, 2^64) as
    BIGINT (numpy ``.view(np.int64)`` twin)."""
    return (f"(CASE WHEN ({v}) >= {1 << 63} THEN ({v}) - {_MOD64} "
            f"ELSE ({v}) END)::BIGINT")
