"""functions/hashing + functions/pairs vs slow per-element references."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parallelspatialquery_ray.functions import hashing as H
from parallelspatialquery_ray.functions.pairs import (capped_slice_tiles,
                                                      tile_pair_indices)

TOKEN_ALPHABET = "abcXYZ019_"


def _slow_token_hash(tokens):
    out = np.empty(len(tokens), dtype=np.uint64)
    p = np.uint64(1099511628211)
    for i, t in enumerate(tokens):
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
        out[i] = (b * p ** np.arange(len(b), dtype=np.uint64)
                  ).sum(dtype=np.uint64)
    return H.splitmix64(out)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(TOKEN_ALPHABET, min_size=1, max_size=40),
                min_size=0, max_size=30))
def test_token_hashes_match_slow_reference(tokens):
    assert np.array_equal(H.token_hashes(tokens), _slow_token_hash(tokens))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=1, max_size=8),
       st.randoms(use_true_random=False))
def test_segment_reduce_poly_matches_sequential(counts, rnd):
    counts = np.array(counts, dtype=np.int64)
    vals = np.array([rnd.randrange(2**60) for _ in range(int(counts.sum()))],
                    dtype=np.uint64)
    base = np.uint64(1000003)
    got = H.segment_reduce_poly(vals, counts, base)
    at = 0
    for j, c in enumerate(counts):
        h = np.uint64(0)
        for v in vals[at:at + c]:
            h = h * base + v
        assert got[j] == h
        at += c


def test_content_hashes_identity_and_difference():
    strs = ["", "a", "ab", "ba", "abc", "abc", "abd", "xyz" * 200, None]
    h1, h2 = H.content_hashes(pa.array(strs))
    assert h1[4] == h1[5] and h2[4] == h2[5]          # equal strings equal
    assert h1[0] == h1[8]                             # null hashes like ""
    pairs = set(zip(h1.tolist(), h2.tolist()))
    assert len(pairs) == 7                            # distinct all differ
    # chunk/slice invariance
    sl = pa.array(["zz", "abc", "q"]).slice(1, 1)
    s1, s2 = H.content_hashes(sl)
    assert s1[0] == h1[4] and s2[0] == h2[4]


@pytest.mark.parametrize("n,cap", [(0, 4), (1, 4), (5, 2), (9, 4), (17, 5),
                                   (8, 8), (8, 100)])
def test_capped_tiles_cover_exact_triangle(n, cap):
    got = set()
    for a, b in capped_slice_tiles(n, cap):
        assert a.stop - a.start <= cap and b.stop - b.start <= cap
        ia, ib = tile_pair_indices(a, b)
        for i, j in zip(a.start + ia, b.start + ib):
            assert (i, j) not in got
            got.add((int(i), int(j)))
    want = {(i, j) for i in range(n) for j in range(i + 1, n)}
    assert got == want


def test_sql_twins_match_numpy_hashes():
    """The DuckDB SQL emitters (mulmod/splitmix64/token-hash CTE) must be
    bit-exact twins of the numpy hashing they mirror — this is what puts
    the sketch operators (simhash/fingerprint/HLL) under the SQL oracle
    gate."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    vals = np.array([0, 1, 2, 12345, 2**63 - 1, 2**64 - 1, 987654321987],
                    dtype=np.uint64)
    want = H.splitmix64(vals)
    rows = ", ".join(f"({int(v)}::HUGEINT)" for v in vals)
    got = con.sql(
        f"SELECT h::UBIGINT AS h FROM (SELECT {H.splitmix64_sql_cols('u')} "
        f"FROM (VALUES {rows}) t(u))").fetchnumpy()
    assert (got["h"] == want).all()

    # mulmod: (a * c) mod 2^64 at the wraparound boundary
    a, c = (2**64 - 7), 0xBF58476D1CE4E5B9
    got_m = con.sql(f"SELECT {H.mulmod_sql(str(a), c)} AS r").fetchone()[0]
    assert int(got_m) == (a * c) % (1 << 64)

    # token-hash CTE vs token_hashes on a tiny inline corpus
    texts = ["hello world_1", "", "a  b\tc", "zzz zzz"]
    sql = ("WITH docs(doc_id, text) AS (VALUES "
           + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
           + "), " + H.token_hash_cte_sql(
               "docs", "doc_id", "coalesce(text, '')")
           + " SELECT doc_id, pos, h::UBIGINT AS h FROM sm "
             "ORDER BY doc_id, pos")
    got_t = con.sql(sql).fetchnumpy()
    import re
    flat, ids = [], []
    for i, t in enumerate(texts):
        toks = re.findall(r"[A-Za-z0-9_]+", t)
        flat.extend(toks)
        ids.extend([i] * len(toks))
    want_t = H.token_hashes(flat)
    assert (got_t["doc_id"] == np.array(ids)).all()
    assert (got_t["h"].astype(np.uint64) == want_t).all()

    # uint64 -> int64 reinterpretation
    for v in (0, 1, 2**63 - 1, 2**63, 2**64 - 1):
        got_i = con.sql(
            f"SELECT {H.uint64_to_int64_sql(f'{v}::HUGEINT')} AS r"
        ).fetchone()[0]
        assert got_i == np.uint64(v).astype(np.int64)


def test_edit1_join_matches_levenshtein(ray_session):
    # FastSS blocking must be candidate-COMPLETE for d<=1; DuckDB
    # levenshtein over the distinct set is the oracle.
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from parallelspatialquery_ray.stages.dedup import edit1_join
    rng = np.random.default_rng(13)
    words = sorted({"".join(rng.choice(list("abc"), size=rng.integers(0, 6)))
                    for _ in range(250)})
    ds = rd.from_pandas(pd.DataFrame({"s": words})).repartition(4)
    got = edit1_join(ds).to_pandas()
    gp = set(zip(got["s_a"], got["s_b"]))
    assert len(gp) == len(got)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": words}))
    want = con.sql("SELECT a.s, b.s FROM t a, t b WHERE a.s < b.s "
                   "AND levenshtein(a.s, b.s) <= 1").fetchall()
    assert gp == set(want)


@given(st.lists(st.one_of(st.none(),
                          st.text(max_size=40)), max_size=60),
       st.integers(min_value=2, max_value=7))
@settings(max_examples=60, deadline=None)
def test_flat_shingles_and_minhash_match_scalar_path(texts, k):
    # The vectorized whole-batch flat-buffer path must be BIT-IDENTICAL to
    # the per-doc scalar path (the SQL oracle twins re-derive the scalar
    # semantics, so any drift breaks the driver gate).
    from parallelspatialquery_ray.stages.dedup import (_MERSENNE,
                                                       _MinHashSigs,
                                                       char_shingle_hashes)
    col = pa.array(texts, pa.string())
    hs, cnt = H.char_shingle_hashes_flat(col, k)
    assert int(cnt.sum()) == len(hs)
    seg = np.cumsum(cnt) - cnt
    m = _MinHashSigs(16, k, "t", "id")
    sigs = H.minhash_from_flat(hs, cnt, m.a, m.b, np.uint64(_MERSENNE))
    for i, t in enumerate(texts):
        want_set = set(char_shingle_hashes(t or "", k).tolist())
        got = hs[seg[i]:seg[i] + cnt[i]]
        assert set(got.tolist()) == want_set
        assert np.array_equal(sigs[i], m.signature(t or ""))
