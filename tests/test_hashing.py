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
