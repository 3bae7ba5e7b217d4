"""Property-based conformance: the distributed sweep kernel equals the
brute-force oracle for arbitrary point configurations (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parallelspatialquery_ray.stages.sweep import knn_topk, knn_topk_brute

coord = st.floats(min_value=0.0, max_value=1.0, allow_nan=False,
                  allow_infinity=False)


@settings(max_examples=60, deadline=None)
@given(
    qpts=st.lists(st.tuples(coord, coord), min_size=0, max_size=40),
    tpts=st.lists(st.tuples(coord, coord), min_size=0, max_size=60),
    k=st.integers(min_value=1, max_value=12),
    dup=st.booleans(),
)
def test_sweep_equals_brute(qpts, tpts, k, dup):
    qx = np.array([p[0] for p in qpts])
    qy = np.array([p[1] for p in qpts])
    tx = np.array([p[0] for p in tpts])
    ty = np.array([p[1] for p in tpts])
    if dup and len(tx):  # force exact-duplicate coordinates (tie stress)
        tx = np.concatenate([tx, tx[: len(tx) // 2 + 1]])
        ty = np.concatenate([ty, ty[: len(ty) // 2 + 1]])
    rank = np.arange(len(tx), dtype=np.int64)[::-1].copy()  # adversarial tie order
    a_n, a_d = knn_topk(qx, qy, tx, ty, k, tid_rank=rank)
    b_n, b_d = knn_topk_brute(qx, qy, tx, ty, k, tid_rank=rank)
    assert np.array_equal(a_n, b_n)
    assert np.array_equal(a_d, b_d)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=200),
    k=st.integers(min_value=1, max_value=15),
    seed=st.integers(min_value=0, max_value=2**31),
    lattice=st.integers(min_value=0, max_value=6),
)
def test_sweep_random_and_lattice(n, k, seed, lattice):
    rng = np.random.default_rng(seed)
    if lattice:
        g = rng.integers(0, lattice + 1, size=(n, 2)) / (lattice + 1)
        x, y = g[:, 0].astype(float), g[:, 1].astype(float)
    else:
        x, y = rng.random(n), rng.random(n)
    a_n, a_d = knn_topk(x, y, x, y, k)
    b_n, b_d = knn_topk_brute(x, y, x, y, k)
    assert np.array_equal(a_n, b_n)
    assert np.array_equal(a_d, b_d)
