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


@settings(max_examples=50, deadline=None)
@given(
    na=st.integers(min_value=0, max_value=80),
    nb=st.integers(min_value=0, max_value=80),
    seed=st.integers(min_value=0, max_value=2**31),
    quant=st.booleans(),
    budget=st.sampled_from([5, 64, 1 << 22]),
)
def test_rect_pairs_local_equals_brute(na, nb, seed, quant, budget):
    # rect-overlap local kernel: exactly-once pair set under arbitrary
    # budgets (forcing sub-grid recursion), with tie-heavy quantized
    # coordinates and degenerate zero-area rects.
    from parallelspatialquery_ray.stages.join import _rect_pairs_local
    rng = np.random.default_rng(seed)

    def mk(n):
        x = rng.uniform(0, 0.4, n)
        y = rng.uniform(0, 0.4, n)
        w = rng.uniform(0, 0.08, n)
        h = rng.uniform(0, 0.08, n)
        if quant:  # snap to a coarse lattice: boundary/tie stress
            x, y = np.round(x, 1), np.round(y, 1)
            w, h = np.round(w, 1), np.round(h, 1)
        return (x, y, x + w, y + h)

    L, R = mk(na), mk(nb)
    li, ri = _rect_pairs_local(L, R, 0.1, budget, 0)
    got = list(zip(li.tolist(), ri.tolist()))
    assert len(got) == len(set(got))
    if na and nb:
        m = ((L[0][:, None] <= R[2][None, :]) & (R[0][None, :] <= L[2][:, None])
             & (L[1][:, None] <= R[3][None, :])
             & (R[1][None, :] <= L[3][:, None]))
        want = set(zip(*[a.tolist() for a in np.nonzero(m)]))
    else:
        want = set()
    assert set(got) == want


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=150),
    seed=st.integers(min_value=0, max_value=2**31),
    levels=st.sampled_from([3, 8, 40]),
)
def test_local_skyline_equals_brute(n, seed, levels):
    from parallelspatialquery_ray.stages.agg import _local_skyline
    rng = np.random.default_rng(seed)
    x = rng.integers(0, levels, n).astype(np.float64)
    y = rng.integers(0, levels, n).astype(np.float64)
    got = set(_local_skyline(x, y).tolist())
    want = {i for i in range(n)
            if not ((x <= x[i]) & (y <= y[i])
                    & ((x < x[i]) | (y < y[i]))).any()}
    assert got == want
