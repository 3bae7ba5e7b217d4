"""In-partition plane-sweep kernel vs the brute-force oracle.

Mirrors the reference's own correctness methodology: every optimized variant
is validated against brute force (case 0) at 1e-15 squared-distance accuracy
(/root/reference/PlaneSweepParallel/src/PlaneSweepParallel.cpp:354-398) — we
go further and demand bit-exact distances plus deterministic ids.
"""

import numpy as np
import pytest

from parallelspatialquery_ray.sources import synth
from parallelspatialquery_ray.stages.sweep import knn_topk, knn_topk_brute


def assert_matches_oracle(qx, qy, tx, ty, k, tid_rank=None):
    nbr_s, dist_s = knn_topk(qx, qy, tx, ty, k, tid_rank=tid_rank)
    nbr_b, dist_b = knn_topk_brute(qx, qy, tx, ty, k, tid_rank=tid_rank)
    assert np.array_equal(nbr_s, nbr_b)
    assert np.array_equal(dist_s, dist_b)  # bit-exact incl. inf padding
    return nbr_s, dist_s


@pytest.mark.parametrize("family", ["uniform", "clustered", "zipf"])
@pytest.mark.parametrize("k", [1, 10, 30])
def test_families(family, k):
    x, y = synth.FAMILIES[family](1500, seed=3)
    qx, qy = synth.FAMILIES[family](400, seed=4)
    assert_matches_oracle(qx, qy, x, y, k)


def test_self_join_zero_distance_first():
    x, y = synth.points_uniform(500, seed=5)
    nbr, dist = assert_matches_oracle(x, y, x, y, 5)
    assert np.array_equal(nbr[:, 0], np.arange(500))
    assert (dist[:, 0] == 0.0).all()


def test_fewer_than_k_padding():
    # k results always, padded with -1/inf (reference seeds k DBL_MAX
    # sentinels, PointNeighbors.h:51, prints NULL, AllKnnResult.h:147-154).
    qx, qy = synth.points_uniform(50, seed=6)
    tx, ty = synth.points_uniform(3, seed=7)
    nbr, dist = assert_matches_oracle(qx, qy, tx, ty, 10)
    assert (nbr[:, 3:] == -1).all()
    assert np.isinf(dist[:, 3:]).all()
    assert (nbr[:, :3] >= 0).all()


def test_empty_sides():
    e = np.empty(0)
    nbr, dist = knn_topk(e, e, e, e, 4)
    assert nbr.shape == (0, 4)
    x = np.array([0.5])
    nbr, dist = knn_topk(x, x, e, e, 4)
    assert (nbr == -1).all() and np.isinf(dist).all()


def test_single_and_degenerate():
    one = np.array([0.25])
    assert_matches_oracle(one, one, one, one, 3)
    same = np.full(40, 0.77)
    assert_matches_oracle(same, same, same, same, 10)


def test_tie_break_is_by_tid_rank():
    # Lattice: many exact-tie distances; ids reversed so position order and
    # id order disagree — results must follow tid_rank, not scan order.
    g = np.arange(8) / 8.0
    gx, gy = np.meshgrid(g, g)
    tx, ty = gx.ravel(), gy.ravel()
    rng = np.random.default_rng(8)
    tid_rank = rng.permutation(len(tx)).astype(np.int64)
    nbr_s, dist_s = knn_topk(tx, ty, tx, ty, 6, tid_rank=tid_rank)
    nbr_b, dist_b = knn_topk_brute(tx, ty, tx, ty, 6, tid_rank=tid_rank)
    assert np.array_equal(nbr_s, nbr_b)
    assert np.array_equal(dist_s, dist_b)
    # within equal-distance runs, neighbors are ordered by tid_rank
    for i in range(0, len(tx), 17):
        d = dist_s[i]
        for j in range(5):
            if d[j] == d[j + 1]:
                assert tid_rank[nbr_s[i, j]] < tid_rank[nbr_s[i, j + 1]]


def test_quadrupled_preserves_local_structure():
    # DatasetMultiplier factor 4 (main.cpp:72-88): each quadrant's internal
    # neighbor distances are the originals shrunk by 2 (squared: by 4).
    x, y = synth.points_uniform(300, seed=9)
    _, d0 = knn_topk(x, y, x, y, 4)
    qx, qy = synth.points_quadrupled(x, y)
    q0x, q0y = qx[0::4], qy[0::4]  # quadrant 0 copies, original order
    _, d1 = knn_topk(q0x, q0y, q0x, q0y, 4)
    assert np.allclose(d1, d0 / 4.0, rtol=0, atol=1e-18)
