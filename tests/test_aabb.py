"""AABB tree: closest-point and ray-intersection vs brute force
(libigl_aabb/AABB.h parity)."""

import numpy as np
import pytest

from meshfem_tpu.mesh import generators
from meshfem_tpu.mesh.aabb import AABBTree


def brute_closest(V, F, p, tree):
    best = (None, np.inf)
    for e in range(len(F)):
        q = AABBTree._closest_on_simplex(V[F[e]], p)
        d2 = float(np.dot(p - q, p - q))
        if d2 < best[1]:
            best = (q, d2)
    return best


def test_closest_point_tri_2d():
    V, F = generators.grid_tri(5, 5)
    c = V[F].mean(axis=1)
    keep = ~(((c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.5) ** 2) < 0.05)
    F = F[keep]
    tree = AABBTree(V, F)
    rng = np.random.default_rng(0)
    for p in rng.uniform(-0.3, 1.3, (25, 2)):
        e, q, d2 = tree.closest_point(p)
        qb, d2b = brute_closest(V, F, p, tree)
        assert d2 == pytest.approx(d2b, abs=1e-13)


def test_closest_point_tet_3d():
    V, T = generators.grid_tet(3, 3, 3)
    tree = AABBTree(V, T)
    rng = np.random.default_rng(1)
    for p in rng.uniform(-0.2, 1.2, (15, 3)):
        e, q, d2 = tree.closest_point(p)
        qb, d2b = brute_closest(V, T, p, tree)
        assert d2 == pytest.approx(d2b, abs=1e-12)
        # interior points map to themselves
    e, q, d2 = tree.closest_point(np.asarray([0.5, 0.5, 0.5]))
    assert d2 < 1e-20


def test_ray_intersect_surface():
    from meshfem_tpu.mesh import FEMMesh, filters

    V, T = generators.grid_tet(4, 4, 4)
    mesh = FEMMesh(V, T)
    bf = np.asarray(mesh.bdry_elems)
    Vs, Fs = filters.remove_dangling_vertices(V, bf)
    tree = AABBTree(Vs, Fs)
    # ray from outside along +x through the cube: first hit at x = 0
    hit = tree.ray_intersect([-1.0, 0.4, 0.6], [1.0, 0.0, 0.0])
    assert hit is not None
    e, t, (u, v) = hit
    assert t == pytest.approx(1.0, abs=1e-9)
    # miss
    assert tree.ray_intersect([-1.0, 2.5, 0.5], [1.0, 0.0, 0.0]) is None
    # brute-force cross-check of the hit distance on random rays
    rng = np.random.default_rng(2)
    for _ in range(10):
        o = np.asarray([-0.5, 0, 0]) + rng.uniform(0, 1, 3) * [0, 1, 1]
        d = np.asarray([1.0, 0, 0]) + 0.2 * rng.standard_normal(3)
        d /= np.linalg.norm(d)
        hit = tree.ray_intersect(o, d)
        ts = []
        for e in range(len(Fs)):
            h = AABBTree._ray_tri(o, d, Vs[Fs[e]])
            if h:
                ts.append(h[0])
        if hit is None:
            assert not ts
        else:
            assert hit[1] == pytest.approx(min(ts), abs=1e-10)
