"""The five round-2 filters: quad subdivision family + hole/component
polygon extraction (filters/quad_subdiv.hh, quad_tri_subdiv[_asymmetric].hh,
quad_subdiv_high_aspect.hh, extract_hole_boundaries.hh,
extract_component_polygons.hh)."""

import numpy as np
import pytest

from meshfem_tpu.mesh import FEMMesh, generators, filters


def quad_grid(nx, ny, w=1.0, h=1.0):
    xs = np.linspace(0, w, nx + 1)
    ys = np.linspace(0, h, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    V = np.stack([X.ravel(), Y.ravel()], axis=1)
    def vid(i, j):
        return i * (ny + 1) + j
    Q = np.asarray([[vid(i, j), vid(i + 1, j), vid(i + 1, j + 1),
                     vid(i, j + 1)] for i in range(nx) for j in range(ny)])
    return V, Q


def quad_area(V, Q):
    a = np.zeros(len(Q))
    for t in ([0, 1, 2], [0, 2, 3]):
        X = V[Q[:, t]]
        u, v = X[:, 1] - X[:, 0], X[:, 2] - X[:, 0]
        a += 0.5 * (u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0])
    return a


def test_quad_subdiv_1_to_4():
    V, Q = quad_grid(2, 3)
    V2, Q2, qi = filters.quad_subdiv(V, Q)
    assert len(Q2) == 4 * len(Q)
    assert np.array_equal(qi, np.repeat(np.arange(len(Q)), 4))
    # areas preserved, midpoints shared (counts: verts + edges + centers)
    assert quad_area(V2, Q2).sum() == pytest.approx(1.0, rel=1e-12)
    n_edges = 2 * 3 * 2 + 2 + 3  # interior+boundary edge count of 2x3 grid
    assert len(V2) == len(V) + (2 * 3 + 2 * 4 + 5 if False else 17) + 6


def test_quad_tri_subdiv_symmetric_and_asymmetric():
    V, Q = quad_grid(2, 2)
    V2, T, qi = filters.quad_tri_subdiv(V, Q)
    assert len(T) == 4 * len(Q) and len(V2) == len(V) + len(Q)
    m = FEMMesh(V2, T)
    assert m.volume() == pytest.approx(1.0, rel=1e-12)
    assert np.array_equal(qi, np.repeat(np.arange(4), 4))

    V3, T2, qi2 = filters.quad_tri_subdiv_asymmetric(V, Q)
    assert len(T2) == 2 * len(Q) and len(V3) == len(V)
    m2 = FEMMesh(V3, T2)
    assert m2.volume() == pytest.approx(1.0, rel=1e-12)


def test_quad_subdiv_high_aspect():
    """Reference semantics: a split edge wanted by only one element is
    vetoed and vetoes cascade, so splits survive only where every split
    edge is shared by two aligned splitters — e.g. a closed ring of
    radially-long quads."""
    n = 32
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    inner = np.stack([np.cos(th), np.sin(th)], axis=1)
    outer = 2.0 * inner
    V = np.vstack([inner, outer])
    Q = np.asarray([[k, n + k, n + (k + 1) % n, (k + 1) % n]
                    for k in range(n)])
    area0 = quad_area(V, Q).sum()
    V2, Q2, qi, did = filters.quad_subdiv_high_aspect(V, Q, 2.0)
    assert did and len(Q2) == 2 * n         # every quad splits radially
    assert quad_area(V2, Q2).sum() == pytest.approx(area0, rel=1e-12)
    assert np.array_equal(np.sort(qi), np.repeat(np.arange(n), 2))
    # midpoints on r = 1.5 ring
    new_pts = V2[len(V):]
    np.testing.assert_allclose(np.linalg.norm(new_pts, axis=1), 1.5,
                               rtol=1e-12)


def test_quad_subdiv_high_aspect_lone_quad_vetoed():
    """A lone high-aspect quad's split edges are boundary (count 1) and get
    vetoed — matching the reference's conservative conflict resolution."""
    V = np.asarray([[0, 0], [3, 0], [3, 1], [0, 1.0]])
    Q = np.asarray([[0, 1, 2, 3]])
    V2, Q2, qi, did = filters.quad_subdiv_high_aspect(V, Q, 2.0)
    assert not did and len(Q2) == 1


def test_extract_hole_boundaries_tri():
    V, F = generators.grid_tri(8, 8)
    c = V[F].mean(axis=1)
    hole = ((c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.5) ** 2) < 0.04
    V2, F2 = filters.remove_dangling_vertices(V, F[~hole])
    holes = filters.extract_hole_boundaries(V2, F2)
    assert len(holes) == 1
    # the hole loop stays away from the bbox
    pts = V2[holes[0]]
    assert pts.min() > 0.2 and pts.max() < 0.8


def test_extract_component_polygons():
    V, F = generators.grid_tri(8, 8)
    c = V[F].mean(axis=1)
    hole = ((c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.5) ** 2) < 0.04
    V2, F2 = filters.remove_dangling_vertices(V, F[~hole])
    ind = np.zeros(len(F2), dtype=int)
    polys = filters.extract_component_polygons(V2, F2, ind)
    assert len(polys) == 1
    assert len(polys[0]["holes"]) == 1
    ext = np.asarray(polys[0]["exterior"])
    assert ext[0] == ext[-1]
    # two labels -> two polygons sharing an interface
    ind2 = (c[~hole][:, 0] > 0.5).astype(int)
    polys2 = filters.extract_component_polygons(V2, F2, ind2)
    assert len(polys2) == 2
    # negative indicator skips
    ind3 = ind2.copy()
    ind3[ind2 == 1] = -1
    polys3 = filters.extract_component_polygons(V2, F2, ind3)
    assert len(polys3) == 1


def test_native_ruppert_quality_cdt():
    """Native quality CDT: min-angle and max-area guarantees, exact area
    conformance on non-convex domains with holes (Triangulate.h:83 q/a)."""
    from meshfem_tpu.mesh.triangulate import triangulate_pslg

    outline = np.asarray([[0, 0], [3, 0], [3, 3], [0, 3.0]])
    hole = np.asarray([[1, 1], [2, 1], [2, 2], [1, 2.0]])
    V, F = triangulate_pslg(outline, holes=[hole], target_area=0.05,
                            min_angle=22)
    X = V[F]
    a, b = X[:, 1] - X[:, 0], X[:, 2] - X[:, 0]
    areas = 0.5 * (a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0])
    assert areas.min() > 0                      # positively oriented
    assert abs(areas.sum() - 8.0) < 1e-9        # exact boundary conformance
    assert areas.max() <= 0.05 + 1e-12
    angs = []
    for i in range(3):
        u = X[:, (i + 1) % 3] - X[:, i]
        v = X[:, (i + 2) % 3] - X[:, i]
        c = (u * v).sum(1) / np.sqrt((u * u).sum(1) * (v * v).sum(1))
        angs.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
    assert np.min(angs) >= 22.0 - 1e-6

    # a valid FEM mesh results
    m = FEMMesh(V, F, degree=2)
    assert m.volume() == pytest.approx(8.0, rel=1e-12)


def test_native_ruppert_scales():
    """The O(local) refinement driver: a ~130k-triangle quality mesh in
    seconds (the old driver rebuilt the edge set and scanned every vertex
    per split — hours at this size — and hard-capped at 200k vertices)."""
    import time

    from meshfem_tpu.native import triangulate_ruppert

    sq = np.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    segs = np.asarray([[0, 1], [1, 2], [2, 3], [3, 0]])
    t0 = time.time()
    out = triangulate_ruppert(sq, segs, min_angle=25.0, max_area=1e-5)
    dt = time.time() - t0
    assert out is not None
    V, F = out
    assert len(F) > 100000
    # generous wall bound: measured 0.6-4 s; the point is
    # catching a complexity regression (the old driver was
    # O(T*V) per split — hours at this size), not timing CI
    assert dt < 120.0, f"{len(F)} tris took {dt:.1f}s"
    X = V[F]
    a, b = X[:, 1] - X[:, 0], X[:, 2] - X[:, 0]
    areas = 0.5 * (a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0])
    assert areas.min() > 0
    assert abs(areas.sum() - 1.0) < 1e-9


def test_pslg_entity_links():
    """Input-entity links for PSLG triangulations (Meshing.hh:559):
    every input corner survives, boundary vertices link to segments."""
    from meshfem_tpu.mesh.triangulate import (triangulate_pslg,
                                              classify_pslg_entities)

    outline = np.asarray([[0, 0], [2, 0], [2, 1], [0, 1.0]])
    hole = np.asarray([[0.8, 0.4], [1.2, 0.4], [1.2, 0.6], [0.8, 0.6]])
    V, F = triangulate_pslg(outline, holes=[hole], target_area=0.02)
    kind, ent = classify_pslg_entities(V, outline, [hole])
    assert (kind == 0).sum() == 8            # all 8 input corners present
    assert set(ent[kind == 0]) == set(range(8))
    assert (kind == 1).sum() > 0 and (kind == 2).sum() > 0
    # every on-segment vertex's entity is a valid segment id
    assert ent[kind == 1].min() >= 0 and ent[kind == 1].max() < 8
