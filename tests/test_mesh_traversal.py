"""Mesh traversal invariants as array identities (parity with reference
``tests/test_femmesh_traversal.cc:8-153``)."""

import numpy as np
import pytest

from meshfem_tpu.mesh import TriMesh, TetMesh, FEMMesh, generators


@pytest.fixture(scope="module")
def tri():
    V, F = generators.grid_tri(6, 5)
    return TriMesh.build(V, F)


@pytest.fixture(scope="module")
def tet():
    V, T = generators.grid_tet(3, 3, 2)
    return TetMesh.build(V, T)


def test_tri_mate_involution(tri):
    h = np.arange(3 * tri.num_faces)
    interior = ~tri.is_boundary_halfedge(h)
    hm = tri.mate(h[interior])
    np.testing.assert_array_equal(tri.mate(hm), h[interior])
    # Mate reverses orientation: tip(mate) == tail, tail(mate) == tip.
    np.testing.assert_array_equal(tri.tip(hm), tri.tail(h[interior]))
    np.testing.assert_array_equal(tri.tail(hm), tri.tip(h[interior]))


def test_tri_boundary_encoding(tri):
    h = np.arange(3 * tri.num_faces)
    bdry = tri.is_boundary_halfedge(h)
    # Boundary mates are encoded as index < -1 (reference -2 - O).
    assert np.all(tri.mate(h[bdry]) < -1)
    b = tri.boundary_edge_index(h[bdry])
    assert np.array_equal(np.sort(b), np.arange(tri.num_boundary_edges))
    np.testing.assert_array_equal(tri.bdry_halfedge[b], h[bdry])


def test_tri_next_prev(tri):
    h = np.arange(3 * tri.num_faces)
    np.testing.assert_array_equal(tri.next(tri.next(tri.next(h))), h)
    np.testing.assert_array_equal(tri.prev(tri.next(h)), h)
    # next's tail is h's tip (CCW chain around the face).
    np.testing.assert_array_equal(tri.tail(tri.next(h)), tri.tip(h))


def test_tri_boundary_loops(tri):
    loops = tri.boundary_loops()
    assert len(loops) == 1  # grid has a single boundary component
    loop = loops[0]
    assert len(loop) == tri.num_boundary_edges
    assert len(np.unique(loop)) == len(loop)


def test_tri_euler_characteristic(tri):
    ne = len(tri.edges())
    chi = tri.num_vertices - ne + tri.num_faces
    assert chi == 1  # disk


def test_tet_mate_involution(tet):
    hf = np.arange(4 * tet.num_tets)
    interior = ~tet.is_boundary_halfface(hf)
    hm = tet.mate(hf[interior])
    np.testing.assert_array_equal(tet.mate(hm), hf[interior])
    # Mates hold the same vertex set.
    a = np.sort(tet.face_vertices(hf[interior]), axis=1)
    b = np.sort(tet.face_vertices(hm), axis=1)
    np.testing.assert_array_equal(a, b)


def test_tet_boundary_encoding(tet):
    hf = np.arange(4 * tet.num_tets)
    bdry = tet.is_boundary_halfface(hf)
    assert np.all(tet.mate(hf[bdry]) < 0)
    b = tet.boundary_face_index(hf[bdry])
    assert np.array_equal(np.sort(b), np.arange(tet.num_boundary_faces))


def test_tet_boundary_closed(tet):
    """The boundary of the boundary is empty: every edge of the boundary
    triangulation appears exactly twice."""
    faces = tet.boundary_faces()
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    key = np.sort(edges, axis=1)
    _, counts = np.unique(key, axis=0, return_counts=True)
    assert np.all(counts == 2)


def test_nonmanifold_rejected():
    # Three triangles sharing one edge.
    V = np.array([[0, 0], [1, 0], [0, 1], [1, 1], [-1, -1.]])
    F = np.array([[0, 1, 2], [1, 3, 0], [0, 1, 4]])
    with pytest.raises(ValueError, match="non-manifold"):
        TriMesh.build(V, F)


# ---------------------------------------------------------------------------
# FEMMesh node numbering
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("K", [2, 3])
@pytest.mark.parametrize("deg", [1, 2])
def test_femmesh_counts(K, deg):
    if K == 2:
        V, F = generators.grid_tri(4, 4)
    else:
        V, F = generators.grid_tet(2, 2, 2)
    m = FEMMesh(V, F, degree=deg)
    ne = len((TriMesh.build(V, F) if K == 2 else TetMesh.build(V, F)).edges())
    expect_nodes = len(V) + (ne if deg == 2 else 0)
    assert m.num_nodes == expect_nodes
    assert m.elem_nodes.shape == (len(F), m.nodes_per_elem)


def test_femmesh_p2_edge_nodes_consistent():
    """Shared edges get one node; its position is the edge midpoint."""
    V, F = generators.grid_tri(3, 3)
    m = FEMMesh(V, F, degree=2)
    from meshfem_tpu.fem import simplex

    pairs = np.asarray(simplex.simplex_edges(2))
    for e in range(len(F)):
        for li, (a, b) in enumerate(pairs):
            node = m.elem_nodes[e, 3 + li]
            mid = 0.5 * (V[F[e, a]] + V[F[e, b]])
            np.testing.assert_allclose(m.node_positions[node], mid, atol=1e-14)


def test_femmesh_boundary_nodes():
    V, F = generators.grid_tri(4, 4)
    m2 = FEMMesh(V, F, degree=2)
    # every boundary element node lies on the domain boundary (unit square).
    p = m2.node_positions[m2.bdry_nodes]
    on_edge = (np.isclose(p[:, 0], 0) | np.isclose(p[:, 0], 1)
               | np.isclose(p[:, 1], 0) | np.isclose(p[:, 1], 1))
    assert on_edge.all()
    # counts: 4*4 boundary edges per side -> 16 edges, 16 vertices + 16 mids
    assert len(m2.bdry_elems) == 16
    assert len(m2.bdry_nodes) == 32


@pytest.mark.parametrize("K", [2, 3])
def test_femmesh_geometry(K):
    if K == 2:
        V, F = generators.grid_tri(5, 3, hi=(2.0, 1.0))
        expect_vol, expect_bvol = 2.0, 6.0
    else:
        V, F = generators.grid_tet(2, 3, 2, hi=(1.0, 1.5, 1.0))
        expect_vol, expect_bvol = 1.5, 2 * (1.5 + 1.5 + 1.0)
    m = FEMMesh(V, F)
    g = m.geometry()
    vols = np.asarray(g.volume)
    assert (vols > 0).all()
    assert m.volume() == pytest.approx(expect_vol, rel=1e-12)
    assert m.boundary_volume() == pytest.approx(expect_bvol, rel=1e-12)
    # grad lambda: lambda_i is affine, equals 1 at vertex i, 0 at others.
    gl = np.asarray(g.grad_lambda)
    X = V[F]
    for i in range(K + 1):
        for j in range(K + 1):
            d = np.einsum("ed,ed->e", gl[:, i], X[:, j] - X[:, i])
            np.testing.assert_allclose(d, -1.0 if i != j else 0.0, atol=1e-10)


def test_femmesh_outward_normals():
    V, F = generators.grid_tet(2, 2, 2)
    m = FEMMesh(V, F)
    g = m.geometry()
    n = np.asarray(g.bdry_normal)
    centers = m.boundary_barycenters()
    vol_c = m.barycenters()[m.bdry_elem_vol_elem]
    outward = np.einsum("bd,bd->b", n, centers - vol_c)
    assert (outward > 0).all()


def test_lumped_node_mass():
    V, F = generators.grid_tri(4, 4)
    for deg in (1, 2):
        m = FEMMesh(V, F, degree=deg)
        nm = np.asarray(m.node_mass_lumped())
        assert nm.sum() == pytest.approx(1.0, rel=1e-12)
