"""Mesh/field I/O round trips (parity with MeshIO formats and the
MSHFieldWriter/Parser pair — a full simulation-state round trip)."""

import numpy as np
import pytest

from meshfem_tpu.io import meshio, msh_fields
from meshfem_tpu.mesh import FEMMesh, generators


@pytest.fixture(scope="module")
def tri_mesh():
    return generators.grid_tri(3, 2)


@pytest.fixture(scope="module")
def tet_mesh():
    return generators.grid_tet(2, 2, 1)


@pytest.mark.parametrize("fmt,ext", [
    ("off", "off"), ("obj", "obj"), ("msh", "msh"), ("medit", "mesh"),
    ("node", "node")])
def test_tri_roundtrip(tri_mesh, fmt, ext, tmp_path):
    V, F = tri_mesh
    p = tmp_path / f"m.{ext}"
    meshio.save(p, V, F)
    V2, F2 = meshio.load(p)
    np.testing.assert_allclose(V2[:, :2], V, atol=1e-14)
    np.testing.assert_array_equal(F2, F)


@pytest.mark.parametrize("fmt,ext", [("msh", "msh"), ("medit", "mesh"),
                                     ("node", "node")])
def test_tet_roundtrip(tet_mesh, fmt, ext, tmp_path):
    V, T = tet_mesh
    p = tmp_path / f"m.{ext}"
    meshio.save(p, V, T)
    V2, T2 = meshio.load(p)
    np.testing.assert_allclose(V2, V, atol=1e-14)
    np.testing.assert_array_equal(T2, T)


def test_msh_binary_roundtrip(tet_mesh, tmp_path):
    V, T = tet_mesh
    p = tmp_path / "m.msh"
    meshio.save_msh(p, V, T, binary=True)
    V2, T2 = meshio.load(p)
    np.testing.assert_allclose(V2, V, atol=1e-14)
    np.testing.assert_array_equal(T2, T)


def test_msh_p2_roundtrip(tri_mesh, tmp_path):
    """P2 tri6 elements written with GMSH node ordering round-trip."""
    V, F = tri_mesh
    mesh = FEMMesh(V, F, degree=2)
    p = tmp_path / "p2.msh"
    meshio.save_msh(p, mesh.node_positions, mesh.elem_nodes)
    V2, F2 = meshio.load(p)
    np.testing.assert_allclose(V2[:, :2], mesh.node_positions, atol=1e-14)
    np.testing.assert_array_equal(F2, mesh.elem_nodes)


def test_stl_roundtrip(tmp_path):
    V, F = generators.grid_tri(2, 2)
    V3 = np.pad(V, [(0, 0), (0, 1)])
    for binary in (True, False):
        p = tmp_path / f"m_{binary}.stl"
        meshio.save_stl(p, V3, F, binary=binary)
        V2, F2 = meshio.load(p)
        assert len(F2) == len(F)
        # STL merges duplicated vertices; areas must match.
        def area(V, F):
            t = V[F]
            return np.abs(np.cross(t[:, 1] - t[:, 0],
                                   t[:, 2] - t[:, 0])[..., -1]).sum() / 2
        a1 = area(np.asarray(V3), F)
        t2 = V2[F2]
        a2 = (np.linalg.norm(np.cross(t2[:, 1] - t2[:, 0],
                                      t2[:, 2] - t2[:, 0]), axis=1)).sum() / 2
        assert a2 == pytest.approx(a1, rel=1e-6)


def test_field_roundtrip(tri_mesh, tmp_path):
    """Write u/strain/stress fields, read them back (simulation state
    round trip like Simulate_cli output + MSHFieldParser input)."""
    V, F = tri_mesh
    mesh = FEMMesh(V, F, degree=1)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((mesh.num_nodes, 2))
    s = rng.standard_normal(mesh.num_elements)
    eps = rng.standard_normal((mesh.num_elements, 3))
    p = tmp_path / "out.msh"
    meshio.save_msh(p, mesh.node_positions, mesh.elem_nodes, fields=[
        {"name": "u", "data": u, "where": "node", "kind": "vector"},
        {"name": "vm", "data": s, "where": "element", "kind": "scalar"},
        {"name": "strain", "data": eps, "where": "element",
         "kind": "smatrix"},
    ])
    fields = msh_fields.read_fields(p)
    np.testing.assert_allclose(
        msh_fields.vector_field(fields, "u", 2), u, atol=1e-14)
    np.testing.assert_allclose(
        msh_fields.scalar_field(fields, "vm"), s, atol=1e-14)
    np.testing.assert_allclose(
        msh_fields.smatrix_field(fields, "strain", 2), eps, atol=1e-14)
    assert fields["u"]["where"] == "node"
    assert fields["vm"]["where"] == "element"
