"""M8 application tests: geodesics-in-heat, parametrization, curvature,
field sampling, mesh filters."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators, filters
from meshfem_tpu.analysis import geodesics, parametrization, curvature
from meshfem_tpu.analysis.field_sampler import FieldSampler


def test_geodesic_distances_plane():
    """On a flat square, heat-method distances approximate Euclidean."""
    V, F = generators.grid_tri(16, 16)
    mesh = FEMMesh(V, F, degree=1)
    src = mesh.nodes_in_box((0, 0), (0, 0))
    d = np.asarray(geodesics.geodesic_distances(mesh, src))
    exact = np.linalg.norm(mesh.node_positions, axis=1)
    err = np.abs(d - exact)
    assert err.max() < 0.08          # heat method ~ O(h) accurate
    # Monotone along the diagonal.
    diag = [mesh.nodes_in_box((x, x), (x, x))[0]
            for x in (0.25, 0.5, 0.75, 1.0)]
    assert np.all(np.diff(d[diag]) > 0)


def test_harmonic_parametrization():
    V, F = generators.grid_tri(8, 8)
    V3 = np.column_stack([V, 0.2 * np.sin(np.pi * V[:, 0])])
    mesh = FEMMesh(V3, F, degree=1, embedding_dim=3)
    uv = np.asarray(parametrization.harmonic(mesh))
    # Boundary on the unit circle.
    r = np.linalg.norm(uv[mesh.cell.boundary_vertices()], axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-8)
    # No flipped triangles (harmonic maps to convex domains are injective).
    sf = np.asarray(parametrization.scale_factor(mesh, jnp.asarray(uv)))
    assert (sf > 0).all()


def test_lscm_flat_is_isometry():
    """LSCM of a planar mesh reproduces a rigid/similarity transform:
    conformal distortion == 1."""
    V, F = generators.grid_tri(6, 6)
    mesh = FEMMesh(V, F, degree=1, embedding_dim=3)
    uv = parametrization.lscm(mesh)
    dist = np.asarray(parametrization.conformal_distortion(mesh, uv))
    np.testing.assert_allclose(dist, 1.0, atol=1e-6)


def test_scp_flat():
    V, F = generators.grid_tri(5, 5)
    mesh = FEMMesh(V, F, degree=1, embedding_dim=3)
    uv, lam = parametrization.scp(mesh, tol=1e-6)
    dist = np.asarray(parametrization.conformal_distortion(mesh, uv))
    assert np.median(dist) < 1.1


def test_gaussian_curvature_flat_and_sphere():
    V, F = generators.grid_tri(8, 8)
    V3 = np.column_stack([V, np.zeros(len(V))])
    mesh = FEMMesh(V3, F, degree=1, embedding_dim=3)
    interior = np.setdiff1d(np.arange(len(V3)),
                            mesh.cell.boundary_vertices())
    K = np.asarray(curvature.gaussian_curvature(
        V3, F, mesh.cell.boundary_vertices()))
    np.testing.assert_allclose(K[interior], 0.0, atol=1e-10)

    # Gauss-Bonnet on a closed icosphere-ish mesh: sum deficits = 4 pi.
    t = (1 + 5 ** 0.5) / 2
    ico_v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                      [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                      [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1.]])
    ico_v /= np.linalg.norm(ico_v, axis=1, keepdims=True)
    ico_f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                      [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                      [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                      [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                      [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    deficits = np.asarray(curvature.angle_deficits(ico_v, ico_f))
    assert deficits.sum() == pytest.approx(4 * np.pi, rel=1e-10)


def test_curvature_sensitivity_fd():
    from meshfem_tpu.utils.fd_validation import fd_gradient_check

    rng = np.random.default_rng(0)
    V, F = generators.grid_tri(4, 4)
    V3 = np.column_stack([V, 0.1 * rng.standard_normal(len(V))])
    err = fd_gradient_check(
        lambda V_: jnp.sum(curvature.angle_deficits(V_, F) ** 2),
        jnp.asarray(V3), eps=1e-6)
    assert err < 1e-5


def test_field_sampler():
    V, F = generators.grid_tri(6, 6)
    mesh = FEMMesh(V, F, degree=2)
    s = FieldSampler(mesh)
    # Nodal P2 field = x^2 - y sampled exactly.
    f = mesh.node_positions[:, 0] ** 2 - mesh.node_positions[:, 1]
    rng = np.random.default_rng(0)
    q = rng.uniform(0.05, 0.95, size=(20, 2))
    vals = s.sample_nodal(f, q)
    np.testing.assert_allclose(vals, q[:, 0] ** 2 - q[:, 1], atol=1e-12)
    # Matrix form agrees.
    S = s.sample_matrix(q)
    np.testing.assert_allclose(S @ f, vals, atol=1e-12)
    # Element field sampling and outside-point snapping.
    ef = np.arange(mesh.num_elements, dtype=float)
    assert s.sample_element(ef, q).shape == (20,)
    out = s.sample_nodal(f, np.array([[1.5, 0.5]]))
    assert np.isfinite(out).all()


# -- filters ----------------------------------------------------------------

def test_subdivide_tri_tet():
    V, F = generators.grid_tri(2, 2)
    V2, F2 = filters.subdivide(V, F)
    assert len(F2) == 4 * len(F)
    m = FEMMesh(V2, F2)
    assert m.volume() == pytest.approx(1.0, rel=1e-12)

    V, T = generators.grid_tet(1, 1, 1)
    V2, T2 = filters.subdivide(V, T)
    assert len(T2) == 8 * len(T)
    m = FEMMesh(V2, T2)
    assert m.volume() == pytest.approx(1.0, rel=1e-12)
    assert np.asarray(m.geometry().volume).min() > 0


def test_reflect_tiles_cell():
    V, F = generators.grid_tri(2, 2, hi=(0.5, 0.5))
    V2, F2 = filters.reflect(V, F)
    m = FEMMesh(V2, F2)
    assert m.volume() == pytest.approx(1.0, rel=1e-12)
    bb = m.bbox()
    np.testing.assert_allclose(bb.max, [1.0, 1.0], atol=1e-12)
    assert len(F2) == 4 * len(F)


def test_extrude():
    V, F = generators.grid_tri(2, 2)
    V3, T = filters.extrude(V, F, height=2.0, layers=2)
    m = FEMMesh(V3, T)
    assert m.volume() == pytest.approx(2.0, rel=1e-12)


def test_merge_and_components():
    V, F = generators.grid_tri(2, 2)
    V_dup = np.vstack([V, V + [10.0, 0.0]])
    F_dup = np.vstack([F, F + len(V)])
    n, labels = filters.get_element_components(F_dup)
    assert n == 2
    V2, F2 = filters.remove_small_components(V_dup, F_dup)
    assert len(F2) == len(F)

    Vm = np.vstack([V, V[:1] + 1e-15])
    Fm = F.copy()
    Fm[0, 0] = len(V)  # point at the duplicate
    V3, F3 = filters.merge_duplicate_vertices(Vm, Fm, eps=1e-12)
    assert len(V3) == len(V)
    assert F3.max() < len(V)


def test_voxels_to_simplices():
    occ = np.zeros((3, 3, 3), dtype=bool)
    occ[1, 1, 1] = True
    occ[0, 1, 1] = True
    V, T = filters.voxels_to_simplices(occ)
    m = FEMMesh(V, T)
    assert m.volume() == pytest.approx(2.0, rel=1e-12)


def test_quad_and_hex_subdiv():
    Vq = np.array([[0, 0], [1, 0], [1, 1], [0, 1.]])
    Q = np.array([[0, 1, 2, 3]])
    V2, Tq = filters.quad_tri_split_diagonal(Vq, Q)
    m = FEMMesh(V2, Tq)
    assert m.volume() == pytest.approx(1.0)

    Vh = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                   for x in (0, 1)], dtype=float)
    H = np.array([[0, 1, 2, 3, 4, 5, 6, 7]])
    V3, Th = filters.hex_tet_subdiv(Vh, H)
    m3 = FEMMesh(V3, Th)
    assert m3.volume() == pytest.approx(1.0, rel=1e-12)


def test_html_viewer_export(tmp_path):
    """Self-contained WebGL viewer export (pythreejs viewer parity)."""
    import json
    import re
    from meshfem_tpu import vis

    V, F = generators.grid_tri(4, 4)
    m = FEMMesh(V, F)
    p = tmp_path / "v.html"
    vis.write_html_viewer(p, m, field=np.asarray(m.V)[:, 0],
                          mode=np.asarray(m.V) * 0.1, n_frames=8)
    html = p.read_text()
    assert "webgl" in html and "requestAnimationFrame" in html
    data = json.loads(re.search(r"const DATA=(\{.*?\});\n", html,
                                re.S).group(1))
    assert len(data["V"]) == m.num_vertices
    assert len(data["F"]) == m.num_elements
    assert len(data["frames"]) == 8 and data["C"] is not None
    # tet meshes render their boundary surface
    V3, T = generators.grid_tet(2, 2, 2)
    m3 = FEMMesh(V3, T)
    vis.write_html_viewer(tmp_path / "v3.html", m3)


def test_material_stress_strain_fit():
    """Isotropic + orthotropic moduli recovery from (strain, stress)
    samples (the reference's optional Ceres StressStrainFit,
    Materials.hh:200-400)."""
    import jax.numpy as jnp
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.physics import materials as mats

    rng = np.random.default_rng(0)
    eps = rng.standard_normal((40, 3)) * 1e-2
    D = et.isotropic(2, 7.0, 0.27)
    sig = np.asarray(et.double_contract(D, jnp.asarray(eps)))
    E, nu = mats.fit_isotropic(eps, sig,
                               volumes=np.abs(rng.random(40)) + 0.1)
    assert E == pytest.approx(7.0, rel=1e-6)
    assert nu == pytest.approx(0.27, abs=1e-6)

    eps3 = rng.standard_normal((40, 6)) * 1e-2
    Do3 = et.orthotropic_3d(5.0, 8.0, 11.0, 0.25, 0.2, 0.3, 2.0, 3.0, 4.0)
    sig3 = np.asarray(et.double_contract(Do3, jnp.asarray(eps3)))
    out = mats.fit_orthotropic(eps3, sig3)
    for k, v in dict(Ex=5.0, Ey=8.0, Ez=11.0, nu_yx=0.25, nu_zx=0.2,
                     nu_zy=0.3, mu_yz=2.0, mu_zx=3.0, mu_xy=4.0).items():
        assert out[k] == pytest.approx(v, rel=1e-9), k

    # round trip: rebuilding the tensor from the fit reproduces it
    Dr = et.orthotropic_3d(out["Ex"], out["Ey"], out["Ez"], out["nu_yx"],
                           out["nu_zx"], out["nu_zy"], out["mu_yz"],
                           out["mu_zx"], out["mu_xy"])
    np.testing.assert_allclose(np.asarray(Dr), np.asarray(Do3), rtol=1e-9)
