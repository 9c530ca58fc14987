"""Mechanisms (linkage) analysis: energy-form Eh, its vertex shape
derivative, and the open/optimize drivers.

Validation strategy mirrors the reference's fd_validation harness: the
autodiff discrete differential must match finite differences of the FULL
pipeline (re-solve cell problems on the perturbed mesh), which holds
because the energy form is stationary in the fluctuation fields
(``PeriodicHomogenization.hh:383-484``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.analysis import homogenization as hom
from meshfem_tpu.analysis import mechanisms as mech


def _cell_mesh(n=6):
    """A periodic 2D cell with a hole-ish stiffness contrast would need
    material fields; instead perturb interior vertices of a uniform grid so
    Eh has a nontrivial shape derivative."""
    V, F = generators.grid_tri(n, n)
    V = np.asarray(V, np.float64)
    rng = np.random.default_rng(3)
    interior = ((V[:, 0] > 1e-9) & (V[:, 0] < 1 - 1e-9)
                & (V[:, 1] > 1e-9) & (V[:, 1] < 1 - 1e-9))
    V[interior] += 0.25 / n * (rng.random((interior.sum(), 2)) - 0.5)
    return FEMMesh(V, F, degree=2)


@pytest.fixture(scope="module")
def cell():
    mesh = _cell_mesh()
    D = et.isotropic(2, 1.0, 0.3)
    sim = hom.periodic_simulator(mesh, D)
    w, _ = hom.solve_cell_problems(sim, tol=1e-12)
    return mesh, D, sim, w


def test_energy_form_matches_stress_form(cell):
    mesh, D, sim, w = cell
    Eh_s = np.asarray(hom.homogenized_tensor_stress_form(sim, w))
    Eh_e = np.asarray(mech.energy_form_Eh(mesh, D, w))
    np.testing.assert_allclose(Eh_e, Eh_s, rtol=1e-9, atol=1e-11)


def test_eh_vertex_differential_vs_fd(cell):
    mesh, D, sim, w = cell
    dEh = np.asarray(mech.eh_vertex_differential(mesh, D, w))

    rng = np.random.default_rng(0)
    delta = rng.standard_normal(mesh.V.shape)
    # keep the periodic boundary fixed so identified nodes stay identified
    Vb = np.asarray(mesh.V)
    onb = ((np.abs(Vb[:, 0]) < 1e-9) | (np.abs(Vb[:, 0] - 1) < 1e-9)
           | (np.abs(Vb[:, 1]) < 1e-9) | (np.abs(Vb[:, 1] - 1) < 1e-9))
    delta[onb] = 0.0
    directional = float(np.einsum("vc,vcij->ij", delta, dEh)[0, 0])

    def full_Eh00(t):
        m = FEMMesh(Vb + t * delta, mesh.F, degree=2)
        s = hom.periodic_simulator(m, D)
        wt, _ = hom.solve_cell_problems(s, tol=1e-13)
        return float(np.asarray(
            hom.homogenized_tensor_stress_form(s, wt))[0, 0])

    h = 1e-5
    fd = (full_Eh00(h) - full_Eh00(-h)) / (2 * h)
    assert abs(fd - directional) <= 2e-4 * max(abs(fd), 1e-12) + 1e-9, \
        (fd, directional)


def test_open_linkage_smoke():
    mesh = _cell_mesh(5)
    D = et.isotropic(2, 1.0, 0.3)
    res = mech.open_linkage(mesh, D, num_steps=3, opening_speed=0.005,
                            tol=1e-9)
    assert len(res.steps) == 3
    assert res.vertices.shape == mesh.V.shape
    assert res.max_rel_edge_change > 0
    assert res.max_rel_edge_change < 0.2
    for s in res.steps:
        # opening strain oriented with positive first component
        assert s.opening_strain[0] >= 0
        assert np.isfinite(s.min_eigenvalue)
        # step magnitude == opening_speed after max-column-normalize
        assert np.abs(np.linalg.norm(s.step_field, axis=1).max()
                      - 0.005) < 1e-9


def test_optimize_linkage_smoke():
    mesh = _cell_mesh(4)
    D = et.isotropic(2, 1.0, 0.3)
    res = mech.optimize_linkage(mesh, D, num_steps=2, step_size=0.002,
                                tol=1e-9)
    assert len(res.steps) == 2
    assert np.isfinite(res.Eh).all()
    # identified periodic vertices must receive identical descent steps
    from meshfem_tpu.mesh import periodic as per

    m2 = FEMMesh(np.asarray(mesh.V), mesh.F, degree=mesh.degree)
    dof_map, _, _ = per.match_periodic_nodes(m2.node_positions, m2.bbox(),
                                             1e-7)
    vdofs = np.asarray(dof_map)[np.asarray(m2.vertex_nodes)]
    step = res.steps[0].step_field
    for dof in np.unique(vdofs):
        grp = step[vdofs == dof]
        np.testing.assert_allclose(grp - grp[0][None], 0.0, atol=1e-12)


def test_mechanisms_cli_smoke(tmp_path, monkeypatch, capsys):
    """Both subcommands run end-to-end and write the reference binaries'
    output files (OpenLinkage.cc / OptimizeLinkage.cc I/O surface)."""
    from meshfem_tpu.cli import mechanisms as cli
    from meshfem_tpu.io import meshio

    mesh = _cell_mesh(4)
    mesh_path = tmp_path / "cell.off"
    meshio.save_off(mesh_path, np.asarray(mesh.V), np.asarray(mesh.F))
    monkeypatch.chdir(tmp_path)

    cli.main(["open", "link", str(mesh_path), "-n", "2", "-s", "0.002",
              "--outputFreq", "1"])
    assert (tmp_path / "link_minEigenvalue.txt").exists()
    assert (tmp_path / "link_openingStrain_ellipse.txt").exists()
    assert (tmp_path / "opened.msh").exists()
    assert (tmp_path / "linkopen_it_0.msh").exists()
    eigs = (tmp_path / "link_minEigenvalue.txt").read_text().split()
    assert len(eigs) == 2 and all(np.isfinite(float(x)) for x in eigs)
    out = capsys.readouterr().out
    assert "Maximum relative edge length change" in out

    cli.main(["optimize", str(mesh_path), "-n", "1", "-d", "2"])
    out = capsys.readouterr().out
    assert "Homogenized compliance tensor" in out
    assert "Anisotropy" in out
    assert (tmp_path / "vertical_linkage_it0.msh").exists()
