"""Golden-field parity on the reference's OWN example meshes (SURVEY §4,
BASELINE configs): load real meshes from /root/reference/examples/meshes,
run the full pipeline, and check fields against f64 host direct solves to
1e-8 — plus the reference's mass-matrix property test on the same meshes
(``tests/test_mass.cc:7-45``) and asserting convergence slopes (the
reference's laplace/elasticity convergence experiments)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from meshfem_tpu.io import meshio
from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material
from meshfem_tpu.physics.poisson import PoissonProblem
from meshfem_tpu.ops import operators

REF = "/root/reference/examples/meshes"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference meshes unavailable")


def load2d(name):
    V, F = meshio.load(os.path.join(REF, name))
    return V[:, :2], F


# ---------------------------------------------------------------------------
# Field parity: CG solve vs host f64 direct solve on real meshes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,dim,degree", [
    ("square_hole.off", 2, 1),
    ("square_hole.off", 2, 2),
    ("ball.msh", 3, 1),
    ("ball.msh", 3, 2),
    ("cube_cross.msh", 3, 2),
])
def test_elasticity_field_parity(name, dim, degree):
    V, F = meshio.load(os.path.join(REF, name))
    mesh = FEMMesh(V[:, :dim], F, degree=degree)
    sim = ElasticitySimulator(mesh, Material.isotropic(dim, 200.0, 0.3))

    bb = mesh.bbox()
    lo = np.asarray(bb.min)
    # clamp a bottom slab (15% of the height): thick enough to suppress all
    # rigid modes on curved meshes like the ball (a single pole node is not)
    slab = 0.15 * float(bb.dimensions[dim - 1])
    pos = np.asarray(mesh.node_positions)
    bottom = np.flatnonzero(pos[:, dim - 1] < lo[dim - 1] + slab)
    assert len(bottom) >= 3
    sim.fix_nodes(bottom, 0.0)
    rng = np.random.default_rng(7)
    load = rng.standard_normal((sim.num_dofs, dim))
    load[np.asarray(sim.dof_map)[bottom]] = 0.0

    u, res = sim.solve(extra_load=jnp.asarray(load), tol=1e-13)

    # host direct solve on the same assembled system
    A = sim.to_scipy().tolil()
    fixed_dofs = np.flatnonzero(np.asarray(sim.dirichlet_mask).ravel())
    for i in fixed_dofs:
        A.rows[i] = [i]
        A.data[i] = [1.0]
    rhs = load.reshape(-1).copy()
    rhs[fixed_dofs] = 0.0
    x = spla.spsolve(A.tocsc(), rhs).reshape(sim.num_dofs, dim)
    u_dir = x[np.asarray(sim.dof_map)]

    scale = np.abs(u_dir).max()
    assert np.abs(np.asarray(u) - u_dir).max() / scale < 1e-8


def test_poisson_field_parity_square_hole():
    V, F = load2d("square_hole.off")
    mesh = FEMMesh(V, F, degree=2)
    ps = PoissonProblem(mesh)
    pos = np.asarray(mesh.node_positions)
    bdry = np.asarray(mesh.bdry_nodes)
    g = pos[bdry, 0] ** 2 - pos[bdry, 1] ** 2
    rng = np.random.default_rng(1)
    f = rng.standard_normal(mesh.num_nodes)
    u = np.asarray(ps.solve(bdry, g, source=jnp.asarray(f), tol=1e-13)[0])

    L = operators.laplacian(mesh).to_scipy().tolil()
    M = operators.mass(mesh).to_scipy()
    rhs = np.asarray(M @ f)
    for i in bdry:
        L.rows[i] = [int(i)]
        L.data[i] = [1.0]
    rhs[bdry] = g
    x = spla.spsolve(L.tocsc(), rhs)
    assert np.abs(u - x).max() / np.abs(x).max() < 1e-8


# ---------------------------------------------------------------------------
# Mass-matrix property test on the reference meshes (test_mass.cc)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,dim,degree", [
    ("square_hole.off", 2, 1), ("square_hole.off", 2, 2),
    ("ball.msh", 3, 1), ("ball.msh", 3, 2),
])
def test_mass_matrix_property(name, dim, degree):
    """u^T M u == int |u_interp|^2 for random nodal fields (the reference's
    own acceptance test, run on its own meshes)."""
    from meshfem_tpu.ops import element_matrices as em

    V, F = meshio.load(os.path.join(REF, name))
    mesh = FEMMesh(V[:, :dim], F, degree=degree)
    M = operators.mass(mesh)
    geom = mesh.geometry()
    rng = np.random.default_rng(2)
    from meshfem_tpu.fem import shape_functions as sf, quadrature

    pts, wts = quadrature.rule_np(mesh.K, 2 * degree)
    phi = sf.eval_shape_np(mesh.K, degree, pts)       # [Q, n]
    for _ in range(4):
        u = jnp.asarray(rng.standard_normal(mesh.num_nodes))
        quad = np.asarray(u)[np.asarray(mesh.elem_nodes)]  # [E, n]
        uq = quad @ phi.T                                  # [E, Q]
        integral = float(np.einsum("eq,q,e->", uq ** 2, wts,
                                   np.asarray(geom.volume)))
        utMu = float(jnp.vdot(u, M(u)))
        assert utMu == pytest.approx(integral, rel=1e-12)


# ---------------------------------------------------------------------------
# Convergence slopes as assertions (laplace/elasticity convergence suites)
# ---------------------------------------------------------------------------

def _poisson_l2_error(n, degree):
    V, F = generators.grid_tri(n, n)
    mesh = FEMMesh(V, F, degree=degree)
    ps = PoissonProblem(mesh)
    pos = np.asarray(mesh.node_positions)
    exact = np.sin(np.pi * pos[:, 0]) * np.sin(np.pi * pos[:, 1])
    bdry = np.asarray(mesh.bdry_nodes)

    def src_fn(x):
        return 2 * np.pi ** 2 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])

    u = np.asarray(ps.solve(bdry, np.zeros(len(bdry)), source=src_fn,
                            tol=1e-13)[0])
    err = u - exact
    M = operators.mass(mesh)
    return float(np.sqrt(np.abs(np.asarray(
        jnp.vdot(jnp.asarray(err), M(jnp.asarray(err)))))))


@pytest.mark.parametrize("degree,expected", [(1, 2.0), (2, 3.0)])
def test_poisson_convergence_slope(degree, expected):
    """L2 error slope matches theory: h^2 for P1, h^3 for P2 (the
    reference's laplace_convergence acceptance criterion)."""
    ns = (8, 16, 32)
    errs = [_poisson_l2_error(n, degree) for n in ns]
    slopes = [np.log2(errs[i] / errs[i + 1]) for i in range(len(ns) - 1)]
    assert slopes[-1] == pytest.approx(expected, abs=0.35), (errs, slopes)


def _elasticity_l2_error(n, degree, nu):
    """Manufactured solution u = (sin(pi x) sin(pi y), 0) (homogeneous
    Dirichlet on the unit square), body force f = -div(sigma)."""
    import jax.numpy as jnp
    from meshfem_tpu.physics import ElasticitySimulator, Material

    V, F = generators.grid_tri(n, n)
    mesh = FEMMesh(V, F, degree=degree)
    E_mod = 1.0
    mat = Material.isotropic(2, E_mod, nu)
    # 2D isotropic() uses the plane-STRESS lambda (ElasticityTensor.hh:100)
    lam = E_mod * nu / (1 - nu * nu)
    mu = E_mod / (2 * (1 + nu))
    pos = np.asarray(mesh.node_positions)
    s = np.sin(np.pi * pos[:, 0]) * np.sin(np.pi * pos[:, 1])
    c = np.cos(np.pi * pos[:, 0]) * np.cos(np.pi * pos[:, 1])
    u_exact = np.stack([s, np.zeros_like(s)], axis=1)
    f = np.pi ** 2 * np.stack([(lam + 3 * mu) * s, -(lam + mu) * c], axis=1)

    sim = ElasticitySimulator(mesh, mat)
    M = operators.mass_elasticity(mesh)
    load = np.asarray(M(jnp.asarray(f)))
    bdry = np.asarray(mesh.bdry_nodes)
    load_j = jnp.asarray(load).at[jnp.asarray(bdry)].set(0.0)
    sim.fix_nodes(bdry, 0.0)
    u, _ = sim.solve(extra_load=load_j, tol=1e-13)
    err = jnp.asarray(np.asarray(u) - u_exact)
    return float(np.sqrt(np.abs(float(jnp.vdot(err, M(err))))))


@pytest.mark.parametrize("degree,nu,expected", [
    (1, 0.3, 2.0), (2, 0.3, 3.0), (2, 0.45, 3.0)])
def test_elasticity_convergence_slope(degree, nu, expected):
    """L2 slopes h^2 (P1) / h^3 (P2), including a higher-Poisson-ratio case
    (the reference's elasticity_convergence sweep)."""
    ns = (8, 16, 32)
    errs = [_elasticity_l2_error(n, degree, nu) for n in ns]
    slopes = [np.log2(errs[i] / errs[i + 1]) for i in range(len(ns) - 1)]
    assert slopes[-1] == pytest.approx(expected, abs=0.4), (errs, slopes)


def test_orthocell_homogenization_2d_reference_mesh():
    """BASELINE config 4 (orthotropic cell): homogenize the reference's own
    2D orthocell mesh; the reconstructed full tensor must be orthotropic
    (no normal-shear coupling) and SPD with sane moduli."""
    from meshfem_tpu.analysis import homogenization as hom

    V, F = load2d("2D_microstructure_orthocell.msh")
    mesh = FEMMesh(V, F, degree=2)
    r = hom.homogenize(mesh, Material.isotropic(2, 1.0, 0.3),
                       orthotropic_cell=True, tol=1e-12)
    Ch = np.asarray(r.Ch)
    # orthotropy: zero normal-shear coupling
    assert abs(Ch[0, 2]) < 1e-10 * abs(Ch[0, 0])
    assert abs(Ch[1, 2]) < 1e-10 * abs(Ch[0, 0])
    w = np.linalg.eigvalsh(0.5 * (Ch + Ch.T))
    assert w.min() > 0
    # softer than the base material (it has holes), stiffer than nothing
    assert 0 < Ch[0, 0] < 1.0 / (1 - 0.3 ** 2) + 1e-9


def test_vibrational_modes_ball_reference_mesh():
    """BASELINE config 5: generalized eigensolve (K, M) on the reference's
    ball.msh vs scipy's shift-invert eigsh (compute_vibrational_modes.py)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from meshfem_tpu.analysis import modes as modes_mod

    V, F = meshio.load(os.path.join(REF, "ball.msh"))
    mesh = FEMMesh(V, F, degree=1)
    sim = ElasticitySimulator(mesh, Material.isotropic(3, 10.0, 0.3))
    lam, X = modes_mod.compute_vibrational_modes(sim, n_modes=4,
                                                 tol=1e-9, maxiter=2000)[:2]
    K = sim.to_scipy().tocsc()
    from meshfem_tpu.ops import operators

    M_op = operators.mass_elasticity(mesh)
    M = M_op.to_scipy().tocsc()
    # reference eigsh path: smallest modes above the 6 rigid ones
    w_ref = spla.eigsh(K, k=10, M=M, sigma=0.0, which="LM",
                       return_eigenvectors=False)
    w_ref = np.sort(w_ref)
    # first 6 are (numerically) rigid
    assert np.abs(w_ref[:6]).max() < 1e-8 * abs(w_ref[6])
    np.testing.assert_allclose(np.sort(np.asarray(lam))[:4],
                               w_ref[6:10], rtol=1e-5)
