"""M4/M6 tests: eigensolver, SPSD facade, Newton + nonlinear energies,
implicit differentiation, material optimization, FD validation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material
from meshfem_tpu.physics import energies
from meshfem_tpu.solvers import eigen, newton, spsd
from meshfem_tpu.solvers.implicit import solve_implicit
from meshfem_tpu.analysis import modes as modes_mod
from meshfem_tpu.analysis.material_optimization import (
    MaterialOptimizationProblem, optimize)
from meshfem_tpu.utils.fd_validation import fd_gradient_check, fd_hessian_check
from meshfem_tpu.ops import operators
from meshfem_tpu.solvers import cg as cg_mod


# -- eigen / modes ----------------------------------------------------------

def test_vibrational_modes_free_square():
    V, F = generators.grid_tri(6, 6)
    mesh = FEMMesh(V, F, degree=1)
    sim = ElasticitySimulator(mesh, Material.isotropic(2, 5.0, 0.3))
    lam, X = modes_mod.compute_vibrational_modes(sim, n_modes=4, tol=1e-6)
    # Rigid modes deflated: all returned eigenvalues strictly positive.
    assert np.all(lam > 1e-6)
    assert np.all(np.diff(lam) > -1e-8)
    # Residual check: K x = lam M x.
    Mv = operators.mass_elasticity(mesh)
    for j in range(2):
        x = jnp.asarray(X[:, :, j])
        r = sim.apply_K(x) - lam[j] * Mv(x)
        rel = float(jnp.linalg.norm(r)) / (lam[j] * float(jnp.linalg.norm(Mv(x))))
        assert rel < 1e-4, (j, rel)


def test_modes_match_scipy():
    """Cross-check against scipy shift-invert (the reference's
    compute_vibrational_modes.py mechanism)."""
    import scipy.sparse.linalg as spla

    V, F = generators.grid_tri(5, 5)
    mesh = FEMMesh(V, F, degree=1)
    sim = ElasticitySimulator(mesh, Material.isotropic(2, 5.0, 0.3))
    K = sim.to_scipy()
    M = operators.mass_elasticity(mesh).to_scipy()
    w_ref = spla.eigsh(K, k=7, M=M, sigma=-1e-6, which="LM",
                       return_eigenvectors=False)
    w_ref = np.sort(w_ref)[3:]  # drop rigid modes
    lam, _ = modes_mod.compute_vibrational_modes(sim, n_modes=4, tol=1e-7,
                                                 maxiter=400)
    np.testing.assert_allclose(lam[:3], w_ref[:3], rtol=1e-4)


def test_power_iteration():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((30, 30))
    A = A @ A.T
    Aj = jnp.asarray(A)
    lam, v = eigen.largest_magnitude_eigenvalue(lambda x: Aj @ x, 30,
                                                iters=2000, tol=1e-12)
    assert lam == pytest.approx(np.linalg.eigvalsh(A)[-1], rel=1e-6)


# -- SPSD facade ------------------------------------------------------------

def test_spsd_fix_variables_and_constraints():
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    L = operators.laplacian(mesh)
    A = L.to_scipy()
    rng = np.random.default_rng(1)
    b = rng.standard_normal(mesh.num_nodes)

    sys_cg = spsd.SPSDSystem(lambda u: L(u), n=mesh.num_nodes)
    sys_cg.fix_variables(mesh.bdry_nodes, 0.0)
    x_cg = np.asarray(sys_cg.solve(jnp.asarray(b), tol=1e-13))

    sys_dir = spsd.SPSDSystem(A)
    sys_dir.fix_variables(mesh.bdry_nodes, 0.0)
    x_dir = np.asarray(sys_dir.solve(jnp.asarray(b), direct=True))
    np.testing.assert_allclose(x_cg, x_dir, atol=1e-8)

    # Mean-zero constraint replaces fixing (homogeneous C u = 0).
    sys_c = spsd.SPSDSystem(lambda u: L(u), n=mesh.num_nodes)
    sys_c.set_constrained(np.ones((1, mesh.num_nodes)))
    b0 = b - b.mean()
    x_c = np.asarray(sys_c.solve(jnp.asarray(b0), tol=1e-13))
    assert abs(x_c.mean()) < 1e-10
    r = np.asarray(L(jnp.asarray(x_c))) - b0
    assert np.abs(r - r.mean()).max() < 1e-8


# -- energies / Newton ------------------------------------------------------

def test_energy_densities_rest_state():
    F = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
    Fm = jnp.broadcast_to(jnp.eye(3)[:, :2], (5, 3, 2))  # membrane rest state
    for name, fn in energies.ENERGY_DENSITIES.items():
        Fx = Fm if "membrane" in name or "tension" in name else F
        e = np.asarray(fn(Fx, 1.2, 0.8))
        np.testing.assert_allclose(e, 0.0, atol=1e-12, err_msg=name)
        if "tension" in name:
            continue  # relaxed energy is only C^0 at the rest state
        P = energies.pk1_stress(fn)(Fx, 1.2, 0.8)
        np.testing.assert_allclose(np.asarray(P), 0.0, atol=1e-10,
                                   err_msg=name)


def test_energy_densities_fd():
    rng = np.random.default_rng(0)
    F = jnp.asarray(np.eye(3) + 0.1 * rng.standard_normal((4, 3, 3)))
    for name in ("stvk", "neo_hookean", "linear"):
        fn = energies.ENERGY_DENSITIES[name]
        err = fd_gradient_check(lambda F_: jnp.sum(fn(F_, 1.2, 0.8)), F)
        assert err < 1e-5, (name, err)


def test_small_strain_consistency():
    """NeoHookean/StVK/corotated linearize to linear elasticity at I."""
    rng = np.random.default_rng(1)
    dF = 1e-4 * rng.standard_normal((3, 3))
    F = jnp.asarray(np.eye(3) + dF)[None]
    lam, mu = 1.3, 0.7
    e_lin = float(energies.linear_elasticity_energy(F, lam, mu)[0])
    for name in ("stvk", "neo_hookean", "corotated"):
        e = float(energies.ENERGY_DENSITIES[name](F, lam, mu)[0])
        assert e == pytest.approx(e_lin, rel=5e-3), name


def test_newton_nonlinear_stretch():
    """Minimize NeoHookean energy of a stretched bar: Newton converges and
    the solution is volume-preserving-ish under tension."""
    V, F = generators.grid_tri(6, 3, hi=(2.0, 1.0))
    mesh = FEMMesh(V, F, degree=1)
    E_fn = energies.total_energy(mesh, "neo_hookean", 2.0, 1.0)
    X = jnp.asarray(mesh.node_positions)
    left = mesh.nodes_in_box((0, 0), (0, 1))
    right = mesh.nodes_in_box((2, 0), (2, 1))
    fixed = np.zeros((mesh.num_nodes, 2), dtype=bool)
    fixed[left] = True
    fixed[right, 0] = True
    target = np.asarray(X).copy()
    target[right, 0] = 2.4  # 20% stretch
    free = jnp.asarray(~fixed)

    x0 = jnp.asarray(target)

    def energy(x):
        return E_fn(x)

    project = cg_mod.mask_projector(free)
    x, report = newton.newton_from_energy(energy, x0, project=project,
                                          gradTol=1e-9, maxiter=30)
    assert report.converged
    assert report.energy[-1] < report.energy[0]
    # Poisson contraction: mid-bar narrows.
    mid = mesh.nodes_in_box((1, 1), (1, 1))
    assert float(x[mid, 1].mean()) < 1.0


# -- implicit differentiation / material optimization -----------------------

def test_implicit_solve_gradient():
    """d/dtheta of u(theta) solving (theta K) u = b equals -u/theta."""
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    L = operators.laplacian(mesh)
    free = np.ones(mesh.num_nodes)
    free[mesh.bdry_nodes] = 0.0
    project = cg_mod.mask_projector(jnp.asarray(free))
    rng = np.random.default_rng(0)
    b = project(jnp.asarray(rng.standard_normal(mesh.num_nodes)))

    def u_of(theta):
        return solve_implicit(lambda v: theta * L(v), b, project=project,
                              tol=1e-13)

    theta0 = 2.0
    J = lambda th: jnp.sum(u_of(th) ** 2)
    g = float(jax.grad(J)(theta0))
    expect = float(-2.0 / theta0 * J(theta0))
    assert g == pytest.approx(expect, rel=1e-8)


def test_material_optimization_recovers_stiffness():
    """Fit a uniform Young's modulus to target displacements generated by a
    known modulus — the optimizer should recover it."""
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    d = 2
    left = mesh.nodes_in_box((0, 0), (0, 1))
    fixed = np.zeros((mesh.num_nodes, d), dtype=bool)
    fixed[left] = True
    load = np.zeros((mesh.num_nodes, d))
    right = mesh.nodes_in_box((1, 0), (1, 1))
    load[right, 0] = 0.05

    E_true = 3.0
    prob = MaterialOptimizationProblem(
        mesh, 0.3, fixed, np.zeros_like(load, dtype=float),
        jnp.asarray(load), right, np.zeros((len(right), d)),
        bounds=(0.5, 8.0))
    u_true = prob.displacement(jnp.full(mesh.num_elements, E_true))
    prob.target_values = np.asarray(u_true)[right]
    prob.__post_init__()

    # FD-check the objective gradient (reference fd_validation harness).
    y0 = jnp.full(mesh.num_elements, 2.0)
    err = fd_gradient_check(prob.objective, y0, eps=1e-5, n_dirs=3)
    assert err < 1e-4, err

    young, hist = optimize(prob, y0, steps=60, learning_rate=0.2)
    assert hist[-1] < 1e-2 * hist[0]
    assert abs(float(jnp.mean(young)) - E_true) / E_true < 0.2


def test_fd_hessian_harness():
    f = lambda x: jnp.sum(jnp.sin(x) * x ** 2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(10))
    assert fd_hessian_check(f, x) < 1e-6


def test_spsd_multi_rhs_block_solve():
    """Multi-RHS solve is a single fused block CG (no per-column loop) and
    matches per-column solves."""
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    L = operators.laplacian(mesh)
    rng = np.random.default_rng(2)
    B = rng.standard_normal((mesh.num_nodes, 3))

    sys_cg = spsd.SPSDSystem(lambda u: L(u), n=mesh.num_nodes)
    sys_cg.fix_variables(mesh.bdry_nodes, 0.0)
    X = np.asarray(sys_cg.solve(jnp.asarray(B), tol=1e-13))
    for j in range(3):
        xj = np.asarray(sys_cg.solve(jnp.asarray(B[:, j]), tol=1e-13))
        np.testing.assert_allclose(X[:, j], xj, atol=1e-8)

    # scipy-matrix path, with inhomogeneous fixed values
    A = L.to_scipy()
    sys2 = spsd.SPSDSystem(A)
    sys2.fix_variables(mesh.bdry_nodes, 0.5)
    X2 = np.asarray(sys2.solve(jnp.asarray(B), tol=1e-13))
    x20 = np.asarray(sys2.solve(jnp.asarray(B[:, 0]), tol=1e-13))
    np.testing.assert_allclose(X2[:, 0], x20, atol=1e-8)


def test_newton_bound_constraints():
    """Box-constrained Newton (working-set projected Newton) hits the
    clamped KKT solution of a strictly convex quadratic."""
    from meshfem_tpu.solvers.newton import newton_from_energy
    import scipy.optimize as sopt

    rng = np.random.default_rng(5)
    n = 12
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n) * 3
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def energy(x):
        return 0.5 * x @ (Aj @ x) - bj @ x

    lo, hi = -0.3 * np.ones(n), 0.4 * np.ones(n)
    x, rep = newton_from_energy(energy, jnp.zeros(n), lower=lo, upper=hi,
                                gradTol=1e-10, maxiter=60)
    assert rep.converged
    ref = sopt.minimize(
        lambda v: 0.5 * v @ A @ v - b @ v,
        np.zeros(n), jac=lambda v: A @ v - b,
        bounds=list(zip(lo, hi)), method="L-BFGS-B",
        options={"ftol": 1e-15, "gtol": 1e-12}).x
    np.testing.assert_allclose(np.asarray(x), ref, atol=1e-6)
    assert (np.asarray(x) >= lo - 1e-12).all()
    assert (np.asarray(x) <= hi + 1e-12).all()
    # some bounds are genuinely active for this data
    assert ((np.abs(np.asarray(x) - lo) < 1e-9)
            | (np.abs(np.asarray(x) - hi) < 1e-9)).any()


def test_spsd_scipy_large_multi_rhs_traceable():
    """scipy-backed SPSD above the direct-solve threshold must work under
    the traced CG loop (pure_callback matvec, single and multi RHS)."""
    import scipy.sparse as sp

    n = 25000
    A = sp.diags([np.full(n, 4.0), np.full(n - 1, -1.0),
                  np.full(n - 1, -1.0)], [0, -1, 1]).tocsr()
    sys_ = spsd.SPSDSystem(A)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, 2))
    X = np.asarray(sys_.solve(jnp.asarray(B), tol=1e-10))
    assert np.abs(A @ X - B).max() < 1e-7
    x1 = np.asarray(sys_.solve(jnp.asarray(B[:, 0]), tol=1e-10))
    assert np.abs(A @ x1 - B[:, 0]).max() < 1e-7


def test_dense_newton_rosenbrock_and_indefinite():
    """dense_newton (reference newton_optimizer/dense_newton.hh): flipped
    negative eigenvalues + Armijo backtracking minimize a nonconvex
    function from a start where the Hessian is indefinite."""
    import jax
    import jax.numpy as jnp
    from meshfem_tpu.solvers.newton import dense_newton

    def f(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1 - x[:-1]) ** 2)

    x, rep = dense_newton(f, np.array([0.5, 0.5, 0.5, 0.5]),
                          grad_tol=1e-12)
    assert rep.converged
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-8)
    # energy decreased monotonically (line search guarantees)
    e = np.asarray(rep.energy)
    assert (np.diff(e) <= 1e-12).all()

    # start at a saddle-ish point of a nonconvex quartic: negative
    # curvature must be handled by the eigenvalue flip
    def g(x):
        return jnp.sum(x ** 4) - jnp.sum(x ** 2)

    x2, rep2 = dense_newton(g, np.array([1e-3, -1e-3]), grad_tol=1e-12)
    np.testing.assert_allclose(np.abs(np.asarray(x2)),
                               1.0 / np.sqrt(2.0), atol=1e-10)
