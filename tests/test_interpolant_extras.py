"""Interpolant algebra, tensor projection, extra operators, triangulation,
timers (parity with reference test_interpolant.cc + aux subsystems)."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.fem.interpolant import Interpolant, restrict_to_boundary
from meshfem_tpu.fem import tensor_projection, elasticity_tensor as et
from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.mesh.triangulate import triangulate_pslg
from meshfem_tpu.ops import extra_operators as xops
from meshfem_tpu.utils import timer as timer_mod


# -- interpolants -----------------------------------------------------------

@pytest.mark.parametrize("K,deg", [(1, 2), (2, 1), (2, 2), (2, 3), (3, 2)])
def test_interpolant_sampling_eval(K, deg, rng):
    """Sampling a degree-deg polynomial reproduces it exactly."""
    coef = rng.standard_normal(K + 1)

    def f(lam):
        return float(np.sum(coef * np.asarray(lam) ** deg))

    interp = Interpolant.from_function(K, deg, f)
    for _ in range(5):
        lam = rng.dirichlet(np.ones(K + 1))
        assert float(interp(jnp.asarray(lam))) == pytest.approx(
            f(lam), abs=1e-12)


def test_interpolant_integration_and_promotion(rng):
    K, deg = 2, 2
    interp = Interpolant.from_function(K, deg,
                                       lambda lam: float(lam[0] * lam[1]))
    # int lambda0 lambda1 over unit-volume tri = 2!/(2+2)!*... = 1/12.
    assert float(interp.integrate(1.0)) == pytest.approx(1 / 12, rel=1e-12)
    promoted = interp.promoted(4)
    assert float(promoted.integrate(1.0)) == pytest.approx(1 / 12, rel=1e-12)
    lam = rng.dirichlet(np.ones(3))
    assert float(promoted(jnp.asarray(lam))) == pytest.approx(
        float(interp(jnp.asarray(lam))), abs=1e-12)


def test_interpolant_arithmetic(rng):
    a = Interpolant.from_function(2, 1, lambda l: float(l[0]))
    b = Interpolant.from_function(2, 2, lambda l: float(l[1] * l[2]))
    c = a + b  # degree promotion to 2
    lam = rng.dirichlet(np.ones(3))
    assert float(c(jnp.asarray(lam))) == pytest.approx(
        lam[0] + lam[1] * lam[2], abs=1e-12)


def test_restrict_to_boundary():
    """Volume interpolant restricted to a face matches boundary sampling."""
    from meshfem_tpu.fem import simplex, shape_functions as sf

    for K in (2, 3):
        for face in range(K + 1):
            idx = restrict_to_boundary(K, 2, face)
            assert len(idx) == simplex.num_nodes(K - 1, 2)
            assert len(np.unique(idx)) == len(idx)


# -- tensor projection ------------------------------------------------------

def test_closest_isotropic_of_isotropic():
    D = et.isotropic(3, 5.0, 0.3)
    proj, ch, cd = tensor_projection.closest_isotropic_tensor(D)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(D), atol=1e-10)
    assert float(tensor_projection.isotropy_distance(D)) < 1e-12


def test_isotropy_distance_orthotropic():
    D = et.orthotropic_3d(10.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.5, 0.5, 0.5)
    dist = float(tensor_projection.isotropy_distance(D))
    assert 0.05 < dist < 1.0


# -- extra operators --------------------------------------------------------

def test_boundary_laplacian():
    V, T = generators.grid_tet(2, 2, 2)
    mesh = FEMMesh(V, T, degree=1)
    Lb = xops.boundary_laplacian(mesh)
    ones = jnp.ones(mesh.num_nodes)
    np.testing.assert_allclose(np.asarray(Lb(ones)), 0.0, atol=1e-10)
    # interior rows are empty
    interior = ~mesh.is_bdry_node
    u = jnp.asarray(np.random.default_rng(0).standard_normal(mesh.num_nodes))
    out = np.asarray(Lb(u))
    np.testing.assert_allclose(out[interior], 0.0, atol=1e-12)


def test_uniform_laplacian_and_perturb():
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F)
    L = xops.uniform_laplacian(V, mesh.cell.edges())
    assert abs(L @ np.ones(len(V))).max() < 1e-12
    vel = 0.01 * np.ones((len(mesh.cell.boundary_vertices()), 2))
    V2 = xops.perturb_mesh(mesh, vel)
    assert np.abs(V2 - V).max() <= 0.01 + 1e-9
    bverts = mesh.cell.boundary_vertices()
    np.testing.assert_allclose(V2[bverts] - V[bverts], 0.01, atol=1e-10)


def test_grid_function():
    x = np.linspace(0, 1, 32)
    X, Y = np.meshgrid(x, x, indexing="ij")
    g = xops.GridFunction(X ** 2 + Y ** 2, spacing=x[1] - x[0])
    lap = np.asarray(g.laplacian())
    np.testing.assert_allclose(lap[2:-2, 2:-2], 4.0, atol=1e-6)
    sm = g.smoothed(3)
    assert float(jnp.abs(sm.values - g.values).max()) < 0.1
    val = g.sample(np.array([[0.5, 0.5]]))
    assert float(val[0]) == pytest.approx(0.5, abs=0.01)


# -- triangulation ----------------------------------------------------------

def test_triangulate_square_with_hole():
    outline = np.array([[0, 0], [1, 0], [1, 1], [0, 1.]])
    hole = np.array([[0.4, 0.4], [0.6, 0.4], [0.6, 0.6], [0.4, 0.6]])
    V, F = triangulate_pslg(outline, holes=[hole], target_area=0.002)
    mesh = FEMMesh(V, F)
    vol = mesh.volume()
    assert vol == pytest.approx(1.0 - 0.04, rel=0.08)
    assert np.asarray(mesh.geometry().volume).min() > 0


# -- timers -----------------------------------------------------------------

def test_timer_sections():
    t = timer_mod.Timer()
    t.enabled = True
    with t.section("outer"):
        with t.section("inner"):
            pass
    rep = t.report()
    assert "outer" in rep and "outer/inner" in rep

    timer_mod.enable_benchmarking(True)

    @timer_mod.benchmarkit
    def work():
        return 42

    assert work() == 42
    assert any("work" in k for k in timer_mod.GLOBAL_TIMER.sections)
    timer_mod.enable_benchmarking(False)
