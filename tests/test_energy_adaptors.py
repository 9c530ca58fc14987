"""Energy-density adaptor layer + tangent elasticity tensor + Newton
controller policies (reference ``EnergyDensities/EDensityAdaptors.hh``,
``TangentElasticityTensor.hh``, ``newton_optimizer/Hessian*Controller.hh``).
"""

import numpy as np
import jax
import jax.numpy as jnp

from meshfem_tpu.physics import energies as en
from meshfem_tpu.fem import elasticity_tensor as et


def _lame(E, nu):
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    return lam, mu


def test_f_from_c_adaptor_matches_native():
    """StVK via the C-based form + F-adaptor == the native F-based StVK."""
    rng = np.random.default_rng(0)
    F = jnp.asarray(np.eye(3) + 0.1 * rng.standard_normal((4, 3, 3)))
    lam, mu = _lame(1.0, 0.3)
    psi_F = en.f_based_from_c_based(en.stvk_energy_C)
    np.testing.assert_allclose(np.asarray(psi_F(F, lam, mu)),
                               np.asarray(en.stvk_energy(F, lam, mu)),
                               rtol=1e-12)


def test_f_from_c_membrane_embedding():
    """3x2 deformation gradients through the C-based adaptor (the
    reference's EmbeddingDimension=3 membrane specialization)."""
    rng = np.random.default_rng(1)
    F = jnp.asarray(np.concatenate([np.eye(2), np.zeros((1, 2))])
                    + 0.05 * rng.standard_normal((5, 3, 2)))
    lam, mu = _lame(1.0, 0.3)
    psi_F = en.f_based_from_c_based(en.stvk_energy_C)
    w = np.asarray(psi_F(F, lam, mu))
    # same energy from the explicit 2x2 C
    C = np.einsum("eki,ekj->eij", np.asarray(F), np.asarray(F))
    w_ref = np.asarray(en.stvk_energy_C(jnp.asarray(C), lam, mu))
    np.testing.assert_allclose(w, w_ref, rtol=1e-12)


def test_c_from_f_adaptor_roundtrip():
    """C-based-from-F-based at C = F^T F reproduces the F-based value for
    an isotropic density (spd sqrt recovers F up to rotation)."""
    rng = np.random.default_rng(2)
    A = 0.1 * rng.standard_normal((3, 3))
    F = jnp.asarray(np.eye(3) + A @ A.T)     # symmetric positive F
    lam, mu = _lame(1.0, 0.3)
    psi_C = en.c_based_from_f_based(en.neo_hookean_energy)
    C = jnp.einsum("ki,kj->ij", F, F)
    np.testing.assert_allclose(float(psi_C(C, lam, mu)),
                               float(en.neo_hookean_energy(F, lam, mu)),
                               rtol=1e-9)


def test_pk2_stress_stvk_closed_form():
    """StVK PK2: S = lam tr(E) I + 2 mu E."""
    rng = np.random.default_rng(3)
    C = np.eye(3) + 0.1 * rng.standard_normal((3, 3))
    C = jnp.asarray(0.5 * (C + C.T) + np.eye(3))
    lam, mu = _lame(1.0, 0.3)
    S = en.pk2_stress(en.stvk_energy_C)(C, lam, mu)
    E = 0.5 * (np.asarray(C) - np.eye(3))
    S_ref = lam * np.trace(E) * np.eye(3) + 2 * mu * E
    np.testing.assert_allclose(np.asarray(S), S_ref, rtol=1e-10)


def test_tangent_tensor_identity_matches_isotropic():
    """Tangent elasticity tensor at the identity == the isotropic linear
    tensor, for StVK (exact), corotated and NeoHookean (agree at I)."""
    lam, mu = _lame(200.0, 0.3)
    D_ref = np.asarray(et.isotropic(3, 200.0, 0.3))
    for psi, kw in [(en.stvk_energy_C, dict(c_based=True)),
                    (en.stvk_energy, {}),
                    (en.neo_hookean_energy, {})]:
        T = en.tangent_elasticity_tensor(psi, 3, lam, mu, **kw)
        np.testing.assert_allclose(np.asarray(T.D), D_ref, rtol=1e-6,
                                   atol=1e-8 * np.abs(D_ref).max())
    # 2D: the (lam, mu)-parameterized 2D density is the PLANE-STRAIN
    # restriction, i.e. isotropic_lame(2, lam, mu) (et.isotropic(2, ...)
    # is the plane-stress convention, a different tensor)
    D2 = np.asarray(et.isotropic_lame(2, lam, mu))
    T2 = en.tangent_elasticity_tensor(en.stvk_energy, 2, lam, mu)
    np.testing.assert_allclose(np.asarray(T2.D), D2, rtol=1e-6,
                               atol=1e-8 * np.abs(D2).max())


def test_tangent_tensor_away_from_identity():
    """At a stretched state the StVK tangent dS/dE has the closed form
    lam I x I + 2 mu II (constant!) — the adaptor chain must reproduce it."""
    lam, mu = _lame(1.0, 0.3)
    F = jnp.asarray(np.diag([1.2, 0.9, 1.05]))
    T = en.tangent_elasticity_tensor(en.stvk_energy_C, 3, lam, mu,
                                     C=jnp.einsum("ki,kj->ij", F, F),
                                     c_based=True)
    D_ref = np.asarray(et.isotropic_lame(3, lam, mu))
    np.testing.assert_allclose(np.asarray(T.D), D_ref, rtol=1e-8)


def test_projected_tangent_psd():
    """AutoHessianProjection: the projected dP operator is PSD even where
    the true Hessian is indefinite (compressed NeoHookean state)."""
    rng = np.random.default_rng(4)
    lam, mu = _lame(1.0, 0.3)
    F = jnp.asarray(0.3 * np.eye(3)[None] +
                    0.02 * rng.standard_normal((2, 3, 3)))
    dP = en.projected_tangent_apply(en.neo_hookean_energy)
    dP_exact = en.tangent_apply(en.neo_hookean_energy)
    indefinite = False
    for _ in range(6):
        dF = jnp.asarray(rng.standard_normal((2, 3, 3)))
        q_proj = float(jnp.sum(dF * dP(F, dF, lam, mu)))
        q_true = float(jnp.sum(dF * dP_exact(F, dF, lam, mu)))
        assert q_proj >= -1e-10
        indefinite |= q_true < 0
    assert indefinite, "test state was not indefinite — not exercising " \
        "the projection"


def test_projected_tangent_matches_exact_when_psd():
    """Where the Hessian is already PSD the projection is exact."""
    rng = np.random.default_rng(5)
    lam, mu = _lame(1.0, 0.3)
    F = jnp.asarray(np.eye(3) + 0.01 * rng.standard_normal((3, 3)))
    dF = jnp.asarray(rng.standard_normal((3, 3)))
    dP = en.projected_tangent_apply(en.stvk_energy)
    dP_exact = en.tangent_apply(en.stvk_energy)
    np.testing.assert_allclose(np.asarray(dP(F, dF, lam, mu)),
                               np.asarray(dP_exact(F, dF, lam, mu)),
                               rtol=1e-5, atol=1e-8)


# ---------------------------------------------------------------------------
# Newton controller policies
# ---------------------------------------------------------------------------

def test_hessian_projection_adaptive_hysteresis():
    from meshfem_tpu.solvers.newton import HessianProjectionAdaptive

    c = HessianProjectionAdaptive(steps_before_switch=3,
                                  indefinite_before_switch=2)
    assert c.should_use_projection()
    for _ in range(3):
        c.notify_definiteness(False)
    assert not c.should_use_projection()      # switched off after 3 definite
    c.notify_definiteness(True)
    c.notify_definiteness(True)
    assert c.should_use_projection()          # back on after 2 indefinite


def test_hessian_update_periodic_counts():
    from meshfem_tpu.solvers.newton import HessianUpdatePeriodic

    c = HessianUpdatePeriodic(period=2)
    assert c.needs_update()
    c.new_hessian(False)
    assert not c.needs_update()
    c.reused_hessian()
    assert not c.needs_update()
    c.reused_hessian()
    assert c.needs_update()


def test_newton_with_update_policy_converges():
    """Periodic Hessian reuse still converges on a smooth convex-ish
    problem, with fewer fresh Hessian anchors (Rosenbrock-like)."""
    from meshfem_tpu.solvers.newton import (newton_from_energy,
                                            HessianUpdatePeriodic)

    def f(x):
        return jnp.sum((x[:-1] - 1.0) ** 2) \
            + 10.0 * jnp.sum((x[1:] - x[:-1] ** 2) ** 2)

    x0 = jnp.zeros(6, jnp.float64)
    x, rep = newton_from_energy(
        f, x0, gradTol=1e-10, maxiter=100,
        update_controller=HessianUpdatePeriodic(period=2))
    assert rep.converged
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-7)


def test_newton_projected_hessian_hook():
    """A NewtonProblem with hessian_apply_projected uses it when the
    projection controller says so (smoke: projected == clamped exact on a
    1D double-well where the raw Hessian is indefinite at the start)."""
    from meshfem_tpu.solvers.newton import (NewtonProblem, newton_optimize,
                                            HessianProjectionAlways)

    def f(x):
        return jnp.sum((x ** 2 - 1.0) ** 2)

    grad = jax.grad(f)
    used = {"proj": 0}

    def hvp(x, v):
        return jax.jvp(grad, (x,), (v,))[1]

    def hvp_proj(x, v):
        h = 12 * x ** 2 - 4.0           # diagonal Hessian
        return jnp.maximum(h, 0.0) * v + 1e-3 * v

    def hvp_proj_counting(x, v):
        used["proj"] += 1
        return hvp_proj(x, v)

    p = NewtonProblem(energy=f, gradient=grad, hessian_apply=hvp,
                      hessian_apply_projected=hvp_proj_counting)
    x0 = jnp.asarray([0.1, -0.2, 0.3], jnp.float64)
    x, rep = newton_optimize(p, x0, gradTol=1e-10, maxiter=60,
                             projection_controller=
                             HessianProjectionAlways())
    assert used["proj"] > 0
    np.testing.assert_allclose(np.abs(np.asarray(x)), 1.0, atol=1e-6)
