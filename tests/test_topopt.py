"""SIMP topology optimization (analysis/topopt.py): exact adjoint
gradients FD-checked through the full MG state solve, OC volume control,
and the differentiable-displacement wrapper."""

import numpy as np
import jax
import jax.numpy as jnp

from meshfem_tpu.analysis.topopt import (ComplianceTopOpt,
                                         differentiable_displacement)


def _tiny(**kw):
    kw.setdefault("dtype", jnp.float64)
    kw.setdefault("solve_tol", 1e-11)
    kw.setdefault("rmin", 1.5)
    return ComplianceTopOpt(4, 2, 2, volfrac=0.5, **kw)


def test_compliance_gradient_matches_fd(rng):
    """Adjoint dc/drho == central finite differences through the whole
    pipeline (filter -> SIMP -> MG solve -> compliance)."""
    top = _tiny()
    rho = jnp.asarray(0.5 + 0.1 * rng.standard_normal((4, 2, 2)))
    rho = jnp.clip(rho, 0.2, 0.9)
    c0, dc, _ = top.compliance_and_grad(rho)
    h = 1e-5
    idxs = [(0, 0, 0), (2, 1, 0), (3, 0, 1), (1, 1, 1)]
    for ix in idxs:
        e = jnp.zeros_like(rho).at[ix].set(1.0)
        cp, _, _ = top.compliance_and_grad(rho + h * e)
        cm, _, _ = top.compliance_and_grad(rho - h * e)
        fd = (cp - cm) / (2 * h)
        ad = float(dc[ix])
        assert abs(fd - ad) <= 2e-4 * max(abs(fd), abs(ad), 1e-12), \
            (ix, fd, ad)


def test_oc_update_respects_volume_and_bounds(rng):
    top = _tiny()
    rho = jnp.full((4, 2, 2), 0.5)
    _, dc, _ = top.compliance_and_grad(rho)
    new = top.oc_update(rho, dc)
    assert float(new.min()) >= 0.0 and float(new.max()) <= 1.0
    assert abs(float(jnp.mean(top.filtered(new))) - top.volfrac) < 0.02
    assert float(jnp.abs(new - rho).max()) <= 0.2 + 1e-12


def test_run_decreases_compliance():
    """Three OC iterations strictly improve a perturbed start (the classic
    monotone OC behavior on a cantilever)."""
    top = _tiny()
    rho, hist = top.run(iters=3)
    cs = [h["compliance"] for h in hist]
    assert cs[-1] < cs[0]
    assert all(np.isfinite(cs))
    assert all(h["inner_iters"] < 200 for h in hist)


def test_differentiable_displacement_vjp(rng):
    """jax.grad through the custom_vjp wrapper == the self-adjoint
    compliance gradient (the two independent code paths must agree)."""
    top = _tiny()
    u_of_rho = differentiable_displacement(top)
    rho = jnp.asarray(0.5 + 0.05 * rng.standard_normal((4, 2, 2)))
    rho = jnp.clip(rho, 0.3, 0.8)

    def J(r):
        return jnp.vdot(jnp.asarray(top.load, jnp.float64),
                        jnp.asarray(u_of_rho(r), jnp.float64))

    g = jax.grad(J)(rho)
    _, dc, _ = top.compliance_and_grad(rho)
    np.testing.assert_allclose(np.asarray(g), np.asarray(dc), rtol=5e-5,
                               atol=1e-10 * float(jnp.abs(dc).max()))
