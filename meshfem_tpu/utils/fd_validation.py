"""Finite-difference validation harness (parity with reference
``python/fd_validation.py``: fdGrad/fdHessian checks against analytic /
autodiff derivatives — the standard harness for every derivative in the
framework)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fd_gradient_check(f, x, grad=None, eps: float = 1e-6, n_dirs: int = 5,
                      seed: int = 0, rtol: float = 1e-5):
    """Compare directional derivatives of scalar f against (auto)grad.

    Returns max relative error over random directions."""
    x = jnp.asarray(x)
    g = (jax.grad(f)(x) if grad is None else grad(x))
    rng = np.random.default_rng(seed)
    worst = 0.0
    for _ in range(n_dirs):
        d = jnp.asarray(rng.standard_normal(np.shape(x)))
        d = d / jnp.linalg.norm(d.ravel())
        fp = float(f(x + eps * d))
        fm = float(f(x - eps * d))
        fd = (fp - fm) / (2 * eps)
        an = float(jnp.vdot(g, d))
        denom = max(abs(fd), abs(an), 1e-12)
        worst = max(worst, abs(fd - an) / denom)
    return worst


def fd_hessian_check(f, x, eps: float = 1e-5, n_dirs: int = 3, seed: int = 0):
    """Compare Hessian-vector products (jvp-of-grad) against FD of grads."""
    x = jnp.asarray(x)
    grad = jax.grad(f)
    rng = np.random.default_rng(seed)
    worst = 0.0
    for _ in range(n_dirs):
        d = jnp.asarray(rng.standard_normal(np.shape(x)))
        d = d / jnp.linalg.norm(d.ravel())
        hv = jax.jvp(grad, (x,), (d,))[1]
        fd = (grad(x + eps * d) - grad(x - eps * d)) / (2 * eps)
        denom = max(float(jnp.linalg.norm(fd.ravel())), 1e-12)
        worst = max(worst,
                    float(jnp.linalg.norm((hv - fd).ravel())) / denom)
    return worst
