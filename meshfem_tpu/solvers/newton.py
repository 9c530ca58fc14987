"""Newton optimizer with Hessian regularization and line search.

Parity with reference ``newton_optimizer/newton_optimizer.hh:25-82``: a
``NewtonProblem`` exposes energy/gradient/hessian-apply; indefinite Hessians
are regularized by tau * metric until CG sees an SPD operator; backtracking
line search; per-iteration ConvergenceReport."""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from . import cg as cg_mod


@dataclasses.dataclass
class ConvergenceReport:
    energy: list
    grad_norm: list
    step_norm: list
    tau: list
    iterations: int = 0
    converged: bool = False


@dataclasses.dataclass
class NewtonProblem:
    """Matrix-free Newton problem (reference NewtonProblem interface,
    ``newton_optimizer.hh:25-220`` incl. BoundConstraint)."""

    energy: Callable            # x -> scalar
    gradient: Callable          # x -> [n]
    hessian_apply: Callable     # (x, v) -> [n]  (H(x) v)
    metric_apply: Callable = None   # v -> M v (default identity)
    project: Callable = None        # feasible-subspace projector
    lower: object = None            # elementwise lower bounds (optional)
    upper: object = None            # elementwise upper bounds (optional)

    def apply_bound_constraints(self, x):
        """Clamp into the feasible box (``applyBoundConstraints``,
        ``newton_optimizer.hh:178-185`` / the feasibility step)."""
        if self.lower is not None:
            x = jnp.maximum(x, jnp.asarray(self.lower))
        if self.upper is not None:
            x = jnp.minimum(x, jnp.asarray(self.upper))
        return x

    def active_bound_mask(self, x, g, tol: float = 1e-8):
        """Working set: bounds that are touched AND whose gradient pushes
        outward (``activeBoundConstraints``, ``newton_optimizer.hh:187``).
        Returns a bool mask of ACTIVE (frozen) variables."""
        active = jnp.zeros(jnp.shape(x), dtype=bool)
        if self.lower is not None:
            lo = jnp.asarray(self.lower)
            active = active | ((x <= lo + tol) & (g > 0))
        if self.upper is not None:
            hi = jnp.asarray(self.upper)
            active = active | ((x >= hi - tol) & (g < 0))
        return active


def newton_optimize(problem: NewtonProblem, x0, *, gradTol: float = 1e-8,
                    maxiter: int = 50, cg_tol: float = 1e-8,
                    cg_maxiter: int = 2000, tau0: float = 0.0,
                    verbose: bool = False):
    """Minimize the problem energy (optionally box-constrained: an
    active-set projected Newton — the working-set analog of the reference's
    BoundConstraint machinery).  Returns (x, ConvergenceReport)."""
    x = jnp.asarray(x0)
    has_bounds = problem.lower is not None or problem.upper is not None
    if has_bounds:
        x = problem.apply_bound_constraints(x)   # feasibility step
    base_project = problem.project or (lambda v: v)
    metric = problem.metric_apply or (lambda v: v)
    report = ConvergenceReport([], [], [], [])
    tau = tau0
    for it in range(maxiter):
        g_raw = base_project(problem.gradient(x))
        if has_bounds:
            active = problem.active_bound_mask(x, g_raw)
            free = (~active).astype(x.dtype)
            project = lambda v: base_project(v) * free
        else:
            project = base_project
        g = project(g_raw)
        gn = float(jnp.linalg.norm(g))
        report.grad_norm.append(gn)
        report.energy.append(float(problem.energy(x)))
        if gn < gradTol:
            report.converged = True
            break
        # Solve (H + tau M) dx = -g, increasing tau when CG sees
        # non-positive curvature (reference tau-regularization policy).
        for _ in range(12):
            H = lambda v: project(problem.hessian_apply(x, v)
                                  + tau * metric(v))
            res = cg_mod.cg(H, -g, project=project, tol=cg_tol,
                            maxiter=cg_maxiter)
            dx = res.x
            # Positive-curvature check on the step.
            curv = float(jnp.vdot(dx, H(dx)))
            descent = float(jnp.vdot(dx, g))
            if curv > 0 and descent < 0:
                break
            tau = max(4.0 * tau, 1e-6)
        # Backtracking line search (Armijo), projected onto the bounds.
        e0 = report.energy[-1]
        alpha = 1.0
        for _ in range(40):
            x_try = x + alpha * dx
            if has_bounds:
                x_try = problem.apply_bound_constraints(x_try)
            e1 = float(problem.energy(x_try))
            if e1 <= e0 + 1e-4 * alpha * descent:
                break
            alpha *= 0.5
        step = x_try - x
        x = x_try
        report.step_norm.append(float(jnp.linalg.norm(step)))
        report.tau.append(tau)
        tau = tau / 2.0 if tau > 1e-10 else 0.0
        if verbose:
            print(f"newton it {it}: E={e1:.6e} |g|={gn:.3e} "
                  f"alpha={alpha:.2e} tau={tau:.1e}")
        report.iterations = it + 1
    return x, report


def newton_from_energy(energy_fn, x0, **kw):
    """Build the problem from a scalar energy via jax autodiff (gradient =
    jax.grad, hessian-apply = forward-over-reverse hvp) and minimize it."""
    grad_fn = jax.grad(energy_fn)

    def hvp(x, v):
        return jax.jvp(grad_fn, (x,), (v,))[1]

    problem = NewtonProblem(energy=energy_fn, gradient=grad_fn,
                            hessian_apply=hvp,
                            project=kw.pop("project", None),
                            lower=kw.pop("lower", None),
                            upper=kw.pop("upper", None))
    return newton_optimize(problem, x0, **kw)


def dense_newton(energy_fn, x0, *, max_iter: int = 100,
                 grad_tol: float = 1e-14, verbose: bool = False):
    """Dense Newton for small problems with eigendecomposition-based
    Hessian regularization (reference ``newton_optimizer/dense_newton.hh``):
    negative eigenvalues are FLIPPED (not clamped), near-zero ones
    pseudo-inverted away, followed by Armijo backtracking (c1 = 1e-4,
    15 halvings) with the reference's accuracy-floor acceptance.

    energy_fn: scalar jax-differentiable energy of a flat [n] vector.
    Returns (x, ConvergenceReport)."""
    x = jnp.asarray(x0, jnp.float64).reshape(-1)
    grad = jax.grad(energy_fn)
    hess = jax.hessian(energy_fn)
    report = ConvergenceReport([], [], [], [])
    indefinite = False
    for it in range(max_iter + 1):
        g = jnp.asarray(grad(x))
        lam, Q = jnp.linalg.eigh(jnp.asarray(hess(x)))
        indefinite = bool((lam < 0).any())
        lam = jnp.abs(lam)                         # flip negatives
        lam_inv = jnp.where(lam > 1e-10, 1.0 / jnp.where(lam > 1e-10,
                                                         lam, 1.0), lam)
        gnorm = float(jnp.linalg.norm(g))
        e0 = float(energy_fn(x))
        report.energy.append(e0)
        report.grad_norm.append(gnorm)
        report.iterations = it
        if verbose:
            print(f"{it}\t{e0:.17g}\t{gnorm:.3e}\t{int(indefinite)}")
        if not indefinite and gnorm < grad_tol:
            report.converged = True
            break
        step = Q @ (lam_inv * (Q.T @ (-g)))
        dd = float(jnp.dot(g, step))
        alpha, accepted = 1.0, False
        for _ in range(15):
            e1 = float(energy_fn(x + alpha * step))
            sufficient = -1e-4 * alpha * dd
            decrease = e0 - e1
            if (decrease >= sufficient
                    or (abs(sufficient) < 1e-10 * abs(e0)
                        and decrease > -1e-16 * abs(e0))):
                accepted = True
                break
            alpha *= 0.5
        if not accepted:
            break                                  # backtracking failed
        x = x + alpha * step
        report.step_norm.append(float(alpha * jnp.linalg.norm(step)))
        report.tau.append(0.0)
    return x, report
