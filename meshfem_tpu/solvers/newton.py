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
    """Matrix-free Newton problem (reference NewtonProblem interface)."""

    energy: Callable            # x -> scalar
    gradient: Callable          # x -> [n]
    hessian_apply: Callable     # (x, v) -> [n]  (H(x) v)
    metric_apply: Callable = None   # v -> M v (default identity)
    project: Callable = None        # feasible-subspace projector


def newton_optimize(problem: NewtonProblem, x0, *, gradTol: float = 1e-8,
                    maxiter: int = 50, cg_tol: float = 1e-8,
                    cg_maxiter: int = 2000, tau0: float = 0.0,
                    verbose: bool = False):
    """Minimize the problem energy.  Returns (x, ConvergenceReport)."""
    x = jnp.asarray(x0)
    project = problem.project or (lambda v: v)
    metric = problem.metric_apply or (lambda v: v)
    report = ConvergenceReport([], [], [], [])
    tau = tau0
    for it in range(maxiter):
        g = project(problem.gradient(x))
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
        # Backtracking line search (Armijo).
        e0 = report.energy[-1]
        alpha = 1.0
        for _ in range(40):
            e1 = float(problem.energy(x + alpha * dx))
            if e1 <= e0 + 1e-4 * alpha * descent:
                break
            alpha *= 0.5
        x = x + alpha * dx
        report.step_norm.append(float(alpha * jnp.linalg.norm(dx)))
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
                            project=kw.pop("project", None))
    return newton_optimize(problem, x0, **kw)
