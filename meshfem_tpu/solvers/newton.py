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


# ---------------------------------------------------------------------------
# Controller policies (reference ``newton_optimizer/HessianProjectionController.hh``
# and ``HessianUpdateController.hh``): small host-side state machines that
# decide per iteration whether to use the PSD-projected Hessian and whether
# to refresh the (expensive) Hessian anchor point.
# ---------------------------------------------------------------------------

class HessianProjectionController:
    """Base policy: should this iteration use the projected Hessian?"""

    def should_use_projection(self) -> bool:
        raise NotImplementedError

    def notify_definiteness(self, is_indefinite: bool):
        pass

    def reset(self):
        pass


class HessianProjectionAlways(HessianProjectionController):
    def should_use_projection(self):
        return True


class HessianProjectionNever(HessianProjectionController):
    def should_use_projection(self):
        return False


class HessianProjectionAdaptive(HessianProjectionController):
    """Hysteresis policy (``HessianProjectionAdaptive``): start projected;
    after ``steps_before_switch`` consecutive definite iterations drop the
    projection, and switch back after ``indefinite_before_switch``
    consecutive indefinite ones."""

    def __init__(self, steps_before_switch: int = 15,
                 indefinite_before_switch: int = 5):
        self.steps_before_switch = steps_before_switch
        self.indefinite_before_switch = indefinite_before_switch
        self.reset()

    def reset(self):
        self.projection_active = True
        self._counter = self.steps_before_switch

    def should_use_projection(self):
        return self.projection_active

    def notify_definiteness(self, is_indefinite: bool):
        if self.projection_active:
            if not is_indefinite:
                self._counter -= 1
                if self._counter == 0:
                    self.projection_active = False
                    self._counter = self.indefinite_before_switch
            else:
                self._counter = self.steps_before_switch
        else:
            if is_indefinite:
                self._counter -= 1
                if self._counter == 0:
                    self.projection_active = True
                    self._counter = self.steps_before_switch
            else:
                self._counter = self.indefinite_before_switch


class HessianUpdateController:
    """Base policy: refresh the Hessian anchor this iteration?
    (``HessianUpdateController.hh`` — reuse of an expensive Hessian
    between Newton iterations; with a matrix-free HVP the 'factorization'
    being reused is the ANCHOR POINT x_H at which H(x_H) v is applied)."""

    def needs_update(self) -> bool:
        raise NotImplementedError

    def new_hessian(self, is_indefinite: bool):
        pass

    def reused_hessian(self):
        pass

    def reset(self):
        pass


class HessianUpdateAlways(HessianUpdateController):
    def needs_update(self):
        return True


class HessianUpdateNever(HessianUpdateController):
    def needs_update(self):
        return False


class HessianUpdatePeriodic(HessianUpdateController):
    """Refresh every ``period`` iterations (``HessianUpdatePeriodic``)."""

    def __init__(self, period: int = 2):
        self.period = period
        self._counter = 0

    def reset(self):
        self._counter = 0

    def needs_update(self):
        return self._counter == 0

    def new_hessian(self, is_indefinite: bool):
        self._counter = self.period

    def reused_hessian(self):
        if self._counter > 0:
            self._counter -= 1


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
    hessian_apply_projected: Callable = None  # PSD-projected (x, v) -> [n]

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
                    projection_controller: HessianProjectionController
                    | None = None,
                    update_controller: HessianUpdateController | None = None,
                    verbose: bool = False):
    """Minimize the problem energy (optionally box-constrained: an
    active-set projected Newton — the working-set analog of the reference's
    BoundConstraint machinery).  Returns (x, ConvergenceReport).

    ``projection_controller`` / ``update_controller``: per-iteration
    policies (reference ``HessianProjectionController.hh`` /
    ``HessianUpdateController.hh``).  The projection policy picks between
    ``problem.hessian_apply_projected`` (when provided) and the exact
    Hessian; the update policy decides whether to refresh the Hessian
    ANCHOR point (reusing H(x_old) across iterations — the matrix-free
    analog of reusing an expensive factorization)."""
    x = jnp.asarray(x0)
    has_bounds = problem.lower is not None or problem.upper is not None
    if has_bounds:
        x = problem.apply_bound_constraints(x)   # feasibility step
    base_project = problem.project or (lambda v: v)
    metric = problem.metric_apply or (lambda v: v)
    # reference default: use the projection whenever the problem provides
    # one (HessianProjectionAlways; harmless no-op otherwise)
    proj_ctrl = projection_controller or HessianProjectionAlways()
    upd_ctrl = update_controller or HessianUpdateAlways()
    report = ConvergenceReport([], [], [], [])
    tau = tau0
    x_H = None                     # Hessian anchor (update policy)
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
        if x_H is None or upd_ctrl.needs_update():
            x_H, fresh_H = x, True
        else:
            fresh_H = False
        use_proj = (problem.hessian_apply_projected is not None
                    and proj_ctrl.should_use_projection())
        happly = (problem.hessian_apply_projected if use_proj
                  else problem.hessian_apply)
        # Solve (H + tau M) dx = -g, increasing tau when CG sees
        # non-positive curvature (reference tau-regularization policy).
        indefinite = False
        for attempt in range(12):
            H = lambda v: project(happly(x_H, v) + tau * metric(v))
            res = cg_mod.cg(H, -g, project=project, tol=cg_tol,
                            maxiter=cg_maxiter)
            dx = res.x
            # Positive-curvature check on the step.
            curv = float(jnp.vdot(dx, H(dx)))
            descent = float(jnp.vdot(dx, g))
            if curv > 0 and descent < 0:
                break
            indefinite = True
            tau = max(4.0 * tau, 1e-6)
        proj_ctrl.notify_definiteness(indefinite)
        if fresh_H:
            upd_ctrl.new_hessian(indefinite)
        else:
            upd_ctrl.reused_hessian()
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
