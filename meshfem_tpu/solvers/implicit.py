"""Implicit differentiation through iterative solves.

Replaces ALL of the reference's hand-derived adjoint/shape-derivative code
(``MaterialOptimization.hh`` adjoint solves, ``LinearElasticity.hh`` delta*
methods, ``PeriodicHomogenization`` tensor gradients): the solution of
A(theta) u = b(theta) is differentiated with ``lax.custom_linear_solve`` —
forward and reverse passes reuse the same preconditioned CG, and gradients
w.r.t. anything captured inside the matvec (material fields, node
positions) flow by the implicit function theorem.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import cg as cg_mod


def solve_implicit(matvec, b, *, M_inv=None, project=None, tol: float = 1e-11,
                   maxiter: int = 20000):
    """Differentiable solve of the SPD system matvec(u) = b.

    ``matvec`` may close over traced parameters; gradients w.r.t. them are
    derived automatically (symmetric system => transpose solve is the same
    CG)."""
    if project is not None:
        b = project(b)

    def solve(mv, rhs):
        res = cg_mod.cg(mv, rhs, M_inv=M_inv, project=project, tol=tol,
                        maxiter=maxiter)
        return res.x

    def pmatvec(u):
        out = matvec(u)
        return project(out) if project is not None else out

    return jax.lax.custom_linear_solve(pmatvec, b, solve, symmetric=True)
