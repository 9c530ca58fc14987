"""Mixed-precision iterative refinement.

The reference solves everything in f64 through CHOLMOD (``Types.hh:8``,
``SparseMatrices.hh:1984-2296``).  On TPU the fast SpMV path is f32
(`sparse.routed_ebe`), which caps a plain CG solve near 1e-6 relative
residual.  Classical iterative refinement recovers f64 accuracy at f32
speed: the RESIDUAL is evaluated in f64 (one high-precision operator
apply per correction), the CORRECTION is solved in f32 to a loose inner
tolerance, and the accumulated solution lives in f64.  Each round
multiplies the residual by ~(inner tol + O(eps32 * kappa)); a handful of
rounds reach 1e-10..1e-12 unless kappa approaches 1/eps32.

This is the device-side answer to the 1e-8 field-accuracy target
(BASELINE.json) that round 2 could only demonstrate with all-f64 CPU
solves.
"""

from __future__ import annotations

import warnings
from typing import Callable, NamedTuple

import jax.numpy as jnp


class RefineResult(NamedTuple):
    x: jnp.ndarray           # f64 solution
    rounds: int              # refinement rounds taken
    resnorm: float           # final f64 residual norm (relative)
    inner_iters: int         # total low-precision CG iterations


def refine(apply_hi: Callable, solve_lo: Callable, b, *,
           tol: float = 1e-10, max_rounds: int = 12,
           x0=None) -> RefineResult:
    """Solve ``A x = b`` to f64 relative residual ``tol``.

    apply_hi(x_f64) -> A @ x in f64 (the slow, accurate operator — e.g.
    the gather-pyramid EBE in f64, ~1 apply per round).
    solve_lo(r_f32) -> approximate A^{-1} r as ``(dx, iters)`` in f32
    (the fast routed-CG inner solve; inner tolerance ~1e-5 is plenty).
    b: f64 right-hand side (already projected / constrained as needed).
    """
    b = jnp.asarray(b, jnp.float64)
    bn = float(jnp.linalg.norm(b))
    if bn == 0.0:
        return RefineResult(jnp.zeros_like(b), 0, 0.0, 0)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, jnp.float64)
    total_inner = 0
    rel = float("inf")
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        r = b - apply_hi(x)
        rel_new = float(jnp.linalg.norm(r)) / bn
        if rel_new <= tol:
            return RefineResult(x, rounds - 1, rel_new, total_inner)
        if rel_new >= rel * 0.9:
            # stagnation: kappa * eps32 floor reached — stop honestly
            break
        rel = rel_new
        dx, iters = solve_lo(jnp.asarray(r, jnp.float32))
        total_inner += int(iters)
        x = x + jnp.asarray(dx, jnp.float64)
    r = b - apply_hi(x)
    rel = float(jnp.linalg.norm(r)) / bn
    if rel > tol:
        # Stagnation is an accuracy FLOOR (kappa * eps32), not progress
        # that ran out of budget: more rounds cannot help, but the caller
        # asked for better than we delivered — say so loudly rather than
        # returning silently (the reference's CHOLMOD either solves or
        # raises; this is the honest iterative analog).
        warnings.warn(
            f"iterative refinement stagnated at relative residual "
            f"{rel:.3e} (requested tol {tol:.1e}, {rounds} rounds, "
            f"{total_inner} inner iterations) — the f32 inner solve hit "
            f"its kappa*eps32 floor; check RefineResult.resnorm / "
            f"CGResult.resnorm before trusting the solution",
            RuntimeWarning, stacklevel=2)
    return RefineResult(x, rounds, rel, total_inner)
