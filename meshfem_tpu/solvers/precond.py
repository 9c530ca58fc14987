"""Preconditioners for the iterative solvers — the TPU-native replacement
for the robustness CHOLMOD's direct factorization gave the reference
(``SparseMatrices.hh:1984-2296``):

* **point Jacobi** — the baseline (``cg.cg_operator`` builds it inline);
* **block Jacobi** — exact d x d node-block inverses.  Couples the vector
  components at each node, which point Jacobi ignores; a near-free upgrade
  (one [Nd, d, d] einsum per application) that matters for stiff
  anisotropic/contrasting materials;
* **Chebyshev** — a fixed k-step polynomial in the block-Jacobi-
  preconditioned operator.  Linear and iteration-independent, hence a
  valid (non-flexible) CG preconditioner; each application costs k
  operator applies but cuts CG iterations by ~sqrt of the condition
  improvement, which wins when the operator apply is cheap (structured
  conv path) or the problem is ill-conditioned (high-contrast
  homogenization, BASELINE config 4).

All pieces are pure jnp on pytree operators, so they jit and shard.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Block Jacobi
# ---------------------------------------------------------------------------

def node_block_diagonal(Ke, elem_dofs, num_dofs: int, d: int):
    """Per-node d x d diagonal blocks of the assembled operator.

    Ke [E, n*d, n*d] element matrices (node-major dof order), elem_dofs
    [E, n] -> [Nd, d, d] via deterministic segment_sum (setup-time only)."""
    Ke = jnp.asarray(Ke)
    elem_dofs = jnp.asarray(elem_dofs)
    E, nd, _ = Ke.shape
    n = elem_dofs.shape[1]
    blocks = Ke.reshape(E, n, d, n, d)
    diag_blocks = blocks[:, jnp.arange(n), :, jnp.arange(n), :]  # [n,E,d,d]
    diag_blocks = jnp.moveaxis(diag_blocks, 0, 1)                # [E,n,d,d]
    return jax.ops.segment_sum(
        diag_blocks.reshape(E * n, d * d),
        elem_dofs.reshape(-1), num_segments=num_dofs).reshape(num_dofs, d, d)


def block_jacobi_inv(blocks, free_mask=None):
    """Inverted node blocks [Nd, d, d] ready for apply.

    free_mask [Nd, d] (1 = free): fixed components are decoupled (their
    block rows/cols zeroed, diagonal set to 1) so the preconditioner is
    exact on the constrained subspace."""
    from ..utils.linalg import inv

    blocks = jnp.asarray(blocks)
    Nd, d, _ = blocks.shape
    if free_mask is not None:
        f = jnp.asarray(free_mask, blocks.dtype).reshape(Nd, d)
        blocks = blocks * f[:, :, None] * f[:, None, :]
        blocks = blocks + jnp.eye(d, dtype=blocks.dtype)[None] \
            * (1.0 - f)[:, :, None] * jnp.eye(d, dtype=blocks.dtype)[None]
    # Guard empty rows (isolated dofs): fall back to identity.
    diag_ok = jnp.abs(jnp.diagonal(blocks, axis1=1, axis2=2)) > 0
    blocks = jnp.where(
        diag_ok.all(axis=1)[:, None, None], blocks,
        jnp.eye(d, dtype=blocks.dtype)[None])
    return inv(blocks)


def block_jacobi_apply(blocks_inv):
    """M_inv callable for CG: r [Nd, d] (or [Nd, d, m]) -> blocks_inv @ r."""
    def M_inv(r):
        if r.ndim == 2:
            return jnp.einsum("nab,nb->na", blocks_inv.astype(r.dtype), r)
        return jnp.einsum("nab,nbm->nam", blocks_inv.astype(r.dtype), r)
    return M_inv


# ---------------------------------------------------------------------------
# Spectral bound estimate
# ---------------------------------------------------------------------------

def estimate_lambda_max(apply_A, M_inv, shape, dtype=jnp.float64,
                        iters: int = 40, seed: int = 0, safety: float = 1.05):
    """Largest eigenvalue of M_inv A by power iteration (host-driven setup;
    deterministic).  Returns a python float, inflated by ``safety``."""
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal(shape), dtype)

    @jax.jit
    def step(v):
        w = M_inv(apply_A(v))
        nrm = jnp.sqrt(jnp.vdot(w, w).real)
        return w / nrm, nrm

    lam = 1.0
    for _ in range(iters):
        v, lam = step(v)
    return float(lam) * safety


# ---------------------------------------------------------------------------
# Chebyshev polynomial preconditioner
# ---------------------------------------------------------------------------

def chebyshev_preconditioner(apply_A, M_inv, lam_max, lam_min=None,
                             degree: int = 4, project=None):
    """k-step Chebyshev approximation of (M_inv A)^-1 M_inv on the interval
    [lam_min, lam_max] — a FIXED linear operator, valid inside plain CG.

    apply_A / M_inv / project: pytree->pytree maps; lam_max from
    :func:`estimate_lambda_max`; lam_min defaults to lam_max / 30 (the
    standard smoothing split)."""
    if lam_min is None:
        lam_min = lam_max / 30.0
    if project is None:
        project = lambda v: v
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma = theta / delta

    def M_cheb(b):
        z = project(M_inv(b))
        d = z / theta
        x = d
        r = b
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            r = r - project(apply_A(d))
            z = project(M_inv(r))
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * z
            x = x + d
            rho = rho_new
        return x

    return M_cheb
