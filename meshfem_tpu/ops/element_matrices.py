"""Exact per-element FEM matrices via reference-domain integral tables.

The reference evaluates element integrands at Gauss points per element
(``Laplacian.hh:25-56``, ``MassMatrix.hh:24-60``, the ``perElementStiffness``
loop nest ``LinearElasticity.hh:165-232``).  On an affine simplex every such
integral factors into (constant reference-domain tensor) x (per-element
geometry), so we precompute the reference tensors **exactly** (closed-form
monomial integrals — no quadrature error, any degree) once per (K, deg), and
per-element work becomes a batched einsum that XLA maps onto the MXU:

* mass:       M_e = vol_e * T_mass[i, j]
* laplacian:  L_e = vol_e * sum_kl (g_k . g_l) T_grad[k, l, i, j]
* elasticity: K_e = vol_e * sum_klab g_k^a g_l^b C_{cafb} T_grad[k, l, i, j]

with g = grad_lambda [E, K+1, dim] from the mesh embedding.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import shape_functions as sf
from ..fem.elasticity_tensor import to_full


def _monomial_integral_factor(exps: np.ndarray, K: int) -> np.ndarray:
    """int over unit-volume K-simplex of prod lambda^alpha, for rows of exps."""
    out = np.empty(len(exps))
    for r, e in enumerate(exps):
        num = math.factorial(K) * np.prod([math.factorial(int(a)) for a in e])
        out[r] = num / math.factorial(int(e.sum()) + K)
    return out


def _poly_product_integrals(expsA, coeffsA, expsB, coeffsB, K):
    """[nA, nB] matrix of exact integrals int p_i q_j over the unit simplex,
    where p_i = sum_m coeffsA[m, i] mono(expsA[m]) etc."""
    MA, MB = len(expsA), len(expsB)
    fac = np.empty((MA, MB))
    for m in range(MA):
        for n in range(MB):
            e = expsA[m] + expsB[n]
            num = math.factorial(K) * np.prod(
                [math.factorial(int(a)) for a in e])
            fac[m, n] = num / math.factorial(int(e.sum()) + K)
    return coeffsA.T @ fac @ coeffsB


@functools.lru_cache(maxsize=None)
def _basis_and_derivs(K: int, deg: int):
    """(exps, coeffs, dexps, dcoeffs[v]) — derivative polynomials w.r.t. each
    barycentric coordinate as coefficient sets over the degree-(deg-1) basis."""
    exps, coeffs = sf._lagrange_tables(K, deg)
    exps = np.asarray(exps)
    nv, n = K + 1, coeffs.shape[1]
    # Derivative monomials live in the homogeneous degree-(deg-1) space.
    from ..fem.shape_functions import _monomial_exponents

    dexps = (_monomial_exponents(K, deg - 1) if deg >= 1
             else np.zeros((1, nv), dtype=np.int64))
    index = {tuple(e): i for i, e in enumerate(dexps)}
    dcoeffs = np.zeros((nv, len(dexps), n))
    for v in range(nv):
        for m, e in enumerate(exps):
            if e[v] == 0:
                continue
            e2 = e.copy()
            e2[v] -= 1
            dcoeffs[v, index[tuple(e2)], :] += e[v] * coeffs[m, :]
    return exps, coeffs, dexps, dcoeffs


@functools.lru_cache(maxsize=None)
def mass_table(K: int, deg: int) -> np.ndarray:
    """[n, n] exact int phi_i phi_j over the unit-volume reference simplex."""
    exps, coeffs, _, _ = _basis_and_derivs(K, deg)
    return _poly_product_integrals(exps, coeffs, exps, coeffs, K)


@functools.lru_cache(maxsize=None)
def gradgrad_table(K: int, deg: int) -> np.ndarray:
    """[K+1, K+1, n, n] exact int (dphi_i/dlam_k)(dphi_j/dlam_l)."""
    _, _, dexps, dcoeffs = _basis_and_derivs(K, deg)
    nv = K + 1
    n = dcoeffs.shape[2]
    T = np.empty((nv, nv, n, n))
    for k in range(nv):
        for l in range(nv):
            T[k, l] = _poly_product_integrals(
                dexps, dcoeffs[k], dexps, dcoeffs[l], K)
    return T


@functools.lru_cache(maxsize=None)
def shape_grad_table(K: int, deg: int) -> np.ndarray:
    """[K+1, n] exact int dphi_i/dlam_k (for divergence/constant-strain loads)."""
    _, _, dexps, dcoeffs = _basis_and_derivs(K, deg)
    fac = _monomial_integral_factor(np.asarray(dexps), K)
    return np.einsum("m,vmn->vn", fac, dcoeffs)


# ---------------------------------------------------------------------------
# Batched element matrices (device).
# ---------------------------------------------------------------------------

def element_mass(volume, K: int, deg: int):
    """[E, n, n] consistent mass matrices (reference ``MassMatrix.hh:49``)."""
    T = jnp.asarray(mass_table(K, deg), dtype=volume.dtype)
    return volume[:, None, None] * T


def element_mass_lumped(volume, K: int, deg: int):
    """[E, n] row-sum lumped mass (reference lumped-mass option)."""
    T = jnp.asarray(mass_table(K, deg), dtype=volume.dtype)
    return volume[:, None] * jnp.sum(T, axis=1)


def element_laplacian(grad_lambda, volume, deg: int):
    """[E, n, n] stiffness int grad phi_i . grad phi_j
    (reference ``Laplacian.hh:28-56``; P1 fast path is the same formula
    since T_grad for deg=1 is the identity pattern)."""
    K = grad_lambda.shape[-2] - 1
    T = jnp.asarray(gradgrad_table(K, deg), dtype=grad_lambda.dtype)
    G = jnp.einsum("ekd,eld->ekl", grad_lambda, grad_lambda)
    return volume[:, None, None] * jnp.einsum("ekl,klij->eij", G, T)


def _fused_elasticity_matrix(K: int, deg: int, D_key, C_full: np.ndarray,
                             dtype) -> jnp.ndarray:
    """Constant fused tensor M[(k,a,l,b), (i,c,j,f)] = T[k,l,i,j] C[c,a,f,b]
    turning element stiffness into ONE MXU matmul: Ke = (gg @ M) * vol."""
    T = gradgrad_table(K, deg)
    M = np.einsum("klij,cafb->kalbicjf", T, C_full)
    nv, d = K + 1, C_full.shape[0]
    n = T.shape[-1]
    return jnp.asarray(M.reshape(nv * d * nv * d, n * d * n * d), dtype=dtype)


_FUSED_CACHE: dict = {}


def _f32_default_precision(arr, precision):
    """f32 stiffness assembly defaults to HIGHEST matmul precision: the
    TPU's default f32 matmul runs bf16 passes, leaving ~1e-3 relative
    error in the ASSEMBLED OPERATOR (measured 1.3e-3 vs the exact Ke at
    bench scale, v5e) — unacceptable for a solver matrix.  The extra MXU
    passes cost little here because the fused assembly is bound by the
    [E, (nd)^2] output write, not FLOPs.  Callers wanting raw-speed
    throwaway assembly can pass an explicit precision."""
    if precision is None and arr.dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return precision


def fused_matrix_for(D, K: int, deg: int, dtype) -> jnp.ndarray:
    """The fused constant tensor used by element_elasticity_fused, exposed
    so callers can pass it as a jit ARGUMENT (embedded big constants can
    defeat persistent-cache serialization on remote toolchains)."""
    from ..fem.flattening import full_to_flat_map

    D_np = np.asarray(D, dtype=np.float64)
    dim = {1: 1, 3: 2, 6: 3}[D_np.shape[-1]]
    f2f = full_to_flat_map(dim)
    C_full = D_np[f2f[:, :, None, None], f2f[None, None, :, :]]
    return jnp.asarray(
        _fused_elasticity_matrix(K, deg, None, C_full, dtype))


def element_elasticity_fused_apply(grad_lambda, volume, M, n: int,
                                   precision=None):
    """Pure fused assembly given the precomputed matrix M [(K+1)d)^2, (nd)^2]
    (see fused_matrix_for); fully jit/cache-friendly."""
    K = grad_lambda.shape[-2] - 1
    dim = grad_lambda.shape[-1]
    E = grad_lambda.shape[0]
    precision = _f32_default_precision(grad_lambda, precision)
    gdim = (K + 1) * dim
    gg = jnp.einsum("eka,elb->ekalb", grad_lambda,
                    grad_lambda, precision=precision).reshape(E, gdim * gdim)
    # vol folded into the SMALL gg operand: scaling the matmul OUTPUT can
    # cost a full extra [E, (nd)^2] read+write pass when XLA fails to fuse
    # the epilogue (925 MB at bench scale).
    Ke = jnp.matmul(gg * volume[:, None], M, precision=precision)
    return Ke.reshape(E, n * dim, n * dim)


def fused_matrix_sym_for(D, K: int, deg: int, dtype):
    """Symmetric-pair folding of :func:`fused_matrix_for`.

    The geometry Gram tensor gg[(k,a),(l,b)] = g_ka g_lb is symmetric in its
    two composite indices, so only gdim(gdim+1)/2 distinct products exist;
    folding the fused matrix over the symmetric pairs HALVES the assembly
    matmul FLOPs (66 -> 33 GFLOP at 257k P2 tets) and the gg buffer.
    Returns (M_sym [npairs, (nd)^2], idx_a [npairs], idx_b [npairs])."""
    M = np.asarray(fused_matrix_for(D, K, deg, jnp.float64))
    gdim = int(round(M.shape[0] ** 0.5))
    ia, ib = np.triu_indices(gdim)
    M2 = M.reshape(gdim, gdim, -1)
    Ms = M2[ia, ib] + np.where((ia != ib)[:, None], M2[ib, ia], 0.0)
    return (jnp.asarray(Ms, dtype), jnp.asarray(ia.astype(np.int32)),
            jnp.asarray(ib.astype(np.int32)))


def element_elasticity_fused_apply_sym(grad_lambda, volume, M_sym, idx_a,
                                       idx_b, n: int, precision=None):
    """Fused assembly through the symmetric-pair matrix (fused_matrix_sym_for):
    one [E, npairs] product + one [E, npairs] x [npairs, (nd)^2] matmul."""
    K = grad_lambda.shape[-2] - 1
    dim = grad_lambda.shape[-1]
    E = grad_lambda.shape[0]
    precision = _f32_default_precision(grad_lambda, precision)
    gflat = grad_lambda.reshape(E, (K + 1) * dim)
    gg = gflat[:, idx_a] * gflat[:, idx_b]            # [E, npairs]
    Ke = jnp.matmul(gg, M_sym, precision=precision) * volume[:, None]
    return Ke.reshape(E, n * dim, n * dim)


def element_elasticity_fused(grad_lambda, volume, D, deg: int,
                             precision=None):
    """MXU-friendly element stiffness for a CONSTANT material: one batched
    outer product + one [E, (K+1)^2 d^2] x [.., (nd)^2] matmul.

    ~4x faster than the einsum path on TPU (28.8M P2 tets/s vs 6.7M on v5e).
    ``precision``: f32 inputs DEFAULT to jax.lax.Precision.HIGHEST (the
    TPU's default f32 matmul runs bf16 passes — ~1e-3 relative error in
    the assembled operator); pass an explicit lower precision only for
    throwaway assembly."""
    K = grad_lambda.shape[-2] - 1
    dim = grad_lambda.shape[-1]
    n = gradgrad_table(K, deg).shape[-1]
    import jax.core as _core

    if isinstance(D, _core.Tracer):
        raise TypeError(
            "element_elasticity_fused needs a concrete material tensor; "
            "construct D outside jit (or use the batched einsum path for "
            "traced per-element materials)")
    D_np = np.asarray(D, dtype=np.float64)
    key = (K, deg, D_np.tobytes(), grad_lambda.dtype.name)
    M = _FUSED_CACHE.get(key)
    if M is None:
        from ..fem.flattening import full_to_flat_map

        f2f = full_to_flat_map(dim)
        C_full = D_np[f2f[:, :, None, None], f2f[None, None, :, :]]
        M = _fused_elasticity_matrix(K, deg, key, C_full, grad_lambda.dtype)
        _FUSED_CACHE[key] = M
    E = grad_lambda.shape[0]
    precision = _f32_default_precision(grad_lambda, precision)
    gdim = (K + 1) * dim
    gg = jnp.einsum("eka,elb->ekalb", grad_lambda, grad_lambda,
                    precision=precision).reshape(E, gdim * gdim)
    Ke = jnp.matmul(gg, M, precision=precision) * volume[:, None]
    return Ke.reshape(E, n * dim, n * dim)


def element_elasticity(grad_lambda, volume, D, deg: int, precision=None):
    """[E, n*dim, n*dim] elasticity stiffness (vector-valued DOFs,
    interleaved component-fastest like the reference:
    dof = node * dim + component).

    D: [fl, fl] or [E, fl, fl] flattened elasticity tensor(s).
    Replaces ``perElementStiffness`` (``LinearElasticity.hh:165-232``)."""
    K = grad_lambda.shape[-2] - 1
    dim = grad_lambda.shape[-1]
    n = gradgrad_table(K, deg).shape[-1]
    import jax.core as _core

    if not isinstance(D, _core.Tracer):
        D = jnp.asarray(D)
    if D.ndim == 2:
        if isinstance(D, _core.Tracer):
            # Differentiable constant material: treat as a batch of one.
            D = jnp.broadcast_to(D, (1,) + D.shape)
            D = jnp.broadcast_to(D, (grad_lambda.shape[0],) + D.shape[1:])
        else:
            return element_elasticity_fused(grad_lambda, volume, D, deg,
                                            precision=precision)
    T = jnp.asarray(gradgrad_table(K, deg), dtype=grad_lambda.dtype)
    precision = _f32_default_precision(grad_lambda, precision)
    C = to_full(D.astype(grad_lambda.dtype))              # [E, d,d,d,d]
    H = jnp.einsum("eka,elb,ecafb->eklcf", grad_lambda, grad_lambda, C,
                   precision=precision)
    Ke = jnp.einsum("klij,eklcf->eicjf", T, H, precision=precision)
    Ke = volume[:, None, None, None, None] * Ke
    return Ke.reshape(-1, n * dim, n * dim)


def element_strain_matrix(grad_lambda, deg: int, quad_points):
    """[E, Q, fl, n, dim] operator mapping nodal displacements u[e, n, dim]
    to flattened strains at the given barycentric quadrature/eval points:
    strain_flat[e, q] = einsum('eqanc,enc->eqa', B, u).

    strain = sym(grad u); raw Voigt components (no engineering doubling)."""
    from ..fem.flattening import flat_rows_cols

    K = grad_lambda.shape[-2] - 1
    dim = grad_lambda.shape[-1]
    dN = sf.grad_shape_np(K, deg, np.asarray(quad_points))  # [Q, n, K+1]
    dN = jnp.asarray(dN, dtype=grad_lambda.dtype)
    # spatial gradient of each shape fn at each point: [E, Q, n, dim]
    gp = jnp.einsum("qnk,ekd->eqnd", dN, grad_lambda)
    r, c = flat_rows_cols(dim)
    E_, Q, n, _ = gp.shape
    B = jnp.zeros((E_, Q, len(r), n, dim), dtype=gp.dtype)
    for a, (i, j) in enumerate(zip(r, c)):
        # strain_ij = 0.5 (du_i/dx_j + du_j/dx_i)
        B = B.at[:, :, a, :, i].add(0.5 * gp[..., j])
        B = B.at[:, :, a, :, j].add(0.5 * gp[..., i])
    return B
