"""Fused factored isotropic element contraction (Pallas/Mosaic).

The routed SpMV's remaining HBM wall is the dense per-element stiffness:
at P2/3D every apply streams (nd)^2 = 900 f32 per element (~925 MB at the
1.17M-DOF bench), a >1 ms read floor.  For a CONSTANT ISOTROPIC material
on affine simplices the stiffness factors exactly (replaces forming
``LinearElasticity.hh``'s per-element matrices):

    Ke[(a c)(b f)] = vol * T[k l a b] g[k c'] g[l f'] C[c' c f' f],
    C = lam d d + mu (d d + d d)        (isotropic elasticity tensor)

so the apply needs only ``grad_lambda`` + ``volume`` per element —
(K+1) dim + 1 = 13 floats instead of 900 (69x less traffic) — at the
price of contracting against the constant gradgrad table T every apply.
XLA lowers those contractions to badly-padded batched matmuls (measured
27 ms vs the 3.7 ms dense apply, v5e 1.17M DOF); this kernel fuses them
lane-major so the element dimension rides the 128 lanes:

  * per 128-element block, ``u`` [(dim) n, 128] and ``g`` [K1 dim, 128]
    are VPU tiles; ``d1[k,j] = g[k,c] u[c,j]`` is K1*dim row-broadcast
    FMAs;
  * the two T-contractions ``m1[k,i] = T[klij] d1[l,j]`` and
    ``m2[l,i] = T[klij] d1[k,j]`` become ONE MXU matmul each against
    constant [K1*npad, K1*npad] tables (npad = n rounded to the f32
    sublane tile, so every slice below is vreg-aligned);
  * ``f1[c,i] = mu G2[km] T[kmij] u[c,j]`` is reassociated as
    ``q = TQ @ u_c`` (MXU, TQ [(K1^2) npad, npad]) followed by 16
    row-broadcast FMAs with the on-the-fly rows ``G2[km] = g_k . g_m``
    — the [K1,K1] Gram never hits memory;
  * ``f2/f3`` are K1 row-broadcast FMAs each from m1/m2.

Everything is f32 (MXU matmuls carry HIGHEST precision: the default
bf16 passes leave ~1e-3 asymmetry in the operator, enough to stall CG).
Per-apply element traffic drops to g+vol+u+f ~ 75 MB; the contraction is
compute-bound on the VPU at roughly one output vector per ~3 cycles.

Used by :class:`meshfem_tpu.sparse.routed_ebe.RoutedEBE` when built with
``factor=...`` on TPU (interpret mode mirrors it elsewhere).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:  # pallas import kept non-fatal for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_Z = np.int32(0)
_HP = jax.lax.Precision.HIGHEST


def _npad(n: int) -> int:
    """n rounded up to the f32 sublane tile (8)."""
    return -(-n // 8) * 8


@functools.lru_cache(maxsize=None)
def factored_tables(K: int, deg: int):
    """Padded constant tables (numpy f32) for the fused kernel.

    Returns ``(TM1, TM2, TQ)`` with npad-aligned 16/8-blocks:
      TM1[k*npad + i, l*npad + j] = T[k, l, i, j]   (m1 = TM1 @ d1)
      TM2[l*npad + i, k*npad + j] = T[k, l, i, j]   (m2 = TM2 @ d1)
      TQ[(k*K1 + m)*npad + i, j]  = T[k, m, i, j]   (q_c = TQ @ u_c)
    """
    from ..ops.element_matrices import gradgrad_table

    T = np.asarray(gradgrad_table(K, deg), np.float64)
    K1, _, n, _ = T.shape
    npd = _npad(n)
    TM1 = np.zeros((K1 * npd, K1 * npd), np.float32)
    TM2 = np.zeros((K1 * npd, K1 * npd), np.float32)
    TQ = np.zeros((K1 * K1 * npd, npd), np.float32)
    for k in range(K1):
        for l in range(K1):
            blk = T[k, l].astype(np.float32)
            TM1[k * npd:k * npd + n, l * npd:l * npd + n] = blk
            TM2[l * npd:l * npd + n, k * npd:k * npd + n] = blk
            TQ[(k * K1 + l) * npd:(k * K1 + l) * npd + n, :n] = blk
    return TM1, TM2, TQ


def _factored_kernel(g_ref, vol_ref, u_ref, tm1_ref, tm2_ref, tq_ref,
                     o_ref, upad_ref, d1_ref, *,
                     B, n, K1, dim, lam, mu, Eb):
    npd = _npad(n)
    step = pl.program_id(0)
    TM1 = tm1_ref[:]
    TM2 = tm2_ref[:]
    TQ = tq_ref[:]

    def body(b, carry):
        @pl.when(step * B + b < Eb)
        def _():
            gg = g_ref[b]                       # [K1*dim, 128]
            v = vol_ref[b]                      # [128]
            upad_ref[:] = jnp.zeros((dim * npd, 128), jnp.float32)
            for c in range(dim):
                upad_ref[pl.ds(c * npd, n)] = u_ref[c, b]
            u = upad_ref[:]
            for k in range(K1):
                acc = gg[k * dim][None, :] * u[0:npd]
                for c in range(1, dim):
                    acc += gg[k * dim + c][None, :] \
                        * u[c * npd:(c + 1) * npd]
                d1_ref[pl.ds(k * npd, npd)] = acc
            d1 = d1_ref[:]
            m1 = jnp.dot(TM1, d1, precision=_HP,
                         preferred_element_type=jnp.float32)
            m2 = jnp.dot(TM2, d1, precision=_HP,
                         preferred_element_type=jnp.float32)
            # Gram rows g_k . g_m, kept in registers (shared across c)
            g2 = []
            for k in range(K1):
                for m in range(K1):
                    if m < k:
                        g2.append(g2[m * K1 + k])
                        continue
                    r = gg[k * dim] * gg[m * dim]
                    for c in range(1, dim):
                        r += gg[k * dim + c] * gg[m * dim + c]
                    g2.append(r)
            for c in range(dim):
                uc = u[c * npd:(c + 1) * npd]
                q = jnp.dot(TQ, uc, precision=_HP,
                            preferred_element_type=jnp.float32)
                f = g2[0][None, :] * q[0:npd]
                for km in range(1, K1 * K1):
                    f += g2[km][None, :] * q[km * npd:(km + 1) * npd]
                f = f * mu
                for k in range(K1):
                    gr = gg[k * dim + c][None, :]
                    f += (lam * gr) * m1[k * npd:(k + 1) * npd]
                    f += (mu * gr) * m2[k * npd:(k + 1) * npd]
                o_ref[c, b] = (v[None, :] * f)[:n]
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), body, jnp.int32(0))


@functools.lru_cache(maxsize=16)
def _factored_call(Eb, n, K1, dim, lam, mu, B, interpret):
    # lam/mu are baked into the kernel (compile-time constants feeding
    # scalar FMAs); the cache is BOUNDED so a material sweep recompiles
    # rather than accumulating one pallas_call per visited value.
    npd = _npad(n)
    steps = -(-Eb // B)
    kern = functools.partial(_factored_kernel, B=B, n=n, K1=K1, dim=dim,
                             lam=lam, mu=mu, Eb=Eb)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((B, K1 * dim, 128),
                             lambda i: (i, _Z, _Z)),
                pl.BlockSpec((B, 128), lambda i: (i, _Z)),
                pl.BlockSpec((dim, B, n, 128),
                             lambda i: (_Z, i, _Z, _Z)),
                pl.BlockSpec((K1 * npd, K1 * npd), lambda i: (_Z, _Z)),
                pl.BlockSpec((K1 * npd, K1 * npd), lambda i: (_Z, _Z)),
                pl.BlockSpec((K1 * K1 * npd, npd), lambda i: (_Z, _Z)),
            ],
            out_specs=pl.BlockSpec((dim, B, n, 128),
                                   lambda i: (_Z, i, _Z, _Z)),
            scratch_shapes=[
                pltpu.VMEM((dim * npd, 128), jnp.float32),
                pltpu.VMEM((K1 * npd, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((dim, Eb, n, 128), jnp.float32),
        interpret=bool(interpret),
    )


# ---------------------------------------------------------------------------
# Quadrature-point stress kernel (the production factored path)
# ---------------------------------------------------------------------------
#
# The TQ kernel above pushes the constant gradgrad contractions onto the
# MXU, but its matmul shapes ([256, 16] @ [16, 128]) fill 1/8 of the
# systolic array and measured 2.2 ms at the 1.17M-DOF bench (vs its
# ~0.5 ms compute bound).  The kernel below abandons the table form for
# the classic matrix-free FEM apply — strain -> stress -> force at the
# quadrature points (one affine-element pass is exact:
# sum_q w_q dN[q,i,k] dN[q,j,l] == gradgrad_table[k,l,i,j], asserted at
# build) — with a SUPERBLOCK layout that makes every op a full vreg:
#
#   * elements are laid out 1024 per superblock, (sublane, lane) =
#     (within-block row, element % 128); gathered values arrive
#     [d, n, 8, 128] per superblock, so u[c, i] IS one [8, 128] vreg;
#   * per qp: gphi[i, cb] = dN[q, i, k] g[k, cb] (sparse in k: 1 nonzero
#     for vertex nodes, 2 for edge nodes at P2), the displacement
#     gradient G[c, cb] = sum_i u[c, i] gphi[i, cb], isotropic stress
#     sigma = mu (G + G^T) + lam tr(G) I scaled by w_q * vol, and
#     f[c, i] += gphi[i, cb] sigma[c, cb] — ALL as [8, 128] vreg
#     multiply-adds, ~1000 per superblock per qp set;
#   * no MXU, no sublane-waste [1, 128] rows, no padded tables.
#
# Arithmetic is ~1.6 KFLOP/element (LESS than applying the dense Ke's
# 900 multiply-adds) at 13 f32/element of traffic.  This is the role of
# the reference's per-quadrature-point stress loop
# (``LinearElasticity.hh:165-232``) rebuilt lane-major.


@functools.lru_cache(maxsize=None)
def qp_tables(K: int, deg: int):
    """(dN [Q, n, K+1], w [Q]) — shape-function barycentric gradients at
    the degree-2(deg-1) quadrature points.  Exactness is asserted against
    the integrated gradgrad table."""
    from ..fem.quadrature import rule_np
    from ..fem.shape_functions import grad_shape_np
    from ..ops.element_matrices import gradgrad_table

    P, W = rule_np(K, max(2 * (deg - 1), 1))
    dN = grad_shape_np(K, deg, P)              # [Q, n, K1]
    T = np.asarray(gradgrad_table(K, deg), np.float64)
    Tq = np.einsum("q,qik,qjl->klij", W, dN, dN)
    assert np.abs(Tq - T).max() < 1e-10, "quadrature rule not exact"
    return dN, W


def _qp_kernel(g_ref, vol_ref, u_ref, o_ref, gphi_ref, *,
               n, K1, dim, lam, mu, dN, W):
    Q = dN.shape[0]
    f32 = jnp.float32
    lam32, mu32 = np.float32(lam), np.float32(mu)
    f = [[jnp.zeros((8, 128), f32) for _ in range(n)] for _ in range(dim)]
    for q in range(Q):
        # gphi[i, cb] = sum_k dN[q, i, k] g[k, cb]  (sparse in k)
        for i in range(n):
            for cb in range(dim):
                acc = None
                for k in range(K1):
                    c = float(dN[q, i, k])
                    if c == 0.0:
                        continue
                    t = np.float32(c) * g_ref[0, k * dim + cb]
                    acc = t if acc is None else acc + t
                gphi_ref[i * dim + cb] = acc if acc is not None else \
                    jnp.zeros((8, 128), f32)
        # displacement gradient G[c, cb] = sum_i u[c, i] gphi[i, cb]
        G = [[None] * dim for _ in range(dim)]
        for c in range(dim):
            for cb in range(dim):
                acc = u_ref[c, 0, 0] * gphi_ref[cb]
                for i in range(1, n):
                    acc = acc + u_ref[c, 0, i] * gphi_ref[i * dim + cb]
                G[c][cb] = acc
        tr = G[0][0]
        for c in range(1, dim):
            tr = tr + G[c][c]
        wv = vol_ref[0] * np.float32(W[q])
        S = [[None] * dim for _ in range(dim)]
        for c in range(dim):
            for cb in range(dim):
                s = mu32 * (G[c][cb] + G[cb][c])
                if c == cb:
                    s = s + lam32 * tr
                S[c][cb] = s * wv
        # f[c, i] += gphi[i, cb] * sigma[c, cb]
        for i in range(n):
            for cb in range(dim):
                gp = gphi_ref[i * dim + cb]
                for c in range(dim):
                    f[c][i] = f[c][i] + gp * S[c][cb]
    for c in range(dim):
        for i in range(n):
            o_ref[c, 0, i] = f[c][i]


@functools.lru_cache(maxsize=16)
def _qp_call(E8, n, K1, dim, lam, mu, deg, interpret):
    dN, W = qp_tables(dim, deg)
    kern = functools.partial(_qp_kernel, n=n, K1=K1, dim=dim,
                             lam=lam, mu=mu, dN=dN, W=W)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(E8,),
            in_specs=[
                pl.BlockSpec((1, K1 * dim, 8, 128),
                             lambda i: (i, _Z, _Z, _Z)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, _Z, _Z)),
                pl.BlockSpec((dim, 1, n, 8, 128),
                             lambda i: (_Z, i, _Z, _Z, _Z)),
            ],
            out_specs=pl.BlockSpec((dim, 1, n, 8, 128),
                                   lambda i: (_Z, i, _Z, _Z, _Z)),
            scratch_shapes=[
                pltpu.VMEM((n * dim, 8, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((dim, E8, n, 8, 128), jnp.float32),
        interpret=bool(interpret),
    )


def qp_contract(GB2, volB, ue, lam, mu, K: int, deg: int,
                interpret: bool = False):
    """Superblock quadrature-point apply: ``f = vol Ke u`` without Ke.

    GB2: [E8, K1*dim, 8, 128] grad_lambda (superblock lane-major);
    volB: [E8, 8, 128]; ue: [d, E8, n, 8, 128] gathered element values.
    Returns [d, E8, n, 8, 128] f32.  ``lam``/``mu`` static floats (baked,
    bounded cache)."""
    dim = K
    E8 = volB.shape[0]
    K1 = GB2.shape[1] // dim
    n = ue.shape[2]
    call = _qp_call(E8, n, K1, dim, float(lam), float(mu), deg,
                    interpret)
    return call(GB2, volB, ue)


def factored_contract(GB2, volB, ue, lam, mu, K: int, deg: int,
                      interpret: bool = False, B: int = 8):
    """Fused apply: ``fe[c, e, i, l] = vol Ke u`` for the factored
    isotropic operator (module docstring).

    GB2: [Eb, K1*dim, 128] grad_lambda (lane-major);
    volB: [Eb, 128]; ue: [dim, Eb, n, 128] gathered element values.
    Returns [dim, Eb, n, 128] f32.  ``lam``/``mu`` are static floats
    (baked; a material change rebuilds the kernel — cached by value).
    """
    dim = K
    Eb = volB.shape[0]
    K1 = GB2.shape[1] // dim
    n = ue.shape[2]
    TM1, TM2, TQ = factored_tables(K, deg)
    call = _factored_call(Eb, n, K1, dim, float(lam), float(mu), B,
                          interpret)
    return call(GB2, volB, ue, jnp.asarray(TM1), jnp.asarray(TM2),
                jnp.asarray(TQ))
