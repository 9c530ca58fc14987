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
