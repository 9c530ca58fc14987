"""Pallas TPU kernel: fused P2 element-stiffness assembly.

Computes Ke[e] = vol_e * (g_e (x) g_e) @ M for all elements, where
g_e = grad_lambda[e] (12 floats) and M is the constant fused
material/integral matrix ([gdim^2, (nd)^2], ops/element_matrices.py).

STATUS (measured, v5e): the XLA fused path (element_elasticity_fused_apply
with vol folded into the Gram operand) already runs at the HBM write floor
(~66M tets/s) and REMAINS THE DEFAULT; this kernel reaches ~21M tets/s
(Mosaic's jnp.dot does not honor precision=HIGHEST, and the lane-concat
Gram construction under-utilizes the VPU).  It is kept as the working
Pallas scaffold for the compute path — correct, tested (interpret mode ==
XLA path), and the record of the Mosaic constraints that shaped it:
  * lane-crossing reshapes are rejected ("unsupported shape cast") —
    build [BE, gdim^2] Gram blocks by lane CONCATENATION;
  * block shapes: last two dims must be (multiple of 8, multiple of 128)
    or equal the array dims — pad (nd)^2 900 -> 1024, pass vol as [BE, 1];
  * index maps traced under jax_enable_x64 fail to legalize
    ("func.return") — trace the pallas_call inside jax.enable_x64(False);
  * tpu.dynamic_gather (the only in-register gather) is lane-rigid:
    out[i, j] can only read source lane j, so unstructured SpMV needs a
    two-stage routing network (prototyped, deferred; see
    experiments/probe_tpu.py for the measurements that scoped it).

(The general gather-based SpMV was prototyped as a Pallas kernel too and
abandoned this round: Mosaic's only in-register gather, tpu.dynamic_gather,
is lane-rigid — out[i, j] can only read source lane j — so an unstructured
SpMV needs a two-stage routing network (row-stage + lane-stage with
collision multiplicity) whose measured building blocks sum to ~2 Gval/s,
i.e. ~10 ms/apply at 1M DOF.  See experiments/probe_tpu.py for the
measurements that scoped it.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _asm_kernel(nd2p, gdim, gl_ref, vol_ref, M_ref, out_ref):
    # Ke = (vol * (g (x) g)) @ M as ONE K=gdim^2 MXU matmul; the Gram block
    # is built by lane-concatenation (Mosaic rejects lane-crossing shape
    # casts, but lane concat of [BE, gdim] slabs is supported).
    g = gl_ref[0]                                     # [BE, gdim]
    gs = g * vol_ref[0]                               # vol block [BE, 1]
    gg = jnp.concatenate([gs[:, k:k + 1] * g for k in range(gdim)],
                         axis=1)                      # [BE, gdim^2]
    out_ref[0] = jnp.dot(gg, M_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def element_stiffness_pallas(grad_lambda, volume, M_fused,
                             block: int = 256, interpret: bool = False):
    """[E, K+1, d] grads + [E] volumes + fused M -> Ke [E, nd, nd].

    Drop-in replacement for ops.element_matrices.element_elasticity_fused_
    apply on TPU (f32).  E is padded to a multiple of ``block``; the
    (nd)^2 lane dim is padded to a multiple of 128 (Mosaic block rule)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, nv, d = grad_lambda.shape
    gdim = nv * d
    nd2 = M_fused.shape[1]
    nd = int(round(nd2 ** 0.5))
    nd2p = -(-nd2 // 128) * 128

    Ep = -(-E // block) * block
    gl = grad_lambda.reshape(E, gdim).astype(jnp.float32)
    vol = volume.astype(jnp.float32)
    if Ep != E:
        gl = jnp.concatenate(
            [gl, jnp.zeros((Ep - E, gdim), jnp.float32)])
        vol = jnp.concatenate([vol, jnp.zeros(Ep - E, jnp.float32)])
    Mp = jnp.zeros((gdim * gdim, nd2p), jnp.float32)
    Mp = Mp.at[:, :nd2].set(M_fused.astype(jnp.float32))

    kern = functools.partial(_asm_kernel, nd2p, gdim)
    # NB: Mosaic fails to legalize index maps traced under jax_enable_x64
    # ("failed to legalize operation 'func.return'"); trace the kernel in
    # 32-bit mode — every buffer here is explicitly f32/i32 anyway.
    with jax.enable_x64(False):
      Ke = pl.pallas_call(
          kern,
          grid=(Ep // block,),
          interpret=interpret,
          in_specs=[
              pl.BlockSpec((1, block, gdim), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((1, block, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((gdim * gdim, nd2p), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),
          ],
          out_specs=pl.BlockSpec((1, block, nd2p), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((Ep // block, block, nd2p),
                                         jnp.float32),
      )(gl.reshape(Ep // block, block, gdim),
        vol.reshape(Ep // block, block, 1),
        Mp)
    return Ke.reshape(Ep, nd2p)[:E, :nd2].reshape(E, nd, nd)
