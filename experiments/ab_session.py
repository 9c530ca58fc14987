"""Interactive A/B state for routed-apply iteration on the real chip.

Run inside ``python -i`` (tmux): builds the bench-scale mesh, the dense
and factored RoutedEBE operators (shared routing plans), and timing
helpers, then drops to a prompt.  Relay measurement rules apply: vary a
scalar every repetition, force a readback, difference scan lengths.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.mesh.reorder import reorder_mesh
from meshfem_tpu.mesh.geometry import simplex_geometry
from meshfem_tpu.ops import element_matrices as em
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.sparse.ebe import EBEKernel
from meshfem_tpu.sparse.routed_ebe import RoutedEBE
from meshfem_tpu.solvers import cg as cg_mod

n = int(os.environ.get("AB_N", "35"))
print("device:", jax.devices()[0], "n:", n, flush=True)
dt = jnp.float32
t0 = time.time()
V, T = generators.grid_tet(n, n, n)
V2, T2, _, _ = reorder_mesh(V, T, order="rcb")
mesh = FEMMesh(V2, T2, degree=2, node_order="firsttouch")
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    gl64, vol64 = simplex_geometry(
        jnp.asarray(np.asarray(V2))[jnp.asarray(np.asarray(T2))], 3)
    gl_h = np.asarray(gl64, np.float32)
    vol_h = np.asarray(vol64, np.float32)
gl = jnp.asarray(gl_h, dt)
vol = jnp.asarray(vol_h, dt)
E_, nu_ = 200.0, 0.3
D = et.isotropic(3, E_, nu_)
lam, mu = et.lame_parameters(D)
M = em.fused_matrix_for(D, 3, 2, dt)
Ke = em.element_elasticity_fused_apply(gl, vol, M, 10)
print(f"mesh setup: {time.time()-t0:.1f}s  E={mesh.num_elements} "
      f"nodes={mesh.num_nodes} dofs={3*mesh.num_nodes}", flush=True)

t0 = time.time()
rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
print(f"dense routed build: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
rf = RoutedEBE.build(None, mesh.elem_nodes, mesh.num_nodes, 3,
                     factor=(gl, vol, lam, mu, 2))
print(f"factored routed build (cached plans): {time.time()-t0:.1f}s",
      flush=True)

rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt)
b = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt)
free = jnp.ones((mesh.num_nodes, 3), dt)


def per_iter(make_f, args, lens=(2, 12), reps=3, tag=""):
    ts = {}
    for L in lens:
        f = make_f(L)
        t0 = time.time()
        float(jnp.sum(f(jnp.float32(1.0), *args)))
        print(f"  compile+run L={L}: {time.time()-t0:.1f}s", flush=True)
        best = []
        for i in range(reps):
            s = jnp.float32(1.0 + 1e-6 * (i + 1))
            t0 = time.time()
            float(jnp.sum(f(s, *args)))
            best.append(time.time() - t0)
        ts[L] = float(np.median(best))
    t = (ts[lens[1]] - ts[lens[0]]) / (lens[1] - lens[0])
    print(f"{tag}: {t*1e3:.2f} ms", flush=True)
    return t


def mk_apply(L):
    @jax.jit
    def f(s, op, u):
        def body(c, _):
            return op(c * 0.5 + u * s) * 1e-3, None
        return jax.lax.scan(body, u * s, None, length=L)[0]
    return f


def mk_cg(L):
    @jax.jit
    def f(s, op, b, diag, free):
        return cg_mod.cg_operator_fixed(op, b * s, diag, free,
                                        iters=L).x
    return f


def check(op):
    y0 = np.asarray(rk(u))
    y1 = np.asarray(op(u))
    print("rel err vs dense routed:",
          np.abs(y1 - y0).max() / np.abs(y0).max(), flush=True)


print("READY — per_iter(mk_apply, (rk, u)) etc.", flush=True)
