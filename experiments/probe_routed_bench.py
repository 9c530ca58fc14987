"""Bench-scale probe: RoutedEBE SpMV / CG iteration cost on the real chip.

Measures (relay rules: varied scalar, readback, scan-differenced trips):
  * plan build (host) wall time,
  * one routed apply,
  * one routed-CG iteration (cg_operator_fixed),
vs the gather-pyramid EBEKernel at the same scale.

Run: python experiments/probe_routed_bench.py [n]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def per_iter(make_f, args, lens=(2, 12), reps=3):
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
    return (ts[lens[1]] - ts[lens[0]]) / (lens[1] - lens[0])


def main():
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.reorder import reorder_mesh
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.ops import element_matrices as em
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.sparse.ebe import EBEKernel
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE
    from meshfem_tpu.solvers import cg as cg_mod

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    print("device:", jax.devices()[0], "n:", n, flush=True)
    dt = jnp.float32
    t0 = time.time()
    V, T = generators.grid_tet(n, n, n)
    V2, T2, _, _ = reorder_mesh(V, T, order="rcb")
    mesh = FEMMesh(V2, T2, degree=2, node_order="firsttouch")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gl64, vol64 = simplex_geometry(jnp.asarray(V2)[jnp.asarray(T2)], 3)
    gl = jnp.asarray(np.asarray(gl64), dt)
    vol = jnp.asarray(np.asarray(vol64), dt)
    D = et.isotropic(3, 200.0, 0.3)
    M = em.fused_matrix_for(D, 3, 2, dt)
    Ke = em.element_elasticity_fused_apply(gl, vol, M, 10)
    print(f"mesh setup: {time.time()-t0:.1f}s  E={mesh.num_elements} "
          f"nodes={mesh.num_nodes}", flush=True)

    t0 = time.time()
    rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    print(f"routed plan build: {time.time()-t0:.1f}s", flush=True)
    for nm, p in (("gather", rk.gather), ("scatter", rk.scatter)):
        if hasattr(p, "plan"):          # SumPlan wraps a CopyPlan
            p = p.plan
        chains = [b.chain for b in p.buckets]
        sizes = [int(np.prod(b.pidx.shape)) // 1024 for b in p.buckets]
        nfix = int(p.fix_pos.shape[0] if hasattr(p, "fix_pos")
                   else p.fix_dst.shape[0])
        print(f"  {nm}: buckets(chain)={chains} vregs={sizes} "
              f"fixups={nfix}", flush=True)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt)

    # correctness at scale
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    y0 = np.asarray(kern(u))
    y1 = np.asarray(rk(u))
    print("rel err vs EBE:", np.abs(y1 - y0).max() / np.abs(y0).max(),
          flush=True)

    # routed apply cost
    def mk_apply(L):
        @jax.jit
        def f(s, rk, u):
            def body(c, _):
                return rk(c * 0.5 + u * s) * 1e-3, None
            return jax.lax.scan(body, u * s, None, length=L)[0]
        return f

    t = per_iter(mk_apply, (rk, u), lens=(2, 12))
    print(f"routed apply: {t*1e3:.2f} ms", flush=True)

    # routed CG iteration
    diag = rk.diagonal()
    free = jnp.ones((mesh.num_nodes, 3), dt)
    b = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt)

    def mk_cg(L):
        @jax.jit
        def f(s, rk, b, diag, free):
            return cg_mod.cg_operator_fixed(rk, b * s, diag, free,
                                            iters=L).x
        return f

    t = per_iter(mk_cg, (rk, b, diag, free), lens=(2, 12))
    print(f"routed CG: {t*1e3:.2f} ms/iter -> {1.0/t:.0f} it/s", flush=True)


if __name__ == "__main__":
    main()
