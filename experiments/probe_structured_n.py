"""Structured-PCG rate vs grid size (the r2-vs-r4 2x question).

BENCH_r02 measured 2367.5 it/s at n=35 (1.07M DOF); BENCH_r04 measured
1294.8 it/s at n=36 (1.17M DOF) — both labeled "~1M-DOF structured" with
no config fields, leaving the 2x drop unexplained.  This probe times the
identical lane-packed conv CG at both sizes with the bench measurement
protocol to attribute the gap (problem size + packed-shape padding vs a
real regression).

Run: python experiments/probe_structured_n.py [n ...]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def per_iter(make_f, args, lens=(16, 816), reps=5):
    ts = {}
    for L in lens:
        f = make_f(L)
        float(jnp.sum(f(jnp.float32(1.0), *args)))
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
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.ops.structured import StructuredP2Elasticity
    from meshfem_tpu.solvers import cg as cg_mod

    ns = [int(a) for a in sys.argv[1:]] or [35, 36]
    dt = jnp.float32
    D = et.isotropic(3, 200.0, 0.3)
    print("device:", jax.devices()[0], flush=True)
    for n in ns:
        V, T = generators.grid_tet(n, n, n)
        mesh = FEMMesh(V, T, degree=2)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt)
        op = StructuredP2Elasticity.build(mesh, D, dtype=dt)
        bp = op.to_packed(b)
        valid = op.valid_mask_packed().astype(dt)
        diagp = op.diagonal_packed().astype(dt)
        shapes = jax.tree_util.tree_map(lambda x: x.shape, bp)

        def mk(L):
            @jax.jit
            def f(s, op, bp, valid, diagp):
                project = lambda v: v * valid
                safe = jnp.where(diagp > 0, diagp, 1.0)
                return cg_mod.cg_fixed_iters(
                    op.apply_packed, bp * s, M_inv=lambda r: r / safe,
                    project=project, iters=L).x
            return f

        t = per_iter(mk, (op, bp, valid, diagp))
        print(f"n={n}: dofs={mesh.num_nodes*3} packed={shapes} "
              f"{t*1e3:.3f} ms/iter -> {1.0/t:.0f} it/s", flush=True)


if __name__ == "__main__":
    main()
