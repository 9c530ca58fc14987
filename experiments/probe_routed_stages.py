"""Stage-split timing of the routed SpMV at bench scale on the real chip.

Times each stage of RoutedEBE.__call__ separately (scan-differenced, varied
scalar, forced readback — see bench.py relay hazards): gather (all
components in one plan), contract, each scatter-ladder rung, the full
apply, and a full routed-CG iteration.

Run: python experiments/probe_routed_stages.py [n]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def per_iter(make_f, args, lens=(4, 64), reps=3):
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


def scan3(fn):
    def mk(L, *args):
        @jax.jit
        def f(s, x0, *rest):
            def body(c, _):
                return fn(c * s, *rest), None
            return jax.lax.scan(body, x0 * s, None, length=L)[0]
        return f
    return mk


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
    t0 = time.time()
    rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    print(f"plan build: {time.time()-t0:.1f}s  E={mesh.num_elements} "
          f"nodes={mesh.num_nodes}", flush=True)
    plans = [("gather", rk.gather), ("scat1", rk.scatter)] + [
        (f"scat{i+2}", p) for i, p in enumerate(rk.scatter_rest)]
    for nm, p in plans:
        chains = [b.chain for b in p.buckets]
        sizes = [int(np.prod(b.pidx.shape)) // 1024 for b in p.buckets]
        print(f"  {nm}: n_out={p.n_out} chains={chains} vregs={sizes} "
              f"work={sum(c*s for c, s in zip(chains, sizes))}", flush=True)

    rng = np.random.default_rng(0)
    N = mesh.num_nodes
    u = jnp.asarray(rng.standard_normal((N, 3)), dt)

    # correctness at scale
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    y0 = np.asarray(kern(u))
    y1 = np.asarray(rk(u))
    print("rel err vs EBE:", np.abs(y1 - y0).max() / np.abs(y0).max(),
          flush=True)

    Eb, nn = rk.KeB.shape[0], rk.KeB.shape[1]
    nd = nn * 3
    src = jnp.asarray(rng.standard_normal(3 * N).astype(np.float32))
    ue = jnp.asarray(rng.standard_normal((3, Eb, nn, 128)).astype(np.float32))

    mk = scan3(lambda x, p: p(x)[:, :N])
    src3 = src.reshape(3, N)
    print(f"gather:   {per_iter(lambda L: mk(L), (src3, rk.gather))*1e3:.2f}"
          " ms", flush=True)
    mk = scan3(lambda x, K: jnp.einsum("eACacl,ceal->CeAl", K, x))
    print(f"contract: {per_iter(lambda L: mk(L), (ue, rk.KeB))*1e3:.2f} ms",
          flush=True)
    n_in = Eb * nn * 128           # slots per plane
    for nm, p in plans[1:]:
        x_in = jnp.asarray(rng.standard_normal((3, n_in))
                           .astype(np.float32))
        n_out_p = p.n_out if not hasattr(p, "plan") else p.n_out

        def stage(x, p=p, n_in=n_in):
            y = p(x).reshape(3, -1)
            return jnp.pad(y, ((0, 0), (0, max(n_in - y.shape[1], 0)))
                           )[:, :n_in]

        mk = scan3(stage)
        print(f"{nm}:    {per_iter(lambda L: mk(L), (x_in, p))*1e3:.2f}"
              " ms", flush=True)
        n_in = n_out_p
    # chained pipeline without the user-layout transposes (planes in/out):
    # isolates the __call__ glue (transposes, n_out slicing, fix-ups)
    def chained(x, k):
        Eb_, n_ = k.KeB.shape[0], k.KeB.shape[1]
        ue = k.gather(x, interpret=False).reshape(3, Eb_, n_, 128)
        fe = k._contract(ue)
        y = k._scatter(fe.reshape(3, -1))
        return y[:, :N] * 1.0

    mk = scan3(chained)
    print(f"chained (planes in/out): "
          f"{per_iter(lambda L: mk(L), (src3, rk))*1e3:.2f} ms", flush=True)

    mk = scan3(lambda x, k: k(x))
    print(f"full apply: {per_iter(lambda L: mk(L), (u, rk))*1e3:.2f} ms",
          flush=True)

    diag = rk.diagonal()
    free = jnp.ones((N, 3), dt)
    b = jnp.asarray(rng.standard_normal((N, 3)), dt)

    def mk_cg(L):
        @jax.jit
        def f(s, rk, b, diag, free):
            return cg_mod.cg_operator_fixed(rk, b * s, diag, free,
                                            iters=L).x
        return f

    t = per_iter(lambda L: mk_cg(L), (rk, b, diag, free), lens=(2, 12))
    print(f"routed CG: {t*1e3:.2f} ms/iter -> {1.0/t:.0f} it/s", flush=True)


if __name__ == "__main__":
    main()
