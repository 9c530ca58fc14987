"""Scatter-ladder level-2 GROUP fan-in probe.

The ladder compacts slots -> per-block ids -> per-GROUP-block ids ->
global nodes; the final rung is the only unbounded-fan-in ReducePlan.
Larger groups dedupe more before that rung (its id count drops) at the
cost of longer level-2 chains.  Times each rung + full apply for
MESHFEM_SCAT_GRP values.

Run: python experiments/probe_scat_grp.py [n] [grp ...]
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
    from meshfem_tpu.fem import elasticity_tensor as et

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    grps = sys.argv[2:] or ["8", "16", "32", "64"]
    print("device:", jax.devices()[0], "n:", n, flush=True)
    V, T = generators.grid_tet(n, n, n)
    V2, T2, _, _ = reorder_mesh(V, T, order="rcb")
    mesh = FEMMesh(V2, T2, degree=2, node_order="firsttouch")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gl64, vol64 = simplex_geometry(jnp.asarray(V2)[jnp.asarray(T2)], 3)
    gl = jnp.asarray(np.asarray(gl64), jnp.float32)
    vol = jnp.asarray(np.asarray(vol64), jnp.float32)
    D = et.isotropic(3, 200.0, 0.3)
    lam, mu = et.lame_parameters(D)
    rng = np.random.default_rng(0)
    N = mesh.num_nodes
    u = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    for grp in grps:
        os.environ["MESHFEM_SCAT_GRP"] = grp
        from meshfem_tpu.sparse.routed_ebe import RoutedEBE, _PLAN_CACHE
        _PLAN_CACHE.clear()
        t0 = time.time()
        rk = RoutedEBE.build(None, mesh.elem_nodes, N, 3,
                             factor=(gl, vol, lam, mu, 2))
        print(f"[grp={grp}] build {time.time()-t0:.0f}s", flush=True)
        plans = [("scat1", rk.scatter)] + [
            (f"scat{i+2}", p) for i, p in enumerate(rk.scatter_rest)]
        Eb = rk.GB.shape[0] * 8
        n_in = Eb * 10 * 128
        for nm, p in plans:
            x_in = jnp.asarray(rng.standard_normal((3, n_in))
                               .astype(np.float32))

            def stage(x, p=p, n_in=n_in):
                y = p(x).reshape(3, -1)
                return jnp.pad(y, ((0, 0), (0, max(n_in - y.shape[1], 0)))
                               )[:, :n_in]

            mk = scan3(stage)
            t = per_iter(lambda L: mk(L), (x_in, p))
            print(f"  {nm}: {t*1e3:.2f} ms  (n_out {p.n_out})", flush=True)
            n_in = p.n_out
        mk = scan3(lambda x, k: k(x))
        t = per_iter(lambda L: mk(L), (u, rk), lens=(2, 24))
        print(f"  full apply: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
