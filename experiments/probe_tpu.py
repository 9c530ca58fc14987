"""TPU microbenchmarks that ground the round-2 SpMV/solver design.

The tunneled 'axon' backend memoizes identical (executable, args)
dispatches, so EVERY timed call varies an input scalar, and per-iteration
costs are amortized inside compiled lax.scan loops whose trip count we
compare at two lengths (the difference isolates per-iteration device time
from dispatch overhead).

Run: python experiments/probe_tpu.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def time_varied(f, args, reps=4):
    """Median wall time of f(s, *args) with s varying per call."""
    f(jnp.float32(1.0), *args)[0].block_until_ready() if isinstance(
        f(jnp.float32(1.0), *args), tuple) else jax.block_until_ready(
        f(jnp.float32(1.0), *args))
    ts = []
    for i in range(reps):
        s = jnp.float32(1.0 + 1e-6 * (i + 1))
        t0 = time.time()
        jax.block_until_ready(f(s, *args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def scan_cost(body, init, args, lens=(8, 40)):
    """Per-iteration device cost of `body(carry, s) -> carry` amortized in a
    scan, isolated from dispatch by differencing two trip counts."""
    fs = {}
    for L in lens:
        @jax.jit
        def f(s, *a, L=L):
            def step(c, _):
                return body(c, s, *a), None
            return jax.lax.scan(step, init(s, *a), None, length=L)[0]
        fs[L] = f
    t_short = time_varied(fs[lens[0]], args)
    t_long = time_varied(fs[lens[1]], args)
    return (t_long - t_short) / (lens[1] - lens[0]), t_short


def main():
    print("device:", jax.devices()[0])
    dt = jnp.float32
    rng = np.random.default_rng(0)

    # dispatch floor (varied input)
    f = jax.jit(lambda s: s * 2.0)
    t = time_varied(lambda s: f(s), ())
    print(f"dispatch floor (varied): {t*1e3:.2f} ms")

    # scan loop overhead, trivial body
    per, base = scan_cost(lambda c, s: c * s, lambda s: jnp.zeros(8, dt) + s,
                          ())
    print(f"scan trivial body: {per*1e3:.4f} ms/iter (short-call {base*1e3:.1f} ms)")

    # HBM bandwidth: axpy on 128 MB
    N = 1 << 25
    a = jnp.ones(N, dt)
    per, base = scan_cost(lambda c, s, a: c * s + 1.5 * a,
                          lambda s, a: a * s, (a,))
    gb = 3 * N * 4 / 1e9
    print(f"axpy 128MB: {per*1e3:.3f} ms/iter -> {gb/per:.0f} GB/s")

    # elasticity-sized axpy [357911, 3]
    v = jnp.ones((357911, 3), dt)
    per, base = scan_cost(lambda c, s, v: c * s + 1.5 * v,
                          lambda s, v: v * s, (v,))
    print(f"axpy [357911,3]: {per*1e3:.4f} ms/iter")

    # gather: rows vs width
    Nrows = 360_000
    for R, W in [(2_600_000, 3), (650_000, 3), (650_000, 24), (650_000, 96),
                 (160_000, 24), (160_000, 96), (45_000, 96)]:
        tbl = jnp.asarray(rng.standard_normal((Nrows, W)), dt)
        idx = jnp.asarray(rng.integers(0, Nrows, R), jnp.int32)

        def body(c, s, tbl, idx):
            return c * s + tbl[idx].sum(axis=0)
        per, _ = scan_cost(body, lambda s, tbl, idx: jnp.zeros(W, dt) + s,
                           (tbl, idx))
        print(f"gather R={R:>9,} W={W:>3}: {per*1e3:7.3f} ms/iter "
              f"({per/R*1e9:6.2f} ns/row, {R*W*4/per/1e9:7.1f} GB/s)")

    # gather straight into [R, W] output (no reduction) — the EBE shape
    R, W = 2_600_000, 3
    tbl = jnp.asarray(rng.standard_normal((Nrows, W)), dt)
    idx = jnp.asarray(rng.integers(0, Nrows, R), jnp.int32)

    def body(c, s, tbl, idx):
        return c * s + tbl[idx]
    per, _ = scan_cost(body, lambda s, tbl, idx: jnp.zeros((R, W), dt) + s,
                       (tbl, idx))
    print(f"gather->materialize R={R:,} W={W}: {per*1e3:.3f} ms/iter "
          f"({per/R*1e9:.2f} ns/row)")

    # segment_sum vs pyramid
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from meshfem_tpu.sparse.scatter import ScatterPlan
    R, Nseg, W = 2_600_000, 360_000, 3
    ids_np = np.sort(rng.integers(0, Nseg, R)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((R, W)), dt)
    ids = jnp.asarray(ids_np)

    def body(c, s, vals, ids):
        return c * s + jax.ops.segment_sum(vals, ids, num_segments=Nseg)
    per, _ = scan_cost(body, lambda s, v, i: jnp.zeros((Nseg, W), dt) + s,
                       (vals, ids))
    print(f"segment_sum R={R:,} W={W}: {per*1e3:.3f} ms/iter")

    plan = ScatterPlan.build(ids_np, Nseg)

    def body2(c, s, vals, plan):
        return c * s + plan(vals)
    per, _ = scan_cost(body2, lambda s, v, p: jnp.zeros((Nseg, W), dt) + s,
                       (vals, plan))
    print(f"pyramid     R={R:,} W={W}: {per*1e3:.3f} ms/iter")

    # EBE einsum
    E = 257_250
    Ke = jnp.asarray(rng.standard_normal((E, 30, 30)), dt)
    ue = jnp.asarray(rng.standard_normal((E, 30)), dt)

    def body3(c, s, Ke, ue):
        return c * s + jnp.einsum("eij,ej->ei", Ke, ue)
    per, _ = scan_cost(body3, lambda s, K, u: u * s, (Ke, ue))
    by = E * 900 * 4
    print(f"EBE einsum [E,30,30]x[E,30]: {per*1e3:.3f} ms/iter "
          f"({by/per/1e9:.0f} GB/s)")

    # GBELL-shaped batched block matvec
    G, Lb, B = 45_000, 14, 24
    Blk = jnp.asarray(rng.standard_normal((G, Lb, B, B)), dt)
    up = jnp.asarray(rng.standard_normal((G, Lb, B)), dt)

    def body4(c, s, Blk, up):
        return c * s + jnp.einsum("glab,glb->ga", Blk, up)
    per, _ = scan_cost(body4, lambda s, B_, u: jnp.zeros((G, B), dt) + s,
                       (Blk, up))
    by = G * Lb * B * B * 4
    print(f"GBELL einsum [G,{Lb},24,24]: {per*1e3:.3f} ms/iter "
          f"({by/per/1e9:.0f} GB/s)")

    # MXU matmul
    M = 4096
    A = jnp.asarray(rng.standard_normal((M, M)), dt)

    def body5(c, s, A):
        return (c * s) @ A * 1e-3
    per, _ = scan_cost(body5, lambda s, A: A * s, (A,))
    print(f"matmul {M}^3: {per*1e3:.3f} ms/iter ({2*M**3/per/1e12:.1f} TFLOP/s f32)")

    # full current EBE apply (gather + einsum + pyramid) at bench scale
    n_nodes = 357_911
    ed = jnp.asarray(rng.integers(0, n_nodes, (E, 10)), jnp.int32)
    from meshfem_tpu.sparse.ebe import EBEKernel
    kern = EBEKernel.build(Ke, ed, n_nodes, 1)  # scalar-ish shape probe
    u1 = jnp.ones((n_nodes, 3), dt)
    # vector d=3 real kernel: Ke is [E,30,30], elem_dofs [E,10], d=3
    kern3 = EBEKernel.build(Ke, ed, n_nodes, 3)

    def body6(c, s, kern3):
        return c * s + kern3(c)
    per, _ = scan_cost(body6, lambda s, k: u1 * s, (kern3,))
    print(f"EBE full apply (gather+einsum+pyramid): {per*1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
