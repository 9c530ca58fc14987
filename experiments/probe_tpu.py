"""TPU microbenchmarks that ground the SpMV/solver design (round 2).

Measurement rules for the tunneled 'axon' backend (all discovered the hard
way — each alone gives numbers wrong by 10-1000x):
  1. identical (executable, args) dispatches are memoized by the relay —
     vary an input scalar every call;
  2. block_until_ready() does NOT force execution — force a HOST READBACK
     (float(jnp.sum(out))) to time anything;
  3. each timed call carries a ~20-40 ms relay round-trip — run the body L
     times inside lax.scan and DIFFERENCE two trip counts;
  4. loop-invariant bodies are hoisted out of scan — feed the carry into
     every operand that must stay live (shift indices by an opaque
     runtime-0, scale tables by s).

Run: python experiments/probe_tpu.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def per_iter_cost(make_f, args, lens=(4, 36), reps=3):
    """Per-iteration device time of a scan body, RTT-free.

    make_f(L) must return a jitted f(s, *args) that runs the body L times
    and whose output depends on every iteration.  Returns seconds/iter."""
    fs = {L: make_f(L) for L in lens}
    ts = {}
    for L in lens:
        float(jnp.sum(fs[L](jnp.float32(1.0), *args)))  # warm (compile)
        best = []
        for i in range(reps):
            s = jnp.float32(1.0 + 1e-6 * (i + 1))
            t0 = time.time()
            float(jnp.sum(fs[L](s, *args)))
            best.append(time.time() - t0)
        ts[L] = float(np.median(best))
    return (ts[lens[1]] - ts[lens[0]]) / (lens[1] - lens[0])


def scan_bench(name, body, init, args, note="", lens=(4, 36)):
    def make_f(L):
        @jax.jit
        def f(s, *a):
            def step(c, _):
                return body(c, s, *a), None
            return jax.lax.scan(step, init(s, *a), None, length=L)[0]
        return f
    t = per_iter_cost(make_f, args, lens=lens)
    print(f"{name}: {t*1e3:8.3f} ms/iter   {note}")
    return t


def opaque_shift(c):
    """Runtime-0 int the compiler can't fold (defeats hoisting)."""
    lead = c
    while lead.ndim > 0:
        lead = lead[0]
    return (lead > 1e30).astype(jnp.int32)


def main():
    print("device:", jax.devices()[0])
    dt = jnp.float32
    rng = np.random.default_rng(0)
    Nd = 1_073_733          # bench-scale P2 elasticity DOFs
    N = 357_911             # nodes
    E = 257_250             # tets

    # trivial body -> scan-iteration floor
    scan_bench("scan floor (trivial)", lambda c, s: c * s,
               lambda s: jnp.zeros((8, 128), dt) + s, ())

    # elementwise passes: flat vs [N, 3]
    v = jnp.asarray(rng.standard_normal(Nd), dt)
    scan_bench("axpy flat [1.07M]", lambda c, s, v: c * s + 0.5 * v,
               lambda s, v: v * s, (v,), "expect ~0.02 ms (8.6MB)")
    v3 = jnp.asarray(rng.standard_normal((N, 3)), dt)
    scan_bench("axpy [358k, 3]", lambda c, s, v: c * s + 0.5 * v,
               lambda s, v: v * s, (v3,), "42x lane padding if ~0.4 ms")

    # dots (CG has 2/iter)
    scan_bench("vdot flat [1.07M]",
               lambda c, s, v: c * s + jnp.vdot(v + c[0], v) * 1e-12,
               lambda s, v: jnp.zeros(8, dt) + s, (v,))

    # gathers at EBE scale
    u3 = jnp.asarray(rng.standard_normal((N, 3)), dt)
    idx = jnp.asarray(rng.integers(0, N, E * 10), jnp.int32)

    def g3(c, s, u3, idx):
        return c * 0.999 + u3[idx + opaque_shift(c)] * 1e-9
    scan_bench("gather 2.57M rows from [N,3]", g3,
               lambda s, u3, idx: jnp.zeros((E * 10, 3), dt) + s,
               (u3, idx), lens=(2, 10))

    u1 = jnp.asarray(rng.standard_normal(Nd), dt)
    idx1 = jnp.asarray(rng.integers(0, Nd, 7_700_000), jnp.int32)

    def g1(c, s, u1, idx1):
        return c * 0.999 + u1[idx1 + opaque_shift(c)] * 1e-9
    scan_bench("gather 7.7M scalars from flat", g1,
               lambda s, u1, i: jnp.zeros(7_700_000, dt) + s,
               (u1, idx1), lens=(2, 10))

    u128 = jnp.asarray(rng.standard_normal((Nd // 128, 128)), dt)
    i128 = jnp.asarray(rng.integers(0, Nd // 128, 60_000), jnp.int32)

    def g128(c, s, u, i):
        return c * 0.999 + u[i + opaque_shift(c)] * 1e-9
    scan_bench("gather 60k rows x128", g128,
               lambda s, u, i: jnp.zeros((60_000, 128), dt) + s,
               (u128, i128), lens=(2, 10))

    # batched einsum at EBE scale
    Ke = jnp.asarray(rng.standard_normal((E, 30, 30)), dt)
    ue = jnp.asarray(rng.standard_normal((E, 30)), dt)

    def ein(c, s, Ke, ue):
        return c * s + jnp.einsum("eij,ej->ei", Ke, ue + c * 1e-9)
    scan_bench("EBE einsum [E,30,30]x[E,30]", ein,
               lambda s, K, u: u * s, (Ke, ue), "925MB -> ~2.5 ms @377GB/s",
               lens=(2, 10))

    # big matmul
    M = 2048
    A = jnp.asarray(rng.standard_normal((M, M)) * 1e-2, dt)

    def mm(c, s, A):
        return (c * s) @ A
    scan_bench("matmul 2048^3", mm, lambda s, A: A * s, (A,),
               "0.57 ms = 30 TFLOP/s f32")


if __name__ == "__main__":
    main()
