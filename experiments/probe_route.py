"""Throughput probe: Pallas in-register lane-routing at EBE scale.

The round-3 SpMV design replaces XLA's per-row gathers (~5 ns/row, so
2.57M narrow rows = ~14 ms) with in-register routing: per output vreg
[8,128] of gathered values, chain over a few source windows of 128 lanes
(broadcast row + dim-1 dynamic_gather + masked accumulate).  This probe
measures the achievable routed-values/s on the real device at the bench
problem's scale (7.7M routed values = 3 components x 2.57M slots).

Run: python experiments/probe_route.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def route_kernel(win0_ref, x_ref, widx_ref, lidx_ref, o_ref, *, B, CHAIN):
    pid = pl.program_id(0)

    def body(v, _):
        w0 = win0_ref[pid * B + v]
        xwin = x_ref[pl.ds(w0, CHAIN), :]          # [CHAIN, 128]
        widx = widx_ref[v]                          # [8,128] int32
        lidx = lidx_ref[v]
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(CHAIN):
            row = jnp.broadcast_to(xwin[k][None, :], (8, 128))
            g = jnp.take_along_axis(row, lidx, axis=1)
            acc = acc + jnp.where(widx == k, g, 0.0)
        o_ref[v] = acc
        return 0

    jax.lax.fori_loop(0, B, body, 0)


def build(NV=7530, NT=2797, CHAIN=4, B=64):
    grid = NV // B
    assert NV % B == 0
    f = pl.pallas_call(
        functools.partial(route_kernel, B=B, CHAIN=CHAIN),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((NT, 128), lambda i, *_: (0, 0)),
                pl.BlockSpec((B, 8, 128), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((B, 8, 128), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, 8, 128), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NV, 8, 128), jnp.float32),
    )
    return f


def main():
    rng = np.random.default_rng(0)
    NV, NT, CHAIN, B = 7530 // 30 * 30, 2797, 4, 30
    NV = 7530
    B = 30
    while NV % B:
        NV += 1
    print(f"NV={NV} vregs = {NV*1024/1e6:.2f}M routed values, chain={CHAIN}")
    x = rng.standard_normal((NT, 128)).astype(np.float32)
    win0 = rng.integers(0, NT - CHAIN, NV).astype(np.int32)
    widx = rng.integers(0, CHAIN, (NV, 8, 128)).astype(np.int32)
    lidx = rng.integers(0, 128, (NV, 8, 128)).astype(np.int32)
    f = build(NV, NT, CHAIN, B)

    # correctness (small slice, on device)
    out = np.asarray(jax.jit(f)(win0, x, widx, lidx))
    ref = x[(win0[:, None, None] + widx).reshape(NV, 8, 128),
            lidx]
    print("correct:", np.allclose(out, ref))

    # timing: scan-differenced (relay rules)
    def make_f(L):
        @jax.jit
        def g(s, win0, x, widx, lidx):
            def step(c, _):
                o = f(win0, x * (s + c * 1e-20), widx, lidx)
                return c * 0.5 + o[0, 0, 0], None
            return jax.lax.scan(step, s, None, length=L)[0]
        return g

    ts = {}
    for L in (2, 12):
        g = make_f(L)
        float(g(jnp.float32(1.0), win0, x, widx, lidx))
        best = []
        for i in range(3):
            s = jnp.float32(1.0 + 1e-6 * i)
            t0 = time.time()
            float(g(s, win0, x, widx, lidx))
            best.append(time.time() - t0)
        ts[L] = float(np.median(best))
    dt = (ts[12] - ts[2]) / 10
    print(f"route pass: {dt*1e3:.3f} ms -> {NV*1024/dt/1e9:.1f} Gval/s")


if __name__ == "__main__":
    main()
