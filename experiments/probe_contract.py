"""On-chip check of the fused factored contraction (sparse/contract.py).

1. accuracy: factored_contract(interpret=False) vs the einsum reference
   (HIGHEST precision) on random data — the Mosaic lowering check
   (interpret mode is CPU-tested; this is the real chip);
2. speed: fused kernel vs XLA einsum form vs dense-KeB einsum at bench
   scale.

Run: python experiments/probe_contract.py [Eb]
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
        float(jnp.sum(f(jnp.float32(1.0), *args)))
        best = []
        for i in range(reps):
            s = jnp.float32(1.0 + 1e-6 * (i + 1))
            t0 = time.time()
            float(jnp.sum(f(s, *args)))
            best.append(time.time() - t0)
        ts[L] = float(np.median(best))
    return (ts[lens[1]] - ts[lens[0]]) / (lens[1] - lens[0])


def einsum_ref(GB, volB, ue, lam, mu, T):
    hp = jax.lax.Precision.HIGHEST
    d1 = jnp.einsum("ekcl,cenl->eknl", GB, ue, precision=hp)
    G2 = jnp.einsum("ekcl,emcl->ekml", GB, GB, precision=hp)
    Le = jnp.einsum("kmij,ekml->eijl", T, G2, precision=hp)
    f1 = mu * jnp.einsum("eijl,cejl->ceil", Le, ue, precision=hp)
    m1 = jnp.einsum("klij,eljL->ekiL", T, d1, precision=hp)
    m2 = jnp.einsum("klij,ekjL->eliL", T, d1, precision=hp)
    f2 = lam * jnp.einsum("ekcL,ekiL->ceiL", GB, m1, precision=hp)
    f3 = mu * jnp.einsum("elcL,eliL->ceiL", GB, m2, precision=hp)
    return volB[None, :, None, :] * (f1 + f2 + f3)


def main():
    from meshfem_tpu.sparse.contract import factored_contract
    from meshfem_tpu.ops.element_matrices import gradgrad_table

    Eb = int(sys.argv[1]) if len(sys.argv) > 1 else 2187
    dim, deg, n = 3, 2, 10
    K1 = dim + 1
    print("device:", jax.devices()[0], "Eb:", Eb, flush=True)
    rng = np.random.default_rng(1)
    GB = jnp.asarray(rng.standard_normal((Eb, K1, dim, 128))
                     .astype(np.float32))
    volB = jnp.asarray(rng.random((Eb, 128)).astype(np.float32) + 0.5)
    ue = jnp.asarray(rng.standard_normal((dim, Eb, n, 128))
                     .astype(np.float32))
    lam, mu = 1.7, 0.9
    T = jnp.asarray(gradgrad_table(dim, deg), jnp.float32)
    GB2 = GB.reshape(Eb, K1 * dim, 128)

    ref = np.asarray(jax.jit(einsum_ref, static_argnums=(3, 4))(
        GB, volB, ue, lam, mu, T))
    out = np.asarray(factored_contract(GB2, volB, ue, lam, mu, dim, deg))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    print(f"fused-vs-einsum rel err (real chip): {err:.3e}", flush=True)

    # speed: fused kernel
    def mk_fused(L):
        @jax.jit
        def f(s, GB2, volB, ue):
            def body(c, _):
                o = factored_contract(GB2, volB, c * 1e-20 + ue * s,
                                      lam, mu, dim, deg)
                return o, None
            return jax.lax.scan(body, ue * s, None, length=L)[0]
        return f

    t = per_iter(mk_fused, (GB2, volB, ue))
    print(f"fused kernel: {t*1e3:.2f} ms", flush=True)

    def mk_einsum(L):
        @jax.jit
        def f(s, GB, volB, ue):
            def body(c, _):
                return einsum_ref(GB, volB, c * 1e-20 + ue * s, lam, mu,
                                  T), None
            return jax.lax.scan(body, ue * s, None, length=L)[0]
        return f

    t = per_iter(mk_einsum, (GB, volB, ue))
    print(f"einsum form:  {t*1e3:.2f} ms", flush=True)

    KeB = jnp.asarray(rng.standard_normal((Eb, n, dim, n, dim, 128))
                      .astype(np.float32))

    def mk_dense(L):
        @jax.jit
        def f(s, KeB, ue):
            def body(c, _):
                return jnp.einsum("eACacl,ceal->CeAl", KeB,
                                  c * 1e-20 + ue * s), None
            return jax.lax.scan(body, ue * s, None, length=L)[0]
        return f

    t = per_iter(mk_dense, (KeB, ue))
    print(f"dense KeB:    {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
