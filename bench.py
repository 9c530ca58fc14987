"""meshfem_tpu headline benchmark (driver contract: ONE JSON line).

Measures on the available accelerator:
  1. P2 tetrahedral elasticity stiffness assembly throughput (elements/s)
     — fused-MXU element kernel (BASELINE target 5e7 elem/s on v5p);
  2. PCG iteration rate at ~1M-DOF P2 elasticity — matrix-free EBE SpMV
     with gather-pyramid scatter, Jacobi preconditioner, f32 (+ f64
     scalar reductions); single-RHS and block-8 amortized.

Headline metric: assembled P2 tet elements/s; vs_baseline against 5e7.
Extra metrics ride in the same JSON object.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import meshfem_tpu  # noqa: F401  (x64 + compile cache config)
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.ops import element_matrices as em
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.sparse.ebe import EBEKernel
    from meshfem_tpu.solvers import cg as cg_mod

    dt = jnp.float32
    timings = {}

    # ---- problem setup (host) -------------------------------------------
    n = int(os.environ.get("MESHFEM_BENCH_N", "35"))
    t0 = time.time()
    V, T = generators.grid_tet(n, n, n)
    mesh = FEMMesh(V, T, degree=2)
    timings["setup_host_s"] = round(time.time() - t0, 2)
    E = mesh.num_elements
    ndof = mesh.num_nodes * 3

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gl64, vol64 = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
    gl = jnp.asarray(np.asarray(gl64), dt)
    vol = jnp.asarray(np.asarray(vol64), dt)
    D = et.isotropic(3, 200.0, 0.3)

    # ---- assembly throughput --------------------------------------------
    asm = jax.jit(em.element_elasticity_fused, static_argnames=("deg",))

    t0 = time.time()
    Ke = em.element_elasticity_fused(gl, vol, D, 2)
    Ke.block_until_ready()
    timings["assembly_compile_s"] = round(time.time() - t0, 2)
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        Ke = em.element_elasticity_fused(gl, vol, D, 2)
    Ke.block_until_ready()
    t_asm = (time.time() - t0) / reps
    elems_per_s = E / t_asm

    # ---- PCG iteration rate ----------------------------------------------
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    diag = kern.diagonal()
    free = jnp.ones((mesh.num_nodes, 3), dt)
    rng = np.random.default_rng(0)
    b1 = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt)

    iters = 20
    t0 = time.time()
    res = cg_mod.cg_operator_fixed(kern, b1, diag, free, iters=iters)
    jax.block_until_ready(res.x)
    timings["cg_compile_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    res = cg_mod.cg_operator_fixed(kern, b1, diag, free, iters=iters)
    jax.block_until_ready(res.x)
    t_iter = (time.time() - t0) / iters
    pcg_iters_per_s = 1.0 / t_iter

    m = 8
    b8 = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3, m)), dt)
    free8 = jnp.ones((mesh.num_nodes, 3, m), dt)
    t0 = time.time()
    res8 = cg_mod.cg_operator_fixed(kern, b8, diag[..., None], free8,
                                    iters=iters)
    jax.block_until_ready(res8.x)
    timings["cg8_compile_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    res8 = cg_mod.cg_operator_fixed(kern, b8, diag[..., None], free8,
                                    iters=iters)
    jax.block_until_ready(res8.x)
    t8 = (time.time() - t0) / iters
    block_rhs_iters_per_s = m / t8

    # ---- structured conv fast path (same problem, grid-specialized) -------
    from meshfem_tpu.ops.structured import StructuredP2Elasticity

    op = StructuredP2Elasticity.build(mesh, D)
    bc = op.to_channels(b1)
    valid = op.valid_mask().astype(dt)
    freec = jnp.broadcast_to(valid, bc.shape)
    diagc = op.diagonal_channels().astype(dt)

    def cg_structured(op, bc, freec, diagc):
        # op enters as a pytree ARGUMENT: closure-constant conv kernels are
        # ~43x slower on this toolchain.
        project = lambda v: v * freec
        safe = jnp.where(diagc > 0, diagc, 1.0)
        return cg_mod.cg_fixed_iters(
            op.apply_channels, bc, M_inv=lambda r: r / safe,
            project=project, iters=iters).x

    f_s = jax.jit(cg_structured)
    t0 = time.time()
    rs = f_s(op, bc, freec, diagc)
    jax.block_until_ready(rs)
    timings["cg_structured_compile_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    rs = f_s(op, bc, freec, diagc)
    jax.block_until_ready(rs)
    t_s = (time.time() - t0) / iters
    pcg_structured_per_s = 1.0 / t_s

    device = str(jax.devices()[0])
    out = {
        "metric": "p2_tet_assembly_elements_per_s",
        "value": round(elems_per_s, 1),
        "unit": "elements/s",
        "vs_baseline": round(elems_per_s / 5e7, 4),
        "extra": {
            "device": device,
            "tets": E,
            "dofs": ndof,
            "dtype": "float32",
            "assembly_ms": round(t_asm * 1e3, 3),
            "pcg_iters_per_s_1rhs": round(pcg_iters_per_s, 1),
            "pcg_iters_per_s_block8": round(block_rhs_iters_per_s, 1),
            "pcg_iters_per_s_structured": round(pcg_structured_per_s, 1),
            "pcg_structured_ms_per_iter": round(t_s * 1e3, 3),
            "pcg_ms_per_iter": round(t_iter * 1e3, 3),
            "pcg_vs_baseline_1k": round(
                max(pcg_iters_per_s, pcg_structured_per_s) / 1e3, 4),
            "timings": timings,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
