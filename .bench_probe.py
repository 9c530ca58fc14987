import numpy as np, jax, jax.numpy as jnp, time
def log(*a): print(*a, flush=True)
from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.solvers import cg as cg_mod
import meshfem_tpu.ops.element_matrices as em
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.sparse.ebe import EBEKernel
from meshfem_tpu.mesh.geometry import simplex_geometry

t0=time.time()
V, T = generators.grid_tet(35, 35, 35); log("gen", time.time()-t0)
t0=time.time(); mesh = FEMMesh(V, T, degree=2); log("mesh", time.time()-t0)
cpu = jax.devices("cpu")[0]
t0=time.time()
with jax.default_device(cpu):
    gl64, vol64 = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
log("geom cpu", time.time()-t0)
dt = jnp.float32
gl = jnp.asarray(np.asarray(gl64), dt); vol = jnp.asarray(np.asarray(vol64), dt)
D = et.isotropic(3, 200.0, 0.3)
t0=time.time()
f_asm = jax.jit(lambda gl, vol: em.element_elasticity_fused(gl, vol, D, 2))
Ke = f_asm(gl, vol); Ke.block_until_ready(); log("assemble compile+run:", time.time()-t0)
t0=time.time(); Ke = f_asm(gl, vol); Ke.block_until_ready()
ta = time.time()-t0
log(f"assembly steady: {mesh.num_elements/ta/1e6:.1f}M elem/s ({ta*1e3:.1f} ms)")
t0=time.time(); kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3); log("plan", time.time()-t0)
b = jnp.asarray(np.random.rand(mesh.num_nodes, 3), dt)
f = jax.jit(lambda b: cg_mod.cg_fixed_iters(kern, b, iters=20).x)
t0=time.time(); r = f(b); r.block_until_ready(); log("cg compile:", time.time()-t0)
t0=time.time(); r = f(b); r.block_until_ready()
t_iter = (time.time()-t0)/20
log(f"single-RHS: {t_iter*1e3:.2f} ms/iter -> {1/t_iter:.0f} iters/s @ {mesh.num_nodes*3} dofs")
b8 = jnp.asarray(np.random.rand(mesh.num_nodes, 3, 8), dt)
t0=time.time(); r8 = f(b8); r8.block_until_ready(); log("cg8 compile:", time.time()-t0)
t0=time.time(); r8 = f(b8); r8.block_until_ready()
t8 = (time.time()-t0)/20
log(f"block-8: {t8*1e3:.2f} ms/iter -> {8/t8:.0f} RHS-iters/s")
