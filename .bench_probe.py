import faulthandler; faulthandler.dump_traceback_later(240, exit=True)
import numpy as np, jax, jax.numpy as jnp, time
def log(*a): print(*a, flush=True)
from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.solvers import cg as cg_mod
import meshfem_tpu.ops.element_matrices as em
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.sparse.ebe import EBEKernel
from meshfem_tpu.sparse.scatter import ScatterPlan
from meshfem_tpu.mesh.geometry import simplex_geometry

t0=time.time()
V, T = generators.grid_tet(35, 35, 35)
mesh = FEMMesh(V, T, degree=2)
log("mesh", time.time()-t0)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    gl64, vol64 = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
dt = jnp.float32
gl = jnp.asarray(np.asarray(gl64), dt); vol = jnp.asarray(np.asarray(vol64), dt)
D = et.isotropic(3, 200.0, 0.3)
Mfused = em._FUSED_CACHE  # ensure concrete build path
t0=time.time()
f_asm = jax.jit(em.element_elasticity_fused, static_argnames=("deg",))
# NOTE: D passed concretely -> hash key; gl/vol args
Ke = em.element_elasticity_fused(gl, vol, D, 2); Ke.block_until_ready()
log("assemble eager first:", time.time()-t0)
t0=time.time(); Ke2 = em.element_elasticity_fused(gl, vol, D, 2); Ke2.block_until_ready()
ta = time.time()-t0
log(f"assembly steady (eager): {mesh.num_elements/ta/1e6:.1f}M elem/s ({ta*1e3:.1f} ms)")
t0=time.time(); kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3); log("plan", time.time()-t0)
b = jnp.asarray(np.random.rand(mesh.num_nodes, 3), dt)
free = jnp.ones((mesh.num_nodes, 3), dt)
diag = kern.diagonal()
t0=time.time()
res = cg_mod.cg_operator_fixed(kern, b, diag, free, iters=20)
jax.block_until_ready(res.x); log("cg compile+run:", time.time()-t0)
t0=time.time()
res = cg_mod.cg_operator_fixed(kern, b, diag, free, iters=20)
jax.block_until_ready(res.x)
t_iter = (time.time()-t0)/20
log(f"single-RHS: {t_iter*1e3:.2f} ms/iter -> {1/t_iter:.0f} iters/s @ {mesh.num_nodes*3} dofs")
b8 = jnp.asarray(np.random.rand(mesh.num_nodes, 3, 8), dt)
t0=time.time()
res8 = cg_mod.cg_operator_fixed(kern, b8, diag, free[..., None]*jnp.ones(8,dt), iters=20)
jax.block_until_ready(res8.x); log("cg8 compile+run:", time.time()-t0)
t0=time.time()
res8 = cg_mod.cg_operator_fixed(kern, b8, diag, free[..., None]*jnp.ones(8,dt), iters=20)
jax.block_until_ready(res8.x)
t8 = (time.time()-t0)/20
log(f"block-8: {t8*1e3:.2f} ms/iter -> {8/t8:.0f} RHS-iters/s")
