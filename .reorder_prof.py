import numpy as np, jax, jax.numpy as jnp, time
def log(*a): print(*a, flush=True)
import meshfem_tpu
from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.mesh.reorder import reorder_mesh
from meshfem_tpu.mesh.geometry import simplex_geometry
from meshfem_tpu.ops import element_matrices as em
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.sparse.scatter import ScatterPlan
from meshfem_tpu.sparse.ebe import EBEKernel
from meshfem_tpu.solvers import cg as cg_mod

V0, T0 = generators.grid_tet(35, 35, 35)
V, T, _, _ = reorder_mesh(V0, T0)
mesh = FEMMesh(V, T, degree=2)
E, n, N = mesh.num_elements, 10, mesh.num_nodes
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    gl64, vol64 = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
dt = jnp.float32
gl = jnp.asarray(np.asarray(gl64), dt); vol = jnp.asarray(np.asarray(vol64), dt)
Ke = em.element_elasticity_fused(gl, vol, et.isotropic(3, 200.0, 0.3), 2)
Ke.block_until_ready()
ed = jnp.asarray(mesh.elem_nodes)
u = jnp.asarray(np.random.rand(N, 3), dt)
def bench(f, *args, reps=20):
    r = f(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(reps): r = f(*args)
    jax.block_until_ready(r); return (time.time()-t0)/reps
f_gather = jax.jit(lambda u, ed: u[ed])
log(f"[morton] gather u[ed]: {bench(f_gather, u, ed)*1e3:.2f} ms (was 18.7)")
ue = f_gather(u, ed)
fe = jnp.einsum("eij,ej->ei", Ke, ue.reshape(E, 30))
plan = ScatterPlan.build(mesh.elem_nodes.reshape(-1), N)
f_sc = jax.jit(lambda fe, plan: plan(fe.reshape(E*n, 3)))
log(f"[morton] pyramid scatter: {bench(f_sc, fe, plan)*1e3:.2f} ms (was 37.3)")
kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
diag = kern.diagonal()
free = jnp.ones((N, 3), dt)
b = jnp.asarray(np.random.rand(N, 3), dt)
res = cg_mod.cg_operator_fixed(kern, b, diag, free, iters=20); jax.block_until_ready(res.x)
t0=time.time(); res = cg_mod.cg_operator_fixed(kern, b, diag, free, iters=20); jax.block_until_ready(res.x)
ti=(time.time()-t0)/20
log(f"[morton] CG: {ti*1e3:.2f} ms/iter -> {1/ti:.0f} iters/s (was 13)")
