import numpy as np, jax, jax.numpy as jnp, time
def log(*a): print(*a, flush=True)
import meshfem_tpu
from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.mesh.geometry import simplex_geometry
from meshfem_tpu.ops import element_matrices as em
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.sparse.scatter import ScatterPlan

V, T = generators.grid_tet(35, 35, 35)
mesh = FEMMesh(V, T, degree=2)
E, n, N = mesh.num_elements, 10, mesh.num_nodes
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    gl64, vol64 = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
dt = jnp.float32
gl = jnp.asarray(np.asarray(gl64), dt); vol = jnp.asarray(np.asarray(vol64), dt)
Ke = em.element_elasticity_fused(gl, vol, et.isotropic(3, 200.0, 0.3), 2); Ke.block_until_ready()
ed = jnp.asarray(mesh.elem_nodes)
m = 8
u8 = jnp.asarray(np.random.rand(N, 3, m), dt)
def bench(f, *args, reps=10):
    r = f(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(reps): r = f(*args)
    jax.block_until_ready(r); return (time.time()-t0)/reps
f_g = jax.jit(lambda u, ed: u[ed])
log(f"gather u8[ed]: {bench(f_g, u8, ed)*1e3:.2f} ms")
ue = f_g(u8, ed)  # [E, 10, 3, 8]
f_mv = jax.jit(lambda Ke, ue: jnp.einsum("eij,ejm->eim", Ke, ue.reshape(E, 30, m)))
log(f"batched matmul m=8: {bench(f_mv, Ke, ue)*1e3:.2f} ms")
fe = f_mv(Ke, ue)
plan = ScatterPlan.build(mesh.elem_nodes.reshape(-1), N)
f_sc = jax.jit(lambda fe, plan: plan(fe.reshape(E, n, 3, m).reshape(E*n, 3*m)))
log(f"pyramid m=8: {bench(f_sc, fe, plan)*1e3:.2f} ms")
