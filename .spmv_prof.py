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
log(f"gather u[ed]: {bench(f_gather, u, ed)*1e3:.2f} ms  ({E*n} rows)")
ue = f_gather(u, ed)
f_mv = jax.jit(lambda Ke, ue: jnp.einsum("eij,ej->ei", Ke, ue.reshape(E, 30)))
log(f"batched matvec: {bench(f_mv, Ke, ue)*1e3:.2f} ms  (Ke {Ke.nbytes/1e6:.0f} MB)")
fe = f_mv(Ke, ue)
plan = ScatterPlan.build(mesh.elem_nodes.reshape(-1), N)
f_sc = jax.jit(lambda fe, plan: plan(fe.reshape(E*n, 3)), static_argnames=())
log(f"pyramid scatter: {bench(f_sc, fe, plan)*1e3:.2f} ms")
# segment_sum comparison
ids = jnp.asarray(mesh.elem_nodes.reshape(-1))
f_ss = jax.jit(lambda fe: jax.ops.segment_sum(fe.reshape(E*n,3), ids, num_segments=N))
log(f"segment_sum scatter: {bench(f_ss, fe)*1e3:.2f} ms")
