import numpy as np, jax, jax.numpy as jnp, time
def log(*a): print(*a, flush=True)
import meshfem_tpu
from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import Material
from meshfem_tpu.ops.structured import StructuredP2Elasticity
from meshfem_tpu.solvers import cg as cg_mod

n = 35
V, T = generators.grid_tet(n, n, n)
mesh = FEMMesh(V, T, degree=2)
log("mesh:", mesh.num_nodes*3, "dofs")
mat = Material.isotropic(3, 200.0, 0.3)
t0=time.time()
op = StructuredP2Elasticity.build(mesh, mat.D)
log("build:", round(time.time()-t0,1), "s; fake cubes:", op.fake_slots.shape)
dt = jnp.float32
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt)

def bench(f, *args, reps=20):
    r = f(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(reps): r = f(*args)
    jax.block_until_ready(r); return (time.time()-t0)/reps

bc = op.to_channels(b)
f_apply = jax.jit(op.apply_channels)
log(f"apply_channels: {bench(f_apply, bc)*1e3:.3f} ms")

# full CG fixed iterations in channel space, jitted as pytree op? op is a
# dataclass (not pytree) -> closure constants!! measure anyway via jit of
# a wrapper taking arrays:
valid = op.valid_mask().astype(dt)
diag = op.diagonal_channels().astype(dt)
freec = jnp.broadcast_to(valid, bc.shape)
import functools
def cg20(bc, freec, diag):
    project = lambda v: v * freec
    safe = jnp.where(diag > 0, diag, 1.0)
    return cg_mod.cg_fixed_iters(op.apply_channels, bc, M_inv=lambda r: r/safe, project=project, iters=20).x
f_cg = jax.jit(cg20)
t0=time.time(); r = f_cg(bc, freec, diag); jax.block_until_ready(r); log("cg compile:", round(time.time()-t0,1))
t0=time.time(); r = f_cg(bc, freec, diag); jax.block_until_ready(r)
ti = (time.time()-t0)/20
log(f"structured CG: {ti*1e3:.3f} ms/iter -> {1/ti:.0f} iters/s @ {mesh.num_nodes*3} dofs")
