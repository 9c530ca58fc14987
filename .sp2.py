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
op = StructuredP2Elasticity.build(mesh, Material.isotropic(3, 200.0, 0.3).D)
dt = jnp.float32
rng = np.random.default_rng(0)
bc = op.to_channels(jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt))
def bench(f, *args, reps=30):
    r = f(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(reps): r = f(*args)
    jax.block_until_ready(r); return (time.time()-t0)/reps
m = op.n + 1
kern = op.kernel.astype(dt)
f_conv = jax.jit(lambda uc: jax.lax.conv_general_dilated(
    uc.reshape(m, m, m, 24)[None], kern, window_strides=(1,1,1),
    padding="SAME", dimension_numbers=("NDHWC","DHWIO","NDHWC"))[0].reshape(-1,3))
log(f"conv alone: {bench(f_conv, bc)*1e3:.3f} ms")
f_apply = jax.jit(op.apply_channels)
log(f"apply_channels: {bench(f_apply, bc)*1e3:.3f} ms")
# pure-conv CG (no correction) to isolate loop overheads
valid = op.valid_mask().astype(dt)
freec = jnp.broadcast_to(valid, bc.shape)
diag = op.diagonal_channels().astype(dt)
def cgA(bc, freec, diag):
    safe = jnp.where(diag > 0, diag, 1.0)
    return cg_mod.cg_fixed_iters(f_conv, bc, M_inv=lambda r: r/safe,
                                 project=lambda v: v*freec, iters=20).x
fA = jax.jit(cgA)
t = bench(fA, bc, freec, diag, reps=3)/20*3  # careful: bench reps semantics
r = fA(bc, freec, diag); jax.block_until_ready(r)
t0=time.time()
for _ in range(3): r = fA(bc, freec, diag)
jax.block_until_ready(r)
log(f"pure-conv CG: {(time.time()-t0)/3/20*1e3:.3f} ms/iter")
