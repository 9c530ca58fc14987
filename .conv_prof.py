import numpy as np, jax, jax.numpy as jnp, time
def log(*a): print(*a, flush=True)
import meshfem_tpu
n = 36  # (n+1)^3 cells at bench scale
C = 24
u = jnp.asarray(np.random.rand(1, n, n, n, C), jnp.float32)
k = jnp.asarray(np.random.rand(3, 3, 3, C, C), jnp.float32)
f = jax.jit(lambda u, k: jax.lax.conv_general_dilated(
    u, k, window_strides=(1,1,1), padding="SAME",
    dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
t0=time.time(); r = f(u, k); r.block_until_ready(); log("conv3d compile+run:", round(time.time()-t0,1), "s")
t0=time.time()
for _ in range(50): r = f(u, k)
r.block_until_ready()
t = (time.time()-t0)/50
log(f"conv3d steady: {t*1e3:.3f} ms -> {1/t:.0f} applies/s  ({n**3*C/1e6:.2f}M dof)")
