import numpy as np, jax, jax.numpy as jnp, time, cProfile, pstats, io as _io
def log(*a): print(*a, flush=True)
from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.sparse.scatter import ScatterPlan

V, T = generators.grid_tet(35, 35, 35)
mesh = FEMMesh(V, T, degree=2)
log("mesh built;", mesh.num_elements, "elems")
pr = cProfile.Profile(); pr.enable()
t0 = time.time()
plan = ScatterPlan.build(mesh.elem_nodes.reshape(-1), mesh.num_nodes)
log("plan build:", time.time()-t0)
pr.disable()
s = _io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("cumtime").print_stats(8)
print(s.getvalue()[:1500], flush=True)
