"""Assembly of per-element matrices into global operators.

TPU-native replacement for the reference's ``TripletMatrix`` + ``sumRepeated``
COO pipeline (``SparseMatrices.hh:45-775``): we never materialize triplets on
device.  Two execution strategies:

* **EBE (element-by-element, matrix-free)**: keep Ke [E, n, n] and apply
  A u = scatter(Ke @ gather(u)).  Assembly cost is zero beyond computing Ke;
  SpMV is one batched einsum + one deterministic ``segment_sum`` — the
  TPU analog of the reference's TBB-parallel assembly + CHOLMOD solve
  (``LinearElasticity.hh:1408-1466``).
* **CSR export (host)**: scipy matrix for verification / direct solves.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def ebe_apply(Ke, elem_nodes, u, num_nodes: int):
    """Matrix-free A @ u for scalar-valued DOFs.

    Ke: [E, n, n], elem_nodes: [E, n] int, u: [N] or [N, m]."""
    ue = u[elem_nodes]                                   # [E, n] or [E, n, m]
    if ue.ndim == 2:
        fe = jnp.einsum("eij,ej->ei", Ke, ue)
    else:
        fe = jnp.einsum("eij,ejm->eim", Ke, ue)
    flat = fe.reshape((-1,) + fe.shape[2:])
    return jax.ops.segment_sum(flat, elem_nodes.reshape(-1),
                               num_segments=num_nodes)


def ebe_apply_vector(Ke, elem_nodes, u, num_nodes: int):
    """Matrix-free A @ u for vector-valued DOFs.

    Ke: [E, n*d, n*d] (dof = local_node * d + component),
    u: [N, d] nodal vector field.  Returns [N, d]."""
    E, nd, _ = Ke.shape
    n = elem_nodes.shape[1]
    d = nd // n
    ue = u[elem_nodes].reshape(E, nd)                    # [E, n*d]
    fe = jnp.einsum("eij,ej->ei", Ke, ue).reshape(E * n, d)
    return jax.ops.segment_sum(fe, elem_nodes.reshape(-1),
                               num_segments=num_nodes)


def ebe_diagonal(Ke, elem_nodes, num_nodes: int, d: int = 1):
    """Diagonal of the assembled operator (Jacobi preconditioner)."""
    E = Ke.shape[0]
    n = elem_nodes.shape[1]
    if d == 1:
        de = jnp.diagonal(Ke, axis1=1, axis2=2)          # [E, n]
        return jax.ops.segment_sum(de.reshape(-1), elem_nodes.reshape(-1),
                                   num_segments=num_nodes)
    de = jnp.diagonal(Ke, axis1=1, axis2=2).reshape(E, n, d)
    return jax.ops.segment_sum(de.reshape(E * n, d), elem_nodes.reshape(-1),
                               num_segments=num_nodes)


def scatter_load(fe, elem_nodes, num_nodes: int):
    """Accumulate per-element nodal loads fe [E, n] or [E, n, d] into [N(,d)]."""
    flat = fe.reshape((-1,) + fe.shape[2:])
    return jax.ops.segment_sum(flat, jnp.asarray(elem_nodes).reshape(-1),
                               num_segments=num_nodes)


# ---------------------------------------------------------------------------
# Host-side CSR export for verification and direct solves.
# ---------------------------------------------------------------------------

def assemble_scipy(Ke, elem_nodes, num_nodes: int, d: int = 1):
    """Assemble a scipy CSR matrix from element matrices (host, f64).

    For d > 1 the global DOF layout is node-major: dof = node * d + comp."""
    import scipy.sparse as sp

    Ke = np.asarray(Ke)
    elem_nodes = np.asarray(elem_nodes)
    E, n = elem_nodes.shape
    nd = n * d
    dofs = (elem_nodes[:, :, None] * d
            + np.arange(d)[None, None, :]).reshape(E, nd)
    rows = np.repeat(dofs, nd, axis=1).ravel()
    cols = np.tile(dofs, (1, nd)).ravel()
    A = sp.coo_matrix((Ke.ravel(), (rows, cols)),
                      shape=(num_nodes * d, num_nodes * d))
    return A.tocsr()
