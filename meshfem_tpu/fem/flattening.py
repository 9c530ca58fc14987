"""Voigt flattening conventions (parity with reference ``Flattening.hh``).

The flattened index layout matches the reference exactly
(``Flattening.hh:21-59``):

* ``flat_len(d) = d (d + 1) / 2``
* 2D order: ``[xx, yy, xy]``
* 3D order: ``[xx, yy, zz, yz, xz, xy]``

The flattened rank-2 tensors store *raw* tensor components (NOT engineering
shear).  Double contraction with a rank-4 tensor stored as a
``flat_len x flat_len`` matrix D therefore inserts the "shear doubling"
diagonal matrix S = diag(1,..,1, 2,..,2):  ``stress = D @ S @ strain``
(``ElasticityTensor.hh:460-466``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def flat_len(dim: int) -> int:
    """Length of a flattened symmetric rank-2 tensor in `dim` dimensions."""
    return (dim * (dim + 1)) // 2


def flatten_indices(dim: int, i: int, j: int) -> int:
    """Map symmetric (i, j) -> flat index, reference ``Flattening.hh:24-59``."""
    if i == j:
        return i
    if i > j:
        i, j = j, i
    return (dim * (dim + 1) - j * (j - 1)) // 2 - (i + 1)


def unflatten_index(dim: int, f: int) -> tuple[int, int]:
    """Map flat index -> (i, j) with i <= j, reference ``Flattening.hh:62-83``."""
    if f < dim:
        return (f, f)
    if dim == 2:
        return (0, 1)
    if dim == 3:
        return {3: (1, 2), 4: (0, 2), 5: (0, 1)}[f]
    raise ValueError(f"unsupported dim {dim}")


@functools.lru_cache(maxsize=None)
def _tables(dim: int):
    fl = flat_len(dim)
    # (fl,) arrays: row/col tensor index of each flat slot.
    rows = np.empty(fl, dtype=np.int32)
    cols = np.empty(fl, dtype=np.int32)
    for f in range(fl):
        i, j = unflatten_index(dim, f)
        rows[f], cols[f] = i, j
    # (dim, dim) full -> flat map.
    full2flat = np.empty((dim, dim), dtype=np.int32)
    for i in range(dim):
        for j in range(dim):
            full2flat[i, j] = flatten_indices(dim, i, j)
    return rows, cols, full2flat


def flat_rows_cols(dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-flat-slot (i, j) tensor indices, i <= j."""
    r, c, _ = _tables(dim)
    return r, c


def full_to_flat_map(dim: int) -> np.ndarray:
    """(dim, dim) int array mapping full indices to flat slots."""
    return _tables(dim)[2]


def shear_doubler(dim: int) -> np.ndarray:
    """Diagonal of the shear-doubling matrix S: 1 on axial, 2 on shear slots."""
    r, c, _ = _tables(dim)
    return np.where(r == c, 1.0, 2.0)


def sqrt_shear_doubler(dim: int) -> np.ndarray:
    return np.sqrt(shear_doubler(dim))


# ---------------------------------------------------------------------------
# Batched symmetric-matrix <-> flat conversions (JAX).
# These replace ``SymmetricMatrix.hh`` value types: a "symmetric matrix field"
# is just an array whose last axis has length flat_len(dim).
# ---------------------------------------------------------------------------

def sym_to_flat(m, dim: int | None = None):
    """[..., d, d] symmetric -> [..., flat] in MeshFEM Voigt order (raw comps)."""
    if dim is None:
        dim = m.shape[-1]
    r, c, _ = _tables(dim)
    return m[..., r, c]


def flat_to_sym(v, dim: int | None = None):
    """[..., flat] -> [..., d, d] full symmetric matrix."""
    if dim is None:
        dim = {1: 1, 3: 2, 6: 3}[v.shape[-1]]
    _, _, f2f = _tables(dim)
    return v[..., f2f]


def flat_trace(v, dim: int | None = None):
    """Trace of a flattened symmetric matrix [..., flat] -> [...]."""
    if dim is None:
        dim = {1: 1, 3: 2, 6: 3}[v.shape[-1]]
    return jnp.sum(v[..., :dim], axis=-1)


def flat_frobenius_sq(v, dim: int | None = None):
    """Frobenius norm^2 of flattened symmetric matrices (shear counted twice)."""
    if dim is None:
        dim = {1: 1, 3: 2, 6: 3}[v.shape[-1]]
    s = jnp.asarray(shear_doubler(dim), dtype=v.dtype)
    return jnp.sum(s * v * v, axis=-1)


def flat_double_contract(a, b, dim: int | None = None):
    """a : b for flattened symmetric matrices = sum_ij a_ij b_ij."""
    if dim is None:
        dim = {1: 1, 3: 2, 6: 3}[a.shape[-1]]
    s = jnp.asarray(shear_doubler(dim), dtype=a.dtype)
    return jnp.sum(s * a * b, axis=-1)
