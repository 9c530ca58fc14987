"""Structured-grid P2 elasticity with PER-ELEMENT materials.

The uniform-material structured path (``ops/structured.py``) exploits
translation invariance — one conv kernel.  Per-element material fields
(topology optimization, microstructure design: the Elastic Textures
workload) break that, but the GRID structure still pays: every cell has
identical geometry, so the element stiffness factors as
``Ke = vol * sum_q w_q B_q^T (S D S) B_q`` with ONE fixed strain matrix
``B`` shared by all cells and only the [fl, fl] material varying.  The
apply is then three batched einsums per cell block (strain, stress,
force) between two gather/scatter-free corner-slice transforms — no
per-cell [81, 81] matrices are ever materialized (1.2 GB at bench size),
and the FLOPs ride the MXU.

The multigrid hierarchy survives variable D: P1-in-P2 nesting and Kuhn
2:1 self-similarity are material-independent, so exact Galerkin coarse
operators are per-cell [24, 24] P1 matrices (computed per-tet on the
fine grid, reduced by fixed interpolation matrices between levels) —
see ``build_var_mg``.

Cited reference roles: per-element material fields
(``MaterialField.hh``), CHOLMOD factorize-once (``SparseMatrices.hh``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..mesh import generators
from ..fem.flattening import flat_len, shear_doubler
from . import element_matrices as em
from .structured import _CHANNEL_BITS, validate_kuhn_grid


def check_grid_element_order(mesh, n3, h3):
    """Raise unless elements are in grid_tet order — cell-major C-order
    with each cell's 6 tets in the reference pattern slots.  The
    per-element material pairing (D_elems.reshape(ncells, 6, ...)) and
    the fixed strain matrix both depend on it; a reordered Kuhn mesh
    must fail loudly, not silently mis-assemble."""
    bb = mesh.bbox()
    Vv = np.asarray(mesh.V)
    q = np.round((Vv - np.asarray(bb.min)) / np.asarray(h3)).astype(
        np.int64)
    tq = q[np.asarray(mesh.F)]                        # [E, 4, 3]
    cmin = tq.min(axis=1)
    cidx = (cmin[:, 0] * n3[1] + cmin[:, 1]) * n3[2] + cmin[:, 2]
    E = len(tq)
    if not np.array_equal(cidx, np.repeat(np.arange(E // 6), 6)):
        raise ValueError("elements are not in grid_tet order (cell-major "
                         "C-order); the variable-material structured path "
                         "requires the generator ordering")
    bits = tq - cmin[:, None, :]
    keys = np.sort(bits[:, :, 0] * 4 + bits[:, :, 1] * 2 + bits[:, :, 2],
                   axis=1)                            # [E, 4]
    Vr, Tr = generators.grid_tet(1, 1, 1)
    qr = np.round(Vr).astype(np.int64)[Tr]            # [6, 4, 3]
    ref = np.sort(qr[:, :, 0] * 4 + qr[:, :, 1] * 2 + qr[:, :, 2], axis=1)
    if not np.array_equal(keys.reshape(E // 6, 6, 4),
                          np.broadcast_to(ref, (E // 6, 6, 4))):
        raise ValueError("cell-local tet slots do not match the grid_tet "
                         "reference pattern order")


def _cube_reference(h3):
    """One Kuhn cell, P2: (slots [(offset, channel)] per cube node,
    tet_nodes [6, 10] cube-local node ids, B [6, Q, fl, 10, 3] strain
    matrices at quad points, wv [6, Q] weight*volume)."""
    from ..fem import quadrature

    V, T = generators.grid_tet(1, 1, 1, hi=tuple(h3))
    mesh = FEMMesh(V, T, degree=2)
    assert mesh.num_nodes == 27
    g = mesh.geometry()
    q = np.round(np.asarray(mesh.node_positions)
                 / (np.asarray(h3) / 2)).astype(int)
    slots = []
    for i in range(27):
        owner = tuple(q[i] // 2)
        ch = _CHANNEL_BITS.index(tuple(q[i] % 2))
        slots.append((owner, ch))
    pts, w = quadrature.rule_np(3, 2)
    B = np.asarray(em.element_strain_matrix(g.grad_lambda, 2, pts))
    wv = np.asarray(w)[None, :] * np.asarray(g.volume)[:, None]
    return slots, np.asarray(mesh.elem_nodes), B, wv


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StructuredVarP2Elasticity:
    """P2 elasticity on a Kuhn grid with per-TET materials.

    Vectors live in channel space [mx, my, mz, 8, 3] (see
    ``ops/structured.py`` for the slot layout); ``to_channels`` /
    ``from_channels`` convert nodal [N, 3] fields."""

    n3: tuple
    SDS: jnp.ndarray      # [ncells, 6, fl, fl] S D S per (cell, tet)
    B: jnp.ndarray        # [6, Q, fl, 10, 3]
    Bc: jnp.ndarray       # [6*Q*fl, 81] corner values -> per-tet strains
    wv: jnp.ndarray       # [6, Q] quad weight * tet volume
    tet_slot: jnp.ndarray  # [6, 10, 27] one-hot: cube node of (tet, a)
    node_slot: jnp.ndarray  # [N] nodal -> flat channel index
    num_nodes: int

    @classmethod
    def build(cls, mesh: FEMMesh, D_elems, dtype=None
              ) -> "StructuredVarP2Elasticity":
        """D_elems: [E, fl, fl] per-element material matrices in the
        grid_tet element order (6 tets per cell, cells C-order)."""
        n3, h3 = validate_kuhn_grid(mesh)
        check_grid_element_order(mesh, n3, h3)
        dt = dtype or jnp.float64
        fl = flat_len(3)
        slots, tet_nodes, B, wv = _cube_reference(h3)

        E = mesh.num_elements
        ncells = E // 6
        S = np.asarray(shear_doubler(3), np.float64)
        D = np.asarray(D_elems, np.float64).reshape(ncells, 6, fl, fl)
        SDS = S[None, None, :, None] * D * S[None, None, None, :]

        hot = np.zeros((6, 10, 27))
        for t in range(6):
            for a in range(10):
                hot[t, a, tet_nodes[t, a]] = 1.0
        # fold the tet-node selection into the strain matrix: one
        # [144, 81] operator from cube corner values to ALL per-tet
        # quad-point strains — the apply's heavy lifting becomes two MXU
        # matmuls ([ncells, 81] @ Bc^T and back) instead of small-lane
        # einsums
        Q = B.shape[1]
        Bc = np.einsum("tqanc,tnk->tqakc", B, hot).reshape(
            6 * Q * fl, 27 * 3)

        # nodal <-> channel-space mapping (same layout as structured.py)
        bb = mesh.bbox()
        mx, my, mz = n3[0] + 1, n3[1] + 1, n3[2] + 1
        qn = np.round(np.asarray(mesh.node_positions - bb.min)
                      / (np.asarray(h3) / 2)).astype(np.int64)
        owner = qn // 2
        bits = qn % 2
        ch = np.asarray([_CHANNEL_BITS.index(tuple(b)) for b in bits],
                        dtype=np.int64)
        cell_flat = (owner[:, 0] * my + owner[:, 1]) * mz + owner[:, 2]
        node_slot = cell_flat * 8 + ch

        obj = cls(n3, jnp.asarray(SDS, dt), jnp.asarray(B, dt),
                  jnp.asarray(Bc, dt), jnp.asarray(wv, dt),
                  jnp.asarray(hot, dt), jnp.asarray(node_slot),
                  mesh.num_nodes)
        obj._slots = slots
        return obj

    # -- channel-space transforms ----------------------------------------
    def to_channels(self, u):
        mx, my, mz = (self.n3[0] + 1, self.n3[1] + 1, self.n3[2] + 1)
        z = jnp.zeros((mx * my * mz * 8, u.shape[-1]), dtype=u.dtype)
        return z.at[self.node_slot].set(u).reshape(mx, my, mz, 8,
                                                   u.shape[-1])

    def from_channels(self, ch):
        return ch.reshape(-1, ch.shape[-1])[self.node_slot]

    def _gather_cells(self, ch):
        """[mx, my, mz, 8, 3] -> [nx, ny, nz, 27, 3] cube corner values
        (27 shifted slices — no gather instructions)."""
        nx, ny, nz = self.n3
        cols = [ch[o[0]:o[0] + nx, o[1]:o[1] + ny, o[2]:o[2] + nz, c]
                for o, c in self._slots]
        return jnp.stack(cols, axis=3)

    def _scatter_cells(self, f27, dtype, m):
        """Adjoint of :meth:`_gather_cells`."""
        nx, ny, nz = self.n3
        out = jnp.zeros((nx + 1, ny + 1, nz + 1, 8, m), dtype)
        for k, (o, c) in enumerate(self._slots):
            out = out.at[o[0]:o[0] + nx, o[1]:o[1] + ny,
                         o[2]:o[2] + nz, c].add(f27[..., k, :])
        return out

    def apply_channels(self, ch):
        """A u in channel space: corner-slice gather -> [ncells, 81] @
        Bc^T (MXU) -> per-cell [fl, fl] stress products -> @ Bc (MXU) ->
        adjoint scatter."""
        nx, ny, nz = self.n3
        nc = nx * ny * nz
        fl = self.SDS.shape[-1]
        Q = self.B.shape[1]
        dt = ch.dtype
        u27 = self._gather_cells(ch).reshape(nc, 81)      # [nc, 81]
        strain = (u27 @ self.Bc.astype(dt).T).reshape(nc, 6, Q, fl)
        stress = jnp.einsum("xtab,xtqb->xtqa", self.SDS.astype(dt),
                            strain) \
            * self.wv.astype(dt)[None, :, :, None]
        f27 = (stress.reshape(nc, 6 * Q * fl)
               @ self.Bc.astype(dt)).reshape(nx, ny, nz, 27, 3)
        return self._scatter_cells(f27, dt, 3)

    def __call__(self, u):
        """A u for nodal u [N, 3]."""
        return self.from_channels(self.apply_channels(self.to_channels(u)))

    def diagonal_channels(self):
        """Assembled diagonal in channel space [mx, my, mz, 8, 3]."""
        # diag of Ke per (cell, tet): d[t, n, c] = sum_q wv B^T SDS B diag
        dt = self.SDS.dtype
        nx, ny, nz = self.n3
        d_tet = jnp.einsum("tqanc,xyztab,tqbnc->xyztnc",
                           self.B, self.SDS.reshape(
                               nx, ny, nz, 6, self.SDS.shape[-2],
                               self.SDS.shape[-1]),
                           self.B * self.wv[:, :, None, None, None])
        d27 = jnp.einsum("tak,xyztac->xyzkc", self.tet_slot.astype(dt),
                         d_tet)
        return self._scatter_cells(d27, dt, 3)

    def valid_mask_channels(self):
        mx, my, mz = (self.n3[0] + 1, self.n3[1] + 1, self.n3[2] + 1)
        v = jnp.zeros((mx * my * mz * 8,), self.SDS.dtype)
        v = v.at[self.node_slot].set(1.0)
        return v.reshape(mx, my, mz, 8)[..., None]

    # -- pytree -----------------------------------------------------------
    def tree_flatten(self):
        return ((self.SDS, self.B, self.Bc, self.wv, self.tet_slot,
                 self.node_slot),
                (self.n3, self.num_nodes, tuple(self._slots)))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = cls(aux[0], *ch, aux[1])
        obj._slots = list(aux[2])
        return obj
