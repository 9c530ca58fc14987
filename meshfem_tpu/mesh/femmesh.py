"""FEMMesh: degree-1/2 Lagrange node management over simplicial meshes.

TPU-native redesign of reference ``FEMMesh.hh:90`` / ``FEMMesh.inl:11-83``:
instead of half-edge traversal + ``std::map`` edge-node numbering, all
connectivity is flattened on the host (numpy, lexsort-unique edge hashing)
into static index arrays; element geometry (barycentric gradients, volumes,
boundary normals) is computed by one batched, differentiable JAX function
(replacing ``Embedder<K>::embed``, ``FEMMesh.hh:45-66``).  Device code only
ever sees gathers/scatters over these arrays.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import simplex, shape_functions
from . import geometry as geom
from .simplicial import TriMesh, TetMesh, TRI_FACE_CORNERS, TET_FACE_CORNERS


@dataclasses.dataclass(frozen=True)
class ElementGeometry:
    """Batched per-element embedding data (device arrays)."""

    grad_lambda: jnp.ndarray   # [E, K+1, dim] spatial gradients of barycentric
    volume: jnp.ndarray        # [E] signed volumes
    bdry_normal: jnp.ndarray   # [B, dim] outward unit normals
    bdry_volume: jnp.ndarray   # [B] boundary element measures


class FEMMesh:
    """P1/P2 FEM mesh over a K-simplicial complex embedded in R^dim.

    Host-side numpy connectivity:
      * ``elem_nodes  [E, n]``  element -> global node (vertices then
        edge nodes, GMSH local ordering per ``Simplex.hh:31-46``)
      * ``node_positions [N, dim]``
      * ``bdry_elems  [B, K]``  boundary (K-1)-simplices, outward wound
      * ``bdry_elem_nodes [B, nb]`` -> volume node indices
      * ``bdry_nodes  [NB]``    unique volume node indices on the boundary
      * ``bdry_elem_vol_elem [B]`` element adjacent to each boundary element

    Device-side geometry from :meth:`geometry` (jitted, differentiable in the
    node positions — this is what replaces all of the reference's hand-coded
    shape-derivative ``delta*`` machinery).
    """

    def __init__(self, V, F, degree: int = 1, embedding_dim: int | None = None,
                 node_order: str = "reference"):
        F = np.ascontiguousarray(F, dtype=np.int64)
        V = np.atleast_2d(np.ascontiguousarray(V, dtype=np.float64))
        K = F.shape[1] - 1
        if K not in (2, 3):
            raise ValueError("FEMMesh supports triangles (K=2) and tets (K=3)")
        if degree not in (1, 2):
            raise ValueError("degree must be 1 or 2 (like the reference)")
        if embedding_dim is not None:
            if V.shape[1] < embedding_dim:
                V = np.pad(V, [(0, 0), (0, embedding_dim - V.shape[1])])
            else:
                V = V[:, :embedding_dim]
        self.K = K
        self.degree = degree
        self.dim = V.shape[1]
        self.V = V
        self.F = F

        self.cell = TriMesh.build(V, F) if K == 2 else TetMesh.build(V, F)

        # --- volume node numbering -----------------------------------
        nv = len(V)
        if degree == 1:
            self.num_edges = 0
            self._edge_keys = np.empty(0, dtype=np.int64)
            elem_nodes = F.copy()
            node_pos = V.copy()
        else:
            pairs = np.asarray(simplex.simplex_edges(K))  # [ne_loc, 2]
            ev = np.stack([F[:, pairs[:, 0]], F[:, pairs[:, 1]]], axis=-1)
            ev = ev.reshape(-1, 2)                        # [E*ne_loc, 2]
            key = np.min(ev, axis=1) * nv + np.max(ev, axis=1)
            from ..native import unique_edges as native_unique

            nat = native_unique(ev)
            if nat is not None:
                inverse, uniq_pairs = nat
                uniq = uniq_pairs[:, 0] * nv + uniq_pairs[:, 1]
            else:
                uniq, inverse = np.unique(key, return_inverse=True)
            self.num_edges = len(uniq)
            self._edge_keys = uniq
            edge_node = nv + inverse.reshape(len(F), -1)
            elem_nodes = np.concatenate([F, edge_node], axis=1)
            mids = 0.5 * (V[uniq // nv] + V[uniq % nv])
            node_pos = np.concatenate([V, mids], axis=0)
        self.elem_nodes = elem_nodes.astype(np.int64)
        self.node_positions = node_pos
        self.num_nodes = len(node_pos)
        self.nodes_per_elem = simplex.num_nodes(K, degree)

        # --- boundary -------------------------------------------------
        if K == 2:
            bdry = self.cell.boundary_edges()
        else:
            bdry = self.cell.boundary_faces()
        self.bdry_elems = bdry.astype(np.int64)            # [B, K] vertices
        if K == 2:
            adj = self.cell.bdry_halfedge // 3
        else:
            adj = self.cell.bdry_halfface // 4
        self.bdry_elem_vol_elem = adj.astype(np.int64)
        self.bdry_elem_nodes = self._boundary_nodes_of(bdry)
        self.bdry_nodes = np.unique(self.bdry_elem_nodes)
        mask = np.zeros(self.num_nodes, dtype=bool)
        mask[self.bdry_nodes] = True
        self.is_bdry_node = mask

        # --- node numbering -------------------------------------------
        # "reference": vertices first, then edge nodes in sorted-edge order
        # (the reference's FEMMesh.inl:11-83 convention).  "morton":
        # renumber ALL nodes along a Z-order curve of their positions —
        # required by the lane-routing SpMV (sparse/route.py), whose chain
        # depth tracks the windowed spread of each element's node ids (the
        # reference convention scatters a P2 element's edge nodes across
        # the whole edge range).  self.vertex_nodes maps vertex i -> node
        # id under the active numbering.
        if node_order in ("morton", "rcb", "firsttouch"):
            from .reorder import _morton_codes, rcb_order

            if node_order == "rcb":
                old_of_new = rcb_order(node_pos)
            elif node_order == "firsttouch":
                # number nodes by first occurrence in element order: an
                # element block's nodes are then its own id range plus the
                # ranges of a few earlier neighbour blocks — the minimal-
                # spread numbering for the routed SpMV (elements should be
                # spatially sorted first, e.g. reorder_mesh(order="rcb"))
                flat = self.elem_nodes.reshape(-1)
                uniq, first_pos = np.unique(flat, return_index=True)
                old_of_new = uniq[np.argsort(first_pos, kind="stable")]
                if len(old_of_new) < self.num_nodes:  # unused nodes last
                    rest = np.setdiff1d(np.arange(self.num_nodes),
                                        old_of_new)
                    old_of_new = np.concatenate([old_of_new, rest])
            else:
                old_of_new = np.argsort(_morton_codes(node_pos),
                                        kind="stable")
            new_of_old = np.empty(self.num_nodes, dtype=np.int64)
            new_of_old[old_of_new] = np.arange(self.num_nodes)
            self.elem_nodes = new_of_old[self.elem_nodes]
            self.node_positions = node_pos[old_of_new]
            self.bdry_elem_nodes = new_of_old[self.bdry_elem_nodes]
            self.bdry_nodes = np.sort(new_of_old[self.bdry_nodes])
            self.is_bdry_node = self.is_bdry_node[old_of_new]
            self.vertex_nodes = new_of_old[:nv]
            self.node_perm = new_of_old          # old node id -> new
        elif node_order == "reference":
            self.vertex_nodes = np.arange(nv, dtype=np.int64)
            self.node_perm = np.arange(self.num_nodes, dtype=np.int64)
        else:
            raise ValueError(f"unknown node_order {node_order!r}")
        self.node_order = node_order

        self._geom_cache: ElementGeometry | None = None

    # ------------------------------------------------------------------
    def _boundary_nodes_of(self, belems: np.ndarray) -> np.ndarray:
        """Boundary (K-1)-simplex -> volume node indices (vertices + edge
        nodes for P2), GMSH local ordering on the boundary element."""
        if self.degree == 1:
            return belems.copy()
        nv = len(self.V)
        pairs = np.asarray(simplex.simplex_edges(self.K - 1))
        ev = np.stack([belems[:, pairs[:, 0]], belems[:, pairs[:, 1]]], axis=-1)
        key = np.min(ev, axis=-1) * nv + np.max(ev, axis=-1)
        pos = np.searchsorted(self._edge_keys, key)
        if not np.all(self._edge_keys[np.clip(pos, 0, self.num_edges - 1)] == key):
            raise RuntimeError("boundary edge missing from volume edge table")
        return np.concatenate([belems, nv + pos], axis=1)

    # ------------------------------------------------------------------
    @property
    def num_elements(self) -> int:
        return len(self.F)

    @property
    def num_boundary_elements(self) -> int:
        return len(self.bdry_elems)

    @property
    def num_vertices(self) -> int:
        return len(self.V)

    def bbox(self) -> geom.BBox:
        return geom.BBox.of(self.V)

    def barycenters(self) -> np.ndarray:
        return self.V[self.F].mean(axis=1)

    def boundary_barycenters(self) -> np.ndarray:
        return self.V[self.bdry_elems].mean(axis=1)

    # ------------------------------------------------------------------
    def geometry(self, node_positions=None) -> ElementGeometry:
        """Differentiable embedding of all elements (+ boundary elements).

        ``node_positions`` (device array [N, dim]) defaults to the stored
        positions; passing perturbed positions re-embeds, replacing
        ``FEMMesh::setNodePositions`` (``FEMMesh.hh:222-237``)."""
        if node_positions is None:
            if self._geom_cache is None:
                X = jnp.asarray(self.node_positions)
                self._geom_cache = self._embed(X)
            return self._geom_cache
        return self._embed(jnp.asarray(node_positions))

    def _embed(self, X) -> ElementGeometry:
        # X is indexed by NODE id; element/boundary corner tables hold
        # vertex ids, so map them through vertex_nodes (identity for the
        # reference ordering, a permutation for morton/rcb/firsttouch).
        corners = X[self.vertex_nodes[self.F]]       # vertices only
        grad_lambda, volume = geom.simplex_geometry(corners, self.K)
        bcorners = X[self.vertex_nodes[self.bdry_elems]]
        normal, bvol = geom.boundary_normals(bcorners)
        return ElementGeometry(grad_lambda, volume, normal, bvol)

    # ------------------------------------------------------------------
    def node_endpoint_vertices(self) -> np.ndarray:
        """[N, 2] vertex ids (va, vb) whose midpoint is node i (va == vb
        for vertex nodes) — the static map behind differentiable
        re-embedding from vertex positions."""
        nv = len(self.V)
        ends_old = np.empty((self.num_nodes, 2), dtype=np.int64)
        ends_old[:nv] = np.arange(nv)[:, None]
        if self.num_nodes > nv:
            ends_old[nv:, 0] = self._edge_keys // nv
            ends_old[nv:, 1] = self._edge_keys % nv
        ends = np.empty_like(ends_old)
        ends[self.node_perm] = ends_old
        return ends

    def node_positions_from_vertices(self, Xv):
        """Differentiable node positions [N, dim] from vertex positions
        ``Xv`` [Nv, dim]: vertex nodes at Xv, P2 edge nodes at edge
        midpoints (``FEMMesh::setNodePositions`` re-embedding,
        ``FEMMesh.hh:222-237``)."""
        ends = jnp.asarray(self.node_endpoint_vertices())
        Xv = jnp.asarray(Xv)
        return 0.5 * (Xv[ends[:, 0]] + Xv[ends[:, 1]])

    # ------------------------------------------------------------------
    def volume(self) -> float:
        return float(jnp.sum(self.geometry().volume))

    def boundary_volume(self) -> float:
        return float(jnp.sum(self.geometry().bdry_volume))

    def node_mass_lumped(self):
        """[N] lumped nodal measure: sum over elements of vol * int(phi_i)."""
        g = self.geometry()
        w = jnp.asarray(
            shape_functions.integrated_shape_np(self.K, self.degree))
        contrib = g.volume[:, None] * w[None, :]
        return jax.ops.segment_sum(
            contrib.ravel(),
            jnp.asarray(self.elem_nodes.ravel()),
            num_segments=self.num_nodes,
        )

    # Convenience region selectors (used by BC application) --------------
    def nodes_in_box(self, lo, hi, tol_frac: float = 1e-10) -> np.ndarray:
        bb = self.bbox()
        tol = tol_frac * float(np.max(bb.dimensions))
        p = self.node_positions
        m = np.all((p >= np.asarray(lo) - tol) & (p <= np.asarray(hi) + tol),
                   axis=1)
        return np.flatnonzero(m)

    def boundary_elems_in_box(self, lo, hi, tol_frac: float = 1e-10):
        bb = self.bbox()
        tol = tol_frac * float(np.max(bb.dimensions))
        c = self.node_positions[self.bdry_elem_nodes].mean(axis=1)
        ok = np.ones(len(self.bdry_elems), dtype=bool)
        for corner in range(self.bdry_elems.shape[1]):
            p = self.V[self.bdry_elems[:, corner]]
            ok &= np.all((p >= np.asarray(lo) - tol)
                         & (p <= np.asarray(hi) + tol), axis=1)
        return np.flatnonzero(ok)
