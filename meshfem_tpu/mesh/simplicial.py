"""Simplicial mesh connectivity as flat index arrays.

TPU-native redesign of the reference's pointer-chasing structures:

* ``TriMesh`` — Rossignac corner table (``TriMesh.hh:1-60``): half-edge
  ``h = 3 f + c`` is the edge of face ``f`` *opposite* corner ``c``, oriented
  CCW (tail = corner c+1, tip = corner c+2).  ``O[h]`` is the mate half-edge
  or the encoded boundary-edge index ``-2 - b`` (``TriMesh.hh:27-30``).
* ``TetMesh`` — compact half-face structure (``TetMesh.hh:1-80``): half-face
  ``hf = 4 t + c`` is the face of tet ``t`` opposite corner ``c``, oriented
  inward; ``O[hf]`` is the mate half-face or ``-1 - b`` for boundary face
  ``b`` (``TetMesh.hh:17-23``).

All construction is vectorized numpy (lexsort-based face matching replaces
hash maps); traversal "handles" are plain integer arrays, so the reference's
traversal invariants (mate(mate(h)) == h etc.) become array identities tested
in ``tests/test_mesh_traversal.py``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .geometry import BBox

# Outward-oriented faces of a positively oriented element, opposite vertex i.
TRI_FACE_CORNERS = np.array([[1, 2], [2, 0], [0, 1]], dtype=np.int64)
TET_FACE_CORNERS = np.array(
    [[1, 2, 3], [0, 3, 2], [0, 1, 3], [0, 2, 1]], dtype=np.int64)


def _match_faces(face_verts: np.ndarray):
    """Pair up half-entities with identical vertex sets.

    face_verts: [H, k] vertex indices of each half-entity.
    Returns (opposite [H] with -1 where unmatched, boundary_mask [H])."""
    H = face_verts.shape[0]
    from ..native import match_faces as native_match

    nat = native_match(face_verts)
    if nat is not None:
        return nat, nat < 0
    key = np.sort(face_verts, axis=1)
    order = np.lexsort(key.T[::-1])
    sk = key[order]
    same_as_next = np.all(sk[:-1] == sk[1:], axis=1)
    opp = -np.ones(H, dtype=np.int64)
    idx = np.flatnonzero(same_as_next)
    # A manifold mesh has each internal face exactly twice; verify no triples.
    if idx.size >= 2 and np.any(np.diff(idx) == 0):
        raise ValueError("non-manifold: face shared by > 2 elements")
    if np.any(same_as_next[:-1] & same_as_next[1:]):
        raise ValueError("non-manifold: face shared by > 2 elements")
    a, b = order[idx], order[idx + 1]
    opp[a], opp[b] = b, a
    return opp, opp < 0


@dataclasses.dataclass
class TriMesh:
    """Corner-table triangle mesh.  V: [n, dim] positions, F: [m, 3] CCW."""

    V: np.ndarray
    F: np.ndarray
    O: np.ndarray              # [3m] mate half-edge or -2 - bdry_edge_index
    VH: np.ndarray             # [n] one incident half-edge per vertex (or -1)
    bdry_halfedge: np.ndarray  # [nb] the interior half-edge along bdry edge b

    @classmethod
    def build(cls, V, F) -> "TriMesh":
        V = np.ascontiguousarray(V, dtype=np.float64)
        F = np.ascontiguousarray(F, dtype=np.int64)
        m = F.shape[0]
        # Half-edge h = 3f + c: tail F[f, c+1], tip F[f, c+2].
        he_verts = np.stack(
            [F[:, TRI_FACE_CORNERS[:, 0]].ravel(),
             F[:, TRI_FACE_CORNERS[:, 1]].ravel()], axis=1)
        opp, bdry = _match_faces(he_verts)
        bdry_halfedge = np.flatnonzero(bdry)
        O = opp.copy()
        O[bdry_halfedge] = -2 - np.arange(len(bdry_halfedge))
        VH = -np.ones(len(V), dtype=np.int64)
        # Prefer boundary-adjacent half-edges so circulators can start there.
        VH[he_verts[:, 0]] = np.arange(3 * m)
        return cls(V, F, O, VH, bdry_halfedge)

    # -- handle arithmetic (vectorized over integer arrays) -------------
    def face(self, h):
        return np.asarray(h) // 3

    def corner(self, h):
        return np.asarray(h) % 3

    def tail(self, h):
        h = np.asarray(h)
        return self.F[h // 3, (h % 3 + 1) % 3]

    def tip(self, h):
        h = np.asarray(h)
        return self.F[h // 3, (h % 3 + 2) % 3]

    def opposite_vertex(self, h):
        h = np.asarray(h)
        return self.F[h // 3, h % 3]

    def next(self, h):
        h = np.asarray(h)
        return (h // 3) * 3 + (h % 3 + 1) % 3

    def prev(self, h):
        h = np.asarray(h)
        return (h // 3) * 3 + (h % 3 + 2) % 3

    def mate(self, h):
        """Opposite half-edge (negative encoding for boundary)."""
        return self.O[np.asarray(h)]

    def is_boundary_halfedge(self, h):
        return self.O[np.asarray(h)] < 0

    def boundary_edge_index(self, h):
        """Boundary edge index from the encoded mate (-2 - b)."""
        return -2 - self.O[np.asarray(h)]

    # -- global queries ---------------------------------------------------
    @property
    def num_vertices(self) -> int:
        return len(self.V)

    @property
    def num_faces(self) -> int:
        return len(self.F)

    @property
    def num_boundary_edges(self) -> int:
        return len(self.bdry_halfedge)

    def boundary_edges(self) -> np.ndarray:
        """[nb, 2] boundary edge vertices wound CCW (interior on the left)."""
        h = self.bdry_halfedge
        return np.stack([self.tail(h), self.tip(h)], axis=1)

    def boundary_vertices(self) -> np.ndarray:
        return np.unique(self.boundary_edges())

    def boundary_loops(self) -> list[np.ndarray]:
        """Ordered vertex loops of each boundary component."""
        edges = self.boundary_edges()
        nxt = dict(zip(edges[:, 0].tolist(), edges[:, 1].tolist()))
        seen: set[int] = set()
        loops = []
        for start in edges[:, 0]:
            start = int(start)
            if start in seen:
                continue
            loop = [start]
            seen.add(start)
            cur = nxt[start]
            while cur != start:
                loop.append(cur)
                seen.add(cur)
                cur = nxt[cur]
            loops.append(np.asarray(loop))
        return loops

    def vertex_face_adjacency(self):
        """CSR (offsets, faces) of faces incident to each vertex."""
        v = self.F.ravel()
        f = np.repeat(np.arange(len(self.F)), 3)
        order = np.argsort(v, kind="stable")
        counts = np.bincount(v, minlength=len(self.V))
        offsets = np.concatenate([[0], np.cumsum(counts)])
        return offsets, f[order]

    def edges(self) -> np.ndarray:
        """[ne, 2] unique undirected edges (sorted pairs)."""
        he = np.stack([self.F[:, TRI_FACE_CORNERS[:, 0]].ravel(),
                       self.F[:, TRI_FACE_CORNERS[:, 1]].ravel()], axis=1)
        return np.unique(np.sort(he, axis=1), axis=0)

    def bbox(self) -> BBox:
        return BBox.of(self.V)


@dataclasses.dataclass
class TetMesh:
    """Half-face tetrahedral mesh.  V: [n, 3], T: [m, 4] positively oriented."""

    V: np.ndarray
    T: np.ndarray
    O: np.ndarray               # [4m] mate half-face or -1 - bdry_face_index
    bdry_halfface: np.ndarray   # [nb] interior half-face behind bdry face b

    @classmethod
    def build(cls, V, T) -> "TetMesh":
        V = np.ascontiguousarray(V, dtype=np.float64)
        T = np.ascontiguousarray(T, dtype=np.int64)
        m = T.shape[0]
        hf_verts = T[:, TET_FACE_CORNERS].reshape(4 * m, 3)
        opp, bdry = _match_faces(hf_verts)
        bdry_halfface = np.flatnonzero(bdry)
        O = opp.copy()
        O[bdry_halfface] = -1 - np.arange(len(bdry_halfface))
        return cls(V, T, O, bdry_halfface)

    def tet(self, hf):
        return np.asarray(hf) // 4

    def corner(self, hf):
        return np.asarray(hf) % 4

    def face_vertices(self, hf):
        """[.., 3] vertices of half-face(s), outward-of-tet winding."""
        hf = np.asarray(hf)
        return self.T[hf // 4][..., TET_FACE_CORNERS[hf % 4]] if hf.ndim == 0 \
            else np.take_along_axis(
                self.T[hf // 4], TET_FACE_CORNERS[hf % 4], axis=-1)

    def mate(self, hf):
        return self.O[np.asarray(hf)]

    def is_boundary_halfface(self, hf):
        return self.O[np.asarray(hf)] < 0

    def boundary_face_index(self, hf):
        return -1 - self.O[np.asarray(hf)]

    @property
    def num_vertices(self) -> int:
        return len(self.V)

    @property
    def num_tets(self) -> int:
        return len(self.T)

    @property
    def num_boundary_faces(self) -> int:
        return len(self.bdry_halfface)

    def boundary_faces(self) -> np.ndarray:
        """[nb, 3] boundary triangles wound outward."""
        hf = self.bdry_halfface
        return np.take_along_axis(
            self.T[hf // 4], TET_FACE_CORNERS[hf % 4], axis=-1)

    def boundary_vertices(self) -> np.ndarray:
        return np.unique(self.boundary_faces())

    def edges(self) -> np.ndarray:
        from ..fem import simplex

        pairs = np.asarray(simplex.simplex_edges(3))
        e = np.stack([self.T[:, pairs[:, 0]].ravel(),
                      self.T[:, pairs[:, 1]].ravel()], axis=1)
        return np.unique(np.sort(e, axis=1), axis=0)

    def bbox(self) -> BBox:
        return BBox.of(self.V)
