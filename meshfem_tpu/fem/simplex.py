"""K-simplex node counts and GMSH-consistent node ordering.

Parity with reference ``Simplex.hh:15-62``:

* node counts for degree-``deg`` Lagrange elements on K-simplices;
* FEM nodes are ordered vertices-first, then edge nodes; edge ``i``'s node
  sits between ``EDGE_START_NODE[i]`` and ``EDGE_END_NODE[i]``
  (``Simplex.hh:43-46``):  start = [0, 1, 2, 0, 2, 1], end = [1, 2, 0, 3, 3, 3].
"""

from __future__ import annotations

EDGE = 1
TRIANGLE = 2
TETRAHEDRON = 3

# Edge-node endpoint lookup tables (GMSH convention), Simplex.hh:43-46.
EDGE_START_NODE = (0, 1, 2, 0, 2, 1)
EDGE_END_NODE = (1, 2, 0, 3, 3, 3)


def num_vertices(K: int) -> int:
    return K + 1


def num_edges(K: int) -> int:
    return (K * (K + 1)) // 2


def num_nodes(K: int, deg: int) -> int:
    """Number of Lagrange nodes of a degree-`deg` K-simplex element."""
    if K == 1:
        return deg + 1
    if K == 2:
        return ((deg + 1) * (deg + 2)) // 2
    if K == 3:
        return ((deg + 1) * (deg + 2) * (deg + 3)) // 6
    raise ValueError("Simplex dimension must be 1, 2, or 3")


def simplex_edges(K: int) -> list[tuple[int, int]]:
    """Vertex pairs of the K-simplex's edges in GMSH edge order."""
    return [(EDGE_START_NODE[i], EDGE_END_NODE[i]) for i in range(num_edges(K))]
