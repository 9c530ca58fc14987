"""Procedural mesh generators (parity with reference ``src/bin/tools``:
``grid`` N x M triangulated grid driving the convergence suites, plus box tet
grids, L-shapes, and ellipses)."""

from __future__ import annotations

import numpy as np


def grid_tri(nx: int, ny: int, lo=(0.0, 0.0), hi=(1.0, 1.0),
             diagonal: str = "alternate"):
    """Triangulated structured grid on [lo, hi]: (nx x ny) cells, 2 tris each.

    ``diagonal``: 'right' (all one way), 'alternate' (union-jack-ish flip by
    cell parity — matches the symmetric meshes the convergence experiments
    use).  Returns (V [n, 2] float64, F [m, 3] int32), CCW orientation."""
    xs = np.linspace(lo[0], hi[0], nx + 1)
    ys = np.linspace(lo[1], hi[1], ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    V = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return i * (ny + 1) + j

    tris = []
    for i in range(nx):
        for j in range(ny):
            a, b = vid(i, j), vid(i + 1, j)
            c, d = vid(i + 1, j + 1), vid(i, j + 1)
            flip = diagonal == "alternate" and (i + j) % 2 == 1
            if flip:
                tris += [[a, b, c], [a, c, d]]
            else:
                tris += [[a, b, d], [b, c, d]]
    return V, np.asarray(tris, dtype=np.int32)


def grid_tet(nx: int, ny: int, nz: int, lo=(0.0, 0.0, 0.0),
             hi=(1.0, 1.0, 1.0)):
    """Box [lo, hi] split into (nx, ny, nz) cubes, 6 positively oriented tets
    each (Kuhn / Freudenthal subdivision — conforming across cube faces).
    Returns (V [n, 3] float64, T [m, 4] int32).  Fully vectorized."""
    import itertools

    xs = np.linspace(lo[0], hi[0], nx + 1)
    ys = np.linspace(lo[1], hi[1], ny + 1)
    zs = np.linspace(lo[2], hi[2], nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    V = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    # Corner offset of each cube-local vertex -> flat index offset.
    def off(dx, dy, dz):
        return (dx * (ny + 1) + dy) * (nz + 1) + dz

    # 6 Kuhn tets as corner-offset patterns (paths 000 -> 111), orientation
    # fixed on the unit cube once (same pattern for all cubes).
    patterns = []
    unit = {(dx, dy, dz): np.array([dx, dy, dz], dtype=float)
            for dx, dy, dz in itertools.product((0, 1), repeat=3)}
    for perm in itertools.permutations(range(3)):
        path = [(0, 0, 0)]
        cur = [0, 0, 0]
        for ax in perm:
            cur[ax] = 1
            path.append(tuple(cur))
        pts = np.stack([unit[q] for q in path])
        tet = list(path)
        if np.linalg.det(pts[1:] - pts[0]) < 0:
            tet[2], tet[3] = tet[3], tet[2]
        patterns.append([off(*q) for q in tet])
    patterns = np.asarray(patterns, dtype=np.int64)        # [6, 4]

    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    base = ((ii * (ny + 1) + jj) * (nz + 1) + kk).ravel()   # [ncubes]
    T = (base[:, None, None] + patterns[None, :, :]).reshape(-1, 4)
    return V, T.astype(np.int32)


def square(n: int = 8, lo=(0.0, 0.0), hi=(1.0, 1.0)):
    return grid_tri(n, n, lo, hi)


def cube(n: int = 4, lo=(0.0, 0.0, 0.0), hi=(1.0, 1.0, 1.0)):
    return grid_tet(n, n, n, lo, hi)


def l_shape(n: int = 8):
    """L-shaped domain [0,1]^2 minus (0.5,1)x(0.5,1) (reference tools/L_shape)."""
    V, F = grid_tri(n, n)
    keep = []
    for t in F:
        cx, cy = V[t].mean(axis=0)
        if not (cx > 0.5 and cy > 0.5):
            keep.append(t)
    F2 = np.asarray(keep, dtype=np.int32)
    used = np.unique(F2)
    remap = -np.ones(len(V), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return V[used], remap[F2].astype(np.int32)


def ellipse(na: int = 32, a: float = 1.0, b: float = 0.6):
    """Fan-triangulated ellipse (reference tools/ellipse)."""
    theta = np.linspace(0, 2 * np.pi, na, endpoint=False)
    ring = np.stack([a * np.cos(theta), b * np.sin(theta)], axis=1)
    V = np.vstack([[0.0, 0.0], ring])
    F = np.asarray(
        [[0, 1 + i, 1 + ((i + 1) % na)] for i in range(na)], dtype=np.int32)
    return V, F


def bar_tet(nx: int = 8, ny: int = 2, nz: int = 2, length: float = 4.0,
            width: float = 1.0):
    """Cantilever bar [0, length] x [0, width]^2 (bench / BC tests)."""
    return grid_tet(nx, ny, nz, (0, 0, 0), (length, width, width))
