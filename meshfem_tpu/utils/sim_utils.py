"""Python-layer support utilities (parity with reference ``python/``:
``sim_utils.py`` bbox DOF selection, ``regions.py``, ``parallelism.py``
thread control, ``registration.py`` rigid registration)."""

from __future__ import annotations

import os

import numpy as np


def dofs_in_bbox(mesh, lo, hi, components=None, dim=None):
    """Flat DOF indices of nodes inside a box (``sim_utils.py`` bbox var
    selection for pinning/loading)."""
    d = dim or mesh.dim
    nodes = mesh.nodes_in_box(lo, hi)
    comps = np.arange(d) if components is None else np.asarray(components)
    return (nodes[:, None] * d + comps[None, :]).ravel()


class BoxRegion:
    """Axis-aligned region predicate (``regions.py``)."""

    def __init__(self, lo, hi, tol=1e-10):
        self.lo = np.asarray(lo, dtype=float)
        self.hi = np.asarray(hi, dtype=float)
        self.tol = tol

    def contains(self, pts):
        p = np.atleast_2d(pts)
        return np.all((p >= self.lo - self.tol) & (p <= self.hi + self.tol),
                      axis=1)


def set_max_num_threads(n: int) -> None:
    """Reference ``MESHFEM_NUM_THREADS`` analog: caps host-side CPU
    parallelism (XLA host threads are managed by the runtime; this caps
    numpy/BLAS)."""
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ[var] = str(n)


def rigid_registration(P, Q, allow_scaling: bool = False):
    """Least-squares rigid (+scale) alignment Q ~ s R P + t
    (``registration.py``; Umeyama/Kabsch)."""
    P = np.asarray(P, dtype=float)
    Q = np.asarray(Q, dtype=float)
    cp, cq = P.mean(0), Q.mean(0)
    P0, Q0 = P - cp, Q - cq
    H = P0.T @ Q0
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.eye(P.shape[1])
    D[-1, -1] = d
    R = Vt.T @ D @ U.T
    s = 1.0
    if allow_scaling:
        s = (S * np.diag(D)).sum() / (P0 ** 2).sum()
    t = cq - s * R @ cp
    return s, R, t
