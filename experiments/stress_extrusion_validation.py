"""Stress-extrusion validation: full stress-distribution curves.

Port of ``/root/reference/experiments/stress_extrusion_validation/``
(``sim.sh``: Simulate_cli on extruded patterns at thicknesses
0.25/0.5/1.0/2.0 plus x2-refined copies under a pull-y Dirichlet BC;
``process_stresses.py``: per-element max stresses sorted ascending,
paired with the cumulative element-volume fraction — the
"sorted stress vs cumulative volume" distribution curve).

TPU port: reuses the extrusion machinery of
``experiments/extrusion_validation.py`` (reference mesh + verbatim .bc
JSONs, conforming prism-split extrusion).  For each thickness the 3D
von Mises field is reduced to the reference's distribution curve
``(cumVol / totalVol, sorted stress)`` and compared against the 2D
plane-stress curve by the L2 curve distance on a common volume-fraction
grid.  Asserted outcomes:

  1. the thin extrusion's stress-distribution curve matches the 2D curve
     (relative L2 distance a few percent over the bulk of the volume);
  2. the curve distance grows with thickness (plane-stress validity
     degrades as the extrusion thickens) — the reference's conclusion;
  3. mesh stability: an x2-refined thin extrusion yields the same curve
     (the ``_x2`` runs of ``sim.sh``).

Run: python experiments/stress_extrusion_validation.py
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

from meshfem_tpu.mesh.geometry import simplex_geometry  # noqa: E402

from extrusion_validation import solve_2d, solve_extruded  # noqa: E402


def distribution_curve(mesh, vm):
    """Reference ``process_stresses.py``: sort per-element stresses
    ascending and pair with cumulative volume fraction.  Returns
    (cum_vol_fraction [E], sorted_stress [E])."""
    X = np.asarray(mesh.node_positions)[
        np.asarray(mesh.elem_nodes)[:, : mesh.K + 1]]
    _, vol = simplex_geometry(X, mesh.K)
    vol = np.abs(np.asarray(vol))
    perm = np.argsort(vm)
    s = vm[perm]
    v = vol[perm]
    cum = np.cumsum(v)
    return cum / cum[-1], s


def curve_distance(c2, c3, lo=0.02, hi=0.98, n=512):
    """Relative L2 distance between two distribution curves sampled on a
    common volume-fraction grid (the extreme tails carry mesh-dependent
    stress concentrations -> compare the bulk [lo, hi])."""
    grid = np.linspace(lo, hi, n)
    s2 = np.interp(grid, *c2)
    s3 = np.interp(grid, *c3)
    return float(np.linalg.norm(s3 - s2) / np.linalg.norm(s2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--thicknesses", type=float, nargs="+",
                    default=[0.25, 1.0, 2.0])
    ap.add_argument("--degree", type=int, default=2)
    args = ap.parse_args()

    mesh2, _, _, vm2 = solve_2d(degree=args.degree)
    curve2 = distribution_curve(mesh2, vm2)

    dists = []
    for t in args.thicknesses:
        mesh3, _, _, vm3, layers = solve_extruded(t, degree=args.degree)
        # the .bc applies a fixed TOTAL force ("force F -> traction
        # F / region-area"); the loaded face area grows with thickness,
        # so the 3D stress field carries an exact 1/t scale relative to
        # the unit-implicit-depth 2D plane-stress run — normalize by t
        # (equivalent to loading with force 100 t)
        curve3 = distribution_curve(mesh3, t * vm3)
        d = curve_distance(curve2, curve3)
        dists.append(d)
        print(f"t={t:<5} layers={layers:<2} elems={mesh3.num_elements:<8} "
              f"curve_L2={d:.4f}", flush=True)

    # mesh stability: x2-refined thin extrusion, same curve
    t0 = args.thicknesses[0]
    mesh3r, _, _, vm3r, _ = solve_extruded(
        t0, degree=args.degree,
        layers=2 * max(1, int(round(t0 / 0.25))))
    d_ref = curve_distance(distribution_curve(mesh3r, t0 * vm3r), curve2)
    print(f"t={t0} x2-layers curve_L2={d_ref:.4f}", flush=True)

    # 1. thin extrusion matches plane stress
    assert dists[0] < 0.05, dists
    # 2. thicker extrusions drift monotonically (allow small noise)
    assert dists[-1] > dists[0], dists
    # 3. refinement stability
    assert abs(d_ref - dists[0]) < 0.03, (d_ref, dists[0])
    print("stress_extrusion_validation OK")


if __name__ == "__main__":
    main()
