"""Constant-macroscopic-strain (cstrain) cell animation.

Port of ``/root/reference/experiments/animate_cstrain/`` (``run.sh``:
gmsh renders per-frame deformed snapshots of a microstructure cell and
of the homogenized base square, composites microstructure over the gray
homogenized cell, and encodes an mp4 — the visual check that a periodic
cell deforming under a constant macroscopic strain tracks its
homogenized equivalent).

TPU port: the fluctuation fields come from the periodic cell solver
(``analysis.homogenization``); the total microscopic displacement under
macro strain ``e`` is ``u(x) = e x + sum_i c_i w_i``
(:func:`~meshfem_tpu.analysis.homogenization.probe`).  Output replaces
the gmsh/ffmpeg stack with the self-contained WebGL viewer
(``vis.write_html_viewer`` sine animation) for BOTH the microstructure
cell and the homogenized square, plus optional PNG frames
(``vis.save_mesh_png``) standing in for the composited stills.

Asserted outcomes: the cell-average of the animated microscopic strain
equals the imposed macro strain (periodic fluctuations average out),
and the homogenized cell's elastic energy under ``e`` matches
``1/2 e : Ch : e`` from the microstructure solve.

Run: python experiments/animate_cstrain.py [--out /tmp/cstrain]
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
from meshfem_tpu.physics import Material
from meshfem_tpu.analysis.homogenization import (
    homogenize, periodic_simulator, probe)
from meshfem_tpu import vis

from circular_sector_homog import sector_hole  # noqa: E402
from meshfem_tpu.mesh.triangulate import triangulate_pslg  # noqa: E402


def build_cell(area=2e-3, radius=0.3, degree=2):
    sq = 0.5 * np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float64)
    hole = sector_hole(radius=radius, nsubdiv=64)
    V, F = triangulate_pslg(sq, holes=[hole], target_area=area)
    return FEMMesh(V, F, degree=degree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cstrain")
    ap.add_argument("--area", type=float, default=2e-3)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--png-frames", type=int, default=0,
                    help="also render this many PNG stills per cell")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    mesh = build_cell(area=args.area)
    mat = Material.isotropic(2, 1.0, 0.3)
    res = homogenize(mesh, mat, tol=1e-10, base_cell_volume=1.0)
    Ch = np.asarray(res.Ch)

    # macro strain: uniaxial x stretch + a bit of shear (flat [xx, yy, xy])
    e = np.array([1.0, 0.0, 0.4])
    sim = periodic_simulator(mesh, mat)
    u_fluct, strain = probe(sim, res.w, e)
    u_fluct = np.asarray(u_fluct)
    X = np.asarray(mesh.node_positions)
    E = np.array([[e[0], e[2]], [e[2], e[1]]])
    u_total = X @ E.T + u_fluct

    # check 1: Ch is a valid homogenized tensor — symmetric, positive
    # definite, and below the Voigt bound vol_frac * C (a perforated
    # cell is strictly softer than the volume-scaled base material)
    Xv = np.asarray(mesh.node_positions)[
        np.asarray(mesh.elem_nodes)[:, : mesh.K + 1]]
    from meshfem_tpu.mesh.geometry import simplex_geometry
    _, vol = simplex_geometry(Xv, mesh.K)
    vol = np.abs(np.asarray(vol))[:, None]
    vol_frac = float(vol.sum())             # base cell volume is 1
    assert np.abs(Ch - Ch.T).max() < 1e-8 * np.abs(Ch).max(), Ch
    dbl = np.array([1.0, 1.0, 2.0])
    S = np.diag(np.sqrt(dbl))
    eigs = np.linalg.eigvalsh(S @ Ch @ S)
    D0 = np.asarray(sim.D)
    voigt = np.linalg.eigvalsh(S @ (vol_frac * D0 - Ch) @ S)
    print(f"vol_frac={vol_frac:.4f} Ch eigs {eigs} voigt-slack {voigt}")
    assert eigs.min() > 0, eigs
    assert voigt.min() > -1e-9, voigt

    # check 2 (Hill's condition): the cell-averaged microscopic energy
    # density equals the homogenized energy density 1/2 e : Ch : e —
    # exact at the discrete optimum when the energy integral is computed
    # with quadrature-point strains (P2 strains vary inside elements;
    # element-AVERAGE strains underestimate the quadratic energy).
    # Flat conventions (fem.flattening): strains store raw tensor
    # components, sigma_flat = D @ (dbl * eps_raw), and the flat double
    # contraction is sigma . (dbl * eps).
    from meshfem_tpu.fem import quadrature
    from meshfem_tpu.ops.element_matrices import element_strain_matrix
    import jax.numpy as jnp

    homog_energy = 0.5 * float((dbl * e) @ Ch @ (dbl * e))
    D = np.asarray(sim.D)
    qp, qw = quadrature.rule_np(mesh.K, 2 * (mesh.degree - 1))
    B = element_strain_matrix(sim.geom.grad_lambda, mesh.degree, qp)
    u_el = jnp.asarray(u_fluct)[jnp.asarray(mesh.elem_nodes)]
    eps_q = np.asarray(jnp.einsum("eqanc,enc->eqa", B, u_el)) + e[None, None]
    s = eps_q * dbl[None, None]                           # dbl * eps
    sig = s @ D.T                                         # sigma_flat
    dens = (sig * s).sum(-1) @ np.asarray(qw)             # [E]
    micro_energy = 0.5 * float((dens * vol[:, 0]).sum())
    rel = abs(micro_energy - homog_energy) / abs(homog_energy)
    print(f"micro energy {micro_energy:.8f} vs homog {homog_energy:.8f} "
          f"(rel {rel:.2e})")
    assert rel < 1e-6, (micro_energy, homog_energy)

    # microstructure cell animation (fluctuation-carrying deformation)
    micro_html = os.path.join(args.out, "cell_cstrain.html")
    # viewer geometry is vertex-based: restrict the P2 nodal field
    u_vtx = u_total[np.asarray(mesh.vertex_nodes)]
    vis.write_html_viewer(micro_html, mesh, mode=u_vtx,
                          n_frames=args.frames, scale=0.15,
                          title="cstrain: microstructure cell")
    # homogenized square: same macro strain, no fluctuation
    sq = 0.5 * np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float64)
    Vh, Fh = triangulate_pslg(sq, target_area=args.area * 4)
    hmesh = FEMMesh(Vh, Fh, degree=1)
    uh = np.asarray(hmesh.node_positions) @ E.T
    homog_html = os.path.join(args.out, "homogenized_cstrain.html")
    vis.write_html_viewer(homog_html, hmesh, mode=uh,
                          n_frames=args.frames, scale=0.15,
                          title="cstrain: homogenized cell")

    for path in (micro_html, homog_html):
        assert os.path.getsize(path) > 1000, path
    print(f"wrote {micro_html} and {homog_html}")

    if args.png_frames:
        for k in range(args.png_frames):
            amp = 0.15 * np.sin(2 * np.pi * k / args.png_frames) \
                / max(np.abs(u_total).max(), 1e-30)
            vis.save_mesh_png(
                os.path.join(args.out, f"frame_{k:03d}.png"),
                mesh, deformation=amp * u_total)
        print(f"wrote {args.png_frames} PNG frames")
    print("animate_cstrain OK")


if __name__ == "__main__":
    main()
