"""Visualization hooks (parity with the reference's Jupyter viewer stack,
``python/tri_mesh_viewer.py`` / ``python/vis``): matplotlib-based 2D/3D mesh
and field rendering plus the raw visualization-geometry accessors the
reference's bindings expose (``mesh.cc:76-81``)."""

from __future__ import annotations

import numpy as np


def visualization_geometry(mesh):
    """(V, F, N) triangle soup for rendering: 2D/3D tri meshes render
    directly; tet meshes render their boundary surface."""
    if mesh.K == 2:
        V = mesh.V if mesh.dim == 3 else np.pad(
            mesh.V, [(0, 0), (0, 1)])
        F = mesh.F
    else:
        V = mesh.V
        F = mesh.bdry_elems
    tri = V[F]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-300)
    return V, F, n


def plot_mesh(mesh, field=None, *, ax=None, deformation=None, scale=1.0,
              cmap="viridis", show_edges=True):
    """Render a mesh with an optional nodal/element scalar field.

    Returns the matplotlib axes (figure saved by the caller)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    import matplotlib.tri as mtri

    V = mesh.V.copy()
    if deformation is not None:
        V = V + scale * np.asarray(deformation)[:len(V), :V.shape[1]]
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    if mesh.K == 2 and mesh.dim == 2:
        triang = mtri.Triangulation(V[:, 0], V[:, 1], mesh.F)
        if field is not None:
            f = np.asarray(field)
            if len(f) == mesh.num_nodes:
                tpc = ax.tripcolor(triang, f[:len(V)], shading="gouraud",
                                   cmap=cmap)
            else:
                tpc = ax.tripcolor(triang, facecolors=f, cmap=cmap)
            plt.colorbar(tpc, ax=ax, shrink=0.8)
        if show_edges:
            ax.triplot(triang, lw=0.3, color="k", alpha=0.4)
        ax.set_aspect("equal")
    else:
        # 3D: scatter boundary triangles' shaded polygons.
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        fig = ax.figure
        ax.remove()
        ax = fig.add_subplot(projection="3d")
        Vv, F, n = visualization_geometry(mesh)
        Vd = Vv.copy()
        if deformation is not None:
            Vd = Vd + scale * np.asarray(deformation)[:len(Vd)]
        polys = Vd[F]
        shade = 0.4 + 0.6 * np.abs(n @ np.array([0.3, 0.5, 0.8]))
        pc = Poly3DCollection(polys, edgecolor="k", linewidths=0.2)
        if field is not None and len(np.asarray(field)) == len(F):
            import matplotlib.cm as cm

            f = np.asarray(field, dtype=float)
            f = (f - f.min()) / max(f.ptp(), 1e-30)
            pc.set_facecolor(cm.get_cmap(cmap)(f))
        else:
            pc.set_facecolor(np.outer(shade, [0.6, 0.7, 0.9]))
        ax.add_collection3d(pc)
        lo, hi = Vd.min(0), Vd.max(0)
        ax.set_xlim(lo[0], hi[0]); ax.set_ylim(lo[1], hi[1])
        ax.set_zlim(lo[2], hi[2])
    return ax


def save_mesh_png(path, mesh, field=None, **kw):
    import matplotlib.pyplot as plt

    ax = plot_mesh(mesh, field, **kw)
    ax.figure.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(ax.figure)


def mode_animation_frames(mesh, mode, n_frames: int = 16, scale=0.1):
    """Displacement snapshots for eigenmode animation
    (``python/mode_viewer.py``)."""
    mode = np.asarray(mode)
    amp = scale / max(np.abs(mode).max(), 1e-30)
    return [amp * np.sin(2 * np.pi * t / n_frames) * mode
            for t in range(n_frames)]
