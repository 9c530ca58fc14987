"""Boundary condition parsing and region matching.

Parity with reference ``BoundaryConditions.hh/.cc``: JSON ``.bc`` files with

* ``regions``: list of ``{"type": ..., "value": [...], "box"/"box%": {...}}``
  where type is dirichlet / force / traction / pressure / target /
  delta_force (optionally suffixed with a component mask, e.g.
  ``dirichletxy``), values may be expression strings over x/y/z;
* ``box%`` corners are fractions of the mesh bounding box;
* ``no_rigid_motion`` flag.

Semantics (``BoundaryConditions.hh:179-215``, ``LinearElasticity.hh:881-1027``):
pressure p -> traction = -p n; force F -> uniform traction F / region-area;
dirichlet applies to boundary nodes in the region (per component mask).
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path

import numpy as np

from ..utils.expressions import evaluate
from ..mesh.geometry import BBox

_TYPE_RE = re.compile(
    r"^(dirichlet|force|traction|pressure|target|delta_force|fracture|contact)"
    r"([xyz]{0,3})$")


@dataclasses.dataclass
class ComponentMask:
    """x/y/z component selection (reference ``ComponentMask.hh``)."""

    mask: str = ""

    def components(self, dim: int) -> np.ndarray:
        if not self.mask:
            return np.arange(dim)
        return np.asarray(["xyz".index(c) for c in self.mask])

    def has(self, c: int) -> bool:
        return not self.mask or "xyz"[c] in self.mask


@dataclasses.dataclass
class BCRegion:
    type: str                      # dirichlet/force/traction/pressure/target/delta_force
    value: list                    # numbers or expression strings
    min_corner: np.ndarray
    max_corner: np.ndarray
    percent: bool                  # box% (fraction of mesh bbox)
    component_mask: ComponentMask = dataclasses.field(
        default_factory=ComponentMask)

    def absolute_box(self, mesh_bbox: BBox) -> BBox:
        if not self.percent:
            return BBox(self.min_corner.copy(), self.max_corner.copy())
        d = mesh_bbox.dimensions
        return BBox(mesh_bbox.min + self.min_corner * d,
                    mesh_bbox.min + self.max_corner * d)

    def eval_value(self, points, env=None) -> np.ndarray:
        """[len(points), len(value)] evaluated values."""
        cols = [evaluate(v, points, env) for v in self.value]
        return np.stack(cols, axis=-1)


@dataclasses.dataclass
class BoundaryConditions:
    regions: list
    no_rigid_motion: bool = False


def parse_bc(data: dict | str, dim: int = 3) -> BoundaryConditions:
    """Parse the reference's ``.bc`` JSON (``readBoundaryConditions``,
    ``BoundaryConditions.cc``)."""
    if isinstance(data, str):
        data = json.loads(data)
    regions = []
    for r in data.get("regions", []):
        m = _TYPE_RE.match(r["type"].strip().lower())
        if not m:
            raise ValueError(f"unknown BC type {r['type']!r}")
        base, mask = m.group(1), m.group(2)
        if "box" in r:
            box, percent = r["box"], False
        elif "box%" in r:
            box, percent = r["box%"], True
        else:
            raise ValueError("BC region needs a box or box% region")
        lo = np.asarray(box["minCorner"], dtype=np.float64)[:dim]
        hi = np.asarray(box["maxCorner"], dtype=np.float64)[:dim]
        value = r.get("value", [])
        if not isinstance(value, (list, tuple)):
            value = [value]
        regions.append(BCRegion(base, list(value), lo, hi, percent,
                                ComponentMask(mask)))
    return BoundaryConditions(regions, bool(data.get("no_rigid_motion",
                                                     False)))


def load_bc(path, dim: int = 3) -> BoundaryConditions:
    return parse_bc(json.loads(Path(path).read_text()), dim)


# ---------------------------------------------------------------------------
# Region matching against a FEMMesh.
# ---------------------------------------------------------------------------

def match_boundary_nodes(mesh, region: BCRegion, tol_frac: float = 1e-7):
    """Boundary node indices whose positions fall in the region box."""
    box = region.absolute_box(mesh.bbox())
    tol = tol_frac * max(float(np.max(mesh.bbox().dimensions)), 1.0)
    p = mesh.node_positions[mesh.bdry_nodes]
    inside = np.all((p >= box.min - tol) & (p <= box.max + tol), axis=1)
    return mesh.bdry_nodes[inside]


def match_boundary_elements(mesh, region: BCRegion, tol_frac: float = 1e-7):
    """Boundary element indices entirely inside the region box (the reference
    requires all vertices of the boundary element inside,
    ``LinearElasticity.hh:897-930``)."""
    box = region.absolute_box(mesh.bbox())
    tol = tol_frac * max(float(np.max(mesh.bbox().dimensions)), 1.0)
    ok = np.ones(mesh.num_boundary_elements, dtype=bool)
    for c in range(mesh.bdry_elems.shape[1]):
        p = mesh.V[mesh.bdry_elems[:, c]]
        ok &= np.all((p >= box.min - tol) & (p <= box.max + tol), axis=1)
    return np.flatnonzero(ok)


def expression_env(mesh) -> dict:
    """Environment variables available to BC expressions
    (``LinearElasticity.hh:883-894``)."""
    bb = mesh.bbox()
    env = {}
    for i, c in enumerate("xyz"[:mesh.dim]):
        env[f"mesh_size_{c}"] = float(bb.dimensions[i])
        env[f"mesh_min_{c}"] = float(bb.min[i])
        env[f"mesh_max_{c}"] = float(bb.max[i])
    return env
