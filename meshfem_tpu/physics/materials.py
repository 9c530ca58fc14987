"""Material models and ``.material`` JSON parsing.

Parity with reference ``Materials.hh/.cc``: isotropic
(``Materials.cc:121-123,196-198``), orthotropic 2D/3D (``:128-162``), and
general anisotropic materials, constant or per-element fields, with
optimization bounds (``Materials.hh:41-100``).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..fem import elasticity_tensor as et
from ..fem.flattening import flat_len


@dataclasses.dataclass
class Material:
    """A constant material: wraps an elasticity tensor D plus metadata."""

    dim: int
    D: jnp.ndarray
    density: float = 1.0
    type: str = "anisotropic"
    params: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def isotropic(cls, dim: int, young: float, poisson: float,
                  density: float = 1.0) -> "Material":
        return cls(dim, et.isotropic(dim, young, poisson), density,
                   "isotropic", {"young": young, "poisson": poisson})

    @classmethod
    def orthotropic(cls, dim: int, moduli, density: float = 1.0) -> "Material":
        return cls(dim, et.orthotropic(dim, list(moduli)), density,
                   "orthotropic", {"moduli": list(moduli)})

    @classmethod
    def anisotropic(cls, dim: int, D, density: float = 1.0) -> "Material":
        D = jnp.asarray(np.asarray(D, dtype=np.float64))
        fl = flat_len(dim)
        if D.shape != (fl, fl):
            raise ValueError(f"anisotropic D must be {fl}x{fl}")
        return cls(dim, 0.5 * (D + D.T), density, "anisotropic")

    @property
    def tensor(self) -> et.ElasticityTensor:
        return et.ElasticityTensor(self.D)


def parse_material(data: dict) -> Material:
    """Parse the reference's ``.material`` JSON schema
    (e.g. ``examples/materials/B9Creator.material``)."""
    mtype = data.get("type", "isotropic_material")
    dim = int(data.get("dim", 3))
    density = float(data.get("density", 1.0))
    if "isotropic" in mtype:
        return Material.isotropic(dim, float(data["young"]),
                                  float(data["poisson"]), density)
    if "orthotropic" in mtype:
        if dim == 2:
            m = [data["young_x"], data["young_y"],
                 data["poisson_yx"], data["shear_xy"]]
        else:
            m = [data["young_x"], data["young_y"], data["young_z"],
                 data["poisson_yx"], data["poisson_zx"], data["poisson_zy"],
                 data["shear_yz"], data["shear_zx"], data["shear_xy"]]
        return Material.orthotropic(dim, [float(v) for v in m], density)
    if "anisotropic" in mtype:
        fl = flat_len(dim)
        raw = np.asarray(data["material_matrix"], dtype=np.float64)
        return Material.anisotropic(dim, raw.reshape(fl, fl), density)
    raise ValueError(f"unknown material type {mtype!r}")


def load_material(path) -> Material:
    return parse_material(json.loads(Path(path).read_text()))


def save_material(mat: Material, path) -> None:
    if mat.type == "isotropic":
        data = {"type": "isotropic_material", "dim": mat.dim,
                "density": mat.density, **mat.params}
    elif mat.type == "orthotropic":
        keys2 = ["young_x", "young_y", "poisson_yx", "shear_xy"]
        keys3 = ["young_x", "young_y", "young_z", "poisson_yx", "poisson_zx",
                 "poisson_zy", "shear_yz", "shear_zx", "shear_xy"]
        keys = keys2 if mat.dim == 2 else keys3
        data = {"type": "orthotropic_material", "dim": mat.dim,
                "density": mat.density,
                **dict(zip(keys, mat.params["moduli"]))}
    else:
        data = {"type": "anisotropic_material", "dim": mat.dim,
                "density": mat.density,
                "material_matrix": np.asarray(mat.D).tolist()}
    Path(path).write_text(json.dumps(data, indent=2))


@dataclasses.dataclass
class MaterialField:
    """Per-element materials (reference ``MaterialField.hh``): D [E, fl, fl],
    optionally driven by shared variables for optimization."""

    dim: int
    D: jnp.ndarray  # [E, fl, fl]

    @classmethod
    def constant(cls, dim: int, D, num_elements: int) -> "MaterialField":
        D = jnp.asarray(D)
        return cls(dim, jnp.broadcast_to(D, (num_elements,) + D.shape))

    @classmethod
    def isotropic_field(cls, dim: int, young, poisson) -> "MaterialField":
        """young/poisson: [E] arrays of per-element moduli (differentiable —
        this is the material-optimization parameterization)."""
        return cls(dim, et.isotropic(dim, jnp.asarray(young),
                                     jnp.asarray(poisson)))
