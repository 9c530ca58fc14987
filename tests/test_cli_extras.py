"""DeformedCells / MaterialOptimization CLI end-to-end tests."""

import json

import numpy as np
import pytest

from meshfem_tpu.io import meshio
from meshfem_tpu.mesh import generators


@pytest.fixture()
def cell(tmp_path):
    V, F = generators.grid_tri(5, 5)
    p = tmp_path / "cell.msh"
    meshio.save_msh(p, V, F)
    m = tmp_path / "base.material"
    m.write_text(json.dumps({"type": "isotropic_material", "dim": 2,
                             "young": 5.0, "poisson": 0.3}))
    return p, m


def test_deformed_cells_cli(cell, capsys):
    from meshfem_tpu.cli import deformed_cells

    mesh_path, mat_path = cell
    deformed_cells.main([str(mesh_path), "-m", str(mat_path),
                         "--degree", "1",
                         "--jacobian", "1", "0", "0", "1"])
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("moduli:")][0]
    vals = [float(x) for x in line.split()[1:]]
    np.testing.assert_allclose(vals, [5.0, 5.0, 0.3, 5.0 / 2.6], rtol=1e-6)


def test_deformed_cells_stream(cell, capsys, monkeypatch):
    import io
    from meshfem_tpu.cli import deformed_cells

    mesh_path, mat_path = cell
    monkeypatch.setattr("sys.stdin", io.StringIO("1 0 0 1\n"))
    deformed_cells.main([str(mesh_path), "-m", str(mat_path),
                         "--degree", "1", "--parametrizedTransform"])
    out = capsys.readouterr().out
    assert out.count("moduli:") == 1


def test_material_opt_cli(cell, tmp_path, capsys):
    from meshfem_tpu.cli import material_opt
    from meshfem_tpu.io import msh_fields

    mesh_path, _ = cell
    bc = {"regions": [
        {"type": "dirichlet", "value": [0, 0],
         "box%": {"minCorner": [-0.001, -0.001],
                  "maxCorner": [0.001, 1.001]}},
        {"type": "force", "value": [0.2, 0],
         "box%": {"minCorner": [0.999, -0.001],
                  "maxCorner": [1.001, 1.001]}},
        {"type": "target", "value": ["0.05 * x", 0],
         "box%": {"minCorner": [0.999, -0.001],
                  "maxCorner": [1.001, 1.001]}},
    ]}
    bc_path = tmp_path / "opt.bc"
    bc_path.write_text(json.dumps(bc))
    out = tmp_path / "fitted.msh"
    material_opt.main([str(mesh_path), "-b", str(bc_path), "--steps", "12",
                       "--lr", "0.3", "-o", str(out)])
    text = capsys.readouterr().out
    first, last = None, None
    for line in text.splitlines():
        if line.startswith("objective:"):
            parts = line.replace("objective:", "").split("->")
            first, last = float(parts[0]), float(parts[1])
    assert last < 0.2 * first
    fields = msh_fields.read_fields(out)
    assert "young" in fields
