"""CLI end-to-end smoke tests (Simulate_cli / Poisson_cli /
PeriodicHomogenization_cli / mesh_convert / msh_processor parity)."""

import json

import numpy as np
import pytest

from meshfem_tpu.io import meshio, msh_fields
from meshfem_tpu.mesh import generators


@pytest.fixture()
def cantilever(tmp_path):
    V, F = generators.grid_tri(8, 4, hi=(2.0, 1.0))
    mesh_path = tmp_path / "bar.msh"
    meshio.save_msh(mesh_path, V, F)
    mat = {"type": "isotropic_material", "dim": 2, "young": 200.0,
           "poisson": 0.35}
    mat_path = tmp_path / "mat.material"
    mat_path.write_text(json.dumps(mat))
    bc = {"regions": [
        {"type": "dirichlet", "value": [0, 0],
         "box%": {"minCorner": [-0.001, -0.001],
                  "maxCorner": [0.001, 1.001]}},
        {"type": "force", "value": [0, -10],
         "box%": {"minCorner": [0.999, -0.001],
                  "maxCorner": [1.001, 1.001]}},
    ]}
    bc_path = tmp_path / "bc.bc"
    bc_path.write_text(json.dumps(bc))
    return mesh_path, mat_path, bc_path


def test_simulate_cli(cantilever, tmp_path, capsys):
    from meshfem_tpu.cli import simulate

    mesh_path, mat_path, bc_path = cantilever
    out = tmp_path / "out.msh"
    dump = tmp_path / "K.txt"
    simulate.main([str(mesh_path), "-m", str(mat_path), "-b", str(bc_path),
                   "-o", str(out), "--degree", "2",
                   "--dumpMatrix", str(dump)])
    captured = capsys.readouterr().out
    assert "solved" in captured
    fields = msh_fields.read_fields(out)
    assert {"u", "strain", "stress", "von_mises", "load"} <= set(fields)
    u = msh_fields.vector_field(fields, "u", 2)
    assert u[:, 1].min() < -0.01   # deflects downward
    header = dump.read_text().splitlines()[0].split()
    assert int(header[0]) == int(header[1])


def test_poisson_cli(tmp_path, capsys):
    from meshfem_tpu.cli import poisson as poisson_cli

    V, F = generators.grid_tri(6, 6)
    mesh_path = tmp_path / "sq.off"
    meshio.save_off(mesh_path, V, F)
    bc = {"regions": [
        {"type": "dirichlet", "value": ["sin(pi * x)", 0, 0],
         "box%": {"minCorner": [-0.001, 0.999],
                  "maxCorner": [1.001, 1.001]}},
        {"type": "dirichlet", "value": [0, 0, 0],
         "box%": {"minCorner": [-0.001, -0.001],
                  "maxCorner": [1.001, 0.001]}},
    ]}
    bc_path = tmp_path / "p.bc"
    bc_path.write_text(json.dumps(bc))
    out = tmp_path / "u.msh"
    poisson_cli.main([str(mesh_path), "-b", str(bc_path), "-o", str(out)])
    fields = msh_fields.read_fields(out)
    u = msh_fields.scalar_field(fields, "u")
    assert u.max() <= 1.0 + 1e-9 and u.min() >= -1e-6


def test_homogenize_cli(tmp_path, capsys):
    from meshfem_tpu.cli import homogenize as hom_cli

    V, F = generators.grid_tri(6, 6)
    mesh_path = tmp_path / "cell.msh"
    meshio.save_msh(mesh_path, V, F)
    mat_path = tmp_path / "m.material"
    mat_path.write_text(json.dumps(
        {"type": "isotropic_material", "dim": 2, "young": 5.0,
         "poisson": 0.3}))
    hom_cli.main([str(mesh_path), "-m", str(mat_path), "--degree", "1"])
    outtext = capsys.readouterr().out
    assert "Homogenized elasticity tensor" in outtext
    # Homogeneous cell: anisotropy ~ 0, Ex ~ 5.
    for line in outtext.splitlines():
        if line.startswith("Ex"):
            assert abs(float(line.split("=")[1]) - 5.0) < 1e-6
        if line.startswith("anisotropy"):
            assert float(line.split("=")[1]) < 1e-6


def test_mesh_convert_cli(tmp_path, capsys):
    from meshfem_tpu.cli import mesh_convert

    V, F = generators.grid_tri(3, 3, hi=(0.5, 0.5))
    src = tmp_path / "q.obj"
    meshio.save_obj(src, V, F)
    out = tmp_path / "full.msh"
    mesh_convert.main([str(src), str(out), "--reflect", "--subdivide", "1"])
    V2, F2 = meshio.load(out)
    assert len(F2) == 4 * 4 * len(F)


def test_msh_processor_cli(cantilever, tmp_path, capsys):
    from meshfem_tpu.cli import simulate, msh_processor

    mesh_path, mat_path, bc_path = cantilever
    out = tmp_path / "out.msh"
    simulate.main([str(mesh_path), "-m", str(mat_path), "-b", str(bc_path),
                   "-o", str(out), "--degree", "1"])
    capsys.readouterr()
    msh_processor.main([str(out), "-e", "u", "norm", "max", "print"])
    val = float(capsys.readouterr().out.strip().splitlines()[-1]
                .rsplit(" ", 1)[-1])
    assert val > 0.01
    msh_processor.main([str(out), "-e", "stress", "vonmises", "mean",
                        "print"])
    vm = float(capsys.readouterr().out.strip().splitlines()[-1]
               .rsplit(" ", 1)[-1])
    assert vm > 0
