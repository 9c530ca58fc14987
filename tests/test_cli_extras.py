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


def test_msh_processor_extended_ops(tmp_path, capsys):
    """Round-2 msh_processor op set: reductions, smatrix ops, transfer,
    sampling, expression/generate, stack manipulation."""
    import numpy as np
    from meshfem_tpu.mesh import generators
    from meshfem_tpu.io import meshio
    from meshfem_tpu.cli import msh_processor as mp

    V, F = generators.grid_tri(4, 4)
    V3 = np.hstack([V, np.zeros((len(V), 1))])
    path = tmp_path / "m.msh"
    u = np.stack([V[:, 0] ** 2, -V[:, 1]], axis=1)
    stress = np.stack([V[F].mean(1)[:, 0], V[F].mean(1)[:, 1],
                       0 * V[F].mean(1)[:, 0]], axis=1)
    meshio.save_msh(path, V3, F, fields=[
        {"name": "u", "data": u, "where": "node", "kind": "vector"},
        {"name": "stress", "data": stress, "where": "element",
         "kind": "vector"}])

    out = tmp_path / "o.msh"
    mp.main([str(path),
             "-e", "u", "norm", "outer:max", "print",
             "-e", "u", "elementAverage", "rename:uavg", "print",
             "-e", "stress", "vonMises", "smoothedElementField",
             "rename:vm_nodal", f"outMSH:{out}",
             "-e", "u", "norm", "percentile:90", "print",
             "-e", "stress", "eigenvalues", "maxMag", "outer:mean", "print",
             "-e", "generate:volume", "sum", "print",
             "-e", "expression:x*x+y", "outer:max", "print",
             "-e", "u", "sample:0.5,0.5", "norm", "print",
             ])
    cap = capsys.readouterr().out
    assert "wrote" in cap
    # total area of the unit square
    assert any(abs(float(line.rsplit(" ", 1)[-1]) - 1.0) < 1e-12
               for line in cap.splitlines() if line.startswith("sum"))
    # sampled norm of u at (0.5, 0.5): |(0.25, -0.5)|
    expect = np.hypot(0.25, 0.5)
    assert any(abs(float(line.rsplit(" ", 1)[-1]) - expect) < 1e-9
               for line in cap.splitlines() if line.startswith("norm(sample"))
    fields = __import__("meshfem_tpu.io.msh_fields",
                        fromlist=["read_fields"]).read_fields(str(out))
    assert "vm_nodal" in fields


def test_tools_round2_generators(tmp_path, capsys):
    """Round-2 tool CLIs: plus_shape, cursor, clip, selector, bc_debug,
    import_voxels_raw, gen_bar_with_shell, extract_ortho_cell,
    isotropic_validation, triangulate."""
    import json
    import numpy as np
    from meshfem_tpu.cli import tools
    from meshfem_tpu.io import meshio, msh_fields
    from meshfem_tpu.mesh import generators

    # plus_shape
    plus = tmp_path / "plus.msh"
    tools.main(["plus_shape", "1.0", "1.0", "0.4", "0.4", "-o", str(plus),
                "--area", "0.01"])
    V, F = meshio.load(plus)
    X = V[:, :2][F]
    a2, b2 = X[:, 1] - X[:, 0], X[:, 2] - X[:, 0]
    area = float(np.abs(a2[:, 0] * b2[:, 1] - a2[:, 1] * b2[:, 0]).sum() / 2)
    # plus shape area: 2 strips minus overlap = a*h1 + b*h2 - h1*h2
    assert abs(area - (0.4 + 0.4 - 0.16)) < 0.05

    # cursor
    cur = tmp_path / "cursor.obj"
    tools.main(["cursor", "0 0 0", "1 2 3", "-o", str(cur)])
    txt = cur.read_text()
    assert txt.count("\nl ") + txt.startswith("l ") == 12 or \
        sum(1 for ln in txt.splitlines() if ln.startswith("l ")) == 6

    # voxels
    raw = tmp_path / "vox.raw"
    occ = np.zeros((3, 3, 3), np.uint8)
    occ[1, 1, 1] = 255
    raw.write_bytes(occ.tobytes())
    vox = tmp_path / "vox.msh"
    tools.main(["import_voxels_raw", str(raw), "3", "3", "3",
                "-o", str(vox)])
    Vv, Tv = meshio.load(vox)
    assert len(Tv) == 6  # one occupied cube -> 6 tets

    # clip + selector
    src = tmp_path / "grid.msh"
    tools.main(["grid", "4", "4", "-o", str(src)])
    clipped = tmp_path / "clip.msh"
    tools.main(["clip", str(src), "--min", "0", "0", "--max", "0.5", "1.0",
                "-o", str(clipped)])
    Vc, Fc = meshio.load(clipped)
    assert Vc[:, 0].max() <= 0.5 + 1e-9
    sel = tmp_path / "sel.msh"
    tools.main(["selector", str(src), "--min", "0", "0", "--max",
                "0.5", "1.0", "-o", str(sel)])
    f = msh_fields.read_fields(str(sel))
    assert "selected_nodes" in f and f["selected_nodes"]["data"].sum() > 0

    # bc_debug
    bcf = tmp_path / "c.bc"
    bcf.write_text(json.dumps({"regions": [
        {"type": "dirichlet", "value": [0, 0, 0],
         "box": {"minCorner": [0, 0, 0], "maxCorner": [0, 1, 0]}}]}))
    dbg = tmp_path / "dbg.msh"
    tools.main(["bc_debug", str(src), str(bcf), "-o", str(dbg)])
    f2 = msh_fields.read_fields(str(dbg))
    assert f2["dirichlet_components"]["data"].max() == 2.0

    # gen_bar_with_shell
    bar = tmp_path / "bar.msh"
    tools.main(["gen_bar_with_shell", "2", "2", "2", "-o", str(bar)])
    f3 = msh_fields.read_fields(str(bar))
    mat = f3["material"]["data"]
    assert 0 < mat.sum() < len(mat)

    # extract_ortho_cell
    cell = tmp_path / "cell.off"
    Vg, Fg = generators.grid_tri(4, 4)
    full = tmp_path / "full.off"
    meshio.save(full, Vg, Fg)
    tools.main(["extract_ortho_cell", str(full), "-o", str(cell)])
    Vo, Fo = meshio.load(cell)
    assert Vo[:, 0].min() >= 0.5 - 1e-9 and Vo[:, 1].min() >= 0.5 - 1e-9

    # isotropic_validation (homogeneous material -> distance ~ 0)
    capsys.readouterr()
    tools.main(["isotropic_validation", str(src), "--degree", "1"])
    out = capsys.readouterr().out
    dist = float(out.strip().splitlines()[-1].rsplit(" ", 1)[-1])
    assert dist < 1e-8


def test_mesh_convert_pipeline_flags(tmp_path, capsys):
    """Round-2 mesh_convert flags: info/boundary/scale-translate/truncate/
    sort/extraMesh (mesh_convert.cc:56-90)."""
    import numpy as np
    from meshfem_tpu.cli import tools, mesh_convert
    from meshfem_tpu.io import meshio

    src = tmp_path / "g.msh"
    tools.main(["grid3d", "3", "3", "3", "-o", str(src)])
    capsys.readouterr()

    # info only
    mesh_convert.main([str(src), "--info"])
    out = capsys.readouterr().out
    assert "vertices" in out and "bbox" in out

    # boundary extraction: surface of a box = 2*6*n^2 tris
    bnd = tmp_path / "b.off"
    mesh_convert.main([str(src), str(bnd), "--boundary"])
    Vb, Fb = meshio.load(bnd)
    assert Fb.shape[1] == 3 and len(Fb) == 2 * 6 * 9

    # translate-then-scale
    ts = tmp_path / "ts.msh"
    mesh_convert.main([str(src), str(ts), "--Tx", "1.0", "--Sx", "2.0"])
    Vt, _ = meshio.load(ts)
    assert abs(Vt[:, 0].min() - 2.0) < 1e-12 and \
        abs(Vt[:, 0].max() - 4.0) < 1e-12

    # truncate + sorts + extraMesh merge
    tr = tmp_path / "tr.msh"
    mesh_convert.main([str(src), str(tr), "--truncateElements", "10",
                       "--sortVertices", "--sortElementCorners",
                       "--sortElements", "--clean"])
    _, Ft = meshio.load(tr)
    assert len(Ft) == 10
    assert np.all(np.diff(Ft, axis=1) >= 0)

    mg = tmp_path / "mg.msh"
    mesh_convert.main([str(src), str(mg), "--extraMesh", str(src),
                       "--clean"])
    Vm, Fm = meshio.load(mg)
    assert len(Fm) == 2 * 6 * 27


def test_import_bo_geometry(tmp_path):
    """Bo Zhu ascii voxel import (tools/import_bo_geometry.cc): header +
    0/1 grid -> tet mesh of only the occupied voxels."""
    from meshfem_tpu.cli import tools as tools_cli
    from meshfem_tpu.io import meshio

    # 2 slices x 2 rows x 3 cols, an L of 4 occupied voxels
    txt = "2 2 3\n" \
          "1 1 0  0 0 0\n" \
          "1 0 0  1 0 0\n"
    inp = tmp_path / "bo.txt"
    inp.write_text(txt)
    out = tmp_path / "bo.msh"
    tools_cli.main(["import_bo_geometry", str(inp), str(out)])
    V, T = meshio.load(out)
    assert T.shape[1] == 4                     # tets
    # 4 voxels x 6 tets each (or 5 — per voxels_to_simplices scheme)
    assert len(T) in (4 * 5, 4 * 6)
    # volume equals the 4 occupied unit voxels
    from meshfem_tpu.mesh.geometry import simplex_geometry
    import jax.numpy as jnp

    _, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
    assert abs(float(jnp.sum(jnp.abs(vol))) - 4.0) < 1e-9
    # bad token count errors out
    (tmp_path / "bad.txt").write_text("2 2 3\n1 0\n")
    import pytest

    with pytest.raises(SystemExit):
        tools_cli.main(["import_bo_geometry", str(tmp_path / "bad.txt"),
                        str(out)])
