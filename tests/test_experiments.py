"""The experiments/ validation suites stay runnable (tiny arguments).

Full sweeps (reference-scale assertions) run as standalone scripts:
``python experiments/<name>.py``; these smoke tests drive the same code
paths at coarse resolution."""

import os
import sys

import numpy as np
import pytest

EXP = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments")
sys.path.insert(0, EXP)


def test_circular_sector_mesh_and_homog():
    from circular_sector_homog import homogenize_sector, sector_hole

    # reentrant sector polygon has the center vertex
    pts = sector_hole(radius=0.3, nsubdiv=32, skip=6)
    assert np.allclose(pts[0], 0.0)
    Ch, nodes = homogenize_sector(8e-3, radius=0.3, skip=0, degree=1,
                                  nsubdiv=24, tol=1e-8)
    assert Ch.shape == (3, 3)
    assert np.abs(Ch - Ch.T).max() < 1e-7 * np.abs(Ch).max()
    assert np.linalg.eigvalsh(Ch).min() > 0


def test_stress_extrusion_curves():
    from stress_extrusion_validation import (distribution_curve,
                                             curve_distance)
    from extrusion_validation import solve_2d

    mesh2, _, _, vm2 = solve_2d(degree=1, tol=1e-8)
    c2 = distribution_curve(mesh2, vm2)
    assert c2[0][-1] == pytest.approx(1.0)
    assert np.all(np.diff(c2[1]) >= 0)
    assert curve_distance(c2, c2) == 0.0


def test_fit_validation_roundtrips():
    import numpy as _np
    from fit_validation import (check_isotropic_roundtrip,
                                check_orthotropic_roundtrip,
                                check_simulation_roundtrip)

    rng = _np.random.default_rng(0)
    E, nu = check_isotropic_roundtrip(rng, 2)
    assert abs(E - 2.3) < 1e-6 and abs(nu - 0.31) < 1e-6
    fit = check_orthotropic_roundtrip(rng, 3)
    assert abs(fit["mu_xy"] - 0.4) < 1e-6
    du = check_simulation_roundtrip(6, 2)
    assert du < 1e-5


def test_animate_cstrain_outputs(tmp_path):
    import runpy

    old = sys.argv
    sys.argv = ["animate_cstrain.py", "--out", str(tmp_path),
                "--area", "1.5e-2", "--frames", "6"]
    try:
        runpy.run_path(os.path.join(EXP, "animate_cstrain.py"),
                       run_name="__main__")
    finally:
        sys.argv = old
    assert (tmp_path / "cell_cstrain.html").stat().st_size > 1000
    assert (tmp_path / "homogenized_cstrain.html").stat().st_size > 1000
