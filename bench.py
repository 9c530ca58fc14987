"""meshfem_tpu headline benchmark (driver contract: ONE JSON line, rc=0).

Measures on the attached accelerator:
  1. P2 tetrahedral elasticity stiffness assembly throughput (elements/s)
     — fused-MXU element kernel (BASELINE target 5e7 elem/s);
  2. PCG iteration rate at ~1M-DOF P2 elasticity — general routed
     in-register SpMV path (arbitrary meshes, dense-KeB and factored
     isotropic backends A/B) and the lane-packed structured conv path,
     f32; plus solve-to-1e-10 f64 iterative refinement around the f32
     routed CG and the device-resident AMG (the CHOLMOD-role metrics).

Timing methodology (all four rules are load-bearing on this tunneled
backend; each alone was measured to corrupt results by 10-1000x):
  * identical (executable, args) dispatches are memoized by the relay —
    every repetition varies an input scalar;
  * block_until_ready() does NOT force execution — every timed call ends
    in a host readback (float(jnp.sum(...)));
  * each call carries a ~2-40 ms relay round-trip — work is repeated L
    times inside a compiled lax.scan and two trip counts are DIFFERENCED;
  * loop-invariant scan bodies are hoisted by XLA — the carry feeds every
    operand that must stay live.

Artifact contract (round-4 lesson: BENCH_r04 was `parsed: null` because
the JSON line outgrew the driver's 2,000-char stdout tail): stdout gets
ONE COMPACT line — headline fields first, priority-ordered extras, every
error ANSI-stripped and capped at 80 chars, total length <= 1,700 —
while the FULL result (timings, tracebacks' tails, every key) goes to
stderr and ``BENCH_DETAIL.json``.  Sections run in order of evidentiary
value (at-scale refined/AMG right after the general-PCG headline, before
the relay has had minutes to flake) and transient relay faults retry
3x with 60 s backoff.  This script always prints one JSON line and
exits 0.
"""

import json
import os
import re
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

_ANSI = re.compile(r"\x1b\[[0-9;]*[A-Za-z]|\x1b\][^\x07\x1b]*(?:\x07|\x1b\\)")

# stdout-line key order: the driver's 2,000-char tail must always contain
# these, in this order, before any lower-value key is admitted
_PRIORITY = (
    "pcg_iters_per_s_general", "pcg_vs_baseline_1k",
    "pcg_ms_per_iter_general", "pcg_iters_per_s_general_factored",
    "amg_refined_relres", "amg_refined_inner_iters", "amg_refined_solve_s",
    "amg_refined_rounds", "amg_cg_iters", "amg_solve_s_f32", "amg_levels",
    "refined_solve_relres", "refined_solve_rounds",
    "refined_solve_inner_iters",
    "pcg_iters_per_s_structured", "pcg_vs_baseline_1k_structured",
    "structured_cfg",
    "pcg_iters_per_s_general_6rhs_per_rhs", "pcg_6rhs_path",
    "mg_solve_ms_f32", "mg_cg_iters",
    "ball_dofs", "ball_solve_s", "ball_solve_relres",
    "ball_solve_inner_iters", "ball_precond",
    "dofs", "tets", "bench_n", "device", "dtype",
    "assembly_ms_per_call", "contract_kernel_relerr_tpu",
    "routed_backend",
)

_LINE_BUDGET = 1700


def _clean(s, cap=80):
    """ANSI-strip + printable-ASCII + cap — error strings only ever enter
    the artifact through this."""
    s = _ANSI.sub("", str(s))
    s = "".join(ch if 32 <= ord(ch) < 127 else " " for ch in s)
    return s[:cap]


def _resolve_platform(extra):
    """Decide the jax platform BEFORE first backend use.

    Probes backend discovery in a subprocess (bounded by a timeout — the
    relayed TPU plugin hangs hard, not raises, when the tunnel is down),
    retrying with backoff; returns None to use the default platform or
    'cpu' for the degraded fallback.  MESHFEM_BENCH_PLATFORM overrides.
    """
    env_plat = os.environ.get("MESHFEM_BENCH_PLATFORM")
    if env_plat:
        extra["platform_override"] = env_plat
        return env_plat
    probe = ("import jax; d = jax.devices(); "
             "print(d[0].platform, len(d))")
    waits = (0.0, 10.0, 30.0)
    for attempt, wait in enumerate(waits):
        if wait:
            time.sleep(wait)
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=300, text=True)
            if r.returncode == 0 and r.stdout.strip():
                extra["backend_probe"] = _clean(r.stdout.strip(), 40)
                if attempt:
                    extra["backend_probe_attempts"] = attempt + 1
                return None
            extra[f"backend_probe_fail_{attempt}"] = \
                _clean((r.stderr or "")[-300:], 80)
        except subprocess.TimeoutExpired:
            extra[f"backend_probe_fail_{attempt}"] = "timeout(300s)"
        except Exception as e:  # noqa: BLE001
            extra[f"backend_probe_fail_{attempt}"] = _clean(repr(e), 80)
    extra["degraded"] = "cpu-fallback (backend probe failed 3x)"
    return "cpu"


def per_iter(make_f, args, lens=(4, 36), reps=3):
    """RTT-free per-iteration cost of a scan body (seconds).  The two trip
    counts must be chosen so the difference towers over the relay's
    round-trip variance; a non-positive difference reports inf-guarded
    1 ms (flagging a mis-sized measurement rather than inventing a rate)."""
    import jax  # noqa: F401
    import jax.numpy as jnp

    ts = {}
    for L in lens:
        f = make_f(L)
        float(jnp.sum(f(jnp.float32(1.0), *args)))  # warm / compile
        best = []
        for i in range(reps):
            s = jnp.float32(1.0 + 1e-6 * (i + 1))
            t0 = time.time()
            float(jnp.sum(f(s, *args)))
            best.append(time.time() - t0)
        ts[L] = float(np.median(best))
    diff = (ts[lens[1]] - ts[lens[0]]) / (lens[1] - lens[0])
    return diff if diff > 0 else 1e-3


def _section(extra, err_key, fn, retries=3):
    """Run a bench section; retry transient relay faults 3x, 60 s apart.

    The axon relay's compile helper can 500 / the worker can restart
    mid-run (BENCH_r04 lost the at-scale refined/AMG/MG metrics to
    exactly this, twice); bounded retries with a long backoff outlast a
    compile-helper restart without risking an unbounded loop.  Full
    tracebacks go to stderr; the artifact key stays <= 80 chars."""
    for attempt in range(retries + 1):
        try:
            fn()
            return
        except Exception as e:  # noqa: BLE001 — partial metrics beat none
            traceback.print_exc(file=sys.stderr)
            msg = _clean(f"{type(e).__name__}: {e}")
            rep = repr(e)
            transient = any(t in rep for t in (
                "remote_compile", "UNAVAILABLE", "INTERNAL", "DEADLINE",
                "Socket closed", "Connection reset",
                "worker hostname", "worker process"))
            # deterministic failures that also match INTERNAL strings
            if "out of memory" in rep or "RESOURCE_EXHAUSTED" in rep:
                transient = False
            if attempt < retries and transient:
                extra[err_key + "_retry"] = attempt + 1
                time.sleep(60)
                continue
            extra[err_key] = msg
            return


def _emit(out):
    """Full detail to stderr + BENCH_DETAIL.json; one compact priority-
    ordered line (<= _LINE_BUDGET chars) to stdout for the driver."""
    detail = json.dumps(out, default=str)
    sys.stderr.write(detail + "\n")
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAIL.json")
        with open(path, "w") as f:
            f.write(detail + "\n")
    except OSError:
        pass
    extra = out.get("extra", {})
    head = {k: out[k] for k in ("metric", "value", "unit", "vs_baseline")}
    keys = [k for k in _PRIORITY if k in extra]
    keys += [k for k in extra if k not in _PRIORITY and k != "timings"]
    compact = {}
    for k in keys:
        v = extra[k]
        if isinstance(v, str):
            v = _clean(v)
        cand = dict(compact)
        cand[k] = v
        if len(json.dumps({**head, "extra": cand})) <= _LINE_BUDGET:
            compact = cand
    print(json.dumps({**head, "extra": compact}))
    sys.stdout.flush()


def main():
    timings = {}
    extra = {"timings": timings}
    out = {
        "metric": "p2_tet_assembly_elements_per_s",
        "value": 0.0,
        "unit": "elements/s",
        "vs_baseline": 0.0,
        "extra": extra,
    }
    try:
        _run_sections(out, extra, timings)
    except BaseException as e:  # noqa: BLE001 — partial metrics beat none
        extra["error"] = _clean(f"{type(e).__name__}: {e}")
        sys.stderr.write(traceback.format_exc()[-3000:] + "\n")
    _emit(out)


def _run_sections(out, extra, timings):
    platform = _resolve_platform(extra)

    import jax

    if platform:
        # must land before first backend use; the axon TPU platform hangs
        # hard when the relay is down, so this is how offline smoke runs
        # and the automatic degraded fallback both work
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    import meshfem_tpu  # noqa: F401  (x64 + compile cache config)
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.ops import element_matrices as em
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.sparse.ebe import EBEKernel
    from meshfem_tpu.solvers import cg as cg_mod
    from meshfem_tpu.ops.structured import StructuredP2Elasticity

    dt = jnp.float32

    degraded = "degraded" in extra or \
        (platform == "cpu" and not os.environ.get("MESHFEM_BENCH_N"))
    # n=36 (1.167M DOF): even, so the multigrid dyadic chain 36->18->9
    # exists; the general/routed metrics treat the mesh as arbitrary.
    # Degraded CPU fallback shrinks to n=8 (~50k DOF) to stay feasible.
    n = int(os.environ.get("MESHFEM_BENCH_N", "8" if degraded else "36"))
    t0 = time.time()
    V, T = generators.grid_tet(n, n, n)
    mesh = FEMMesh(V, T, degree=2)
    cpu = jax.devices("cpu")[0] if jax.default_backend() != "cpu" else \
        jax.devices()[0]
    with jax.default_device(cpu):
        gl64, vol64 = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
    gl = jnp.asarray(np.asarray(gl64), dt)
    vol = jnp.asarray(np.asarray(vol64), dt)
    D = et.isotropic(3, 200.0, 0.3)
    timings["setup_host_s"] = round(time.time() - t0, 2)
    E = mesh.num_elements
    ndof = mesh.num_nodes * 3
    extra.update(device=_clean(str(jax.devices()[0]), 24), tets=E,
                 dofs=ndof, dtype="float32", bench_n=n)

    # ---- assembly throughput (amortized inside one compiled scan) --------
    M_fused = em.fused_matrix_for(D, 3, 2, dt)
    n_nodes_per_elem = 10
    nd = n_nodes_per_elem * 3
    Ke = em.element_elasticity_fused_apply(gl, vol, M_fused, n_nodes_per_elem)

    def _sec_assembly():
        def mk_asm(L):
            @jax.jit
            def f(s, gl, vol, M_fused):
                # The carry is a FULL [E, (nd)^2] accumulator: every Ke entry
                # is written to HBM each iteration, so XLA cannot collapse the
                # assembly through a linear reduction (sum(gg @ M) factors to
                # sum(gg) @ M and reads as a fake 600M elem/s otherwise).  The
                # measured rate therefore also pays an extra carry read —
                # it is a LOWER bound on assembly throughput.
                def body(c, _):
                    Ke = em.element_elasticity_fused_apply(
                        gl, vol * (s + c[0, 0] * 1e-20), M_fused,
                        n_nodes_per_elem)
                    return c * 0.5 + Ke.reshape(E, nd * nd), None
                c0 = jnp.zeros((E, nd * nd), dt) + s
                return jax.lax.scan(body, c0, None, length=L)[0][:4, :4]
            return f

        t0 = time.time()
        t_asm = per_iter(mk_asm, (gl, vol, M_fused), lens=(2, 10))
        timings["assembly_bench_s"] = round(time.time() - t0, 2)
        elems_per_s = E / t_asm
        out["value"] = round(elems_per_s, 1)
        out["vs_baseline"] = round(elems_per_s / 5e7, 4)
        extra["assembly_ms_per_call"] = round(t_asm * 1e3, 3)

    _section(extra, "assembly_error", _sec_assembly)

    # ---- general-path PCG (routed in-register SpMV) -----------------------
    # The PRODUCT path for arbitrary unstructured meshes: RoutedEBE builds
    # its own internal RCB/first-touch ordering from coordinates, so the
    # bench mesh is deliberately left in reference numbering.
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), dt)
    free = jnp.ones((mesh.num_nodes, 3), dt)
    state = {"rk": None, "b_i": None}

    def mk_cg(L):
        @jax.jit
        def f(s, rk, b, diag, free):
            return cg_mod.cg_operator_fixed(rk, b * s, diag, free,
                                            iters=L).x
        return f

    def _sec_cg_general():
        from meshfem_tpu.sparse.routed_ebe import RoutedEBE, PlanesOp

        t0 = time.time()
        # block_rhs=6 up front: ONE operator (one KeB copy in HBM) serves
        # both the single-vector CG and the 6-RHS block section — a
        # second build for the block plans OOMed HBM in the r5 prep run
        rk = RoutedEBE.build(Ke, np.asarray(mesh.elem_nodes),
                             mesh.num_nodes, 3,
                             coords=np.asarray(mesh.node_positions),
                             block_rhs=None if degraded else 6)
        timings["routed_plan_build_s"] = round(time.time() - t0, 2)
        state["rk"] = rk
        b_i = rk.permute_in(b)
        state["b_i"] = b_i
        # PLANE-NATIVE CG: vectors stay [d, N] end to end, skipping the
        # two [N, d] transposes RoutedEBE.__call__ pays per apply
        diag_p = rk.diagonal_planes()
        b_p = b_i.T
        free_p = jnp.ones_like(b_p)

        t0 = time.time()
        t_gen = per_iter(mk_cg, (PlanesOp(rk), b_p, diag_p, free_p),
                         lens=(2, 12))
        timings["cg_general_bench_s"] = round(time.time() - t0, 2)
        pcg_general = 1.0 / t_gen
        extra["pcg_iters_per_s_general"] = round(pcg_general, 1)
        extra["pcg_ms_per_iter_general"] = round(t_gen * 1e3, 3)
        extra["routed_backend"] = "dense-KeB"
        extra["cg_layout"] = "planes"
        # headline PCG ratio is the GENERAL (arbitrary-mesh) path; the
        # structured grid path is reported separately below
        extra["pcg_vs_baseline_1k"] = round(pcg_general / 1e3, 4)

    _section(extra, "cg_general_error", _sec_cg_general)
    rk = state["rk"]

    # ---- factored isotropic routed backend (A/B vs dense KeB) ------------
    # The reference's optimized perElementStiffness hot loop
    # (LinearElasticity.hh:165-232) analog: grad_lambda + volume (13 f32)
    # per element instead of the 900-f32 dense Ke, contracted by the fused
    # Pallas kernel (sparse/contract.py).  Reported A/B against dense-KeB;
    # also records the Mosaic lowering's on-hardware accuracy vs the
    # dense apply (the interpret path is CPU-tested; this is the real
    # chip check).
    def _sec_factored():
        from meshfem_tpu.sparse.routed_ebe import RoutedEBE, PlanesOp

        lm = et.lame_parameters(D)
        t0 = time.time()
        rkf = RoutedEBE.build(None, np.asarray(mesh.elem_nodes),
                              mesh.num_nodes, 3,
                              coords=np.asarray(mesh.node_positions),
                              factor=(gl, vol, lm[0], lm[1], 2))
        timings["factored_build_s"] = round(time.time() - t0, 2)
        if rk is not None:
            u_i = state["b_i"]
            yd = rk(u_i)
            yf = rkf(u_i)
            rel = float(jnp.abs(yf - yd).max() / jnp.abs(yd).max())
            extra["contract_kernel_relerr_tpu"] = float(f"{rel:.2e}")
        diag_fp = rkf.diagonal_planes()
        b_fp = rkf.permute_in(b).T
        t_f = per_iter(mk_cg, (PlanesOp(rkf), b_fp,
                               diag_fp, jnp.ones_like(b_fp)),
                       lens=(2, 12))
        extra["pcg_iters_per_s_general_factored"] = round(1.0 / t_f, 1)
        timings["cg_factored_ms_per_iter"] = round(t_f * 1e3, 3)

    if not degraded:
        _section(extra, "factored_error", _sec_factored)

    # (the f32 gather-pyramid EBE fallback is built lazily inside the
    # 6-RHS section's non-routed branch only — every resident GB counts:
    # the r5 prep run OOMed 15.75G HBM with it and a duplicate KeB live)

    # ---- solve-to-tolerance: f64 refinement around the f32 routed CG ------
    # The reference's CHOLMOD role (all-f64 solve); target 1e-8 fields on
    # the DEVICE path.  Fix one face, load the opposite one, solve to
    # 1e-10 relative residual and report rounds + achieved residual.
    # RUNS EARLY (right after the headline PCG sections): BENCH_r03/r04
    # lost exactly these at-scale numbers to late-run relay flakes.
    from meshfem_tpu.solvers.refine import refine as mp_refine

    X = np.asarray(mesh.node_positions)
    fixed_nodes = X[:, 0] < 1e-9
    fixed = np.zeros((mesh.num_nodes, 3), bool)
    fixed[fixed_nodes] = True
    free64 = jnp.asarray(~fixed, jnp.float64)
    load = np.zeros((mesh.num_nodes, 3))
    load[X[:, 0] > X[:, 0].max() - 1e-9, 1] = -1.0
    b64 = jnp.asarray(load, jnp.float64) * free64
    kern64 = EBEKernel.build(jnp.asarray(np.asarray(Ke), jnp.float64),
                             mesh.elem_nodes, mesh.num_nodes, 3)
    apply_hi = lambda x: kern64(x) * free64

    def _sec_refined():
        if rk is None:
            raise RuntimeError("routed kernel unavailable")
        diag_i = rk.diagonal()
        free32_i = rk.permute_in(jnp.asarray(~fixed, dt))
        safe_i = jnp.where(diag_i > 0, diag_i, 1.0)

        def solve_lo(r32):
            res = cg_mod.cg(rk, rk.permute_in(r32) * free32_i,
                            M_inv=lambda r: r / safe_i,
                            project=lambda v: v * free32_i,
                            tol=1e-4, maxiter=20000)
            return rk.permute_out(res.x), res.iters

        t0 = time.time()
        ref = mp_refine(apply_hi, solve_lo, b64, tol=1e-10)
        timings["refined_solve_s"] = round(time.time() - t0, 2)
        extra["refined_solve_relres"] = float(f"{ref.resnorm:.3e}")
        extra["refined_solve_rounds"] = ref.rounds
        extra["refined_solve_inner_iters"] = ref.inner_iters

    _section(extra, "refined_solve_error", _sec_refined)

    # ---- device-resident unstructured multigrid (solvers/amg.py) ---------
    # The CHOLMOD role on ARBITRARY meshes: multilevel V-cycle (P2 routed ->
    # nested P1 routed -> aggregation -> dense), f64-refined to 1e-10 —
    # bounded inner iterations at 1.17M DOF with zero host callbacks.
    def _sec_amg():
        from meshfem_tpu.solvers.amg import UnstructuredMG

        # duck-typed stand-in for the simulator: a FULL ElasticitySimulator
        # at this scale allocates ~4 GB of f64 element data (Ke + EBE
        # pyramid) that the AMG build never touches — the r5 prep run
        # OOMed HBM on exactly that (UnstructuredMG.build reads mesh,
        # geom, D, dof_map, Ke row sums, K_diagonal)
        class _SimShim:
            pass

        sim_a = _SimShim()
        sim_a.mesh = mesh
        sim_a.geom = type("G", (), {"grad_lambda": gl64,
                                    "volume": vol64})()
        sim_a.D = D
        sim_a.Ke = Ke
        sim_a.elem_dofs = jnp.asarray(np.asarray(mesh.elem_nodes))
        sim_a.dof_map = np.arange(mesh.num_nodes)
        sim_a.num_dofs = mesh.num_nodes
        sim_a.dim = 3
        sim_a.dirichlet_mask = fixed
        sim_a.K_diagonal = lambda: rk.permute_out(rk.diagonal())
        t0 = time.time()
        amg = UnstructuredMG.build(sim_a, fixed_mask=fixed, rk=rk)
        timings["amg_build_s"] = round(time.time() - t0, 2)
        b32a = jnp.asarray(load, dt)
        t0 = time.time()
        ua, ra = amg.solve(b32a, tol=1e-5, maxiter=200)
        jax.block_until_ready(ua)
        timings["amg_first_solve_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        ua2, ra2 = amg.solve(b32a * 1.0001, tol=1e-5, maxiter=200)
        jax.block_until_ready(ua2)
        extra["amg_solve_s_f32"] = round(time.time() - t0, 2)
        extra["amg_cg_iters"] = int(ra2.iters)
        extra["amg_levels"] = 2 + len(amg.levels)

        def solve_lo_amg(r32):
            u, r = amg.solve(r32, tol=1e-4, maxiter=150)
            return u, r.iters

        t0 = time.time()
        refa = mp_refine(apply_hi, solve_lo_amg, b64, tol=1e-10)
        extra["amg_refined_solve_s"] = round(time.time() - t0, 2)
        extra["amg_refined_relres"] = float(f"{refa.resnorm:.3e}")
        extra["amg_refined_inner_iters"] = refa.inner_iters
        extra["amg_refined_rounds"] = refa.rounds

    _section(extra, "amg_error", _sec_amg)

    # multi-RHS block CG (homogenization's 6 cell problems): routed
    # multi-RHS when available — the routing plan is RHS-independent so
    # the lane gathers amortize across the 6 columns.
    def _sec_cg6():
        m_rhs = 6
        rng = np.random.default_rng(0)
        B6 = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3, m_rhs)), dt)
        if rk is not None and hasattr(rk, "apply_block"):
            # block plans (all 6 columns x 3 components through ONE
            # index stream) were built into rk up front
            rk_b = rk
            extra["pcg_6rhs_block_planes"] = bool(rk.bm == m_rhs)
            B6_i = rk_b.permute_in(B6)
            diag6 = rk_b.diagonal()
            free6 = jnp.ones((mesh.num_nodes, 3), dt)

            def mk_cg6(L):
                @jax.jit
                def f(s, rk, B6, diag, free):
                    from meshfem_tpu.solvers.cg import cg_fixed_iters
                    safe = jnp.where(diag > 0, diag, 1.0)[..., None]
                    proj = lambda v: v * free[..., None]
                    return cg_fixed_iters(rk.apply_block, B6 * s,
                                          M_inv=lambda r: r / safe,
                                          project=proj, iters=L).x
                return f

            t0 = time.time()
            t_gen6 = per_iter(mk_cg6, (rk_b, B6_i, diag6, free6),
                              lens=(2, 12))
            extra["pcg_6rhs_path"] = "routed-block-planes"
        else:
            def mk_cg6(L):
                @jax.jit
                def f(s, kern, B6, diag, free):
                    from meshfem_tpu.solvers.cg import cg_fixed_iters
                    safe = jnp.where(diag > 0, diag, 1.0)[..., None]
                    proj = lambda v: v * free[..., None]
                    return cg_fixed_iters(kern, B6 * s,
                                          M_inv=lambda r: r / safe,
                                          project=proj, iters=L).x
                return f

            kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
            diag = kern.diagonal()
            t0 = time.time()
            t_gen6 = per_iter(mk_cg6, (kern, B6, diag, free), lens=(2, 12))
            extra["pcg_6rhs_path"] = "ebe"
        timings["cg_general6_bench_s"] = round(time.time() - t0, 2)
        extra["pcg_iters_per_s_general_6rhs_per_rhs"] = \
            round(m_rhs / t_gen6, 1)

    _section(extra, "cg_general6_error", _sec_cg6)

    # ---- lane-packed structured conv path ---------------------------------
    def _sec_structured():
        op = StructuredP2Elasticity.build(mesh, D, dtype=dt)
        bp = op.to_packed(b)
        valid = op.valid_mask_packed().astype(dt)
        diagp = op.diagonal_packed().astype(dt)

        def mk_cgs(L):
            @jax.jit
            def f(s, op, bp, valid, diagp):
                project = lambda v: v * valid
                safe = jnp.where(diagp > 0, diagp, 1.0)
                return cg_mod.cg_fixed_iters(
                    op.apply_packed, bp * s, M_inv=lambda r: r / safe,
                    project=project, iters=L).x
            return f

        # The structured iteration is ~0.1-0.4 ms: the trip-count difference
        # must tower over the +-10-20 ms relay round-trip variance, so
        # compare 16 vs 816 iterations (~200-300 ms of signal).
        t0 = time.time()
        t_str = per_iter(mk_cgs, (op, bp, valid, diagp), lens=(16, 816),
                         reps=5)
        timings["cg_structured_bench_s"] = round(time.time() - t0, 2)
        pcg_structured = 1.0 / t_str
        extra["pcg_iters_per_s_structured"] = round(pcg_structured, 1)
        extra["pcg_ms_per_iter_structured"] = round(t_str * 1e3, 3)
        extra["pcg_vs_baseline_1k_structured"] = round(pcg_structured / 1e3,
                                                       4)
        # cross-round comparability (round-4 lesson: r2 2367.5 vs r4
        # 1294.8 it/s had no config on the record to tell why — probe
        # verdict: packed conv spatial dims n+1: (36,36) -> 2393 it/s,
        # (37,37) -> 1292 it/s on v5e; shape-dependent XLA conv tiling,
        # not a regression)
        extra["structured_cfg"] = (
            f"n={n} P2 f32 conv 16/816 {jax.default_backend()}; "
            f"shape-dep: n35 2393 n36 1292 it/s")

    _section(extra, "cg_structured_error", _sec_structured)

    # ---- structured geometric multigrid (ops/structured_mg.py) -----------
    # The CHOLMOD-role solve for structured grids: V-cycle-preconditioned
    # CG (f32, HIGHEST-precision convs) + f64 refinement to 1e-10.  Only
    # meaningful on even n (dyadic chain); report warm-solve wall-clock.
    def _sec_mg():
        from meshfem_tpu.ops.structured_mg import StructuredMG

        t0 = time.time()
        mg = StructuredMG.build(mesh, D, fixed_mask=jnp.asarray(fixed),
                                dtype=dt)
        timings["mg_build_s"] = round(time.time() - t0, 2)
        b32 = jnp.asarray(load, dt) * jnp.asarray(~fixed, dt)
        t0 = time.time()
        u_mg, res_mg = mg.solve(b32, tol=3e-5)
        jax.block_until_ready(u_mg)
        timings["mg_first_solve_s"] = round(time.time() - t0, 2)
        best = np.inf
        for s_ in (1.0001, 1.0002):
            t0 = time.time()
            u2, r2 = mg.solve(b32 * s_, tol=3e-5)
            jax.block_until_ready(u2)
            best = min(best, time.time() - t0)
        extra["mg_solve_ms_f32"] = round(best * 1e3, 1)
        extra["mg_cg_iters"] = int(res_mg.iters)
        timings["mg_levels"] = [list(l.n3) for l in mg.levels]

        # f64-refined MG solve to 1e-10 (full CHOLMOD parity on device)
        def solve_lo_mg(r32):
            u, r = mg.solve(r32, tol=1e-4, maxiter=120)
            return u, r.iters

        t0 = time.time()
        refm = mp_refine(apply_hi, solve_lo_mg, b64, tol=1e-10)
        extra["mg_refined_solve_s"] = round(time.time() - t0, 2)
        extra["mg_refined_relres"] = float(f"{refm.resnorm:.3e}")
        extra["mg_refined_rounds"] = refm.rounds

    if n % 2 == 0:
        _section(extra, "mg_error", _sec_mg)

    # ---- real unstructured mesh: solve-to-tolerance wall-clock ------------
    # ball.msh subdivided 2x (~170k DOF): the reference's own example
    # geometry, solved end-to-end through the simulator's auto path
    # (routed SpMV + f64 refinement on TPU) — the user-facing
    # "CHOLMOD-replacement" number for arbitrary meshes.
    def _sec_ball():
        from meshfem_tpu.io import meshio
        from meshfem_tpu.mesh import filters
        from meshfem_tpu.physics import ElasticitySimulator, Material

        Vb, Tb = meshio.load("/root/reference/examples/meshes/ball.msh")
        n_subdiv = 1 if "degraded" in extra else 2
        for _ in range(n_subdiv):
            Vb, Tb = filters.subdivide(Vb, Tb)
        bmesh = FEMMesh(Vb, Tb, degree=2)
        bsim = ElasticitySimulator(bmesh, Material.isotropic(3, 200.0, 0.3))
        Xb = np.asarray(bmesh.node_positions)
        zmin = Xb[:, 2].min()
        bsim.dirichlet_mask[Xb[:, 2] < zmin + 0.05 * np.ptp(Xb[:, 2])] = True
        lb = np.zeros((bmesh.num_nodes, 3))
        lb[Xb[:, 2] > Xb[:, 2].max() - 0.05 * np.ptp(Xb[:, 2]), 0] = 1.0
        bsim.neumann_load = jnp.asarray(lb)
        ball_precond = "amg" if jax.default_backend() == "tpu" else "jacobi"
        t0 = time.time()
        ub, rb = bsim.solve(tol=1e-10, operator="auto",
                            precond=ball_precond)
        jax.block_until_ready(ub)
        t_first = time.time() - t0
        t0 = time.time()
        ub2, rb2 = bsim.solve(tol=1e-10, extra_load=jnp.asarray(lb) * 1e-4,
                              operator="auto", precond=ball_precond)
        jax.block_until_ready(ub2)
        timings["ball_solve_first_s"] = round(t_first, 2)
        extra.update(
            ball_dofs=bmesh.num_nodes * 3,
            ball_precond=ball_precond,
            ball_solve_s=round(time.time() - t0, 2),
            ball_solve_relres=float(f"{float(rb2.resnorm):.3e}"),
            ball_solve_inner_iters=int(rb2.iters),
        )

    _section(extra, "ball_error", _sec_ball)


if __name__ == "__main__":
    main()
