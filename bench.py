#!/usr/bin/env python3
"""Benchmark: one all-at-once KKT solve of the BASELINE heat-control
problem (256x256 mesh, Q1, n_t = 64, Crank-Nicolson, beta = 1e-4, GMRES +
built-in block preconditioner to rtol 1e-6 -- the reference's default
configuration, control/control.py:3260-3266).

Prints ONE JSON line:
  {"metric": ..., "value": seconds_per_solve, "unit": "s",
   "vs_baseline": cpu_proxy_seconds / tpu_seconds}

The measurement goes through the public problem-layer API
(``Control.Instationary(...).linear_solve``): the preconditioner numeric
state is built on the host and passed to one cached compiled kernel as an
argument (large constants baked into the executable overflow the remote
TPU AOT serializer), and repeat solves hit the problem-layer kernel cache.

The baseline proxy is the identical solve run on the CPU backend in f64
with the reference's sequential Schur-substitution algorithm (a serial
Firedrake/PETSc stand-in that flatters the reference: same algorithm, no
Python/PETSc callback overhead, no per-application BoomerAMG re-setup).
The driver's north-star is >= 10x over the CPU reference.
"""

import json
import os
import subprocess
import sys
import time

# benign same-machine AOT-loader feature-mismatch spam (see tests/conftest)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

# full f32 on the MXU: the default (bf16-pass) matmul precision stalls the
# Krylov solve at ~1e-4
import jax  # noqa: E402
if "--cpu-proxy" in sys.argv or "--cpu-measure" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
elif os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin ignores the env var; mirror it into the config
    # (lets BENCH_CONFIG=... runs be forced onto the CPU backend).  Keep
    # "cpu" in the list: host_setup() runs eager problem setup on the host
    # CPU device, and a bare "axon" would deregister the cpu backend
    # entirely (the session env exports JAX_PLATFORMS=axon).
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    jax.config.update("jax_platforms", _plats)
jax.config.update("jax_default_matmul_precision", "highest")

# persistent executable cache: first-call compile (minutes at production
# shapes) becomes a one-time cost per (shape, config) across processes
from control_tpu.config import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

N = int(os.environ.get("BENCH_N", "256"))
N_T = int(os.environ.get("BENCH_NT", "64"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
CPU_SCALE = os.environ.get("BENCH_CPU_N")          # optional smaller proxy


def _heat_problem(n, n_t, dtype_name, mode, CN=None):
    if CN is None:
        CN = os.environ.get("BENCH_CN", "1") != "0"
    import jax.numpy as jnp
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             Function, DirichletBC, SpatialCoordinate,
                             grad, inner, dx, cos, pi)
    dtype = jnp.dtype(dtype_name)
    mesh = UnitSquareMesh(n, n, quadrilateral=True, dtype=dtype)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        f = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(f, test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-4, n_t=n_t, time_interval=(0.0, 2.0),
        CN=CN, bcs_v=bc_t)
    # TPU measurement uses the ParaDiag (alpha-circulant FFT) Schur
    # sweeps; the CPU proxy keeps the reference's sequential substitution
    # algorithm (that IS the baseline being compared against).  With the
    # reorthogonalized Arnoldi the lighter per-frequency solves (1 V-cycle,
    # 4+4 smoothing) hold the same 9 outer iterations at half the pc cost
    # (256^2x64 f32 CPU: 95.5 s -> 47.5 s); env knobs override.
    if mode == "paradiag":
        # round-4 tune sweep (tools/tpu_results/tune_r4.log): (3,3)
        # smoothing + 10 mass-Chebyshev steps hold the same 9 outer
        # iterations at 0.673 s vs 0.706 s for (4,4)+20; heavier variants
        # are not faster, bf16 weight planes double the iterations, and
        # dc=0 diverges (the defect correction is load-bearing)
        sm = int(os.environ.get("BENCH_PD_SMOOTH", "3"))
        ctl.set_schur_sweep(
            "paradiag",
            paradiag_cycles=int(os.environ.get("BENCH_PD_CYCLES", "1")),
            smooth=(sm, sm),
            weight_dtype=os.environ.get("BENCH_PD_WEIGHT_DTYPE"))
    else:
        ctl.set_schur_sweep(mode)
    ms = os.environ.get("BENCH_MASS_STEPS",
                        "10" if mode == "paradiag" else None)
    if ms and mode != "scan":      # the scan proxy keeps the reference's 20
        ctl.set_mass_solver_steps(int(ms))
    return ctl


_SOLVER_PARAMS = {"linear_solver": "gmres",
                  # BE (BENCH_CN=0) on the accelerator needs the longer
                  # restart: f32 noise at flagship scale makes GMRES(10)
                  # restart cycles saw-tooth (tools/tpu_results/
                  # be_parity.json, tags sim/sim-r30); GMRES(30) converges
                  # in 53 iterations at rtol 1e-6
                  "gmres_restart": int(os.environ.get(
                      "BENCH_RESTART",
                      "10" if os.environ.get("BENCH_CN", "1") != "0"
                      else "30")),
                  "maximum_iterations": int(os.environ.get(
                      "BENCH_MAXIT",
                      "50" if os.environ.get("BENCH_CN", "1") != "0"
                      else "100")),
                  "relative_tolerance": 1.0e-6,
                  "absolute_tolerance": 0.0, "monitor_convergence": False}
# BENCH_IR=k: mixed-precision iterative refinement around the f32 device
# solve (f64 true-residual corrections on the host) -- the BE flagship
# needs it on TPU, where the f32 noise floor sits ~1e-2 above rtol
if os.environ.get("BENCH_IR"):
    _SOLVER_PARAMS["iterative_refinement"] = int(os.environ["BENCH_IR"])
    _SOLVER_PARAMS["refinement_inner_tolerance"] = float(
        os.environ.get("BENCH_IR_TOL", "1e-2"))


def heat_time(n, n_t, dtype_name, mode, repeats=REPEATS):
    """(seconds, iterations, rel_res, first_call_seconds) of the heat KKT
    solve through the public API.  Raises on non-convergence/compile
    failure -- callers fall back."""
    from control_tpu.models.common import host_setup
    with host_setup():
        ctl = _heat_problem(n, n_t, dtype_name, mode)

    def solve():
        return ctl.linear_solve(
            lambda_v_bounds=(0.25, 2.25),
            solver_parameters=dict(_SOLVER_PARAMS),
            print_error=False, create_output=False, plots=False)

    from control_tpu.models import common as _common

    t0 = time.time()
    info = solve()
    first_s = time.time() - t0
    times, splits = [], []
    for _ in range(max(1, repeats)):
        t1 = time.time()
        info = solve()
        times.append(time.time() - t1)
        splits.append(dict(_common.LAST_TIMING))
    rel = float(info.rnorm / info.rnorm0) if info.rnorm0 else 0.0
    assert np.isfinite(rel), "solver produced non-finite residual"
    # headline = device solve time (run_kernel's hard-synced execution
    # window); the h2d/d2h fields surface the axon tunnel's per-call
    # transfer overhead, which a locally-attached TPU would not pay
    best = min(range(len(times)),
               key=lambda i: splits[i].get("kernel_s", times[i]))
    if "iterative_refinement" in _SOLVER_PARAMS:
        # refinement interleaves device solves with host f64 residual
        # steps; the honest per-solve figure is end-to-end wall time
        best = min(range(len(times)), key=lambda i: times[i])
        splits[best] = {}
    out = {"seconds": float(splits[best].get("kernel_s", times[best])),
           "end_to_end_seconds": float(times[best]),
           "iterations": int(info.iterations),
           "relative_residual": rel, "compile_seconds": first_s,
           "backend": jax.default_backend(), "dtype": dtype_name,
           "n": n, "n_t": n_t, "schur": mode}
    for k in ("h2d_s", "d2h_s"):
        if k in splits[best]:
            out[k] = round(float(splits[best][k]), 3)
    return out


def _cpu_proxy_seconds():
    """Run the f64 scan-mode proxy in a subprocess (clean backend)."""
    try:
        env = dict(os.environ)
        if CPU_SCALE:
            env["_BENCH_N_OVERRIDE"] = CPU_SCALE
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-proxy"],
            capture_output=True, text=True, timeout=3000, env=env)
        for line in p.stdout.splitlines():
            if line.startswith("CPU_PROXY_JSON:"):
                info = json.loads(line[len("CPU_PROXY_JSON:"):])
                s = info["seconds"]
                if CPU_SCALE:
                    # scale by dof ratio (work is ~linear in dofs)
                    s *= (N / float(CPU_SCALE)) ** 2
                return s, info
    except Exception:
        pass
    return None, None


def _extra_proxy_seconds(config):
    """f64 reference-recipe proxy of a secondary config (bench_extra.py
    --cpu-proxy in a clean-backend subprocess).  Returns (seconds, info)
    or (None, None).  heat3d runs the proxy at BENCH3D_CPU_N (default 32)
    and dof-scales linearly -- matvec/V-cycle work is O(dofs)."""
    if os.environ.get("BENCH_EXTRA_PROXY", "1") == "0":
        return None, None
    env = dict(os.environ)
    env["BENCH_CONFIG"] = config
    scale = 1.0
    if config == "heat3d":
        n_dev = int(env.get("BENCH3D_N", "64"))
        n_cpu = int(env.get("BENCH3D_CPU_N", "32"))
        env["_BENCH3D_N_OVERRIDE"] = str(n_cpu)
        scale = (n_dev / n_cpu) ** 3
    try:
        p = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_extra.py"), "--cpu-proxy"],
            capture_output=True, text=True, env=env,
            timeout=int(os.environ.get("BENCH_EXTRA_PROXY_TIMEOUT",
                                       "5400")))
        for line in p.stdout.splitlines():
            if line.startswith("CPU_PROXY_JSON:"):
                info = json.loads(line[len("CPU_PROXY_JSON:"):])
                return info["seconds"] * scale, info
    except Exception:
        pass
    return None, None


def run_extra(config):
    """Secondary configs (BENCH_CONFIG=poisson|convdiff|stokes|nse|heat3d)
    run through the high-level API twice: the first call pays compilation,
    the second hits the problem-layer solve-kernel cache -- its time is
    the amortized per-solve cost users see.  vs_baseline compares against
    the f64 reference-recipe CPU proxy (same protocol)."""
    t0 = time.time()
    try:
        from bench_extra import build_extra
        from control_tpu.models.common import host_setup
        with host_setup():
            run = build_extra(config)
        info = run()
        first_s = time.time() - t0
        t1 = time.time()
        info = run()
        value = round(time.time() - t1, 3)
        out = {"metric": f"{config}_kkt_solve",
               "value": value, "unit": "s",
               "vs_baseline": 0.0, "iterations": info.iterations,
               "converged": info.converged,
               "first_call_seconds": round(first_s, 2),
               "backend": jax.default_backend()}
        cpu_s, cpu_info = _extra_proxy_seconds(config)
        if cpu_s and value > 0:
            out["vs_baseline"] = round(cpu_s / value, 3)
            out["cpu_proxy_seconds"] = cpu_s
            out["cpu_proxy_iterations"] = cpu_info.get("iterations")
    except Exception as e:  # pragma: no cover
        out = {"metric": f"{config}_kkt_solve", "value": -1.0,
               "unit": "s", "vs_baseline": 0.0,
               "error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))


def measure():
    """Device measurement (runs in a watchdog subprocess: the remote TPU
    tunnel has been observed to HANG indefinitely in backend init or in a
    trivial op -- an in-process attempt would take the whole bench down
    with it).  Prints MEASURE_JSON on success."""
    if "--cpu-measure" in sys.argv:
        # fallback measurement on the CPU backend, f32 + ParaDiag (same
        # algorithm that runs on TPU), possibly at reduced N
        n = int(os.environ.get("_BENCH_N_OVERRIDE", N))
    else:
        n = N
    attempts = [(n, N_T, os.environ.get("BENCH_SCHUR", "paradiag")),
                (n, N_T, "scan"),
                (max(n // 2, 32), N_T, "paradiag")]
    res, errors = None, []
    for n_a, n_t, mode in attempts:
        try:
            res = heat_time(n_a, n_t, "float32", mode)
            break
        except Exception as e:  # noqa: BLE001 -- fall through the ladder
            errors.append(f"{n_a}x{n_t}/{mode}: {type(e).__name__}: {e}"[:160])
    print("MEASURE_JSON:" + json.dumps(
        {"res": res, "errors": errors, "requested_n": n}), flush=True)


def probe():
    """Trivial device op: proves the backend can init + compile + execute.
    The remote tunnel, when down, HANGS in backend init -- the orchestrator
    runs this in a short-timeout subprocess before committing to the full
    (expensive) measurement."""
    import jax.numpy as jnp
    x = jnp.ones((128, 128), jnp.float32)
    y = jnp.asarray(x @ x)
    val = float(np.asarray(y)[0, 0])     # hard sync (tunnel can ack early)
    print("MEASURE_JSON:" + json.dumps(
        {"res": {"probe": val, "backend": jax.default_backend()}}),
        flush=True)


def _run_child(args, timeout, env_extra=None):
    """Run this script with ``args``; return the parsed MEASURE_JSON (or
    None on crash/timeout) plus a short failure tag."""
    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__)]
                           + args, capture_output=True, text=True,
                           timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout}s"
    for line in p.stdout.splitlines():
        if line.startswith("MEASURE_JSON:"):
            return json.loads(line[len("MEASURE_JSON:"):]), None
    return None, f"rc={p.returncode}: {(p.stderr or p.stdout)[-200:]}"


def main():
    cfg = os.environ.get("BENCH_CONFIG")
    flags = {"--cpu-proxy", "--measure", "--cpu-measure", "--probe"}
    if cfg and not flags.intersection(sys.argv):
        run_extra(cfg)
        return
    if "--cpu-proxy" in sys.argv:
        jax.config.update("jax_enable_x64", True)
        n = int(os.environ.get("_BENCH_N_OVERRIDE", N))
        out = heat_time(n, N_T, "float64", "scan", repeats=1)
        print("CPU_PROXY_JSON:" + json.dumps(out))
        return
    if "--measure" in sys.argv or "--cpu-measure" in sys.argv:
        measure()
        return
    if "--probe" in sys.argv:
        probe()
        return

    # ---- orchestrator: never touches the device backend itself ----
    notes = []
    res, errors = None, []
    pr, pfail = _run_child(
        ["--probe"], timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT",
                                                "300")))
    if pr is None:
        errors.append(f"device probe: {pfail}")
    else:
        meas, fail = _run_child(
            ["--measure"], timeout=int(os.environ.get("BENCH_TPU_TIMEOUT",
                                                      "2700")))
        res = meas["res"] if meas else None
        errors += list(meas["errors"]) if meas else []
        if fail:
            errors.append(f"device attempt: {fail}")
    if res is None:
        # TPU path hung or crashed: measure the same f32 ParaDiag solve on
        # the CPU backend at the FULL benchmark size (no dof-scaling: the
        # quadratic-work assumption and the cache behavior both differ
        # across n, so a scaled n=128 point is not a 256 measurement) --
        # an honest same-host algorithmic comparison, labeled backend=cpu.
        # The in-child attempt ladder still steps down to n//2 if the full
        # size fails; only a timeout loses the measurement entirely.
        n_fb = int(os.environ.get("BENCH_FALLBACK_N", str(N)))
        notes.append("tpu unavailable; cpu-backend fallback measurement")
        meas, fail = _run_child(
            ["--cpu-measure"],
            timeout=int(os.environ.get("BENCH_CPU_TIMEOUT", "5400")),
            env_extra={"_BENCH_N_OVERRIDE": str(n_fb)})
        if fail:
            errors.append(f"cpu fallback: {fail}")
        res = meas["res"] if meas else None
    if res is None:
        print(json.dumps({
            "metric": f"heat_control_{N}x{N}_nt{N_T}_kkt_solve",
            "value": -1.0, "unit": "s", "vs_baseline": 0.0,
            "errors": errors}))
        return

    cpu_seconds, _cpu_info = _cpu_proxy_seconds()
    # proxy and measurement are compared at the same effective scale: the
    # proxy is dof-scaled to N inside _cpu_proxy_seconds, and a smaller
    # measurement (internal ladder or cpu fallback) is dof-scaled up here
    scale = (N / res["n"]) ** 2
    seconds = res["seconds"] * scale
    vs = (cpu_seconds / seconds) if cpu_seconds else 0.0
    out = {
        "metric": f"heat_control_{N}x{N}_nt{N_T}_kkt_solve",
        "value": round(seconds, 4),
        "unit": "s",
        "vs_baseline": round(vs, 3),
        "iterations": res["iterations"],
        "relative_residual": res["relative_residual"],
        "compile_seconds": round(res["compile_seconds"], 2),
        "backend": res["backend"],
        "schur": res["schur"],
        "measured_n": res["n"],
        "cpu_proxy_seconds": cpu_seconds,
        "end_to_end_seconds": round(res.get("end_to_end_seconds",
                                            res["seconds"]) * scale, 3),
    }
    for k in ("h2d_s", "d2h_s"):
        if k in res:
            out[k] = res[k]
    if notes:
        out["notes"] = notes
    if errors:
        out["fallback_errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
