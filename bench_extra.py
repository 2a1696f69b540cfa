"""Secondary BASELINE benchmark configs (BENCH_CONFIG=poisson|convdiff|
stokes|nse|heat3d): one KKT solve each through the public problem-layer
API, plus the matching f64 CPU reference proxy.

Device measurement: float32, ParaDiag sweeps where the config is
instationary (the TPU algorithm).  Proxy (``--cpu-proxy`` / the
``build_extra(..., proxy=True)`` path): float64 + exact sequential scan
sweeps on the CPU backend -- the same algorithm the reference executes
serially through PETSc/BoomerAMG, so ``vs_baseline`` compares against an
honest same-host stand-in for the reference stack (same pattern as the
flagship proxy in bench.py).

Size knobs: BENCH_STOKES_N / BENCH_STOKES_NT (default 64 x 32 -- the
production shape; 16:16 reproduces the round-4 toy artifact),
BENCH3D_N / BENCH3D_NT, BENCH3D_CPU_N (reduced-size 3-D proxy,
dof-scaled linearly -- V-cycle/matvec work is O(dofs)).
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

# the backend/dtype config must land before control_tpu touches jax state
if __name__ == "__main__" and "--cpu-proxy" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from control_tpu import (Control, UnitSquareMesh, RectangleMesh,
                         FunctionSpace, VectorFunctionSpace, Function,
                         DirichletBC, SpatialCoordinate, ConstantNullspace,
                         grad, inner, dot, dx, as_vector, sin, pi)


def _instationary_sweeps(ctl, proxy):
    """Schur-sweep selection: reference-recipe scan for the proxy, the
    ParaDiag TPU algorithm for the device measurement (same split as the
    flagship bench.py)."""
    if proxy:
        ctl.set_schur_sweep("scan")
        return
    mode = os.environ.get("BENCH_EXTRA_SCHUR", "paradiag")
    if mode == "paradiag":
        sm = os.environ.get("BENCH_PD_SMOOTH")
        ctl.set_schur_sweep(
            "paradiag",
            paradiag_cycles=(int(os.environ["BENCH_PD_CYCLES"])
                             if os.environ.get("BENCH_PD_CYCLES")
                             else None),
            smooth=(int(sm), int(sm)) if sm else None,
            weight_dtype=os.environ.get("BENCH_PD_WEIGHT_DTYPE"))
    else:
        ctl.set_schur_sweep(mode)
    ms = os.environ.get("BENCH_MASS_STEPS")
    if ms:
        ctl.set_mass_solver_steps(int(ms))


def build_extra(config, proxy=False):
    dtype = jnp.float64 if proxy else jnp.float32
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
        # instationary convection-diffusion control (nonsymmetric)
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
        if proxy:
            ctl.set_schur_sweep("scan")

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
        # instationary Stokes control (Taylor-Hood Q2-Q1).  Default is the
        # production shape 64^2 x 32 (VERDICT r4 #2); BENCH_STOKES_N=16
        # BENCH_STOKES_NT=16 reproduces the round-4 toy artifact.
        n_s = int(os.environ.get("BENCH_STOKES_N", "64"))
        nt_s = int(os.environ.get("BENCH_STOKES_NT", "32"))
        mesh = UnitSquareMesh(n_s, n_s, quadrilateral=True, dtype=dtype)
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
                                   n_t=nt_s, time_interval=(0.0, 1.0),
                                   CN=True, bcs_v=bc_t)
        _instationary_sweeps(ctl, proxy)
        if os.environ.get("CONTROL_TPU_FUSED_INCOMPRESSIBLE") == "1":
            ctl.set_incompressible_execution("fused")
        elif os.environ.get("CONTROL_TPU_FUSED_INCOMPRESSIBLE") == "0":
            ctl.set_incompressible_execution("host")

        def run():
            ctl.incompressible_linear_solve(
                ConstantNullspace(),
                lambda_v_bounds=(0.25, 1.5625),
                lambda_p_bounds=(0.25, 2.25),
                solver_parameters={"linear_solver": "fgmres",
                                   "fgmres_restart": 10,
                                   "maximum_iterations": 100,
                                   "relative_tolerance": 1.0e-6,
                                   "absolute_tolerance": 0.0,
                                   "monitor_convergence": False},
                print_error=False, create_output=False, plots=False)
            return ctl.last_solve_info
        return run

    if config == "nse":
        # instationary Navier-Stokes Picard control: the nonlinear loop
        # re-linearises every outer step, exercising the state-as-argument
        # host-loop programs (one compiled executable across all Picard
        # iterations)
        mesh = UnitSquareMesh(12, 12, quadrilateral=True, dtype=dtype)
        space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
        space_p = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)
        nu = 0.1

        def fdo(trial, test, u, t):
            return (nu * inner(grad(trial), grad(test)) * dx
                    + inner(dot(grad(trial), u), test) * dx)

        def ds_(test, t):
            v_d = Function(space_v).interpolate(
                (0.2 * sin(pi * X[0]) * sin(pi * X[1]),
                 0.1 * sin(2 * pi * X[0]) * sin(pi * X[1])))
            return inner(v_d, test) * dx, v_d

        def ff(test, t):
            return inner(Function(space_v), test) * dx

        def bc_t(s, t):
            return DirichletBC(s, (0.0, 0.0), "on_boundary")

        ctl = Control.Instationary(space_v, fdo, desired_state=ds_,
                                   force_f=ff, beta=1e-1, space_p=space_p,
                                   n_t=8, time_interval=(0.0, 1.0),
                                   CN=True, bcs_v=bc_t)
        if proxy:
            ctl.set_schur_sweep("scan")

        def run():
            ctl.incompressible_non_linear_solve(
                ConstantNullspace(),
                lambda_v_bounds=(0.25, 1.5625),
                lambda_p_bounds=(0.25, 2.25),
                solver_parameters={"linear_solver": "fgmres",
                                   "fgmres_restart": 10,
                                   "maximum_iterations": 100,
                                   "relative_tolerance": 1.0e-6,
                                   "absolute_tolerance": 0.0,
                                   "monitor_convergence": False},
                max_non_linear_iter=5,
                print_error_linear=False, print_error_non_linear=False,
                create_output=False, plots=False)
            return ctl.last_solve_info
        return run

    if config == "heat3d":
        # 3-D instationary heat control (capability extension; 64^3 Q1,
        # n_t=16, CN, ParaDiag sweeps).  The proxy runs at BENCH3D_CPU_N
        # (default 32) and is dof-scaled linearly by the caller.
        n3 = int(os.environ.get("_BENCH3D_N_OVERRIDE",
                                os.environ.get("BENCH3D_N", "64")))
        nt3 = int(os.environ.get("BENCH3D_NT", "16"))
        from control_tpu import UnitCubeMesh
        mesh = UnitCubeMesh(n3, n3, n3, dtype=dtype)
        space = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)

        def fdo(trial, test, u, t):
            return inner(grad(trial), grad(test)) * dx

        def ds_(test, t):
            v_d = Function(space).interpolate(
                sin(pi * X[0]) * sin(pi * X[1]) * sin(pi * X[2]))
            return inner(v_d, test) * dx, v_d

        def ff(test, t):
            return inner(Function(space), test) * dx

        def bc_t(s, t):
            return DirichletBC(s, 0.0, "on_boundary")

        ctl = Control.Instationary(space, fdo, desired_state=ds_,
                                   force_f=ff, beta=1e-4, n_t=nt3,
                                   time_interval=(0.0, 2.0), CN=True,
                                   bcs_v=bc_t)
        _instationary_sweeps(ctl, proxy)

        def run():
            ctl.linear_solve(
                lambda_v_bounds=(0.125, 3.375),
                solver_parameters={"linear_solver": "gmres",
                                   "gmres_restart": 10,
                                   "maximum_iterations": 50,
                                   "relative_tolerance": 1.0e-6,
                                   "absolute_tolerance": 0.0,
                                   "monitor_convergence": False},
                print_error=False, create_output=False, plots=False)
            return ctl.last_solve_info
        return run

    raise ValueError(f"unknown BENCH_CONFIG {config!r}")


def _cpu_proxy_main(config):
    """Run the f64 reference-recipe proxy of ``config`` on the CPU backend
    and print CPU_PROXY_JSON (first call pays compilation; the timed
    second call is the amortized per-solve cost, matching the device
    measurement protocol in bench.py::run_extra).  The backend config is
    applied at import time (see the top of this module)."""
    from control_tpu.models.common import host_setup
    with host_setup():
        run = build_extra(config, proxy=True)
    info = run()                      # compile + first solve
    t0 = time.time()
    info = run()                      # cached executable
    out = {"seconds": round(time.time() - t0, 3),
           "iterations": int(info.iterations),
           "converged": bool(info.converged),
           "backend": jax.default_backend(), "dtype": "float64",
           "mode": "scan"}
    print("CPU_PROXY_JSON:" + json.dumps(out), flush=True)


if __name__ == "__main__":
    cfg = os.environ.get("BENCH_CONFIG")
    if not cfg:
        sys.exit("set BENCH_CONFIG")
    if "--cpu-proxy" in sys.argv:
        _cpu_proxy_main(cfg)
    else:
        sys.exit("use bench.py (BENCH_CONFIG set) for the device path")
