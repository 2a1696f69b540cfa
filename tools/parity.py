#!/usr/bin/env python3
"""Iteration-count parity vs the reference's solver budgets.

Runs the five BASELINE.md benchmark configurations at rtol 1e-6 through
the public problem-layer API (CPU backend, float64 -- the reference's
PETSc precision) and tabulates outer Krylov iteration counts against the
reference's defaults:

  * stationary Poisson control ... GMRES(10), <= 50 (ref control/control.py:562-568)
  * instationary conv-diff     ... GMRES(10), <= 50 (ref control/control.py:3260-3266)
  * instationary Stokes        ... FGMRES(10), <= 100 (ref control/control.py:4291-4297)
  * instationary Navier-Stokes ... Picard <= 10 outer, FGMRES(10) <= 100 inner
                                   (ref control/control.py:3381-3383,4291-4297)
  * instationary heat          ... GMRES(10), <= 50 (ref control/control.py:3260-3266)

Writes PARITY.md (markdown table) and prints one JSON line per config.

Usage:  python tools/parity.py            # all configs
        PARITY_CONFIGS="poisson heat" python tools/parity.py
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from control_tpu.config import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402
from control_tpu import (Control, UnitSquareMesh, RectangleMesh,  # noqa: E402
                         FunctionSpace, VectorFunctionSpace, Function,
                         DirichletBC, SpatialCoordinate, ConstantNullspace,
                         grad, inner, dot, dx, as_vector, sin, pi)

# (reference default budget, reference anchor)
BUDGETS = {
    "poisson": (50, "control/control.py:562-568 (GMRES(10), rtol 1e-6)"),
    "convdiff": (50, "control/control.py:3260-3266 (GMRES(10))"),
    "stokes": (100, "control/control.py:4291-4297 (FGMRES(10))"),
    "nse": (100, "control/control.py:4291-4297 + :3381-3383 (Picard<=10)"),
    "heat": (50, "control/control.py:3260-3266 (GMRES(10))"),
}


def _sp(linear_solver, max_it, restart=10):
    sp = {"linear_solver": linear_solver, "maximum_iterations": max_it,
          "relative_tolerance": 1.0e-6, "absolute_tolerance": 0.0,
          "monitor_convergence": False}
    if linear_solver in ("gmres", "fgmres"):
        sp[f"{linear_solver}_restart"] = restart
    return sp


def run_poisson():
    """Stationary Poisson control -- the reference's default stationary
    recipe is GMRES(10) + the block-triangular matching-Schur pc
    (control/control.py:540-568; its pc is triangular, so MINRES-style
    symmetric preconditioning is NOT the reference configuration)."""
    mesh = UnitSquareMesh(64, 64, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def fdo(trial, test, u):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test):
        v_d = Function(space).interpolate(sin(pi * X[0]) * sin(pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def ff(test):
        return inner(Function(space), test) * dx

    ctl = Control.Stationary(space, fdo, desired_state=ds_, force_f=ff,
                             beta=1e-4,
                             bcs_v=DirichletBC(space, 0.0, "on_boundary"))
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                     solver_parameters=_sp("gmres", 50),
                     print_error=False, create_output=False, plots=False)
    return ctl.last_solve_info, "gmres(10)", "64^2 Q1, beta=1e-4"


def run_convdiff():
    """Instationary convection-diffusion control (nonsymmetric)."""
    mesh = RectangleMesh(32, 32, 2.0, 2.0, quadrilateral=True)
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

    ctl = Control.Instationary(space, fdo, desired_state=ds_, force_f=ff,
                               beta=1e-2, n_t=8, time_interval=(0.0, 2.0),
                               CN=True, bcs_v=bc_t)
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                     solver_parameters=_sp("gmres", 50),
                     print_error=False, create_output=False, plots=False)
    return ctl.last_solve_info, "gmres(10)", "32^2 Q1 x nt=8, nu=1/50, CN"


def run_stokes():
    """Instationary Stokes control (Taylor-Hood Q2-Q1)."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def fdo(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test, t):
        v_d = Function(space_v).interpolate(
            (0.2 * sin(pi * X[0]) * sin(pi * X[1]),
             0.1 * sin(2 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def ff(test, t):
        return inner(Function(space_v), test) * dx

    def bc_t(s, t):
        return DirichletBC(s, (0.0, 0.0), "on_boundary")

    ctl = Control.Instationary(space_v, fdo, desired_state=ds_, force_f=ff,
                               beta=1e-2, space_p=space_p, n_t=8,
                               time_interval=(0.0, 1.0), CN=True,
                               bcs_v=bc_t)
    ctl.incompressible_linear_solve(
        ConstantNullspace(), lambda_v_bounds=(0.25, 1.5625),
        lambda_p_bounds=(0.25, 2.25), solver_parameters=_sp("fgmres", 100),
        print_error=False, create_output=False, plots=False)
    return ctl.last_solve_info, "fgmres(10)", "8^2 Q2-Q1 x nt=8, CN"


def run_nse():
    """Instationary Navier-Stokes control, Picard iteration."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
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

    ctl = Control.Instationary(space_v, fdo, desired_state=ds_, force_f=ff,
                               beta=1e-1, space_p=space_p, n_t=6,
                               time_interval=(0.0, 1.0), CN=True,
                               bcs_v=bc_t)
    ctl.incompressible_non_linear_solve(
        ConstantNullspace(), lambda_v_bounds=(0.25, 1.5625),
        lambda_p_bounds=(0.25, 2.25), solver_parameters=_sp("fgmres", 100),
        max_non_linear_iter=10,
        print_error_linear=False, print_error_non_linear=False,
        create_output=False, plots=False)
    return ctl.last_solve_info, "fgmres(10), Picard", "8^2 Q2-Q1 x nt=6, nu=0.1"


def run_heat():
    """Instationary heat control -- the flagship bench problem family."""
    mesh = UnitSquareMesh(64, 64, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def fdo(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test, t):
        v_d = Function(space).interpolate(
            jnp.cos(0.0) * sin(pi * X[0]) * sin(pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def ff(test, t):
        return inner(Function(space), test) * dx

    def bc_t(s, t):
        return DirichletBC(s, 0.0, "on_boundary")

    ctl = Control.Instationary(space, fdo, desired_state=ds_, force_f=ff,
                               beta=1e-4, n_t=32, time_interval=(0.0, 2.0),
                               CN=True, bcs_v=bc_t)
    ctl.set_schur_sweep("paradiag")
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                     solver_parameters=_sp("gmres", 50),
                     print_error=False, create_output=False, plots=False)
    return ctl.last_solve_info, "gmres(10), paradiag", "64^2 Q1 x nt=32, CN"


RUNNERS = {"poisson": run_poisson, "convdiff": run_convdiff,
           "stokes": run_stokes, "nse": run_nse, "heat": run_heat}


def main():
    configs = os.environ.get("PARITY_CONFIGS", "").split() or list(RUNNERS)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sidecar = os.path.join(root, "PARITY.json")
    merged = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            merged = {r["config"]: r for r in json.load(f)}
    for name in configs:
        t0 = time.time()
        try:
            info, solver, shape = RUNNERS[name]()
            budget, anchor = BUDGETS[name]
            row = {"config": name, "solver": solver, "shape": shape,
                   "iterations": int(info.iterations),
                   "converged": bool(info.converged),
                   "budget": budget, "reference": anchor,
                   "seconds": round(time.time() - t0, 1)}
        except Exception as e:  # pragma: no cover
            row = {"config": name, "error": f"{type(e).__name__}: {e}"[:200],
                   "seconds": round(time.time() - t0, 1)}
        merged[name] = row
        print("PARITY_JSON:" + json.dumps(row), flush=True)
    rows = [merged[k] for k in RUNNERS if k in merged]
    with open(sidecar, "w") as f:
        json.dump(rows, f, indent=1)

    out = ["# Iteration-count parity vs the reference's budgets",
           "",
           "Generated by `python tools/parity.py` (CPU backend, float64,",
           "rtol 1e-6, atol 0 -- the reference's defaults).  The",
           "reference's budget is its `maximum_iterations` default for the",
           "config; matching it at the same tolerance is the parity gate.",
           "",
           "| config | problem | solver | iterations | ref budget |"
           " converged | reference anchor |",
           "|---|---|---|---|---|---|---|"]
    for r in rows:
        if "error" in r:
            out.append(f"| {r['config']} | — | — | ERROR: {r['error']} |"
                       f" — | — | — |")
        else:
            out.append(
                f"| {r['config']} | {r['shape']} | {r['solver']} |"
                f" **{r['iterations']}** | {r['budget']} |"
                f" {r['converged']} | {r['reference']} |")
    out += ["", f"Total wall time: "
            f"{sum(r['seconds'] for r in rows):.0f} s (1-core host, "
            "includes XLA compilation).", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
