#!/usr/bin/env python3
"""Sweep the ParaDiag preconditioner's tuning knobs on the heat-control
benchmark config and print one JSON line per variant:

    {"alpha":..., "dc":..., "cycles":..., "smooth":[pre,post],
     "seconds":..., "iterations":..., "rel_res":..., "compile_s":...}

The knobs trade per-application cost against outer-iteration count:
  alpha    -- circulant parameter (error O(alpha) + eps_V/alpha)
  dc       -- defect-correction steps (squares the application error,
              costs one extra circulant solve + factor apply each)
  cycles   -- V-cycles per frequency solve (eps_V)
  smooth   -- (pre, post) Chebyshev steps per V-cycle level

Usage:  python tools/tune_paradiag.py                 # default grid
        TUNE_N=128 TUNE_NT=32 python tools/tune_paradiag.py
        TUNE_GRID='[{"dc":0,"alpha":1e-4}]' python tools/tune_paradiag.py
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon TPU plugin ignores the JAX_PLATFORMS env var; mirror it into
# jax.config BEFORE backend init so CPU runs don't hang on a down tunnel
if os.environ.get("JAX_PLATFORMS"):
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"      # host_setup needs the cpu backend
    jax.config.update("jax_platforms", _plats)
jax.config.update("jax_default_matmul_precision", "highest")
from control_tpu.config import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

N = int(os.environ.get("TUNE_N", "256"))
N_T = int(os.environ.get("TUNE_NT", "64"))
REPEATS = int(os.environ.get("TUNE_REPEATS", "3"))

# modest default grid around the production point (alpha=1e-3, dc=1,
# cycles=2, smooth=(8,8)); one axis at a time to keep compile count low
DEFAULT_GRID = [
    {},                                           # production point
    {"cycles": 1},
    {"cycles": 1, "alpha": 3e-3},
    {"dc": 0, "alpha": 1e-4},
    {"dc": 0, "alpha": 1e-5},
    {"dc": 2, "alpha": 1e-2, "cycles": 1},
    {"smooth": (4, 4)},
    {"smooth": (4, 4), "cycles": 1, "alpha": 3e-3},
    {"smooth": (12, 12), "cycles": 1},
]


def build(n, n_t):
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             Function, DirichletBC, SpatialCoordinate,
                             grad, inner, dx, cos, pi)
    mesh = UnitSquareMesh(n, n, quadrilateral=True)
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

    return Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-4, n_t=n_t, time_interval=(0.0, 2.0),
        CN=True, bcs_v=bc_t)


def main():
    from control_tpu.models.common import host_setup, run_kernel  # noqa
    from control_tpu.models import common as _common

    grid = (json.loads(os.environ["TUNE_GRID"])
            if "TUNE_GRID" in os.environ else DEFAULT_GRID)
    params = {"linear_solver": "gmres", "gmres_restart": 10,
              "maximum_iterations": 50, "relative_tolerance": 1.0e-6,
              "absolute_tolerance": 0.0, "monitor_convergence": False}

    for var in grid:
        with host_setup():
            ctl = build(N, N_T)
            sm = var.get("smooth")
            ctl.set_schur_sweep(
                "paradiag",
                paradiag_alpha=var.get("alpha"),
                paradiag_defect_steps=var.get("dc", 1),
                paradiag_cycles=var.get("cycles", 2),
                smooth=None if sm is None else tuple(sm),
                weight_dtype=var.get("weight_dtype"))
            if var.get("mass_steps") is not None:
                ctl.set_mass_solver_steps(var["mass_steps"])

        def solve():
            return ctl.linear_solve(
                lambda_v_bounds=(0.25, 2.25),
                solver_parameters=dict(params),
                print_error=False, create_output=False, plots=False)

        row = {"alpha": var.get("alpha", 1e-3), "dc": var.get("dc", 1),
               "cycles": var.get("cycles", 2),
               "smooth": list(var.get("smooth", (8, 8))),
               "weight_dtype": var.get("weight_dtype"),
               "mass_steps": var.get("mass_steps", 20),
               "n": N, "n_t": N_T}
        try:
            t0 = time.time()
            info = solve()
            row["compile_s"] = round(time.time() - t0, 2)
            best = None
            for _ in range(REPEATS):
                t1 = time.time()
                info = solve()
                dt = _common.LAST_TIMING.get("kernel_s",
                                             time.time() - t1)
                best = dt if best is None else min(best, dt)
            rel = float(info.rnorm / info.rnorm0) if info.rnorm0 else 0.0
            row.update(seconds=round(float(best), 4),
                       iterations=int(info.iterations),
                       rel_res=float(f"{rel:.3e}"),
                       converged=bool(info.converged),
                       backend=jax.default_backend())
        except Exception as e:  # noqa: BLE001 -- keep sweeping
            row["error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
