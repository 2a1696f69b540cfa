#!/usr/bin/env python3
"""Backward-Euler parity study at flagship scale (VERDICT r4 item #1).

Measures the REFERENCE-RECIPE proxy for the BE heat-control KKT solve:
float64, exact sequential Schur substitutions ("scan" sweeps -- the same
algorithm the reference executes serially via PETSc/BoomerAMG,
control/control.py:2191-2438), 20-step mass Chebyshev, rtol 1e-6, on the
CPU backend.  Sweeps mesh sizes up to the flagship 256^2 x n_t=64 and
records the outer GMRES(10) iteration count for each size -- converged or
not ("preconditioner": True suppresses the non-convergence raise so the
count is observable).

This answers the round-4 open question: does the reference's BE recipe
(epsilon = 1e-3 final-block regularization, control/control.py:2836)
itself converge within its own 50-iteration default budget at the
flagship scale, or is the BE branch intrinsically weaker than CN there?

Usage:
  python tools/be_parity.py                       # ladder: 64, 128, 256
  BE_SIZES="64:64 256:64" python tools/be_parity.py
  BE_MAXIT=200 BE_MODE=paradiag BE_DTYPE=float32 ... (overrides)

Appends one JSON line per size to stdout and merges results into
tools/tpu_results/be_parity.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

_BACKEND = os.environ.get("BE_BACKEND", "cpu")
if _BACKEND == "cpu":
    jax.config.update("jax_platforms", "cpu")
elif os.environ.get("JAX_PLATFORMS"):
    # run on the ambient accelerator; keep "cpu" registered for host setup
    # (same logic as bench.py)
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    jax.config.update("jax_platforms", _plats)
_DTYPE_DEFAULT = "float64" if _BACKEND == "cpu" else "float32"
if os.environ.get("BE_DTYPE", _DTYPE_DEFAULT) == "float64":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from control_tpu.config import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def run_one(n, n_t, dtype_name, mode, maxit,
            restart=int(os.environ.get("BE_RESTART", "10"))):
    import jax.numpy as jnp
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             Function, DirichletBC, SpatialCoordinate,
                             grad, inner, dx, cos, pi)
    from control_tpu.models.common import host_setup

    dtype = jnp.dtype(dtype_name)
    with host_setup():
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
            force_f=force_f, beta=float(os.environ.get("BE_BETA", "1e-4")),
            n_t=n_t, time_interval=(0.0, 2.0), CN=False, bcs_v=bc_t)
        if mode == "paradiag":
            ctl.set_schur_sweep("paradiag")
        else:
            ctl.set_schur_sweep("scan")
        eps = os.environ.get("BE_EPSILON")
        if eps is not None:
            ctl.set_epsilon(float(eps))

    sp = {"linear_solver": "gmres", "gmres_restart": restart,
          "maximum_iterations": maxit,
          "relative_tolerance": 1.0e-6, "absolute_tolerance": 0.0,
          "monitor_convergence": os.environ.get("BE_MONITOR", "0") == "1",
          # record the count instead of raising on budget exhaustion
          "preconditioner": True}
    ir = int(os.environ.get("BE_IR", "0"))
    if ir:
        # mixed-precision iterative refinement: f32 inner solves to the
        # attainable BE_IR_TOL, f64 true-residual corrections on the host
        sp["iterative_refinement"] = ir
        sp["refinement_inner_tolerance"] = float(
            os.environ.get("BE_IR_TOL", "1e-2"))
    t0 = time.time()
    info = ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                            solver_parameters=sp, print_error=False,
                            create_output=False, plots=False)
    wall = time.time() - t0
    rel = float(info.rnorm / info.rnorm0) if info.rnorm0 else 0.0
    if os.environ.get("BE_HIST", "0") == "1":
        import numpy as np
        rs = np.asarray(info.res_norms)
        rs = rs[np.isfinite(rs)]
        idx = np.unique(np.linspace(0, len(rs) - 1,
                                    min(len(rs), 40)).astype(int))
        for i in idx:
            print(f"  hist[{i:4d}] = {rs[i]:.6e}", flush=True)
    row = {"config": f"heat_BE_{n}x{n}_nt{n_t}",
           "n": n, "n_t": n_t, "dtype": dtype_name, "mode": mode,
           "epsilon": float(eps) if eps else 1e-3,
           "beta": float(os.environ.get("BE_BETA", "1e-4")),
           "iterations": int(info.iterations),
           "converged": bool(info.converged),
           "relative_residual": rel, "maxit": maxit,
           "wall_seconds": round(wall, 1),
           "backend": jax.default_backend()}
    if getattr(info, "refinement_steps", None) is not None:
        row["refinement_steps"] = int(info.refinement_steps)
        row["true_residual_rel"] = (float(info.rnorm / info.rhs_norm)
                                    if getattr(info, "rhs_norm", 0)
                                    else rel)
    return row


def main():
    sizes = os.environ.get("BE_SIZES", "64:64 128:64 256:64").split()
    maxit = int(os.environ.get("BE_MAXIT", "200"))
    mode = os.environ.get("BE_MODE", "scan")
    dtype_name = os.environ.get("BE_DTYPE", _DTYPE_DEFAULT)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tpu_results", "be_parity.json")
    merged = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                merged = {r["key"]: r for r in json.load(f)}
        except Exception:
            merged = {}
    for s in sizes:
        n, n_t = (int(x) for x in s.split(":"))
        row = run_one(n, n_t, dtype_name, mode, maxit)
        row["key"] = f"{row['config']}_{mode}_{dtype_name}_eps{row['epsilon']}"
        tag = os.environ.get("BE_TAG")
        if tag:
            row["tag"] = tag
            row["key"] += f"_{tag}"
        merged[row["key"]] = row
        print("BE_PARITY_JSON:" + json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(list(merged.values()), f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
