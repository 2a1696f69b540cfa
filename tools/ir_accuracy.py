#!/usr/bin/env python3
"""On-TPU accuracy artifact (VERDICT r4 #8): run one mixed-precision
iterative-refinement solve of the heat-control KKT system on the chip and
compare against the f64 CPU reference solution.

Config: 64^2 Q1, n_t=32, CN, beta=1e-4 (the reference's exact-solution
test scale family; gates test/test_control.py:116-119 assert 1e-13 in
full f64 -- the refinement target here is <= 1e-10 true-residual-backed
error at f32 device-solve speed).

  IR_BACKEND=device python tools/ir_accuracy.py     # TPU measurement
  IR_BACKEND=cpu    python tools/ir_accuracy.py     # control run

Writes tools/tpu_results/ir_accuracy_r5.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BACKEND = os.environ.get("IR_BACKEND", "device")
if _BACKEND == "cpu" or "--ref" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
elif os.environ.get("JAX_PLATFORMS"):
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    jax.config.update("jax_platforms", _plats)
jax.config.update("jax_default_matmul_precision", "highest")

from control_tpu.config import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

N = int(os.environ.get("IR_N", "64"))
N_T = int(os.environ.get("IR_NT", "32"))


def build(dtype_name):
    import jax.numpy as jnp
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             Function, DirichletBC, SpatialCoordinate,
                             grad, inner, dx, cos, pi)
    dtype = jnp.dtype(dtype_name)
    mesh = UnitSquareMesh(N, N, quadrilateral=True, dtype=dtype)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def fdo(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test, t):
        v_d = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(v_d, test) * dx, v_d

    def ff(test, t):
        return inner(Function(space), test) * dx

    def bc_t(s, t):
        return DirichletBC(s, 0.0, "on_boundary")

    ctl = Control.Instationary(space, fdo, desired_state=ds_, force_f=ff,
                               beta=1e-4, n_t=N_T, time_interval=(0.0, 2.0),
                               CN=True, bcs_v=bc_t)
    ctl.set_schur_sweep("paradiag")
    return ctl


def solve(ctl, ir_steps):
    sp = {"linear_solver": "gmres", "gmres_restart": 10,
          "maximum_iterations": 100, "relative_tolerance": 1.0e-6,
          "absolute_tolerance": 0.0, "monitor_convergence": False}
    if ir_steps:
        sp["iterative_refinement"] = ir_steps
        sp["refinement_inner_tolerance"] = float(
            os.environ.get("IR_TOL", "1e-5"))
        # drive the refinement to the f64-achievable floor
        sp["relative_tolerance"] = float(os.environ.get("IR_RTOL", "1e-12"))
    t0 = time.time()
    info = ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                            solver_parameters=sp, print_error=False,
                            create_output=False, plots=False)
    return info, time.time() - t0


def _ref_path():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tpu_results", f"ir_ref_{N}x{N_T}.npz")


def ref_main():
    """f64 CPU reference solve at rtol 1e-12, written to an npz
    (runs in its own clean-backend subprocess)."""
    from control_tpu.models.common import host_setup, x64_context
    with x64_context():
        with host_setup():
            ctl64 = build("float64")
        sp64 = {"linear_solver": "gmres", "gmres_restart": 10,
                "maximum_iterations": 200, "relative_tolerance": 1.0e-12,
                "absolute_tolerance": 0.0, "monitor_convergence": False}
        info64 = ctl64.linear_solve(lambda_v_bounds=(0.25, 2.25),
                                    solver_parameters=sp64,
                                    print_error=False, create_output=False,
                                    plots=False)
        np.savez(_ref_path(), v=np.asarray(ctl64._v.data, np.float64),
                 zeta=np.asarray(ctl64._zeta.data, np.float64),
                 iterations=info64.iterations)
    print(f"f64 reference: {info64.iterations} its -> {_ref_path()}",
          flush=True)


def main():
    from control_tpu.models.common import host_setup
    import subprocess
    if not os.path.exists(_ref_path()):
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--ref"], capture_output=True, text=True,
                           timeout=3000, env=dict(os.environ))
        if p.returncode != 0:
            sys.exit(f"reference solve failed: {p.stderr[-400:]}")
        print(p.stdout.strip().splitlines()[-1], flush=True)
    ref = np.load(_ref_path())
    v64, z64 = ref["v"], ref["zeta"]
    info64_its = int(ref["iterations"])

    rows = []
    for ir_steps in (0, int(os.environ.get("IR_STEPS", "6"))):
        with host_setup():
            ctl = build("float32")
        info, wall = solve(ctl, ir_steps)
        if ir_steps and getattr(info, "x0_f64", None) is not None:
            # the refined f64 iterate itself (stored trajectories are cast
            # back to the f32 space dtype); CN solves for blocks 1..n_t-1
            # and zeta blocks 0..n_t-2
            v = np.asarray(info.x0_f64, np.float64)
            z = np.asarray(info.x1_f64, np.float64)
            vr, zr = v64[1:], z64[:-1]
        else:
            v = np.asarray(ctl._v.data, dtype=np.float64)
            z = np.asarray(ctl._zeta.data, dtype=np.float64)
            vr, zr = v64, z64
        ev = float(np.max(np.abs(v - vr)) / max(np.max(np.abs(vr)), 1e-30))
        ez = float(np.max(np.abs(z - zr)) / max(np.max(np.abs(zr)), 1e-30))
        row = {"ir_steps": ir_steps, "iterations": int(info.iterations),
               "converged": bool(info.converged),
               "wall_seconds": round(wall, 2),
               "rel_err_v_vs_f64": ev, "rel_err_zeta_vs_f64": ez,
               "backend": jax.default_backend()}
        if getattr(info, "refinement_steps", None) is not None:
            row["refinement_steps"] = int(info.refinement_steps)
            row["true_residual_rel"] = (float(info.rnorm / info.rhs_norm)
                                        if getattr(info, "rhs_norm", 0)
                                        else None)
        rows.append(row)
        print("IR_ACCURACY_JSON:" + json.dumps(row), flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tpu_results", "ir_accuracy_r5.json")
    with open(out_path, "w") as f:
        json.dump({"n": N, "n_t": N_T,
                   "f64_reference_iterations": info64_its,
                   "runs": rows}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    if "--ref" in sys.argv:
        ref_main()
    else:
        main()
