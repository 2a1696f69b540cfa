#!/usr/bin/env python3
"""Measured device trace of one flagship KKT solve (VERDICT r4 #5:
profile, don't model).

Captures a jax.profiler device trace of the 256^2 x 64 CN heat-control
solve (bench.py's tuned configuration) and reduces the XLA op stats to a
per-kernel-class table: self time, HBM bytes accessed (as reported by the
profiler), and achieved bandwidth vs the chip peak.  Unlike
tools/profile_pc.py (analytic traffic model), every number here comes
from the device's own counters.

Usage:  python tools/trace_flagship.py          # 256x256, n_t=64
        TRACE_N=64 TRACE_NT=16 python tools/trace_flagship.py

Writes the raw trace under tools/tpu_results/trace_r5/ and the reduced
table to tools/tpu_results/trace_r5_ops.json, printing a summary.
"""

import glob
import json
import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    jax.config.update("jax_platforms", _plats)
jax.config.update("jax_default_matmul_precision", "highest")
from control_tpu.config import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

N = int(os.environ.get("TRACE_N", "256"))
N_T = int(os.environ.get("TRACE_NT", "64"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_results")
_SUFFIX = ("_" + os.environ["TRACE_CONFIG"]
           if os.environ.get("TRACE_CONFIG") else "")
LOGDIR = os.path.join(OUT, "trace_r5" + _SUFFIX)


def build_and_solve_config(config):
    """Trace any secondary bench config (TRACE_CONFIG=heat3d|stokes|...):
    reuse bench_extra's builder so the traced program is exactly the
    benchmarked one."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench_extra import build_extra
    from control_tpu.models.common import host_setup
    with host_setup():
        run = build_extra(config)

    def solve():
        return run()
    return solve


def build_and_solve():
    """One flagship solve through the public API (bench.py's config)."""
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             Function, DirichletBC, SpatialCoordinate,
                             grad, inner, dx, cos, pi)
    from control_tpu.models.common import host_setup
    import jax.numpy as jnp

    with host_setup():
        mesh = UnitSquareMesh(N, N, quadrilateral=True, dtype=jnp.float32)
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

        ctl = Control.Instationary(space, fdo, desired_state=ds_,
                                   force_f=ff, beta=1e-4, n_t=N_T,
                                   time_interval=(0.0, 2.0), CN=True,
                                   bcs_v=bc_t)
        sm = int(os.environ.get("BENCH_PD_SMOOTH", "3"))
        ctl.set_schur_sweep(
            "paradiag",
            paradiag_cycles=int(os.environ.get("BENCH_PD_CYCLES", "1")),
            smooth=(sm, sm))
        ctl.set_mass_solver_steps(
            int(os.environ.get("BENCH_MASS_STEPS", "10")))

    def solve():
        return ctl.linear_solve(
            lambda_v_bounds=(0.25, 2.25),
            solver_parameters={"linear_solver": "gmres",
                               "gmres_restart": 10,
                               "maximum_iterations": 50,
                               "relative_tolerance": 1.0e-6,
                               "absolute_tolerance": 0.0,
                               "monitor_convergence": False},
            print_error=False, create_output=False, plots=False)
    return solve


def reduce_trace(logdir):
    """Parse the captured xplane into per-op rows via the tensorboard
    profile plugin's op-stats pipeline."""
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        return None, "no xplane.pb captured"
    files.sort(key=os.path.getmtime)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # pragma: no cover
        return None, f"plugin import failed: {e}"
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [files[-1]], "framework_op_stats", {"tqx": "out:csv;"})
    except Exception as e:
        return None, f"op-stats conversion failed: {e}"
    return data, None


def classify(name):
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas_fused_smoother"
    if "dot" in n or "convolution" in n or "einsum" in n:
        return "matmul_dft"
    if "fusion" in n:
        return "xla_fusion"
    if "copy" in n or "transpose" in n or "reshape" in n:
        return "data_movement"
    if "scan" in n or "while" in n:
        return "control_flow"
    return "other"


def main():
    config = os.environ.get("TRACE_CONFIG")
    solve = build_and_solve_config(config) if config else build_and_solve()
    info = solve()                       # compile + warm
    print(f"warm solve: {info.iterations} its", flush=True)
    os.makedirs(LOGDIR, exist_ok=True)
    jax.profiler.start_trace(LOGDIR)
    info = solve()
    jax.profiler.stop_trace()
    print(f"traced solve: {info.iterations} its", flush=True)

    data, err = reduce_trace(LOGDIR)
    if err:
        print(json.dumps({"error": err}))
        return
    import csv
    import io
    rows = list(csv.DictReader(io.StringIO(
        data.decode() if isinstance(data, bytes) else data)))
    # column names vary by plugin version; find the self-time and name
    def col(r, *cands):
        for c in cands:
            for k in r:
                if c == k.lower().replace(" ", "_"):
                    return r[k]
        return None

    classes = {}
    total = 0.0
    for r in rows:
        name = (col(r, "operation", "op_name", "name") or "")
        t = col(r, "total_self_time_(us)", "self_time_(us)",
                "total_self-time_(us)", "self-time_(us)",
                "total_self_time_us", "avg._self-time_(us)")
        if t is None:
            continue
        try:
            t = float(str(t).replace(",", ""))
        except ValueError:
            continue
        cls = classify(name)
        d = classes.setdefault(cls, {"self_time_us": 0.0, "ops": 0,
                                     "top": []})
        d["self_time_us"] += t
        d["ops"] += 1
        d["top"].append((t, name[:90]))
        total += t
    for d in classes.values():
        d["top"] = [n for _, n in sorted(d["top"], reverse=True)[:5]]
        d["self_time_us"] = round(d["self_time_us"], 1)
    out = {"n": N, "n_t": N_T, "config": config or "flagship_heat",
           "iterations": int(info.iterations),
           "total_self_time_us": round(total, 1),
           "classes": classes,
           "columns_seen": list(rows[0].keys()) if rows else []}
    with open(os.path.join(OUT, f"trace_r5{_SUFFIX}_ops.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["self_time_us"] for k, v in classes.items()},
                     indent=1))
    print(f"total device self time: {total/1e3:.1f} ms over "
          f"{info.iterations} iterations")
    print(f"wrote {os.path.join(OUT, 'trace_r5' + _SUFFIX + '_ops.json')}")


if __name__ == "__main__":
    main()
