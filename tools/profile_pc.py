#!/usr/bin/env python3
"""Component-level timing of the instationary heat-control preconditioner
(the TPU bench's hot loop): full solve kernel, one outer-operator matvec,
one pc application, and the pc's internals (time-axis DFT matmuls, batched
complex multi-V-cycle, mass Chebyshev, defect-correction factor apply).

Usage:  python tools/profile_pc.py            # 256x256, n_t=64 (bench cfg)
        PROF_N=64 PROF_NT=16 python tools/profile_pc.py

Each component is jitted separately with its real inputs and timed via
models.common.run_kernel (hard-synced through a host copy: the tunneled
axon backend's block_until_ready can return early), best of PROF_REPEATS.
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np
import jax
import jax.numpy as jnp

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

N = int(os.environ.get("PROF_N", "256"))
N_T = int(os.environ.get("PROF_NT", "64"))
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))


def build():
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             Function, DirichletBC, SpatialCoordinate,
                             grad, inner, dx, cos, pi)
    mesh = UnitSquareMesh(N, N, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-4, n_t=N_T, time_interval=(0.0, 2.0),
        CN=True, bcs_v=bc_t)
    # same knobs AND same tuned defaults as bench.py ((3,3) smoothing,
    # 10 mass-Chebyshev steps) so the profile reflects the bench pc
    sm = int(os.environ.get("BENCH_PD_SMOOTH", "3"))
    ctl.set_schur_sweep(
        "paradiag",
        paradiag_cycles=int(os.environ.get("BENCH_PD_CYCLES", "1")),
        smooth=(sm, sm),
        weight_dtype=os.environ.get("BENCH_PD_WEIGHT_DTYPE"))
    ctl.set_mass_solver_steps(int(os.environ.get("BENCH_MASS_STEPS", "10")))
    return ctl, space


def timed(name, fn, *args, results=None):
    """jit fn, run once to compile, then best-of-REPEATS via run_kernel."""
    from control_tpu.models import common
    jfn = jax.jit(fn)
    t0 = time.time()
    common.run_kernel(jfn, *args)
    compile_s = time.time() - t0
    best = {}
    for _ in range(REPEATS):
        common.run_kernel(jfn, *args)
        t = dict(common.LAST_TIMING)
        if not best or t["kernel_s"] < best["kernel_s"]:
            best = t
    row = {"component": name,
           "kernel_ms": round(best["kernel_s"] * 1e3, 3),
           "compile_s": round(compile_s, 2)}
    for k in ("h2d_s", "d2h_s"):
        if k in best:
            row[k.replace("_s", "_ms")] = round(best[k] * 1e3, 3)
    print(json.dumps(row), flush=True)
    if results is not None:
        results.append(row)
    return row


def main():
    from control_tpu.models.common import host_setup, to_device
    from control_tpu.fem.space import homogenize, combine_masks

    with host_setup():
        ctl, space = build()
        bcs = homogenize(ctl._bcs_v[1])
        mask = combine_masks(space, bcs)
        Dv_A = ctl._D_stack(ctl._v.data)
        b00, b01, b10, b11, M = ctl._blocks(Dv_A)
        pc = ctl.construct_pc(False, (0.25, 2.25), mask, Dv_A, M)
        # complex leaves encoded as (re, im) -- on the axon backend,
        # complex DEVICE arrays can neither transfer nor appear as jit
        # constants, so every timed function takes the encoded state as an
        # ARGUMENT and rebuilds its component inside the trace (the same
        # state-as-args pattern as the production solve kernels)
        state = to_device(pc.state)
        v_0 = ctl._initial_state()
        b_0, b_1 = ctl._build_rhs(None, None, v_0, Dv_A, M, mask, False,
                                  ctl._bcs_v)
        from control_tpu.models.instationary import _ParaDiagSweep
        n = ctl._n_t - 1
        tau, beta = ctl._tau, ctl._beta
        c = 0.5 * tau / beta ** 0.5
        M_A = M.A
        F_diag = (0.5 * tau * Dv_A[0] + M_A + c * M_A)[None]
        F_sub = (0.5 * tau * Dv_A[0] - M_A + c * M_A)[None]

    results = []
    dev_b0 = jax.device_put(b_0)
    dev_b1 = jax.device_put(b_1)

    def mk_fwd(fwd_state):
        return _ParaDiagSweep(space, mask, F_diag, F_sub, n,
                              state=fwd_state)

    # 1. one full pc application
    def pc_apply(st, a, b):
        pcx = ctl.construct_pc(False, (0.25, 2.25), mask, Dv_A, M,
                               prebuilt=st)
        return pcx(a, b)
    timed("pc_apply", pc_apply, state, dev_b0, dev_b1, results=results)

    # 2. one ParaDiag sweep solve (fwd): DFT + batched V-cycles + IDFT
    #    (+ 1 defect step = 2 circulant solves + 1 factor apply)
    timed("paradiag_sweep", lambda st, b: mk_fwd(st).solve(b, False),
          state["fwd"], dev_b1, results=results)

    # 3. circulant solve only (no defect correction)
    timed("circulant_solve", lambda st, b: mk_fwd(st)._circulant_solve(b),
          state["fwd"], dev_b1, results=results)

    # 4. DFT pair only
    def dft_pair(st, b):
        fwd = mk_fwd(st)
        g = b.astype(fwd._Wf.dtype)
        ghat = jnp.einsum("kj,j...->k...", fwd._Wf, g,
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.real(jnp.einsum("jk,k...->j...", fwd._Wb, ghat,
                                   precision=jax.lax.Precision.HIGHEST))

    timed("dft_pair", dft_pair, state["fwd"], dev_b1, results=results)

    # 5. batched complex multi-V-cycle only (complex input built in-trace
    # from real planes)
    n_f = n // 2 + 1
    gre = jnp.asarray(np.random.default_rng(0).standard_normal(
        (n_f,) + b_1.shape[1:]), b_1.dtype)
    gim = jnp.asarray(np.random.default_rng(1).standard_normal(
        (n_f,) + b_1.shape[1:]), b_1.dtype)

    def freq_vcycles(st, gr, gi):
        fwd = mk_fwd(st)
        g = gr + 1j * gi
        out = fwd.config.apply(fwd.params, g, cycles=fwd.cycles)
        return jnp.real(out), jnp.imag(out)

    timed("freq_vcycles_x2", freq_vcycles, state["fwd"],
          jax.device_put(gre), jax.device_put(gim), results=results)

    # 6. mass Chebyshev (the (1,1) block solve, 20 its over all blocks)
    from control_tpu.models.common import mass_solver

    def mass_apply(st, b):
        s0 = mass_solver(M, mask, False, (0.25, 2.25), state=st)
        return s0(b)
    timed("mass_chebyshev20", mass_apply, state["solver_0"], dev_b0,
          results=results)

    # 7. defect-correction factor apply
    timed("factor_apply", lambda st, u: mk_fwd(st)._factor_apply(u),
          state["fwd"], dev_b1, results=results)

    # 8. outer KKT operator matvec
    from control_tpu.solvers.block import (MultiBlockSystem,
                                           DirichletBCNullspace)
    with host_setup():
        ns = DirichletBCNullspace(bcs)
        system = MultiBlockSystem(
            space, space, block_00=b00, block_01=b01, block_10=b10,
            block_11=b11, n_blocks_00=n, n_blocks_11=n,
            nullspace_0=tuple(ns for _ in range(n)),
            nullspace_1=tuple(ns for _ in range(n)), CN=True)
    timed("kkt_matvec", lambda a, b: system.mult(a, b), dev_b0, dev_b1,
          results=results)

    total_pc = results[0]["kernel_ms"]
    parts = {r["component"]: r["kernel_ms"] for r in results}
    print(json.dumps({"summary": parts, "pc_total_ms": total_pc,
                      "n": N, "n_t": N_T,
                      "backend": jax.default_backend()}))

    # ---- roofline: analytic bytes/FLOPs per component vs device peaks ----
    # defaults mirror bench.py's tuned configuration (smooth=(3,3),
    # 10 mass-Chebyshev steps) so the model matches what bench measures
    sm = 2 * int(os.environ.get("BENCH_PD_SMOOTH", "3"))
    cycles = int(os.environ.get("BENCH_PD_CYCLES", "1"))
    mass_steps = int(os.environ.get("BENCH_MASS_STEPS", "10"))
    wbytes = 2 if os.environ.get("BENCH_PD_WEIGHT_DTYPE") == "bfloat16" \
        else 4
    est = _roofline_estimates(N, N_T, sm=sm, cycles=cycles,
                              mass_steps=mass_steps, wbytes=wbytes)
    peaks = _device_peaks()
    roof = []
    for r in results:
        name = r["component"]
        if name not in est:
            continue
        bts, fl = est[name]
        t = r["kernel_ms"] / 1e3
        row = {"component": name,
               "est_GB": round(bts / 1e9, 3),
               "est_GFLOP": round(fl / 1e9, 3),
               "achieved_GBps": round(bts / t / 1e9, 1),
               "achieved_TFLOPs": round(fl / t / 1e12, 3)}
        if peaks:
            row["pct_peak_bw"] = round(100 * bts / t / peaks["bw"], 1)
            row["pct_peak_flops"] = round(100 * fl / t / peaks["flops"], 2)
            row["bound"] = ("bandwidth" if row["pct_peak_bw"]
                            >= row["pct_peak_flops"] else "compute")
        roof.append(row)
        print("ROOFLINE:" + json.dumps(row), flush=True)
    if peaks:
        print(json.dumps({"device": peaks["kind"],
                          "peak_GBps": peaks["bw"] / 1e9,
                          "peak_TFLOPs_f32": peaks["flops"] / 1e12,
                          "note": "estimates count HBM-visible traffic; "
                                  "VMEM-resident fused kernels can beat "
                                  "the per-step model"}))


def _device_peaks():
    """Published per-chip peaks (HBM bytes/s, f32 FLOP/s) by device kind;
    override with PROF_PEAK_GBPS / PROF_PEAK_TFLOPS."""
    kind = jax.devices()[0].device_kind.lower()
    table = {
        # kind-substring: (HBM GB/s, f32 TFLOP/s)
        "v5 lite": (819, 49),  "v5e": (819, 49),
        "v5p": (2765, 229),    "v5": (1228, 117),
        "v4": (1228, 137),
        "v6 lite": (1640, 229), "v6e": (1640, 229),
        "cpu": (50, 0.2),
    }
    bw = tf = None
    for key, (b, f) in table.items():
        if key in kind:
            bw, tf = b, f
            break
    bw = float(os.environ.get("PROF_PEAK_GBPS", bw or 0))
    tf = float(os.environ.get("PROF_PEAK_TFLOPS", tf or 0))
    if not bw or not tf:
        return None
    return {"kind": kind, "bw": bw * 1e9, "flops": tf * 1e12}


def _roofline_estimates(N, N_T, K=9, sm=8, cycles=1, mass_steps=20,
                        wbytes=4, fbytes=4):
    """HBM-visible bytes and FLOPs per profiled component (f32 fields,
    2-D Q1 heat bench).  Counting model: every smoothing step of the XLA
    path re-reads the K weight planes and ~3 field planes and writes one;
    complex planes are (re, im) pairs; the V-cycle level sum is the 2-D
    geometric factor 4/3; matmul DFTs are 8 flops per complex MAC."""
    G = (N + 1) ** 2
    n = N_T - 1
    n_f = n // 2 + 1

    def cplx_stencil(batch):
        # bytes: 2K weight planes + ~6 field planes; flops: 8K per point
        return (batch * G * (2 * K * wbytes + 6 * fbytes),
                batch * G * 8 * K)

    def real_stencil(batch):
        return (batch * G * (K * wbytes + 3 * fbytes),
                batch * G * 2 * K)

    # one DFT pair: two (n_f x n) x (n, G) complex-ish matmuls
    dft_b = (n * G + n_f * 2 * G) * fbytes * 2 + n * n_f * 8 * 2
    dft_f = 2 * (8 * n_f * n * G)
    # one batched V-cycle over n_f frequencies: (sm + 2) level-0 complex
    # stencil steps, x 4/3 for the level sum
    vb, vf = cplx_stencil(n_f)
    vcyc = ((sm + 2) * 4 / 3 * vb, (sm + 2) * 4 / 3 * vf)
    freq = (cycles * vcyc[0], cycles * vcyc[1])
    circ = (dft_b + freq[0], dft_f + freq[1])
    fab, faf = real_stencil(2 * n)            # diag + sub factor applies
    sweep = (2 * circ[0] + fab, 2 * circ[1] + faf)
    mb, mf = real_stencil(n * mass_steps)
    mass = (mb, mf)
    kb, kf = real_stencil(6 * n)              # 4 block applies + T scans
    kkt = (kb + 4 * n * G * fbytes, kf + 4 * n * G)
    pc = (mass[0] + 2 * sweep[0] + kkt[0] // 3,
          mass[1] + 2 * sweep[1] + kkt[1] // 3)
    return {"dft_pair": (dft_b, dft_f),
            "freq_vcycles_x2": freq,
            "circulant_solve": circ,
            "paradiag_sweep": sweep,
            "mass_chebyshev20": mass,
            "factor_apply": (fab, faf),
            "kkt_matvec": kkt,
            "pc_apply": pc}


if __name__ == "__main__":
    main()
