"""ParaDiag (alpha-circulant FFT) Schur substitutions.

The sequential scan sweep implements the reference's per-block
substitution algorithm exactly (reference control/control.py:2051-2189);
ParaDiag replaces it with n//2+1 batched complex-frequency solves.  Tests:
(a) on a single-level hierarchy (dense coarse inverse = exact per-block
solves) the only ParaDiag error is the O(alpha) circulant term; (b) the
full heat-control KKT solve converges with the same outer iteration count
and the same solution as the scan mode.
"""

import numpy as np
import jax.numpy as jnp

from control_tpu import (Control, UnitSquareMesh, FunctionSpace, Function,
                         TrialFunction, TestFunction, SpatialCoordinate,
                         DirichletBC, grad, inner, dx, cos, pi)
from control_tpu.fem.assemble import assemble
from control_tpu.fem.space import homogenize, combine_masks
from control_tpu.models.instationary import (_SweepSolver, _ParaDiagSweep,
                                             _BEParaDiagSweep)


def test_alpha_circulant_exactness():
    """Single-level MG = exact per-block solves; ParaDiag then matches the
    exact block-bidiagonal solve to O(alpha)."""
    mesh = UnitSquareMesh(6, 6, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(space), TestFunction(space)
    bc = DirichletBC(space, 0.0, "on_boundary")
    mask = combine_masks(space, (bc,))
    K = assemble(inner(grad(u), grad(v)) * dx).A
    M = assemble(inner(u, v) * dx).A
    F = (0.05 * K + 2.5 * M)[None]           # Toeplitz diagonal factor
    S = (0.05 * K - 0.4 * M)[None]           # sub-diagonal factor
    n = 9
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((n,) + space.grid_shape))
    b = jnp.where(mask[None], 0.0, b)

    scan = _SweepSolver(space, mask, F, S)
    para = _ParaDiagSweep(space, mask, F, S, n, alpha=1e-8)
    # 6x6 Q1 has 49 dofs < coarse_max_dofs: single level, exact solves
    assert len(scan.config.spaces) == 1
    u_scan = scan.solve(b)
    u_para = para.solve(b)
    rel = float(jnp.linalg.norm((u_scan - u_para).ravel())
                / jnp.linalg.norm(u_scan.ravel()))
    assert rel < 1e-6, rel

    # reverse (upper-bidiagonal) sweep
    u_scan_r = scan.solve(b, reverse=True)
    u_para_r = para.solve(b, reverse=True)
    rel_r = float(jnp.linalg.norm((u_scan_r - u_para_r).ravel())
                  / jnp.linalg.norm(u_scan_r.ravel()))
    assert rel_r < 1e-6, rel_r


def test_defect_correction_squares_error():
    """One defect-correction step around the alpha-circulant solve drops
    the O(alpha) truncation error to ~O(alpha^2): at alpha=1e-3 the
    corrected sweep must be >=100x closer to the exact substitution."""
    mesh = UnitSquareMesh(6, 6, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(space), TestFunction(space)
    bc = DirichletBC(space, 0.0, "on_boundary")
    mask = combine_masks(space, (bc,))
    K = assemble(inner(grad(u), grad(v)) * dx).A
    M = assemble(inner(u, v) * dx).A
    F = (0.05 * K + 2.5 * M)[None]
    S = (0.05 * K - 0.4 * M)[None]
    n = 9
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal((n,) + space.grid_shape))
    b = jnp.where(mask[None], 0.0, b)

    u_exact = _SweepSolver(space, mask, F, S).solve(b)

    def rel(defect_steps):
        para = _ParaDiagSweep(space, mask, F, S, n, alpha=1e-3,
                              defect_steps=defect_steps)
        u_p = para.solve(b)
        return float(jnp.linalg.norm((u_exact - u_p).ravel())
                     / jnp.linalg.norm(u_exact.ravel()))

    err0, err1 = rel(0), rel(1)
    assert err1 < 1e-2 * err0, (err0, err1)


def _heat(n=32, n_t=16, beta=1e-4):
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
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    return Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, n_t=n_t, time_interval=(0.0, 2.0),
        CN=True, bcs_v=bc_t)


def test_paradiag_pc_matches_scan():
    sp = {"linear_solver": "gmres", "gmres_restart": 10,
          "maximum_iterations": 50, "relative_tolerance": 1e-8,
          "absolute_tolerance": 0.0, "monitor_convergence": False}
    results = {}
    for mode in ("scan", "paradiag"):
        ctl = _heat()
        ctl.set_schur_sweep(mode)
        ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                         solver_parameters=sp, print_error=False,
                         create_output=False)
        results[mode] = (ctl.last_solve_info.iterations,
                         np.asarray(ctl._v.data))
    it_scan, v_scan = results["scan"]
    it_para, v_para = results["paradiag"]
    assert it_para <= it_scan + 2, (it_para, it_scan)
    rel = (np.linalg.norm((v_scan - v_para).ravel())
           / np.linalg.norm(v_scan.ravel()))
    assert rel < 1e-6, rel


def test_be_edge_row_sweep_matches_scan():
    """The BE factor stack (shifts [0, c, ..., c, sqrt(eps) c], constant
    sub-diagonal -M) is Toeplitz except its edge rows; _BEParaDiagSweep
    peels those off exactly around an interior ParaDiag, so at small alpha
    it must match the exact row-dependent scan sweep in BOTH directions."""
    mesh = UnitSquareMesh(6, 6, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(space), TestFunction(space)
    bc = DirichletBC(space, 0.0, "on_boundary")
    mask = combine_masks(space, (bc,))
    K = assemble(inner(grad(u), grad(v)) * dx).A
    M = assemble(inner(u, v) * dx).A
    n, c, eps = 9, 2.5, 1e-3
    shifts = np.concatenate([[0.0], np.full(n - 2, c), [(eps ** 0.5) * c]])
    F = jnp.asarray(0.05 * np.asarray(K)[None] + np.asarray(M)[None]
                    + shifts[:, None, None, None] * np.asarray(M)[None])
    S = (-M)[None]
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.standard_normal((n,) + space.grid_shape))
    b = jnp.where(mask[None], 0.0, b)

    scan = _SweepSolver(space, mask, F, S)
    # 6x6 Q1: 49 dofs < coarse_max_dofs -> single level, exact solves
    assert len(scan.config.spaces) == 1
    edged = _BEParaDiagSweep(space, mask, F, S, n, alpha=1e-8)
    for reverse in (False, True):
        u_scan = scan.solve(b, reverse=reverse)
        u_edge = edged.solve(b, reverse=reverse)
        rel = float(jnp.linalg.norm((u_scan - u_edge).ravel())
                    / jnp.linalg.norm(u_scan.ravel()))
        assert rel < 1e-6, (reverse, rel)


def test_paradiag_backward_euler_matches_scan():
    """BE 'paradiag' now runs the edge-row time-parallel sweep; outer
    iteration counts and the solution must match the exact scan (the
    round-1..3 scan-only fallback is gone)."""
    sp = {"linear_solver": "gmres", "gmres_restart": 10,
          "maximum_iterations": 50, "relative_tolerance": 1e-8,
          "absolute_tolerance": 0.0, "monitor_convergence": False}
    results = {}
    for mode in ("scan", "paradiag"):
        ctl = _heat(n=16, n_t=8)
        ctl.set_CN(CN=False)
        ctl.set_n_t(8)
        ctl.set_schur_sweep(mode)
        ctl.linear_solve(lambda_v_bounds=(0.25, 2.25), solver_parameters=sp,
                         print_error=False, create_output=False)
        results[mode] = (ctl.last_solve_info.iterations,
                         np.asarray(ctl._v.data))
    it_scan, v_scan = results["scan"]
    it_para, v_para = results["paradiag"]
    assert it_para <= it_scan + 2, (it_para, it_scan)
    rel = (np.linalg.norm((v_scan - v_para).ravel())
           / np.linalg.norm(v_scan.ravel()))
    assert rel < 1e-6, rel
