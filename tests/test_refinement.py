"""Mixed-precision iterative refinement (TPU extension, no reference
equivalent): inner f32 Krylov solves + f64 true-residual corrections reach
tolerances below the f32 rounding floor.  solver_parameters keys:
``iterative_refinement`` (max correction steps) and
``refinement_inner_tolerance`` (inner solve rtol, default 1e-6)."""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                         VectorFunctionSpace, Function, SpatialCoordinate,
                         DirichletBC, ConstantNullspace, grad, inner, dx,
                         sin, cos, pi)


def _f32_heat(n=8, n_t=6):
    mesh = UnitSquareMesh(n, n, quadrilateral=True, dtype=jnp.float32)
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
        force_f=force_f, beta=1e-3, n_t=n_t, time_interval=(0.0, 1.0),
        CN=True, bcs_v=bc_t)


def _sp(rtol, **extra):
    d = {"linear_solver": "gmres", "gmres_restart": 20,
         "maximum_iterations": 200, "relative_tolerance": rtol,
         "absolute_tolerance": 0.0, "monitor_convergence": False}
    d.update(extra)
    return d


def test_f32_recurrence_residual_is_optimistic():
    """The f32 GMRES recurrence residual claims 1e-12 but the TRUE (f64)
    residual stalls orders of magnitude higher -- the gap refinement
    exists to close.  res[0] is the f64 residual of the plain inner
    solve, which "converged" to 1e-12 by its own recurrence."""
    ctl = _f32_heat()
    info = ctl.linear_solve(
        lambda_v_bounds=(0.25, 2.25),
        solver_parameters=_sp(1e-12, iterative_refinement=8,
                              refinement_inner_tolerance=1e-12),
        print_error=False, create_output=False, plots=False)
    assert info.rnorm0 >= 1e-9 * info.rhs_norm, \
        (info.rnorm0, info.rhs_norm)
    assert info.converged
    assert info.rnorm <= 1.01e-12 * info.rhs_norm


def test_refinement_reaches_f64_accuracy():
    """With refinement the same f32 solves reach a 1e-11 TRUE (f64)
    relative residual, and the refined f64 solution rides on the info."""
    ctl = _f32_heat()
    info = ctl.linear_solve(
        lambda_v_bounds=(0.25, 2.25),
        solver_parameters=_sp(1e-11, iterative_refinement=6),
        print_error=False, create_output=False, plots=False)
    assert info.converged
    assert info.refinement_steps >= 1
    assert info.rnorm <= 1.01e-11 * info.rhs_norm
    assert info.x0_f64.dtype == np.float64
    # the f32-stored trajectory agrees with a plain 1e-6 solve
    v_refined = np.asarray(ctl._v.data)
    ctl2 = _f32_heat()
    ctl2.linear_solve(lambda_v_bounds=(0.25, 2.25),
                      solver_parameters=_sp(1e-6),
                      print_error=False, create_output=False, plots=False)
    v_plain = np.asarray(ctl2._v.data)
    d = np.linalg.norm(v_refined - v_plain)
    assert d <= 1e-4 * max(np.linalg.norm(v_plain), 1.0), d


def test_refinement_stationary():
    """Stationary.linear_solve supports the same refinement keys: an f32
    stationary KKT solve reaches a 1e-11 TRUE (f64) relative residual."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True, dtype=jnp.float32)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test):
        v_d = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        return inner(Function(space), test) * dx

    ctl = Control.Stationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-3,
        bcs_v=DirichletBC(space, 0.0, "on_boundary"))
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                     solver_parameters=_sp(1e-11, iterative_refinement=6),
                     print_error=False, create_output=False, plots=False)
    info = ctl.last_solve_info
    assert info.converged
    assert info.refinement_steps >= 1
    assert info.rnorm <= 1.01e-11 * info.rhs_norm
    assert np.asarray(ctl._v.data).dtype == np.float32


def test_refinement_incompressible_stokes():
    """The incompressible (Taylor-Hood Stokes) solve supports refinement:
    an f32 space-time Stokes KKT solve reaches a 1e-10 TRUE (f64)
    relative residual -- on TPU this is how the host-loop f32 solves
    certify tolerances below the f32 floor."""
    mesh = UnitSquareMesh(4, 4, quadrilateral=True, dtype=jnp.float32)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space_v).interpolate(
            (sin(pi * X[0]) * sin(2.0 * pi * X[1]),
             sin(2.0 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space_v), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, (0.0, 0.0), "on_boundary")

    ctl = Control.Instationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-2, space_p=space_p, n_t=4,
        time_interval=(0.0, 1.0), CN=True, bcs_v=bc_t)
    info = ctl.incompressible_linear_solve(
        ConstantNullspace(),
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 100,
                           "relative_tolerance": 1e-10,
                           "absolute_tolerance": 0.0,
                           "monitor_convergence": False,
                           "iterative_refinement": 8},
        print_error=False, create_output=False, plots=False)
    assert info.converged
    assert info.refinement_steps >= 1
    assert info.rnorm <= 1.01e-10 * info.rhs_norm


def test_refinement_stationary_incompressible():
    """Stationary Stokes (Taylor-Hood) refinement: f32 solve to a 1e-10
    TRUE (f64) relative residual on the 4-block KKT system."""
    mesh = UnitSquareMesh(4, 4, quadrilateral=True, dtype=jnp.float32)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test):
        v_d = Function(space_v).interpolate(
            (sin(pi * X[0]) * sin(2.0 * pi * X[1]),
             sin(2.0 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        return inner(Function(space_v), test) * dx

    ctl = Control.Stationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-2, space_p=space_p,
        bcs_v=DirichletBC(space_v, (0.0, 0.0), "on_boundary"))
    info = ctl.incompressible_linear_solve(
        ConstantNullspace(),
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 50,
                           "relative_tolerance": 1e-10,
                           "absolute_tolerance": 0.0,
                           "monitor_convergence": False,
                           "iterative_refinement": 8},
        print_error=False, create_output=False, plots=False)
    assert info.converged
    assert info.refinement_steps >= 1
    assert info.rnorm <= 1.01e-10 * info.rhs_norm


def test_refinement_noop_in_f64():
    """On an f64 problem the first solve already meets the target: zero
    correction steps, same executable, no behavior change."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
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
        force_f=force_f, beta=1e-3, n_t=6, time_interval=(0.0, 1.0),
        CN=True, bcs_v=bc_t)
    info = ctl.linear_solve(
        lambda_v_bounds=(0.25, 2.25),
        solver_parameters=_sp(1e-6, iterative_refinement=3,
                              linear_solver="fgmres",
                              fgmres_restart=20),
        print_error=False, create_output=False, plots=False)
    assert info.converged
    assert info.refinement_steps == 0


def test_refinement_driver_stall_detection():
    """Unit test of the driver: a correction solve that returns junk makes
    the true residual stall; the driver detects the dead contraction,
    stops early (no wasted accelerator solves), and raises."""
    from control_tpu.models.common import run_iterative_refinement
    rng = np.random.default_rng(3)
    A = jnp.asarray(np.diag(rng.uniform(1.0, 2.0, 8)))
    b = jnp.asarray(rng.standard_normal((1, 8)))

    def build64():
        return (lambda x0, x1: (A @ x0[0], A @ x1[0])), b, b

    calls = []

    def bad_solve(r0, r1):
        calls.append(1)
        return 1e-3 * r0, 1e-3 * r1, {"iterations": 1}

    with pytest.raises(RuntimeError):
        run_iterative_refinement(
            build64, bad_solve, jnp.zeros_like(b), jnp.zeros_like(b),
            0, 10, {"relative_tolerance": 1e-12,
                    "monitor_convergence": False}, np.float64)
    # residual barely moves per step -> stop after the first correction
    assert len(calls) <= 2, calls


def test_refinement_driver_preconditioner_flag_no_raise():
    """With "preconditioner": True a non-converged refinement returns
    (fixed-budget inner-solve semantics) instead of raising."""
    from control_tpu.models.common import run_iterative_refinement
    rng = np.random.default_rng(5)
    A = jnp.asarray(np.diag(rng.uniform(1.0, 2.0, 8)))
    b = jnp.asarray(rng.standard_normal((1, 8)))

    def build64():
        return (lambda x0, x1: (A @ x0[0], A @ x1[0])), b, b

    def bad_solve(r0, r1):
        return 0.0 * r0, 0.0 * r1, {"iterations": 1}

    x0, x1, info = run_iterative_refinement(
        build64, bad_solve, jnp.zeros_like(b), jnp.zeros_like(b),
        0, 3, {"relative_tolerance": 1e-12, "preconditioner": True,
               "monitor_convergence": False}, np.float64)
    assert not info.converged
