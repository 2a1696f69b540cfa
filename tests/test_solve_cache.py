"""Solve-kernel caching: repeated same-shape solves and every Picard /
Gauss-Newton iteration must reuse ONE compiled executable (the reference
re-runs only cheap PETSc setup per solve, reference
control/control.py:3467-3504; here compilation is the setup cost)."""

import jax.numpy as jnp
import numpy as np

from control_tpu import (Control, UnitSquareMesh, FunctionSpace, Function,
                         SpatialCoordinate, DirichletBC, grad, inner, dx,
                         cos, sin, pi, Constant)


def _heat(n=8, n_t=5, CN=True):
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
        force_f=force_f, beta=1e-3, n_t=n_t, time_interval=(0.0, 1.0),
        CN=CN, bcs_v=bc_t), space


def _kernel_cache_sizes(ctl):
    entries = ctl._kernel_cache._entries
    return [entry[0]._cache_size() for entry in entries.values()]


def test_repeated_linear_solve_single_executable():
    ctl, space = _heat()
    sp = {"linear_solver": "gmres", "gmres_restart": 10,
          "maximum_iterations": 50, "relative_tolerance": 1e-6,
          "absolute_tolerance": 0.0, "monitor_convergence": False}
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25), solver_parameters=sp,
                     print_error=False, create_output=False)
    it1 = ctl.last_solve_info.iterations
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25), solver_parameters=sp,
                     print_error=False, create_output=False)
    it2 = ctl.last_solve_info.iterations
    # same executable both calls; XLA:CPU threaded reductions are not
    # bitwise run-to-run deterministic, so allow a 1-iteration wobble at
    # the tolerance boundary
    assert abs(it2 - it1) <= 1, (it1, it2)
    assert len(ctl._kernel_cache) == 1, list(ctl._kernel_cache._entries)
    assert _kernel_cache_sizes(ctl) == [1], _kernel_cache_sizes(ctl)


def test_nonlinear_loop_single_executable():
    """A semilinear Picard loop recompiles nothing after iteration 1."""
    mesh = UnitSquareMesh(6, 6, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return (inner(grad(trial), grad(test)) * dx
                + (Constant(1.0) + u ** 2.0) * inner(trial, test) * dx)

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            sin(pi * X[0]) * sin(pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1.0, n_t=4, time_interval=(0.0, 1.0),
        CN=True, bcs_v=bc_t)
    ctl.non_linear_solve(
        lambda_v_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 300,
                           "relative_tolerance": 1.0e-10,
                           "absolute_tolerance": 1.0e-12,
                           "monitor_convergence": False},
        max_non_linear_iter=10, relative_non_linear_tol=1e-8,
        print_error_linear=False, print_error_non_linear=False,
        create_output=False, plots=False)
    # one cache entry, one compiled executable across all Picard iterations
    assert len(ctl._kernel_cache) == 1
    assert _kernel_cache_sizes(ctl) == [1]

    from control_tpu.fem.space import combine_masks, homogenize
    mask = combine_masks(space, homogenize(ctl._bcs_v[1]))
    v_0 = ctl._initial_state()
    f = ctl.construct_f()
    v_d = ctl.construct_v_d()
    r0, r1 = ctl.non_linear_res_eval(ctl._v, ctl._zeta, v_0, v_d, f,
                                     mask, mask)
    nrm = float(jnp.sqrt(jnp.vdot(r0, r0) + jnp.vdot(r1, r1)))
    assert nrm < 1e-7, nrm


def test_stationary_repeated_solve_single_executable():
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test):
        v_d = Function(space).interpolate(
            sin(pi * X[0]) * sin(pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        return inner(Function(space), test) * dx

    ctl = Control.Stationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-4,
        bcs_v=DirichletBC(space, 0.0, "on_boundary"))
    sp = {"linear_solver": "minres", "maximum_iterations": 100,
          "relative_tolerance": 1e-10, "absolute_tolerance": 0.0,
          "monitor_convergence": False}
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25), solver_parameters=sp,
                     print_error=False, create_output=False)
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25), solver_parameters=sp,
                     print_error=False, create_output=False)
    assert len(ctl._kernel_cache) == 1
    assert _kernel_cache_sizes(ctl) == [1]
