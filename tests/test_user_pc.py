"""User-supplied preconditioner (``P=``) tests.

The reference plumbs a user ``pc_fn`` as a first-class feature of every
solve method (reference preconditioner/preconditioner.py:624: the
``Preconditioner`` shell calls the user closure with the split block
Cofunctions).  Here ``P`` is a closure ``(b_0, b_1) -> (u_0, u_1)`` on the
stacked block arrays; these tests drive it through both problem classes
and both solve families, and verify the solve-kernel cache keys on the P
object identity (two different P closures -> two kernels; re-solving with
the first P does NOT retrace).

With a full-restart GMRES/FGMRES budget (restart >= system dimension) any
nonsingular preconditioner -- identity included -- converges in exact
arithmetic, so the assertions are convergence + agreement with the
built-in-pc solution, not iteration counts.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                         VectorFunctionSpace, Function, DirichletBC,
                         SpatialCoordinate, ConstantNullspace,
                         grad, inner, dx, sin, pi)


def _counting_identity_pc(counter):
    """Identity pc that counts TRACES (not applications): jax retraces the
    solve kernel iff the kernel cache missed, so the counter observes
    cache behavior directly."""
    def P(b_0, b_1):
        counter.append(1)
        return b_0, b_1
    return P


def _sp(solver, dim, rtol=1e-10):
    return {"linear_solver": solver, f"{solver}_restart": dim + 10,
            "maximum_iterations": dim + 10, "relative_tolerance": rtol,
            "absolute_tolerance": 0.0, "monitor_convergence": False}


# --------------------------------------------------------------- stationary

def _stationary_problem():
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def fdo(trial, test, u):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test):
        v_d = Function(space).interpolate(sin(pi * X[0]) * sin(pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def ff(test):
        return inner(Function(space), test) * dx

    return Control.Stationary(
        space, fdo, desired_state=ds_, force_f=ff, beta=1e-3,
        bcs_v=DirichletBC(space, 0.0, "on_boundary")), space


def test_stationary_linear_solve_user_P():
    ctl, space = _stationary_problem()
    dim = int(2 * np.prod(space.grid_shape))

    # built-in pc reference solution
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                     solver_parameters=_sp("gmres", dim),
                     print_error=False, create_output=False, plots=False)
    v_ref = np.asarray(ctl._v.data).copy()

    traces = []
    P1 = _counting_identity_pc(traces)
    ctl.linear_solve(P=P1, solver_parameters=_sp("gmres", dim),
                     print_error=False, create_output=False, plots=False)
    assert ctl.last_solve_info.converged
    assert np.max(np.abs(np.asarray(ctl._v.data) - v_ref)) < 1e-7
    n_traces_1 = len(traces)
    assert n_traces_1 >= 1

    # same P object again: kernel cache hit, NO retrace
    ctl.linear_solve(P=P1, solver_parameters=_sp("gmres", dim),
                     print_error=False, create_output=False, plots=False)
    assert ctl.last_solve_info.converged
    assert len(traces) == n_traces_1

    # different P object: new kernel (cache keys on id(P)), its traces land
    # in its own counter
    traces2 = []

    def P2(b_0, b_1):
        traces2.append(1)
        return 2.0 * b_0, 2.0 * b_1          # scaled identity

    ctl.linear_solve(P=P2, solver_parameters=_sp("gmres", dim),
                     print_error=False, create_output=False, plots=False)
    assert ctl.last_solve_info.converged
    assert len(traces2) >= 1
    assert len(traces) == n_traces_1          # P1's kernel untouched
    assert np.max(np.abs(np.asarray(ctl._v.data) - v_ref)) < 1e-7


def test_stationary_incompressible_user_P():
    mesh = UnitSquareMesh(6, 6, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def fdo(trial, test, u):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test):
        v_d = Function(space_v).interpolate(
            (0.2 * sin(pi * X[0]) * sin(pi * X[1]),
             0.1 * sin(2 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def ff(test):
        return inner(Function(space_v), test) * dx

    ctl = Control.Stationary(
        space_v, fdo, desired_state=ds_, force_f=ff, beta=1e-2,
        space_p=space_p,
        bcs_v=DirichletBC(space_v, (0.0, 0.0), "on_boundary"))

    dim = int(2 * np.prod(space_v.grid_shape)
              + 2 * np.prod(space_p.grid_shape))

    ctl.incompressible_linear_solve(
        ConstantNullspace(), lambda_v_bounds=(0.25, 1.5625),
        lambda_p_bounds=(0.25, 2.25),
        solver_parameters=_sp("fgmres", dim, rtol=1e-8),
        print_error=False, create_output=False, plots=False)
    v_ref = np.asarray(ctl._v.data).copy()

    def P(b_0, b_1):
        return b_0, b_1

    ctl.incompressible_linear_solve(
        ConstantNullspace(), P=P,
        solver_parameters=_sp("fgmres", dim, rtol=1e-8),
        print_error=False, create_output=False, plots=False)
    assert ctl.last_solve_info.converged
    assert np.max(np.abs(np.asarray(ctl._v.data) - v_ref)) < 1e-5


# -------------------------------------------------------------- instationary

def _instationary_problem(n=6, n_t=4):
    mesh = UnitSquareMesh(n, n, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def fdo(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test, t):
        v_d = Function(space).interpolate(sin(pi * X[0]) * sin(pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def ff(test, t):
        return inner(Function(space), test) * dx

    def bc_t(s, t):
        return DirichletBC(s, 0.0, "on_boundary")

    return Control.Instationary(
        space, fdo, desired_state=ds_, force_f=ff, beta=1e-3, n_t=n_t,
        time_interval=(0.0, 1.0), CN=True, bcs_v=bc_t), space


def test_instationary_linear_solve_user_P():
    ctl, space = _instationary_problem()
    n_blocks = ctl._n_t - 1
    dim = int(2 * n_blocks * np.prod(space.grid_shape))

    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                     solver_parameters=_sp("gmres", dim),
                     print_error=False, create_output=False, plots=False)
    v_ref = np.asarray(ctl._v.data).copy()

    traces = []
    P1 = _counting_identity_pc(traces)
    ctl.linear_solve(P=P1, solver_parameters=_sp("gmres", dim),
                     print_error=False, create_output=False, plots=False)
    assert ctl.last_solve_info.converged
    assert np.max(np.abs(np.asarray(ctl._v.data) - v_ref)) < 1e-7
    n1 = len(traces)

    ctl.linear_solve(P=P1, solver_parameters=_sp("gmres", dim),
                     print_error=False, create_output=False, plots=False)
    assert len(traces) == n1      # cached kernel, no retrace


def test_instationary_incompressible_user_P():
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
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

    ctl = Control.Instationary(
        space_v, fdo, desired_state=ds_, force_f=ff, beta=1e-2,
        space_p=space_p, n_t=3, time_interval=(0.0, 1.0), CN=True,
        bcs_v=bc_t)
    n = ctl._n_t - 1
    dim = int(2 * n * np.prod(space_v.grid_shape)
              + 2 * n * np.prod(space_p.grid_shape))

    ctl.incompressible_linear_solve(
        ConstantNullspace(), lambda_v_bounds=(0.25, 1.5625),
        lambda_p_bounds=(0.25, 2.25),
        solver_parameters=_sp("fgmres", dim, rtol=1e-8),
        print_error=False, create_output=False, plots=False)
    v_ref = np.asarray(ctl._v.data).copy()

    def P(b_0, b_1):
        return b_0, b_1

    ctl.incompressible_linear_solve(
        ConstantNullspace(), P=P,
        solver_parameters=_sp("fgmres", dim, rtol=1e-8),
        print_error=False, create_output=False, plots=False)
    assert ctl.last_solve_info.converged
    assert np.max(np.abs(np.asarray(ctl._v.data) - v_ref)) < 1e-5
