"""Host-loop flexible GMRES (krylov.fgmres_host / solve_host): the
incompressible solves run it on accelerators, where the fused
whole-solve program exceeds the single-chip TPU backend's execution
limits.  It must match the fused in-program path."""

import numpy as np
import jax.numpy as jnp

from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                         VectorFunctionSpace, Function, DirichletBC,
                         ConstantNullspace, SpatialCoordinate, grad, inner,
                         dx, sin, pi)


def _problem():
    mesh = UnitSquareMesh(3, 3, quadrilateral=True)
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

    return Control.Instationary(
        space_v, fdo, desired_state=ds_, force_f=ff, beta=1e-2,
        space_p=space_p, n_t=3, time_interval=(0.0, 1.0), CN=True,
        bcs_v=bc_t)


def test_host_loop_matches_fused():
    sp = {"linear_solver": "fgmres", "fgmres_restart": 10,
          "maximum_iterations": 150, "relative_tolerance": 1e-9,
          "absolute_tolerance": 1e-9, "monitor_convergence": False}
    results = {}
    for host in (False, True):
        ctl = _problem()
        ctl._host_loop = host
        ctl.incompressible_linear_solve(
            ConstantNullspace(), solver_parameters=sp,
            lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
            print_error=False, create_output=False, plots=False)
        results[host] = (ctl.last_solve_info, np.asarray(ctl._v.data),
                         np.asarray(ctl._p.data))
    info_f, v_f, p_f = results[False]
    info_h, v_h, p_h = results[True]
    assert info_h.converged
    assert abs(info_h.iterations - info_f.iterations) <= 2
    assert np.abs(v_f - v_h).max() < 1e-8
    assert np.abs(p_f - p_h).max() < 1e-7


def test_host_loop_program_cache():
    """Repeated same-state solves reuse the jitted programs."""
    sp = {"linear_solver": "fgmres", "fgmres_restart": 10,
          "maximum_iterations": 150, "relative_tolerance": 1e-9,
          "absolute_tolerance": 1e-9, "monitor_convergence": False}
    ctl = _problem()
    ctl._host_loop = True
    nsp = ConstantNullspace()
    for _ in range(2):
        ctl.incompressible_linear_solve(
            nsp, solver_parameters=sp,
            lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
            print_error=False, create_output=False, plots=False)
    assert len(ctl._host_cache) == 1
    (_, _, _, store), = ctl._host_cache.values()
    assert "astep" in store


def test_host_loop_stateful_across_picard():
    """The linearisation state is an ARGUMENT of the jitted host-loop
    programs: a Picard loop (new advection operator every outer step)
    reuses one compiled executable per program instead of re-jitting."""
    from control_tpu import dot

    mesh = UnitSquareMesh(3, 3, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    nu = 0.5

    def fdo(trial, test, u, t):
        # Navier-Stokes Picard operator: the linearisation state u
        # changes every outer iteration
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

    ctl = Control.Instationary(
        space_v, fdo, desired_state=ds_, force_f=ff, beta=1e-1,
        space_p=space_p, n_t=3, time_interval=(0.0, 1.0), CN=True,
        bcs_v=bc_t)
    ctl._host_loop = True
    sp = {"linear_solver": "fgmres", "fgmres_restart": 10,
          "maximum_iterations": 200, "relative_tolerance": 1e-8,
          "absolute_tolerance": 1e-10, "monitor_convergence": False}
    ctl.incompressible_non_linear_solve(
        ConstantNullspace(), solver_parameters=sp,
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        max_non_linear_iter=3, print_error_linear=False,
        print_error_non_linear=False, create_output=False, plots=False)
    # one structural cache entry (not one per linearisation state) and
    # exactly one compiled specialisation of each jitted program
    assert len(ctl._host_cache) == 1
    (_, _, _, store), = ctl._host_cache.values()
    for name in ("astep", "residual"):
        assert store[name]._cache_size() == 1, name


def test_host_loop_stationary_matches_fused():
    """The stationary incompressible solve has the same host-loop /
    state-as-argument machinery; it must match the fused path."""

    mesh = UnitSquareMesh(3, 3, quadrilateral=True)
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

    sp = {"linear_solver": "fgmres", "fgmres_restart": 10,
          "maximum_iterations": 200, "relative_tolerance": 1e-10,
          "absolute_tolerance": 1e-10, "monitor_convergence": False}
    results = {}
    for host in (False, True):
        ctl = Control.Stationary(
            space_v, fdo, desired_state=ds_, force_f=ff, beta=1e-2,
            space_p=space_p,
            bcs_v=DirichletBC(space_v, (0.0, 0.0), "on_boundary"))
        ctl._host_loop = host
        ctl.incompressible_linear_solve(
            ConstantNullspace(), solver_parameters=sp,
            lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
            print_error=False, create_output=False, plots=False)
        results[host] = (ctl.last_solve_info, np.asarray(ctl._v.data),
                         np.asarray(ctl._p.data))
    info_f, v_f, p_f = results[False]
    info_h, v_h, p_h = results[True]
    assert info_h.converged
    assert abs(info_h.iterations - info_f.iterations) <= 2
    assert np.abs(v_f - v_h).max() < 1e-8
    assert np.abs(p_f - p_h).max() < 1e-7
