"""Additional nonlinear coverage: stationary Navier-Stokes (incompressible
non_linear_solve, reference test/test_control.py:1027-1240) and
Gauss-Newton on an instationary problem."""

import pytest
import numpy as np
import jax.numpy as jnp

from control_tpu import (
    Control, UnitSquareMesh, FunctionSpace, VectorFunctionSpace, Function,
    TestFunction, TrialFunction, SpatialCoordinate, DirichletBC,
    ConstantNullspace, grad, div, inner, dot, dx, assemble, sin, cos, pi,
    Constant)

# slow tier: Navier-Stokes Picard/Gauss-Newton loops: several fresh nonlinear compiles
pytestmark = pytest.mark.slow


def test_stationary_navier_stokes_nonlinear():
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    nu = 1.0 / 25.0

    def forw_diff_operator(trial, test, u):
        return (nu * inner(grad(trial), grad(test)) * dx
                + inner(dot(grad(trial), u), test) * dx)

    def desired_state(test):
        v_d = Function(space_v).interpolate(
            (0.3 * sin(pi * X[0]) * sin(pi * X[1]),
             0.2 * sin(2 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        return inner(Function(space_v), test) * dx

    mcs = Control.Stationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1.0, space_p=space_p,
        bcs_v=DirichletBC(space_v, (0.0, 0.0), "on_boundary"))
    mcs.incompressible_non_linear_solve(
        ConstantNullspace(),
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 300,
                           "relative_tolerance": 1.0e-10,
                           "absolute_tolerance": 1.0e-10,
                           "monitor_convergence": False},
        max_non_linear_iter=20, relative_non_linear_tol=1e-7,
        absolute_non_linear_tol=1e-9,
        print_error_linear=False, print_error_non_linear=False,
        create_output=False, plots=False)

    # verify the converged state satisfies the full KKT residual
    from control_tpu.fem.space import combine_masks
    from control_tpu.models.common import residual_vector, zero_rows
    bc = DirichletBC(space_v, (0.0, 0.0), "on_boundary")
    mask = combine_masks(space_v, (bc,))
    v_trial = TrialFunction(space_v)
    v_test = TestFunction(space_v)
    p_test = TestFunction(space_p)
    B = assemble(-inner(div(v_trial), p_test) * dx)
    B_T = assemble(-inner(TrialFunction(space_p), div(v_test)) * dx)
    M = assemble(inner(v_trial, v_test) * dx)
    vd_form, _ = desired_state(v_test)
    v_d = assemble(vd_form)
    res1 = (residual_vector(forw_diff_operator, space_v, mcs._v).data
            - M.apply(mcs._zeta.data) + B_T.apply(mcs._p.data))
    res1 = zero_rows(mask, res1)
    res2 = B.apply(mcs._v.data)
    nrm = float(jnp.sqrt(jnp.vdot(res1, res1) + jnp.vdot(res2, res2)))
    assert nrm < 1e-6, nrm


def test_stationary_navier_stokes_gauss_newton_builtin_pc():
    """Gauss-Newton incompressible solve with the BUILT-IN preconditioner
    (the pressure-space operator is GN-linearised too; reference
    control/control.py:979-984 + :314-324)."""
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    nu = 1.0 / 25.0

    def forw_diff_operator(trial, test, u):
        return (nu * inner(grad(trial), grad(test)) * dx
                + inner(dot(grad(trial), u), test) * dx)

    def desired_state(test):
        v_d = Function(space_v).interpolate(
            (0.3 * sin(pi * X[0]) * sin(pi * X[1]),
             0.2 * sin(2 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        return inner(Function(space_v), test) * dx

    mcs = Control.Stationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1.0, space_p=space_p, Gauss_Newton=True,
        bcs_v=DirichletBC(space_v, (0.0, 0.0), "on_boundary"))
    mcs.incompressible_non_linear_solve(
        ConstantNullspace(),
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 300,
                           "relative_tolerance": 1.0e-10,
                           "absolute_tolerance": 1.0e-10,
                           "monitor_convergence": False},
        max_non_linear_iter=20, relative_non_linear_tol=1e-7,
        absolute_non_linear_tol=1e-9,
        print_error_linear=False, print_error_non_linear=False,
        create_output=False, plots=False)

    from control_tpu.fem.space import combine_masks
    from control_tpu.models.common import residual_vector, zero_rows
    bc = DirichletBC(space_v, (0.0, 0.0), "on_boundary")
    mask = combine_masks(space_v, (bc,))
    v_trial = TrialFunction(space_v)
    v_test = TestFunction(space_v)
    p_test = TestFunction(space_p)
    B = assemble(-inner(div(v_trial), p_test) * dx)
    B_T = assemble(-inner(TrialFunction(space_p), div(v_test)) * dx)
    M = assemble(inner(v_trial, v_test) * dx)
    res1 = (residual_vector(forw_diff_operator, space_v, mcs._v).data
            - M.apply(mcs._zeta.data) + B_T.apply(mcs._p.data))
    res1 = zero_rows(mask, res1)
    res2 = B.apply(mcs._v.data)
    nrm = float(jnp.sqrt(jnp.vdot(res1, res1) + jnp.vdot(res2, res2)))
    assert nrm < 1e-6, nrm


def test_instationary_navier_stokes_gauss_newton_builtin_pc():
    """Instationary (CN) Navier-Stokes GN loop with the built-in
    incompressible preconditioner (previously NotImplementedError)."""
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    nu = 1.0 / 10.0
    n_t = 3

    def forw_diff_operator(trial, test, u, t):
        return (nu * inner(grad(trial), grad(test)) * dx
                + inner(dot(grad(trial), u), test) * dx)

    def desired_state(test, t):
        v_d = Function(space_v).interpolate(
            (0.2 * sin(pi * X[0]) * sin(pi * X[1]),
             0.1 * sin(2 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space_v), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, (0.0, 0.0), "on_boundary")

    ctl = Control.Instationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1.0, space_p=space_p, Gauss_Newton=True,
        n_t=n_t, time_interval=(0.0, 1.0), CN=True, bcs_v=bc_t)
    ctl.incompressible_non_linear_solve(
        ConstantNullspace(),
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 300,
                           "relative_tolerance": 1.0e-10,
                           "absolute_tolerance": 1.0e-10,
                           "monitor_convergence": False},
        max_non_linear_iter=20, relative_non_linear_tol=1e-7,
        absolute_non_linear_tol=1e-9,
        print_error_linear=False, print_error_non_linear=False,
        create_output=False, plots=False)

    # converged iterate satisfies the full incompressible all-at-once
    # residual (same construction as the in-method res())
    from control_tpu.fem.space import combine_masks, homogenize
    from control_tpu.models.common import zero_rows
    mask = combine_masks(space_v, homogenize(ctl._bcs_v[1]))
    mkv = mask[None]
    v_0 = ctl._initial_state()
    f = ctl.construct_f()
    v_d = ctl.construct_v_d()
    v_trial = TrialFunction(space_v)
    v_test = TestFunction(space_v)
    p_test = TestFunction(space_p)
    B = assemble(-inner(div(v_trial), p_test) * dx)
    B_T = assemble(-inner(TrialFunction(space_p), div(v_test)) * dx)
    tau = ctl._tau
    n = n_t - 1
    rhs_00, rhs_01 = ctl.non_linear_res_eval(ctl._v, ctl._zeta, v_0, v_d,
                                             f, mask, mask)
    rhs_00 = zero_rows(mkv, rhs_00 - tau * B_T.apply(ctl._mu.data))
    rhs_01 = zero_rows(mkv, rhs_01 - tau * B_T.apply(ctl._p.data))
    rhs_10 = -B.apply(ctl._v.data[1:])
    rhs_11 = -B.apply(ctl._zeta.data[:n])
    nrm = float(jnp.sqrt(sum(jnp.vdot(x, x) for x in
                             (rhs_00, rhs_01, rhs_10, rhs_11))))
    assert nrm < 1e-6, nrm


def test_instationary_gauss_newton():
    """GN on an instationary semilinear problem: converged trajectory
    satisfies the all-at-once residual."""
    mesh = UnitSquareMesh(6, 6, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        # residual-style form (reference GN usage)
        return (inner(grad(u), grad(test)) * dx
                + (Constant(1.0) + u ** 2.0) * inner(u, test) * dx)

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            Constant(1.0) * sin(pi * X[0]) * sin(pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1.0, n_t=4, time_interval=(0.0, 1.0),
        CN=True, bcs_v=bc_t, Gauss_Newton=True)
    ctl.non_linear_solve(
        lambda_v_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 300,
                           "relative_tolerance": 1.0e-12,
                           "absolute_tolerance": 1.0e-12,
                           "monitor_convergence": False},
        max_non_linear_iter=30, relative_non_linear_tol=1e-9,
        print_error_linear=False, print_error_non_linear=False,
        create_output=False, plots=False)
    from control_tpu.fem.space import combine_masks, homogenize
    mask = combine_masks(space, homogenize(ctl._bcs_v[1]))
    v_0 = ctl._initial_state()
    f = ctl.construct_f()
    v_d = ctl.construct_v_d()
    r0, r1 = ctl.non_linear_res_eval(ctl._v, ctl._zeta, v_0, v_d, f,
                                     mask, mask)
    nrm = float(jnp.sqrt(jnp.vdot(r0, r0) + jnp.vdot(r1, r1)))
    assert nrm < 1e-8, nrm
