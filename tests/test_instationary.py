"""Instationary control tests.

Family-1 algebraic exact-solution tests (reference
test/test_control.py:1243-1656): manufactured space-time KKT solutions,
rhs built BY HAND from mass/stiffness actions (independent of the block
operator implementation), solved to rtol 1e-14 and checked to ~1e-13."""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (
    Control, UnitSquareMesh, FunctionSpace, Function, MixedFunction,
    TestFunction, TrialFunction, SpatialCoordinate, DirichletBC,
    grad, inner, dx, assemble, sin, cos, exp, pi, Constant)
from control_tpu.solvers.block import apply_T_1, apply_T_2


def _mixed_l2(space, a_data, b_data):
    err2 = 0.0
    for i in range(a_data.shape[0]):
        d = Function(space, data=a_data[i] - b_data[i])
        err2 += float(assemble(inner(d, d) * dx))
    return np.sqrt(abs(err2))


def _heat_problem(n_t, CN, beta=1e-3, mesh_n=8, degree=2):
    mesh = UnitSquareMesh(mesh_n, mesh_n, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", degree)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space, name="v_d")
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, time_interval=(0.0, 1.0),
        CN=CN, n_t=n_t, bcs_v=bc_t)
    return ctl, mesh, space


def test_instationary_linear_control_BE():
    """Port of reference test/test_control.py:1243-1444."""
    n_t, beta = 5, 1e-3
    tau = 0.25
    ctl, mesh, space = _heat_problem(n_t, CN=False, beta=beta)
    X = SpatialCoordinate(mesh)

    v_ref = MixedFunction(space, n_t)
    zeta_ref = MixedFunction(space, n_t)
    v_ref.sub(1).interpolate(tau * sin(3 * pi * X[0]) * sin(4 * pi * X[1]))
    v_ref.sub(2).interpolate(tau ** 2 * X[0] * exp(X[1])
                             * sin(pi * X[0]) * sin(2 * pi * X[1]))
    v_ref.sub(3).interpolate(tau ** 3 * sin(3 * pi * X[0])
                             * sin(4 * pi * X[1]))
    v_ref.sub(4).interpolate(tau ** 4 * X[0] * exp(X[1])
                             * sin(pi * X[0]) * sin(2 * pi * X[1]))
    zeta_ref.sub(0).interpolate(sin(pi * X[0]) * sin(2 * pi * X[1]))
    zeta_ref.sub(1).interpolate(tau * sin(3 * pi * X[0])
                                * sin(4 * pi * X[1]))
    zeta_ref.sub(2).interpolate(tau ** 2 * sin(pi * X[0])
                                * sin(2 * pi * X[1]))
    zeta_ref.sub(3).interpolate(tau ** 3 * sin(3 * pi * X[0])
                                * sin(4 * pi * X[1]))

    u, w = TrialFunction(space), TestFunction(space)
    M = assemble(inner(u, w) * dx)
    K = assemble(inner(grad(u), grad(w)) * dx)

    vd = v_ref.data
    zd = zeta_ref.data
    # hand-built block rows (reference test:1330-1413)
    b_0 = np.zeros_like(np.asarray(vd))
    b_1 = np.zeros_like(np.asarray(vd))
    for i in range(n_t):
        r0 = tau * K.apply(zd[i]) + M.apply(zd[i])
        if i < n_t - 1:
            r0 = r0 + tau * M.apply(vd[i]) - M.apply(zd[i + 1])
        b_0[i] = np.asarray(r0)
        r1 = tau * K.apply(vd[i]) + M.apply(vd[i])
        if i >= 1:
            r1 = r1 - M.apply(vd[i - 1]) - (tau / beta) * M.apply(zd[i])
        b_1[i] = np.asarray(r1)

    solver_parameters = {"linear_solver": "fgmres",
                         "fgmres_restart": 10,
                         "maximum_iterations": 500,
                         "relative_tolerance": 1.0e-14,
                         "absolute_tolerance": 1.0e-14,
                         "monitor_convergence": False}
    ctl.linear_solve(lambda_v_bounds=(0.25, 1.5625),
                     solver_parameters=solver_parameters,
                     v_d=MixedFunction(space, n_t, data=jnp.asarray(b_0)),
                     f=MixedFunction(space, n_t, data=jnp.asarray(b_1)),
                     print_error=False, create_output=False, plots=False)

    assert _mixed_l2(space, ctl._v.data, v_ref.data) < 1e-13
    assert _mixed_l2(space, ctl._zeta.data, zeta_ref.data) < 1e-13


def test_instationary_linear_control_CN():
    """CN analogue (reference test/test_control.py:1447-1656): unknowns are
    v_1..v_{n_t-1} and zeta_0..zeta_{n_t-2}; rhs built by hand including the
    T1/T2 symmetrisation."""
    n_t, beta = 5, 1e-3
    tau = 0.25
    n = n_t - 1
    ctl, mesh, space = _heat_problem(n_t, CN=True, beta=beta)
    X = SpatialCoordinate(mesh)

    u_ref = MixedFunction(space, n)      # v_{i+1}
    w_ref = MixedFunction(space, n)      # zeta_i
    u_ref.sub(0).interpolate(tau * sin(3 * pi * X[0]) * sin(4 * pi * X[1]))
    u_ref.sub(1).interpolate(tau ** 2 * X[0] * exp(X[1])
                             * sin(pi * X[0]) * sin(2 * pi * X[1]))
    u_ref.sub(2).interpolate(tau ** 3 * sin(3 * pi * X[0])
                             * sin(4 * pi * X[1]))
    u_ref.sub(3).interpolate(tau ** 4 * X[0] * exp(X[1])
                             * sin(pi * X[0]) * sin(2 * pi * X[1]))
    w_ref.sub(0).interpolate(sin(pi * X[0]) * sin(2 * pi * X[1]))
    w_ref.sub(1).interpolate(tau * sin(3 * pi * X[0]) * sin(4 * pi * X[1]))
    w_ref.sub(2).interpolate(tau ** 2 * sin(pi * X[0])
                             * sin(2 * pi * X[1]))
    w_ref.sub(3).interpolate(tau ** 3 * sin(3 * pi * X[0])
                             * sin(4 * pi * X[1]))

    tr, te = TrialFunction(space), TestFunction(space)
    M = assemble(inner(tr, te) * dx)
    K = assemble(inner(grad(tr), grad(te)) * dx)
    ud = u_ref.data
    wd = w_ref.data

    y0 = []
    y1 = []
    for i in range(n):
        r0 = 0.5 * tau * M.apply(ud[i]) \
            + 0.5 * tau * K.apply(wd[i]) + M.apply(wd[i])
        if i >= 1:
            r0 = r0 + 0.5 * tau * M.apply(ud[i - 1])
        if i < n - 1:
            r0 = r0 + 0.5 * tau * K.apply(wd[i + 1]) - M.apply(wd[i + 1])
        y0.append(r0)
        r1 = 0.5 * tau * K.apply(ud[i]) + M.apply(ud[i]) \
            - 0.5 * (tau / beta) * M.apply(wd[i])
        if i >= 1:
            r1 = r1 + 0.5 * tau * K.apply(ud[i - 1]) - M.apply(ud[i - 1])
        if i < n - 1:
            r1 = r1 - 0.5 * (tau / beta) * M.apply(wd[i + 1])
        y1.append(r1)
    # untransformed rows: linear_solve applies T1/T2 itself (matching the
    # reference test, test_control.py:1530-1656)
    b_0 = jnp.stack(y0)
    b_1 = jnp.stack(y1)

    solver_parameters = {"linear_solver": "fgmres",
                         "fgmres_restart": 10,
                         "maximum_iterations": 500,
                         "relative_tolerance": 1.0e-14,
                         "absolute_tolerance": 1.0e-14,
                         "monitor_convergence": False}
    ctl.linear_solve(lambda_v_bounds=(0.25, 1.5625),
                     solver_parameters=solver_parameters,
                     v_d=MixedFunction(space, n, data=b_0),
                     f=MixedFunction(space, n, data=b_1),
                     print_error=False, create_output=False, plots=False)

    # solution layout: v[0] = 0 (delta convention), v[i+1] = u_i,
    # zeta[i] = w_i, zeta[n_t-1] = 0
    assert _mixed_l2(space, ctl._v.data[1:], u_ref.data) < 1e-13
    assert float(jnp.abs(ctl._v.data[0]).max()) < 1e-13
    assert _mixed_l2(space, ctl._zeta.data[:-1], w_ref.data) < 1e-13
    assert float(jnp.abs(ctl._zeta.data[-1]).max()) < 1e-13


@pytest.mark.parametrize("CN", [False, True])
def test_instationary_heat_default_pc_iterations(CN):
    """README headline problem (reference README.md:28-67): heat control,
    built-in preconditioner must converge at rtol 1e-6 within the default
    50-iteration budget."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space, name="v_d").interpolate(
            Constant(1.0) * cos(0.5 * pi * (X[0] - 1.0))
            * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        f = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(f, test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-4, n_t=10, time_interval=(0.0, 2.0),
        CN=CN, bcs_v=bc_t)
    info = ctl.linear_solve(
        lambda_v_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "gmres",
                           "gmres_restart": 10,
                           "maximum_iterations": 50,
                           "relative_tolerance": 1.0e-6,
                           "absolute_tolerance": 0.0,
                           "monitor_convergence": False},
        print_error=False, create_output=False, plots=False)
    assert info.converged, info.iterations
    assert info.iterations <= 50


def test_instationary_mass_solver_steps_knob():
    """set_mass_solver_steps trades (1,1)-block solve cost for pc quality:
    12 Chebyshev steps must converge within a couple of extra outer
    iterations of the reference's 20."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space, name="v_d").interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        f = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(f, test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    sp = {"linear_solver": "gmres", "gmres_restart": 10,
          "maximum_iterations": 50, "relative_tolerance": 1.0e-6,
          "absolute_tolerance": 0.0, "monitor_convergence": False}
    its = {}
    for steps in (None, 12):
        ctl = Control.Instationary(
            space, forw_diff_operator, desired_state=desired_state,
            force_f=force_f, beta=1e-4, n_t=10, time_interval=(0.0, 2.0),
            CN=True, bcs_v=bc_t)
        ctl.set_mass_solver_steps(steps)
        info = ctl.linear_solve(
            lambda_v_bounds=(0.25, 2.25), solver_parameters=dict(sp),
            print_error=False, create_output=False, plots=False)
        assert info.converged, (steps, info.iterations)
        its[steps] = info.iterations
    assert its[12] <= its[None] + 2, its


def test_instationary_set_space_v_refinement():
    """set_space_v (reference control.py:1599-1671) swaps in a refined
    state space, carrying the v/zeta trajectories over by interpolation,
    and a solve on the new space works."""
    from control_tpu.fem.assemble import interpolate as interp
    n_t = 6
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)

    # callbacks derive their space from the test function (the reference's
    # contract for set_space_v: the forms must follow the new space)
    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        sp = test.function_space()
        Xs = SpatialCoordinate(sp.mesh)
        v_d = Function(sp, name="v_d").interpolate(
            cos(0.5 * pi * (Xs[0] - 1.0)) * cos(0.5 * pi * (Xs[1] - 1.0)))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(test.function_space()), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-3, time_interval=(0.0, 1.0),
        CN=True, n_t=n_t, bcs_v=bc_t)
    X = SpatialCoordinate(mesh)
    base = interp(space, X[0] * X[1])
    v0 = MixedFunction(space, n_t)
    v0.assign(jnp.stack([float(i) * base for i in range(n_t)]))
    ctl.set_v(v0)                     # zeroes the Dirichlet boundary rows
    coarse_data = np.asarray(ctl._v.data)

    def refine2(c):
        """Exact Q1 evaluation of coarse nodal data at the nodes of the
        once-refined nested grid."""
        ny, nx = c.shape
        f = np.zeros((2 * ny - 1, 2 * nx - 1))
        f[::2, ::2] = c
        f[1::2, ::2] = 0.5 * (c[:-1, :] + c[1:, :])
        f[::2, 1::2] = 0.5 * (c[:, :-1] + c[:, 1:])
        f[1::2, 1::2] = 0.25 * (c[:-1, :-1] + c[1:, :-1]
                                + c[:-1, 1:] + c[1:, 1:])
        return f

    fine = UnitSquareMesh(8, 8, quadrilateral=True)
    space_f = FunctionSpace(fine, "Lagrange", 1)
    ctl.set_space_v(space_f)
    assert ctl._space_v is space_f
    for i in range(1, n_t):
        expect = refine2(coarse_data[i])
        expect[0, :] = expect[-1, :] = 0.0      # Dirichlet rows re-applied
        expect[:, 0] = expect[:, -1] = 0.0
        assert np.allclose(np.asarray(ctl._v.data[i]), expect,
                           atol=1e-12), i
    # zeta was zero and stays zero; bcs dict rebuilt on the new space
    assert float(jnp.max(jnp.abs(ctl._zeta.data))) == 0.0
    assert len(ctl._bcs_v) == n_t

    info = ctl.linear_solve(
        lambda_v_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "gmres", "gmres_restart": 10,
                           "maximum_iterations": 50,
                           "relative_tolerance": 1.0e-6,
                           "absolute_tolerance": 0.0,
                           "monitor_convergence": False},
        print_error=False, create_output=False, plots=False)
    assert info.converged
    assert ctl._v.data.shape == (n_t,) + space_f.grid_shape


def test_instationary_nonlinear_picard():
    """Nonlinear (state-dependent reaction) instationary control: the
    Picard loop converges and the converged trajectory satisfies the
    all-at-once residual."""
    mesh = UnitSquareMesh(6, 6, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return (inner(grad(trial), grad(test)) * dx
                + (Constant(1.0) + u ** 2.0) * inner(trial, test) * dx)

    def desired_state(test, t):
        v_d = Function(space, name="v_d").interpolate(
            Constant(1.0) * sin(pi * X[0]) * sin(pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    for CN in (False, True):
        ctl = Control.Instationary(
            space, forw_diff_operator, desired_state=desired_state,
            force_f=force_f, beta=1.0, n_t=5, time_interval=(0.0, 1.0),
            CN=CN, bcs_v=bc_t)
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
        # converged: residual small
        from control_tpu.fem.space import combine_masks, homogenize
        v_0 = ctl._initial_state()
        f = ctl.construct_f()
        v_d = ctl.construct_v_d()
        mask = combine_masks(space, homogenize(ctl._bcs_v[1]))
        r0, r1 = ctl.non_linear_res_eval(ctl._v, ctl._zeta, v_0, v_d, f,
                                         mask, mask)
        nrm = float(jnp.sqrt(jnp.vdot(r0, r0) + jnp.vdot(r1, r1)))
        assert nrm < 1e-8, (CN, nrm)


def test_D_stack_detects_interpolated_time_coefficient():
    """Forms whose time dependence enters through an EAGERLY interpolated
    coefficient (Function(W).interpolate(w(t)) inside the form callback)
    must still produce a time-varying operator stack.  Expression-tree
    containment missed these (the form holds a plain Function, not the
    Constant), silently freezing the operator at t_0 -- an O(tau^0)
    modelling error for time-dependent advection fields."""
    from control_tpu import VectorFunctionSpace
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    wspace = VectorFunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw(trial, test, u, t):
        w = Function(wspace).interpolate((exp(-1.0 * t) * X[1],
                                          0.0 * X[0]))
        from control_tpu import dot
        return (inner(grad(trial), grad(test)) * dx
                + inner(dot(w, grad(trial)), test) * dx)

    ctl = Control.Instationary(
        space, forw,
        desired_state=lambda test, t: (inner(Constant(0.0), test) * dx,
                                       Function(space)),
        force_f=lambda test, t: inner(Constant(0.0), test) * dx,
        beta=1.0, n_t=3, time_interval=(0.0, 1.0), CN=True,
        initial_condition=lambda test: Function(space),
        bcs_v=lambda sp, t: DirichletBC(sp, 0.0, "on_boundary"))

    dep_v, dep_t = ctl._probe_dependence()
    assert not dep_v
    assert dep_t
    D = ctl._D_stack(ctl._v.data)
    assert D.shape[0] == 3
    assert not np.allclose(np.asarray(D[0]), np.asarray(D[2]))
