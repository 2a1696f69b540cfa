"""Instationary Navier-Stokes control MMS convergence studies
(reference test/test_control.py:4371-4556 BE / :4740-4928 CN FE sweeps),
with order asserts added.

The reference's design: zeta = 0 exactly (the desired state v_d = v is
achievable, so the optimal control vanishes) and

    v = (t_f - t) (x y^3, (x^4 - y^4)/4)     (shifted coords, div-free)
    f = v_t - nu lapl v + (v . grad) v       (p = 0)

Every term of the BE/CN schemes is evaluated at time nodes where the
continuum equations hold pointwise and v is linear in t, so both time
discretizations are EXACT for this solution and the mesh sweep isolates
the FE orders."""

import numpy as np
import pytest

from control_tpu import (
    Control, RectangleMesh, FunctionSpace, VectorFunctionSpace, Function,
    SpatialCoordinate, DirichletBC, ConstantNullspace, grad, inner, dot,
    dx, assemble, Constant)

T_F = 2.0
BETA = 1e-3
NU = 1.0 / 50.0


def _v_expr(X, t):
    x = X[0] - 1.0
    y = X[1] - 1.0
    Tt = Constant(T_F) - t
    return (Tt * x * y ** 3, 0.25 * Tt * (x ** 4 - y ** 4))


def _setup(space_v, space_p, n_t, CN):
    X = SpatialCoordinate(space_v.mesh)

    def forw_diff_operator(trial, test, u, t):
        return (NU * inner(grad(trial), grad(test)) * dx
                + inner(dot(grad(trial), u), test) * dx)

    def desired_state(test, t):
        v_d = Function(space_v).interpolate(_v_expr(X, t))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        x = X[0] - 1.0
        y = X[1] - 1.0
        Tt = Constant(T_F) - t
        # f = v_t - nu lapl v + (grad v) v, all in closed form:
        #   v_t = -(x y^3, (x^4-y^4)/4)
        #   lapl v = Tt (6 x y, 3 (x^2 - y^2))
        #   (grad v) v = Tt^2 (0.25 x y^6 + 0.75 x^5 y^2,
        #                      0.75 x^4 y^3 + 0.25 y^7)
        f = Function(space_v).interpolate(
            (-x * y ** 3 - NU * Tt * 6.0 * x * y
             + Tt * Tt * (0.25 * x * y ** 6 + 0.75 * x ** 5 * y ** 2),
             -0.25 * (x ** 4 - y ** 4)
             - NU * Tt * 3.0 * (x ** 2 - y ** 2)
             + Tt * Tt * (0.75 * x ** 4 * y ** 3 + 0.25 * y ** 7)))
        return inner(f, test) * dx

    def initial_condition(test):
        return Function(space_v).interpolate(
            _v_expr(X, Constant(0.0)))

    def bc_t(space_0, t):
        return DirichletBC(space_0, _v_expr(X, t), "on_boundary")

    return Control.Instationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=BETA, space_p=space_p, n_t=n_t,
        time_interval=(0.0, T_F), CN=CN,
        initial_condition=initial_condition, bcs_v=bc_t)


def _errors(ctl, space_v):
    X = SpatialCoordinate(space_v.mesh)
    tau = ctl._tau
    ev2 = ez2 = 0.0
    for i, t in enumerate(ctl._times()):
        v_ref = Function(space_v).interpolate(
            _v_expr(X, Constant(float(t))))
        dv = Function(space_v, data=ctl._v.data[i] - v_ref.data)
        dz = Function(space_v, data=ctl._zeta.data[i])
        ev2 += float(assemble(inner(dv, dv) * dx))
        ez2 += float(assemble(inner(dz, dz) * dx))
    return np.sqrt(tau * ev2), np.sqrt(tau * ez2)


@pytest.mark.parametrize("CN", [True, False])
def test_MMS_instationary_navier_stokes_convergence_FE(CN):
    n_t = 5
    errs_v, errs_z = [], []
    for N in (4, 8, 16):
        mesh = RectangleMesh(N, N, 2.0, 2.0, quadrilateral=True)
        space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
        space_p = FunctionSpace(mesh, "Lagrange", 1)
        ctl = _setup(space_v, space_p, n_t, CN)
        ctl.incompressible_non_linear_solve(
            ConstantNullspace(),
            lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
            solver_parameters={"linear_solver": "fgmres",
                               "fgmres_restart": 10,
                               "maximum_iterations": 200,
                               "relative_tolerance": 1.0e-10,
                               "absolute_tolerance": 1.0e-10,
                               "monitor_convergence": False},
            max_non_linear_iter=10, relative_non_linear_tol=1e-7,
            absolute_non_linear_tol=1e-9,
            print_error_linear=False, print_error_non_linear=False,
            create_output=False, plots=False)
        ev, ez = _errors(ctl, space_v)
        errs_v.append(ev)
        errs_z.append(ez)
    ov = np.log(np.array(errs_v[:-1]) / np.array(errs_v[1:])) / np.log(2.0)
    # Q2 velocity attains third order; the computed adjoint stays near its
    # exact value zero (no order structure to assert)
    assert ov[-1] > 2.5, (errs_v, ov)
    assert errs_z[-1] < 1e-4, errs_z
