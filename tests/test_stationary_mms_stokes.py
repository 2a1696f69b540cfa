"""Stationary Stokes / Navier-Stokes control MMS convergence studies
(reference test/test_control.py:361-553 Stokes, :1095-1240 NSE), with
order asserts added.

Same manufactured spatial profiles as the instationary studies (shifted
coordinates x = X_0 - 1, y = X_1 - 1 on (0,2)^2):

  Stokes:  v = (x y^3, (x^4-y^4)/4), p = 3x^2 y - y^3 (grad p = lapl v),
           zeta = beta (2y(x^2-1)^2(y^2-1), -2x(x^2-1)(y^2-1)^2),
           mu = 4 beta x y;  f = -zeta/beta, v_d = v - lapl zeta + grad mu.
  NSE:     zeta = 0, v_d = v, f = -nu lapl v + (grad v) v.
"""

import pytest
import numpy as np

from control_tpu import (
    Control, RectangleMesh, FunctionSpace, VectorFunctionSpace, Function,
    SpatialCoordinate, DirichletBC, ConstantNullspace, grad, inner, dot,
    dx, assemble)

# slow tier: stationary (N)SE MMS studies: multiple resolutions
pytestmark = pytest.mark.slow

BETA = 1e-3


def _profiles(X):
    x = X[0] - 1.0
    y = X[1] - 1.0
    v = (x * y ** 3, 0.25 * (x ** 4 - y ** 4))
    zeta = (BETA * 2.0 * y * (x ** 2 - 1.0) ** 2 * (y ** 2 - 1.0),
            -BETA * 2.0 * x * (x ** 2 - 1.0) * (y ** 2 - 1.0) ** 2)
    return x, y, v, zeta


def _errors(ctl, space_v, with_zeta):
    """L2 errors measured in a degree+2 space (the reference's metric,
    test/test_control.py:520-552)."""
    from control_tpu import VectorFunctionSpace as _V
    mesh = space_v.mesh
    sp_ref = _V(mesh, "Lagrange", space_v.degree + 2)
    X = SpatialCoordinate(mesh)
    x, y, v, zeta = _profiles(X)
    v_ref = Function(sp_ref).interpolate(v)
    vh = Function(sp_ref).interpolate(ctl._v)
    dv = Function(sp_ref, data=vh.data - v_ref.data)
    ev = float(np.sqrt(abs(float(assemble(inner(dv, dv) * dx)))))
    zh = Function(sp_ref).interpolate(ctl._zeta)
    if with_zeta:
        z_ref = Function(sp_ref).interpolate(zeta)
        dz = Function(sp_ref, data=zh.data - z_ref.data)
    else:
        dz = zh
    ez = float(np.sqrt(abs(float(assemble(inner(dz, dz) * dx)))))
    return ev, ez


def test_MMS_stationary_stokes_control():
    errs_v, errs_z = [], []
    for N in (4, 8, 16):
        mesh = RectangleMesh(N, N, 2.0, 2.0, quadrilateral=True)
        space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
        space_p = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)
        x, y, v_expr, zeta_expr = _profiles(X)

        def forw_diff_operator(trial, test, u):
            return inner(grad(trial), grad(test)) * dx

        def desired_state(test):
            lapl_z = (BETA * 2.0
                      * (y * (y ** 2 - 1.0) * (12.0 * x ** 2 - 4.0)
                         + 6.0 * y * (x ** 2 - 1.0) ** 2),
                      -BETA * 2.0
                      * (6.0 * x * (y ** 2 - 1.0) ** 2
                         + x * (x ** 2 - 1.0) * (12.0 * y ** 2 - 4.0)))
            grad_mu = (BETA * 4.0 * y, BETA * 4.0 * x)
            v_d = Function(space_v).interpolate(
                (v_expr[0] - lapl_z[0] + grad_mu[0],
                 v_expr[1] - lapl_z[1] + grad_mu[1]))
            true_v = Function(space_v).interpolate(v_expr)
            return inner(v_d, test) * dx, true_v

        def force_f(test):
            # -lapl v + grad p = 0 for this harmonic pair: f = -zeta/beta
            f = Function(space_v).interpolate(
                (-zeta_expr[0] / BETA, -zeta_expr[1] / BETA))
            return inner(f, test) * dx

        ctl = Control.Stationary(
            space_v, forw_diff_operator, desired_state=desired_state,
            force_f=force_f, beta=BETA, space_p=space_p,
            bcs_v=DirichletBC(space_v, v_expr, "on_boundary"))
        ctl.incompressible_linear_solve(
            ConstantNullspace(),
            lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
            solver_parameters={"linear_solver": "fgmres",
                               "fgmres_restart": 10,
                               "maximum_iterations": 200,
                               "relative_tolerance": 1.0e-10,
                               "absolute_tolerance": 1.0e-10,
                               "monitor_convergence": False},
            print_error=False, create_output=False, plots=False)
        ev, ez = _errors(ctl, space_v, with_zeta=True)
        errs_v.append(ev)
        errs_z.append(ez)
    ov = np.log(np.array(errs_v[:-1]) / np.array(errs_v[1:])) / np.log(2.0)
    oz = np.log(np.array(errs_z[:-1]) / np.array(errs_z[1:])) / np.log(2.0)
    assert ov[-1] > 2.5, (errs_v, ov)
    assert oz[-1] > 2.5, (errs_z, oz)


def test_MMS_stationary_navier_stokes_control():
    nu = 1.0 / 100.0
    errs_v, errs_z = [], []
    for N in (4, 8, 16):
        mesh = RectangleMesh(N, N, 2.0, 2.0, quadrilateral=True)
        space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
        space_p = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)
        x, y, v_expr, _ = _profiles(X)

        def forw_diff_operator(trial, test, u):
            return (nu * inner(grad(trial), grad(test)) * dx
                    + inner(dot(grad(trial), u), test) * dx)

        def desired_state(test):
            v_d = Function(space_v).interpolate(v_expr)
            return inner(v_d, test) * dx, v_d

        def force_f(test):
            f = Function(space_v).interpolate(
                (-nu * 6.0 * x * y
                 + 0.25 * x * y ** 6 + 0.75 * x ** 5 * y ** 2,
                 -nu * 3.0 * (x ** 2 - y ** 2)
                 + 0.75 * x ** 4 * y ** 3 + 0.25 * y ** 7))
            return inner(f, test) * dx

        ctl = Control.Stationary(
            space_v, forw_diff_operator, desired_state=desired_state,
            force_f=force_f, beta=BETA, space_p=space_p,
            bcs_v=DirichletBC(space_v, v_expr, "on_boundary"))
        ctl.incompressible_non_linear_solve(
            ConstantNullspace(),
            lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
            solver_parameters={"linear_solver": "fgmres",
                               "fgmres_restart": 10,
                               "maximum_iterations": 200,
                               "relative_tolerance": 1.0e-10,
                               "absolute_tolerance": 1.0e-10,
                               "monitor_convergence": False},
            max_non_linear_iter=12, relative_non_linear_tol=1e-7,
            absolute_non_linear_tol=1e-9,
            print_error_linear=False, print_error_non_linear=False,
            create_output=False, plots=False)
        ev, ez = _errors(ctl, space_v, with_zeta=False)
        errs_v.append(ev)
        errs_z.append(ez)
    ov = np.log(np.array(errs_v[:-1]) / np.array(errs_v[1:])) / np.log(2.0)
    # 3-point order estimates on the nonlinear problem oscillate around 3
    # (observed 4.0 then 2.4); gate the mean and a floor on the last
    assert np.mean(ov) > 2.5, (errs_v, ov)
    assert ov[-1] > 2.2, (errs_v, ov)
    assert errs_z[-1] < 1e-4, errs_z
