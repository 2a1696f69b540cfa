"""Instationary Stokes control MMS convergence studies
(reference test/test_control.py:3305-3546 BE / :3754-3965 CN FE sweeps),
with order asserts added.

Manufactured continuum optimum on Omega = (0,2)^2, shifted coordinates
(x, y) = (X_0 - 1, X_1 - 1), T_t = t_f - t:

    v    = T_t (x y^3, (x^4 - y^4)/4)          div v = 0
    p    = T_t (3 x^2 y - y^3)                 (harmonic, grad p = lapl v)
    zeta = beta T_t (2 y (x^2-1)^2 (y^2-1),
                     -2 x (x^2-1) (y^2-1)^2)   div zeta = 0, zeta|bdry = 0
    mu   = 4 beta T_t x y

    f    = v_t - lapl v + grad p - zeta / beta = -v/T_t - zeta/beta
    v_d  = v - zeta_t - lapl zeta + grad mu

Both v and zeta are LINEAR in t, so the BE/CN time discretizations are
exact and the sweep isolates the FE orders (the reference's design).  The
velocity boundary data is inhomogeneous and time-dependent (exercises the
bc-lift machinery, reference control/control.py:2994-3026)."""

import numpy as np
import pytest

from control_tpu import (
    Control, RectangleMesh, FunctionSpace, VectorFunctionSpace, Function,
    SpatialCoordinate, DirichletBC, ConstantNullspace, grad, inner, dx,
    assemble, Constant)

T_F = 2.0
BETA = 1e-3


def _fields(X, t):
    x = X[0] - 1.0
    y = X[1] - 1.0
    Tt = Constant(T_F) - t
    v = (Tt * x * y ** 3, 0.25 * Tt * (x ** 4 - y ** 4))
    zeta = (BETA * Tt * 2.0 * y * (x ** 2 - 1.0) ** 2 * (y ** 2 - 1.0),
            -BETA * Tt * 2.0 * x * (x ** 2 - 1.0) * (y ** 2 - 1.0) ** 2)
    return x, y, Tt, v, zeta


def _setup(space_v, space_p, n_t, CN):
    X = SpatialCoordinate(space_v.mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        x, y, Tt, v, zeta = _fields(X, t)
        # -zeta_t = beta * (spatial profile)
        zs = (BETA * 2.0 * y * (x ** 2 - 1.0) ** 2 * (y ** 2 - 1.0),
              -BETA * 2.0 * x * (x ** 2 - 1.0) * (y ** 2 - 1.0) ** 2)
        lapl_z = (BETA * Tt * 2.0
                  * (y * (y ** 2 - 1.0) * (12.0 * x ** 2 - 4.0)
                     + 6.0 * y * (x ** 2 - 1.0) ** 2),
                  -BETA * Tt * 2.0
                  * (6.0 * x * (y ** 2 - 1.0) ** 2
                     + x * (x ** 2 - 1.0) * (12.0 * y ** 2 - 4.0)))
        grad_mu = (BETA * Tt * 4.0 * y, BETA * Tt * 4.0 * x)
        v_d = Function(space_v).interpolate(
            (v[0] + zs[0] - lapl_z[0] + grad_mu[0],
             v[1] + zs[1] - lapl_z[1] + grad_mu[1]))
        true_v = Function(space_v).interpolate(v)
        return inner(v_d, test) * dx, true_v

    def force_f(test, t):
        x, y, Tt, v, zeta = _fields(X, t)
        # v_t = -(spatial profile); -lapl v + grad p = 0 (p harmonic match)
        f = Function(space_v).interpolate(
            (-x * y ** 3 - zeta[0] / BETA,
             -0.25 * (x ** 4 - y ** 4) - zeta[1] / BETA))
        return inner(f, test) * dx

    def initial_condition(test):
        x = X[0] - 1.0
        y = X[1] - 1.0
        return Function(space_v).interpolate(
            (Constant(T_F) * x * y ** 3,
             0.25 * Constant(T_F) * (x ** 4 - y ** 4)))

    def bc_t(space_0, t):
        x = X[0] - 1.0
        y = X[1] - 1.0
        Tt = Constant(T_F) - t
        return DirichletBC(space_0,
                           (Tt * x * y ** 3,
                            0.25 * Tt * (x ** 4 - y ** 4)),
                           "on_boundary")

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
        tc = Constant(float(t))
        x, y, Tt, v, zeta = _fields(X, tc)
        v_ref = Function(space_v).interpolate(v)
        z_ref = Function(space_v).interpolate(zeta)
        dv = Function(space_v, data=ctl._v.data[i] - v_ref.data)
        dz = Function(space_v, data=ctl._zeta.data[i] - z_ref.data)
        ev2 += float(assemble(inner(dv, dv) * dx))
        ez2 += float(assemble(inner(dz, dz) * dx))
    return np.sqrt(tau * ev2), np.sqrt(tau * ez2)


@pytest.mark.parametrize("CN", [True, False])
def test_MMS_instationary_stokes_convergence_FE(CN):
    n_t = 6
    errs_v, errs_z = [], []
    for N in (4, 8, 16):
        mesh = RectangleMesh(N, N, 2.0, 2.0, quadrilateral=True)
        space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
        space_p = FunctionSpace(mesh, "Lagrange", 1)
        ctl = _setup(space_v, space_p, n_t, CN)
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
        ev, ez = _errors(ctl, space_v)
        errs_v.append(ev)
        errs_z.append(ez)
    ov = np.log(np.array(errs_v[:-1]) / np.array(errs_v[1:])) / np.log(2.0)
    oz = np.log(np.array(errs_z[:-1]) / np.array(errs_z[1:])) / np.log(2.0)
    # Q2 velocity: third order in the space-time L2 norm
    assert ov[-1] > 2.5, (errs_v, ov)
    assert oz[-1] > 2.5, (errs_z, oz)
