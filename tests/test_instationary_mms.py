"""MMS convergence studies for the instationary solver (reference
test/test_control.py:1658-3044 families), with order asserts added.

Manufactured continuum optimum on Omega = (0,2)^2 with
c(x,y) = cos(pi (x-1)/2) cos(pi (y-1)/2),  Delta c = -lambda c,
lambda = pi^2 / 2:

    v    = 1 + g(t) c,     zeta = h(t) c,    h(t_f) = 0
    v_d  = 1 + (-h' + lambda h + g) c        (adjoint: -z_t - Dz + v = v_d)
    f    = (g' + lambda g - h / beta) c      (state:   v_t - Dv - z/b = f)

with inhomogeneous Dirichlet data v = 1 on the boundary (exercises the
bc-lift machinery) and initial condition v(0) = 1 + g(0) c.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (
    Control, RectangleMesh, FunctionSpace, Function,
    TestFunction, SpatialCoordinate, DirichletBC,
    grad, inner, dot, dx, assemble, sin, cos, exp, pi, Constant,
    as_vector)

# slow tier: MMS order study: multiple resolutions, one fresh compile each
pytestmark = pytest.mark.slow

T_F = 2.0
LAM = 0.5 * pi ** 2
BETA = 1.0


def _c(X):
    return cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0))


def _g(t):
    return exp(-1.0 * t)


def _dg(t):
    return -1.0 * exp(-1.0 * t)


def _h(t):
    return (T_F - t) * exp(-1.0 * t)


def _dh(t):
    return (-1.0) * exp(-1.0 * t) - (T_F - t) * exp(-1.0 * t)


def _setup(space, n_t, CN):
    X = SpatialCoordinate(space.mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            1.0 + (-1.0 * _dh(t) + LAM * _h(t) + _g(t)) * _c(X))
        true_v = Function(space).interpolate(1.0 + _g(t) * _c(X))
        return inner(v_d, test) * dx, true_v

    def force_f(test, t):
        f = Function(space).interpolate(
            (_dg(t) + LAM * _g(t) - _h(t) / BETA) * _c(X))
        return inner(f, test) * dx

    def initial_condition(test):
        return Function(space).interpolate(1.0 + _g(Constant(0.0)) * _c(X))

    def bc_t(space_0, t):
        return DirichletBC(space_0, 1.0, "on_boundary")

    return Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=BETA, n_t=n_t, time_interval=(0.0, T_F),
        CN=CN, initial_condition=initial_condition, bcs_v=bc_t)


def _error(ctl, space):
    """Space-time L2 errors of v and zeta vs the analytic optimum."""
    X = SpatialCoordinate(space.mesh)
    tau = ctl._tau
    ev2 = ez2 = 0.0
    for i, t in enumerate(ctl._times()):
        v_ref = Function(space).interpolate(
            1.0 + _g(Constant(float(t))) * _c(X))
        z_ref = Function(space).interpolate(
            _h(Constant(float(t))) * _c(X))
        dv = Function(space, data=ctl._v.data[i] - v_ref.data)
        dz = Function(space, data=ctl._zeta.data[i] - z_ref.data)
        ev2 += float(assemble(inner(dv, dv) * dx))
        ez2 += float(assemble(inner(dz, dz) * dx))
    return np.sqrt(tau * ev2), np.sqrt(tau * ez2)


@pytest.mark.parametrize("CN,expected_order", [(False, 1.0), (True, 2.0)])
def test_MMS_instationary_heat_time_convergence(CN, expected_order):
    mesh = RectangleMesh(24, 24, 2.0, 2.0, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 2)
    errs_v = []
    for n_t in (5, 9, 17):
        ctl = _setup(space, n_t, CN)
        ctl.linear_solve(
            lambda_v_bounds=(0.25, 1.5625),
            solver_parameters={"linear_solver": "gmres",
                               "gmres_restart": 30,
                               "maximum_iterations": 300,
                               "relative_tolerance": 1.0e-11,
                               "absolute_tolerance": 1.0e-11,
                               "monitor_convergence": False},
            print_error=False, create_output=False, plots=False)
        ev, ez = _error(ctl, space)
        errs_v.append(ev)
    orders = np.log(np.array(errs_v[:-1])
                    / np.array(errs_v[1:])) / np.log(2.0)
    assert orders[-1] > expected_order - 0.35, (errs_v, orders)
    assert orders[-1] < expected_order + 0.75, (errs_v, orders)


def test_MMS_instationary_heat_space_convergence():
    """Fixed n_t (time-exact manufactured solution is linear in t would be
    ideal; here fine time grid), sweep the mesh: Q1 gives order 2."""
    errs = []
    for N in (8, 16, 32):
        mesh = RectangleMesh(N, N, 2.0, 2.0, quadrilateral=True)
        space = FunctionSpace(mesh, "Lagrange", 1)
        ctl = _setup(space, 33, True)       # CN, fine time grid
        ctl.linear_solve(
            lambda_v_bounds=(0.25, 2.25),
            solver_parameters={"linear_solver": "gmres",
                               "gmres_restart": 30,
                               "maximum_iterations": 300,
                               "relative_tolerance": 1.0e-11,
                               "absolute_tolerance": 1.0e-11,
                               "monitor_convergence": False},
            print_error=False, create_output=False, plots=False)
        ev, ez = _error(ctl, space)
        errs.append(ev)
    orders = np.log(np.array(errs[:-1]) / np.array(errs[1:])) / np.log(2.0)
    assert orders[-1] > 1.6, (errs, orders)


# ---------------------------------------------------------------------------
# convection-diffusion MMS (reference test/test_control.py:2297-3044):
# recirculating time-modulated wind w = q(t) (2y(1-x^2), -2x(1-y^2)) in
# coordinates shifted to (-1,1)^2; div w = 0, w.n = 0 on the boundary.
# With v = 1 + g(t) c, zeta = h(t) c the continuum KKT gives
#   f   = (g' + lam g - h/beta) c + g(t) q(t) s(x,y)
#   v_d = 1 + (-h' + lam h + g) c - h(t) q(t) s(x,y)
# where s = w0 . grad c / q is the (time-independent) spatial advection
# profile, derived in closed form below.
# ---------------------------------------------------------------------------

def _q(t):
    return cos(0.5 * pi * t)


def _s(X):
    """w0 . grad(c) with w0 = (2y(1-x^2), -2x(1-y^2)), shifted coords."""
    a = 0.5 * pi
    u = X[0] - 1.0
    w = X[1] - 1.0
    return a * (-2.0 * w * (1.0 - u * u) * sin(a * u) * cos(a * w)
                + 2.0 * u * (1.0 - w * w) * cos(a * u) * sin(a * w))


def _setup_convdiff(space, n_t, CN):
    X = SpatialCoordinate(space.mesh)

    def forw_diff_operator(trial, test, u, t):
        xs = X[0] - 1.0
        ys = X[1] - 1.0
        wind = as_vector([_q(t) * 2.0 * ys * (1.0 - xs * xs),
                          -_q(t) * 2.0 * xs * (1.0 - ys * ys)])
        return (inner(grad(trial), grad(test)) * dx
                + inner(dot(wind, grad(trial)), test) * dx)

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            1.0 + (-1.0 * _dh(t) + LAM * _h(t) + _g(t)) * _c(X)
            - _h(t) * _q(t) * _s(X))
        true_v = Function(space).interpolate(1.0 + _g(t) * _c(X))
        return inner(v_d, test) * dx, true_v

    def force_f(test, t):
        f = Function(space).interpolate(
            (_dg(t) + LAM * _g(t) - _h(t) / BETA) * _c(X)
            + _g(t) * _q(t) * _s(X))
        return inner(f, test) * dx

    def initial_condition(test):
        return Function(space).interpolate(1.0 + _g(Constant(0.0)) * _c(X))

    def bc_t(space_0, t):
        return DirichletBC(space_0, 1.0, "on_boundary")

    return Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=BETA, n_t=n_t, time_interval=(0.0, T_F),
        CN=CN, initial_condition=initial_condition, bcs_v=bc_t)


_CONVDIFF_SP = {"linear_solver": "fgmres", "fgmres_restart": 30,
                "maximum_iterations": 300,
                "relative_tolerance": 1.0e-11,
                "absolute_tolerance": 1.0e-11,
                "monitor_convergence": False}


@pytest.mark.parametrize("CN,expected_order", [(False, 1.0), (True, 2.0)])
def test_MMS_instationary_convdiff_time_convergence(CN, expected_order):
    """Reference test/test_control.py:2494-2675 (BE) / :2860-3044 (CN),
    with order asserts."""
    mesh = RectangleMesh(24, 24, 2.0, 2.0, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 2)
    errs_v = []
    for n_t in (5, 9, 17):
        ctl = _setup_convdiff(space, n_t, CN)
        ctl.linear_solve(lambda_v_bounds=(0.25, 1.5625),
                         solver_parameters=_CONVDIFF_SP,
                         print_error=False, create_output=False,
                         plots=False)
        ev, ez = _error(ctl, space)
        errs_v.append(ev)
    orders = np.log(np.array(errs_v[:-1])
                    / np.array(errs_v[1:])) / np.log(2.0)
    assert orders[-1] > expected_order - 0.35, (errs_v, orders)
    assert orders[-1] < expected_order + 0.75, (errs_v, orders)


def test_MMS_instationary_convdiff_space_convergence():
    """Reference test/test_control.py:2297-2494 (FE sweep): Q1 attains
    order 2 in the space-time L2 norm on the nonsymmetric operator."""
    errs = []
    for N in (8, 16, 32):
        mesh = RectangleMesh(N, N, 2.0, 2.0, quadrilateral=True)
        space = FunctionSpace(mesh, "Lagrange", 1)
        ctl = _setup_convdiff(space, 33, True)
        ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                         solver_parameters=_CONVDIFF_SP,
                         print_error=False, create_output=False,
                         plots=False)
        ev, ez = _error(ctl, space)
        errs.append(ev)
    orders = np.log(np.array(errs[:-1]) / np.array(errs[1:])) / np.log(2.0)
    assert orders[-1] > 1.6, (errs, orders)


def test_instationary_convection_diffusion_iterations():
    """Nonsymmetric forward operator (BASELINE config 3): recirculating
    wind, GMRES with the built-in pc converges at 1e-6 within the default
    50-iteration budget."""
    mesh = RectangleMesh(16, 16, 2.0, 2.0, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    nu = 1.0 / 50.0

    def forw_diff_operator(trial, test, u, t):
        wind = as_vector([X[1] - 1.0, 1.0 - X[0]])
        return (nu * inner(grad(trial), grad(test)) * dx
                + inner(dot(wind, grad(trial)), test) * dx)

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            sin(0.5 * pi * X[0]) * sin(0.5 * pi * X[1]))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    for CN in (True, False):
        ctl = Control.Instationary(
            space, forw_diff_operator, desired_state=desired_state,
            force_f=force_f, beta=1e-2, n_t=10, time_interval=(0.0, 2.0),
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
        assert info.converged, (CN, info.iterations)
