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

# slow tier: Stokes MMS order study: multiple resolutions
pytestmark = pytest.mark.slow

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


def _setup_time(space_v, space_p, n_t, CN):
    """Time-convergence variant (reference test/test_control.py:3546-3754
    BE / :3965-4171 CN): time-NONLINEAR factors g(t) = exp(-t) on the
    state and h(t) = (t_f - t) exp(-t) on the adjoint (h(t_f) = 0), same
    spatial profiles, so the sweep in n_t isolates the time orders."""
    import control_tpu as ct
    X = SpatialCoordinate(space_v.mesh)

    def g(t):
        return ct.exp(-1.0 * t)

    def dg(t):
        return -1.0 * ct.exp(-1.0 * t)

    def h(t):
        return (Constant(T_F) - t) * ct.exp(-1.0 * t)

    def dh(t):
        return (-1.0 - (Constant(T_F) - t)) * ct.exp(-1.0 * t)

    def vp(X):
        x = X[0] - 1.0
        y = X[1] - 1.0
        return (x * y ** 3, 0.25 * (x ** 4 - y ** 4))

    def zp(X):
        x = X[0] - 1.0
        y = X[1] - 1.0
        return (2.0 * y * (x ** 2 - 1.0) ** 2 * (y ** 2 - 1.0),
                -2.0 * x * (x ** 2 - 1.0) * (y ** 2 - 1.0) ** 2)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        x = X[0] - 1.0
        y = X[1] - 1.0
        V = vp(X)
        Z = zp(X)
        lapl_zu = (2.0 * (y * (y ** 2 - 1.0) * (12.0 * x ** 2 - 4.0)
                          + 6.0 * y * (x ** 2 - 1.0) ** 2),
                   -2.0 * (6.0 * x * (y ** 2 - 1.0) ** 2
                           + x * (x ** 2 - 1.0) * (12.0 * y ** 2 - 4.0)))
        grad_mu_u = (4.0 * y, 4.0 * x)
        # v_d = v - zeta_t - lapl zeta + grad mu, zeta = beta h Z,
        # mu = 4 beta h x y
        v_d = Function(space_v).interpolate(
            (g(t) * V[0] + BETA * (-dh(t) * Z[0]
                                   - h(t) * lapl_zu[0]
                                   + h(t) * grad_mu_u[0]),
             g(t) * V[1] + BETA * (-dh(t) * Z[1]
                                   - h(t) * lapl_zu[1]
                                   + h(t) * grad_mu_u[1])))
        true_v = Function(space_v).interpolate(
            (g(t) * V[0], g(t) * V[1]))
        return inner(v_d, test) * dx, true_v

    def force_f(test, t):
        V = vp(X)
        Z = zp(X)
        # f = v_t - lapl v + grad p - zeta/beta = g' V - h Z
        f = Function(space_v).interpolate(
            (dg(t) * V[0] - h(t) * Z[0],
             dg(t) * V[1] - h(t) * Z[1]))
        return inner(f, test) * dx

    def initial_condition(test):
        V = vp(X)
        return Function(space_v).interpolate(
            (g(Constant(0.0)) * V[0], g(Constant(0.0)) * V[1]))

    def bc_t(space_0, t):
        V = vp(X)
        return DirichletBC(space_0, (g(t) * V[0], g(t) * V[1]),
                           "on_boundary")

    ctl = Control.Instationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=BETA, space_p=space_p, n_t=n_t,
        time_interval=(0.0, T_F), CN=CN,
        initial_condition=initial_condition, bcs_v=bc_t)

    def v_exact(t):
        V = vp(X)
        return (g(t) * V[0], g(t) * V[1])

    def z_exact(t):
        Z = zp(X)
        return (BETA * h(t) * Z[0], BETA * h(t) * Z[1])

    return ctl, v_exact, z_exact


@pytest.mark.parametrize("CN,expected_order", [(False, 1.0), (True, 2.0)])
def test_MMS_instationary_stokes_convergence_time(CN, expected_order):
    from control_tpu import RectangleMesh as _RM
    # CN's O(tau^2) error sits below the 12^2 FE floor at these n_t;
    # measure it on a finer mesh with coarser time grids
    mesh_n, n_ts = (12, (5, 9, 17)) if not CN else (24, (3, 5, 9))
    mesh = _RM(mesh_n, mesh_n, 2.0, 2.0, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    errs_v = []
    for n_t in n_ts:
        ctl, v_exact, z_exact = _setup_time(space_v, space_p, n_t, CN)
        ctl.incompressible_linear_solve(
            ConstantNullspace(),
            lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
            solver_parameters={"linear_solver": "fgmres",
                               "fgmres_restart": 10,
                               "maximum_iterations": 200,
                               "relative_tolerance": 1.0e-11,
                               "absolute_tolerance": 1.0e-11,
                               "monitor_convergence": False},
            print_error=False, create_output=False, plots=False)
        tau = ctl._tau
        ev2 = 0.0
        for i, t in enumerate(ctl._times()):
            v_ref = Function(space_v).interpolate(
                v_exact(Constant(float(t))))
            dv = Function(space_v, data=ctl._v.data[i] - v_ref.data)
            ev2 += float(assemble(inner(dv, dv) * dx))
        errs_v.append(np.sqrt(tau * ev2))
    ov = np.log(np.array(errs_v[:-1]) / np.array(errs_v[1:])) / np.log(2.0)
    assert ov[-1] > expected_order - 0.35, (errs_v, ov)
    assert ov[-1] < expected_order + 0.75, (errs_v, ov)


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
