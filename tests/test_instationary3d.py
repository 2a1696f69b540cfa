"""3-D instationary control (capability extension; the reference is 2-D
only).  Family-1 algebraic exact-solution test with hand-built rhs on a
unit cube, plus a ParaDiag-sweep consistency check in 3-D.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (
    Control, UnitCubeMesh, FunctionSpace, Function, MixedFunction,
    TestFunction, TrialFunction, SpatialCoordinate, DirichletBC,
    grad, inner, dx, assemble, sin, cos, exp, pi)

# slow tier: 3-D instationary control solves (BE + both sweeps)
pytestmark = pytest.mark.slow


def _mixed_l2(space, a_data, b_data):
    err2 = 0.0
    for i in range(a_data.shape[0]):
        d = Function(space, data=a_data[i] - b_data[i])
        err2 += float(assemble(inner(d, d) * dx))
    return np.sqrt(abs(err2))


def _heat_problem_3d(n_t, CN, beta=1e-3, mesh_n=4, degree=1):
    mesh = UnitCubeMesh(mesh_n, mesh_n, mesh_n)
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


# Q1 hex mass with Jacobi: tensor cube of the 1-D (0.5, 1.5) interval
_LAM_3D = (0.1, 3.4)


def test_instationary_3d_linear_control_BE():
    """3-D analogue of the BE exact-solution test (2-D version mirrors
    reference test/test_control.py:1243-1444)."""
    n_t, beta = 5, 1e-3
    tau = 0.25
    ctl, mesh, space = _heat_problem_3d(n_t, CN=False, beta=beta)
    X = SpatialCoordinate(mesh)

    v_ref = MixedFunction(space, n_t)
    zeta_ref = MixedFunction(space, n_t)
    s1 = sin(3 * pi * X[0]) * sin(4 * pi * X[1]) * sin(pi * X[2])
    s2 = X[0] * exp(X[1]) * sin(pi * X[0]) * sin(2 * pi * X[1]) \
        * sin(pi * X[2])
    s3 = sin(pi * X[0]) * sin(2 * pi * X[1]) * sin(pi * X[2])
    v_ref.sub(1).interpolate(tau * s1)
    v_ref.sub(2).interpolate(tau ** 2 * s2)
    v_ref.sub(3).interpolate(tau ** 3 * s1)
    v_ref.sub(4).interpolate(tau ** 4 * s2)
    zeta_ref.sub(0).interpolate(s3)
    zeta_ref.sub(1).interpolate(tau * s1)
    zeta_ref.sub(2).interpolate(tau ** 2 * s3)
    zeta_ref.sub(3).interpolate(tau ** 3 * s1)

    u, w = TrialFunction(space), TestFunction(space)
    M = assemble(inner(u, w) * dx)
    K = assemble(inner(grad(u), grad(w)) * dx)

    vd = v_ref.data
    zd = zeta_ref.data
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
    ctl.linear_solve(lambda_v_bounds=_LAM_3D,
                     solver_parameters=solver_parameters,
                     v_d=MixedFunction(space, n_t, data=jnp.asarray(b_0)),
                     f=MixedFunction(space, n_t, data=jnp.asarray(b_1)),
                     print_error=False, create_output=False, plots=False)

    assert _mixed_l2(space, ctl._v.data, v_ref.data) < 1e-12
    assert _mixed_l2(space, ctl._zeta.data, zeta_ref.data) < 1e-12


@pytest.mark.parametrize("sweep", ["scan", "paradiag"])
def test_instationary_3d_CN_sweeps(sweep):
    """CN solve on the cube through the built-in pc with both Schur-sweep
    algorithms: same converged solution, iteration budget held."""
    n_t, beta = 8, 1e-3
    ctl, mesh, space = _heat_problem_3d(n_t, CN=True, beta=beta, mesh_n=8)
    X = SpatialCoordinate(mesh)

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0))
            * cos(0.5 * pi * (X[2] - 1.0)))
        return inner(v_d, test) * dx, v_d

    ctl.set_desired_state(desired_state)
    ctl.set_schur_sweep(sweep)
    info = ctl.linear_solve(
        lambda_v_bounds=_LAM_3D,
        solver_parameters={"linear_solver": "gmres", "gmres_restart": 10,
                           "maximum_iterations": 50,
                           "relative_tolerance": 1.0e-10,
                           "absolute_tolerance": 0.0,
                           "monitor_convergence": False},
        print_error=False, create_output=False, plots=False)
    assert info.converged
    assert info.iterations <= 25
    sol = np.asarray(ctl._v.data).copy()
    if not hasattr(test_instationary_3d_CN_sweeps, "_ref"):
        test_instationary_3d_CN_sweeps._ref = sol
    else:
        ref = test_instationary_3d_CN_sweeps._ref
        assert np.max(np.abs(sol - ref)) < 1e-8
