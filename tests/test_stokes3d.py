"""3-D incompressible (Stokes-like) stationary control on a unit cube with
Q2-Q1 Taylor-Hood (capability extension; the 2-D version of this test
mirrors reference test/test_control.py:232-358).
"""

import pytest
import numpy as np
import jax.numpy as jnp

from control_tpu import (
    Control, UnitCubeMesh, FunctionSpace, VectorFunctionSpace, Function,
    TestFunction, SpatialCoordinate, DirichletBC, ConstantNullspace,
    grad, div, inner, dx, assemble, sin, exp, pi)

# slow tier: 3-D stationary Taylor-Hood control solves
pytestmark = pytest.mark.slow


def _l2(space, a, b):
    d = Function(space, data=a.data - b.data)
    return float(jnp.sqrt(jnp.abs(assemble(inner(d, d) * dx))))


def test_stationary_incompressible_linear_control_3d():
    mesh = UnitCubeMesh(2, 2, 2)
    X = SpatialCoordinate(mesh)
    space_0 = VectorFunctionSpace(mesh, "Lagrange", 2, dim=3)
    space_1 = FunctionSpace(mesh, "Lagrange", 1)
    test_0 = TestFunction(space_0)
    test_1 = TestFunction(space_1)

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx + inner(trial, test) * dx

    def desired_state(test):
        v_d = Function(space_0, name="v_d").interpolate((0.0, 0.0, 0.0))
        true_v = Function(space_0, name="true_v")
        return inner(v_d, test) * dx, true_v

    def force_f(test):
        return inner(Function(space_0), test) * dx

    beta = 10.0 ** -3
    mcs = Control.Stationary(
        space_0, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, space_p=space_1,
        bcs_v=DirichletBC(space_0, (0.0, 0.0, 0.0), "on_boundary"))

    v_ref = Function(space_0).interpolate(
        (X[0] * exp(X[1]) * sin(pi * X[0]) * sin(2.0 * pi * X[1])
         * sin(pi * X[2]),
         sin(3.0 * pi * X[0]) * sin(4.0 * pi * X[1]) * sin(pi * X[2]),
         sin(pi * X[0]) * sin(pi * X[1]) * sin(2.0 * pi * X[2])))
    zeta_ref = Function(space_0).interpolate(
        (sin(pi * X[0]) * sin(2.0 * pi * X[1]) * sin(pi * X[2]),
         sin(3.0 * pi * X[0]) * sin(4.0 * pi * X[1]) * sin(pi * X[2]),
         sin(2.0 * pi * X[0]) * sin(pi * X[1]) * sin(pi * X[2])))
    p_ref = Function(space_1).interpolate(
        sin(pi * X[0]) * sin(2.0 * pi * X[1]) * sin(pi * X[2]))
    mu_ref = Function(space_1).interpolate(X[0] * exp(X[1]) * (1.0 + X[2]))

    b_0 = assemble(inner(v_ref, test_0) * dx
                   + inner(grad(zeta_ref), grad(test_0)) * dx
                   + inner(zeta_ref, test_0) * dx
                   - inner(mu_ref, div(test_0)) * dx)
    b_1 = assemble(inner(grad(v_ref), grad(test_0)) * dx
                   + inner(v_ref, test_0) * dx
                   - 1.0 / beta * inner(zeta_ref, test_0) * dx
                   - inner(p_ref, div(test_0)) * dx)
    b_2 = assemble(-inner(div(v_ref), test_1) * dx)
    b_3 = assemble(-inner(div(zeta_ref), test_1) * dx)

    solver_parameters = {"linear_solver": "fgmres",
                         "fgmres_restart": 10,
                         "maximum_iterations": 500,
                         "relative_tolerance": 1.0e-15,
                         "absolute_tolerance": 1.0e-15,
                         "monitor_convergence": False}
    mcs.incompressible_linear_solve(
        ConstantNullspace(), solver_parameters=solver_parameters,
        lambda_v_bounds=(0.1, 2.3), lambda_p_bounds=(0.1, 3.4),
        v_d=b_0, f=b_1, div_v=b_2, div_zeta=b_3,
        print_error=False, create_output=False, plots=False)

    for fn in (mcs._p, mcs._mu, p_ref, mu_ref):
        fn.data = fn.data - jnp.mean(fn.data)

    assert _l2(space_0, mcs._v, v_ref) < 1.0e-12
    assert _l2(space_0, mcs._zeta, zeta_ref) < 1.0e-12
    assert _l2(space_1, mcs._p, p_ref) < 1.0e-11
    assert _l2(space_1, mcs._mu, mu_ref) < 1.0e-11
