"""3-D instationary Stokes control smoke run (capability extension over
the 2-D-only reference): the nested space-time incompressible
preconditioner on a unit cube, checking convergence within the reference's
budget and the discrete divergence constraint of the returned state.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from control_tpu import (
    Control, UnitCubeMesh, FunctionSpace, VectorFunctionSpace, Function,
    TestFunction, SpatialCoordinate, DirichletBC, ConstantNullspace,
    grad, div, inner, dx, assemble, sin, cos, pi)

# slow tier: 3-D instationary Taylor-Hood smoke: the largest single compile in the suite
pytestmark = pytest.mark.slow


def test_instationary_stokes_3d_cn_smoke():
    n_t, beta = 3, 1e-2
    mesh = UnitCubeMesh(2, 2, 2)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2, dim=3)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space_v).interpolate(
            (sin(pi * X[0]) * sin(2 * pi * X[1]) * sin(pi * X[2]),
             sin(2 * pi * X[0]) * sin(pi * X[1]) * sin(pi * X[2]),
             cos(pi * X[0]) * sin(pi * X[1]) * sin(2 * pi * X[2])))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space_v), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, (0.0, 0.0, 0.0), "on_boundary")

    ctl = Control.Instationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, space_p=space_p,
        time_interval=(0.0, 1.0), CN=True, n_t=n_t, bcs_v=bc_t)

    info = ctl.incompressible_linear_solve(
        ConstantNullspace(),
        solver_parameters={"linear_solver": "fgmres", "fgmres_restart": 10,
                           "maximum_iterations": 100,
                           "relative_tolerance": 1.0e-10,
                           "absolute_tolerance": 0.0,
                           "monitor_convergence": False},
        lambda_v_bounds=(0.1, 2.3), lambda_p_bounds=(0.1, 3.4),
        print_error=False, create_output=False, plots=False)
    assert ctl.last_solve_info.converged

    # the state rows of the converged KKT system enforce the discrete
    # divergence constraint B v_i = 0 per time step
    test_p = TestFunction(space_p)
    for i in range(ctl._v.data.shape[0]):
        vi = Function(space_v, data=ctl._v.data[i])
        dv = np.asarray(assemble(-inner(div(vi), test_p) * dx).data)
        assert np.abs(dv).max() < 1e-8
