"""AOT serving artifacts: the fused solve kernel round-trips through
jax.export serialization and reproduces the in-process solve exactly
(production-serving extension; the reference re-does its PETSc setup
in-process on every run)."""

import numpy as np
import jax.numpy as jnp

from control_tpu import (Control, UnitSquareMesh, FunctionSpace, Function,
                         SpatialCoordinate, DirichletBC, grad, inner, dx,
                         cos, pi)
from control_tpu.models import common
from control_tpu.utils import aot


def test_export_heat_solve_roundtrip(tmp_path):
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space).interpolate(
            cos(0.5 * pi * (X[0] - 1.0)) * cos(0.5 * pi * (X[1] - 1.0)))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1e-3, n_t=6, time_interval=(0.0, 1.0),
        CN=True, bcs_v=bc_t)
    ctl.linear_solve(lambda_v_bounds=(0.25, 2.25), print_error=False,
                     create_output=False, plots=False)
    v_direct = np.asarray(ctl._v.data)
    fn, args = common.LAST_RUN

    path = tmp_path / "solve.stablehlo"
    aot.save(path)
    exp = aot.load(path)
    u0, u1, info_d = exp.call(*args)
    assert bool(np.asarray(info_d["converged"]))
    # the exported artifact reproduces the in-process kernel bit-for-bit
    u0_direct, _, info_direct = fn(*args)
    assert np.array_equal(np.asarray(u0), np.asarray(u0_direct))
    assert int(info_d["iterations"]) == int(info_direct["iterations"])
    # and the solve it encodes matches the problem-layer result
    assert np.allclose(np.asarray(u0), v_direct[1:], atol=1e-12)
