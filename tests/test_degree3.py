"""Degree >= 3 spaces: assembly exactness and an end-to-end control solve.

The reference never exercises degree > 2 (its tests use Q1/Q2/P1/P2 only),
but its FEM stack (Firedrake) supports arbitrary order; the rebuild's
tensor-product Lagrange tabulation (fem/elements.py:lagrange_1d) is
degree-generic on quadrilaterals, so this family pins that down: local
assembly integrates the Q3 energy exactly, the multigrid transfers stay
exact embeddings at degree 3, and the full KKT solve converges with
numerically computed Chebyshev spectral bounds.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (
    Control, UnitSquareMesh, FunctionSpace, Function, TrialFunction,
    TestFunction, SpatialCoordinate, grad, inner, dx, assemble, sin, exp,
    cos, pi)


def _l2(space, a, b):
    d = Function(space, data=a.data - b.data)
    return float(jnp.sqrt(jnp.abs(assemble(inner(d, d) * dx))))


@pytest.mark.parametrize("degree", [3, 4])
def test_assembly_exactness_high_order(degree):
    mesh = UnitSquareMesh(3, 4, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", degree)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    M = np.asarray(assemble(inner(u, v) * dx).to_dense())
    assert abs(M.sum() - 1.0) < 1e-12
    assert abs(M - M.T).max() < 1e-12
    K = assemble(inner(grad(u), grad(v)) * dx)
    Kd = np.asarray(K.to_dense())
    assert abs(Kd.sum(axis=1)).max() < 1e-11
    # energy identity: u = x^d y^d lies IN Q_d, and the d+2 point Gauss
    # rule integrates the degree-(2d) energy density exactly:
    #   int |grad(x^d y^d)|^2 = 2 d^2 / ((2d-1)(2d+1))
    f = Function(V).interpolate(X[0] ** degree * X[1] ** degree)
    energy = float(np.vdot(np.asarray(f.data), np.asarray(K.apply(f.data))))
    exact = 2.0 * degree ** 2 / ((2.0 * degree - 1.0) * (2.0 * degree + 1.0))
    assert abs(energy - exact) < 1e-12


def _jacobi_mass_bounds(space):
    """Spectral interval of diag(M)^{-1} M (the quantity the reference's
    users pass as lambda_v_bounds, e.g. its (0.25, 2.25) for Q1)."""
    u, v = TrialFunction(space), TestFunction(space)
    M = np.asarray(assemble(inner(u, v) * dx).to_dense())
    d = np.sqrt(np.diag(M))
    lam = np.linalg.eigvalsh(M / d[:, None] / d[None, :])
    return float(lam[0]), float(lam[-1])


@pytest.mark.slow
def test_stationary_control_q3_exact_solution():
    """The Q2 algebraic exact-solution test (reference
    test/test_control.py:26-119) re-run in a Q3 space: manufactured rhs in
    the discrete space itself, solution matches to round-off."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    X = SpatialCoordinate(mesh)
    space = FunctionSpace(mesh, "Lagrange", 3)
    test_0 = TestFunction(space)

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx + inner(trial, test) * dx

    def desired_state(test):
        v_d = Function(space).interpolate(
            cos(pi * X[0] - 0.5 * pi) * cos(pi * X[1] - 0.5 * pi) + 1.0)
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        f = Function(space).interpolate(
            2.0 * pi ** 2 * cos(pi * X[0] - 0.5 * pi)
            * cos(pi * X[1] - 0.5 * pi))
        return inner(f, test) * dx

    beta = 1.0e-3
    mcs = Control.Stationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, bcs_v=None)

    v_ref = Function(space).interpolate(X[0] * exp(X[1]))
    zeta_ref = Function(space).interpolate(
        sin(pi * X[0]) * sin(2.0 * pi * X[1]))
    b_0 = assemble(inner(v_ref, test_0) * dx
                   + inner(grad(zeta_ref), grad(test_0)) * dx
                   + inner(zeta_ref, test_0) * dx)
    b_1 = assemble(inner(grad(v_ref), grad(test_0)) * dx
                   + inner(v_ref, test_0) * dx
                   - 1.0 / beta * inner(zeta_ref, test_0) * dx)

    lo, hi = _jacobi_mass_bounds(space)
    assert 0.0 < lo < hi
    solver_parameters = {"linear_solver": "fgmres",
                         "fgmres_restart": 10,
                         "maximum_iterations": 500,
                         "relative_tolerance": 1.0e-14,
                         "absolute_tolerance": 1.0e-14,
                         "monitor_convergence": False}
    mcs.linear_solve(lambda_v_bounds=(0.98 * lo, 1.02 * hi),
                     solver_parameters=solver_parameters,
                     v_d=b_0, f=b_1, print_error=False,
                     create_output=False, plots=False)
    assert _l2(space, mcs._v, v_ref) < 1.0e-12
    assert _l2(space, mcs._zeta, zeta_ref) < 1.0e-12
