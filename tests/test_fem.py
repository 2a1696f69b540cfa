"""FEM layer tests: tabulation, assembly, interpolation, action/adjoint.

Modelled on the reference's strategy of algebraic identities verified to
round-off (reference test/test_control.py family 1)."""

import numpy as np
import pytest

from control_tpu.fem import (
    UnitSquareMesh, FunctionSpace, VectorFunctionSpace, Function,
    TrialFunction, TestFunction, SpatialCoordinate, DirichletBC,
    grad, div, inner, dot, dx, sin, cos, exp, pi, assemble, action, adjoint)


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("degree", [1, 2])
def test_mass_stiffness_exactness(quad, degree):
    mesh = UnitSquareMesh(4, 4, quadrilateral=quad)
    V = FunctionSpace(mesh, "Lagrange", degree)
    u, v = TrialFunction(V), TestFunction(V)
    M = np.asarray(assemble(inner(u, v) * dx).to_dense())
    assert abs(M.sum() - 1.0) < 1e-12          # integral of 1 over unit square
    assert abs(M - M.T).max() < 1e-12
    K = np.asarray(assemble(inner(grad(u), grad(v)) * dx).to_dense())
    assert abs(K.sum(axis=1)).max() < 1e-11    # constants in kernel
    assert abs(K - K.T).max() < 1e-12


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("degree", [1, 2])
def test_stiffness_polynomial_identity(quad, degree):
    # u = x, w = y: int grad(x).grad(y) = 0 ; u = w = x: = 1
    mesh = UnitSquareMesh(3, 5, quadrilateral=quad)
    V = FunctionSpace(mesh, "Lagrange", degree)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    K = assemble(inner(grad(u), grad(v)) * dx)
    fx = Function(V).interpolate(X[0])
    fy = Function(V).interpolate(X[1])
    assert abs(float(np.vdot(np.asarray(fx.data),
                             np.asarray(K.apply(fy.data))))) < 1e-12
    assert abs(float(np.vdot(np.asarray(fx.data),
                             np.asarray(K.apply(fx.data)))) - 1.0) < 1e-12


def test_interpolate_autodiff_manufactured():
    # interpolate(-div(grad(zeta)) + v): JAX autodiff replaces UFL calculus
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", 2)
    X = SpatialCoordinate(mesh)
    zeta = sin(2.0 * pi * X[0]) * sin(2.0 * pi * X[1])
    vd = Function(V).interpolate(-div(grad(zeta)) + X[0] * exp(X[1]))
    Xc, Yc = V.node_coords()
    ref = (8.0 * np.pi ** 2 * np.sin(2 * np.pi * Xc) * np.sin(2 * np.pi * Yc)
           + Xc * np.exp(Yc))
    assert abs(np.asarray(vd.data) - ref).max() < 1e-10


@pytest.mark.parametrize("quad", [True, False])
def test_divergence_and_adjoint(quad):
    mesh = UnitSquareMesh(4, 4, quadrilateral=quad)
    V = VectorFunctionSpace(mesh, "Lagrange", 2)
    Q = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    p, q = TrialFunction(Q), TestFunction(Q)
    B = assemble(-inner(div(u), q) * dx)
    BT = assemble(-inner(p, div(v)) * dx)
    assert abs(np.asarray(BT.to_dense())
               - np.asarray(B.to_dense()).T).max() < 1e-13
    AD = assemble(adjoint(-inner(div(u), q) * dx))
    assert abs(np.asarray(AD.to_dense())
               - np.asarray(B.to_dense()).T).max() < 1e-13
    # int div((x, y)) = 2
    w = Function(V).interpolate((X[0], X[1]))
    one = Function(Q).interpolate(1.0)
    val = float(np.vdot(np.asarray(B.apply(w.data)), np.asarray(one.data)))
    assert abs(val + 2.0) < 1e-12


def test_advection_form():
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    V = VectorFunctionSpace(mesh, "Lagrange", 2)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    w = Function(V).interpolate((X[1], -X[0]))
    A = assemble(inner(dot(grad(u), w), v) * dx)
    uu = Function(V).interpolate((X[0] * X[0], X[0] * X[1]))
    lhs = float(np.vdot(np.asarray(uu.data), np.asarray(A.apply(uu.data))))
    ref = float(assemble(inner(dot(grad(uu), w), uu) * dx))
    assert abs(lhs - ref) < 1e-12


def test_action_matches_apply():
    mesh = UnitSquareMesh(5, 3, quadrilateral=False)
    Q = FunctionSpace(mesh, "Lagrange", 2)
    X = SpatialCoordinate(mesh)
    p, q = TrialFunction(Q), TestFunction(Q)
    form = inner(grad(p), grad(q)) * dx + 2.5 * inner(p, q) * dx
    f = Function(Q).interpolate(X[0] * X[1] + cos(pi * X[0]))
    r1 = np.asarray(assemble(action(form, f)).data)
    r2 = np.asarray(assemble(form).apply(f.data))
    assert abs(r1 - r2).max() < 1e-12


def test_masked_bc_operator():
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(V), TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    K = assemble(inner(grad(u), grad(v)) * dx, bcs=bc)
    Kd = np.asarray(K.to_dense())
    mask = np.asarray(bc.mask).ravel()
    # identity rows/cols on the boundary
    assert abs(Kd[mask][:, mask] - np.eye(mask.sum())).max() < 1e-14
    assert abs(Kd[mask][:, ~mask]).max() == 0.0
    assert abs(Kd[~mask][:, mask]).max() == 0.0


def test_nonlinear_coefficient_form():
    # (2 + 0.5 v^2) inner(u, w) reproduces pointwise-weighted mass
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    w = Function(V).interpolate(X[0])
    from control_tpu.fem import Constant
    A = assemble((Constant(2.0) + 0.5 * w ** 2.0) * inner(u, v) * dx)
    one = Function(V).interpolate(1.0)
    val = float(np.vdot(np.asarray(one.data),
                        np.asarray(A.apply(one.data))))
    # int (2 + x^2/2) over unit square = 2 + 1/6 (w=x interpolated exactly)
    assert abs(val - (2.0 + 1.0 / 6.0)) < 1e-12
