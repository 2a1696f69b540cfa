"""Krylov + multigrid solver tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_tpu.fem import (
    UnitSquareMesh, FunctionSpace, VectorFunctionSpace, Function,
    TrialFunction, TestFunction, SpatialCoordinate, DirichletBC,
    grad, inner, dot, dx, assemble, sin, pi)
from control_tpu.solvers.krylov import gmres, fgmres, minres, chebyshev
from control_tpu.solvers.multigrid import Multigrid


def _poisson(n=8, quad=True, degree=1, bc=True):
    mesh = UnitSquareMesh(n, n, quadrilateral=quad)
    V = FunctionSpace(mesh, "Lagrange", degree)
    u, v = TrialFunction(V), TestFunction(V)
    bcs = DirichletBC(V, 0.0, "on_boundary") if bc else None
    K = assemble(inner(grad(u), grad(v)) * dx
                 + inner(u, v) * dx, bcs=bcs)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(sin(pi * X[0]) * X[1])
    b = f.data
    if bcs is not None:
        b = jnp.where(bcs.mask, 0.0, b)
    return K, b, V


def test_gmres_solves_spd():
    K, b, V = _poisson()
    x, info = gmres(K.apply, b, restart=30, rtol=1e-12, maxiter=300)
    r = b - K.apply(x)
    assert float(jnp.linalg.norm(r.ravel())) < 1e-10
    assert bool(info["converged"])


def test_gmres_left_pc_and_counts():
    K, b, V = _poisson()
    d = K.diag()
    x, info = gmres(K.apply, b, M=lambda r: r / d, restart=30,
                    rtol=1e-10, maxiter=300)
    assert float(jnp.linalg.norm((b - K.apply(x)).ravel())) < 1e-8
    x2, info2 = gmres(K.apply, b, restart=30, rtol=1e-10, maxiter=300)
    assert int(info["iterations"]) <= int(info2["iterations"])


def test_fgmres_right_pc():
    K, b, V = _poisson()
    mg = Multigrid(K)
    x, info = fgmres(K.apply, b, M=lambda r: mg.solve(r, cycles=1),
                     restart=30, rtol=1e-12, maxiter=100)
    assert float(jnp.linalg.norm((b - K.apply(x)).ravel())) < 1e-10
    assert int(info["iterations"]) < 25


def test_gmres_nonzero_initial_guess():
    K, b, V = _poisson()
    x_ref, _ = gmres(K.apply, b, rtol=1e-13, restart=40, maxiter=400)
    x, info = gmres(K.apply, b, x0=x_ref, rtol=1e-6, maxiter=100)
    assert int(info["iterations"]) == 0


def test_minres():
    K, b, V = _poisson()
    d = K.diag()
    x, info = minres(K.apply, b, M=lambda r: r / d, rtol=1e-12, maxiter=500)
    assert float(jnp.linalg.norm((b - K.apply(x)).ravel())) < 1e-9


@pytest.mark.parametrize("quad,degree,bounds", [
    (True, 2, (0.25, 1.5625)),      # Q2 quads (reference test constant :93)
    (False, 1, (0.5, 2.0)),         # P1 triangles (reference :4251)
    (False, 2, (0.3923, 2.0599)),   # P2 triangles (this framework's element)
])
def test_chebyshev_mass_solve(quad, degree, bounds):
    """20 Chebyshev iterations on the Jacobi-scaled mass matrix solve it to
    high accuracy -- the reference's (1,1)-block solver
    (reference control/control.py:377-385)."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=quad)
    V = FunctionSpace(mesh, "Lagrange", degree)
    u, v = TrialFunction(V), TestFunction(V)
    M = assemble(inner(u, v) * dx)
    X = SpatialCoordinate(mesh)
    b = Function(V).interpolate(sin(2 * pi * X[0]) * X[1]).data
    d = M.diag()
    x = chebyshev(M.apply, b, bounds, 20, M=lambda r: r / d)
    rel = (float(jnp.linalg.norm((b - M.apply(x)).ravel()))
           / float(jnp.linalg.norm(b.ravel())))
    assert rel < 1e-6


@pytest.mark.parametrize("vector,batch", [(False, ()), (False, (3,)),
                                          (False, (2, 3)), (True, (3,))])
def test_blocksolver_cheb_fused_matches_reference_recurrence(vector, batch):
    """BlockSolver's fused-kernel Chebyshev path (stencil weights resident
    across all steps) computes the same recurrence as krylov.chebyshev to
    roundoff, for scalar/vector spaces and arbitrary leading batch axes."""
    from control_tpu.models.common import mass_solver
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    V = (VectorFunctionSpace if vector else FunctionSpace)(
        mesh, "Lagrange", 2)
    u, v = TrialFunction(V), TestFunction(V)
    M = assemble(inner(u, v) * dx)
    bounds = (0.25, 1.5625)
    mask = DirichletBC(V, (0.0, 0.0) if vector else 0.0,
                       "on_boundary").mask
    solver = mass_solver(M, mask, False, bounds)
    from control_tpu.ops.stencil import StencilOp
    assert isinstance(solver.op, StencilOp)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(
        (sin(2 * pi * X[0]) * X[1],) * 2 if vector
        else sin(2 * pi * X[0]) * X[1]).data
    b = jnp.broadcast_to(f, batch + f.shape) * jnp.arange(
        1.0, 1.0 + np.prod(batch or (1,))).reshape(
        (batch or (1,)) + (1,) * f.ndim).reshape(
        batch + (1,) * f.ndim)
    x = solver(b)
    x_ref = chebyshev(solver.op.apply, b, bounds, 20,
                      M=lambda r: r / solver.diag)
    assert x.shape == b.shape
    err = (float(jnp.max(jnp.abs(x - x_ref)))
           / float(jnp.max(jnp.abs(x_ref))))  # dinv-mult vs diag-divide ulps
    assert err < 1e-12, err


@pytest.mark.parametrize("quad,degree", [(True, 1), (True, 2),
                                         (False, 1), (False, 2)])
def test_multigrid_poisson(quad, degree):
    K, b, V = _poisson(n=16, quad=quad, degree=degree)
    mg = Multigrid(K)
    x = mg.solve(b, cycles=12)
    rel = (float(jnp.linalg.norm((b - K.apply(x)).ravel()))
           / float(jnp.linalg.norm(b.ravel())))
    assert rel < 1e-6, rel


def test_multigrid_nonsymmetric_convection_diffusion():
    mesh = UnitSquareMesh(16, 16, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    from control_tpu.fem import as_vector
    wind = as_vector([X[1] - 0.5, 0.5 - X[0]])
    nu = 1.0 / 50.0
    bcs = DirichletBC(V, 0.0, "on_boundary")
    A = assemble(nu * inner(grad(u), grad(v)) * dx
                 + inner(dot(wind, grad(u)), v) * dx, bcs=bcs)
    f = Function(V).interpolate(X[0] * X[1])
    b = jnp.where(bcs.mask, 0.0, f.data)
    mg = Multigrid(A)
    x, info = fgmres(A.apply, b, M=lambda r: mg.solve(r, cycles=2),
                     restart=30, rtol=1e-10, maxiter=60)
    assert float(jnp.linalg.norm((b - A.apply(x)).ravel())) < 1e-8
    assert int(info["iterations"]) < 20


def test_multigrid_vector_space():
    mesh = UnitSquareMesh(8, 8, quadrilateral=False)
    V = VectorFunctionSpace(mesh, "Lagrange", 2)
    u, v = TrialFunction(V), TestFunction(V)
    bcs = DirichletBC(V, (0.0, 0.0), "on_boundary")
    K = assemble(inner(grad(u), grad(v)) * dx + inner(u, v) * dx, bcs=bcs)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate((X[0] * X[1], X[0] + X[1]))
    b = jnp.where(bcs.mask, 0.0, f.data)
    mg = Multigrid(K)
    x = mg.solve(b, cycles=12)
    rel = (float(jnp.linalg.norm((b - K.apply(x)).ravel()))
           / float(jnp.linalg.norm(b.ravel())))
    assert rel < 1e-6, rel


def test_multigrid_under_jit_and_vmap():
    """Hierarchy construction + V-cycle must trace (the instationary pc
    builds one hierarchy per time block, batched)."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(V), TestFunction(V)
    bcs = DirichletBC(V, 0.0, "on_boundary")
    X = SpatialCoordinate(mesh)

    def solve_once(c):
        from control_tpu.fem import Constant
        A = assemble(Constant(c) * inner(grad(u), grad(v)) * dx
                     + inner(u, v) * dx, bcs=bcs)
        mg = Multigrid(A)
        f = Function(V).interpolate(X[0] * X[1])
        b = jnp.where(bcs.mask, 0.0, f.data)
        return mg.solve(b, cycles=8)

    xs = jax.jit(jax.vmap(solve_once))(jnp.array([1.0, 2.0]))
    x1 = solve_once(1.0)
    assert float(jnp.abs(xs[0] - x1).max()) < 1e-9
