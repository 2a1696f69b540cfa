"""3-D solver layer: geometric multigrid on hex meshes and an end-to-end
3-D stationary control solve (capability extension; the reference is 2-D
only).  Mirrors tests/test_solvers.py and the stationary exact-solution
family (reference test/test_control.py:26-119) on a unit cube.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (
    Control, UnitCubeMesh, FunctionSpace, Function, TrialFunction,
    TestFunction, SpatialCoordinate, DirichletBC, grad, inner, dx,
    assemble, sin, cos, exp, pi)
from control_tpu.solvers.multigrid import Multigrid
from control_tpu.solvers.krylov import gmres


def _l2(space, a, b):
    d = Function(space, data=a.data - b.data)
    return float(jnp.sqrt(jnp.abs(assemble(inner(d, d) * dx))))


def test_multigrid_3d_poisson():
    mesh = UnitCubeMesh(16, 16, 16)
    V = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    K = assemble(inner(grad(u), grad(v)) * dx, bcs=bc)
    u_ex = sin(pi * X[0]) * sin(pi * X[1]) * sin(2.0 * pi * X[2])
    f = Function(V).interpolate(6.0 * pi ** 2 * u_ex)
    b = assemble(inner(f, v) * dx, bcs=(bc,)).data
    mg = Multigrid(K, coarse_max_dofs=600)
    assert len(mg.config.spaces) >= 3          # a real 3-D hierarchy
    x = jnp.zeros_like(b)
    r0 = float(jnp.linalg.norm(b.ravel()))
    rates = []
    for _ in range(6):
        x = x + mg.solve(b - K.apply(x))
        r = float(jnp.linalg.norm((b - K.apply(x)).ravel()))
        rates.append(r / r0)
        r0 = r
    # textbook V-cycle contraction on the 3-D Laplacian
    assert rates[-1] < 0.2
    uh = Function(V, data=x)
    ue = Function(V).interpolate(u_ex)
    assert _l2(V, uh, ue) < 5e-3               # discretisation level


def test_multigrid_3d_preconditioned_gmres():
    mesh = UnitCubeMesh(8, 8, 8)
    V = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(V), TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    K = assemble(inner(grad(u), grad(v)) * dx, bcs=bc)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(V.grid_shape))
    b = jnp.where(bc.mask, 0.0, b)
    mg = Multigrid(K, coarse_max_dofs=150)
    x, info = gmres(K.apply, b, M=mg.solve, restart=10, rtol=1e-10,
                    maxiter=60)
    r = float(jnp.linalg.norm((b - K.apply(x)).ravel())
              / jnp.linalg.norm(b.ravel()))
    assert r < 1e-9
    assert int(info["iterations"]) <= 15


def test_stationary_control_3d_exact_solution():
    """Manufactured-rhs algebraic test on the unit cube (the 2-D version
    mirrors reference test/test_control.py:26-119)."""
    mesh = UnitCubeMesh(4, 4, 4)
    X = SpatialCoordinate(mesh)
    space = FunctionSpace(mesh, "Lagrange", 2)
    test_0 = TestFunction(space)

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx + inner(trial, test) * dx

    def desired_state(test):
        v_d = Function(space).interpolate(
            cos(pi * X[0] - 0.5 * pi) * cos(pi * X[1] - 0.5 * pi)
            * cos(pi * X[2] - 0.5 * pi) + 1.0)
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        f = Function(space).interpolate(
            3.0 * pi ** 2 * cos(pi * X[0] - 0.5 * pi)
            * cos(pi * X[1] - 0.5 * pi) * cos(pi * X[2] - 0.5 * pi))
        return inner(f, test) * dx

    beta = 1.0e-3
    mcs = Control.Stationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, bcs_v=None)

    v_ref = Function(space).interpolate(X[0] * exp(X[1]) * (1.0 + X[2]))
    zeta_ref = Function(space).interpolate(
        sin(pi * X[0]) * sin(2.0 * pi * X[1]) * sin(pi * X[2]))
    b_0 = assemble(inner(v_ref, test_0) * dx
                   + inner(grad(zeta_ref), grad(test_0)) * dx
                   + inner(zeta_ref, test_0) * dx)
    b_1 = assemble(inner(grad(v_ref), grad(test_0)) * dx
                   + inner(v_ref, test_0) * dx
                   - 1.0 / beta * inner(zeta_ref, test_0) * dx)

    solver_parameters = {"linear_solver": "fgmres",
                         "fgmres_restart": 10,
                         "maximum_iterations": 300,
                         "relative_tolerance": 1.0e-13,
                         "absolute_tolerance": 1.0e-13,
                         "monitor_convergence": False}
    # Q2 mass spectral bounds on hexes: the 2-D Jacobi-preconditioned
    # interval (0.25, 1.5625) cubes per tensor direction; use safe bounds
    mcs.linear_solve(lambda_v_bounds=(0.1, 2.3),
                     solver_parameters=solver_parameters,
                     v_d=b_0, f=b_1, print_error=False,
                     create_output=False, plots=False)
    assert _l2(space, mcs._v, v_ref) < 1.0e-11
    assert _l2(space, mcs._zeta, zeta_ref) < 1.0e-11


def test_node_stencil_3d_matches_local_op():
    """The (2d+1)^3 node-stencil fold equals the gather/scatter LocalOp
    application for 3-D scalar spaces (Q1 and masked Q2, batched), and
    BlockSolver's fused Chebyshev path matches the reference recurrence."""
    from control_tpu.ops.stencil import StencilOp, node_stencil, \
        apply_stencil
    from control_tpu.models.common import mass_solver
    from control_tpu.solvers.krylov import chebyshev
    rng = np.random.default_rng(0)
    mesh = UnitCubeMesh(3, 4, 5)
    V = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(V), TestFunction(V)
    K = assemble(inner(grad(u), grad(v)) * dx + inner(u, v) * dx)
    x = jnp.asarray(rng.standard_normal(V.grid_shape))
    w = node_stencil(K.A, V)
    assert float(jnp.max(jnp.abs(apply_stencil(w, x, 1, nd=3)
                                 - K.apply(x)))) < 1e-13

    V2 = FunctionSpace(mesh, "Lagrange", 2)
    u2, v2 = TrialFunction(V2), TestFunction(V2)
    bc = DirichletBC(V2, 0.0, "on_boundary")
    K2 = assemble(inner(grad(u2), grad(v2)) * dx, bcs=bc)
    s = StencilOp.from_local(K2)
    xb = jnp.asarray(rng.standard_normal((4,) + V2.grid_shape))
    assert float(jnp.max(jnp.abs(s.apply(xb) - K2.apply(xb)))) < 1e-12
    assert float(jnp.max(jnp.abs(s.diag() - K2.diag()))) == 0.0

    M = assemble(inner(u2, v2) * dx)
    bounds = (0.25, 2.25)
    solver = mass_solver(M, bc.mask, False, bounds)
    assert isinstance(solver.op, StencilOp)
    got = solver(xb)
    ref = chebyshev(solver.op.apply, xb, bounds, 20,
                    M=lambda r: r / solver.diag)
    rel = (float(jnp.max(jnp.abs(got - ref)))
           / float(jnp.max(jnp.abs(ref))))
    assert rel < 1e-12, rel
