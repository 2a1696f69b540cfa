"""Stationary control tests, mirroring the reference's families
(reference test/test_control.py:26-1240): algebraic exact-solution tests to
~1e-13 and MMS convergence order studies."""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (
    Control, UnitSquareMesh, FunctionSpace, VectorFunctionSpace, Function,
    TestFunction, SpatialCoordinate, DirichletBC, ConstantNullspace,
    grad, div, inner, dx, assemble, sin, cos, exp, pi, Constant)


def _l2(space, a, b):
    d = Function(space, data=a.data - b.data)
    return float(jnp.sqrt(jnp.abs(assemble(inner(d, d) * dx))))


def test_stationary_linear_control():
    """reference test/test_control.py:26-119 (quad Q2, manufactured rhs)."""
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    X = SpatialCoordinate(mesh)
    space_0 = FunctionSpace(mesh, "Lagrange", 2)
    test_0 = TestFunction(space_0)

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx + inner(trial, test) * dx

    def desired_state(test):
        v_d = Function(space_0, name="v_d").interpolate(
            cos(pi * X[0] - 0.5 * pi) * cos(pi * X[1] - 0.5 * pi) + 1.0)
        true_v = Function(space_0, name="true_v")
        true_v.assign(v_d)
        return inner(v_d, test) * dx, true_v

    def force_f(test):
        f = Function(space_0).interpolate(
            2.0 * pi ** 2 * cos(pi * X[0] - 0.5 * pi)
            * cos(pi * X[1] - 0.5 * pi))
        return inner(f, test) * dx

    beta = 10.0 ** -3
    mcs = Control.Stationary(
        space_0, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, bcs_v=None)

    v_ref = Function(space_0).interpolate(X[0] * exp(X[1]))
    zeta_ref = Function(space_0).interpolate(
        sin(pi * X[0]) * sin(2.0 * pi * X[1]))

    b_0 = assemble(inner(v_ref, test_0) * dx
                   + inner(grad(zeta_ref), grad(test_0)) * dx
                   + inner(zeta_ref, test_0) * dx)
    b_1 = assemble(inner(grad(v_ref), grad(test_0)) * dx
                   + inner(v_ref, test_0) * dx
                   - 1.0 / beta * inner(zeta_ref, test_0) * dx)

    lambda_v_bounds = (0.25, 1.5625)
    solver_parameters = {"linear_solver": "fgmres",
                         "fgmres_restart": 10,
                         "maximum_iterations": 500,
                         "relative_tolerance": 1.0e-14,
                         "absolute_tolerance": 1.0e-14,
                         "monitor_convergence": False}
    mcs.linear_solve(lambda_v_bounds=lambda_v_bounds,
                     solver_parameters=solver_parameters,
                     v_d=b_0, f=b_1, print_error=False,
                     create_output=False, plots=False)

    assert _l2(space_0, mcs._v, v_ref) < 1.0e-13
    assert _l2(space_0, mcs._zeta, zeta_ref) < 1.0e-13


@pytest.mark.slow
def test_MMS_stationary_linear_Poisson_control():
    """reference test/test_control.py:122-229, with order asserts added."""
    beta = 10.0 ** -3

    def ref_sol_v(x, y):
        return sin(pi * x) * sin(pi * y) * exp(x + y)

    def ref_sol_zeta(x, y):
        return sin(2.0 * pi * x) * sin(2.0 * pi * y)

    def forw_diff_operator(trial, test, v):
        return inner(grad(trial), grad(test)) * dx

    def make_desired_state(space):
        def desired_state(test):
            mesh = space.mesh
            X = SpatialCoordinate(mesh)
            v = ref_sol_v(X[0], X[1])
            zeta = ref_sol_zeta(X[0], X[1])
            v_d = Function(space, name="v_d").interpolate(
                -div(grad(zeta)) + v)
            true_v = Function(space, name="true_v").interpolate(v)
            return inner(v_d, test) * dx, true_v
        return desired_state

    def make_force_f(space):
        def force_f(test):
            mesh = space.mesh
            X = SpatialCoordinate(mesh)
            v = ref_sol_v(X[0], X[1])
            zeta = ref_sol_zeta(X[0], X[1])
            f = Function(space).interpolate(-div(grad(v)) - 1.0 / beta * zeta)
            return inner(f, test) * dx
        return force_f

    bounds = {1: (0.5, 2.0), 2: (0.3923, 2.0599)}   # P1/P2 triangles
    for degree in (1, 2):
        errs = []
        for p in (3, 4, 5):
            N = 2 ** p
            mesh = UnitSquareMesh(N, N)
            X = SpatialCoordinate(mesh)
            space = FunctionSpace(mesh, "Lagrange", degree)
            bc = DirichletBC(space, 0.0, "on_boundary")
            mcs = Control.Stationary(
                space, forw_diff_operator,
                desired_state=make_desired_state(space),
                force_f=make_force_f(space), beta=beta, bcs_v=bc)
            solver_parameters = {"linear_solver": "fgmres",
                                 "fgmres_restart": 30,
                                 "maximum_iterations": 500,
                                 "relative_tolerance": 1.0e-9,
                                 "absolute_tolerance": 1.0e-9,
                                 "monitor_convergence": False}
            mcs.linear_solve(solver_parameters=solver_parameters,
                             lambda_v_bounds=bounds[degree],
                             print_error=False, create_output=False,
                             plots=False)
            v_ref = Function(FunctionSpace(mesh, "Lagrange", degree + 2))
            v_ref.interpolate(ref_sol_v(X[0], X[1]))
            err = Function(space, data=mcs._v.data)
            diff = err - v_ref
            e = float(jnp.sqrt(jnp.abs(assemble(inner(diff, diff) * dx))))
            errs.append(e)
        orders = np.log(np.array(errs[:-1]) / np.array(errs[1:])) / np.log(2)
        # expect order ~ degree + 1
        assert orders[-1] > degree + 0.6, (degree, errs, orders)


def test_stationary_default_pc_iterations():
    """The built-in MG/Chebyshev preconditioner converges at 1e-6 within the
    reference's default budget of 50 iterations (GMRES restart 10)."""
    mesh = UnitSquareMesh(16, 16, quadrilateral=True)
    X = SpatialCoordinate(mesh)
    space = FunctionSpace(mesh, "Lagrange", 2)
    bc = DirichletBC(space, 0.0, "on_boundary")

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test):
        v_d = Function(space).interpolate(
            sin(pi * X[0]) * sin(pi * X[1]) * exp(X[0] + X[1]))
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        return inner(Function(space), test) * dx

    mcs = Control.Stationary(space, forw_diff_operator,
                             desired_state=desired_state, force_f=force_f,
                             beta=1e-3, bcs_v=bc)
    mcs.linear_solve(lambda_v_bounds=(0.25, 1.5625), print_error=False,
                     create_output=False, plots=False,
                     solver_parameters={"linear_solver": "gmres",
                                        "gmres_restart": 10,
                                        "maximum_iterations": 50,
                                        "relative_tolerance": 1.0e-6,
                                        "absolute_tolerance": 0.0,
                                        "monitor_convergence": False})
    info = mcs.last_solve_info
    assert info.converged
    assert info.iterations <= 50


def test_picard_stationary_nonlinear():
    """Semilinear problem (reference test/test_control.py:710-864 pattern):
    Picard outer loop drives the KKT residual below tolerance, and the
    converged state satisfies the forward equation with u = zeta/beta."""
    mesh = UnitSquareMesh(8, 8)
    X = SpatialCoordinate(mesh)
    space = FunctionSpace(mesh, "Lagrange", 2)
    bc = DirichletBC(space, 0.0, "on_boundary")

    def forw_diff_operator(trial, test, v_old):
        return (inner(grad(trial), grad(test)) * dx
                + (Constant(2.0) + 0.5 * v_old ** 2.0)
                * inner(trial, test) * dx)

    def desired_state(test):
        v_d = Function(space).interpolate(
            sin(pi * X[0]) * sin(pi * X[1]) * exp(X[0] + X[1]))
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        return inner(Function(space), test) * dx

    mcs = Control.Stationary(space, forw_diff_operator,
                             desired_state=desired_state, force_f=force_f,
                             beta=1.0, bcs_v=bc)
    solver_parameters = {"linear_solver": "fgmres",
                         "fgmres_restart": 10,
                         "maximum_iterations": 500,
                         "relative_tolerance": 1.0e-12,
                         "absolute_tolerance": 1.0e-12,
                         "monitor_convergence": False}
    mcs.non_linear_solve(solver_parameters=solver_parameters,
                         max_non_linear_iter=50,
                         relative_non_linear_tol=1e-10,
                         print_error_linear=False,
                         print_error_non_linear=False,
                         create_output=False, plots=False)
    # the converged state satisfies N(v) - (1/beta) M zeta = 0
    v, zeta = mcs._v, mcs._zeta
    from control_tpu.models.common import residual_vector, zero_rows
    from control_tpu.fem.space import combine_masks
    res = residual_vector(forw_diff_operator, space, v)
    M = assemble(inner(Function(space, data=zeta.data), TestFunction(space))
                 * dx)
    r = res.data - M.data
    r = zero_rows(combine_masks(space, (bc,)), r)
    assert float(jnp.max(jnp.abs(r))) < 1e-8


@pytest.mark.parametrize("gauss_newton", [False, True])
def test_stationary_nonlinear_vs_direct_forward(gauss_newton):
    """Cross-check family (reference test/test_control.py:554-1024): the
    all-at-once optimum satisfies the forward PDE driven by its own control
    u = zeta / beta, solved independently by damped Newton on the state."""
    mesh = UnitSquareMesh(8, 8)
    X = SpatialCoordinate(mesh)
    space = FunctionSpace(mesh, "Lagrange", 1)
    bc = DirichletBC(space, 0.0, "on_boundary")
    beta = 1.0

    if gauss_newton:
        def forw_diff_operator(trial, test, v_old):
            # residual-style form (reference GN usage, :872-876)
            return (inner(grad(v_old), grad(test)) * dx
                    + (Constant(2.0) + 0.5 * v_old ** 2.0)
                    * inner(v_old, test) * dx)
    else:
        def forw_diff_operator(trial, test, v_old):
            return (inner(grad(trial), grad(test)) * dx
                    + (Constant(2.0) + 0.5 * v_old ** 2.0)
                    * inner(trial, test) * dx)

    def desired_state(test):
        v_d = Function(space).interpolate(
            sin(pi * X[0]) * sin(pi * X[1]) * exp(X[0] + X[1]))
        return inner(v_d, test) * dx, v_d

    def force_f(test):
        return inner(Function(space), test) * dx

    mcs = Control.Stationary(space, forw_diff_operator,
                             desired_state=desired_state, force_f=force_f,
                             beta=beta, bcs_v=bc)
    if gauss_newton:
        mcs.set_Gauss_Newton()
    solver_parameters = {"linear_solver": "fgmres",
                         "fgmres_restart": 10,
                         "maximum_iterations": 500,
                         "relative_tolerance": 1.0e-13,
                         "absolute_tolerance": 1.0e-13,
                         "monitor_convergence": False}
    mcs.non_linear_solve(solver_parameters=solver_parameters,
                         max_non_linear_iter=100,
                         relative_non_linear_tol=1e-9,
                         print_error_linear=False,
                         print_error_non_linear=False,
                         create_output=False, plots=False)

    # independent forward solve with control m = zeta / beta via Newton
    import jax
    m = mcs._zeta.data / beta
    M_op = assemble(inner(Function(space), TestFunction(space)) * dx
                    ) if False else None
    from control_tpu.fem import TrialFunction
    Mop = assemble(inner(TrialFunction(space), TestFunction(space)) * dx)
    from control_tpu.models.common import (residual_vector,
                                           gauss_newton_operator, zero_rows)
    from control_tpu.fem.space import combine_masks
    mask = combine_masks(space, (bc,))
    vfun = Function(space)

    def picard_form(trial, test, v_old):
        return (inner(grad(trial), grad(test)) * dx
                + (Constant(2.0) + 0.5 * v_old ** 2.0)
                * inner(trial, test) * dx)

    from control_tpu.solvers.krylov import fgmres
    for _ in range(60):
        vfun_ = Function(space, data=vfun.data)
        res = residual_vector(picard_form, space, vfun_).data \
            - Mop.apply(m)
        res = zero_rows(mask, res)
        J = gauss_newton_operator(picard_form, space, vfun_)
        from control_tpu.ops.local_op import MaskedOp
        Jm = MaskedOp(J, mask)
        d = Jm.diag()
        dv, _ = fgmres(Jm.apply, -res, M=lambda r: r / d, restart=50,
                       rtol=1e-13, maxiter=500)
        vfun.data = vfun.data + dv
        if float(jnp.linalg.norm(np.asarray(res).ravel())) < 1e-12:
            break

    err = Function(space, data=mcs._v.data - vfun.data)
    e = float(jnp.sqrt(jnp.abs(assemble(inner(err, err) * dx))))
    assert e < 1e-8, e


def test_stationary_incompressible_linear_control():
    """reference test/test_control.py:232-358 (manufactured Stokes-like
    KKT solution, Taylor-Hood Q2-Q1)."""
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    X = SpatialCoordinate(mesh)
    space_0 = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_1 = FunctionSpace(mesh, "Lagrange", 1)
    test_0 = TestFunction(space_0)
    test_1 = TestFunction(space_1)

    def forw_diff_operator(trial, test, u):
        return inner(grad(trial), grad(test)) * dx + inner(trial, test) * dx

    def desired_state(test):
        v_d = Function(space_0, name="v_d").interpolate((0.0, 0.0))
        true_v = Function(space_0, name="true_v")
        return inner(v_d, test) * dx, true_v

    def force_f(test):
        return inner(Function(space_0), test) * dx

    beta = 10.0 ** -3
    mcs = Control.Stationary(
        space_0, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, space_p=space_1,
        bcs_v=DirichletBC(space_0, (0.0, 0.0), "on_boundary"))

    from control_tpu.fem import as_vector
    v_ref = Function(space_0).interpolate(
        (X[0] * exp(X[1]) * sin(pi * X[0]) * sin(2.0 * pi * X[1]),
         sin(3.0 * pi * X[0]) * sin(4.0 * pi * X[1])))
    zeta_ref = Function(space_0).interpolate(
        (sin(pi * X[0]) * sin(2.0 * pi * X[1]),
         sin(3.0 * pi * X[0]) * sin(4.0 * pi * X[1])))
    p_ref = Function(space_1).interpolate(
        sin(pi * X[0]) * sin(2.0 * pi * X[1]))
    mu_ref = Function(space_1).interpolate(X[0] * exp(X[1]))

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
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        v_d=b_0, f=b_1, div_v=b_2, div_zeta=b_3,
        print_error=False, create_output=False, plots=False)

    def shift_mean(fn):
        mean = float(assemble(fn * dx)) / 1.0
        # algebraic mean-shift as in the reference test (:332-344) uses the
        # PETSc vec shift; integral-mean differs only by a constant factor
        fn.data = fn.data - jnp.mean(fn.data)
        return fn

    for a, b in ((mcs._p, p_ref), (mcs._mu, mu_ref)):
        shift_mean(a), shift_mean(b)

    assert _l2(space_0, mcs._v, v_ref) < 1.0e-13
    assert _l2(space_0, mcs._zeta, zeta_ref) < 1.0e-13
    assert _l2(space_1, mcs._p, p_ref) < 1.0e-12
    assert _l2(space_1, mcs._mu, mu_ref) < 1.0e-12
