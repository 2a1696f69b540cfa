"""Instationary Stokes / Navier-Stokes control tests
(reference test/test_control.py:3045-3304 'with_exact_sol' family and
:4171-4370 nonlinear smoke runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (
    Control, UnitSquareMesh, FunctionSpace, VectorFunctionSpace, Function,
    MixedFunction, TestFunction, TrialFunction, SpatialCoordinate,
    DirichletBC, ConstantNullspace, grad, div, inner, dot, dx, assemble,
    sin, cos, exp, pi, Constant)


def _mixed_l2(space, a_data, b_data):
    err2 = 0.0
    for i in range(a_data.shape[0]):
        d = Function(space, data=a_data[i] - b_data[i])
        err2 += float(assemble(inner(d, d) * dx))
    return np.sqrt(abs(err2))


def _stokes_problem(n_t, CN, beta=1e-2, mesh_n=4):
    mesh = UnitSquareMesh(mesh_n, mesh_n, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)

    def forw_diff_operator(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        v_d = Function(space_v, name="v_d")
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space_v), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, (0.0, 0.0), "on_boundary")

    ctl = Control.Instationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, space_p=space_p,
        time_interval=(0.0, 1.0), CN=CN, n_t=n_t, bcs_v=bc_t)
    return ctl, mesh, space_v, space_p


def _smooth_v(X, k):
    # divergence-free-ish smooth velocity fields (not solenoidal; the KKT
    # system does not require the manufactured reference to be so)
    return ((0.1 * k) * sin(pi * X[0]) * sin(2 * pi * X[1]),
            (0.05 * k) * sin(3 * pi * X[0]) * sin(pi * X[1]))


def _smooth_p(X, k):
    return (0.1 * k) * (cos(pi * X[0]) * sin(pi * X[1]) + X[0])


@pytest.mark.parametrize("CN", [False, True])
def test_instationary_stokes_with_exact_sol(CN):
    """Manufactured algebraic space-time Stokes-KKT solution: rhs built by
    hand from M/K/B actions, solved to rtol 1e-14, checked to ~1e-12.

    Both time discretizations run the built-in nested preconditioner at
    the reference's restart/budget (restart 10, <= 100 outer iterations).
    The BE variant relies on the deeper (15-iteration) inner velocity-KKT
    solve: the reference's fixed 5 inner iterations leave the
    eps-regularised final-block error modes unresolved and its BE recipe
    stagnates (its own upstream BE test is unrunnable; measured here:
    outer residual stuck at ~0.97 with 5 inner iterations, CN-level
    convergence with 15)."""
    if CN:
        n_t, beta, mesh_n, restart = 4, 1e-2, 4, 10
    else:
        n_t, beta, mesh_n, restart = 3, 1e-2, 2, 10
    ctl, mesh, space_v, space_p = _stokes_problem(n_t, CN, beta=beta,
                                                  mesh_n=mesh_n)
    X = SpatialCoordinate(mesh)
    tau = 1.0 / (n_t - 1.0)
    n = n_t if not CN else n_t - 1

    u_ref = MixedFunction(space_v, n)       # v-unknowns
    w_ref = MixedFunction(space_v, n)       # zeta-unknowns
    p_ref = MixedFunction(space_p, n)
    mu_ref = MixedFunction(space_p, n)
    bcmask = DirichletBC(space_v, (0.0, 0.0), "on_boundary").mask
    for i in range(n):
        uf = Function(space_v).interpolate(_smooth_v(X, i + 1))
        # respect the homogeneous Dirichlet rows (nullspace projection)
        uf.data = jnp.where(bcmask, 0.0, uf.data)
        u_ref.sub(i).assign(uf)
        wf = Function(space_v).interpolate(_smooth_v(X, 2 * i + 1)[::-1])
        wf.data = jnp.where(bcmask, 0.0, wf.data)
        if (not CN) and i == 0:
            pass  # BE: zeta_0 is a genuine unknown; keep nonzero
        w_ref.sub(i).assign(wf)
        pf = Function(space_p).interpolate(_smooth_p(X, i + 1))
        pf.data = pf.data - jnp.mean(pf.data)   # pressure nullspace
        p_ref.sub(i).assign(pf)
        mf = Function(space_p).interpolate(_smooth_p(X, 3 * i + 2))
        mf.data = mf.data - jnp.mean(mf.data)
        mu_ref.sub(i).assign(mf)
    if not CN:
        # BE convention: the final-time zeta unknown solves
        # (tau K + M) zeta_{n-1} = b with no other coupling; and v_0 is
        # pinned by its own row.  Keep all entries generic.
        pass

    tr, te = TrialFunction(space_v), TestFunction(space_v)
    ptr, pte = TrialFunction(space_p), TestFunction(space_p)
    M = assemble(inner(tr, te) * dx)
    K = assemble(inner(grad(tr), grad(te)) * dx)
    B = assemble(-inner(div(tr), pte) * dx)
    B_T = assemble(-inner(ptr, div(te)) * dx)

    ud, wd, pd, md = u_ref.data, w_ref.data, p_ref.data, mu_ref.data
    r00, r01, r10, r11 = [], [], [], []
    for i in range(n):
        if not CN:
            # adjoint rows: tau M v_i (i<n-1) + (tau K + M) zeta_i
            #               - M zeta_{i+1} + tau B^T mu_i
            a = tau * K.apply(wd[i]) + M.apply(wd[i]) \
                + tau * B_T.apply(md[i])
            if i < n - 1:
                a = a + tau * M.apply(ud[i]) - M.apply(wd[i + 1])
            r00.append(a)
            s = tau * K.apply(ud[i]) + M.apply(ud[i]) \
                + tau * B_T.apply(pd[i])
            if i >= 1:
                s = s - M.apply(ud[i - 1]) - (tau / beta) * M.apply(wd[i])
            r01.append(s)
        else:
            a = 0.5 * tau * M.apply(ud[i]) \
                + 0.5 * tau * K.apply(wd[i]) + M.apply(wd[i]) \
                + tau * B_T.apply(md[i])
            if i >= 1:
                a = a + 0.5 * tau * M.apply(ud[i - 1])
            if i < n - 1:
                a = a + 0.5 * tau * K.apply(wd[i + 1]) - M.apply(wd[i + 1])
            r00.append(a)
            s = 0.5 * tau * K.apply(ud[i]) + M.apply(ud[i]) \
                - 0.5 * (tau / beta) * M.apply(wd[i]) \
                + tau * B_T.apply(pd[i])
            if i >= 1:
                s = s + 0.5 * tau * K.apply(ud[i - 1]) - M.apply(ud[i - 1])
            if i < n - 1:
                s = s - 0.5 * (tau / beta) * M.apply(wd[i + 1])
            r01.append(s)
        r10.append(tau * B.apply(ud[i]))
        r11.append(tau * B.apply(wd[i]))

    solver_parameters = {"linear_solver": "fgmres",
                         "gmres_restart": restart,
                         "maximum_iterations": 100,
                         "relative_tolerance": 1.0e-14,
                         "absolute_tolerance": 1.0e-14,
                         "monitor_convergence": False}
    ctl.incompressible_linear_solve(
        ConstantNullspace(), solver_parameters=solver_parameters,
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        v_d=MixedFunction(space_v, n, data=jnp.stack(r00), dual=True),
        f=MixedFunction(space_v, n, data=jnp.stack(r01), dual=True),
        div_v=MixedFunction(space_p, n, data=jnp.stack(r10), dual=True),
        div_zeta=MixedFunction(space_p, n, data=jnp.stack(r11), dual=True),
        print_error=False, create_output=False, plots=False)

    if CN:
        v_sol = ctl._v.data[1:]
        z_sol = ctl._zeta.data[:-1]
    else:
        v_sol = ctl._v.data
        z_sol = ctl._zeta.data
    assert _mixed_l2(space_v, v_sol, u_ref.data) < 1e-12
    assert _mixed_l2(space_v, z_sol, w_ref.data) < 1e-12

    def mean_shift(stack):
        return stack - jnp.mean(stack, axis=(1, 2), keepdims=True)

    assert _mixed_l2(space_p, mean_shift(ctl._p.data),
                     mean_shift(p_ref.data)) < 1e-11
    assert _mixed_l2(space_p, mean_shift(ctl._mu.data),
                     mean_shift(mu_ref.data)) < 1e-11


@pytest.mark.slow
@pytest.mark.parametrize("CN", [True, False])
def test_instationary_navier_stokes_picard(CN):
    """Navier-Stokes control (reference test/test_control.py:4171-4268 BE
    / :4271-4370 CN smoke family): Picard loop on the advective
    nonlinearity converges."""
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
    space_p = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    nu = 1.0 / 50.0

    def forw_diff_operator(trial, test, u, t):
        return (nu * inner(grad(trial), grad(test)) * dx
                + inner(dot(grad(trial), u), test) * dx)

    def desired_state(test, t):
        v_d = Function(space_v, name="v_d").interpolate(
            (0.2 * sin(pi * X[0]) * sin(pi * X[1]),
             0.1 * sin(2 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def force_f(test, t):
        return inner(Function(space_v), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, (0.0, 0.0), "on_boundary")

    ctl = Control.Instationary(
        space_v, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=1.0, space_p=space_p,
        time_interval=(0.0, 1.0), CN=CN, n_t=4, bcs_v=bc_t)
    ctl.incompressible_non_linear_solve(
        ConstantNullspace(),
        lambda_v_bounds=(0.25, 1.5625), lambda_p_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 400,
                           "relative_tolerance": 1.0e-10,
                           "absolute_tolerance": 1.0e-10,
                           "monitor_convergence": False},
        max_non_linear_iter=20, relative_non_linear_tol=1e-7,
        absolute_non_linear_tol=1e-9,
        print_error_linear=False, print_error_non_linear=False,
        create_output=False, plots=False)
    # Picard converged: recompute residual and check
    from control_tpu.fem.space import combine_masks, homogenize
    mask = combine_masks(space_v, homogenize(ctl._bcs_v[1]))
    v_0 = ctl._initial_state()
    f = ctl.construct_f()
    v_d = ctl.construct_v_d()
    r0, r1 = ctl.non_linear_res_eval(ctl._v, ctl._zeta, v_0, v_d, f,
                                     mask, mask)
    # full residual incl. divergence terms
    tr, te = TrialFunction(space_v), TestFunction(space_v)
    pte = TestFunction(space_p)
    tau = ctl._tau
    B = assemble(-inner(div(tr), pte) * dx)
    B_T = assemble(-inner(TrialFunction(space_p), div(te)) * dx)
    n = 4 - 1 if CN else 4
    r0 = jnp.where(mask[None], 0.0, r0 - tau * B_T.apply(ctl._mu.data))
    r1 = jnp.where(mask[None], 0.0, r1 - tau * B_T.apply(ctl._p.data))
    r2 = -B.apply(ctl._v.data[1:] if CN else ctl._v.data)
    r3 = -B.apply(ctl._zeta.data[:n])
    nrm = float(jnp.sqrt(jnp.vdot(r0, r0) + jnp.vdot(r1, r1)
                         + jnp.vdot(r2, r2) + jnp.vdot(r3, r3)))
    assert nrm < 1e-6, nrm


def test_divfree_projection_initial_state():
    """`_divfree_project_initial` (opt-in CN hook): the projected initial
    state is discretely divergence-free (mean-free pressure residual driven
    to the q-solve tolerance), Dirichlet rows are untouched, and the update
    is a genuine M-orthogonal-style correction (nonzero, supported on
    non-bc rows only)."""
    from control_tpu.fem.space import combine_masks, homogenize
    ctl, mesh, space_v, space_p = _stokes_problem(3, True, mesh_n=4)
    X = SpatialCoordinate(mesh)
    # smooth, NOT discretely divergence-free field (generic interpolant)
    v_0 = Function(space_v).interpolate(
        (sin(pi * X[0]) * sin(pi * X[1]) + 0.3 * X[0] * (1.0 - X[0]),
         sin(2 * pi * X[0]) * sin(pi * X[1])))
    mask = combine_masks(space_v, homogenize(ctl._bcs_v[1]))
    tr, te = TrialFunction(space_v), TestFunction(space_v)
    pte = TestFunction(space_p)
    B = assemble(-inner(div(tr), pte) * dx)
    B_T = assemble(-inner(TrialFunction(space_p), div(te)) * dx)
    M = assemble(inner(tr, te) * dx)

    def dropmean(q):
        return q - jnp.mean(q)

    # default: opt-in flag unset -> identity (exact-solution tests rely on
    # the data passing through untouched)
    w_id = ctl._divfree_project_initial(v_0, B, B_T, M, mask, None)
    assert w_id is v_0

    ctl._divfree_initial = True
    w = ctl._divfree_project_initial(v_0, B, B_T, M, mask, None)
    r_before = float(jnp.linalg.norm(dropmean(B.apply(v_0.data))))
    r_after = float(jnp.linalg.norm(dropmean(B.apply(w.data))))
    assert r_before > 1e-3          # the interpolant really is inconsistent
    assert r_after < 1e-10 * r_before
    # Dirichlet rows preserved exactly; the correction lives elsewhere
    d = w.data - v_0.data
    assert float(jnp.linalg.norm(jnp.where(mask, d, 0.0))) == 0.0
    assert float(jnp.linalg.norm(d)) > 1e-6
    # second call with identical data returns the cached projection
    w2 = ctl._divfree_project_initial(v_0, B, B_T, M, mask, None)
    assert w2 is w
