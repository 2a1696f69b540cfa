"""Independent-optimizer cross-checks: the all-at-once KKT optimum must
match a reduced-space optimum computed by an INDEPENDENT method --
jax.grad through the forward PDE solve + scipy L-BFGS-B (the TPU-native
analogue of the reference's tlm_adjoint + L-BFGS-B reference solutions,
reference test/test_control.py:554-707 linear, :710-864 Picard, :867-1024
Gauss-Newton; gates at :699-707: state 1e-8, control 1e-6).

The reduced problem minimizes J(u) = 1/2 ||v(u) - v_d||^2_M
+ beta/2 ||u||^2_M over interior control dofs, with v(u) the forward PDE
solve under the SAME discretization (framework assembly), so both routes
target the same finite-dimensional optimum; u = zeta / beta recovers the
control from the all-at-once adjoint.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from control_tpu import (Control, UnitSquareMesh, FunctionSpace, Function,
                         TrialFunction, TestFunction, SpatialCoordinate,
                         DirichletBC, Constant, grad, inner, dx, sin, exp,
                         pi)
from control_tpu.fem.assemble import assemble
from control_tpu.fem.space import combine_masks
from control_tpu.models.common import residual_vector

# slow tier: independent-optimizer cross-checks: many forward solves under jax.grad + L-BFGS-B
pytestmark = pytest.mark.slow


def _setup(degree):
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", degree)
    X = SpatialCoordinate(mesh)
    bc = DirichletBC(space, 0.0, "on_boundary")
    mask = combine_masks(space, (bc,))
    free = np.where(~np.asarray(mask).ravel())[0]
    u_t, v_t = TrialFunction(space), TestFunction(space)
    M = np.asarray(assemble(inner(u_t, v_t) * dx).to_dense())
    vd_fun = Function(space).interpolate(
        sin(pi * X[0]) * sin(pi * X[1]) * exp(X[0] + X[1]))
    return mesh, space, X, bc, mask, free, M, vd_fun


def _l2(M, x):
    x = np.asarray(x).ravel()
    return float(np.sqrt(abs(x @ (M @ x))))


def _lbfgs(jfun, n_free, gtol=1e-11):
    val_grad = jax.jit(jax.value_and_grad(jfun))

    def fg(m):
        v, g = val_grad(jnp.asarray(m))
        return float(v), np.asarray(g, dtype=np.float64)

    res = scipy.optimize.minimize(
        fg, np.zeros(n_free), jac=True, method="L-BFGS-B",
        options={"ftol": 0.0, "gtol": gtol, "maxiter": 2000})
    assert res.success or res.status == 2, res.message
    return res.x


def test_stationary_linear_control_vs_reference_optimizer():
    beta = 1.0
    for degree in (1, 2):
        mesh, space, X, bc, mask, free, M, vd_fun = _setup(degree)

        def forw_diff_operator(trial, test, v_old):
            return (inner(grad(trial), grad(test)) * dx
                    + 2.0 * inner(trial, test) * dx)

        def desired_state(test):
            return inner(vd_fun, test) * dx, vd_fun

        def force_f(test):
            return inner(Function(space), test) * dx

        ctl = Control.Stationary(
            space, forw_diff_operator, desired_state=desired_state,
            force_f=force_f, beta=beta, bcs_v=bc)
        ctl.linear_solve(
            solver_parameters={"linear_solver": "fgmres",
                               "fgmres_restart": 10,
                               "maximum_iterations": 500,
                               "relative_tolerance": 1.0e-14,
                               "absolute_tolerance": 1.0e-14,
                               "monitor_convergence": False},
            print_error=False, create_output=False, plots=False)
        my_v = np.asarray(ctl._v.data).ravel()
        my_u = np.asarray(ctl._zeta.data).ravel() / beta

        # independent reduced-space optimum
        u_t, v_t = TrialFunction(space), TestFunction(space)
        A = np.asarray(assemble(
            forw_diff_operator(u_t, v_t, None)).to_dense())
        A_ff = jnp.asarray(A[np.ix_(free, free)])
        M_ff = jnp.asarray(M[np.ix_(free, free)])
        vd_f = jnp.asarray(np.asarray(vd_fun.data).ravel()[free])

        def jfun(m):
            v = jnp.linalg.solve(A_ff, M_ff @ m)
            d = v - vd_f
            return (0.5 * d @ (M_ff @ d)
                    + 0.5 * beta * m @ (M_ff @ m))

        m_opt = _lbfgs(jfun, free.size)
        v_opt = np.asarray(jnp.linalg.solve(A_ff, M_ff @ jnp.asarray(m_opt)))

        v_full = np.zeros(space.n_dofs)
        v_full[free] = v_opt
        u_full = np.zeros(space.n_dofs)
        u_full[free] = m_opt
        assert _l2(M, my_v - v_full) < 1e-8
        assert _l2(M, my_u - u_full) < 1e-6


def _semilinear_forms(picard):
    if picard:
        def forw_diff_operator(trial, test, v_old):
            return (inner(grad(trial), grad(test)) * dx
                    + ((Constant(2.0) + 0.5 * v_old ** 2.0)
                       * inner(trial, test) * dx))
    else:
        # residual-style form (reference GN usage,
        # test/test_control.py:871-877)
        def forw_diff_operator(trial, test, v_old):
            return (inner(grad(v_old), grad(test)) * dx
                    + ((Constant(2.0) + 0.5 * v_old ** 2.0)
                       * inner(v_old, test) * dx))
    return forw_diff_operator


def _nonlinear_cross_check(picard):
    beta = 1.0
    degree = 1
    mesh, space, X, bc, mask, free, M, vd_fun = _setup(degree)
    forw_diff_operator = _semilinear_forms(picard)

    def desired_state(test):
        return inner(vd_fun, test) * dx, vd_fun

    def force_f(test):
        return inner(Function(space), test) * dx

    ctl = Control.Stationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, bcs_v=bc,
        Gauss_Newton=not picard)
    ctl.non_linear_solve(
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 10,
                           "maximum_iterations": 500,
                           "relative_tolerance": 1.0e-13,
                           "absolute_tolerance": 1.0e-13,
                           "monitor_convergence": False},
        max_non_linear_iter=30, relative_non_linear_tol=1e-12,
        absolute_non_linear_tol=1e-13,
        print_error_linear=False, print_error_non_linear=False,
        create_output=False, plots=False)
    my_v = np.asarray(ctl._v.data).ravel()
    my_u = np.asarray(ctl._zeta.data).ravel() / beta

    # reduced-space: forward Newton solve through the SAME framework
    # assembly (residual_vector is jnp-traceable), differentiated by jax
    M_ff = jnp.asarray(M[np.ix_(free, free)])
    vd_f = jnp.asarray(np.asarray(vd_fun.data).ravel()[free])
    gs = space.grid_shape

    def residual_free(v_free, m_free):
        v_full = jnp.zeros(space.n_dofs).at[jnp.asarray(free)].set(v_free)
        v_fun = Function(space, data=v_full.reshape(gs))
        N = residual_vector(_semilinear_forms(True), space, v_fun)
        return N.data.ravel()[free] - M_ff @ m_free

    jac = jax.jacfwd(residual_free, argnums=0)

    def forward(m_free):
        def newton(v, _):
            r = residual_free(v, m_free)
            J = jac(v, m_free)
            return v - jnp.linalg.solve(J, r), None
        v0 = jnp.zeros(free.size)
        v, _ = jax.lax.scan(newton, v0, None, length=20)
        return v

    def jfun(m):
        v = forward(m)
        d = v - vd_f
        return 0.5 * d @ (M_ff @ d) + 0.5 * beta * m @ (M_ff @ m)

    m_opt = _lbfgs(jfun, free.size)
    v_opt = np.asarray(forward(jnp.asarray(m_opt)))

    v_full = np.zeros(space.n_dofs)
    v_full[free] = v_opt
    u_full = np.zeros(space.n_dofs)
    u_full[free] = m_opt
    assert _l2(M, my_v - v_full) < 1e-8
    assert _l2(M, my_u - u_full) < 1e-6


def test_picard_stationary_nonlinear_control_vs_reference_optimizer():
    _nonlinear_cross_check(picard=True)


def test_gauss_newton_stationary_nonlinear_control_vs_reference_optimizer():
    _nonlinear_cross_check(picard=False)


def test_instationary_cn_linear_control_vs_reference_optimizer():
    """Instationary CN all-at-once vs jax.grad through a jitted CN
    time-stepper + L-BFGS (the discrete reduced objective carries the CN
    trapezoid weights of the all-at-once blocks,
    reference control/control.py:2929-2958)."""
    beta = 1.0
    n_t = 5
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    bc = DirichletBC(space, 0.0, "on_boundary")
    mask = combine_masks(space, (bc,))
    free = np.where(~np.asarray(mask).ravel())[0]
    u_t, v_t = TrialFunction(space), TestFunction(space)
    M = np.asarray(assemble(inner(u_t, v_t) * dx).to_dense())
    K = np.asarray(assemble(inner(grad(u_t), grad(v_t)) * dx).to_dense())
    vd_fun = Function(space).interpolate(
        sin(pi * X[0]) * sin(pi * X[1]) * exp(X[0] + X[1]))

    def forw_diff_operator(trial, test, v, t):
        return inner(grad(trial), grad(test)) * dx

    def desired_state(test, t):
        return inner(vd_fun, test) * dx, vd_fun

    def force_f(test, t):
        return inner(Function(space), test) * dx

    def bc_t(space_0, t):
        return DirichletBC(space_0, 0.0, "on_boundary")

    ctl = Control.Instationary(
        space, forw_diff_operator, desired_state=desired_state,
        force_f=force_f, beta=beta, n_t=n_t, time_interval=(0.0, 1.0),
        CN=True, bcs_v=bc_t)
    ctl.linear_solve(
        lambda_v_bounds=(0.25, 2.25),
        solver_parameters={"linear_solver": "fgmres",
                           "fgmres_restart": 30,
                           "maximum_iterations": 500,
                           "relative_tolerance": 1.0e-14,
                           "absolute_tolerance": 1.0e-14,
                           "monitor_convergence": False},
        print_error=False, create_output=False, plots=False)
    tau = ctl._tau
    my_v = np.asarray(ctl._v.data).reshape(n_t, -1)        # v_0..v_{n_t-1}
    my_u = np.asarray(ctl._zeta.data).reshape(n_t, -1) / beta

    M_ff = jnp.asarray(M[np.ix_(free, free)])
    K_ff = jnp.asarray(K[np.ix_(free, free)])
    vd_f = jnp.asarray(np.asarray(vd_fun.data).ravel()[free])
    Aplus = M_ff + 0.5 * tau * K_ff       # M + tau/2 K
    Amin = M_ff - 0.5 * tau * K_ff

    # controls u_0..u_{n_t-2} (zeta_{n_t-1} = 0 in the CN all-at-once);
    # CN step: (M + tau/2 K) v_{j+1} = (M - tau/2 K) v_j
    #          + tau/2 M (u_j + u_{j+1})
    def forward(m):                        # m: (n_t-1, n_free)
        u = jnp.concatenate([m, jnp.zeros((1, free.size))])

        def step(v, j):
            rhs = Amin @ v + 0.5 * tau * (M_ff @ (u[j] + u[j + 1]))
            v1 = jnp.linalg.solve(Aplus, rhs)
            return v1, v1

        v0 = jnp.zeros(free.size)
        _, vs = jax.lax.scan(step, v0, jnp.arange(n_t - 1))
        return vs                          # v_1..v_{n_t-1}

    def jfun(mflat):
        # the CN all-at-once blocks encode MIDPOINT quadrature of both
        # cost terms (T1-symmetrised state weights tridiag(1/2; 1,..,1/2)
        # and control weights tridiag(1/2; 1/2,1,..,1) are exactly
        # (tau/4)||x_i + x_{i+1}||^2 sums)
        m = mflat.reshape(n_t - 1, free.size)
        vs = forward(m)
        v_all = jnp.concatenate([jnp.zeros((1, free.size)), vs])
        e = v_all - vd_f[None]
        u_all = jnp.concatenate([m, jnp.zeros((1, free.size))])
        pair_e = e[:-1] + e[1:]
        pair_u = u_all[:-1] + u_all[1:]
        j_state = 0.25 * tau * jnp.sum(
            jax.vmap(lambda x: x @ (M_ff @ x))(pair_e))
        j_ctrl = 0.25 * beta * tau * jnp.sum(
            jax.vmap(lambda x: x @ (M_ff @ x))(pair_u))
        return j_state + j_ctrl

    mflat = _lbfgs(jfun, (n_t - 1) * free.size)
    m = mflat.reshape(n_t - 1, free.size)
    vs = np.asarray(forward(jnp.asarray(m)))

    err_v = my_v[1:][:, free] - vs
    err_u = my_u[:-1][:, free] - m
    nv = float(np.sqrt(tau * sum(e @ (np.asarray(M_ff) @ e)
                                 for e in err_v)))
    nu = float(np.sqrt(tau * sum(e @ (np.asarray(M_ff) @ e)
                                 for e in err_u)))
    assert nv < 1e-8, nv
    assert nu < 1e-6, nu
