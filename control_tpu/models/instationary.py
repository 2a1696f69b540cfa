"""Instationary (space-time all-at-once) optimal control problems.

TPU-native rebuild of ``Control.Instationary``
(reference control/control.py:1488-5359).  The all-at-once vector over n_t
time steps is a stacked array (n_t, *grid) instead of a
MixedFunctionSpace; the block-bidiagonal space-time KKT operator becomes a
handful of batched contractions (one per block diagonal), assembly of all
time blocks is one ``vmap``-ed kernel, and the Crank-Nicolson T1/T2
symmetrisation is a pair of (alternating-)cumsum scans.

The built-in preconditioner reproduces the reference's recipe
(control/control.py:1943-2440): block-(1,1) mass solves vectorised over all
time blocks at once, and a matching-Schur approximation

    S ~ (L + c M) M^{-1} (L^T + c M),   c = (0.5) tau / sqrt(beta)

whose forward/backward block substitutions run as ``lax.scan`` over time
with one geometric-multigrid V-cycle pair per step (the reference rebuilds
BoomerAMG per block per application; here hierarchies are built once,
batched).  Backward-Euler uses the epsilon = 1e-3 final-block
regularisation (reference control/control.py:2836).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..fem.expr import TrialFunction, TestFunction, Constant, inner, grad, div
from ..fem.forms import dx, Form
from ..fem.space import (Function, Cofunction, MixedFunction, DirichletBC,
                         homogenize, combine_masks)
from ..fem.assemble import assemble
from ..ops.local_op import LocalOp
from ..solvers.block import (MultiBlockSystem, DirichletBCNullspace,
                             NoneNullspace, apply_T_1, apply_T_2,
                             apply_T_1_inv, apply_T_2_inv)
from ..solvers.multigrid import MGConfig
from ..utils import io as _io
from .common import (mass_solver, zero_rows, gauss_newton_operator,
                     residual_vector, bc_lift_function)


def _probe_form_dependence(form_fn, space, coeff_space, t_samples):
    """Whether the operator assembled from ``form_fn(trial, test, v, t)``
    (trial/test on ``space``, state coefficient ``v`` on ``coeff_space``)
    depends on the state ``v`` / the time ``t``.

    Expression-tree containment misses coefficients produced EAGERLY from
    ``v``/``t`` inside the user callback (e.g.
    ``Function(W).interpolate(w(t))``: the form then holds a plain
    Function whose *data* encodes the dependence).  So probe numerically:
    assemble at two state samples / two time samples and compare.  A form
    whose assembled operators coincide at both samples is treated as
    independent (ties are measure-zero for the deterministic non-constant
    probe state used here)."""
    trial = TrialFunction(space)
    test = TestFunction(space)
    t0, t1 = float(t_samples[0]), float(t_samples[1])

    def build(vdata, t):
        vfun = Function(coeff_space, data=vdata)
        out = assemble(form_fn(trial, test, vfun, Constant(t)))
        # residual-style GN forms contain no trial function and assemble
        # to a Cofunction; compare its vector data instead of a matrix
        return out.A if hasattr(out, "A") else out.data

    z = jnp.zeros(coeff_space.grid_shape, dtype=coeff_space.mesh.dtype)
    # deterministic, smooth, non-constant probe state (robust under the
    # quadrature of typical convection terms; random data would make
    # dep_v flicker across runs)
    probe = jnp.arange(z.size, dtype=z.dtype).reshape(z.shape)
    probe = 0.5 + probe / max(z.size - 1, 1)
    A00 = build(z, t0)
    dep_v = not bool(jnp.array_equal(A00, build(probe, t0)))
    dep_t = not bool(jnp.array_equal(A00, build(z, t1)))
    return dep_v, dep_t


def _stack_apply(space_trial, space_test, A, x):
    """Apply stacked local matrices A (n|1, E|1, b, a) to x (n, *grid)."""
    xe = space_trial.gather(x)
    re = jnp.matmul(A, xe[..., None])[..., 0]
    out = space_test.scatter_add(re)
    if out.shape[0] == 1 and x.shape[0] != 1:
        out = jnp.broadcast_to(out, (x.shape[0],) + out.shape[1:])
    return out


def _fast_stack_applier(space, A):
    """Batched stacked-operator application via the node-stencil fast path
    (one fused kernel per apply on TPU for 2-D scalar spaces; fused
    shift/multiply-adds with dim x dim coupling blocks for vector spaces
    and (2d+1)**3 stencils in 3-D)."""
    from ..ops.stencil import node_stencil, apply_stencil
    w = node_stencil(A, space)
    d, nd = space.degree, space.ndim
    return lambda x: apply_stencil(w, x, d, nd=nd)


class _SweepSolver:
    """Sequential solve of a block lower-bidiagonal system
    u_i = V-cycle_i(b_i - S_i u_{i-1}) via lax.scan, with per-time-block
    multigrid hierarchies built once (batched under vmap when the blocks
    differ).  Scalar spaces use the fused node-stencil fast path for both
    the sub-diagonal action and the V-cycle operators."""

    def __init__(self, space, mask, diag_A, sub_A, cycles=1, state=None):
        # one V-cycle with 4+4 Chebyshev smoothing matches the quality of
        # the reference's 2 BoomerAMG applications per substitution step at
        # half the sequential-latency cost (measured on the 256^2 x 64 heat
        # benchmark: same outer iteration count)
        self.space, self.mask, self.cycles = space, mask, cycles
        self.config = MGConfig(space, mask)
        self.shared = diag_A.shape[0] == 1
        self.stencil_sub = True
        if state is not None:
            self.params = state["params"]
            self.sub = state["sub"]
        else:
            if self.shared:
                self.params = self.config.build(diag_A[0])
            else:
                self.params = jax.vmap(self.config.build)(diag_A)
            if sub_A is None:
                self.sub = None
            elif self.stencil_sub:
                from ..ops.stencil import node_stencil
                self.sub = node_stencil(sub_A, space)  # (m|1,K,ny,nx[,D,D])
            else:
                self.sub = sub_A                       # local matrices
        self.state = {"params": self.params, "sub": self.sub}

    def _sub_apply(self, S_i, u):
        if self.stencil_sub:
            from ..ops.stencil import apply_stencil
            return apply_stencil(S_i, u, self.space.degree,
                                 nd=self.space.ndim)
        xe = self.space.gather(u)
        return self.space.scatter_add(
            jnp.matmul(S_i, xe[..., None])[..., 0])

    def solve_jacobi(self, b, reverse=False, steps=12, last_sub_scale=1.0):
        """Parallel-in-time truncated block-Jacobi substitution:
        u^{m+1} = F^{-1}(b - S u^m), exact after n steps (S is a block
        sub-diagonal shift).  All time blocks solve their V-cycles
        simultaneously as one batched kernel -- trading the scan's
        sequential latency for a small truncation error that decays like
        rho^steps with rho = |(c-1)/(c+1)| on mass-dominated modes."""
        if last_sub_scale != 1.0 and reverse:
            raise ValueError("last_sub_scale supports forward sweeps only")
        n = b.shape[0]
        steps = min(steps, n)
        mask = self.mask
        params = self.params
        sub = self.sub
        if reverse:
            b = b[::-1]
            if not self.shared:
                params = jax.tree_util.tree_map(lambda x: x[::-1], params)
            if sub is not None and sub.shape[0] > 1:
                sub = sub[::-1]
        if sub is not None and sub.shape[0] > 1:
            pad = jnp.zeros((1,) + sub.shape[1:], sub.dtype)
            sub = jnp.concatenate([pad, sub])

        if self.shared:
            def Fsolve(x):
                return self.config.apply(params, x, cycles=self.cycles)
        else:
            def Fsolve(x):
                return jax.vmap(
                    lambda p, xi: self.config.apply(p, xi,
                                                    cycles=self.cycles)
                )(params, x)

        def S_all(u):
            if self.sub is None:
                return jnp.zeros_like(u)
            shifted = jnp.concatenate([jnp.zeros_like(u[:1]), u[:-1]])
            if self.stencil_sub:
                from ..ops.stencil import apply_stencil
                return apply_stencil(sub, shifted, self.space.degree,
                                     nd=self.space.ndim)
            return self._sub_apply(sub, shifted)

        mk = mask[None] if mask is not None else None
        u = Fsolve(zero_rows(mk, b))

        def body(_, u):
            s = S_all(u)
            if last_sub_scale != 1.0:
                s = s.at[n - 1].multiply(last_sub_scale)
            return Fsolve(zero_rows(mk, b - s))

        u = jax.lax.fori_loop(0, steps - 1, body, u)
        return u[::-1] if reverse else u

    def solve(self, b, reverse=False, last_sub_scale=1.0):
        if last_sub_scale != 1.0 and reverse:
            raise ValueError("last_sub_scale supports forward sweeps only")
        n = b.shape[0]
        mask = self.mask
        params = self.params
        sub = self.sub

        if reverse:
            b = b[::-1]
            if not self.shared:
                params = jax.tree_util.tree_map(lambda x: x[::-1], params)
            if sub is not None and sub.shape[0] > 1:
                sub = sub[::-1]

        has_sub = jnp.arange(n) > 0
        if last_sub_scale != 1.0:
            # Sigma-conjugated factor (BE final-block stabilisation): the
            # sub-diagonal coupling INTO the last row is scaled by eps
            has_sub = jnp.where(jnp.arange(n) == n - 1,
                                jnp.asarray(last_sub_scale), has_sub)
        use_sub = sub is not None
        if use_sub:
            if sub.shape[0] == 1:
                S_xs = jnp.broadcast_to(sub, (n,) + sub.shape[1:])
            else:
                pad = jnp.zeros((1,) + sub.shape[1:], sub.dtype)
                S_xs = jnp.concatenate([pad, sub])       # align row i
        else:
            S_xs = jnp.zeros((n, 1, 1, 1), b.dtype)

        def step(u_prev, xs):
            b_i, flag, S_i, p_i = xs
            rhs = b_i
            if use_sub:
                rhs = rhs - flag * self._sub_apply(S_i, u_prev)
            rhs = zero_rows(mask, rhs)
            u_i = self.config.apply(p_i if p_i is not None else params,
                                    rhs, cycles=self.cycles)
            return u_i, u_i

        if self.shared:
            def step2(u_prev, xs):
                b_i, flag, S_i = xs
                return step(u_prev, (b_i, flag, S_i, None))
            _, u = jax.lax.scan(
                step2, jnp.zeros_like(b[0]),
                (b, has_sub.astype(b.dtype), S_xs))
        else:
            def step3(u_prev, xs):
                return step(u_prev, xs)
            _, u = jax.lax.scan(
                step3, jnp.zeros_like(b[0]),
                (b, has_sub.astype(b.dtype), S_xs, params))
        return u[::-1] if reverse else u


class _ParaDiagSweep:
    """Parallel-in-time Schur substitution via ParaDiag: the block
    lower-bidiagonal Toeplitz factor (L + cM), whose exact solve is the
    reference's *sequential* per-block BoomerAMG substitution
    (reference control/control.py:2051-2189), is replaced by its
    alpha-circulant approximation

        C_alpha = I (x) F + Sigma_alpha (x) S,
        (Sigma_alpha)_{j,j-1} = 1, (Sigma_alpha)_{0,n-1} = alpha,

    which a scaled FFT along the time axis diagonalises
    (McDonald-Pestana-Wathen-style all-at-once preconditioning):

        u = D_a^{-1} IFFT_t[(F + mu_k S)^{-1} FFT_t(D_a b)]_k,
        mu_k = alpha^{1/n} e^{-2 pi i k / n},  D_a = diag(alpha^{j/n}).

    The n sequential V-cycles of the scan sweep collapse into ONE batched
    complex multi-V-cycle solve over n//2+1 frequencies (Hermitian
    symmetry of the real input: rfft/irfft).

    Choice of alpha: the error budget is  O(alpha) circulant truncation
    + eps_V / alpha, where eps_V is the relative error of the inexact
    per-frequency solve -- the D_a^{-1} unscaling amplifies frequency-
    solve errors by up to 1/alpha.  With the default two V-cycles
    (eps_V ~ 1e-6, still one batched kernel) the optimum sits near
    alpha = 1e-3, giving a ~1e-3-accurate application -- far more
    accurate than the block preconditioner it lives in."""

    def __init__(self, space, mask, diag_A, sub_A, n, alpha=None,
                 cycles=2, state=None, defect_steps=1, smooth=None,
                 weight_dtype=None):
        if diag_A.shape[0] != 1:
            raise ValueError("ParaDiag requires a Toeplitz (time-"
                             "independent) sweep factor")
        self.space, self.mask = space, mask
        self.cycles, self.n = cycles, n
        # defect correction around the alpha-circulant solve: the error
        # operator E of one application is ~1e-3 on average but its norm
        # concentrates on the stiffest spatial modes -- exactly where an
        # outer Krylov method drives its residuals (observed: the f32
        # 256^2x64 heat solve goes 9 -> 32+ outer iterations without
        # correction, and stalls outright on TPU).  One correction step
        #   u <- u + P(b - L u)
        # squares the worst-case error (and drops the f32 noise floor by
        # the residual ratio) for 2x the batched-V-cycle work.
        self.defect_steps = defect_steps
        rdtype = diag_A.dtype
        if alpha is None:
            alpha = 1e-3
        self.alpha = alpha
        # small coarse level: the dense coarse inverse is built per
        # FREQUENCY (n//2+1 complex inversions via real 2x2-block LU);
        # the default 4500-dof coarse level would dominate setup
        pre, post = smooth if smooth is not None else (8, 8)
        self.config = MGConfig(space, mask, coarse_max_dofs=600,
                               pre=pre, post=post,
                               weight_dtype=weight_dtype)
        from .common import encode_complex, decode_complex
        self.trivial = sub_A is None or n == 1
        if self.trivial:
            # block-diagonal: one real hierarchy, blocks solved batched
            self.params = (self.config.build(diag_A[0]) if state is None
                           else state["params"])
            self.state = {"params": self.params}
            return
        cdtype = (jnp.complex64 if rdtype == jnp.dtype(jnp.float32)
                  else jnp.complex128)
        n_f = n // 2 + 1
        if state is None:
            k = jnp.arange(n_f)
            mu = (alpha ** (1.0 / n)
                  * jnp.exp((-2j * jnp.pi / n) * k)).astype(cdtype)
            F = diag_A[0].astype(cdtype)
            S = jnp.broadcast_to(sub_A[0], diag_A.shape[1:]).astype(cdtype)
            A_k = F[None] + mu[:, None, None, None] * S[None]
            self.params = jax.vmap(self.config.build)(A_k)
            # exact bidiagonal factor stencils for the defect correction
            # (masked rows: identity on the diagonal factor, zero on the
            # sub-diagonal)
            from ..ops.stencil import node_stencil
            self._wF = node_stencil(diag_A[0], space, mask=mask)
            self._wS = node_stencil(
                jnp.broadcast_to(sub_A[0], diag_A.shape[1:]), space,
                mask=mask, alpha=0.0)
        else:
            self.params = decode_complex(state["params"])
            self._wF = state["wF"]
            self._wS = state["wS"]
        # complex leaves transfer to the accelerator as (re, im) pairs
        self.state = {"params": encode_complex(self.params),
                      "wF": self._wF, "wS": self._wS}
        # time-axis DFT as explicit MXU matmuls (precision HIGHEST), not
        # jnp.fft: the TPU f32 FFT's rounding error is amplified by the
        # 1/alpha unscaling and destroys the sweep; a small dense DFT at
        # highest precision keeps it at ~sqrt(n) * eps.  n_t is at most a
        # few hundred, so the O(n^2) cost is negligible (and MXU-shaped).
        j = np.arange(n)
        Wf = np.exp(-2j * np.pi * np.outer(np.arange(n_f), j) / n)
        d = np.full(n_f, 2.0)
        d[0] = 1.0
        if n % 2 == 0:
            d[-1] = 1.0
        Wb = (np.conj(Wf) * d[:, None]).T / n      # (n, n_f)
        self._Wf = jnp.asarray(Wf, cdtype)
        self._Wb = jnp.asarray(Wb, cdtype)

    def _circulant_solve(self, b):
        """One alpha-circulant solve in the forward (lower-bidiagonal)
        frame; b is already bc-zeroed."""
        n = self.n
        j = (jnp.arange(n) / n).astype(b.dtype)
        scale = (self.alpha ** j).reshape((n,) + (1,) * (b.ndim - 1))
        g = (b * scale).astype(self._Wf.dtype)
        ghat = jnp.einsum("kj,j...->k...", self._Wf, g,
                          precision=jax.lax.Precision.HIGHEST)
        # one batched multi-V-cycle over all frequencies (MGConfig.apply
        # broadcasts over the leading hierarchy/rhs batch axis): the fused
        # complex smoothing kernel sees the whole (n_f, ny, nx) batch, and
        # the HLO stays vmap-free
        what = self.config.apply(self.params, ghat, cycles=self.cycles)
        u = jnp.real(jnp.einsum("jk,k...->j...", self._Wb, what,
                                precision=jax.lax.Precision.HIGHEST))
        return u.astype(b.dtype) / scale

    def _factor_apply(self, u):
        """Exact y_i = F u_i + S u_{i-1} (bc rows: identity)."""
        from ..ops.stencil import apply_stencil
        d, nd = self.space.degree, self.space.ndim
        y = apply_stencil(self._wF, u, d, nd=nd)
        y = y.at[1:].add(apply_stencil(self._wS, u[:-1], d, nd=nd))
        return y

    def solve(self, b, reverse=False):
        mk = self.mask[None] if self.mask is not None else None
        if self.trivial:
            u = self.config.apply(self.params, zero_rows(mk, b),
                                  cycles=self.cycles)
            return u
        if reverse:
            b = b[::-1]
        b = zero_rows(mk, b)
        u = self._circulant_solve(b)
        for _ in range(self.defect_steps):
            r = b - self._factor_apply(u)
            u = u + self._circulant_solve(r)
        u = zero_rows(mk, u)
        return u[::-1] if reverse else u


class _BEParaDiagSweep:
    """Time-parallel backward-Euler Schur substitution.

    The BE sweep factor (reference control/control.py:2191-2438) is block
    lower-bidiagonal with row-dependent diagonal shifts
    [0, c, ..., c, sqrt(eps) c] and a constant sub-diagonal S = -M: it is
    Toeplitz except in its first and last rows, so a whole-factor
    alpha-circulant approximation is poor (a uniform-shift Toeplitz proxy
    was measured to double the outer iterations and diverge at small
    beta -- the zero first-row shift matters).  The bidiagonal structure
    lets the edge rows be peeled off exactly instead:

        u_0       = F_0^{-1} b_0
        u_{1:n-1} = ParaDiag over the interior Toeplitz block with
                    rhs (b_1 - S u_0, b_2, ..., b_{n-2})
        u_{n-1}   = F_{n-1}^{-1} (b_{n-1} - S u_{n-2})

    Two extra single-block V-cycle solves (negligible next to the batched
    interior frequency solve) recover time parallelism for BE at scan
    accuracy, up to the interior circulant error -- which the interior
    sweep's defect correction squares.  ``reverse=True`` flips the row
    order (the backward factor's edge shifts swap ends), so the same
    instance serves the (L^T + shifts) sweep."""

    def __init__(self, space, mask, diag_A, sub_A, n, alpha=None,
                 cycles=2, state=None, defect_steps=1, smooth=None,
                 weight_dtype=None):
        if diag_A.shape[0] != n or n < 3:
            raise ValueError("edge-row ParaDiag needs the full "
                             "row-dependent factor stack with n >= 3 rows")
        self.space, self.mask, self.n = space, mask, n
        self.cycles = cycles
        # edge hierarchies at the scan sweep's quality (default MGConfig,
        # one V-cycle per application -- _SweepSolver's setting)
        self.edge_config = MGConfig(space, mask)
        from ..ops.stencil import node_stencil
        if state is None:
            e_first = self.edge_config.build(diag_A[0])
            e_last = self.edge_config.build(diag_A[n - 1])
            wS = node_stencil(sub_A, space)
            mid_state = None
        else:
            e_first, e_last = state["e_first"], state["e_last"]
            wS = state["wS"]
            mid_state = state["mid"]
        self.e_first, self.e_last, self._wS = e_first, e_last, wS
        self.mid = _ParaDiagSweep(space, mask, diag_A[1:2], sub_A, n - 2,
                                  alpha=alpha, cycles=cycles,
                                  defect_steps=defect_steps, smooth=smooth,
                                  weight_dtype=weight_dtype,
                                  state=mid_state)
        self.state = {"e_first": e_first, "e_last": e_last, "wS": wS,
                      "mid": self.mid.state}

    def solve(self, b, reverse=False, last_sub_scale=1.0):
        from ..ops.stencil import apply_stencil
        if last_sub_scale != 1.0 and reverse:
            raise ValueError("last_sub_scale supports forward sweeps only")
        mk = self.mask[None] if self.mask is not None else None
        if reverse:
            b = b[::-1]
        b = zero_rows(mk, b)
        first = self.e_last if reverse else self.e_first
        last = self.e_first if reverse else self.e_last
        d, nd = self.space.degree, self.space.ndim
        u0 = self.edge_config.apply(first, b[0], cycles=self.cycles)
        s_u0 = apply_stencil(self._wS[0], u0, d, nd=nd)
        bm = zero_rows(mk, b[1:-1].at[0].add(-s_u0))
        um = self.mid.solve(bm)
        s_ul = apply_stencil(self._wS[0], um[-1], d, nd=nd)
        bl = zero_rows(self.mask, b[-1] - last_sub_scale * s_ul)
        ul = self.edge_config.apply(last, bl, cycles=self.cycles)
        u = zero_rows(mk, jnp.concatenate([u0[None], um, ul[None]]))
        return u[::-1] if reverse else u


class Instationary:
    """See module docstring; API mirrors the reference
    (control/control.py:1489-1493).  Both ``force_f`` (documented name) and
    ``force_function`` are accepted."""

    def __init__(self, space_v, forward_form, desired_state=None,
                 force_f=None, *, beta=10.0**-3, space_p=None,
                 Gauss_Newton=False, CN=True, n_t=20,
                 initial_condition=None, time_interval=None, bcs_v=None,
                 force_function=None):
        if force_f is None:
            force_f = force_function
        if desired_state is None:
            def desired_state(test_v, t):
                v_d = Function(space_v, name="v_d")
                return inner(v_d, test_v) * dx, v_d
        if force_f is None:
            def force_f(test_v, t):
                f = Function(space_v, name="f")
                return inner(f, test_v) * dx

        self._space_v = space_v
        self._space_p = space_p
        self._forward_form = forward_form
        self._desired_state = desired_state
        self._force_function = force_f
        self._beta = beta
        self._initial_condition = initial_condition
        self._time_interval = ((0.0, 1.0) if time_interval is None
                               else time_interval)
        self._CN = CN
        self._n_t = n_t
        self._Gauss_Newton = Gauss_Newton

        v_test, v_trial = TestFunction(space_v), TrialFunction(space_v)
        self._M_v = inner(v_trial, v_test) * dx
        self._M_zeta = inner(v_trial, v_test) * dx
        self._M_p = None
        self._M_mu = None

        self._f_bcs_v = bcs_v
        self._rebuild_bcs()

        v = MixedFunction(space_v, n_t, name="v")
        for i in range(n_t):
            for bc in self._bcs_v[i]:
                bc.apply(v.sub(i))
        self._v = v
        self._zeta = MixedFunction(space_v, n_t, name="zeta")

        if space_p is not None:
            p_test, p_trial = TestFunction(space_p), TrialFunction(space_p)
            self._M_p = inner(p_trial, p_test) * dx
            self._M_mu = inner(p_trial, p_test) * dx
            n_p = n_t if not CN else n_t - 1
            self._p = MixedFunction(space_p, n_p, name="p")
            self._mu = MixedFunction(space_p, n_p, name="mu")

        self._true_v = None
        from .common import KernelCache
        self._kernel_cache = KernelCache()

    # ------------------------------------------------------------- plumbing
    @property
    def _tau(self):
        t_0, T_f = self._time_interval
        return (T_f - t_0) / (self._n_t - 1.0)

    def _times(self):
        t_0, T_f = self._time_interval
        return np.linspace(t_0, T_f, self._n_t)

    def _rebuild_bcs(self):
        full = {}
        if self._f_bcs_v is None:
            for i in range(self._n_t):
                full[i] = ()
        else:
            for i, t in enumerate(self._times()):
                bcs_i = self._f_bcs_v(self._space_v, float(t))
                if isinstance(bcs_i, DirichletBC):
                    full[i] = (bcs_i,)
                else:
                    full[i] = tuple(bcs_i)
        self._bcs_v = full

    # -------------------------------------------------------------- setters
    def set_forward_form(self, forward_form):
        self._forward_form = forward_form

    def set_desired_state(self, desired_state):
        self._desired_state = desired_state
        self._data_cache = {}

    def set_force_function(self, force_function):
        self._force_function = force_function
        self._data_cache = {}

    def set_beta(self, beta):
        self._beta = beta

    def set_initial_condition(self, initial_condition):
        self._initial_condition = initial_condition
        v_test = TestFunction(self._space_v)
        self._v.sub(0).assign(initial_condition(v_test))
        for bc in self._bcs_v[0]:
            bc.apply(self._v.sub(0))

    def set_time_interval(self, time_interval):
        self._time_interval = time_interval
        self._rebuild_bcs()

    def set_CN(self, *, CN=True):
        if CN != self._CN:
            self._CN = CN
            if self._space_p is not None:
                self.set_space_p(self._space_p)

    def set_n_t(self, n_t):
        self._n_t = n_t
        self._rebuild_bcs()
        v = MixedFunction(self._space_v, n_t, name="v")
        if self._initial_condition is not None:
            v.sub(0).assign(self._initial_condition(
                TestFunction(self._space_v)))
        for i in range(n_t):
            for bc in self._bcs_v[i]:
                bc.apply(v.sub(i))
        self._v = v
        self._zeta = MixedFunction(self._space_v, n_t, name="zeta")
        if self._space_p is not None:
            self.set_space_p(self._space_p)

    def set_space_v(self, space_v, *, v=None, zeta=None, bcs_v_new=False,
                    bcs_v=None):
        """Replace the state space (reference control.py:1599-1671):
        rebuild the mass forms and the per-time-step bcs, and carry the
        current state/adjoint trajectories over by interpolation onto the
        new space (e.g. after a mesh refinement)."""
        old_v, old_zeta = self._v, self._zeta
        old_space = old_v.space
        self._space_v = space_v
        v_test, v_trial = TestFunction(space_v), TrialFunction(space_v)
        self._M_v = inner(v_trial, v_test) * dx
        self._M_zeta = inner(v_trial, v_test) * dx
        if bcs_v_new:
            self._f_bcs_v = bcs_v
        self._rebuild_bcs()
        n_t = self._n_t
        if v is None:
            v = MixedFunction(space_v, n_t, name="v")
            if self._initial_condition is not None:
                v.sub(0).assign(self._initial_condition(v_test))
            for i in range(1, n_t):
                v.sub(i).interpolate(
                    Function(old_space, data=old_v.data[i]))
        elif v.space != space_v or v.n != n_t:
            raise ValueError("Unexpected space")
        for i in range(n_t):
            for bc in self._bcs_v[i]:
                bc.apply(v.sub(i))
        if zeta is None:
            zeta = MixedFunction(space_v, n_t, name="zeta")
            for i in range(1, n_t):
                zeta.sub(i).interpolate(
                    Function(old_space, data=old_zeta.data[i]))
        elif zeta.space != space_v or zeta.n != n_t:
            raise ValueError("Unexpected space")
        self._v, self._zeta = v, zeta
        bcs_zeta = homogenize(self._bcs_v[1])
        if bcs_zeta:
            mask = combine_masks(space_v, bcs_zeta)
            self._zeta.data = jnp.where(mask[None], 0.0, self._zeta.data)
        self._data_cache = {}
        self._bc_stack_cache = None

    def set_space_p(self, space_p, *, p=None, mu=None):
        self._space_p = space_p
        p_test, p_trial = TestFunction(space_p), TrialFunction(space_p)
        self._M_p = inner(p_trial, p_test) * dx
        self._M_mu = inner(p_trial, p_test) * dx
        n_p = self._n_t if not self._CN else self._n_t - 1
        self._p = p if p is not None else MixedFunction(space_p, n_p,
                                                        name="p")
        self._mu = mu if mu is not None else MixedFunction(space_p, n_p,
                                                           name="mu")

    def set_bcs_v(self, bcs_v, space_v=None):
        if space_v is not None:
            self.set_space_v(space_v, bcs_v_new=True, bcs_v=bcs_v)
            return
        self._f_bcs_v = bcs_v
        self._rebuild_bcs()
        for i in range(self._n_t):
            for bc in self._bcs_v[i]:
                bc.apply(self._v.sub(i))
        bcs_zeta = homogenize(self._bcs_v[1])
        if bcs_zeta:
            mask = combine_masks(self._space_v, bcs_zeta)
            self._zeta.data = jnp.where(mask[None], 0.0, self._zeta.data)

    def set_Gauss_Newton(self, Gauss_Newton=True):
        self._Gauss_Newton = Gauss_Newton

    def _bc_stack(self):
        """Stacked (mask, value) arrays of the per-time-step Dirichlet bcs
        (cached; rebuilt when set_bcs_v/set_time_interval replace
        self._bcs_v) -- applying bcs to the whole time stack is one
        ``where`` instead of n_t full-stack copies."""
        key = id(self._bcs_v)
        ent = getattr(self, "_bc_stack_cache", None)
        if ent is not None and ent[0] == key:
            return ent[1]
        sp = self._space_v
        dtype = sp.mesh.dtype
        mk = jnp.zeros((self._n_t,) + sp.grid_shape, bool)
        val = jnp.zeros((self._n_t,) + sp.grid_shape, dtype)
        for i in range(self._n_t):
            for bc in self._bcs_v[i]:
                mk = mk.at[i].set(jnp.where(bc.mask, True, mk[i]))
                val = val.at[i].set(jnp.where(bc.mask, bc.g, val[i]))
        self._bc_stack_cache = (key, (mk, val))
        return mk, val

    def set_v(self, v_new):
        self._v.assign(v_new)
        mk, val = self._bc_stack()
        self._v.data = jnp.where(mk, val, self._v.data)

    def set_zeta(self, zeta_new):
        self._zeta.assign(zeta_new)
        bcs_zeta = homogenize(self._bcs_v[1])
        if bcs_zeta:
            mask = combine_masks(self._space_v, bcs_zeta)
            self._zeta.data = jnp.where(mask[None], 0.0, self._zeta.data)

    def set_p(self, p_new):
        if self._space_p is None:
            raise ValueError("Undefined space_p: unable to assign value")
        self._p.assign(p_new)

    def set_mu(self, mu_new):
        if self._space_p is None:
            raise ValueError("Undefined space_p: unable to assign value")
        self._mu.assign(mu_new)

    def print_error(self, tau=None):
        if tau is None:
            tau = self._tau
        err2 = 0.0
        for i in range(self._n_t):
            d = Function(self._space_v,
                         data=self._true_v.data[i] - self._v.data[i])
            err2 = err2 + assemble(inner(d, d) * dx)
        e = float(np.sqrt(tau) * np.sqrt(abs(float(err2))))
        print(f"Estimated error in the L2-norm: {e:.16e}")

    # ----------------------------------------------------------- operators
    def construct_D_v(self, v_state, t):
        """LocalOp of the linearised forward operator at (v_state, t)
        (reference control/control.py:1887-1896)."""
        if not self._Gauss_Newton:
            trial = TrialFunction(self._space_v)
            test = TestFunction(self._space_v)
            return assemble(self._forward_form(trial, test, v_state,
                                               Constant(t)))
        return gauss_newton_operator(self._forward_form, self._space_v,
                                     v_state, extra_args=(Constant(t),))

    def _probe_dependence(self):
        """Whether the forward form depends on the state / time (numeric
        probe; see _probe_form_dependence -- tree containment misses
        eagerly-interpolated coefficients, silently freezing the operator
        at t_0)."""
        cached = getattr(self, "_dep_cache", None)
        key = (id(self._forward_form), self._time_interval)
        if cached is not None and cached[0] == key:
            return cached[1]
        dep = _probe_form_dependence(
            self._forward_form, self._space_v, self._space_v,
            (self._time_interval[0],
             self._time_interval[0]
             + 0.618 * (self._time_interval[1] - self._time_interval[0])))
        self._dep_cache = (key, dep)
        return dep

    def _D_stack(self, v_old_data):
        """Stacked local matrices (n_t|1, E|1, b, a) of D_v at all time
        points; one vmapped assembly when state/time-dependent."""
        from .common import host_setup
        dep_v, dep_t = self._probe_dependence()
        times = jnp.asarray(self._times(), self._space_v.mesh.dtype)
        if not dep_v and not dep_t:
            A = self.construct_D_v(Function(self._space_v),
                                   float(self._time_interval[0])).A
            return A[None]

        def one(vdata, t):
            vfun = Function(self._space_v, data=vdata)
            if not self._Gauss_Newton:
                trial = TrialFunction(self._space_v)
                test = TestFunction(self._space_v)
                return assemble(self._forward_form(trial, test, vfun,
                                                   Constant(t))).A
            return gauss_newton_operator(self._forward_form, self._space_v,
                                         vfun, extra_args=(Constant(t),)).A

        A = jax.vmap(one)(v_old_data, times)
        # broadcast E axis is lost under vmap only if it was 1; keep as is
        return A

    def _residual_stack(self, v_old_data):
        """N(v_i; test) at all times (n_t, *grid) (true nonlinear residual;
        equals action(D_v_i, v_i) for Picard-style forms)."""
        times = jnp.asarray(self._times(), self._space_v.mesh.dtype)

        def one(vdata, t):
            vfun = Function(self._space_v, data=vdata)
            return residual_vector(self._forward_form, self._space_v, vfun,
                                   extra_args=(Constant(t),)).data

        return jax.vmap(one)(v_old_data, times)

    # -------------------------------------------------------- data vectors
    # construct_f / construct_v_d loop over all n_t time points with a
    # full-stack copy per step (the reference rebuilds them per solve too,
    # control/control.py:3429-3431, but its per-step assembles are cheap);
    # here the eager host loop dominates repeat-solve time, so the outputs
    # are cached keyed by the user callables + time grid
    def _data_cache_get(self, kind, key, build):
        cache = getattr(self, "_data_cache", None)
        if cache is None:
            cache = self._data_cache = {}
        ent = cache.get(kind)
        if ent is None or ent[0] != key:
            ent = (key, build())
            cache[kind] = ent
        return ent[1]

    def construct_f(self, v_test=None):
        """Stacked force vector (reference control/control.py:1898-1916)."""
        key = (id(self._force_function), self._n_t, self._time_interval,
               id(self._space_v), id(v_test))

        def build():
            vt = v_test if v_test is not None \
                else TestFunction(self._space_v)
            f = MixedFunction(self._space_v, self._n_t, dual=True,
                              name="f")
            for i, t in enumerate(self._times()):
                f.sub(i).assign(assemble(
                    self._force_function(vt, Constant(float(t)))))
            return f

        return self._data_cache_get("f", key, build)

    def construct_v_d(self, v_test=None):
        key = (id(self._desired_state), self._n_t, self._time_interval,
               id(self._space_v), id(v_test))

        def build():
            vt = v_test if v_test is not None \
                else TestFunction(self._space_v)
            v_d = MixedFunction(self._space_v, self._n_t, dual=True,
                                name="v_d")
            true_v = MixedFunction(self._space_v, self._n_t, name="true_v")
            for i, t in enumerate(self._times()):
                v_d_i, true_v_i = self._desired_state(vt,
                                                      Constant(float(t)))
                v_d.sub(i).assign(assemble(v_d_i))
                true_v.sub(i).assign(true_v_i)
            return (v_d, true_v)

        v_d, true_v = self._data_cache_get("v_d", key, build)
        self._true_v = true_v
        return v_d

    def _initial_state(self):
        if self._initial_condition is not None:
            v0 = self._initial_condition(TestFunction(self._space_v))
            return Function(self._space_v, data=v0.data)
        return Function(self._space_v, name="v_0")

    # ------------------------------------------------------- block building
    def _blocks(self, Dv_A, M=None):
        """Block dicts of the all-at-once KKT operator
        (reference control/control.py:2889-2978)."""
        n_t, tau, beta = self._n_t, self._tau, self._beta
        sp = self._space_v
        if M is None:
            M = assemble(self._M_v)
        M_A = M.A                                   # (1|E, b, a)

        def D(i):
            return Dv_A[0] if Dv_A.shape[0] == 1 else Dv_A[i]

        def op(A):
            return LocalOp(A, sp, sp)

        block_00, block_01, block_10, block_11 = {}, {}, {}, {}
        if not self._CN:
            shared_d01 = op(tau * jnp.swapaxes(D(0), -1, -2) + M_A) \
                if Dv_A.shape[0] == 1 else None
            shared_d10 = op(tau * D(0) + M_A) if Dv_A.shape[0] == 1 else None
            mM = op(-M_A)
            tbM = op(-(tau / beta) * M_A)
            tM = op(tau * M_A)
            for i in range(n_t):
                if i < n_t - 1:
                    block_00[(i, i)] = tM
                block_01[(i, i)] = shared_d01 or op(
                    tau * jnp.swapaxes(D(i), -1, -2) + M_A)
                block_10[(i, i)] = shared_d10 or op(tau * D(i) + M_A)
                if i < n_t - 1:
                    block_01[(i, i + 1)] = mM
                if i >= 1:
                    block_10[(i, i - 1)] = mM
                    block_11[(i, i)] = tbM
        else:
            n = n_t - 1
            hM = op(0.5 * tau * M_A)
            hbM = op(-0.5 * (tau / beta) * M_A)
            sh = Dv_A.shape[0] == 1
            d01 = (op(0.5 * tau * jnp.swapaxes(D(0), -1, -2) + M_A)
                   if sh else None)
            d01m = (op(0.5 * tau * jnp.swapaxes(D(0), -1, -2) - M_A)
                    if sh else None)
            d10 = op(0.5 * tau * D(0) + M_A) if sh else None
            d10m = op(0.5 * tau * D(0) - M_A) if sh else None
            for i in range(n):
                block_00[(i, i)] = hM
                if i >= 1:
                    block_00[(i, i - 1)] = hM
                block_01[(i, i)] = d01 or op(
                    0.5 * tau * jnp.swapaxes(D(i), -1, -2) + M_A)
                if i < n - 1:
                    block_01[(i, i + 1)] = d01m or op(
                        0.5 * tau * jnp.swapaxes(D(i + 1), -1, -2) - M_A)
                block_10[(i, i)] = d10 or op(0.5 * tau * D(i + 1) + M_A)
                if i >= 1:
                    block_10[(i, i - 1)] = d10m or op(
                        0.5 * tau * D(i) - M_A)
                block_11[(i, i)] = hbM
                if i < n - 1:
                    block_11[(i, i + 1)] = hbM
        return block_00, block_01, block_10, block_11, M

    # ------------------------------------------------------- preconditioner
    def _sweep_fn(self, c, n, mode=None):
        """Choose how the Schur block substitutions run.

        ``self._schur_mode``: "scan" (sequential, exact -- the reference's
        algorithm), "jacobi" (parallel-in-time truncated block Jacobi,
        batched V-cycles over all time blocks), "paradiag"
        (alpha-circulant FFT diagonalisation, see _ParaDiagSweep), or
        "auto" (paradiag when the sweep factors are Toeplitz, else scan).
        """
        if mode is None:
            mode = getattr(self, "_schur_mode", "scan")
        steps = getattr(self, "_schur_jacobi_steps", None)
        if mode == "auto":
            rho = abs(c - 1.0) / (c + 1.0)
            if steps is None:
                import math
                steps = (n if rho >= 0.999
                         else max(6, int(math.ceil(math.log(1e-9)
                                                   / math.log(max(rho,
                                                                  1e-6))))))
            if steps <= max(6, n // 2):
                mode = "jacobi"
            else:
                mode = "scan"
        if mode == "jacobi":
            k = steps or 12
            return lambda solver, b, rev, ls=1.0: solver.solve_jacobi(
                b, reverse=rev, steps=k, last_sub_scale=ls)
        return lambda solver, b, rev, ls=1.0: solver.solve(
            b, reverse=rev, last_sub_scale=ls)

    def _make_sweeps(self, space, mask, F_diag, F_sub, G_diag, G_sup, c, n,
                     toeplitz_factors=None, prebuilt=None,
                     edge_rows=False):
        """Build the forward/backward Schur substitution solvers for the
        selected mode (see _sweep_fn); ParaDiag applies when both factors
        are Toeplitz (time-independent operator) -- either directly, or
        via ``toeplitz_factors=(F_toep, G_toep)``, a caller-supplied
        Toeplitz approximation of row-dependent factors (the BE sweeps
        deviate only in their first/last diagonal shifts) -- otherwise it
        falls back to the exact sequential scan.  ``edge_rows=True``
        asserts the full (n-row) factor stacks are Toeplitz except their
        first/last rows (the BE shift pattern): those peel off into exact
        single-block solves around an interior ParaDiag
        (_BEParaDiagSweep)."""
        mode = getattr(self, "_schur_mode", "scan")
        toeplitz = F_diag.shape[0] == 1 and G_diag.shape[0] == 1
        if (mode in ("auto", "paradiag") and edge_rows and n >= 3
                and F_diag.shape[0] == n):
            kw = dict(alpha=getattr(self, "_paradiag_alpha", None),
                      defect_steps=getattr(self, "_paradiag_dc", 1),
                      cycles=getattr(self, "_paradiag_cycles", 2),
                      smooth=getattr(self, "_mg_smooth", None),
                      weight_dtype=getattr(self, "_mg_weight_dtype", None))
            fwd = _BEParaDiagSweep(space, mask, F_diag, F_sub, n,
                                   state=None if prebuilt is None
                                   else prebuilt["fwd"], **kw)
            bwd = _BEParaDiagSweep(space, mask, G_diag, G_sup, n,
                                   state=None if prebuilt is None
                                   else prebuilt["bwd"], **kw)
            return fwd, bwd, (lambda solver, b, rev, ls=1.0:
                              solver.solve(b, reverse=rev,
                                           last_sub_scale=ls))
        if mode in ("auto", "paradiag") and n > 1:
            alpha = getattr(self, "_paradiag_alpha", None)
            if toeplitz:
                F_t, G_t = F_diag, G_diag
            elif toeplitz_factors is not None:
                F_t, G_t = toeplitz_factors
            else:
                F_t = G_t = None
            if F_t is not None:
                dc = getattr(self, "_paradiag_dc", 1)
                cyc = getattr(self, "_paradiag_cycles", 2)
                sm = getattr(self, "_mg_smooth", None)
                wdt = getattr(self, "_mg_weight_dtype", None)
                fwd = _ParaDiagSweep(space, mask, F_t, F_sub, n,
                                     alpha=alpha, defect_steps=dc,
                                     cycles=cyc, smooth=sm,
                                     weight_dtype=wdt,
                                     state=None if prebuilt is None
                                     else prebuilt["fwd"])
                bwd = _ParaDiagSweep(space, mask, G_t, G_sup, n,
                                     alpha=alpha, defect_steps=dc,
                                     cycles=cyc, smooth=sm,
                                     weight_dtype=wdt,
                                     state=None if prebuilt is None
                                     else prebuilt["bwd"])
                def _toep_sweep(solver, b, rev, ls=1.0):
                    if ls != 1.0:
                        raise ValueError("last_sub_scale needs row-"
                                         "resolved sweep factors")
                    return solver.solve(b, reverse=rev)
                return fwd, bwd, _toep_sweep
        if mode in ("paradiag", "auto"):
            mode = "scan"
        fwd = _SweepSolver(space, mask, F_diag, F_sub,
                           state=None if prebuilt is None
                           else prebuilt["fwd"])
        bwd = _SweepSolver(space, mask, G_diag, G_sup,
                           state=None if prebuilt is None
                           else prebuilt["bwd"])
        return fwd, bwd, self._sweep_fn(c, n, mode=mode)

    def set_schur_sweep(self, mode, steps=None, paradiag_alpha=None,
                        paradiag_defect_steps=None, paradiag_cycles=None,
                        smooth=None, weight_dtype=None):
        """Select the Schur substitution strategy ("scan" | "jacobi" |
        "paradiag" | "auto"), optionally fixing the Jacobi step count,
        the ParaDiag circulant parameter alpha, the number of ParaDiag
        defect-correction steps (default 1), the V-cycle count of the
        per-frequency solves (default 2), the (pre, post) Chebyshev
        smoothing step counts of the ParaDiag frequency V-cycles
        (default (8, 8)), or the storage dtype of the smoothing kernels'
        stencil-weight planes (e.g. "bfloat16"; field arithmetic stays in
        the solve dtype)."""
        self._schur_mode = mode
        self._schur_jacobi_steps = steps
        self._paradiag_alpha = paradiag_alpha
        if paradiag_defect_steps is not None:
            self._paradiag_dc = paradiag_defect_steps
        if paradiag_cycles is not None:
            self._paradiag_cycles = paradiag_cycles
        if smooth is not None:
            self._mg_smooth = (int(smooth[0]), int(smooth[1]))
        if weight_dtype is not None:
            self._mg_weight_dtype = str(weight_dtype)

    def set_mass_solver_steps(self, steps):
        """Chebyshev step count of the preconditioner's (1,1)-block mass
        solves (reference fixes 20, control/control.py:377-385; ~10-12
        usually holds the outer iteration count at half the cost)."""
        self._mass_cheb_steps = None if steps is None else int(steps)

    def set_epsilon(self, epsilon):
        """Backward-Euler final-time-block regularization parameter
        (the reference hardcodes epsilon = 1e-3, control/control.py:2836;
        the BE (1,1) block has a zero final diagonal block so the pc
        substitutes eps*tau*M for it).  None restores the default."""
        if self._CN and epsilon is not None:
            raise ValueError("epsilon applies to backward Euler only")
        if epsilon is None:
            self.__dict__.pop("_be_epsilon", None)
        else:
            eps = float(epsilon)
            if not 0.0 < eps <= 1.0:
                raise ValueError("epsilon must lie in (0, 1]")
            self._be_epsilon = eps

    def set_incompressible_execution(self, mode=None):
        """How the incompressible KKT solve executes on accelerators:
        "fused" -- the whole solve is ONE XLA program (fastest when it
        compiles: 75 s vs 165 s host-loop on the 16^2 x 16 TPU Stokes
        bench, 34 vs 35 iterations, and 203 s vs 390 s first call --
        the historical single-chip kernel fault no longer reproduces now
        that all pc state is passed as arguments; compile time still
        grows steeply with problem size); "host" -- the outer FGMRES
        runs on the host, dispatching separately-jitted operator/pc
        programs (bounded compile; the accelerator default); None --
        auto (host on accelerators, fused on CPU)."""
        if mode not in (None, "fused", "host"):
            raise ValueError(f"unknown incompressible execution {mode!r}")
        self._host_loop = None if mode is None else (mode == "host")

    def construct_pc(self, Multigrid, lambda_v_bounds, mask, Dv_A, M,
                     epsilon=None, prebuilt=None):
        """The reference's CN/BE block preconditioner
        (control/control.py:1943-2440), with the (1,1) mass solves batched
        over all time blocks and the Schur substitutions as lax.scan.

        The returned closure carries a ``.state`` pytree of every numeric
        array it derived (multigrid hierarchies, stencils, coarse
        inverses).  Passing that pytree back via ``prebuilt=`` rebuilds an
        identical pc without re-deriving the state -- solve kernels use
        this to trace the pc with host-CPU-built state as an argument."""
        n_t, tau, beta = self._n_t, self._tau, self._beta
        sp = self._space_v
        M_A = M.A
        solver_0 = mass_solver(M, mask, Multigrid, lambda_v_bounds,
                               state=None if prebuilt is None
                               else prebuilt["solver_0"],
                               steps=getattr(self, "_mass_cheb_steps",
                                             None))
        sh = Dv_A.shape[0] == 1

        def D(i):
            return Dv_A[0] if sh else Dv_A[i]

        def DT(i):
            return jnp.swapaxes(D(i), -1, -2)

        if self._CN:
            n = n_t - 1
            c = 0.5 * tau / beta ** 0.5
            # lower-bidiagonal action stacks (raw block_10)
            if sh:
                d10_diag = (0.5 * tau * D(0) + M_A)[None]
                d10_sub = (0.5 * tau * D(0) - M_A)[None]
            else:
                d10_diag = 0.5 * tau * Dv_A[1:n + 1] + M_A
                d10_sub = 0.5 * tau * Dv_A[1:n] - M_A
            # Schur sweep operators (+ cM)
            F_diag = d10_diag + c * M_A
            F_sub = d10_sub + c * M_A
            if sh:
                G_diag = (0.5 * tau * DT(0) + M_A + c * M_A)[None]
                G_sup = (0.5 * tau * DT(0) - M_A + c * M_A)[None]
            else:
                G_diag = (0.5 * tau
                          * jnp.swapaxes(Dv_A[:n], -1, -2) + M_A + c * M_A)
                G_sup = (0.5 * tau
                         * jnp.swapaxes(Dv_A[1:n], -1, -2) - M_A + c * M_A)
            fwd, bwd, sweep = self._make_sweeps(sp, mask, F_diag, F_sub,
                                                G_diag, G_sup, c, n,
                                                prebuilt=prebuilt)
            ap_diag = _fast_stack_applier(sp, d10_diag)
            ap_sub = _fast_stack_applier(sp, d10_sub)
            ap_M = _fast_stack_applier(sp, M_A[None])

            def pc_linear(b_0, b_1):
                # (1,1)-block: u0 = T2^{-1} (2/tau) M^{-1} T1^{-1} b0
                u_0 = apply_T_1_inv(b_0)
                u_0 = (2.0 / tau) * solver_0(u_0)
                u_0 = apply_T_2_inv(u_0)
                # b = block_10 u0 (rowwise bcs), T2, -b1, bcs, T2^{-1}
                b = ap_diag(u_0)
                sub = ap_sub(u_0[:-1])
                b = b.at[1:].add(sub)
                b = zero_rows(mask[None] if mask is not None else None, b)
                b = apply_T_2(b)
                b = b - b_1
                b = zero_rows(mask[None] if mask is not None else None, b)
                b = apply_T_2_inv(b)
                # forward substitution (L + cM)
                u_1 = sweep(fwd, b, False)
                u_1 = apply_T_2(u_1)
                # multiply 0.5 tau M
                b = 0.5 * tau * ap_M(u_1)
                b = zero_rows(mask[None] if mask is not None else None, b)
                # backward substitution (L^T + cM)
                u_1 = sweep(bwd, b, True)
                return u_0, u_1

            pc_linear.state = {"solver_0": solver_0.state,
                               "fwd": fwd.state, "bwd": bwd.state}
            return pc_linear

        # ---- backward Euler (reference control/control.py:2191-2438)
        n = n_t
        c = tau / beta ** 0.5
        eps = float(epsilon)
        dt = Dv_A.dtype
        # Schur diag shifts: forward [0, c, ..., c, sqrt(eps) c]
        s_f = jnp.concatenate([jnp.zeros((1,), dt),
                               jnp.full((n - 2,), c, dt),
                               jnp.full((1,), (eps ** 0.5) * c, dt)])
        s_b = s_f
        if sh:
            d10_diag = (tau * D(0) + M_A)[None]
            F_diag = d10_diag + s_f[:, None, None, None] * M_A
            G_diag = ((tau * DT(0) + M_A)[None]
                      + s_b[:, None, None, None] * M_A)
        else:
            d10_diag = tau * Dv_A + M_A
            F_diag = d10_diag + s_f[:, None, None, None] * M_A
            G_diag = (tau * jnp.swapaxes(Dv_A, -1, -2) + M_A
                      + s_b[:, None, None, None] * M_A)
        mM = (-M_A)[None]
        # A uniform-shift Toeplitz approximation of the BE factors was
        # measured to double the outer iterations and diverge at small
        # beta (the zero first-row shift matters); instead, for a
        # time-independent operator the first/last rows peel off into
        # exact single-block solves around an interior Toeplitz ParaDiag
        # (_BEParaDiagSweep).  Row-dependent D or tiny n: exact scan.
        fwd, bwd, sweep = self._make_sweeps(sp, mask, F_diag, mM,
                                            G_diag, mM, c, n,
                                            prebuilt=prebuilt,
                                            edge_rows=sh and n >= 3)
        ap_diag = _fast_stack_applier(sp, d10_diag)
        ap_sub = _fast_stack_applier(sp, mM)
        ap_M = _fast_stack_applier(sp, M_A[None])

        def pc_linear(b_0, b_1):
            # The reference amplifies the final (1,1) block by 1/eps = 1e3
            # and rescales by eps after the forward sweep
            # (control/control.py:2205-2206,2312,2348,2358).  Done
            # literally, every intermediate of the Schur chain carries the
            # 1e3 factor, and in f32 at flagship conditioning the rounding
            # noise it amplifies makes the pc useless (measured: total
            # outer-GMRES stagnation at 256^2 x 64, tools/tpu_results/
            # be_parity.json).  Conjugating the chain by
            # Sigma = diag(1, ..., 1, eps) over time blocks is
            # algebraically identical but keeps every intermediate O(1):
            #   b^  = (Sigma B Sigma^-1) u~0 - Sigma b_1,
            #   u^1 = (Sigma F Sigma^-1)^-1 b^   [= Sigma u_1],
            #   b2  = tau M u^1                  [= the eps-scaled rhs],
            # where u~0 is the UNAMPLIFIED mass solve and the conjugated
            # operators simply scale the sub-diagonal coupling into the
            # final row by eps (last_sub_scale).
            u_0 = (1.0 / tau) * solver_0(b_0)
            # b^ = block_10 u~0 - b1, final-row couplings eps-scaled
            b = ap_diag(u_0)
            sub = ap_sub(u_0[:-1])
            sub = sub.at[n - 2].multiply(eps)
            b = b.at[1:].add(sub)
            b = b - b_1.at[n - 1].multiply(eps)
            b = zero_rows(mask[None] if mask is not None else None, b)
            u_1 = sweep(fwd, b, False, eps)
            # multiply tau M; the final block is already eps-scaled
            b = tau * ap_M(u_1)
            b = zero_rows(mask[None] if mask is not None else None, b)
            u_1 = sweep(bwd, b, True)
            # the amplified final (1,1) output block, computed directly
            # from the benign mass solve (error ~ u * kappa(M) only)
            u_0 = u_0.at[n - 1].multiply(1.0 / eps)
            return u_0, u_1

        pc_linear.state = {"solver_0": solver_0.state,
                           "fwd": fwd.state, "bwd": bwd.state}
        return pc_linear

    # ------------------------------------------------------------ rhs build
    def _build_rhs(self, v_d, f, v_0, Dv_A, M, mask, inhom, bcs_v_help):
        """All-at-once rhs incl. initial-condition and inhomogeneous-bc
        lifts (reference control/control.py:2980-3243).  Returns stacked
        (b_0, b_1).  ``v_d``/``f`` None-ness mirrors check_v_d/check_f."""
        n_t, tau, beta = self._n_t, self._tau, self._beta
        sp = self._space_v
        dtype = sp.mesh.dtype
        M_A = M.A
        sh = Dv_A.shape[0] == 1

        def D_op(i):
            return LocalOp(Dv_A[0] if sh else Dv_A[i], sp, sp)

        def lift(i):
            return bc_lift_function(sp, bcs_v_help[i]).data

        mk = mask[None] if mask is not None else None

        if not self._CN:
            b_0 = jnp.zeros((n_t,) + sp.grid_shape, dtype)
            b_1 = jnp.zeros((n_t,) + sp.grid_shape, dtype)
            if v_d is not None:
                b_0 = v_d.data
            else:
                vd = self.construct_v_d()
                b_0 = tau * vd.data
                b_0 = b_0.at[n_t - 1].set(0.0)
                if inhom:
                    for i in range(n_t - 1):
                        b_0 = b_0.at[i].add(-tau * M.apply(lift(i)))
                b_0 = zero_rows(mk, b_0)
            if f is not None:
                b_1 = f.data
            else:
                ff = self.construct_f()
                b_1 = tau * ff.data
                D0 = self.construct_D_v(v_0, self._time_interval[0])
                b_1 = b_1.at[0].set(tau * D0.apply(v_0.data)
                                    + self._mass_apply(M, v_0.data))
                if inhom:
                    # row 0 uses the initial-state operator for the lift
                    # (reference control/control.py:3011-3026)
                    li0 = lift(0)
                    b_1 = b_1.at[0].add(
                        -(tau * D0.apply(li0) + M.apply(li0)))
                    for i in range(1, n_t):
                        li = lift(i)
                        b_1 = b_1.at[i].add(
                            -(tau * D_op(i).apply(li) + M.apply(li)))
                        b_1 = b_1.at[i].add(M.apply(lift(i - 1)))
                b_1 = zero_rows(mk, b_1)
            return b_0, b_1

        # Crank-Nicolson -- note the T1/T2 symmetrisation is applied
        # unconditionally, also to caller-supplied rhs
        # (reference control/control.py:3242-3243)
        n = n_t - 1
        if v_d is not None:
            b_0 = apply_T_1(v_d.data)
        else:
            vd = self.construct_v_d().data
            b_0 = 0.5 * tau * (vd[:-1] + vd[1:])
            if inhom:
                for i in range(n):
                    b_0 = b_0.at[i].add(-0.5 * tau
                                        * M.apply(lift(i + 1)))
                    if i > 0:
                        b_0 = b_0.at[i].add(-0.5 * tau
                                            * M.apply(lift(i)))
            b_0 = b_0.at[0].add(-0.5 * tau * M.apply(v_0.data))
            b_0 = zero_rows(mk, b_0)
            b_0 = apply_T_1(b_0)
        if f is not None:
            b_1 = apply_T_2(f.data)
        else:
            ff = self.construct_f().data
            b_1 = 0.5 * tau * (ff[:-1] + ff[1:])
            if inhom:
                for i in range(n):
                    li1 = lift(i + 1)
                    b_1 = b_1.at[i].add(
                        -(0.5 * tau * D_op(i + 1).apply(li1)
                          + M.apply(li1)))
                    if i > 0:
                        li = lift(i)
                        b_1 = b_1.at[i].add(
                            -(0.5 * tau * D_op(i).apply(li)
                              - M.apply(li)))
            D0 = self.construct_D_v(v_0, self._time_interval[0])
            b_1 = b_1.at[0].add(-(0.5 * tau * D0.apply(v_0.data)
                                  - M.apply(v_0.data)))
            b_1 = zero_rows(mk, b_1)
            b_1 = apply_T_2(b_1)
        return b_0, b_1

    @staticmethod
    def _mass_apply(M, x):
        return M.apply(x)

    # ---------------------------------------------------- iterative refinement
    def _iterative_refinement(self, kernel, P, Dv_A, pc_state, M, b_0,
                              b_1, u0, u1, info_d, steps, outer_sp,
                              n_blocks, full_ns, z_0, z_1):
        """Mixed-precision iterative refinement around the cached solve
        kernel: the true residual of the (nullspace-corrected) KKT system
        is evaluated in f64 on the host CPU, and each correction re-uses
        the same compiled accelerator executable with the residual as the
        rhs.  Classic Wilkinson refinement: the attainable accuracy is set
        by the residual precision (f64), not the solve precision (f32)."""
        from .common import run_kernel, run_iterative_refinement
        from ..solvers.block import _apply_per_block
        space_v = self._space_v
        dtype = space_v.mesh.dtype

        def build64():
            Dv64 = jnp.asarray(np.asarray(Dv_A)).astype(jnp.float64)
            M64 = LocalOp(jnp.asarray(np.asarray(M.A)).astype(
                jnp.float64), space_v, space_v)
            b00, b01, b10, b11, _ = self._blocks(Dv64, M=M64)
            system = MultiBlockSystem(
                space_v, space_v,
                block_00=b00, block_01=b01,
                block_10=b10, block_11=b11,
                n_blocks_00=n_blocks, n_blocks_11=n_blocks,
                nullspace_0=full_ns, nullspace_1=full_ns,
                CN=self._CN)
            bc0 = _apply_per_block(
                system.ns0, "correct_rhs",
                jnp.asarray(np.asarray(b_0)).astype(jnp.float64))
            bc1 = _apply_per_block(
                system.ns1, "correct_rhs",
                jnp.asarray(np.asarray(b_1)).astype(jnp.float64))

            def proj(a0, a1):
                return (_apply_per_block(system.ns0, "correct_rhs", a0),
                        _apply_per_block(system.ns1, "correct_rhs", a1))

            return system.mult, bc0, bc1, proj

        def solve_fn(r0, r1):
            if P is None:
                return run_kernel(kernel, Dv_A, pc_state, r0, r1, z_0, z_1)
            return run_kernel(kernel, Dv_A, r0, r1, z_0, z_1)

        x0, x1, info = run_iterative_refinement(
            build64, solve_fn, u0, u1, info_d["iterations"], steps,
            outer_sp, dtype)
        return (jnp.asarray(x0.astype(dtype)), jnp.asarray(x1.astype(dtype)),
                info)

    # ------------------------------------------------------------ linear solve
    def linear_solve(self, *, P=None, solver_parameters=None,
                     Multigrid=False, lambda_v_bounds=None, v_d=None,
                     f=None, print_error=True, create_output=True,
                     plots=False):
        """All-at-once KKT solve (reference control/control.py:2820-3375)."""
        from contextlib import ExitStack
        from .common import host_setup
        _hs = ExitStack()
        _hs.enter_context(host_setup())
        space_v = self._space_v
        n_t, tau, beta = self._n_t, self._tau, self._beta
        epsilon = (None if self._CN
                   else getattr(self, "_be_epsilon", 1.0e-3))

        inhom = any(not bc.is_homogeneous
                    for i in self._bcs_v for bc in self._bcs_v[i])
        bcs_v = (homogenize(self._bcs_v[1]) if inhom
                 else self._bcs_v[1])
        mask = combine_masks(space_v, bcs_v) if bcs_v else None
        nullspace = (DirichletBCNullspace(bcs_v) if bcs_v
                     else NoneNullspace())
        n_blocks = n_t if not self._CN else n_t - 1
        full_ns = tuple(nullspace for _ in range(n_blocks))

        v_0 = self._initial_state()
        Dv_A = self._D_stack(self._v.data)
        M = assemble(self._M_v)

        internal_rhs = v_d is None and f is None
        b_0, b_1 = self._build_rhs(v_d, f, v_0, Dv_A, M, mask, inhom,
                                   self._bcs_v)

        if solver_parameters is None:
            solver_parameters = {"linear_solver": "gmres",
                                 "gmres_restart": 10,
                                 "maximum_iterations": 50,
                                 "relative_tolerance": 1.0e-6,
                                 "absolute_tolerance": 0.0,
                                 "monitor_convergence": print_error}

        # mixed-precision iterative refinement (TPU extension, no reference
        # equivalent): "iterative_refinement": k runs the Krylov solve in
        # the accelerator dtype at an attainable inner tolerance
        # ("refinement_inner_tolerance", default 1e-6) and corrects with up
        # to k f64 true-residual steps on the host CPU -- tolerances below
        # the f32 rounding floor at f32 speed
        from .common import pop_refinement_params
        solver_parameters, outer_sp, ir_steps = pop_refinement_params(
            solver_parameters)

        # cached end-to-end kernel: block construction, preconditioner
        # build and the Krylov loop are all traced as a function of the
        # linearisation state Dv_A, so Picard / Gauss-Newton iterations and
        # repeated same-shape solves reuse one compiled executable
        from .common import (array_token, params_token, run_kernel,
                             device_zeros_like)
        from ..solvers.block import finalize_solve_info
        key = ("linear", self._n_t, self._CN, self._beta,
               self._time_interval, Multigrid,
               None if lambda_v_bounds is None else tuple(lambda_v_bounds),
               array_token(mask), params_token(solver_parameters),
               getattr(self, "_schur_mode", "scan"),
               getattr(self, "_schur_jacobi_steps", None),
               getattr(self, "_paradiag_alpha", None),
               getattr(self, "_paradiag_dc", 1),
               getattr(self, "_paradiag_cycles", 2),
               getattr(self, "_mg_smooth", None),
               getattr(self, "_mg_weight_dtype", None),
               getattr(self, "_mass_cheb_steps", None),
               getattr(self, "_be_epsilon", 1.0e-3),
               None if P is None else id(P), id(space_v))

        def builder():
            sp_params = dict(solver_parameters)

            def solve_with(Dv_A, pc_state, b_0, b_1, u_0, u_1):
                M_t = LocalOp(M.A, space_v, space_v)
                b00, b01, b10, b11, _ = self._blocks(Dv_A, M=M_t)
                pc_fn = (self.construct_pc(Multigrid, lambda_v_bounds,
                                           mask, Dv_A, M_t,
                                           epsilon=epsilon,
                                           prebuilt=pc_state)
                         if P is None else P)
                system = MultiBlockSystem(
                    space_v, space_v,
                    block_00=b00, block_01=b01,
                    block_10=b10, block_11=b11,
                    n_blocks_00=n_blocks, n_blocks_11=n_blocks,
                    nullspace_0=full_ns, nullspace_1=full_ns,
                    CN=self._CN)
                # BE: run the Krylov iteration on the similarity-
                # transformed system whose final state-block unknown is
                # scaled by eps -- the built-in pc legitimately amplifies
                # that block by 1/eps (reference control/control.py:
                # 2205-2206), which makes f32 Krylov vectors span ~8
                # orders of magnitude and buries every other component
                # below the f32 rounding floor (measured: total outer
                # stagnation at 256^2 x 64).  The transform leaves the
                # preconditioned spectrum unchanged.
                uscale = None
                if not self._CN and P is None:
                    s0 = jnp.ones((n_blocks,), space_v.mesh.dtype)
                    s0 = s0.at[n_blocks - 1].set(1.0 / epsilon)
                    uscale = (s0, None)
                solve = system.solve_fn(solver_parameters=sp_params,
                                        pc_fn=pc_fn,
                                        unknown_scale=uscale)
                return solve(u_0, u_1, b_0, b_1)

            if P is not None:
                return lambda Dv_A, b_0, b_1, u_0, u_1: solve_with(
                    Dv_A, None, b_0, b_1, u_0, u_1)
            return solve_with

        # pc numeric state (hierarchies, stencils, coarse inverses) is
        # derived eagerly on the HOST and passed to the kernel as an
        # ARGUMENT: in-trace derivation on TPU both bakes it into the
        # executable as huge constants (the axon AOT proto overflows) and
        # loses accuracy (the f32 TPU dense coarse inverse is amplified
        # 1/alpha by the ParaDiag unscaling, stalling the outer solve)
        pc_state = None
        if P is None:
            # cached per linearisation state: repeat solves (and the
            # common Picard pattern of a final re-solve at the converged
            # state) skip the host hierarchy rebuild
            if not hasattr(self, "_pc_state_cache"):
                self._pc_state_cache = {}
            tok = (key, array_token(Dv_A))
            pc_state = self._pc_state_cache.get(tok)
            if pc_state is None:
                if len(self._pc_state_cache) > 4:
                    self._pc_state_cache.clear()
                from .common import to_device
                pc_state = to_device(
                    self.construct_pc(Multigrid, lambda_v_bounds,
                                      mask, Dv_A, M,
                                      epsilon=epsilon).state)
                self._pc_state_cache[tok] = pc_state
        kernel = self._kernel_cache.get(key, builder,
                                        pin=(P, space_v, M))
        _hs.close()
        # zero initial guesses as ARGUMENTS: in-trace zero constants make
        # XLA constant-fold whole operator applications at compile time
        z_0, z_1 = device_zeros_like(b_0), device_zeros_like(b_1)
        if P is None:
            u0, u1, info_d = run_kernel(kernel, Dv_A, pc_state, b_0, b_1,
                                        z_0, z_1)
        else:
            u0, u1, info_d = run_kernel(kernel, Dv_A, b_0, b_1, z_0, z_1)
        if ir_steps:
            u0, u1, info = self._iterative_refinement(
                kernel, P, Dv_A, pc_state, M, b_0, b_1, u0, u1, info_d,
                ir_steps, outer_sp, n_blocks, full_ns, z_0, z_1)
        else:
            info = finalize_solve_info(info_d, solver_parameters)
        v = MixedFunction(space_v, n_blocks, name="v", data=u0)
        zeta = MixedFunction(space_v, n_blocks, name="zeta", data=u1)
        self.last_solve_info = info

        if self._CN:
            v_new = MixedFunction(space_v, n_t, name="v_new")
            zeta_new = MixedFunction(space_v, n_t, name="zeta_new")
            if internal_rhs:
                v_new.sub(0).assign(v_0)
            v_new.data = v_new.data.at[1:].set(v.data)
            zeta_new.data = zeta_new.data.at[:-1].set(zeta.data)
            self.set_v(v_new)
            self.set_zeta(zeta_new)
        else:
            self.set_v(v)
            self.set_zeta(zeta)

        if print_error:
            self.print_error(tau)
        if create_output:
            _io.write_time_series("v", self._v, self._times())
            _io.write_time_series("zeta", self._zeta, self._times())
        if plots:
            _io.plot_fields(v=Function(space_v, data=self._v.data[-1]))
        return info

    # --------------------------------------------------------- nonlinear loop
    def non_linear_res_eval(self, v_old, zeta_old, v_0, v_d, f, mask_v,
                            mask_zeta):
        """All-at-once KKT residual at (v_old, zeta_old)
        (reference control/control.py:2442-2818), vectorised over time."""
        n_t, tau, beta = self._n_t, self._tau, self._beta
        sp = self._space_v
        M = assemble(self._M_v)
        Dv_A = self._D_stack(v_old.data)
        DT_A = jnp.swapaxes(Dv_A, -1, -2)
        Nv = self._residual_stack(v_old.data)      # N(v_i)
        vd = v_d.data
        ff = f.data
        vdat = v_old.data
        zdat = zeta_old.data
        Mz = _stack_apply(sp, sp, M.A[None], zdat)
        Mv = _stack_apply(sp, sp, M.A[None], vdat)
        mkv = mask_v[None] if mask_v is not None else None
        mkz = mask_zeta[None] if mask_zeta is not None else None

        if not self._CN:
            DTz = _stack_apply(sp, sp, DT_A, zdat)
            rhs_0 = tau * vd - tau * Mv - (tau * DTz + Mz)
            rhs_0 = rhs_0.at[:-1].add(Mz[1:])
            rhs_0 = rhs_0.at[n_t - 1].set(-(tau * DTz[n_t - 1]
                                            + Mz[n_t - 1]))
            rhs_0 = zero_rows(mkz, rhs_0)

            rhs_1 = tau * ff - (tau * Nv + Mv) + (tau / beta) * Mz
            rhs_1 = rhs_1.at[1:].add(Mv[:-1])
            D0 = self.construct_D_v(v_0, self._time_interval[0])
            r0 = (tau * D0.apply(v_0.data) + M.apply(v_0.data)
                  - (tau * Nv[0] + Mv[0]))
            rhs_1 = rhs_1.at[0].set(r0)
            rhs_1 = zero_rows(mkv, rhs_1)
            return rhs_0, rhs_1

        n = n_t - 1
        DTz = _stack_apply(sp, sp, DT_A, zdat)
        # rhs_0[i] = 0.5 tau (vd_i + vd_{i+1}) - 0.5 tau M(v_i + v_{i+1})
        #            - (0.5 tau DT_i zeta_i + M zeta_i)
        #            - (0.5 tau DT_{i+1} zeta_{i+1} - M zeta_{i+1})
        rhs_0 = (0.5 * tau * (vd[:-1] + vd[1:])
                 - 0.5 * tau * (Mv[:-1] + Mv[1:])
                 - (0.5 * tau * DTz[:-1] + Mz[:-1])
                 - (0.5 * tau * DTz[1:] - Mz[1:]))
        rhs_0 = zero_rows(mkz, rhs_0)
        # rhs_1[i] = 0.5 tau (f_i + f_{i+1}) - (0.5 tau N(v_i) - M v_i)
        #            - (0.5 tau N(v_{i+1}) + M v_{i+1})
        #            + 0.5 (tau/beta) M (zeta_i + zeta_{i+1})
        rhs_1 = (0.5 * tau * (ff[:-1] + ff[1:])
                 - (0.5 * tau * Nv[:-1] - Mv[:-1])
                 - (0.5 * tau * Nv[1:] + Mv[1:])
                 + 0.5 * (tau / beta) * (Mz[:-1] + Mz[1:]))
        rhs_1 = zero_rows(mkv, rhs_1)
        return rhs_0, rhs_1

    def non_linear_solve(self, *, P=None, solver_parameters=None,
                         Multigrid=False, lambda_v_bounds=None,
                         max_non_linear_iter=10,
                         relative_non_linear_tol=10.0**-5,
                         absolute_non_linear_tol=10.0**-8,
                         print_error_linear=False,
                         print_error_non_linear=True,
                         create_output=True, plots=False):
        """Picard / Gauss-Newton outer loop
        (reference control/control.py:3377-3590)."""
        from contextlib import ExitStack
        from .common import host_setup
        _hs = ExitStack()
        _hs.enter_context(host_setup())
        space_v = self._space_v
        n_t, tau = self._n_t, self._tau

        inhom = any(not bc.is_homogeneous
                    for i in self._bcs_v for bc in self._bcs_v[i])
        bcs_v = (homogenize(self._bcs_v[1]) if inhom
                 else self._bcs_v[1])
        mask = combine_masks(space_v, bcs_v) if bcs_v else None

        v_old = MixedFunction(space_v, n_t, data=self._v.data)
        zeta_old = MixedFunction(space_v, n_t, data=self._zeta.data)
        v_0 = self._initial_state()
        if self._CN:
            v_old.sub(0).assign(v_0)
        zeta_old.sub(n_t - 1).assign(0.0)

        f = self.construct_f()
        v_d = self.construct_v_d()

        def res():
            return self.non_linear_res_eval(v_old, zeta_old, v_0, v_d, f,
                                            mask, mask)

        rhs_0, rhs_1 = res()

        def _norm(a, b):
            return float(jnp.sqrt(jnp.vdot(a, a) + jnp.vdot(b, b)))

        norm_0 = _norm(rhs_0, rhs_1)
        norm_k = norm_0
        k = 0
        print(f"Initial non-linear residual: {norm_0:.16e}")

        nb = n_t if not self._CN else n_t - 1
        while (norm_k > relative_non_linear_tol * norm_0
               and norm_k > absolute_non_linear_tol):
            rhs0_m = MixedFunction(space_v, nb, data=rhs_0, dual=True)
            rhs1_m = MixedFunction(space_v, nb, data=rhs_1, dual=True)
            self.linear_solve(P=P, solver_parameters=solver_parameters,
                              Multigrid=Multigrid,
                              lambda_v_bounds=lambda_v_bounds,
                              v_d=rhs0_m, f=rhs1_m,
                              print_error=print_error_linear,
                              create_output=False, plots=False)
            v_old.data = v_old.data + self._v.data
            if inhom:
                for i in range(n_t):
                    for bc in self._bcs_v[i]:
                        bc.apply(v_old.sub(i))
            zeta_old.data = zeta_old.data + self._zeta.data
            if mask is not None:
                zeta_old.data = jnp.where(mask[None], 0.0, zeta_old.data)
            self.set_v(v_old)
            self.set_zeta(zeta_old)
            v_old.data = self._v.data
            zeta_old.data = self._zeta.data

            rhs_0, rhs_1 = res()
            norm_k = _norm(rhs_0, rhs_1)
            k += 1
            print(f"Non-linear solver: iteration {k:d}, "
                  f"non-linear residual norm {norm_k:.16e}")
            if k + 1 > max_non_linear_iter:
                break

        _hs.close()
        if print_error_non_linear:
            if (norm_k < relative_non_linear_tol * norm_0
                    or norm_k < absolute_non_linear_tol):
                print(f"Relative non-linear residual: {norm_k / norm_0:.16e}")
                print(f"Absolute non-linear residual: {norm_k:.16e}")
                print(f"Number of non-linear iterations: {k:d}")
            else:
                print("The non-linear iteration did not converge")
                print(f"Relative non-linear residual: {norm_k / norm_0:.16e}")
                print(f"Absolute non-linear residual: {norm_k:.16e}")
            self.print_error(tau)

        if create_output:
            _io.write_time_series("v", self._v, self._times())
            _io.write_time_series("zeta", self._zeta, self._times())
        if plots:
            _io.plot_fields(v=Function(space_v, data=self._v.data[-1]))

    # =====================================================================
    # incompressible (Stokes / Navier-Stokes) variants
    # =====================================================================
    def _D_p_stack(self, v_old_data):
        """Pressure-space analogue of the forward operator (for the Schur
        approximation; reference control/control.py:3786-3789).  Picard
        assembles the form on pressure trial/test; Gauss-Newton linearises
        the pressure-space form in its trial slot with the velocity
        coefficient held fixed (see common.trial_linearized_operator)."""
        from .common import trial_linearized_operator
        sp_p = self._space_p
        p_trial, p_test = TrialFunction(sp_p), TestFunction(sp_p)
        dep_v, dep_t = _probe_form_dependence(
            self._forward_form, sp_p, self._space_v,
            (self._time_interval[0],
             self._time_interval[0]
             + 0.618 * (self._time_interval[1] - self._time_interval[0])))

        def one(vdata, t):
            vf = Function(self._space_v, data=vdata)
            if not self._Gauss_Newton:
                return assemble(self._forward_form(p_trial, p_test, vf,
                                                   Constant(t))).A
            return trial_linearized_operator(
                self._forward_form, sp_p, vf,
                extra_args=(Constant(t),)).A

        if not dep_v and not dep_t:
            return one(jnp.zeros_like(v_old_data[0]),
                       float(self._time_interval[0]))[None]
        times = jnp.asarray(self._times(), sp_p.mesh.dtype)
        return jax.vmap(one)(v_old_data, times)

    def _divfree_project_initial(self, v_0, B, B_T, M, mask,
                                 lambda_v_bounds):
        """M-orthogonal projection of the initial state onto the discrete
        divergence-free manifold, through bc-preserving updates:

            w = v_0 - Minv B_0^T q,    (B Minv B_0^T) q = B v_0

        with Minv a fixed (Chebyshev) approximate mass inverse restricted
        to non-Dirichlet rows -- B w then equals the Krylov residual of
        the q-solve regardless of Minv's accuracy.

        Crank-Nicolson (trapezoid) time stepping is not stiffly accurate,
        so index-2 constraint inconsistency in the initial data (nodal
        interpolants of continuously divergence-free fields are NOT
        discretely divergence-free, B v_0 = O(h^k)) pollutes the error
        measured against the continuum solution.  Projecting restores
        consistent initial data.  Note this does NOT recover O(tau^2) for
        time-varying operators D(t): that order reduction is a property
        of the discretize-then-optimize trapezoid scheme for the index-2
        DAE itself (see tests/test_nse_mms.py), which the reference
        inherits (its CN convergence tests print orders without asserting
        them, test/test_control.py:5093-5107).

        OPT-IN (``ctl._divfree_initial = True``): exact-solution tests
        manufacture their rhs from the unprojected v_0, so the default
        must leave the data untouched."""
        if not getattr(self, "_divfree_initial", False) or not self._CN:
            return v_0
        from ..solvers import krylov
        from .common import mass_solver, array_token
        tok = (array_token(v_0.data), id(B))
        cached = getattr(self, "_divfree_cache", None)
        if cached is not None and cached[0] == tok:
            return cached[1]

        minv = mass_solver(M, mask, False, lambda_v_bounds)

        def dropmean(q):
            return q - jnp.mean(q)

        def S(q):
            y = zero_rows(mask, B_T.apply(q))
            return dropmean(B.apply(zero_rows(mask, minv(y[None])[0])))

        rhs = dropmean(B.apply(v_0.data))
        q, info = krylov.gmres(S, rhs, restart=50, rtol=1e-12,
                               atol=0.0, maxiter=500)
        w = Function(self._space_v,
                     data=v_0.data - zero_rows(
                         mask, minv(zero_rows(mask,
                                              B_T.apply(q))[None])[0]))
        self._divfree_cache = (tok, w)
        return w

    def _incompressible_blocks(self, Dv_A, B, B_T, M=None):
        """The 2n x 2n velocity-KKT + divergence block dicts
        (reference control/control.py:3750-3957)."""
        n_t, tau, beta = self._n_t, self._tau, self._beta
        sp = self._space_v
        if M is None:
            M = assemble(self._M_v)
        M_A = M.A
        sh = Dv_A.shape[0] == 1

        def D(i):
            return Dv_A[0] if sh else Dv_A[i]

        def op(A):
            return LocalOp(A, sp, sp)

        block_00 = {}
        n = n_t if not self._CN else n_t - 1
        if not self._CN:
            tM = op(tau * M_A)
            mM = op(-M_A)
            tbM = op(-(tau / beta) * M_A)
            d01 = (op(tau * jnp.swapaxes(D(0), -1, -2) + M_A) if sh
                   else None)
            d10 = op(tau * D(0) + M_A) if sh else None
            for i in range(n_t):
                if i < n_t - 1:
                    block_00[(i, i)] = tM
                block_00[(i, n + i)] = d01 or op(
                    tau * jnp.swapaxes(D(i), -1, -2) + M_A)
                block_00[(n + i, i)] = d10 or op(tau * D(i) + M_A)
                if i < n_t - 1:
                    block_00[(i, n + i + 1)] = mM
                if i >= 1:
                    block_00[(n + i, i - 1)] = mM
                    block_00[(n + i, n + i)] = tbM
        else:
            hM = op(0.5 * tau * M_A)
            hbM = op(-0.5 * (tau / beta) * M_A)
            d01 = (op(0.5 * tau * jnp.swapaxes(D(0), -1, -2) + M_A) if sh
                   else None)
            d01m = (op(0.5 * tau * jnp.swapaxes(D(0), -1, -2) - M_A) if sh
                    else None)
            d10 = op(0.5 * tau * D(0) + M_A) if sh else None
            d10m = op(0.5 * tau * D(0) - M_A) if sh else None
            for i in range(n):
                block_00[(i, i)] = hM
                if i >= 1:
                    block_00[(i, i - 1)] = hM
                block_00[(i, n + i)] = d01 or op(
                    0.5 * tau * jnp.swapaxes(D(i), -1, -2) + M_A)
                if i < n - 1:
                    block_00[(i, n + i + 1)] = d01m or op(
                        0.5 * tau * jnp.swapaxes(D(i + 1), -1, -2) - M_A)
                block_00[(n + i, i)] = d10 or op(
                    0.5 * tau * D(i + 1) + M_A)
                if i >= 1:
                    block_00[(n + i, i - 1)] = d10m or op(
                        0.5 * tau * D(i) - M_A)
                block_00[(n + i, n + i)] = hbM
                if i < n - 1:
                    block_00[(n + i, n + i + 1)] = hbM

        tB = tau * B
        tBT = tau * B_T
        block_01 = {(i, i): tBT for i in range(2 * n)}
        block_10 = {(i, i): tB for i in range(2 * n)}
        return block_00, block_01, block_10, {}, M

    def _p_kkt_dicts(self, Dp_A):
        """Pressure-space space-time KKT dicts for the Schur approximation
        (reference control/control.py:3722-3957)."""
        n_t, tau, beta = self._n_t, self._tau, self._beta
        sp = self._space_p
        p_trial, p_test = TrialFunction(sp), TestFunction(sp)
        M_p = assemble(self._M_p if self._M_p is not None
                       else inner(p_trial, p_test) * dx)
        Mp_A = M_p.A
        sh = Dp_A.shape[0] == 1

        def D(i):
            return Dp_A[0] if sh else Dp_A[i]

        def op(A):
            return LocalOp(A, sp, sp)

        b00, b01, b10, b11 = {}, {}, {}, {}
        if not self._CN:
            tM = op(tau * Mp_A)
            mM = op(-Mp_A)
            tbM = op(-(tau / beta) * Mp_A)
            d01 = (op(tau * jnp.swapaxes(D(0), -1, -2) + Mp_A) if sh
                   else None)
            d10 = op(tau * D(0) + Mp_A) if sh else None
            for i in range(n_t):
                if i < n_t - 1:
                    b00[(i, i)] = tM
                b01[(i, i)] = d01 or op(
                    tau * jnp.swapaxes(D(i), -1, -2) + Mp_A)
                b10[(i, i)] = d10 or op(tau * D(i) + Mp_A)
                if i < n_t - 1:
                    b01[(i, i + 1)] = mM
                if i >= 1:
                    b10[(i, i - 1)] = mM
                    b11[(i, i)] = tbM
        else:
            n = n_t - 1
            hM = op(0.5 * tau * Mp_A)
            hbM = op(-0.5 * (tau / beta) * Mp_A)
            d01 = (op(0.5 * tau * jnp.swapaxes(D(0), -1, -2) + Mp_A) if sh
                   else None)
            d01m = (op(0.5 * tau * jnp.swapaxes(D(0), -1, -2) - Mp_A) if sh
                    else None)
            d10 = op(0.5 * tau * D(0) + Mp_A) if sh else None
            d10m = op(0.5 * tau * D(0) - Mp_A) if sh else None
            for i in range(n):
                b00[(i, i)] = hM
                if i >= 1:
                    b00[(i, i - 1)] = hM
                b01[(i, i)] = d01 or op(
                    0.5 * tau * jnp.swapaxes(D(i), -1, -2) + Mp_A)
                if i < n - 1:
                    b01[(i, i + 1)] = d01m or op(
                        0.5 * tau * jnp.swapaxes(D(i + 1), -1, -2) - Mp_A)
                b10[(i, i)] = d10 or op(0.5 * tau * D(i + 1) + Mp_A)
                if i >= 1:
                    b10[(i, i - 1)] = d10m or op(0.5 * tau * D(i) - Mp_A)
                b11[(i, i)] = hbM
                if i < n - 1:
                    b11[(i, i + 1)] = hbM
        return b00, b01, b10, b11, M_p

    def incompressible_linear_solve(self, nullspace_p, *, space_p=None,
                                    P=None, solver_parameters=None,
                                    Multigrid=False, lambda_v_bounds=None,
                                    lambda_p_bounds=None, v_d=None, f=None,
                                    div_v=None, div_zeta=None,
                                    print_error=True, create_output=True,
                                    plots=False, _return_pieces=False):
        """Space-time Stokes/Navier-Stokes KKT solve with the nested
        preconditioner (reference control/control.py:3592-4884): inner
        fixed-5-iteration GMRES on the full space-time velocity KKT plus a
        per-time-block pressure Schur K_p^{-1} (KKT_p) M_p^{-1} with 1/tau^2
        scaling and T sandwiches.

        ``_return_pieces``: internal -- skip execution and return
        ``(system, pc_fn, b_0, b_1)`` so callers (the multichip dryrun,
        sharding tests) can jit ``system.solve_fn(pc_fn=pc_fn)`` over a
        device mesh with explicitly sharded operands."""
        from contextlib import ExitStack
        from ..solvers.block import BlockAction
        from .common import BlockSolver, host_setup
        _hs = ExitStack()
        _hs.enter_context(host_setup())
        space_v = self._space_v
        if space_p is None:
            if self._space_p is None:
                raise ValueError("Undefined space_p")
            space_p = self._space_p
        else:
            self.set_space_p(space_p)

        n_t, tau, beta = self._n_t, self._tau, self._beta
        epsilon = (None if self._CN
                   else getattr(self, "_be_epsilon", 1.0e-3))
        n = n_t if not self._CN else n_t - 1

        inhom = any(not bc.is_homogeneous
                    for i in self._bcs_v for bc in self._bcs_v[i])
        bcs_v = (homogenize(self._bcs_v[1]) if inhom
                 else self._bcs_v[1])
        mask = combine_masks(space_v, bcs_v) if bcs_v else None
        nullspace_v = (DirichletBCNullspace(bcs_v) if bcs_v
                       else NoneNullspace())
        full_ns_0 = tuple(nullspace_v for _ in range(2 * n))
        full_ns_1 = tuple(nullspace_p for _ in range(2 * n))

        v_0 = self._initial_state()
        Dv_A = self._D_stack(self._v.data)

        v_trial, v_test = TrialFunction(space_v), TestFunction(space_v)
        p_trial, p_test = TrialFunction(space_p), TestFunction(space_p)
        B = assemble(-inner(div(v_trial), p_test) * dx)
        B_T = assemble(-inner(p_trial, div(v_test)) * dx)

        M = assemble(self._M_v)
        v_0 = self._divfree_project_initial(v_0, B, B_T, M, mask,
                                            lambda_v_bounds)

        # rhs: velocity part reuses the compressible construction
        b_0_0, b_0_1 = self._build_rhs(v_d, f, v_0, Dv_A, M, mask, inhom,
                                       self._bcs_v)
        dtype = space_v.mesh.dtype
        if div_v is not None:
            b_1_0 = div_v.data if hasattr(div_v, "data") else div_v
        else:
            b_1_0 = jnp.zeros((n,) + space_p.grid_shape, dtype)
            if inhom:
                for i in range(n):
                    bi = i if not self._CN else i + 1
                    li = bc_lift_function(space_v, self._bcs_v[bi]).data
                    b_1_0 = b_1_0.at[i].add(-tau * B.apply(li))
        if div_zeta is not None:
            b_1_1 = div_zeta.data if hasattr(div_zeta, "data") else div_zeta
        else:
            b_1_1 = jnp.zeros((n,) + space_p.grid_shape, dtype)
        if self._CN:
            b_1_0 = apply_T_2(b_1_0)
            b_1_1 = apply_T_1(b_1_1)
        b_0 = jnp.concatenate([b_0_0, b_0_1])
        b_1 = jnp.concatenate([b_1_0, b_1_1])

        if solver_parameters is None:
            solver_parameters = {"linear_solver": "fgmres",
                                 "fgmres_restart": 10,
                                 "maximum_iterations": 100,
                                 "relative_tolerance": 1.0e-6,
                                 "absolute_tolerance": 0.0,
                                 "monitor_convergence": print_error}

        Dp_A = self._D_p_stack(self._v.data) if P is None else None

        # mixed-precision iterative refinement (see linear_solve /
        # common.run_iterative_refinement); on TPU this is how the
        # incompressible f32 host-loop solves certify f64-level residuals
        from .common import pop_refinement_params
        solver_parameters, outer_sp, ir_steps = pop_refinement_params(
            solver_parameters)

        from .common import (array_token, params_token, run_kernel,
                             device_zeros_like)
        from ..solvers.block import finalize_solve_info
        key = ("incompressible", self._n_t, self._CN, self._beta,
               self._time_interval, Multigrid,
               None if lambda_v_bounds is None else tuple(lambda_v_bounds),
               None if lambda_p_bounds is None else tuple(lambda_p_bounds),
               array_token(mask), params_token(solver_parameters),
               getattr(self, "_schur_mode", "scan"),
               getattr(self, "_schur_jacobi_steps", None),
               getattr(self, "_paradiag_alpha", None),
               getattr(self, "_paradiag_dc", 1),
               getattr(self, "_paradiag_cycles", 2),
               getattr(self, "_mg_smooth", None),
               getattr(self, "_mg_weight_dtype", None),
               getattr(self, "_mass_cheb_steps", None),
               getattr(self, "_be_epsilon", 1.0e-3),
               getattr(self, "_inner_pc_iterations",
                       5 if self._CN else 15),
               None if P is None else id(P), id(nullspace_p),
               id(space_v), id(space_p))

        def make_pieces(Dv_A, Dp_A, M_t, pc_state=None):
            b00, b01, b10, b11, _ = self._incompressible_blocks(
                Dv_A, B, B_T, M=M_t)
            system = MultiBlockSystem(
                space_v, space_p,
                block_00=b00, block_01=b01,
                block_10=b10, block_11=b11,
                n_blocks_00=2 * n, n_blocks_11=2 * n,
                sub_n_blocks_00_0=(n if self._CN else None),
                sub_n_blocks_11_0=(n if self._CN else None),
                nullspace_0=full_ns_0, nullspace_1=full_ns_1,
                CN=self._CN)

            if P is not None:
                return system, P
            # inner velocity-KKT system (compressible blocks)
            i00, i01, i10, i11, _ = self._blocks(Dv_A, M=M_t)
            inner_system = MultiBlockSystem(
                space_v, space_v,
                block_00=i00, block_01=i01, block_10=i10,
                block_11=i11,
                n_blocks_00=n, n_blocks_11=n,
                nullspace_0=tuple(nullspace_v for _ in range(n)),
                nullspace_1=tuple(nullspace_v for _ in range(n)),
                CN=self._CN)
            inner_pc = self.construct_pc(
                Multigrid, lambda_v_bounds, mask, Dv_A, M_t,
                epsilon=epsilon,
                prebuilt=None if pc_state is None else pc_state["inner"])
            # the reference fixes 5 inner iterations
            # (control/control.py:4355-4361); for BE that leaves the
            # eps-regularised final-block error modes unresolved and the
            # outer FGMRES stagnates (the reference's own BE recipe has
            # this defect -- its upstream BE test is unrunnable).  15
            # iterations restore CN-level outer convergence; measured
            # sharp threshold at ~15 on the Stokes exact-solution
            # configuration.
            inner_default = 5 if self._CN else 15
            inner_its = getattr(self, "_inner_pc_iterations",
                                inner_default)
            inner_solve = inner_system.solve_fn(
                solver_parameters={"preconditioner": True,
                                   "linear_solver": "gmres",
                                   "maximum_iterations": inner_its,
                                   "relative_tolerance": 0.0,
                                   "absolute_tolerance": 0.0,
                                   "gmres_restart": 30},
                pc_fn=inner_pc)

            p00, p01, p10, p11, M_p = self._p_kkt_dicts(Dp_A)
            from .common import regularized_stiffness
            K_p = regularized_stiffness(
                assemble(inner(grad(p_trial), grad(p_test)) * dx), M_p)
            solver_K_p = BlockSolver(K_p, None, ("mg", 1),
                                     state=None if pc_state is None
                                     else pc_state["K_p"])
            solver_M_p = mass_solver(M_p, None, False, lambda_p_bounds,
                                     state=None if pc_state is None
                                     else pc_state["M_p"],
                                     steps=getattr(self,
                                                   "_mass_cheb_steps",
                                                   None))
            act_00 = BlockAction(p00, n, n, space_p, space_p)
            act_01 = BlockAction(p01, n, n, space_p, space_p)
            act_10 = BlockAction(p10, n, n, space_p, space_p)
            act_11 = BlockAction(p11, n, n, space_p, space_p)

            def pc_fn(b_0, b_1):
                z = jnp.zeros((n,) + space_v.grid_shape, dtype)
                u0v, u0z, _ = inner_solve(z, z, b_0[:n], b_0[n:])
                u_0 = jnp.concatenate([u0v, u0z])
                # pressure Schur: 1/tau^2 scaling + T sandwiches
                b0h = tau * B.apply(u0v)
                b1h = tau * B.apply(u0z)
                if self._CN:
                    b0h = apply_T_2(b0h)
                    b1h = apply_T_1(b1h)
                b0h = (b0h - b_1[:n]) / tau ** 2
                b1h = (b1h - b_1[n:]) / tau ** 2
                if self._CN:
                    b0h = apply_T_2_inv(b0h)
                    b1h = apply_T_1_inv(b1h)
                # K_p / M_p are time-independent, so the (mu, p) pair and
                # all time blocks solve as ONE batched V-cycle / Chebyshev
                # application of 2n blocks (the reference loops each block
                # separately, control/control.py:4430-4445,4494-4508)
                u1k = solver_K_p(jnp.concatenate([b0h, b1h]))
                u10, u11 = u1k[:n], u1k[n:]
                c0 = act_00.apply(u10) + act_01.apply(u11)
                c1 = act_10.apply(u10) + act_11.apply(u11)
                u1m = solver_M_p(jnp.concatenate([c0, c1]))
                return u_0, u1m

            pc_fn.state = {"inner": inner_pc.state,
                           "K_p": solver_K_p.state,
                           "M_p": solver_M_p.state}
            return system, pc_fn

        if _return_pieces:
            system, pc_fn = make_pieces(Dv_A, Dp_A, M)
            _hs.close()
            return system, pc_fn, b_0, b_1

        def build64():
            # f64 operator + corrected rhs for the refinement residuals
            def cast(A):
                return jnp.asarray(np.asarray(A)).astype(jnp.float64)

            from ..solvers.block import _apply_per_block
            B64 = LocalOp(cast(B.A), B.trial_space, B.test_space)
            BT64 = LocalOp(cast(B_T.A), B_T.trial_space, B_T.test_space)
            M64 = LocalOp(cast(M.A), space_v, space_v)
            b00, b01, b10, b11, _ = self._incompressible_blocks(
                cast(Dv_A), B64, BT64, M=M64)
            system = MultiBlockSystem(
                space_v, space_p,
                block_00=b00, block_01=b01,
                block_10=b10, block_11=b11,
                n_blocks_00=2 * n, n_blocks_11=2 * n,
                sub_n_blocks_00_0=(n if self._CN else None),
                sub_n_blocks_11_0=(n if self._CN else None),
                nullspace_0=full_ns_0, nullspace_1=full_ns_1,
                CN=self._CN)
            bc0 = _apply_per_block(system.ns0, "correct_rhs", cast(b_0))
            bc1 = _apply_per_block(system.ns1, "correct_rhs", cast(b_1))

            def proj(a0, a1):
                return (_apply_per_block(system.ns0, "correct_rhs", a0),
                        _apply_per_block(system.ns1, "correct_rhs", a1))

            return system.mult, bc0, bc1, proj

        # the single fused-program solve of large incompressible
        # space-time systems exceeds what the single-chip TPU backend can
        # execute (runtime kernel faults past ~16^2 x 3); on accelerators
        # the outer FGMRES therefore runs on the HOST, dispatching the
        # operator and preconditioner as separately-jitted programs
        # (override with ctl._host_loop = False/True)
        host_loop = getattr(self, "_host_loop", None)
        if host_loop is None:
            host_loop = jax.default_backend() != "cpu"
        if host_loop:
            if not hasattr(self, "_host_cache"):
                self._host_cache = {}
            u_0_sol = MixedFunction(space_v, 2 * n)
            u_1_sol = MixedFunction(space_p, 2 * n)
            if P is None:
                # the jitted operator/pc programs take the linearisation
                # state (Dv_A, Dp_A, pc numeric state) as an ARGUMENT, so
                # Picard/Gauss-Newton iterations -- which change the state
                # every outer step -- reuse one compiled executable per
                # program instead of re-jitting (jit constants would also
                # overflow the remote TPU AOT serializer at scale)
                ent = self._host_cache.get(key)
                if ent is None:
                    system0 = make_pieces(Dv_A, Dp_A, M)[0]

                    def mult_fn(state, u0, u1):
                        sys_t, _ = make_pieces(state["Dv"], state["Dp"],
                                               M, pc_state=state["pc"])
                        return sys_t.mult(u0, u1)

                    def pc_fn_s(state, b0, b1):
                        _, pcf = make_pieces(state["Dv"], state["Dp"],
                                             M, pc_state=state["pc"])
                        return pcf(b0, b1)

                    ent = self._host_cache[key] = (system0, mult_fn,
                                                   pc_fn_s, {})
                system0, mult_fn, pc_fn_s, store = ent
                # pc numeric state per linearisation (host-built, cached)
                if not hasattr(self, "_pc_state_cache"):
                    self._pc_state_cache = {}
                tok = (key, array_token(Dv_A), array_token(Dp_A))
                pc_state = self._pc_state_cache.get(tok)
                if pc_state is None:
                    if len(self._pc_state_cache) > 4:
                        self._pc_state_cache.clear()
                    from .common import to_device
                    pc_state = to_device(
                        make_pieces(Dv_A, Dp_A, M)[1].state)
                    self._pc_state_cache[tok] = pc_state
                from .common import to_device
                state = {"Dv": to_device(Dv_A), "Dp": to_device(Dp_A),
                         "pc": pc_state}
                _hs.close()
                info = system0.solve_host(
                    u_0_sol, u_1_sol, b_0, b_1,
                    solver_parameters=solver_parameters,
                    pc_fn=pc_fn_s, jit_store=store, op_state=state,
                    mult_fn=mult_fn)

                def solve_fn(r0, r1):
                    d0f = MixedFunction(space_v, 2 * n)
                    d1f = MixedFunction(space_p, 2 * n)
                    info_k = system0.solve_host(
                        d0f, d1f, r0, r1,
                        solver_parameters=solver_parameters,
                        pc_fn=pc_fn_s, jit_store=store, op_state=state,
                        mult_fn=mult_fn)
                    return d0f.data, d1f.data, \
                        {"iterations": info_k.iterations}
            else:
                # user-supplied pc: cache pieces per linearisation state
                htok = (key, array_token(Dv_A))
                ent = self._host_cache.get(htok)
                if ent is None:
                    system, pc_fn = make_pieces(Dv_A, Dp_A, M)
                    ent = self._host_cache[htok] = (system, pc_fn, {})
                system, pc_fn, store = ent
                _hs.close()
                info = system.solve_host(
                    u_0_sol, u_1_sol, b_0, b_1,
                    solver_parameters=solver_parameters,
                    pc_fn=pc_fn, jit_store=store)

                def solve_fn(r0, r1):
                    d0f = MixedFunction(space_v, 2 * n)
                    d1f = MixedFunction(space_p, 2 * n)
                    info_k = system.solve_host(
                        d0f, d1f, r0, r1,
                        solver_parameters=solver_parameters,
                        pc_fn=pc_fn, jit_store=store)
                    return d0f.data, d1f.data, \
                        {"iterations": info_k.iterations}
            u0, u1 = u_0_sol.data, u_1_sol.data
        else:
            def builder():
                sp_params = dict(solver_parameters)

                def core(Dv_A, Dp_A, pc_state, b_0, b_1, u_0i, u_1i):
                    M_t = LocalOp(M.A, space_v, space_v)
                    system, pc_fn = make_pieces(Dv_A, Dp_A, M_t,
                                                pc_state=pc_state)
                    solve = system.solve_fn(solver_parameters=sp_params,
                                            pc_fn=pc_fn)
                    return solve(u_0i, u_1i, b_0, b_1)

                if P is not None:
                    # no pressure-operator argument with a user pc
                    return lambda Dv_A, b_0, b_1, u_0i, u_1i: core(
                        Dv_A, None, None, b_0, b_1, u_0i, u_1i)
                return core

            pc_state = None
            if P is None:
                # host-derived pc numeric state as a kernel argument (see
                # linear_solve), cached per linearisation state
                if not hasattr(self, "_pc_state_cache"):
                    self._pc_state_cache = {}
                tok = (key, array_token(Dv_A), array_token(Dp_A))
                pc_state = self._pc_state_cache.get(tok)
                if pc_state is None:
                    if len(self._pc_state_cache) > 4:
                        self._pc_state_cache.clear()
                    from .common import to_device
                    pc_state = to_device(make_pieces(Dv_A, Dp_A,
                                                     M)[1].state)
                    self._pc_state_cache[tok] = pc_state
            kernel = self._kernel_cache.get(
                key, builder,
                pin=(P, nullspace_p, space_v, space_p, M, B, B_T))
            _hs.close()
            z_0, z_1 = device_zeros_like(b_0), device_zeros_like(b_1)
            if P is None:
                u0, u1, info_d = run_kernel(kernel, Dv_A, Dp_A, pc_state,
                                            b_0, b_1, z_0, z_1)
            else:
                u0, u1, info_d = run_kernel(kernel, Dv_A, b_0, b_1,
                                            z_0, z_1)
            info = finalize_solve_info(info_d, solver_parameters)

            def solve_fn(r0, r1):
                if P is None:
                    return run_kernel(kernel, Dv_A, Dp_A, pc_state,
                                      r0, r1, z_0, z_1)
                return run_kernel(kernel, Dv_A, r0, r1, z_0, z_1)
        if ir_steps:
            from .common import run_iterative_refinement
            x0, x1, info = run_iterative_refinement(
                build64, solve_fn, u0, u1, info.iterations, ir_steps,
                outer_sp, dtype)
            u0 = jnp.asarray(x0.astype(dtype))
            u1 = jnp.asarray(x1.astype(dtype))
        self.last_solve_info = info

        internal_rhs = v_d is None and f is None
        v = MixedFunction(space_v, n_t, name="v")
        zeta = MixedFunction(space_v, n_t, name="zeta")
        p = MixedFunction(space_p, n, name="p")
        mu = MixedFunction(space_p, n, name="mu")
        if self._CN:
            if internal_rhs:
                v.sub(0).assign(v_0)
            v.data = v.data.at[1:].set(u0[:n])
            zeta.data = zeta.data.at[:-1].set(u0[n:])
        else:
            v.data = u0[:n]
            zeta.data = u0[n:]
        mu.data = u1[:n]
        p.data = u1[n:]

        self.set_v(v)
        self.set_zeta(zeta)
        self.set_p(p)
        self.set_mu(mu)

        if print_error:
            self.print_error(tau)
        if create_output:
            _io.write_time_series("v", self._v, self._times())
            _io.write_time_series("zeta", self._zeta, self._times())
            _io.write_time_series("p", self._p, self._times()[:n])
            _io.write_time_series("mu", self._mu, self._times()[:n])
        if plots:
            _io.plot_fields(v=Function(space_v, data=self._v.data[-1]),
                            p=Function(space_p, data=self._p.data[-1]))
        return info

    def incompressible_non_linear_solve(self, nullspace_p, *, space_p=None,
                                        P=None, solver_parameters=None,
                                        Multigrid=False,
                                        lambda_v_bounds=None,
                                        lambda_p_bounds=None,
                                        max_non_linear_iter=10,
                                        relative_non_linear_tol=10.0**-5,
                                        absolute_non_linear_tol=10.0**-8,
                                        print_error_linear=False,
                                        print_error_non_linear=True,
                                        create_output=True, plots=False):
        """Picard/Gauss-Newton loop for the incompressible problem
        (reference control/control.py:4886-5359)."""
        from contextlib import ExitStack
        from .common import host_setup
        _hs = ExitStack()
        _hs.enter_context(host_setup())
        space_v = self._space_v
        if space_p is None:
            if self._space_p is None:
                raise ValueError("Undefined space_p")
            space_p = self._space_p
        else:
            self.set_space_p(space_p)
        n_t, tau = self._n_t, self._tau
        n = n_t if not self._CN else n_t - 1

        inhom = any(not bc.is_homogeneous
                    for i in self._bcs_v for bc in self._bcs_v[i])
        bcs_v = (homogenize(self._bcs_v[1]) if inhom
                 else self._bcs_v[1])
        mask = combine_masks(space_v, bcs_v) if bcs_v else None

        v_old = MixedFunction(space_v, n_t, data=self._v.data)
        zeta_old = MixedFunction(space_v, n_t, data=self._zeta.data)
        p_old = MixedFunction(space_p, n, data=self._p.data)
        mu_old = MixedFunction(space_p, n, data=self._mu.data)
        v_0 = self._initial_state()

        f = self.construct_f()
        v_d = self.construct_v_d()

        v_trial, v_test = TrialFunction(space_v), TestFunction(space_v)
        p_trial, p_test = TrialFunction(space_p), TestFunction(space_p)
        B = assemble(-inner(div(v_trial), p_test) * dx)
        B_T = assemble(-inner(p_trial, div(v_test)) * dx)
        v_0 = self._divfree_project_initial(v_0, B, B_T,
                                            assemble(self._M_v), mask,
                                            lambda_v_bounds)
        if self._CN:
            v_old.sub(0).assign(v_0)
        zeta_old.sub(n_t - 1).assign(0.0)

        mkv = mask[None] if mask is not None else None

        def res():
            rhs_00, rhs_01 = self.non_linear_res_eval(
                v_old, zeta_old, v_0, v_d, f, mask, mask)
            rhs_00 = zero_rows(mkv, rhs_00 - tau * B_T.apply(mu_old.data))
            rhs_01 = zero_rows(mkv, rhs_01 - tau * B_T.apply(p_old.data))
            if self._CN:
                rhs_10 = -B.apply(v_old.data[1:])
            else:
                rhs_10 = -B.apply(v_old.data)
            rhs_11 = -B.apply(zeta_old.data[:n])
            return rhs_00, rhs_01, rhs_10, rhs_11

        rhs_00, rhs_01, rhs_10, rhs_11 = res()

        def _norm(*a):
            return float(jnp.sqrt(sum(jnp.vdot(x, x) for x in a)))

        norm_0 = _norm(rhs_00, rhs_01, rhs_10, rhs_11)
        norm_k = norm_0
        k = 0
        print(f"Initial non-linear residual: {norm_0:.16e}")

        while (norm_k > relative_non_linear_tol * norm_0
               and norm_k > absolute_non_linear_tol):
            self.incompressible_linear_solve(
                nullspace_p, space_p=space_p, P=P,
                solver_parameters=solver_parameters, Multigrid=Multigrid,
                lambda_v_bounds=lambda_v_bounds,
                lambda_p_bounds=lambda_p_bounds,
                v_d=MixedFunction(space_v, n, data=rhs_00, dual=True),
                f=MixedFunction(space_v, n, data=rhs_01, dual=True),
                div_v=MixedFunction(space_p, n, data=tau * rhs_10,
                                    dual=True),
                div_zeta=MixedFunction(space_p, n, data=tau * rhs_11,
                                       dual=True),
                print_error=print_error_linear,
                create_output=False, plots=False)

            v_old.data = v_old.data + self._v.data
            if inhom:
                for i in range(n_t):
                    for bc in self._bcs_v[i]:
                        bc.apply(v_old.sub(i))
            zeta_old.data = zeta_old.data + self._zeta.data
            if mask is not None:
                zeta_old.data = jnp.where(mask[None], 0.0, zeta_old.data)
            p_old.data = p_old.data + self._p.data
            mu_old.data = mu_old.data + self._mu.data
            self.set_v(v_old)
            self.set_zeta(zeta_old)
            self.set_p(p_old)
            self.set_mu(mu_old)
            v_old.data = self._v.data
            zeta_old.data = self._zeta.data

            rhs_00, rhs_01, rhs_10, rhs_11 = res()
            norm_k = _norm(rhs_00, rhs_01, rhs_10, rhs_11)
            k += 1
            print(f"Non-linear solver: iteration {k:d}, "
                  f"non-linear residual norm {norm_k:.16e}")
            if k + 1 > max_non_linear_iter:
                break

        _hs.close()
        if print_error_non_linear:
            if (norm_k < relative_non_linear_tol * norm_0
                    or norm_k < absolute_non_linear_tol):
                print(f"Relative non-linear residual: {norm_k / norm_0:.16e}")
                print(f"Absolute non-linear residual: {norm_k:.16e}")
                print(f"Number of non-linear iterations: {k:d}")
            else:
                print("The non-linear iteration did not converge")
                print(f"Relative non-linear residual: {norm_k / norm_0:.16e}")
                print(f"Absolute non-linear residual: {norm_k:.16e}")
            self.print_error(tau)

        if create_output:
            _io.write_time_series("v", self._v, self._times())
            _io.write_time_series("zeta", self._zeta, self._times())
            _io.write_time_series("p", self._p, self._times()[:n])
            _io.write_time_series("mu", self._mu, self._times()[:n])
