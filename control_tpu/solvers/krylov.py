"""jit-compiled Krylov solvers on pytrees.

Replaces PETSc KSP (reference preconditioner/preconditioner.py:732-759):

* ``gmres``   -- left-preconditioned restarted GMRES (PETSc's default GMRES
                 configuration: preconditioned residual norm).
* ``fgmres``  -- flexible GMRES, right-preconditioned, true residual norm
                 (needed because the reference's incompressible
                 preconditioner contains an inner GMRES(5);
                 reference control/control.py:4355-4361).
* ``minres``  -- preconditioned MINRES for symmetric systems.
* ``chebyshev`` -- Chebyshev semi-iteration with user spectral bounds
                 (the reference's mass-matrix solver,
                 reference control/control.py:377-385).

All solvers are pure functions built from ``lax.while_loop``/``fori_loop``
with fixed-size Krylov bases, so an entire outer KKT solve compiles to one
XLA program.  Operators and preconditioners are callables on pytrees;
vectors are flattened once with ``ravel_pytree``.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree


def _flat_op(op, unravel):
    if op is None:
        return lambda x: x
    return lambda x: ravel_pytree(op(unravel(x)))[0]


def _norm(x):
    return jnp.sqrt(jnp.vdot(x, x).real)


# ---------------------------------------------------------------------------
# GMRES / FGMRES
# ---------------------------------------------------------------------------

def _gmres_impl(A, b, x0, M, restart, rtol, atol, maxiter, flexible,
                dtol=None):
    b_flat, unravel = ravel_pytree(b)
    n = b_flat.shape[0]
    dtype = b_flat.dtype
    x = ravel_pytree(x0)[0] if x0 is not None else jnp.zeros_like(b_flat)
    Af = _flat_op(A, unravel)
    Mf = _flat_op(M, unravel)

    m = restart
    max_cycles = (maxiter + m - 1) // m
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype)

    def residual(x):
        r = b_flat - Af(x)
        return Mf(r) if not flexible else r

    r0 = residual(x)
    rnorm0 = _norm(r0)
    # PETSc KSPConvergedDefault: rtol is relative to the norm of the
    # (preconditioned) right-hand side, not the initial residual.
    bnorm = _norm(Mf(b_flat)) if not flexible else _norm(b_flat)
    tol = jnp.maximum(rtol * bnorm, atol)
    # PETSc divtol: declare divergence once rnorm > dtol * rnorm0
    dlim = (jnp.inf if dtol is None
            else jnp.asarray(dtol, rnorm0.dtype) * rnorm0)
    hist = hist.at[0].set(rnorm0)

    def cycle_body(state):
        x, it, rnorm, hist, _ = state
        r = residual(x)
        beta = _norm(r)
        V = jnp.zeros((m + 1, n), dtype)
        Z = jnp.zeros((m + 1, n), dtype) if flexible else V
        V = V.at[0].set(r / jnp.where(beta > 0, beta, 1.0))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)

        def arnoldi_cond(st):
            j, V, Z, H, cs, sn, g, it, rn, hist = st
            return (j < m) & (rn > tol) & (it < maxiter) & (rn <= dlim)

        def arnoldi_body(st):
            j, V, Z, H, cs, sn, g, it, rn, hist = st
            if flexible:
                z = Mf(V[j])
                Z2 = Z.at[j].set(z)
                w = Af(z)
            else:
                Z2 = Z
                w = Mf(Af(V[j]))
            # modified Gram-Schmidt over rows 0..j, with a second
            # (reorthogonalization) pass: in f32 a single MGS sweep loses
            # basis orthogonality after ~7 vectors and the solve stalls a
            # restart cycle ~25x above where it should be (observed on the
            # 128^2x32 heat KKT: 14 its f32 vs 9 f64; 21+ at 256^2x64).
            # The extra pass costs 2m dot/axpy streams per iteration --
            # noise next to one preconditioner application -- and restores
            # f64-quality iteration counts in f32.
            def mgs(k, carry):
                w, H = carry
                hkj = jnp.where(k <= j, jnp.vdot(V[k], w), 0.0)
                w = w - hkj * V[k]
                H = H.at[k, j].add(hkj)
                return (w, H)

            w, H = lax.fori_loop(0, m, mgs, (w, H))
            w, H = lax.fori_loop(0, m, mgs, (w, H))
            hj1 = _norm(w)
            H = H.at[j + 1, j].set(hj1)
            V2 = V.at[j + 1].set(w / jnp.where(hj1 > 0, hj1, 1.0))

            # apply stored Givens rotations to the new column
            def rots(k, Hc):
                h_k = Hc[k]
                h_k1 = Hc[k + 1]
                t1 = jnp.where(k < j, cs[k] * h_k + sn[k] * h_k1, h_k)
                t2 = jnp.where(k < j, -sn[k] * h_k + cs[k] * h_k1, h_k1)
                return Hc.at[k].set(t1).at[k + 1].set(t2)

            col = lax.fori_loop(0, m, rots, H[:, j])
            h1, h2 = col[j], col[j + 1]
            denom = jnp.sqrt(h1 * h1 + h2 * h2)
            c = jnp.where(denom > 0, h1 / jnp.where(denom > 0, denom, 1.0), 1.0)
            s = jnp.where(denom > 0, h2 / jnp.where(denom > 0, denom, 1.0), 0.0)
            col = col.at[j].set(c * h1 + s * h2).at[j + 1].set(0.0)
            H = H.at[:, j].set(col)
            cs2 = cs.at[j].set(c)
            sn2 = sn.at[j].set(s)
            gj = g[j]
            g2 = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            rn2 = jnp.abs(g2[j + 1])
            it2 = it + 1
            hist2 = hist.at[it2].set(rn2)
            return (j + 1, V2, Z2, H, cs2, sn2, g2, it2, rn2, hist2)

        j, V, Z, H, cs, sn, g, it, rnorm, hist = lax.while_loop(
            arnoldi_cond, arnoldi_body,
            (0, V, Z, H, cs, sn, g, it, beta, hist))

        # back substitution on the j x j triangular system (masked)
        y = jnp.zeros((m,), dtype)

        def back(i_, y):
            i = j - 1 - i_
            num = g[i] - jnp.dot(H[i, :], y)
            yi = jnp.where(H[i, i] != 0, num / jnp.where(H[i, i] != 0,
                                                         H[i, i], 1.0), 0.0)
            return jnp.where(i_ < j, y.at[i].set(yi), y)

        y = lax.fori_loop(0, m, back, y)
        basis = Z if flexible else V
        dx = jnp.tensordot(y, basis[:m], axes=1)
        x = x + dx
        return (x, it, rnorm, hist, j)

    def cond(state):
        x, it, rnorm, hist, _ = state
        return (rnorm > tol) & (it < maxiter) & (rnorm <= dlim)

    init = (x, jnp.asarray(0), rnorm0, hist, jnp.asarray(0))

    def safe_body(state):
        return cycle_body(state)

    x, it, rnorm, hist, _ = lax.while_loop(cond, safe_body, init)

    info = {"iterations": it, "res_norms": hist, "rnorm0": rnorm0,
            "rnorm": rnorm,
            "converged": rnorm <= jnp.maximum(tol, 0.0)}
    return unravel(x), info


def gmres(A, b, x0=None, *, M=None, restart=30, rtol=1e-6, atol=0.0,
          maxiter=1000, dtol=None):
    """Left-preconditioned restarted GMRES (PETSc-default semantics)."""
    return _gmres_impl(A, b, x0, M, restart, rtol, atol, maxiter,
                       flexible=False, dtol=dtol)


def fgmres(A, b, x0=None, *, M=None, restart=30, rtol=1e-6, atol=0.0,
           maxiter=1000, dtol=None):
    """Flexible (right-preconditioned) GMRES; true residual norm."""
    return _gmres_impl(A, b, x0, M, restart, rtol, atol, maxiter,
                       flexible=True, dtol=dtol)


# ---------------------------------------------------------------------------
# MINRES
# ---------------------------------------------------------------------------

def minres(A, b, x0=None, *, M=None, rtol=1e-6, atol=0.0, maxiter=1000,
           dtol=None):
    """Preconditioned MINRES (A symmetric, M SPD)."""
    b_flat, unravel = ravel_pytree(b)
    dtype = b_flat.dtype
    x = ravel_pytree(x0)[0] if x0 is not None else jnp.zeros_like(b_flat)
    Af = _flat_op(A, unravel)
    Mf = _flat_op(M, unravel)

    r = b_flat - Af(x)
    z = Mf(r)
    gamma = jnp.sqrt(jnp.maximum(jnp.vdot(r, z), 0.0))
    rnorm0 = gamma
    tol = jnp.maximum(rtol * rnorm0, atol)
    dlim = (jnp.inf if dtol is None
            else jnp.asarray(dtol, rnorm0.dtype) * rnorm0)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype).at[0].set(rnorm0)

    state = dict(
        x=x,
        v_old=jnp.zeros_like(b_flat), v=r / jnp.where(gamma > 0, gamma, 1.0),
        z=z / jnp.where(gamma > 0, gamma, 1.0),
        w=jnp.zeros_like(b_flat), w_old=jnp.zeros_like(b_flat),
        eta=gamma, gamma=gamma, gamma_old=jnp.asarray(1.0, dtype),
        c=jnp.asarray(1.0, dtype), c_old=jnp.asarray(1.0, dtype),
        s=jnp.asarray(0.0, dtype), s_old=jnp.asarray(0.0, dtype),
        rnorm=rnorm0, it=jnp.asarray(0), hist=hist)

    def cond(st):
        return (st["rnorm"] > tol) & (st["it"] < maxiter) \
            & (st["rnorm"] <= dlim)

    def body(st):
        Az = Af(st["z"])
        delta = jnp.vdot(Az, st["z"])
        v_new = Az - delta * st["v"] - st["gamma"] * st["v_old"]
        z_new = Mf(v_new)
        gamma_new = jnp.sqrt(jnp.maximum(jnp.vdot(v_new, z_new), 1e-300))
        a0 = st["c"] * delta - st["c_old"] * st["s"] * st["gamma"]
        a1 = jnp.sqrt(a0 * a0 + gamma_new * gamma_new)
        a2 = st["s"] * delta + st["c_old"] * st["c"] * st["gamma"]
        a3 = st["s_old"] * st["gamma"]
        c_new = a0 / a1
        s_new = gamma_new / a1
        w_new = (st["z"] - a3 * st["w_old"] - a2 * st["w"]) / a1
        x = st["x"] + c_new * st["eta"] * w_new
        eta = -s_new * st["eta"]
        rnorm = jnp.abs(eta)
        it = st["it"] + 1
        return dict(
            x=x, v_old=st["v"], v=v_new / gamma_new, z=z_new / gamma_new,
            w=w_new, w_old=st["w"], eta=eta,
            gamma=gamma_new, gamma_old=st["gamma"],
            c=c_new, c_old=st["c"], s=s_new, s_old=st["s"],
            rnorm=rnorm, it=it, hist=st["hist"].at[it].set(rnorm))

    st = lax.while_loop(cond, body, state)
    info = {"iterations": st["it"], "res_norms": st["hist"],
            "rnorm0": rnorm0, "rnorm": st["rnorm"],
            "converged": st["rnorm"] <= tol}
    return unravel(st["x"]), info


# ---------------------------------------------------------------------------
# Chebyshev semi-iteration
# ---------------------------------------------------------------------------

def chebyshev(A, b, bounds, iters, x0=None, M=None):
    """Chebyshev iteration for M^{-1}A with spectrum in ``bounds``
    (the reference's 20-iteration Jacobi-preconditioned mass solve,
    reference control/control.py:377-385)."""
    b_flat, unravel = ravel_pytree(b)
    x = ravel_pytree(x0)[0] if x0 is not None else jnp.zeros_like(b_flat)
    Af = _flat_op(A, unravel)
    Mf = _flat_op(M, unravel)

    emin, emax = bounds
    theta = 0.5 * (emax + emin)
    delta = 0.5 * (emax - emin)
    sigma1 = theta / delta

    r = b_flat - Af(x)
    d = Mf(r) / theta
    x = x + d
    rho = 1.0 / sigma1

    def body(k, carry):
        x, d, rho = carry
        r = b_flat - Af(x)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * Mf(r)
        return (x + d, d, rho_new)

    x, _, _ = lax.fori_loop(0, iters - 1, body, (x, d, rho))
    return unravel(x)


def jacobi_apply(diag, b):
    return jax.tree_util.tree_map(lambda d, v: v / d, diag, b)


def fgmres_host(A, b, x0=None, *, M=None, restart=30, rtol=1e-6, atol=0.0,
                maxiter=100, dtol=None, jit_store=None, op_state=None):
    """Flexible GMRES with the OUTER loop on the host.

    The operator and preconditioner run as separately-jitted XLA programs
    and the Arnoldi bookkeeping as one small jitted program; the Hessenberg
    factorisation stays in host numpy.  This trades per-iteration dispatch
    latency for bounded program size: the single fused-program solve of the
    large incompressible space-time systems exceeds what the TPU backend
    can execute (worker kernel faults), while each piece runs fine.
    Semantics match ``fgmres`` (right pc, true residual norm).

    ``jit_store`` (an empty dict supplied by the caller) caches the jitted
    programs across calls with the same operator/preconditioner objects,
    avoiding a re-jit per solve.

    ``op_state``: optional pytree of numeric state.  When given, ``A`` and
    ``M`` are called as ``A(state, x)`` / ``M(state, x)`` and the state is
    passed to the jitted programs as an ARGUMENT -- solves with a different
    linearisation state (e.g. successive Picard/Gauss-Newton iterations)
    reuse the same compiled executables instead of re-jitting."""
    b_flat, unravel = ravel_pytree(b)
    n = b_flat.shape[0]
    dtype = b_flat.dtype
    x = ravel_pytree(x0)[0] if x0 is not None else jnp.zeros_like(b_flat)
    if jit_store is None:
        jit_store = {}
    stateful = op_state is not None
    if "astep" not in jit_store:
        if stateful:
            def Af_t(s, v):
                return ravel_pytree(A(s, unravel(v)))[0]

            def Mf_t(s, v):
                return (ravel_pytree(M(s, unravel(v)))[0]
                        if M is not None else v)
        else:
            Af_b, Mf_b = _flat_op(A, unravel), _flat_op(M, unravel)

            def Af_t(s, v):
                return Af_b(v)

            def Mf_t(s, v):
                return Mf_b(v)

        def _astep(s, V, Z, j):
            # ONE fused program per Arnoldi iteration: pc apply, operator
            # apply, classical Gram-Schmidt with one reorthogonalisation
            # pass (numerically adequate at these restart lengths), and
            # the V/Z row stores.  The host loop pays a single dispatch +
            # one small (h, nrm) transfer per iteration -- through the
            # remote-TPU tunnel each dispatch costs O(100 ms), and this
            # loop previously issued five.
            z = Mf_t(s, V[j])
            w = Af_t(s, z)
            mask = (jnp.arange(V.shape[0]) <= j).astype(w.dtype)
            h1 = (V @ w) * mask
            w = w - V.T @ h1
            h2 = (V @ w) * mask
            w = w - V.T @ h2
            nrm = jnp.sqrt(jnp.vdot(w, w).real)
            V = V.at[j + 1].set(w / jnp.where(nrm > 0, nrm, 1.0))
            Z = Z.at[j].set(z)
            # h and nrm ride ONE d2h transfer (the tunnel charges per call)
            return V, Z, jnp.concatenate([h1 + h2, nrm[None]])

        def _residual(s, x, b_flat):
            return b_flat - Af_t(s, x)

        @jax.jit
        def _update(x, Z, y):
            return x + Z.T @ y

        jit_store["astep"] = jax.jit(_astep, donate_argnums=(1, 2))
        jit_store["residual"] = jax.jit(_residual)
        jit_store["update"] = _update
    _astep_j = jit_store["astep"]
    _res_j = jit_store["residual"]
    _update = jit_store["update"]
    _state = op_state  # None in the stateless variant

    def _arnoldi_step(V, Z, j):
        return _astep_j(_state, V, Z, j)

    def _residual(x):
        return _res_j(_state, x, b_flat)

    bnorm = float(np.sqrt(abs(np.asarray(jnp.vdot(b_flat, b_flat)))))
    r = _residual(x)
    rnorm0 = float(np.sqrt(abs(np.asarray(jnp.vdot(r, r)))))
    tol = max(rtol * bnorm, atol)
    dlim = np.inf if dtol is None else dtol * rnorm0
    hist = np.full((maxiter + 1,), np.nan)
    hist[0] = rnorm0

    m = restart
    it = 0
    rnorm = rnorm0
    while rnorm > tol and it < maxiter and rnorm <= dlim:
        r = _residual(x)
        beta = float(np.sqrt(abs(np.asarray(jnp.vdot(r, r)))))
        if beta == 0.0:
            rnorm = 0.0
            break
        V = jnp.zeros((m + 1, n), dtype).at[0].set(r / beta)
        Z = jnp.zeros((m, n), dtype)
        H = np.zeros((m + 1, m))
        cs = np.zeros(m)
        sn = np.zeros(m)
        g = np.zeros(m + 1)
        g[0] = beta
        j = 0
        while j < m and rnorm > tol and it < maxiter and rnorm <= dlim:
            V, Z, hn = _arnoldi_step(V, Z, j)
            hn = np.asarray(hn)
            h_np, nrm = hn[:-1], float(hn[-1])
            H[:j + 1, j] = h_np[:j + 1]
            H[j + 1, j] = nrm
            # Givens update of column j (host)
            col = H[:, j].copy()
            for k in range(j):
                t1 = cs[k] * col[k] + sn[k] * col[k + 1]
                t2 = -sn[k] * col[k] + cs[k] * col[k + 1]
                col[k], col[k + 1] = t1, t2
            denom = np.hypot(col[j], col[j + 1])
            c = col[j] / denom if denom > 0 else 1.0
            s = col[j + 1] / denom if denom > 0 else 0.0
            col[j] = c * col[j] + s * col[j + 1]
            col[j + 1] = 0.0
            H[:, j] = col
            cs[j], sn[j] = c, s
            gj = g[j]
            g[j] = c * gj
            g[j + 1] = -s * gj
            rnorm = abs(g[j + 1])
            it += 1
            hist[it] = rnorm
            j += 1
        # back substitution (host) + solution update (device)
        y = np.zeros(m)
        for i in range(j - 1, -1, -1):
            y[i] = (g[i] - H[i, :] @ y) / (H[i, i] if H[i, i] != 0 else 1.0)
        x = _update(x, Z, jnp.asarray(y, dtype))

    info = {"iterations": it, "res_norms": jnp.asarray(hist),
            "rnorm0": rnorm0, "rnorm": rnorm,
            "converged": rnorm <= max(tol, 0.0)}
    return unravel(x), info


SOLVERS = {"gmres": gmres, "fgmres": fgmres, "minres": minres}


def solve_krylov(name, A, b, x0=None, **kw):
    if name not in SOLVERS:
        raise ValueError(f"unknown linear_solver {name!r}")
    fn = SOLVERS[name]
    if name == "minres":
        kw.pop("restart", None)
    return fn(A, b, x0=x0, **kw)
