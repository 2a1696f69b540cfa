"""Node-stencil (DIA-format) operator application.

A scalar Lagrange operator on a structured mesh is, at node level, a
(2d+1)^2-point stencil with per-node weights.  Folding the per-cell local
matrices (and the Dirichlet row/column elimination) into a weight tensor

    w : (*batch, K, ny, nx),   K = (2d+1)^2

turns operator application into K shifted multiply-adds -- and, on TPU, into
ONE fused Pallas kernel (weights + source streamed through VMEM, single
pass).  This is the hot operation of the preconditioner's multigrid
smoothers and Schur substitutions, which the reference delegates to
hypre/PETSc CSR matvecs.
"""

import itertools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def stencil_offsets(degree, nd=2):
    """(2d+1)**nd node offsets, lexicographic major-to-minor
    ([dz,] dy, dx) -- matching the node-grid axis order."""
    rng = range(-degree, degree + 1)
    return list(itertools.product(rng, repeat=nd))


def node_stencil(A, space, mask=None, alpha=1.0):
    """Fold local matrices ``A`` (*batch, E|1, b, a) into node-stencil
    weights: (*batch, K, *grid) on scalar spaces (2-D and 3-D; K =
    (2d+1)**ndim), or (*batch, K, *nodes, dim, dim) on vector spaces
    (a dim x dim component-coupling block per offset per node; dof layout
    is node-major/component-minor, see local_op._global_indices).

    ``mask`` (optional boolean grid, trailing dim axis on vector spaces)
    applies symmetric Dirichlet elimination: masked rows become
    alpha*identity, masked columns are dropped.
    """
    d = space.degree
    if space.dim is not None:
        return _node_stencil_vector(A, space, mask, alpha)
    m = space.mesh
    nd = space.ndim
    K = (2 * d + 1) ** nd
    batch = A.shape[:-3]
    dtype = A.dtype
    cells = (m.nz, m.ny, m.nx) if nd == 3 else (m.ny, m.nx)
    grid = space.grid_shape
    Af = jnp.broadcast_to(A, batch + (m.n_cells,) + A.shape[-2:])
    Af = Af.reshape(batch + cells + A.shape[-2:])

    w = jnp.zeros(batch + (K,) + grid, dtype)
    nl = d + 1
    offs = stencil_offsets(d, nd)
    kidx = {off: k for k, off in enumerate(offs)}
    full = (slice(None),) * nd
    for b, bt in enumerate(itertools.product(range(nl), repeat=nd)):
        sb = tuple(slice(bi, bi + d * (nc - 1) + 1, d)
                   for bi, nc in zip(bt, cells))
        for a, at in enumerate(itertools.product(range(nl), repeat=nd)):
            k = kidx[tuple(ai - bi for ai, bi in zip(at, bt))]
            w = w.at[(Ellipsis, k) + sb].add(Af[..., b, a])
    if mask is not None:
        mk = jnp.asarray(mask)
        # zero masked rows
        w = jnp.where(mk[None], 0.0, w)
        # zero masked columns: weight k at node p reads x[p + off_k]
        for k, off in enumerate(offs):
            src = jnp.zeros_like(mk)
            ss = tuple(slice(max(0, -o), g - max(0, o))
                       for o, g in zip(off, grid))
            sd = tuple(slice(max(0, o), g - max(0, -o))
                       for o, g in zip(off, grid))
            src = src.at[ss].set(mk[sd])
            w = w.at[(Ellipsis, k) + full].set(
                jnp.where(src, 0.0, w[(Ellipsis, k) + full]))
        # alpha * identity on masked rows
        kc = K // 2
        w = w.at[(Ellipsis, kc) + full].set(
            jnp.where(mk, jnp.asarray(alpha, dtype),
                      w[(Ellipsis, kc) + full]))
    return w


def _node_stencil_vector(A, space, mask=None, alpha=1.0):
    """Dimension-generic vector fold: weights (*batch, K, *nodes, dim, dim)
    with K = (2d+1)**ndim -- same shifted-window construction as the
    scalar path, with a dim x dim component-coupling block per offset."""
    d = space.degree
    dim = space.dim
    m = space.mesh
    nd = space.ndim
    K = (2 * d + 1) ** nd
    batch = A.shape[:-3]
    dtype = A.dtype
    nl = d + 1
    nloc = nl ** nd
    cells = (m.nz, m.ny, m.nx) if nd == 3 else (m.ny, m.nx)
    nodes = space.grid_shape[:-1]                # node grid, no dim axis
    Af = jnp.broadcast_to(A, batch + (m.n_cells,) + A.shape[-2:])
    # (..., *cells, node_b, dim_b, node_a, dim_a)
    Af = Af.reshape(batch + cells + (nloc, dim, nloc, dim))

    w = jnp.zeros(batch + (K,) + nodes + (dim, dim), dtype)
    offs = stencil_offsets(d, nd)
    kidx = {off: k for k, off in enumerate(offs)}
    full = (slice(None),) * nd
    dd = (slice(None), slice(None))
    for b, bt in enumerate(itertools.product(range(nl), repeat=nd)):
        sb = tuple(slice(bi, bi + d * (nc - 1) + 1, d)
                   for bi, nc in zip(bt, cells))
        for a, at in enumerate(itertools.product(range(nl), repeat=nd)):
            k = kidx[tuple(ai - bi for ai, bi in zip(at, bt))]
            w = w.at[(Ellipsis, k) + sb + dd].add(Af[..., b, :, a, :])
    if mask is not None:
        mk = jnp.asarray(mask)                   # (*nodes, dim)
        # zero masked rows (per node/component)
        w = jnp.where(mk[(None,) + full + (slice(None), None)], 0.0, w)
        # zero masked columns: weight k at node p reads x[p + off_k]
        for k, off in enumerate(offs):
            src = jnp.zeros_like(mk)
            ss = tuple(slice(max(0, -o), g - max(0, o))
                       for o, g in zip(off, nodes))
            sd = tuple(slice(max(0, o), g - max(0, -o))
                       for o, g in zip(off, nodes))
            src = src.at[ss].set(mk[sd])
            idx = (Ellipsis, k) + full + dd
            w = w.at[idx].set(jnp.where(src[..., None, :], 0.0, w[idx]))
        # alpha * identity on masked rows
        kc = K // 2
        eye = jnp.eye(dim, dtype=dtype)
        idxc = (Ellipsis, kc) + full + dd
        w = w.at[idxc].set(jnp.where(mk[..., None],
                                     alpha * eye[(None,) * nd], w[idxc]))
    return w


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------

def _is_vector_stencil(w, nd=2):
    """Vector stencils carry a trailing (dim, dim) coupling block: their
    weights are (*batch, K, *nodes, dim, dim), at least (nd+3)-D (scalar
    weights are at most (batch, K, *grid) = (nd+2)-D; callers collapse
    extra lead batch axes before applying)."""
    return w.ndim >= nd + 3


def _apply_xla(w, x, degree, nd=2):
    """Shifted multiply-add path (portable; dimension-generic)."""
    d = degree
    if _is_vector_stencil(w, nd):
        # x: (..., *nodes, dim); w: (..., K, *nodes, dim, dim)
        nodes = x.shape[-(nd + 1):-1]
        pad = ([(0, 0)] * (x.ndim - nd - 1) + [(d, d)] * nd + [(0, 0)])
        xp = jnp.pad(x, pad)
        out = None
        for k, off in enumerate(stencil_offsets(d, nd)):
            sl = xp[(Ellipsis,)
                    + tuple(slice(d + o, d + o + g)
                            for o, g in zip(off, nodes))
                    + (slice(None),)]
            wk = jnp.take(w, k, axis=w.ndim - (nd + 3))
            term = jnp.einsum("...rc,...c->...r", wk, sl)
            out = term if out is None else out + term
        return out
    grid = x.shape[-nd:]
    full = (slice(None),) * nd
    pad = [(0, 0)] * (x.ndim - nd) + [(d, d)] * nd
    xp = jnp.pad(x, pad)
    out = None
    for k, off in enumerate(stencil_offsets(d, nd)):
        sl = xp[(Ellipsis,) + tuple(slice(d + o, d + o + g)
                                    for o, g in zip(off, grid))]
        term = w[(Ellipsis, k) + full] * sl
        out = term if out is None else out + term
    return out


def _pallas_kernel(degree, ny, nx, n_w, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = degree
    offs = stencil_offsets(d)

    def kernel(w_ref, xp_ref, y_ref):
        acc = w_ref[0, 0] * xp_ref[0, d + offs[0][0]: d + offs[0][0] + ny,
                                   d + offs[0][1]: d + offs[0][1] + nx]
        for k in range(1, len(offs)):
            dy, dx = offs[k]
            acc = acc + w_ref[0, k] * xp_ref[0, d + dy: d + dy + ny,
                                             d + dx: d + dx + nx]
        y_ref[0] = acc

    K = len(offs)

    def call(w, xp, batch, w_batched):
        grid = (batch,)
        w_index = (lambda i: (i, 0, 0, 0)) if w_batched else \
            (lambda i: (0, 0, 0, 0))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, K, ny, nx), w_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ny + 2 * d, nx + 2 * d),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, ny, nx), dtype),
        )(w, xp)

    return call


def _pallas_kernel_3d(degree, nz, ny, nx, dtype):
    """Single-pass 3-D scalar stencil application, z-plane streamed: the
    padded source volume sits in VMEM once; each grid step DMAs only the K
    weight planes of its output z-plane, so VMEM stays O(K) planes at any
    nz (the whole-volume fused smoother is gated by `_vmem_ok_nd3`
    instead)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = degree
    offs = stencil_offsets(d, 3)
    K = len(offs)
    pz, py, px = nz + 2 * d, ny + 2 * d, nx + 2 * d

    def kernel(w_ref, xp_ref, y_ref):
        z = pl.program_id(1)
        slab = xp_ref[0, pl.ds(z, 2 * d + 1)]
        acc = None
        for k, (oz, oy, ox_) in enumerate(offs):
            t = w_ref[0, k] * slab[d + oz, d + oy: d + oy + ny,
                                   d + ox_: d + ox_ + nx]
            acc = t if acc is None else acc + t
        y_ref[0, 0] = acc

    def call(w_zmaj, xp, batch, w_batched, interpret=False):
        w_index = (lambda i, z: (i, z, 0, 0)) if w_batched else \
            (lambda i, z: (0, z, 0, 0))
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET)
        return pl.pallas_call(
            kernel,
            grid=(batch, nz),
            in_specs=[
                pl.BlockSpec((1, K, ny, nx), w_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pz, py, px), lambda i, z: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, ny, nx),
                                   lambda i, z: (i, z, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, nz, ny, nx), dtype),
            interpret=interpret,
            **kwargs,
        )(w_zmaj, xp)

    return call


def _apply_3d_pallas(w, x, degree, interpret=False):
    """Scalar 3-D apply via the z-streamed kernel; w (K|n*K layout as
    (nw, K, nz, ny, nx)), x (..., nz, ny, nx)."""
    d = degree
    nz, ny, nx = x.shape[-3:]
    x_b = x if x.ndim == 4 else x[None]
    batch = x_b.shape[0]
    w_b = w if w.ndim == 5 else w[None]
    w_batched = w_b.shape[0] == batch and batch > 1
    if not w_batched and w_b.shape[0] != 1:
        raise ValueError("stencil batch mismatch")
    xp = jnp.pad(x_b, [(0, 0), (d, d), (d, d), (d, d)])
    # z-major weight layout so BlockSpec streams one z's K planes per step
    w_zmaj = jnp.moveaxis(w_b, 2, 1).reshape(
        w_b.shape[0], nz * w_b.shape[1], ny, nx)
    call = _pallas_kernel_3d(d, nz, ny, nx, x.dtype)
    y = call(w_zmaj, xp, batch, w_batched, interpret=interpret)
    return y if x.ndim == 4 else y[0]


def _vmem_ok_3d_apply(degree, nz, ny, nx, dtype):
    K = (2 * degree + 1) ** 3
    pb = _padded_plane_bytes(ny, nx, dtype)
    vol = (nz + 2 * degree) * _padded_plane_bytes(ny + 2 * degree,
                                                  nx + 2 * degree, dtype)
    # every streamed input/output window is double-buffered by Mosaic
    return 2 * (vol + K * pb + pb) < 110 * 2**20


def _pallas_enabled():
    import os
    return os.environ.get("CONTROL_TPU_NO_PALLAS", "0") != "1"


def _vector_pallas_enabled():
    # separate kill-switch for the 4-plane vector smoother (first TPU
    # exercise happens unattended in the runbook; keep it retryable)
    import os
    return os.environ.get("CONTROL_TPU_NO_VECTOR_PALLAS", "0") != "1"


def _vmem_ok(degree, ny, nx, dtype):
    K = (2 * degree + 1) ** 2
    bytes_needed = (K + 3) * ny * nx * jnp.dtype(dtype).itemsize
    return bytes_needed < 12 * 1024 * 1024


# Mosaic's default scoped-VMEM budget is 16 MB but the physical VMEM is
# larger; kernels that declare their need via vmem_limit_bytes can use it
_VMEM_BUDGET = 100 * 2**20


def _padded_plane_bytes(ny, nx, rdtype):
    """VMEM bytes of one (ny, nx) plane after (8, 128) tile padding."""
    return (-(-ny // 8) * 8) * (-(-nx // 128) * 128) \
        * jnp.dtype(rdtype).itemsize


def _vmem_ok_complex(degree, ny, nx, rdtype):
    # re/im weight planes + 6 field inputs + 4 outputs (double-buffered
    # by the pipeline) + 2 scratch pads
    K = (2 * degree + 1) ** 2
    planes = 2 * (2 * K) + 2 * 6 + 2 * 4 + 2
    return planes * _padded_plane_bytes(ny, nx, rdtype) < _VMEM_BUDGET


def apply_stencil(w, x, degree, use_pallas=None, nd=2):
    """y = stencil(w) @ x.

    w: (K, *grid) or (n, K, *grid); x: (*grid) or (n, *grid) -- the
    batch dims broadcast (shared weights across a time batch are fine).
    ``nd``: spatial dimension of the node grid (the single-pass Pallas
    kernel is 2-D scalar only; 3-D and vector run shifted multiply-adds).
    """
    d = degree
    if nd == 3 and not _is_vector_stencil(w, nd) \
            and not jnp.iscomplexobj(x) and x.ndim <= 4:
        if use_pallas is None:
            # measured on v5e (65^3 x 9, f32): the z-streamed kernel runs
            # 455 ms vs 247 ms for XLA's fused shifted multiply-adds --
            # the per-plane grid steps underutilize the VPU, so the
            # single-pass 3-D kernel is OPT-IN (the multi-step fused
            # smoother _fused_cheb_nd3 is where VMEM residency pays)
            import os
            try:
                platform = next(iter(x.devices())).platform
            except Exception:
                platform = jax.default_backend()
            use_pallas = (platform == "tpu" and _pallas_enabled()
                          and os.environ.get(
                              "CONTROL_TPU_APPLY3D_PALLAS") == "1"
                          and _vmem_ok_3d_apply(d, *x.shape[-3:], x.dtype))
        if use_pallas:
            return _apply_3d_pallas(w, x, d)
        return _apply_xla(w, x, degree, nd=nd)
    if nd != 2 or _is_vector_stencil(w, nd):
        return _apply_xla(w, x, degree, nd=nd)
    if use_pallas is None:
        try:
            platform = next(iter(x.devices())).platform  # concrete array
        except Exception:
            platform = jax.default_backend()             # tracer
        use_pallas = (platform == "tpu" and _pallas_enabled()
                      and not jnp.iscomplexobj(x)        # Mosaic: real only
                      and _vmem_ok(degree, x.shape[-2], x.shape[-1], x.dtype))
    if not use_pallas:
        return _apply_xla(w, x, degree)

    ny, nx = x.shape[-2:]
    x_b = x if x.ndim == 3 else x[None]
    batch = x_b.shape[0]
    w_b = w if w.ndim == 4 else w[None]
    w_batched = w_b.shape[0] == batch and batch > 1
    if not w_batched and w_b.shape[0] != 1:
        raise ValueError("stencil batch mismatch")
    pad = [(0, 0), (d, d), (d, d)]
    xp = jnp.pad(x_b, pad)
    call = _pallas_kernel(d, ny, nx, w_b.shape[1], x.dtype)
    y = call(w_b, xp, batch, w_batched)
    return y if x.ndim == 3 else y[0]


def _expand_bound(s, b):
    """Reshape a scalar or per-batch (n,) Chebyshev bound so it broadcasts
    against fields shaped (n, ny, nx) / (ny, nx)."""
    s = jnp.asarray(s)
    if s.ndim == 0:
        return s
    return s.reshape(s.shape + (1,) * (b.ndim - s.ndim))


def fused_cheb_smooth(w, dinv, b, x0, steps, theta, delta, degree,
                      want_residual=False, use_pallas=None,
                      interpret=False, weight_dtype=None, nd=2):
    """``steps`` Chebyshev-Jacobi smoothing iterations (+ optionally the
    final residual) as ONE fused kernel on TPU.

    w: (K, ny, nx) or (n, K, ny, nx); dinv/b/x0: (ny, nx) or (n, ny, nx);
    theta/delta: scalars or per-batch (n,) vectors (traced ok).  Complex
    operators (the ParaDiag frequency blocks) run as a re/im-pair Pallas
    kernel.  Returns x (and r = b - A x).

    ``weight_dtype`` (e.g. "bfloat16") stores the stencil-weight and
    Jacobi-diagonal planes in a narrower dtype while all field arithmetic
    stays in ``b.dtype``: the weight planes are the dominant share of the
    kernel's HBM/VMEM traffic (2K re/im planes vs ~8 field planes for the
    complex ParaDiag blocks), so this halves the bandwidth bill for an
    O(weight-rounding) operator perturbation -- which the ParaDiag defect
    correction absorbs like any other inexact frequency solve.  The XLA
    fallback applies the same rounding so both paths match numerically.
    """
    d = degree
    is_complex = jnp.iscomplexobj(b)
    is_vector = _is_vector_stencil(w, nd)
    if nd == 3:
        # generic whole-volume fused kernel: scalar, complex (ParaDiag
        # frequency blocks) and real vector spaces, gated on VMEM
        # residency of the K*C*C weight volumes -- the finest level of a
        # large 3-D hierarchy falls back to XLA, every coarser V-cycle
        # level fuses
        C3 = 2 if is_complex else (w.shape[-1] if is_vector else 1)
        if is_complex and is_vector:
            use_pallas = False               # complex-vector: XLA fallback
        lead3 = (b.ndim - 4) if is_vector else (b.ndim - 3)
        if lead3 > 1:
            use_pallas = False
        grid3 = b.shape[-4:-1] if is_vector else b.shape[-3:]
        if use_pallas is None:
            try:
                platform = next(iter(b.devices())).platform
            except Exception:
                platform = jax.default_backend()
            wb3 = (jnp.dtype(weight_dtype).itemsize
                   if weight_dtype is not None
                   else jnp.real(b).dtype.itemsize)
            use_pallas = (platform == "tpu" and _pallas_enabled()
                          and (not is_vector or _vector_pallas_enabled())
                          and _vmem_ok_nd3(d, C3, *grid3,
                                           jnp.real(b).dtype, wbytes=wb3))
        if use_pallas:
            return _fused_cheb_nd3(w, dinv, b, x0, steps, theta, delta,
                                   d, want_residual=want_residual,
                                   interpret=interpret,
                                   weight_dtype=weight_dtype)
        use_pallas = False
    if nd != 2:
        # only 2-D grids may reach the 2-D Pallas kernels below
        use_pallas = False
    if is_vector and (nd != 2 or is_complex or w.shape[-1] != 2
                      or b.ndim > 4 or not _vector_pallas_enabled()):
        # complex-vector (incompressible ParaDiag frequency blocks),
        # dim != 2 and extra-batched cases run the XLA fallback
        use_pallas = False
    ny, nx = b.shape[-3:-1] if is_vector else b.shape[-2:]
    if use_pallas is None:
        try:
            platform = next(iter(b.devices())).platform
        except Exception:
            platform = jax.default_backend()
        vmem = (_vmem_ok_complex(degree, ny, nx, jnp.real(b).dtype)
                if (is_complex or is_vector)
                else _vmem_ok(degree, ny, nx, b.dtype))
        use_pallas = (platform == "tpu" and _pallas_enabled() and vmem)

    if use_pallas and is_complex:
        return _fused_cheb_complex(w, dinv, b, x0, steps, theta, delta,
                                   degree, want_residual=want_residual,
                                   interpret=interpret,
                                   weight_dtype=weight_dtype)
    if use_pallas and is_vector:
        return _fused_cheb_vector(w, dinv, b, x0, steps, theta, delta,
                                  degree, want_residual=want_residual,
                                  interpret=interpret,
                                  weight_dtype=weight_dtype)
    if is_vector:
        use_pallas = False

    sigma1 = theta / delta

    if not use_pallas:
        if weight_dtype is not None:
            # mirror the kernel's weight rounding in the fallback
            wdt = jnp.dtype(weight_dtype)
            if is_complex:
                rdt = jnp.real(b).dtype
                w = (jnp.real(w).astype(wdt).astype(rdt)
                     + 1j * jnp.imag(w).astype(wdt).astype(rdt))
                dinv = (jnp.real(dinv).astype(wdt).astype(rdt)
                        + 1j * jnp.imag(dinv).astype(wdt).astype(rdt))
            else:
                w = w.astype(wdt).astype(b.dtype)
                dinv = dinv.astype(wdt).astype(b.dtype)
        from jax import lax as _lax
        theta_b = _expand_bound(theta, b)
        delta_b = _expand_bound(delta, b)
        sigma1_b = _expand_bound(sigma1, b)
        x = x0
        r = b - apply_stencil(w, x, d, use_pallas=False, nd=nd)
        p = (r * dinv) / theta_b
        x = x + p
        rho0 = jnp.broadcast_to(1.0 / sigma1_b,
                                sigma1_b.shape).astype(jnp.real(b).dtype)

        # rolled loop: keeps the traced graph O(1) in the step count (the
        # unrolled variant dominates XLA compile time for the nested
        # incompressible programs)
        def body(_, carry):
            x, p, rho = carry
            r = b - apply_stencil(w, x, d, use_pallas=False, nd=nd)
            rho_new = 1.0 / (2.0 * sigma1_b - rho)
            p = rho_new * rho * p + (2.0 * rho_new / delta_b) * (r * dinv)
            return (x + p, p, rho_new)

        x, p, _ = _lax.fori_loop(0, steps - 1, body, (x, p, rho0))
        if want_residual:
            r = b - apply_stencil(w, x, d, use_pallas=False, nd=nd)
            return x, r
        return x

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offs = stencil_offsets(d)
    K = len(offs)
    batched = b.ndim == 3
    x_b = x0 if batched else x0[None]
    b_b = b if batched else b[None]
    dinv_b = dinv if batched else dinv[None]
    w_b = w if w.ndim == 4 else w[None]
    n = b_b.shape[0]
    w_per_batch = w_b.shape[0] == n and n > 1
    dtype = b.dtype
    wdt = jnp.dtype(weight_dtype) if weight_dtype is not None else dtype
    # scalar bounds shared across the batch, or per-batch (n,) vectors
    # (batched ParaDiag hierarchies): one (n, 1) SMEM array either way
    th = jnp.broadcast_to(jnp.asarray(theta, dtype).reshape(-1, 1), (n, 1))
    de = jnp.broadcast_to(jnp.asarray(delta, dtype).reshape(-1, 1), (n, 1))

    def kernel(th_ref, de_ref, w_ref, dinv_ref, b_ref, x_ref,
               out_ref, r_ref, xp):
        i = pl.program_id(0)
        theta_ = th_ref[i, 0]
        delta_ = de_ref[i, 0]
        sigma1_ = theta_ / delta_
        xp[:] = jnp.zeros_like(xp)
        xp[d:d + ny, d:d + nx] = x_ref[0]

        def stencil():
            acc = w_ref[0, 0].astype(dtype) \
                * xp[d + offs[0][0]: d + offs[0][0] + ny,
                     d + offs[0][1]: d + offs[0][1] + nx]
            for k in range(1, K):
                dy, dx_ = offs[k]
                acc = acc + w_ref[0, k].astype(dtype) \
                    * xp[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
            return acc

        r = b_ref[0] - stencil()
        p = (r * dinv_ref[0].astype(dtype)) / theta_
        xp[d:d + ny, d:d + nx] = xp[d:d + ny, d:d + nx] + p
        rho = 1.0 / sigma1_
        for _ in range(steps - 1):
            r = b_ref[0] - stencil()
            rho_new = 1.0 / (2.0 * sigma1_ - rho)
            p = rho_new * rho * p + (2.0 * rho_new / delta_) \
                * (r * dinv_ref[0].astype(dtype))
            xp[d:d + ny, d:d + nx] = xp[d:d + ny, d:d + nx] + p
            rho = rho_new
        out_ref[0] = xp[d:d + ny, d:d + nx]
        r_ref[0] = b_ref[0] - stencil()

    w_index = (lambda i: (i, 0, 0, 0)) if w_per_batch else \
        (lambda i: (0, 0, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    x_out, r_out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[smem, smem,
                  pl.BlockSpec((1, K, ny, nx), w_index,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, ny, nx), dtype),
                   jax.ShapeDtypeStruct((n, ny, nx), dtype)),
        scratch_shapes=[pltpu.VMEM((ny + 2 * d, nx + 2 * d), dtype)],
    )(th, de, w_b.astype(wdt),
      jnp.broadcast_to(dinv_b, b_b.shape).astype(wdt),
      b_b, jnp.broadcast_to(x_b, b_b.shape))
    if not batched:
        x_out, r_out = x_out[0], r_out[0]
    return (x_out, r_out) if want_residual else x_out


def _fused_cheb_complex(w, dinv, b, x0, steps, theta, delta, degree,
                        want_residual=False, interpret=False,
                        weight_dtype=None):
    """Complex fused Chebyshev-Jacobi smoother: the ParaDiag frequency
    blocks (F + mu_k S) are complex, Mosaic is real-only, so the kernel
    streams re/im weight planes through VMEM once and runs all ``steps``
    iterations with explicit complex arithmetic.  The (2K) weight planes
    stay VMEM-resident across the whole smoothing sweep -- the XLA
    fallback re-reads them from HBM every iteration, which dominates the
    preconditioner's memory traffic.

    w: (K, ny, nx) or (n, K, ny, nx) complex; dinv/b/x0: (..., ny, nx)
    complex; theta/delta: real scalars or per-batch (n,) vectors.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = degree
    offs = stencil_offsets(d)
    K = len(offs)
    ny, nx = b.shape[-2:]
    batched = b.ndim == 3
    b_b = b if batched else b[None]
    x_b = x0 if batched else x0[None]
    dinv_b = dinv if batched else dinv[None]
    w_b = w if w.ndim == 4 else w[None]
    n = b_b.shape[0]
    w_per_batch = w_b.shape[0] == n and n > 1
    if not w_per_batch and w_b.shape[0] != 1:
        raise ValueError("stencil batch mismatch")
    rdtype = jnp.real(b).dtype
    wdt = jnp.dtype(weight_dtype) if weight_dtype is not None else rdtype
    dinv_b = jnp.broadcast_to(dinv_b, b_b.shape)
    x_b = jnp.broadcast_to(x_b, b_b.shape)
    th = jnp.broadcast_to(
        jnp.asarray(theta, rdtype).reshape(-1, 1), (n, 1))
    de = jnp.broadcast_to(
        jnp.asarray(delta, rdtype).reshape(-1, 1), (n, 1))

    def kernel(th_ref, de_ref, wr_ref, wi_ref, dr_ref, di_ref,
               br_ref, bi_ref, xr_ref, xi_ref,
               oxr_ref, oxi_ref, rr_ref, ri_ref, xpr, xpi):
        i = pl.program_id(0)
        theta_ = th_ref[i, 0]
        delta_ = de_ref[i, 0]
        sigma1_ = theta_ / delta_
        xpr[:] = jnp.zeros_like(xpr)
        xpi[:] = jnp.zeros_like(xpi)
        xpr[d:d + ny, d:d + nx] = xr_ref[0]
        xpi[d:d + ny, d:d + nx] = xi_ref[0]

        def stencil():
            dy, dx_ = offs[0]
            sr = xpr[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
            si = xpi[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
            wr0 = wr_ref[0, 0].astype(rdtype)
            wi0 = wi_ref[0, 0].astype(rdtype)
            ar = wr0 * sr - wi0 * si
            ai = wr0 * si + wi0 * sr
            for k in range(1, K):
                dy, dx_ = offs[k]
                sr = xpr[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
                si = xpi[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
                wrk = wr_ref[0, k].astype(rdtype)
                wik = wi_ref[0, k].astype(rdtype)
                ar = ar + wrk * sr - wik * si
                ai = ai + wrk * si + wik * sr
            return ar, ai

        def resid():
            ar, ai = stencil()
            return br_ref[0] - ar, bi_ref[0] - ai

        def cdinv(rr, ri):
            # (rr + i ri) * (dr + i di)
            dr = dr_ref[0].astype(rdtype)
            di = di_ref[0].astype(rdtype)
            return (rr * dr - ri * di, rr * di + ri * dr)

        rr, ri = resid()
        zr, zi = cdinv(rr, ri)
        pr = zr / theta_
        pi = zi / theta_
        xpr[d:d + ny, d:d + nx] = xpr[d:d + ny, d:d + nx] + pr
        xpi[d:d + ny, d:d + nx] = xpi[d:d + ny, d:d + nx] + pi
        rho = 1.0 / sigma1_
        for _ in range(steps - 1):
            rr, ri = resid()
            zr, zi = cdinv(rr, ri)
            rho_new = 1.0 / (2.0 * sigma1_ - rho)
            c = 2.0 * rho_new / delta_
            pr = rho_new * rho * pr + c * zr
            pi = rho_new * rho * pi + c * zi
            xpr[d:d + ny, d:d + nx] = xpr[d:d + ny, d:d + nx] + pr
            xpi[d:d + ny, d:d + nx] = xpi[d:d + ny, d:d + nx] + pi
            rho = rho_new
        oxr_ref[0] = xpr[d:d + ny, d:d + nx]
        oxi_ref[0] = xpi[d:d + ny, d:d + nx]
        rr, ri = resid()
        rr_ref[0] = rr
        ri_ref[0] = ri

    w_index = (lambda i: (i, 0, 0, 0)) if w_per_batch else \
        (lambda i: (0, 0, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fld = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wsp = pl.BlockSpec((1, K, ny, nx), w_index, memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET)
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[smem, smem, wsp, wsp, fld, fld, fld, fld, fld, fld],
        out_specs=(fld, fld, fld, fld),
        out_shape=tuple(jax.ShapeDtypeStruct((n, ny, nx), rdtype)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((ny + 2 * d, nx + 2 * d), rdtype),
                        pltpu.VMEM((ny + 2 * d, nx + 2 * d), rdtype)],
        interpret=interpret,
        **kwargs,
    )(th, de, jnp.real(w_b).astype(wdt), jnp.imag(w_b).astype(wdt),
      jnp.real(dinv_b).astype(wdt), jnp.imag(dinv_b).astype(wdt),
      jnp.real(b_b), jnp.imag(b_b),
      jnp.real(x_b), jnp.imag(x_b))
    x_out = outs[0] + 1j * outs[1]
    r_out = outs[2] + 1j * outs[3]
    if not batched:
        x_out, r_out = x_out[0], r_out[0]
    return (x_out, r_out) if want_residual else x_out


def _fused_cheb_vector(w, dinv, b, x0, steps, theta, delta, degree,
                       want_residual=False, interpret=False,
                       weight_dtype=None):
    """Fused Chebyshev-Jacobi smoother for 2-D vector (dim=2) spaces: the
    dim x dim coupling blocks stream through VMEM once as FOUR weight
    planes per offset (w00, w01, w10, w11) and all ``steps`` iterations
    run with explicit component arithmetic.  Same kernel structure as the
    complex smoother -- complex multiplication is the special coupling
    [[wr, -wi], [wi, wr]] -- so the velocity (Stokes/NSE) V-cycles and
    mass solves get the same VMEM-resident-weights treatment as the
    scalar/ParaDiag ones.

    w: (K, ny, nx, 2, 2) or (n, K, ny, nx, 2, 2); dinv/b/x0:
    (..., ny, nx, 2); theta/delta: scalars or per-batch (n,) vectors.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = degree
    offs = stencil_offsets(d)
    K = len(offs)
    ny, nx = b.shape[-3:-1]
    batched = b.ndim == 4
    b_b = b if batched else b[None]
    x_b = x0 if batched else x0[None]
    dinv_b = dinv if batched else dinv[None]
    w_b = w if w.ndim == 6 else w[None]
    n = b_b.shape[0]
    w_per_batch = w_b.shape[0] == n and n > 1
    if not w_per_batch and w_b.shape[0] != 1:
        raise ValueError("stencil batch mismatch")
    dtype = b.dtype
    wdt = jnp.dtype(weight_dtype) if weight_dtype is not None else dtype
    dinv_b = jnp.broadcast_to(dinv_b, b_b.shape)
    x_b = jnp.broadcast_to(x_b, b_b.shape)
    th = jnp.broadcast_to(jnp.asarray(theta, dtype).reshape(-1, 1), (n, 1))
    de = jnp.broadcast_to(jnp.asarray(delta, dtype).reshape(-1, 1), (n, 1))

    def kernel(th_ref, de_ref, w00_ref, w01_ref, w10_ref, w11_ref,
               d0_ref, d1_ref, b0_ref, b1_ref, x0_ref, x1_ref,
               ox0_ref, ox1_ref, r0_ref, r1_ref, xp0, xp1):
        i = pl.program_id(0)
        theta_ = th_ref[i, 0]
        delta_ = de_ref[i, 0]
        sigma1_ = theta_ / delta_
        xp0[:] = jnp.zeros_like(xp0)
        xp1[:] = jnp.zeros_like(xp1)
        xp0[d:d + ny, d:d + nx] = x0_ref[0]
        xp1[d:d + ny, d:d + nx] = x1_ref[0]

        def stencil():
            dy, dx_ = offs[0]
            s0 = xp0[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
            s1 = xp1[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
            a0 = (w00_ref[0, 0].astype(dtype) * s0
                  + w01_ref[0, 0].astype(dtype) * s1)
            a1 = (w10_ref[0, 0].astype(dtype) * s0
                  + w11_ref[0, 0].astype(dtype) * s1)
            for k in range(1, K):
                dy, dx_ = offs[k]
                s0 = xp0[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
                s1 = xp1[d + dy: d + dy + ny, d + dx_: d + dx_ + nx]
                a0 = a0 + (w00_ref[0, k].astype(dtype) * s0
                           + w01_ref[0, k].astype(dtype) * s1)
                a1 = a1 + (w10_ref[0, k].astype(dtype) * s0
                           + w11_ref[0, k].astype(dtype) * s1)
            return a0, a1

        def resid():
            a0, a1 = stencil()
            return b0_ref[0] - a0, b1_ref[0] - a1

        r0, r1 = resid()
        p0 = (r0 * d0_ref[0].astype(dtype)) / theta_
        p1 = (r1 * d1_ref[0].astype(dtype)) / theta_
        xp0[d:d + ny, d:d + nx] = xp0[d:d + ny, d:d + nx] + p0
        xp1[d:d + ny, d:d + nx] = xp1[d:d + ny, d:d + nx] + p1
        rho = 1.0 / sigma1_
        for _ in range(steps - 1):
            r0, r1 = resid()
            rho_new = 1.0 / (2.0 * sigma1_ - rho)
            c = 2.0 * rho_new / delta_
            p0 = rho_new * rho * p0 + c * (r0 * d0_ref[0].astype(dtype))
            p1 = rho_new * rho * p1 + c * (r1 * d1_ref[0].astype(dtype))
            xp0[d:d + ny, d:d + nx] = xp0[d:d + ny, d:d + nx] + p0
            xp1[d:d + ny, d:d + nx] = xp1[d:d + ny, d:d + nx] + p1
            rho = rho_new
        ox0_ref[0] = xp0[d:d + ny, d:d + nx]
        ox1_ref[0] = xp1[d:d + ny, d:d + nx]
        r0, r1 = resid()
        r0_ref[0] = r0
        r1_ref[0] = r1

    w_index = (lambda i: (i, 0, 0, 0)) if w_per_batch else \
        (lambda i: (0, 0, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fld = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wsp = pl.BlockSpec((1, K, ny, nx), w_index, memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET)
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[smem, smem, wsp, wsp, wsp, wsp,
                  fld, fld, fld, fld, fld, fld],
        out_specs=(fld, fld, fld, fld),
        out_shape=tuple(jax.ShapeDtypeStruct((n, ny, nx), dtype)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((ny + 2 * d, nx + 2 * d), dtype),
                        pltpu.VMEM((ny + 2 * d, nx + 2 * d), dtype)],
        interpret=interpret,
        **kwargs,
    )(th, de,
      w_b[..., 0, 0].astype(wdt), w_b[..., 0, 1].astype(wdt),
      w_b[..., 1, 0].astype(wdt), w_b[..., 1, 1].astype(wdt),
      dinv_b[..., 0].astype(wdt), dinv_b[..., 1].astype(wdt),
      b_b[..., 0], b_b[..., 1], x_b[..., 0], x_b[..., 1])
    x_out = jnp.stack(outs[:2], axis=-1)
    r_out = jnp.stack(outs[2:], axis=-1)
    if not batched:
        x_out, r_out = x_out[0], r_out[0]
    return (x_out, r_out) if want_residual else x_out


_VMEM_CHIP_BYTES = 120 * 2**20     # 128 MiB physical minus headroom


def _vmem_ok_nd3(degree, C, nz, ny, nx, rdtype, wbytes=None):
    """Whole-volume residency feasibility for the generic 3-D fused
    smoother.  Mosaic DOUBLE-BUFFERS every streamed input window (verified
    on-chip: 'input window ... has 2 buffering levels' in the v5e OOM
    report), so inputs count twice; scratch (xp + p) counts once.  Checked
    against the physical per-core VMEM (v5e: 128 MiB), not the scoped
    budget."""
    K = (2 * degree + 1) ** 3
    pb = _padded_plane_bytes(ny, nx, rdtype)
    wb = pb if wbytes is None else pb * wbytes // jnp.dtype(rdtype).itemsize
    d = degree
    ppad = (nz + 2 * d) * _padded_plane_bytes(ny + 2 * d, nx + 2 * d,
                                              rdtype)
    inputs = (K * C * C * nz * wb          # weights
              + C * C * nz * wb            # dinv
              + 2 * C * nz * pb)           # b, x0
    outputs = 2 * C * nz * pb              # x, r
    scratch = C * ppad + C * nz * pb       # xp, p
    return 2 * (inputs + outputs) + scratch < _VMEM_CHIP_BYTES


def _coupled_form_3d(w, dinv, b, x0, is_complex, dim):
    """Normalize the 3-D smoother inputs to real 'coupled' form:

        fields  (n, C, nz, ny, nx)
        weights (nw, K, C, C, nz, ny, nx)
        dinv    (n, C, C, nz, ny, nx)

    C = 1 (scalar), 2 (complex: coupling [[re, -im], [im, re]]), or dim.
    Returns (wc, dc, bc, xc, C, decode) where decode maps the kernel's
    (n, C, nz, ny, nx) output back to the caller's layout."""
    if is_complex:
        wr, wi = jnp.real(w), jnp.imag(w)
        wc = jnp.stack([jnp.stack([wr, -wi], axis=-1),
                        jnp.stack([wi, wr], axis=-1)], axis=-2)
        # -> (..., K, nz, ny, nx, C, C); move couplings behind K
        wc = jnp.moveaxis(jnp.moveaxis(wc, -1, -5), -1, -5)
        dr, di = jnp.real(dinv), jnp.imag(dinv)
        dc = jnp.stack([jnp.stack([dr, -di], axis=-1),
                        jnp.stack([di, dr], axis=-1)], axis=-2)
        dc = jnp.moveaxis(jnp.moveaxis(dc, -1, -5), -1, -5)
        bc = jnp.stack([jnp.real(b), jnp.imag(b)], axis=-4)
        xc = jnp.stack([jnp.real(x0), jnp.imag(x0)], axis=-4)

        def decode(y):
            return y[..., 0, :, :, :] + 1j * y[..., 1, :, :, :]
        return wc, dc, bc, xc, 2, decode
    if dim:
        # w: (..., K, nz, ny, nx, dim, dim); fields (..., nz, ny, nx, dim)
        wc = jnp.moveaxis(jnp.moveaxis(w, -1, -5), -1, -5)
        dd = jnp.zeros(dinv.shape[:-4] + (dim, dim) + dinv.shape[-4:-1],
                       dinv.dtype)
        dmoved = jnp.moveaxis(dinv, -1, -4)        # (..., dim, nz, ny, nx)
        for c in range(dim):
            dd = dd.at[..., c, c, :, :, :].set(dmoved[..., c, :, :, :])
        bc = jnp.moveaxis(b, -1, -4)
        xc = jnp.moveaxis(x0, -1, -4)

        def decode(y):
            return jnp.moveaxis(y, -4, -1)
        return wc, dd, bc, xc, dim, decode
    raise ValueError("scalar inputs are coupled inline by the caller")


def _fused_cheb_nd3(w, dinv, b, x0, steps, theta, delta, degree,
                    want_residual=False, interpret=False,
                    weight_dtype=None):
    """Generic fused 3-D Chebyshev-Jacobi smoother (whole volumes VMEM
    resident; one kernel runs all ``steps`` iterations with the K*(C*C)
    weight volumes read from HBM once instead of once per step).

    Covers scalar (C=1), complex ParaDiag frequency blocks (C=2 coupled
    real form) and vector spaces (C=dim) via ``_coupled_form_3d``.  The
    caller gates on `_vmem_ok_nd3`; oversize volumes (e.g. the 64^3
    finest level) stay on the XLA fallback while every coarser V-cycle
    level dispatches here.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = degree
    offs = stencil_offsets(d, 3)
    K = len(offs)
    is_complex = jnp.iscomplexobj(b)
    is_vector = _is_vector_stencil(w, 3)
    dim = w.shape[-1] if is_vector else None
    grid3 = b.shape[-4:-1] if is_vector else b.shape[-3:]
    nz, ny, nx = grid3
    lead = (b.ndim - 4) if is_vector else (b.ndim - 3)
    batched = lead == 1
    b_b = b if batched else b[None]
    x_b = jnp.broadcast_to(x0 if batched else x0[None], b_b.shape)
    dinv_b = jnp.broadcast_to(dinv if batched else dinv[None], b_b.shape)
    w_has_batch = w.ndim == (7 if is_vector else 5)
    w_b = w if w_has_batch else w[None]
    n = b_b.shape[0]
    w_per_batch = w_b.shape[0] == n and n > 1
    if not w_per_batch and w_b.shape[0] != 1:
        raise ValueError("stencil batch mismatch")
    rdtype = jnp.real(b).dtype
    wdt = jnp.dtype(weight_dtype) if weight_dtype is not None else rdtype

    if is_complex or is_vector:
        wc, dc, bc, xc, C, decode = _coupled_form_3d(
            w_b, dinv_b, b_b, x_b, is_complex, dim)
    else:
        C = 1
        wc = w_b[:, :, None, None]                 # (nw, K, 1, 1, nz, ny, nx)
        dc = dinv_b[:, None, None]                 # (n, 1, 1, nz, ny, nx)
        bc = b_b[:, None]
        xc = x_b[:, None]
        decode = None

    nw = wc.shape[0]
    # flatten to 4-D refs: (axis0, planes, ny, nx)
    w_f = wc.reshape(nw, K * C * C * nz, ny, nx).astype(wdt)
    d_f = dc.reshape(n, C * C * nz, ny, nx).astype(wdt)
    b_f = bc.reshape(n, C * nz, ny, nx)
    x_f = xc.reshape(n, C * nz, ny, nx)
    th = jnp.broadcast_to(jnp.asarray(theta, rdtype).reshape(-1, 1), (n, 1))
    de = jnp.broadcast_to(jnp.asarray(delta, rdtype).reshape(-1, 1), (n, 1))
    pz, py, px = nz + 2 * d, ny + 2 * d, nx + 2 * d

    def kernel(th_ref, de_ref, w_ref, d_ref, b_ref, x_ref,
               ox_ref, r_ref, xp, pp):
        i = pl.program_id(0)
        theta_ = th_ref[i, 0]
        delta_ = de_ref[i, 0]
        sigma1_ = theta_ / delta_
        xp[:] = jnp.zeros_like(xp)
        for c in range(C):
            xp[c * pz + d: c * pz + d + nz, d: d + ny, d: d + nx] = \
                x_ref[0, c * nz: (c + 1) * nz].astype(rdtype)

        def wvol(k, r, c):
            q = ((k * C + r) * C + c) * nz
            return w_ref[0, q: q + nz].astype(rdtype)

        def dvol(r, c):
            q = (r * C + c) * nz
            return d_ref[0, q: q + nz].astype(rdtype)

        def xshift(c, oz, oy, ox_):
            return xp[c * pz + d + oz: c * pz + d + oz + nz,
                      d + oy: d + oy + ny, d + ox_: d + ox_ + nx]

        def resid():
            rs = []
            for r in range(C):
                acc = None
                for k, (oz, oy, ox_) in enumerate(offs):
                    for c in range(C):
                        t = wvol(k, r, c) * xshift(c, oz, oy, ox_)
                        acc = t if acc is None else acc + t
                rs.append(b_ref[0, r * nz: (r + 1) * nz] - acc)
            return rs

        def precond(rs):
            zs = []
            for r in range(C):
                acc = None
                for c in range(C):
                    t = dvol(r, c) * rs[c]
                    acc = t if acc is None else acc + t
                zs.append(acc)
            return zs

        rs = resid()
        zs = precond(rs)
        for c in range(C):
            p0 = zs[c] / theta_
            pp[c * nz: (c + 1) * nz] = p0
            xp[c * pz + d: c * pz + d + nz, d: d + ny, d: d + nx] = \
                xp[c * pz + d: c * pz + d + nz, d: d + ny, d: d + nx] + p0

        # rolled step loop: the unrolled variant's Mosaic compile time
        # scales with steps * K * C^2 volume ops and becomes minutes at
        # V-cycle-level shapes; the p iterate lives in a scratch ref so
        # only the scalar rho is loop-carried
        def body(_, rho):
            rs = resid()
            zs = precond(rs)
            rho_new = 1.0 / (2.0 * sigma1_ - rho)
            cc = 2.0 * rho_new / delta_
            for c in range(C):
                p_new = (rho_new * rho * pp[c * nz: (c + 1) * nz]
                         + cc * zs[c])
                pp[c * nz: (c + 1) * nz] = p_new
                xp[c * pz + d: c * pz + d + nz, d: d + ny, d: d + nx] = \
                    xp[c * pz + d: c * pz + d + nz,
                       d: d + ny, d: d + nx] + p_new
            return rho_new

        jax.lax.fori_loop(0, steps - 1, body, 1.0 / sigma1_)
        for c in range(C):
            ox_ref[0, c * nz: (c + 1) * nz] = \
                xp[c * pz + d: c * pz + d + nz, d: d + ny, d: d + nx]
        rs = resid()
        for c in range(C):
            r_ref[0, c * nz: (c + 1) * nz] = rs[c]

    w_index = (lambda i: (i, 0, 0, 0)) if w_per_batch else \
        (lambda i: (0, 0, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fld = pl.BlockSpec((1, C * nz, ny, nx), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET)
    x_out, r_out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[smem, smem,
                  pl.BlockSpec((1, K * C * C * nz, ny, nx), w_index,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C * C * nz, ny, nx),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  fld, fld],
        out_specs=(fld, fld),
        out_shape=(jax.ShapeDtypeStruct((n, C * nz, ny, nx), rdtype),
                   jax.ShapeDtypeStruct((n, C * nz, ny, nx), rdtype)),
        scratch_shapes=[pltpu.VMEM((C * pz, py, px), rdtype),
                        pltpu.VMEM((C * nz, ny, nx), rdtype)],
        interpret=interpret,
        **kwargs,
    )(th, de, w_f, d_f, b_f, x_f)

    def unflat(y):
        y = y.reshape(n, C, nz, ny, nx)
        if decode is not None:
            y = decode(y)
        else:
            y = y[:, 0]
        return y if batched else y[0]

    x_fin, r_fin = unflat(x_out), unflat(r_out)
    return (x_fin, r_fin) if want_residual else x_fin


def stencil_diag(w, vector, nd=2):
    """Assembled diagonal from stencil weights: (..., *grid[, dim])."""
    if vector:
        K = w.shape[-(nd + 3)]
        c = jnp.take(w, K // 2, axis=w.ndim - (nd + 3))
        return jnp.diagonal(c, axis1=-2, axis2=-1)
    K = w.shape[-(nd + 1)]
    return jnp.take(w, K // 2, axis=-(nd + 1))


def stencil_abs_rowsum(w, vector, nd=2):
    """Row sums of |weights| (Gershgorin): (..., *grid[, dim])."""
    if vector:
        return jnp.sum(jnp.abs(w), axis=(-(nd + 3), -1))
    return jnp.sum(jnp.abs(w), axis=-(nd + 1))


class StencilOp:
    """Matrix-free operator in node-stencil form: a single fused kernel on
    TPU for scalar spaces, fused shift/multiply-adds with dim x dim
    coupling blocks for vector spaces.

    Equivalent to (Masked)LocalOp.apply.
    """

    def __init__(self, space, w, degree=None):
        self.space = space
        self.w = w
        self.degree = space.degree if degree is None else degree
        self.nd = space.ndim

    @classmethod
    def from_local(cls, op, mask=None, alpha=1.0):
        from .local_op import MaskedOp
        if isinstance(op, MaskedOp):
            mask = op.mask if mask is None else mask
            alpha = op.alpha
            op = op.op
        w = node_stencil(op.A, op.trial_space, mask=mask, alpha=alpha)
        return cls(op.trial_space, w)

    def apply(self, x):
        return apply_stencil(self.w, x, self.degree, nd=self.nd)

    def __call__(self, x):
        return self.apply(x)

    def diag(self):
        return stencil_diag(self.w, self.space.dim is not None, nd=self.nd)

    def abs_rowsum(self):
        return stencil_abs_rowsum(self.w, self.space.dim is not None,
                                  nd=self.nd)
