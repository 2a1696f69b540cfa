"""Geometric multigrid on structured meshes.

The TPU-native stand-in for hypre BoomerAMG, which the reference applies as
a black box to every stiffness-like block (one application, boomeramg
max_iter 2; reference control/control.py:356-416,2056-2067).  Nested
uniform refinement gives exact coarse-space embeddings for every element
this framework supports (Q1/Q2 quads and P1/P2 triangle pairs -- the
triangulation refines into itself), so we use:

* prolongation  P  = per-coarse-cell tabulation of the coarse basis at fine
  node positions (with multiplicity averaging on shared nodes),
* restriction   R  = P^T,
* coarse operators by Galerkin RAP computed directly on per-cell local
  matrices (handles variable-coefficient and nonsymmetric operators --
  convection-diffusion, Picard-linearised Navier-Stokes),
* Chebyshev-Jacobi smoothing with a power-iteration bound,
* a dense LU solve on the coarsest level.

Everything is jnp-traceable: hierarchies build under ``jit``/``vmap`` (one
hierarchy per time block of the all-at-once system, batched).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..fem import elements
from ..fem.space import FunctionSpace
from ..ops.local_op import LocalOp, MaskedOp, _global_indices


# ---------------------------------------------------------------------------
# static transfer tensors
# ---------------------------------------------------------------------------

def _child_embedding(cell, degree, ndim=2):
    """P_k (2**ndim, nloc, nloc): coarse basis tabulated at the node
    positions of child cell k (children ordered k = [kz*2 +] ky)*2 + kx)."""
    offs = elements.cell_node_offsets(degree, ndim)  # (nloc, ndim), child ref
    Ps = []
    import itertools
    for kk in itertools.product((0, 1), repeat=ndim):
        shift = np.array(kk[::-1], dtype=np.float64)  # (kx, ky[, kz])
        pts = 0.5 * (offs + shift)                   # coarse-ref coords
        N, _ = elements.tabulate_scalar(cell, degree, pts)
        Ps.append(N)                                 # (nloc_fine, nloc_coarse)
    return np.stack(Ps)


def _cell_prolongation(cell, degree, ndim=2):
    """(nfl, nc): coarse basis at the (2d+1)**ndim fine-node positions of a
    coarse cell (major-to-minor ordering, matching a degree-2d virtual
    space)."""
    d2 = 2 * degree
    offs = elements.cell_node_offsets(d2, ndim)      # (nfl, ndim)
    N, _ = elements.tabulate_scalar(cell, degree, offs)
    return N                                         # (nfl, nc)


def _vec_block(P, dim):
    """Blow up (m, n) to ((m*dim), (n*dim)) with interleaved components."""
    m, n = P.shape
    out = np.zeros((m * dim, n * dim))
    for c in range(dim):
        out[c::dim, c::dim] = P
    return out


class Transfer:
    """Grid transfer between a degree-d space and its coarsened mesh.

    Interpolation is translation-invariant on a uniform mesh, so
    prolongation / restriction lower to a single strided/dilated XLA
    convolution (one MXU op) with the kernel tabulated from the coarse
    basis (valid for quads AND triangle pairs; zero padding yields the
    correct boundary clipping)."""

    def __init__(self, fine_space):
        mesh_c = fine_space.mesh.coarsen()
        self.fine = fine_space
        self.ndim = fine_space.ndim
        self.coarse = FunctionSpace(mesh_c, degree=fine_space.degree,
                                    dim=fine_space.dim)
        # virtual degree-2d space on the coarse mesh shares the fine grid
        self.virt = FunctionSpace(mesh_c, degree=2 * fine_space.degree,
                                  dim=fine_space.dim)
        assert self.virt.grid_shape == fine_space.grid_shape
        dtype = fine_space.mesh.dtype
        P = _cell_prolongation(fine_space.mesh.cell, fine_space.degree,
                               self.ndim)
        self._P_cell = jnp.asarray(P, dtype)         # (nfl_s, nc_s) scalar
        ones = jnp.ones((mesh_c.n_cells, self.virt.nloc), dtype)
        self.mult = self.virt.scatter_add(ones)      # multiplicity grid
        Pk = _child_embedding(fine_space.mesh.cell, fine_space.degree,
                              self.ndim)
        if fine_space.dim is not None:
            Pk = np.stack([_vec_block(p, fine_space.dim) for p in Pk])
        self._P_child = jnp.asarray(Pk, dtype)       # (2**ndim, nloc_f, nloc_c)

        # translation-invariant interpolation kernel: coarse scalar basis at
        # fine-node offsets o in [-(2d-1), 2d-1]^ndim.  Only consumed by the
        # degree-1 conv fast path, where the Q1 nodal basis is separable:
        # the n-D kernel is the outer power of the 1-D hat stencil.
        d = fine_space.degree
        L = 2 * d - 1
        if d == 1 and fine_space.mesh.cell in ("quad", "hex"):
            # tensor-product Q1 basis is separable: outer power of the hat
            k1 = np.array([0.5, 1.0, 0.5])
            kap = k1
            for _ in range(self.ndim - 1):
                kap = np.multiply.outer(kap, k1)
            self._kappa = jnp.asarray(kap, dtype)
        elif self.ndim == 2:
            # general (triangle-pair) 2-D kernel: coarse nodal basis (node
            # at the origin, i.e. a cell corner) tabulated per quadrant
            offs = np.arange(-L, L + 1) / (2.0 * d)  # coarse cell-ref units
            kappa = np.zeros((2 * L + 1, 2 * L + 1))
            for iy, oy in enumerate(offs):
                for ix, ox in enumerate(offs):
                    cx = 0.0 if ox >= 0 else -1.0    # cell containing point
                    cy = 0.0 if oy >= 0 else -1.0
                    lx = ox - cx
                    ly = oy - cy
                    ax = 0 if cx == 0.0 else d
                    ay = 0 if cy == 0.0 else d
                    a = ay * (d + 1) + ax
                    N, _ = elements.tabulate_scalar(
                        fine_space.mesh.cell, d, np.array([[lx, ly]]))
                    kappa[iy, ix] = N[0, a]
            self._kappa = jnp.asarray(kappa, dtype)
        else:
            self._kappa = None                       # slow path only
        self._L = L

    # -- conv-based fast path ------------------------------------------------
    def _conv_shape(self, x, space):
        gs = space.grid_shape
        nd = space.ndim
        ng = nd if space.dim is None else nd + 1
        batch = x.shape[:-ng]
        if space.dim is None:
            xb = x.reshape((-1,) + gs)
            return xb[:, None], batch, None
        # fold components into the conv batch
        xb = jnp.moveaxis(x.reshape((-1,) + gs), -1, 1)
        xb = xb.reshape((-1, 1) + space.node_grid)
        return xb, batch, space.dim

    @staticmethod
    def _conv(xb, k, **kwargs):
        """Real-kernel convolution, complex-safe (XLA TPU convolutions are
        real-only; the ParaDiag frequency operators are complex)."""
        if jnp.iscomplexobj(xb):
            re = jax.lax.conv_general_dilated(jnp.real(xb), k, **kwargs)
            im = jax.lax.conv_general_dilated(jnp.imag(xb), k, **kwargs)
            return re + 1j * im
        return jax.lax.conv_general_dilated(xb, k, **kwargs)

    def prolong(self, xc):
        if self.fine.degree != 1:
            # higher-degree interpolation kernels are node-class dependent;
            # use the gather/scatter path
            return self.prolong_slow(xc)
        sp = self.coarse
        nd = self.ndim
        xb, batch, dim = self._conv_shape(xc, sp)
        L = self._L
        k = self._kappa[None, None]
        out = self._conv(
            xb, k, window_strides=(1,) * nd,
            padding=((L, L),) * nd, lhs_dilation=(2,) * nd,
            precision=jax.lax.Precision.HIGHEST)
        fg = self.fine.node_grid
        if dim is None:
            return out.reshape(batch + fg)
        out = out.reshape((-1, dim) + fg)
        out = jnp.moveaxis(out, 1, -1)
        return out.reshape(batch + fg + (dim,))

    def restrict(self, rf):
        if self.fine.degree != 1:
            return self.restrict_slow(rf)
        sp = self.fine
        nd = self.ndim
        rb, batch, dim = self._conv_shape(rf, sp)
        L = self._L
        k = self._kappa[None, None]
        out = self._conv(
            rb, k, window_strides=(2,) * nd,
            padding=((L, L),) * nd,
            precision=jax.lax.Precision.HIGHEST)
        cg = self.coarse.node_grid
        if dim is None:
            return out.reshape(batch + cg)
        out = out.reshape((-1, dim) + cg)
        out = jnp.moveaxis(out, 1, -1)
        return out.reshape(batch + cg + (dim,))

    # -- reference (gather/scatter) path, kept for verification --------------
    def _cellwise(self, M, xe):
        """Apply scalar cell matrix M to gathered coeffs (componentwise for
        vector spaces)."""
        sp = self.fine
        if sp.dim is None:
            return jnp.einsum("fa,...ea->...ef", M, xe)
        xs = xe.reshape(xe.shape[:-1] + (-1, sp.dim))
        out = jnp.einsum("fa,...eac->...efc", M, xs)
        return out.reshape(out.shape[:-2] + (-1,))

    def prolong_slow(self, xc):
        xe = self.coarse.gather(xc)
        xf = self._cellwise(self._P_cell, xe)
        return self.virt.scatter_add(xf) / self.mult

    def restrict_slow(self, rf):
        re = self.virt.gather(rf / self.mult)
        rc = self._cellwise(self._P_cell.T, re)
        return self.coarse.scatter_add(rc)

    def galerkin(self, A):
        """Coarse local matrices from fine local matrices A (*, E_f, b, a)."""
        mc = self.coarse.mesh
        nd = self.ndim
        nch = 2 ** nd
        if A.shape[-3] == 1:
            Af = jnp.broadcast_to(
                A[..., None, :, :, :],
                A.shape[:-3] + (nch, 1) + A.shape[-2:])
        else:
            batch = A.shape[:-3]
            cells = (mc.nz, mc.ny, mc.nx) if nd == 3 else (mc.ny, mc.nx)
            inter = sum(((c, 2) for c in cells), ())
            A4 = A.reshape(batch + inter + A.shape[-2:])
            nb = len(batch)
            # regroup (c0,2,c1,2[,c2,2]) -> (coarse cells..., children...)
            perm = (tuple(range(nb))
                    + tuple(nb + 2 * i for i in range(nd))
                    + tuple(nb + 2 * i + 1 for i in range(nd))
                    + (nb + 2 * nd, nb + 2 * nd + 1))
            A4 = A4.transpose(perm)
            A4 = A4.reshape(batch + (mc.n_cells, nch) + A.shape[-2:])
            Af = jnp.moveaxis(A4, -3, -4)              # (.., nch, E_c, b, a)
        # RAP per child: P_k^T A P_k summed over children
        Ac = jnp.einsum("kfc,...kefg,kgd->...ecd", self._P_child, Af,
                        self._P_child)
        return Ac


# ---------------------------------------------------------------------------
# multigrid solver
# ---------------------------------------------------------------------------

def _dense_inv(Ad):
    """Dense inverse; complex matrices (the ParaDiag frequency-space
    operators) invert via the equivalent real 2x2 block system, which
    lowers to real LU everywhere (TPU has no complex LU)."""
    if not jnp.iscomplexobj(Ad):
        return jnp.linalg.inv(Ad)
    Ar, Ai = jnp.real(Ad), jnp.imag(Ad)
    B = jnp.block([[Ar, -Ai], [Ai, Ar]])
    Binv = jnp.linalg.inv(B)
    m = Ad.shape[-1]
    return Binv[..., :m, :m] + 1j * Binv[..., m:, :m]


def _gershgorin_lambda_max(op, diag):
    """Guaranteed upper bound on the spectrum of D^{-1} A via Gershgorin row
    sums, computed from per-cell local matrices (a power-iteration estimate
    can undershoot and make Chebyshev smoothing divergent)."""
    inner = op.op if isinstance(op, MaskedOp) else op
    sp = inner.test_space
    E = sp.mesh.n_cells
    rs = jnp.sum(jnp.abs(inner.A), axis=-1)          # (E|1, b)
    rs = jnp.broadcast_to(rs, rs.shape[:-2] + (E, rs.shape[-1]))
    rowsum = sp.scatter_add(rs)
    if isinstance(op, MaskedOp):
        rowsum = jnp.where(op.mask, jnp.abs(diag), rowsum)
    return jnp.max(rowsum / jnp.abs(diag))


class MGConfig:
    """Static multigrid structure for one (space, mask) pair.

    Split into a static config and a params pytree so hierarchies can be
    built under ``vmap`` (one per time block of the all-at-once system;
    the reference instead re-runs BoomerAMG setup per block per pc
    application, control/control.py:2056-2067) and consumed inside
    ``lax.scan`` sweeps.
    """

    def __init__(self, space, mask=None, *, levels=None, pre=8, post=8,
                 coarse_max_dofs=4500, lam_frac=4.0, lam_safety=1.05,
                 weight_dtype=None):
        # weight_dtype (e.g. "bfloat16"): store the stencil-weight planes
        # of the fused smoothing kernels in a narrower dtype (field
        # arithmetic stays in the problem dtype) -- halves the smoother's
        # HBM/VMEM weight traffic for an O(rounding) operator
        # perturbation.  Stencil fast path only; ignored on the
        # gather/scatter path.
        self.weight_dtype = weight_dtype
        # default smoothing strength chosen on the 256^2 x 64 heat
        # benchmark: one V-cycle with 8+8 Chebyshev steps per Schur
        # substitution gives 9 outer GMRES iterations (vs 16-17 with
        # lighter smoothing) at lower total cost -- on TPU the per-op
        # dispatch latency dominates, so deeper fused smoothing kernels
        # are nearly free
        self.pre, self.post = pre, post
        self.lam_frac, self.lam_safety = lam_frac, lam_safety

        self.spaces = [space]
        self.transfers = []
        sp = space
        n_levels = 1
        while (levels is None or n_levels < levels):
            m = sp.mesh
            axes = ((m.nx, m.ny, m.nz) if getattr(m, "ndim", 2) == 3
                    else (m.nx, m.ny))
            if any(n % 2 for n in axes) or min(axes) <= 2:
                break
            if levels is None and sp.n_dofs <= coarse_max_dofs:
                break
            tr = Transfer(sp)
            self.transfers.append(tr)
            sp = tr.coarse
            self.spaces.append(sp)
            n_levels += 1

        half = (slice(None, None, 2),) * space.ndim
        self.masks = [mask]
        for _ in self.transfers:
            prev = self.masks[-1]
            if prev is None:
                self.masks.append(None)
            elif space.dim is None:
                self.masks.append(prev[half])
            else:
                self.masks.append(prev[half + (slice(None),)])

    def _ops(self, As):
        ops = []
        for A, sp_l, mk in zip(As, self.spaces, self.masks):
            o = LocalOp(A, sp_l, sp_l)
            ops.append(MaskedOp(o, mk) if mk is not None else o)
        return ops

    @property
    def use_stencil(self):
        # node-stencil fast path everywhere: (2d+1)**ndim stencils for
        # scalar spaces, dim x dim coupling blocks per offset for vector
        # spaces (2-D and 3-D)
        return True

    def _appliers(self, params):
        """Per-level apply callables (stencil fast path on scalar spaces)."""
        if self.use_stencil:
            from ..ops.stencil import apply_stencil
            return [
                (lambda w=w, d=sp.degree, nd=sp.ndim:
                 lambda x: apply_stencil(w, x, d, nd=nd))()
                for w, sp in zip(params["Ws"], self.spaces)]
        ops = self._ops(params["As"])
        return [o.apply for o in ops]

    def build(self, A):
        """Params pytree for fine-level local matrices ``A`` (E, b, a)."""
        As = [A]
        for tr in self.transfers:
            As.append(tr.galerkin(As[-1]))
        ops = self._ops(As)
        params = {"As": As}
        if self.use_stencil:
            from ..ops.stencil import (node_stencil, stencil_diag,
                                       stencil_abs_rowsum)
            vec = self.spaces[0].dim is not None
            Ws, diags, dinvs, lams = [], [], [], []
            for A_l, sp_l, mk in zip(As, self.spaces, self.masks):
                w = node_stencil(A_l, sp_l, mask=mk)
                Ws.append(w)
                d = stencil_diag(w, vec, nd=sp_l.ndim)
                d = jnp.where(d == 0, 1.0, d)
                diags.append(d)
                dinvs.append(1.0 / d)
                lams.append(jnp.max(stencil_abs_rowsum(w, vec,
                                                       nd=sp_l.ndim)
                                    / jnp.abs(d)))
            params = {"Ws": Ws, "diags": diags, "dinvs": dinvs,
                      "lams": jnp.stack(lams)}
        else:
            diags, lams = [], []
            for o in ops:
                d = o.diag()
                d = jnp.where(d == 0, 1.0, d)
                diags.append(d)
                lams.append(_gershgorin_lambda_max(o, d))
            params = {"As": As, "diags": diags, "lams": jnp.stack(lams)}
        # coarsest solve as a precomputed dense inverse: application is one
        # MXU matmul (triangular lu_solve is latency-bound on TPU and sits
        # inside the sequential Schur-sweep scans)
        Ad = ops[-1].to_dense()
        params["Ainv"] = _dense_inv(Ad)
        params["diags"] = diags
        params["lams"] = jnp.stack(lams)
        return params

    # -- application --------------------------------------------------------
    def _smooth(self, apply_fn, d, lam, b, x, steps):
        if steps == 0:
            return x
        from ..ops.stencil import _expand_bound
        lam = lam * self.lam_safety
        lmin = lam / self.lam_frac
        theta = _expand_bound(0.5 * (lam + lmin), b)
        delta = _expand_bound(0.5 * (lam - lmin), b)
        sigma1 = theta / delta
        r = b - apply_fn(x)
        p = (r / d) / theta
        x = x + p
        rho = 1.0 / sigma1
        for _ in range(steps - 1):
            r = b - apply_fn(x)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            p = rho_new * rho * p + (2.0 * rho_new / delta) * (r / d)
            x = x + p
            rho = rho_new
        return x

    def _bounds(self, lam):
        lam = lam * self.lam_safety
        lmin = lam / self.lam_frac
        theta = 0.5 * (lam + lmin)
        delta = 0.5 * (lam - lmin)
        return theta, delta

    def _vcycle(self, params, appliers, lvl, b, x):
        if lvl == len(appliers) - 1:
            gs = self.spaces[-1].grid_shape
            batch = b.shape[:-len(gs)]
            bf = b.reshape(batch + (-1,))
            # ellipsis broadcast: Ainv is (m, m) for a single hierarchy or
            # (n, m, m) for batched (ParaDiag per-frequency) hierarchies
            xs = jnp.einsum("...ij,...j->...i", params["Ainv"], bf,
                            precision=jax.lax.Precision.HIGHEST)
            return xs.reshape(b.shape)
        tr = self.transfers[lvl]
        mk = self.masks[lvl + 1]
        if self.use_stencil:
            from ..ops.stencil import fused_cheb_smooth
            w = params["Ws"][lvl]
            dinv = params["dinvs"][lvl]
            theta, delta = self._bounds(params["lams"][..., lvl])
            deg = self.spaces[lvl].degree
            nd = self.spaces[lvl].ndim
            x, r = fused_cheb_smooth(w, dinv, b, x, self.pre, theta, delta,
                                     deg, want_residual=True,
                                     weight_dtype=self.weight_dtype, nd=nd)
            rc = tr.restrict(r)
            if mk is not None:
                rc = jnp.where(mk, 0.0, rc)
            ec = self._vcycle(params, appliers, lvl + 1, rc,
                              jnp.zeros_like(rc))
            if mk is not None:
                ec = jnp.where(mk, 0.0, ec)
            x = x + tr.prolong(ec)
            x = fused_cheb_smooth(w, dinv, b, x, self.post, theta, delta,
                                  deg, weight_dtype=self.weight_dtype,
                                  nd=nd)
            return x
        x = self._smooth(appliers[lvl], params["diags"][lvl],
                         params["lams"][..., lvl], b, x, self.pre)
        r = b - appliers[lvl](x)
        rc = tr.restrict(r)
        if mk is not None:
            rc = jnp.where(mk, 0.0, rc)
        ec = self._vcycle(params, appliers, lvl + 1, rc, jnp.zeros_like(rc))
        if mk is not None:
            ec = jnp.where(mk, 0.0, ec)
        x = x + tr.prolong(ec)
        x = self._smooth(appliers[lvl], params["diags"][lvl],
                         params["lams"][..., lvl], b, x, self.post)
        return x

    def apply(self, params, b, x0=None, cycles=1):
        appliers = self._appliers(params)
        x = jnp.zeros_like(b) if x0 is None else x0
        for _ in range(cycles):
            x = self._vcycle(params, appliers, 0, b, x)
        return x


class Multigrid:
    """Galerkin geometric multigrid V-cycle for a LocalOp (+ optional
    Dirichlet mask).  ``solve(b, cycles=k)`` imitates one application of
    the reference's 'preonly + boomeramg, max_iter k' building block."""

    def __init__(self, op, mask=None, **kw):
        if isinstance(op, MaskedOp):
            mask = op.mask if mask is None else mask
            op = op.op
        assert op.trial_space == op.test_space
        self.config = MGConfig(op.trial_space, mask, **kw)
        self.params = self.config.build(op.A)

    def solve(self, b, x0=None, cycles=1):
        return self.config.apply(self.params, b, x0=x0, cycles=cycles)

    def __call__(self, b):
        return self.solve(b)
