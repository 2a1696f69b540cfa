"""Matrix-free local operators.

A ``LocalOp`` holds per-cell element matrices ``A`` with shape
``(*batch, E, b, a)`` (``E`` may be 1 for constant-coefficient forms -- the
broadcast saves memory and turns application into one large MXU matmul).
Operator application is

    y = scatter_add( A @ gather(x) )

which is the TPU-native replacement for PETSc assembled matrices + multAdd
(reference preconditioner/preconditioner.py:406-432).  Transposition is an
axis swap (the reference needs UFL ``adjoint``), diagonal extraction powers
Jacobi/Chebyshev smoothing, and everything is traceable under jit/vmap.
"""

import numpy as np
import jax.numpy as jnp


class LocalOp:
    def __init__(self, A, trial_space, test_space):
        self.A = A
        self.trial_space = trial_space
        self.test_space = test_space

    def apply(self, x):
        """x: (*xbatch, *trial_grid) -> (*ybatch, *test_grid)."""
        xe = self.trial_space.gather(x)                   # (*b, E, a)
        re = jnp.matmul(self.A, xe[..., None])[..., 0]    # (*b, E, bloc)
        return self.test_space.scatter_add(re)

    def __call__(self, x):
        return self.apply(x)

    @property
    def T(self):
        return LocalOp(jnp.swapaxes(self.A, -1, -2),
                       self.test_space, self.trial_space)

    def diag(self):
        """Assembled diagonal (same trial/test space only)."""
        assert self.trial_space == self.test_space
        d = jnp.diagonal(self.A, axis1=-2, axis2=-1)      # (*batch, E, nloc)
        E = self.trial_space.mesh.n_cells
        d = jnp.broadcast_to(d, d.shape[:-2] + (E, d.shape[-1]))
        return self.test_space.scatter_add(d)

    def __add__(self, other):
        if isinstance(other, LocalOp):
            assert (self.trial_space == other.trial_space
                    and self.test_space == other.test_space)
            return LocalOp(self.A + other.A, self.trial_space,
                           self.test_space)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, LocalOp):
            return self + (-1.0) * other
        return NotImplemented

    def __mul__(self, s):
        return LocalOp(self.A * s, self.trial_space, self.test_space)

    __rmul__ = __mul__

    def __neg__(self):
        return self * (-1.0)

    def to_dense(self):
        """Assemble the full dense matrix (small problems / coarse grids /
        tests).  Returns (n_test_dofs, n_trial_dofs)."""
        tr, te = self.trial_space, self.test_space
        gi_t = _global_indices(te)
        gi_a = _global_indices(tr)
        E = tr.mesh.n_cells
        A = jnp.broadcast_to(self.A,
                             self.A.shape[:-3] + (E,) + self.A.shape[-2:])
        if A.ndim != 3:
            raise ValueError("to_dense only for unbatched ops")
        out = jnp.zeros((te.n_dofs, tr.n_dofs), dtype=A.dtype)
        out = out.at[gi_t[:, :, None], gi_a[:, None, :]].add(A)
        return out


def _global_indices(space):
    """(E, nloc) int32 array of flattened global dof indices (numpy)."""
    d, m = space.degree, space.mesh
    dim = 1 if space.dim is None else space.dim
    if getattr(space, "ndim", 2) == 3:
        iz = np.arange(m.nz)[:, None, None, None, None, None]
        iy = np.arange(m.ny)[None, :, None, None, None, None]
        ix = np.arange(m.nx)[None, None, :, None, None, None]
        az = np.arange(d + 1)[None, None, None, :, None, None]
        ay = np.arange(d + 1)[None, None, None, None, :, None]
        ax = np.arange(d + 1)[None, None, None, None, None, :]
        node = ((d * iz + az) * space.nodes_y + (d * iy + ay)) \
            * space.nodes_x + (d * ix + ax)
        node = node.reshape(m.n_cells, (d + 1) ** 3)
    else:
        iy = np.arange(m.ny)[:, None, None, None]
        ix = np.arange(m.nx)[None, :, None, None]
        ay = (np.arange(d + 1))[None, None, :, None]
        ax = (np.arange(d + 1))[None, None, None, :]
        gy = d * iy + ay      # (ny, nx, d+1, d+1)
        gx = d * ix + ax
        node = gy * space.nodes_x + gx
        node = node.reshape(m.ny * m.nx, (d + 1) ** 2)
    if space.dim is None:
        return node
    full = node[:, :, None] * dim + np.arange(dim)[None, None, :]
    return full.reshape(node.shape[0], node.shape[1] * dim)


class MaskedOp:
    """Dirichlet-eliminated operator: identity on masked rows/cols.

    Equivalent to Firedrake ``assemble(form, bcs=bcs)`` -- bc rows/cols are
    zeroed with 1 on the diagonal (reference control/control.py:359-368).
    """

    def __init__(self, op, mask, alpha=1.0):
        self.op = op
        self.mask = mask      # bool, trial/test grid shape (same space)
        self.alpha = alpha
        self.trial_space = op.trial_space
        self.test_space = op.test_space

    def apply(self, x):
        xi = jnp.where(self.mask, 0.0, x)
        y = self.op.apply(xi)
        return jnp.where(self.mask, self.alpha * x, y)

    def __call__(self, x):
        return self.apply(x)

    @property
    def T(self):
        return MaskedOp(self.op.T, self.mask, self.alpha)

    def diag(self):
        return jnp.where(self.mask, self.alpha, self.op.diag())

    def to_dense(self):
        A = self.op.to_dense()
        m = self.mask.ravel()
        A = jnp.where(m[:, None] | m[None, :], 0.0, A)
        A = A + jnp.diag(jnp.where(m, self.alpha, 0.0).astype(A.dtype))
        return A
