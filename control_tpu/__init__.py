"""control_tpu: a TPU-native framework for all-at-once PDE-constrained
optimization.

A from-scratch rebuild of the capabilities of ``sleveque/control``
(Firedrake/PETSc/MPI) as idiomatic JAX/XLA: structured-mesh FEM with batched
matrix-free element kernels, jit-compiled Krylov solvers (GMRES/FGMRES/
MINRES/Chebyshev), geometric multigrid in place of hypre BoomerAMG, and the
reference's block KKT preconditioners, all compiled end-to-end and sharded
over device meshes with ``jax.sharding``.

Public surface mirrors the reference:

    from control_tpu import *
    Control.Stationary(...).linear_solve(...)
    Control.Instationary(...).incompressible_non_linear_solve(...)
"""

from .config import set_default_dtype, default_dtype
from .fem import *                                  # noqa: F401,F403
from .fem import __all__ as _fem_all
try:  # solver/model layers (absent only during early bootstrap)
    from .solvers.block import (Nullspace, NoneNullspace, ConstantNullspace,
                                DirichletBCNullspace, FullNullspace,
                                MultiBlockSystem)
    from .models.control import Control
except ImportError:  # pragma: no cover
    pass

__all__ = (list(_fem_all)
           + ["Nullspace", "NoneNullspace", "ConstantNullspace",
              "DirichletBCNullspace", "FullNullspace", "MultiBlockSystem",
              "Control", "set_default_dtype", "default_dtype"])
