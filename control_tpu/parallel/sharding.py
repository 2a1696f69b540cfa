"""Multi-chip sharding of the all-at-once solver.

The reference distributes via MPI domain decomposition inside
Firedrake/PETSc (reference control/control.py:138,1523; every Vec/Mat op is
a collective).  Here the same axis -- space -- is sharded with
``jax.sharding`` over a device mesh: the solver is pure jnp on stacked grid
arrays (n_blocks, ny, nx[, comp]), so annotating the inputs is enough for
XLA's SPMD partitioner to insert halo exchanges (collective-permutes) for
the strided stencil slices and psum reductions for the Krylov dot products
-- the TPU analogue of PETSc's MPI assembly/axpy/norm collectives, riding
ICI instead of DCN.

Axes:
  "sy", "sx"  -- spatial domain decomposition of the node grid,
  "t"         -- the time-block axis of the all-at-once vector.  With the
                 ParaDiag Schur sweeps (set_schur_sweep("paradiag")) every
                 solver stage is collective-friendly along time: the block
                 matvec couples nearest neighbours (halo permutes), the
                 T-transform cumsums and the DFT matmuls contract over the
                 sharded axis (psum), and the per-frequency V-cycles are
                 embarrassingly parallel.  The reference executes this
                 axis serially in Python (SURVEY section 5.7).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(shape=None, devices=None, axis_names=("sy", "sx")):
    """A 2-D spatial device mesh.  ``shape=None`` factorises all available
    devices as squarely as possible."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        a = int(np.floor(np.sqrt(n)))
        while n % a:
            a -= 1
        shape = (a, n // a)
    devs = np.asarray(devices[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, axis_names)


def grid_sharding(mesh, space, leading_axes=1):
    """NamedSharding for a stacked grid array (*leading, [nz,] ny, nx
    [, comp]): the trailing two spatial axes sharded over the mesh,
    leading/time, z (3-D) and component axes replicated."""
    spec = ([None] * leading_axes + [None] * (space.ndim - 2)
            + list(mesh.axis_names))
    if space.dim is not None:
        spec.append(None)
    return NamedSharding(mesh, P(*spec))


def shard_stack(x, mesh, space, leading_axes=1):
    """Place a stacked grid array onto the device mesh."""
    return jax.device_put(x, grid_sharding(mesh, space, leading_axes))


def constrain_stack(x, mesh, space, leading_axes=1):
    """In-trace spatial sharding of a stacked grid array.

    ``jax.device_put`` requires shard-divisible dimensions, which odd-sized
    node grids (any Q2 space has 2n+1 nodes per axis) can never satisfy on
    an even device mesh; ``lax.with_sharding_constraint`` inside jit goes
    through the GSPMD partitioner, which pads uneven shards internally.
    Wrap solve inputs with this inside a jitted caller to run the whole
    program SPMD over the mesh."""
    return jax.lax.with_sharding_constraint(
        x, grid_sharding(mesh, space, leading_axes))


def make_time_mesh(n_devices=None, devices=None):
    """A 1-D device mesh over the time-block ("sequence") axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), ("t",))


def time_sharding(mesh, space):
    """NamedSharding for a stacked grid array (n_blocks, [nz,] ny, nx
    [, comp]): the time-block axis sharded, spatial axes replicated."""
    spec = ["t"] + [None] * space.ndim
    if space.dim is not None:
        spec.append(None)
    return NamedSharding(mesh, P(*spec))


def shard_time_stack(x, mesh, space):
    """Place a stacked grid array onto the device mesh, sharded along the
    leading time-block axis."""
    return jax.device_put(x, time_sharding(mesh, space))


def make_spacetime_mesh(shape=None, devices=None):
    """A 3-D device mesh ("t", "sy", "sx"): time-block axis x spatial
    domain decomposition.  ``shape=None`` peels the largest power-of-two
    factor <= sqrt(n) for time and factorises the rest spatially -- e.g.
    8 devices -> (2, 2, 2).  Combining both axes is the TPU analogue of
    running the reference under MPI (space) while ALSO parallelising its
    serial Python time loop (SURVEY section 5.7): one SPMD program, halo
    permutes along "sy"/"sx", DFT/cumsum contractions along "t"."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        t = 1
        while t * 2 <= max(1, int(np.sqrt(n))) and n % (t * 2) == 0:
            t *= 2
        rest = n // t
        a = int(np.floor(np.sqrt(rest)))
        while rest % a:
            a -= 1
        shape = (t, a, rest // a)
    devs = np.asarray(devices[:shape[0] * shape[1] * shape[2]])
    return Mesh(devs.reshape(shape), ("t", "sy", "sx"))


def spacetime_sharding(mesh, space):
    """NamedSharding for a stacked grid array (n_blocks, [nz,] ny, nx
    [, comp]): time-block axis over "t", the trailing two spatial axes
    over "sy"/"sx"."""
    spec = ["t"] + [None] * (space.ndim - 2) + ["sy", "sx"]
    if space.dim is not None:
        spec.append(None)
    return NamedSharding(mesh, P(*spec))


def shard_spacetime_stack(x, mesh, space):
    """Place a stacked grid array onto the 3-D space-time device mesh."""
    return jax.device_put(x, spacetime_sharding(mesh, space))


def shard_problem_state(ctl, mesh):
    """Shard an Instationary problem's state arrays over the device mesh
    (subsequent jitted solves then run SPMD)."""
    sp = ctl._space_v
    ctl._v.data = shard_stack(ctl._v.data, mesh, sp)
    ctl._zeta.data = shard_stack(ctl._zeta.data, mesh, sp)
    if getattr(ctl, "_space_p", None) is not None and ctl._space_p:
        pp = ctl._space_p
        ctl._p.data = shard_stack(ctl._p.data, mesh, pp)
        ctl._mu.data = shard_stack(ctl._mu.data, mesh, pp)
    return ctl
