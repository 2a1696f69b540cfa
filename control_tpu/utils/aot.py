"""AOT export of compiled solve programs (production serving).

The reference framework has no deployment story: every run repeats the
Firedrake/PETSc setup (assembly, AMG setup, KSP configuration) in-process.
Here the whole preconditioned KKT solve is ONE jitted XLA program whose
numeric state (linearisation operators, preconditioner hierarchies, rhs)
enters as arguments, so the traced program can be serialized as a
portable StableHLO artifact (``jax.export``) and executed in a serving
process without the Python problem layer, without retracing, and -- via
``config.enable_compilation_cache`` -- without recompiling.

Usage::

    ctl.linear_solve(...)                       # traces + runs the kernel
    blob = aot.export_last_solve()              # bytes (StableHLO)
    aot.save("solve.stablehlo")

    # serving process:
    exp = aot.load("solve.stablehlo")
    u0, u1, info = exp.call(Dv_A, pc_state, b_0, b_1, z_0, z_1)

Applies to the fused single-program solves (`linear_solve` on both
problem classes and `incompressible_linear_solve` off the host loop); the
host-loop incompressible path dispatches several smaller programs and is
not a single exportable artifact.
"""

import jax
from jax import export as _export

from ..models import common as _common


def export_last_solve(platforms=None):
    """Export the most recently dispatched solve kernel
    (``models.common.run_kernel`` records it) as a ``jax.export.Exported``.

    ``platforms``: optional list of lowering platforms (e.g.
    ``["tpu", "cpu"]``); defaults to the current backend.
    """
    if not getattr(_common, "LAST_RUN", None):
        raise RuntimeError("no solve kernel has been run yet")
    fn, args = _common.LAST_RUN
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return _export.export(fn, **kwargs)(*args)


def serialize(exported):
    """``Exported`` -> bytes."""
    return exported.serialize()


def deserialize(blob):
    """bytes -> ``Exported`` (call via ``.call(*args)``)."""
    return _export.deserialize(blob)


def save(path, exported=None):
    """Serialize ``exported`` (default: the last solve) to ``path``."""
    if exported is None:
        exported = export_last_solve()
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return exported


def load(path):
    with open(path, "rb") as f:
        return deserialize(f.read())
