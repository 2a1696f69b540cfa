"""Global configuration for control_tpu.

The framework is dtype-parametric.  On CPU (tests) we run in float64
(``jax_enable_x64``); on TPU the default is float32 (native MXU/VPU dtype),
with float64 available through XLA's software emulation when the extra
precision is required.

Reference parity: the upstream solver (sleveque/control) runs on PETSc in
double precision; the algebraic exact-solution tests (reference
test/test_control.py:116-119) require ~1e-13 accuracy and are exercised here
on the CPU backend in float64.  TPU benchmark runs target the production
tolerance of 1e-6 (reference control/control.py:566).
"""

import os

import jax
import jax.numpy as jnp

_DEFAULT_DTYPE = None


def enable_compilation_cache(path=None):
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``$CONTROL_TPU_CACHE_DIR`` or ``<repo>/.jax_cache``).

    The whole KKT solve is one XLA program, so first-call compilation (2-7
    min for the production shapes) dominates cold-start cost; the
    persistent cache makes it a one-time cost per (shape, config) across
    processes.  The reference pays no compilation but re-runs PETSc/AMG
    setup every solve (control/control.py:2056-2067).  Set
    ``CONTROL_TPU_CACHE_DIR=off`` to disable.  Returns the cache dir, or
    None when disabled/unsupported (cache errors are non-fatal: JAX falls
    back to compiling)."""
    env = os.environ.get("CONTROL_TPU_CACHE_DIR")
    if env in ("off", "0", "none"):
        return None
    path = path or env or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return path


def set_default_dtype(dtype):
    """Override the default floating point dtype used for new meshes."""
    global _DEFAULT_DTYPE
    _DEFAULT_DTYPE = None if dtype is None else jnp.dtype(dtype)


def default_dtype():
    """Default floating dtype: float64 when x64 is enabled, else float32."""
    if _DEFAULT_DTYPE is not None:
        return _DEFAULT_DTYPE
    if jax.config.jax_enable_x64:
        return jnp.dtype(jnp.float64)
    return jnp.dtype(jnp.float32)
