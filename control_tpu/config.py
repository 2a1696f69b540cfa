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

import jax
import jax.numpy as jnp

_DEFAULT_DTYPE = None


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
