"""Test configuration.

Tests run on the CPU backend in float64 (the algebraic exact-solution gates
need ~1e-13, mirroring the reference's PETSc double precision), with 8
virtual devices so multi-chip sharding is exercised without TPU hardware
(reference runs its suite serially and under ``mpiexec -n 4``;
reference test/test_control.py:21-23).
"""

import os

# silence XLA:CPU's AOT-loader feature-mismatch log spam: cached CPU
# executables record the pseudo tuning flags +prefer-no-{scatter,gather},
# which host detection never reports, so every persistent-cache load logs
# a (benign, same-machine) ERROR-level mismatch
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# must be set before jax initializes a backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env var alone does not override the axon TPU plugin; the config does
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent executable cache: repeated suite runs skip recompilation of
# unchanged solve kernels (cache keys cover the program + compile flags,
# so code changes invalidate naturally)
from control_tpu.config import enable_compilation_cache  # noqa: E402
enable_compilation_cache()
