"""Test configuration.

Tests run on the CPU backend in float64 (the algebraic exact-solution gates
need ~1e-13, mirroring the reference's PETSc double precision), with 8
virtual devices so multi-chip sharding is exercised without TPU hardware
(reference runs its suite serially and under ``mpiexec -n 4``;
reference test/test_control.py:21-23).
"""

import os

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
