"""Persistent-compilation-cache write guard.

Serializing an executable whose proto exceeds protobuf's 2 GB hard limit
ABORTS the process (C++ CHECK, not a catchable Python error) -- observed on
the fused 3-D incompressible program (CPU backend SIGABRT inside
``put_executable_and_time``) and on the remote TPU serializer ("Failed to
serialize TpuExecutableProto ... 8060894426 bytes").  ``config.py``
installs a size-predictor guard over every cache write; these tests pin its
semantics.

Reference anchor: the reference pays no compilation (PETSc re-setup per
solve, control/control.py:2056-2067); the persistent cache is what makes
the one-XLA-program design's cold start competitive, so its writes must
never be able to kill the process.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from control_tpu import config


@pytest.fixture
def tmp_cache(tmp_path, monkeypatch):
    from jax._src import compilation_cache as cc
    monkeypatch.setenv("CONTROL_TPU_CACHE_DIR", str(tmp_path))
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    cc.reset_cache()       # the cache instance latches the dir at first use
    yield tmp_path
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      prev_min)
    cc.reset_cache()


def _fresh_compiled(expr):
    """Compile a not-yet-cached program and force the cache-write path."""
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    f = jax.jit(expr)
    f(jnp.ones((96, 96))).block_until_ready()


def test_oversize_executables_are_skipped(tmp_cache, monkeypatch):
    monkeypatch.setenv("CONTROL_TPU_CACHE_MAX_BYTES", "1")
    assert config.enable_compilation_cache() == str(tmp_cache)
    before = list(config.CACHE_SKIPPED_OVERSIZE)
    _fresh_compiled(lambda x: jnp.tanh(x @ x).sum() * 3.0)
    assert len(config.CACHE_SKIPPED_OVERSIZE) > len(before)
    assert os.listdir(tmp_cache) == []


def test_normal_executables_are_cached(tmp_cache, monkeypatch):
    monkeypatch.setenv("CONTROL_TPU_CACHE_MAX_BYTES", str(1 << 30))
    assert config.enable_compilation_cache() == str(tmp_cache)
    _fresh_compiled(lambda x: jnp.sinh(x @ x).sum() / 7.0)
    assert len(os.listdir(tmp_cache)) >= 1


def test_cache_write_errors_are_nonfatal(tmp_cache, monkeypatch):
    """A raising serializer degrades to "don't cache", as the docstring
    promises (round-2 failure mode: TpuExecutableProto serialize error)."""
    monkeypatch.setenv("CONTROL_TPU_CACHE_MAX_BYTES", str(1 << 30))
    assert config.enable_compilation_cache() == str(tmp_cache)
    from jax._src import compilation_cache as cc

    def boom(*a, **k):
        raise RuntimeError("Failed to serialize TpuExecutableProto")

    monkeypatch.setattr(cc, "_get_cache", boom)
    _fresh_compiled(lambda x: jnp.cosh(x @ x).sum() / 11.0)   # must not raise


def test_fork_probe_verdicts():
    """The exact-size fork probe: the ``jax_platforms=cpu`` client reports
    all-zero memory stats, so the CPU guard path rests on this probe."""
    f = jax.jit(lambda x: x @ x)
    ex = f.lower(jnp.ones((16, 16))).compile().runtime_executable()
    assert config._fork_probe_serialize_ok(ex, 1 << 30)
    assert not config._fork_probe_serialize_ok(ex, 1)
