"""3-D Pallas stencil kernels: CPU-equivalence (interpret mode) of the
whole-volume generic fused Chebyshev smoother (scalar / complex ParaDiag /
vector spaces) and the z-streamed single-pass apply against the XLA
shifted multiply-add fallback.

Reference context: these replace the role of hypre/PETSc CSR matvecs in
the reference's BoomerAMG smoothing (control/control.py:399-416) for the
3-D capability extension; the fallback path IS the numeric reference the
kernels must reproduce.
"""

import numpy as np
import jax.numpy as jnp

from control_tpu.ops.stencil import (fused_cheb_smooth, _fused_cheb_nd3,
                                     _apply_3d_pallas, _apply_xla,
                                     _vmem_ok_nd3)

GRID = (6, 7, 9)


def _rand(rng, shape, cplx=False, dtype=jnp.float32):
    a = rng.standard_normal(shape)
    if cplx:
        return jnp.asarray(a + 1j * rng.standard_normal(shape),
                           jnp.complex64)
    return jnp.asarray(a, dtype)


def _compare(ref, pal, tol=1e-5):
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    assert float(jnp.max(jnp.abs(ref - pal))) / scale < tol


def test_fused_cheb_3d_scalar_matches_xla():
    rng = np.random.default_rng(3)
    n, K = 3, 27
    nz, ny, nx = GRID
    w = _rand(rng, (n, K, nz, ny, nx))
    dinv = 0.1 * _rand(rng, (n, nz, ny, nx))
    b = _rand(rng, (n, nz, ny, nx))
    theta = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    delta = jnp.asarray(rng.uniform(0.3, 0.8, n), jnp.float32)
    ref = fused_cheb_smooth(w, dinv, b, jnp.zeros_like(b), 5, theta, delta,
                            1, want_residual=True, use_pallas=False, nd=3)
    pal = _fused_cheb_nd3(w, dinv, b, jnp.zeros_like(b), 5, theta, delta,
                          1, want_residual=True, interpret=True)
    _compare(ref[0], pal[0])
    _compare(ref[1], pal[1])


def test_fused_cheb_3d_scalar_unbatched_shared_weights():
    rng = np.random.default_rng(5)
    nz, ny, nx = GRID
    w = _rand(rng, (27, nz, ny, nx))
    dinv = 0.1 * _rand(rng, (nz, ny, nx))
    b = _rand(rng, (nz, ny, nx))
    ref = fused_cheb_smooth(w, dinv, b, jnp.zeros_like(b), 4, 1.3, 0.6,
                            1, use_pallas=False, nd=3)
    pal = _fused_cheb_nd3(w, dinv, b, jnp.zeros_like(b), 4, 1.3, 0.6,
                          1, interpret=True)
    _compare(ref, pal)


def test_fused_cheb_3d_complex_matches_xla():
    """The ParaDiag frequency blocks in 3-D: complex coupling as a C=2
    real coupled kernel."""
    rng = np.random.default_rng(7)
    n = 3
    nz, ny, nx = GRID
    w = _rand(rng, (n, 27, nz, ny, nx), cplx=True)
    dinv = 0.1 * _rand(rng, (n, nz, ny, nx), cplx=True)
    b = _rand(rng, (n, nz, ny, nx), cplx=True)
    theta = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    delta = jnp.asarray(rng.uniform(0.3, 0.8, n), jnp.float32)
    ref = fused_cheb_smooth(w, dinv, b, jnp.zeros_like(b), 5, theta, delta,
                            1, want_residual=True, use_pallas=False, nd=3)
    pal = _fused_cheb_nd3(w, dinv, b, jnp.zeros_like(b), 5, theta, delta,
                          1, want_residual=True, interpret=True)
    _compare(ref[0], pal[0])
    _compare(ref[1], pal[1])


def test_fused_cheb_3d_vector_dim3_matches_xla():
    rng = np.random.default_rng(11)
    n, dim = 2, 3
    nz, ny, nx = GRID
    w = _rand(rng, (n, 27, nz, ny, nx, dim, dim))
    dinv = 0.1 * _rand(rng, (n, nz, ny, nx, dim))
    b = _rand(rng, (n, nz, ny, nx, dim))
    theta = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    delta = jnp.asarray(rng.uniform(0.3, 0.8, n), jnp.float32)
    ref = fused_cheb_smooth(w, dinv, b, jnp.zeros_like(b), 4, theta, delta,
                            1, want_residual=True, use_pallas=False, nd=3)
    pal = _fused_cheb_nd3(w, dinv, b, jnp.zeros_like(b), 4, theta, delta,
                          1, want_residual=True, interpret=True)
    _compare(ref[0], pal[0])
    _compare(ref[1], pal[1])


def test_fused_cheb_3d_bf16_weights():
    """weight_dtype='bfloat16' rounds the same way in kernel and
    fallback."""
    rng = np.random.default_rng(13)
    nz, ny, nx = GRID
    w = _rand(rng, (27, nz, ny, nx))
    dinv = 0.1 * _rand(rng, (nz, ny, nx))
    b = _rand(rng, (nz, ny, nx))
    ref = fused_cheb_smooth(w, dinv, b, jnp.zeros_like(b), 3, 1.3, 0.6, 1,
                            use_pallas=False, nd=3,
                            weight_dtype="bfloat16")
    pal = _fused_cheb_nd3(w, dinv, b, jnp.zeros_like(b), 3, 1.3, 0.6, 1,
                          interpret=True, weight_dtype="bfloat16")
    _compare(ref, pal, tol=1e-4)


def test_apply_3d_pallas_matches_xla():
    rng = np.random.default_rng(17)
    n = 3
    nz, ny, nx = GRID
    w = _rand(rng, (n, 27, nz, ny, nx))
    x = _rand(rng, (n, nz, ny, nx))
    ref = _apply_xla(w, x, 1, nd=3)
    pal = _apply_3d_pallas(w, x, 1, interpret=True)
    _compare(ref, pal)
    # shared weights across the batch
    ws = _rand(rng, (1, 27, nz, ny, nx))
    _compare(_apply_xla(ws, x, 1, nd=3),
             _apply_3d_pallas(ws, x, 1, interpret=True))
    # unbatched
    _compare(_apply_xla(ws[0], x[0], 1, nd=3),
             _apply_3d_pallas(ws[0], x[0], 1, interpret=True))


def test_vmem_gate_3d():
    """The gate must model Mosaic's double-buffered input windows against
    the physical 128 MiB VMEM (on-chip verified: 33^3 complex f32 OOMs at
    146 MB, 17^3 runs); bf16 weights extend the reach."""
    assert _vmem_ok_nd3(1, 2, 17, 17, 17, jnp.float32)
    assert not _vmem_ok_nd3(1, 2, 33, 33, 33, jnp.float32)
    assert not _vmem_ok_nd3(1, 2, 65, 65, 65, jnp.float32)
    assert _vmem_ok_nd3(1, 2, 33, 33, 33, jnp.float32, wbytes=2)
