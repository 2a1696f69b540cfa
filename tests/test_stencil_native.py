"""Unit tests for the node-stencil fast path and the native I/O runtime."""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu.fem import (
    UnitSquareMesh, FunctionSpace, Function, TrialFunction, TestFunction,
    SpatialCoordinate, DirichletBC, grad, inner, dx, assemble, Constant)
from control_tpu.ops.stencil import (StencilOp, node_stencil, apply_stencil,
                                     fused_cheb_smooth)
from control_tpu.ops.local_op import MaskedOp


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("degree", [1, 2])
def test_stencil_equals_local_op(quad, degree):
    mesh = UnitSquareMesh(5, 7, quadrilateral=quad)
    V = FunctionSpace(mesh, "Lagrange", degree)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    w_fun = Function(V).interpolate(X[0] + 0.3 * X[1])
    A = assemble(inner(grad(u), grad(v)) * dx
                 + (Constant(1.0) + w_fun ** 2.0) * inner(u, v) * dx)
    bc = DirichletBC(V, 0.0, "on_boundary")
    Am = MaskedOp(A, bc.mask)
    S = StencilOp.from_local(Am)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*V.grid_shape))
    assert float(jnp.abs(S.apply(x) - Am.apply(x)).max()) < 1e-13
    assert float(jnp.abs(S.diag() - Am.diag()).max()) < 1e-14
    # unmasked + batched
    S2 = StencilOp.from_local(A)
    xb = jnp.asarray(rng.randn(4, *V.grid_shape))
    assert float(jnp.abs(S2.apply(xb) - A.apply(xb)).max()) < 1e-13


def test_fused_cheb_matches_reference_iteration():
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(V), TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    A = assemble(inner(grad(u), grad(v)) * dx + inner(u, v) * dx)
    w = node_stencil(A.A, V, mask=bc.mask)
    K = w.shape[0]
    d = jnp.where(w[K // 2] == 0, 1.0, w[K // 2])
    rng = np.random.RandomState(1)
    b = jnp.asarray(rng.randn(*V.grid_shape))
    x0 = jnp.zeros_like(b)
    theta, delta = 1.3, 0.9

    # reference loop (mirrors solvers.krylov.chebyshev)
    x = x0
    sigma1 = theta / delta
    r = b - apply_stencil(w, x, 1)
    p = (r / d) / theta
    x = x + p
    rho = 1.0 / sigma1
    for _ in range(3):
        r = b - apply_stencil(w, x, 1)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        p = rho_new * rho * p + (2.0 * rho_new / delta) * (r / d)
        x = x + p
        rho = rho_new

    xf, rf = fused_cheb_smooth(w, 1.0 / d, b, x0, 4, theta, delta, 1,
                               want_residual=True)
    assert float(jnp.abs(xf - x).max()) < 1e-12
    assert float(jnp.abs(rf - (b - apply_stencil(w, x, 1))).max()) < 1e-12


def test_native_io_roundtrip(tmp_path):
    from control_tpu.native import (available, write_vtk_native,
                                    ckpt_write_native, ckpt_read_native)
    if not available():
        pytest.skip("native library not built")
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", 1)
    arr = np.arange(25.0).reshape(5, 5)
    assert write_vtk_native(str(tmp_path / "t.vtk"), V, {"v": arr})
    assert (tmp_path / "t.vtk").exists()
    data = np.arange(24.0).reshape(2, 3, 4)
    assert ckpt_write_native(str(tmp_path / "t.ckpt"), data)
    back = ckpt_read_native(str(tmp_path / "t.ckpt"))
    assert back.shape == (2, 3, 4)
    assert np.abs(back - data).max() == 0.0


def test_checkpoint_resume(tmp_path):
    """Checkpoint + load/resume (the reference's CheckpointFile is
    write-only; reference control/control.py:600-604)."""
    from control_tpu.utils import io as cio
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    V = FunctionSpace(mesh, "Lagrange", 2)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[0] * X[1])
    cio.write_solution(str(tmp_path / "v"), f)
    g = cio.load_solution(str(tmp_path / "v"), V)
    assert float(jnp.abs(g.data - f.data).max()) == 0.0


def test_fused_cheb_complex_matches_xla():
    """The re/im-pair Pallas Chebyshev smoother (ParaDiag frequency
    blocks; interpret mode here) matches the XLA fallback, including
    per-batch spectral bounds."""
    from control_tpu.ops.stencil import fused_cheb_smooth, \
        _fused_cheb_complex
    rng = np.random.default_rng(7)
    n, K, ny, nx = 4, 9, 17, 17
    mk = (rng.standard_normal((n, K, ny, nx))
          + 1j * rng.standard_normal((n, K, ny, nx)))
    w = jnp.asarray(mk, jnp.complex64)
    dinv = jnp.asarray(0.1 * (rng.standard_normal((n, ny, nx))
                              + 1j * rng.standard_normal((n, ny, nx))),
                       jnp.complex64)
    b = jnp.asarray(rng.standard_normal((n, ny, nx))
                    + 1j * rng.standard_normal((n, ny, nx)), jnp.complex64)
    theta = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    delta = jnp.asarray(rng.uniform(0.3, 0.8, n), jnp.float32)
    ref_x, ref_r = fused_cheb_smooth(w, dinv, b, jnp.zeros_like(b), 5,
                                     theta, delta, 1, want_residual=True,
                                     use_pallas=False)
    pal_x, pal_r = _fused_cheb_complex(w, dinv, b, jnp.zeros_like(b), 5,
                                       theta, delta, 1,
                                       want_residual=True, interpret=True)
    scale = float(jnp.max(jnp.abs(ref_x)))
    assert float(jnp.max(jnp.abs(ref_x - pal_x))) / scale < 1e-5
    scale_r = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(ref_r - pal_r))) / scale_r < 1e-5


def test_fused_cheb_weight_dtype_bf16():
    """weight_dtype="bfloat16": the kernel stores weight/diagonal planes
    in bf16 and upcasts at use; the XLA fallback applies the same
    rounding, so both paths agree, and the rounded-weight smoother stays
    within O(bf16 eps) of the full-precision one."""
    from control_tpu.ops.stencil import fused_cheb_smooth, \
        _fused_cheb_complex
    rng = np.random.default_rng(11)
    n, K, ny, nx = 3, 9, 17, 17
    w = jnp.asarray(rng.standard_normal((n, K, ny, nx))
                    + 1j * rng.standard_normal((n, K, ny, nx)),
                    jnp.complex64)
    dinv = jnp.asarray(0.1 * (rng.standard_normal((n, ny, nx))
                              + 1j * rng.standard_normal((n, ny, nx))),
                       jnp.complex64)
    b = jnp.asarray(rng.standard_normal((n, ny, nx))
                    + 1j * rng.standard_normal((n, ny, nx)), jnp.complex64)
    theta = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    delta = jnp.asarray(rng.uniform(0.3, 0.8, n), jnp.float32)
    x0 = jnp.zeros_like(b)
    ref_x, ref_r = fused_cheb_smooth(w, dinv, b, x0, 5, theta, delta, 1,
                                     want_residual=True, use_pallas=False,
                                     weight_dtype="bfloat16")
    pal_x, pal_r = _fused_cheb_complex(w, dinv, b, x0, 5, theta, delta, 1,
                                       want_residual=True, interpret=True,
                                       weight_dtype="bfloat16")
    scale = float(jnp.max(jnp.abs(ref_x)))
    assert float(jnp.max(jnp.abs(ref_x - pal_x))) / scale < 1e-5
    # rounded weights perturb the result by O(bf16 eps), not more
    full_x = fused_cheb_smooth(w, dinv, b, x0, 5, theta, delta, 1,
                               use_pallas=False)
    rel = float(jnp.max(jnp.abs(full_x - ref_x))) / scale
    assert 1e-7 < rel < 0.1, rel

    # real path: same contract
    wr = jnp.asarray(rng.standard_normal((n, K, ny, nx)), jnp.float32)
    dr = jnp.asarray(0.1 + rng.uniform(0.1, 1.0, (n, ny, nx)),
                     jnp.float32)
    br = jnp.asarray(rng.standard_normal((n, ny, nx)), jnp.float32)
    x0r = jnp.zeros_like(br)
    ref = fused_cheb_smooth(wr, dr, br, x0r, 4, theta, delta, 1,
                            use_pallas=False, weight_dtype="bfloat16")
    full = fused_cheb_smooth(wr, dr, br, x0r, 4, theta, delta, 1,
                             use_pallas=False)
    relr = float(jnp.max(jnp.abs(full - ref))) / float(
        jnp.max(jnp.abs(full)))
    assert 1e-7 < relr < 0.1, relr


def test_fused_cheb_vector_matches_xla():
    """The 4-plane vector Pallas Chebyshev smoother (velocity V-cycles /
    mass solves; interpret mode here) matches the XLA fallback on random
    dim-2 coupling stencils, shared and per-batch weights."""
    from control_tpu.ops.stencil import fused_cheb_smooth, \
        _fused_cheb_vector
    rng = np.random.default_rng(13)
    n, K, ny, nx = 3, 9, 17, 17
    for w_shape in ((K, ny, nx, 2, 2), (n, K, ny, nx, 2, 2)):
        w = jnp.asarray(rng.standard_normal(w_shape), jnp.float32)
        dinv = jnp.asarray(0.1 * rng.standard_normal((n, ny, nx, 2)),
                           jnp.float32)
        b = jnp.asarray(rng.standard_normal((n, ny, nx, 2)), jnp.float32)
        theta = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
        delta = jnp.asarray(rng.uniform(0.3, 0.8, n), jnp.float32)
        ref_x, ref_r = fused_cheb_smooth(w, dinv, b, jnp.zeros_like(b), 5,
                                         theta, delta, 1,
                                         want_residual=True,
                                         use_pallas=False)
        pal_x, pal_r = _fused_cheb_vector(w, dinv, b, jnp.zeros_like(b),
                                          5, theta, delta, 1,
                                          want_residual=True,
                                          interpret=True)
        scale = float(jnp.max(jnp.abs(ref_x)))
        assert float(jnp.max(jnp.abs(ref_x - pal_x))) / scale < 1e-5
        scale_r = float(jnp.max(jnp.abs(ref_r)))
        assert float(jnp.max(jnp.abs(ref_r - pal_r))) / scale_r < 1e-5


def test_fused_cheb_vector_unbatched_and_bf16():
    """Unbatched vector smoothing + bf16 weight planes agree between the
    Pallas kernel (interpret) and the rounding-mirrored XLA fallback."""
    from control_tpu.ops.stencil import fused_cheb_smooth, \
        _fused_cheb_vector
    rng = np.random.default_rng(17)
    K, ny, nx = 25, 13, 13
    w = jnp.asarray(rng.standard_normal((K, ny, nx, 2, 2)), jnp.float32)
    dinv = jnp.asarray(0.1 * rng.standard_normal((ny, nx, 2)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((ny, nx, 2)), jnp.float32)
    for wdt in (None, "bfloat16"):
        ref_x = fused_cheb_smooth(w, dinv, b, jnp.zeros_like(b), 4,
                                  1.3, 0.6, 2, use_pallas=False,
                                  weight_dtype=wdt)
        pal_x = _fused_cheb_vector(w, dinv, b, jnp.zeros_like(b), 4,
                                   1.3, 0.6, 2, interpret=True,
                                   weight_dtype=wdt)
        scale = float(jnp.max(jnp.abs(ref_x)))
        assert float(jnp.max(jnp.abs(ref_x - pal_x))) / scale < 1e-5


@pytest.mark.parametrize("degree", [1, 2])
def test_stencil_equals_local_op_vector3d(degree):
    """3-D vector node stencils ((2d+1)^3 offsets with 3x3 coupling
    blocks) match the gather/scatter LocalOp, masked and unmasked,
    including diag/abs_rowsum (reference velocity blocks:
    control/control.py:3592-3655 assemble PETSc matrices; here the fold
    replaces CSR matvec on TPU)."""
    from control_tpu import UnitCubeMesh, VectorFunctionSpace, div, \
        as_vector
    mesh = UnitCubeMesh(2, 3, 2)
    V = VectorFunctionSpace(mesh, "Lagrange", degree, dim=3)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    w_fun = Function(V).interpolate(
        as_vector([X[0] + 0.3 * X[1], X[2] - X[0], 0.5 * X[1]]))
    # grad-grad + mass + a div-div term so the dim x dim coupling blocks
    # are genuinely non-diagonal
    A = assemble(inner(grad(u), grad(v)) * dx + inner(u, v) * dx
                 + Constant(0.7) * div(u) * div(v) * dx)
    bc = DirichletBC(V, 0.0, "on_boundary")
    Am = MaskedOp(A, bc.mask)
    S = StencilOp.from_local(Am)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*V.grid_shape))
    assert float(jnp.abs(S.apply(x) - Am.apply(x)).max()) < 1e-12
    assert float(jnp.abs(S.diag() - Am.diag()).max()) < 1e-13
    assert float(jnp.abs(S.abs_rowsum()).max()) > 0.0
    # unmasked + batched x, shared weights
    S2 = StencilOp.from_local(A)
    xb = jnp.asarray(rng.randn(4, *V.grid_shape))
    assert float(jnp.abs(S2.apply(xb) - A.apply(xb)).max()) < 1e-12
    # fused_cheb_smooth XLA fallback runs the 3-D vector stencil
    d = S.diag()
    d = jnp.where(d == 0, 1.0, d)
    xs = fused_cheb_smooth(S.w, 1.0 / d, x, jnp.zeros_like(x), 4,
                           2.0, 0.9, degree, use_pallas=False, nd=3)
    assert np.all(np.isfinite(np.asarray(xs)))
