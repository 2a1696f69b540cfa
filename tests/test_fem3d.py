"""3-D FEM layer: hex tabulation, assembly, interpolation, Dirichlet solve.

A capability extension over the reference (2-D only; its meshes are
UnitSquareMesh/RectangleMesh, reference test/test_control.py:28,234) using
the same algebraic-identity test strategy as tests/test_fem.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu.fem import (
    UnitCubeMesh, BoxMesh, FunctionSpace, Function, TrialFunction,
    TestFunction, SpatialCoordinate, DirichletBC, grad, div, inner, dx,
    assemble, sin, exp, pi)


@pytest.mark.parametrize("degree", [1, 2])
def test_mass_stiffness_exactness_3d(degree):
    mesh = UnitCubeMesh(2, 3, 2)
    V = FunctionSpace(mesh, "Lagrange", degree)
    u, v = TrialFunction(V), TestFunction(V)
    M = np.asarray(assemble(inner(u, v) * dx).to_dense())
    assert abs(M.sum() - 1.0) < 1e-12           # volume of the unit cube
    assert abs(M - M.T).max() < 1e-12
    K = assemble(inner(grad(u), grad(v)) * dx)
    Kd = np.asarray(K.to_dense())
    assert abs(Kd.sum(axis=1)).max() < 1e-11    # constants in kernel
    assert abs(Kd - Kd.T).max() < 1e-12
    # energy identity: u = xyz is trilinear (in Q1 already):
    #   int |grad(xyz)|^2 = 3 * (1/3)*(1/3) = 1/3
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[0] * X[1] * X[2])
    energy = float(np.vdot(np.asarray(f.data), np.asarray(K.apply(f.data))))
    assert abs(energy - 1.0 / 3.0) < 1e-12


def test_interpolate_autodiff_3d():
    # -div(grad(zeta)) in 3-D via JAX autodiff point functions
    mesh = BoxMesh(3, 3, 3, 1.0, 1.0, 1.0)
    V = FunctionSpace(mesh, "Lagrange", 2)
    X = SpatialCoordinate(mesh)
    zeta = sin(2.0 * pi * X[0]) * sin(2.0 * pi * X[1]) * sin(2.0 * pi * X[2])
    vd = Function(V).interpolate(-div(grad(zeta)) + X[0] * exp(X[2]))
    Xc, Yc, Zc = V.node_coords()
    ref = (12.0 * np.pi ** 2 * np.sin(2 * np.pi * Xc)
           * np.sin(2 * np.pi * Yc) * np.sin(2 * np.pi * Zc)
           + Xc * np.exp(Zc))
    assert abs(np.asarray(vd.data) - ref).max() < 1e-10


def test_boundary_mask_3d():
    mesh = UnitCubeMesh(3, 4, 5)
    V = FunctionSpace(mesh, "Lagrange", 1)
    mask = V.boundary_mask("on_boundary")
    nz, ny, nx = V.node_grid
    assert mask.shape == (nz, ny, nx)
    assert mask.sum() == nz * ny * nx - (nz - 2) * (ny - 2) * (nx - 2)
    for face, count in ((1, nz * ny), (2, nz * ny), (3, nz * nx),
                        (4, nz * nx), (5, ny * nx), (6, ny * nx)):
        assert V.boundary_mask(face).sum() == count


def _poisson_error_3d(n):
    """L2 error of a dense-solved 3-D Dirichlet Poisson MMS problem."""
    mesh = UnitCubeMesh(n, n, n)
    V = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    u_ex = sin(pi * X[0]) * sin(pi * X[1]) * sin(pi * X[2])
    f = Function(V).interpolate(3.0 * pi ** 2 * u_ex)
    K = assemble(inner(grad(u), grad(v)) * dx, bcs=bc)
    b = assemble(inner(f, v) * dx, bcs=(bc,))
    A = np.asarray(K.to_dense())
    x = np.linalg.solve(A, np.asarray(b.data).ravel())
    uh = Function(V, data=x.reshape(V.grid_shape))
    d = Function(V).interpolate(u_ex)
    e = Function(V, data=uh.data - d.data)
    return float(jnp.sqrt(jnp.abs(assemble(inner(e, e) * dx))))


def test_poisson_3d_convergence():
    e1, e2 = _poisson_error_3d(4), _poisson_error_3d(8)
    assert e2 < e1
    order = np.log2(e1 / e2)
    assert order > 1.7          # Q1: second order in h


@pytest.mark.parametrize("degree", [1, 2])
def test_hex_mass_spectral_bounds(degree):
    """The shipped hex Chebyshev bounds contain the Jacobi-scaled mass
    spectrum (tensor-product factorisation of the 1-D bounds)."""
    from control_tpu.fem import TrialFunction as Tr
    from control_tpu.utils.spectral import mass_lambda_bounds
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "Lagrange", degree)
    u, v = Tr(V), TestFunction(V)
    M = np.asarray(assemble(inner(u, v) * dx).to_dense())
    d = np.sqrt(np.diag(M))
    lam = np.linalg.eigvalsh(M / d[:, None] / d[None, :])
    lo, hi = mass_lambda_bounds(V)
    assert lo <= lam[0] + 1e-12 and lam[-1] <= hi + 1e-12


def test_io_roundtrip_3d(tmp_path):
    from control_tpu.utils.io import write_solution, load_solution, write_vtk
    mesh = UnitCubeMesh(3, 2, 2)
    V = FunctionSpace(mesh, "Lagrange", 1)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[0] + 2.0 * X[1] + 3.0 * X[2])
    write_solution("f3d", f, directory=str(tmp_path))
    g = load_solution("f3d", V, directory=str(tmp_path))
    assert np.abs(np.asarray(g.data) - np.asarray(f.data)).max() == 0.0
    # explicit VTK write must not raise and must carry the 3-D dimensions
    p = tmp_path / "f3d_explicit.vtk"
    write_vtk(str(p), V, {"f": f.data})
    txt = p.read_text()
    assert "DIMENSIONS 4 3 3" in txt
