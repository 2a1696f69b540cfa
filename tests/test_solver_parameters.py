"""solver_parameters surface of the KSP-driver replacement.

The reference's custom KSP driver consumes linear_solver, gmres_restart,
tolerances, divergence limit, norm_type, pc_side, monitor_convergence and
the preconditioner flag (reference preconditioner/preconditioner.py:732-756).
Unknown keys must raise; known keys must act.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from control_tpu import (UnitSquareMesh, FunctionSpace, TrialFunction,
                         TestFunction, inner, grad, dx)
from control_tpu.fem.assemble import assemble
from control_tpu.solvers.block import MultiBlockSystem


@pytest.fixture(scope="module")
def system():
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    sp = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(sp), TestFunction(sp)
    K = assemble(inner(grad(u), grad(v)) * dx + inner(u, v) * dx)
    sys_ = MultiBlockSystem(sp, sp, block_00={(0, 0): K}, block_01={},
                            block_10={}, block_11={(0, 0): K})
    b = jnp.asarray(
        np.random.default_rng(0).standard_normal((1,) + sp.grid_shape))
    return sys_, b


def test_unknown_key_raises(system):
    sys_, b = system
    with pytest.raises(ValueError, match="unknown solver_parameters"):
        sys_.solve_fn(solver_parameters={"bogus_key": 1})


@pytest.mark.parametrize("params", [
    {"linear_solver": "gmres", "pc_side": "right"},
    {"linear_solver": "gmres", "norm_type": "unpreconditioned"},
    {"linear_solver": "fgmres", "norm_type": "unpreconditioned",
     "pc_side": "right"},
    {"linear_solver": "minres", "norm_type": "preconditioned",
     "pc_side": "left"},
])
def test_norm_type_pc_side_act(system, params):
    sys_, b = system
    params = dict(params, monitor_convergence=False,
                  relative_tolerance=1e-10, maximum_iterations=500)
    info = sys_.solve(0.0 * b, 0.0 * b, b, b, solver_parameters=params)
    assert info.converged


@pytest.mark.parametrize("params", [
    {"linear_solver": "fgmres", "pc_side": "left"},
    {"linear_solver": "fgmres", "norm_type": "preconditioned"},
    {"linear_solver": "minres", "pc_side": "right"},
    {"linear_solver": "minres", "norm_type": "unpreconditioned"},
    {"linear_solver": "gmres", "pc_side": "right",
     "norm_type": "preconditioned"},
    {"linear_solver": "gmres", "norm_type": "not_a_norm"},
    {"linear_solver": "gmres", "pc_side": "sideways"},
    {"linear_solver": "not_a_solver"},
])
def test_invalid_combinations_raise(system, params):
    sys_, b = system
    with pytest.raises(ValueError):
        sys_.solve_fn(solver_parameters=params)


def test_divergence_limit(system):
    """divtol semantics: halt once rnorm > dtol * rnorm0 and report
    non-convergence (dtol < 1 halts immediately); a large dtol leaves the
    solve unaffected."""
    sys_, b = system
    with pytest.raises(RuntimeError, match="failed to converge"):
        sys_.solve(0.0 * b, 0.0 * b, b, b, solver_parameters={
            "linear_solver": "gmres", "monitor_convergence": False,
            "divergence limit": 0.5, "maximum_iterations": 500})
    info = sys_.solve(0.0 * b, 0.0 * b, b, b, solver_parameters={
        "linear_solver": "gmres", "monitor_convergence": False,
        "divergence limit": 1.0e6, "maximum_iterations": 500})
    assert info.converged


def test_mass_solver_steps_rejected_with_multigrid():
    """set_mass_solver_steps is Chebyshev-only; combining it with
    Multigrid=True raises instead of silently doing nothing
    (mass_solver docstring; reference (1,1) recipes
    control/control.py:356-394)."""
    import pytest as _pytest
    from control_tpu.models.common import mass_solver
    from control_tpu.fem.assemble import assemble
    from control_tpu.fem.expr import TrialFunction, TestFunction, inner
    from control_tpu.fem.forms import dx
    from control_tpu import UnitSquareMesh, FunctionSpace
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    space = FunctionSpace(mesh, "Lagrange", 1)
    u, v = TrialFunction(space), TestFunction(space)
    M = assemble(inner(u, v) * dx)
    with _pytest.raises(ValueError, match="set_mass_solver_steps"):
        mass_solver(M, None, True, (0.25, 2.25), steps=12)


def test_set_incompressible_execution_modes():
    """Setter semantics for the fused-vs-host incompressible execution
    choice (TPU-measured: fused 75 s vs host-loop 165 s on the 16^2 x 16
    Stokes bench; instationary.py:set_incompressible_execution)."""
    import pytest as _pytest
    from control_tpu import (Control, UnitSquareMesh, FunctionSpace,
                             VectorFunctionSpace, inner, grad, dx)
    mesh = UnitSquareMesh(4, 4, quadrilateral=True)
    space_v = VectorFunctionSpace(mesh, "Lagrange", 2)

    def fdo(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    ctl = Control.Instationary(space_v, fdo,
                               space_p=FunctionSpace(mesh, "Lagrange", 1),
                               n_t=3, time_interval=(0.0, 1.0))
    ctl.set_incompressible_execution("fused")
    assert ctl._host_loop is False
    ctl.set_incompressible_execution("host")
    assert ctl._host_loop is True
    ctl.set_incompressible_execution(None)
    assert ctl._host_loop is None
    with _pytest.raises(ValueError, match="incompressible execution"):
        ctl.set_incompressible_execution("gpu")
