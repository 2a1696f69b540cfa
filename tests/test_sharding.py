"""Multi-device sharding tests (8 virtual CPU devices from conftest).

The reference's distributed story is the same test suite under
``mpiexec -n 4`` (reference test/test_control.py:21-23); here the sharded
jitted solve must reproduce the single-device result."""

import numpy as np
import jax
import jax.numpy as jnp

from control_tpu.parallel.sharding import make_device_mesh, shard_stack


def _heat_pieces(n=15, n_t=4):
    import __graft_entry__ as g
    ctl, space = g._heat_problem(n=n, n_t=n_t)
    system, pc, b_0, b_1 = g._solve_pieces(ctl)
    return ctl, space, system, pc, b_0, b_1


def test_sharded_solve_matches_single_device():
    assert len(jax.devices()) >= 8
    ctl, space, system, pc, b_0, b_1 = _heat_pieces()
    params = {"linear_solver": "gmres", "gmres_restart": 10,
              "maximum_iterations": 40, "relative_tolerance": 1e-8,
              "absolute_tolerance": 0.0}
    solve = jax.jit(system.solve_fn(solver_parameters=params, pc_fn=pc))
    u0 = 0.0 * b_0
    v_ref, z_ref, info_ref = solve(u0, u0, b_0, b_1)

    mesh = make_device_mesh(devices=jax.devices()[:8])
    b_0s = shard_stack(b_0, mesh, space)
    b_1s = shard_stack(b_1, mesh, space)
    u0s = shard_stack(u0, mesh, space)
    v_s, z_s, info_s = solve(u0s, u0s, b_0s, b_1s)

    assert int(info_s["iterations"]) == int(info_ref["iterations"])
    assert float(jnp.abs(v_s - v_ref).max()) < 1e-11
    assert float(jnp.abs(z_s - z_ref).max()) < 1e-11


def test_time_sharded_paradiag_solve_matches_single_device():
    """Time-axis ("sequence") sharding: with the ParaDiag Schur sweeps the
    whole solve is collective-friendly along time (halo permutes for the
    neighbour couplings, psum for the T-transform cumsums and DFT
    contractions, embarrassingly parallel frequency solves) -- the
    reference executes this axis serially in Python (SURVEY section
    5.7)."""
    from control_tpu.parallel.sharding import make_time_mesh, \
        shard_time_stack
    assert len(jax.devices()) >= 8
    import __graft_entry__ as g
    ctl, space = g._heat_problem(n=12, n_t=9)   # 8 time blocks, 8 devices
    ctl.set_schur_sweep("paradiag")
    system, pc, b_0, b_1 = g._solve_pieces(ctl)
    params = {"linear_solver": "gmres", "gmres_restart": 10,
              "maximum_iterations": 40, "relative_tolerance": 1e-8,
              "absolute_tolerance": 0.0}
    solve = jax.jit(system.solve_fn(solver_parameters=params, pc_fn=pc))
    u0 = 0.0 * b_0
    v_ref, z_ref, info_ref = solve(u0, u0, b_0, b_1)

    mesh = make_time_mesh(8)
    b_0s = shard_time_stack(b_0, mesh, space)
    b_1s = shard_time_stack(b_1, mesh, space)
    u0s = shard_time_stack(u0, mesh, space)
    v_s, z_s, info_s = solve(u0s, u0s, b_0s, b_1s)

    assert int(info_s["iterations"]) == int(info_ref["iterations"])
    assert float(jnp.abs(v_s - v_ref).max()) < 1e-11
    assert float(jnp.abs(z_s - z_ref).max()) < 1e-11


def test_spacetime_sharded_solve_matches_single_device():
    """Combined 3-axis ("t", "sy", "sx") sharding: the time-block axis AND
    the spatial domain decomposition in one SPMD program (2x2x2 over the 8
    virtual devices) -- the analogue of the reference running MPI domain
    decomposition while also parallelising its serial time loop."""
    from control_tpu.parallel.sharding import (make_spacetime_mesh,
                                               shard_spacetime_stack)
    assert len(jax.devices()) >= 8
    import __graft_entry__ as g
    ctl, space = g._heat_problem(n=15, n_t=9)   # 8 blocks, 16^2 nodes
    ctl.set_schur_sweep("paradiag")
    system, pc, b_0, b_1 = g._solve_pieces(ctl)
    params = {"linear_solver": "gmres", "gmres_restart": 10,
              "maximum_iterations": 40, "relative_tolerance": 1e-8,
              "absolute_tolerance": 0.0}
    solve = jax.jit(system.solve_fn(solver_parameters=params, pc_fn=pc))
    u0 = 0.0 * b_0
    v_ref, z_ref, info_ref = solve(u0, u0, b_0, b_1)

    mesh = make_spacetime_mesh(devices=jax.devices()[:8])
    assert tuple(mesh.shape.values()) == (2, 2, 2)
    b_0s = shard_spacetime_stack(b_0, mesh, space)
    b_1s = shard_spacetime_stack(b_1, mesh, space)
    u0s = shard_spacetime_stack(u0, mesh, space)
    v_s, z_s, info_s = solve(u0s, u0s, b_0s, b_1s)

    assert int(info_s["iterations"]) == int(info_ref["iterations"])
    assert float(jnp.abs(v_s - v_ref).max()) < 1e-11
    assert float(jnp.abs(z_s - z_ref).max()) < 1e-11


def test_sharded_incompressible_solve_matches_single_device():
    """Spatial sharding of the INCOMPRESSIBLE (Stokes control) path:
    vector velocity + pressure + the nested inner-GMRES(5) /
    pressure-Schur pc in one SPMD program.  The reference runs its whole
    suite -- Stokes included -- at 4 MPI ranks (reference
    test/test_control.py:21-23)."""
    assert len(jax.devices()) >= 8
    from control_tpu import (Control, UnitSquareMesh, VectorFunctionSpace,
                             FunctionSpace, Function, DirichletBC,
                             SpatialCoordinate, ConstantNullspace, grad,
                             inner, dx, sin, pi)
    smesh = UnitSquareMesh(8, 8, quadrilateral=True)
    space_v = VectorFunctionSpace(smesh, "Lagrange", 2)
    space_p = FunctionSpace(smesh, "Lagrange", 1)
    X = SpatialCoordinate(smesh)

    def fdo(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test, t):
        v_d = Function(space_v).interpolate(
            (0.2 * sin(pi * X[0]) * sin(pi * X[1]),
             0.1 * sin(2 * pi * X[0]) * sin(pi * X[1])))
        return inner(v_d, test) * dx, v_d

    def ff(test, t):
        return inner(Function(space_v), test) * dx

    def bc_t(s, t):
        return DirichletBC(s, (0.0, 0.0), "on_boundary")

    ctl = Control.Instationary(space_v, fdo, desired_state=ds_,
                               force_f=ff, beta=1e-2, space_p=space_p,
                               n_t=4, time_interval=(0.0, 1.0), CN=True,
                               bcs_v=bc_t)
    system, pc_fn, b_0, b_1 = ctl.incompressible_linear_solve(
        ConstantNullspace(), lambda_v_bounds=(0.25, 1.5625),
        lambda_p_bounds=(0.25, 2.25), _return_pieces=True)
    params = {"linear_solver": "fgmres", "fgmres_restart": 10,
              "maximum_iterations": 100, "relative_tolerance": 1e-8,
              "absolute_tolerance": 0.0}
    base_solve = system.solve_fn(solver_parameters=params, pc_fn=pc_fn)
    solve = jax.jit(base_solve)
    z0, z1 = 0.0 * b_0, 0.0 * b_1
    v_ref, p_ref, info_ref = solve(z0, z1, b_0, b_1)

    # Q2 node grids are odd-sized (2n+1): sharding goes through the GSPMD
    # partitioner in-trace (pads uneven shards) instead of device_put
    from control_tpu.parallel.sharding import constrain_stack
    mesh = make_device_mesh(devices=jax.devices()[:8])

    def solve_sharded(u0, u1, c0, c1):
        u0 = constrain_stack(u0, mesh, space_v)
        u1 = constrain_stack(u1, mesh, space_p)
        c0 = constrain_stack(c0, mesh, space_v)
        c1 = constrain_stack(c1, mesh, space_p)
        return base_solve(u0, u1, c0, c1)

    v_s, p_s, info_s = jax.jit(solve_sharded)(z0, z1, b_0, b_1)

    assert int(info_s["iterations"]) == int(info_ref["iterations"])
    assert float(jnp.abs(v_s - v_ref).max()) < 1e-10
    assert float(jnp.abs(p_s - p_ref).max()) < 1e-10


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in out)


def test_sharded_3d_solve_matches_single_device():
    """Spatial sharding of a 3-D (hex) all-at-once solve: the last two
    grid axes (y, x) shard over the device mesh, z stays local."""
    assert len(jax.devices()) >= 8
    from control_tpu import (Control, UnitCubeMesh, FunctionSpace, Function,
                             DirichletBC, grad, inner, dx)
    import __graft_entry__ as g
    mesh3 = UnitCubeMesh(7, 7, 4)   # (8, 8) y/x nodes divide the 2x4 mesh
    space = FunctionSpace(mesh3, "Lagrange", 1)

    def fdo(trial, test, u, t):
        return inner(grad(trial), grad(test)) * dx

    def ds_(test, t):
        return inner(Function(space), test) * dx, Function(space)

    def ff(test, t):
        f = Function(space)
        f.data = f.data + 1.0
        return inner(f, test) * dx

    def bc_t(s, t):
        return DirichletBC(s, 0.0, "on_boundary")

    ctl = Control.Instationary(space, fdo, desired_state=ds_, force_f=ff,
                               beta=1e-3, n_t=4, time_interval=(0.0, 1.0),
                               CN=True, bcs_v=bc_t)
    system, pc, b_0, b_1 = g._solve_pieces(ctl,
                                           lambda_v_bounds=(0.125, 3.375))
    params = {"linear_solver": "gmres", "gmres_restart": 10,
              "maximum_iterations": 40, "relative_tolerance": 1e-8,
              "absolute_tolerance": 0.0}
    solve = jax.jit(system.solve_fn(solver_parameters=params, pc_fn=pc))
    u0 = 0.0 * b_0
    v_ref, z_ref, info_ref = solve(u0, u0, b_0, b_1)

    mesh = make_device_mesh(devices=jax.devices()[:8])
    b_0s = shard_stack(b_0, mesh, space)
    b_1s = shard_stack(b_1, mesh, space)
    u0s = shard_stack(u0, mesh, space)
    v_s, z_s, info_s = solve(u0s, u0s, b_0s, b_1s)

    assert int(info_s["iterations"]) == int(info_ref["iterations"])
    assert float(jnp.abs(v_s - v_ref).max()) < 1e-11
    assert float(jnp.abs(z_s - z_ref).max()) < 1e-11
