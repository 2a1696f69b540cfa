"""Secondary BASELINE benchmark configs (BENCH_CONFIG=poisson|convdiff|
stokes): one KKT solve each through the public problem-layer API."""

import jax.numpy as jnp

from control_tpu import (Control, UnitSquareMesh, RectangleMesh,
                         FunctionSpace, VectorFunctionSpace, Function,
                         DirichletBC, SpatialCoordinate, ConstantNullspace,
                         grad, inner, dot, dx, as_vector, sin, pi)


def build_extra(config):
    dtype = jnp.float32
    if config == "poisson":
        # stationary Poisson distributed control, 256^2 Q1
        mesh = UnitSquareMesh(256, 256, quadrilateral=True, dtype=dtype)
        space = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)

        def fdo(trial, test, u):
            return inner(grad(trial), grad(test)) * dx

        def ds_(test):
            v_d = Function(space).interpolate(
                sin(pi * X[0]) * sin(pi * X[1]))
            return inner(v_d, test) * dx, v_d

        def ff(test):
            return inner(Function(space), test) * dx

        ctl = Control.Stationary(space, fdo, desired_state=ds_, force_f=ff,
                                 beta=1e-4,
                                 bcs_v=DirichletBC(space, 0.0,
                                                   "on_boundary"))

        def run():
            ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                             solver_parameters={
                                 "linear_solver": "gmres",
                                 "gmres_restart": 10,
                                 "maximum_iterations": 50,
                                 "relative_tolerance": 1.0e-6,
                                 "absolute_tolerance": 0.0,
                                 "monitor_convergence": False},
                             print_error=False, create_output=False,
                             plots=False)
            return ctl.last_solve_info
        return run

    if config == "convdiff":
        # instationary convection-diffusion control (nonsymmetric)
        mesh = RectangleMesh(64, 64, 2.0, 2.0, quadrilateral=True,
                             dtype=dtype)
        space = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)
        nu = 1.0 / 50.0

        def fdo(trial, test, u, t):
            wind = as_vector([X[1] - 1.0, 1.0 - X[0]])
            return (nu * inner(grad(trial), grad(test)) * dx
                    + inner(dot(wind, grad(trial)), test) * dx)

        def ds_(test, t):
            v_d = Function(space).interpolate(
                sin(0.5 * pi * X[0]) * sin(0.5 * pi * X[1]))
            return inner(v_d, test) * dx, v_d

        def ff(test, t):
            return inner(Function(space), test) * dx

        def bc_t(s, t):
            return DirichletBC(s, 0.0, "on_boundary")

        ctl = Control.Instationary(space, fdo, desired_state=ds_,
                                   force_f=ff, beta=1e-2, n_t=16,
                                   time_interval=(0.0, 2.0), CN=True,
                                   bcs_v=bc_t)

        def run():
            ctl.linear_solve(lambda_v_bounds=(0.25, 2.25),
                             solver_parameters={
                                 "linear_solver": "gmres",
                                 "gmres_restart": 10,
                                 "maximum_iterations": 50,
                                 "relative_tolerance": 1.0e-6,
                                 "absolute_tolerance": 0.0,
                                 "monitor_convergence": False},
                             print_error=False, create_output=False,
                             plots=False)
            return ctl.last_solve_info
        return run

    if config == "stokes":
        # instationary Stokes control (Taylor-Hood Q2-Q1), 16^2 x 16.
        # On TPU this runs through the host-loop FGMRES (the fused program
        # faults the single-chip backend); larger configurations compile
        # too slowly on the remote axon compiler (32^2 x 16 > 1 h)
        mesh = UnitSquareMesh(16, 16, quadrilateral=True, dtype=dtype)
        space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
        space_p = FunctionSpace(mesh, "Lagrange", 1)

        def fdo(trial, test, u, t):
            return inner(grad(trial), grad(test)) * dx

        def ds_(test, t):
            X = SpatialCoordinate(mesh)
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
                                   n_t=16, time_interval=(0.0, 1.0),
                                   CN=True, bcs_v=bc_t)
        import os as _os
        if _os.environ.get("CONTROL_TPU_FUSED_INCOMPRESSIBLE") == "1":
            # the single fused-program solve: proven on TPU this round
            # (75 s vs 165 s host loop); opt-in here to keep the default
            # artifact comparable across rounds
            ctl.set_incompressible_execution("fused")

        def run():
            ctl.incompressible_linear_solve(
                ConstantNullspace(),
                lambda_v_bounds=(0.25, 1.5625),
                lambda_p_bounds=(0.25, 2.25),
                solver_parameters={"linear_solver": "fgmres",
                                   "fgmres_restart": 10,
                                   "maximum_iterations": 100,
                                   "relative_tolerance": 1.0e-6,
                                   "absolute_tolerance": 0.0,
                                   "monitor_convergence": False},
                print_error=False, create_output=False, plots=False)
            return ctl.last_solve_info
        return run

    if config == "nse":
        # instationary Navier-Stokes Picard control: the nonlinear loop
        # re-linearises every outer step, exercising the state-as-argument
        # host-loop programs (one compiled executable across all Picard
        # iterations)
        mesh = UnitSquareMesh(12, 12, quadrilateral=True, dtype=dtype)
        space_v = VectorFunctionSpace(mesh, "Lagrange", 2)
        space_p = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)
        nu = 0.1

        def fdo(trial, test, u, t):
            return (nu * inner(grad(trial), grad(test)) * dx
                    + inner(dot(grad(trial), u), test) * dx)

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
                                   force_f=ff, beta=1e-1, space_p=space_p,
                                   n_t=8, time_interval=(0.0, 1.0),
                                   CN=True, bcs_v=bc_t)

        def run():
            ctl.incompressible_non_linear_solve(
                ConstantNullspace(),
                lambda_v_bounds=(0.25, 1.5625),
                lambda_p_bounds=(0.25, 2.25),
                solver_parameters={"linear_solver": "fgmres",
                                   "fgmres_restart": 10,
                                   "maximum_iterations": 100,
                                   "relative_tolerance": 1.0e-6,
                                   "absolute_tolerance": 0.0,
                                   "monitor_convergence": False},
                max_non_linear_iter=5,
                print_error_linear=False, print_error_non_linear=False,
                create_output=False, plots=False)
            return ctl.last_solve_info
        return run

    if config == "heat3d":
        # 3-D instationary heat control (capability extension; 64^3 Q1,
        # n_t=16, CN, ParaDiag sweeps)
        import os
        n3 = int(os.environ.get("BENCH3D_N", "64"))
        nt3 = int(os.environ.get("BENCH3D_NT", "16"))
        from control_tpu import UnitCubeMesh
        mesh = UnitCubeMesh(n3, n3, n3, dtype=dtype)
        space = FunctionSpace(mesh, "Lagrange", 1)
        X = SpatialCoordinate(mesh)

        def fdo(trial, test, u, t):
            return inner(grad(trial), grad(test)) * dx

        def ds_(test, t):
            v_d = Function(space).interpolate(
                sin(pi * X[0]) * sin(pi * X[1]) * sin(pi * X[2]))
            return inner(v_d, test) * dx, v_d

        def ff(test, t):
            return inner(Function(space), test) * dx

        def bc_t(s, t):
            return DirichletBC(s, 0.0, "on_boundary")

        ctl = Control.Instationary(space, fdo, desired_state=ds_,
                                   force_f=ff, beta=1e-4, n_t=nt3,
                                   time_interval=(0.0, 2.0), CN=True,
                                   bcs_v=bc_t)
        # same env knobs as the flagship 2-D bench (bench.py)
        sm = os.environ.get("BENCH_PD_SMOOTH")
        ctl.set_schur_sweep(
            "paradiag",
            paradiag_cycles=(int(os.environ["BENCH_PD_CYCLES"])
                             if os.environ.get("BENCH_PD_CYCLES")
                             else None),
            smooth=(int(sm), int(sm)) if sm else None,
            weight_dtype=os.environ.get("BENCH_PD_WEIGHT_DTYPE"))
        ms3 = os.environ.get("BENCH_MASS_STEPS")
        if ms3:
            ctl.set_mass_solver_steps(int(ms3))

        def run():
            ctl.linear_solve(
                lambda_v_bounds=(0.125, 3.375),
                solver_parameters={"linear_solver": "gmres",
                                   "gmres_restart": 10,
                                   "maximum_iterations": 50,
                                   "relative_tolerance": 1.0e-6,
                                   "absolute_tolerance": 0.0,
                                   "monitor_convergence": False},
                print_error=False, create_output=False, plots=False)
            return ctl.last_solve_info
        return run

    raise ValueError(f"unknown BENCH_CONFIG {config!r}")
