"""Stationary PDE-constrained optimal control problems.

TPU-native rebuild of ``Control.Stationary``
(reference control/control.py:100-1487): the first-order optimality (KKT)
system

    [ M_v    D_zeta^T ] [v   ]   [ v_d ]
    [ D_v   -(1/b) M  ] [zeta] = [ f   ]

is solved matrix-free with a jit-compiled preconditioned Krylov method; the
built-in preconditioner is block-triangular with the Pearson-Wathen
matching-Schur approximation S ~ (D + b^{-1/2}M) M^{-1} (D^T + b^{-1/2}M)
(reference control/control.py:351-450), with geometric multigrid standing in
for hypre BoomerAMG and a Chebyshev semi-iteration for the mass solves.
Incompressible (Stokes/Navier-Stokes) variants add the divergence
constraint blocks and the nested pressure-Schur preconditioner with an
inner fixed-5-iteration GMRES (reference control/control.py:802-1487).
"""

import numpy as np
import jax.numpy as jnp

from ..fem.expr import TrialFunction, TestFunction, inner, grad, div
from ..fem.forms import dx, Form
from ..fem.space import (Function, Cofunction, DirichletBC, homogenize,
                         combine_masks, _SubView)
from ..fem.assemble import assemble
from ..ops.local_op import LocalOp
from ..solvers.block import (MultiBlockSystem, DirichletBCNullspace,
                             NoneNullspace)
from ..utils import io as _io
from .common import (BlockSolver, mass_solver, zero_rows, picard_operator,
                     gauss_newton_operator, trial_linearized_operator,
                     residual_vector, bc_lift_function)


def _as_bcs_tuple(bcs):
    if bcs is None:
        return ()
    if isinstance(bcs, DirichletBC):
        return (bcs,)
    return tuple(bcs)


class Stationary:
    """See module docstring.  API mirrors the reference constructor
    (control/control.py:101-104); both ``force_f`` (documented name,
    README.md:63) and ``force_function`` are accepted."""

    def __init__(self, space_v, forward_form, desired_state=None,
                 force_f=None, *, beta=10.0**-3, space_p=None,
                 Gauss_Newton=False, bcs_v=None, force_function=None):
        bcs_v = _as_bcs_tuple(bcs_v)
        if force_f is None:
            force_f = force_function

        v_test, v_trial = TestFunction(space_v), TrialFunction(space_v)

        if desired_state is None:
            def desired_state(test_v):
                v_d = Function(space_v, name="v_d")
                return inner(v_d, test_v) * dx, v_d
        if force_f is None:
            def force_f(test_v):
                f = Function(space_v, name="f")
                return inner(f, test_v) * dx

        self._space_v = space_v
        self._space_p = space_p
        self._forward_form = forward_form
        self._desired_state = desired_state
        self._force_function = force_f
        self._beta = beta
        self._bcs_v = bcs_v
        self._Gauss_Newton = Gauss_Newton

        self._M_v = inner(v_trial, v_test) * dx
        self._M_zeta = inner(v_trial, v_test) * dx

        v = Function(space_v, name="v")
        for bc in bcs_v:
            bc.apply(v)
        self._v = v
        self._zeta = Function(space_v, name="zeta")

        if space_p is not None:
            p_test, p_trial = TestFunction(space_p), TrialFunction(space_p)
            self._M_p = inner(p_trial, p_test) * dx
            self._M_mu = inner(p_trial, p_test) * dx
            self._p = Function(space_p, name="p")
            self._mu = Function(space_p, name="mu")
        else:
            self._M_p = None
            self._M_mu = None

        self._true_v = None
        from .common import KernelCache
        self._kernel_cache = KernelCache()

    # ---------------------------------------------------------------- setters
    def set_space_v(self, space_v, *, v=None, zeta=None, bcs_v_new=False,
                    bcs_v=None):
        self._space_v = space_v
        v_test, v_trial = TestFunction(space_v), TrialFunction(space_v)
        self._M_v = inner(v_trial, v_test) * dx
        self._M_zeta = inner(v_trial, v_test) * dx
        if v is None:
            v = Function(space_v, name="v").interpolate(self._v)
        elif v.function_space() != space_v:
            raise ValueError("Unexpected space")
        if bcs_v_new:
            self._bcs_v = _as_bcs_tuple(bcs_v)
        for bc in self._bcs_v:
            bc.apply(v)
        if zeta is None:
            zeta = Function(space_v, name="zeta").interpolate(self._zeta)
        elif zeta.function_space() != space_v:
            raise ValueError("Unexpected space")
        else:
            for bc in homogenize(self._bcs_v):
                bc.apply(zeta)
        self._v, self._zeta = v, zeta

    def set_space_p(self, space_p, *, p=None, mu=None):
        self._space_p = space_p
        p_test, p_trial = TestFunction(space_p), TrialFunction(space_p)
        self._M_p = inner(p_trial, p_test) * dx
        self._M_mu = inner(p_trial, p_test) * dx
        self._p = p if p is not None else Function(space_p, name="p")
        self._mu = mu if mu is not None else Function(space_p, name="mu")

    def set_forward_form(self, forward_form):
        self._forward_form = forward_form

    def set_desired_state(self, desired_state):
        self._desired_state = desired_state

    def set_force_function(self, force_function):
        self._force_function = force_function

    def set_beta(self, beta):
        self._beta = beta

    def set_bcs_v(self, bcs_v, space_v=None):
        if space_v is None:
            self._bcs_v = _as_bcs_tuple(bcs_v)
        else:
            self.set_space_v(space_v, bcs_v_new=True, bcs_v=bcs_v)

    def set_mass_solver_steps(self, steps):
        """Chebyshev step count of the preconditioner's (1,1)-block mass
        solves (reference fixes 20, control/control.py:377-385; ~10-12
        usually holds the outer iteration count at half the cost)."""
        self._mass_cheb_steps = None if steps is None else int(steps)

    def set_incompressible_execution(self, mode=None):
        """How the incompressible KKT solve executes on accelerators:
        "fused" -- the whole solve is ONE XLA program (fastest when it
        compiles: 75 s vs 165 s host-loop on the 16^2 x 16 TPU Stokes
        bench, but compile time grows steeply with problem size);
        "host" -- the outer FGMRES runs on the host, dispatching
        separately-jitted operator/pc programs (bounded compile; the
        accelerator default); None -- auto (host on accelerators, fused
        on CPU)."""
        if mode not in (None, "fused", "host"):
            raise ValueError(f"unknown incompressible execution {mode!r}")
        self._host_loop = None if mode is None else (mode == "host")

    def set_Gauss_Newton(self, Gauss_Newton=True):
        self._Gauss_Newton = Gauss_Newton

    def set_v(self, v_new):
        if v_new.function_space() != self._space_v:
            raise ValueError("Unexpected space")
        h = Function(self._space_v, data=v_new.data)
        for bc in self._bcs_v:
            bc.apply(h)
        self._v.assign(h)

    def set_zeta(self, zeta_new):
        if zeta_new.function_space() != self._space_v:
            raise ValueError("Unexpected space")
        h = Function(self._space_v, data=zeta_new.data)
        for bc in homogenize(self._bcs_v):
            bc.apply(h)
        self._zeta.assign(h)

    def set_p(self, p_new):
        if self._space_p is None:
            raise ValueError("Undefined space_p: unable to assign value")
        self._p.assign(p_new)

    def set_mu(self, mu_new):
        if self._space_p is None:
            raise ValueError("Undefined space_p: unable to assign value")
        self._mu.assign(mu_new)

    def print_error(self):
        err = self._v - self._true_v
        e = float(jnp.sqrt(jnp.abs(assemble(inner(err, err) * dx))))
        print(f"Estimated error in the L2-norm: {e:.16e}")

    # ------------------------------------------------------------- operators
    def construct_D_v(self, v_old):
        """(D_v, D_zeta) LocalOps at linearisation state v_old
        (reference control/control.py:314-324)."""
        if not self._Gauss_Newton:
            v_test = TestFunction(self._space_v)
            v_trial = TrialFunction(self._space_v)
            D_v = picard_operator(
                self._forward_form(v_trial, v_test, v_old))
        else:
            D_v = gauss_newton_operator(self._forward_form, self._space_v,
                                        v_old)
        return D_v, D_v.T

    def _residual_term(self, v_old):
        """N(v_old) as a dual vector (= action(D_v, v_old) for Picard-style
        forms)."""
        return residual_vector(self._forward_form, self._space_v, v_old)

    # ---------------------------------------------------- rhs construction
    def _setup_bcs(self):
        inhom = any(not bc.is_homogeneous for bc in self._bcs_v)
        bcs_v = homogenize(self._bcs_v) if inhom else self._bcs_v
        return inhom, bcs_v, self._bcs_v

    def construct_f(self, inhom, D_v, v_inhom, mask):
        v_test = TestFunction(self._space_v)
        f = assemble(self._force_function(v_test))
        if inhom:
            f.data = zero_rows(mask, f.data - D_v.apply(v_inhom.data))
        return f

    def construct_v_d(self, M_v, inhom, v_inhom, mask):
        v_test = TestFunction(self._space_v)
        v_d_form, true_v = self._desired_state(v_test)
        self._true_v = true_v
        v_d = assemble(v_d_form)
        if inhom:
            v_d.data = zero_rows(mask, v_d.data - M_v.apply(v_inhom.data))
        return v_d

    # ------------------------------------------------------- preconditioner
    def construct_pc(self, Multigrid, lambda_v_bounds, mask_v, mask_zeta,
                     D_v, D_zeta, M_v, prebuilt=None):
        """Block-triangular matching-Schur preconditioner
        (reference control/control.py:351-450).  The returned closure
        carries a ``.state`` pytree of its derived numeric state; pass it
        back via ``prebuilt=`` to rebuild the pc inside a trace with the
        state as an argument (see instationary.construct_pc)."""
        beta = self._beta
        shift = 1.0 / beta ** 0.5

        def pb(k):
            return None if prebuilt is None else prebuilt[k]

        solver_0 = mass_solver(M_v, mask_v, Multigrid, lambda_v_bounds,
                               state=pb("solver_0"),
                               steps=getattr(self, "_mass_cheb_steps",
                                             None))
        solver_1 = BlockSolver(D_v + shift * M_v, mask_zeta, ("mg", 2),
                               state=pb("solver_1"))
        solver_2 = BlockSolver(D_zeta + shift * M_v, mask_zeta, ("mg", 2),
                               state=pb("solver_2"))

        def pc_linear(b_0, b_1):
            u_0 = solver_0(b_0)
            b = D_v.apply(u_0) - b_1
            b = zero_rows(mask_zeta, b)
            u_1 = solver_1(b)
            b = zero_rows(mask_zeta, M_v.apply(u_1))
            u_1 = solver_2(b)
            return u_0, u_1

        pc_linear.state = {"solver_0": solver_0.state,
                           "solver_1": solver_1.state,
                           "solver_2": solver_2.state}
        return pc_linear

    # ---------------------------------------------------------- linear solve
    def linear_solve(self, *, P=None, solver_parameters=None,
                     Multigrid=False, lambda_v_bounds=None, v_d=None,
                     f=None, print_error=True, create_output=True,
                     plots=False):
        from contextlib import ExitStack
        from .common import host_setup
        _hs = ExitStack()
        _hs.enter_context(host_setup())
        space_v = self._space_v
        inhom, bcs_v, bcs_v_help = self._setup_bcs()
        bcs_zeta = bcs_v
        mask = combine_masks(space_v, bcs_v) if bcs_v else None

        nullspace_v = (DirichletBCNullspace(bcs_v) if bcs_v
                       else NoneNullspace())
        nullspace_zeta = (DirichletBCNullspace(bcs_zeta) if bcs_zeta
                          else NoneNullspace())

        beta = self._beta
        v_old = Function(space_v, name="v_old", data=self._v.data)
        D_v, D_zeta = self.construct_D_v(v_old)
        M_v = assemble(self._M_v)

        v_inhom = bc_lift_function(space_v, bcs_v_help) if inhom else None

        if f is None:
            f = self.construct_f(inhom, D_v, v_inhom, mask)
        if v_d is None:
            v_d = self.construct_v_d(M_v, inhom, v_inhom, mask)

        if solver_parameters is None:
            solver_parameters = {"linear_solver": "gmres",
                                 "gmres_restart": 10,
                                 "maximum_iterations": 50,
                                 "relative_tolerance": 1.0e-6,
                                 "absolute_tolerance": 0.0,
                                 "monitor_convergence": print_error}

        # mixed-precision iterative refinement (TPU extension; see
        # common.run_iterative_refinement): "iterative_refinement": k adds
        # up to k f64 true-residual corrections around the f32 solve
        from .common import pop_refinement_params
        solver_parameters, outer_sp, ir_steps = pop_refinement_params(
            solver_parameters)

        # cached end-to-end kernel (see instationary.linear_solve): the
        # linearisation state D_v and the rhs are kernel arguments, so
        # Picard / Gauss-Newton iterations reuse one compiled executable
        from .common import (array_token, params_token, run_kernel,
                             device_zeros_like)
        from ..solvers.block import finalize_solve_info
        M_zeta = assemble(self._M_zeta)
        key = ("linear", self._beta, Multigrid,
               None if lambda_v_bounds is None else tuple(lambda_v_bounds),
               array_token(mask), params_token(solver_parameters),
               getattr(self, "_mass_cheb_steps", None),
               None if P is None else id(P), id(space_v))

        def builder():
            sp_params = dict(solver_parameters)

            def core(Dv_A, pc_state, b_0, b_1, u_0, u_1):
                D_v_t = LocalOp(Dv_A, space_v, space_v)
                D_zeta_t = D_v_t.T
                M_v_t = LocalOp(M_v.A, space_v, space_v)
                if P is not None:
                    pc_fn = P
                else:
                    pc_fn1 = self.construct_pc(
                        Multigrid, lambda_v_bounds, mask, mask,
                        D_v_t, D_zeta_t, M_v_t, prebuilt=pc_state)

                    def pc_fn(b0, b1):
                        u0, u1 = pc_fn1(b0[0], b1[0])
                        return u0[None], u1[None]

                system = MultiBlockSystem(
                    space_v, space_v,
                    block_00={(0, 0): M_v_t},
                    block_01={(0, 0): D_zeta_t},
                    block_10={(0, 0): D_v_t},
                    block_11={(0, 0): -(1.0 / beta)
                              * LocalOp(M_zeta.A, space_v, space_v)},
                    nullspace_0=(nullspace_v,),
                    nullspace_1=(nullspace_zeta,))
                solve = system.solve_fn(solver_parameters=sp_params,
                                        pc_fn=pc_fn)
                return solve(u_0, u_1, b_0, b_1)

            return core

        pc_state = None
        if P is None:
            # host-derived pc numeric state as a kernel argument (see
            # instationary.linear_solve), cached per linearisation state
            if not hasattr(self, "_pc_state_cache"):
                self._pc_state_cache = {}
            tok = (key, array_token(D_v.A))
            pc_state = self._pc_state_cache.get(tok)
            if pc_state is None:
                if len(self._pc_state_cache) > 4:
                    self._pc_state_cache.clear()
                from .common import to_device
                pc_state = to_device(
                    self.construct_pc(Multigrid, lambda_v_bounds,
                                      mask, mask, D_v, D_v.T, M_v).state)
                self._pc_state_cache[tok] = pc_state
        kernel = self._kernel_cache.get(key, builder,
                                        pin=(P, space_v, M_v, M_zeta))
        _hs.close()
        b0s, b1s = v_d.data[None], f.data[None]
        u0, u1, info_d = run_kernel(kernel, D_v.A, pc_state, b0s, b1s,
                                    jnp.zeros_like(b0s),
                                    jnp.zeros_like(b1s))
        if ir_steps:
            from .common import run_iterative_refinement
            from ..solvers.block import _apply_per_block
            dtype = space_v.mesh.dtype

            def build64():
                def op64(A):
                    return LocalOp(jnp.asarray(np.asarray(A)).astype(
                        jnp.float64), space_v, space_v)

                Dv64 = op64(D_v.A)
                system = MultiBlockSystem(
                    space_v, space_v,
                    block_00={(0, 0): op64(M_v.A)},
                    block_01={(0, 0): Dv64.T},
                    block_10={(0, 0): Dv64},
                    block_11={(0, 0): -(1.0 / beta) * op64(M_zeta.A)},
                    nullspace_0=(nullspace_v,),
                    nullspace_1=(nullspace_zeta,))
                bc0 = _apply_per_block(
                    system.ns0, "correct_rhs",
                    jnp.asarray(np.asarray(b0s)).astype(jnp.float64))
                bc1 = _apply_per_block(
                    system.ns1, "correct_rhs",
                    jnp.asarray(np.asarray(b1s)).astype(jnp.float64))

                def proj(a0, a1):
                    return (_apply_per_block(system.ns0, "correct_rhs",
                                             a0),
                            _apply_per_block(system.ns1, "correct_rhs",
                                             a1))

                return system.mult, bc0, bc1, proj

            def solve_fn(r0, r1):
                return run_kernel(kernel, D_v.A, pc_state, r0, r1,
                                  jnp.zeros_like(b0s),
                                  jnp.zeros_like(b1s))

            x0, x1, info = run_iterative_refinement(
                build64, solve_fn, u0, u1, info_d["iterations"],
                ir_steps, outer_sp, dtype)
            u0 = jnp.asarray(x0.astype(dtype))
            u1 = jnp.asarray(x1.astype(dtype))
        else:
            info = finalize_solve_info(info_d, solver_parameters)
        v = Function(space_v, name="v", data=u0[0])
        zeta = Function(space_v, name="zeta", data=u1[0])
        self.last_solve_info = info

        if inhom:
            v.data = v.data + v_inhom.data
        self.set_v(v)
        self.set_zeta(zeta)

        if create_output:
            _io.write_solution("v", v)
            _io.write_solution("zeta", zeta)
        if plots:
            _io.plot_fields(v=v, zeta=zeta, true_v=self._true_v)
        if print_error:
            self.print_error()

    # ------------------------------------------------------- nonlinear solve
    def non_linear_res_eval(self, v_d, f, v_old, zeta_old, D_zeta,
                            mask_v, mask_zeta):
        """KKT residual at (v_old, zeta_old)
        (reference control/control.py:452-487)."""
        beta = self._beta
        M_v = assemble(self._M_v)
        rhs_0 = Cofunction(self._space_v, name="rhs_0")
        rhs_1 = Cofunction(self._space_v, name="rhs_1")
        rhs_0.data = (v_d.data - M_v.apply(v_old.data)
                      - D_zeta.apply(zeta_old.data))
        rhs_1.data = (f.data - self._residual_term(v_old).data
                      + (1.0 / beta) * M_v.apply(zeta_old.data))
        rhs_0.data = zero_rows(mask_v, rhs_0.data)
        rhs_1.data = zero_rows(mask_zeta, rhs_1.data)
        return rhs_0, rhs_1

    def non_linear_solve(self, *, P=None, solver_parameters=None,
                         Multigrid=False, lambda_v_bounds=None,
                         max_non_linear_iter=10,
                         relative_non_linear_tol=10.0**-5,
                         absolute_non_linear_tol=10.0**-8,
                         print_error_linear=False,
                         print_error_non_linear=True,
                         create_output=True, plots=False):
        """Picard (or Gauss-Newton) outer loop
        (reference control/control.py:630-800)."""
        space_v = self._space_v
        inhom, bcs_v, bcs_v_help = self._setup_bcs()
        bcs_zeta = bcs_v
        mask = combine_masks(space_v, bcs_v) if bcs_v else None

        v_old = Function(space_v, name="v_old", data=self._v.data)
        zeta_old = Function(space_v, name="zeta_old", data=self._zeta.data)

        v_test = TestFunction(space_v)
        f = assemble(self._force_function(v_test))
        v_d_form, true_v = self._desired_state(v_test)
        self._true_v = true_v
        v_d = assemble(v_d_form)

        _, D_zeta = self.construct_D_v(v_old)
        rhs_0, rhs_1 = self.non_linear_res_eval(
            v_d, f, v_old, zeta_old, D_zeta, mask, mask)

        def _norm(a, b):
            return float(jnp.sqrt(jnp.vdot(a.data, a.data)
                                  + jnp.vdot(b.data, b.data)))

        norm_0 = _norm(rhs_0, rhs_1)
        norm_k = norm_0
        k = 0
        print(f"Initial non-linear residual: {norm_0:.16e}")

        while (norm_k > relative_non_linear_tol * norm_0
               and norm_k > absolute_non_linear_tol):
            self.linear_solve(P=P, solver_parameters=solver_parameters,
                              Multigrid=Multigrid,
                              lambda_v_bounds=lambda_v_bounds,
                              v_d=rhs_0, f=rhs_1,
                              print_error=print_error_linear,
                              create_output=False, plots=False)
            # linear_solve left deltas in self._v/zeta; accumulate
            v_old.data = v_old.data + self._v.data
            if inhom:
                for bc in bcs_v_help:
                    bc.apply(v_old)
            self.set_v(v_old)
            v_old.data = self._v.data

            zeta_old.data = zeta_old.data + self._zeta.data
            for bc in bcs_zeta:
                bc.apply(zeta_old)
            self.set_zeta(zeta_old)
            zeta_old.data = self._zeta.data

            _, D_zeta = self.construct_D_v(v_old)
            rhs_0, rhs_1 = self.non_linear_res_eval(
                v_d, f, v_old, zeta_old, D_zeta, mask, mask)
            norm_k = _norm(rhs_0, rhs_1)
            k += 1
            print(f"Non-linear solver: iteration {k:d}, "
                  f"non-linear residual norm {norm_k:.16e}")
            if k + 1 > max_non_linear_iter:
                break

        if print_error_non_linear:
            if (norm_k < relative_non_linear_tol * norm_0
                    or norm_k < absolute_non_linear_tol):
                print(f"Relative non-linear residual: {norm_k / norm_0:.16e}")
                print(f"Absolute non-linear residual: {norm_k:.16e}")
                print(f"Number of non-linear iterations: {k:d}")
            else:
                print("The non-linear iteration did not converge")
                print(f"Relative non-linear residual: {norm_k / norm_0:.16e}")
                print(f"Absolute non-linear residual: {norm_k:.16e}")
            self.print_error()

        if create_output:
            _io.write_solution("v", self._v)
            _io.write_solution("zeta", self._zeta)
        if plots:
            _io.plot_fields(v=self._v, zeta=self._zeta, true_v=self._true_v)

    # --------------------------------------------- incompressible (Stokes/NS)
    def incompressible_linear_solve(self, nullspace_p, *, space_p=None,
                                    P=None, solver_parameters=None,
                                    Multigrid=False, lambda_v_bounds=None,
                                    lambda_p_bounds=None,
                                    v_d=None, f=None, div_v=None,
                                    div_zeta=None, print_error=True,
                                    create_output=True, plots=False):
        """Velocity-pressure KKT solve with the nested preconditioner
        (reference control/control.py:802-1201): inner 5-iteration GMRES on
        the velocity KKT + pressure Schur K_p^{-1} (KKT_p) M_p^{-1}."""
        from contextlib import ExitStack
        from .common import host_setup
        _hs = ExitStack()
        _hs.enter_context(host_setup())
        space_v = self._space_v
        if space_p is None:
            if self._space_p is None:
                raise ValueError("Undefined space_p")
            space_p = self._space_p
        else:
            self.set_space_p(space_p)

        inhom, bcs_v, bcs_v_help = self._setup_bcs()
        bcs_zeta = bcs_v
        mask = combine_masks(space_v, bcs_v) if bcs_v else None

        nullspace_v = (DirichletBCNullspace(bcs_v) if bcs_v
                       else NoneNullspace())
        nullspace_zeta = (DirichletBCNullspace(bcs_zeta) if bcs_zeta
                          else NoneNullspace())

        beta = self._beta
        v_old = Function(space_v, name="v_old", data=self._v.data)
        D_v, D_zeta = self.construct_D_v(v_old)
        M_v = assemble(self._M_v)
        M_zeta_op = -(1.0 / beta) * assemble(self._M_zeta)

        v_trial = TrialFunction(space_v)
        v_test = TestFunction(space_v)
        p_trial = TrialFunction(space_p)
        p_test = TestFunction(space_p)
        B = assemble(-inner(div(v_trial), p_test) * dx)
        B_T = assemble(-inner(p_trial, div(v_test)) * dx)

        v_inhom = bc_lift_function(space_v, bcs_v_help) if inhom else None

        if f is None:
            f = self.construct_f(inhom, D_v, v_inhom, mask)
        if v_d is None:
            v_d = self.construct_v_d(M_v, inhom, v_inhom, mask)
        if div_v is None:
            div_v = Cofunction(space_p)
            if inhom:
                div_v.data = -B.apply(v_inhom.data)
        if div_zeta is None:
            div_zeta = Cofunction(space_p)

        b_0 = jnp.stack([v_d.data, f.data])
        b_1 = jnp.stack([div_v.data, div_zeta.data])

        if solver_parameters is None:
            solver_parameters = {"linear_solver": "fgmres",
                                 "fgmres_restart": 10,
                                 "maximum_iterations": 50,
                                 "relative_tolerance": 1.0e-6,
                                 "absolute_tolerance": 0.0,
                                 "monitor_convergence": print_error}

        # mixed-precision iterative refinement (see linear_solve /
        # common.run_iterative_refinement)
        from .common import pop_refinement_params
        solver_parameters, outer_sp, ir_steps = pop_refinement_params(
            solver_parameters)

        # pressure-space analogue of construct_D_v (reference
        # control/control.py:979-984): Picard assembles the form on
        # pressure trial/test; Gauss-Newton linearises its trial slot with
        # the velocity coefficient held fixed
        if P is not None:
            D_p = None
        elif not self._Gauss_Newton:
            D_p = picard_operator(
                self._forward_form(p_trial, p_test, v_old))
        else:
            D_p = trial_linearized_operator(
                self._forward_form, space_p, v_old)

        from .common import (array_token, params_token, run_kernel,
                             device_zeros_like)
        from ..solvers.block import finalize_solve_info
        key = ("incompressible", self._beta, Multigrid,
               None if lambda_v_bounds is None else tuple(lambda_v_bounds),
               None if lambda_p_bounds is None else tuple(lambda_p_bounds),
               array_token(mask), params_token(solver_parameters),
               getattr(self, "_mass_cheb_steps", None),
               None if P is None else id(P), id(nullspace_p),
               id(space_v), id(space_p))

        M_p = assemble(inner(p_trial, p_test) * dx)
        from .common import regularized_stiffness
        K_p = regularized_stiffness(
            assemble(inner(grad(p_trial), grad(p_test)) * dx), M_p)
        M_p_op = assemble(self._M_p) if self._M_p is not None else M_p
        M_mu_base = (assemble(self._M_mu) if self._M_mu is not None
                     else M_p)

        def make_pieces(Dv_A, Dp_A, M_v_t, M_zeta_t, pc_state=None):
                D_v_t = LocalOp(Dv_A, space_v, space_v)
                D_zeta_t = D_v_t.T
                system = MultiBlockSystem(
                    space_v, space_p,
                    block_00={(0, 0): M_v_t, (0, 1): D_zeta_t,
                              (1, 0): D_v_t, (1, 1): M_zeta_t},
                    block_01={(0, 0): B_T, (1, 1): B_T},
                    block_10={(0, 0): B, (1, 1): B},
                    block_11={},
                    n_blocks_00=2, n_blocks_11=2,
                    nullspace_0=(nullspace_v, nullspace_zeta),
                    nullspace_1=(nullspace_p, nullspace_p))

                if P is not None:
                    return system, P
                else:
                    inner_system = MultiBlockSystem(
                        space_v, space_v,
                        block_00={(0, 0): M_v_t},
                        block_01={(0, 0): D_zeta_t},
                        block_10={(0, 0): D_v_t},
                        block_11={(0, 0): M_zeta_t},
                        nullspace_0=(nullspace_v,),
                        nullspace_1=(nullspace_zeta,))
                    inner_pc1 = self.construct_pc(
                        Multigrid, lambda_v_bounds, mask, mask,
                        D_v_t, D_zeta_t, M_v_t,
                        prebuilt=None if pc_state is None
                        else pc_state["inner"])

                    def inner_pc(b0, b1):
                        u0, u1 = inner_pc1(b0[0], b1[0])
                        return u0[None], u1[None]

                    inner_solve = inner_system.solve_fn(
                        solver_parameters={"preconditioner": True,
                                           "linear_solver": "gmres",
                                           "maximum_iterations": 5,
                                           "relative_tolerance": 0.0,
                                           "absolute_tolerance": 0.0,
                                           "gmres_restart": 30},
                        pc_fn=inner_pc)

                    solver_K_p = BlockSolver(K_p, None, ("mg", 1),
                                             state=None if pc_state is None
                                             else pc_state["K_p"])
                    solver_M_p = mass_solver(M_p, None, False,
                                             lambda_p_bounds,
                                             state=None if pc_state is None
                                             else pc_state["M_p"],
                                             steps=getattr(
                                                 self, "_mass_cheb_steps",
                                                 None))
                    D_p_t = LocalOp(Dp_A, space_p, space_p)
                    D_mu_t = D_p_t.T
                    M_mu_op = -(1.0 / beta) * M_mu_base

                    def pc_fn(b_0, b_1):
                        z = jnp.zeros_like(b_0[0])
                        u0v, u0z, _ = inner_solve(z[None], z[None],
                                                  b_0[0][None],
                                                  b_0[1][None])
                        v_help, zeta_help = u0v[0], u0z[0]
                        u_0 = jnp.stack([v_help, zeta_help])
                        b0h = B.apply(v_help) - b_1[0]
                        b1h = B.apply(zeta_help) - b_1[1]
                        # one batched V-cycle / Chebyshev over the (mu, p)
                        # pair (the reference solves them separately,
                        # control/control.py:1042-1051,1071-1080)
                        u1k = solver_K_p(jnp.stack([b0h, b1h]))
                        u10, u11 = u1k[0], u1k[1]
                        c0 = M_p_op.apply(u10) + D_mu_t.apply(u11)
                        c1 = D_p_t.apply(u10) + M_mu_op.apply(u11)
                        return u_0, solver_M_p(jnp.stack([c0, c1]))

                pc_fn.state = {"inner": inner_pc1.state,
                               "K_p": solver_K_p.state,
                               "M_p": solver_M_p.state}
                return system, pc_fn

        M_zeta_op_A = assemble(self._M_zeta).A

        def build64():
            # f64 operator + corrected rhs + nullspace projection for the
            # refinement residuals (see common.run_iterative_refinement)
            def cast(A):
                return jnp.asarray(np.asarray(A)).astype(jnp.float64)

            from ..solvers.block import _apply_per_block
            Dv64 = LocalOp(cast(D_v.A), space_v, space_v)
            B64 = LocalOp(cast(B.A), B.trial_space, B.test_space)
            BT64 = LocalOp(cast(B_T.A), B_T.trial_space, B_T.test_space)
            system = MultiBlockSystem(
                space_v, space_p,
                block_00={(0, 0): LocalOp(cast(M_v.A), space_v, space_v),
                          (0, 1): Dv64.T, (1, 0): Dv64,
                          (1, 1): -(1.0 / beta) * LocalOp(
                              cast(M_zeta_op_A), space_v, space_v)},
                block_01={(0, 0): BT64, (1, 1): BT64},
                block_10={(0, 0): B64, (1, 1): B64},
                block_11={},
                n_blocks_00=2, n_blocks_11=2,
                nullspace_0=(nullspace_v, nullspace_zeta),
                nullspace_1=(nullspace_p, nullspace_p))
            bc0 = _apply_per_block(system.ns0, "correct_rhs", cast(b_0))
            bc1 = _apply_per_block(system.ns1, "correct_rhs", cast(b_1))

            def proj(a0, a1):
                return (_apply_per_block(system.ns0, "correct_rhs", a0),
                        _apply_per_block(system.ns1, "correct_rhs", a1))

            return system.mult, bc0, bc1, proj

        # see instationary.incompressible_linear_solve: on accelerators
        # the outer FGMRES runs on the host with separately-jitted
        # operator/pc programs (fused incompressible programs can exceed
        # the single-chip TPU backend's execution limits)
        import jax as _jax
        host_loop = getattr(self, "_host_loop", None)
        if host_loop is None:
            host_loop = _jax.default_backend() != "cpu"
        if host_loop:
            if not hasattr(self, "_host_cache"):
                self._host_cache = {}
            from ..fem.space import MixedFunction
            u_0_sol = MixedFunction(space_v, 2)
            u_1_sol = MixedFunction(space_p, 2)
            M_v_c = LocalOp(M_v.A, space_v, space_v)
            M_zeta_c = -(1.0 / beta) * LocalOp(M_zeta_op_A,
                                               space_v, space_v)
            if P is None:
                # state-as-argument programs: Picard/Gauss-Newton
                # iterations reuse one executable (see the instationary
                # twin for the rationale)
                ent = self._host_cache.get(key)
                if ent is None:
                    system0 = make_pieces(D_v.A, D_p.A, M_v_c, M_zeta_c)[0]

                    def mult_fn(state, u0, u1):
                        sys_t, _ = make_pieces(state["Dv"], state["Dp"],
                                               M_v_c, M_zeta_c,
                                               pc_state=state["pc"])
                        return sys_t.mult(u0, u1)

                    def pc_fn_s(state, b0, b1):
                        _, pcf = make_pieces(state["Dv"], state["Dp"],
                                             M_v_c, M_zeta_c,
                                             pc_state=state["pc"])
                        return pcf(b0, b1)

                    ent = self._host_cache[key] = (system0, mult_fn,
                                                   pc_fn_s, {})
                system0, mult_fn, pc_fn_s, store = ent
                if not hasattr(self, "_pc_state_cache"):
                    self._pc_state_cache = {}
                tok = (key, array_token(D_v.A), array_token(D_p.A))
                pc_state = self._pc_state_cache.get(tok)
                if pc_state is None:
                    if len(self._pc_state_cache) > 4:
                        self._pc_state_cache.clear()
                    from .common import to_device
                    pc_state = to_device(
                        make_pieces(D_v.A, D_p.A, M_v_c,
                                    M_zeta_c)[1].state)
                    self._pc_state_cache[tok] = pc_state
                from .common import to_device
                state = {"Dv": to_device(D_v.A), "Dp": to_device(D_p.A),
                         "pc": pc_state}
                _hs.close()
                info = system0.solve_host(
                    u_0_sol, u_1_sol, b_0, b_1,
                    solver_parameters=solver_parameters,
                    pc_fn=pc_fn_s, jit_store=store, op_state=state,
                    mult_fn=mult_fn)

                def solve_fn(r0, r1):
                    d0f = MixedFunction(space_v, 2)
                    d1f = MixedFunction(space_p, 2)
                    info_k = system0.solve_host(
                        d0f, d1f, r0, r1,
                        solver_parameters=solver_parameters,
                        pc_fn=pc_fn_s, jit_store=store, op_state=state,
                        mult_fn=mult_fn)
                    return d0f.data, d1f.data, \
                        {"iterations": info_k.iterations}
            else:
                htok = (key, array_token(D_v.A))
                ent = self._host_cache.get(htok)
                if ent is None:
                    system, pc_fn = make_pieces(D_v.A, None,
                                                M_v_c, M_zeta_c)
                    ent = self._host_cache[htok] = (system, pc_fn, {})
                system, pc_fn, store = ent
                _hs.close()
                info = system.solve_host(
                    u_0_sol, u_1_sol, b_0, b_1,
                    solver_parameters=solver_parameters,
                    pc_fn=pc_fn, jit_store=store)

                def solve_fn(r0, r1):
                    d0f = MixedFunction(space_v, 2)
                    d1f = MixedFunction(space_p, 2)
                    info_k = system.solve_host(
                        d0f, d1f, r0, r1,
                        solver_parameters=solver_parameters,
                        pc_fn=pc_fn, jit_store=store)
                    return d0f.data, d1f.data, \
                        {"iterations": info_k.iterations}
            u0, u1 = u_0_sol.data, u_1_sol.data
        else:
            def builder():
                sp_params = dict(solver_parameters)

                def core(Dv_A, Dp_A, pc_state, b_0, b_1, u_0i, u_1i):
                    M_v_t = LocalOp(M_v.A, space_v, space_v)
                    M_zeta_t = -(1.0 / beta) * LocalOp(M_zeta_op_A,
                                                       space_v, space_v)
                    system, pc_fn = make_pieces(Dv_A, Dp_A, M_v_t,
                                                M_zeta_t,
                                                pc_state=pc_state)
                    solve = system.solve_fn(solver_parameters=sp_params,
                                            pc_fn=pc_fn)
                    return solve(u_0i, u_1i, b_0, b_1)

                if P is not None:
                    return lambda Dv_A, b_0, b_1, u_0i, u_1i: core(
                        Dv_A, None, None, b_0, b_1, u_0i, u_1i)
                return core

            pc_state = None
            if P is None:
                # host-derived pc numeric state as a kernel argument,
                # cached per linearisation state
                if not hasattr(self, "_pc_state_cache"):
                    self._pc_state_cache = {}
                tok = (key, array_token(D_v.A), array_token(D_p.A))
                pc_state = self._pc_state_cache.get(tok)
                if pc_state is None:
                    if len(self._pc_state_cache) > 4:
                        self._pc_state_cache.clear()
                    M_v_c = LocalOp(M_v.A, space_v, space_v)
                    M_zeta_c = -(1.0 / beta) * LocalOp(M_zeta_op_A,
                                                       space_v, space_v)
                    from .common import to_device
                    pc_state = to_device(make_pieces(D_v.A, D_p.A, M_v_c,
                                                     M_zeta_c)[1].state)
                    self._pc_state_cache[tok] = pc_state
            kernel = self._kernel_cache.get(
                key, builder,
                pin=(P, nullspace_p, space_v, space_p, M_v, B, B_T,
                     K_p, M_p))
            _hs.close()
            z_0, z_1 = device_zeros_like(b_0), device_zeros_like(b_1)
            if P is None:
                u0, u1, info_d = run_kernel(kernel, D_v.A, D_p.A, pc_state,
                                            b_0, b_1, z_0, z_1)
            else:
                u0, u1, info_d = run_kernel(kernel, D_v.A, b_0, b_1,
                                            z_0, z_1)
            info = finalize_solve_info(info_d, solver_parameters)

            def solve_fn(r0, r1):
                if P is None:
                    return run_kernel(kernel, D_v.A, D_p.A, pc_state,
                                      r0, r1, z_0, z_1)
                return run_kernel(kernel, D_v.A, r0, r1, z_0, z_1)
        if ir_steps:
            from .common import run_iterative_refinement
            dtype = space_v.mesh.dtype
            x0, x1, info = run_iterative_refinement(
                build64, solve_fn, u0, u1, info.iterations, ir_steps,
                outer_sp, dtype)
            u0 = jnp.asarray(x0.astype(dtype))
            u1 = jnp.asarray(x1.astype(dtype))
        self.last_solve_info = info

        v = Function(space_v, name="v")
        zeta = Function(space_v, name="zeta")
        p = Function(space_p, name="p")
        mu = Function(space_p, name="mu")
        v.data, zeta.data = u0[0], u0[1]
        mu.data, p.data = u1[0], u1[1]

        if inhom:
            v.data = v.data + v_inhom.data
        self.set_v(v)
        self.set_zeta(zeta)
        self.set_p(p)
        self.set_mu(mu)

        if create_output:
            _io.write_solution("v", v)
            _io.write_solution("zeta", zeta)
            _io.write_solution("p", p)
            _io.write_solution("mu", mu)
        if plots:
            _io.plot_fields(v=v, zeta=zeta, p=p, mu=mu,
                            true_v=self._true_v)
        if print_error:
            self.print_error()
        return info

    def incompressible_non_linear_solve(self, nullspace_p, *, space_p=None,
                                        P=None, solver_parameters=None,
                                        Multigrid=False,
                                        lambda_v_bounds=None,
                                        lambda_p_bounds=None,
                                        max_non_linear_iter=10,
                                        relative_non_linear_tol=10.0**-5,
                                        absolute_non_linear_tol=10.0**-8,
                                        print_error_linear=False,
                                        print_error_non_linear=True,
                                        create_output=True, plots=False):
        """Picard/Gauss-Newton loop with the incompressibility constraint
        (reference control/control.py:1203-1487)."""
        from contextlib import ExitStack
        from .common import host_setup
        _hs = ExitStack()
        _hs.enter_context(host_setup())
        space_v = self._space_v
        if space_p is None:
            if self._space_p is None:
                raise ValueError("Undefined space_p")
            space_p = self._space_p
        else:
            self.set_space_p(space_p)

        inhom, bcs_v, bcs_v_help = self._setup_bcs()
        bcs_zeta = bcs_v
        mask = combine_masks(space_v, bcs_v) if bcs_v else None

        v_old = Function(space_v, name="v_old", data=self._v.data)
        zeta_old = Function(space_v, name="zeta_old", data=self._zeta.data)
        p_old = Function(space_p, name="p_old", data=self._p.data)
        mu_old = Function(space_p, name="mu_old", data=self._mu.data)

        v_test = TestFunction(space_v)
        v_trial = TrialFunction(space_v)
        p_trial = TrialFunction(space_p)
        p_test = TestFunction(space_p)
        B = assemble(-inner(div(v_trial), p_test) * dx)
        B_T = assemble(-inner(p_trial, div(v_test)) * dx)

        f = assemble(self._force_function(v_test))
        v_d_form, true_v = self._desired_state(v_test)
        self._true_v = true_v
        v_d = assemble(v_d_form)

        def res():
            _, D_zeta = self.construct_D_v(v_old)
            rhs_0, rhs_1 = self.non_linear_res_eval(
                v_d, f, v_old, zeta_old, D_zeta, mask, mask)
            rhs_00 = zero_rows(mask, rhs_0.data - B_T.apply(mu_old.data))
            rhs_01 = zero_rows(mask, rhs_1.data - B_T.apply(p_old.data))
            rhs_10 = -B.apply(v_old.data)
            rhs_11 = -B.apply(zeta_old.data)
            return rhs_00, rhs_01, rhs_10, rhs_11

        rhs_00, rhs_01, rhs_10, rhs_11 = res()

        def _norm(*a):
            return float(jnp.sqrt(sum(jnp.vdot(x, x) for x in a)))

        norm_0 = _norm(rhs_00, rhs_01, rhs_10, rhs_11)
        norm_k = norm_0
        k = 0
        print(f"Initial non-linear residual: {norm_0:.16e}")

        while (norm_k > relative_non_linear_tol * norm_0
               and norm_k > absolute_non_linear_tol):
            self.incompressible_linear_solve(
                nullspace_p, space_p=space_p, P=P,
                solver_parameters=solver_parameters, Multigrid=Multigrid,
                lambda_v_bounds=lambda_v_bounds,
                lambda_p_bounds=lambda_p_bounds,
                v_d=Cofunction(space_v, data=rhs_00),
                f=Cofunction(space_v, data=rhs_01),
                div_v=Cofunction(space_p, data=rhs_10),
                div_zeta=Cofunction(space_p, data=rhs_11),
                print_error=print_error_linear,
                create_output=False, plots=False)

            v_old.data = v_old.data + self._v.data
            if inhom:
                for bc in bcs_v_help:
                    bc.apply(v_old)
            zeta_old.data = zeta_old.data + self._zeta.data
            for bc in bcs_zeta:
                bc.apply(zeta_old)
            p_old.data = p_old.data + self._p.data
            mu_old.data = mu_old.data + self._mu.data
            self.set_v(v_old)
            self.set_zeta(zeta_old)
            self.set_p(p_old)
            self.set_mu(mu_old)
            v_old.data = self._v.data
            zeta_old.data = self._zeta.data

            rhs_00, rhs_01, rhs_10, rhs_11 = res()
            norm_k = _norm(rhs_00, rhs_01, rhs_10, rhs_11)
            k += 1
            print(f"Non-linear solver: iteration {k:d}, "
                  f"non-linear residual norm {norm_k:.16e}")
            if k + 1 > max_non_linear_iter:
                break

        _hs.close()
        if print_error_non_linear:
            if (norm_k < relative_non_linear_tol * norm_0
                    or norm_k < absolute_non_linear_tol):
                print(f"Relative non-linear residual: {norm_k / norm_0:.16e}")
                print(f"Absolute non-linear residual: {norm_k:.16e}")
                print(f"Number of non-linear iterations: {k:d}")
            else:
                print("The non-linear iteration did not converge")
                print(f"Relative non-linear residual: {norm_k / norm_0:.16e}")
                print(f"Absolute non-linear residual: {norm_k:.16e}")
            self.print_error()

        if create_output:
            _io.write_solution("v", self._v)
            _io.write_solution("zeta", self._zeta)
            _io.write_solution("p", self._p)
            _io.write_solution("mu", self._mu)
        if plots:
            _io.plot_fields(v=self._v, zeta=self._zeta, p=self._p,
                            mu=self._mu, true_v=self._true_v)
