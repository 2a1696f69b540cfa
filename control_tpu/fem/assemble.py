"""Form lowering: expressions -> batched element tensors -> LocalOp /
Cofunction / scalar.

This is the TPU-native replacement for Firedrake/TSFC/PyOP2 assembly
(reference control/control.py:310,329,425): instead of generating C kernels
per form, forms are evaluated at quadrature points as broadcasted jnp arrays
with axis convention

    (E, Q, A, B, *value_shape)

E = cells, Q = quadrature points, A = trial basis, B = test basis (axes of
size 1 when absent).  Constant-coefficient forms keep E = 1, so operator
application becomes a single large matmul.  Everything is traceable under
``jit`` and ``vmap`` -- assembling all time blocks of the space-time KKT
system is one batched kernel.

Spatial-only subtrees (manufactured solutions) are differentiated with JAX
autodiff instead of UFL symbolic calculus.
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import elements
from . import expr as X
from .forms import Form, dx
from .space import Function, Cofunction, _SubView, DirichletBC, combine_masks
from ..ops.local_op import LocalOp, MaskedOp


# ---------------------------------------------------------------------------
# helpers: spatial-only point functions (JAX autodiff replaces UFL calculus)
# ---------------------------------------------------------------------------

def make_point_fn(e):
    """Build f(x, y[, z]) -> value (jnp scalar or vector) for a
    spatial-only expression (variadic in the mesh dimension)."""
    if isinstance(e, X.ScalarLiteral):
        return lambda *c: jnp.asarray(e.value)
    if isinstance(e, X.Constant):
        return lambda *c: jnp.asarray(e.value)
    if isinstance(e, X.SpatialX):
        i = e.i
        return lambda *c: c[i]
    if isinstance(e, X.SpatialCoordinate):
        return lambda *c: jnp.stack(c)
    if isinstance(e, X.Sum):
        fa, fb = make_point_fn(e.a), make_point_fn(e.b)
        return lambda *c: fa(*c) + fb(*c)
    if isinstance(e, X.Product):
        fa, fb = make_point_fn(e.a), make_point_fn(e.b)
        return lambda *c: fa(*c) * fb(*c)
    if isinstance(e, X.Pow):
        fa = make_point_fn(e.a)
        p = e.p
        return lambda *c: fa(*c) ** p
    if isinstance(e, X.Indexed):
        fa = make_point_fn(e.a)
        i = e.i
        return lambda *c: fa(*c)[i]
    if isinstance(e, X.AsVector):
        fs = [make_point_fn(comp) for comp in e.comps]
        return lambda *c: jnp.stack([f(*c) for f in fs])
    if isinstance(e, X.Grad):
        fa = make_point_fn(e.a)

        def gfn(*c):
            packed = lambda v: fa(*tuple(v))  # noqa: E731
            return jax.jacfwd(packed)(jnp.stack(c))

        return gfn
    if isinstance(e, X.Div):
        fa = make_point_fn(e.a)

        def dfn(*c):
            packed = lambda v: fa(*tuple(v))  # noqa: E731
            J = jax.jacfwd(packed)(jnp.stack(c))
            return jnp.trace(J)

        return dfn
    if isinstance(e, X.Dot):
        fa, fb = make_point_fn(e.a), make_point_fn(e.b)
        return lambda *c: jnp.tensordot(fa(*c), fb(*c), axes=1)
    if isinstance(e, X.Inner):
        fa, fb = make_point_fn(e.a), make_point_fn(e.b)
        return lambda *c: jnp.sum(fa(*c) * fb(*c))
    if isinstance(e, X.MathFn):
        fa = make_point_fn(e.a)
        fn = _MATH_FNS[e.fn_name]
        return lambda *c: fn(fa(*c))
    if isinstance(e, X.Conditional):
        fc_a, fc_b = make_point_fn(e.cond.a), make_point_fn(e.cond.b)
        ft, ff = make_point_fn(e.t), make_point_fn(e.f)
        op = _CMP_FNS[e.cond.op]
        return lambda *c: jnp.where(op(fc_a(*c), fc_b(*c)),
                                    ft(*c), ff(*c))
    raise NotImplementedError(
        f"spatial point function for {type(e).__name__}")


_MATH_FNS = {"sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
             "exp": jnp.exp, "sqrt": jnp.sqrt, "tanh": jnp.tanh,
             "abs": jnp.abs}
_CMP_FNS = {"ge": lambda a, b: a >= b, "le": lambda a, b: a <= b,
            "gt": lambda a, b: a > b, "lt": lambda a, b: a < b}


def _eval_spatial(e, *coords):
    """Evaluate a spatial-only expression at points; coordinate arrays
    (x, y[, z]) of any common shape; result shape coords[0].shape + e.shape."""
    f = make_point_fn(e)
    flats = tuple(jnp.ravel(c) for c in coords)
    vals = jax.vmap(f)(*flats)
    return vals.reshape(coords[0].shape + e.shape)


# ---------------------------------------------------------------------------
# point evaluation of general expressions (for interpolate)
# ---------------------------------------------------------------------------

def _locate(mesh, pts):
    """Cells and cell-local coordinates of physical points (numpy)."""
    pts = np.asarray(pts, dtype=np.float64)
    fx = (pts[:, 0] - mesh.x0) / mesh.hx
    fy = (pts[:, 1] - mesh.y0) / mesh.hy
    ix = np.clip(np.floor(fx - 1e-12).astype(int), 0, mesh.nx - 1)
    iy = np.clip(np.floor(fy - 1e-12).astype(int), 0, mesh.ny - 1)
    if getattr(mesh, "ndim", 2) == 3:
        fz = (pts[:, 2] - mesh.z0) / mesh.hz
        iz = np.clip(np.floor(fz - 1e-12).astype(int), 0, mesh.nz - 1)
        loc = np.stack([fx - ix, fy - iy, fz - iz], axis=-1)
        loc = np.clip(loc, 0.0, 1.0)
        cell = (iz * mesh.ny + iy) * mesh.nx + ix
        return cell, loc
    loc = np.stack([fx - ix, fy - iy], axis=-1)
    loc = np.clip(loc, 0.0, 1.0)
    cell = iy * mesh.nx + ix
    return cell, loc


def _fem_eval_at_points(f, pts, deriv=False):
    """Evaluate Function ``f`` (or its gradient) at physical points."""
    sp = f.function_space()
    mesh = sp.mesh
    cell, loc = _locate(mesh, pts)
    N, dN = elements.tabulate_scalar(mesh.cell, sp.degree, loc)
    fe = sp.gather(f.data)          # (E, nloc)
    dtype = f.data.dtype
    fe_p = fe[cell]                 # (npts, nloc[*dim])
    h = (np.array([mesh.hx, mesh.hy, mesh.hz]) if sp.ndim == 3
         else np.array([mesh.hx, mesh.hy]))
    if sp.dim is None:
        if not deriv:
            return jnp.einsum("pa,pa->p", jnp.asarray(N, dtype), fe_p)
        dN = dN / h
        return jnp.einsum("pad,pa->pd", jnp.asarray(dN, dtype), fe_p)
    fe_p = fe_p.reshape(fe_p.shape[0], sp.nloc_scalar, sp.dim)
    if not deriv:
        return jnp.einsum("pa,pac->pc", jnp.asarray(N, dtype), fe_p)
    dN = dN / h
    return jnp.einsum("pad,pac->pcd", jnp.asarray(dN, dtype), fe_p)


def eval_at_points(e, pts):
    """Evaluate expression ``e`` (no trial/test) at physical points
    (npts, 2) -> (npts, *e.shape)."""
    if e.has_trial or e.has_test:
        raise ValueError("cannot point-evaluate trial/test functions")
    if e.spatial_only:
        coords = tuple(jnp.asarray(pts[:, i]) for i in range(pts.shape[1]))
        return _eval_spatial(e, *coords)
    if isinstance(e, (Function, _SubView)):
        return _fem_eval_at_points(e, pts)
    if isinstance(e, X.Grad):
        a = e.a
        if isinstance(a, (Function, _SubView)):
            return _fem_eval_at_points(a, pts, deriv=True)
        if isinstance(a, X.Sum):
            return (eval_at_points(X.Grad(a.a), pts)
                    + eval_at_points(X.Grad(a.b), pts))
        raise NotImplementedError("grad of nonlinear FEM expression")
    if isinstance(e, X.Div):
        a = e.a
        if isinstance(a, (Function, _SubView)):
            g = _fem_eval_at_points(a, pts, deriv=True)
            return jnp.trace(g, axis1=-2, axis2=-1)
        if isinstance(a, X.Sum):
            return (eval_at_points(X.Div(a.a), pts)
                    + eval_at_points(X.Div(a.b), pts))
        raise NotImplementedError("div of nonlinear FEM expression")
    if isinstance(e, X.Sum):
        return eval_at_points(e.a, pts) + eval_at_points(e.b, pts)
    if isinstance(e, X.Product):
        va, vb = eval_at_points(e.a, pts), eval_at_points(e.b, pts)
        if e.a.shape == () and e.b.shape != ():
            va = va[(...,) + (None,) * len(e.b.shape)]
        if e.b.shape == () and e.a.shape != ():
            vb = vb[(...,) + (None,) * len(e.a.shape)]
        return va * vb
    if isinstance(e, X.Pow):
        return eval_at_points(e.a, pts) ** e.p
    if isinstance(e, X.MathFn):
        return _MATH_FNS[e.fn_name](eval_at_points(e.a, pts))
    if isinstance(e, X.Indexed):
        return eval_at_points(e.a, pts)[:, e.i]
    if isinstance(e, X.AsVector):
        return jnp.stack([eval_at_points(c, pts) for c in e.comps], axis=-1)
    if isinstance(e, X.Inner):
        va, vb = eval_at_points(e.a, pts), eval_at_points(e.b, pts)
        axes = tuple(range(1, va.ndim))
        return jnp.sum(va * vb, axis=axes)
    if isinstance(e, X.Dot):
        va, vb = eval_at_points(e.a, pts), eval_at_points(e.b, pts)
        return jnp.einsum("p...k,pk->p...", va, vb)
    if isinstance(e, X.Conditional):
        ca = eval_at_points(e.cond.a, pts)
        cb = eval_at_points(e.cond.b, pts)
        return jnp.where(_CMP_FNS[e.cond.op](ca, cb),
                         eval_at_points(e.t, pts),
                         eval_at_points(e.f, pts))
    if isinstance(e, (X.ScalarLiteral, X.Constant)):
        v = jnp.asarray(e.value)
        return jnp.broadcast_to(v, (pts.shape[0],) + v.shape)
    raise NotImplementedError(f"eval_at_points: {type(e).__name__}")


def interpolate(space, value):
    """Interpolate a value onto the node grid of ``space``.

    ``value``: scalar | tuple (vector spaces) | Expr | Function | callable
    of the (x, y[, z]) numpy coordinate arrays.
    """
    dtype = space.mesh.dtype
    coords = space.node_coords()
    if np.isscalar(value):
        return jnp.full(space.grid_shape, float(value), dtype=dtype)
    if isinstance(value, (tuple, list)):
        if space.dim is None:
            raise ValueError("tuple value on a scalar space")
        comps = [interpolate(FunctionScalarView(space), c) for c in value]
        return jnp.stack(comps, axis=-1).astype(dtype)
    if isinstance(value, (Function, _SubView)) and value.space == space:
        return value.data.astype(dtype)
    if isinstance(value, X.Expr):
        pts = np.stack([c.ravel() for c in coords], axis=-1)
        vals = eval_at_points(value, pts)
        if space.dim is None:
            if value.shape != ():
                raise ValueError("vector value on scalar space")
            return vals.reshape(space.grid_shape).astype(dtype)
        if value.shape != (space.dim,):
            raise ValueError("value shape mismatch")
        return vals.reshape(space.grid_shape).astype(dtype)
    if callable(value):
        vals = value(*coords)
        return jnp.asarray(vals, dtype=dtype).reshape(space.grid_shape)
    raise TypeError(f"cannot interpolate {type(value)}")


class FunctionScalarView:
    """Scalar-space facade over one component of a vector space (internal,
    used for componentwise interpolation)."""

    def __new__(cls, space):
        from .space import FunctionSpace
        return FunctionSpace(space.mesh, degree=space.degree)


# ---------------------------------------------------------------------------
# quadrature-context evaluation
# ---------------------------------------------------------------------------

class _QCtx:
    def __init__(self, mesh, nq1d, dtype, coef_override=None):
        self.mesh = mesh
        self.ndim = getattr(mesh, "ndim", 2)
        self.dtype = dtype
        pts, w = elements.cell_quadrature(mesh.cell, nq1d)
        self.qpts = pts                           # (Q,ndim) cell-ref, numpy
        # keep the 2-D product order w*hx*hy (not w*(hx*hy)): bitwise
        # identity with the extensively-tested 2-D assembly
        w_phys = w * mesh.hx * mesh.hy
        if self.ndim == 3:
            w_phys = w_phys * mesh.hz
        self._h = (np.array([mesh.hx, mesh.hy, mesh.hz]) if self.ndim == 3
                   else np.array([mesh.hx, mesh.hy]))
        self.w_phys = jnp.asarray(w_phys, dtype)
        self.Q = len(w)
        self._tab = {}
        self._coef = {}
        self._phys = None
        # {id(Function): (E, nloc) element-local coefficient values} --
        # used to differentiate assembly w.r.t. local dofs (Gauss-Newton)
        self.coef_override = coef_override or {}

    def tab(self, space):
        key = (space.degree, space.dim)
        if key not in self._tab:
            N, dN = elements.tabulate_scalar(self.mesh.cell, space.degree,
                                             self.qpts)
            dN = dN / self._h
            if space.dim is not None:
                d = space.dim
                nloc = N.shape[1]
                Nv = np.zeros((self.Q, nloc * d, d))
                dNv = np.zeros((self.Q, nloc * d, d, self.ndim))
                for c in range(d):
                    Nv[:, c::d, c] = N          # a_vec = a*d + c
                    dNv[:, c::d, c, :] = dN
                self._tab[key] = (jnp.asarray(Nv, self.dtype),
                                  jnp.asarray(dNv, self.dtype))
            else:
                self._tab[key] = (jnp.asarray(N, self.dtype),
                                  jnp.asarray(dN, self.dtype))
        return self._tab[key]

    def phys_coords(self):
        if self._phys is None:
            orig = self.mesh.cell_origins()       # (E,ndim) numpy
            self._phys = tuple(
                jnp.asarray(orig[:, None, i]
                            + self.qpts[None, :, i] * self._h[i],
                            self.dtype)
                for i in range(self.ndim))
        return self._phys

    def coef_at_q(self, f, deriv=False):
        """Coefficient values (E,Q[,dim]) or gradients (E,Q[,dim],2)."""
        sp = f.function_space()
        key = (id(f.parent) if isinstance(f, _SubView) else id(f),
               getattr(f, "i", None), deriv)
        if key in self._coef:
            return self._coef[key]
        N, dN = self.tab(sp)
        if id(f) in self.coef_override:
            fe = self.coef_override[id(f)]
        else:
            fe = sp.gather(f.data.astype(self.dtype))      # (E, nloc)
        if sp.dim is None:
            out = (jnp.einsum("qad,ea->eqd", dN, fe) if deriv
                   else jnp.einsum("qa,ea->eq", N, fe))
        else:
            out = (jnp.einsum("qacd,ea->eqcd", dN, fe) if deriv
                   else jnp.einsum("qac,ea->eqc", N, fe))
        self._coef[key] = out
        return out


def _pad_v(arr, vrank):
    """Give ``arr`` (with axes E,Q,A,B already) ``vrank`` trailing axes."""
    return arr[(...,) + (None,) * vrank] if vrank else arr


def _qeval(e, ctx):
    """Evaluate expression -> array with axes (E,Q,A,B,*e.shape), axes of
    size 1 where absent."""
    if isinstance(e, X.Argument):
        N, _ = ctx.tab(e.space)        # scalar: (Q, nloc); vector (Q,nloc,d)
        if e.space.dim is None:
            v = N[None, :, :, None] if e.number == 1 else N[None, :, None, :]
        else:
            v = (N[None, :, :, None, :] if e.number == 1
                 else N[None, :, None, :, :])
        return v
    if isinstance(e, X.Grad) and isinstance(e.a, X.Argument):
        _, dN = ctx.tab(e.a.space)     # scalar (Q,nloc,2); vector (Q,nloc,d,2)
        if e.a.space.dim is None:
            return (dN[None, :, :, None, :] if e.a.number == 1
                    else dN[None, :, None, :, :])
        return (dN[None, :, :, None, :, :] if e.a.number == 1
                else dN[None, :, None, :, :, :])
    if isinstance(e, X.Div) and isinstance(e.a, X.Argument):
        g = _qeval(X.Grad(e.a), ctx)
        return jnp.trace(g, axis1=-2, axis2=-1)
    if isinstance(e, (Function, _SubView)):
        v = ctx.coef_at_q(e)           # (E,Q[,d])
        return v[:, :, None, None] if e.shape == () else v[:, :, None, None, :]
    if isinstance(e, X.Grad) and isinstance(e.a, (Function, _SubView)):
        v = ctx.coef_at_q(e.a, deriv=True)
        return (v[:, :, None, None, :] if e.a.shape == ()
                else v[:, :, None, None, :, :])
    if isinstance(e, X.Div) and isinstance(e.a, (Function, _SubView)):
        v = ctx.coef_at_q(e.a, deriv=True)      # (E,Q,d,2)
        return jnp.trace(v, axis1=-2, axis2=-1)[:, :, None, None]
    if e.spatial_only and (e.has_coord or isinstance(e, (X.Grad, X.Div))):
        v = _eval_spatial(e, *ctx.phys_coords())  # (E,Q,*shape)
        return v[:, :, None, None] if e.shape == () else \
            v[(slice(None), slice(None), None, None) + (...,)]
    if isinstance(e, (X.ScalarLiteral, X.Constant)):
        return jnp.asarray(e.value, dtype=ctx.dtype)[None, None, None, None]
    if isinstance(e, X.Sum):
        return _qeval(e.a, ctx) + _qeval(e.b, ctx)
    if isinstance(e, X.Product):
        if (e.a.has_trial and e.b.has_trial) or \
           (e.a.has_test and e.b.has_test):
            raise ValueError("form is nonlinear in an argument")
        va, vb = _qeval(e.a, ctx), _qeval(e.b, ctx)
        va = _pad_v(va, len(e.b.shape)) if e.a.shape == () else va
        vb = _pad_v(vb, len(e.a.shape)) if e.b.shape == () else vb
        return va * vb
    if isinstance(e, X.Pow):
        return _qeval(e.a, ctx) ** e.p
    if isinstance(e, X.MathFn):
        return _MATH_FNS[e.fn_name](_qeval(e.a, ctx))
    if isinstance(e, X.Indexed):
        v = _qeval(e.a, ctx)
        return v[(slice(None),) * 4 + (e.i,)]
    if isinstance(e, X.AsVector):
        comps = [_qeval(c, ctx) for c in e.comps]
        comps = jnp.broadcast_arrays(*comps)
        return jnp.stack(comps, axis=-1)
    if isinstance(e, X.Inner):
        if (e.a.has_trial and e.b.has_trial) or \
           (e.a.has_test and e.b.has_test):
            raise ValueError("form is nonlinear in an argument")
        va, vb = _qeval(e.a, ctx), _qeval(e.b, ctx)
        vrank = len(e.a.shape)
        if vrank == 0:
            return va * vb
        # sum over trailing vrank axes with broadcasting
        out = va * vb
        return jnp.sum(out, axis=tuple(range(-vrank, 0)))
    if isinstance(e, X.Dot):
        if (e.a.has_trial and e.b.has_trial) or \
           (e.a.has_test and e.b.has_test):
            raise ValueError("form is nonlinear in an argument")
        va, vb = _qeval(e.a, ctx), _qeval(e.b, ctx)
        ra, rb = len(e.a.shape), len(e.b.shape)
        # va: (EQAB, *sa[:-1], k); vb: (EQAB, k, *sb[1:]).
        # Align the contracted axis k of both at position -rb, with
        # broadcast axes for the other operand's free indices.
        va_e = va[(...,) + (None,) * (rb - 1)]
        vb_e = vb[(slice(None),) * 4 + (None,) * (ra - 1) + (...,)]
        return jnp.sum(va_e * vb_e, axis=-rb)
    if isinstance(e, X.Conditional):
        ca, cb = _qeval(e.cond.a, ctx), _qeval(e.cond.b, ctx)
        return jnp.where(_CMP_FNS[e.cond.op](ca, cb),
                         _qeval(e.t, ctx), _qeval(e.f, ctx))
    if isinstance(e, X.Grad) and isinstance(e.a, X.Sum):
        return _qeval(X.Grad(e.a.a), ctx) + _qeval(X.Grad(e.a.b), ctx)
    if isinstance(e, X.Grad) and isinstance(e.a, X.Product) and \
            e.a.a.shape == () and e.a.a.spatial_only and \
            not e.a.a.has_coord:
        return _qeval(e.a.a, ctx)[..., None] * _qeval(X.Grad(e.a.b), ctx)
    if isinstance(e, X.Div) and isinstance(e.a, X.Sum):
        return _qeval(X.Div(e.a.a), ctx) + _qeval(X.Div(e.a.b), ctx)
    if isinstance(e, X.Div) and isinstance(e.a, X.Product) and \
            e.a.a.shape == () and e.a.a.spatial_only and \
            not e.a.a.has_coord:
        return _qeval(e.a.a, ctx) * _qeval(X.Div(e.a.b), ctx)
    if isinstance(e, X.Grad) and isinstance(e.a, X.AsVector):
        comps = [_qeval(X.Grad(c), ctx) for c in e.a.comps]
        comps = jnp.broadcast_arrays(*comps)
        return jnp.stack(comps, axis=-2)
    raise NotImplementedError(f"_qeval: {type(e).__name__}")


# ---------------------------------------------------------------------------
# assemble
# ---------------------------------------------------------------------------

def _form_spaces(form):
    spaces = []

    def visit(e):
        if isinstance(e, (X.Argument, Function, _SubView)):
            sp = e.function_space()
            if sp not in spaces:
                spaces.append(sp)
        for o in e.operands:
            visit(o)
        if isinstance(e, (Function, _SubView)):
            return

    for e, _ in form.integrals:
        visit(e)
    return spaces


def element_tensor(form, quad_degree=None, coef_override=None):
    """Per-element tensor of a form BEFORE scatter: (E|1, b) for linear
    forms, (E|1, b, a) for bilinear.  ``coef_override`` maps id(Function) ->
    (E, nloc) local coefficient values (differentiable; used for the
    Gauss-Newton element Jacobians)."""
    trial = form.trial_space()
    test = form.test_space()
    spaces = _form_spaces(form)
    mesh = spaces[0].mesh
    nq1d = (max(s.degree for s in spaces) + 2 if quad_degree is None
            else quad_degree)
    ctx = _QCtx(mesh, nq1d, mesh.dtype, coef_override=coef_override)
    acc = None
    for e, m in form.integrals:
        if m is not dx and m.name != "dx":
            raise NotImplementedError("only cell integrals (dx) supported")
        v = _qeval(e, ctx)
        if e.shape != ():
            raise ValueError("integrand must be scalar")
        acc = v if acc is None else acc + v
    if trial is not None and test is not None:
        return jnp.einsum("q,eqab->eba", ctx.w_phys, acc)
    if test is not None:
        return jnp.einsum("q,eqb->eb", ctx.w_phys, acc[:, :, 0, :])
    raise ValueError("element_tensor needs a test function")


def assemble(form, bcs=None, quad_degree=None,
             form_compiler_parameters=None):
    """Assemble a form.

    * bilinear (trial+test)  -> LocalOp (MaskedOp when ``bcs`` given)
    * linear (test only)     -> Cofunction
    * functional             -> python float-compatible jnp scalar
    """
    if not isinstance(form, Form):
        raise TypeError("assemble expects a Form")
    trial = form.trial_space()
    test = form.test_space()
    spaces = _form_spaces(form)
    if not spaces:
        raise ValueError("form has no FEM content")
    mesh = spaces[0].mesh
    dtype = mesh.dtype
    if quad_degree is None:
        nq1d = max(s.degree for s in spaces) + 2
    else:
        nq1d = quad_degree
    ctx = _QCtx(mesh, nq1d, dtype)

    acc = None
    for e, m in form.integrals:
        if m is not dx and m.name != "dx":
            raise NotImplementedError("only cell integrals (dx) supported")
        v = _qeval(e, ctx)
        if e.shape != ():
            raise ValueError("integrand must be scalar")
        acc = v if acc is None else acc + v

    if trial is not None and test is not None:
        # (E,Q,A,B) -> local matrices (E, b, a)
        A = jnp.einsum("q,eqab->eba", ctx.w_phys, acc)
        op = LocalOp(A, trial, test)
        if bcs:
            if isinstance(bcs, DirichletBC):
                bcs = (bcs,)
            mask = combine_masks(trial, bcs)
            op = MaskedOp(op, mask)
        return op
    if test is not None:
        r = jnp.einsum("q,eqb->eb", ctx.w_phys, acc[:, :, 0, :])
        E = mesh.n_cells
        r = jnp.broadcast_to(r, (E, r.shape[-1]))
        out = Cofunction(test)
        out.data = test.scatter_add(r)
        if bcs:
            if isinstance(bcs, DirichletBC):
                bcs = (bcs,)
            for bc in bcs:
                out.data = jnp.where(bc.mask, 0.0, out.data)
        return out
    if trial is not None:
        raise ValueError("form has a trial but no test function")
    val = jnp.einsum("q,eq->", ctx.w_phys, acc[:, :, 0, 0]
                     * jnp.ones((mesh.n_cells, ctx.Q), dtype))
    return val


def assemble_sqrt_l2(e):
    """sqrt(|assemble(inner(e, e)*dx)|) convenience (error norms)."""
    from .expr import inner as _inner
    return jnp.sqrt(jnp.abs(assemble(_inner(e, e) * dx)))
