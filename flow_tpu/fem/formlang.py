# A small form-to-kernel compiler: symbolic weak-form integrands compiled to
# batched einsum element kernels.
#
# This is the in-repo replacement for the reference's UFL -> FFC -> C++
# pipeline (/root/reference/flow/navier_stokes/pressure_correction.py:135-144,
# /root/reference/flow/heat.py:60-88): the user writes the integrand of a
# bilinear/linear form symbolically (TestFunction/TrialFunction/Coefficient
# plus grad/dot/lap and arithmetic), and `compile_form` emits the element
# kernel — a labeled-tensor einsum chain over all cells at once, the same
# MXU-friendly shape the hand-derived kernels in fem/forms.py use. No C code
# generation, no per-element loop: the "generated kernel" IS an XLA program.
#
# Semantics: an expression labels every tensor axis with one of
#   e  cells                    q  quadrature points
#   i  test local dof           j  trial local dof
#   d  spatial derivative axis  c  vector component axis
# Products align shared labels (element-wise) and keep the union; dot()
# contracts the trailing spatial/component label shared by its operands.
# Integration multiplies by the quadrature weights * |detJ| and sums over q,
# leaving the element kernel:
#   bilinear  -> local matrices  [nc, nl_i, nl_j]
#   linear    -> local vectors   [nc, nl_i]        (+ component axis if any)
#
# Scope (v1): scalar and component-diagonal vector forms — everything Heat
# needs (mass, diffusion, convection, sources, full SUPG including the basis
# Laplacian) and the component-wise NS kernels (mass, stiffness, convection).
#
# v2 (this round): COUPLED VECTOR FORMS. Test/trial functions on vector
# spaces carry component axes ('a' test, 'b' trial; the value axis of a
# vector-valued expression is 'm'); div/inner/sym/transpose express the
# Stokes and NS couplings (2 mu eps(u):eps(v), p div v, q div u, convection)
# — the UFL surface of /root/reference/flow/stokes.py:40-56 and
# pressure_correction.py:135-144. Mixed blocks compile independently (test
# and trial spaces may differ). The hand-derived factored-tensor kernels in
# fem/forms.py remain the production fast path for the constant-coefficient
# cases (quadrature-free — a strictly better compilation the symbolic layer
# intentionally does not undo); equivalence is pinned to 1e-14 in
# tests/test_formlang.py.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import assembly, elements
from .assembly import Geometry
from .spaces import FunctionSpace, Function

__all__ = [
    "TestFunction",
    "TrialFunction",
    "Coefficient",
    "grad",
    "div",
    "dot",
    "inner",
    "sym",
    "transpose",
    "lap",
    "compile_form",
    "CompiledForm",
]

# canonical axis order for labeled tensors:
#   e cells, q quadrature, i test dof, j trial dof, a test component,
#   b trial component, m value axis (vector-valued expression),
#   d derivative axis, c coefficient component axis
CANON = "eqijabmdc"


# ---------------------------------------------------------------------------
# Expression nodes
# ---------------------------------------------------------------------------
class Expr:
    def __add__(self, other):
        return Sum(self, _wrap(other))

    def __radd__(self, other):
        return Sum(_wrap(other), self)

    def __sub__(self, other):
        return Sum(self, Product(Const(-1.0), _wrap(other)))

    def __rsub__(self, other):
        return Sum(_wrap(other), Product(Const(-1.0), self))

    def __mul__(self, other):
        return Product(self, _wrap(other))

    def __rmul__(self, other):
        return Product(_wrap(other), self)

    def __neg__(self):
        return Product(Const(-1.0), self)


def _wrap(x):
    if isinstance(x, Expr):
        return x
    if np.isscalar(x):
        return Const(float(x))
    raise TypeError(f"cannot use {type(x)} in a form")


class Const(Expr):
    def __init__(self, value):
        self.value = float(value)


class TestFunction(Expr):
    def __init__(self, space: FunctionSpace):
        self.space = space


class TrialFunction(Expr):
    def __init__(self, space: FunctionSpace):
        self.space = space


class Coefficient(Expr):
    """A known field in the integrand.

    kind 'function': an FE Function (tabulated at quadrature points);
    kind 'callable': f(x [nc,nq,dim]) -> [nc,nq] or [nc,nq,c] (evaluated at
    physical quadrature points); kind 'qp': a precomputed [nc,nq(,c)] array.
    """

    def __init__(self, value, vector=False):
        self.vector = vector
        if isinstance(value, Function):
            self.kind = "function"
            self.fn = value
            self.vector = value.space.n_components > 1
        elif callable(value):
            self.kind = "callable"
            self.fn = value
        else:
            self.kind = "qp"
            self.fn = value  # array [nc,nq(,c)]


class Grad(Expr):
    def __init__(self, arg):
        self.arg = arg


class Div(Expr):
    """Divergence of a vector test/trial function or vector Function."""

    def __init__(self, arg):
        self.arg = arg


class Transpose(Expr):
    """Swap the value (m) and derivative (d) axes of a matrix-valued
    expression — grad(u)^T."""

    def __init__(self, arg):
        self.arg = arg


class Inner(Expr):
    """Double contraction A:B of matrix-valued expressions (contracts the
    m and d axes both operands share)."""

    def __init__(self, a, b):
        self.a = a
        self.b = b


class Lap(Expr):
    """Basis Laplacian tr(hessian) of a trial/test function — the SUPG
    strong-residual term (constant per element for P2, zero for P1)."""

    def __init__(self, arg):
        assert isinstance(arg, (TrialFunction, TestFunction))
        self.arg = arg


class Dot(Expr):
    def __init__(self, a, b):
        self.a = a
        self.b = b


class Sum(Expr):
    def __init__(self, a, b):
        self.a = a
        self.b = b


class Product(Expr):
    def __init__(self, a, b):
        self.a = a
        self.b = b


def grad(e):
    return Grad(e)


def div(e):
    return Div(e)


def transpose(e):
    return Transpose(e)


def sym(e):
    """Symmetric gradient part: sym(g) = 0.5 (g + g^T). eps(u) = sym(grad(u))."""
    return Product(Const(0.5), Sum(e, Transpose(e)))


def inner(a, b):
    return Inner(_wrap(a), _wrap(b))


def lap(e):
    return Lap(e)


def dot(a, b):
    return Dot(_wrap(a), _wrap(b))


# ---------------------------------------------------------------------------
# Labeled-tensor evaluation
# ---------------------------------------------------------------------------
class _LT:
    """A tensor with per-axis labels from CANON ('eqijabmdc')."""

    def __init__(self, data, dims: str):
        assert data.ndim == len(dims), (data.shape, dims)
        self.data = data
        self.dims = dims


def _canon_sort(lt: _LT) -> _LT:
    """Reorder axes into canonical label order."""
    want = "".join(l for l in CANON if l in lt.dims)
    if want == lt.dims:
        return lt
    return _LT(jnp.einsum(f"{lt.dims}->{want}", lt.data), want)


def _lt_mul(a: _LT, b: _LT) -> _LT:
    # a shared value axis 'm' contracts: the product of two vector-valued
    # expressions is their dot product (u * v == dot(u, v); this also keeps
    # v1's component-diagonal semantics for vector-space test*trial)
    drop = "m" if ("m" in a.dims and "m" in b.dims) else ""
    out = "".join(
        [d for d in CANON if (d in a.dims or d in b.dims) and d != drop]
    )
    data = jnp.einsum(f"{a.dims},{b.dims}->{out}", a.data, b.data)
    return _LT(data, out)


# value-like axes a dot() may contract, in preference order: the derivative
# axis first (dot(w, grad(u)) is (w.grad)u), then the vector value axis,
# then the coefficient component axis
_VALUE_AXES = ("d", "m", "c")


def _lt_contract(a: _LT, b: _LT) -> _LT:
    # contract ONE value-like label both operands share. When they carry
    # DIFFERENT value-like labels (e.g. a vector coefficient 'c' against a
    # gradient 'd', or a coefficient 'c' against a vector test function 'm'),
    # the lower-preference label is renamed to the higher one first: a vector
    # coefficient's components ARE spatial directions.
    for hi in _VALUE_AXES:
        ha, hb = hi in a.dims, hi in b.dims
        if ha and hb:
            break
        if ha or hb:
            other, has = (b, ha) if ha else (a, hb)
            for lo in _VALUE_AXES:
                if lo != hi and lo in other.dims and hi not in other.dims:
                    renamed = _LT(other.data, other.dims.replace(lo, hi))
                    renamed = _canon_sort(renamed)
                    if ha:
                        b = renamed
                    else:
                        a = renamed
                    break
            if hi in a.dims and hi in b.dims:
                break
    for lab in _VALUE_AXES:
        if lab in a.dims and lab in b.dims:
            keep = "".join(
                [
                    x
                    for x in CANON
                    if (x in a.dims or x in b.dims) and x != lab
                ]
            )
            data = jnp.einsum(f"{a.dims},{b.dims}->{keep}", a.data, b.data)
            return _LT(data, keep)
    raise ValueError(
        f"dot() operands share no spatial/component axis: {a.dims},{b.dims}"
    )


def _lt_inner(a: _LT, b: _LT) -> _LT:
    # double contraction over the matrix value axes (m, d) both share; a
    # coefficient's component axis 'c' pairs against the other operand's 'm'
    if "c" in a.dims and "m" not in a.dims and "m" in b.dims:
        a = _canon_sort(_LT(a.data, a.dims.replace("c", "m")))
    if "c" in b.dims and "m" not in b.dims and "m" in a.dims:
        b = _canon_sort(_LT(b.data, b.dims.replace("c", "m")))
    labs = [l for l in ("m", "d") if l in a.dims and l in b.dims]
    if not labs:
        raise ValueError(
            f"inner() operands share no m/d axes: {a.dims},{b.dims}"
        )
    keep = "".join(
        [
            x
            for x in CANON
            if (x in a.dims or x in b.dims) and x not in labs
        ]
    )
    data = jnp.einsum(f"{a.dims},{b.dims}->{keep}", a.data, b.data)
    return _LT(data, keep)


def _lt_add(a: _LT, b: _LT) -> _LT:
    out = "".join([d for d in CANON if d in a.dims or d in b.dims])

    # broadcast both to the union label set
    def expand(t: _LT):
        x = t.data
        for pos, lab in enumerate(out):
            if lab not in t.dims:
                x = jnp.expand_dims(x, pos)
        # axes order: t.dims is a subsequence of out by construction
        return x

    return _LT(expand(a) + expand(b), out)


class _Ctx:
    def __init__(self, geom: Geometry, tab, space_i, space_j, dtype):
        self.geom = geom
        self.tab = tab
        self.space_i = space_i
        self.space_j = space_j
        self.dtype = dtype
        self._gphi = {}
        self._xq = None

    def gphi(self, space):
        """Physical basis gradients [e,q,l,d] for the (shared) tabulation."""
        key = space.degree
        if key not in self._gphi:
            tab = assembly._tab_cached(
                space.degree,
                self.tab_rule,
                jnp.dtype(self.dtype).name,
                self.geom.dim,
            )
            self._gphi[key] = jnp.einsum(
                "qlk,edk->eqld", tab.dphi, self.geom.G
            )
        return self._gphi[key]

    def xq(self):
        if self._xq is None:
            self._xq = self.geom.physical_points(self.tab.ref_pts)
        return self._xq


def _tab_for(space, rule, dtype, dim):
    return assembly._tab_cached(
        space.degree, rule, jnp.dtype(dtype).name, dim
    )


def _eval(node, ctx: _Ctx) -> _LT:
    geom, dtype = ctx.geom, ctx.dtype
    dim = geom.dim

    if isinstance(node, Const):
        return _LT(jnp.asarray(node.value, dtype=dtype).reshape(()), "")

    if isinstance(node, TestFunction):
        tab = _tab_for(node.space, ctx.tab_rule, dtype, dim)
        phi = jnp.asarray(tab.phi, dtype=dtype)
        if node.space.n_components > 1:
            # vector basis (i, a): phi_i e_a — value axis m via delta
            eye = jnp.eye(node.space.n_components, dtype=dtype)
            return _LT(jnp.einsum("qi,am->qiam", phi, eye), "qiam")
        return _LT(phi, "qi")

    if isinstance(node, TrialFunction):
        tab = _tab_for(node.space, ctx.tab_rule, dtype, dim)
        phi = jnp.asarray(tab.phi, dtype=dtype)
        if node.space.n_components > 1:
            eye = jnp.eye(node.space.n_components, dtype=dtype)
            return _LT(jnp.einsum("qj,bm->qjbm", phi, eye), "qjbm")
        return _LT(phi, "qj")

    if isinstance(node, Coefficient):
        if node.kind == "function":
            f = node.fn
            tab = _tab_for(f.space, ctx.tab_rule, dtype, dim)
            vals = assembly.values_at_qp(tab, f.space.gather(f.vector))
            return _LT(vals, "eqc" if node.vector else "eq")
        if node.kind == "callable":
            vals = jnp.asarray(node.fn(ctx.xq()), dtype=dtype)
            if node.vector and vals.ndim == 2:
                raise ValueError("vector callable must return [nc,nq,c]")
            return _LT(vals, "eqc" if vals.ndim == 3 else "eq")
        vals = jnp.asarray(node.fn, dtype=dtype)
        return _LT(vals, "eqc" if vals.ndim == 3 else "eq")

    if isinstance(node, Grad):
        arg = node.arg
        if isinstance(arg, (TestFunction, TrialFunction)):
            tab = _tab_for(arg.space, ctx.tab_rule, dtype, dim)
            g = jnp.einsum("qlk,edk->eqld", jnp.asarray(tab.dphi, dtype=dtype), geom.G)
            if isinstance(arg, TestFunction):
                if arg.space.n_components > 1:
                    eye = jnp.eye(arg.space.n_components, dtype=dtype)
                    return _LT(jnp.einsum("eqid,am->eqiamd", g, eye), "eqiamd")
                return _LT(g, "eqid")
            if arg.space.n_components > 1:
                eye = jnp.eye(arg.space.n_components, dtype=dtype)
                return _LT(jnp.einsum("eqjd,bm->eqjbmd", g, eye), "eqjbmd")
            return _LT(g, "eqjd")
        if isinstance(arg, Coefficient) and arg.kind == "function":
            f = arg.fn
            tab = _tab_for(f.space, ctx.tab_rule, dtype, dim)
            g = assembly.grads_at_qp(tab, geom, f.space.gather(f.vector))
            # vector Function gradients use the value axis m (so inner()
            # against test/trial gradients pairs correctly)
            return _LT(g, "eqmd" if arg.vector else "eqd")
        raise ValueError("grad() supports test/trial functions and FE Functions")

    if isinstance(node, Div):
        arg = node.arg
        if isinstance(arg, (TestFunction, TrialFunction)):
            assert arg.space.n_components > 1, "div() needs a vector function"
            tab = _tab_for(arg.space, ctx.tab_rule, dtype, dim)
            g = jnp.einsum(
                "qlk,edk->eqld", jnp.asarray(tab.dphi, dtype=dtype), geom.G
            )
            # div of basis (l, comp) = d_comp phi_l: the derivative axis IS
            # the dof-component axis
            if isinstance(arg, TestFunction):
                return _LT(g, "eqia")
            return _LT(g, "eqjb")
        if isinstance(arg, Coefficient) and arg.kind == "function":
            f = arg.fn
            assert arg.vector
            tab = _tab_for(f.space, ctx.tab_rule, dtype, dim)
            g = assembly.grads_at_qp(tab, geom, f.space.gather(f.vector))
            return _LT(jnp.trace(g, axis1=2, axis2=3), "eq")
        raise ValueError("div() supports test/trial functions and FE Functions")

    if isinstance(node, Transpose):
        lt = _eval(node.arg, ctx)
        if "m" not in lt.dims or "d" not in lt.dims:
            raise ValueError(f"transpose() needs a matrix-valued operand, got {lt.dims}")
        data = jnp.swapaxes(lt.data, lt.dims.index("m"), lt.dims.index("d"))
        return _LT(data, lt.dims)

    if isinstance(node, Inner):
        return _lt_inner(_eval(node.a, ctx), _eval(node.b, ctx))

    if isinstance(node, Lap):
        arg = node.arg
        Href = jnp.asarray(
            elements.hessian_ref(arg.space.degree, dim), dtype=dtype
        )  # [nl, k, m] reference hessians
        lapv = jnp.einsum("eak,lkm,eam->el", geom.G, Href, geom.G)
        return _LT(lapv, "ei" if isinstance(arg, TestFunction) else "ej")

    if isinstance(node, Dot):
        return _lt_contract(_eval(node.a, ctx), _eval(node.b, ctx))

    if isinstance(node, Sum):
        return _lt_add(_eval(node.a, ctx), _eval(node.b, ctx))

    if isinstance(node, Product):
        return _lt_mul(_eval(node.a, ctx), _eval(node.b, ctx))

    raise TypeError(f"unknown node {type(node)}")


# ---------------------------------------------------------------------------
# Compilation
# ---------------------------------------------------------------------------
class CompiledForm:
    """The emitted element kernel.

    bilinear: local() -> [nc, nl_i, nl_j(+a)(+b)] (a/b = test/trial
              component axes of coupled vector forms); apply(U) -> K U
              matrix-free (scalar U, component-diagonal [n, m] U, or the
              coupled vector cases); assemble_diag() -> operator diagonal.
    linear:   local() -> [nc, nl_i(,a|c)]; assemble() -> global vector.
    """

    def __init__(self, space_i, space_j, loc, axes=""):
        self.space_i = space_i
        self.space_j = space_j
        self._loc = loc
        self.axes = axes  # extra component labels beyond eij/ei

    def local(self):
        return self._loc

    # -- linear forms --------------------------------------------------------
    def assemble(self):
        assert self.space_j is None, "assemble() is for linear forms"
        return self.space_i.dof_sum(self._loc)

    # -- bilinear forms ------------------------------------------------------
    def apply(self, U):
        assert self.space_j is not None
        Uloc = self.space_j.gather(U)
        if self.axes == "":
            if Uloc.ndim == 2:
                loc = jnp.einsum("eij,ej->ei", self._loc, Uloc)
            else:  # component-diagonal vector apply
                loc = jnp.einsum("eij,ejm->eim", self._loc, Uloc)
        elif self.axes == "ab":  # vector test x vector trial coupling
            loc = jnp.einsum("eijab,ejb->eia", self._loc, Uloc)
        elif self.axes == "b":  # scalar test x vector trial (e.g. q div u)
            loc = jnp.einsum("eijb,ejb->ei", self._loc, Uloc)
        else:  # "a": vector test x scalar trial (e.g. p div v)
            assert self.axes == "a"
            loc = jnp.einsum("eija,ej->eia", self._loc, Uloc)
        return self.space_i.dof_sum(loc)

    def assemble_diag(self):
        assert self.space_j is not None and self.space_i is self.space_j
        if self.axes == "":
            return self.space_i.dof_sum(jnp.einsum("eii->ei", self._loc))
        assert self.axes == "ab"
        d = jnp.diagonal(self._loc, axis1=1, axis2=2)  # [e, a, b, i]
        d = jnp.diagonal(d, axis1=1, axis2=2)  # [e, i, a]
        return self.space_i.dof_sum(d)


def _find_spaces(node, out):
    if isinstance(node, TestFunction):
        out["i"] = node.space
    elif isinstance(node, TrialFunction):
        out["j"] = node.space
    elif isinstance(node, (Grad, Lap, Div, Transpose)):
        _find_spaces(node.arg, out)
    elif isinstance(node, (Sum, Product, Dot, Inner)):
        _find_spaces(node.a, out)
        _find_spaces(node.b, out)
    return out


def compile_form(integrand: Expr, geom: Geometry, rule_degree: int):
    """Compile `integrand` (a volume-form density) into its element kernel.

    The integral is sum_e int_e integrand dx, evaluated with a simplex rule
    of the given degree; test/trial spaces are discovered from the
    expression. Bilinear (test+trial) -> local matrices; linear (test only)
    -> local load vectors.
    """
    spaces = _find_spaces(integrand, {})
    assert "i" in spaces, "form must contain a TestFunction"
    space_i = spaces["i"]
    space_j = spaces.get("j")

    dtype = space_i.mesh.dtype
    ctx = _Ctx(geom, None, space_i, space_j, dtype)
    ctx.tab_rule = rule_degree
    ctx.tab = _tab_for(space_i, rule_degree, dtype, geom.dim)

    lt = _eval(integrand, ctx)
    comp = "".join(l for l in "ab" if l in lt.dims)
    if space_j is not None:
        want = "eij" + comp
    else:
        want = "ei" + comp + ("c" if "c" in lt.dims else "")
    assert "d" not in lt.dims, "unbalanced derivative axis — missing dot()?"
    assert "m" not in lt.dims, "unbalanced value axis — missing dot()/inner()?"

    # integrate: multiply by w_q * detJ_e and sum over q (skip if the
    # integrand is q-independent, e.g. pure element-constant terms)
    tab = ctx.tab
    if "q" in lt.dims:
        wd = _LT(
            jnp.asarray(tab.w, dtype=dtype)[None, :] * geom.detJ[:, None],
            "eq",
        )
        out = jnp.einsum(
            f"{lt.dims},eq->{want}", lt.data, wd.data
        )
    else:
        vol = jnp.sum(jnp.asarray(tab.w, dtype=dtype)) * geom.detJ
        out = jnp.einsum(f"{lt.dims},e->{want}", lt.data, vol)
    return CompiledForm(space_i, space_j, out, axes=want[2 + (space_j is not None):])
