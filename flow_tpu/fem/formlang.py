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
# The NS stress/div couplings keep their exact factored-tensor kernels in
# fem/forms.py (quadrature-free — a strictly better compilation the symbolic
# layer intentionally does not undo).
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
    "dot",
    "lap",
    "compile_form",
    "CompiledForm",
]


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


def lap(e):
    return Lap(e)


def dot(a, b):
    return Dot(_wrap(a), _wrap(b))


# ---------------------------------------------------------------------------
# Labeled-tensor evaluation
# ---------------------------------------------------------------------------
class _LT:
    """A tensor with per-axis labels from {e,q,i,j,d,c}."""

    def __init__(self, data, dims: str):
        assert data.ndim == len(dims), (data.shape, dims)
        self.data = data
        self.dims = dims


def _lt_mul(a: _LT, b: _LT) -> _LT:
    out = "".join(
        [d for d in "eqijdc" if d in a.dims or d in b.dims]
    )
    data = jnp.einsum(f"{a.dims},{b.dims}->{out}", a.data, b.data)
    return _LT(data, out)


def _lt_contract(a: _LT, b: _LT) -> _LT:
    # contract the geometric label both operands share: prefer the
    # derivative axis 'd', else the component axis 'c'. A vector
    # coefficient's components ARE spatial directions, so when one operand
    # carries 'c' and the other 'd' (e.g. dot(b, grad(u))), the component
    # axis contracts against the derivative axis.
    if "d" not in a.dims and "c" in a.dims and "d" in b.dims:
        a = _LT(a.data, a.dims.replace("c", "d"))
    if "d" not in b.dims and "c" in b.dims and "d" in a.dims:
        b = _LT(b.data, b.dims.replace("c", "d"))
    for lab in ("d", "c"):
        if lab in a.dims and lab in b.dims:
            keep = "".join(
                [
                    x
                    for x in "eqijdc"
                    if (x in a.dims or x in b.dims) and x != lab
                ]
            )
            data = jnp.einsum(f"{a.dims},{b.dims}->{keep}", a.data, b.data)
            return _LT(data, keep)
    raise ValueError(
        f"dot() operands share no spatial/component axis: {a.dims},{b.dims}"
    )


def _lt_add(a: _LT, b: _LT) -> _LT:
    out = "".join([d for d in "eqijdc" if d in a.dims or d in b.dims])
    da = jnp.einsum(f"{a.dims}->{a.dims}", a.data)  # no-op; keeps types tidy
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
        return _LT(jnp.asarray(tab.phi, dtype=dtype), "qi")

    if isinstance(node, TrialFunction):
        tab = _tab_for(node.space, ctx.tab_rule, dtype, dim)
        return _LT(jnp.asarray(tab.phi, dtype=dtype), "qj")

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
        if isinstance(arg, TestFunction):
            tab = _tab_for(arg.space, ctx.tab_rule, dtype, dim)
            g = jnp.einsum("qlk,edk->eqld", jnp.asarray(tab.dphi, dtype=dtype), geom.G)
            return _LT(g, "eqid")
        if isinstance(arg, TrialFunction):
            tab = _tab_for(arg.space, ctx.tab_rule, dtype, dim)
            g = jnp.einsum("qlk,edk->eqld", jnp.asarray(tab.dphi, dtype=dtype), geom.G)
            return _LT(g, "eqjd")
        if isinstance(arg, Coefficient) and arg.kind == "function":
            f = arg.fn
            tab = _tab_for(f.space, ctx.tab_rule, dtype, dim)
            g = assembly.grads_at_qp(tab, geom, f.space.gather(f.vector))
            return _LT(g, "eqcd" if arg.vector else "eqd")
        raise ValueError("grad() supports test/trial functions and FE Functions")

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

    bilinear: local() -> [nc, nl_i, nl_j]; apply(U) -> K U matrix-free
              (U [n_dofs] or [n_dofs, m]: component-diagonal vector apply);
              assemble_diag() -> the operator diagonal.
    linear:   local() -> [nc, nl_i(,c)]; assemble() -> global vector.
    """

    def __init__(self, space_i, space_j, loc):
        self.space_i = space_i
        self.space_j = space_j
        self._loc = loc

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
        if Uloc.ndim == 2:
            loc = jnp.einsum("eij,ej->ei", self._loc, Uloc)
        else:
            loc = jnp.einsum("eij,ejm->eim", self._loc, Uloc)
        return self.space_i.dof_sum(loc)

    def assemble_diag(self):
        assert self.space_j is not None and self.space_i is self.space_j
        return self.space_i.dof_sum(jnp.einsum("eii->ei", self._loc))


def _find_spaces(node, out):
    if isinstance(node, TestFunction):
        out["i"] = node.space
    elif isinstance(node, TrialFunction):
        out["j"] = node.space
    elif isinstance(node, (Grad, Lap)):
        _find_spaces(node.arg, out)
    elif isinstance(node, (Sum, Product, Dot)):
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
    want = "eij" if space_j is not None else ("eic" if "c" in lt.dims else "ei")
    assert "d" not in lt.dims, "unbalanced derivative axis — missing dot()?"

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
    return CompiledForm(space_i, space_j, out)
