# The form-to-kernel compiler (fem/formlang.py) must emit kernels identical
# to the hand-derived einsum kernels: same quadrature, same element tensors.
# This is the SURVEY.md §2.2 "FFC row" capability — symbolic weak forms as
# the user-facing equation language (reference UFL usage:
# /root/reference/flow/heat.py:60-88, pressure_correction.py:135-144).
import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu import unit_square_mesh, FunctionSpace, VectorFunctionSpace
from flow_tpu.fem import assembly, forms
from flow_tpu.fem.assembly import geometry, tabulation
from flow_tpu.fem.spaces import Function
from flow_tpu.fem.formlang import (
    TestFunction,
    TrialFunction,
    Coefficient,
    grad,
    dot,
    lap,
    compile_form,
)


@pytest.fixture(scope="module")
def setup():
    mesh = unit_square_mesh(7, diagonal="crossed")
    V2 = FunctionSpace(mesh, 2)
    geom = geometry(mesh)
    return mesh, V2, geom


def test_mass_matrix_matches_exact(setup):
    mesh, V, geom = setup
    u, v = TrialFunction(V), TestFunction(V)
    K = compile_form(u * v, geom, rule_degree=2 * V.degree)
    exact = assembly.mass_local(V, geom)
    np.testing.assert_allclose(
        np.asarray(K.local()), np.asarray(exact), rtol=1e-13, atol=1e-15
    )
    # matrix-free apply through the compiled kernel
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(V.n_dofs))
    np.testing.assert_allclose(
        np.asarray(K.apply(x)),
        np.asarray(assembly.mass_apply(V, geom, x)),
        rtol=1e-12,
        atol=1e-14,
    )


def test_stiffness_matches_exact(setup):
    mesh, V, geom = setup
    u, v = TrialFunction(V), TestFunction(V)
    K = compile_form(dot(grad(u), grad(v)), geom, rule_degree=2 * (V.degree - 1) + 1)
    exact = assembly.stiffness_local(V, geom)
    np.testing.assert_allclose(
        np.asarray(K.local()), np.asarray(exact), rtol=1e-12, atol=1e-13
    )


def test_vector_component_diagonal_apply(setup):
    # vector P2 mass: the compiled scalar kernel applies component-wise
    mesh, V, geom = setup
    W = VectorFunctionSpace(mesh, 2)
    u, v = TrialFunction(W), TestFunction(W)
    K = compile_form(u * v, geom, rule_degree=4)
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.standard_normal((W.n_dofs, 2)))
    np.testing.assert_allclose(
        np.asarray(K.apply(U)),
        np.asarray(assembly.mass_apply(W, geom, U)),
        rtol=1e-12,
        atol=1e-14,
    )


def test_convection_term_matches_forms(setup):
    # ((w . grad) u) v with an FE-function coefficient w — the trilinear NS
    # convection kernel re-expressed symbolically (one frozen argument)
    mesh, V, geom = setup
    W = VectorFunctionSpace(mesh, 2)
    rng = np.random.default_rng(2)
    wfun = Function(W, jnp.asarray(rng.standard_normal((W.n_dofs, 2))))
    ufun = jnp.asarray(rng.standard_normal((W.n_dofs, 2)))

    rule = 5
    w = Coefficient(wfun)
    u, v = TrialFunction(V), TestFunction(V)
    K = compile_form(dot(w, grad(u)) * v, geom, rule_degree=rule)
    got = K.apply(ufun)
    want = forms.convection_rhs(W, geom, wfun.vector, ufun, rule_degree=rule)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-13
    )


def test_linear_form_source(setup):
    mesh, V, geom = setup
    v = TestFunction(V)

    def s(x):
        return jnp.sin(x[..., 0]) * x[..., 1]

    rule = 5
    L = compile_form(Coefficient(s) * v, geom, rule_degree=rule)
    tab = tabulation(V, rule)
    xq = geom.physical_points(tab.ref_pts)
    want = assembly.integrate_rhs(V, tab, geom, val=s(xq))
    np.testing.assert_allclose(
        np.asarray(L.assemble()), np.asarray(want), rtol=1e-12, atol=1e-14
    )


def test_supg_strong_residual_laplacian(setup):
    # int (lap u) (b . grad v) tau — the SUPG A-term of heat.py, symbolically
    mesh, V, geom = setup
    W = VectorFunctionSpace(mesh, 2)
    rng = np.random.default_rng(3)
    bfun = Function(W, jnp.asarray(rng.standard_normal((W.n_dofs, 2))))
    rule = 5

    b = Coefficient(bfun)
    u, v = TrialFunction(V), TestFunction(V)
    K = compile_form(lap(u) * dot(b, grad(v)), geom, rule_degree=rule)

    # hand-derived reference (heat.py:112-121 without tau)
    tab = tabulation(V, rule)
    wd = jnp.asarray(tab.w)[None, :] * geom.detJ[:, None]
    gphi = jnp.einsum("qlk,edk->eqld", jnp.asarray(tab.dphi), geom.G)
    btab = tabulation(W, rule)
    bq = assembly.values_at_qp(btab, W.gather(bfun.vector))
    tbg = jnp.einsum("eqd,eqid->eqi", bq, gphi)
    from flow_tpu.fem import elements

    Href = jnp.asarray(elements.hessian_ref(V.degree, 2))
    lapv = jnp.einsum("eak,lkm,eam->el", geom.G, Href, geom.G)
    want = jnp.einsum("eq,el,eqi->eil", wd, lapv, tbg)
    np.testing.assert_allclose(
        np.asarray(K.local()), np.asarray(want), rtol=1e-12, atol=1e-13
    )


# ---------------------------------------------------------------------------
# v2: coupled vector forms (the UFL surface of /root/reference/flow/
# stokes.py:40-56 and pressure_correction.py:135-144) — each Stokes/NS
# coupling block compiled symbolically must match the hand-derived
# factored-tensor kernels in fem/forms.py to near machine precision.
# ---------------------------------------------------------------------------
def _vector_setup():
    mesh = unit_square_mesh(5, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    geom = geometry(mesh)
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    P = jnp.asarray(rng.standard_normal(Q.n_dofs))
    return mesh, V, Q, geom, U, P


def test_stress_block_matches_sym_grad():
    # 2 mu eps(u):eps(v) == mu [grad(u)+grad(u)^T] : grad(v)
    from flow_tpu.fem.formlang import inner, sym, transpose

    mesh, V, Q, geom, U, P = _vector_setup()
    mu = 0.37
    u, v = TrialFunction(V), TestFunction(V)
    form = compile_form(
        (2.0 * mu) * inner(sym(grad(u)), grad(v)), geom, rule_degree=2
    )
    np.testing.assert_allclose(
        np.asarray(form.apply(U)),
        np.asarray(forms.sym_grad_apply(V, geom, U, mu)),
        rtol=1e-13,
        atol=1e-14,
    )
    # the symmetrized form written out explicitly agrees too
    form2 = compile_form(
        mu * inner(grad(u) + transpose(grad(u)), grad(v)), geom, rule_degree=2
    )
    np.testing.assert_allclose(
        np.asarray(form2.local()), np.asarray(form.local()), rtol=1e-13,
        atol=1e-14,
    )


def test_div_block_matches_div_rhs():
    # B block: q div(u)   (mixed: scalar test, vector trial)
    from flow_tpu.fem.formlang import div

    mesh, V, Q, geom, U, P = _vector_setup()
    q = TestFunction(Q)
    u = TrialFunction(V)
    form = compile_form(div(u) * q, geom, rule_degree=2)
    assert form.axes == "b"
    np.testing.assert_allclose(
        np.asarray(form.apply(U)),
        np.asarray(forms.div_rhs(V, Q, geom, U)),
        rtol=1e-13,
        atol=1e-14,
    )


def test_grad_block_matches_pressure_grad():
    # B^T block: p div(v)  (vector test, scalar trial)
    from flow_tpu.fem.formlang import div

    mesh, V, Q, geom, U, P = _vector_setup()
    v = TestFunction(V)
    p = TrialFunction(Q)
    form = compile_form(p * div(v), geom, rule_degree=2)
    assert form.axes == "a"
    np.testing.assert_allclose(
        np.asarray(form.apply(P)),
        np.asarray(forms.pressure_grad_rhs(V, Q, geom, P)),
        rtol=1e-13,
        atol=1e-14,
    )


def test_vector_convection_matches_convection_rhs():
    # (w . grad) u . v with a vector coefficient w
    mesh, V, Q, geom, U, P = _vector_setup()
    rng = np.random.default_rng(7)
    W = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    w = Coefficient(Function(V, W))
    u, v = TrialFunction(V), TestFunction(V)
    form = compile_form(dot(dot(w, grad(u)), v), geom, rule_degree=5)
    assert form.axes == "ab"
    np.testing.assert_allclose(
        np.asarray(form.apply(U)),
        np.asarray(forms.convection_rhs(V, geom, W, U, rule_degree=5)),
        rtol=1e-12,
        atol=1e-13,
    )


def test_vector_mass_and_diag():
    # dot(u, v) on the vector space: block-diagonal mass; diag matches
    mesh, V, Q, geom, U, P = _vector_setup()
    u, v = TrialFunction(V), TestFunction(V)
    form = compile_form(dot(u, v), geom, rule_degree=4)
    assert form.axes == "ab"
    np.testing.assert_allclose(
        np.asarray(form.apply(U)),
        np.asarray(assembly.mass_apply(V, geom, U)),
        rtol=1e-12,
        atol=1e-14,
    )
    d = np.asarray(form.assemble_diag())
    ref = np.asarray(assembly.mass_diag(V, geom))
    np.testing.assert_allclose(d, np.stack([ref, ref], axis=1), rtol=1e-12)


def test_stokes_operator_via_formlang():
    # the full Stokes saddle operator assembled from compiled blocks matches
    # the hand-derived operator application used by stokes.solve:
    #   [A  B^T] [u]   A = 2 mu eps(u):eps(v),  B = -q div u
    #   [B  0  ] [p]
    from flow_tpu.fem.formlang import div, inner, sym

    mesh, V, Q, geom, U, P = _vector_setup()
    mu = 1.3
    u, v = TrialFunction(V), TestFunction(V)
    p, q = TrialFunction(Q), TestFunction(Q)
    A = compile_form((2.0 * mu) * inner(sym(grad(u)), grad(v)), geom, 2)
    BT = compile_form(p * div(v), geom, 2)
    B = compile_form(div(u) * q, geom, 2)
    ru = A.apply(U) - BT.apply(P)
    rp = -B.apply(U)
    ru_ref = forms.sym_grad_apply(V, geom, U, mu) - forms.pressure_grad_rhs(
        V, Q, geom, P
    )
    rp_ref = -forms.div_rhs(V, Q, geom, U)
    np.testing.assert_allclose(
        np.asarray(ru), np.asarray(ru_ref), rtol=1e-12, atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(rp), np.asarray(rp_ref), rtol=1e-12, atol=1e-13
    )
