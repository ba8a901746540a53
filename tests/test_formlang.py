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
