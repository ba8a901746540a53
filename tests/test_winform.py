# formlang -> window-kernel bridge: a compiled element matrix applied
# gather-free must equal the CompiledForm's einsum apply.
import numpy as np
import jax
import jax.numpy as jnp

from flow_tpu import FunctionSpace, unit_square_mesh
from flow_tpu.fem import assembly
from flow_tpu.fem.formlang import (
    Coefficient, TestFunction, TrialFunction, compile_form, dot, grad,
)
from flow_tpu.attic.winform import window_operator


def _setup(deg=2):
    mesh = unit_square_mesh(12, "crossed")
    V = FunctionSpace(mesh, deg)
    geom = assembly.geometry(mesh)
    return V, geom


def test_winform_mass_and_stiffness_match_compiled():
    V, geom = _setup()
    u, v = TrialFunction(V), TestFunction(V)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(V.n_dofs))
    for form in (
        compile_form(u * v, geom, rule_degree=2 * V.degree),
        compile_form(dot(grad(u), grad(v)), geom, rule_degree=3),
    ):
        op = window_operator(form, S=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(op.apply(x)), np.asarray(form.apply(x)),
            rtol=3e-5, atol=1e-5,
        )


def test_winform_convection_diffusion_with_coefficient():
    # coefficient-bearing form (the SUPG-heat operator class): the element
    # matrix is data, not code — set_matrix re-blocks without re-tracing
    V, geom = _setup()
    u, v = TrialFunction(V), TestFunction(V)
    tab = assembly.tabulation(V, 3)
    rng = np.random.default_rng(13)
    nq = np.asarray(tab.phi).shape[0]
    bq = jnp.asarray(
        rng.standard_normal((V.mesh.n_cells, nq, 2)), jnp.float64
    )
    b_c = Coefficient(bq, vector=True)
    form = compile_form(
        -0.1 * dot(grad(u), grad(v)) - dot(b_c, grad(u)) * v,
        geom, rule_degree=3,
    )
    op = window_operator(form, S=128, interpret=True)
    x = jnp.asarray(rng.standard_normal(V.n_dofs))
    np.testing.assert_allclose(
        np.asarray(op.apply(x)), np.asarray(form.apply(x)),
        rtol=3e-5, atol=1e-5,
    )
    # new coefficient -> new matrix through the SAME compiled kernel
    bq2 = jnp.asarray(rng.standard_normal(bq.shape), jnp.float64)
    form2 = compile_form(
        -0.1 * dot(grad(u), grad(v))
        - dot(Coefficient(bq2, vector=True), grad(u)) * v,
        geom, rule_degree=3,
    )
    op.set_matrix(form2.local())
    np.testing.assert_allclose(
        np.asarray(op.apply(x)), np.asarray(form2.apply(x)),
        rtol=3e-5, atol=1e-5,
    )


def test_winform_lowers_for_tpu():
    import sys

    from jax import export

    sys.setrecursionlimit(20000)
    with jax.enable_x64(False):
        V, geom = _setup()
        u, v = TrialFunction(V), TestFunction(V)
        form = compile_form(u * v, geom, rule_degree=2 * V.degree)
        op = window_operator(form, S=128, interpret=False)
        x = jnp.zeros(V.n_dofs, jnp.float32)
        exp = export.export(
            jax.jit(lambda t: op.apply(t)), platforms=("tpu",)
        )(x)
        assert len(exp.mlir_module_serialized) > 0


def test_winform_3d_tets():
    # the element-matrix window apply is NL-generic: P2 tet stiffness via
    # formlang matches the compiled einsum apply
    from flow_tpu.mesh3d import box_mesh

    m = box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)
    V = FunctionSpace(m, 2)
    geom = assembly.geometry(m)
    u, v = TrialFunction(V), TestFunction(V)
    form = compile_form(dot(grad(u), grad(v)), geom, rule_degree=3)
    op = window_operator(form, S=128, interpret=True)
    x = jnp.asarray(np.random.default_rng(21).standard_normal(V.n_dofs))
    np.testing.assert_allclose(
        np.asarray(op.apply(x)), np.asarray(form.apply(x)),
        rtol=3e-5, atol=1e-5,
    )
