# Inter-mesh prolongation on refine_uniform hierarchies (fem/transfer.py).
import numpy as np
import jax.numpy as jnp

from flow_tpu import unit_square_mesh, VectorFunctionSpace, FunctionSpace, project, errornorm
from flow_tpu.mesh import refine_uniform
from flow_tpu.fem.transfer import (
    prolong, prolong_vector, restrict, restrict_vector
)


def test_prolong_p1_exact_for_linear():
    mc = unit_square_mesh(6, diagonal="crossed")
    mf = refine_uniform(mc)
    Qc, Qf = FunctionSpace(mc, 1), FunctionSpace(mf, 1)
    f = lambda x: 2.0 * x[..., 0] - 3.0 * x[..., 1] + 0.5
    pc = project(f, Qc)
    pf = prolong(pc, Qf)
    pf_direct = project(f, Qf)
    np.testing.assert_allclose(
        np.asarray(pf.vector), np.asarray(pf_direct.vector), atol=1e-10
    )


def test_prolong_p2_exact_for_linear_and_second_order():
    mc = unit_square_mesh(8)
    mf = refine_uniform(mc)
    Vc, Vf = VectorFunctionSpace(mc, 2), VectorFunctionSpace(mf, 2)

    # linear fields transfer exactly (midpoint average is exact for linears)
    lin = (lambda x: x[..., 0] + 2 * x[..., 1], lambda x: -x[..., 0])
    uc = project(lin, Vc)
    uf = prolong(uc, Vf)
    np.testing.assert_allclose(
        np.asarray(uf.vector), np.asarray(project(lin, Vf).vector), atol=1e-9
    )

    # smooth fields: prolonged error decays at >= 2nd order under refinement
    f = (
        lambda x: jnp.sin(2 * x[..., 0]) * jnp.cos(x[..., 1]),
        lambda x: jnp.cos(x[..., 0] + x[..., 1]),
    )
    errs = []
    for n in (4, 8, 16):
        mc = unit_square_mesh(n)
        mf = refine_uniform(mc)
        Vc, Vf = VectorFunctionSpace(mc, 2), VectorFunctionSpace(mf, 2)
        uf = prolong(project(f, Vc), Vf)
        errs.append(errornorm(f, uf))
    orders = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert (orders > 1.9).all(), (errs, orders)


def test_prolong_vector_shapes():
    mc = unit_square_mesh(5)
    mf = refine_uniform(mc)
    Vc, Vf = VectorFunctionSpace(mc, 2), VectorFunctionSpace(mf, 2)
    U = jnp.ones((Vc.n_dofs, 2))
    Uf = prolong_vector(U, Vc, Vf)
    assert Uf.shape == (Vf.n_dofs, 2)
    np.testing.assert_allclose(np.asarray(Uf), 1.0)


def test_restrict_is_left_inverse_of_prolong():
    # injection restriction recovers the coarse vector EXACTLY (the coarse
    # dof locations are a prefix of the fine numbering)
    rng = np.random.default_rng(3)
    mc = unit_square_mesh(7, diagonal="crossed")
    mf = refine_uniform(mc)
    for deg, shape in [(1, ()), (2, ()), (2, (2,))]:
        if shape:
            Sc = VectorFunctionSpace(mc, deg)
            Sf = VectorFunctionSpace(mf, deg)
        else:
            Sc, Sf = FunctionSpace(mc, deg), FunctionSpace(mf, deg)
        x = jnp.asarray(rng.standard_normal((Sc.n_dofs, *shape)))
        back = restrict_vector(prolong_vector(x, Sc, Sf), Sf, Sc)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_restrict_matches_point_values():
    # restriction of a directly-projected fine field equals the coarse
    # interpolant (P2 dofs are point values; projection of a quadratic is
    # exact in both spaces)
    mc = unit_square_mesh(6)
    mf = refine_uniform(mc)
    Qc, Qf = FunctionSpace(mc, 2), FunctionSpace(mf, 2)
    f = lambda x: x[..., 0] ** 2 - 0.5 * x[..., 0] * x[..., 1]
    pc = restrict(project(f, Qf), Qc)
    np.testing.assert_allclose(
        np.asarray(pc.vector), np.asarray(project(f, Qc).vector), atol=1e-9
    )
