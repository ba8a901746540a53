# Assembled padded-ELL operators must equal the matrix-free quadrature path
# exactly (same factored reference tensors, just reassociated sums).
import numpy as np
import jax.numpy as jnp

from flow_tpu import unit_square_mesh, FunctionSpace, VectorFunctionSpace
from flow_tpu.fem import assembly
from flow_tpu.fem.assembly import geometry
from flow_tpu.fem.ell import ell_stiffness, ell_from_local


def test_ell_stiffness_matches_matrix_free():
    mesh = unit_square_mesh(9, diagonal="crossed")
    geom = geometry(mesh)
    rng = np.random.default_rng(0)
    for degree in (1, 2):
        V = FunctionSpace(mesh, degree)
        K = ell_stiffness(V, geom)
        x = jnp.asarray(rng.standard_normal(V.n_dofs))
        want = assembly.stiffness_apply(V, geom, x)
        got = K.apply(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-13
        )
        # diagonal
        np.testing.assert_allclose(
            np.asarray(K.diag()),
            np.asarray(assembly.stiffness_diag(V, geom)),
            rtol=1e-12,
        )


def test_ell_vector_apply_component_diagonal():
    mesh = unit_square_mesh(6)
    geom = geometry(mesh)
    W = VectorFunctionSpace(mesh, 2)
    K = ell_stiffness(W, geom)
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.standard_normal((W.n_dofs, 2)))
    np.testing.assert_allclose(
        np.asarray(K.apply(U)),
        np.asarray(assembly.stiffness_apply(W, geom, U)),
        rtol=1e-12,
        atol=1e-13,
    )


def test_ell_mass_from_local():
    mesh = unit_square_mesh(7)
    geom = geometry(mesh)
    V = FunctionSpace(mesh, 2)
    M = ell_from_local(V, np.asarray(assembly.mass_local(V, geom)))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(V.n_dofs))
    np.testing.assert_allclose(
        np.asarray(M.apply(x)),
        np.asarray(assembly.mass_apply(V, geom, x)),
        rtol=1e-12,
        atol=1e-13,
    )


def test_ell_lane_layout_matches_row():
    # lane layout ([K, n] transposed storage, unrolled FMA apply) must be
    # numerically identical to the row layout for apply (scalar + vector)
    # and diag — it exists purely to avoid the [n, K] minor-dim tile
    # padding on TPU (BENCH_NOTES r3 tile-padding discovery)
    from flow_tpu.fem.ell import ELLMatrix
    import flow_tpu.fem.assembly as asm

    mesh = unit_square_mesh(9, diagonal="crossed")
    geom = geometry(mesh)
    V = FunctionSpace(mesh, 1)
    row = ell_stiffness(V, geom)
    loc = np.asarray(asm.stiffness_local(V, geom))
    from flow_tpu.fem.ell import ell_from_local as _efl

    # rebuild in lane layout from the same local tensors
    import os

    os.environ["FLOW_ELL_LAYOUT"] = "lane"
    try:
        lane = _efl(V, loc)
    finally:
        del os.environ["FLOW_ELL_LAYOUT"]
    assert lane.layout == "lane" and row.layout == "row"
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(V.n_dofs))
    X = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    np.testing.assert_allclose(
        np.asarray(lane.apply(x)), np.asarray(row.apply(x)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(lane.apply(X)), np.asarray(row.apply(X)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(lane.diag()), np.asarray(row.diag()), rtol=1e-12
    )
