# Cell-chunked volume-residual evaluation (FLOW_CELL_CHUNK): the fix for
# the 3-D large-size HBM OOM — quadrature intermediates (and their jvp
# tangent duplicates) are bounded to one chunk of cells at a time via a
# sequential lax.map (BENCH_NOTES r3 chain-4/6: cavity3d N=48 OOM'd 17.6 G
# on [663552,3,10]-class temps). Must be bit-equivalent to the whole-mesh
# evaluation, including under jvp and linearize, with a padded last chunk.
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_tpu.mesh import unit_square_mesh
from flow_tpu.mesh3d import box_mesh
from flow_tpu.fem.spaces import VectorFunctionSpace, FunctionSpace
from flow_tpu.navier_stokes.pressure_correction import _get_ctx


def _spaces(dim):
    if dim == 2:
        mesh = unit_square_mesh(5)
        V = VectorFunctionSpace(mesh, 2)
    else:
        mesh = box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)
        V = VectorFunctionSpace(mesh, 2, n_components=3)
    return mesh, V, FunctionSpace(mesh, 1)


@pytest.mark.parametrize("dim", [2, 3])
def test_chunked_residual_matches_whole_mesh(dim, monkeypatch):
    mesh, V, Q = _spaces(dim)
    ctx = _get_ctx(V, Q)
    rng = np.random.default_rng(3)
    Ui = jnp.asarray(rng.standard_normal((V.n_dofs, V.n_components)))
    U0 = jnp.asarray(rng.standard_normal((V.n_dofs, V.n_components)))
    P0 = jnp.asarray(rng.standard_normal(Q.n_dofs))
    tang = jnp.asarray(rng.standard_normal(Ui.shape))
    theta = (0.5, 0.5)

    def res(x):
        return ctx._residual(x, U0, None, None, P0, 1.0, 0.01, 0.1, theta)

    def res_lag(x):
        return ctx._residual(
            x, U0, None, None, P0, 1.0, 0.01, 0.1, theta, transport=U0
        )

    monkeypatch.delenv("FLOW_CELL_CHUNK", raising=False)
    r_ref = res(Ui)
    rl_ref = res_lag(Ui)
    jv_ref = jax.jvp(res, (Ui,), (tang,))[1]

    # chunk size chosen to NOT divide n_cells: exercises last-chunk padding
    chunk = 13
    assert mesh.n_cells % chunk != 0
    monkeypatch.setenv("FLOW_CELL_CHUNK", str(chunk))
    np.testing.assert_allclose(res(Ui), r_ref, rtol=0, atol=1e-12)
    np.testing.assert_allclose(res_lag(Ui), rl_ref, rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        jax.jvp(res, (Ui,), (tang,))[1], jv_ref, rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        jax.linearize(res, Ui)[1](tang), jv_ref, rtol=0, atol=1e-12
    )


def test_conv_lagged_jacobian_chunked_matches_whole(monkeypatch):
    # the EMA/lagged scalar-tensor build honors FLOW_CELL_CHUNK (the 3-D
    # large-size OOM fix, chain-17): chunked evaluation must be exact
    import jax.numpy as jnp
    import numpy as np

    from flow_tpu.fem import forms
    from flow_tpu.fem.assembly import Geometry
    from flow_tpu.models.cavity3d import Cavity3DProblem

    prob = Cavity3DProblem(n=3)
    V = prob.V
    geom = Geometry(V.mesh)
    rng = np.random.default_rng(11)
    Tloc = jnp.asarray(
        rng.standard_normal((V.mesh.cells.shape[0], 10, 3))
    )
    want = forms.conv_lagged_jacobian_loc(V, geom, Tloc)
    monkeypatch.setenv("FLOW_CELL_CHUNK", "7")
    got = forms.conv_lagged_jacobian_loc(V, geom, Tloc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-13)
