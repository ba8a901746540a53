# Window-blocked layout (fem/window.py): the permuted/blocked view must be
# an exact re-indexing of the original cell-dof structure.
import numpy as np
import jax.numpy as jnp

from flow_tpu.models.karman import KarmanProblem
from flow_tpu.fem.window import build_window_layout


def test_window_layout_roundtrip_and_locality():
    prob = KarmanProblem(lcar=0.1, n_refine=1)
    V = prob.V
    wl = build_window_layout(V, C=128)
    n = V.n_dofs
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)

    # permutation round-trip
    xw = x[wl.perm]
    assert np.array_equal(xw[wl.inv], x)

    # gathering through (w0, lidx) windows reproduces x[cell_dofs]
    cd = np.asarray(V.cell_dofs_np)
    xw_pad = np.concatenate([xw, np.zeros(wl.W)])
    gathered = np.empty((wl.nb, wl.C, cd.shape[1]))
    for b in range(wl.nb):
        win = xw_pad[wl.w0[b] : wl.w0[b] + wl.W]
        gathered[b] = win[wl.lidx[b]]
    ref = x[cd[wl.cell_order].astype(np.int64)].reshape(
        wl.nb, wl.C, cd.shape[1]
    )
    valid = wl.cell_valid.reshape(wl.nb, wl.C, 1)
    np.testing.assert_array_equal(gathered * valid, ref * valid)

    # locality: windows are narrow relative to n
    assert wl.W < max(512, n // 2), (wl.W, n)
    assert int(wl.lidx.max()) < wl.W
