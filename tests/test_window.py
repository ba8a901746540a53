# Window-blocked layout (fem/window.py): the permuted/blocked view must be
# an exact re-indexing of the original cell-dof structure, and the
# overlap-add must be the exact transpose-scatter.
import numpy as np
import jax.numpy as jnp

from flow_tpu.models.karman import KarmanProblem
from flow_tpu.attic.window import build_window_layout


def test_window_layout_roundtrip_gather_scatter():
    prob = KarmanProblem(lcar=0.1, n_refine=1)
    V = prob.V
    wl = build_window_layout(V, S=128)
    n = V.n_dofs
    cd = np.asarray(V.cell_dofs_np)
    nl = cd.shape[1]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)

    # permutation round-trip
    xw = x[wl.perm]
    assert np.array_equal(xw[wl.inv.astype(np.int64)], x)

    # gather through uniform-stride windows == x[cell_dofs] (valid cells)
    xw_pad = np.concatenate([xw, np.zeros(wl.n_pad - n)])
    gathered = np.empty((wl.nb, wl.C, nl))
    for b in range(wl.nb):
        win = xw_pad[b * wl.S : b * wl.S + wl.W]
        gathered[b] = win[wl.lidx[b]]
    ref = x[cd[wl.cells.astype(np.int64)].astype(np.int64)]
    v = wl.valid[:, :, None]
    np.testing.assert_array_equal(gathered * v, ref * v)

    # scatter: per-block window accumulation + overlap_add == .at[].add
    loc = rng.standard_normal((wl.nb, wl.C, nl)) * wl.valid[:, :, None]
    wins = np.zeros((wl.nb, wl.W))
    for b in range(wl.nb):
        np.add.at(wins[b], wl.lidx[b].ravel(), loc[b].ravel())
    y_win = np.asarray(wl.overlap_add(jnp.asarray(wins), jnp))
    # reference: scatter loc into the ORIGINAL numbering, then permute
    y_ref = np.zeros(n)
    np.add.at(
        y_ref, cd[wl.cells.astype(np.int64)].astype(np.int64).ravel(),
        loc.ravel(),
    )
    np.testing.assert_allclose(y_win, y_ref[wl.perm.astype(np.int64)],
                               atol=1e-12)

    # locality + population balance diagnostics
    assert wl.W < max(1024, n // 2), (wl.W, n)
    mean_pop = wl.valid.sum() / wl.nb
    assert wl.C <= 6 * max(mean_pop, 1), (wl.C, mean_pop)
