# Window-blocked cell layout for gather-free Pallas assembly kernels.
#
# TPU gathers are row-count-bound (~0.6-3e8 rows/s, BENCH_NOTES round 2) —
# the measured wall under every FEM hot path here. The gather-free
# formulation (scripts/onehot_window_probe.py) needs cells grouped so each
# block of C cells reads one narrow contiguous dof window, which the
# as-built dof numbering does not provide (P2 numbers vertices then edges:
# cell spans ~n). This module computes, host-side (numpy):
#
#   - a P2/P1 scalar-dof permutation by RCM on the DOF GRAPH (pairs sharing
#     a cell) — measured window widths ~4 sqrt(n) on the Karman meshes,
#   - a cell order sorted by minimum permuted dof,
#   - per-block 128-aligned window starts w0[b] and block-local indices
#     lidx[b, C, nl] < W,
#   - the permutation tables to move vectors in and out of window order.
#
# The discrete operators are permutation-equivalent; equivalence is pinned
# in tests/test_window.py.
from __future__ import annotations

import numpy as np

__all__ = ["WindowLayout", "build_window_layout"]


class WindowLayout:
    """Blocked-window view of a scalar FunctionSpace.

    Attributes:
      perm      np [n] int32, new -> old dof id (x_win = x[perm])
      inv       np [n] int32, old -> new (x = x_win[inv][...wrong dir];
                x_old[i] = x_win[inv[i]])
      cell_order np [nc] int — kernel block b covers original cells
                cell_order[b*C:(b+1)*C] (tail cells padded with repeats of
                the last real cell, masked by cell_valid)
      cell_valid np [nb*C] float32 — 1.0 for real cells, 0.0 for padding
      C, W, nb  block size, padded window width, number of blocks
      w0        np [nb] int32 — 128-aligned window start (new numbering)
      lidx      np [nb, C, nl] int32 — block-local dof indices (< W)
    """

    def __init__(self, perm, inv, cell_order, cell_valid, C, W, nb, w0, lidx):
        self.perm = perm
        self.inv = inv
        self.cell_order = cell_order
        self.cell_valid = cell_valid
        self.C = C
        self.W = W
        self.nb = nb
        self.w0 = w0
        self.lidx = lidx

    @property
    def n(self):
        return len(self.perm)


def _dof_graph_rcm(cell_dofs, n):
    """RCM on the dof graph (all intra-cell pairs). Returns perm (new->old)
    and inv (old->new)."""
    from .. import native

    cd = np.asarray(cell_dofs, dtype=np.int64)
    nl = cd.shape[1]
    ii, jj = np.triu_indices(nl, 1)
    e = np.stack([cd[:, ii].ravel(), cd[:, jj].ravel()], axis=1)
    e = np.unique(np.sort(e, axis=1), axis=0).astype(np.int32)
    perm = np.asarray(native.rcm_order(n, e))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n, dtype=perm.dtype)
    return perm.astype(np.int32), inv.astype(np.int32)


def build_window_layout(space, C=256, w_align=128):
    """Compute the WindowLayout of a FunctionSpace (scalar dof structure;
    vector components share it — the state is component-major)."""
    cd = np.asarray(space.cell_dofs_np)
    n = space.n_dofs
    nc, nl = cd.shape
    perm, inv = _dof_graph_rcm(cd, n)
    cdn = inv[cd.astype(np.int64)]  # cell dofs in new numbering

    cell_order = np.argsort(cdn.min(axis=1), kind="stable")
    nb = (nc + C - 1) // C
    # pad the cell list to nb*C with repeats of the last cell (masked)
    pad = nb * C - nc
    cell_order_p = np.concatenate(
        [cell_order, np.full(pad, cell_order[-1], dtype=cell_order.dtype)]
    )
    cell_valid = np.ones(nb * C, dtype=np.float32)
    if pad:
        cell_valid[nc:] = 0.0

    cds = cdn[cell_order_p].reshape(nb, C * nl)
    w0 = (cds.min(axis=1) // w_align) * w_align
    width = cds.max(axis=1) - w0 + 1
    W = int(((int(width.max()) + w_align - 1) // w_align) * w_align)
    lidx = (cds - w0[:, None]).astype(np.int32).reshape(nb, C, nl)
    # windows may extend past n; callers pad the window source to n + W
    return WindowLayout(
        perm, inv, cell_order_p, cell_valid, C, W, nb,
        w0.astype(np.int32), lidx,
    )
