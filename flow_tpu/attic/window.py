# Window-blocked cell layout for gather-free Pallas assembly kernels.
#
# TPU gathers are row-count-bound (~0.6-3e8 rows/s, BENCH_NOTES round 2) —
# the measured wall under every FEM hot path here. The gather-free
# formulation (scripts/onehot_window_probe.py) groups cells so each block
# reads ONE narrow contiguous dof window (DMA at full HBM bandwidth) and
# "gathers"/"scatters" inside VMEM by one-hot compare + MXU contract.
#
# Layout (host-side numpy):
#   - scalar-dof permutation by RCM on the DOF GRAPH (pairs sharing a
#     cell); the as-built P2 numbering (vertices then edges) has spans ~n,
#     the dof-graph RCM gives bandwidth ~4 sqrt(n) (measured on Karman),
#   - UNIFORM-STRIDE buckets: block b owns permuted dofs [b*S, (b+1)*S);
#     a cell belongs to the bucket of its minimum permuted dof; since all
#     its dofs lie within +bandwidth of the minimum, block b only touches
#     [b*S, b*S + W) with W = S + bandwidth (padded to a multiple of S) —
#     so the output side is an overlap-add of W/S SHIFTED CONTIGUOUS
#     layers (pure XLA adds, no scatter),
#   - per-block cell lists padded to the max bucket population (masked).
#
# The discrete operators are permutation-equivalent; equivalence is pinned
# in tests/test_window.py.
from __future__ import annotations

import numpy as np

__all__ = ["WindowLayout", "build_window_layout", "overlap_add_fn"]


class WindowLayout:
    """Uniform-stride blocked-window view of a scalar FunctionSpace.

    Attributes:
      perm      np [n] int32, new -> old dof id (x_win = x_old[perm])
      inv       np [n] int32, old -> new (x_old[i] lives at inv[i])
      S         owned stride per block (multiple of 128)
      W         window width (multiple of S); block b reads [b*S, b*S+W)
      nb        number of blocks = ceil(n / S)
      C         padded cells per block (max bucket population)
      cells     np [nb, C] int32 — original cell ids per block (padded by
                repeating the last real cell)
      valid     np [nb, C] float32 — 1.0 real cell, 0.0 padding
      lidx      np [nb, C, nl] int32 — window-local dof indices (< W)
    """

    def __init__(self, perm, inv, S, W, nb, C, cells, valid, lidx):
        self.perm = perm
        self.inv = inv
        self.S = S
        self.W = W
        self.nb = nb
        self.C = C
        self.cells = cells
        self.valid = valid
        self.lidx = lidx

    @property
    def n(self):
        return len(self.perm)

    @property
    def n_pad(self):
        """Length the permuted source vector must be padded to."""
        return self.nb * self.S + self.W

    def overlap_add(self, wins, jnp):
        """[nb, W] per-block output windows -> [n] vector (permuted
        numbering). W/S shifted contiguous adds — no scatter."""
        return overlap_add_fn(wins, self.S, self.W, self.n, jnp)


def overlap_add_fn(wins, S, W, n, jnp):
    """Functional overlap-add (for callers whose layout metadata are plain
    ints, e.g. shard_map'ed per-device kernels)."""
    nb = wins.shape[0]
    nbS = nb * S
    y = jnp.zeros(nbS + W, dtype=wins.dtype)
    for k in range(W // S):
        layer = wins[:, k * S : (k + 1) * S].reshape(nbS)
        y = y.at[k * S : k * S + nbS].add(layer)
    return y[:n]


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


def build_window_layout(space, S=None, rcm=None):
    """Compute the uniform-stride WindowLayout of a FunctionSpace (scalar
    dof structure; vector components share it — state is component-major).
    S must be a multiple of 128; S=None picks it automatically from the
    RCM bandwidth so the DMA read amplification W/S stays ~<=2 (a fixed
    S=512 at 1.9M DoF gives W=8S: every block reads 8x the dofs it owns).
    Capped at 4096 to bound per-block VMEM (window + one-hot tiles).
    rcm=(perm, inv) reuses a previously computed dof permutation (it is
    S-independent — callers re-bucketing with a different S skip the RCM)."""
    cd = np.asarray(space.cell_dofs_np)
    n = space.n_dofs
    nc, nl = cd.shape
    perm, inv = _dof_graph_rcm(cd, n) if rcm is None else rcm
    cdn = inv[cd.astype(np.int64)]  # cell dofs in new numbering

    if S is None:
        span = int((cdn.max(axis=1) - cdn.min(axis=1)).max()) + 1
        S = min(4096, max(512, ((span + 127) // 128) * 128))
    assert S % 128 == 0, S

    cmin = cdn.min(axis=1)
    bucket = cmin // S
    nb = (n + S - 1) // S
    # W = S + max reach, padded to a multiple of S
    reach = int((cdn.max(axis=1) - bucket * S).max()) + 1
    W = ((reach + S - 1) // S) * S

    counts = np.bincount(bucket, minlength=nb)
    C = int(counts.max())
    cells = np.empty((nb, C), dtype=np.int32)
    valid = np.zeros((nb, C), dtype=np.float32)
    order = np.argsort(bucket, kind="stable")
    off = 0
    for b in range(nb):
        k = counts[b]
        ids = order[off : off + k]
        off += k
        if k:
            cells[b, :k] = ids
            cells[b, k:] = ids[-1]
            valid[b, :k] = 1.0
        else:
            cells[b, :] = 0  # fully masked block
    lidx = (cdn[cells.astype(np.int64)] - (np.arange(nb) * S)[:, None, None])
    lidx = lidx.astype(np.int32)
    # padding cells may have negative lidx (repeat of a cell from an earlier
    # window); clamp into range — they are masked by valid anyway
    lidx = np.clip(lidx, 0, W - 1)
    return WindowLayout(perm, inv, S, W, nb, C, cells, valid, lidx)
